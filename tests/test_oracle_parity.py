"""End-to-end radiance parity vs the independent f64 oracle (SURVEY §4b).

The oracle (tests/oracle.py) implements the reference semantics in pure
numpy with true rejection sampling and its own RNG — zero shared code.
Monte-Carlo estimates of the same integral must agree within the
oracle's own seed-to-seed noise; a systematic offset (energy loss, bad
material weights, orientation flip) fails these bounds.

(Verified at higher spp during round-1 bring-up: ours-vs-oracle MAD on
CornellBox 40x40 was BELOW the oracle's seed-to-seed MAD.)
"""

import jax
import numpy as np
import pytest

from oracle import cornell_camera, cornell_prims, render_oracle
from rust_pathtracer_tpu.models import get_scene
from rust_pathtracer_tpu.render import RenderSettings, render_radiance
from rust_pathtracer_tpu.scene.builder import SceneBuilder


def test_cornell_box_matches_oracle():
    res, spp = 20, 48
    # Average THREE oracle seeds: a single 48-spp oracle render's mean
    # swings +-6% seed-to-seed (measured 0.1328..0.1494 for seeds
    # 1..4), so a one-seed anchor made the 6% gate a coin flip —
    # the round-5 RNG-stream change re-rolled our side of it and a
    # chance tail-vs-tail pairing failed with NO bias (packed vs
    # legacy 4-key means agree to 0.04%).  Averaging cuts the oracle
    # noise ~sqrt(3) so the 6% gate tests the ESTIMATOR, not luck.
    oracle_mean = np.mean([
        render_oracle(cornell_prims(), cornell_camera(), res, res, spp,
                      12, (0, 0, 0), seed=k).mean()
        for k in (1, 2, 3)
    ])
    oracle_img = render_oracle(
        cornell_prims(), cornell_camera(), res, res, spp, 12, (0, 0, 0), seed=1
    )
    sd = get_scene("CornellBox")
    s = RenderSettings(res, res, 4 * spp, 12, (0.0, 0.0, 0.0))
    ours, _ = render_radiance(sd.build(), sd.camera_at(0.0), s, jax.random.PRNGKey(0))
    ours = np.asarray(ours, np.float64)

    # global mean within 6% of the averaged-oracle anchor
    assert abs(ours.mean() - oracle_mean) / oracle_mean < 0.06
    # per-pixel agreement within noise bounds (single-seed image)
    assert np.abs(ours - oracle_img).mean() < 0.12


def test_light_scene_matches_oracle():
    # LightTest-shaped scene with a solid ground (the oracle has no
    # perlin): sphere + ground + three one-sided rect lights
    prims = [
        {"type": "sphere", "center": (0.0, -1000.0, 0.0), "radius": 1000.0,
         "mat": {"type": "lam", "color": (0.5, 0.5, 0.5)}},
        {"type": "sphere", "center": (0.0, 2.0, 0.0), "radius": 2.0,
         "mat": {"type": "lam", "color": (0.5, 0.5, 0.5)}},
        {"type": "rect", "axis": 2, "k": -2.0, "a0": 3.0, "a1": 5.0,
         "b0": 1.0, "b1": 3.0, "dir": 1.0,
         "mat": {"type": "light", "color": (4.0, 4.0, 4.0)}},
        {"type": "rect", "axis": 1, "k": 6.0, "a0": -1.0, "a1": 1.0,
         "b0": -1.0, "b1": 1.0, "dir": -1.0,
         "mat": {"type": "light", "color": (4.0, 4.0, 4.0)}},
        {"type": "rect", "axis": 0, "k": -6.0, "a0": 1.0, "a1": 3.0,
         "b0": -2.0, "b1": 2.0, "dir": 1.0,
         "mat": {"type": "light", "color": (4.0, 4.0, 4.0)}},
    ]
    cam = {"lookfrom": (26.0, 3.0, 6.0), "lookat": (0.0, 2.0, 0.0),
           "up": (0.0, 1.0, 0.0), "vfov": 20.0, "aspect": 1.0,
           "aperture": 0.0, "focus": 10.0}
    res, spp = 20, 64
    oracle_img = render_oracle(prims, cam, res, res, spp, 10, (0, 0, 0), seed=2)

    b = SceneBuilder()
    gray = b.lambertian((0.5, 0.5, 0.5))
    b.add_sphere((0.0, -1000.0, 0.0), 1000.0, gray)
    b.add_sphere((0.0, 2.0, 0.0), 2.0, gray)
    light = b.diffuse_light((4.0, 4.0, 4.0))
    b.add_rect("xy", (3.0, 1.0, -2.0), (5.0, 3.0, -2.0), 1.0, light)
    b.add_rect("xz", (-1.0, 6.0, -1.0), (1.0, 6.0, 1.0), -1.0, light)
    b.add_rect("yz", (-6.0, 1.0, -2.0), (-6.0, 3.0, 2.0), 1.0, light)
    scene = b.build(use_bvh=False)
    from rust_pathtracer_tpu.camera import make_camera

    camera = make_camera((26.0, 3.0, 6.0), (0.0, 2.0, 0.0), (0.0, 1.0, 0.0),
                         20.0, 1.0, 0.0, 10.0)
    s = RenderSettings(res, res, 4 * spp, 10, (0.0, 0.0, 0.0))
    ours, _ = render_radiance(scene, camera, s, jax.random.PRNGKey(0))
    ours = np.asarray(ours, np.float64)

    assert abs(ours.mean() - oracle_img.mean()) / max(oracle_img.mean(), 1e-9) < 0.08
    assert np.abs(ours - oracle_img).mean() < 0.1


def test_triangle_metal_checker_matches_oracle():
    """VERDICT r1 gap: no oracle scene exercised triangles, metal fuzz,
    or checker phase end-to-end.  This one has all three, at 4x the spp
    of the original parity tests (checker phase errors flip individual
    pixels, which shows up in the per-pixel MAD bound)."""
    ck = {"checker": ((0.9, 0.1, 0.1), (0.1, 0.1, 0.9), 2.0)}
    tri = [
        dict(p1=(-2.0, 0.0, -1.5), p2=(2.0, 0.0, -1.5), p3=(0.0, 3.0, -0.5)),
        dict(p1=(2.5, 0.0, 1.0), p2=(4.5, 0.0, 0.0), p3=(3.5, 2.0, 0.5)),
    ]
    for t in tri:
        p1, p2, p3 = (np.asarray(t[k], float) for k in ("p1", "p2", "p3"))
        n = np.cross(p2 - p1, p3 - p1)
        t["normal"] = n / np.linalg.norm(n)
    prims = [
        # ground OFF the sine-lattice node (k=0 would make the odd/even
        # choice rounding noise, uncorrelated between f32 and the oracle)
        {"type": "rect", "axis": 1, "k": 0.25, "a0": -20.0, "a1": 20.0,
         "b0": -20.0, "b1": 20.0, "dir": 1.0,
         "mat": {"type": "lam", "color": ck}},
        {"type": "sphere", "center": (-3.0, 1.0, 1.0), "radius": 1.0,
         "mat": {"type": "metal", "color": (0.8, 0.7, 0.6), "fuzz": 0.35}},
        {"type": "tri", **tri[0],
         "mat": {"type": "lam", "color": (0.2, 0.7, 0.3)}},
        {"type": "tri", **tri[1],
         "mat": {"type": "metal", "color": (0.9, 0.9, 0.9), "fuzz": 0.05}},
    ]
    cam = {"lookfrom": (0.0, 3.0, 9.0), "lookat": (0.0, 1.0, 0.0),
           "up": (0.0, 1.0, 0.0), "vfov": 45.0, "aspect": 1.0,
           "aperture": 0.0, "focus": 10.0}
    res, spp = 20, 192  # 4x the 48-spp original tests
    oracle_img = render_oracle(prims, cam, res, res, spp, 8,
                               (0.7, 0.8, 1.0), seed=5)

    b = SceneBuilder()
    odd = b.solid_texture((0.9, 0.1, 0.1))
    even = b.solid_texture((0.1, 0.1, 0.9))
    ground = b.lambertian(b.checker_texture(odd, even, frequency=2.0))
    b.add_rect("xz", (-20.0, 0.25, -20.0), (20.0, 0.25, 20.0), 1.0, ground)
    b.add_sphere((-3.0, 1.0, 1.0), 1.0, b.metal((0.8, 0.7, 0.6), 0.35))
    b.add_triangle(tri[0]["p1"], tri[0]["p2"], tri[0]["p3"],
                   b.lambertian((0.2, 0.7, 0.3)))
    b.add_triangle(tri[1]["p1"], tri[1]["p2"], tri[1]["p3"],
                   b.metal((0.9, 0.9, 0.9), 0.05))
    scene = b.build(use_bvh=False)
    from rust_pathtracer_tpu.camera import make_camera

    camera = make_camera((0.0, 3.0, 9.0), (0.0, 1.0, 0.0), (0.0, 1.0, 0.0),
                         45.0, 1.0, 0.0, 10.0)
    s = RenderSettings(res, res, 2 * spp, 8, (0.7, 0.8, 1.0))
    ours, _ = render_radiance(scene, camera, s, jax.random.PRNGKey(0))
    ours = np.asarray(ours, np.float64)

    assert abs(ours.mean() - oracle_img.mean()) / oracle_img.mean() < 0.04
    assert np.abs(ours - oracle_img).mean() < 0.06
