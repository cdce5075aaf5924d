import jax
import jax.numpy as jnp
import numpy as np

from rust_pathtracer_tpu import sampling
from rust_pathtracer_tpu.camera import camera_rays, make_camera


def _lens_keys(n):
    return sampling.lane_keys(jax.random.PRNGKey(0), jnp.arange(n, dtype=jnp.uint32))


def test_center_ray_points_at_lookat():
    cam = make_camera((0, 0, 5), (1, 2, -3), (0, 1, 0), 45.0, 1.5, 0.0, 10.0)
    s = jnp.asarray([0.5])
    t = jnp.asarray([0.5])
    o, d = camera_rays(cam, s, t, _lens_keys(1))
    dn = np.asarray(d[0]) / np.linalg.norm(np.asarray(d[0]))
    want = np.array([1, 2, -3]) - np.array([0, 0, 5])
    want = want / np.linalg.norm(want)
    assert np.allclose(dn, want, atol=1e-6)
    assert np.allclose(np.asarray(o[0]), [0, 0, 5])  # aperture 0: exact origin


def test_fov_geometry():
    # vfov 90 deg, aspect 1: corner ray direction has |y/z| = 1 at t=1
    cam = make_camera((0, 0, 0), (0, 0, -1), (0, 1, 0), 90.0, 1.0, 0.0, 1.0)
    o, d = camera_rays(cam, jnp.asarray([0.5]), jnp.asarray([1.0]), _lens_keys(1))
    d0 = np.asarray(d[0])
    assert np.isclose(d0[1] / -d0[2], 1.0, atol=1e-5)


def test_aperture_jitters_origin_within_lens_radius():
    cam = make_camera((0, 0, 0), (0, 0, -1), (0, 1, 0), 60.0, 1.0, 0.5, 5.0)
    n = 512
    o, d = camera_rays(
        cam, jnp.full((n,), 0.5), jnp.full((n,), 0.5), _lens_keys(n)
    )
    r = np.linalg.norm(np.asarray(o), axis=-1)
    assert r.max() <= 0.25 + 1e-5  # lens_radius = aperture/2 (camera.rs:42)
    assert r.mean() > 0.05
    # all rays still converge on the focal point
    focal = np.asarray(o) + np.asarray(d)
    assert np.allclose(focal, focal[0], atol=1e-4)


def test_focus_distance_scales_viewport():
    # same pixel, two focus distances: directions must converge at the
    # focal plane, i.e. o + d lies at distance focus_dist along -w
    for fd in (1.0, 7.0):
        cam = make_camera((0, 0, 0), (0, 0, -1), (0, 1, 0), 40.0, 2.0, 0.0, fd)
        o, d = camera_rays(cam, jnp.asarray([0.25]), jnp.asarray([0.75]), _lens_keys(1))
        p = np.asarray(o[0] + d[0])
        assert np.isclose(p[2], -fd, atol=1e-5)
