"""Pallas fused closest-hit kernel vs the jnp oracle (interpret mode).

On real TPU the same comparison runs compiled (verified on-device:
bitwise-identical hits, 1.85x faster than the jnp sweep).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rust_pathtracer_tpu.models import get_scene
from rust_pathtracer_tpu.ops.intersect import closest_hit_brute
from rust_pathtracer_tpu.ops.pallas_intersect import closest_hit_pallas
from rust_pathtracer_tpu.scene.builder import SceneBuilder


def _compare(scene, o, d):
    h1, t1, i1 = closest_hit_brute(
        scene.prims, o, d, 1e-3, 1e30, prim_types=scene.prim_types
    )
    h2, t2, i2 = closest_hit_pallas(scene, o, d, 1e-3, interpret=True)
    assert np.array_equal(np.asarray(h1), np.asarray(h2))
    hm = np.asarray(h1)
    assert np.allclose(np.asarray(t1)[hm], np.asarray(t2)[hm], rtol=1e-5, atol=1e-3)
    assert np.array_equal(np.asarray(i1)[hm], np.asarray(i2)[hm])


def test_pallas_matches_jnp_cornell():
    scene = get_scene("CornellBox").build()
    assert scene.kinds_static is not None
    rng = np.random.default_rng(0)
    R = 1500  # not a multiple of the 1024-lane block: exercises padding
    o = jnp.asarray(rng.uniform(0, 555, (R, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(R, 3)), jnp.float32)
    _compare(scene, o, d)


def test_pallas_matches_jnp_mixed_types():
    b = SceneBuilder()
    m = b.lambertian((0.5, 0.5, 0.5))
    rng = np.random.default_rng(1)
    for _ in range(10):
        b.add_sphere(rng.uniform(-5, 5, 3), rng.uniform(0.3, 1.2), m)
    for _ in range(8):
        p = rng.uniform(-5, 5, 3)
        b.add_triangle(p, p + rng.uniform(-2, 2, 3), p + rng.uniform(-2, 2, 3), m)
    for plane, fixed in [("xy", 2), ("xz", 1), ("yz", 0)]:
        s = rng.uniform(-5, 5, 3)
        e = s + rng.uniform(1, 3, 3)
        e[fixed] = s[fixed]
        b.add_rect(plane, s, e, 1.0, m)
    scene = b.build(use_bvh=False)
    o = jnp.asarray(rng.uniform(-7, 7, (700, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(700, 3)), jnp.float32)
    _compare(scene, o, d)


def test_mid_size_scene_carries_projected_tables():
    # SphereField (514 prims) carries BOTH: a BVH for the CPU path and
    # projected-sweep tables for the TPU MXU kernel (too large for the
    # unrolled v1 sweep's static kind table)
    scene = get_scene("SphereField").build()
    assert scene.bvh is not None
    assert scene.kinds_static is None
    assert scene.proj is not None and scene.proj.num_cols >= scene.num_prims


def test_fused_record_kernel_matches_hit_record():
    from rust_pathtracer_tpu.ops.intersect import hit_record
    from rust_pathtracer_tpu.ops.pallas_intersect import closest_hit_record_pallas

    scene = get_scene("CornellBox").build()
    rng = np.random.default_rng(5)
    R = 1500
    o = jnp.asarray(rng.uniform(0, 555, (R, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(R, 3)), jnp.float32)
    h1, t1, i1 = closest_hit_brute(
        scene.prims, o, d, 1e-3, 1e30, prim_types=scene.prim_types
    )
    rec1 = hit_record(scene.prims, i1, o, d, jnp.where(h1, t1, 1.0), h1,
                      scene.prim_types)
    h2, t2, i2, rec2 = closest_hit_record_pallas(scene, o, d, 1e-3, interpret=True)
    hm = np.asarray(h1)
    assert np.array_equal(np.asarray(h1), np.asarray(h2))
    assert np.array_equal(np.asarray(i1)[hm], np.asarray(i2)[hm])
    assert np.allclose(np.asarray(rec1.u)[hm], np.asarray(rec2.u)[hm], atol=1e-5)
    assert np.allclose(np.asarray(rec1.v)[hm], np.asarray(rec2.v)[hm], atol=1e-5)
    assert np.allclose(
        np.asarray(rec1.normal)[hm], np.asarray(rec2.normal)[hm], atol=2e-5
    )
    assert np.array_equal(
        np.asarray(rec1.front_face)[hm], np.asarray(rec2.front_face)[hm]
    )
    assert np.array_equal(np.asarray(rec1.mat)[hm], np.asarray(rec2.mat)[hm])
    assert np.allclose(
        np.asarray(rec1.point)[hm], np.asarray(rec2.point)[hm], rtol=1e-4, atol=1e-2
    )
