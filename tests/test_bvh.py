import jax.numpy as jnp
import numpy as np
import pytest

from rust_pathtracer_tpu.bvh import build_bvh_numpy
from rust_pathtracer_tpu.ops.bvh_traverse import closest_hit_bvh
from rust_pathtracer_tpu.ops.intersect import closest_hit_brute
from rust_pathtracer_tpu.scene.builder import SceneBuilder

INF = 1e30


def _random_scene(rng, n_spheres=40, n_tris=30, n_rects=10):
    b = SceneBuilder()
    m = b.lambertian((0.5, 0.5, 0.5))
    for _ in range(n_spheres):
        b.add_sphere(rng.uniform(-10, 10, 3), rng.uniform(0.2, 1.5), m)
    for _ in range(n_tris):
        p = rng.uniform(-10, 10, 3)
        b.add_triangle(p, p + rng.uniform(-2, 2, 3), p + rng.uniform(-2, 2, 3), m)
    planes = {"xy": 2, "xz": 1, "yz": 0}
    for i, (plane, fixed) in enumerate(
        (p, planes[p]) for _ in range(n_rects // 3 + 1) for p in planes
    ):
        if i >= n_rects:
            break
        s = rng.uniform(-10, 10, 3)
        e = s + rng.uniform(0.5, 4, 3)
        e[fixed] = s[fixed]
        b.add_rect(plane, s, e, 1.0 if i % 2 else -1.0, m)
    return b


@pytest.mark.parametrize("leaf_size", [1, 2, 4])
def test_bvh_matches_brute_force(leaf_size):
    rng = np.random.default_rng(0)
    builder = _random_scene(rng)
    brute = builder.build(use_bvh=False)
    accel = builder.build(use_bvh=True, leaf_size=leaf_size)

    R = 512
    o = jnp.asarray(rng.uniform(-15, 15, (R, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(R, 3)), jnp.float32)

    h1, t1, i1 = closest_hit_brute(brute.prims, o, d, 1e-3, INF)
    h2, t2, i2 = closest_hit_bvh(
        accel.bvh, accel.prims, o, d, 1e-3, INF, leaf_size=leaf_size
    )
    assert np.array_equal(np.asarray(h1), np.asarray(h2))
    hm = np.asarray(h1)
    assert np.allclose(np.asarray(t1)[hm], np.asarray(t2)[hm], rtol=1e-5, atol=1e-4)


def test_flat_bvh_structure():
    rng = np.random.default_rng(1)
    n = 100
    centers = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    bmin = centers - 0.1
    bmax = centers + 0.1
    flat = build_bvh_numpy(bmin, bmax, leaf_size=4)

    # prim_order is a permutation
    assert sorted(flat.prim_order.tolist()) == list(range(n))
    # leaves cover all prims exactly once, contiguous
    leaves = np.flatnonzero(flat.leaf_count > 0)
    total = int(flat.leaf_count[leaves].sum())
    assert total == n
    # every node's bbox contains its prims' bboxes
    for li in leaves:
        f, c = int(flat.leaf_first[li]), int(flat.leaf_count[li])
        prims = flat.prim_order[f : f + c]
        assert (flat.bbox_min[li] <= bmin[prims].min(0) + 1e-6).all()
        assert (flat.bbox_max[li] >= bmax[prims].max(0) - 1e-6).all()
    # miss links: either -1 or a strictly later node
    nodes = flat.miss.shape[0]
    for i in range(nodes):
        assert flat.miss[i] == -1 or flat.miss[i] > i
    # root miss is -1
    assert flat.miss[0] == -1


def test_single_prim_bvh():
    b = SceneBuilder()
    m = b.lambertian((1, 1, 1))
    b.add_sphere((0, 0, -5), 1.0, m)
    scene = b.build(use_bvh=True, leaf_size=4)
    o = jnp.asarray([[0.0, 0.0, 0.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    hit, t, idx = closest_hit_bvh(
        scene.bvh, scene.prims, o, d, 1e-3, INF, leaf_size=scene.leaf_size
    )
    assert bool(hit[0]) and np.isclose(float(t[0]), 4.0)
