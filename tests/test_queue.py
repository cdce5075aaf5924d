"""Pair-queue (v5) closest hit vs the v2 kernel / jnp oracle.

Same contract as test_worklist/test_resident: identical hits, winner
columns, payloads; t within final-ulp matmul accumulation.  The v5
combine is enumeration-order independent (lowest-column tie-break),
so it must match the v2 dense sweep bitwise.
"""

import numpy as np

from rust_pathtracer_tpu.ops.projected import closest_hit_projected
from rust_pathtracer_tpu.ops.queue import build_cluster_queue, closest_hit_queue

from test_projected import _mixed_scene, _rays
from test_worklist import _assert_match, _tables


def test_queue_matches_dense_mixed():
    scene = _mixed_scene(300, 40, 260, seed=7)  # sphere+rect+tri groups
    tables = _tables(scene)
    assert len(tables.group_kinds) >= 5
    o, d = _rays(3000, seed=11)
    res2 = closest_hit_projected(tables, o, d, 1e-3, interpret=True)
    res5 = closest_hit_queue(tables, o, d, 1e-3, interpret=True)
    _assert_match(res2, res5)


def test_queue_matches_dense_sphere_only():
    scene = _mixed_scene(500, 0, 0, seed=3)
    tables = _tables(scene)
    o, d = _rays(2048, seed=5)
    res2 = closest_hit_projected(tables, o, d, 1e-3, interpret=True)
    res5 = closest_hit_queue(tables, o, d, 1e-3, interpret=True)
    _assert_match(res2, res5)


def test_queue_deterministic():
    scene = _mixed_scene(120, 10, 80, seed=9)
    tables = _tables(scene)
    o, d = _rays(1024, seed=2)
    a = closest_hit_queue(tables, o, d, 1e-3, interpret=True)
    b = closest_hit_queue(tables, o, d, 1e-3, interpret=True)
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
    np.testing.assert_array_equal(np.asarray(a[2]), np.asarray(b[2]))


def test_queue_overflow_falls_back():
    scene = _mixed_scene(300, 40, 260, seed=7)
    tables = _tables(scene)
    o, d = _rays(1500, seed=13)
    res2 = closest_hit_projected(tables, o, d, 1e-3, interpret=True)
    # cap_per_ray=0 leaves only padding slack -> guaranteed overflow
    res5 = closest_hit_queue(tables, o, d, 1e-3, interpret=True,
                             cap_per_ray=0)
    _assert_match(res2, res5)


def test_queue_dead_parked_lanes():
    """Parked lanes pass no clusters, enqueue nothing, come back as
    misses."""
    import jax.numpy as jnp

    scene = _mixed_scene(120, 10, 80, seed=4)
    tables = _tables(scene)
    o, d = _rays(1024, seed=6)
    o = np.asarray(o).copy()
    d = np.asarray(d).copy()
    o[:512] = 1e8
    d[:512] = (0.0, 1.0, 0.0)
    o, d = jnp.asarray(o), jnp.asarray(d)
    res2 = closest_hit_projected(tables, o, d, 1e-3, interpret=True)
    res5 = closest_hit_queue(tables, o, d, 1e-3, interpret=True)
    assert not np.asarray(res5[0])[:512].any()
    _assert_match(res2, res5)


def test_queue_build_structure():
    """Queue invariants: segments cluster-contiguous, blocks never
    span clusters, every passing pair present exactly once."""
    import jax.numpy as jnp

    scene = _mixed_scene(200, 20, 150, seed=8)
    tables = _tables(scene)
    o, d = _rays(4096, seed=9)
    qb = 512
    G = tables.cluster_bounds.shape[1]
    qcap = 4 * 4096 + G * qb
    qcap += (-qcap) % qb
    ray_ids, blk_cl, blk_kind, ovf = build_cluster_queue(
        tables.cluster_bounds, tables.group_kinds,
        jnp.asarray(o), jnp.asarray(d), 1e-3, qb, qcap,
    )
    assert not bool(ovf)
    ids = np.asarray(ray_ids)
    cls = np.asarray(blk_cl)
    kinds = np.asarray(blk_kind)
    kinds_ref = np.asarray(tables.group_kinds)
    # per-entry cluster from its block
    ent_cl = np.repeat(cls, qb)
    real = ids >= 0
    # blocks with any real entry carry the right kind
    for b in range(len(cls)):
        seg = ids[b * qb:(b + 1) * qb]
        if (seg >= 0).any():
            assert kinds[b] == kinds_ref[cls[b]]
    # each (ray, cluster) pair appears at most once
    pairs = set(zip(ids[real].tolist(), ent_cl[real].tolist()))
    assert len(pairs) == int(real.sum())
    # cross-check pair count against an independent slab test
    from rust_pathtracer_tpu.ops.intersect import T_MISS

    cb = np.asarray(tables.cluster_bounds, np.float64)
    on, dn = np.asarray(o, np.float64), np.asarray(d, np.float64)
    dn = np.where(np.abs(dn) < 1e-30, np.where(dn < 0, -1e-30, 1e-30), dn)
    lo = np.full((4096, G), 1e-3)
    hi = np.full((4096, G), float(T_MISS))
    for ax in range(3):
        b0 = (cb[ax][None] - on[:, ax:ax + 1]) / dn[:, ax:ax + 1]
        b1 = (cb[3 + ax][None] - on[:, ax:ax + 1]) / dn[:, ax:ax + 1]
        lo = np.maximum(lo, np.minimum(b0, b1))
        hi = np.minimum(hi, np.maximum(b0, b1))
    # f32 vs f64 slab edges can differ; compare loosely
    expect = int((hi >= lo).sum())
    assert abs(len(pairs) - expect) <= 0.01 * max(expect, 1)
