"""Pair-worklist (v3) closest hit vs the v2 kernel / jnp oracle.

The v3 kernel must find exactly the same hits and winners as the
dense-culled v2 sweep for any wavefront layout; t may differ only in
final-ulp matmul accumulation (XLA picks different contraction
schedules per block shape — observed 5/3000 lanes at <1e-5 relative on
the CPU backend, same winner columns).
"""

import numpy as np
import pytest

from rust_pathtracer_tpu.ops.projected import (
    PAY_IDX,
    build_projected,
    closest_hit_projected,
)
from rust_pathtracer_tpu.ops.worklist import build_pair_worklist, closest_hit_pairs

from test_projected import _mixed_scene, _rays


def _tables(scene):
    return build_projected(
        scene.prims.kind, scene.prims.aux, scene.prims.data, scene.prims.mat
    )


def _assert_match(res2, res3):
    h1, t1, pay1 = res2
    h2, t2, pay2 = res3
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
    i1 = np.rint(np.asarray(pay1[:, PAY_IDX])).astype(np.int64)
    i2 = np.rint(np.asarray(pay2[:, PAY_IDX])).astype(np.int64)
    hm = np.asarray(h1)
    np.testing.assert_array_equal(i1[hm], i2[hm])
    np.testing.assert_array_equal(np.asarray(pay1)[hm], np.asarray(pay2)[hm])
    np.testing.assert_allclose(
        np.asarray(t1)[hm], np.asarray(t2)[hm], rtol=1e-5, atol=1e-6
    )


def test_worklist_matches_dense_mixed():
    scene = _mixed_scene(300, 40, 260, seed=7)  # sphere+rect+tri groups
    tables = _tables(scene)
    assert len(tables.group_kinds) >= 5
    o, d = _rays(3000, seed=11)  # non-multiple of 2048 -> padded tail
    res2 = closest_hit_projected(tables, o, d, 1e-3, interpret=True)
    res3 = closest_hit_pairs(tables, o, d, 1e-3, interpret=True)
    _assert_match(res2, res3)


def test_worklist_matches_dense_sphere_only():
    scene = _mixed_scene(500, 0, 0, seed=3)
    tables = _tables(scene)
    o, d = _rays(2048, seed=5)
    res2 = closest_hit_projected(tables, o, d, 1e-3, interpret=True)
    res3 = closest_hit_pairs(tables, o, d, 1e-3, interpret=True)
    _assert_match(res2, res3)


def test_worklist_deterministic():
    scene = _mixed_scene(120, 10, 80, seed=9)
    tables = _tables(scene)
    o, d = _rays(1024, seed=2)
    a = closest_hit_pairs(tables, o, d, 1e-3, interpret=True)
    b = closest_hit_pairs(tables, o, d, 1e-3, interpret=True)
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
    np.testing.assert_array_equal(np.asarray(a[2]), np.asarray(b[2]))


def test_worklist_overflow_falls_back_dense():
    scene = _mixed_scene(300, 40, 260, seed=7)
    tables = _tables(scene)
    o, d = _rays(1500, seed=13)
    res2 = closest_hit_projected(tables, o, d, 1e-3, interpret=True)
    # kcap=1: any block passing >1 cluster overflows -> dense fallback
    res3 = closest_hit_pairs(tables, o, d, 1e-3, interpret=True, kcap=1)
    _assert_match(res2, res3)


def test_worklist_dead_parked_lanes():
    """Parked lanes (dead-ray convention: origin far outside every
    cluster, direction away) must produce no pairs and come back as
    misses."""
    import jax.numpy as jnp

    scene = _mixed_scene(120, 10, 80, seed=4)
    tables = _tables(scene)
    o, d = _rays(1024, seed=6)
    o = np.asarray(o).copy()
    d = np.asarray(d).copy()
    o[:512] = 1e8  # parked block
    d[:512] = (0.0, 1.0, 0.0)
    o, d = jnp.asarray(o), jnp.asarray(d)
    res2 = closest_hit_projected(tables, o, d, 1e-3, interpret=True)
    res3 = closest_hit_pairs(tables, o, d, 1e-3, interpret=True)
    assert not np.asarray(res3[0])[:512].any()
    _assert_match(res2, res3)


def test_worklist_build_structure():
    """Worklist invariants: uniform kcap slots per block, clusters
    ascending, real slots lead, empty slots are kind = -1."""
    import jax.numpy as jnp

    scene = _mixed_scene(200, 20, 150, seed=8)
    tables = _tables(scene)
    o, d = _rays(4096, seed=9)
    rb, kcap = 2048, 12
    meta, _ent, _far, overflow = build_pair_worklist(
        tables.cluster_bounds, tables.group_kinds,
        jnp.asarray(o), jnp.asarray(d), 1e-3, rb, kcap,
    )
    assert not bool(overflow)
    m = np.asarray(meta)
    nblocks = 4096 // rb
    kcap_eff = m.shape[1] // nblocks
    assert kcap_eff <= kcap
    cid, kind = m.reshape(2, nblocks, kcap_eff)
    kinds_ref = np.asarray(tables.group_kinds)
    for bkt in range(nblocks):
        real = kind[bkt] >= 0
        n = int(real.sum())
        assert real[:n].all() and not real[n:].any()  # real slots lead
        inner = cid[bkt][real]
        assert (np.diff(inner) > 0).all()  # clusters ascending
        np.testing.assert_array_equal(kinds_ref[inner], kind[bkt][real])
