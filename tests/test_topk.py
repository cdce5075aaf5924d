"""Top-K entry-ordered (v6) closest hit vs the v2 kernel / jnp oracle.

Same contract as the other kernel tests: identical hits, winner
columns, payloads; t within final-ulp matmul accumulation.  Small k
values force the fixup path; k >= G skips it statically.
"""

import numpy as np
import pytest

from rust_pathtracer_tpu.ops.projected import PAY_IDX, closest_hit_projected
from rust_pathtracer_tpu.ops.topk import closest_hit_topk, topk_entry_clusters

from test_projected import _mixed_scene, _rays
from test_worklist import _tables


def _assert_match(res2, res6):
    """Like test_worklist._assert_match but with t rtol 1e-4: the v6
    LHS is the gathered queue (different row count), and the CPU
    interpret backend's 8-element dot picks a different accumulation
    order per LHS shape — last-ulp projection noise amplified by the
    sphere quadratic reaches ~3e-5 relative on t.  Hits, winner
    indices and payload rows still match EXACTLY (checked below); the
    MXU path is bitwise-deterministic (verified on-chip for v4/v5)."""
    h1, t1, pay1 = res2
    h2, t2, pay2 = res6
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
    i1 = np.rint(np.asarray(pay1[:, PAY_IDX])).astype(np.int64)
    i2 = np.rint(np.asarray(pay2[:, PAY_IDX])).astype(np.int64)
    hm = np.asarray(h1)
    np.testing.assert_array_equal(i1[hm], i2[hm])
    np.testing.assert_array_equal(np.asarray(pay1)[hm], np.asarray(pay2)[hm])
    np.testing.assert_allclose(
        np.asarray(t1)[hm], np.asarray(t2)[hm], rtol=1e-4, atol=1e-6
    )


@pytest.mark.parametrize("k", [2, 6, None])
def test_topk_matches_dense_mixed(k):
    scene = _mixed_scene(300, 40, 260, seed=7)  # sphere+rect+tri groups
    tables = _tables(scene)
    assert len(tables.group_kinds) >= 5
    o, d = _rays(3000, seed=11)
    res2 = closest_hit_projected(tables, o, d, 1e-3, interpret=True)
    res6 = closest_hit_topk(tables, o, d, 1e-3, interpret=True, k=k)
    _assert_match(res2, res6)


def test_topk_matches_dense_sphere_only():
    scene = _mixed_scene(500, 0, 0, seed=3)
    tables = _tables(scene)
    o, d = _rays(2048, seed=5)
    res2 = closest_hit_projected(tables, o, d, 1e-3, interpret=True)
    res6 = closest_hit_topk(tables, o, d, 1e-3, interpret=True)
    _assert_match(res2, res6)


def test_topk_k1_fixup_heavy():
    """k=1 resolves almost nothing in-sweep -> the fixup must carry
    correctness alone."""
    scene = _mixed_scene(200, 20, 150, seed=8)
    tables = _tables(scene)
    o, d = _rays(2048, seed=9)
    res2 = closest_hit_projected(tables, o, d, 1e-3, interpret=True)
    res6 = closest_hit_topk(tables, o, d, 1e-3, interpret=True, k=1)
    _assert_match(res2, res6)


def test_topk_deterministic():
    scene = _mixed_scene(120, 10, 80, seed=9)
    tables = _tables(scene)
    o, d = _rays(1024, seed=2)
    a = closest_hit_topk(tables, o, d, 1e-3, interpret=True)
    b = closest_hit_topk(tables, o, d, 1e-3, interpret=True)
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
    np.testing.assert_array_equal(np.asarray(a[2]), np.asarray(b[2]))


def test_topk_dead_parked_lanes():
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
    res6 = closest_hit_topk(tables, o, d, 1e-3, interpret=True)
    assert not np.asarray(res6[0])[:512].any()
    _assert_match(res2, res6)


def test_topk_extraction_structure():
    """Extraction invariants: per-ray clusters are distinct, entry-
    ordered, and exactly the slab-passing set when k >= G."""
    import jax.numpy as jnp

    scene = _mixed_scene(200, 20, 150, seed=8)
    tables = _tables(scene)
    o, d = _rays(512, seed=3)
    G = tables.cluster_bounds.shape[1]
    cl, bound = topk_entry_clusters(
        tables.cluster_bounds, jnp.asarray(o), jnp.asarray(d), 1e-3, G
    )
    cl = np.asarray(cl)
    assert np.asarray(bound).max() >= 3e38  # k = G -> no excluded cluster
    for r in range(0, 512, 37):
        row = cl[r][cl[r] >= 0]
        assert len(set(row.tolist())) == len(row)  # distinct
        n = len(row)
        assert (cl[r][n:] == -1).all()  # real slots lead
