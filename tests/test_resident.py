"""Table-resident (v4) closest hit vs the v2 kernel / jnp oracle.

Same contract as test_worklist: identical hits/winners/payloads for
any wavefront layout, t within final-ulp matmul accumulation.
"""

import numpy as np

from rust_pathtracer_tpu.ops.projected import (
    build_projected,
    closest_hit_projected,
)
from rust_pathtracer_tpu.ops.resident import closest_hit_resident

from test_projected import _mixed_scene, _rays
from test_worklist import _assert_match, _tables


def test_resident_matches_dense_mixed():
    scene = _mixed_scene(300, 40, 260, seed=7)  # sphere+rect+tri groups
    tables = _tables(scene)
    assert len(tables.group_kinds) >= 5
    o, d = _rays(3000, seed=11)  # non-multiple of block -> padded tail
    res2 = closest_hit_projected(tables, o, d, 1e-3, interpret=True)
    res4 = closest_hit_resident(tables, o, d, 1e-3, interpret=True)
    _assert_match(res2, res4)


def test_resident_matches_dense_sphere_only():
    scene = _mixed_scene(500, 0, 0, seed=3)
    tables = _tables(scene)
    o, d = _rays(2048, seed=5)
    res2 = closest_hit_projected(tables, o, d, 1e-3, interpret=True)
    res4 = closest_hit_resident(tables, o, d, 1e-3, interpret=True)
    _assert_match(res2, res4)


def test_resident_deterministic():
    scene = _mixed_scene(120, 10, 80, seed=9)
    tables = _tables(scene)
    o, d = _rays(1024, seed=2)
    a = closest_hit_resident(tables, o, d, 1e-3, interpret=True)
    b = closest_hit_resident(tables, o, d, 1e-3, interpret=True)
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
    np.testing.assert_array_equal(np.asarray(a[2]), np.asarray(b[2]))


def test_resident_overflow_falls_back_dense():
    scene = _mixed_scene(300, 40, 260, seed=7)
    tables = _tables(scene)
    o, d = _rays(1500, seed=13)
    res2 = closest_hit_projected(tables, o, d, 1e-3, interpret=True)
    # kcap=1: any block passing >1 cluster overflows -> dense fallback
    res4 = closest_hit_resident(tables, o, d, 1e-3, interpret=True, kcap=1)
    _assert_match(res2, res4)


def test_resident_dead_parked_lanes():
    """Parked lanes (dead-ray convention) produce no slots and come
    back as misses."""
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
    res4 = closest_hit_resident(tables, o, d, 1e-3, interpret=True)
    assert not np.asarray(res4[0])[:512].any()
    _assert_match(res2, res4)


def test_resident_tprune_bitwise(monkeypatch):
    """Block-level t-pruning (entry-sorted slots + in-kernel early
    exit) must be bitwise-invisible: skipped clusters provably cannot
    improve any lane, and the column tie-break makes the winner
    slot-order-independent.  Mixed live/parked lanes exercise the
    live-lane max exclusion."""
    import jax
    import jax.numpy as jnp

    scene = _mixed_scene(300, 40, 260, seed=7)
    tables = _tables(scene)
    o, d = _rays(4096, seed=21)
    o = np.asarray(o).copy()
    o[1024:1536] = 3.0e33  # parked (dead) lanes mid-wavefront
    o = jnp.asarray(o)
    results = {}
    for flag in ("1", "0"):
        monkeypatch.setenv("RPT_RES_TPRUNE", flag)
        jax.clear_caches()
        results[flag] = closest_hit_resident(tables, o, d, 1e-3,
                                             interpret=True)
    monkeypatch.delenv("RPT_RES_TPRUNE")
    for a, b in zip(results["1"], results["0"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    jax.clear_caches()


def test_resident_matches_worklist_bitwise():
    """v4 and v3 enumerate identical slot lists -> bitwise-equal t."""
    from rust_pathtracer_tpu.ops.worklist import closest_hit_pairs

    scene = _mixed_scene(200, 20, 150, seed=8)
    tables = _tables(scene)
    o, d = _rays(4096, seed=9)
    h3, t3, p3 = closest_hit_pairs(tables, o, d, 1e-3, interpret=True)
    h4, t4, p4 = closest_hit_resident(tables, o, d, 1e-3, interpret=True)
    np.testing.assert_array_equal(np.asarray(h3), np.asarray(h4))
    np.testing.assert_array_equal(np.asarray(t3), np.asarray(t4))
    np.testing.assert_array_equal(np.asarray(p3), np.asarray(p4))


def test_resident_when_skip_bitwise(monkeypatch):
    """Per-slot epilogue skip (RPT_RES_WHEN=1): slots where no lane
    can improve (every group-min strictly above the running best) skip
    the argmin + payload contraction entirely — the guard is exactly
    any(take-possible), so hits/winners/payloads are bitwise identical
    with the skip on or off."""
    import jax
    import jax.numpy as jnp

    scene = _mixed_scene(300, 40, 260, seed=7)
    tables = _tables(scene)
    o, d = _rays(4096, seed=23)
    o = np.asarray(o).copy()
    o[512:1024] = 3.0e33  # parked (dead) lanes mid-wavefront
    o = jnp.asarray(o)
    results = {}
    for flag in ("1", "0"):
        monkeypatch.setenv("RPT_RES_WHEN", flag)
        jax.clear_caches()
        results[flag] = closest_hit_resident(tables, o, d, 1e-3,
                                             interpret=True)
    monkeypatch.delenv("RPT_RES_WHEN")
    for a, b in zip(results["1"], results["0"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    jax.clear_caches()
