"""Projected-sweep (v2 MXU kernel) correctness vs the jnp oracles."""

import jax.numpy as jnp
import numpy as np
import pytest

from rust_pathtracer_tpu.ops.intersect import T_MISS, closest_hit_brute
from rust_pathtracer_tpu.ops.projected import (
    PAY_IDX,
    build_projected,
    closest_hit_projected,
    closest_hit_projected_ref,
)
from rust_pathtracer_tpu.scene.builder import SceneBuilder
from rust_pathtracer_tpu.models import get_scene


def _mixed_scene(n_spheres=40, n_rects=12, n_tris=30, seed=0):
    rng = np.random.default_rng(seed)
    b = SceneBuilder()
    m = b.lambertian((0.5, 0.5, 0.5))
    for _ in range(n_spheres):
        b.add_sphere(rng.uniform(-8, 8, 3), rng.uniform(0.3, 1.2), m)
    for _ in range(n_rects):
        plane = ["xy", "xz", "yz"][rng.integers(3)]
        fixed = {"xy": 2, "xz": 1, "yz": 0}[plane]
        s = rng.uniform(-8, 8, 3)
        e = s + rng.uniform(0.5, 3.0, 3)
        e[fixed] = s[fixed]
        b.add_rect(plane, s, e, 1.0 if rng.random() < 0.5 else -1.0, m)
    for _ in range(n_tris):
        p0 = rng.uniform(-8, 8, 3)
        b.add_triangle(p0, p0 + rng.uniform(-2, 2, 3), p0 + rng.uniform(-2, 2, 3), m)
    return b.build(use_bvh=False)


def _rays(n, seed=1):
    rng = np.random.default_rng(seed)
    o = jnp.asarray(rng.uniform(-10, 10, (n, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    return o, d


def test_projected_ref_matches_brute_mixed():
    scene = _mixed_scene()
    tables = build_projected(
        scene.prims.kind, scene.prims.aux, scene.prims.data, scene.prims.mat
    )
    o, d = _rays(1024)
    h1, t1, i1 = closest_hit_brute(scene.prims, o, d, 1e-3, 1e30, scene.prim_types)
    h2, t2, pay = closest_hit_projected_ref(tables, o, d, 1e-3)
    i2 = np.rint(np.asarray(pay[:, PAY_IDX])).astype(np.int64)
    h1, h2 = np.asarray(h1), np.asarray(h2)
    # Woop vs MT can disagree only within float noise of cull/bounds
    # edges; on random rays hits and winners must agree everywhere
    assert (h1 == h2).mean() > 0.999
    both = h1 & h2
    assert (np.asarray(i1)[both] == i2[both]).mean() > 0.999
    same = both & (np.asarray(i1) == i2)
    np.testing.assert_allclose(
        np.asarray(t1)[same], np.asarray(t2)[same], rtol=2e-4
    )


def test_projected_payload_rows():
    scene = _mixed_scene(5, 3, 4)
    tables = build_projected(
        scene.prims.kind, scene.prims.aux, scene.prims.data, scene.prims.mat
    )
    o, d = _rays(256, seed=3)
    h, t, pay = closest_hit_projected_ref(tables, o, d, 1e-3)
    h = np.asarray(h)
    idx = np.rint(np.asarray(pay[:, PAY_IDX])).astype(np.int64)
    kinds = np.rint(np.asarray(pay[:, 12])).astype(np.int64)
    data = np.asarray(scene.prims.data)
    for lane in np.nonzero(h)[0][:50]:
        p = idx[lane]
        assert kinds[lane] == int(np.asarray(scene.prims.kind)[p])
        np.testing.assert_array_equal(np.asarray(pay[lane, :12]), data[p])


def test_pallas_projected_matches_ref_interpret():
    scene = _mixed_scene(60, 20, 50, seed=7)
    tables = build_projected(
        scene.prims.kind, scene.prims.aux, scene.prims.data, scene.prims.mat
    )
    o, d = _rays(777, seed=11)  # non-multiple of block to test padding
    h1, t1, pay1 = closest_hit_projected_ref(tables, o, d, 1e-3)
    h2, t2, pay2 = closest_hit_projected(tables, o, d, 1e-3, interpret=True)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
    hm = np.asarray(h1)
    # kernel vs einsum: same math, different FMA contraction order
    np.testing.assert_allclose(
        np.asarray(t1)[hm], np.asarray(t2)[hm], rtol=1e-5, atol=1e-5
    )
    i1 = np.rint(np.asarray(pay1[:, PAY_IDX])).astype(np.int64)
    i2 = np.rint(np.asarray(pay2[:, PAY_IDX])).astype(np.int64)
    same = hm & (i1 == i2)
    assert same[hm].mean() > 0.999
    np.testing.assert_array_equal(np.asarray(pay1)[same], np.asarray(pay2)[same])


def test_pallas_projected_multiblock_interpret():
    from rust_pathtracer_tpu.ops.projected import COL_BLOCK

    # force the streaming path (max_single_cols below the column count)
    # so the sequential p-block accumulation is exercised
    scene = _mixed_scene(1700, 30, 600, seed=5)
    tables = build_projected(
        scene.prims.kind, scene.prims.aux, scene.prims.data, scene.prims.mat,
        max_single_cols=COL_BLOCK,
    )
    assert tables.num_cols > COL_BLOCK and tables.col_block == COL_BLOCK
    o, d = _rays(512, seed=13)
    h1, t1, pay1 = closest_hit_projected_ref(tables, o, d, 1e-3)
    h2, t2, pay2 = closest_hit_projected(tables, o, d, 1e-3, interpret=True)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
    hm = np.asarray(h1)
    np.testing.assert_allclose(
        np.asarray(t1)[hm], np.asarray(t2)[hm], rtol=1e-5, atol=1e-5
    )
    i1 = np.rint(np.asarray(pay1[:, PAY_IDX])).astype(np.int64)
    i2 = np.rint(np.asarray(pay2[:, PAY_IDX])).astype(np.int64)
    assert (i1[hm] == i2[hm]).mean() > 0.999


def test_projected_spherefield_scene():
    scene = get_scene("SphereField").build()
    tables = build_projected(
        scene.prims.kind, scene.prims.aux, scene.prims.data, scene.prims.mat
    )
    o, d = _rays(512, seed=17)
    h1, t1, i1 = closest_hit_brute(
        scene.prims, o, d, 1e-3, 1e30, scene.prim_types
    )
    h2, t2, pay = closest_hit_projected_ref(tables, o, d, 1e-3)
    i2 = np.rint(np.asarray(pay[:, PAY_IDX])).astype(np.int64)
    assert (np.asarray(h1) == np.asarray(h2)).mean() > 0.998
    both = np.asarray(h1) & np.asarray(h2) & (np.asarray(i1) == i2)
    # the expanded quadratic (onorm - 2 o.c + (|c|^2 - r^2)) loses
    # ~1e-4 absolute on the r=1000 ground sphere vs brute's |o-c|^2
    # form; relative error only looks large where t itself is tiny
    np.testing.assert_allclose(
        np.asarray(t1)[both], np.asarray(t2)[both], rtol=1e-3, atol=5e-5
    )


def test_record_projected_matches_jnp_record(monkeypatch):
    from rust_pathtracer_tpu.ops import projected as proj_mod
    from rust_pathtracer_tpu.ops.intersect import closest_hit_brute, hit_record

    scene = _mixed_scene(200, 20, 60, seed=9)
    o, d = _rays(600, seed=21)
    h1, t1, i1 = closest_hit_brute(
        scene.prims, o, d, 1e-3, 1e30, scene.prim_types
    )
    rec1 = hit_record(
        scene.prims, i1, o, d, jnp.where(h1, t1, 1.0), h1,
        prim_types=scene.prim_types,
    )
    h2, t2, i2, rec2, _, _cl = proj_mod.closest_hit_record_projected(
        scene, o, d, 1e-3, interpret=True
    )
    both = np.asarray(h1) & np.asarray(h2)
    hm = both & (np.asarray(i1) == np.asarray(i2))
    assert hm[both].mean() > 0.98  # same winners on hitting rays
    for name in ("normal", "front_face", "u", "v", "mat"):
        a = np.asarray(getattr(rec1, name))[hm]
        b = np.asarray(getattr(rec2, name))[hm]
        if a.dtype == bool or a.dtype.kind == "i":
            np.testing.assert_array_equal(a, b)
        else:
            # Woop-vs-MT t differences propagate into point -> normal
            np.testing.assert_allclose(a, b, rtol=1e-3, atol=5e-4)


def test_cluster_bounds_contain_members():
    from rust_pathtracer_tpu.ops.projected import GROUP

    scene = _mixed_scene(150, 30, 90, seed=4)
    tables = build_projected(
        scene.prims.kind, scene.prims.aux, scene.prims.data, scene.prims.mat
    )
    cb = np.asarray(tables.cluster_bounds)  # (6, C/GROUP)
    pay = np.asarray(tables.payload)
    kinds = np.rint(pay[:, 12]).astype(int)
    data = pay[:, :12]
    for c in range(tables.num_cols):
        g = c // GROUP
        tk = kinds[c]
        if pay[c].sum() == 0 and data[c].sum() == 0:
            continue  # padding column
        if tk == 0:  # sphere
            lo = data[c, 0:3] - abs(data[c, 3])
            hi = data[c, 0:3] + abs(data[c, 3])
        elif tk == 1:  # rect: fixed axis from aux
            f = int(np.rint(pay[c, 13]))
            fa, fb = {0: (1, 2), 1: (0, 2), 2: (0, 1)}[f]
            lo = np.empty(3); hi = np.empty(3)
            lo[f] = hi[f] = data[c, 0]
            lo[fa], hi[fa] = data[c, 1], data[c, 3]
            lo[fb], hi[fb] = data[c, 2], data[c, 4]
        else:  # triangle
            vs = np.stack([data[c, 0:3], data[c, 0:3] + data[c, 3:6],
                           data[c, 0:3] + data[c, 6:9]])
            lo, hi = vs.min(0), vs.max(0)
        assert (cb[0:3, g] <= lo + 1e-4).all(), (c, g)
        assert (cb[3:6, g] >= hi - 1e-4).all(), (c, g)


def test_payload_shading_matches_table_shading():
    from rust_pathtracer_tpu.ops import projected as proj_mod
    from rust_pathtracer_tpu.materials import shade_inputs

    rng = np.random.default_rng(33)
    b = SceneBuilder()
    ck = b.checker_texture(b.solid_texture((0.1, 0.2, 0.3)),
                           b.solid_texture((0.9, 0.8, 0.7)))
    pn = b.perlin_texture(3.0)
    mats = [
        b.lambertian(ck), b.lambertian(pn), b.metal((0.8, 0.7, 0.6), 0.3),
        b.dielectric(1.5), b.diffuse_light((4.0, 5.0, 6.0)),
    ]
    for _ in range(200):
        b.add_sphere(rng.uniform(-8, 8, 3), rng.uniform(0.3, 1.0),
                     mats[rng.integers(len(mats))])
    scene = b.build(use_bvh=False)
    assert scene.proj is not None and scene.proj.shade_ready

    o, d = _rays(512, seed=41)
    hit, t, idx, rec, shade_row, _cl = proj_mod.closest_hit_record_projected(
        scene, o, d, 1e-3, interpret=True
    )
    assert shade_row is not None
    si_pay = shade_inputs(scene, rec, shade_row)
    si_tab = shade_inputs(scene, rec, None)
    hm = np.asarray(hit)
    np.testing.assert_array_equal(
        np.asarray(si_pay.kind)[hm], np.asarray(si_tab.kind)[hm]
    )
    np.testing.assert_array_equal(
        np.asarray(si_pay.fuzz)[hm], np.asarray(si_tab.fuzz)[hm]
    )
    np.testing.assert_array_equal(
        np.asarray(si_pay.ir)[hm], np.asarray(si_tab.ir)[hm]
    )
    np.testing.assert_allclose(
        np.asarray(si_pay.value)[hm], np.asarray(si_tab.value)[hm],
        rtol=1e-6, atol=1e-6,
    )


def test_binned_matches_unbinned():
    """Sorting rays by cluster must not change any per-ray decision.

    Hits and winning primitives must agree exactly; t only to ~1e-4
    relative, because XLA:CPU's fused interpret-mode matmul contracts
    with different FMA alignment depending on a row's position inside
    the SIMD panel (measured ~2e-5 relative jitter under permutation —
    the TPU MXU streams each row identically, so this is an interpret-
    mode artifact, not a property of the binned path).
    """
    from rust_pathtracer_tpu.ops.projected import (
        closest_hit_projected_binned,
    )

    scene = _mixed_scene(1700, 30, 600, seed=5)  # multi p-block
    tables = build_projected(
        scene.prims.kind, scene.prims.aux, scene.prims.data, scene.prims.mat
    )
    o, d = _rays(913, seed=23)
    # park some lanes the way the integrator parks dead ones
    on = np.array(o)
    on[::7] = 3.0e33
    o = jnp.asarray(on)
    h1, t1, pay1 = closest_hit_projected(tables, o, d, 1e-3, interpret=True)
    h2, t2, pay2 = closest_hit_projected_binned(
        tables, o, d, 1e-3, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
    hm = np.asarray(h1)
    i1 = np.rint(np.asarray(pay1[:, PAY_IDX])).astype(np.int64)
    i2 = np.rint(np.asarray(pay2[:, PAY_IDX])).astype(np.int64)
    np.testing.assert_array_equal(i1[hm], i2[hm])
    np.testing.assert_array_equal(np.asarray(pay1)[hm], np.asarray(pay2)[hm])
    np.testing.assert_allclose(
        np.asarray(t1)[hm], np.asarray(t2)[hm], rtol=1e-4, atol=5e-5
    )


def test_cluster_entry_key_sanity():
    from rust_pathtracer_tpu.ops.projected import GROUP, cluster_entry_key

    scene = _mixed_scene(300, 0, 0, seed=6)
    tables = build_projected(
        scene.prims.kind, scene.prims.aux, scene.prims.data, scene.prims.mat
    )
    G = tables.cluster_bounds.shape[1]
    o, d = _rays(512, seed=29)
    key = np.asarray(cluster_entry_key(tables.cluster_bounds, o, d, 1e-3))
    assert key.min() >= 0 and key.max() <= G
    # a parked (dead) lane must get the miss key
    o_dead = jnp.full((4, 3), 3.0e33, jnp.float32)
    kd = np.asarray(cluster_entry_key(tables.cluster_bounds, o_dead, d[:4], 1e-3))
    np.testing.assert_array_equal(kd, G)
    # a ray aimed straight at a known primitive must key to its cluster
    ctr = np.asarray(scene.prims.data)[0, 0:3]
    o1 = jnp.asarray((ctr + np.array([0.0, 0.0, 30.0]))[None, :], jnp.float32)
    d1 = jnp.asarray(np.array([[0.0, 0.0, -1.0]]), jnp.float32)
    k1 = int(cluster_entry_key(tables.cluster_bounds, o1, d1, 1e-3)[0])
    pay = np.asarray(tables.payload)
    col = int(np.nonzero(np.rint(pay[:, 15]).astype(int) == 0)[0][0])
    # nearest-entry cluster: at minimum it must be a real (hittable) one
    assert k1 < G


def test_single_pblock_whole_table_matches_streamed():
    """The VMEM-resident single-p-block layout (default for <=16384
    cols) must agree with the streamed COL_BLOCK layout."""
    from rust_pathtracer_tpu.ops.projected import COL_BLOCK

    scene = _mixed_scene(1700, 30, 600, seed=5)
    args = (scene.prims.kind, scene.prims.aux, scene.prims.data,
            scene.prims.mat)
    t_single = build_projected(*args)
    t_stream = build_projected(*args, max_single_cols=COL_BLOCK)
    assert t_single.col_block == t_single.num_cols
    o, d = _rays(777, seed=31)
    h1, t1, pay1 = closest_hit_projected(t_single, o, d, 1e-3, interpret=True)
    h2, t2, pay2 = closest_hit_projected(t_stream, o, d, 1e-3, interpret=True)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
    hm = np.asarray(h1)
    i1 = np.rint(np.asarray(pay1[:, PAY_IDX])).astype(np.int64)
    i2 = np.rint(np.asarray(pay2[:, PAY_IDX])).astype(np.int64)
    np.testing.assert_array_equal(i1[hm], i2[hm])
    np.testing.assert_allclose(
        np.asarray(t1)[hm], np.asarray(t2)[hm], rtol=1e-4, atol=5e-5
    )


def test_super_cluster_size_invariance():
    """The hierarchical skip (super_groups) is conservative culling
    only — every size must produce identical hits/winners."""
    from rust_pathtracer_tpu.ops.projected import _closest_hit_projected

    scene = _mixed_scene(900, 20, 300, seed=8)
    tables = build_projected(
        scene.prims.kind, scene.prims.aux, scene.prims.data, scene.prims.mat
    )
    o, d = _rays(640, seed=37)
    rays = jnp.concatenate(
        [o, d, jnp.ones((640, 1)), jnp.zeros((640, 1))], axis=1
    )
    rays = jnp.pad(rays, ((0, 1024 - 640), (0, 0)))
    outs = []
    for sg in (1, 4, 8, 64):
        t, c, pay = _closest_hit_projected(
            rays, tables.a, tables.b, tables.const, tables.payload,
            tables.cluster_bounds_v, group_kinds=tables.group_kinds,
            t_min=1e-3, block_rows=4, interpret=True,
            col_block=tables.col_block, super_groups=sg,
        )
        outs.append((np.asarray(t[:640]), np.asarray(c[:640])))
    for t, c in outs[1:]:
        np.testing.assert_array_equal(c, outs[0][1])
        np.testing.assert_array_equal(t, outs[0][0])


def test_padding_groups_fail_slab_and_binning():
    """Streaming tables pad the column count to COL_BLOCK multiples
    with whole -1 groups.  Their AABBs must be DEGENERATE FAR POINTS,
    not inverted boxes: every slab test here sorts the planes per
    axis, which turns an inverted box into an unbounded always-pass
    one — silently defeating the kernel skip hierarchy and sending
    every miss/outside ray to a bogus padding bin (review finding,
    round 2)."""
    import numpy as np

    from rust_pathtracer_tpu.ops.projected import (
        build_projected,
        closest_hit_projected,
        closest_hit_projected_ref,
        cluster_entry_key,
    )
    from rust_pathtracer_tpu.scene.builder import SceneBuilder

    rng = np.random.default_rng(7)
    b = SceneBuilder()
    m = b.lambertian((0.5, 0.5, 0.5))
    for p in rng.uniform(-10, 10, (700, 3)):
        b.add_sphere(tuple(p), 0.08, m)
    pr = b.build(use_bvh=False).prims
    tab = build_projected(
        np.asarray(pr.kind), np.asarray(pr.aux), np.asarray(pr.data),
        np.asarray(pr.mat), max_single_cols=256,  # force streaming
    )
    gk = np.asarray(tab.group_kinds)
    assert (gk == -1).sum() > 0  # the case under test
    cb = np.asarray(tab.cluster_bounds)
    assert not ((cb[0] > cb[3]) | (cb[1] > cb[4]) | (cb[2] > cb[5])).any()

    # rays pointing away from everything must bin to the miss key G,
    # never to a padding cluster
    G = cb.shape[1]
    o = jnp.full((128, 3), 40.0, jnp.float32)
    d = jnp.asarray(rng.normal(size=(128, 3)) + 5.0, jnp.float32)
    key = np.asarray(cluster_entry_key(tab.cluster_bounds, o, d, 1e-3))
    assert (key == G).all()

    # hitting rays bin only to real clusters; kernel == ref on the
    # padded streaming table
    o2 = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 30.0]), (256, 3))
    d2 = jnp.asarray(rng.normal(size=(256, 3)) * [1, 1, 0.2] - [0, 0, 3],
                     jnp.float32)
    k2 = np.asarray(cluster_entry_key(tab.cluster_bounds, o2, d2, 1e-3))
    real = set(np.where(gk != -1)[0].tolist()) | {G}
    assert set(np.unique(k2).tolist()).issubset(real)
    h1, _, p1 = closest_hit_projected(tab, o2, d2, 1e-3, interpret=True)
    h2, _, p2 = closest_hit_projected_ref(tab, o2, d2, 1e-3)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
    hm = np.asarray(h1)
    np.testing.assert_array_equal(np.asarray(p1)[hm], np.asarray(p2)[hm])


def test_passset_perm_properties():
    """passset_perm (the round-2.5 reorder key): a valid permutation,
    live lanes strictly before dead lanes, and live lanes grouped so
    the packed pass-set keys are lexicographically nondecreasing —
    identical pass-sets land in contiguous runs (the property that
    collapses block-union sweep work; tools/passset_union.py)."""
    from rust_pathtracer_tpu.ops.projected import (
        passset_perm,
        passset_sort_keys,
    )

    scene = _mixed_scene()
    tables = build_projected(
        scene.prims.kind, scene.prims.aux, scene.prims.data, scene.prims.mat
    )
    o, d = _rays(2048)
    rng = np.random.default_rng(7)
    alive = jnp.asarray(rng.random(2048) < 0.7)

    perm = np.asarray(passset_perm(tables, o, d, alive))
    assert sorted(perm.tolist()) == list(range(2048))

    a = np.asarray(alive)[perm]
    n_alive = int(a.sum())
    assert a[:n_alive].all() and not a[n_alive:].any()

    keys = [np.asarray(k)[perm] for k in passset_sort_keys(tables, o, d, alive)]
    stacked = np.stack(keys, axis=1)[:n_alive]
    for i in range(1, n_alive):
        assert tuple(stacked[i - 1]) <= tuple(stacked[i])


def test_passset_perm_full_mask_alias_safe():
    """A live lane whose pass-set fills a whole 32-bit word must still
    sort before dead lanes (the dead flag is a separate primary key,
    so the all-ones word marker cannot demote it)."""
    from rust_pathtracer_tpu.ops.projected import passset_sort_keys

    scene = _mixed_scene()
    tables = build_projected(
        scene.prims.kind, scene.prims.aux, scene.prims.data, scene.prims.mat
    )
    o, d = _rays(64)
    alive = jnp.asarray(np.array([True, False] * 32))
    keys = passset_sort_keys(tables, o, d, alive)
    dead_flag = np.asarray(keys[0])
    np.testing.assert_array_equal(dead_flag, (~np.asarray(alive)).astype(np.uint32))
    for w in keys[1:]:
        assert (np.asarray(w)[~np.asarray(alive)] == 0xFFFFFFFF).all()
