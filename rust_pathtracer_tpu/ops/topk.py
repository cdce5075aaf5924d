"""Top-K entry-ordered closest hit (v6 kernel): per-ray cluster
candidates at the per-ray sweep bound, with measured-fast primitives.

The v5 pair-queue (ops/queue.py) proved the sweep side: at the
per-ray volume bound the ModelTest sweep is 43 ms/bounce vs the
block-union kernels' ~600 ms.  But its build scattered 80M candidate
slots (673 ms measured) — the wrong primitive.  This kernel keeps the
per-ray bound with only fast primitives (tools/tpu_qprof.py, 1M rays,
v5e): (R, G) elementwise min-extraction ~10 ms, lax.sort of R*K pairs
14 ms, (R*K, 8) gather 28 ms, scatter-min 33 ms.

Pipeline per call:

1. **Top-K extraction** (XLA, vectorized): slab-test all clusters,
   take each ray's K nearest passing clusters by ENTRY distance
   (slab lo), plus the (K+1)-th entry distance as a completeness
   bound.  K defaults to min(6, G).
2. **Sort** the (R*K) candidate list by cluster id (dummies last) and
   gather ray rows into list order.
3. **Sweep kernel** (Pallas): one grid step per qb-entry block; the
   whole projected table rides VMEM (static maps, payload transposed
   — the v4 layout); an in-kernel loop walks the block's cluster span
   [first, last] (usually 1 cluster — the list is cluster-sorted),
   masking each sweep to the entries of that cluster.
4. **Combine** with two scatter-mins: min t per ray, then min sorted
   position among exact t-ties.  Entries are cluster-ascending, so
   min sorted position = lowest global column — the same winner rule
   as the v2 dense sweep, enumeration-order independent, bitwise
   identical.  Winning column/payload come from one row gather.
5. **Fixup**: a ray is provably complete when its best t <= its
   (K+1)-th entry distance (a hit inside a cluster AABB has
   t >= the cluster's slab lo).  Incomplete rays (pass > K clusters
   AND unresolved within the K nearest) are parked-masked and re-run
   through the v4 resident sweep over ALL clusters; results merge by
   the same min-t/lowest-col rule.  When K >= G the fixup is
   statically skipped.

This is the closest TPU shape of the reference BVH's ordered,
t-pruned traversal (/root/reference/src/bvh.rs:106-126): visit near
clusters first, stop when the hit provably precedes everything
unvisited — vectorized over rays instead of recursive per ray.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rust_pathtracer_tpu.ops.intersect import T_MISS
from rust_pathtracer_tpu.ops.projected import (
    GROUP,
    PAY_W,
    ProjTables,
    _group_q_sphere,
    _group_t,
    _pad_up,
    _ray_matrix,
)
from rust_pathtracer_tpu.scene.types import PRIM_SPHERE

TK_BLOCK_ROWS = 4   # entry block = 512 list entries
TK_K = 6            # nearest passing clusters swept before fixup
TK_MAX_COLS = 12288  # resident-table VMEM budget (v4's bound)

_INF = np.float32(3.0e38)


def topk_entry_clusters(cluster_bounds, o, d, t_min, k):
    """Each ray's k nearest passing clusters by slab entry distance.

    Returns (cl (R, k) int32 with -1 = none, bound (R,) f32 = the
    (k+1)-th entry distance, +inf when the ray passes <= k clusters).
    """
    R = o.shape[0]
    G = cluster_bounds.shape[1]

    tiny = np.float32(1e-30)
    dsafe = jnp.where(jnp.abs(d) < tiny, jnp.where(d < 0.0, -tiny, tiny), d)
    inv_d = 1.0 / dsafe
    lo = jnp.full((R, G), np.float32(t_min))
    hi = jnp.full((R, G), T_MISS)
    for ax in range(3):
        b0 = (cluster_bounds[ax][None, :] - o[:, ax:ax + 1]) * inv_d[:, ax:ax + 1]
        b1 = (cluster_bounds[3 + ax][None, :] - o[:, ax:ax + 1]) * inv_d[:, ax:ax + 1]
        lo = jnp.maximum(lo, jnp.minimum(b0, b1))
        hi = jnp.minimum(hi, jnp.maximum(b0, b1))
    entry = jnp.where(hi >= lo, lo, _INF)  # (R, G)

    iota = jax.lax.broadcasted_iota(jnp.int32, (R, G), 1)
    cls = []
    for _ in range(k):
        e = jnp.min(entry, axis=1, keepdims=True)
        g = jnp.min(
            jnp.where((entry <= e) & (e < _INF), iota, np.int32(2 ** 30)),
            axis=1, keepdims=True,
        )
        cls.append(jnp.where(e[:, 0] < _INF, g[:, 0], np.int32(-1)))
        entry = jnp.where(iota == g, _INF, entry)
    bound = jnp.min(entry, axis=1)  # (k+1)-th entry distance
    return jnp.stack(cls, axis=1), bound


def _topk_kernel(distinct_kinds, t_min, f_ref, l_ref, kind_ref,
                 rays_ref, key_ref, a_ref, b_ref, k_ref, payt_ref,
                 t_ref, c_ref, pay_ref):
    """One grid step = one entry block; loop its cluster span."""
    i = pl.program_id(0)
    first = f_ref[i]
    last = l_ref[i]
    hp = jax.lax.Precision.HIGHEST

    rays = rays_ref[:]  # (qb, 8)
    keyv = key_ref[:]   # (qb, 1) cluster id per entry
    o = rays[:, 0:3]
    d = rays[:, 3:6]
    onorm = jnp.sum(o * o, axis=-1, keepdims=True)
    odot = jnp.sum(o * d, axis=-1, keepdims=True)
    dnorm = jnp.sum(d * d, axis=-1, keepdims=True)

    t_ref[:] = jnp.full(t_ref.shape, T_MISS, jnp.float32)
    c_ref[:] = jnp.full(c_ref.shape, 2 ** 30, jnp.int32)
    pay_ref[:] = jnp.zeros(pay_ref.shape, jnp.float32)

    def cluster(c, _):
        kind = kind_ref[c]
        off = pl.multiple_of(c * GROUP, GROUP)
        kconst = k_ref[:, pl.ds(off, GROUP)]
        mine = keyv == c  # (qb, 1)

        def finish(tgs, q_domain):
            tgs = jnp.where(mine, tgs, T_MISS)
            gt = jnp.min(tgs, axis=1, keepdims=True)
            iota = jax.lax.broadcasted_iota(jnp.int32, tgs.shape, 1)
            gc = jnp.min(
                jnp.where(tgs <= gt, iota, np.int32(2 ** 30)),
                axis=1, keepdims=True,
            )
            if q_domain:
                gt = jnp.where(gt >= T_MISS, T_MISS, gt / dnorm)
            hit = gt < T_MISS
            onehot = (iota == gc).astype(jnp.float32)
            blk_pay = jax.lax.dot_general(
                onehot, payt_ref[:, pl.ds(off, GROUP)],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=hp,
            )
            t_ref[:] = jnp.where(mine, gt, t_ref[:])
            c_ref[:] = jnp.where(
                mine & hit, gc + c * GROUP,
                jnp.where(mine, np.int32(2 ** 30), c_ref[:]),
            )
            pay_ref[:] = jnp.where(mine, blk_pay, pay_ref[:])

        for tk in distinct_kinds:
            @pl.when(kind == tk)
            def _kind(tk=tk):
                if tk == PRIM_SPHERE:
                    O0 = jnp.dot(rays, a_ref[0, :, pl.ds(off, GROUP)],
                                 preferred_element_type=jnp.float32,
                                 precision=hp)
                    D0 = jnp.dot(rays, b_ref[0, :, pl.ds(off, GROUP)],
                                 preferred_element_type=jnp.float32,
                                 precision=hp)
                    tgs = _group_q_sphere(
                        O0, D0, kconst, onorm, odot, dnorm, t_min
                    )
                    finish(tgs, True)
                else:
                    Og = [jnp.dot(rays, a_ref[i_, :, pl.ds(off, GROUP)],
                                  preferred_element_type=jnp.float32,
                                  precision=hp) for i_ in range(3)]
                    Dg = [jnp.dot(rays, b_ref[i_, :, pl.ds(off, GROUP)],
                                  preferred_element_type=jnp.float32,
                                  precision=hp) for i_ in range(3)]
                    tgs = _group_t(
                        tk, Og[0], Og[1], Og[2], Dg[0], Dg[1], Dg[2],
                        kconst, onorm, odot, dnorm, t_min,
                    )
                    finish(tgs, False)
        return 0

    @pl.when(first >= 0)
    def _span():
        jax.lax.fori_loop(first, last + 1, cluster, 0)


@functools.partial(
    jax.jit,
    static_argnames=("distinct_kinds", "t_min", "qb", "interpret"),
)
def _sweep_topk(rays_q, keys_q, a, b, const, payt, blk_first, blk_last,
                kinds, *, distinct_kinds, t_min, qb, interpret):
    Q = rays_q.shape[0]
    C = a.shape[2]

    kernel = functools.partial(_topk_kernel, distinct_kinds, t_min)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(Q // qb,),
        in_specs=[
            pl.BlockSpec((qb, 8), lambda i, f, l, kk: (i, 0)),
            pl.BlockSpec((qb, 1), lambda i, f, l, kk: (i, 0)),
            pl.BlockSpec((3, 8, C), lambda i, f, l, kk: (0, 0, 0)),
            pl.BlockSpec((3, 8, C), lambda i, f, l, kk: (0, 0, 0)),
            pl.BlockSpec((8, C), lambda i, f, l, kk: (0, 0)),
            pl.BlockSpec((PAY_W, C), lambda i, f, l, kk: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((qb, 1), lambda i, f, l, kk: (i, 0)),
            pl.BlockSpec((qb, 1), lambda i, f, l, kk: (i, 0)),
            pl.BlockSpec((qb, PAY_W), lambda i, f, l, kk: (i, 0)),
        ),
    )
    t, c, pay = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((Q, 1), jnp.float32),
            jax.ShapeDtypeStruct((Q, 1), jnp.int32),
            jax.ShapeDtypeStruct((Q, PAY_W), jnp.float32),
        ),
        interpret=interpret,
    )(blk_first, blk_last, kinds, rays_q, keys_q, a, b, const, payt)
    return t[:, 0], c[:, 0], pay


def closest_hit_topk(tables: ProjTables, o, d, t_min, interpret=False,
                     with_column=False, k=None, qb=None):
    """Top-K entry-ordered closest hit; drop-in peer of
    projected.closest_hit_projected (bitwise-identical results)."""
    G = tables.cluster_bounds.shape[1]
    if k is None:
        k = min(int(os.environ.get("RPT_V6_K", TK_K)), G)
    k = min(k, G)
    if qb is None:
        qb = int(os.environ.get("RPT_V6_ROWS", TK_BLOCK_ROWS)) * 128
    R = o.shape[0]

    cl_rk, bound = topk_entry_clusters(
        tables.cluster_bounds, o, d, t_min, k
    )  # (R, k), (R,)

    # candidate list sorted by cluster (dummies -> key G, sorted last)
    key_flat = jnp.where(
        cl_rk >= 0, cl_rk, np.int32(G)
    ).reshape(-1).astype(jnp.int32)
    rid_flat = jnp.broadcast_to(
        jnp.arange(R, dtype=jnp.int32)[:, None], (R, k)
    ).reshape(-1)
    Q = _pad_up(R * k, qb)
    key_flat = jnp.pad(key_flat, (0, Q - R * k), constant_values=G)
    rid_flat = jnp.pad(rid_flat, (0, Q - R * k), constant_values=R)
    keys_s, rid_s = jax.lax.sort((key_flat, rid_flat), num_keys=1)

    rays_all = jnp.concatenate(
        [_ray_matrix(o, d), jnp.full((1, 8), 3.0e33, jnp.float32)]
    )
    rid_safe = jnp.where(keys_s < G, rid_s, np.int32(R))
    rays_q = rays_all[rid_safe]

    nqb = Q // qb
    kb = keys_s.reshape(nqb, qb)
    blk_first = jnp.where(kb[:, 0] < G, kb[:, 0], np.int32(-1))
    blk_last = jnp.minimum(
        jnp.max(jnp.where(kb < G, kb, -1), axis=1), np.int32(G - 1)
    )
    kinds_arr = jnp.asarray(np.asarray(tables.group_kinds, np.int32))

    distinct = tuple(sorted(set(kk for kk in tables.group_kinds if kk != -1)))
    t_q, c_q, pay_q = _sweep_topk(
        rays_q, keys_s[:, None], tables.a, tables.b, tables.const,
        tables.payload.T, blk_first, blk_last, kinds_arr,
        distinct_kinds=distinct, t_min=float(t_min), qb=qb,
        interpret=interpret,
    )

    # combine: min t per ray, then min sorted position among exact
    # t-ties (cluster-ascending list -> lowest global column)
    big = np.int32(2 ** 30)
    t_best = jnp.full((R + 1,), T_MISS, jnp.float32).at[rid_safe].min(t_q)
    is_min = (t_q <= t_best[rid_safe]) & (t_q < T_MISS)
    pos_key = jnp.where(is_min, jnp.arange(Q, dtype=jnp.int32), big)
    pos_best = jnp.full((R + 1,), big, jnp.int32).at[rid_safe].min(pos_key)
    hit = t_best[:R] < T_MISS
    pos = jnp.clip(pos_best[:R], 0, Q - 1)
    t6 = jnp.where(hit, t_best[:R], T_MISS)
    c6 = jnp.where(hit, c_q[pos], -1)
    p6 = jnp.where(hit[:, None], pay_q[pos], 0.0)

    if k < G:
        # fixup: rays not provably complete re-run over ALL clusters.
        # Strict <: at t6 == bound an unswept cluster could hold an
        # exact-tie hit with a LOWER column (the v2 winner) — such
        # rays go to the fixup so the tie-break stays bitwise.
        incomplete = (bound < _INF) & ~(t6 < bound)
        from rust_pathtracer_tpu.ops.resident import closest_hit_resident

        o_fix = jnp.where(incomplete[:, None], o, jnp.full_like(o, 3.0e33))
        hit_f, t_f, pay_f, c_f = closest_hit_resident(
            tables, o_fix, d, t_min, interpret, with_column=True
        )
        # merge by the same winner rule (fixup covers a superset of
        # the swept clusters, so equal-t duplicates resolve by column)
        c6s = jnp.where(hit, c6, big)
        c_fs = jnp.where(hit_f, c_f, big)
        take_f = (t_f < t6) | ((t_f == t6) & (c_fs < c6s))
        take_f = take_f & hit_f
        t6 = jnp.where(take_f, t_f, t6)
        c6 = jnp.where(take_f, c_f, c6)
        p6 = jnp.where(take_f[:, None], pay_f, p6)
        hit = hit | hit_f

    if with_column:
        return hit, t6, p6, c6
    return hit, t6, p6
