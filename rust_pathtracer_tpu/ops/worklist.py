"""Pair-worklist closest hit (v3 kernel): sweep only (ray-block,
cluster) pairs that can intersect.

The v2 projected kernel (ops/projected.py) visits every (ray-block,
column-block) grid cell and relies on in-kernel ``pl.when`` culling to
skip 128-column cluster sweeps.  Measured on v5e that leaves a large
per-step floor: every live step pays the vectorized slab test, the
unrolled super/group conditional chain (80 groups on ModelTest), and a
full-width (rb, col_block) winner-payload one-hot — ~160 us/step even
when only ~2 of 80 clusters sweep.

This module moves the culling OUT of the kernel:

* XLA slab-tests every ray against every 128-column cluster AABB
  (one (R, G) vector op, bvh.rs:18-35 semantics) and OR-reduces per
  ray block -> a boolean (blocks, clusters) matrix.
* The true pairs are compacted (cumsum + scatter; no sort) into a
  fixed-capacity worklist of (block, cluster) pairs ordered
  block-major / cluster-ascending, padded with no-op entries.  A
  leading "dummy" pair per block guarantees every block is visited
  (initialised + flushed) even when all its lanes are dead.
* The Pallas grid is the worklist itself: scalar-prefetched arrays
  drive the BlockSpec index maps, so each step DMAs one ray block and
  ONE cluster's 128 table columns.  Per-block running best lives in
  scratch across the block's consecutive steps and is flushed to the
  output on the block's last pair.

Per-step work is one (rb, 8) x (8, 128) sweep + a (rb, 128) winner
one-hot — independent of scene size.  This is the TPU-native
equivalent of the reference BVH's "only visit nodes the ray enters"
pruning (/root/reference/src/bvh.rs:106-126), with the tree walk
replaced by a data-parallel worklist build.

If a wavefront is so incoherent that the worklist capacity overflows,
the call falls back to the v2 dense-culled sweep (lax.cond) — results
are bitwise identical either way, capacity only affects speed.

Results are bitwise identical to the v2 kernel / jnp reference: pairs
are enumerated cluster-ascending and compared with the same strict
improvement rule and the same per-kind formulas (including the sphere
q-domain fast path), so winners and payloads match exactly.
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
    _closest_hit_projected,
    _group_q_sphere,
    _group_t,
    _pad_up,
    _ray_matrix,
)
from rust_pathtracer_tpu.ops import table as table_ops
from rust_pathtracer_tpu.scene.types import PRIM_SPHERE

# rays per kernel step; the per-step VMEM footprint no longer scales
# with scene columns (one 128-column cluster per step), so blocks can
# be larger than the v2 kernel's (measured OOMs bound that one at 8
# rows) — 16 rows x 128 lanes = 2048 rays
WL_BLOCK_ROWS = 16
# worklist capacity per ray block (incl. the dummy entry); overflow
# falls back to the dense-culled v2 sweep for the whole call
WL_KAVG = 12

# meta row layout (scalar-prefetched, SMEM)
M_BLK, M_CID, M_KIND, M_FIRST, M_LAST, M_CL = 0, 1, 2, 3, 4, 5


def build_pair_worklist(cluster_bounds, group_kinds, o, d, t_min, rb, kcap):
    """Compacted (ray-block, cluster) pair list.

    cluster_bounds: (6, G) per-cluster AABBs (padding clusters carry
    inverted boxes and never pass).  o, d: (Rp, 3) with Rp % rb == 0.
    Returns (meta (6, W) int32, overflow bool) with W = (Rp/rb) * kcap.

    Pair order is block-major, clusters ascending within a block, with
    a dummy (cluster -1) entry leading every block — identical sweep
    order to the v2 kernel's sequential group loop, so tie-breaking
    matches bitwise.
    """
    R = o.shape[0]
    G = cluster_bounds.shape[1]
    nblocks = R // rb

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
    blockpass = (hi >= lo).reshape(nblocks, rb, G).any(axis=1)

    mask = jnp.concatenate(
        [jnp.ones((nblocks, 1), jnp.bool_), blockpass], axis=1
    )  # (nblocks, G+1); column 0 = per-block dummy
    flat = mask.reshape(-1)
    M = flat.shape[0]
    W = nblocks * min(kcap, G + 1)

    # sort-free stable compaction: position by cumsum, scatter indices
    pos = jnp.cumsum(flat.astype(jnp.int32)) - 1
    count = pos[-1] + 1
    fill = np.int32((nblocks - 1) * (G + 1))  # last block's dummy
    src = jnp.arange(M, dtype=jnp.int32)
    idx = jnp.full((W,), fill, jnp.int32).at[
        jnp.where(flat, pos, W)
    ].set(src, mode="drop")

    blk = idx // np.int32(G + 1)
    cl = idx % np.int32(G + 1) - 1  # -1 = dummy
    kinds_np = np.asarray((-1,) + tuple(group_kinds), np.int32)
    (kind,) = table_ops.lookup(cl + 1, jnp.asarray(kinds_np))
    first = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), blk[1:] != blk[:-1]]
    ).astype(jnp.int32)
    last = jnp.concatenate(
        [blk[:-1] != blk[1:], jnp.ones((1,), jnp.bool_)]
    ).astype(jnp.int32)
    meta = jnp.stack(
        [blk, jnp.maximum(cl, 0), kind, first, last, jnp.maximum(cl, 0)]
    )
    return meta.astype(jnp.int32), count > W


def _pair_kernel(distinct_kinds, t_min, m_ref,
                 rays_ref, a_ref, b_ref, k_ref, pay_ref,
                 t_ref, c_ref, payout_ref, tb_ref, cb_ref, pb_ref):
    """One grid step = one (ray block, cluster) pair.

    Scratch carries the block's running best across its consecutive
    pairs; outputs are written once, on the block's last pair.
    """
    w = pl.program_id(0)
    kind = m_ref[M_KIND, w]
    first = m_ref[M_FIRST, w]
    last = m_ref[M_LAST, w]
    cl = m_ref[M_CL, w]
    hp = jax.lax.Precision.HIGHEST

    @pl.when(first == 1)
    def _init():
        tb_ref[:] = jnp.full(tb_ref.shape, T_MISS, jnp.float32)
        cb_ref[:] = jnp.full(cb_ref.shape, -1, jnp.int32)
        pb_ref[:] = jnp.zeros(pb_ref.shape, jnp.float32)

    @pl.when(kind >= 0)
    def _sweep():
        rays = rays_ref[:]  # (rb, 8)
        o = rays[:, 0:3]
        d = rays[:, 3:6]
        onorm = jnp.sum(o * o, axis=-1, keepdims=True)
        odot = jnp.sum(o * d, axis=-1, keepdims=True)
        dnorm = jnp.sum(d * d, axis=-1, keepdims=True)
        kconst = k_ref[:]  # (8, GROUP)

        def finish(tgs, q_domain):
            gt = jnp.min(tgs, axis=1, keepdims=True)  # (rb, 1)
            iota = jax.lax.broadcasted_iota(jnp.int32, tgs.shape, 1)
            gc = jnp.min(
                jnp.where(tgs <= gt, iota, np.int32(2 ** 30)),
                axis=1, keepdims=True,
            )
            if q_domain:
                gt = jnp.where(gt >= T_MISS, T_MISS, gt / dnorm)
            cur = tb_ref[:]
            take = gt < cur
            tb_ref[:] = jnp.where(take, gt, cur)
            cb_ref[:] = jnp.where(take, gc + cl * GROUP, cb_ref[:])

            @pl.when(jnp.any(take))
            def _commit():
                onehot = (iota == gc).astype(jnp.float32)  # (rb, GROUP)
                blk_pay = jnp.dot(
                    onehot, pay_ref[:],
                    preferred_element_type=jnp.float32, precision=hp,
                )
                pb_ref[:] = jnp.where(take, blk_pay, pb_ref[:])

        for tk in distinct_kinds:
            @pl.when(kind == tk)
            def _kind(tk=tk):
                if tk == PRIM_SPHERE:
                    O0 = jnp.dot(rays, a_ref[0],
                                 preferred_element_type=jnp.float32,
                                 precision=hp)
                    D0 = jnp.dot(rays, b_ref[0],
                                 preferred_element_type=jnp.float32,
                                 precision=hp)
                    tgs = _group_q_sphere(
                        O0, D0, kconst, onorm, odot, dnorm, t_min
                    )
                    finish(tgs, True)
                else:
                    Og = [jnp.dot(rays, a_ref[i],
                                  preferred_element_type=jnp.float32,
                                  precision=hp) for i in range(3)]
                    Dg = [jnp.dot(rays, b_ref[i],
                                  preferred_element_type=jnp.float32,
                                  precision=hp) for i in range(3)]
                    tgs = _group_t(
                        tk, Og[0], Og[1], Og[2], Dg[0], Dg[1], Dg[2],
                        kconst, onorm, odot, dnorm, t_min,
                    )
                    finish(tgs, False)

    @pl.when(last == 1)
    def _flush():
        t_ref[:] = tb_ref[:]
        c_ref[:] = cb_ref[:]
        payout_ref[:] = pb_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=("distinct_kinds", "t_min", "block_rows", "interpret"),
)
def _closest_hit_pairs(rays, a, b, const, payload, meta, *,
                       distinct_kinds, t_min, block_rows, interpret):
    R8 = rays.shape[0]
    rb = block_rows * 128
    W = meta.shape[1]

    kernel = functools.partial(_pair_kernel, distinct_kinds, t_min)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(W,),
        in_specs=[
            pl.BlockSpec((rb, 8), lambda w, m: (m[M_BLK, w], 0)),
            pl.BlockSpec((3, 8, GROUP), lambda w, m: (0, 0, m[M_CID, w])),
            pl.BlockSpec((3, 8, GROUP), lambda w, m: (0, 0, m[M_CID, w])),
            pl.BlockSpec((8, GROUP), lambda w, m: (0, m[M_CID, w])),
            pl.BlockSpec((GROUP, PAY_W), lambda w, m: (m[M_CID, w], 0)),
        ],
        out_specs=(
            pl.BlockSpec((rb, 1), lambda w, m: (m[M_BLK, w], 0)),
            pl.BlockSpec((rb, 1), lambda w, m: (m[M_BLK, w], 0)),
            pl.BlockSpec((rb, PAY_W), lambda w, m: (m[M_BLK, w], 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((rb, 1), jnp.float32),
            pltpu.VMEM((rb, 1), jnp.int32),
            pltpu.VMEM((rb, PAY_W), jnp.float32),
        ],
    )
    t, c, pay = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((R8, 1), jnp.float32),
            jax.ShapeDtypeStruct((R8, 1), jnp.int32),
            jax.ShapeDtypeStruct((R8, PAY_W), jnp.float32),
        ),
        interpret=interpret,
    )(meta, rays, a, b, const, payload)
    return t[:, 0], c[:, 0], pay


def closest_hit_pairs(tables: ProjTables, o, d, t_min, interpret=False,
                      block_rows=None, with_column=False, kcap=None):
    """Worklist closest hit; drop-in peer of
    projected.closest_hit_projected (bitwise-identical results)."""
    if block_rows is None:
        block_rows = int(os.environ.get("RPT_WL_ROWS", WL_BLOCK_ROWS))
    if kcap is None:
        kcap = int(os.environ.get("RPT_WL_KAVG", WL_KAVG))
    R = o.shape[0]
    rb = block_rows * 128
    Rp = _pad_up(R, rb)
    o_p = jnp.pad(o, ((0, Rp - R), (0, 0)))
    d_p = jnp.pad(d, ((0, Rp - R), (0, 0)))
    rays = _ray_matrix(o_p, d_p)
    meta, overflow = build_pair_worklist(
        tables.cluster_bounds, tables.group_kinds, o_p, d_p, t_min, rb, kcap
    )
    distinct = tuple(sorted(set(k for k in tables.group_kinds if k != -1)))

    def run_worklist(_):
        return _closest_hit_pairs(
            rays, tables.a, tables.b, tables.const, tables.payload, meta,
            distinct_kinds=distinct, t_min=float(t_min),
            block_rows=block_rows, interpret=interpret,
        )

    def run_dense(_):
        t, c, pay = _closest_hit_projected(
            rays, tables.a, tables.b, tables.const, tables.payload,
            tables.cluster_bounds_v,
            group_kinds=tables.group_kinds, t_min=float(t_min),
            interpret=interpret, col_block=tables.col_block,
        )
        return t, c, pay

    t, c, pay = jax.lax.cond(overflow, run_dense, run_worklist, None)
    t, c, pay = t[:R], c[:R], pay[:R]
    hit = c >= 0
    t = jnp.where(hit, t, T_MISS)
    if with_column:
        return hit, t, pay, c
    return hit, t, pay
