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
* Each block's passing clusters are compacted (per-row cumsum +
  scatter; no sort) into a fixed number of per-block slots, clusters
  ascending, unused slots marked kind = -1 (no-op).
* The Pallas grid is (blocks * kcap,): the ray-block index is the
  STATIC expression ``w // kcap``, so the rays input and all three
  outputs have statically schedulable, monotonic index maps and
  Mosaic streams them block by block.  Only the per-cluster table
  specs (a few hundred KB) use scalar-prefetched data-dependent maps
  (the flash-decode pattern).  An earlier layout with a globally
  compacted pair list made the OUTPUT maps data-dependent too —
  Mosaic then stack-allocated the full outputs in scoped VMEM
  (17.97M > 16M limit at just 131k rays, remote compile failure).
* Per-block running best lives in scratch across the block's kcap
  consecutive steps; slot 0 initialises it, the last slot flushes it
  to the output block.

Per-step work is one (rb, 8) x (8, 128) sweep + a (rb, 128) winner
one-hot — independent of scene size.  This is the TPU-native
equivalent of the reference BVH's "only visit nodes the ray enters"
pruning (/root/reference/src/bvh.rs:106-126), with the tree walk
replaced by a data-parallel worklist build.

If any ray block passes more clusters than it has slots, the call
falls back to the v2 dense-culled sweep (lax.cond) — results are
bitwise identical either way, capacity only affects speed.

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

# rays per kernel step.  Every (rb, k<128) buffer pads its minor dim
# to 128 lanes under TPU tiling, so each in/out/scratch buffer costs
# rb*128*4 B of VMEM regardless of k; at 16 rows the ~18 buffers
# (double-buffered ins/outs + scratch) hit 18.1M > 16M scoped VMEM
# (measured remote-compile OOM).  8 rows ~= 9M fits.
WL_BLOCK_ROWS = 8
# cluster slots per ray block; any block needing more overflows the
# whole call to the dense-culled v2 sweep (speed, not correctness)
WL_KCAP = 12

# meta row layout (scalar-prefetched, SMEM)
M_CID, M_KIND = 0, 1


def build_pair_worklist(cluster_bounds, group_kinds, o, d, t_min, rb, kcap,
                        order="cid"):
    """Per-block cluster slot table.

    cluster_bounds: (6, G) per-cluster AABBs (padding clusters carry
    degenerate far-point boxes and never pass).  o, d: (Rp, 3) with Rp % rb == 0.
    Returns (meta (2, W) int32, entry (W,) f32, far (Rp,) f32,
    overflow bool) with W = (Rp/rb) * min(kcap, G); slot rows are
    [cluster id (clamped), prim kind (-1 = empty slot)].  ``far`` is
    the per-LANE upper bound on any possible hit distance: the max
    slab exit over the lane's own passing clusters (-inf for a lane
    passing none — dead/parked or sky rays).  The t-pruning exit uses
    min(best t, far) per lane, so a lane that misses everything (or
    can only hit nearby clusters) stops blocking the block's early
    exit.

    ``order``: slot order within a block.  "cid": clusters ascending
    (the round-2 layout).  "entry": ascending conservative entry
    distance — the min over the block's rays of the slab-test entry t
    (ray-parameter units, same domain as the kernel's t) — which is
    what the v4 kernel's block-level t-pruning needs: once every live
    lane's best t is closer than the next slot's entry, NO later slot
    can improve any lane (bvh.rs:106-126's t_max tightening, at block
    granularity).  ``entry`` is +inf for empty slots.
    """
    R = o.shape[0]
    G = cluster_bounds.shape[1]
    nblocks = R // rb
    kcap = min(kcap, G)

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
    rowpass = hi >= lo
    far = jnp.max(
        jnp.where(rowpass, hi, -jnp.float32(np.inf)), axis=1
    )  # (R,)
    blockpass = rowpass.reshape(nblocks, rb, G).any(axis=1)  # (nblocks, G)
    count = jnp.sum(blockpass.astype(jnp.int32), axis=1)
    overflow = jnp.any(count > kcap)
    W = nblocks * kcap
    colid = jnp.broadcast_to(
        jnp.arange(G, dtype=jnp.int32)[None, :], (nblocks, G)
    )

    if order == "entry":
        # conservative per-(block, cluster) entry distance: min over
        # passing rays of the slab entry t (nan-safe: a non-finite or
        # failing row contributes +inf)
        ent_row = jnp.where(rowpass, lo, jnp.float32(np.inf))
        ent_blk = jnp.min(ent_row.reshape(nblocks, rb, G), axis=1)
        key = jnp.where(blockpass, ent_blk, jnp.float32(np.inf))
        skey, scol = jax.lax.sort((key, colid), dimension=1, num_keys=2)
        cid = jnp.where(jnp.isfinite(skey[:, :kcap]), scol[:, :kcap],
                        -1).reshape(-1)
        entry = skey[:, :kcap].reshape(-1)
    else:
        # per-row stable compaction: slot by cumsum, scatter ids
        pos = jnp.cumsum(blockpass.astype(jnp.int32), axis=1) - 1
        rowbase = (
            jnp.arange(nblocks, dtype=jnp.int32)[:, None] * np.int32(kcap)
        )
        slot = jnp.where(blockpass & (pos < kcap), rowbase + pos,
                         np.int32(W))
        cid = jnp.full((W,), -1, jnp.int32).at[slot.reshape(-1)].set(
            colid.reshape(-1), mode="drop"
        )
        entry = jnp.full((W,), np.float32(t_min), jnp.float32)
    kinds_np = np.asarray((-1,) + tuple(group_kinds), np.int32)
    (kind,) = table_ops.lookup(cid + 1, jnp.asarray(kinds_np))
    meta = jnp.stack([jnp.maximum(cid, 0), kind])
    return meta.astype(jnp.int32), entry, far, overflow


def _pair_kernel(distinct_kinds, t_min, kcap, m_ref,
                 rays_ref, a_ref, b_ref, k_ref, pay_ref,
                 t_ref, c_ref, payout_ref, tb_ref, cb_ref, pb_ref):
    """One grid step = one (ray block, cluster slot) pair.

    Scratch carries the block's running best across its kcap
    consecutive slots; outputs are written once, on the last slot.
    """
    w = pl.program_id(0)
    j = jax.lax.rem(w, kcap)
    kind = m_ref[M_KIND, w]
    cl = m_ref[M_CID, w]
    hp = jax.lax.Precision.HIGHEST

    @pl.when(j == 0)
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

    @pl.when(j == kcap - 1)
    def _flush():
        t_ref[:] = tb_ref[:]
        c_ref[:] = cb_ref[:]
        payout_ref[:] = pb_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=("distinct_kinds", "t_min", "block_rows", "kcap",
                     "interpret"),
)
def _closest_hit_pairs(rays, a, b, const, payload, meta, *,
                       distinct_kinds, t_min, block_rows, kcap, interpret):
    R8 = rays.shape[0]
    rb = block_rows * 128
    W = meta.shape[1]

    kernel = functools.partial(_pair_kernel, distinct_kinds, t_min, kcap)
    # ray-block index is static in the grid step -> rays/outputs have
    # statically schedulable monotonic maps (Mosaic streams them);
    # only the small per-cluster table specs are scalar-driven
    blk = lambda w, m: (w // kcap, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(W,),
        in_specs=[
            pl.BlockSpec((rb, 8), blk),
            pl.BlockSpec((3, 8, GROUP), lambda w, m: (0, 0, m[M_CID, w])),
            pl.BlockSpec((3, 8, GROUP), lambda w, m: (0, 0, m[M_CID, w])),
            pl.BlockSpec((8, GROUP), lambda w, m: (0, m[M_CID, w])),
            pl.BlockSpec((GROUP, PAY_W), lambda w, m: (m[M_CID, w], 0)),
        ],
        out_specs=(
            pl.BlockSpec((rb, 1), blk),
            pl.BlockSpec((rb, 1), blk),
            pl.BlockSpec((rb, PAY_W), blk),
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
            # vma: inside shard_map (check_vma=True) pallas outputs
            # must declare their mesh-varying axes — inherit the rays'
            jax.ShapeDtypeStruct((R8, 1), jnp.float32,
                                 vma=jax.typeof(rays).vma),
            jax.ShapeDtypeStruct((R8, 1), jnp.int32,
                                 vma=jax.typeof(rays).vma),
            jax.ShapeDtypeStruct((R8, PAY_W), jnp.float32,
                                 vma=jax.typeof(rays).vma),
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
        kcap = int(os.environ.get("RPT_WL_KCAP", WL_KCAP))
    R = o.shape[0]
    rb = block_rows * 128
    Rp = _pad_up(R, rb)
    o_p = jnp.pad(o, ((0, Rp - R), (0, 0)))
    d_p = jnp.pad(d, ((0, Rp - R), (0, 0)))
    rays = _ray_matrix(o_p, d_p)
    meta, _ent, _far, overflow = build_pair_worklist(
        tables.cluster_bounds, tables.group_kinds, o_p, d_p, t_min, rb, kcap
    )
    kcap_eff = meta.shape[1] // (Rp // rb)
    distinct = tuple(sorted(set(k for k in tables.group_kinds if k != -1)))

    def run_worklist(_):
        return _closest_hit_pairs(
            rays, tables.a, tables.b, tables.const, tables.payload, meta,
            distinct_kinds=distinct, t_min=float(t_min),
            block_rows=block_rows, kcap=kcap_eff, interpret=interpret,
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
