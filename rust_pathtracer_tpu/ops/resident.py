"""Table-resident closest hit (v4 kernel): one grid step per ray
block, whole projected table in VMEM, in-kernel loop over the block's
passing clusters.

The v3 worklist kernel (ops/worklist.py) pays a measured ~8-9 us per
GRID STEP on v5e (DMA issue + semaphores on the scalar-prefetched
table specs) — at ModelTest's 12288 steps/bounce that floor alone is
~110 ms/bounce, 50x the sweep's compute SOL.  This kernel removes the
per-pair grid step entirely:

* The full projected tables ride in VMEM with STATIC index maps, laid
  out so no buffer pads its minor dim to 128 lanes: a/b (3, 8, C),
  const (8, C), and the winner payload TRANSPOSED to (32, C) —
  ~C x 352 B total, 3.6 MB for ModelTest's C = 10240.  Mosaic DMAs
  them once and keeps them resident across the whole grid.
* The grid is (ray blocks,).  Each step loads one (rb, 8) ray block,
  then runs an in-kernel ``fori_loop`` over that block's real worklist
  slots (count scalar-prefetched from SMEM), dynamic-slicing one
  128-column cluster out of the resident tables per iteration
  (``pl.ds`` at ``pl.multiple_of(cl * 128, 128)`` lane offsets).
* Per-block running best lives in scratch; outputs are written once
  per block.  Empty slots are never visited, so the per-bounce cost
  is ~(real pairs) x sweep compute with no no-op floor.

The slot list itself is the same per-block compaction the v3 kernel
uses (``worklist.build_pair_worklist``) — XLA slab-tests every ray
against every cluster AABB (bvh.rs:18-35 semantics) and compacts
passing clusters, ascending.  Enumeration order, improvement rule and
per-kind formulas are identical to v2/v3, so results are bitwise
identical; block-capacity overflow falls back to the v2 dense sweep
(lax.cond), which only affects speed.

This is the TPU-native endpoint of the reference BVH's pruning
(/root/reference/src/bvh.rs:106-126) for scenes whose tables fit
VMEM (<= ~12k projected columns); larger scenes route to v3.
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
from rust_pathtracer_tpu.ops.worklist import M_CID, M_KIND, build_pair_worklist

RES_BLOCK_ROWS = 8
# resident-table budget: C*352 B of VMEM for a/b/const/payT; 12k cols
# ~= 4.2 MB leaves room for ray/output blocks and scratch under the
# 16 MB scoped limit
RES_MAX_COLS = 12288


def _res_kernel(distinct_kinds, t_min, kcap, tprune, when_skip, m_ref,
                cnt_ref, ent_ref, rays_ref, a_ref, b_ref, k_ref,
                payt_ref, t_ref, c_ref, payout_ref, tb_ref, cb_ref,
                pb_ref):
    """One grid step = one ray block; in-kernel loop over its slots.

    ``m_ref``: (W,) packed slot words ``cid * 4 + kind`` (one SMEM row
    — the per-block capacity defaults to the full cluster count, so an
    unpacked (2, W) layout would double the scalar-prefetch footprint).
    Only the first ``cnt_ref[blk]`` slots of a block are real; the loop
    never reads the rest.

    ``tprune`` (static): slots arrive sorted by conservative block
    entry distance (``ent_ref``, ray-parameter units) and the loop
    EXITS once the next slot's entry exceeds every lane's
    min(current best t, far bound) — the reference BVH's t_max
    tightening (bvh.rs:106-126) at block granularity.  Exact: for a
    lane bounded by its best t, later clusters' hits sit at
    t >= entry > best; for a lane bounded by its FAR (the max slab
    exit over the clusters it passes — -inf for sky rays and parked
    dead lanes), any still-possible hit sits at t <= far < entry,
    contradiction.  The winner rule tie-breaks on global column id,
    which is order-invariant (a no-op in ascending-cid order), so
    results are bitwise identical with pruning on or off.
    """
    blk = pl.program_id(0)
    n_slots = cnt_ref[blk]
    hp = jax.lax.Precision.HIGHEST

    rays = rays_ref[:]  # (rb, 8)
    o = rays[:, 0:3]
    d = rays[:, 3:6]
    onorm = jnp.sum(o * o, axis=-1, keepdims=True)
    odot = jnp.sum(o * d, axis=-1, keepdims=True)
    dnorm = jnp.sum(d * d, axis=-1, keepdims=True)

    # The per-lane FAR bound (max slab exit over the lane's own
    # passing clusters; -inf when it passes none — sky rays, parked
    # dead lanes) rides ray column 7 (projection rows 7 of a/b are
    # all zero, so it is inert in every matmul).  Rather than keeping
    # it as a separate (rb, 1) buffer — which pads to 128 lanes and
    # blew the 16M scoped-VMEM budget by 608K — the running best is
    # INITIALIZED to min(T_MISS, just-above-far): any real hit sits
    # at t <= exit <= far so nothing takeable is lost (the 1-ulp
    # upward nudge keeps a hit exactly AT the bound takeable), miss
    # lanes then carry ~far, and max(tb) IS the pruning bound
    # max(min(best t, far)).  Outputs are unchanged: miss lanes keep
    # column -1 and the caller masks their t back to T_MISS.  Without
    # the far bound a single miss lane held the max at T_MISS and the
    # exit never fired on open scenes (measured: no win on ModelTest).
    if tprune:
        cap = rays[:, 7:8] * np.float32(1.0000002)
        tb_ref[:] = jnp.minimum(jnp.float32(T_MISS), cap)
    else:
        # without pruning, ray col 7 is the constant 0 — plain init
        tb_ref[:] = jnp.full(tb_ref.shape, T_MISS, jnp.float32)
    cb_ref[:] = jnp.full(cb_ref.shape, -1, jnp.int32)
    pb_ref[:] = jnp.zeros(pb_ref.shape, jnp.float32)

    def slot(j):
        word = m_ref[blk * kcap + j]
        # bit ops, not rem/div: scalar-core integer division lowers
        # poorly (measured 2.8x whole-chunk regression on SphereField)
        kind = jax.lax.bitwise_and(word, np.int32(3))
        cl = jax.lax.shift_right_logical(word, np.int32(2))
        off = pl.multiple_of(cl * GROUP, GROUP)
        kconst = k_ref[:, pl.ds(off, GROUP)]  # (8, GROUP)

        def finish(tgs, q_domain):
            raw_gt = jnp.min(tgs, axis=1, keepdims=True)  # (rb, 1)
            if q_domain:
                gt = jnp.where(raw_gt >= T_MISS, T_MISS, raw_gt / dnorm)
            else:
                gt = raw_gt

            def epilogue():
                iota = jax.lax.broadcasted_iota(jnp.int32, tgs.shape, 1)
                # winning in-group column compared in the RAW t domain
                # (q-domain gt was rescaled by 1/dnorm)
                gc = jnp.min(
                    jnp.where(tgs <= raw_gt, iota, np.int32(2 ** 30)),
                    axis=1, keepdims=True,
                )
                cur = tb_ref[:]
                gcol = gc + cl * GROUP
                # strict improvement + lowest-global-column tie-break
                # (the tie-break is what makes the winner independent
                # of slot order; in cid-ascending order later slots
                # always have higher columns, so it changes nothing
                # there)
                take = (gt < cur) | ((gt == cur) & (gcol < cb_ref[:]))
                tb_ref[:] = jnp.where(take, gt, cur)
                cb_ref[:] = jnp.where(take, gcol, cb_ref[:])
                onehot = (iota == gc).astype(jnp.float32)  # (rb, GROUP)
                # (rb, GROUP) x (PAY_W, GROUP) contracted over GROUP:
                # the payload rides VMEM transposed so its minor dim is
                # C (no 128-lane padding) and slices on the lane axis
                blk_pay = jax.lax.dot_general(
                    onehot, payt_ref[:, pl.ds(off, GROUP)],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=hp,
                )
                pb_ref[:] = jnp.where(take, blk_pay, pb_ref[:])

            if when_skip:
                # per-slot payload/argmin skip (RPT_RES_WHEN=1): when no
                # lane can improve (every group-min is strictly above
                # the running best AND above any tie at a lower column —
                # gt > cur covers both, since a tie needs gt == cur),
                # the whole epilogue (iota argmin, tie-break, payload
                # contraction, three scratch writes) is a no-op; skip
                # it.  Bitwise identical: the guard is exactly
                # any(take-possible).  The sweep matmuls of the next
                # slot do not depend on the skipped epilogue, so this
                # does not serialize the pipeline the way the t-prune
                # while_loop condition did (DESIGN.md §12).
                @pl.when(jnp.any(gt <= tb_ref[:]))
                def _maybe():
                    epilogue()
            else:
                epilogue()

        for tk in distinct_kinds:
            @pl.when(kind == tk)
            def _kind(tk=tk):
                from rust_pathtracer_tpu.scene.types import PRIM_SPHERE

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
                    Og = [jnp.dot(rays, a_ref[i, :, pl.ds(off, GROUP)],
                                  preferred_element_type=jnp.float32,
                                  precision=hp) for i in range(3)]
                    Dg = [jnp.dot(rays, b_ref[i, :, pl.ds(off, GROUP)],
                                  preferred_element_type=jnp.float32,
                                  precision=hp) for i in range(3)]
                    tgs = _group_t(
                        tk, Og[0], Og[1], Og[2], Dg[0], Dg[1], Dg[2],
                        kconst, onorm, odot, dnorm, t_min,
                    )
                    finish(tgs, False)

    if tprune:
        def cond(carry):
            j, tmax = carry
            return (j < n_slots) & (ent_ref[blk * kcap + j] <= tmax)

        def body(carry):
            j, _ = carry
            slot(j)
            return j + 1, jnp.max(tb_ref[:])

        jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.max(tb_ref[:]))
        )
    else:
        def fbody(j, _):
            slot(j)
            return 0

        jax.lax.fori_loop(0, n_slots, fbody, 0)

    t_ref[:] = tb_ref[:]
    c_ref[:] = cb_ref[:]
    payout_ref[:] = pb_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=("distinct_kinds", "t_min", "block_rows", "kcap",
                     "interpret", "tprune", "when_skip"),
)
def _closest_hit_resident(rays, a, b, const, payt, meta, counts, ents, *,
                          distinct_kinds, t_min, block_rows, kcap,
                          interpret, tprune, when_skip=False):
    R8 = rays.shape[0]
    rb = block_rows * 128
    nblocks = R8 // rb
    C = a.shape[2]

    kernel = functools.partial(_res_kernel, distinct_kinds, t_min, kcap,
                               tprune, when_skip)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((rb, 8), lambda i, m, c, e: (i, 0)),
            pl.BlockSpec((3, 8, C), lambda i, m, c, e: (0, 0, 0)),
            pl.BlockSpec((3, 8, C), lambda i, m, c, e: (0, 0, 0)),
            pl.BlockSpec((8, C), lambda i, m, c, e: (0, 0)),
            pl.BlockSpec((PAY_W, C), lambda i, m, c, e: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((rb, 1), lambda i, m, c, e: (i, 0)),
            pl.BlockSpec((rb, 1), lambda i, m, c, e: (i, 0)),
            pl.BlockSpec((rb, PAY_W), lambda i, m, c, e: (i, 0)),
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
    )(meta, counts, ents, rays, a, b, const, payt)
    return t[:, 0], c[:, 0], pay


def closest_hit_resident(tables: ProjTables, o, d, t_min, interpret=False,
                         block_rows=None, with_column=False, kcap=None):
    """Resident-table closest hit; drop-in peer of
    projected.closest_hit_projected (bitwise-identical results)."""
    G = tables.cluster_bounds.shape[1]
    if block_rows is None:
        block_rows = int(os.environ.get("RPT_RES_ROWS", RES_BLOCK_ROWS))
    if kcap is None:
        # default capacity = FULL cluster count: overflow is then
        # impossible (a block can pass at most G clusters), the dense
        # fallback is never needed, and empty slots cost nothing
        # because the in-kernel loop is count-based.  A 12-slot cap
        # (the v3 default) silently routed nearly every ModelTest
        # bounce to the dense sweep: one block passing >12 of 80
        # clusters overflows the whole call.
        kcap = int(os.environ.get("RPT_RES_KCAP", 0)) or G
    R = o.shape[0]
    rb = block_rows * 128
    Rp = _pad_up(R, rb)
    o_p = jnp.pad(o, ((0, Rp - R), (0, 0)))
    d_p = jnp.pad(d, ((0, Rp - R), (0, 0)))
    # block-level t-pruning (RPT_RES_TPRUNE=1 opts in): slots sorted
    # front-to-back + in-kernel early exit vs min(best t, per-lane
    # far bound); results bitwise identical either way.  MEASURED
    # WASH on v5e (ModelTest cascaded chunk, same-day controls:
    # tprune 0.2329-0.2333 s/chunk vs 0.2303 full sweep; DESIGN.md
    # §12) — the while-loop's per-slot serialization cancels the
    # skipped sweeps, and compiles run ~17 min vs ~10.  Default OFF.
    tprune = os.environ.get("RPT_RES_TPRUNE", "0") == "1"
    # per-slot epilogue skip (round-4 VERDICT item 3 / ROADMAP §2):
    # the VPU epilogue measured ~4x its analytic bound; skipping it on
    # no-improvement slots is bitwise-free.  Opt-in until measured.
    when_skip = os.environ.get("RPT_RES_WHEN", "0") == "1"
    meta, ents, far, overflow = build_pair_worklist(
        tables.cluster_bounds, tables.group_kinds, o_p, d_p, t_min, rb,
        kcap, order="entry" if tprune else "cid",
    )
    rays = _ray_matrix(o_p, d_p)
    if tprune:
        # the per-lane far bound rides ray column 7 (inert in every
        # projection: a/b row 7 is all zero by construction)
        rays = jnp.concatenate([rays[:, :7], far[:, None]], axis=1)
    nblocks = Rp // rb
    kcap_eff = meta.shape[1] // nblocks
    counts = jnp.sum(
        (meta[M_KIND].reshape(nblocks, kcap_eff) >= 0).astype(jnp.int32),
        axis=1,
    )
    # one packed SMEM row: cid * 4 + kind (kind in 0..2 for real slots;
    # empty slots are never read — the loop bound is counts[blk])
    packed = meta[M_CID] * 4 + jnp.clip(meta[M_KIND], 0, 3)
    distinct = tuple(sorted(set(k for k in tables.group_kinds if k != -1)))

    def run_resident(_):
        return _closest_hit_resident(
            rays, tables.a, tables.b, tables.const, tables.payload.T,
            packed, counts, ents, distinct_kinds=distinct,
            t_min=float(t_min), block_rows=block_rows, kcap=kcap_eff,
            interpret=interpret, tprune=tprune, when_skip=when_skip,
        )

    if kcap_eff >= G:
        # overflow is statically impossible here (a block passes at
        # most G clusters), but the lax.cond wrapper MUST stay: it is
        # a compilation boundary that keeps the kernel + worklist
        # build out of the surrounding trace body's XLA schedule.
        # Calling run_resident inline was measured +86 ms/BOUNCE on
        # the SphereField chunk (0.905 s -> 2.54 s for 20 bounces,
        # bisected via RPT_RES_COND) with identical kernels.  The
        # never-taken branch returns all-miss at negligible compile
        # cost (the dense fallback kernel is not needed).
        def run_miss(_):
            return (
                jnp.full((Rp,), T_MISS, jnp.float32),
                jnp.full((Rp,), -1, jnp.int32),
                jnp.zeros((Rp, PAY_W), jnp.float32),
            )

        t, c, pay = jax.lax.cond(overflow, run_miss, run_resident, None)
    else:
        def run_dense(_):
            return _closest_hit_projected(
                rays, tables.a, tables.b, tables.const, tables.payload,
                tables.cluster_bounds_v,
                group_kinds=tables.group_kinds, t_min=float(t_min),
                interpret=interpret, col_block=tables.col_block,
            )

        t, c, pay = jax.lax.cond(overflow, run_dense, run_resident, None)
    t, c, pay = t[:R], c[:R], pay[:R]
    hit = c >= 0
    t = jnp.where(hit, t, T_MISS)
    if with_column:
        return hit, t, pay, c
    return hit, t, pay
