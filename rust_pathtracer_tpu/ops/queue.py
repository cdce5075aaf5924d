"""Pair-queue closest hit (v5 kernel): per-cluster ray queues at
exactly the per-ray sweep volume.

Why: block-level culling (v2 pl.when skips, v3 worklist, v4 resident
slots) sweeps the UNION of a ray block's cluster pass-sets.  Measured
on ModelTest bounce rays that union is 12-25x the per-ray ideal
(2.56 passed clusters/ray vs 29-43 slots/block even after sorting by
entry cluster / previous hit / Morton origin) — surface-born diffuse
rays simply do not share pass-sets, so no lane ordering can make
block unions tight.  The reference BVH never pays this: each ray
visits only its own nodes (/root/reference/src/bvh.rs:106-126).

This kernel restores the per-ray bound with data-parallel queues:

* XLA slab-tests every ray against every cluster AABB (the same
  (R, G) test the worklist build uses) and writes each passing
  (ray, cluster) pair into a per-cluster segment of one flat queue —
  sort-free: a g-major cumsum gives every pair its slot, a scatter
  places the ray ids, and segments are padded to the queue-block size
  so no kernel block spans two clusters.
* The Pallas grid is one step per queue block: DMA (qb, 8) gathered
  ray rows, sweep ONE cluster's 128 resident table columns, emit
  per-entry (t, global column, payload row).  No scratch, no loops.
* XLA combines entries back per ray with scatter-mins: min t, then
  lowest global column among exact t-ties, then the winning entry's
  payload by one row gather.  The tie rule makes the result
  enumeration-order independent and therefore bitwise identical to
  the v2 dense sweep (which keeps the first = lowest-column winner).

Sweep volume is SUM(per-ray passed clusters) — cost scales with live
pairs, not lanes, which composes with the regeneration wavefront
(wavefront.py) keeping lanes alive.  Parked dead rays pass nothing
and cost nothing.

Capacity: the queue is a static 4 rays-per-lane pool (+ padding
slack); measured pass-set means are 1.6 (camera) to 2.6 (bounce)
so pool overflow is a pathological-frame guard — it falls back to
the v4 resident sweep (bitwise identical, lax.cond).
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

Q_BLOCK_ROWS = 4          # queue block = 512 entries
Q_CAP_PER_RAY = 4         # static pool: pairs per lane


def build_cluster_queue(cluster_bounds, group_kinds, o, d, t_min, qb, qcap):
    """Per-cluster padded ray-id queue from the (R, G) slab test.

    Returns (ray_ids (qcap,) int32 with -1 padding, block_cluster
    (qcap/qb,) int32, block_kind (qcap/qb,) int32, overflow bool).
    Segment order is cluster-ascending; within a cluster, ray-id
    ascending (g-major cumsum order) — enumeration order does not
    matter for the combine, see module docstring.
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
    pm = (hi >= lo).T  # (G, R), g-major

    counts = jnp.sum(pm.astype(jnp.int32), axis=1)            # (G,)
    seg_start = jnp.cumsum(counts) - counts                   # exclusive
    padded = ((counts + (qb - 1)) // qb) * qb
    padded_start = jnp.cumsum(padded) - padded
    total = padded_start[-1] + padded[-1]
    overflow = total > qcap

    pos = jnp.cumsum(pm.reshape(-1).astype(jnp.int32)).reshape(G, R) - pm
    tgt = padded_start[:, None] + (pos - seg_start[:, None])
    tgt = jnp.where(pm, tgt, np.int32(qcap))
    rays_iota = jnp.broadcast_to(jnp.arange(R, dtype=jnp.int32)[None, :], (G, R))
    ray_ids = jnp.full((qcap,), -1, jnp.int32).at[tgt.reshape(-1)].set(
        rays_iota.reshape(-1), mode="drop"
    )

    nqb = qcap // qb
    block_start = jnp.arange(nqb, dtype=jnp.int32) * qb
    blk_cl = jnp.clip(
        jnp.searchsorted(padded_start, block_start, side="right") - 1, 0, G - 1
    ).astype(jnp.int32)
    kinds_np = jnp.asarray(np.asarray(group_kinds, np.int32))
    used = (block_start < total) & (
        block_start < padded_start[blk_cl] + counts[blk_cl]
    )
    block_kind = jnp.where(used, kinds_np[blk_cl], np.int32(-1))
    return ray_ids, blk_cl, block_kind, overflow


def _queue_kernel(distinct_kinds, t_min, cl_ref, kind_ref,
                  rays_ref, a_ref, b_ref, k_ref, payt_ref,
                  t_ref, c_ref, pay_ref):
    """One grid step = one queue block = one cluster's 128 columns."""
    i = pl.program_id(0)
    kind = kind_ref[i]
    cl = cl_ref[i]
    off = pl.multiple_of(cl * GROUP, GROUP)
    hp = jax.lax.Precision.HIGHEST

    t_ref[:] = jnp.full(t_ref.shape, T_MISS, jnp.float32)
    c_ref[:] = jnp.full(c_ref.shape, 2 ** 30, jnp.int32)
    pay_ref[:] = jnp.zeros(pay_ref.shape, jnp.float32)

    @pl.when(kind >= 0)
    def _sweep():
        rays = rays_ref[:]  # (qb, 8)
        o = rays[:, 0:3]
        d = rays[:, 3:6]
        onorm = jnp.sum(o * o, axis=-1, keepdims=True)
        odot = jnp.sum(o * d, axis=-1, keepdims=True)
        dnorm = jnp.sum(d * d, axis=-1, keepdims=True)
        kconst = k_ref[:, pl.ds(off, GROUP)]

        def finish(tgs, q_domain):
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
            t_ref[:] = gt
            c_ref[:] = jnp.where(hit, gc + cl * GROUP, np.int32(2 ** 30))
            pay_ref[:] = blk_pay

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


@functools.partial(
    jax.jit,
    static_argnames=("distinct_kinds", "t_min", "qb", "interpret"),
)
def _sweep_queue(rays_q, a, b, const, payt, blk_cl, blk_kind, *,
                 distinct_kinds, t_min, qb, interpret):
    Q = rays_q.shape[0]
    C = a.shape[2]
    kernel = functools.partial(_queue_kernel, distinct_kinds, t_min)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(Q // qb,),
        in_specs=[
            pl.BlockSpec((qb, 8), lambda i, cc, kk: (i, 0)),
            pl.BlockSpec((3, 8, C), lambda i, cc, kk: (0, 0, 0)),
            pl.BlockSpec((3, 8, C), lambda i, cc, kk: (0, 0, 0)),
            pl.BlockSpec((8, C), lambda i, cc, kk: (0, 0)),
            pl.BlockSpec((PAY_W, C), lambda i, cc, kk: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((qb, 1), lambda i, cc, kk: (i, 0)),
            pl.BlockSpec((qb, 1), lambda i, cc, kk: (i, 0)),
            pl.BlockSpec((qb, PAY_W), lambda i, cc, kk: (i, 0)),
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
    )(blk_cl, blk_kind, rays_q, a, b, const, payt)
    return t[:, 0], c[:, 0], pay


def closest_hit_queue(tables: ProjTables, o, d, t_min, interpret=False,
                      with_column=False, qb=None, cap_per_ray=None):
    """Pair-queue closest hit; drop-in peer of
    projected.closest_hit_projected (bitwise-identical results)."""
    if qb is None:
        qb = int(os.environ.get("RPT_Q_ROWS", Q_BLOCK_ROWS)) * 128
    if cap_per_ray is None:
        cap_per_ray = int(os.environ.get("RPT_Q_CAP", Q_CAP_PER_RAY))
    R = o.shape[0]
    G = tables.cluster_bounds.shape[1]
    qcap = _pad_up(cap_per_ray * R + G * qb, qb)
    ray_ids, blk_cl, blk_kind, overflow = build_cluster_queue(
        tables.cluster_bounds, tables.group_kinds, o, d, t_min, qb, qcap
    )
    distinct = tuple(sorted(set(k for k in tables.group_kinds if k != -1)))

    # gather ray rows into queue order; dummy entries (-1) read a
    # parked sentinel row appended at index R
    rays_all = jnp.concatenate(
        [_ray_matrix(o, d), jnp.full((1, 8), 3.0e33, jnp.float32)]
    )
    rid = jnp.where(ray_ids >= 0, ray_ids, np.int32(R))
    rays_q = rays_all[rid]

    def run_queue(_):
        t_q, c_q, pay_q = _sweep_queue(
            rays_q, tables.a, tables.b, tables.const, tables.payload.T,
            blk_cl, blk_kind, distinct_kinds=distinct, t_min=float(t_min),
            qb=qb, interpret=interpret,
        )
        # per-ray combine: min t, then lowest global column among
        # exact t-ties, then the winning entry's payload row
        big = np.int32(2 ** 30)
        t_best = jnp.full((R + 1,), T_MISS, jnp.float32).at[rid].min(t_q)
        is_min = (t_q <= t_best[rid]) & (t_q < T_MISS)
        col_key = jnp.where(is_min, c_q, big)
        col_best = jnp.full((R + 1,), big, jnp.int32).at[rid].min(col_key)
        ent_key = jnp.where(
            is_min & (c_q == col_best[rid]),
            jnp.arange(ray_ids.shape[0], dtype=jnp.int32), big,
        )
        ent_best = jnp.full((R + 1,), big, jnp.int32).at[rid].min(ent_key)
        hit = t_best[:R] < T_MISS
        ent = jnp.clip(ent_best[:R], 0, ray_ids.shape[0] - 1)
        pay = jnp.where(hit[:, None], pay_q[ent], 0.0)
        t = jnp.where(hit, t_best[:R], T_MISS)
        c = jnp.where(hit, col_best[:R], -1)
        return t, c, pay

    def run_fallback(_):
        from rust_pathtracer_tpu.ops.resident import closest_hit_resident

        hit, t, pay, c = closest_hit_resident(
            tables, o, d, t_min, interpret, with_column=True
        )
        return jnp.where(hit, t, T_MISS), c, pay

    t, c, pay = jax.lax.cond(overflow, run_fallback, run_queue, None)
    hit = c >= 0
    t = jnp.where(hit, t, T_MISS)
    if with_column:
        return hit, t, pay, c
    return hit, t, pay
