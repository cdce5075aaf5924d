"""Projected-sweep closest hit: intersection as MXU matmuls (v2 kernel).

The v1 Pallas sweep (pallas_intersect.py) unrolls one statically-typed
test per primitive with *scalar* table reads — ideal below ~128
primitives, but scalar-read bound beyond (measured 1.5 Mrays/s on the
514-sphere SphereField).  This module reformulates ray/primitive
intersection so the per-primitive work is a dense matrix product that
the MXU executes, with zero scalar reads and zero gathers:

* Rays become an (R, 8) matrix  [ox oy oz dx dy dz 1 0].
* Every primitive contributes THREE projection columns (each applied to
  both the origin and the direction) plus a few per-column constants:
    sphere  c,r :  P0 = c                       -> o.c, d.c
    rect    k,ab:  P0 = e_fixed (offset -k), P1 = e_a, P2 = e_b
    triangle    :  Woop unit-triangle transform W = [e1 e2 n]^-1;
                   P0 = w2 (offset -w2.v0), P1 = w0, P2 = w1
  so the six products rays @ A0..A2 / rays @ B0..B2 (A = origin rows
  0-2 + offset row 6, B = direction rows 3-5) give every quantity the
  per-type closest-hit formulas need as (R, C) panels.
* Primitive columns are grouped by type in 128-column groups (lane
  width), so each group runs exactly its own formula — divergence-free
  like the v1 unroll, but vectorized across primitives instead of
  serialized.
* The winner's shading payload (its ``Primitives`` row + kind/aux/mat
  and ORIGINAL index) is fetched inside the kernel by a one-hot
  contraction against a (C, 32) payload table — again the MXU, so the
  epilogue (ops/intersect.hit_record math) never gathers.

Reference behavior preserved: sphere half-b quadratic with nearest root
first (geometry.rs:132-163), rect plane solve + bounds
(geometry.rs:210-231), triangle one-sided cull det < 1e-4
(geometry.rs:526) expressed as -d'_z * |n|^2 >= eps, t_min = 0.001
units of the unnormalized |d| (ray.rs:25).

Numerics: the Woop transform is algebraically equal to Möller–Trumbore
but not bitwise; t agrees to ~1e-6 relative.  The kernel serves the
detached hit *search* only (the integrator stop-gradients it), the jnp
implementation here is its exact-match oracle, and image-level
agreement vs the brute MT path is covered by statistical tests.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rust_pathtracer_tpu.ops.intersect import T_MISS, TRI_DET_EPS
from rust_pathtracer_tpu.scene.types import (
    PRIM_RECT,
    PRIM_SPHERE,
    PRIM_TRIANGLE,
    TEX_CHECKER,
    TEX_IMAGE,
    TEX_SOLID,
)

GROUP = 128          # lane width: one type per 128-column group
# rays per kernel step = BLOCK_ROWS * 128.  Smaller blocks are more
# coherent (better cluster-skip rates) but add grid-step overhead;
# overridable per call / via RPT_BLOCK_ROWS for experiments.
BLOCK_ROWS = 4
# primitive columns per kernel step; larger blocks amortize the
# per-grid-step floor (~9 us measured) over more clusters, and the
# per-cluster sweeps inside are pl.when-skipped independently
COL_BLOCK = 2048
# when ALL columns fit one VMEM-resident block (a+b+const+payload at
# 16384 cols ~ 5.8 MB of a ~16 MB VMEM), collapse the p-block grid
# dimension entirely: tables load once, the ~9 us grid-step floor is
# paid once per ray block instead of once per (ray block, p block),
# and every 128-column cluster skips independently under pl.when
MAX_SINGLE_COLS = 16384

# payload column layout:
#   0-11  Primitives.data row
#   12-15 prim kind / aux / material id / ORIGINAL prim index
#   16-31 flattened shading row (material + texture), so the shading
#         path needs NO per-lane table lookups for large scenes:
#   16 mat kind, 17 fuzz, 18 ir, 19 tex kind, 20 tex scale,
#   21-23 solid color, 24-26 checker odd color, 27-29 checker even
#   color, 30 image id (TEX_IMAGE), 31 spare
PAY_KIND, PAY_AUX, PAY_MAT, PAY_IDX = 12, 13, 14, 15
PAY_MKIND, PAY_FUZZ, PAY_IR, PAY_TKIND, PAY_TSCALE = 16, 17, 18, 19, 20
PAY_COLOR, PAY_ODD, PAY_EVEN, PAY_IMG = 21, 24, 27, 30
PAY_W = 32

_RECT_FREE = {0: (1, 2), 1: (0, 2), 2: (0, 1)}


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ProjTables:
    """Device-side projected-sweep tables.

    ``a``/``b`` are (3, 8, C): three origin/direction projection
    matrices; ``const`` is (8, C) per-column scalars; ``payload`` is
    (C, 32).  ``group_kinds`` (static) is the primitive type of each
    128-column group (-1 = all padding).
    """

    a: jnp.ndarray
    b: jnp.ndarray
    const: jnp.ndarray
    payload: jnp.ndarray
    # (6, C/GROUP): per-128-column-cluster AABB (min xyz, max xyz).
    # Primitive columns keep BVH-leaf order, so clusters are spatially
    # compact; the kernel slab-tests each ray block against a cluster
    # and skips the whole 128-column sweep when no ray can hit it —
    # the TPU-native two-level BVH.
    cluster_bounds: jnp.ndarray = None
    # (n_pblocks, 6, 128): the same bounds laid out for the kernel's
    # vectorized (rays x clusters) slab test (VMEM, lane-padded with
    # degenerate far-point boxes so padding clusters can never pass)
    cluster_bounds_v: jnp.ndarray = None
    group_kinds: Tuple[int, ...] = dataclasses.field(
        default=(), metadata=dict(static=True)
    )
    # True when payload cols 16-31 carry a complete shading row (all
    # checker children are solid), so shading can skip table lookups
    shade_ready: bool = dataclasses.field(
        default=False, metadata=dict(static=True)
    )
    # primitive columns per kernel grid step (== num_cols when the
    # whole table is VMEM-resident in a single p-block)
    col_block: int = dataclasses.field(
        default=COL_BLOCK, metadata=dict(static=True)
    )

    @property
    def num_cols(self) -> int:
        return self.a.shape[-1]


def _pad_up(n: int, m: int) -> int:
    return -(-n // m) * m


def build_projected(kind, aux, data, mat, mats=None, texs=None,
                    max_single_cols=MAX_SINGLE_COLS) -> ProjTables:
    """Host-side (numpy) table build from flattened primitive arrays.

    ``mats``: optional (kind, tex, fuzz, ir) material arrays and
    ``texs``: (kind, color, child, scale, image_id) texture arrays —
    when given, payload columns 16-31 carry each primitive's flattened
    shading row (see PAY_* layout) and ``shade_ready`` is set if every
    checker child is a solid leaf.

    ``max_single_cols``: scenes whose padded column count fits run as
    one VMEM-resident p-block (col_block == num_cols); larger scenes
    stream COL_BLOCK-column blocks (tests pass a small value to force
    the streaming path).
    """
    kind = np.asarray(kind)
    aux = np.asarray(aux)
    data = np.asarray(data, np.float64)  # precompute inverses in f64
    mat = np.asarray(mat)
    P = kind.shape[0]

    order = []  # original indices, grouped by type with per-type padding
    group_kinds = []
    for tk in (PRIM_SPHERE, PRIM_RECT, PRIM_TRIANGLE):
        idxs = np.nonzero(kind == tk)[0]
        if len(idxs) == 0:
            continue
        n_pad = _pad_up(len(idxs), GROUP)
        order.extend(int(i) for i in idxs)
        order.extend([-1] * (n_pad - len(idxs)))
        group_kinds.extend([tk] * (n_pad // GROUP))
    C = _pad_up(max(len(order), 1), GROUP)
    if C > max_single_cols:
        C = _pad_up(C, COL_BLOCK)
        col_block = COL_BLOCK
    else:
        col_block = C
    while len(order) < C:
        order.append(-1)
        if len(order) % GROUP == 0:
            group_kinds.append(-1)
    while len(group_kinds) < C // GROUP:
        group_kinds.append(-1)

    A = np.zeros((3, 8, C), np.float64)
    B = np.zeros((3, 8, C), np.float64)
    K = np.zeros((8, C), np.float64)
    pay = np.zeros((C, PAY_W), np.float64)
    # padding columns: every formula must MISS (see per-type notes)
    K[0, :] = 1.0e30

    order_np = np.asarray(order, np.int64)
    cols = np.nonzero(order_np >= 0)[0]
    prm = order_np[cols]
    pay[cols, :12] = data[prm]
    pay[cols, PAY_KIND] = kind[prm]
    pay[cols, PAY_AUX] = aux[prm]
    pay[cols, PAY_MAT] = mat[prm]
    pay[cols, PAY_IDX] = prm

    shade_ready = False
    if mats is not None and texs is not None:
        mkind, mtex, mfuzz, mir = (np.asarray(x) for x in mats)
        tkind, tcolor, tchild, tscale, timg = (np.asarray(x) for x in texs)
        m = mat[prm]
        tex = mtex[m]
        pay[cols, PAY_MKIND] = mkind[m]
        pay[cols, PAY_FUZZ] = mfuzz[m]
        pay[cols, PAY_IR] = mir[m]
        pay[cols, PAY_TKIND] = tkind[tex]
        pay[cols, PAY_TSCALE] = tscale[tex]
        pay[cols, PAY_COLOR:PAY_COLOR + 3] = tcolor[tex]
        is_ck = tkind[tex] == TEX_CHECKER
        odd, even = tchild[tex, 0], tchild[tex, 1]
        pay[cols, PAY_ODD:PAY_ODD + 3] = np.where(
            is_ck[:, None], tcolor[odd], 0.0
        )
        pay[cols, PAY_EVEN:PAY_EVEN + 3] = np.where(
            is_ck[:, None], tcolor[even], 0.0
        )
        pay[cols, PAY_IMG] = np.where(tkind[tex] == TEX_IMAGE, timg[tex], -1)
        bad = is_ck & (
            (tkind[odd] != TEX_SOLID) | (tkind[even] != TEX_SOLID)
        )
        shade_ready = not bool(bad.any())

    # spheres: K0 = |c|^2 - r^2 (padding's 1e30 makes disc < 0 -> miss)
    sm = kind[prm] == PRIM_SPHERE
    sc, sp = cols[sm], prm[sm]
    ctr = data[sp, 0:3]
    A[0, 0:3, sc] = ctr  # advanced-index dim comes first: (n, 3)
    B[0, 3:6, sc] = ctr
    K[0, sc] = np.einsum("ij,ij->i", ctr, ctr) - data[sp, 3] ** 2

    # rects, grouped by fixed axis (padding keeps K0=1e30 > K1 = 0)
    rm = kind[prm] == PRIM_RECT
    for f, (fa, fb) in _RECT_FREE.items():
        fm = rm & (aux[prm] == f)
        rc, rp = cols[fm], prm[fm]
        A[0, f, rc] = 1.0
        A[0, 6, rc] = -data[rp, 0]
        B[0, 3 + f, rc] = 1.0
        A[1, fa, rc] = 1.0
        B[1, 3 + fa, rc] = 1.0
        A[2, fb, rc] = 1.0
        B[2, 3 + fb, rc] = 1.0
        K[0, rc] = data[rp, 1]
        K[1, rc] = data[rp, 3]
        K[2, rc] = data[rp, 2]
        K[3, rc] = data[rp, 4]

    # triangles: Woop transform W = [e1 e2 n]^-1 via cross products
    tm = kind[prm] == PRIM_TRIANGLE
    tc, tp = cols[tm], prm[tm]
    if len(tc):
        v0, e1, e2 = data[tp, 0:3], data[tp, 3:6], data[tp, 6:9]
        n = np.cross(e1, e2)
        n2 = np.einsum("ij,ij->i", n, n)
        good = n2 > 1e-30
        n2safe = np.where(good, n2, 1.0)[:, None]
        ws = (n / n2safe, np.cross(e2, n) / n2safe, np.cross(n, e1) / n2safe)
        for j, w in enumerate(ws):
            w = np.where(good[:, None], w, 0.0)
            A[j, 0:3, tc] = w  # advanced dim first: (n, 3)
            A[j, 6, tc] = -np.einsum("ij,ij->i", w, v0)
            B[j, 3:6, tc] = w
        K[0, tc] = np.where(good, n2, 0.0)  # degenerate: det 0 -> culled

    # per-column AABBs -> per-128-column cluster AABBs
    col_min = np.full((C, 3), 1.0e30)
    col_max = np.full((C, 3), -1.0e30)
    if len(sc):
        ar = np.abs(data[sp, 3])[:, None]
        col_min[sc] = data[sp, 0:3] - ar
        col_max[sc] = data[sp, 0:3] + ar
    for f, (fa, fb) in _RECT_FREE.items():
        fm = rm & (aux[prm] == f)
        rc, rp = cols[fm], prm[fm]
        if not len(rc):
            continue
        lo = np.empty((len(rc), 3))
        hi = np.empty((len(rc), 3))
        lo[:, f] = hi[:, f] = data[rp, 0]
        lo[:, fa], hi[:, fa] = data[rp, 1], data[rp, 3]
        lo[:, fb], hi[:, fb] = data[rp, 2], data[rp, 4]
        col_min[rc], col_max[rc] = lo, hi
    if len(tc):
        vs = np.stack([v0, v0 + e1, v0 + e2], axis=1)  # (n, 3, 3)
        col_min[tc] = vs.min(axis=1)
        col_max[tc] = vs.max(axis=1)
    glo = col_min.reshape(-1, GROUP, 3).min(axis=1)
    ghi = col_max.reshape(-1, GROUP, 3).max(axis=1)
    # conservative epsilon so f32 rounding can never cull a boundary hit
    pad = 1e-5 * (1.0 + np.maximum(np.abs(glo), np.abs(ghi)))
    nonempty = (glo <= ghi).all(axis=1, keepdims=True)
    glo = np.where(nonempty, glo - pad, glo)
    ghi = np.where(nonempty, ghi + pad, ghi)
    # All-padding groups become DEGENERATE POINT boxes at +1e30, NOT
    # inverted (+1e30, -1e30) boxes: every slab test in this codebase
    # sorts the planes per axis (lo=max(lo,min(b0,b1)), ...), which
    # turns an inverted box into an UNBOUNDED one that passes for every
    # ray — silently defeating the kernel skip hierarchy and the
    # cluster binning key on streaming scenes whose padded column
    # count is not a COL_BLOCK multiple.  A point at 1e30 fails the
    # sorted test for any real ray (per-axis entry times differ) and
    # sits beyond any real entry t for the binning argmin.
    glo = np.where(nonempty, glo, 1.0e30)
    ghi = np.where(nonempty, ghi, 1.0e30)
    cb = np.concatenate([glo, ghi], axis=1).T  # (6, C/GROUP)

    # kernel layout: per p-block, lane-padded to 128 with the same
    # degenerate-point padding boxes
    n_pblocks = C // col_block
    ngrp = col_block // GROUP
    gpad = _pad_up(ngrp, 128)
    cbv = np.empty((n_pblocks, 6, gpad), np.float64)
    cbv[:, :, :] = 1.0e30  # lo = hi = far point -> padding never passes
    for b in range(n_pblocks):
        cbv[b, :, :ngrp] = cb[:, b * ngrp:(b + 1) * ngrp]

    return ProjTables(
        a=jnp.asarray(A, jnp.float32),
        b=jnp.asarray(B, jnp.float32),
        const=jnp.asarray(K, jnp.float32),
        payload=jnp.asarray(pay, jnp.float32),
        cluster_bounds=jnp.asarray(cb, jnp.float32),
        cluster_bounds_v=jnp.asarray(cbv, jnp.float32),
        group_kinds=tuple(group_kinds),
        shade_ready=shade_ready,
        col_block=col_block,
    )


def _group_t(tk, O0, O1, O2, D0, D1, D2, K, onorm, odot, dnorm, t_min):
    """(R, G) hit distances for one statically-typed column group.

    Returns t with T_MISS where invalid; all inputs (R, G) except the
    per-ray (R, 1) norms.
    """
    k0, k1, k2, k3 = K[0:1], K[1:2], K[2:3], K[3:4]  # (1, G) rows
    if tk == PRIM_SPHERE:
        half_b = odot - D0
        cterm = onorm - 2.0 * O0 + k0
        dis = half_b * half_b - dnorm * cterm
        sqrtd = jnp.sqrt(jnp.maximum(dis, 0.0))
        root1 = (-half_b - sqrtd) / dnorm
        root2 = (-half_b + sqrtd) / dnorm
        ok1 = root1 >= t_min
        t = jnp.where(ok1, root1, root2)
        valid = (dis >= 0.0) & (ok1 | (root2 >= t_min))
    elif tk == PRIM_RECT:
        t = -O0 / D0  # inf/NaN when parallel -> bounds comparisons fail
        av = O1 + t * D1
        bv = O2 + t * D2
        valid = (
            (t >= t_min)
            & (av >= k0) & (av <= k1) & (bv >= k2) & (bv <= k3)
        )
    elif tk == PRIM_TRIANGLE:
        det = -D0 * k0  # = d . -n; cull needs det >= eps
        t = -O0 / D0
        u = O1 + t * D1
        v = O2 + t * D2
        valid = (
            (det >= TRI_DET_EPS)
            & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
            & (t >= t_min)
        )
    else:  # all-padding group
        return jnp.full(O0.shape, T_MISS, jnp.float32)
    return jnp.where(valid, t, T_MISS)


def _group_q_sphere(O0, D0, K, onorm, odot, dnorm, t_min):
    """Sphere group hit distances in the SCALED domain q = t * |d|^2.

    |d|^2 is per-ray, so argmin over q picks the same winner as argmin
    over t; the caller divides the single group winner by |d|^2.  This
    removes the two per-pair divisions of the t-domain formula (the
    dominant VPU cost of the sphere sweep).  Returns q with T_MISS
    sentinel where invalid.

    Boundary semantics: the root acceptance test ``q >= fl(t_min*|d|^2)``
    can round differently from the t-domain ``fl(q/|d|^2) >= t_min``
    used by the brute path (ops/intersect), so a root within ~1 ulp of
    t_min may be accepted by one family and rejected by the other.
    Kernel and ref in THIS module share this function, so the
    "Pallas == jnp projected ref" exactness contract is unaffected;
    projected-vs-brute agreement is statistical (module docstring).
    """
    k0 = K[0:1]
    tmin_a = t_min * dnorm  # (R, 1)
    half_b = odot - D0
    cterm = onorm - 2.0 * O0 + k0
    dis = half_b * half_b - dnorm * cterm
    sqrtd = jnp.sqrt(jnp.maximum(dis, 0.0))
    q1 = -half_b - sqrtd
    q2 = -half_b + sqrtd
    ok1 = q1 >= tmin_a
    q = jnp.where(ok1, q1, q2)
    valid = (dis >= 0.0) & (ok1 | (q2 >= tmin_a))
    return jnp.where(valid, q, T_MISS)


def _ray_matrix(o, d):
    R = o.shape[0]
    return jnp.concatenate(
        [o, d, jnp.ones((R, 1), o.dtype), jnp.zeros((R, 1), o.dtype)], axis=1
    )


def closest_hit_projected_ref(tables: ProjTables, o, d, t_min):
    """Pure-jnp reference of the projected sweep (exact-match oracle for
    the Pallas kernel; also usable on CPU).  Returns (hit, t, payload)
    with payload (R, PAY_W)."""
    rays = _ray_matrix(o, d)
    hp = jax.lax.Precision.HIGHEST
    O = jnp.einsum("rk,jkc->jrc", rays, tables.a, precision=hp)
    D = jnp.einsum("rk,jkc->jrc", rays, tables.b, precision=hp)
    onorm = jnp.sum(o * o, axis=-1, keepdims=True)
    odot = jnp.sum(o * d, axis=-1, keepdims=True)
    dnorm = jnp.sum(d * d, axis=-1, keepdims=True)

    cols = []
    for g, tk in enumerate(tables.group_kinds):
        sl = slice(g * GROUP, (g + 1) * GROUP)
        cols.append(
            _group_t(
                tk,
                O[0][:, sl], O[1][:, sl], O[2][:, sl],
                D[0][:, sl], D[1][:, sl], D[2][:, sl],
                tables.const[:, sl],
                onorm, odot, dnorm, t_min,
            )
        )
    tmat = jnp.concatenate(cols, axis=1)  # (R, C)
    best_c = jnp.argmin(tmat, axis=1).astype(jnp.int32)
    best_t = jnp.min(tmat, axis=1)
    hit = best_t < T_MISS
    onehot = (
        best_c[:, None] == np.arange(tables.num_cols, dtype=np.int32)
    ).astype(jnp.float32)
    payload = jnp.dot(
        onehot, tables.payload, preferred_element_type=jnp.float32, precision=hp
    )
    return hit, jnp.where(hit, best_t, T_MISS), payload


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------
def _kernel(group_kinds, t_min, n_pblocks, col_block, super_groups,
            rays_ref, a_ref, b_ref, k_ref, pay_ref, cbv_ref,
            t_ref, c_ref, payout_ref, tb_ref, cb_ref):
    """Grid (ray_blocks, p_blocks); p minor => sequential running min.

    Control structure (measured on v5e: the per-group sequential slab
    test + two pl.when's cost ~2.3 us/group, a 183 us/step floor at 80
    clusters even with every sweep skipped — so the skip logic itself
    must be vectorized and hierarchical):

    * ONE (rays, 128) slab computation per step gives entry/exit t for
      every cluster at once (lo/hi don't depend on the running best —
      tightening is just min(hi, best) at compare time);
    * one block-level pl.when skips everything when no ray can hit any
      cluster (dead/parked blocks cost ~one conditional);
    * clusters are grouped into supers of ``super_groups``; a super
      that no ray can still hit costs one conditional, not 8;
    * the per-block running best lives in tb/cb scratch and each
      group's sweep UPDATES IT IN PLACE under its pl.when — no
      else-branch writes, no post-merge.

    All culling is conservative (slab-pass is necessary for any hit at
    t < current best), so results are identical to the dense sweep.
    """
    jb = pl.program_id(1)

    rays = rays_ref[:]  # (RB*128, 8)
    o = rays[:, 0:3]
    d = rays[:, 3:6]
    onorm = jnp.sum(o * o, axis=-1, keepdims=True)
    odot = jnp.sum(o * d, axis=-1, keepdims=True)
    dnorm = jnp.sum(d * d, axis=-1, keepdims=True)

    hp = jax.lax.Precision.HIGHEST

    @pl.when(jb == 0)
    def _init():
        t_ref[:] = jnp.full(t_ref.shape, T_MISS, jnp.float32)
        c_ref[:] = jnp.full(c_ref.shape, -1, jnp.int32)
        payout_ref[:] = jnp.zeros(payout_ref.shape, jnp.float32)

    # per-block running best: t carried from earlier p-blocks, local
    # column -1 (>=0 after the loop marks a strict improvement)
    tb_ref[:] = t_ref[:]
    cb_ref[:] = jnp.full(cb_ref.shape, -1, jnp.int32)

    # slab-test reciprocals; clamped (not inf) so products stay finite
    tiny = np.float32(1e-30)
    dsafe = jnp.where(jnp.abs(d) < tiny, jnp.where(d < 0.0, -tiny, tiny), d)
    inv_d = 1.0 / dsafe

    # vectorized slab test, every cluster of this p-block at once
    # (bvh.rs:18-35 semantics): cbv_ref is (1, 6, GPAD) with padding
    # clusters carrying degenerate far-point boxes that fail the
    # sorted slab test for any real ray
    cbv = cbv_ref[0]  # (6, GPAD)
    lo = jnp.full((rays.shape[0], cbv.shape[1]), t_min, jnp.float32)
    hi = jnp.full((rays.shape[0], cbv.shape[1]), T_MISS, jnp.float32)
    for ax in range(3):
        b0 = (cbv[ax:ax + 1, :] - o[:, ax:ax + 1]) * inv_d[:, ax:ax + 1]
        b1 = (cbv[3 + ax:4 + ax, :] - o[:, ax:ax + 1]) * inv_d[:, ax:ax + 1]
        lo = jnp.maximum(lo, jnp.minimum(b0, b1))
        hi = jnp.minimum(hi, jnp.maximum(b0, b1))

    kconst = k_ref[:]  # (8, CB)
    ngrp = col_block // GROUP
    real_groups = [
        g for g in range(ngrp)
        if any(group_kinds[blk * ngrp + g] != -1 for blk in range(n_pblocks))
    ]
    if not real_groups:
        return  # every group of this block is padding in every p-block

    block_any = jnp.any(
        jnp.minimum(hi[:, : ngrp], tb_ref[:]) >= lo[:, : ngrp]
    )

    @pl.when(block_any)
    def _block():
        def sweep_group(g):
            sl = slice(g * GROUP, (g + 1) * GROUP)
            tg_all = [group_kinds[blk * ngrp + g] for blk in range(n_pblocks)]
            pad_blocks = [blk for blk, k in enumerate(tg_all) if k == -1]
            sphere_only = set(tg_all) <= {PRIM_SPHERE, -1}

            g_any = jnp.any(
                jnp.minimum(hi[:, g:g + 1], tb_ref[:]) >= lo[:, g:g + 1]
            )
            if pad_blocks and n_pblocks > 1:
                is_pad = None
                for blk in pad_blocks:
                    cmp = jb == blk
                    is_pad = cmp if is_pad is None else (is_pad | cmp)
                g_any = g_any & jnp.logical_not(is_pad)

            @pl.when(g_any)
            def _sweep():
                if sphere_only:
                    # deferred-division fast path: only the center
                    # projection is needed; compare in q = t * |d|^2
                    O0 = jnp.dot(rays, a_ref[0][:, sl],
                                 preferred_element_type=jnp.float32,
                                 precision=hp)
                    D0 = jnp.dot(rays, b_ref[0][:, sl],
                                 preferred_element_type=jnp.float32,
                                 precision=hp)
                    tgs = _group_q_sphere(
                        O0, D0, kconst[:, sl], onorm, odot, dnorm, t_min
                    )
                else:
                    Og = [jnp.dot(rays, a_ref[i][:, sl],
                                  preferred_element_type=jnp.float32,
                                  precision=hp)
                          for i in range(3)]
                    Dg = [jnp.dot(rays, b_ref[i][:, sl],
                                  preferred_element_type=jnp.float32,
                                  precision=hp)
                          for i in range(3)]
                    # the group's type depends on which p-block this
                    # step handles; select among the few distinct
                    # formulas with a scalar OR-chain on program_id
                    distinct = sorted(set(k for k in tg_all if k != -1))
                    tgs = None
                    for tk in distinct:
                        tcand = _group_t(
                            tk, Og[0], Og[1], Og[2], Dg[0], Dg[1], Dg[2],
                            kconst[:, sl], onorm, odot, dnorm, t_min,
                        )
                        if tgs is None:
                            tgs = tcand
                        else:
                            sel = None
                            for blk, k in enumerate(tg_all):
                                if k == tk:
                                    cmp = jb == blk
                                    sel = cmp if sel is None else (sel | cmp)
                            tgs = jnp.where(sel, tcand, tgs)
                gt = jnp.min(tgs, axis=1, keepdims=True)          # (R, 1)
                iota = jax.lax.broadcasted_iota(jnp.int32, tgs.shape, 1)
                gc = jnp.min(
                    jnp.where(tgs <= gt, iota, np.int32(2 ** 30)), axis=1,
                    keepdims=True,
                ) + g * GROUP
                if sphere_only:
                    # one division for the group winner recovers t
                    gt = jnp.where(gt >= T_MISS, T_MISS, gt / dnorm)
                cur = tb_ref[:]
                take = gt < cur
                tb_ref[:] = jnp.where(take, gt, cur)
                cb_ref[:] = jnp.where(take, gc, cb_ref[:])

        sg = max(super_groups, 1)
        for s0 in range(0, len(real_groups), sg):
            chunk = real_groups[s0:s0 + sg]
            if len(chunk) == 1:
                sweep_group(chunk[0])
                continue
            # test the contiguous column span (padding groups inside it
            # carry far-point boxes, so they can never force a sweep)
            g_lo, g_hi = chunk[0], chunk[-1] + 1
            super_any = jnp.any(
                jnp.minimum(hi[:, g_lo:g_hi], tb_ref[:])
                >= lo[:, g_lo:g_hi]
            )

            @pl.when(super_any)
            def _super(chunk=tuple(chunk)):
                for g in chunk:
                    sweep_group(g)

    # commit improvements — including the winner-payload one-hot MXU
    # contraction — only when some ray actually improved; for most
    # steps nothing does, which keeps the per-step floor low
    best_t = tb_ref[:]
    best_c = cb_ref[:]
    upd = best_c >= 0
    any_upd = jnp.any(upd)

    @pl.when(any_upd)
    def _commit():
        iota_cb = jax.lax.broadcasted_iota(
            jnp.int32, (rays.shape[0], col_block), 1
        )
        onehot = (iota_cb == best_c).astype(jnp.float32)
        blk_pay = jnp.dot(onehot, pay_ref[:],
                          preferred_element_type=jnp.float32, precision=hp)
        t_ref[:] = jnp.where(upd, best_t, t_ref[:])
        c_ref[:] = jnp.where(upd, best_c + jb * col_block, c_ref[:])
        payout_ref[:] = jnp.where(upd, blk_pay, payout_ref[:])


@functools.partial(
    jax.jit,
    static_argnames=(
        "group_kinds", "t_min", "block_rows", "interpret", "col_block",
        "super_groups",
    ),
)
def _closest_hit_projected(rays, a, b, const, payload, cbv, *,
                           group_kinds, t_min, block_rows=BLOCK_ROWS,
                           interpret=False, col_block=COL_BLOCK,
                           super_groups=8):
    R8 = rays.shape[0]
    C = a.shape[-1]
    n_pblocks = C // col_block
    rb = block_rows * 128
    grid = (R8 // rb, n_pblocks)

    kernel = functools.partial(_kernel, group_kinds, t_min, n_pblocks,
                               col_block, super_groups)
    t, c, pay = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rb, 8), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 8, col_block), lambda i, j: (0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 8, col_block), lambda i, j: (0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, col_block), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((col_block, PAY_W), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            # this p-block's cluster bounds, lane-padded (VMEM vectors)
            pl.BlockSpec((1, 6, cbv.shape[-1]), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rb, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, PAY_W), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
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
        scratch_shapes=[
            pltpu.VMEM((rb, 1), jnp.float32),
            pltpu.VMEM((rb, 1), jnp.int32),
        ],
        interpret=interpret,
    )(rays, a, b, const, payload, cbv)
    return t[:, 0], c[:, 0], pay


# ---------------------------------------------------------------------------
# Ray binning: sort rays by nearest-entry cluster between bounces
# ---------------------------------------------------------------------------
def cluster_entry_key(cluster_bounds, o, d, t_min):
    """Primary-cluster key per ray: the index of the cluster AABB with
    the nearest slab-test entry t (bvh.rs:18-35 semantics), or G (the
    number of clusters) when the ray enters none — so rays that will
    miss everything (including parked dead lanes) sort to the end.

    cluster_bounds: (6, G) min-xyz / max-xyz; o, d: (R, 3).
    Returns int32 (R,) in [0, G].
    """
    tiny = np.float32(1e-30)
    dsafe = jnp.where(jnp.abs(d) < tiny, jnp.where(d < 0.0, -tiny, tiny), d)
    inv_d = 1.0 / dsafe
    G = cluster_bounds.shape[1]
    lo = jnp.full((o.shape[0], G), np.float32(t_min))
    hi = jnp.full((o.shape[0], G), T_MISS)
    for ax in range(3):
        b0 = (cluster_bounds[ax][None, :] - o[:, ax:ax + 1]) * inv_d[:, ax:ax + 1]
        b1 = (cluster_bounds[3 + ax][None, :] - o[:, ax:ax + 1]) * inv_d[:, ax:ax + 1]
        lo = jnp.maximum(lo, jnp.minimum(b0, b1))
        hi = jnp.minimum(hi, jnp.maximum(b0, b1))
    entry = jnp.where(hi >= lo, lo, T_MISS)
    best = jnp.min(entry, axis=1)
    key = jnp.argmin(entry, axis=1).astype(jnp.int32)
    return jnp.where(best < T_MISS, key, np.int32(G))


def closest_hit_projected_binned(tables: ProjTables, o, d, t_min,
                                 interpret=False, block_rows=None):
    """Projected sweep over rays SORTED by primary cluster.

    Per-ray results are independent of wavefront order (the kernel's
    cluster culling is conservative), so this returns bitwise-identical
    (hit, t, payload) to the unsorted sweep — but sorted ray blocks are
    cluster-homogeneous, so the in-kernel ``pl.when`` skips most of the
    O(rays x prims) work.  This is the TPU-native analog of the
    reference's BVH pruning (bvh.rs:106-126): the tree walk becomes
    sort + mostly-skipped dense sweeps.
    """
    R = o.shape[0]
    key = cluster_entry_key(tables.cluster_bounds, o, d, t_min)
    iota = jnp.arange(R, dtype=jnp.int32)
    # lax.sort pairs, NOT jnp.argsort (argsort at 1M lanes wedged the
    # remote TPU compile service; key/value sort compiles fine)
    _, perm = jax.lax.sort((key, iota), num_keys=1)
    hit_s, t_s, pay_s = closest_hit_projected(
        tables, o[perm], d[perm], t_min, interpret, block_rows
    )
    # scatter results back to original lane order (unique indices)
    hit = jnp.zeros((R,), jnp.bool_).at[perm].set(hit_s)
    t = jnp.full((R,), T_MISS, jnp.float32).at[perm].set(t_s)
    pay = jnp.zeros((R, PAY_W), jnp.float32).at[perm].set(pay_s)
    return hit, t, pay


def passset_perm(tables: ProjTables, o, d, alive, t_min=None):
    """Permutation sorting lanes lexicographically by their EXACT
    cluster pass-set bitmask (dead lanes last).

    Every proxy reorder key tried in round 2 (entry cluster, last-hit
    cluster, direction octant, Morton origin) plateaued 12-25x above
    the per-ray culling ideal on diffuse bounces, because a 1024-ray
    block mixes rays whose pass-sets barely overlap.  Sorting by the
    pass-set ITSELF groups identical sets into the same blocks by
    construction: measured on real ModelTest bounce-1 rays
    (tools/passset_union.py), block-union work drops 3.1x vs the
    production (cluster, octant) key (1727 -> 555 cluster sweeps;
    union mean 27.0 -> 8.7 of 80, per-ray ideal 2.5).

    Cost: one fused (R, G) slab test + bit-pack (~2 GFLOP and ~300 MB
    of fused elementwise traffic at 1M lanes) + a (G/32+1)-key
    lax.sort.  Per-ray hit results are independent of wavefront order
    (the kernel's culling is conservative), and the iota tie-break key
    makes the permutation fully deterministic.
    """
    keys = passset_sort_keys(tables, o, d, alive, t_min)
    iota = jnp.arange(o.shape[0], dtype=jnp.int32)
    out = jax.lax.sort(keys + (iota,), num_keys=len(keys) + 1)
    return out[-1]


def passset_sort_keys(tables: ProjTables, o, d, alive, t_min=None):
    """Lexicographic sort keys (tuple of uint32 (R,) arrays) grouping
    lanes by exact cluster pass-set, dead lanes strictly last.

    Key 0 is the dead flag (so compaction slices can rely on live
    lanes sorting first even when a live lane passes every cluster of
    a G%32==0 scene, which would alias the all-ones dead marker in the
    word keys); keys 1..n are the packed pass-set bitmask words.
    Append an iota key for a fully deterministic permutation.
    """
    if t_min is None:
        t_min = 1e-3
    cb = tables.cluster_bounds  # (6, G)
    G = cb.shape[1]
    R = o.shape[0]
    tiny = np.float32(1e-30)
    dsafe = jnp.where(jnp.abs(d) < tiny, jnp.where(d < 0.0, -tiny, tiny), d)
    inv_d = 1.0 / dsafe
    lo = jnp.full((R, G), np.float32(t_min))
    hi = jnp.full((R, G), T_MISS)
    for ax in range(3):
        b0 = (cb[ax][None, :] - o[:, ax:ax + 1]) * inv_d[:, ax:ax + 1]
        b1 = (cb[3 + ax][None, :] - o[:, ax:ax + 1]) * inv_d[:, ax:ax + 1]
        lo = jnp.maximum(lo, jnp.minimum(b0, b1))
        hi = jnp.minimum(hi, jnp.maximum(b0, b1))
    mask = (hi >= lo) & alive[:, None]
    nwords = (G + 31) // 32
    shifts = np.arange(32, dtype=np.uint32)
    words = [(~alive).astype(jnp.uint32)]
    for w in range(nwords):
        bits = mask[:, w * 32:(w + 1) * 32]
        weights = (np.uint32(1) << shifts[: bits.shape[1]])
        word = jnp.sum(bits.astype(jnp.uint32) * weights[None, :], axis=1,
                       dtype=jnp.uint32)
        words.append(jnp.where(alive, word, jnp.uint32(0xFFFFFFFF)))
    return tuple(words)


def use_passset_reorder() -> bool:
    """RPT_REORDER_KEY selects the between-bounce reorder key:
    "passset" (default; exact pass-set bitmask sort above) or "octant"
    (the round-2 (last-hit cluster, direction octant) proxy key) for
    A/B measurement."""
    import os

    return os.environ.get("RPT_REORDER_KEY", "passset") != "octant"


def use_wavefront_reorder(tables: ProjTables) -> bool:
    """Static routing: sort the wavefront by cluster between bounces
    when the scene has enough real clusters for homogeneous ray blocks
    to skip meaningful sweep work (RPT_BIN=0/1 overrides).  The sort
    itself lives in the integrator (integrator.trace) so state moves
    once per bounce instead of per search call."""
    import os

    mode = os.environ.get("RPT_BIN", "auto")
    if mode == "0":
        return False
    if mode == "1":
        return True
    n_real = sum(1 for k in tables.group_kinds if k != -1)
    return n_real >= 4


def use_worklist(tables: ProjTables) -> bool:
    """Static routing to the v3 pair-worklist kernel (ops/worklist.py):
    on for any scene with >=2 real clusters (the worklist degenerates
    gracefully to ~dense for fully-coherent loads and wins everywhere
    the per-step floor or untouched clusters dominate).  RPT_V3=0/1
    overrides for A/B measurement."""
    import os

    mode = os.environ.get("RPT_V3", "auto")
    if mode == "0":
        return False
    if mode == "1":
        return True
    n_real = sum(1 for k in tables.group_kinds if k != -1)
    return n_real >= 2


def use_resident(tables: ProjTables) -> bool:
    """Static routing to the v4 table-resident kernel (ops/resident.py):
    on when the projected tables fit the VMEM budget and the scene has
    >=2 real clusters.  RPT_V4=0/1 overrides for A/B measurement."""
    import os

    from rust_pathtracer_tpu.ops.resident import RES_MAX_COLS

    mode = os.environ.get("RPT_V4", "auto")
    if mode == "0":
        return False
    if mode == "1":
        return True
    n_real = sum(1 for k in tables.group_kinds if k != -1)
    return n_real >= 2 and tables.num_cols <= RES_MAX_COLS


def closest_hit_record_projected(scene, o, d, t_min, interpret=False):
    """Projected sweep + full HitRecord from the in-kernel payload.

    Drop-in peer of pallas_intersect.closest_hit_record_pallas for
    scenes too large for the unrolled v1 sweep.  Non-differentiable
    (the integrator uses it on the detached forward path only).
    Returns (hit, t, idx, rec, shade_row, cluster): ``cluster`` is the
    winning 128-column cluster id (int32, junk on miss lanes) — the
    integrator's between-bounce reordering key.
    """
    from rust_pathtracer_tpu.ops.intersect import record_from_rows

    # NOTE: the round-2 v5 pair-queue (ops/queue.py) and v6 top-K
    # (ops/topk.py) kernels — per-ray-volume-bound sweeps that
    # measured negative at full width (DESIGN.md §11) — were removed
    # in round 3 after v4 gained block-level t-pruning; git history
    # keeps them (commit "Prune the dormant v5/v6 kernel family").
    if use_resident(scene.proj):
        from rust_pathtracer_tpu.ops.resident import closest_hit_resident

        hit, t, pay, col = closest_hit_resident(
            scene.proj, o, d, t_min, interpret, with_column=True
        )
    elif use_worklist(scene.proj):
        from rust_pathtracer_tpu.ops.worklist import closest_hit_pairs

        hit, t, pay, col = closest_hit_pairs(
            scene.proj, o, d, t_min, interpret, with_column=True
        )
    else:
        hit, t, pay, col = closest_hit_projected(
            scene.proj, o, d, t_min, interpret, with_column=True
        )
    kind = jnp.round(pay[:, PAY_KIND]).astype(jnp.int32)
    aux = jnp.round(pay[:, PAY_AUX]).astype(jnp.int32)
    mat = jnp.round(pay[:, PAY_MAT]).astype(jnp.int32)
    idx = jnp.maximum(jnp.round(pay[:, PAY_IDX]).astype(jnp.int32), 0)
    t_safe = jnp.where(hit, t, 1.0)
    rec = record_from_rows(
        kind, aux, pay[:, :12], mat, idx, o, d, t_safe, hit,
        prim_types=scene.prim_types,
    )
    shade_row = pay[:, PAY_MKIND:] if scene.proj.shade_ready else None
    cluster = jnp.where(col >= 0, col // GROUP, 0).astype(jnp.int32)
    return hit, t_safe, idx, rec, shade_row, cluster


def closest_hit_projected(tables: ProjTables, o, d, t_min, interpret=False,
                          block_rows=None, with_column=False):
    """Pallas projected sweep.  Returns (hit, t, payload (R, PAY_W))
    (plus the winning global column, -1 on miss, when ``with_column``)."""
    import os

    if block_rows is None:
        env = os.environ.get("RPT_BLOCK_ROWS")
        if env is not None:
            block_rows = int(env)
        else:
            # floor-vs-VMEM trade: each grid step costs ~33 us of fixed
            # work, so small-column scenes want bigger ray blocks; the
            # commit's (rb, col_block) one-hot bounds rb (measured
            # scoped-VMEM OOMs: 24 MB at 16x10240, 19.8 MB at 16x640 —
            # 8 rows is the proven-safe tier for single-p-block scenes)
            C = tables.num_cols
            block_rows = 8 if C <= 2048 else BLOCK_ROWS
    super_groups = int(os.environ.get("RPT_SUPER", 8))
    R = o.shape[0]
    rb = block_rows * 128
    Rp = _pad_up(R, rb)
    rays = _ray_matrix(o, d)
    rays = jnp.pad(rays, ((0, Rp - R), (0, 0)))
    t, c, pay = _closest_hit_projected(
        rays, tables.a, tables.b, tables.const, tables.payload,
        tables.cluster_bounds_v,
        group_kinds=tables.group_kinds, t_min=float(t_min),
        block_rows=block_rows, interpret=interpret,
        col_block=tables.col_block, super_groups=super_groups,
    )
    t, c, pay = t[:R], c[:R], pay[:R]
    hit = c >= 0
    t = jnp.where(hit, t, T_MISS)
    if with_column:
        return hit, t, pay, c
    return hit, t, pay
