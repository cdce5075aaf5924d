"""Batched ray/primitive intersection (pure-jnp reference implementation).

These are the correctness oracles for the Pallas kernels and the
workhorses on CPU; shapes broadcast so the same code serves both the
brute-force (R, P) sweep and the per-lane gathered BVH leaf tests (R,).

Numeric conventions copied from the reference:
* rays keep **unnormalized** directions; t is in units of |d|;
* sphere: half-b quadratic, nearest root first, inclusive
  [t_min, t_max] (geometry.rs:132-163); negative radius flips normals
  (hollow glass, scene.rs:133);
* rect: plane solve + 2D bounds, fixed +/-axis normal (geometry.rs:210+);
* triangle: Möller-Trumbore with one-sided cull det < 1e-4
  (geometry.rs:519-558), reported uv = (0, 0);
* AABB slab test with swap-on-negative and the *NaN-ignoring* min/max
  the Rust f64::min/max semantics imply (bvh.rs:18-35) — jnp.fmin/fmax.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from rust_pathtracer_tpu import vecmath as vm
from rust_pathtracer_tpu.scene.types import (
    PRIM_RECT,
    PRIM_SPHERE,
    PRIM_TRIANGLE,
    Primitives,
)

# Sentinel "no hit" distance. Large but finite so arithmetic stays NaN-free.
T_MISS = np.float32(3.0e38)

TRI_DET_EPS = 1e-4  # one-sided cull threshold (geometry.rs:526)

# rect fixed-axis -> (a, b) free axes, ascending (types.py layout)
_RECT_A = np.array([1, 0, 0], np.int32)
_RECT_B = np.array([2, 2, 1], np.int32)


class HitRecord(NamedTuple):
    """Vectorized HitRecord (geometry.rs:9-41)."""

    valid: jnp.ndarray       # bool (...,)
    t: jnp.ndarray           # f32 (...,)
    point: jnp.ndarray       # f32 (..., 3)
    normal: jnp.ndarray      # f32 (..., 3), flipped to oppose the ray
    front_face: jnp.ndarray  # bool (...,)
    u: jnp.ndarray           # f32 (...,)
    v: jnp.ndarray           # f32 (...,)
    mat: jnp.ndarray         # i32 (...,)
    prim: jnp.ndarray        # i32 (...,)


def _axis_onehot(axis_idx, table=None):
    """(...,) int axis index -> (..., 3) one-hot float mask.

    Tables stay numpy: np constants lower straight from host memory,
    while eager jnp constants would live on device and need a
    device->host fetch at lowering (slow over the axon TPU tunnel).
    """
    idx = axis_idx if table is None else jnp.take(table, axis_idx)
    return (idx[..., None] == np.arange(3, dtype=np.int32)).astype(jnp.float32)


def _pick(vec, axis_idx, table=None):
    """Select per-lane component vec[..., table[axis_idx]] without gathers."""
    return jnp.sum(vec * _axis_onehot(axis_idx, table), axis=-1)


def sphere_t(data, o, d, t_min, t_max):
    """Sphere intersection distance (geometry.rs:132-163)."""
    center = data[..., 0:3]
    radius = data[..., 3]
    oc = o - center
    a = vm.length_squared(d)
    half_b = vm.dot(d, oc)
    c = vm.length_squared(oc) - radius * radius
    dis = half_b * half_b - a * c
    sqrtd = vm.safe_sqrt(dis)  # zero-grad at dis<=0 (miss lanes)
    root1 = (-half_b - sqrtd) / a
    root2 = (-half_b + sqrtd) / a
    ok1 = (root1 >= t_min) & (root1 <= t_max)
    ok2 = (root2 >= t_min) & (root2 <= t_max)
    t = jnp.where(ok1, root1, root2)
    valid = (dis >= 0.0) & (ok1 | ok2)
    return jnp.where(valid, t, T_MISS), valid


def rect_t(data, aux, o, d, t_min, t_max):
    """Axis-aligned rect intersection distance (geometry.rs:210-231 etc.)."""
    k = data[..., 0]
    a0, b0, a1, b1 = data[..., 1], data[..., 2], data[..., 3], data[..., 4]
    o_fix = _pick(o, aux)
    d_fix = _pick(d, aux)
    # parallel rays (d_fix ~ 0) must miss without producing inf/NaN that
    # would poison gradients through the masked-out branch
    parallel = jnp.abs(d_fix) < 1e-30
    t = jnp.where(parallel, T_MISS, (k - o_fix) / jnp.where(parallel, 1.0, d_fix))
    a_val = _pick(o, aux, _RECT_A) + t * _pick(d, aux, _RECT_A)
    b_val = _pick(o, aux, _RECT_B) + t * _pick(d, aux, _RECT_B)
    valid = (
        (t >= t_min)
        & (t <= t_max)
        & (a_val >= a0)
        & (a_val <= a1)
        & (b_val >= b0)
        & (b_val <= b1)
    )
    return jnp.where(valid, t, T_MISS), valid


def triangle_t(data, o, d, t_min, t_max):
    """Möller-Trumbore, one-sided (geometry.rs:519-549)."""
    p1 = data[..., 0:3]
    e1 = data[..., 3:6]
    e2 = data[..., 6:9]
    pvec = vm.cross(d, e2)
    det = vm.dot(e1, pvec)
    # guard the reciprocal; det <= eps lanes are culled anyway
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-30, det, 1.0)
    tvec = o - p1
    u = vm.dot(tvec, pvec) * inv_det
    qvec = vm.cross(tvec, e1)
    v = vm.dot(d, qvec) * inv_det
    t = vm.dot(e2, qvec) * inv_det
    valid = (
        (det >= TRI_DET_EPS)
        & (u >= 0.0)
        & (u <= 1.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t >= t_min)
        & (t <= t_max)
    )
    return jnp.where(valid, t, T_MISS), valid


def prim_intersect_t(kind, aux, data, o, d, t_min, t_max, prim_types=None):
    """Distance to one primitive per lane, dispatching on ``kind``.

    All shapes broadcast; ``prim_types`` (static) skips absent branches.
    Returns (t, valid) with t == T_MISS where invalid.
    """
    types = prim_types if prim_types is not None else (0, 1, 2)
    t = jnp.broadcast_to(T_MISS, jnp.broadcast_shapes(kind.shape, o.shape[:-1]))
    valid = jnp.zeros(t.shape, bool)
    if PRIM_SPHERE in types:
        ts, vs = sphere_t(data, o, d, t_min, t_max)
        sel = (kind == PRIM_SPHERE) & vs
        t = jnp.where(sel, ts, t)
        valid |= sel
    if PRIM_RECT in types:
        tr, vr = rect_t(data, aux, o, d, t_min, t_max)
        sel = (kind == PRIM_RECT) & vr
        t = jnp.where(sel, tr, t)
        valid |= sel
    if PRIM_TRIANGLE in types:
        tt, vt = triangle_t(data, o, d, t_min, t_max)
        sel = (kind == PRIM_TRIANGLE) & vt
        t = jnp.where(sel, tt, t)
        valid |= sel
    return t, valid


def aabb_hit(bbox_min, bbox_max, o, inv_d, t_min, t_max):
    """Slab test (bvh.rs:18-35). ``inv_d`` precomputed; fmax/fmin drop
    the NaNs that arise when a ray origin lies on a zero-thickness slab,
    matching Rust's f64::max/min NaN behavior."""
    t0 = (bbox_min - o) * inv_d
    t1 = (bbox_max - o) * inv_d
    lo = jnp.where(inv_d < 0.0, t1, t0)
    hi = jnp.where(inv_d < 0.0, t0, t1)
    tmin_acc = jnp.fmax(jnp.max(lo, axis=-1), t_min)
    tmax_acc = jnp.fmin(jnp.min(hi, axis=-1), t_max)
    return tmax_acc > tmin_acc


def closest_hit_brute_chunked(
    prims: Primitives, o, d, t_min, t_max, prim_types=None, chunk: int = 512
):
    """Dense sweep in primitive blocks of ``chunk``: bounds peak memory
    to (R, chunk) and keeps everything gather-free.  The TPU path for
    scenes too large to unroll in the Pallas sweep — per-lane BVH
    traversal gathers are pathological on TPU (device faults observed),
    while a dense 10k-primitive sweep is a regular VPU workload."""
    num = prims.kind.shape[0]
    nchunks = -(-num // chunk)
    pad = nchunks * chunk - num
    kind = jnp.pad(prims.kind, (0, pad), constant_values=-1)
    aux = jnp.pad(prims.aux, (0, pad))
    data = jnp.pad(prims.data, ((0, pad), (0, 0)))

    ob = o[..., None, :]
    db = d[..., None, :]
    best_t = jnp.full(o.shape[:-1], T_MISS, jnp.float32)
    best_i = jnp.full(o.shape[:-1], -1, jnp.int32)

    def body(c, carry):
        best_t, best_i = carry
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, c * chunk, chunk)
        t, valid = prim_intersect_t(
            sl(kind), sl(aux), sl(data), ob, db, t_min, t_max, prim_types
        )  # (R, chunk)
        ci = jnp.argmin(t, axis=-1).astype(jnp.int32)
        ct = jnp.min(t, axis=-1)
        upd = jnp.any(valid, axis=-1) & (ct < best_t)
        best_t = jnp.where(upd, ct, best_t)
        best_i = jnp.where(upd, c * chunk + ci, best_i)
        return best_t, best_i

    best_t, best_i = jax.lax.fori_loop(0, nchunks, body, (best_t, best_i))
    hit = best_i >= 0
    return hit, jnp.where(hit, best_t, T_MISS), jnp.maximum(best_i, 0)


def closest_hit_brute(prims: Primitives, o, d, t_min, t_max, prim_types=None):
    """Closest hit by dense sweep over all P primitives.

    o, d: (R, 3). Returns (hit (R,), t (R,), idx (R,)).  The winner of
    the (R, P) t-matrix argmin reproduces the reference's linear-scan
    closest hit (geometry.rs:71-83); on TPU this is a perfectly regular
    VPU workload for the small scenes where it beats BVH traversal.
    """
    ob = o[..., None, :]  # (R, 1, 3)
    db = d[..., None, :]
    t, valid = prim_intersect_t(
        prims.kind, prims.aux, prims.data, ob, db, t_min, t_max, prim_types
    )  # (R, P)
    idx = jnp.argmin(t, axis=-1).astype(jnp.int32)
    tbest = jnp.min(t, axis=-1)
    hit = jnp.any(valid, axis=-1)
    return hit, tbest, idx


# Per-lane random gathers into small tables are pathologically slow on
# TPU (~10ms for 1M lanes x 20 rows, measured); a one-hot contraction
# computes the same thing on the MXU in microseconds and is
# differentiable w.r.t. the table.  Above this row count the one-hot
# matrix gets expensive and real gathers win.
ONEHOT_GATHER_MAX_ROWS = 128


def gather_prim_rows(prims: Primitives, idx):
    """prims rows at per-lane indices: (kind, aux, data, mat)."""
    num = prims.kind.shape[0]
    idx = jnp.clip(idx, 0, num - 1)
    if num <= ONEHOT_GATHER_MAX_ROWS:
        onehot = (idx[..., None] == np.arange(num, dtype=np.int32)).astype(
            jnp.float32
        )
        table = jnp.concatenate(
            [
                prims.data,
                prims.kind[:, None].astype(jnp.float32),
                prims.aux[:, None].astype(jnp.float32),
                prims.mat[:, None].astype(jnp.float32),
            ],
            axis=1,
        )  # (P, 15)
        # HIGHEST precision: the MXU's default bf16 decomposition would
        # corrupt f32 table values (geometry coordinates, int codes);
        # with full-precision passes a one-hot contraction is exact.
        rows = jnp.dot(
            onehot,
            table,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        data = rows[..., :12]
        kind = jnp.round(rows[..., 12]).astype(jnp.int32)
        aux = jnp.round(rows[..., 13]).astype(jnp.int32)
        mat = jnp.round(rows[..., 14]).astype(jnp.int32)
        return kind, aux, data, mat
    return prims.kind[idx], prims.aux[idx], prims.data[idx], prims.mat[idx]


def hit_record(
    prims: Primitives, idx, o, d, t, valid, prim_types=None
) -> HitRecord:
    """Build the shading payload for the chosen primitive per lane.

    Reproduces HitRecord::new's front-face flip (geometry.rs:29-41),
    sphere UV (geometry.rs:120-128), rect UV (geometry.rs:225-230 etc.)
    and the triangle's flat normal + uv=(0,0) (geometry.rs:550-558).
    """
    idx = jnp.clip(idx, 0, prims.kind.shape[0] - 1)
    kind, aux, data, mat = gather_prim_rows(prims, idx)
    return record_from_rows(
        kind, aux, data, mat, idx, o, d, t, valid, prim_types
    )


def record_from_rows(
    kind, aux, data, mat, idx, o, d, t, valid, prim_types=None
) -> HitRecord:
    """hit_record body on already-fetched per-lane primitive rows
    (used directly by the projected-sweep kernel's payload epilogue)."""
    types = prim_types if prim_types is not None else (0, 1, 2)

    point = o + t[..., None] * d

    outward = jnp.zeros_like(point)
    u = jnp.zeros_like(t)
    v = jnp.zeros_like(t)

    # NOTE: every branch below runs on EVERY lane (masked select), so a
    # rect row flows through the sphere formulas etc.  All denominators
    # are guarded: garbage values are discarded by the `where`, but an
    # inf/NaN forward value would still poison reverse-mode AD.
    def _safe_div(num, den):
        den = jnp.where(jnp.abs(den) < 1e-30, 1.0, den)
        return num / den

    if PRIM_SPHERE in types:
        center = data[..., 0:3]
        radius = data[..., 3]
        n_s = _safe_div(point - center, radius[..., None])  # sign(r) flips normals
        theta = vm.safe_acos(-n_s[..., 1])
        phi = vm.safe_atan2(-n_s[..., 2], n_s[..., 0]) + jnp.pi
        u_s = phi / (2.0 * jnp.pi)
        v_s = theta / jnp.pi
        sel = kind == PRIM_SPHERE
        outward = vm.where(sel, n_s, outward)
        u = jnp.where(sel, u_s, u)
        v = jnp.where(sel, v_s, v)

    if PRIM_RECT in types:
        a0, b0, a1, b1 = data[..., 1], data[..., 2], data[..., 3], data[..., 4]
        direction = data[..., 5]
        n_r = _axis_onehot(aux) * direction[..., None]
        a_val = _pick(point, aux, _RECT_A)
        b_val = _pick(point, aux, _RECT_B)
        u_r = _safe_div(a_val - a0, a1 - a0)
        v_r = _safe_div(b_val - b0, b1 - b0)
        sel = kind == PRIM_RECT
        outward = vm.where(sel, n_r, outward)
        u = jnp.where(sel, u_r, u)
        v = jnp.where(sel, v_r, v)

    if PRIM_TRIANGLE in types:
        sel = kind == PRIM_TRIANGLE
        outward = vm.where(sel, data[..., 9:12], outward)
        # uv stays (0, 0) (geometry.rs:553-556)

    front_face = vm.dot(d, outward) < 0.0
    normal = vm.where(front_face, outward, -outward)

    return HitRecord(
        valid=valid,
        t=t,
        point=point,
        normal=normal,
        front_face=front_face,
        u=u,
        v=v,
        mat=mat,
        prim=idx,
    )


def closest_hit(scene, o, d, t_min, t_max):
    """Scene-level closest hit: Pallas fused sweep on TPU for small
    scenes, jnp brute force elsewhere, BVH traversal for big scenes.
    Returns (hit, t, idx)."""
    from rust_pathtracer_tpu.ops.bvh_traverse import closest_hit_bvh

    # TPU routing: the unrolled v1 Pallas sweep up to MAX_PALLAS_PRIMS,
    # the projected (MXU matmul) v2 sweep beyond — gather-based BVH
    # traversal faults/stalls the device at ~1M lanes, so the TPU path
    # never takes it (the BVH serves the CPU path).
    from rust_pathtracer_tpu.ops.pallas_intersect import pallas_available

    if pallas_available():
        if scene.kinds_static is not None:
            from rust_pathtracer_tpu.ops.pallas_intersect import (
                closest_hit_pallas,
            )

            return closest_hit_pallas(scene, o, d, t_min)
        if scene.proj is not None:
            from rust_pathtracer_tpu.ops.projected import (
                PAY_IDX,
                closest_hit_projected,
            )

            hit, t, pay = closest_hit_projected(scene.proj, o, d, t_min)
            idx = jnp.maximum(
                jnp.round(pay[:, PAY_IDX]).astype(jnp.int32), 0
            )
            return hit, t, idx
    elif jax.default_backend() == "tpu":
        # Pallas disabled by env: chunked dense sweep keeps TPU safe
        return closest_hit_brute_chunked(
            scene.prims, o, d, t_min, t_max, prim_types=scene.prim_types
        )
    if scene.bvh is None:
        return closest_hit_brute(
            scene.prims, o, d, t_min, t_max, prim_types=scene.prim_types
        )
    return closest_hit_bvh(
        scene.bvh,
        scene.prims,
        o,
        d,
        t_min,
        t_max,
        leaf_size=scene.leaf_size,
        prim_types=scene.prim_types,
    )
