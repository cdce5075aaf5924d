"""Pallas TPU kernel: fused brute-force closest-hit.

For the benchmark-class scenes (CornellBox: 20 primitives) the whole
primitive table fits in SMEM and the best intersector is a dense sweep
with zero divergence.  The jnp version (ops/intersect.py) materializes
an (R, P) distance matrix in HBM between XLA fusions; this kernel keeps
the entire sweep in registers/VMEM:

* rays live as 6 component planes shaped (R/128, 128) — lane dim 128,
  one grid step processes a (BLOCK_ROWS, 128) tile of rays;
* the primitive table is a (16, P) f32 array in SMEM (rows 0-11 the
  packed ``Primitives.data``, 12 kind, 13 aux);
* the per-primitive *type* is STATIC (baked from the host-side scene at
  trace time via ``SceneData.kinds_static``), so each unrolled
  primitive test compiles to exactly its own formula — no masked
  3-way dispatch;
* output: best hit distance + primitive index per ray.

The kernel is only used for the detached hit *search* (integrator
``_find_hit`` stop-gradients its inputs), so no custom VJP is needed;
the jnp path remains the correctness oracle and the CPU fallback.

Numerical parity vs the jnp oracle: hit masks and winning primitive
indices are identical; hit distances agree to 1-2 ulp (XLA's FMA
contraction differs between the two compilations), so images rendered
through either path agree to Monte-Carlo-noise level while each path
stays bitwise deterministic for a given key.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rust_pathtracer_tpu.ops.intersect import T_MISS, TRI_DET_EPS
from rust_pathtracer_tpu.scene.types import PRIM_RECT, PRIM_SPHERE, PRIM_TRIANGLE

import os as _os

# rays per grid step = BLOCK_ROWS * 128; larger blocks amortize the
# per-step scalar table reads (RPT_V1_BLOCK_ROWS to experiment)
BLOCK_ROWS = int(_os.environ.get("RPT_V1_BLOCK_ROWS", "16"))
# beyond this, the unrolled scalar-read sweep loses to the projected
# (MXU matmul) sweep in ops/projected.py
MAX_PALLAS_PRIMS = 128

# rect fixed axis -> the two free axes in ascending order (types.py)
_RECT_FREE = {0: (1, 2), 1: (0, 2), 2: (0, 1)}


def pallas_available() -> bool:
    return (
        jax.default_backend() == "tpu"
        and os.environ.get("RPT_DISABLE_PALLAS", "0") != "1"
    )


def _kernel(kinds, t_min, prim_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref,
            dz_ref, t_ref, idx_ref):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]

    # ray-only terms hoisted out of the primitive sweep
    a = dx * dx + dy * dy + dz * dz
    o_c = (ox, oy, oz)
    d_c = (dx, dy, dz)

    best_t = jnp.full(ox.shape, T_MISS, jnp.float32)
    best_i = jnp.full(ox.shape, -1, jnp.int32)

    for p, (kind, aux) in enumerate(kinds):
        s = lambda row: prim_ref[row, p]  # scalar read from SMEM
        if kind == PRIM_SPHERE:
            cx, cy, cz, r = s(0), s(1), s(2), s(3)
            ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
            half_b = dx * ocx + dy * ocy + dz * ocz
            c = ocx * ocx + ocy * ocy + ocz * ocz - r * r
            dis = half_b * half_b - a * c
            sqrtd = jnp.sqrt(jnp.maximum(dis, 0.0))
            # true division (not reciprocal-multiply): bit-identical to
            # the jnp oracle so diff/nondiff paths agree exactly
            root1 = (-half_b - sqrtd) / a
            root2 = (-half_b + sqrtd) / a
            ok1 = (root1 >= t_min) & (root1 <= best_t)
            ok2 = (root2 >= t_min) & (root2 <= best_t)
            t = jnp.where(ok1, root1, root2)
            valid = (dis >= 0.0) & (ok1 | ok2)
        elif kind == PRIM_RECT:
            k, a0, b0, a1, b1 = s(0), s(1), s(2), s(3), s(4)
            fa, fb = _RECT_FREE[aux]
            t = (k - o_c[aux]) / d_c[aux]
            av = o_c[fa] + t * d_c[fa]
            bv = o_c[fb] + t * d_c[fb]
            valid = (
                (t >= t_min) & (t <= best_t)
                & (av >= a0) & (av <= a1) & (bv >= b0) & (bv <= b1)
            )
        elif kind == PRIM_TRIANGLE:
            p1x, p1y, p1z = s(0), s(1), s(2)
            e1x, e1y, e1z = s(3), s(4), s(5)
            e2x, e2y, e2z = s(6), s(7), s(8)
            pvx = dy * e2z - dz * e2y
            pvy = dz * e2x - dx * e2z
            pvz = dx * e2y - dy * e2x
            det = e1x * pvx + e1y * pvy + e1z * pvz
            inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-30, det, 1.0)
            tvx, tvy, tvz = ox - p1x, oy - p1y, oz - p1z
            u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
            qvx = tvy * e1z - tvz * e1y
            qvy = tvz * e1x - tvx * e1z
            qvz = tvx * e1y - tvy * e1x
            v = (dx * qvx + dy * qvy + dz * qvz) * inv_det
            t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
            valid = (
                (det >= TRI_DET_EPS)
                & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
                & (t >= t_min) & (t <= best_t)
            )
        else:
            raise ValueError(f"unknown static kind {kind}")

        # strict `<` would drop equal-t later prims; the sweep uses
        # best_t as the shrinking t_max like the reference's list scan
        upd = valid & (t < best_t)
        best_t = jnp.where(upd, t, best_t)
        best_i = jnp.where(upd, p, best_i)

    t_ref[:] = best_t
    idx_ref[:] = best_i


@functools.partial(jax.jit, static_argnames=("kinds", "t_min", "interpret"))
def _closest_hit_pallas(packed, o, d, *, kinds, t_min, interpret=False):
    R = o.shape[0]
    lane_block = BLOCK_ROWS * 128
    rp = -(-R // lane_block) * lane_block
    pad = rp - R

    def plane(x):
        return jnp.pad(x, (0, pad)).reshape(rp // 128, 128)

    planes = [plane(o[:, 0]), plane(o[:, 1]), plane(o[:, 2]),
              plane(d[:, 0]), plane(d[:, 1]), plane(d[:, 2])]

    rows = rp // 128
    grid = (rows // BLOCK_ROWS,)
    ray_spec = pl.BlockSpec(
        (BLOCK_ROWS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    tab_space = pltpu.SMEM if packed.shape[1] <= 128 else pltpu.VMEM
    # inside shard_map (check_vma=True) pallas outputs must declare
    # their mesh-varying axes — inherit them from the ray wavefront
    vma = jax.typeof(o).vma
    t, idx = pl.pallas_call(
        functools.partial(_kernel, kinds, t_min),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                packed.shape, lambda i: (0, 0), memory_space=tab_space
            ),
        ] + [ray_spec] * 6,
        out_specs=(ray_spec, ray_spec),
        out_shape=(
            jax.ShapeDtypeStruct((rows, 128), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((rows, 128), jnp.int32, vma=vma),
        ),
        interpret=interpret,
    )(packed, *planes)
    t = t.reshape(-1)[:R]
    idx = idx.reshape(-1)[:R]
    hit = idx >= 0
    return hit, jnp.where(hit, t, T_MISS), jnp.maximum(idx, 0)


def pack_prims(prims):
    """(16, P) f32 SMEM table: rows 0-11 data, 12 kind, 13 aux, 14 mat."""
    data_t = prims.data.T  # (12, P)
    extra = jnp.stack([
        prims.kind.astype(jnp.float32),
        prims.aux.astype(jnp.float32),
        prims.mat.astype(jnp.float32),
        jnp.zeros_like(prims.kind, dtype=jnp.float32),
    ])
    return jnp.concatenate([data_t, extra], axis=0)


# ---------------------------------------------------------------------------
# fused closest-hit + hit-record kernel (forward path)
# ---------------------------------------------------------------------------
def _kernel_shade(kinds, t_min, prim_ref, ox_ref, oy_ref, oz_ref, dx_ref,
                  dy_ref, dz_ref, t_ref, idx_ref, nx_ref, ny_ref, nz_ref,
                  u_ref, v_ref, front_ref, mat_ref, kind_ref):
    """Sweep + full HitRecord payload in one kernel.

    Per-primitive quantities (outward normal, rect uv) are accumulated
    AT SWEEP TIME under the same `upd` mask — each prim's type is
    static, so its record math compiles to exactly its own formula.
    The only per-lane post-pass is the sphere UV transcendentals."""
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    a = dx * dx + dy * dy + dz * dz
    o_c = (ox, oy, oz)
    d_c = (dx, dy, dz)

    shape = ox.shape
    best_t = jnp.full(shape, T_MISS, jnp.float32)
    best_i = jnp.full(shape, -1, jnp.int32)
    wkind = jnp.full(shape, -1, jnp.int32)
    wnx = jnp.zeros(shape, jnp.float32)
    wny = jnp.zeros(shape, jnp.float32)
    wnz = jnp.zeros(shape, jnp.float32)
    wu = jnp.zeros(shape, jnp.float32)
    wv = jnp.zeros(shape, jnp.float32)
    wmat = jnp.zeros(shape, jnp.float32)

    for p, (kind, aux) in enumerate(kinds):
        s = lambda row: prim_ref[row, p]
        if kind == PRIM_SPHERE:
            cx, cy, cz, r = s(0), s(1), s(2), s(3)
            ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
            half_b = dx * ocx + dy * ocy + dz * ocz
            c = ocx * ocx + ocy * ocy + ocz * ocz - r * r
            dis = half_b * half_b - a * c
            sqrtd = jnp.sqrt(jnp.maximum(dis, 0.0))
            root1 = (-half_b - sqrtd) / a
            root2 = (-half_b + sqrtd) / a
            ok1 = (root1 >= t_min) & (root1 <= best_t)
            ok2 = (root2 >= t_min) & (root2 <= best_t)
            t = jnp.where(ok1, root1, root2)
            valid = (dis >= 0.0) & (ok1 | ok2)
            inv_r = 1.0 / r
            nx = (ox + t * dx - cx) * inv_r
            ny = (oy + t * dy - cy) * inv_r
            nz = (oz + t * dz - cz) * inv_r
            u = v = jnp.zeros(shape, jnp.float32)  # post-pass
        elif kind == PRIM_RECT:
            k, a0, b0, a1, b1, sgn = s(0), s(1), s(2), s(3), s(4), s(5)
            fa, fb = _RECT_FREE[aux]
            t = (k - o_c[aux]) / d_c[aux]
            av = o_c[fa] + t * d_c[fa]
            bv = o_c[fb] + t * d_c[fb]
            valid = (
                (t >= t_min) & (t <= best_t)
                & (av >= a0) & (av <= a1) & (bv >= b0) & (bv <= b1)
            )
            comp = [jnp.zeros(shape, jnp.float32)] * 3
            comp[aux] = jnp.full(shape, 1.0) * sgn
            nx, ny, nz = comp
            u = (av - a0) / (a1 - a0)
            v = (bv - b0) / (b1 - b0)
        elif kind == PRIM_TRIANGLE:
            p1x, p1y, p1z = s(0), s(1), s(2)
            e1x, e1y, e1z = s(3), s(4), s(5)
            e2x, e2y, e2z = s(6), s(7), s(8)
            pvx = dy * e2z - dz * e2y
            pvy = dz * e2x - dx * e2z
            pvz = dx * e2y - dy * e2x
            det = e1x * pvx + e1y * pvy + e1z * pvz
            inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-30, det, 1.0)
            tvx, tvy, tvz = ox - p1x, oy - p1y, oz - p1z
            uu = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
            qvx = tvy * e1z - tvz * e1y
            qvy = tvz * e1x - tvx * e1z
            qvz = tvx * e1y - tvy * e1x
            vv = (dx * qvx + dy * qvy + dz * qvz) * inv_det
            t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
            valid = (
                (det >= TRI_DET_EPS)
                & (uu >= 0.0) & (uu <= 1.0) & (vv >= 0.0) & (uu + vv <= 1.0)
                & (t >= t_min) & (t <= best_t)
            )
            nx = jnp.full(shape, 1.0) * s(9)
            ny = jnp.full(shape, 1.0) * s(10)
            nz = jnp.full(shape, 1.0) * s(11)
            u = v = jnp.zeros(shape, jnp.float32)  # geometry.rs:553-556
        else:
            raise ValueError(f"unknown static kind {kind}")

        upd = valid & (t < best_t)
        best_t = jnp.where(upd, t, best_t)
        best_i = jnp.where(upd, p, best_i)
        wkind = jnp.where(upd, kind, wkind)
        wnx = jnp.where(upd, nx, wnx)
        wny = jnp.where(upd, ny, wny)
        wnz = jnp.where(upd, nz, wnz)
        wu = jnp.where(upd, u, wu)
        wv = jnp.where(upd, v, wv)
        wmat = jnp.where(upd, prim_ref[14, p], wmat)

    # sphere UV needs acos/atan2, which Mosaic does not lower — the
    # XLA epilogue computes it from the OUTWARD (pre-flip) normal.
    front = dx * wnx + dy * wny + dz * wnz < 0.0

    hit = best_i >= 0
    t_ref[:] = jnp.where(hit, best_t, 1.0)  # finite t for miss lanes
    idx_ref[:] = best_i
    nx_ref[:] = wnx  # outward, unflipped
    ny_ref[:] = wny
    nz_ref[:] = wnz
    u_ref[:] = wu
    v_ref[:] = wv
    front_ref[:] = front.astype(jnp.float32)
    mat_ref[:] = wmat
    kind_ref[:] = wkind.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("kinds", "t_min", "interpret"))
def _closest_hit_record_pallas(packed, o, d, *, kinds, t_min, interpret=False):
    R = o.shape[0]
    lane_block = BLOCK_ROWS * 128
    rp = -(-R // lane_block) * lane_block
    pad = rp - R

    def plane(x):
        return jnp.pad(x, (0, pad)).reshape(rp // 128, 128)

    planes = [plane(o[:, 0]), plane(o[:, 1]), plane(o[:, 2]),
              plane(d[:, 0]), plane(d[:, 1]), plane(d[:, 2])]

    rows = rp // 128
    grid = (rows // BLOCK_ROWS,)
    ray_spec = pl.BlockSpec(
        (BLOCK_ROWS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    vma = jax.typeof(o).vma  # see _closest_hit_pallas
    f32 = jax.ShapeDtypeStruct((rows, 128), jnp.float32, vma=vma)
    i32 = jax.ShapeDtypeStruct((rows, 128), jnp.int32, vma=vma)
    tab_space = pltpu.SMEM if packed.shape[1] <= 128 else pltpu.VMEM
    outs = pl.pallas_call(
        functools.partial(_kernel_shade, kinds, t_min),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                packed.shape, lambda i: (0, 0), memory_space=tab_space
            ),
        ] + [ray_spec] * 6,
        out_specs=(ray_spec,) * 10,
        out_shape=(f32, i32, f32, f32, f32, f32, f32, f32, f32, f32),
        interpret=interpret,
    )(packed, *planes)
    t, idx, nx, ny, nz, u, v, front, mat, wkind = (
        x.reshape(-1)[:R] for x in outs
    )
    front = front > 0.5
    # epilogue: sphere UV from the outward normal (geometry.rs:120-128)
    is_sphere = wkind == float(PRIM_SPHERE)
    theta = jnp.arccos(jnp.clip(-ny, -1.0, 1.0))
    phi = jnp.arctan2(-nz, jnp.where(is_sphere, nx, 1.0)) + np.float32(np.pi)
    u = jnp.where(is_sphere, phi * np.float32(0.5 / np.pi), u)
    v = jnp.where(is_sphere, theta * np.float32(1.0 / np.pi), v)
    # front-face flip (geometry.rs:29-41)
    flip = jnp.where(front, 1.0, -1.0)
    hit = idx >= 0
    return (hit, t, jnp.maximum(idx, 0), nx * flip, ny * flip, nz * flip,
            u, v, front, mat)


def closest_hit_record_pallas(scene, o, d, t_min, interpret=False):
    """Fused search + hit record for the (non-differentiable) forward
    path.  Returns (hit, t, idx, HitRecord-with-valid=hit)."""
    from rust_pathtracer_tpu.ops.intersect import HitRecord

    packed = pack_prims(scene.prims)
    hit, t, idx, nx, ny, nz, u, v, front, mat = _closest_hit_record_pallas(
        packed, o, d, kinds=scene.kinds_static, t_min=float(t_min),
        interpret=interpret,
    )
    point = o + t[:, None] * d
    rec = HitRecord(
        valid=hit,
        t=t,
        point=point,
        normal=jnp.stack([nx, ny, nz], axis=-1),
        front_face=front,
        u=u,
        v=v,
        mat=jnp.round(mat).astype(jnp.int32),
        prim=idx,
    )
    return hit, t, idx, rec


def closest_hit_pallas(scene, o, d, t_min, interpret=False):
    """Drop-in for ops.intersect.closest_hit_brute on TPU; requires
    ``scene.kinds_static``.  ``interpret=True`` runs the kernel in the
    Pallas interpreter (CPU testing)."""
    packed = pack_prims(scene.prims)
    return _closest_hit_pallas(
        packed, o, d, kinds=scene.kinds_static, t_min=float(t_min),
        interpret=interpret,
    )
