"""Fused Pallas bounce: search + hit record + shade + state update.

One ``pallas_call`` executes an ENTIRE wavefront bounce for small
static scenes — the unrolled closest-hit sweep (ops/pallas_intersect
v1), the hit record, the texture evaluation (solid / checker /
perlin-marble), the emission + background banking, the 4-way material
scatter, and the wavefront state commit — with zero intermediate HBM
materialization between them.  This is the TPU rewrite of the
reference's whole per-ray hot path: ``ray.rs:20-41`` (recursive
color), ``material.rs:24-166`` (scatter/emit dispatch),
``texture.rs:9-81`` (value), fused the way the recursion fuses on a
CPU — except over 128-lane vectors instead of one ray.

Division of labor per bounce:

* XLA (outside): the RNG draws (bitwise ``jax.random`` threefry —
  sphere/ball/coin planes enter as inputs), russian roulette, depth /
  occupancy / segments bookkeeping, and the loop carry itself.
* kernel (here): everything between "rays in" and "scattered rays,
  throughput, radiance, alive out".

Routing: ``fused_bounce_ok(scene)`` — small static scene
(``kinds_static``) whose shading is table-free in-register math:
solid / checker-of-solids / perlin textures only (``shade_static``).
Image textures or >128 prims fall back to the composed path.

Numerical contract (mirrors the v1 kernel's): hit masks and winning
primitive indices are EXACT vs the jnp path; floats agree to a few
ulp (fusion/FMA differences), so either path is bitwise-deterministic
per run but they are not bitwise-identical to each other.  The
material/texture formulas replicate materials.py / textures.py /
perlin.py op-for-op (perlin via the shared ``*_planes`` core).
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
from rust_pathtracer_tpu.ops.projected import (
    PAY_COLOR,
    PAY_EVEN,
    PAY_FUZZ,
    PAY_IR,
    PAY_MKIND,
    PAY_ODD,
    PAY_TKIND,
    PAY_TSCALE,
    PAY_W,
)
from rust_pathtracer_tpu.perlin import marble_planes
from rust_pathtracer_tpu.scene.types import (
    MAT_DIELECTRIC,
    MAT_LAMBERTIAN,
    MAT_LIGHT,
    MAT_METAL,
    PRIM_RECT,
    PRIM_SPHERE,
    PRIM_TRIANGLE,
    TEX_CHECKER,
    TEX_PERLIN,
    TEX_SOLID,
)
from rust_pathtracer_tpu.vecmath import _SAFE_EPS, NEAR_ZERO

_RECT_FREE = {0: (1, 2), 1: (0, 2), 2: (0, 1)}

BLOCK_ROWS = int(os.environ.get("RPT_FB_BLOCK_ROWS", "8"))


def fused_bounce_ok(scene) -> bool:
    """Static routing: can this scene's whole bounce run in-kernel?"""
    if os.environ.get("RPT_FUSED_BOUNCE", "1") != "1":
        return False
    return (
        scene.kinds_static is not None
        and getattr(scene, "shade_static", False)
        and set(scene.tex_types) <= {TEX_SOLID, TEX_CHECKER, TEX_PERLIN}
    )


def fused_bounce_interpret() -> bool:
    """RPT_FB_INTERPRET=1 routes through the Pallas interpreter so CPU
    tests exercise the exact kernel (like RPT_PROJ_INTERPRET)."""
    return os.environ.get("RPT_FB_INTERPRET", "0") == "1"


def pack_prims_shaded(scene):
    """(PAY_W, P) f32 SMEM table: per-primitive geometry + flattened
    shading row, the transpose of ops/projected.py's payload layout
    (PAY_*): rows 0-11 prim data, 12 kind, 13 aux, 14 mat, 16 material
    kind, 17 fuzz, 18 ir, 19 texture kind, 20 scale, 21-23 solid
    color, 24-26 checker odd color, 27-29 checker even color."""
    prims, mats, texs = scene.prims, scene.materials, scene.textures
    data_t = prims.data.T.astype(jnp.float32)  # (12, P)
    P = prims.kind.shape[0]
    tex = mats.tex[prims.mat]
    tkind = texs.kind[tex]
    is_ck = tkind == TEX_CHECKER
    child = texs.child[tex]  # (P, 2)
    odd = jnp.where(is_ck, child[:, 0], 0)
    even = jnp.where(is_ck, child[:, 1], 0)
    rows = [
        prims.kind.astype(jnp.float32),             # 12
        prims.aux.astype(jnp.float32),              # 13
        prims.mat.astype(jnp.float32),              # 14
        jnp.zeros((P,), jnp.float32),               # 15
        mats.kind[prims.mat].astype(jnp.float32),   # 16 PAY_MKIND
        mats.fuzz[prims.mat],                       # 17 PAY_FUZZ
        mats.ir[prims.mat],                         # 18 PAY_IR
        tkind.astype(jnp.float32),                  # 19 PAY_TKIND
        texs.scale[tex],                            # 20 PAY_TSCALE
    ]
    color = texs.color[tex].T                       # 21-23
    oddc = jnp.where(is_ck[None, :], texs.color[odd].T, 0.0)   # 24-26
    evenc = jnp.where(is_ck[None, :], texs.color[even].T, 0.0)  # 27-29
    pad = jnp.zeros((PAY_W - PAY_EVEN - 3, P), jnp.float32)
    return jnp.concatenate(
        [data_t, jnp.stack(rows), color, oddc, evenc, pad], axis=0
    )


def _kernel(kinds, mat_types, tex_types, t_min,
            prim_ref, bg_ref, seed_ref,
            ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
            tx_ref, ty_ref, tz_ref, rx_ref, ry_ref, rz_ref,
            al_ref, sx_ref, sy_ref, sz_ref, bx_ref, by_ref, bz_ref,
            cn_ref,
            oxo_ref, oyo_ref, ozo_ref, dxo_ref, dyo_ref, dzo_ref,
            txo_ref, tyo_ref, tzo_ref, rxo_ref, ryo_ref, rzo_ref,
            alo_ref):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    alive = al_ref[:] > 0.5
    shape = ox.shape

    # ---- closest-hit sweep (ops/pallas_intersect.py::_kernel_shade
    # semantics: strict t<best update, outward normal accumulated at
    # sweep time) + the winning prim's flattened shading row ----------
    a = dx * dx + dy * dy + dz * dz
    o_c = (ox, oy, oz)
    d_c = (dx, dy, dz)

    best_t = jnp.full(shape, T_MISS, jnp.float32)
    best_i = jnp.full(shape, -1, jnp.int32)
    wnx = jnp.zeros(shape, jnp.float32)
    wny = jnp.zeros(shape, jnp.float32)
    wnz = jnp.zeros(shape, jnp.float32)
    acc_rows = (PAY_MKIND, PAY_FUZZ, PAY_IR, PAY_TKIND, PAY_TSCALE,
                PAY_COLOR, PAY_COLOR + 1, PAY_COLOR + 2,
                PAY_ODD, PAY_ODD + 1, PAY_ODD + 2,
                PAY_EVEN, PAY_EVEN + 1, PAY_EVEN + 2)
    shade = [jnp.zeros(shape, jnp.float32) for _ in acc_rows]

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
        else:
            raise ValueError(f"unknown static kind {kind}")

        upd = valid & (t < best_t)
        best_t = jnp.where(upd, t, best_t)
        best_i = jnp.where(upd, p, best_i)
        wnx = jnp.where(upd, nx, wnx)
        wny = jnp.where(upd, ny, wny)
        wnz = jnp.where(upd, nz, wnz)
        shade = [jnp.where(upd, s(row), acc)
                 for row, acc in zip(acc_rows, shade)]

    (mk, fz, ir_, tk, ts,
     c0, c1, c2, od0, od1, od2, ev0, ev1, ev2) = shade

    hit = (best_i >= 0) & alive
    t = jnp.where(best_i >= 0, best_t, 1.0)  # finite t for miss lanes

    # ---- hit record (front-face flip, geometry.rs:29-41) ------------
    front = dx * wnx + dy * wny + dz * wnz < 0.0
    flip = jnp.where(front, 1.0, -1.0)
    nx, ny, nz = wnx * flip, wny * flip, wnz * flip
    px = ox + t * dx
    py = oy + t * dy
    pz = oz + t * dz

    # ---- texture value (textures.py eval_texture semantics) ---------
    v0, v1, v2 = c0, c1, c2  # TEX_SOLID
    if TEX_CHECKER in tex_types:
        sines = jnp.sin(ts * px) * jnp.sin(ts * py) * jnp.sin(ts * pz)
        is_ck = tk == float(TEX_CHECKER)
        pick = sines < 0.0
        v0 = jnp.where(is_ck, jnp.where(pick, od0, ev0), v0)
        v1 = jnp.where(is_ck, jnp.where(pick, od1, ev1), v1)
        v2 = jnp.where(is_ck, jnp.where(pick, od2, ev2), v2)
    if TEX_PERLIN in tex_types:
        gray = marble_planes(px, py, pz, seed_ref[0, 0], ts)
        is_pl = tk == float(TEX_PERLIN)
        v0 = jnp.where(is_pl, gray, v0)
        v1 = jnp.where(is_pl, gray, v1)
        v2 = jnp.where(is_pl, gray, v2)

    # ---- emitted + background banking (ray.rs:26,40) -----------------
    thx, thy, thz = tx_ref[:], ty_ref[:], tz_ref[:]
    rdx, rdy, rdz = rx_ref[:], ry_ref[:], rz_ref[:]
    miss = alive & jnp.logical_not(hit)
    bg0, bg1, bg2 = bg_ref[0, 0], bg_ref[0, 1], bg_ref[0, 2]
    rdx = rdx + jnp.where(miss, thx * bg0, 0.0)
    rdy = rdy + jnp.where(miss, thy * bg1, 0.0)
    rdz = rdz + jnp.where(miss, thz * bg2, 0.0)
    if MAT_LIGHT in mat_types:
        em_on = hit & (mk == float(MAT_LIGHT)) & front
        rdx = rdx + jnp.where(em_on, thx * v0, 0.0)
        rdy = rdy + jnp.where(em_on, thy * v1, 0.0)
        rdz = rdz + jnp.where(em_on, thz * v2, 0.0)

    # ---- scatter (materials.py op-for-op) ----------------------------
    did = jnp.zeros(shape, bool)
    sdx = jnp.zeros(shape, jnp.float32)
    sdy = jnp.zeros(shape, jnp.float32)
    sdz = jnp.zeros(shape, jnp.float32)
    at0 = jnp.zeros(shape, jnp.float32)
    at1 = jnp.zeros(shape, jnp.float32)
    at2 = jnp.zeros(shape, jnp.float32)

    need_unit = (MAT_METAL in mat_types) or (MAT_DIELECTRIC in mat_types)
    if need_unit:
        inv_len = 1.0 / jnp.sqrt(jnp.maximum(a, _SAFE_EPS))
        ux, uy, uz = dx * inv_len, dy * inv_len, dz * inv_len

    if MAT_LAMBERTIAN in mat_types:
        dlx = nx + sx_ref[:]
        dly = ny + sy_ref[:]
        dlz = nz + sz_ref[:]
        nz_mask = (
            (jnp.abs(dlx) < NEAR_ZERO) & (jnp.abs(dly) < NEAR_ZERO)
            & (jnp.abs(dlz) < NEAR_ZERO)
        )
        dlx = jnp.where(nz_mask, nx, dlx)
        dly = jnp.where(nz_mask, ny, dly)
        dlz = jnp.where(nz_mask, nz, dlz)
        sel = mk == float(MAT_LAMBERTIAN)
        did = did | sel
        sdx = jnp.where(sel, dlx, sdx)
        sdy = jnp.where(sel, dly, sdy)
        sdz = jnp.where(sel, dlz, sdz)
        at0 = jnp.where(sel, v0, at0)
        at1 = jnp.where(sel, v1, at1)
        at2 = jnp.where(sel, v2, at2)

    if MAT_METAL in mat_types:
        dn = ux * nx + uy * ny + uz * nz
        rfx = ux - 2.0 * dn * nx
        rfy = uy - 2.0 * dn * ny
        rfz = uz - 2.0 * dn * nz
        ok = rfx * nx + rfy * ny + rfz * nz > 0.0
        sel = mk == float(MAT_METAL)
        did = did | (sel & ok)
        sdx = jnp.where(sel, rfx + fz * bx_ref[:], sdx)
        sdy = jnp.where(sel, rfy + fz * by_ref[:], sdy)
        sdz = jnp.where(sel, rfz + fz * bz_ref[:], sdz)
        at0 = jnp.where(sel, v0, at0)
        at1 = jnp.where(sel, v1, at1)
        at2 = jnp.where(sel, v2, at2)

    if MAT_DIELECTRIC in mat_types:
        ratio = jnp.where(front, 1.0 / ir_, ir_)
        cos_t = jnp.minimum(-(ux * nx + uy * ny + uz * nz), 1.0)
        sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
        cannot = ratio * sin_t > 1.0
        r0 = ((1.0 - ratio) / (1.0 + ratio)) ** 2
        one_c = 1.0 - cos_t
        refl_p = r0 + (1.0 - r0) * one_c ** 5
        choose_reflect = cannot | (refl_p > cn_ref[:])
        dnu = ux * nx + uy * ny + uz * nz
        rfx = ux - 2.0 * dnu * nx
        rfy = uy - 2.0 * dnu * ny
        rfz = uz - 2.0 * dnu * nz
        # refract (vec3.rs:118-127 via vecmath.refract)
        opx = ratio * (ux + cos_t * nx)
        opy = ratio * (uy + cos_t * ny)
        opz = ratio * (uz + cos_t * nz)
        plen = jnp.abs(1.0 - (opx * opx + opy * opy + opz * opz))
        # vecmath.safe_sqrt: 0 at <= 0
        par = -jnp.where(plen <= 0.0, 0.0,
                         jnp.sqrt(jnp.where(plen <= 0.0, 1.0, plen)))
        rrx = opx + par * nx
        rry = opy + par * ny
        rrz = opz + par * nz
        ddx = jnp.where(choose_reflect, rfx, rrx)
        ddy = jnp.where(choose_reflect, rfy, rry)
        ddz = jnp.where(choose_reflect, rfz, rrz)
        sel = mk == float(MAT_DIELECTRIC)
        did = did | sel
        sdx = jnp.where(sel, ddx, sdx)
        sdy = jnp.where(sel, ddy, sdy)
        sdz = jnp.where(sel, ddz, sdz)
        at0 = jnp.where(sel, 1.0, at0)
        at1 = jnp.where(sel, 1.0, at1)
        at2 = jnp.where(sel, 1.0, at2)

    # ---- state commit (integrator._bounce_step tail) -----------------
    cont = hit & did
    txo_ref[:] = jnp.where(cont, thx * at0, thx)
    tyo_ref[:] = jnp.where(cont, thy * at1, thy)
    tzo_ref[:] = jnp.where(cont, thz * at2, thz)
    oxo_ref[:] = jnp.where(cont, px, ox)
    oyo_ref[:] = jnp.where(cont, py, oy)
    ozo_ref[:] = jnp.where(cont, pz, oz)
    dxo_ref[:] = jnp.where(cont, sdx, dx)
    dyo_ref[:] = jnp.where(cont, sdy, dy)
    dzo_ref[:] = jnp.where(cont, sdz, dz)
    rxo_ref[:] = rdx
    ryo_ref[:] = rdy
    rzo_ref[:] = rdz
    alo_ref[:] = cont.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("kinds", "mat_types",
                                             "tex_types", "t_min",
                                             "interpret"))
def _fused_bounce(packed, bg, seed, o, d, thr, rad, alive,
                  sphere_dir, ball_dir, coin, *, kinds, mat_types,
                  tex_types, t_min, interpret=False):
    R = o.shape[0]
    lane_block = BLOCK_ROWS * 128
    rp = -(-R // lane_block) * lane_block
    pad = rp - R

    def plane(x):
        return jnp.pad(x, (0, pad)).reshape(rp // 128, 128)

    planes = [
        plane(o[:, 0]), plane(o[:, 1]), plane(o[:, 2]),
        plane(d[:, 0]), plane(d[:, 1]), plane(d[:, 2]),
        plane(thr[:, 0]), plane(thr[:, 1]), plane(thr[:, 2]),
        plane(rad[:, 0]), plane(rad[:, 1]), plane(rad[:, 2]),
        plane(alive.astype(jnp.float32)),
        plane(sphere_dir[:, 0]), plane(sphere_dir[:, 1]),
        plane(sphere_dir[:, 2]),
        plane(ball_dir[:, 0]), plane(ball_dir[:, 1]), plane(ball_dir[:, 2]),
        plane(coin),
    ]
    rows = rp // 128
    grid = (rows // BLOCK_ROWS,)
    ray_spec = pl.BlockSpec(
        (BLOCK_ROWS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    tab_space = pltpu.SMEM if packed.shape[1] <= 128 else pltpu.VMEM
    vma = jax.typeof(o).vma  # shard_map check_vma (see pallas_intersect)
    f32 = jax.ShapeDtypeStruct((rows, 128), jnp.float32, vma=vma)
    outs = pl.pallas_call(
        functools.partial(_kernel, kinds, mat_types, tex_types, t_min),
        grid=grid,
        in_specs=[
            pl.BlockSpec(packed.shape, lambda i: (0, 0),
                         memory_space=tab_space),
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ] + [ray_spec] * 20,
        out_specs=(ray_spec,) * 13,
        out_shape=(f32,) * 13,
        interpret=interpret,
    )(packed, bg.reshape(1, 3), seed.reshape(1, 1), *planes)

    def unplane(x):
        return x.reshape(-1)[:R]

    (ox, oy, oz, dx, dy, dz, tx, ty, tz, rx, ry, rz, al) = (
        unplane(x) for x in outs
    )
    return (
        jnp.stack([ox, oy, oz], 1),
        jnp.stack([dx, dy, dz], 1),
        jnp.stack([tx, ty, tz], 1),
        jnp.stack([rx, ry, rz], 1),
        al > 0.5,
    )


def fused_bounce_apply(scene, o, d, thr, rad, alive, sphere_dir,
                       ball_dir, coin, background, t_min,
                       interpret=False):
    """Run one full bounce in the fused kernel.

    Returns (o', d', thr', rad', alive') with the same semantics as the
    composed search_and_record + shade + commit path in
    integrator._bounce_step (russian roulette NOT applied — callers
    keep it in XLA, where its lax.cond belongs)."""
    packed = pack_prims_shaded(scene)
    seed = jnp.asarray(scene.textures.perlin_seed, jnp.uint32)
    bg = jnp.asarray(background, jnp.float32)
    o2, d2, t2, r2, al2 = _fused_bounce(
        packed, bg, seed, o, d, thr, rad, alive, sphere_dir, ball_dir,
        coin, kinds=scene.kinds_static, mat_types=scene.mat_types,
        tex_types=scene.tex_types, t_min=float(t_min),
        interpret=interpret,
    )
    return o2, d2, t2, r2, al2
