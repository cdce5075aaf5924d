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

# 32-row blocks (4096 lanes/step): measured round 5 on the v5e bench
# step (tools/tpu_fbdecomp.py batch C/D) — 8-row blocks moved only
# ~4 KB per plane per grid step and were DMA-issue-bound: fwd+bwd
# 60.5 -> 55.3 ms, nondiff fwd 30.9 -> 26.9.  fb16 57.7 / fb64 55.6 /
# fb128 56.5 — 32 is the sweet spot.
BLOCK_ROWS = int(os.environ.get("RPT_FB_BLOCK_ROWS", "32"))


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


# residual `flags` bit layout (ops/fused_bounce custom VJP)
FLG_HIT = 1
FLG_FRONT = 2
FLG_CONT = 4
FLG_REFLECT = 8       # dielectric chose reflect
FLG_SINES_NEG = 16    # checker picked the odd child
FLG_SEL_L = 32
FLG_SEL_M = 64
FLG_SEL_D = 128
FLG_LIGHT_ON = 256    # front-face light emission fired
FLG_COS_CLAMP = 512   # dielectric cos_t hit the min(.,1) clamp
FLG_REFR_ZERO = 1024  # refract safe_sqrt at <= 0 (zero gradient)
FLG_L_NEG = 2048      # refract 1-|perp|^2 < 0 (abs() flips the sign)
FLG_IS_CK = 4096      # winning prim's texture is a checker
FLG_ALIVE = 8192      # lane was alive ENTERING the bounce
# bits 16+ carry the winning primitive index (max(best_i, 0) << 16):
# the backward's one-hot contraction masks by FLG_HIT, so the -1 miss
# sentinel never needs distinguishing from prim 0
FLG_BESTI_SHIFT = 16


def _cbrt_tc(u):
    """Cube root for the Mosaic TC kernel: ``cbrt`` has no TPU
    lowering (NotImplementedError, like acos/atan2 — see the verify
    skill's gotcha list), so u^(1/3) = exp(log(u)/3) plus one Newton
    step (y -> (2y + u/y^2)/3, ~1 ulp on [0,1]); exact 0 at u <= 0.
    The interpreter path keeps jnp.cbrt so CPU tests compare bitwise
    against the composed jnp pipeline."""
    safe = jnp.maximum(u, 1e-30)
    y = jnp.exp(jnp.log(safe) * (1.0 / 3.0))
    y = (2.0 * y + safe / (y * y)) * (1.0 / 3.0)
    return jnp.where(u <= 0.0, 0.0, y)


def _kernel(kinds, mat_types, tex_types, t_min, want_residuals,
            interpret,
            prim_ref, bg_ref, seed_ref,
            ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
            tx_ref, ty_ref, tz_ref, rx_ref, ry_ref, rz_ref,
            al_ref, su0_ref, su1_ref, bu0_ref, bu1_ref, bu2_ref,
            cn_ref,
            oxo_ref, oyo_ref, ozo_ref, dxo_ref, dyo_ref, dzo_ref,
            txo_ref, tyo_ref, tzo_ref, rxo_ref, ryo_ref, rzo_ref,
            alo_ref, *res_refs):
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
    # winning sphere's 1/r (0 for rect/tri winners): the backward's
    # sphere-normal chain dn/dpoint = flip/r needs it, and saving it
    # here is free vs a per-lane kind/radius table resolve in the VJP
    w_invr = jnp.zeros(shape, jnp.float32)
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
        if kind == PRIM_SPHERE:
            w_invr = jnp.where(upd, inv_r, w_invr)
        else:
            w_invr = jnp.where(upd, 0.0, w_invr)
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

    def flag(mask, bit):
        return jnp.where(mask, np.int32(bit), np.int32(0))

    flags = flag(hit, FLG_HIT) + flag(front, FLG_FRONT)

    # ---- texture value (textures.py eval_texture semantics) ---------
    v0, v1, v2 = c0, c1, c2  # TEX_SOLID
    if TEX_CHECKER in tex_types:
        sines = jnp.sin(ts * px) * jnp.sin(ts * py) * jnp.sin(ts * pz)
        is_ck = tk == float(TEX_CHECKER)
        pick = sines < 0.0
        flags = (flags + flag(is_ck & pick, FLG_SINES_NEG)
                 + flag(is_ck, FLG_IS_CK))
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
        flags = flags + flag(em_on, FLG_LIGHT_ON)
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

    # ---- RNG transforms (sampling.on/in_unit_sphere_from_u) ---------
    # Uniforms in, directions here: the trig runs per 8x128 block, so
    # the values are bitwise identical at EVERY wavefront width and
    # stage split by construction — stronger than the XLA in-body
    # guarantee (integrator._precompute_draws docstring), and the
    # transform rides VMEM for free instead of 7 HBM planes.
    if MAT_LAMBERTIAN in mat_types:
        s_z = 2.0 * su0_ref[:] - 1.0
        s_phi = (2.0 * np.float32(np.pi)) * su1_ref[:]
        s_r = jnp.sqrt(jnp.maximum(1.0 - s_z * s_z, 0.0))
        sph_x = s_r * jnp.cos(s_phi)
        sph_y = s_r * jnp.sin(s_phi)
        sph_z = s_z
    if MAT_METAL in mat_types:
        b_z = 2.0 * bu0_ref[:] - 1.0
        b_phi = (2.0 * np.float32(np.pi)) * bu1_ref[:]
        b_rho = jnp.sqrt(jnp.maximum(1.0 - b_z * b_z, 0.0))
        b_s = (jnp.cbrt(bu2_ref[:]) if interpret
               else _cbrt_tc(bu2_ref[:]))
        ball_x = b_rho * jnp.cos(b_phi) * b_s
        ball_y = b_rho * jnp.sin(b_phi) * b_s
        ball_z = b_z * b_s

    if MAT_LAMBERTIAN in mat_types:
        dlx = nx + sph_x
        dly = ny + sph_y
        dlz = nz + sph_z
        nz_mask = (
            (jnp.abs(dlx) < NEAR_ZERO) & (jnp.abs(dly) < NEAR_ZERO)
            & (jnp.abs(dlz) < NEAR_ZERO)
        )
        dlx = jnp.where(nz_mask, nx, dlx)
        dly = jnp.where(nz_mask, ny, dly)
        dlz = jnp.where(nz_mask, nz, dlz)
        sel = mk == float(MAT_LAMBERTIAN)
        flags = flags + flag(sel, FLG_SEL_L)
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
        flags = flags + flag(sel, FLG_SEL_M)
        did = did | (sel & ok)
        sdx = jnp.where(sel, rfx + fz * ball_x, sdx)
        sdy = jnp.where(sel, rfy + fz * ball_y, sdy)
        sdz = jnp.where(sel, rfz + fz * ball_z, sdz)
        at0 = jnp.where(sel, v0, at0)
        at1 = jnp.where(sel, v1, at1)
        at2 = jnp.where(sel, v2, at2)

    ratio = jnp.ones(shape, jnp.float32)
    if MAT_DIELECTRIC in mat_types:
        ratio = jnp.where(front, 1.0 / ir_, ir_)
        raw_cos = -(ux * nx + uy * ny + uz * nz)
        cos_t = jnp.minimum(raw_cos, 1.0)
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
        raw_l = 1.0 - (opx * opx + opy * opy + opz * opz)
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
        flags = (flags + flag(sel, FLG_SEL_D)
                 + flag(choose_reflect, FLG_REFLECT)
                 + flag(raw_cos >= 1.0, FLG_COS_CLAMP)
                 + flag(plen <= 0.0, FLG_REFR_ZERO)
                 + flag(raw_l < 0.0, FLG_L_NEG))
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

    if want_residuals:
        # what the hand-written VJP (fused_bounce_vjp) consumes — see
        # _bounce_bwd for the exact formulas each field feeds.  The
        # refs' dtype may be bfloat16 (RPT_FBD_RES=bf16): the store
        # rounds, the backward upcasts on load — halves the residual
        # round-trip traffic under the documented gradient-accuracy
        # contract (primal forward bitwise unchanged either way).
        (t_ref, rnx_ref, rny_ref, rnz_ref, rv0_ref, rv1_ref, rv2_ref,
         rratio_ref, rinvr_ref, rflags_ref) = res_refs
        rdt = t_ref.dtype
        flags = (flags + flag(cont, FLG_CONT) + flag(alive, FLG_ALIVE)
                 + (jnp.maximum(best_i, 0) << FLG_BESTI_SHIFT))
        t_ref[:] = t.astype(rdt)
        rnx_ref[:] = nx.astype(rdt)
        rny_ref[:] = ny.astype(rdt)
        rnz_ref[:] = nz.astype(rdt)
        rv0_ref[:] = v0.astype(rdt)
        rv1_ref[:] = v1.astype(rdt)
        rv2_ref[:] = v2.astype(rdt)
        rratio_ref[:] = ratio.astype(rdt)
        rinvr_ref[:] = (flip * w_invr).astype(rdt)
        rflags_ref[:] = flags


# the 13 wavefront state columns, in kernel order (al is f32 0/1)
_COL_KEYS = ("o0", "o1", "o2", "d0", "d1", "d2", "t0", "t1", "t2",
             "r0", "r1", "r2", "al")


def _plane(x, R=None):
    """(R,) column -> (rows, 128) plane.  A FREE reshape when R is a
    multiple of the lane block (the renderer's chunk widths are) —
    the whole point of the column-native carry: no strided
    column-extract copies around the kernel."""
    R = x.shape[0] if R is None else R
    lane_block = BLOCK_ROWS * 128
    rp = -(-R // lane_block) * lane_block
    return jnp.pad(x, (0, rp - R)).reshape(rp // 128, 128)


def _res_dtype():
    """Residual-plane dtype: f32 (default) or bf16 (RPT_FBD_RES=bf16,
    opt-in — halves the residual round-trip under a documented
    gradient-accuracy contract; flags stay int32 either way)."""
    return (jnp.bfloat16 if os.environ.get("RPT_FBD_RES") == "bf16"
            else jnp.float32)


@functools.partial(jax.jit, static_argnames=("kinds", "mat_types",
                                             "tex_types", "t_min",
                                             "interpret",
                                             "want_residuals"))
def _fused_bounce_cols(packed, bg, seed, cols, su0, su1, bu0, bu1, bu2,
                       coin, *, kinds, mat_types, tex_types, t_min,
                       interpret=False, want_residuals=False):
    """Column-native fused bounce: 13 (R,) state columns + 6 (R,)
    uniform columns in, 13 (R,) columns out (+ planed residuals).
    All reshapes to the kernel's (rows, 128) layout are contiguous."""
    R = cols["o0"].shape[0]
    planes = [_plane(cols[k], R) for k in _COL_KEYS] + [
        _plane(x, R) for x in (su0, su1, bu0, bu1, bu2, coin)
    ]
    rows = planes[0].shape[0]
    grid = (rows // BLOCK_ROWS,)
    ray_spec = pl.BlockSpec(
        (BLOCK_ROWS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    tab_space = pltpu.SMEM if packed.shape[1] <= 128 else pltpu.VMEM
    vma = jax.typeof(cols["o0"]).vma  # shard_map check_vma
    f32 = jax.ShapeDtypeStruct((rows, 128), jnp.float32, vma=vma)
    i32 = jax.ShapeDtypeStruct((rows, 128), jnp.int32, vma=vma)
    n_out = 13 + (10 if want_residuals else 0)
    out_shape = (f32,) * 13
    if want_residuals:
        rf = jax.ShapeDtypeStruct((rows, 128), _res_dtype(), vma=vma)
        out_shape = out_shape + (rf,) * 9 + (i32,)
    outs = pl.pallas_call(
        functools.partial(_kernel, kinds, mat_types, tex_types, t_min,
                          want_residuals, interpret),
        grid=grid,
        in_specs=[
            pl.BlockSpec(packed.shape, lambda i: (0, 0),
                         memory_space=tab_space),
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ] + [ray_spec] * 19,
        out_specs=(ray_spec,) * n_out,
        out_shape=out_shape,
        interpret=interpret,
    )(packed, bg.reshape(1, 3), seed.reshape(1, 1), *planes)

    cols_out = {
        k: x.reshape(-1)[:R] for k, x in zip(_COL_KEYS, outs[:13])
    }
    if not want_residuals:
        return cols_out
    # residuals stay PLANED (rows, 128): the Pallas backward consumes
    # them block-for-block with zero relayout; lanes >= R are dead
    # (alive padded 0 -> no CONT/HIT flag -> zero grads)
    res = dict(zip(_RES_KEYS, outs[13:]))
    return cols_out, res


def _fused_bounce(packed, bg, seed, o, d, thr, rad, alive,
                  sphere_u, ball_u, coin, *, kinds, mat_types,
                  tex_types, t_min, interpret=False):
    """(R, 3) AoS wrapper over _fused_bounce_cols (regen wavefront +
    trace_resume keep this interface; the hot diff/nondiff scans use
    the column carry directly)."""
    cols = dict(zip(_COL_KEYS, (
        o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
        thr[:, 0], thr[:, 1], thr[:, 2], rad[:, 0], rad[:, 1],
        rad[:, 2], alive.astype(jnp.float32),
    )))
    c = _fused_bounce_cols(
        packed, bg, seed, cols, sphere_u[:, 0], sphere_u[:, 1],
        ball_u[:, 0], ball_u[:, 1], ball_u[:, 2], coin, kinds=kinds,
        mat_types=mat_types, tex_types=tex_types, t_min=t_min,
        interpret=interpret,
    )
    return (
        jnp.stack([c["o0"], c["o1"], c["o2"]], 1),
        jnp.stack([c["d0"], c["d1"], c["d2"]], 1),
        jnp.stack([c["t0"], c["t1"], c["t2"]], 1),
        jnp.stack([c["r0"], c["r1"], c["r2"]], 1),
        c["al"] > 0.5,
    )


def fused_bounce_apply(scene, o, d, thr, rad, alive, sphere_u,
                       ball_u, coin, background, t_min,
                       interpret=False):
    """Run one full bounce in the fused kernel.

    ``sphere_u`` (R, 2) and ``ball_u`` (R, 3) are RAW UNIFORMS —
    the on/in-unit-sphere transforms run in-kernel (bitwise stable at
    every wavefront width; see _kernel).

    Returns (o', d', thr', rad', alive') with the same semantics as the
    composed search_and_record + shade + commit path in
    integrator._bounce_step (russian roulette NOT applied — callers
    keep it in XLA, where its lax.cond belongs)."""
    packed = pack_prims_shaded(scene)
    seed = jnp.asarray(scene.textures.perlin_seed, jnp.uint32)
    bg = jnp.asarray(background, jnp.float32)
    o2, d2, t2, r2, al2 = _fused_bounce(
        packed, bg, seed, o, d, thr, rad, alive, sphere_u, ball_u,
        coin, kinds=scene.kinds_static, mat_types=scene.mat_types,
        tex_types=scene.tex_types, t_min=float(t_min),
        interpret=interpret,
    )
    return o2, d2, t2, r2, al2


def _bwd_kernel(mat_types, bg_ref,
                t_ref, nx_ref, ny_ref, nz_ref, v0_ref, v1_ref, v2_ref,
                ratio_ref, invr_ref, flags_ref,
                dx_ref, dy_ref, dz_ref,
                gox_ref, goy_ref, goz_ref, gdx_ref, gdy_ref, gdz_ref,
                gtx_ref, gty_ref, gtz_ref, grx_ref, gry_ref, grz_ref,
                ox_o, oy_o, oz_o, dx_o, dy_o, dz_o, tx_o, ty_o, tz_o):
    """Transposed-shading kernel: every per-lane elementwise chain of
    the closed-form VJP (_make_fused_bounce_vjp docs) in ONE pallas
    block — residuals + cotangents in, (g_o, g_d, g_thr) out, zero
    HBM materialization of the ~40 (R,3) intermediates XLA would
    otherwise stream per bounce."""
    flags = flags_ref[:]

    def bit(b):
        return (flags & b) != 0

    hit = bit(FLG_HIT)
    cont = bit(FLG_CONT)
    reflect = bit(FLG_REFLECT)
    sel_l = bit(FLG_SEL_L) & cont
    sel_m = bit(FLG_SEL_M) & cont
    sel_d = bit(FLG_SEL_D) & cont
    light_on = bit(FLG_LIGHT_ON)
    cos_clamp = bit(FLG_COS_CLAMP)
    refr_zero = bit(FLG_REFR_ZERO)
    l_neg = bit(FLG_L_NEG)
    miss = bit(FLG_ALIVE) & jnp.logical_not(hit)

    def mz(mask, x):
        return jnp.where(mask, x, 0.0)

    f32 = jnp.float32
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    nx = nx_ref[:].astype(f32)
    ny = ny_ref[:].astype(f32)
    nz = nz_ref[:].astype(f32)
    gox2, goy2, goz2 = gox_ref[:], goy_ref[:], goz_ref[:]
    gdx2, gdy2, gdz2 = gdx_ref[:], gdy_ref[:], gdz_ref[:]
    gtx2, gty2, gtz2 = gtx_ref[:], gty_ref[:], gtz_ref[:]
    grx2, gry2, grz2 = grx_ref[:], gry_ref[:], grz_ref[:]

    a = dx * dx + dy * dy + dz * dz
    inv_sa = jax.lax.rsqrt(jnp.maximum(a, _SAFE_EPS))
    ux, uy, uz = dx * inv_sa, dy * inv_sa, dz * inv_sa
    rr = ratio_ref[:].astype(f32)

    # ---- scatter direction chains: g_dir -> (g_u, g_n) --------------
    g_dirx = mz(cont, gdx2)
    g_diry = mz(cont, gdy2)
    g_dirz = mz(cont, gdz2)
    g_nx = mz(sel_l, g_dirx)
    g_ny = mz(sel_l, g_diry)
    g_nz = mz(sel_l, g_dirz)
    g_ux = jnp.zeros_like(dx)
    g_uy = jnp.zeros_like(dx)
    g_uz = jnp.zeros_like(dx)

    refl_m = sel_m | (sel_d & reflect)
    if (MAT_METAL in mat_types) or (MAT_DIELECTRIC in mat_types):
        s = ux * nx + uy * ny + uz * nz
        grx = mz(refl_m, g_dirx)
        gry = mz(refl_m, g_diry)
        grz = mz(refl_m, g_dirz)
        ngr = nx * grx + ny * gry + nz * grz
        g_ux = g_ux + grx - 2.0 * nx * ngr
        g_uy = g_uy + gry - 2.0 * ny * ngr
        g_uz = g_uz + grz - 2.0 * nz * ngr
        g_nx = g_nx - 2.0 * (ux * ngr + s * grx)
        g_ny = g_ny - 2.0 * (uy * ngr + s * gry)
        g_nz = g_nz - 2.0 * (uz * ngr + s * grz)

    if MAT_DIELECTRIC in mat_types:
        rm = sel_d & jnp.logical_not(reflect)
        goutx = mz(rm, g_dirx)
        gouty = mz(rm, g_diry)
        goutz = mz(rm, g_dirz)
        raw_cos = -(ux * nx + uy * ny + uz * nz)
        cos = jnp.minimum(raw_cos, 1.0)
        perpx = rr * (ux + cos * nx)
        perpy = rr * (uy + cos * ny)
        perpz = rr * (uz + cos * nz)
        pp = perpx * perpx + perpy * perpy + perpz * perpz
        abs_l = jnp.abs(1.0 - pp)
        s_par = jnp.where(refr_zero, 0.0, jnp.sqrt(abs_l))
        g_spar = -(nx * goutx + ny * gouty + nz * goutz)
        g_nx = g_nx - s_par * goutx
        g_ny = g_ny - s_par * gouty
        g_nz = g_nz - s_par * goutz
        g_absl = jnp.where(
            refr_zero, 0.0, g_spar / jnp.maximum(2.0 * s_par, 1e-30)
        )
        sg = jnp.where(l_neg, -g_absl, g_absl)
        g_perpx = goutx - 2.0 * perpx * sg
        g_perpy = gouty - 2.0 * perpy * sg
        g_perpz = goutz - 2.0 * perpz * sg
        g_ux = g_ux + rr * g_perpx
        g_uy = g_uy + rr * g_perpy
        g_uz = g_uz + rr * g_perpz
        g_nx = g_nx + rr * cos * g_perpx
        g_ny = g_ny + rr * cos * g_perpy
        g_nz = g_nz + rr * cos * g_perpz
        g_cos = jnp.where(
            cos_clamp, 0.0,
            rr * (nx * g_perpx + ny * g_perpy + nz * g_perpz),
        )
        g_ux = g_ux - nx * g_cos
        g_uy = g_uy - ny * g_cos
        g_uz = g_uz - nz * g_cos
        g_nx = g_nx - ux * g_cos
        g_ny = g_ny - uy * g_cos
        g_nz = g_nz - uz * g_cos

    # ---- u = d/|d| -> d ----------------------------------------------
    udg = ux * g_ux + uy * g_uy + uz * g_uz
    g_dx = mz(jnp.logical_not(cont), gdx2) + (g_ux - ux * udg) * inv_sa
    g_dy = mz(jnp.logical_not(cont), gdy2) + (g_uy - uy * udg) * inv_sa
    g_dz = mz(jnp.logical_not(cont), gdz2) + (g_uz - uz * udg) * inv_sa

    # ---- throughput (attenuation + miss background + light emission) -
    v0 = v0_ref[:].astype(f32)
    v1 = v1_ref[:].astype(f32)
    v2 = v2_ref[:].astype(f32)
    lm = sel_l | sel_m
    bg0, bg1, bg2 = bg_ref[0, 0], bg_ref[0, 1], bg_ref[0, 2]
    tx_o[:] = (jnp.where(cont, jnp.where(lm, v0, 1.0) * gtx2, gtx2)
               + mz(miss, bg0 * grx2) + mz(light_on, v0 * grx2))
    ty_o[:] = (jnp.where(cont, jnp.where(lm, v1, 1.0) * gty2, gty2)
               + mz(miss, bg1 * gry2) + mz(light_on, v1 * gry2))
    tz_o[:] = (jnp.where(cont, jnp.where(lm, v2, 1.0) * gtz2, gtz2)
               + mz(miss, bg2 * grz2) + mz(light_on, v2 * grz2))

    # ---- normal -> hit point (sphere dn/dp = flip/r, 0 otherwise) ----
    invr = invr_ref[:].astype(f32)
    g_px = mz(cont, gox2) + invr * g_nx
    g_py = mz(cont, goy2) + invr * g_ny
    g_pz = mz(cont, goz2) + invr * g_nz

    # ---- point = o + t(o,d) d; analytic-t chain ----------------------
    t = t_ref[:].astype(f32)
    g_t = dx * g_px + dy * g_py + dz * g_pz
    den = nx * dx + ny * dy + nz * dz
    den = jnp.where(jnp.abs(den) < 1e-30, 1.0, den)
    q = g_t / den
    ox_o[:] = mz(jnp.logical_not(cont), gox2) + g_px - q * nx
    oy_o[:] = mz(jnp.logical_not(cont), goy2) + g_py - q * ny
    oz_o[:] = mz(jnp.logical_not(cont), goz2) + g_pz - q * nz
    dx_o[:] = g_dx + t * g_px - q * t * nx
    dy_o[:] = g_dy + t * g_py - q * t * ny
    dz_o[:] = g_dz + t * g_pz - q * t * nz


# ---------------------------------------------------------------------------
# differentiable path: Pallas forward + hand-written closed-form backward
# ---------------------------------------------------------------------------
#
# The custom VJP computes exactly what reverse-mode AD computes through
# the XLA diff bounce under the DEFAULT estimator (integrator._bounce_step
# with RPT_DIFF_T=analytic, detached sampling):
#
# * discrete events (hit/idx, material choice, dielectric coin, metal
#   grazing absorb, checker pick, near-zero fallback) are detached;
# * t is the implicit-function linearization (integrator._analytic_t):
#   dt/do = -n/(n.d), dt/dd = -t n/(n.d) — any nonzero multiple of the
#   surface normal works (scale and sign cancel in the ratio), so the
#   kernel's saved flipped unit normal serves;
# * the sphere's shading normal is differentiable through the hit point
#   (record_from_rows: n = flip*(point-c)/r, so dn/dpoint = flip/r);
#   rect/triangle shading normals are constants;
# * texture-value gradients route to the packed table's color rows
#   (solid / checker-odd / checker-even by the saved pick flags);
#   pack_prims_shaded is plain differentiable gather code, so XLA
#   carries d_packed on to scene.textures.color (the DiffParams leaf)
#   automatically.
#
# Like the XLA analytic-t default, hit-distance geometry gradients
# (d/d prims.data) are dropped — prims.data is not a DiffParams leaf
# (integrator.trace docstring documents the limitation).
#
# Supported: solid + checker-of-solids textures.  Perlin's
# d(value)/d(point) term is not implemented — scenes with perlin keep
# the XLA diff path (fused_bounce_diff_ok gates).


def fused_bounce_diff_ok(scene) -> bool:
    """Static routing for the differentiable fused bounce.

    Default ON: with the column-native carry + Pallas transposed-
    shading backward this beats the XLA diff path on the v5e
    CornellBox 512^2 bench step (76.3 vs 87.0 ms fwd+bwd same-day;
    diff forward 38.8 vs 67.9) — see DESIGN.md §13 for the
    progression.  RPT_FUSED_BOUNCE_DIFF=0 reverts to the XLA path."""
    return (
        fused_bounce_ok(scene)
        and set(scene.tex_types) <= {TEX_SOLID, TEX_CHECKER}
        and os.environ.get("RPT_DIFF_T", "analytic") == "analytic"
        and os.environ.get("RPT_FUSED_BOUNCE_DIFF", "1") == "1"
    )


@functools.lru_cache(maxsize=None)
def _make_fused_bounce_vjp(kinds, mat_types, tex_types, t_min, interpret):
    """Column-native custom VJP: ``bounce(cols, su0, su1, bu0, bu1,
    bu2, coin, packed, bg) -> cols'`` where ``cols`` is the 13-column
    state dict (_COL_KEYS).  Column carries keep every reshape around
    the forward/backward kernels contiguous — the (R, 3) AoS carry
    paid ~26 strided column-extract/stack copies per bounce in each
    sweep."""
    P = len(kinds)

    def run(cols, su0, su1, bu0, bu1, bu2, coin, packed, bg, want_res):
        seed = jnp.zeros((1,), jnp.uint32)  # perlin is gated out here
        return _fused_bounce_cols(
            packed, bg, seed, cols, su0, su1, bu0, bu1, bu2, coin,
            kinds=kinds, mat_types=mat_types, tex_types=tex_types,
            t_min=t_min, interpret=interpret, want_residuals=want_res,
        )

    @jax.custom_vjp
    def bounce(cols, su0, su1, bu0, bu1, bu2, coin, packed, bg):
        return run(cols, su0, su1, bu0, bu1, bu2, coin, packed, bg,
                   False)

    def fwd(cols, su0, su1, bu0, bu1, bu2, coin, packed, bg):
        out, res = run(cols, su0, su1, bu0, bu1, bu2, coin, packed, bg,
                       True)
        d = (cols["d0"], cols["d1"], cols["d2"])
        thr = (cols["t0"], cols["t1"], cols["t2"])
        return out, (d, thr, bg, res, packed)

    def bwd(saved, cots):
        d, thr, bg, res, packed = saved
        zr = jnp.zeros_like(d[0])

        # RPT_FBD_PROBE (perf decomposition only — WRONG GRADIENTS):
        # "zero" returns zero cotangents (isolates residual traffic +
        # scan transpose machinery); "notex" skips the packed-color
        # one-hot contraction (isolates its cost).
        probe = os.environ.get("RPT_FBD_PROBE", "")
        if probe == "zero":
            return ({k: zr for k in _COL_KEYS}, zr, zr, zr, zr, zr, zr,
                    jnp.zeros_like(packed), jnp.zeros_like(bg))

        g_o2 = (cots["o0"], cots["o1"], cots["o2"])
        g_d2 = (cots["d0"], cots["d1"], cots["d2"])
        g_thr2 = (cots["t0"], cots["t1"], cots["t2"])
        g_rad2 = (cots["r0"], cots["r1"], cots["r2"])
        g_o, g_d, g_thr, gp, g_bg = _bounce_grads(
            res, d, thr, bg, g_o2, g_d2, g_thr2, g_rad2, packed, P,
            mat_types, interpret, probe,
        )
        g_cols = dict(zip(_COL_KEYS, (
            g_o[0], g_o[1], g_o[2], g_d[0], g_d[1], g_d[2],
            g_thr[0], g_thr[1], g_thr[2],
            g_rad2[0], g_rad2[1], g_rad2[2], zr,
        )))
        return (g_cols, zr, zr, zr, zr, zr, zr,
                _psum_to_replicated(gp, packed),
                _psum_to_replicated(g_bg, bg))

    bounce.defvjp(fwd, bwd)
    return bounce


def _bounce_grads(res, d, thr, bg, g_o2, g_d2, g_thr2, g_rad2, packed,
                  P, mat_types, interpret, probe=""):
    """One bounce's closed-form input cotangents, shared by the
    per-bounce custom VJP and the whole-scan VJP (fused_scan_trace):
    (g_o, g_d, g_thr column triples, d_packed, d_bg)."""
    R = d[0].shape[0]
    flags_l = res["flags"].reshape(-1)[:R]
    best_i = flags_l >> FLG_BESTI_SHIFT
    hit = _bit(flags_l, FLG_HIT)
    cont = _bit(flags_l, FLG_CONT)
    sines_neg = _bit(flags_l, FLG_SINES_NEG)
    sel_l = _bit(flags_l, FLG_SEL_L) & cont
    sel_m = _bit(flags_l, FLG_SEL_M) & cont
    light_on = _bit(flags_l, FLG_LIGHT_ON)
    is_ck = _bit(flags_l, FLG_IS_CK)
    miss = _bit(flags_l, FLG_ALIVE) & ~hit

    if os.environ.get("RPT_FBD_BWD", "pallas") == "pallas":
        g_o, g_d, g_thr = _bwd_call(
            res, d, bg, g_o2, g_d2, g_thr2, g_rad2,
            mat_types=mat_types, interpret=interpret,
        )
    else:
        g_o, g_d, g_thr = _bwd_xla(
            res, d, bg, g_o2, g_d2, g_thr2, g_rad2, mat_types,
        )

    # ---- small reductions stay in XLA (fuse with the einsum) -----
    missf = miss.astype(jnp.float32)
    g_bg = jnp.stack([
        jnp.sum(missf * thr[c] * g_rad2[c]) for c in range(3)
    ])
    lmf = (sel_l | sel_m).astype(jnp.float32)
    lonf = light_on.astype(jnp.float32)
    g_val = [
        lmf * thr[c] * g_thr2[c] + lonf * thr[c] * g_rad2[c]
        for c in range(3)
    ]

    # ---- packed color rows (ONE one-hot MXU contraction) ----------
    # HIGHEST precision like ops/table.lookup: the one-hot operand
    # is exact, but the default TPU matmul precision would truncate
    # g_val to bf16
    onehot = (
        (best_i[:, None] == jnp.arange(P, dtype=jnp.int32)[None, :])
        & hit[:, None]
    ).astype(jnp.float32)
    targets = (
        (PAY_COLOR, hit & ~is_ck),
        (PAY_ODD, is_ck & sines_neg),
        (PAY_EVEN, is_ck & ~sines_neg),
    )
    gp = jnp.zeros_like(packed)
    if probe != "notex":
        gv9 = jnp.stack(
            [g_val[c] * mask.astype(jnp.float32)
             for _, mask in targets for c in range(3)], axis=1
        )                                                 # (R, 9)
        # RPT_FBD_RES=bf16 extends the residual-accuracy contract to
        # the texture-grad contraction: bf16 operands halve the
        # (R, P) one-hot + (R, 9) materialization traffic (the one-hot
        # is exact in bf16; gv9 rounds — same ~1e-2 normalized class
        # as the bf16 residual planes)
        if _res_dtype() == jnp.bfloat16:
            contrib = jnp.einsum(
                "rp,rc->pc", onehot.astype(jnp.bfloat16),
                gv9.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            ).astype(jnp.float32)
        else:
            # Precision.HIGH (3-pass) not HIGHEST (6-pass): the bf16
            # triple-split represents each f32 operand EXACTLY (one-hot
            # entries are 0/1; gv9's 24 mantissa bits fit 3 bf16
            # passes), so per-term products are exact and only the f32
            # accumulation order differs — same accuracy class, half
            # the MXU passes on a contraction whose cost is pure
            # padding (P=18 -> 128, C=9 -> 128 tiles).
            # RPT_FBD_EINSUM=highest restores the 6-pass version.
            prec = (jax.lax.Precision.HIGHEST
                    if os.environ.get("RPT_FBD_EINSUM") == "highest"
                    else jax.lax.Precision.HIGH)
            contrib = jnp.einsum(
                "rp,rc->pc", onehot, gv9,
                preferred_element_type=jnp.float32,
                precision=prec,
            )                                             # (P, 9)
        for j, (row0, _) in enumerate(targets):
            gp = gp.at[row0:row0 + 3].add(
                contrib[:, 3 * j:3 * j + 3].T
            )
    return g_o, g_d, g_thr, gp, g_bg


def _bit(flags, b):
    return (flags & b) != 0


def _psum_to_replicated(g, primal):
    """Collapse a shard-VARYING cotangent onto a REPLICATED primal.

    Under shard_map with check_vma (the default), a custom_vjp's bwd
    must EXPLICITLY psum the per-shard partial gradients of a
    replicated input (packed table, background) — jax's shard_map
    transpose no longer inserts the collective for custom VJPs, it
    type-checks that the returned cotangent's varying-axes set matches
    the input's.  The psum set is derived from the vma types, so this
    is a no-op outside shard_map and exact inside (the replicated
    gradient IS the sum of shard partials, same as jax inserts for
    non-custom primitives)."""
    want = set(jax.typeof(primal).vma)
    extra = tuple(sorted(set(jax.typeof(g).vma) - want))
    return jax.lax.psum(g, extra) if extra else g


_RES_KEYS = ("t", "nx", "ny", "nz", "v0", "v1", "v2", "ratio", "invr",
             "flags")


@functools.partial(jax.jit, static_argnames=("mat_types", "interpret"))
def _bwd_call(res, d, bg, g_o2, g_d2, g_thr2, g_rad2, *,
              mat_types, interpret=False):
    """Dispatch the transposed-shading Pallas kernel: planed residuals
    + column cotangents in, (g_o, g_d, g_thr) column triples out.
    ``d`` and the cotangents are 3-tuples of (R,) columns — every
    reshape here is contiguous.

    Block size: the kernel is pure elementwise chains over 34 planes,
    so at the forward kernel's 8-row blocks each grid step moves only
    ~136 KB — DMA-issue-bound, not compute-bound.  RPT_FBD_BWD_ROWS
    (default 64) uses taller blocks for the backward only (the
    forward's block is tied to the sweep's VMEM working set); clamped
    to the largest divisor of the plane height.
    """
    rows = res["t"].shape[0]
    R = d[0].shape[0]

    ins = [res[k] for k in _RES_KEYS]
    for v in (d, g_o2, g_d2, g_thr2, g_rad2):
        ins.extend(_plane(c, R) for c in v)
    want = int(os.environ.get("RPT_FBD_BWD_ROWS", "64"))
    nbr = max(BLOCK_ROWS, min(want, rows))
    while rows % nbr:
        nbr -= BLOCK_ROWS
    grid = (rows // nbr,)
    ray_spec = pl.BlockSpec(
        (nbr, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    vma = jax.typeof(d[0]).vma
    f32 = jax.ShapeDtypeStruct((rows, 128), jnp.float32, vma=vma)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, mat_types),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ] + [ray_spec] * 25,
        out_specs=(ray_spec,) * 9,
        out_shape=(f32,) * 9,
        interpret=interpret,
    )(bg.reshape(1, 3), *ins)

    o = [x.reshape(-1)[:R] for x in outs]
    return tuple(o[0:3]), tuple(o[3:6]), tuple(o[6:9])


def _bwd_xla(res, d, bg, g_o2, g_d2, g_thr2, g_rad2, mat_types):
    """XLA variant of the per-lane backward chains (RPT_FBD_BWD=xla):
    the same closed-form math as _bwd_kernel, left to XLA's fuser —
    kept for A/B and as the interpreter-free fallback.  Column tuples
    in/out like _bwd_call (internally (R, 3) for brevity)."""
    R = d[0].shape[0]
    d = jnp.stack(d, 1)
    g_o2 = jnp.stack(g_o2, 1)
    g_d2 = jnp.stack(g_d2, 1)
    g_thr2 = jnp.stack(g_thr2, 1)
    g_rad2 = jnp.stack(g_rad2, 1)

    def up(x):
        # residual planes may be bf16 (RPT_FBD_RES=bf16) — upcast
        col = x.reshape(-1)[:R]
        return col.astype(jnp.float32) if col.dtype != jnp.int32 else col

    t = up(res["t"])
    n = jnp.stack([up(res["nx"]), up(res["ny"]), up(res["nz"])], 1)
    val = jnp.stack([up(res["v0"]), up(res["v1"]), up(res["v2"])], 1)
    ratio = up(res["ratio"])
    invr = up(res["invr"])
    flags = up(res["flags"])

    hit = _bit(flags, FLG_HIT)
    cont = _bit(flags, FLG_CONT)
    choose_reflect = _bit(flags, FLG_REFLECT)
    sel_l = _bit(flags, FLG_SEL_L) & cont
    sel_m = _bit(flags, FLG_SEL_M) & cont
    sel_d = _bit(flags, FLG_SEL_D) & cont
    light_on = _bit(flags, FLG_LIGHT_ON)
    cos_clamp = _bit(flags, FLG_COS_CLAMP)
    refr_zero = _bit(flags, FLG_REFR_ZERO)
    l_neg = _bit(flags, FLG_L_NEG)
    miss = _bit(flags, FLG_ALIVE) & ~hit

    def m(mask):
        return mask[:, None].astype(jnp.float32)

    def dot(a, b):
        return jnp.sum(a * b, axis=-1, keepdims=True)

    a = jnp.sum(d * d, axis=-1, keepdims=True)
    sa = jnp.sqrt(jnp.maximum(a, _SAFE_EPS))
    u = d / sa
    rr = ratio[:, None]

    g_dir = m(cont) * g_d2
    g_n = m(sel_l) * g_dir  # lambertian: dir = n + sph (or n)
    g_u = jnp.zeros_like(d)

    refl_m = sel_m | (sel_d & choose_reflect)
    if (MAT_METAL in mat_types) or (MAT_DIELECTRIC in mat_types):
        s = dot(u, n)
        gr = m(refl_m) * g_dir
        ngr = dot(n, gr)
        g_u = g_u + gr - 2.0 * n * ngr
        g_n = g_n - 2.0 * (u * ngr + s * gr)

    if MAT_DIELECTRIC in mat_types:
        rm = sel_d & ~choose_reflect
        gout = m(rm) * g_dir
        raw_cos = -dot(u, n)
        cos = jnp.minimum(raw_cos, 1.0)
        perp = rr * (u + cos * n)
        abs_l = jnp.abs(1.0 - jnp.sum(perp * perp, -1, keepdims=True))
        s_par = jnp.where(refr_zero[:, None], 0.0, jnp.sqrt(abs_l))
        g_spar = -dot(n, gout)
        g_n = g_n - s_par * gout
        g_absl = jnp.where(
            refr_zero[:, None], 0.0,
            g_spar / jnp.maximum(2.0 * s_par, 1e-30),
        )
        sign = jnp.where(l_neg[:, None], -1.0, 1.0)
        g_perp = gout - 2.0 * perp * (sign * g_absl)
        g_u = g_u + rr * g_perp
        g_n = g_n + rr * cos * g_perp
        g_cos = jnp.where(
            cos_clamp[:, None], 0.0, rr * dot(n, g_perp)
        )
        g_u = g_u - n * g_cos
        g_n = g_n - u * g_cos

    g_d = m(~cont) * g_d2 + (g_u - u * dot(u, g_u)) / sa

    att = jnp.where(m(sel_l | sel_m), val, 1.0)
    g_thr = (
        jnp.where(m(cont), att * g_thr2, g_thr2)
        + m(miss) * bg[None, :] * g_rad2
        + m(light_on) * val * g_rad2
    )

    g_point = m(cont) * g_o2 + invr[:, None] * g_n
    g_t = dot(d, g_point)
    g_o = m(~cont) * g_o2 + g_point
    g_d = g_d + t[:, None] * g_point
    den = dot(n, d)
    den = jnp.where(jnp.abs(den) < 1e-30, 1.0, den)
    g_o = g_o + g_t * (-n / den)
    g_d = g_d + g_t * (-t[:, None] * n / den)
    return (
        (g_o[:, 0], g_o[:, 1], g_o[:, 2]),
        (g_d[:, 0], g_d[:, 1], g_d[:, 2]),
        (g_thr[:, 0], g_thr[:, 1], g_thr[:, 2]),
    )


def fused_bounce_cols_step(scene, cols, su0, su1, bu0, bu1, bu2, coin,
                           background, t_min, differentiable,
                           interpret=False):
    """Column-native bounce for the hot scan carries (integrator
    _trace_fused_cols): 13-column state dict + 6 uniform columns in,
    columns out.  ``differentiable`` routes through the custom VJP
    (detached-sampling gradients to o/d/thr/rad, texture colors via
    ``packed``, and background)."""
    bg = jnp.asarray(background, jnp.float32)
    if differentiable:
        packed = pack_prims_shaded(scene)
        bounce = _make_fused_bounce_vjp(
            scene.kinds_static, scene.mat_types, scene.tex_types,
            float(t_min), bool(interpret),
        )
        return bounce(cols, su0, su1, bu0, bu1, bu2, coin, packed, bg)
    packed = jax.lax.stop_gradient(pack_prims_shaded(scene))
    seed = jnp.asarray(scene.textures.perlin_seed, jnp.uint32)
    return _fused_bounce_cols(
        packed, bg, seed, cols, su0, su1, bu0, bu1, bu2, coin,
        kinds=scene.kinds_static, mat_types=scene.mat_types,
        tex_types=scene.tex_types, t_min=float(t_min),
        interpret=interpret,
    )


def fused_bounce_diff_apply(scene, o, d, thr, rad, alive, sphere_u,
                            ball_u, coin, background, t_min,
                            interpret=False):
    """Differentiable fused bounce (custom VJP), (R, 3) AoS wrapper
    over the column-native core.  Same state-update semantics as
    fused_bounce_apply (uniforms in, transforms in-kernel); gradients
    flow to (o, d, thr, rad), scene.textures.color (via
    pack_prims_shaded), and background."""
    cols = dict(zip(_COL_KEYS, (
        o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
        thr[:, 0], thr[:, 1], thr[:, 2], rad[:, 0], rad[:, 1],
        rad[:, 2], alive.astype(jnp.float32),
    )))
    c = fused_bounce_cols_step(
        scene, cols, sphere_u[:, 0], sphere_u[:, 1], ball_u[:, 0],
        ball_u[:, 1], ball_u[:, 2], coin, background, t_min,
        differentiable=True, interpret=interpret,
    )
    return (
        jnp.stack([c["o0"], c["o1"], c["o2"]], 1),
        jnp.stack([c["d0"], c["d1"], c["d2"]], 1),
        jnp.stack([c["t0"], c["t1"], c["t2"]], 1),
        jnp.stack([c["r0"], c["r1"], c["r2"]], 1),
        c["al"] > 0.5,
    )


# ---------------------------------------------------------------------------
# whole-scan custom VJP: hand-rolled backward loop over ALL bounces
# ---------------------------------------------------------------------------
#
# The per-bounce custom VJP (above) still leaves the BACKWARD SCHEDULE
# to jax's lax.scan transpose: per bounce it re-marshals 13 cotangent
# columns through the scan carry, saves/restores the closure residuals,
# transposes the roulette lax.cond, and stacks zero cotangents for the
# hoisted uniform xs.  Measured round 5 (tools/tpu_fbdecomp.py,
# CornellBox 512^2 bench step): diff fwd 34.2 ms but probe_zero (bwd
# returns zeros immediately) is 44.5 ms — ~10 ms of pure machinery —
# and the full step is 67.6 ms.  This VJP replaces the whole
# scan-of-custom-vjps with ONE custom_vjp around the entire bounce
# loop: the forward is the same fused-kernel scan (bitwise-identical
# primal, incl. roulette and stats), the backward is a hand-written
# reversed lax.scan whose carry is exactly (13 cotangent columns,
# d_packed, d_bg) and whose per-bounce body is the shared closed-form
# _bounce_grads + an unconditional roulette transpose (the identity
# branch saved p=1/act=0, so where(act, 1/p, 1) covers both branches
# with no lax.cond).  Stats (segments/occupancy) are detached — same
# effective gradients as the AD path, where their cotangents die at
# the discrete alive chain.  RPT_FBD_SCAN=jax restores the lax.scan
# transpose path.


@functools.lru_cache(maxsize=None)
def _make_fused_scan_vjp(kinds, mat_types, tex_types, t_min, interpret,
                         max_bounces, rr_start, stats_slots, unroll):
    P = len(kinds)
    has_rr = rr_start < max_bounces

    def run_kernel(cols, su0, su1, bu0, bu1, bu2, cn, packed, bg,
                   want_res):
        seed = jnp.zeros((1,), jnp.uint32)  # perlin is gated out here
        return _fused_bounce_cols(
            packed, bg, seed, cols, su0, su1, bu0, bu1, bu2, cn,
            kinds=kinds, mat_types=mat_types, tex_types=tex_types,
            t_min=t_min, interpret=interpret, want_residuals=want_res,
        )

    def fwd_body(carry, x, packed, bg, want_res):
        cols, seg, occ = carry
        sgf = jax.lax.stop_gradient
        n_alive = jnp.sum(sgf(cols["al"]))
        seg = seg + n_alive
        occ = jax.lax.dynamic_update_slice(
            occ, n_alive[None],
            (jnp.minimum(x["b"], stats_slots - 1),),
        )
        su, bu, cn = x["sphere_u"], x["ball_u"], x["coin"]
        d_in = (cols["d0"], cols["d1"], cols["d2"])
        thr_in = (cols["t0"], cols["t1"], cols["t2"])
        out = run_kernel(cols, su[:, 0], su[:, 1], bu[:, 0], bu[:, 1],
                         bu[:, 2], cn, packed, bg, want_res)
        cols2, res = out if want_res else (out, None)

        # roulette: op-for-op integrator._trace_fused_cols.bounce_body
        # (same max tree, same division, same cond) + (p, act) saved so
        # the transpose needs no cond: identity saves p=1, act=0
        def roulette(args):
            t0, t1, t2, al = args
            p = jnp.clip(
                jnp.maximum(jnp.maximum(sgf(t0), sgf(t1)), sgf(t2)),
                0.05, 1.0,
            )
            u = x["roulette"]
            act = (al > 0.5) & (u < p)
            t0 = jnp.where(act, t0 / p, t0)
            t1 = jnp.where(act, t1 / p, t1)
            t2 = jnp.where(act, t2 / p, t2)
            al = jnp.where(al > 0.5, act.astype(jnp.float32), al)
            return t0, t1, t2, al, p, act.astype(jnp.float32)

        def ident(args):
            t0, t1, t2, al = args
            return (t0, t1, t2, al, jnp.ones_like(t0),
                    jnp.zeros_like(t0))

        if has_rr:
            t0, t1, t2, al, p, actf = jax.lax.cond(
                x["b"] >= rr_start, roulette, ident,
                (cols2["t0"], cols2["t1"], cols2["t2"], cols2["al"]),
            )
            cols2 = dict(cols2, t0=t0, t1=t1, t2=t2, al=al)
        ys = None
        if want_res:
            ys = dict(res)
            ys.update(d0=d_in[0], d1=d_in[1], d2=d_in[2],
                      ti0=thr_in[0], ti1=thr_in[1], ti2=thr_in[2])
            if has_rr:
                ys.update(rp=p, ract=actf)
        return (cols2, seg, occ), ys

    def run_scan(cols0, packed, bg, draws, want_res):
        zero_scalar = jnp.sum(cols0["o0"] * 0.0)
        occ0 = zero_scalar + jnp.zeros((stats_slots,), jnp.float32)
        xs = dict(draws)
        xs["b"] = jnp.arange(max_bounces, dtype=jnp.int32)
        (colsF, seg, occ), ys = jax.lax.scan(
            lambda c, x: fwd_body(c, x, packed, bg, want_res),
            (cols0, zero_scalar, occ0), xs, unroll=unroll,
        )
        return (colsF, seg, occ), ys

    @jax.custom_vjp
    def scan_all(cols0, packed, bg, draws):
        out, _ = run_scan(cols0, packed, bg, draws, False)
        return out

    def scan_fwd(cols0, packed, bg, draws):
        out, ys = run_scan(cols0, packed, bg, draws, True)
        return out, (ys, packed, bg, draws)

    def scan_bwd(saved, cots):
        ys, packed, bg, draws = saved
        g_colsF, _g_seg, _g_occ = cots  # stats are detached
        zr = jnp.zeros_like(ys["d0"][0])
        # varying-zero scalar: under shard_map (check_vma) the carry's
        # d_packed/d_bg accumulators and the returned draw cotangents
        # must carry the shard-VARYING type their per-bounce updates
        # have — deriving the zero from ys (per-shard data) gives it
        # the right vma; adds exact 0.0 otherwise (same pattern as
        # integrator's zero_scalar)
        zs = jnp.sum(zr)
        g_draws = jax.tree_util.tree_map(
            lambda a: jnp.zeros_like(a) + zs, draws
        )

        probe = os.environ.get("RPT_FBD_PROBE", "")
        if probe == "zero":
            return ({k: zr for k in _COL_KEYS},
                    jnp.zeros_like(packed), jnp.zeros_like(bg),
                    g_draws)

        def body(carry, y):
            g, gp, gbg = carry
            if has_rr:
                # transpose of thr' = where(act, thr/p, thr): g/p on
                # act lanes — division, not 1/p-then-multiply, so the
                # rounding matches jax's divide transpose exactly
                act = y["ract"] > 0.5
                gt = tuple(
                    jnp.where(act, g[k] / y["rp"], g[k])
                    for k in ("t0", "t1", "t2")
                )
            else:
                gt = (g["t0"], g["t1"], g["t2"])
            res_b = {k: y[k] for k in _RES_KEYS}
            d_b = (y["d0"], y["d1"], y["d2"])
            thr_b = (y["ti0"], y["ti1"], y["ti2"])
            g_o2 = (g["o0"], g["o1"], g["o2"])
            g_d2 = (g["d0"], g["d1"], g["d2"])
            g_rad2 = (g["r0"], g["r1"], g["r2"])
            g_o, g_d, g_thr, gp_b, gbg_b = _bounce_grads(
                res_b, d_b, thr_b, bg, g_o2, g_d2, gt, g_rad2, packed,
                P, mat_types, interpret, probe,
            )
            g2 = dict(
                g, o0=g_o[0], o1=g_o[1], o2=g_o[2],
                d0=g_d[0], d1=g_d[1], d2=g_d[2],
                t0=g_thr[0], t1=g_thr[1], t2=g_thr[2],
            )  # rad cotangent passes through; al stays zero
            return (g2, gp + gp_b, gbg + gbg_b), None

        g0 = {k: g_colsF[k] for k in _COL_KEYS}
        g0["al"] = zr
        (gI, gp, gbg), _ = jax.lax.scan(
            body,
            (g0, jnp.zeros_like(packed) + zs, jnp.zeros_like(bg) + zs),
            ys, reverse=True, unroll=unroll,
        )
        return (gI, _psum_to_replicated(gp, packed),
                _psum_to_replicated(gbg, bg), g_draws)

    scan_all.defvjp(scan_fwd, scan_bwd)
    return scan_all


def fused_scan_trace(scene, cols, draws_all, background, t_min,
                     max_bounces, rr_start, stats_slots,
                     interpret=False, unroll=2):
    """Differentiable whole-scan trace for fused-diff scenes.

    ``cols``: 13-column state dict (_COL_KEYS); ``draws_all``: the
    hoisted uniform draws from integrator._precompute_draws (REQUIRED —
    the scan consumes them as xs).  Returns (cols_final, segments,
    occupancy).  Primal is bitwise the _trace_fused_cols scan body;
    gradients flow to cols/scene.textures.color (via packed)/background
    with the same detached-sampling estimator as the per-bounce VJP.
    """
    packed = pack_prims_shaded(scene)
    bg = jnp.asarray(background, jnp.float32)
    scan_all = _make_fused_scan_vjp(
        scene.kinds_static, scene.mat_types, scene.tex_types,
        float(t_min), bool(interpret), int(max_bounces), int(rr_start),
        int(stats_slots), int(unroll),
    )
    return scan_all(cols, packed, bg, dict(draws_all))
