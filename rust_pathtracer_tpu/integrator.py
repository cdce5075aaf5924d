"""Iterative wavefront path-tracing integrator.

The reference integrator is the recursive ``Ray::color`` (ray.rs:20-41):

    color(ray, B):
      B == 0                -> black
      miss                  -> background
      hit                   -> emitted + (scatter ? attenuation * color(scattered, B-1)
                                                  : 0)

Recursion does not exist on a TPU vector unit; the wavefront rewrite
carries (origin, direction, throughput, radiance, alive) for every lane
and peels one bounce per loop iteration:

    radiance += throughput * emitted            (hit lanes)
    radiance += throughput * background         (miss lanes; lane dies)
    throughput *= attenuation                   (scatter lanes)
    lane dies when absorbed (metal grazing / light) or at max_bounces

which computes exactly the same sum — the product of attenuations along
the path times the emitted/background term where it terminates.

Two loop modes:

* ``lax.while_loop`` (default) — exits early once every lane is dead
  (the reference's per-ray adaptive depth, per-batch here);
* ``lax.scan`` (``differentiable=True``) — fixed max_bounces trip
  count, reverse-mode differentiable.

Differentiation uses **detached sampling**: the discrete hit *search*
(BVH walk / argmin, both integer-valued and containing a while_loop)
runs on stop-gradient inputs, then the chosen primitive's hit distance
is RE-evaluated differentiably, so radiance gradients flow through hit
geometry, shading, textures and the camera — while visibility
discontinuities are (bias-accepted) ignored, per the standard
reparameterized-path-tracing recipe.

Optional per-bounce Russian roulette (OFF by default — the reference
has none; it changes variance, not the mean) boosts deep-bounce scenes.

t_min = 0.001 shadow-acne epsilon (ray.rs:25), in units of |direction|
because directions are unnormalized, exactly like the reference.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rust_pathtracer_tpu import sampling
from rust_pathtracer_tpu import vecmath as vm
from rust_pathtracer_tpu.materials import emitted, scatter, shade_inputs
from rust_pathtracer_tpu.ops.intersect import closest_hit, hit_record, prim_intersect_t

T_MIN = 1e-3  # ray.rs:25
T_MAX = np.float32(1.0e30)


class TraceStats(NamedTuple):
    segments: jnp.ndarray   # f32 scalar: total ray segments traced
    bounces: jnp.ndarray    # i32 scalar: bounce iterations executed
    occupancy: jnp.ndarray  # f32 (MAX_BOUNCE_STATS,): alive lanes per bounce


# fixed histogram length so TraceStats shapes are static across scenes
MAX_BOUNCE_STATS = 64


def _find_hit(scene, o, d, differentiable):
    """Closest-hit; in differentiable mode the discrete search is
    detached and the winning primitive's t is re-derived (via a one-hot
    MXU contraction) so gradients flow through hit geometry."""
    sg = jax.lax.stop_gradient
    hit_mask, t_search, idx = closest_hit(sg(scene), sg(o), sg(d), T_MIN, T_MAX)
    if not differentiable:
        return hit_mask, jnp.where(hit_mask, t_search, 1.0), idx

    # name the discrete search results so the remat policy saves them:
    # the backward sweep then re-runs only the differentiable shading,
    # not the (stop-gradient) BVH walk / Pallas sweep
    from jax.ad_checkpoint import checkpoint_name

    hit_mask = checkpoint_name(hit_mask, "hit_mask")
    idx = checkpoint_name(idx, "hit_idx")

    from rust_pathtracer_tpu.ops.intersect import gather_prim_rows

    kind, aux, data, _ = gather_prim_rows(scene.prims, idx)
    t_diff, _ = prim_intersect_t(
        kind, aux, data, o, d, T_MIN, T_MAX, prim_types=scene.prim_types
    )
    # dead/miss lanes get a harmless finite t so downstream math stays
    # NaN-free (NaNs in unselected `where` branches poison gradients)
    t = jnp.where(hit_mask, t_diff, 1.0)
    return hit_mask, t, idx


def search_and_record(scene, o, d, alive, differentiable=False):
    """Closest-hit search + HitRecord with per-backend kernel routing.

    TPU forward path: fused v1 sweep (<=128 prims) or projected MXU
    sweep (beyond), both returning the full record without gathers.
    Differentiable / CPU path: jnp search + one-hot record.
    Returns (hit_mask & alive, record with valid = that mask,
    shade_row) — shade_row is the payload shading columns (R, 16) when
    the projected kernel supplied them (so material/texture parameters
    need no table lookups), else None.
    """
    shade_row = None
    use_fused = use_proj = False
    if not differentiable:
        from rust_pathtracer_tpu.ops.pallas_intersect import pallas_available

        if pallas_available():
            use_fused = scene.kinds_static is not None
            use_proj = not use_fused and scene.proj is not None
    if use_fused:
        from rust_pathtracer_tpu.ops.pallas_intersect import (
            closest_hit_record_pallas,
        )

        hit_mask, t, idx, rec = closest_hit_record_pallas(scene, o, d, T_MIN)
        hit_mask = hit_mask & alive
        rec = rec._replace(valid=hit_mask)
    elif use_proj:
        from rust_pathtracer_tpu.ops.projected import (
            closest_hit_record_projected,
        )

        # park dead lanes at an unhittable origin: their (stale) rays
        # would otherwise keep vetoing the kernel's per-block cluster
        # skips; results for dead lanes are masked out below anyway
        o_live = vm.where(alive, o, jnp.full_like(o, 3.0e33))
        hit_mask, t, idx, rec, shade_row = closest_hit_record_projected(
            scene, o_live, d, T_MIN
        )
        hit_mask = hit_mask & alive
        rec = rec._replace(valid=hit_mask)
    else:
        hit_mask, t, idx = _find_hit(scene, o, d, differentiable)
        hit_mask = hit_mask & alive
        rec = hit_record(
            scene.prims, idx, o, d, t, hit_mask, prim_types=scene.prim_types
        )
    return hit_mask, rec, shade_row


def _bounce_step(scene, lane_keys, background, rr_start, state, bounce,
                 differentiable=False):
    o, d, thr, rad, alive, segments, occupancy = state
    n_alive = jnp.sum(alive.astype(jnp.float32))
    segments = segments + n_alive
    occupancy = jax.lax.dynamic_update_slice(
        occupancy, n_alive[None], (jnp.minimum(bounce, MAX_BOUNCE_STATS - 1),)
    )

    hit_mask, rec, shade_row = search_and_record(
        scene, o, d, alive, differentiable
    )
    si = shade_inputs(scene, rec, shade_row)

    # miss -> background, weighted by throughput (ray.rs:40)
    miss = alive & ~hit_mask
    rad = rad + jnp.where(miss[..., None], thr * background, 0.0)

    # hit -> emitted (ray.rs:26), then scatter (ray.rs:28-34)
    em = emitted(scene, rec, si)
    rad = rad + jnp.where(hit_mask[..., None], thr * em, 0.0)

    sg = jax.lax.stop_gradient  # detached sampling: draws carry no grads
    sphere_dir = sg(sampling.on_unit_sphere(
        sampling.bounce_keys(lane_keys, bounce, sampling.P_LAMBERT)
    ))
    ball_dir = sg(sampling.in_unit_sphere(
        sampling.bounce_keys(lane_keys, bounce, sampling.P_FUZZ)
    ))
    coin = sg(sampling.uniform(
        sampling.bounce_keys(lane_keys, bounce, sampling.P_SCHLICK)
    ))
    sc = scatter(scene, rec, d, sphere_dir, ball_dir, coin, si)

    cont = hit_mask & sc.did_scatter
    thr = jnp.where(cont[..., None], thr * sc.attenuation, thr)
    o = vm.where(cont, rec.point, o)
    d = vm.where(cont, sc.direction, d)
    alive = cont

    # optional russian roulette (no reference counterpart)
    def roulette(args):
        thr, alive = args
        p = jnp.clip(jnp.max(jax.lax.stop_gradient(thr), axis=-1), 0.05, 1.0)
        u = sampling.uniform(
            sampling.bounce_keys(lane_keys, bounce, sampling.P_ROULETTE)
        )
        survive = u < p
        thr = jnp.where((alive & survive)[..., None], thr / p[..., None], thr)
        return thr, alive & survive

    thr, alive = jax.lax.cond(
        bounce >= rr_start, roulette, lambda args: args, (thr, alive)
    )
    return (o, d, thr, rad, alive, segments, occupancy)


def trace(
    scene,
    origins,
    directions,
    lane_keys,
    background,
    max_bounces: int,
    russian_roulette_start: Optional[int] = None,
    differentiable: bool = False,
):
    """Estimate radiance for a wavefront of rays.

    origins, directions: (R, 3); lane_keys: (R, 2) counter-based keys;
    background: (3,) miss color (scene.rs ImageSettings.background).
    Returns (radiance (R, 3), TraceStats).
    """
    background = jnp.asarray(background, jnp.float32)
    rr_start = (
        max_bounces + 1 if russian_roulette_start is None else russian_roulette_start
    )

    # derive the carry init arithmetically from the (possibly
    # mesh-varying) ray arrays so shard_map's varying-axis tracking
    # sees matching carry types on both sides of the loop
    zeros3 = origins * 0.0
    zero_scalar = jnp.sum(zeros3[..., 0])
    init = (
        origins,
        directions,
        zeros3 + 1.0,                       # throughput
        zeros3,                             # radiance
        zeros3[..., 0] == 0.0,              # alive (origins are finite)
        zero_scalar,                        # segment counter
        zero_scalar + jnp.zeros((MAX_BOUNCE_STATS,), jnp.float32),  # occupancy
    )

    if differentiable:
        # remat each bounce: the backward sweep recomputes the bounce
        # forward instead of saving every intermediate of every bounce
        # (HBM-bound otherwise: ~20 bounces x O(100B)/lane of residuals).
        # Exception: the discrete hit-search results (5 B/lane/bounce)
        # are saved so the expensive search itself is not re-run.
        import os

        # Remat policy.  Measured on v5e (CornellBox 1M lanes x 20
        # bounces): NO remat = 101.5 ms fwd+bwd vs 134 ms with the
        # names policy — when the per-bounce residuals fit in HBM,
        # saving everything beats recomputing shading.  "auto" (the
        # default) disables remat up to ~24M lane-bounces (~7 GB of
        # residuals) and falls back to the names policy beyond;
        # RPT_REMAT overrides ("names" / "none").
        mode = os.environ.get("RPT_REMAT", "auto")
        if mode == "auto":
            lane_bounces = origins.shape[0] * max_bounces
            mode = "none" if lane_bounces <= 24_000_000 else "names"
        if mode == "none":
            step = lambda state, bounce: _bounce_step(  # noqa: E731
                scene, lane_keys, background, rr_start, state, bounce,
                differentiable=True,
            )
        else:
            step = jax.checkpoint(
                lambda state, bounce: _bounce_step(
                    scene, lane_keys, background, rr_start, state, bounce,
                    differentiable=True,
                ),
                policy=jax.checkpoint_policies.save_only_these_names(
                    "hit_mask", "hit_idx"
                ),
            )

        def scan_body(state, bounce):
            return step(state, bounce), None

        state, _ = jax.lax.scan(
            scan_body, init, jnp.arange(max_bounces, dtype=jnp.int32)
        )
        bounces_done = jnp.int32(max_bounces)
    else:
        def cond(carry):
            bounce, state = carry
            return (bounce < max_bounces) & jnp.any(state[4])

        def body(carry):
            bounce, state = carry
            return (
                bounce + 1,
                _bounce_step(scene, lane_keys, background, rr_start, state, bounce),
            )

        bounces_done, state = jax.lax.while_loop(cond, body, (jnp.int32(0), init))

    _, _, _, rad, _, segments, occupancy = state
    return rad, TraceStats(
        segments=segments, bounces=bounces_done, occupancy=occupancy
    )
