"""Iterative wavefront path-tracing integrator.

The reference integrator is the recursive ``Ray::color`` (ray.rs:20-41):

    color(ray, B):
      B == 0                -> black
      miss                  -> background
      hit                   -> emitted + (scatter ? attenuation * color(scattered, B-1)
                                                  : 0)

Recursion does not exist on a TPU vector unit; the wavefront rewrite
carries (origin, direction, throughput, radiance, alive) for every lane
and peels one bounce per iteration of a ``lax.while_loop``:

    radiance += throughput * emitted            (hit lanes)
    radiance += throughput * background         (miss lanes; lane dies)
    throughput *= attenuation                   (scatter lanes)
    lane dies when absorbed (metal grazing / light) or at max_bounces

which computes exactly the same sum — the product of attenuations along
the path times the emitted/background term where it terminates.  The
loop exits early once every lane is dead (the reference's recursion
depth is adaptive per ray; the wavefront's is adaptive per batch).

Optional per-bounce Russian roulette (OFF by default — the reference
has none and it changes the estimator's variance, not its mean) boosts
throughput on deep-bounce scenes.

t_min = 0.001 shadow-acne epsilon (ray.rs:25), in units of |direction|
because directions are unnormalized, exactly like the reference.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from rust_pathtracer_tpu import sampling
from rust_pathtracer_tpu import vecmath as vm
from rust_pathtracer_tpu.materials import emitted, scatter
from rust_pathtracer_tpu.ops.intersect import closest_hit, hit_record

T_MIN = 1e-3  # ray.rs:25
T_MAX = jnp.float32(1.0e30)


class TraceStats(NamedTuple):
    segments: jnp.ndarray  # f32 scalar: total ray segments traced
    bounces: jnp.ndarray   # i32 scalar: bounce iterations executed


def trace(
    scene,
    origins,
    directions,
    lane_keys,
    background,
    max_bounces: int,
    russian_roulette_start: Optional[int] = None,
):
    """Estimate radiance for a wavefront of rays.

    origins, directions: (R, 3); lane_keys: (R, 2) counter-based keys;
    background: (3,) miss color (scene.rs ImageSettings.background).
    Returns (radiance (R, 3), TraceStats).
    """
    lanes = origins.shape[0]
    background = jnp.asarray(background, jnp.float32)

    rr_start = max_bounces + 1 if russian_roulette_start is None else russian_roulette_start

    def cond(state):
        bounce, _, _, _, _, alive, _ = state
        return (bounce < max_bounces) & jnp.any(alive)

    def body(state):
        bounce, o, d, thr, rad, alive, segments = state
        segments = segments + jnp.sum(alive.astype(jnp.float32))

        hit_mask, t, idx = closest_hit(scene, o, d, T_MIN, T_MAX)
        hit_mask = hit_mask & alive
        rec = hit_record(
            scene.prims, idx, o, d, t, hit_mask, prim_types=scene.prim_types
        )

        # miss -> background, weighted by throughput (ray.rs:40)
        miss = alive & ~hit_mask
        rad = rad + jnp.where(miss[..., None], thr * background, 0.0)

        # hit -> emitted (ray.rs:26), then scatter (ray.rs:28-34)
        em = emitted(scene, rec)
        rad = rad + jnp.where(hit_mask[..., None], thr * em, 0.0)

        sphere_dir = sampling.on_unit_sphere(
            sampling.bounce_keys(lane_keys, bounce, sampling.P_LAMBERT)
        )
        ball_dir = sampling.in_unit_sphere(
            sampling.bounce_keys(lane_keys, bounce, sampling.P_FUZZ)
        )
        coin = sampling.uniform(
            sampling.bounce_keys(lane_keys, bounce, sampling.P_SCHLICK)
        )
        sc = scatter(scene, rec, d, sphere_dir, ball_dir, coin)

        cont = hit_mask & sc.did_scatter
        thr = jnp.where(cont[..., None], thr * sc.attenuation, thr)
        o = vm.where(cont, rec.point, o)
        d = vm.where(cont, sc.direction, d)
        alive = cont

        # optional russian roulette (no reference counterpart)
        def roulette(args):
            thr, alive = args
            p = jnp.clip(jnp.max(thr, axis=-1), 0.05, 1.0)
            u = sampling.uniform(
                sampling.bounce_keys(lane_keys, bounce, sampling.P_ROULETTE)
            )
            survive = u < p
            thr = jnp.where(
                (alive & survive)[..., None], thr / p[..., None], thr
            )
            return thr, alive & survive

        thr, alive = jax.lax.cond(
            bounce >= rr_start, roulette, lambda args: args, (thr, alive)
        )

        return bounce + 1, o, d, thr, rad, alive, segments

    init = (
        jnp.int32(0),
        origins,
        directions,
        jnp.ones((lanes, 3), jnp.float32),
        jnp.zeros((lanes, 3), jnp.float32),
        jnp.ones((lanes,), bool),
        jnp.float32(0.0),
    )
    bounce, _, _, _, rad, _, segments = jax.lax.while_loop(cond, body, init)
    return rad, TraceStats(segments=segments, bounces=bounce)
