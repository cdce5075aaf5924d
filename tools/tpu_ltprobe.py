"""LightTest regen bounce decomposition at 1M lanes (the window is
~65 ms = 2 bounces + flush/refill; which piece is the bounce cost?).

LightTest is 5 primitives (v1 fused kernel — the search is trivial)
but both spheres shade through the 7-octave perlin marble, and the
regen pool folds RNG per-lane (depth varies across lanes).  Times:

  1. v1 fused search+record
  2. shading (inputs + emitted + scatter; perlin marble inside)
  3. perlin marble alone at 1M points
  4. RNG draws, per-lane depth fold (regen variant)
  5. fused 1+2+4 (the synthetic bounce body)

Each timed region ends in a device->host fetch; 5 reps, min reported.
One process per run (wedge-prone remote compile service).
"""
import json
import time

from rust_pathtracer_tpu.utils import compcache

compcache.enable()

import jax
import jax.numpy as jnp

from rust_pathtracer_tpu import perlin, sampling
from rust_pathtracer_tpu.camera import camera_rays
from rust_pathtracer_tpu.integrator import search_and_record
from rust_pathtracer_tpu.materials import emitted, scatter, shade_inputs
from rust_pathtracer_tpu.models import get_scene

print("backend:", jax.default_backend(), flush=True)

R = 1 << 20


def _checksum(r):
    leaves = [x for x in jax.tree_util.tree_leaves(r) if hasattr(x, "dtype")]
    return float(sum(jnp.sum(jnp.abs(x.astype(jnp.float32))) for x in leaves))


def timeit(tag, fn, *args, reps=5, inner=10):
    """min over ``reps`` of (``inner`` async dispatches + ONE fetch)/inner.

    A per-dispatch fetch would add the ~25-30 ms tunnel round-trip to
    every number (the first version of this tool did, inflating a
    ~10 ms op to ~39 ms); queueing ``inner`` dispatches and ending the
    timed region with a single checksum fetch amortizes it to ~3 ms.
    """
    _checksum(fn(*args))
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            r = fn(*args)
        _checksum(r)
        dt = (time.perf_counter() - t0) / inner
        best = dt if best is None else min(best, dt)
    print(json.dumps({"op": tag, "ms": round(best * 1e3, 2)}), flush=True)


sd = get_scene("LightTest")
scene = sd.build()
cam = sd.camera_at(0.0)

key = jax.random.PRNGKey(0)
u = jax.random.uniform(key, (R,))
v = jax.random.uniform(jax.random.PRNGKey(1), (R,))
lkeys = sampling.lane_keys(key, jnp.arange(R, dtype=jnp.uint32))
lens = sampling.bounce_keys(lkeys, 0, sampling.P_LENS)
o, d = jax.block_until_ready(camera_rays(cam, u, v, lens))
alive = jnp.ones(R, bool)
depth = (jnp.arange(R, dtype=jnp.int32) % 7)  # per-lane depths, regen-like

sr = jax.jit(lambda o, d: search_and_record(scene, o, d, alive))
timeit("1 search+record (v1)", sr, o, d)

_, rec0, row0, _ = jax.block_until_ready(sr(o, d))


def shade(o, d, rec, row):
    si = shade_inputs(scene, rec, row)
    em = emitted(scene, rec, si)
    zero = jnp.zeros((R, 3), jnp.float32)
    sc = scatter(scene, rec, d, zero + 1.0, zero, jnp.zeros(R), si)
    return em, sc


timeit("2 shading (perlin marble inside)", jax.jit(shade), o, d, rec0, row0)

pm = jax.jit(lambda p: perlin.marble(p, scene.textures.perlin_seed, 4.0))
pts = jax.block_until_ready(rec0.point)
timeit("3 perlin marble alone", pm, pts)


def draws(lkeys, depth):
    s = sampling.on_unit_sphere(
        sampling.bounce_keys(lkeys, depth, sampling.P_LAMBERT))
    ball = sampling.in_unit_sphere(
        sampling.bounce_keys(lkeys, depth, sampling.P_FUZZ))
    coin = sampling.uniform(
        sampling.bounce_keys(lkeys, depth, sampling.P_SCHLICK))
    return s, ball, coin


timeit("4 RNG draws (per-lane depth)", jax.jit(draws), lkeys, depth)


def bounce_body(o, d, lkeys, depth):
    hit, rec, row, _cl = search_and_record(scene, o, d, alive)
    si = shade_inputs(scene, rec, row)
    em = emitted(scene, rec, si)
    s, ball, coin = draws(lkeys, depth)
    sc = scatter(scene, rec, d, s, ball, coin, si)
    return em, sc.attenuation, sc.direction, hit


timeit("5 fused bounce body", jax.jit(bounce_body), o, d, lkeys, depth)
print("ALL_OK", flush=True)
