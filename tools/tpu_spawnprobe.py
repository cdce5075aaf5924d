"""Decompose the regen flush+refill window cost on the real chip.

Times, at the LightTest pool shape (1M lanes, 262k pixels):
  spawn        — work-id -> (pixel, lane keys, camera ray) for all lanes
  spawn_rng    — just the lane_keys + jitter/lens key derivation
  scatter      — the colliding radiance scatter-add into (npix, 3)
  cumsum       — the queue-handout exclusive prefix sum
Each timed region ends in a device->host fetch; 5 reps each, min
reported.  One process per run (wedge-prone remote compile service).
"""
import json
import time

from rust_pathtracer_tpu.utils import compcache

compcache.enable()

import jax
import jax.numpy as jnp
import numpy as np

from rust_pathtracer_tpu import sampling
from rust_pathtracer_tpu.camera import camera_rays
from rust_pathtracer_tpu.models import get_scene

LANES = 1 << 20
W = H = 512
NPIX = W * H
SPP = 256

sd = get_scene("LightTest")
cam = sd.camera_at(0.0)
key = jax.random.PRNGKey(7)


@jax.jit
def spawn(work_id):
    wid = jnp.maximum(work_id, 0).astype(jnp.uint32)
    pixel = wid % np.uint32(NPIX)
    sample = wid // np.uint32(NPIX)
    counter = pixel * np.uint32(SPP) + sample
    lkeys = sampling.lane_keys(key, counter)
    jit_u = sampling.uniform2(
        sampling.bounce_keys(lkeys, 0, sampling.P_PIXEL_JITTER)
    )
    col = (pixel % np.uint32(W)).astype(jnp.float32)
    row = pixel // np.uint32(W)
    y = (H - 1 - row).astype(jnp.float32)
    u = (col + jit_u[:, 0]) / (W - 1.0)
    v = (y + jit_u[:, 1]) / (H - 1.0)
    lens = sampling.bounce_keys(lkeys, 0, sampling.P_LENS)
    o, d = camera_rays(cam, u, v, lens)
    return pixel.astype(jnp.int32), lkeys, o, d


@jax.jit
def spawn_rng(work_id):
    wid = jnp.maximum(work_id, 0).astype(jnp.uint32)
    pixel = wid % np.uint32(NPIX)
    counter = pixel * np.uint32(SPP) + wid // np.uint32(NPIX)
    lkeys = sampling.lane_keys(key, counter)
    jit_u = sampling.uniform2(
        sampling.bounce_keys(lkeys, 0, sampling.P_PIXEL_JITTER)
    )
    lens = sampling.bounce_keys(lkeys, 0, sampling.P_LENS)
    return lkeys, jit_u, lens


@jax.jit
def scatter(acc, finished, pixel, rad):
    return acc.at[jnp.where(finished, pixel, 0)].add(
        jnp.where(finished[..., None], rad, 0.0)
    )


@jax.jit
def handout(finished):
    cand = finished.astype(jnp.int32)
    slot = jnp.cumsum(cand) - cand
    return slot


def bench(name, fn, *args):
    # warm
    out = fn(*args)
    leaves = jax.tree_util.tree_leaves(out)
    _ = float(jnp.asarray(leaves[0]).ravel()[0])
    reps = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(10):
            out = fn(*args)
        leaves = jax.tree_util.tree_leaves(out)
        _ = float(jnp.asarray(leaves[0]).ravel()[0])
        reps.append((time.perf_counter() - t0) / 10)
    print(json.dumps({
        "op": name, "ms": round(min(reps) * 1e3, 2),
        "reps_ms": [round(r * 1e3, 2) for r in reps],
    }), flush=True)


print("backend:", jax.default_backend(), flush=True)
work = jnp.arange(LANES, dtype=jnp.int32)
rng = np.random.default_rng(0)
finished = jnp.asarray(rng.random(LANES) < 0.3)
pixel = jnp.asarray(rng.integers(0, NPIX, LANES, dtype=np.int32))
rad = jnp.asarray(rng.random((LANES, 3), dtype=np.float32))
acc = jnp.zeros((NPIX, 3), jnp.float32)

bench("spawn", spawn, work)
bench("spawn_rng", spawn_rng, work)
bench("scatter", scatter, acc, finished, pixel, rad)
bench("handout_cumsum", handout, finished)
