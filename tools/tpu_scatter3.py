"""Scatter-add variants for the regen radiance flush (1M lanes ->
262k pixel bins, ~30% valid records), measured on the real chip.

  colliding       — plain .at[].add, dead lanes keyed to 0 with zero
                    radiance (the production flush)
  sorted          — key/value lax.sort, indices_are_sorted=True
  sorted_unique   — sort + segmented associative_scan combine, then
                    scatter ONLY segment-end rows (unique_indices=True)
  segcombine      — just the sort + associative_scan (no scatter), to
                    isolate the combine cost

Each timed region is 10 dispatches ending in a device->host fetch;
5 reps, min reported.
"""
import json
import time

from rust_pathtracer_tpu.utils import compcache

compcache.enable()

import jax
import jax.numpy as jnp
import numpy as np

LANES = 1 << 20
NPIX = 512 * 512


@jax.jit
def colliding(acc, finished, pixel, rad):
    return acc.at[jnp.where(finished, pixel, 0)].add(
        jnp.where(finished[..., None], rad, 0.0)
    )


def _sorted_records(finished, pixel, rad):
    pkey = jnp.where(finished, pixel, np.int32(NPIX))
    r = jnp.where(finished[:, None], rad, 0.0)
    return jax.lax.sort(
        (pkey, r[:, 0], r[:, 1], r[:, 2]), num_keys=1, is_stable=True
    )


@jax.jit
def sorted_scatter(acc, finished, pixel, rad):
    pk2, r0, r1, r2 = _sorted_records(finished, pixel, rad)
    upd = jnp.stack([r0, r1, r2], axis=1)
    return acc.at[pk2].add(upd, mode="drop", indices_are_sorted=True)


def _segment_combine(pk2, r0, r1, r2):
    # segmented inclusive sum: combine((k1,v1),(k2,v2)) =
    # (k2, v2 + (k1==k2)*v1) is associative; at each segment's LAST
    # row the value is the exact tree-reduced segment total
    def comb(a, b):
        ka, va = a
        kb, vb = b
        same = (ka == kb)[..., None]
        return kb, vb + jnp.where(same, va, 0.0)

    v = jnp.stack([r0, r1, r2], axis=1)
    _, vs = jax.lax.associative_scan(comb, (pk2, v))
    is_end = jnp.concatenate([pk2[1:] != pk2[:-1], jnp.array([True])])
    return vs, is_end


@jax.jit
def sorted_unique(acc, finished, pixel, rad):
    pk2, r0, r1, r2 = _sorted_records(finished, pixel, rad)
    vs, is_end = _segment_combine(pk2, r0, r1, r2)
    keys = jnp.where(is_end, pk2, np.int32(NPIX))
    upd = jnp.where(is_end[:, None], vs, 0.0)
    return acc.at[keys].add(
        upd, mode="drop", indices_are_sorted=True, unique_indices=True
    )


@jax.jit
def segcombine(finished, pixel, rad):
    pk2, r0, r1, r2 = _sorted_records(finished, pixel, rad)
    vs, is_end = _segment_combine(pk2, r0, r1, r2)
    return jnp.where(is_end[:, None], vs, 0.0)


def bench(name, fn, *args):
    out = fn(*args)
    _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    reps = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(10):
            out = fn(*args)
        _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        reps.append((time.perf_counter() - t0) / 10)
    print(json.dumps({
        "op": name, "ms": round(min(reps) * 1e3, 2),
        "reps_ms": [round(r * 1e3, 2) for r in reps],
    }), flush=True)


print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)
finished = jnp.asarray(rng.random(LANES) < 0.3)
pixel = jnp.asarray(rng.integers(0, NPIX, LANES, dtype=np.int32))
rad = jnp.asarray(rng.random((LANES, 3), dtype=np.float32))
acc = jnp.zeros((NPIX, 3), jnp.float32)

# correctness cross-check before timing
a = np.asarray(colliding(acc, finished, pixel, rad))
b = np.asarray(sorted_unique(acc, finished, pixel, rad))
print("unique-vs-colliding max |diff|:", float(np.abs(a - b).max()),
      flush=True)

bench("colliding", colliding, acc, finished, pixel, rad)
bench("sorted_scatter", sorted_scatter, acc, finished, pixel, rad)
bench("sorted_unique", sorted_unique, acc, finished, pixel, rad)
bench("segcombine", segcombine, finished, pixel, rad)
