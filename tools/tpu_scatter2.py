"""Scatter variants for the regen flush (colliding pixel indices,
LightTest shape: 1M lanes -> 262144 pixel bins).

    python tools/tpu_scatter2.py

Follow-up to tpu_scatter.py (permutation case).  Questions: does
pre-sorting + indices_are_sorted help XLA's TPU scatter lowering?
Does compacting the update width (finished-first sort + static slice)
pay?  Timings end in a device->host fetch.
"""
import time

from rust_pathtracer_tpu.utils import compcache

compcache.enable()

import jax
import jax.numpy as jnp
import numpy as np

print("backend:", jax.default_backend(), flush=True)

R = 1 << 20
NPIX = 512 * 512

rng = np.random.default_rng(0)
rad = jnp.asarray(rng.normal(size=(R, 3)), jnp.float32)
pix_np = rng.integers(0, NPIX, size=R).astype(np.int32)
pix = jnp.asarray(pix_np)
pix_sorted = jnp.asarray(np.sort(pix_np))
acc0 = jnp.zeros((NPIX, 3), jnp.float32)


def timeit(tag, fn, *args, reps=10):
    r = fn(*args)
    _ = float(jnp.sum(r))
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
    _ = float(jnp.sum(r))
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{tag}: {dt:.2f} ms", flush=True)


timeit("scatter-add colliding 1M->262k",
       jax.jit(lambda a, p, r: a.at[p].add(r)), acc0, pix, rad)

timeit("scatter-add pre-sorted ids (flag)",
       jax.jit(lambda a, p, r: a.at[p].add(r, indices_are_sorted=True)),
       acc0, pix_sorted, rad)

def sort_then_scatter(a, p, r):
    p2, r0, r1, r2 = jax.lax.sort((p, r[:, 0], r[:, 1], r[:, 2]), num_keys=1)
    return a.at[p2].add(jnp.stack([r0, r1, r2], 1), indices_are_sorted=True)

timeit("sort-by-pix + sorted scatter", jax.jit(sort_then_scatter),
       acc0, pix, rad)

timeit("segment_sum sorted",
       jax.jit(lambda p, r: jax.ops.segment_sum(
           r, p, num_segments=NPIX, indices_are_sorted=True)),
       pix_sorted, rad)

for frac, tag in ((2, "R/2"), (4, "R/4")):
    S = R // frac
    timeit(f"scatter-add {tag} updates",
           jax.jit(lambda a, p, r: a.at[p].add(r)), acc0, pix[:S], rad[:S])
