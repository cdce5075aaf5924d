"""Microbench: XLA scatter vs sort-based alternatives at wavefront
scale (the cascade/reorder flush patterns).

    python tools/tpu_scatter.py

Hypothesis from the SphereField cascade decomposition (sfdec_* logs):
the ~130 ms boundary glue and ~100 ms of the camera-bounce stage are
the 1M-lane acc.at[pix].add / zeros.at[lane].set scatters.  Timings
end in a device->host fetch.
"""
import time

from rust_pathtracer_tpu.utils import compcache

compcache.enable()

import jax
import jax.numpy as jnp
import numpy as np

print("backend:", jax.default_backend(), flush=True)

R = 921600          # SphereField 1280x720 @ 1 spp chunk
NPIX = 921600

rng = np.random.default_rng(0)
rad = jnp.asarray(rng.normal(size=(R, 3)), jnp.float32)
perm_np = rng.permutation(R).astype(np.int32)
lane = jnp.asarray(perm_np)          # unique permutation indices
pix = jnp.asarray(perm_np)           # spp=1: pixel ids = permuted arange
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


# a) scatter-ADD into the pixel accumulator (cascade flush today)
timeit("scatter-add  acc.at[pix].add(rad)",
       jax.jit(lambda a, p, r: a.at[p].add(r)), acc0, pix, rad)

# b) scatter-SET unscramble (reorder path's final unscatter today)
timeit("scatter-set  zeros.at[lane].set(rad)",
       jax.jit(lambda l, r: jnp.zeros_like(r).at[l].set(r)), lane, rad)

# c) 4-operand key/value sort by lane (proposed unscramble)
def sort_unscramble(l, r):
    _, r0, r1, r2 = jax.lax.sort(
        (l, r[:, 0], r[:, 1], r[:, 2]), num_keys=1
    )
    return jnp.stack([r0, r1, r2], axis=1)

timeit("sort-by-lane unscramble", jax.jit(sort_unscramble), lane, rad)

# d) dense masked reshape-sum (proposed stage-1 flush, spawn order)
mask = jnp.asarray(rng.random(R) < 0.3)
timeit("dense where+reshape-sum",
       jax.jit(lambda m, r: jnp.where(m[:, None], 0.0, r)
               .reshape(NPIX, 1, 3).sum(axis=1)), mask, rad)

# e) small scatter-add (the compacted tail, R/8)
S = R // 8
timeit("scatter-add tail R/8",
       jax.jit(lambda a, p, r: a.at[p].add(r)), acc0, pix[:S], rad[:S])
