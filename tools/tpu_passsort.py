"""Decompose the pass-set sort boundary cost at 1M ModelTest lanes.

The mtdecomp probe measured the whole boundary (keys + 4-key sort +
state gathers) at ~124 ms standalone — suspicious next to the 5.3 ms
1M key/value lax.sort from tools/tpu_scatter.py.  Times, each in its
own jit ending in a device->host fetch:

  1. keys only        — passset_sort_keys (slab test + bit-pack)
  2. keys+sort (perm) — plus the (dead,words...,iota) lax.sort
  3. iota sort only   — 2-key control: sort (word0, iota) alone
  4. full boundary    — perm + gathers of o/d/thr/rad/alive/lane/lk

One process per run; 5 reps each, min reported.
"""
import json
import time

from rust_pathtracer_tpu.utils import compcache

compcache.enable()

import jax
import jax.numpy as jnp
import numpy as np

from rust_pathtracer_tpu.models import get_scene
from rust_pathtracer_tpu.ops.projected import passset_sort_keys
from rust_pathtracer_tpu.scene.obj_loader import write_benchmark_obj

objp = "/tmp/passsort.obj"
write_benchmark_obj(objp)
sd = get_scene("ModelTest", obj_path=objp)
scene = sd.build()
print(f"backend={jax.default_backend()} cols={scene.proj.num_cols}",
      flush=True)

R = 1 << 20
rng = np.random.default_rng(0)
o = jnp.asarray(rng.uniform(-3, 3, (R, 3)), jnp.float32)
d = jnp.asarray(rng.normal(0, 1, (R, 3)), jnp.float32)
thr = jnp.ones((R, 3), jnp.float32)
rad = jnp.zeros((R, 3), jnp.float32)
alive = jnp.asarray(rng.uniform(0, 1, (R,)) < 0.6)
lane = jnp.arange(R, dtype=jnp.int32)
lk = jnp.stack([jnp.arange(R, dtype=jnp.uint32)] * 2, axis=1)


def timed(label, f, *args):
    out = f(*args)
    s = float(jax.tree_util.tree_leaves(out)[0].sum())
    reps = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = f(*args)
        s = float(jax.tree_util.tree_leaves(out)[0].sum())
        reps.append((time.perf_counter() - t0) * 1e3)
    print(json.dumps({"op": label, "ms": round(min(reps), 2),
                      "reps_ms": [round(r, 2) for r in reps]}), flush=True)


@jax.jit
def keys_only(o, d, alive):
    ks = passset_sort_keys(scene.proj, o, d, alive)
    return sum(k.astype(jnp.uint32).sum() for k in ks)


@jax.jit
def keys_sort(o, d, alive):
    ks = passset_sort_keys(scene.proj, o, d, alive)
    iota = jnp.arange(R, dtype=jnp.int32)
    perm = jax.lax.sort(ks + (iota,), num_keys=len(ks) + 1)[-1]
    return perm.sum()


@jax.jit
def iota_sort(o, d, alive):
    ks = passset_sort_keys(scene.proj, o, d, alive)
    iota = jnp.arange(R, dtype=jnp.int32)
    perm = jax.lax.sort((ks[1], iota), num_keys=2)[-1]
    return perm.sum()


@jax.jit
def full(o, d, thr, rad, alive, lane, lk):
    ks = passset_sort_keys(scene.proj, o, d, alive)
    iota = jnp.arange(R, dtype=jnp.int32)
    perm = jax.lax.sort(ks + (iota,), num_keys=len(ks) + 1)[-1]
    return (o[perm], d[perm], thr[perm], rad[perm], alive[perm],
            lane[perm], lk[perm])


timed("keys only", keys_only, o, d, alive)
timed("1-word sort (control)", iota_sort, o, d, alive)
timed("keys + 4-key sort", keys_sort, o, d, alive)
timed("full boundary (sort + 7 gathers)", full, o, d, thr, rad, alive,
      lane, lk)
print("ALL_OK", flush=True)
