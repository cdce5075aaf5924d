"""How to APPLY a 1M-lane permutation cheaply on TPU.

tools/tpu_passsort.py isolated the cascade boundary cost: keys+sort
~31 ms, but the seven per-array state gathers (o/d/thr/rad (R,3) f32,
alive bool, lane i32, lk (R,2) u32) add ~113 ms — XLA lowers x[perm]
row gathers at 1M rows catastrophically off bandwidth (128 MB moved,
~500x off).  Variants, each its own jit + fetch:

  1. separate      — the current seven x[perm] gathers
  2. packed        — pack state into one (R,16) f32, one row gather,
                     unpack (bitcast u32<->f32 for the int fields)
  3. sort-carry    — ONE lax.sort carrying all 16 payload words as
                     extra operands (data rides the sort network; no
                     gather at all)
  4. take-hints    — jnp.take(unique_indices=True,
                     mode="promise_in_bounds") per array

5 reps each, min reported.  One process per run.
"""
import json
import time

from rust_pathtracer_tpu.utils import compcache

compcache.enable()

import jax
import jax.numpy as jnp
import numpy as np

R = 1 << 20
rng = np.random.default_rng(0)
o = jnp.asarray(rng.normal(0, 1, (R, 3)), jnp.float32)
d = jnp.asarray(rng.normal(0, 1, (R, 3)), jnp.float32)
thr = jnp.asarray(rng.uniform(0, 1, (R, 3)), jnp.float32)
rad = jnp.asarray(rng.uniform(0, 1, (R, 3)), jnp.float32)
alive = jnp.asarray(rng.uniform(0, 1, (R,)) < 0.6)
lane = jnp.arange(R, dtype=jnp.int32)
lk = jnp.stack([jnp.arange(R, dtype=jnp.uint32)] * 2, axis=1)
# a realistic sort key: random u32 words + iota tiebreak
w0 = jnp.asarray(rng.integers(0, 2 ** 32, R, dtype=np.uint32))
print("backend:", jax.default_backend(), flush=True)


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
    return out


def _perm(w0):
    iota = jnp.arange(R, dtype=jnp.int32)
    return jax.lax.sort((w0, iota), num_keys=1)[-1]


@jax.jit
def separate(w0, o, d, thr, rad, alive, lane, lk):
    p = _perm(w0)
    return (o[p], d[p], thr[p], rad[p], alive[p], lane[p], lk[p])


@jax.jit
def packed(w0, o, d, thr, rad, alive, lane, lk):
    p = _perm(w0)
    X = jnp.concatenate(
        [o, d, thr, rad,
         alive.astype(jnp.float32)[:, None],
         jax.lax.bitcast_convert_type(lane, jnp.float32)[:, None],
         jax.lax.bitcast_convert_type(lk, jnp.float32)],
        axis=1,
    )  # (R, 16)
    Y = X[p]
    return (Y[:, 0:3], Y[:, 3:6], Y[:, 6:9], Y[:, 9:12],
            Y[:, 12] > 0.5,
            jax.lax.bitcast_convert_type(Y[:, 13], jnp.int32),
            jax.lax.bitcast_convert_type(Y[:, 14:16], jnp.uint32))


@jax.jit
def sortcarry(w0, o, d, thr, rad, alive, lane, lk):
    iota = jnp.arange(R, dtype=jnp.int32)
    ops = (w0, iota,
           o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
           thr[:, 0], thr[:, 1], thr[:, 2],
           rad[:, 0], rad[:, 1], rad[:, 2],
           alive, lane, lk[:, 0], lk[:, 1])
    out = jax.lax.sort(ops, num_keys=1)
    (o0, o1, o2, d0, d1, d2, t0, t1, t2, r0, r1, r2,
     al, ln, k0, k1) = out[2:]
    return (jnp.stack([o0, o1, o2], 1), jnp.stack([d0, d1, d2], 1),
            jnp.stack([t0, t1, t2], 1), jnp.stack([r0, r1, r2], 1),
            al, ln, jnp.stack([k0, k1], 1))


@jax.jit
def takehints(w0, o, d, thr, rad, alive, lane, lk):
    p = _perm(w0)

    def tk(x):
        return jnp.take(x, p, axis=0, unique_indices=True,
                        indices_are_sorted=False,
                        mode="promise_in_bounds")

    return (tk(o), tk(d), tk(thr), tk(rad), tk(alive), tk(lane), tk(lk))


ref = timed("separate gathers (current)", separate,
            w0, o, d, thr, rad, alive, lane, lk)
got_p = timed("packed (R,16) single gather", packed,
              w0, o, d, thr, rad, alive, lane, lk)
got_s = timed("sort-carry 16 payload words", sortcarry,
              w0, o, d, thr, rad, alive, lane, lk)
got_t = timed("take with hints", takehints,
              w0, o, d, thr, rad, alive, lane, lk)

for name, got in (("packed", got_p), ("sortcarry", got_s),
                  ("takehints", got_t)):
    ok = all(
        np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(ref, got)
    )
    print(name, "exact:", ok, flush=True)
print("ALL_OK", flush=True)
