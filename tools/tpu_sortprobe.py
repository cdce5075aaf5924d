"""Cost of ray reordering primitives on TPU: argsort + permutation
gathers at 1M lanes (decides whether sorted-ray cluster culling pays)."""
import time
from rust_pathtracer_tpu.utils import compcache
compcache.enable()
import jax, jax.numpy as jnp, numpy as np

print("backend:", jax.default_backend(), flush=True)
R = 1 << 20
key = jax.random.PRNGKey(0)
k32 = jax.random.randint(key, (R,), 0, 1 << 20, jnp.int32)
x1 = jax.random.uniform(key, (R,))
x3 = jax.random.uniform(key, (R, 3))
x32 = jax.random.uniform(key, (R, 32))
perm = jax.random.permutation(key, R)


def timeit(tag, fn, *a):
    r = fn(*a)
    _ = float(jnp.sum(r[0] if isinstance(r, tuple) else r).astype(jnp.float32))
    t0 = time.perf_counter()
    for _i in range(5):
        r = fn(*a)
    _ = float(jnp.sum(r[0] if isinstance(r, tuple) else r).astype(jnp.float32))
    print(f"{tag}: {(time.perf_counter()-t0)/5*1e3:.2f} ms", flush=True)


# NOTE: plain jnp.argsort on 1M WEDGED the remote compile service in
# round 1 (>17 min) — lead with lax.sort key/value pairs (the form the
# binning pipeline actually needs) and skip raw argsort entirely.
timeit("sort+arange (perm via sort pair)", jax.jit(
    lambda k: jax.lax.sort((k, jnp.arange(R, dtype=jnp.int32)), num_keys=1)[1]
), k32)
# small-key variant: cluster ids are 7-bit — is the sort cheaper?
k7 = k32 % 128
timeit("sort+arange 7-bit keys", jax.jit(
    lambda k: jax.lax.sort((k, jnp.arange(R, dtype=jnp.int32)), num_keys=1)[1]
), k7)
timeit("gather (1M,) by perm", jax.jit(lambda x, p: x[p]), x1, perm)
timeit("gather (1M,3) by perm", jax.jit(lambda x, p: x[p]), x3, perm)
timeit("gather (1M,8) by perm", jax.jit(lambda x, p: x[p]),
       jax.random.uniform(key, (R, 8)), perm)
timeit("gather (1M,32) by perm", jax.jit(lambda x, p: x[p]), x32, perm)
# scatter-back alternative for the inverse mapping
timeit("scatter (1M,32) to perm rows", jax.jit(
    lambda x, p: jnp.zeros_like(x).at[p].set(x)
), x32, perm)
# slab-test keying cost: rays vs 128 cluster AABBs -> argmin entry t
cb = jax.random.uniform(key, (6, 128))
def keying(o, d, cb):
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-30, 1e-30, d)
    lo = jnp.full((R, 128), 1e-3)
    hi = jnp.full((R, 128), 1e30)
    for ax in range(3):
        b0 = (cb[ax][None, :] - o[:, ax:ax+1]) * inv[:, ax:ax+1]
        b1 = (cb[3+ax][None, :] - o[:, ax:ax+1]) * inv[:, ax:ax+1]
        lo = jnp.maximum(lo, jnp.minimum(b0, b1))
        hi = jnp.minimum(hi, jnp.maximum(b0, b1))
    ok = hi >= lo
    ent = jnp.where(ok, lo, 1e30)
    return jnp.argmin(ent, axis=1).astype(jnp.int32)
timeit("slab-key rays vs 128 AABBs", jax.jit(keying), x3, x3 + 1.0, cb)
print("ALL_OK", flush=True)
