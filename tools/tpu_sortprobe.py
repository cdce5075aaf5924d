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


timeit("argsort 1M i32", jax.jit(jnp.argsort), k32)
timeit("sort+arange (perm via sort pair)", jax.jit(
    lambda k: jax.lax.sort((k, jnp.arange(R, dtype=jnp.int32)), num_keys=1)[1]
), k32)
timeit("gather (1M,) by perm", jax.jit(lambda x, p: x[p]), x1, perm)
timeit("gather (1M,3) by perm", jax.jit(lambda x, p: x[p]), x3, perm)
timeit("gather (1M,32) by perm", jax.jit(lambda x, p: x[p]), x32, perm)
# scatter-back alternative for the inverse mapping
timeit("scatter (1M,32) to perm rows", jax.jit(
    lambda x, p: jnp.zeros_like(x).at[p].set(x)
), x32, perm)
