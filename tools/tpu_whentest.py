"""Does pl.when actually skip work on TPU? Time the projected kernel
with (a) normal cluster bounds, (b) all-unhittable bounds."""
import time
import dataclasses
from rust_pathtracer_tpu.utils import compcache
compcache.enable()
import jax, jax.numpy as jnp, numpy as np
from rust_pathtracer_tpu.models import get_scene
from rust_pathtracer_tpu.ops.projected import closest_hit_projected
print("backend:", jax.default_backend(), flush=True)

sd = get_scene("SphereField"); scene = sd.build()
tab = scene.proj
R = 921600
rng = np.random.default_rng(0)
o = jnp.asarray(rng.uniform(-10, 10, (R, 3)), jnp.float32)
d = jnp.asarray(rng.normal(size=(R, 3)), jnp.float32)

def timeit(tag, tables):
    fn = jax.jit(lambda o, d: closest_hit_projected(tables, o, d, 1e-3))
    r = fn(o, d); s0 = float(r[1].sum())
    t0 = time.perf_counter()
    for _ in range(5):
        r = fn(o, d)
    s = float(r[1].sum())
    print(f"{tag}: {(time.perf_counter()-t0)/5*1e3:.2f} ms (chk {s:.3g})", flush=True)

timeit("normal bounds", tab)
# unhittable: a box at x in [1e9, 1e9+1] far outside every ray's reach
cb = np.asarray(tab.cluster_bounds).copy()
cb[0, :] = 1e9; cb[3, :] = 1e9 + 1.0
cb[1, :] = 1e9; cb[4, :] = 1e9 + 1.0
cb[2, :] = 1e9; cb[5, :] = 1e9 + 1.0
tab2 = dataclasses.replace(tab, cluster_bounds=jnp.asarray(cb, jnp.float32))
timeit("unhittable bounds", tab2)
