"""TPU ablation: where does the SphereField per-bounce time go?

Times, on 921600 rays (the 1280x720 chunk):
  1. closest_hit_projected kernel alone
  2. closest_hit_record_projected (kernel + record epilogue)
  3. a full bounce step (search+record+shade+RNG)
  4. same three at 1.05M rays on ModelTest tables (C=10240)
"""
import sys
import time

from rust_pathtracer_tpu.utils import compcache

compcache.enable()

import jax
import jax.numpy as jnp

from rust_pathtracer_tpu.models import get_scene
from rust_pathtracer_tpu.scene.obj_loader import write_benchmark_obj

print("backend:", jax.default_backend(), flush=True)


def _checksum(r):
    import jax.numpy as jnp

    leaves = [x for x in jax.tree_util.tree_leaves(r) if hasattr(x, "dtype")]
    return float(sum(jnp.sum(jnp.abs(x.astype(jnp.float32))) for x in leaves))


def timeit(tag, fn, *args):
    # timing must END in a device->host fetch (axon block_until_ready
    # is unreliable across async dispatches)
    _checksum(fn(*args))
    t0 = time.perf_counter()
    for _ in range(5):
        r = fn(*args)
    _checksum(r)
    print(f"{tag}: {(time.perf_counter()-t0)/5*1e3:.2f} ms", flush=True)


def ablate(name, kw, R):
    from rust_pathtracer_tpu.integrator import search_and_record
    from rust_pathtracer_tpu.ops.projected import (
        closest_hit_projected,
        closest_hit_record_projected,
    )

    sd = get_scene(name, **kw)
    scene = sd.build()
    cam = sd.camera_at(0.0)
    key = jax.random.PRNGKey(0)
    u = jax.random.uniform(key, (R,))
    v = jax.random.uniform(jax.random.PRNGKey(1), (R,))
    from rust_pathtracer_tpu.camera import camera_rays
    from rust_pathtracer_tpu import sampling
    lens = sampling.bounce_keys(
        sampling.lane_keys(key, jnp.arange(R, dtype=jnp.uint32)), 0,
        sampling.P_LENS,
    )
    o, d = camera_rays(cam, u, v, lens)
    o, d = jax.block_until_ready((o, d))
    print(f"--- {name}: C={scene.proj.num_cols}, R={R}", flush=True)

    k1 = jax.jit(lambda o, d: closest_hit_projected(scene.proj, o, d, 1e-3))
    timeit("kernel only", k1, o, d)
    k2 = jax.jit(lambda o, d: closest_hit_record_projected(scene, o, d, 1e-3))
    timeit("kernel+record", k2, o, d)
    alive = jnp.ones(R, bool)
    k3 = jax.jit(lambda o, d: search_and_record(scene, o, d, alive))
    timeit("search_and_record", k3, o, d)


ablate("SphereField", {}, 921600)
write_benchmark_obj("/tmp/rock.obj")
ablate("ModelTest", {"obj_path": "/tmp/rock.obj"}, 1048576)
