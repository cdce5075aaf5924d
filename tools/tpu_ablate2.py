"""Where do ModelTest bounce milliseconds go with the single-p-block
kernel + reordering?  Times, at 1M rays on the real chip:

  1. kernel, coherent camera rays (bounce-0 case)
  2. kernel, cluster-sorted diffuse-ish rays (bounce-N best case)
  3. kernel, UNsorted random rays (bounce-N worst case)
  4. kernel, all lanes parked dead (post-occupancy-collapse case)
  5. the reorder op alone (key + sort + state gather)
  6. search_and_record (kernel + record + routing)
  7. one full bounce step cost via a 2-bounce vs 1-bounce trace delta

Usage: python tools/tpu_ablate2.py [block_rows]
"""
import os
import sys
import time

from rust_pathtracer_tpu.utils import compcache

compcache.enable()
if len(sys.argv) > 1:
    os.environ["RPT_BLOCK_ROWS"] = sys.argv[1]

import jax
import jax.numpy as jnp
import numpy as np

from rust_pathtracer_tpu.models import get_scene
from rust_pathtracer_tpu.scene.obj_loader import write_benchmark_obj

print("backend:", jax.default_backend(), "block_rows:",
      os.environ.get("RPT_BLOCK_ROWS", "default"), flush=True)

R = 1 << 20


def _checksum(r):
    leaves = [x for x in jax.tree_util.tree_leaves(r) if hasattr(x, "dtype")]
    return float(sum(jnp.sum(jnp.abs(x.astype(jnp.float32))) for x in leaves))


def timeit(tag, fn, *args, reps=5):
    _checksum(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
    _checksum(r)
    print(f"{tag}: {(time.perf_counter()-t0)/reps*1e3:.2f} ms", flush=True)


write_benchmark_obj("/tmp/rock.obj")
sd = get_scene("ModelTest", obj_path="/tmp/rock.obj")
scene = sd.build()
cam = sd.camera_at(0.0)
print(f"C={scene.proj.num_cols} col_block={scene.proj.col_block} "
      f"groups={len(scene.proj.group_kinds)}", flush=True)

from rust_pathtracer_tpu import sampling
from rust_pathtracer_tpu.camera import camera_rays
from rust_pathtracer_tpu.integrator import search_and_record
from rust_pathtracer_tpu.ops.projected import (
    closest_hit_projected,
    cluster_entry_key,
)

key = jax.random.PRNGKey(0)
u = jax.random.uniform(key, (R,))
v = jax.random.uniform(jax.random.PRNGKey(1), (R,))
lens = sampling.bounce_keys(
    sampling.lane_keys(key, jnp.arange(R, dtype=jnp.uint32)), 0,
    sampling.P_LENS,
)
o_cam, d_cam = jax.block_until_ready(camera_rays(cam, u, v, lens))

# diffuse-ish rays: origins on the rock-ish region, random directions
rng = np.random.default_rng(3)
o_dif = jnp.asarray(rng.uniform(-1.5, 1.5, (R, 3)) + [0, 1.5, 0], jnp.float32)
d_dif = jnp.asarray(rng.normal(size=(R, 3)), jnp.float32)
o_dead = jnp.full((R, 3), 3.0e33, jnp.float32)

kern = jax.jit(lambda o, d: closest_hit_projected(scene.proj, o, d, 1e-3))
timeit("kernel coherent camera rays", kern, o_cam, d_cam)

# sorted diffuse rays (what the reorderer feeds the kernel)
@jax.jit
def sort_rays(o, d):
    k = cluster_entry_key(scene.proj.cluster_bounds, o, d, 1e-3)
    _, perm = jax.lax.sort((k, jnp.arange(R, dtype=jnp.int32)), num_keys=1)
    return o[perm], d[perm]

o_s, d_s = jax.block_until_ready(sort_rays(o_dif, d_dif))
timeit("kernel sorted diffuse rays", kern, o_s, d_s)
timeit("kernel UNsorted diffuse rays", kern, o_dif, d_dif)
timeit("kernel all-dead (parked)", kern, o_dead, d_dif)

timeit("reorder op (key+sort+2 gathers)", sort_rays, o_dif, d_dif)

alive = jnp.ones(R, bool)
sr = jax.jit(lambda o, d: search_and_record(scene, o, d, alive))
timeit("search_and_record coherent", sr, o_cam, d_cam)
timeit("search_and_record sorted", sr, o_s, d_s)

# full trace: 1 vs 3 bounce difference isolates the steady-state bounce
from rust_pathtracer_tpu.integrator import trace

lk = sampling.lane_keys(key, jnp.arange(R, dtype=jnp.uint32))
tr1 = jax.jit(lambda o, d: trace(scene, o, d, lk, (1.0, 1.0, 1.0), 1)[0])
tr3 = jax.jit(lambda o, d: trace(scene, o, d, lk, (1.0, 1.0, 1.0), 3)[0])
tr20 = jax.jit(lambda o, d: trace(scene, o, d, lk, (1.0, 1.0, 1.0), 20)[0])
timeit("trace 1 bounce", tr1, o_cam, d_cam, reps=3)
timeit("trace 3 bounces", tr3, o_cam, d_cam, reps=3)
timeit("trace 20 bounces", tr20, o_cam, d_cam, reps=3)
print("ALL_OK", flush=True)
