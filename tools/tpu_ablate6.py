"""Bisect the v4-in-chunk slowdown: time v4 vs v3 on the exact ray
populations the chunked trace produces (SphereField default).

    python tools/tpu_ablate6.py [SphereField|ModelTest] [v4|v3|v2]

Populations at 1M rays: coherent camera, cluster-sorted diffuse,
unsorted diffuse, all parked dead, 90%-parked sorted tail (the
post-collapse case), then trace 1/3/20 bounces with auto routing.
Timings end in a checksum fetch.  One config per process.
"""
import os
import sys
import time

from rust_pathtracer_tpu.utils import compcache

compcache.enable()

scene_name = sys.argv[1] if len(sys.argv) > 1 else "SphereField"
which = sys.argv[2] if len(sys.argv) > 2 else "v4"
# route the trace calls to the same kernel
os.environ["RPT_V6"] = "1" if which == "v6" else "0"
os.environ["RPT_V5"] = "1" if which == "v5" else "0"
os.environ["RPT_V4"] = "1" if which == "v4" else "0"
os.environ["RPT_V3"] = "1" if which == "v3" else "0"

import jax
import jax.numpy as jnp
import numpy as np

from rust_pathtracer_tpu.models import get_scene
from rust_pathtracer_tpu.scene.obj_loader import write_benchmark_obj

print(f"backend: {jax.default_backend()} scene={scene_name} kernel={which}",
      flush=True)

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


kw = {}
if scene_name == "ModelTest":
    write_benchmark_obj("/tmp/rock.obj")
    kw = {"obj_path": "/tmp/rock.obj"}
sd = get_scene(scene_name, **kw)
scene = sd.build()
cam = sd.camera_at(0.0)
print(f"C={scene.proj.num_cols} groups={len(scene.proj.group_kinds)}",
      flush=True)

from rust_pathtracer_tpu import sampling
from rust_pathtracer_tpu.camera import camera_rays
from rust_pathtracer_tpu.ops.projected import (
    closest_hit_projected,
    cluster_entry_key,
)
from rust_pathtracer_tpu.ops.resident import closest_hit_resident
from rust_pathtracer_tpu.ops.worklist import closest_hit_pairs
from rust_pathtracer_tpu.ops.queue import closest_hit_queue

key = jax.random.PRNGKey(0)
u = jax.random.uniform(key, (R,))
v = jax.random.uniform(jax.random.PRNGKey(1), (R,))
lens = sampling.bounce_keys(
    sampling.lane_keys(key, jnp.arange(R, dtype=jnp.uint32)), 0,
    sampling.P_LENS,
)
o_cam, d_cam = jax.block_until_ready(camera_rays(cam, u, v, lens))

rng = np.random.default_rng(3)
span = 12.0 if scene_name == "SphereField" else 1.5
o_dif = jnp.asarray(rng.uniform(-span, span, (R, 3)) + [0, 1, 0], jnp.float32)
d_dif = jnp.asarray(rng.normal(size=(R, 3)), jnp.float32)
o_dead = jnp.full((R, 3), 3.0e33, jnp.float32)

from rust_pathtracer_tpu.ops.topk import closest_hit_topk

impl = {
    "v6": closest_hit_topk,
    "v5": closest_hit_queue,
    "v4": closest_hit_resident,
    "v3": closest_hit_pairs,
    "v2": closest_hit_projected,
}[which]
kern = jax.jit(lambda o, d: impl(scene.proj, o, d, 1e-3))


@jax.jit
def sort_rays(o, d):
    k = cluster_entry_key(scene.proj.cluster_bounds, o, d, 1e-3)
    _, perm = jax.lax.sort((k, jnp.arange(R, dtype=jnp.int32)), num_keys=1)
    return o[perm], d[perm]


o_s, d_s = jax.block_until_ready(sort_rays(o_dif, d_dif))
# post-collapse population: 10% live sorted rays, 90% parked, live first
n_live = R // 10
o_tail = jnp.concatenate([o_s[:n_live], jnp.full((R - n_live, 3), 3.0e33)])
d_tail = jnp.concatenate([d_s[:n_live], d_s[n_live:]])

timeit("kernel coherent camera", kern, o_cam, d_cam)
timeit("kernel sorted diffuse", kern, o_s, d_s)
timeit("kernel UNsorted diffuse", kern, o_dif, d_dif)
timeit("kernel all-dead parked", kern, o_dead, d_dif)
timeit("kernel 10pct live sorted", kern, o_tail, d_tail)

from rust_pathtracer_tpu.integrator import trace

lk = sampling.lane_keys(key, jnp.arange(R, dtype=jnp.uint32))
bg = tuple(float(x) for x in sd.output.image.background)
tr1 = jax.jit(lambda o, d: trace(scene, o, d, lk, bg, 1)[0])
tr3 = jax.jit(lambda o, d: trace(scene, o, d, lk, bg, 3)[0])
tr20 = jax.jit(lambda o, d: trace(scene, o, d, lk, bg, 20)[0])
timeit("trace 1 bounce", tr1, o_cam, d_cam, reps=3)
timeit("trace 3 bounces", tr3, o_cam, d_cam, reps=3)
timeit("trace 20 bounces", tr20, o_cam, d_cam, reps=3)
print("ALL_OK", flush=True)
