"""Honest ray populations for the ModelTest kernel (tpu_ablate2 used
RANDOM-pixel camera rays — blocks saw the whole frustum, so cluster
culling could not fire).  All kernel configs reuse the ablate3-compiled
kernel (same static args), so only outer XLA jits compile here.

  1. kernel, pixel-ordered camera rays (real renderer layout)
  2. kernel, surface-outward rays sorted by cluster (bounce-1-like)
  3. same, unsorted
  4. kernel, culling DISABLED via infinite cluster boxes (true dense)
  5. full bounce step, every lane dead (shading/bookkeeping overhead)
  6. full bounce step, live pixel-ordered rays
"""
import dataclasses
import time

from rust_pathtracer_tpu.utils import compcache

compcache.enable()

import jax
import jax.numpy as jnp
import numpy as np

from rust_pathtracer_tpu.models import get_scene
from rust_pathtracer_tpu.scene.obj_loader import write_benchmark_obj

print("backend:", jax.default_backend(), flush=True)
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

from rust_pathtracer_tpu import sampling
from rust_pathtracer_tpu.camera import camera_rays
from rust_pathtracer_tpu.ops.projected import (
    closest_hit_projected,
    cluster_entry_key,
)

# 1. pixel-ordered camera rays: 512x512, 4 spp, scanline layout (the
#    renderer's actual lane order)
pix = np.arange(512 * 512, dtype=np.uint32)
col = (pix % 512).astype(np.float32)
y = (511 - pix // 512).astype(np.float32)
u = jnp.asarray(np.repeat(col, 4) / 511.0)
v = jnp.asarray(np.repeat(y, 4) / 511.0)
key = jax.random.PRNGKey(0)
lkeys = sampling.lane_keys(key, jnp.arange(R, dtype=jnp.uint32))
lens = sampling.bounce_keys(lkeys, 0, sampling.P_LENS)
o_cam, d_cam = jax.block_until_ready(camera_rays(cam, u, v, lens))

kern = jax.jit(lambda o, d: closest_hit_projected(scene.proj, o, d, 1e-3))
timeit("1 kernel pixel-ordered camera", kern, o_cam, d_cam)

# 2. surface-outward rays (bounce-1-like): origins on a rock-ish shell,
#    outward-hemisphere cosine directions, sorted by cluster key
rng = np.random.default_rng(3)
nrm = rng.normal(size=(R, 3))
nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
o_srf = np.asarray([0.0, 1.5, 0.0]) + 1.45 * nrm
d_out = nrm + rng.normal(size=(R, 3)) * 0.45  # mostly outward
o_srf = jnp.asarray(o_srf, jnp.float32)
d_out = jnp.asarray(d_out, jnp.float32)


@jax.jit
def sort_rays(o, d):
    k = cluster_entry_key(scene.proj.cluster_bounds, o, d, 1e-3)
    _, perm = jax.lax.sort((k, jnp.arange(R, dtype=jnp.int32)), num_keys=1)
    return o[perm], d[perm]


o_s, d_s = jax.block_until_ready(sort_rays(o_srf, d_out))
timeit("2 kernel surface-outward sorted", kern, o_s, d_s)
timeit("3 kernel surface-outward unsorted", kern, o_srf, d_out)

# 4. true dense: infinite cluster boxes defeat every skip
cbv = np.asarray(scene.proj.cluster_bounds_v).copy()
ngrp = scene.proj.col_block // 128
cbv[:, 0:3, :ngrp] = -3.0e30
cbv[:, 3:6, :ngrp] = 3.0e30
dense_tables = dataclasses.replace(
    scene.proj, cluster_bounds_v=jnp.asarray(cbv)
)
kern_d = jax.jit(lambda o, d: closest_hit_projected(dense_tables, o, d, 1e-3))
timeit("4 kernel DENSE (no culling)", kern_d, o_cam, d_cam)

# 5/6. full bounce step: dead vs live
from rust_pathtracer_tpu.integrator import _bounce_step


def bounce(o, d, alive_val):
    zeros3 = o * 0.0
    zs = jnp.sum(zeros3[..., 0])
    state = dict(o=o, d=d, thr=zeros3 + 1.0, rad=zeros3,
                 alive=(zeros3[..., 0] == 0.0) & alive_val, segments=zs,
                 occupancy=zs + jnp.zeros((64,), jnp.float32))
    out = _bounce_step(scene, lkeys, jnp.zeros(3), 99, state, jnp.int32(0))
    return out["rad"], out["thr"], out["alive"]


bounce_j = jax.jit(bounce, static_argnames=())
timeit("5 bounce step ALL DEAD", jax.jit(lambda o, d: bounce(o, d, False)),
       o_cam, d_cam)
timeit("6 bounce step live pixel-ordered",
       jax.jit(lambda o, d: bounce(o, d, True)), o_cam, d_cam)
print("ALL_OK", flush=True)
