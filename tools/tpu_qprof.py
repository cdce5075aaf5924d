"""Stage profile of the v5 pair-queue path + scatter/sort throughput.

    python tools/tpu_qprof.py [ModelTest|SphereField]

Times, at 1M rays: queue build alone, ray gather alone, sweep kernel
alone, full closest_hit_queue; then primitive costs: scalar scatter at
80M/4M updates, lax.sort at 4M pairs, scatter-min at 4M.  One config
per process; timings end in a checksum fetch.
"""
import sys
import time

from rust_pathtracer_tpu.utils import compcache

compcache.enable()

import jax
import jax.numpy as jnp
import numpy as np

from rust_pathtracer_tpu.models import get_scene
from rust_pathtracer_tpu.scene.obj_loader import write_benchmark_obj

name = sys.argv[1] if len(sys.argv) > 1 else "ModelTest"
print("backend:", jax.default_backend(), name, flush=True)

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
if name == "ModelTest":
    write_benchmark_obj("/tmp/rock.obj")
    kw = {"obj_path": "/tmp/rock.obj"}
sd = get_scene(name, **kw)
scene = sd.build()
tab = scene.proj
G = tab.cluster_bounds.shape[1]

from rust_pathtracer_tpu import sampling
from rust_pathtracer_tpu.camera import camera_rays
from rust_pathtracer_tpu.ops.projected import _pad_up, _ray_matrix
from rust_pathtracer_tpu.ops.queue import (
    Q_BLOCK_ROWS,
    Q_CAP_PER_RAY,
    _sweep_queue,
    build_cluster_queue,
    closest_hit_queue,
)

cam = sd.camera_at(0.0)
key = jax.random.PRNGKey(0)
u = jax.random.uniform(key, (R,))
v = jax.random.uniform(jax.random.PRNGKey(1), (R,))
lens = sampling.bounce_keys(
    sampling.lane_keys(key, jnp.arange(R, dtype=jnp.uint32)), 0,
    sampling.P_LENS,
)
o, d = jax.block_until_ready(camera_rays(cam, u, v, lens))

qb = Q_BLOCK_ROWS * 128
qcap = _pad_up(Q_CAP_PER_RAY * R + G * qb, qb)
print(f"C={tab.num_cols} G={G} qcap={qcap}", flush=True)

build = jax.jit(lambda o, d: build_cluster_queue(
    tab.cluster_bounds, tab.group_kinds, o, d, 1e-3, qb, qcap))
timeit("1 queue build", build, o, d)

ray_ids, blk_cl, blk_kind, ovf = jax.block_until_ready(build(o, d))
print("   overflow:", bool(ovf), flush=True)

rays_all = jnp.concatenate(
    [_ray_matrix(o, d), jnp.full((1, 8), 3.0e33, jnp.float32)])
rid = jnp.where(ray_ids >= 0, ray_ids, np.int32(R))
gath = jax.jit(lambda rid: rays_all[rid])
timeit("2 ray gather (qcap,8)", gath, rid)

rays_q = jax.block_until_ready(gath(rid))
distinct = tuple(sorted(set(k for k in tab.group_kinds if k != -1)))
sweep = jax.jit(lambda rq: _sweep_queue(
    rq, tab.a, tab.b, tab.const, tab.payload.T, blk_cl, blk_kind,
    distinct_kinds=distinct, t_min=1e-3, qb=qb, interpret=False))
timeit("3 sweep kernel", sweep, rays_q)

full = jax.jit(lambda o, d: closest_hit_queue(tab, o, d, 1e-3))
timeit("4 full closest_hit_queue", full, o, d)

# primitive costs
upd80 = jnp.arange(G * R, dtype=jnp.int32) % np.int32(qcap)
vals80 = jnp.ones((G * R,), jnp.int32)
sc80 = jax.jit(lambda u, vv: jnp.zeros((qcap,), jnp.int32).at[u].set(vv, mode="drop"))
timeit(f"5 scalar scatter {G}M updates", sc80, upd80, vals80, reps=3)

upd4 = upd80[: 4 * R]
vals4 = vals80[: 4 * R]
timeit("6 scalar scatter 4M updates", sc80, upd4, vals4, reps=3)

keys4 = jax.random.randint(key, (4 * R,), 0, G).astype(jnp.int32)
pay4 = jnp.arange(4 * R, dtype=jnp.int32)
srt = jax.jit(lambda k, p: jax.lax.sort((k, p), num_keys=1))
timeit("7 lax.sort 4M pairs", srt, keys4, pay4)

t4 = jax.random.uniform(key, (4 * R,))
rid4 = jax.random.randint(key, (4 * R,), 0, R).astype(jnp.int32)
smin = jax.jit(lambda t, r: jnp.full((R + 1,), 1e30, jnp.float32).at[r].min(t))
timeit("8 scatter-min 4M -> 1M", smin, t4, rid4)

cum = jax.jit(lambda x: jnp.cumsum(x.reshape(-1).astype(jnp.int32)))
pm = jax.random.bernoulli(key, 0.03, (G, R))
timeit(f"9 cumsum {G}M", cum, pm, reps=3)
print("ALL_OK", flush=True)
