"""Decompose the ModelTest cascaded chunk (0.427 s at schedule
"1:1,2:8,3:16,4:32,5:256") into its stage costs on the real chip.

Times, each in its own jit ending in a device->host fetch, on REAL
chunk lanes (512x512 x 4 spp = 1,048,576 pixel-coherent camera rays,
same lane keys as the bench chunk):

  1. b0 sweep        — v4 resident closest-hit on the camera rays
  2. b0 bounce       — one full bounce step (sweep + shade + RNG)
  3. passset sort    — keys + lax.sort + state gather at 1M (the 1:1
                       boundary's glue)
  4. b1 sweep raw    — v4 on the post-b0 wavefront, camera order
  5. b1 sweep sorted — v4 on the same wavefront after passset sort
  6. b1 bounce sorted— one full bounce step on the sorted wavefront

Sum check: chunk ~= (2) + (3) + (6) + compacted tail (131k wide and
below).  One process per run (wedge-prone remote compile service);
5 reps each, min reported.
"""
import json
import time

from rust_pathtracer_tpu.utils import compcache

compcache.enable()

import jax
import jax.numpy as jnp
import numpy as np

from rust_pathtracer_tpu.models import get_scene
from rust_pathtracer_tpu.integrator import trace_resume
from rust_pathtracer_tpu.ops.projected import passset_sort_keys
from rust_pathtracer_tpu.ops.resident import closest_hit_resident
from rust_pathtracer_tpu.render import RenderSettings, _make_lanes
from rust_pathtracer_tpu.scene.obj_loader import write_benchmark_obj

W = H = 512
SPP = 4
objp = "/tmp/mtdecomp.obj"
write_benchmark_obj(objp)
sd = get_scene("ModelTest", obj_path=objp)
scene = sd.build()
cam = sd.camera_at(0.0)
bg = jnp.asarray(sd.output.image.background, jnp.float32)
print(f"backend={jax.default_backend()} cols={scene.proj.num_cols}",
      flush=True)

pix = jnp.arange(W * H, dtype=jnp.uint32)
base_key = jax.random.PRNGKey(0)


@jax.jit
def lanes():
    return _make_lanes(cam, base_key, pix, 0, width=W, height=H,
                       spp_chunk=SPP, spp_total=256)


lk, o0, d0, _ = jax.block_until_ready(lanes())
R = o0.shape[0]
alive0 = jnp.ones((R,), bool)
print(f"lanes R={R}", flush=True)


def timed(label, f, *args):
    out = f(*args)
    s = float(jax.tree_util.tree_leaves(out)[0].sum())  # real sync
    reps = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = f(*args)
        s = float(jax.tree_util.tree_leaves(out)[0].sum())
        reps.append((time.perf_counter() - t0) * 1e3)
    print(json.dumps({"op": label, "ms": round(min(reps), 2),
                      "reps_ms": [round(r, 2) for r in reps]}), flush=True)
    return out


# 1. b0 sweep
sweep = jax.jit(lambda o, d: closest_hit_resident(scene.proj, o, d, 1e-3)[1])
timed("b0 sweep (v4, camera order)", sweep, o0, d0)


# 2. b0 bounce (full step: sweep + shade + RNG), via trace_resume 0->1
@jax.jit
def bounce0(o, d, alive):
    thr = jnp.ones((R, 3), jnp.float32)
    rad = jnp.zeros((R, 3), jnp.float32)
    st, _ = trace_resume(scene, o, d, thr, rad, alive, lk, bg, 0, 1,
                         russian_roulette_start=4)
    return st["rad"].sum() + st["thr"].sum(), st


_, st1 = timed("b0 bounce step", bounce0, o0, d0, alive0)
o1, d1 = st1["o"], st1["d"]
alive1 = st1["alive"]
print("alive after b0:", int(np.asarray(alive1).sum()), flush=True)


# 3. passset sort glue at 1M (keys + sort + gather of o/d/thr/rad/alive)
@jax.jit
def psort(o, d, thr, rad, alive):
    keys = passset_sort_keys(scene.proj, o, d, alive)
    iota = jnp.arange(R, dtype=jnp.int32)
    perm = jax.lax.sort(keys + (iota,), num_keys=len(keys) + 1)[-1]
    return (o[perm], d[perm], thr[perm], rad[perm], alive[perm])


srt = timed("passset sort+gather @1M", psort, o1, d1, st1["thr"],
            st1["rad"], alive1)
o1s, d1s, thr1s, rad1s, alive1s = jax.block_until_ready(srt)

# 4/5. b1 sweep, raw vs sorted
timed("b1 sweep (camera order)", sweep, o1, d1)
timed("b1 sweep (passset order)", sweep, o1s, d1s)


# 6. b1 bounce step on the sorted wavefront
@jax.jit
def bounce1(o, d, thr, rad, alive):
    st, _ = trace_resume(scene, o, d, thr, rad, alive, lk, bg, 1, 2,
                         russian_roulette_start=4)
    return st["rad"].sum() + st["thr"].sum(), st


timed("b1 bounce step (sorted)", bounce1, o1s, d1s, thr1s, rad1s, alive1s)
print("ALL_OK", flush=True)
