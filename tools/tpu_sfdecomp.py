"""Decompose the SphereField cascaded chunk (0.106 s at schedule
"2:2,3:3,4:5,5:10,9:80" after carried-sort boundaries) on the real
chip.

SF runs bounces 0-1 at full 921,600-lane width (first boundary at
bounce 2).  Times, each in its own jit ending in a device->host
fetch, on REAL chunk lanes (1280x720 x 1 spp camera rays, bench lane
keys):

  1. b0 sweep      — v4 resident closest-hit on the camera rays
  2. b0 bounce     — one full bounce step (sweep + shade + RNG)
  3. b1 bounce     — one full bounce step on the post-b0 wavefront
  4. boundary @W   — passset keys + carried sort of the 19-column
                     state at full width (the bounce-2 boundary)
  5. b2 bounce @W/2— one bounce step on the compacted half-width slice

One process per run; 5 reps each, min reported.
"""
import json
import time

from rust_pathtracer_tpu.utils import compcache

compcache.enable()

import jax
import jax.numpy as jnp
import numpy as np

from rust_pathtracer_tpu.models import get_scene
from rust_pathtracer_tpu.integrator import (
    reorder_keys,
    sort_carry,
    trace_resume,
)
from rust_pathtracer_tpu.render import RenderSettings, _make_lanes

W_IMG, H_IMG = 1280, 720
sd = get_scene("SphereField")
scene = sd.build()
cam = sd.camera_at(0.0)
bg = jnp.asarray(sd.output.image.background, jnp.float32)
print(f"backend={jax.default_backend()} cols={scene.proj.num_cols} "
      f"groups={scene.proj.cluster_bounds.shape[1]}", flush=True)

pix = jnp.arange(W_IMG * H_IMG, dtype=jnp.uint32)
base_key = jax.random.PRNGKey(0)


@jax.jit
def lanes():
    return _make_lanes(cam, base_key, pix, 0, width=W_IMG, height=H_IMG,
                       spp_chunk=1, spp_total=512)


lk, o0, d0, _ = jax.block_until_ready(lanes())
R = o0.shape[0]
alive0 = jnp.ones((R,), bool)
print(f"lanes R={R}", flush=True)


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


from rust_pathtracer_tpu.ops.resident import closest_hit_resident

sweep = jax.jit(lambda o, d: closest_hit_resident(scene.proj, o, d, 1e-3)[1])
timed("b0 sweep (v4, camera order)", sweep, o0, d0)


def bounce_fn(b0_idx, b1_idx):
    @jax.jit
    def f(o, d, thr, rad, alive, keys):
        st, _ = trace_resume(scene, o, d, thr, rad, alive, keys, bg,
                             b0_idx, b1_idx, russian_roulette_start=4)
        return st["rad"].sum() + st["thr"].sum(), st

    return f


_, st1 = timed("b0 bounce step", bounce_fn(0, 1), o0, d0,
               jnp.ones((R, 3), jnp.float32), jnp.zeros((R, 3), jnp.float32),
               alive0, lk)
print("alive after b0:", int(np.asarray(st1["alive"]).sum()), flush=True)

_, st2 = timed("b1 bounce step", bounce_fn(1, 2), st1["o"], st1["d"],
               st1["thr"], st1["rad"], st1["alive"], lk)
print("alive after b1:", int(np.asarray(st2["alive"]).sum()), flush=True)


@jax.jit
def boundary(o, d, thr, rad, alive, keys):
    ks = reorder_keys(scene, o, d, alive, None)
    banked = jnp.zeros((R, 3), jnp.float32)
    lane = jnp.arange(R, dtype=jnp.int32)
    rad_m = jnp.where(alive[:, None], rad, 0.0)
    out = sort_carry(ks, [o, d, thr, rad_m, alive, keys, banked, lane])
    return out


srt = timed("boundary: passset keys + carried sort @W", boundary,
            st2["o"], st2["d"], st2["thr"], st2["rad"], st2["alive"], lk)
S = R // 2
o2, d2, thr2, rad2, alive2, lk2 = (srt[0][:S], srt[1][:S], srt[2][:S],
                                   srt[3][:S], srt[4][:S], srt[5][:S])
_ = timed("b2 bounce step @W/2 (sorted)", bounce_fn(2, 3),
          o2, d2, thr2, rad2, alive2, lk2)
print("ALL_OK", flush=True)
