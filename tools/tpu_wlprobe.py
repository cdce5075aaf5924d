"""Isolate the v3 worklist compile failure: the kernel alone vs the
kernel wrapped in lax.cond (observed: pallas outputs that are cond
branch roots get stack-allocated in scoped VMEM and OOM at 131k rays).

    python tools/tpu_wlprobe.py <direct|cond|condslice> [nrays_log2]

One mode per process.
"""
import sys
import time

from rust_pathtracer_tpu.utils import compcache

compcache.enable()

import jax
import jax.numpy as jnp
import numpy as np

from rust_pathtracer_tpu.models import get_scene
from rust_pathtracer_tpu.ops.projected import _pad_up, _ray_matrix
from rust_pathtracer_tpu.ops.worklist import (
    WL_BLOCK_ROWS,
    _closest_hit_pairs,
    build_pair_worklist,
)

mode = sys.argv[1]
n = 1 << (int(sys.argv[2]) if len(sys.argv) > 2 else 17)

sd = get_scene("SphereField")
scene = sd.build()
tables = scene.proj
print(f"backend={jax.default_backend()} mode={mode} cols={tables.num_cols} "
      f"rays={n}", flush=True)

cam = sd.camera_at(0.0)
rng = np.random.default_rng(0)
u = jnp.asarray(rng.uniform(0, 1, (n,)), jnp.float32)
v = jnp.asarray(rng.uniform(0, 1, (n,)), jnp.float32)
from rust_pathtracer_tpu.camera import camera_rays

lens_keys = jax.random.split(jax.random.PRNGKey(0), n)
o, d = camera_rays(cam, u, v, lens_keys)

rb = WL_BLOCK_ROWS * 128
Rp = _pad_up(n, rb)
o_p = jnp.pad(o, ((0, Rp - n), (0, 0)))
d_p = jnp.pad(d, ((0, Rp - n), (0, 0)))
rays = _ray_matrix(o_p, d_p)
meta, _ent, _far, overflow = build_pair_worklist(
    tables.cluster_bounds, tables.group_kinds, o_p, d_p, 1e-3, rb, 12
)
kcap_eff = meta.shape[1] // (Rp // rb)
distinct = tuple(sorted(set(k for k in tables.group_kinds if k != -1)))
print(f"kcap_eff={kcap_eff} overflow={bool(overflow)}", flush=True)

kw = dict(distinct_kinds=distinct, t_min=1e-3, block_rows=WL_BLOCK_ROWS,
          kcap=kcap_eff, interpret=False)


def wl(_):
    return _closest_hit_pairs(rays, tables.a, tables.b, tables.const,
                              tables.payload, meta, **kw)


def wl_slice(_):
    t, c, pay = wl(None)
    return t[:n], c[:n], pay[:n]


if mode == "direct":
    fn = jax.jit(lambda: wl(None))
elif mode == "cond":
    fn = jax.jit(lambda: jax.lax.cond(overflow, wl, wl, None))
elif mode == "condslice":
    fn = jax.jit(lambda: jax.lax.cond(overflow, wl_slice, wl_slice, None))
else:
    raise SystemExit(f"unknown mode {mode}")

t0 = time.perf_counter()
t, c, pay = fn()
s = float(t.sum())
print(f"warm {time.perf_counter() - t0:.1f}s sum={s}", flush=True)
t0 = time.perf_counter()
t, c, pay = fn()
s = float(t.sum())
print(f"run {(time.perf_counter() - t0) * 1e3:.2f} ms", flush=True)
print("PROBE_OK", flush=True)
