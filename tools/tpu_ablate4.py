"""CornellBox fwd+bwd decomposition at 1M lanes (VERDICT r1 weak #5:
144 Mrays/s fwd vs 74.5 fwd+bwd unexplained).

Times each bounce-step component and the full step, fwd and fwd+bwd,
so the dominant cost is pinned by measurement:

  1. v1 fused search+record kernel
  2. shading (shade_inputs + emitted + scatter)
  3. RNG draws (3x bounce_keys + sphere/ball/uniform)
  4. one full non-diff bounce step
  5. trace 20 bounces, non-diff (while_loop)
  6. diff render chunk fwd only (scan)
  7. diff render chunk fwd+bwd (value_and_grad)
"""
import time

from rust_pathtracer_tpu.utils import compcache

compcache.enable()

import jax
import jax.numpy as jnp

from rust_pathtracer_tpu.models import get_scene

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


sd = get_scene("CornellBox")
scene = sd.build()
cam = sd.camera_at(0.0)

from rust_pathtracer_tpu import sampling
from rust_pathtracer_tpu.camera import camera_rays
from rust_pathtracer_tpu.integrator import search_and_record, trace
from rust_pathtracer_tpu.materials import emitted, scatter, shade_inputs

key = jax.random.PRNGKey(0)
u = jax.random.uniform(key, (R,))
v = jax.random.uniform(jax.random.PRNGKey(1), (R,))
lkeys = sampling.lane_keys(key, jnp.arange(R, dtype=jnp.uint32))
lens = sampling.bounce_keys(lkeys, 0, sampling.P_LENS)
o, d = jax.block_until_ready(camera_rays(cam, u, v, lens))
alive = jnp.ones(R, bool)

sr = jax.jit(lambda o, d: search_and_record(scene, o, d, alive))
timeit("1 search+record (v1 kernel)", sr, o, d)

_, rec0, row0, _ = jax.block_until_ready(sr(o, d))


def shade(o, d, rec):
    si = shade_inputs(scene, rec, None)
    em = emitted(scene, rec, si)
    zero = jnp.zeros((R, 3), jnp.float32)
    sc = scatter(scene, rec, d, zero + 1.0, zero, jnp.zeros(R), si)
    return em, sc


timeit("2 shading (inputs+emit+scatter)", jax.jit(shade), o, d, rec0)


def draws(lkeys):
    b = jnp.int32(3)
    s = sampling.on_unit_sphere(
        sampling.bounce_keys(lkeys, b, sampling.P_LAMBERT))
    ball = sampling.in_unit_sphere(
        sampling.bounce_keys(lkeys, b, sampling.P_FUZZ))
    coin = sampling.uniform(
        sampling.bounce_keys(lkeys, b, sampling.P_SCHLICK))
    return s, ball, coin


timeit("3 RNG draws", jax.jit(draws), lkeys)


def one_bounce(o, d):
    from rust_pathtracer_tpu.integrator import _bounce_step

    zeros3 = o * 0.0
    zs = jnp.sum(zeros3[..., 0])
    state = dict(o=o, d=d, thr=zeros3 + 1.0, rad=zeros3,
                 alive=zeros3[..., 0] == 0.0, segments=zs,
                 occupancy=zs + jnp.zeros((64,), jnp.float32))
    out = _bounce_step(scene, lkeys, jnp.zeros(3), 99, state, jnp.int32(0))
    return out["rad"], out["thr"], out["alive"]


timeit("4 full bounce step", jax.jit(one_bounce), o, d)

tr = jax.jit(lambda o, d: trace(scene, o, d, lkeys, (0.0, 0.0, 0.0), 20)[0])
timeit("5 trace 20 bounces nondiff", tr, o, d, reps=3)

from rust_pathtracer_tpu.grad import CameraParams, DiffParams, apply_params
from rust_pathtracer_tpu.render import RenderSettings, render_radiance

settings = RenderSettings(512, 512, 4, 20, (0.0, 0.0, 0.0), spp_chunk=4,
                          differentiable=True)
cp = CameraParams.create((278.0, 278.0, -800.0), (278.0, 278.0, 0.0),
                         (0.0, 1.0, 0.0), 40.0, 1.0, 0.0, 10.0)
params = DiffParams.from_scene(scene, cp, settings.background)


def loss(params):
    s = apply_params(scene, params)
    img, _ = render_radiance(s, params.camera.build(), settings,
                             jax.random.PRNGKey(0),
                             background=params.background)
    return jnp.mean(img)


timeit("6 diff chunk fwd only", jax.jit(loss), params, reps=3)
timeit("7 diff chunk fwd+bwd", jax.jit(jax.grad(loss)), params, reps=3)
print("ALL_OK", flush=True)
