"""Remat-policy A/B on the headline fwd+bwd step (bench.py config).

    python tools/tpu_remat.py [none|mid|names]

Times the jitted value_and_grad step on CornellBox 512^2 @ 4spp
(1M lanes, 20 bounces) and prints the compiled memory analysis
(temp = residual bytes the policy actually commits).  One policy per
process; timings end in a device->host fetch (block_until_ready is
unreliable over the axon backend).
"""
import json
import os
import sys
import time

from rust_pathtracer_tpu.utils import compcache

compcache.enable()

mode = sys.argv[1] if len(sys.argv) > 1 else "none"
os.environ["RPT_REMAT"] = mode

import jax
import jax.numpy as jnp

from rust_pathtracer_tpu.grad import CameraParams, DiffParams, apply_params
from rust_pathtracer_tpu.models import get_scene
from rust_pathtracer_tpu.render import RenderSettings, render_radiance

print(f"backend={jax.default_backend()} remat={mode}", flush=True)

sd = get_scene("CornellBox")
scene = sd.build()
settings = RenderSettings(512, 512, 4, 20, (0.0, 0.0, 0.0), spp_chunk=4,
                          differentiable=True)
cam_params = CameraParams.create(
    (278.0, 278.0, -800.0), (278.0, 278.0, 0.0), (0.0, 1.0, 0.0),
    40.0, 1.0, 0.0, 10.0,
)
params = DiffParams.from_scene(scene, cam_params, settings.background)
key = jax.random.PRNGKey(0)


def loss_and_segments(params):
    s = apply_params(scene, params)
    img, stats = render_radiance(
        s, params.camera.build(), settings, key, background=params.background
    )
    return jnp.mean(img), stats.segments


step = jax.jit(jax.value_and_grad(loss_and_segments, has_aux=True))

mem = {}
try:
    ma = step.lower(params).compile().memory_analysis()
    if ma is not None:
        mem = {
            "temp_MB": round(ma.temp_size_in_bytes / 1e6, 1),
            "output_MB": round(ma.output_size_in_bytes / 1e6, 1),
            "argument_MB": round(ma.argument_size_in_bytes / 1e6, 1),
        }
except Exception as e:  # noqa: BLE001 — analysis is best-effort evidence
    mem = {"memory_analysis_error": str(e)[:120]}

t0 = time.perf_counter()
(loss, segments), grads = step(params)
segs = float(segments)
leaves = jax.tree_util.tree_leaves(grads)
_ = float(sum(jnp.sum(jnp.abs(x)) for x in leaves))
warm = time.perf_counter() - t0
print(f"warm {warm:.1f}s loss={float(loss):.6f}", flush=True)

REPS = 5
t0 = time.perf_counter()
for _ in range(REPS):
    (loss, segments), grads = step(params)
_ = float(sum(jnp.sum(jnp.abs(x)) for x in jax.tree_util.tree_leaves(grads)))
_ = float(loss)
dt = (time.perf_counter() - t0) / REPS

print(json.dumps({
    "mode": mode, "step_ms": round(dt * 1e3, 1),
    "Mrays_s": round(segs / dt / 1e6, 1),
    "loss": round(float(loss), 6), "segments": segs, **mem,
}), flush=True)
