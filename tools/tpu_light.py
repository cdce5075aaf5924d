"""LightTest occupancy A/B on the real chip: chunked vs regeneration
wavefront at the judging config (512^2 @ 256 spp, 50 bounces).

    python tools/tpu_light.py chunked [rr_start|none]
    python tools/tpu_light.py regen   [flush_every] [stripe|queue]

One config per process; timings end in a device->host fetch.
"""
import json
import sys
import time

from rust_pathtracer_tpu.utils import compcache

compcache.enable()

import jax

from rust_pathtracer_tpu.models import get_scene
from rust_pathtracer_tpu.render import RenderSettings, render_radiance

mode = sys.argv[1]
arg = sys.argv[2] if len(sys.argv) > 2 else None

sd = get_scene("LightTest")
scene = sd.build()
cam = sd.camera_at(0.0)
rr = None
if mode == "chunked" and arg not in (None, "none"):
    rr = int(arg)
settings = RenderSettings(512, 512, 256, 50, sd.output.image.background,
                          russian_roulette_start=rr)

if mode == "chunked":
    fn = lambda: render_radiance(scene, cam, settings, jax.random.PRNGKey(7))
    tag = f"chunked rr={rr}"
else:
    from rust_pathtracer_tpu.wavefront import render_radiance_regen

    fe = int(arg) if arg else 4
    hand = sys.argv[3] if len(sys.argv) > 3 else "queue"
    pool = int(sys.argv[4]) if len(sys.argv) > 4 else None
    fn = lambda: render_radiance_regen(
        scene, cam, settings, jax.random.PRNGKey(7), flush_every=fe,
        mode=hand, lanes=pool,
    )
    tag = f"regen fe={fe} {hand} lanes={pool or 'auto'}"

print(f"backend={jax.default_backend()} {tag}", flush=True)
t0 = time.perf_counter()
img, stats = fn()
m = float(img.mean())  # fetch = real sync
print(f"warm {time.perf_counter() - t0:.1f}s mean={m:.6f}", flush=True)
# 3 timed reps: the remote tunnel's run-to-run noise (observed
# 6.65 vs 9.99 s for the same graph in different processes) swamps
# small deltas — report every rep and the minimum.
reps = []
for _ in range(3):
    t0 = time.perf_counter()
    img, stats = fn()
    m = float(img.mean())
    reps.append(time.perf_counter() - t0)
print(json.dumps({
    "scene": "LightTest", "mode": tag,
    "frame_s": round(min(reps), 2), "reps_s": [round(r, 2) for r in reps],
    "segments": float(stats.segments),
    "Mrays_s": round(float(stats.segments) / min(reps) / 1e6, 2),
    "mean": round(m, 6), "iters": int(stats.bounces),
}), flush=True)
