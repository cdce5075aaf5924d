"""Regen-vs-chunked A/B for the big scenes at a ~1M-ray slice.

    python tools/tpu_regen.py <ModelTest|SphereField> <chunked|regen> [flush_every]

Same slice the chunked A/B (tpu_binning.py) times: ModelTest 512x512
@4spp, SphereField 1280x720 @1spp — so frame_s here compares directly
with tpu_binning's chunk_s.  Timings end in a device->host fetch.
One config per process.
"""
import json
import os
import sys
import time

from rust_pathtracer_tpu.utils import compcache

compcache.enable()

name, mode = sys.argv[1], sys.argv[2]
arg = sys.argv[3] if len(sys.argv) > 3 else None

import jax

from rust_pathtracer_tpu.models import get_scene
from rust_pathtracer_tpu.render import RenderSettings, render_radiance
from rust_pathtracer_tpu.scene.obj_loader import write_benchmark_obj

CONFIGS = {
    "ModelTest": ({"obj_path": "/tmp/rock.obj"}, 512, 512, 20),
    "SphereField": ({}, 1280, 720, 20),
}
kw, w, h, nb = CONFIGS[name]
if "obj_path" in kw:
    write_benchmark_obj(kw["obj_path"])

sd = get_scene(name, **kw)
scene = sd.build()
cam = sd.camera_at(0.0)
# 4x the 1M-lane pool so the regen refill actually engages (a slice
# equal to the pool degenerates to the chunked loop + flush overhead);
# compare slice_s against 4x tpu_binning's chunk_s
spp = 4 * max(1, (1 << 20) // (w * h))
settings = RenderSettings(w, h, spp, nb, sd.output.image.background,
                          spp_chunk=min(spp, max(1, (1 << 20) // (w * h))))

if mode == "chunked":
    fn = lambda: render_radiance(scene, cam, settings, jax.random.PRNGKey(7))
    tag = "chunked"
else:
    from rust_pathtracer_tpu.wavefront import render_radiance_regen

    fe = int(arg) if arg else 4
    fn = lambda: render_radiance_regen(
        scene, cam, settings, jax.random.PRNGKey(7), flush_every=fe
    )
    tag = f"regen fe={fe}"

print(f"backend={jax.default_backend()} {name} {tag} spp={spp}", flush=True)
t0 = time.perf_counter()
img, stats = fn()
m = float(img.mean())  # fetch = real sync
print(f"warm {time.perf_counter() - t0:.1f}s mean={m:.6f}", flush=True)
t0 = time.perf_counter()
img, stats = fn()
m = float(img.mean())
dt = time.perf_counter() - t0
print(json.dumps({
    "scene": name, "mode": tag, "slice_s": round(dt, 3),
    "segments": float(stats.segments),
    "Mrays_s": round(float(stats.segments) / dt / 1e6, 2),
    "mean": round(m, 6), "iters": int(stats.bounces),
}), flush=True)
