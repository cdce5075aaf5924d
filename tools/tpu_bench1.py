"""Single-config TPU bench: python tpu_bench1.py <scene> <mode>.

Scenes: TwoSphereCheckers LightTest CornellBox ModelTest SphereField
Modes: chunked | regen
"""
import json
import sys
import time

from rust_pathtracer_tpu.utils import compcache

compcache.enable()

import jax

from rust_pathtracer_tpu.models import get_scene
from rust_pathtracer_tpu.render import RenderSettings, render_radiance
from rust_pathtracer_tpu.scene.obj_loader import write_benchmark_obj
from rust_pathtracer_tpu.wavefront import render_radiance_regen

CONFIGS = {
    "TwoSphereCheckers": ({}, 400, 225, 64, 8),
    "LightTest": ({}, 512, 512, 256, 50),
    "CornellBox": ({}, 512, 512, 1024, 20),
    "ModelTest": ({"obj_path": "/tmp/rock.obj"}, 512, 512, 256, 20),
    "SphereField": ({}, 1280, 720, 512, 20),
}

name, mode = sys.argv[1], sys.argv[2]
kw, w, h, spp, nb = CONFIGS[name]
if "obj_path" in kw:
    write_benchmark_obj(kw["obj_path"])
renderer = render_radiance_regen if mode == "regen" else render_radiance

sd = get_scene(name, **kw)
scene = sd.build()
cam = sd.camera_at(0.0)
bg = sd.output.image.background
settings = RenderSettings(w, h, spp, nb, bg)
chunk = settings.resolve_chunk()
warm = RenderSettings(w, h, chunk, nb, bg, spp_chunk=chunk)
print(f"backend={jax.default_backend()} chunk={chunk} warming...", flush=True)
t0 = time.perf_counter()
img, _ = renderer(scene, cam, warm, jax.random.PRNGKey(9))
img.block_until_ready()
tw = time.perf_counter() - t0
print(f"warm {tw:.1f}s mean={float(img.mean()):.5f}", flush=True)
t0 = time.perf_counter()
img, stats = renderer(scene, cam, settings, jax.random.PRNGKey(1))
img.block_until_ready()
dt = time.perf_counter() - t0
print(json.dumps({
    "scene": name, "mode": mode, "res": f"{w}x{h}", "spp": spp,
    "chunk": chunk, "warm_s": round(tw, 2), "frame_s": round(dt, 3),
    "Mrays_s": round(float(stats.segments) / dt / 1e6, 1),
    "mean": round(float(img.mean()), 5),
}), flush=True)
