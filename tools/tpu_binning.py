"""Ray-binning A/B on the real chip: one 1M-lane chunk of a judging
scene, full bounce loop, RPT_BIN on/off.

    python tools/tpu_binning.py <scene> <bin 0|1> [block_rows]

Timing ends in a device->host fetch (block_until_ready is unreliable
over the axon backend).  One config per process so a wedged remote
compile cannot poison a batch.
"""
import json
import os
import sys
import time

from rust_pathtracer_tpu.utils import compcache

compcache.enable()

name, binflag = sys.argv[1], sys.argv[2]
os.environ["RPT_BIN"] = binflag
if len(sys.argv) > 3:
    os.environ["RPT_BLOCK_ROWS"] = sys.argv[3]

import jax

from rust_pathtracer_tpu.models import get_scene
from rust_pathtracer_tpu.render import RenderSettings, render_radiance
from rust_pathtracer_tpu.scene.obj_loader import write_benchmark_obj

CONFIGS = {
    "ModelTest": ({"obj_path": "/tmp/rock.obj"}, 512, 512, 20),
    "SphereField": ({}, 1280, 720, 20),
    "CornellBox": ({}, 512, 512, 20),
    "LightTest": ({}, 512, 512, 50),
}
kw, w, h, nb = CONFIGS[name]
if "obj_path" in kw:
    write_benchmark_obj(kw["obj_path"])

sd = get_scene(name, **kw)
scene = sd.build()
cam = sd.camera_at(0.0)
bg = sd.output.image.background
nb = int(os.environ.get("RPT_NB", nb))  # cost decomposition probes
spp = max(1, (1 << 20) // (w * h))  # ~1M lanes in one chunk
spp = int(os.environ.get("RPT_SPPCHUNK", spp))  # chunk-size probes
rr = os.environ.get("RPT_RR")
settings = RenderSettings(w, h, spp, nb, bg, spp_chunk=spp,
                          russian_roulette_start=int(rr) if rr else None)
cols = (f"cols={scene.proj.num_cols} col_block={scene.proj.col_block}"
        if scene.proj is not None else "v1-fused")
print(f"backend={jax.default_backend()} bin={binflag} spp={spp} {cols}",
      flush=True)

t0 = time.perf_counter()
img, stats = render_radiance(scene, cam, settings, jax.random.PRNGKey(7))
m = float(img.mean())  # fetch = real sync
tw = time.perf_counter() - t0
print(f"warm {tw:.1f}s mean={m:.6f}", flush=True)

t0 = time.perf_counter()
img, stats = render_radiance(scene, cam, settings, jax.random.PRNGKey(7))
m = float(img.mean())
dt = time.perf_counter() - t0
segs = float(stats.segments)
print(json.dumps({
    "scene": name, "bin": binflag,
    "block_rows": os.environ.get("RPT_BLOCK_ROWS", "default"),
    "chunk_s": round(dt, 3), "segments": segs,
    "Mrays_s": round(segs / dt / 1e6, 2), "mean": round(m, 6),
    "bounces": int(stats.bounces),
}), flush=True)
