"""SphereField animation at the judging config (BASELINE config 5):
1280x720 @ 512 spp, camera orbit, per-frame scene+tables rebuild.

Renders ``nframes`` consecutive frames (default 3) at full quality and
reports per-frame render and rebuild wall-clock, plus the projected
300-frame total.  One JSON line at the end.

    python tools/tpu_anim_bench.py [nframes] [spp]
"""
import json
import sys
import time

from rust_pathtracer_tpu.utils import compcache

compcache.enable()

import jax

from rust_pathtracer_tpu.models import get_scene
from rust_pathtracer_tpu.render import RenderSettings, render_radiance

nframes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
spp = int(sys.argv[2]) if len(sys.argv) > 2 else 512

sd = get_scene("SphereField")
settings = RenderSettings(1280, 720, spp, 20, (1.0, 1.0, 1.0),
                          russian_roulette_start=None)
total_frames = 300  # 30 fps x 10 s (scene.rs:47-59)

rebuild_s = []
render_s = []
means = []
for i in range(nframes):
    t0 = time.perf_counter()
    scene = sd.build()  # per-frame rebuild per BASELINE config 5
    jax.block_until_ready(scene.prims.data)
    rebuild_s.append(time.perf_counter() - t0)
    cam = sd.camera_at(i / total_frames)
    t0 = time.perf_counter()
    img, stats = render_radiance(scene, cam, settings, jax.random.PRNGKey(i))
    m = float(img.mean())  # fetch = real sync
    dt = time.perf_counter() - t0
    render_s.append(dt)
    means.append(m)
    print(f"# frame {i}: rebuild {rebuild_s[-1]:.3f}s render {dt:.1f}s "
          f"mean={m:.5f} segs={float(stats.segments):.3g}", flush=True)

steady = render_s[-1]  # first frame paid the compile
print(json.dumps({
    "scene": "SphereField-anim", "res": "1280x720", "spp": spp,
    "frames_measured": nframes,
    "rebuild_s": round(sum(rebuild_s) / len(rebuild_s), 3),
    "frame_s": round(steady, 2),
    "projected_300frame_hours": round(300 * steady / 3600.0, 2),
    "mean_frame0": round(means[0], 5),
}), flush=True)
