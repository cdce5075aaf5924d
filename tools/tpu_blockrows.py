"""Block-rows sweep for cluster-skip effectiveness + fwd/bwd bench."""
import json, os, sys, time
from rust_pathtracer_tpu.utils import compcache
compcache.enable()
import jax
from rust_pathtracer_tpu.models import get_scene
from rust_pathtracer_tpu.render import RenderSettings, render_radiance
from rust_pathtracer_tpu.scene.obj_loader import write_benchmark_obj
print("backend:", jax.default_backend(), flush=True)
write_benchmark_obj("/tmp/rock.obj")

def run(name, kw, w, h, spp, nb, br):
    os.environ["RPT_BLOCK_ROWS"] = str(br)
    sd = get_scene(name, **kw); scene = sd.build(); cam = sd.camera_at(0.0)
    bg = sd.output.image.background
    settings = RenderSettings(w, h, spp, nb, bg)
    chunk = settings.resolve_chunk()
    warm = RenderSettings(w, h, chunk, nb, bg, spp_chunk=chunk)
    img, _ = render_radiance(scene, cam, warm, jax.random.PRNGKey(9))
    _ = float(img.mean())
    t0 = time.perf_counter()
    img, stats = render_radiance(scene, cam, settings, jax.random.PRNGKey(1))
    m = float(img.mean()); dt = time.perf_counter() - t0
    print(json.dumps({"scene": name, "spp": spp, "block_rows": br,
        "frame_s": round(dt, 3), "mean": round(m, 5)}), flush=True)

for br in (1, 2, 4):
    run("SphereField", {}, 1280, 720, 4, 20, br)
for br in (1, 2):
    run("ModelTest", {"obj_path": "/tmp/rock.obj"}, 512, 512, 8, 20, br)
