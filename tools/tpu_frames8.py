"""Real-renderer frame probes at 8 spp: cluster effect + RR effect."""
import json, time
from rust_pathtracer_tpu.utils import compcache
compcache.enable()
import jax
from rust_pathtracer_tpu.models import get_scene
from rust_pathtracer_tpu.render import RenderSettings, render_radiance
from rust_pathtracer_tpu.scene.obj_loader import write_benchmark_obj
print("backend:", jax.default_backend(), flush=True)
write_benchmark_obj("/tmp/rock.obj")

def run(name, kw, w, h, spp, nb, rr):
    sd = get_scene(name, **kw); scene = sd.build(); cam = sd.camera_at(0.0)
    bg = sd.output.image.background
    settings = RenderSettings(w, h, spp, nb, bg, russian_roulette_start=rr)
    chunk = settings.resolve_chunk()
    warm = RenderSettings(w, h, chunk, nb, bg, spp_chunk=chunk, russian_roulette_start=rr)
    img, _ = render_radiance(scene, cam, warm, jax.random.PRNGKey(9))
    _ = float(img.mean())
    t0 = time.perf_counter()
    img, stats = render_radiance(scene, cam, settings, jax.random.PRNGKey(1))
    m = float(img.mean()); dt = time.perf_counter() - t0
    print(json.dumps({"scene": name, "spp": spp, "rr": rr, "chunk": chunk,
        "frame_s": round(dt, 3), "mean": round(m, 5),
        "Mrays_s": round(float(stats.segments)/dt/1e6, 1)}), flush=True)

run("SphereField", {}, 1280, 720, 8, 20, None)
run("SphereField", {}, 1280, 720, 8, 20, 4)
run("ModelTest", {"obj_path": "/tmp/rock.obj"}, 512, 512, 8, 20, None)
run("ModelTest", {"obj_path": "/tmp/rock.obj"}, 512, 512, 8, 20, 4)
