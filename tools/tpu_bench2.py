"""TPU bench round 2: SphereField/ModelTest frames, LightTest+RR, fwd+bwd."""
import json, sys, time
from rust_pathtracer_tpu.utils import compcache
compcache.enable()
import jax
from rust_pathtracer_tpu.models import get_scene
from rust_pathtracer_tpu.render import RenderSettings, render_radiance
from rust_pathtracer_tpu.scene.obj_loader import write_benchmark_obj

which = sys.argv[1]

def run(name, kw, w, h, spp, nb, rr=None, tag=""):
    if "obj_path" in kw: write_benchmark_obj(kw["obj_path"])
    sd = get_scene(name, **kw); scene = sd.build(); cam = sd.camera_at(0.0)
    bg = sd.output.image.background
    settings = RenderSettings(w, h, spp, nb, bg, russian_roulette_start=rr)
    chunk = settings.resolve_chunk()
    warm = RenderSettings(w, h, chunk, nb, bg, spp_chunk=chunk, russian_roulette_start=rr)
    import numpy as _np
    # NOTE: block_until_ready is NOT reliable over the axon remote
    # backend (observed 0.04s "frames" whose compute landed in the
    # later host fetch) — always time through a device->host fetch.
    t0 = time.perf_counter()
    img, _ = render_radiance(scene, cam, warm, jax.random.PRNGKey(9))
    wmean = float(img.mean()); tw = time.perf_counter() - t0
    print(f"warm {tw:.1f}s", flush=True)
    t0 = time.perf_counter()
    img, stats = render_radiance(scene, cam, settings, jax.random.PRNGKey(1))
    fmean = float(img.mean()); dt = time.perf_counter() - t0
    print(json.dumps({"scene": name+tag, "res": f"{w}x{h}", "spp": spp, "rr": rr,
        "warm_s": round(tw,2), "frame_s": round(dt,3),
        "Mrays_s": round(float(stats.segments)/dt/1e6,1),
        "mean": round(fmean,5)}), flush=True)

if which == "spherefield":
    run("SphereField", {}, 1280, 720, 512, 20)
elif which == "modeltest":
    run("ModelTest", {"obj_path": "/tmp/rock.obj"}, 512, 512, 256, 20)
elif which == "lightrr":
    run("LightTest", {}, 512, 512, 256, 50, rr=8, tag="+rr8")
elif which == "cornellrr":
    run("CornellBox", {}, 512, 512, 1024, 20, rr=8, tag="+rr8")
