import time
from rust_pathtracer_tpu.utils import compcache
compcache.enable()
import jax
from rust_pathtracer_tpu.models import get_scene
from rust_pathtracer_tpu.render import RenderSettings, render_radiance
from rust_pathtracer_tpu.scene.obj_loader import write_benchmark_obj
print("backend:", jax.default_backend(), flush=True)
write_benchmark_obj("/tmp/rock.obj")
for name, kw, w, h, ref in (
    ("SphereField", {}, 128, 72, 0.6788254),
    ("ModelTest", {"obj_path": "/tmp/rock.obj"}, 96, 96, 0.6998482),
):
    sd = get_scene(name, **kw); scene = sd.build(); cam = sd.camera_at(0.0)
    s = RenderSettings(w, h, 4, 20, sd.output.image.background, spp_chunk=4)
    t0 = time.perf_counter()
    img, _ = render_radiance(scene, cam, s, jax.random.PRNGKey(0))
    m = float(img.mean()); dt = time.perf_counter() - t0
    print(f"{name}: mean={m:.5f} ref={ref} rel={abs(m-ref)/ref:.5f} compile+run={dt:.1f}s", flush=True)
