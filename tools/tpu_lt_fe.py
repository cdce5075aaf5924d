"""LightTest judged frame at an explicit regen flush cadence.

    python tools/tpu_lt_fe.py <flush_every>

Round-2 tuned flush_every=2 when the bounce body cost 9.8 ms; the
round-5 fused bounce cut the body ~2x, shifting the refill-machinery
fraction — re-check the cadence.  One config per process.
"""
import json
import os
import sys
import time


def main():
    fe = int(sys.argv[1])
    from rust_pathtracer_tpu.utils import compcache

    compcache.enable()
    import jax

    from rust_pathtracer_tpu.models import get_scene
    from rust_pathtracer_tpu.render import RenderSettings
    from rust_pathtracer_tpu.wavefront import render_radiance_regen

    sd = get_scene("LightTest")
    scene = sd.build()
    cam = sd.camera_at(0.0)
    settings = RenderSettings(512, 512, 256, 50, (0.0, 0.0, 0.0))
    key = jax.random.PRNGKey(0)
    img, _ = render_radiance_regen(scene, cam, settings, key,
                                   flush_every=fe)
    _ = float(img.mean())
    times = []
    for _rep in range(3):
        t0 = time.perf_counter()
        img, stats = render_radiance_regen(scene, cam, settings, key,
                                           flush_every=fe)
        _ = float(img.mean())
        times.append(time.perf_counter() - t0)
    times.sort()
    print(json.dumps({
        "metric": f"LightTest 512x512@256spp frame (fe={fe})",
        "value": round(times[1], 4),
        "unit": "s",
        "times": [round(t, 4) for t in times],
        "mean": round(float(img.mean()), 6),
        "segments": float(stats.segments),
        "host_load1": round(os.getloadavg()[0], 2),
    }), flush=True)


if __name__ == "__main__":
    main()
