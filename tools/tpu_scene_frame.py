"""Same-day scene-frame control probe (works in ANY code checkout).

Times ONE judged scene frame the bench_scenes way (fetch-bracketed,
reps -> median) using whatever package version is first on sys.path —
point PYTHONPATH at a git worktree of an older round to get a
same-day control measurement on identical host conditions:

  PYTHONPATH=/root/repo/.wt_r3:/root/.axon_site \
      python tools/tpu_scene_frame.py --scene TwoSphereCheckers --reps 7

Uses only APIs stable since round 2 (get_scene / RenderSettings /
render_radiance / render_radiance_regen), so it runs unmodified
against round-2+ trees.  One scene per process (remote-compile
hygiene).  VERDICT r3 item 2: every BENCH_SCENES_r4 row must carry a
same-day prior-round control measured by THIS script.
"""

import argparse
import json
import os
import sys
import tempfile
import time


CONFIGS = {
    # name: (kwargs, w, h, spp, bounces, rebuild, rr, mode)
    "TwoSphereCheckers": ({}, 400, 225, 64, 8, False, None, "chunked"),
    "LightTest": ({}, 512, 512, 256, 50, False, None, "regen"),
    "CornellBox": ({}, 512, 512, 1024, 20, False, None, "chunked"),
    "TriangleTest": ({}, 400, 400, 1000, 20, False, None, "chunked"),
    "ModelTest": ("OBJ", 512, 512, 256, 20, False, 4, "cascade:auto"),
    "SphereField": ({}, 1280, 720, 512, 20, True, 4, "cascade:auto"),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", required=True, choices=sorted(CONFIGS))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--note", default=None)
    ap.add_argument("--cascade", default=None,
                    help="override the cascade schedule string")
    args = ap.parse_args()

    from rust_pathtracer_tpu.utils import compcache

    compcache.enable()

    import jax

    from rust_pathtracer_tpu.models import get_scene
    from rust_pathtracer_tpu.render import RenderSettings, render_radiance

    kwargs, w, h, spp, bounces, rebuild, rr, mode = CONFIGS[args.scene]
    if kwargs == "OBJ":
        from rust_pathtracer_tpu.scene.obj_loader import write_benchmark_obj

        objp = os.path.join(tempfile.mkdtemp(), "model.obj")
        write_benchmark_obj(objp)
        kwargs = {"obj_path": objp}

    cascade_schedule = None
    if mode.startswith("cascade:"):
        cascade_schedule = args.cascade or mode.split(":", 1)[1]
    sd = get_scene(args.scene, **kwargs)
    settings = RenderSettings(
        w, h, spp, bounces, sd.output.image.background,
        russian_roulette_start=rr,
        cascade=cascade_schedule is not None,
        cascade_schedule=cascade_schedule,
    )
    scene = sd.build()
    cam = sd.camera_at(0.0)
    if mode == "regen":
        from rust_pathtracer_tpu.wavefront import render_radiance_regen

        def render(*a, **k):
            return render_radiance_regen(*a, flush_every=2, **k)
    else:
        render = render_radiance

    key = jax.random.PRNGKey(0)
    img, _ = render(scene, cam, settings, key)
    _ = float(img.mean())  # warmup incl. fetch

    times = []
    for _rep in range(max(1, args.reps)):
        t0 = time.perf_counter()
        if rebuild:
            scene = sd.build()
        img, stats = render(scene, cam, settings, key)
        _ = float(img.mean())
        times.append(time.perf_counter() - t0)
    times.sort()
    dt = times[len(times) // 2]
    rays = float(stats.segments)
    print(json.dumps({
        "metric": f"{args.scene} {w}x{h}@{spp}spp frame",
        "value": round(dt, 4),
        "unit": "s",
        "mrays_per_s": round(rays / dt / 1e6, 2),
        "reps": len(times),
        "spread": round((times[-1] - times[0]) / dt, 4) if len(times) > 1
        else 0.0,
        "times": [round(x, 4) for x in times],
        "host_load1": round(os.getloadavg()[0], 2),
        "tree": os.path.dirname(os.path.dirname(os.path.abspath(
            sys.modules["rust_pathtracer_tpu"].__file__))),
        "note": args.note,
    }), flush=True)


if __name__ == "__main__":
    main()
