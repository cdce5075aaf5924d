"""Scaling-efficiency benchmark: rays/s across mesh sizes.

BASELINE.json north star: >80% rays/s scaling efficiency from 1 chip to
2 hosts.  This harness measures rays/s on 1, 2, ..., N devices of
whatever platform is attached (the real slice on multi-chip TPU, the
virtual CPU mesh elsewhere — the sharding code path is identical) and
prints one JSON line per mesh size plus a summary efficiency line.

Run on a multi-host slice after ``jax.distributed.initialize`` (see
rust_pathtracer_tpu.parallel.distributed_init); single-host it scales
over the local devices.
"""

import json
import sys
import time

# must run before jax initializes to get a CPU mesh when no TPU present
import os

if "--cpu8" in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax


def main():
    from rust_pathtracer_tpu.utils import compcache

    compcache.enable()

    import jax.numpy as jnp

    from rust_pathtracer_tpu.models import get_scene
    from rust_pathtracer_tpu.parallel import make_mesh, render_radiance_sharded
    from rust_pathtracer_tpu.render import RenderSettings

    ndev = len(jax.devices())
    sd = get_scene("CornellBox")
    scene = sd.build()
    cam = sd.camera_at(0.0)
    settings = RenderSettings(
        width=256, height=256, samples_per_pixel=8, max_bounces=20,
        background=(0.0, 0.0, 0.0), spp_chunk=4,
    )
    key = jax.random.PRNGKey(0)

    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= ndev]
    results = {}
    for n in sizes:
        mesh = make_mesh(tiles=n, samples=1, devices=jax.devices()[:n])
        img, stats = render_radiance_sharded(scene, cam, settings, key, mesh)
        img.block_until_ready()  # compile + warmup
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            img, stats = render_radiance_sharded(scene, cam, settings, key, mesh)
        img.block_until_ready()
        dt = (time.perf_counter() - t0) / reps
        rays = float(stats.segments) / dt
        results[n] = rays
        print(
            json.dumps(
                {"metric": f"rays/sec {n}dev", "value": rays, "unit": "rays/s",
                 "vs_baseline": rays / results[1]}
            )
        )

    if len(sizes) > 1:
        n = sizes[-1]
        eff = results[n] / (results[1] * n)
        print(
            json.dumps(
                {"metric": f"scaling efficiency 1->{n}", "value": eff,
                 "unit": "fraction", "vs_baseline": eff / 0.8}
            )
        )


if __name__ == "__main__":
    main()
