"""Headline benchmark: rays/sec/chip on CornellBox 512x512, forward+backward.

BASELINE.json north star: "rays/sec/chip (CornellBox 512^2 fwd+bwd)".
Prints exactly ONE JSON line:

  {"metric": ..., "value": N, "unit": "rays/s", "vs_baseline": N}

rays = ray SEGMENTS traced by the forward wavefront (the integrator
counts every alive lane at every bounce — the same unit a CPU tracer's
"rays cast" counter measures); time = wall clock of one jitted
forward+backward step (loss + gradients w.r.t. texture colors / texels /
camera / background), after compile + warmup.

vs_baseline: the reference publishes NO numbers (BASELINE.md), and no
Rust toolchain exists in this image to measure it, so the denominator
is a documented ESTIMATE of the reference on a 16-core CPU:
RTiOW-style tracers run ~0.3-1.0 Mray/s/core on scenes of this size;
rayon across 16 cores => ~8 Mray/s (forward only; the reference has no
backward at all).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

REFERENCE_CPU_RAYS_PER_SEC_ESTIMATE = 8.0e6

WIDTH = HEIGHT = 512
SPP_CHUNK = 4          # 512*512*4 = ~1M lanes per wavefront
MAX_BOUNCES = 20       # CornellBox setting (scene.rs:337)
REPS = 5               # steps per timed batch
N_BATCHES = 5          # initial timed batches (median reported)
MAX_BATCHES = 12       # extra batches drawn while spread > SPREAD_TOL
SPREAD_TOL = 0.10      # (max-min)/median across batches


def main():
    from rust_pathtracer_tpu.utils import compcache

    compcache.enable()
    from rust_pathtracer_tpu.grad import CameraParams, DiffParams, apply_params
    from rust_pathtracer_tpu.models import get_scene
    from rust_pathtracer_tpu.render import RenderSettings, render_radiance

    sd = get_scene("CornellBox")
    scene = sd.build()
    settings = RenderSettings(
        width=WIDTH,
        height=HEIGHT,
        samples_per_pixel=SPP_CHUNK,
        max_bounces=MAX_BOUNCES,
        background=(0.0, 0.0, 0.0),
        spp_chunk=SPP_CHUNK,
        differentiable=True,
    )
    cam_params = CameraParams.create(
        (278.0, 278.0, -800.0), (278.0, 278.0, 0.0), (0.0, 1.0, 0.0),
        40.0, 1.0, 0.0, 10.0,
    )
    params = DiffParams.from_scene(scene, cam_params, settings.background)
    key = jax.random.PRNGKey(0)

    def loss_and_segments(params):
        s = apply_params(scene, params)
        img, stats = render_radiance(
            s, params.camera.build(), settings, key, background=params.background
        )
        # mean-brightness objective: nonzero cotangents everywhere
        return jnp.mean(img), stats.segments

    step = jax.jit(jax.value_and_grad(loss_and_segments, has_aux=True))

    # NOTE: block_until_ready is not reliable over the axon remote
    # backend (compute can land in the next host fetch) — every timed
    # region must end with an actual device->host scalar fetch.
    def grad_checksum(grads):
        leaves = jax.tree_util.tree_leaves(grads)
        return float(sum(jnp.sum(jnp.abs(l)) for l in leaves))

    # compile + warmup
    (loss, segments), grads = step(params)
    segs = float(segments)
    _ = grad_checksum(grads)
    print(
        f"# warmup ok: loss={float(loss):.5f} segments/pass={segs:.0f} "
        f"avg_depth={segs / (WIDTH * HEIGHT * SPP_CHUNK):.2f}",
        file=sys.stderr,
    )

    # Median-of-batches timing with a spread guard: the round-2 driver
    # capture regressed 26% purely from host/tunnel load (a single
    # 5-rep mean has no defense).  Each batch is REPS steps ended by a
    # real device->host fetch; the reported number is the MEDIAN batch,
    # and while the relative spread (max-min)/median exceeds
    # SPREAD_TOL extra batches are drawn (noise shows up as a
    # right-tail — the median converges to the unloaded time).
    def one_batch():
        t0 = time.perf_counter()
        for _ in range(REPS):
            (loss, segments), grads = step(params)
        _ = grad_checksum(grads)
        _ = float(loss)
        return (time.perf_counter() - t0) / REPS

    times = [one_batch() for _ in range(N_BATCHES)]
    times.sort()

    def spread(ts):
        return (ts[-1] - ts[0]) / ts[len(ts) // 2]

    while spread(times) > SPREAD_TOL and len(times) < MAX_BATCHES:
        times.append(one_batch())
        times.sort()
    dt = times[len(times) // 2]

    # Degraded-environment detection: when the spread guard exhausts
    # its batches still far above tolerance with an idle host, the
    # remote tunnel/service itself is noisy (observed evening of
    # 2026-08-20: a trivial 20-dispatch+fetch probe swung 49-113 ms
    # while the same binary measured 53.9 ms at 0.7% spread hours
    # earlier).  Report the condition and the best batch so a bad
    # capture is distinguishable from a real regression.
    degraded = spread(times) > 3 * SPREAD_TOL

    try:
        load1 = os.getloadavg()[0]
    except OSError:
        load1 = -1.0

    rays_per_sec = segs / dt
    print(
        f"# fwd+bwd step: median {dt * 1e3:.1f} ms over {len(times)} "
        f"batches of {REPS} (min {times[0]*1e3:.1f}, max {times[-1]*1e3:.1f},"
        f" spread {spread(times)*100:.1f}%) for {segs:.0f} segments;"
        f" load1={load1:.1f}",
        file=sys.stderr,
    )

    # roofline: what binds this step, and how close to speed of light?
    from rust_pathtracer_tpu.utils.metrics import roofline_report

    lanes = WIDTH * HEIGHT * SPP_CHUNK
    rl = roofline_report(
        scene, lanes, bounces=segs / lanes, measured_seconds=dt,
        backward=True,
    )
    print(
        f"# roofline: bound={rl['bound']} sol={rl['sol_seconds']*1e3:.1f} ms"
        f" achieved={rl['sol_fraction']*100:.0f}% of speed-of-light"
        f" stages={rl['stages']}",
        file=sys.stderr,
    )
    # Historical "structural floor" (round 2, DESIGN.md §10): nondiff
    # while_loop forward 53.8 ms + residual round-trip ~6 ms +
    # transposed shading sweep 26.8 ms = 86.6.  Kept CONSTANT as the
    # continuity anchor: floor_fraction > 1 measures how far the
    # fused-bounce family (§13) + whole-scan VJP + 32-row blocks (§14)
    # have pushed past what round 2 argued was structural.
    floor_ms = 53.8 + 6.0 + 26.8
    print(
        json.dumps(
            {
                "metric": "rays/sec/chip CornellBox 512^2 fwd+bwd",
                "value": rays_per_sec,
                "unit": "rays/s",
                "vs_baseline": rays_per_sec / REFERENCE_CPU_RAYS_PER_SEC_ESTIMATE,
                "roofline_bound": rl["bound"],
                "roofline_sol_fraction": round(rl["sol_fraction"], 3),
                "structural_floor_ms": floor_ms,
                "floor_fraction": round(floor_ms / (dt * 1e3), 3),
                "timing_batches": len(times),
                "timing_spread": round(spread(times), 4),
                "best_batch_ms": round(times[0] * 1e3, 1),
                "degraded_environment": degraded,
                "host_load1": round(load1, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
