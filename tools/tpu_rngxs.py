"""Round-4 probe: per-bounce RNG hoisted to scan xs (RPT_RNG_XS).

Measures ONE config per process (remote compile service hygiene):

  --what fwdbwd   headline: CornellBox 512^2 @4spp, 20-bounce diff scan,
                  loss+grads (same step as bench.py)
  --what fwd      diff-mode forward only (scan, no grad)
  --what nondiff  nondiff while_loop forward

The caller sets RPT_RNG_XS in the environment (read at trace time).
Timed regions end with a real device->host fetch (block_until_ready is
unreliable over the axon tunnel).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site RPT_RNG_XS=1 \
      python tools/tpu_rngxs.py --what fwdbwd
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", choices=["fwdbwd", "fwd", "nondiff"],
                    required=True)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--batches", type=int, default=4)
    args = ap.parse_args()

    from rust_pathtracer_tpu.utils import compcache

    compcache.enable()
    import jax
    import jax.numpy as jnp

    from rust_pathtracer_tpu.grad import CameraParams, DiffParams, apply_params
    from rust_pathtracer_tpu.models import get_scene
    from rust_pathtracer_tpu.render import RenderSettings, render_radiance

    sd = get_scene("CornellBox")
    scene = sd.build()
    settings = RenderSettings(
        width=512, height=512, samples_per_pixel=4, max_bounces=20,
        background=(0.0, 0.0, 0.0), spp_chunk=4,
        differentiable=args.what != "nondiff",
    )
    cam_params = CameraParams.create(
        (278.0, 278.0, -800.0), (278.0, 278.0, 0.0), (0.0, 1.0, 0.0),
        40.0, 1.0, 0.0, 10.0,
    )
    params = DiffParams.from_scene(scene, cam_params, settings.background)
    key = jax.random.PRNGKey(0)

    if args.what == "fwdbwd":
        def loss_fn(params):
            s = apply_params(scene, params)
            img, stats = render_radiance(
                s, params.camera.build(), settings, key,
                background=params.background)
            return jnp.mean(img), stats.segments

        step = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))

        # NOTE: dispatch only — the timed batch ends with ONE fetch
        # (sync()).  Fetching per rep costs ~20 ms of tunnel round
        # trip per tiny array and inflated the first version of this
        # probe by ~70 ms/step vs bench.py.
        def run():
            (loss, segments), grads = step(params)
            return loss, segments, grads

        def sync(out):
            loss, segments, grads = out
            leaves = jax.tree_util.tree_leaves(grads)
            _ = float(sum(jnp.sum(jnp.abs(g)) for g in leaves))
            return float(loss), float(segments)
    elif args.what == "fwd":
        def fwd_fn(params):
            s = apply_params(scene, params)
            img, stats = render_radiance(
                s, params.camera.build(), settings, key,
                background=params.background)
            return jnp.mean(img), stats.segments

        step = jax.jit(fwd_fn)

        def run():
            return step(params)

        def sync(out):
            loss, segments = out
            return float(loss), float(segments)
    else:
        cam = sd.camera_at(0.0)

        @jax.jit
        def nd():
            img, stats = render_radiance(scene, cam, settings, key)
            return jnp.mean(img), stats.segments

        def run():
            return nd()

        def sync(out):
            loss, segments = out
            return float(loss), float(segments)

    loss, segs = sync(run())
    print(f"# warmup: loss={loss:.6f} segs={segs:.0f}", file=sys.stderr)

    def one_batch():
        t0 = time.perf_counter()
        out = None
        for _ in range(args.reps):
            out = run()
        sync(out)
        return (time.perf_counter() - t0) / args.reps

    times = sorted(one_batch() for _ in range(args.batches))
    while (times[-1] - times[0]) / times[len(times) // 2] > 0.10 \
            and len(times) < 10:
        times.append(one_batch())
        times.sort()
    med = times[len(times) // 2]
    print(json.dumps({
        "what": args.what,
        "rng_xs": os.environ.get("RPT_RNG_XS", "0"),
        "ms": round(med * 1e3, 2),
        "min_ms": round(times[0] * 1e3, 2),
        "max_ms": round(times[-1] * 1e3, 2),
        "batches": len(times),
        "loss": loss,
        "segments": segs,
        "load1": round(os.getloadavg()[0], 2),
    }))


if __name__ == "__main__":
    main()
