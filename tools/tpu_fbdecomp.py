"""Headline fwd+bwd decomposition probe (round-5 VERDICT item 2).

Times the bench.py step (CornellBox 512^2 @ 4 spp chunk, 20 bounces,
differentiable) under one named config per process:

  base        default fused-diff path (the bench.py step)
  fwdonly     diff forward only (value, no grad) — upper bound on fwd
  nondiff     nondiff forward (differentiable=False)
  probe_zero  RPT_FBD_PROBE=zero: custom-VJP bwd returns zero cots —
              isolates residual SAVE traffic + XLA scan-transpose
              machinery (no bwd kernel, no einsum, no chains)
  probe_notex RPT_FBD_PROBE=notex: skips the packed-color one-hot
              contraction only
  bwd_xla     RPT_FBD_BWD=xla: XLA closed-form chains instead of the
              Pallas transposed-shading kernel

Usage (one config per process — remote-compile hygiene):
  PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_fbdecomp.py base
"""

import json
import os
import sys
import time

CONFIGS = {
    "base": {},
    "fwdonly": {},
    "nondiff": {},
    "probe_zero": {"RPT_FBD_PROBE": "zero"},
    "probe_notex": {"RPT_FBD_PROBE": "notex"},
    "bwd_xla": {"RPT_FBD_BWD": "xla"},
    # scan knobs were last A/B'd on the pre-fused r3 code — re-check
    # against the column-native carry
    "unroll1": {"RPT_SCAN_UNROLL": "1"},
    "unroll4": {"RPT_SCAN_UNROLL": "4"},
    "split_t": {"RPT_SCAN_SPLIT_T": "1"},
    # bf16 residual planes (kernel-rounded, backward upcasts)
    "res_bf16": {"RPT_FBD_RES": "bf16"},
    # whole-scan custom VJP A/B (round 5): "base" runs the default
    # (RPT_FBD_SCAN=vjp); scan_jax restores the lax.scan transpose
    "scan_jax": {"RPT_FBD_SCAN": "jax"},
    # backward-kernel block height (DMA-issue-bound at 8 rows)
    "bwd8": {"RPT_FBD_BWD_ROWS": "8"},
    "bwd128": {"RPT_FBD_BWD_ROWS": "128"},
    # whole-pipeline plane block height (fwd sweep working set)
    "fb16": {"RPT_FB_BLOCK_ROWS": "16"},
    "fb32": {"RPT_FB_BLOCK_ROWS": "32"},
    "fb64": {"RPT_FB_BLOCK_ROWS": "64"},
    "fb128": {"RPT_FB_BLOCK_ROWS": "128"},
    "fb32_bf16": {"RPT_FB_BLOCK_ROWS": "32", "RPT_FBD_RES": "bf16"},
    "fb32_u4": {"RPT_FB_BLOCK_ROWS": "32", "RPT_SCAN_UNROLL": "4"},
    "fb32_nondiff": {"RPT_FB_BLOCK_ROWS": "32"},
}


def main():
    name = sys.argv[1]
    for k, v in CONFIGS[name].items():
        os.environ[k] = v

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
        differentiable=(name not in ("nondiff", "fb32_nondiff")),
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
            s, params.camera.build(), settings, key,
            background=params.background,
        )
        return jnp.mean(img), stats.segments

    # fetch protocol mirrors bench.py: issue REPS steps, ONE
    # device->host fetch at the end of the batch (block_until_ready is
    # unreliable over the axon tunnel; per-rep fetches would add
    # tunnel latency to every rep)
    if name in ("fwdonly", "nondiff", "fb32_nondiff"):
        step = jax.jit(loss_and_segments)

        def batch(reps):
            for _ in range(reps):
                loss, segments = step(params)
            _ = float(loss)
            return segments
    else:
        vg = jax.jit(jax.value_and_grad(loss_and_segments, has_aux=True))

        def batch(reps):
            for _ in range(reps):
                (loss, segments), grads = vg(params)
            leaves = jax.tree_util.tree_leaves(grads)
            _ = float(sum(jnp.sum(jnp.abs(l)) for l in leaves))
            _ = float(loss)
            return segments

    segs = float(batch(1))

    def one_batch(reps=5):
        t0 = time.perf_counter()
        batch(reps)
        return (time.perf_counter() - t0) / reps

    times = sorted(one_batch() for _ in range(4))
    dt = times[len(times) // 2]
    print(json.dumps({
        "config": name,
        "ms": round(dt * 1e3, 2),
        "mrays_s": round(segs / dt / 1e6, 1),
        "batches": [round(t * 1e3, 2) for t in times],
        "host_load1": round(os.getloadavg()[0], 2),
    }), flush=True)


if __name__ == "__main__":
    main()
