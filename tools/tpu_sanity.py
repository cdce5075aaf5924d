"""Post-kernel-change TPU sanity: fused-path scenes on the real chip.

Run after ANY change to the fused kernels / block sizes / scan
structure (the kernel-parity tests only exercise the Pallas
INTERPRETER; Mosaic lowering differences only show on-chip):

  PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_sanity.py

Checks, per fused scene at 64x64@16spp:
  * finite, deterministic (same key -> bitwise-identical image)
  * mean within 1e-3 relative of the CPU composed path's mean
    (expected agreement ~1e-4: few-ulp kernel-vs-jnp float divergence
    flips a handful of discrete decisions; round-5 measured rel
    1.3e-4 / 2.2e-4 / 2.3e-5 with segment counts within ~20 of CPU)

CPU reference means are pinned below from the composed (non-Pallas)
path — regenerate with:
  PYTHONPATH= JAX_PLATFORMS=cpu python tools/tpu_sanity.py --cpu
"""

import sys

import numpy as np

# (name, background, cpu mean @ 64x64x16spp, 10 bounces, PRNGKey(0))
PINNED = [
    ("CornellBox", (0.0, 0.0, 0.0), 0.151527),
    ("LightTest", (0.0, 0.0, 0.0), 0.104574),
    ("TwoSphereCheckers", (1.0, 1.0, 1.0), 0.405705),
]


def main():
    cpu_mode = "--cpu" in sys.argv
    if not cpu_mode:
        from rust_pathtracer_tpu.utils import compcache

        compcache.enable()
    import jax

    from rust_pathtracer_tpu.models import get_scene
    from rust_pathtracer_tpu.render import RenderSettings, render_radiance

    ok = True
    for name, bg, cpu_mean in PINNED:
        sd = get_scene(name)
        scene = sd.build()
        cam = sd.camera_at(0.0)
        s = RenderSettings(64, 64, 16, 10, bg)
        img, st = render_radiance(scene, cam, s, jax.random.PRNGKey(0))
        a = np.asarray(img)
        img2, _ = render_radiance(scene, cam, s, jax.random.PRNGKey(0))
        det = bool((a == np.asarray(img2)).all())
        fin = bool(np.isfinite(a).all())
        rel = abs(a.mean() - cpu_mean) / max(cpu_mean, 1e-9)
        row_ok = fin and det and (cpu_mode or rel < 1e-3)
        ok &= row_ok
        print(f"{name}: mean {a.mean():.6f} (cpu pin {cpu_mean:.6f}, "
              f"rel {rel:.2e}) finite={fin} deterministic={det} "
              f"segs={float(st.segments):.0f} "
              f"{'OK' if row_ok else 'FAIL'}", flush=True)
    print("SANITY_OK" if ok else "SANITY_FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
