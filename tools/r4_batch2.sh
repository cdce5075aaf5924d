#!/bin/bash
# Round-4 batch 2: in-kernel RNG transforms (fwd kernel) + bwd A/B.
set -u
cd /root/repo
run() {
  echo "=== $* ==="
  env "$@" PYTHONPATH=/root/repo:/root/.axon_site \
      timeout 2400 python tools/tpu_rngxs.py --what "$WHAT"
}

# cbrt/metal lowering check: tiny metal scene through the fused kernel
echo "=== metal-kernel compile check ==="
env PYTHONPATH=/root/repo:/root/.axon_site timeout 1200 python - <<'EOF'
from rust_pathtracer_tpu.utils import compcache
compcache.enable()
import jax, jax.numpy as jnp
from rust_pathtracer_tpu.scene.builder import SceneBuilder
from rust_pathtracer_tpu.render import RenderSettings, render_radiance
b = SceneBuilder()
b.add_sphere((0, -100.5, -3), 100.0, b.lambertian((0.5, 0.5, 0.5)))
b.add_sphere((0, 0.5, -3), 0.5, b.metal((0.8, 0.7, 0.6), fuzz=0.3))
b.add_sphere((-1.2, 0.5, -3), 0.5, b.dielectric(1.5))
scene = b.build(use_bvh=False)
from rust_pathtracer_tpu.camera import make_camera
cam = make_camera((0.,1.,2.),(0.,0.5,-3.),(0.,1.,0.),50.,1.0)
s = RenderSettings(64, 64, 8, 8, (0.7, 0.8, 1.0))
img, st = render_radiance(scene, cam, s, jax.random.PRNGKey(0))
print("metal fused kernel ok: mean", float(img.mean()), "segs", float(st.segments))
EOF

# (g) nondiff with in-kernel transforms (prev: 50.8 in-body XLA, 43.9 full-hoist)
WHAT=nondiff run DUMMY=1
# (h) fused-diff pallas bwd, fwd now transform-in-kernel (prev 97.3)
WHAT=fwdbwd run RPT_FUSED_BOUNCE_DIFF=1
# (i) + xs hoist in the diff scan (prev 94.96)
WHAT=fwdbwd run RPT_FUSED_BOUNCE_DIFF=1 RPT_RNG_XS=1
# (f) slim-residual XLA bwd A/B (old fat-residual xla bwd was 115.9)
WHAT=fwdbwd run RPT_FUSED_BOUNCE_DIFF=1 RPT_FBD_BWD=xla
echo ALLDONE
