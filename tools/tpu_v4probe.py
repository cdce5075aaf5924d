"""v4 table-resident kernel on-chip probe: compile, correctness vs
v2, and JITTED per-call timing (the eager wrapper adds ~100-200 ms of
per-op tunnel dispatch — see tpu_v3probe — so both kernels are timed
inside one jit here).

    python tools/tpu_v4probe.py [ModelTest|SphereField] [nrays_log2]

Timings end in a real device->host fetch.  One config per process.
"""
import sys
import time

from rust_pathtracer_tpu.utils import compcache

compcache.enable()

import jax
import jax.numpy as jnp
import numpy as np

from rust_pathtracer_tpu.models import get_scene
from rust_pathtracer_tpu.ops.projected import closest_hit_projected
from rust_pathtracer_tpu.ops.resident import closest_hit_resident
from rust_pathtracer_tpu.scene.obj_loader import write_benchmark_obj

name = sys.argv[1] if len(sys.argv) > 1 else "ModelTest"
n = 1 << (int(sys.argv[2]) if len(sys.argv) > 2 else 17)

kw = {}
if name == "ModelTest":
    write_benchmark_obj("/tmp/rock.obj")
    kw = {"obj_path": "/tmp/rock.obj"}
sd = get_scene(name, **kw)
scene = sd.build()
tables = scene.proj
print(f"backend={jax.default_backend()} cols={tables.num_cols} "
      f"groups={len(tables.group_kinds)} rays={n}", flush=True)

cam = sd.camera_at(0.0)
rng = np.random.default_rng(0)
u = jnp.asarray(rng.uniform(0, 1, (n,)), jnp.float32)
v = jnp.asarray(rng.uniform(0, 1, (n,)), jnp.float32)
from rust_pathtracer_tpu.camera import camera_rays

lens_keys = jax.random.split(jax.random.PRNGKey(0), n)
o, d = camera_rays(cam, u, v, lens_keys)

v4 = jax.jit(lambda o, d: closest_hit_resident(tables, o, d, 1e-3))
v2 = jax.jit(lambda o, d: closest_hit_projected(tables, o, d, 1e-3))


def timed(f, label, reps=5):
    t0 = time.perf_counter()
    h, t, pay = f(o, d)
    s = float(t.sum())  # device->host fetch = real sync
    tw = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        h, t, pay = f(o, d)
    s = float(t.sum())
    dt = (time.perf_counter() - t0) / reps
    print(f"{label}: warm {tw:.1f}s, run {dt*1e3:.2f} ms", flush=True)
    return np.asarray(h), np.asarray(t), np.asarray(pay)


h4, t4, p4 = timed(v4, "v4 resident")
h2, t2, p2 = timed(v2, "v2 dense")

print("hits equal:", (h2 == h4).all())
same_pay = (p2 == p4).all(axis=1)
print("payload equal:", float(same_pay[h2].mean()))
ok = np.allclose(t2[h2], t4[h2], rtol=1e-5, atol=1e-6)
print("t allclose:", ok, "max rel diff:",
      float(np.max(np.abs(t2[h2] - t4[h2]) / np.maximum(t2[h2], 1e-6), initial=0)))
print("ALL_OK" if (h2 == h4).all() and ok else "MISMATCH", flush=True)
