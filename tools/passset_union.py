"""Measure the block-union culling OPPORTUNITY of pass-set sorting.

The v4 kernel sweeps, per 1024-ray block, every 128-column cluster the
block's UNION of rays passes.  Round-2 finding: on ModelTest bounce-1
rays each ray passes ~2.56 cluster AABBs but block unions plateau at
29-43 of ~80 under every PROXY sort key tried (entry cluster, octant,
Morton origin).  This tool measures the union under the EXACT key —
sort rays lexicographically by their full pass-set bitmask — which
groups identical pass-sets into the same blocks by construction.

Pure jnp + numpy measurement (no kernel), CPU-runnable:

    PYTHONPATH= JAX_PLATFORMS=cpu python tools/passset_union.py [W H]

Reports, for bounce-1 (diffuse-born) and bounce-0 (camera) rays:
  per-ray ideal        mean pass-set size over alive rays
  unsorted             mean/max block-union size, total sweep work
  entry (production)   cluster_entry_key sort (current RPT_BIN key)
  entry+octant         the production cluster_octant_perm compound key
  passset              exact bitmask lexicographic sort
  passset+entry        entry as primary, bitmask to break ties

"total work" = sum over blocks of union size (the number of
(block, cluster) sweeps the kernel runs); the speedup column is
relative to the unsorted union.
"""
import os
import sys
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from rust_pathtracer_tpu import sampling
from rust_pathtracer_tpu import vecmath as vm
from rust_pathtracer_tpu.camera import camera_rays
from rust_pathtracer_tpu.integrator import search_and_record
from rust_pathtracer_tpu.materials import scatter, shade_inputs
from rust_pathtracer_tpu.models import get_scene
from rust_pathtracer_tpu.ops.projected import T_MISS
from rust_pathtracer_tpu.scene.obj_loader import write_benchmark_obj

W = int(sys.argv[1]) if len(sys.argv) > 1 else 256
H = int(sys.argv[2]) if len(sys.argv) > 2 else 256
BLOCK = 1024
T_MIN = 1e-3

objp = os.path.join(tempfile.mkdtemp(), "model.obj")
write_benchmark_obj(objp)
sd = get_scene("ModelTest", obj_path=objp)
scene = sd.build()
cam = sd.camera_at(0.0)
assert scene.proj is not None, "ModelTest must route to the projected sweep"
cb = np.asarray(scene.proj.cluster_bounds)  # (6, G)
G = cb.shape[1]

R = W * H
key = jax.random.PRNGKey(0)
lkeys = sampling.lane_keys(key, jnp.arange(R, dtype=jnp.uint32))
jit_u = sampling.uniform2(sampling.bounce_keys(lkeys, 0, sampling.P_PIXEL_JITTER))
col = jnp.arange(R) % W
row = jnp.arange(R) // W
u = (col + jit_u[:, 0]) / (W - 1.0)
v = ((H - 1 - row) + jit_u[:, 1]) / (H - 1.0)
lens = sampling.bounce_keys(lkeys, 0, sampling.P_LENS)
o0, d0 = camera_rays(cam, u, v, lens)
alive0 = jnp.ones(R, bool)

# one real bounce -> diffuse-born bounce-1 rays
hit, rec, shade_row, _cl = search_and_record(scene, o0, d0, alive0)
si = shade_inputs(scene, rec, shade_row)
sphere_dir = sampling.on_unit_sphere(sampling.bounce_keys(lkeys, 0, sampling.P_LAMBERT))
ball_dir = sampling.in_unit_sphere(sampling.bounce_keys(lkeys, 0, sampling.P_FUZZ))
coin = sampling.uniform(sampling.bounce_keys(lkeys, 0, sampling.P_SCHLICK))
sc = scatter(scene, rec, d0, sphere_dir, ball_dir, coin, si)
alive1 = np.asarray(hit & sc.did_scatter)
o1 = np.asarray(vm.where(hit, rec.point, o0))
d1 = np.asarray(vm.where(hit, sc.direction, d0))


def pass_masks(o, d, alive):
    """(R, G) bool: conservative slab pass per (ray, cluster); dead
    rays pass nothing (they are parked and swept by no cluster)."""
    o = jnp.asarray(o)
    d = jnp.asarray(d)
    tiny = np.float32(1e-30)
    dsafe = jnp.where(jnp.abs(d) < tiny, jnp.where(d < 0.0, -tiny, tiny), d)
    inv_d = 1.0 / dsafe
    lo = jnp.full((o.shape[0], G), np.float32(T_MIN))
    hi = jnp.full((o.shape[0], G), T_MISS)
    for ax in range(3):
        b0 = (cb[ax][None, :] - o[:, ax:ax + 1]) * inv_d[:, ax:ax + 1]
        b1 = (cb[3 + ax][None, :] - o[:, ax:ax + 1]) * inv_d[:, ax:ax + 1]
        lo = jnp.maximum(lo, jnp.minimum(b0, b1))
        hi = jnp.minimum(hi, jnp.maximum(b0, b1))
    return np.asarray((hi >= lo) & jnp.asarray(alive)[:, None])


def block_stats(masks, perm):
    m = masks[perm]
    nb = m.shape[0] // BLOCK
    m = m[: nb * BLOCK].reshape(nb, BLOCK, G)
    union = m.any(axis=1).sum(axis=1)
    return union.mean(), union.max(), union.sum()


def entry_key_np(o, d, alive):
    from rust_pathtracer_tpu.ops.projected import cluster_entry_key

    k = np.asarray(cluster_entry_key(jnp.asarray(cb), jnp.asarray(o),
                                     jnp.asarray(d), T_MIN))
    return np.where(alive, k, G)


def octant_np(d):
    return ((d[:, 0] < 0).astype(np.int64) * 4 + (d[:, 1] < 0) * 2
            + (d[:, 2] < 0)).astype(np.int64)


def report(tag, o, d, alive):
    masks = pass_masks(o, d, alive)
    ideal = masks.sum(1)[alive].mean() if alive.any() else 0.0
    words = np.zeros((R, (G + 63) // 64), np.uint64)
    for g in range(G):
        words[:, g // 64] |= masks[:, g].astype(np.uint64) << np.uint64(g % 64)
    ek = entry_key_np(o, d, alive)
    oc = octant_np(d)
    perms = {
        "unsorted": np.arange(R),
        "entry": np.lexsort((np.arange(R), ek)),
        "entry+octant": np.lexsort((np.arange(R), oc, ek)),
        "passset": np.lexsort((np.arange(R),) + tuple(
            words[:, i] for i in range(words.shape[1]))),
        "passset+entry": np.lexsort((np.arange(R),) + tuple(
            words[:, i] for i in range(words.shape[1])) + (ek,)),
    }
    base = None
    print(f"\n{tag}: alive={alive.mean():.3f} per-ray ideal={ideal:.2f} "
          f"of G={G}")
    for name, perm in perms.items():
        mean_u, max_u, work = block_stats(masks, perm)
        if base is None:
            base = work
        print(f"  {name:15s} union mean={mean_u:6.2f} max={max_u:3d} "
              f"work={work:7d} speedup={base / max(work, 1):5.2f}x",
              flush=True)


report("bounce0 (camera)", o0, d0, np.asarray(alive0))
report("bounce1 (diffuse-born)", o1, d1, alive1)
