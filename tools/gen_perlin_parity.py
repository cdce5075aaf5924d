"""Visual-parity artifact: hash-based Perlin (ours) vs the
permutation-table construction the reference's ``noise`` crate uses
(texture.rs:47-81).

Renders the marble pattern 0.5*(1 - sin(scale*z + 10*turb(p,7))) over
an (x, z) slab with BOTH constructions and writes a side-by-side PNG
(preview/perlin_parity.png) plus their statistics.  The reference seeds
its table randomly per run (texture.rs:55), so only *statistical* and
*visual* agreement is meaningful — the test suite asserts the stats.

    PYTHONPATH= JAX_PLATFORMS=cpu python tools/gen_perlin_parity.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


# --- permutation-table improved Perlin (the noise-crate construction) ----
def _fade(t):
    return t * t * t * (t * (t * 6.0 - 15.0) + 10.0)


def _grad(h, x, y, z):
    h = h & 15
    u = np.where(h < 8, x, y)
    v = np.where(h < 4, y, np.where((h == 12) | (h == 14), x, z))
    return np.where(h & 1 == 0, u, -u) + np.where(h & 2 == 0, v, -v)


def perm_noise3(points, seed=0):
    """Classic permutation-table Perlin: perm[perm[perm[ix]+iy]+iz]."""
    rng = np.random.default_rng(seed)
    perm = rng.permutation(256)
    perm = np.concatenate([perm, perm, perm])  # headroom for +1 chains

    pf = np.floor(points)
    pi = pf.astype(np.int64)
    x, y, z = (points - pf).T if points.ndim == 2 else np.moveaxis(points - pf, -1, 0)
    ix, iy, iz = np.moveaxis(pi & 255, -1, 0)

    u, v, w = _fade(x), _fade(y), _fade(z)

    def corner(dx, dy, dz):
        h = perm[perm[perm[(ix + dx) & 255] + ((iy + dy) & 255)] + ((iz + dz) & 255)]
        return _grad(h, x - dx, y - dy, z - dz)

    def lerp(t, lo, hi):
        return lo + t * (hi - lo)

    return lerp(w,
                lerp(v, lerp(u, corner(0, 0, 0), corner(1, 0, 0)),
                     lerp(u, corner(0, 1, 0), corner(1, 1, 0))),
                lerp(v, lerp(u, corner(0, 0, 1), corner(1, 0, 1)),
                     lerp(u, corner(0, 1, 1), corner(1, 1, 1))))


def perm_marble(points, seed=0, scale=4.0, depth=7):
    acc = np.zeros(points.shape[:-1])
    p = points.copy()
    weight = 1.0
    for _ in range(depth):
        acc = acc + weight * perm_noise3(p, seed)
        weight *= 0.5
        p = p * 2.0
    turb = np.abs(acc)
    return 0.5 * (1.0 - np.sin(scale * points[..., 2] + 10.0 * turb))


def slab_points(n=256, extent=4.0):
    xs = np.linspace(0.0, extent, n)
    zs = np.linspace(0.0, extent, n)
    X, Z = np.meshgrid(xs, zs)
    return np.stack([X, np.full_like(X, 0.5), Z], axis=-1)


def stats(img):
    gx = np.abs(np.diff(img, axis=1)).mean()
    return dict(mean=float(img.mean()), std=float(img.std()),
                grad=float(gx), lo=float(img.min()), hi=float(img.max()))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from rust_pathtracer_tpu import perlin

    pts = slab_points()
    ours = np.asarray(perlin.marble(jnp.asarray(pts, jnp.float32),
                                    jnp.uint32(0), 4.0))
    ref = perm_marble(pts.astype(np.float64), seed=0, scale=4.0)

    s1, s2 = stats(ours), stats(ref)
    print("ours (hash lattice):     ", s1)
    print("noise-crate construction:", s2)

    side = np.concatenate([ours, np.ones((ours.shape[0], 8)), ref], axis=1)
    rgb = np.clip(side * 255.999, 0, 255).astype(np.uint8)
    rgb = np.stack([rgb] * 3, axis=-1)
    from rust_pathtracer_tpu.utils.image import write_png

    out = os.path.join(os.path.dirname(__file__), "..", "preview",
                       "perlin_parity.png")
    write_png(out, rgb)
    print(f"wrote {os.path.abspath(out)}  (left: ours, right: perm-table)")


if __name__ == "__main__":
    main()
