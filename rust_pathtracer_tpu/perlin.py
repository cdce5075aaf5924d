"""Deterministic Perlin noise (improved Perlin, permutation-table based).

The reference delegates to the ``noise`` crate with a *random* seed per
run (texture.rs:55), which makes its perlin scenes unreproducible.  The
TPU framework fixes the seed (default 0) so images are deterministic,
and evaluates noise fully vectorized over ``(..., 3)`` point batches.

Marble pattern + turbulence follow texture.rs:60-80:
  turb(p, depth=7) = | sum_k 0.5^k * noise(2^k * p) |
  value = 0.5 * (1 - sin(scale * z + 10 * turb(p)))
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

TURBULENCE_DEPTH = 7  # texture.rs:80


def permutation_table(seed: int = 0) -> np.ndarray:
    """256-entry permutation, doubled to 512 for unmasked indexing."""
    rng = np.random.default_rng(seed)
    p = rng.permutation(256).astype(np.int32)
    return np.concatenate([p, p])


def _fade(t):
    # 6t^5 - 15t^4 + 10t^3 (improved Perlin quintic)
    return t * t * t * (t * (t * 6.0 - 15.0) + 10.0)


def _grad(h, x, y, z):
    """Gradient dot product for hashed corner h (improved Perlin)."""
    h = h & 15
    u = jnp.where(h < 8, x, y)
    v = jnp.where(h < 4, y, jnp.where((h == 12) | (h == 14), x, z))
    return jnp.where(h & 1 == 0, u, -u) + jnp.where(h & 2 == 0, v, -v)


def noise3(points, perm):
    """Improved Perlin noise at (..., 3) points; output roughly [-1, 1]."""
    perm = jnp.asarray(perm, jnp.int32)
    pf = jnp.floor(points)
    xi = pf.astype(jnp.int32) & 255
    x, y, z = (points - pf)[..., 0], (points - pf)[..., 1], (points - pf)[..., 2]
    ix, iy, iz = xi[..., 0], xi[..., 1], xi[..., 2]

    u, v, w = _fade(x), _fade(y), _fade(z)

    a = perm[ix] + iy
    aa = perm[a] + iz
    ab = perm[a + 1] + iz
    b = perm[ix + 1] + iy
    ba = perm[b] + iz
    bb = perm[b + 1] + iz

    def lerp(t, lo, hi):
        return lo + t * (hi - lo)

    n000 = _grad(perm[aa], x, y, z)
    n100 = _grad(perm[ba], x - 1.0, y, z)
    n010 = _grad(perm[ab], x, y - 1.0, z)
    n110 = _grad(perm[bb], x - 1.0, y - 1.0, z)
    n001 = _grad(perm[aa + 1], x, y, z - 1.0)
    n101 = _grad(perm[ba + 1], x - 1.0, y, z - 1.0)
    n011 = _grad(perm[ab + 1], x, y - 1.0, z - 1.0)
    n111 = _grad(perm[bb + 1], x - 1.0, y - 1.0, z - 1.0)

    return lerp(
        w,
        lerp(v, lerp(u, n000, n100), lerp(u, n010, n110)),
        lerp(v, lerp(u, n001, n101), lerp(u, n011, n111)),
    )


def turbulence(points, perm, depth: int = TURBULENCE_DEPTH):
    """|sum_k 0.5^k noise(2^k p)| (texture.rs:60-72)."""
    acc = jnp.zeros(points.shape[:-1], points.dtype)
    p = points
    weight = 1.0
    for _ in range(depth):
        acc = acc + weight * noise3(p, perm)
        weight *= 0.5
        p = p * 2.0
    return jnp.abs(acc)


def marble(points, perm, scale):
    """Marble pattern 0.5*(1 - sin(scale*z + 10*turb(p))) (texture.rs:76-80).

    Returns (...,) grayscale values in [0, 1].
    """
    t = turbulence(points, perm)
    return 0.5 * (1.0 - jnp.sin(scale * points[..., 2] + 10.0 * t))
