import jax.numpy as jnp
import numpy as np

from rust_pathtracer_tpu import perlin


def test_seed_deterministic_and_distinct():
    pts = jnp.asarray(np.random.default_rng(0).uniform(-20, 20, (512, 3)), jnp.float32)
    a = np.asarray(perlin.noise3(pts, 0))
    b = np.asarray(perlin.noise3(pts, 0))
    c = np.asarray(perlin.noise3(pts, 1))
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)


def test_noise_range_and_continuity():
    pts = jnp.asarray(np.random.default_rng(0).uniform(-20, 20, (2048, 3)), jnp.float32)
    n = np.asarray(perlin.noise3(pts, 0))
    assert n.min() >= -1.1 and n.max() <= 1.1
    assert n.std() > 0.05
    # continuity: small perturbation -> small change
    eps = 1e-3
    n2 = np.asarray(perlin.noise3(pts + eps, 0))
    assert np.abs(n2 - n).max() < 0.05


def test_noise_zero_at_lattice():
    # improved Perlin is zero at integer lattice points
    pts = jnp.asarray([[0, 0, 0], [1, 2, 3], [-4, 5, -6]], jnp.float32)
    n = np.asarray(perlin.noise3(pts, 0))
    assert np.allclose(n, 0.0, atol=1e-6)


def test_corner_hash_decorrelated():
    # the arithmetic hash must not correlate along lattice axes:
    # gradient ids over a 16^3 block should cover all 16 values evenly
    ix, iy, iz = np.meshgrid(*([np.arange(16)] * 3), indexing="ij")
    h = np.asarray(
        perlin._hash3(
            jnp.asarray(ix), jnp.asarray(iy), jnp.asarray(iz), jnp.uint32(0)
        )
        & 15
    ).ravel()
    counts = np.bincount(h, minlength=16)
    assert counts.min() > 0.7 * counts.mean()
    assert counts.max() < 1.3 * counts.mean()


def test_turbulence_nonnegative():
    pts = jnp.asarray(np.random.default_rng(1).uniform(-5, 5, (512, 3)), jnp.float32)
    t = np.asarray(perlin.turbulence(pts, 0))
    assert (t >= 0).all()


def test_marble_bounds():
    pts = jnp.asarray(np.random.default_rng(2).uniform(-5, 5, (512, 3)), jnp.float32)
    m = np.asarray(perlin.marble(pts, 0, 4.0))
    assert m.min() >= 0.0 and m.max() <= 1.0


def test_marble_statistical_parity_with_perm_table():
    """Our hash-lattice marble must be statistically indistinguishable
    from the noise-crate permutation-table construction (texture.rs:
    47-81 seeds its table randomly per run, so only distributional
    agreement is well-defined).  Visual artifact:
    preview/perlin_parity.png (tools/gen_perlin_parity.py)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from gen_perlin_parity import perm_marble, slab_points, stats

    from rust_pathtracer_tpu import perlin

    pts = slab_points(n=128)
    ours = stats(np.asarray(perlin.marble(
        jnp.asarray(pts, jnp.float32), jnp.uint32(0), 4.0)))
    ref = stats(perm_marble(pts.astype(np.float64), seed=0, scale=4.0))
    assert abs(ours["mean"] - ref["mean"]) < 0.05
    assert abs(ours["std"] - ref["std"]) < 0.05
    # similar spatial frequency content (mean |d/dx|)
    assert abs(ours["grad"] - ref["grad"]) < 0.02
    assert 0.0 <= ours["lo"] and ours["hi"] <= 1.0
