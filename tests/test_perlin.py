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
