import jax.numpy as jnp
import numpy as np

from rust_pathtracer_tpu import perlin


def test_permutation_table_deterministic():
    a = perlin.permutation_table(0)
    b = perlin.permutation_table(0)
    c = perlin.permutation_table(1)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)
    assert len(a) == 512 and sorted(set(a.tolist())) == list(range(256))


def test_noise_range_and_continuity():
    perm = jnp.asarray(perlin.permutation_table(0))
    pts = jnp.asarray(np.random.default_rng(0).uniform(-20, 20, (2048, 3)), jnp.float32)
    n = np.asarray(perlin.noise3(pts, perm))
    assert n.min() >= -1.1 and n.max() <= 1.1
    assert n.std() > 0.05
    # continuity: small perturbation -> small change
    eps = 1e-3
    n2 = np.asarray(perlin.noise3(pts + eps, perm))
    assert np.abs(n2 - n).max() < 0.05


def test_noise_zero_at_lattice():
    # improved Perlin is zero at integer lattice points
    perm = jnp.asarray(perlin.permutation_table(0))
    pts = jnp.asarray([[0, 0, 0], [1, 2, 3], [-4, 5, -6]], jnp.float32)
    n = np.asarray(perlin.noise3(pts, perm))
    assert np.allclose(n, 0.0, atol=1e-6)


def test_turbulence_nonnegative():
    perm = jnp.asarray(perlin.permutation_table(0))
    pts = jnp.asarray(np.random.default_rng(1).uniform(-5, 5, (512, 3)), jnp.float32)
    t = np.asarray(perlin.turbulence(pts, perm))
    assert (t >= 0).all()


def test_marble_bounds():
    perm = jnp.asarray(perlin.permutation_table(0))
    pts = jnp.asarray(np.random.default_rng(2).uniform(-5, 5, (512, 3)), jnp.float32)
    m = np.asarray(perlin.marble(pts, perm, 4.0))
    assert m.min() >= 0.0 and m.max() <= 1.0
