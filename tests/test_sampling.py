import jax
import jax.numpy as jnp
import numpy as np

from rust_pathtracer_tpu import sampling


def _keys(n, seed=0):
    return sampling.lane_keys(jax.random.PRNGKey(seed), jnp.arange(n, dtype=jnp.uint32))


def test_on_unit_sphere_distribution():
    k = _keys(20000)
    v = np.asarray(sampling.on_unit_sphere(k))
    r = np.linalg.norm(v, axis=-1)
    assert np.allclose(r, 1.0, atol=1e-5)
    # uniform on sphere: each coordinate mean ~0, var = 1/3
    assert np.all(np.abs(v.mean(0)) < 0.02)
    assert np.allclose(v.var(0), 1.0 / 3.0, atol=0.02)


def test_in_unit_sphere_distribution():
    k = _keys(20000, seed=1)
    v = np.asarray(sampling.in_unit_sphere(k))
    r = np.linalg.norm(v, axis=-1)
    assert r.max() <= 1.0 + 1e-6
    # uniform in ball: r^3 ~ U[0,1]
    u = np.sort(r**3)
    ks = np.abs(u - np.linspace(0, 1, len(u))).max()
    assert ks < 0.02


def test_in_unit_disk():
    k = _keys(20000, seed=2)
    v = np.asarray(sampling.in_unit_disk_xy(k))
    assert np.all(v[:, 2] == 0.0)
    r = np.linalg.norm(v[:, :2], axis=-1)
    assert r.max() <= 1.0 + 1e-6
    u = np.sort(r**2)
    ks = np.abs(u - np.linspace(0, 1, len(u))).max()
    assert ks < 0.02


def test_counter_keys_deterministic_and_layout_invariant():
    base = jax.random.PRNGKey(42)
    k1 = sampling.lane_keys(base, jnp.array([5, 6, 7], dtype=jnp.uint32))
    k2 = sampling.lane_keys(base, jnp.array([7, 5], dtype=jnp.uint32))
    u1 = np.asarray(sampling.uniform(k1))
    u2 = np.asarray(sampling.uniform(k2))
    assert u1[2] == u2[0]  # counter 7 gives the same draw regardless of layout
    assert u1[0] == u2[1]


def test_purpose_decorrelation():
    k = _keys(1000, seed=3)
    a = np.asarray(sampling.uniform(sampling.bounce_keys(k, 0, sampling.P_LAMBERT)))
    b = np.asarray(sampling.uniform(sampling.bounce_keys(k, 0, sampling.P_FUZZ)))
    c = np.asarray(sampling.uniform(sampling.bounce_keys(k, 1, sampling.P_LAMBERT)))
    assert abs(np.corrcoef(a, b)[0, 1]) < 0.1
    assert abs(np.corrcoef(a, c)[0, 1]) < 0.1
