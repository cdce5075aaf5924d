"""Counter-based random sampling for the wavefront path tracer.

The reference draws from a mutable per-thread RNG with rejection loops
(``random_in_unitsphere`` vec3.rs:41-49, ``random_in_unitdisk_xy``
vec3.rs:55-67), which is nondeterministic run-to-run and does not
vectorize.  The TPU design replaces both ideas:

* **Counter-based keys** — every ray lane owns a threefry key derived
  from ``fold_in(base_key, pixel_id * spp + sample_id)``.  Images are
  bitwise reproducible for a given base key regardless of chunking,
  sharding, or resume point (the reference cannot do this at all).
* **Analytic sampling** — rejection loops are replaced by closed-form
  transforms drawing the *same distributions*: uniform-on-sphere via
  (z, phi), uniform-in-ball via cube-root radius scaling, uniform-in-disk
  via sqrt radius.

Per-bounce decorrelation uses ``fold_in(lane_key, bounce * _STRIDE + purpose)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# purpose tags for per-bounce draws
P_PIXEL_JITTER = 0  # 2 uniforms (renderer.rs:22-25)
P_LENS = 1          # 2 uniforms for the aperture disk (camera.rs:47)
P_LAMBERT = 2       # 2 uniforms: on-sphere dir (material.rs:42)
P_FUZZ = 3          # 3 uniforms: in-ball dir (material.rs:84)
P_SCHLICK = 4       # 1 uniform: reflect/refract coin (material.rs:128)
P_ROULETTE = 5      # 1 uniform: optional russian roulette (not in reference)
_STRIDE = 8


def lane_keys(base_key, counters):
    """Per-lane keys from int32/uint32 lane counters, shape (R,) -> (R,2)."""
    return jax.vmap(jax.random.fold_in, in_axes=(None, 0))(base_key, counters)


def bounce_keys(lkeys, bounce, purpose):
    """Fold (bounce, purpose) into per-lane keys. ``bounce`` may be a
    scalar (chunked wavefront) or a per-lane array (regeneration
    wavefront, where every lane sits at its own path depth); the same
    (key, bounce, purpose) always yields the same draw either way."""
    tag = bounce * _STRIDE + purpose
    in_axes = (0, 0) if jnp.ndim(tag) else (0, None)
    return jax.vmap(jax.random.fold_in, in_axes=in_axes)(lkeys, tag)


def _uniforms(keys, n):
    """n iid U[0,1) per lane; keys (R,2) -> (R, n)."""
    return jax.vmap(lambda k: jax.random.uniform(k, (n,), jnp.float32))(keys)


def uniform(keys):
    """One U[0,1) per lane, shape (R,)."""
    return _uniforms(keys, 1)[..., 0]


def uniform2(keys):
    """Two U[0,1) per lane, shape (R, 2)."""
    return _uniforms(keys, 2)


def uniform3(keys):
    """Three U[0,1) per lane, shape (R, 3)."""
    return _uniforms(keys, 3)


def on_unit_sphere_from_u(u):
    """on_unit_sphere's trig transform from (R, 2) uniforms.

    Split out so the RNG-hoist path (integrator._precompute_draws) can
    precompute only the bit-exact uniforms and leave the trig in the
    loop body: transcendentals are the one shape-sensitive piece (XLA
    vectorizes them differently per batch shape, ulp-level), so they
    must run at the SAME shape in every path that claims bitwise
    estimator identity (cascade == plain)."""
    z = 2.0 * u[..., 0] - 1.0
    phi = (2.0 * jnp.pi) * u[..., 1]
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def on_unit_sphere(keys):
    """Uniform direction on S^2, shape (R, 3).

    Same distribution as the reference's rejection-sample-then-normalize
    (``random_on_unitsphere`` vec3.rs:51-53), computed analytically:
    z = 2u-1, phi = 2*pi*v, r = sqrt(1-z^2).
    """
    return on_unit_sphere_from_u(_uniforms(keys, 2))


def in_unit_sphere_from_u(u):
    """in_unit_sphere's transform from (R, 3) uniforms (see
    on_unit_sphere_from_u for why this is split)."""
    z = 2.0 * u[..., 0] - 1.0
    phi = (2.0 * jnp.pi) * u[..., 1]
    rho = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    d = jnp.stack([rho * jnp.cos(phi), rho * jnp.sin(phi), z], axis=-1)
    return d * jnp.cbrt(u[..., 2])[..., None]


def in_unit_sphere(keys):
    """Uniform point in the unit ball, shape (R, 3).

    Same distribution as rejection sampling (vec3.rs:41-49): uniform
    direction scaled by U^(1/3).
    """
    return in_unit_sphere_from_u(_uniforms(keys, 3))


def in_unit_disk_xy(keys):
    """Uniform point in the unit disk in the xy plane, shape (R, 3).

    Same distribution as rejection sampling (vec3.rs:55-67):
    r = sqrt(u), theta = 2*pi*v, z = 0.
    """
    u = _uniforms(keys, 2)
    r = jnp.sqrt(u[..., 0])
    theta = (2.0 * jnp.pi) * u[..., 1]
    return jnp.stack(
        [r * jnp.cos(theta), r * jnp.sin(theta), jnp.zeros_like(r)], axis=-1
    )
