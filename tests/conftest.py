"""Test harness bootstrap.

The suite runs on a virtual 8-device CPU mesh (SURVEY.md §4:
``--xla_force_host_platform_device_count=8``) so sharding tests run
anywhere without a TPU slice.  The axon environment's sitecustomize
imports jax and pins JAX_PLATFORMS=axon before pytest starts, but the
XLA *backends* are created lazily — switching the platform via
jax.config here (before any jax op runs) still works.  (A re-exec
would lose stdout: pytest's capture has already redirected fd 1.)
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.default_backend() == "cpu", "tests must run on the CPU mesh"
assert len(jax.devices()) == 8, "tests expect the virtual 8-device CPU mesh"
