"""Test harness bootstrap.

The test suite runs on a virtual 8-device CPU mesh (SURVEY.md §4:
``--xla_force_host_platform_device_count=8``) so sharding tests run
anywhere without a TPU slice.  In the axon TPU environment a
sitecustomize hook force-registers the TPU backend before conftest
loads, so merely setting env vars here is too late — instead we
re-exec pytest once with a cleaned environment (no sitecustomize,
JAX_PLATFORMS=cpu).  Benchmarks (bench.py) keep the real TPU backend.
"""

import os
import sys

if os.environ.get("RPT_TESTS_REEXEC") != "1":
    env = dict(os.environ)
    env["PYTHONPATH"] = ""  # drop sitecustomize that pins the TPU backend
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    env["RPT_TESTS_REEXEC"] = "1"
    os.execve(
        sys.executable,
        [sys.executable, "-m", "pytest"] + sys.argv[1:],
        env,
    )

import jax  # noqa: E402

assert jax.default_backend() == "cpu", "tests must run on the CPU mesh"
