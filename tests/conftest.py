"""Test harness config.

Tests run on CPU with 8 virtual devices (so multi-chip sharding logic is
exercised without TPU hardware) and with float64 enabled (the reference's
parity tests run in double precision —
``tests/mlls/test_batched_woodbury_marginal_log_likelihood.py:20``).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's sitecustomize force-registers a TPU tunnel backend and
# overrides jax_platforms; pin the tests back to (virtual 8-device) CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
