import os

# Tests run on a simulated 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware (the analogue of the reference's
# single-process test suite; see SURVEY.md §4).
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

# The sandbox's sitecustomize registers a remote-TPU backend and overrides
# jax_platforms; env vars alone don't win. Force CPU for the test suite.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
