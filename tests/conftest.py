"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware (the JAX-native
way to test multi-device code, see SURVEY.md section 4).

Note: this host's sitecustomize registers the axon TPU plugin and prepends
it to jax_platforms *programmatically*, so setting JAX_PLATFORMS in the
environment is not enough — the config must be updated after import.
"""

import os

# The persistent compile cache may hold remote-compiled CPU executables with
# mismatched machine features (SIGILL risk) — disable it for CPU test runs.
os.environ["EXPANN_TPU_NO_CACHE"] = "1"

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
