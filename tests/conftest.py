"""Test harness: run everything on a simulated 8-device CPU mesh.

Must set XLA flags before jax initializes (the JAX-native analogue of a fake
distributed backend; see SURVEY.md §4 implications).
"""

import os

# force-set: the environment may pre-export JAX_PLATFORMS (e.g. a TPU tunnel
# plugin that even overrides the env var at import time), and tests must run
# on the local simulated-8-device CPU backend
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the env var alone is not sufficient under the tunnel plugin; the config
# update is authoritative
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# persistent compile cache: repeat suite runs skip the scan/conv compiles
# that dominate wall time (first run is unchanged)
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("IVG_TEST_JAX_CACHE", "/tmp/ivg_test_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

assert jax.devices()[0].platform == "cpu", jax.devices()
