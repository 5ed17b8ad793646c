"""Test configuration: force an 8-device virtual CPU mesh.

The JAX analog of the reference's file://-rendezvous multi-process simulation
(reference src/train.py:359-366): N virtual devices on one host let every
sharding/collective path run in CI without TPU pods.

NOTE: the axon TPU plugin ignores the JAX_PLATFORMS env var, so we force the
platform through jax.config before any jax usage.
"""
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: the big programs (train step with the ADA
# pipe, metric extraction) take minutes to compile on a 1-core XLA:CPU
# host and dominate suite wall-clock; repeat runs hit the cache instead.
# Keyed by HLO + compile options, so code changes recompile as usual.
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_test_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
