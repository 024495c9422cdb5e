"""Test harness configuration.

Runs the whole suite on an 8-virtual-device CPU mesh with float64
enabled (SURVEY.md SS4: cluster-free distributed tests + f64 oracle
comparisons).  Environment must be set BEFORE jax is imported anywhere.
"""

import os

# NOTE: this container preloads jax with the TPU ('axon') backend via a
# sitecustomize PYTHONPATH hook, so JAX_PLATFORMS in the environment is
# snapshotted before pytest code runs.  XLA_FLAGS is still read lazily
# at backend init, and the platform choice must go through
# jax.config.update *after* import.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compilation cache — XLA CPU compiles are slow in this
# container; cache them across pytest invocations.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
