"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

This build's axon TPU plugin ignores the JAX_PLATFORMS env var, so the
platform must be forced via jax.config before any backend initialization;
XLA_FLAGS still must be set before import for the virtual device count.
Sharding/collective tests then run on 8 virtual CPU devices (real
multi-chip is exercised by the driver's `dryrun_multichip`).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if os.environ.get("CAP_TPU_RUN_SLOW") != "1":
    # fast suite: virtual 8-device CPU mesh.  The slow suite (real proofs)
    # keeps the TPU backend instead.
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
