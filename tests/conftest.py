"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

All sharding/collective tests run against `xla_force_host_platform_device_count`
per the multi-chip validation strategy (real multi-chip hardware is exercised
by the driver's `dryrun_multichip`).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
