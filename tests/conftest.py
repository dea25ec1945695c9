import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
# exercised without TPU hardware (the driver separately dry-runs multichip
# and bench.py targets the real chip).  The container's sitecustomize forces
# JAX_PLATFORMS=axon (remote TPU tunnel); per-dispatch tunnel latency makes
# unit tests impractical there.  jax is already imported at this point, so
# steer it to CPU via config.update (env vars were captured at import time).
if "host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


def pytest_configure(config):
    assert jax.devices()[0].platform == "cpu", (
        "tests must run on CPU; launch pytest with PALLAS_AXON_POOL_IPS= "
        "JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8"
    )
