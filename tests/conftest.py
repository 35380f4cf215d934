import os

# Multi-chip sharding tests run on a virtual 8-device CPU mesh (the standard
# JAX host-device-count trick, SURVEY.md §4.4). The env vars alone are not
# enough when an accelerator platform plugin (axon) is installed, so also
# force the config before any backend initializes.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import pytest

try:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
except ImportError:  # pragma: no cover
    pass


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def ref_lib():
    """Compiled C++ reference decoder, or skip."""
    from tools import ref_shim

    lib = ref_shim.get_lib()
    if lib is None:
        pytest.skip(f"reference shim unavailable: {ref_shim._lib_err}")
    return ref_shim


@pytest.fixture(scope="session")
def ref_example(ref_lib):
    """Compiled reference example CLI binary, or skip."""
    from tools import ref_shim

    exe = ref_shim.build_example()
    if exe is None:
        pytest.skip("reference example binary unavailable")
    return exe


def random_plane(rng, h, w, maxv):
    return rng.integers(0, maxv + 1, size=(h, w), dtype=np.uint16)
