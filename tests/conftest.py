import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware. Must be set before jax import.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402


REF_ROOT = "/root/reference/Test_Cases/TURBOLENT"


@pytest.fixture(scope="session")
def combustion_dir():
    return os.path.join(REF_ROOT, "TURBOLENT_COMBUSTION")


@pytest.fixture(scope="session")
def flatplate_dir():
    return os.path.join(REF_ROOT, "TURBOLENT_FLAT_PLATE")
