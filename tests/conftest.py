import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware.
#
# NOTE: this image preloads jax via a sitecustomize and pins
# JAX_PLATFORMS=axon (TPU-over-tunnel), so plain env setdefault is NOT enough
# — we must override the env var and the live config before any backend
# initialization.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compilation cache: the suite is compile-bound on small hosts
# (single coupled-step VJP compiles measured at 2m30s); repeat runs reuse
# every jitted program from disk.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("SU2_TPU_TEST_CACHE",
                                 "/root/.cache/jax_comp"))
# NOTE: a nonzero threshold silently stores nothing on this jax/XLA-CPU
# build (verified: a 3.3 s compile was skipped at 2.0); cache everything
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
assert jax.devices()[0].platform == "cpu"

import pytest  # noqa: E402


REF_ROOT = "/root/reference/Test_Cases/TURBOLENT"


@pytest.fixture(scope="session")
def combustion_dir():
    return os.path.join(REF_ROOT, "TURBOLENT_COMBUSTION")


@pytest.fixture(scope="session")
def flatplate_dir():
    return os.path.join(REF_ROOT, "TURBOLENT_FLAT_PLATE")
