"""Test configuration: run on a virtual 8-device CPU mesh with float64.

IMPORTANT: this image's ``sitecustomize`` imports jax at interpreter startup
and registers the remote-TPU tunnel plugin with ``JAX_PLATFORMS=axon`` baked
into the config. Setting env vars here is too late — the backend choice must
be overridden through ``jax.config`` before the first device lookup,
otherwise the whole suite silently runs over the TPU tunnel (orders of
magnitude slower: every compile is a remote RPC).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# NOTE: do NOT enable jax_compilation_cache_dir here — the persistent cache
# deadlocks on this image's jax build (first dispatch never returns).

assert jax.devices()[0].platform == "cpu", "tests must run on host CPU"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"

import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Release compiled executables after each test module.

    The full suite compiles many hundred XLA CPU programs in one process;
    with all of them kept alive the CPU backend eventually SEGFAULTS
    inside ``backend_compile_and_load`` (reproducibly at ~80% of the
    suite, while the same module passes standalone). Dropping the
    executable caches between modules keeps the JIT state bounded at the
    cost of cross-module recompiles.
    """
    yield
    jax.clear_caches()
