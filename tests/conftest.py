"""Test config: run everything on CPU with 8 virtual devices.

Must set XLA/JAX env before jax initializes so multi-device sharding tests
(SURVEY.md §4) can simulate an 8-chip mesh on CPU.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# Persistent compilation cache: the test matrix re-compiles many small
# programs; caching across runs keeps the suite fast on small hosts.
# NOTE: a cache dir SEPARATE from the TPU one (/tmp/aonerf_jax_cache).
# Sharing it poisoned the CPU tests once: a CPU AOT entry compiled with
# machine features this host lacks (+prefer-no-scatter/gather) loads with a
# "could lead to SIGILL" warning, one device thread wedges mid-program, and
# every cross-device all-reduce then dies in the 40 s rendezvous timeout
# (rendezvous.cc:127) — which looks exactly like host starvation but
# reproduces on an idle machine. Keep CPU-compiled artifacts isolated.
os.environ["JAX_COMPILATION_CACHE_DIR"] = os.environ.get(
    "AONERF_TEST_CACHE_DIR", "/tmp/aonerf_jax_cache_cpu"
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402
import pytest  # noqa: E402

# The image's sitecustomize force-registers the axon TPU backend regardless of
# JAX_PLATFORMS in the environment; backend init is lazy, so overriding the
# config here (before any device use) pins the suite to the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")


@pytest.fixture(scope="session")
def devices():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected >=8 virtual devices, got {len(devs)}"
    return devs
