"""Test harness config (SURVEY.md §4.2).

All tests run on CPU-jax by default with 8 virtual devices so that pjit/mesh
sharding tests exercise real multi-device partitioning without TPU hardware
(SURVEY.md §4.2 "Multi-chip without a cluster"). Tests that need the real TPU
are marked `tpu` and skipped unless one is present.

Environment variables must be set before jax initializes its backends, hence
the module-level os.environ writes at import time.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

# FORCE cpu at the *config* level: the driver's sitecustomize registers the
# axon (remote-TPU-tunnel) PJRT plugin and pins jax_platforms=axon in a way
# that overrides the JAX_PLATFORMS env var. Without this override every op —
# including "CPU" unit tests — round-trips the network tunnel (~100x slower,
# and no virtual 8-device mesh). Set OCRJAX_TEST_TPU=1 to run tpu-marked
# tests on the real chip instead.
if not os.environ.get("OCRJAX_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

# SURVEY.md §4.2: NaN-checking on for the CPU suite — every jit output is
# verified finite-or-intentional. Off on the real TPU (forces per-call
# device syncs, and the remote tunnel makes those ~100x more expensive).
jax.config.update("jax_debug_nans", not bool(os.environ.get("OCRJAX_TEST_TPU")))

# Persistent compilation cache: TPU ONLY. On this host the XLA:CPU AOT
# loader rejects its own just-written executables ("Target machine feature
# +prefer-no-gather is not supported on the host machine ... could lead to
# execution errors such as SIGILL", cpu_aot_loader.cc) and a full-suite run
# deterministically SEGFAULTED (exit 139) inside
# compilation_cache.get_executable_and_time → deserialize_executable at
# test #251 (test_weights), with a FRESH cache and no concurrent writers —
# so CPU executable reloads are genuinely unsafe here, not merely stale.
# The TPU cache (repo-root .jax_cache + this one under OCRJAX_TEST_TPU)
# has reloaded cleanly all round. Cost: the CPU suite recompiles per run.
if os.environ.get("OCRJAX_TEST_TPU"):
    jax.config.update("jax_compilation_cache_dir", "/tmp/ocrjax_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def pytest_configure(config):
    config.addinivalue_line("markers", "tpu: requires a real TPU device")
    # Two-tier policy (VERDICT r3 next #7): `slow` marks training loops,
    # the opt-in int8 path, golden module fixtures, torch-twin e2e parity
    # and redundant reroute-lane variants. scripts/test_fast.sh runs
    # `-m "not slow"` one-file-per-process (~12-17 min on this 1-core
    # host); scripts/test_all.sh runs everything (~45-60 min). Monolithic
    # all-files pytest runs are NOT safe on this host: XLA:CPU segfaults
    # after a few hundred in-process compiles (observed twice at tests
    # ~96/~250, inside backend_compile_and_load — same host-LLVM
    # fragility as the disabled CPU cache below).
    config.addinivalue_line("markers", "slow: heavyweight (full tier only)")


def pytest_collection_modifyitems(config, items):
    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    skip_tpu = pytest.mark.skip(reason="no TPU available (JAX_PLATFORMS=cpu)")
    for item in items:
        if "tpu" in item.keywords and not on_tpu:
            item.add_marker(skip_tpu)


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)
