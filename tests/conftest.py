"""Test configuration: hermetic virtual 8-device CPU mesh.

The container's sitecustomize imports jax at interpreter startup with
JAX_PLATFORMS=axon (remote-TPU tunnel plugin), so setting env vars here is too
late — instead switch the platform via jax.config post-import. XLA_FLAGS still
takes effect because the CPU backend has not been initialized yet.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    # BINIUS_TEST_FORCE_1DEV=1 runs the suite on a single device (CI matrix
    # variant; catches code that silently assumes a multi-device mesh).
    n_dev = 1 if os.environ.get("BINIUS_TEST_FORCE_1DEV") else 8
    flags = (flags + f" --xla_force_host_platform_device_count={n_dev}").strip()
if "xla_cpu_max_isa" not in flags:
    # Pin the ISA so serialized XLA:CPU executables stop embedding
    # host-tuning features (+prefer-no-scatter/+prefer-no-gather) that make
    # reloads crash — this is what makes the persistent compilation cache
    # SAFE on CPU (see CLAUDE.md; suite is compile-bound without it).
    flags = (flags + " --xla_cpu_max_isa=AVX2").strip()
os.environ["XLA_FLAGS"] = flags


def _raise_max_map_count(target: int = 1 << 20) -> None:
    """XLA:CPU JIT-compiles every executable into ~3 anonymous mappings
    (code/rodata/data, x parallel-codegen splits); a full suite run crosses
    the kernel's default vm.max_map_count of 65530 and LLVM then dies with
    'Cannot allocate memory' (SIGSEGV/SIGABRT mid-compile). Raise the limit
    when we can (tests run as root here); harmless no-op otherwise."""
    path = "/proc/sys/vm/max_map_count"
    try:
        with open(path) as f:
            cur = int(f.read())
        if cur < target:
            with open(path, "w") as f:
                f.write(str(target))
    except (OSError, ValueError):
        pass


_raise_max_map_count()

import jax  # noqa: E402  (already imported by sitecustomize; this is a no-op)
from binius_tpu.utils.jax_cache import cache_dir as _binius_cache_dir

if os.environ.get("BINIUS_TEST_TPU"):
    # Keep the ambient backend (axon/TPU). Meant for SELECTIVE runs of the
    # hardware-gated tests only (e.g. `pytest -k "pallas or bitsliced"`):
    # most of the suite assumes the hermetic 8-device CPU mesh and would be
    # slow and wrong-platform over the tunnel.
    jax.config.update("jax_compilation_cache_dir",
                      _binius_cache_dir("tpu"))
else:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      _binius_cache_dir("cpu"))
jax.config.update("jax_traceback_filtering", "off")
# Persistent compilation cache: safe ONLY together with the pinned
# --xla_cpu_max_isa above (otherwise executables embed per-host tuning
# features and crash on reload). Cuts suite time massively — the prover is
# XLA-compile-bound on this 4-vCPU box (uzc: 221s cold vs 9s warm).
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

# ---------------------------------------------------------------------------
# Quick signal tier: `pytest -m quick` runs the cheap, compile-light modules
# (a few minutes even on a fresh container) so a cold box is not an hour away
# from its first green/red signal. The full suite is XLA-compile-bound
# (~10-22 min warm persistent cache, ~60+ min cold).
# ---------------------------------------------------------------------------

_QUICK_MODULES = {
    "test_fields",
    "test_math",
    "test_serialization",
    "test_canonical_serialization",
    "test_hash_transcript",
    "test_golden_transcript",
    "test_isomorphism",
    "test_tracing",
    "test_emulate_stat",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "quick: fast compile-light signal tier (run first on a fresh container)")


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        if item.module.__name__ in _QUICK_MODULES:
            item.add_marker(pytest.mark.quick)
