"""Test configuration: hermetic virtual 8-device CPU mesh.

The container's sitecustomize imports jax at interpreter startup with
JAX_PLATFORMS=axon (remote-TPU tunnel plugin), so setting env vars here is too
late — instead switch the platform via jax.config post-import. XLA_FLAGS still
takes effect because the CPU backend has not been initialized yet.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()


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

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_traceback_filtering", "off")
# NOTE: no persistent compilation cache here. The XLA:CPU AOT executables
# this jax version serializes embed compile-machine features
# (amx / prefer-no-scatter) and SIGABRT/SIGSEGV when reloaded in a later
# process on this host. In-process jit caching still covers the suite; the
# TPU runs (bench/examples) keep their own cache dir, which is unaffected.
