"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the env vars before the first `import jax` anywhere in the test
process, so this lives at the top of conftest and tests import jax lazily.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_traceback_filtering", "off")
jax.config.update("jax_compilation_cache_dir", "/tmp/binius_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
