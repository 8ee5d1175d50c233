"""Test env: force CPU with 8 virtual devices so sharding tests run anywhere.

Must run before the first `import jax` anywhere in the test session.
"""

import os

# Force CPU: the driver environment presets JAX_PLATFORMS=axon (the real TPU
# tunnel), but tests need the 8-device virtual CPU mesh and a host the TPU
# can't deadlock (TPU f64 is emulated and only ~f32-accurate).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize hook force-sets jax_platforms="axon,cpu" at import;
# override it back to CPU before any backend initialises.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
# Persistent compilation cache: compiles on this 1-core CPU host cost seconds
# per kernel; cache them across pytest runs.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
