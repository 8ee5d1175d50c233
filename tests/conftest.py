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
_CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")


def _invalidate_cache_on_host_change(cache_dir):
    """XLA:CPU cache entries embed host CPU features; loading one AOT-compiled
    on a different machine segfaults deep in get/put_executable_and_time
    (root-caused in round 4 after a driver host move — CLAUDE.md). Fingerprint
    the CPU and wipe the cache when it changes."""
    import hashlib
    import shutil

    try:
        with open("/proc/cpuinfo") as f:
            info = f.read()
        lines = [ln for ln in info.splitlines()
                 if ln.startswith(("flags", "model name"))]
        fp = hashlib.sha256("\n".join(sorted(set(lines))).encode()).hexdigest()
    except OSError:
        return
    marker = os.path.join(cache_dir, "HOST_FINGERPRINT")
    try:
        with open(marker) as f:
            if f.read().strip() == fp:
                return
        shutil.rmtree(cache_dir)     # fingerprint mismatch: foreign host
    except FileNotFoundError:
        # no marker: a pre-marker cache of unknown origin is as dangerous as
        # a mismatch — wipe it too (cold rebuild is ~8 min; a segfaulting
        # suite costs more)
        if os.path.isdir(cache_dir) and os.listdir(cache_dir):
            shutil.rmtree(cache_dir)
    os.makedirs(cache_dir, exist_ok=True)
    with open(marker, "w") as f:
        f.write(fp + "\n")


_invalidate_cache_on_host_change(_CACHE_DIR)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
