"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real TPU hardware is exercised by bench.py and the driver's compile checks;
unit tests must be hermetic and fast, so we force the CPU backend with eight
virtual devices for sharding tests (replacing the reference's 2-GPU placement
test, tests/multi_gpu_test.py).
"""

import os

# Force the CPU backend even when the environment preselects a TPU platform
# (e.g. JAX_PLATFORMS=axon): unit tests must be hermetic, deterministic and
# full-f32-precision.  (Tip: also export PALLAS_AXON_POOL_IPS= when invoking
# pytest to skip the TPU-relay handshake at interpreter startup.)
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compilation cache: repeated test runs skip XLA recompilation.
import jax  # noqa: E402  (must come after the env setup above)

jax.config.update("jax_compilation_cache_dir", "/tmp/dirt_tpu_jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
