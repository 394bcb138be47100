"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Must set platform/XLA flags before jax initializes (mirrors the multi-device
testing recipe from SURVEY.md section 4).
"""

import os

# Force CPU: the session environment pins JAX_PLATFORMS=axon (the tunneled
# TPU), which a setdefault would silently keep — and the suite must run on
# the virtual multi-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
# Persistent compilation cache: the suite's cost is dominated by XLA
# compiles of the (identical across runs) assembly/solver kernels.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.2")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
