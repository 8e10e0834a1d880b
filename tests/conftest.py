"""Test configuration: force an 8-virtual-device CPU mesh with float64.

Tests validate exact semantics (energy invariants, stationarity) on CPU with
x64 enabled, mirroring the reference's Float64 tolerances
(/root/reference/test/runtests.jl:13). TPU runs use float32; the model code
is dtype-agnostic via core/dtypes.py.

Note: this environment's sitecustomize force-registers the TPU ('axon')
backend and overrides JAX_PLATFORMS, so plain env vars are not enough — the
platform must be pinned via jax.config before backend initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the suite is compile-dominated (hundreds of
# jitted sampler loops); cached executables make re-runs fast.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("RRRMC_TPU_JIT_CACHE", "/tmp/rrrmc_jit_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
