"""Headline benchmark: attempted spin flips per second on EA-3D.

Workload: Edwards-Anderson 3D +-J lattice, L=16 (N=4096), beta=2.0, B=8192
chains, checkerboard-sweep Metropolis via the VMEM-resident Pallas kernel
(ops/sweep_pallas.py; spins stay on-chip for 1000 sweeps per dispatch, local
fields from sublane rolls, acceptance from the hardware PRNG) — the TPU
equivalent of the reference's hot loop (/root/reference/src/RRRMC.jl:100-119)
run at batch scale. Baseline: 1e9 attempted flips/s/chip (BASELINE.json
north-star; the serial reference does ~1e7-1e8 on CPU).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/rrrmc_jit_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import rrrmc_tpu as rt  # noqa: E402
from rrrmc_tpu.ops.sweep_pallas import PallasSweeper  # noqa: E402

BASELINE = 1.0e9  # attempted flips/s/chip


def main():
    L, B, beta = 16, 8192, 2.0
    X = rt.GraphEA(L, 3, (-1, 1), seed=42)
    sweeper = PallasSweeper(X, beta)
    state = rt.init_state(X, B, seed=1)
    # compile + thermalize
    sigma, E = sweeper(state.sigma, state.E, seed=7, n_sweeps=10)
    np.asarray(E)

    best = 0.0
    sweeps = 1000
    for rep in range(3):
        t0 = time.time()
        sigma, E = sweeper(sigma, E, seed=100 + rep, n_sweeps=sweeps)
        # block_until_ready does NOT block on the axon remote backend;
        # force a host materialization for a true sync
        np.asarray(E)
        dt = time.time() - t0
        best = max(best, B * X.N * sweeps / dt)
    state = rt.MCState(sigma=sigma, aux=state.aux, E=E, key=state.key,
                       accepted=state.accepted)

    # correctness guard: exact integer energy invariant
    E_re = jax.jit(jax.vmap(X.energy))(state.sigma)
    assert int(np.max(np.abs(np.asarray(E_re) - np.asarray(state.E)))) == 0

    print(json.dumps({
        "metric": "ea3d_attempted_flips_per_s",
        "value": best,
        "unit": "flips/s/chip",
        "vs_baseline": best / BASELINE,
    }))


if __name__ == "__main__":
    main()
