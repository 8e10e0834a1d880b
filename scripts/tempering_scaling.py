"""Measure tempered_ensembles cost vs ladder size T (VERDICT r2 item 10).

`tempered_ensembles` traces its move kernel once PER SLOT (the ladder is a
python loop over heterogeneous Hamiltonians — slot constants are static
metadata, so the slots cannot be vmapped; parallel/tempering.py docstring).
Compile time and per-round cost therefore grow ~linearly with T. This script
quantifies where that bites: for T in a grid it reports

  * compile wall-clock of the jitted ladder program (cold - warm),
  * steady-state wall-clock per round per slot (warm, amortized),

for the sweep_kernel on a GraphRRG beta ladder. Runs on CPU by default
(JAX_PLATFORMS honored via jax_platforms config if set before import) —
compile-time scaling is a tracing/XLA property, not a backend one.

Writes tempering_scaling.json and prints one row per T.

Usage: python scripts/tempering_scaling.py [rounds] [out.json]
"""

import json
import sys
import time

import jax

# compile-time scaling is a tracing/XLA property, not a backend one: run on
# host CPU (must be set before the first traced op; the axon sitecustomize
# overrides JAX_PLATFORMS, CLAUDE.md "Environment gotchas")
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/rrrmc_jit_cache")

import numpy as np  # noqa: E402
import rrrmc_tpu as rt  # noqa: E402
from rrrmc_tpu.parallel.tempering import (  # noqa: E402
    sweep_kernel, tempered_ensembles)


def measure(T, rounds, chains=64):
    X = rt.GraphRRG(256, 3, (-1, 1), seed=11)
    # swap-viable ladder at EVERY T: fixed adjacent spacing sized so
    # Delta_beta * std(E) ~ 1 at N=256 (std(E) ~ sqrt(N) ~ 16 =>
    # Delta_beta ~ 0.06 gives ~20-40% adjacent swap acceptance). A range
    # fixed across T (the old linspace(0.5, 2.0, T)) left Delta_beta = 1.5
    # at T=2 — zero exchanges, so the T=2 row measured nothing.
    betas = 0.5 + 0.06 * np.arange(T)
    models = [X] * T

    t0 = time.time()
    Es, walkers, st = tempered_ensembles(models, betas, 2, chains=chains,
                                         kernel=sweep_kernel, seed=5)
    np.asarray(Es)
    t_cold = time.time() - t0
    t0 = time.time()
    Es, walkers, st = tempered_ensembles(models, betas, 2, chains=chains,
                                         kernel=sweep_kernel, seed=5)
    np.asarray(Es)
    t_warm2 = time.time() - t0
    t0 = time.time()
    Es, walkers, st = tempered_ensembles(models, betas, 2 + rounds,
                                         chains=chains, kernel=sweep_kernel,
                                         seed=5)
    np.asarray(Es)
    dt = time.time() - t0
    per_round = (dt - t_warm2) / rounds
    return {"T": T, "compile_s": t_cold - t_warm2,
            "round_s": per_round, "round_per_slot_s": per_round / T,
            "swap_acc_mean": float(np.asarray(st.swap_acc).mean())}


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    path = sys.argv[2] if len(sys.argv) > 2 else "tempering_scaling.json"
    rows = []
    for T in (2, 4, 8, 16, 32):
        r = measure(T, rounds)
        rows.append(r)
        print(json.dumps(r), flush=True)
    out = {"model": "GraphRRG N=256 K=3, sweep_kernel, chains=64",
           "ladder": "beta_k = 0.5 + 0.06k (fixed adjacent spacing sized "
                     "for ~20-40% swap acceptance at every T; "
                     "swap_acc_mean counts accepted swaps per chain over "
                     "the measured rounds)",
           "rounds_measured": rounds, "rows": rows}
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
