"""Reproduce the reference paper's quantum / robust-ensemble experiments
(test_QIsing /root/reference/scripts/scripts.jl:766-863, test_REIsing
:866-963): equal-wallclock comparison of standardMC vs rrrMC on

  * GraphQSKT(N=1024, M=16, Gamma=0.3, beta=2.0) tracking Qenergy, and
  * GraphSKRE(N=1024, M=5,  gamma=2.0, beta=0.4) tracking REenergies,

the workloads where the reference measures rrrMC's advantage (met_factor =
15.74 and 20.8: Metropolis completes that many iterations per rrr iteration
in equal time on the author's CPU, yet relaxes slower per wall-second).

Method on this hardware: (1) calibrate each sampler's warm per-iteration
wall rate on the actual model; (2) give both samplers the SAME wall budget
(iters = rate * t_limit), recording observables on a common checkpoint grid;
(3) emit measured met_factor (= rate_met / rate_rrr) next to the reference's
CPU factor, plus the observable trajectories vs nominal mct and vs seconds.

Usage: python scripts/paper_quant.py [t_limit_s] [chains] [which]
   which in {qising, reising, both}. Writes paper_quant_results.json.
"""

import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/rrrmc_jit_cache")

import numpy as np  # noqa: E402
import rrrmc_tpu as rt  # noqa: E402


def qenergy_obs(model, sigma, aux, E):
    return model.Qenergy(sigma)


def re_obs(model, sigma, aux, E):
    """Mean replica energy per spin + composite energy per spin."""
    import jax.numpy as jnp
    return jnp.stack([jnp.mean(model.REenergies(sigma)) / model.Nk,
                      model.to_physical(E) / model.N])


def calibrate(sampler, model, beta, obs, *, chains, seed, iters=400,
              step=100):
    """Warm per-iteration wall rate (iters/s) of `sampler` on `model`."""
    kw = dict(step=step, chains=chains, seed=seed, observer=obs)
    _, state = sampler(model, beta, iters, **kw)          # compile
    np.asarray(state.E)
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        _, state = sampler(model, beta, iters, state=state, **kw)
        np.asarray(state.E)
        best = min(best, time.time() - t0)
    return iters / best


def run_budgeted(sampler, model, beta, obs, *, rate, t_limit, chains, seed,
                 n_ckpt=120, segments=8):
    """Run `rate * t_limit` iterations in `segments` state-threaded calls
    (the remote TPU relay is unreliable past ~60s per dispatch — a 90s
    single-dispatch run crashed the worker; short dispatches are also what a
    production annealing loop looks like)."""
    iters = max(n_ckpt, int(rate * t_limit))
    step = max(1, iters // n_ckpt)
    per_seg = (n_ckpt // segments) * step
    t0 = time.time()
    parts, state = [], None
    for g in range(segments):
        series, state = sampler(model, beta, per_seg, step=step,
                                chains=chains, seed=seed + g, state=state,
                                observer=obs)
        np.asarray(state.E)
        parts.append(np.asarray(series))
    iters = per_seg * segments
    wall = time.time() - t0
    s = np.concatenate(parts, axis=1).astype(np.float64)  # [chains, n_ckpt, ...]
    mean = s.mean(axis=0)
    sem = s.std(axis=0) / np.sqrt(s.shape[0])
    return {"iters": iters, "step": step, "wall_s": wall,
            "mct": (np.arange(1, n_ckpt + 1) * step).tolist(),
            "obs_mean": mean.tolist(), "obs_sem": sem.tolist()}


def experiment(name, model, beta, obs, *, t_limit, chains, seed,
               ref_factor):
    print(f"=== {name} (budget {t_limit}s x2, chains={chains}) ===")
    rate_met = calibrate(rt.standardMC, model, beta, obs, chains=chains,
                         seed=seed)
    rate_rrr = calibrate(rt.rrrMC, model, beta, obs, chains=chains,
                         seed=seed + 1)
    factor = rate_met / rate_rrr
    print(f"rates: met {rate_met:.1f} it/s, rrr {rate_rrr:.1f} it/s; "
          f"measured met_factor {factor:.2f} (reference CPU {ref_factor})")
    met = run_budgeted(rt.standardMC, model, beta, obs, rate=rate_met,
                       t_limit=t_limit, chains=chains, seed=seed + 2)
    rrr = run_budgeted(rt.rrrMC, model, beta, obs, rate=rate_rrr,
                       t_limit=t_limit, chains=chains, seed=seed + 3)
    for tag, r in (("met", met), ("rrr", rrr)):
        o = np.asarray(r["obs_mean"])
        first = o[0] if o.ndim == 1 else o[0].tolist()
        last = o[-1] if o.ndim == 1 else o[-1].tolist()
        print(f"  {tag}: {r['iters']} iters in {r['wall_s']:.1f}s; "
              f"obs {first} -> {last}")
    return {"rate_met_it_s": rate_met, "rate_rrr_it_s": rate_rrr,
            "met_factor_measured": factor, "met_factor_reference": ref_factor,
            "met": met, "rrr": rrr}


def main():
    t_limit = float(sys.argv[1]) if len(sys.argv) > 1 else 90.0
    chains = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    which = sys.argv[3] if len(sys.argv) > 3 else "both"
    out = {"t_limit_s": t_limit, "chains": chains}

    if which in ("qising", "both"):
        X = rt.GraphQSKT(1024, 16, 0.3, 2.0, seed=8370274)
        out["QIsing"] = experiment(
            "QIsing QSKT N=1024 M=16 beta=2 Gamma=0.3", X, 2.0, qenergy_obs,
            t_limit=t_limit, chains=chains, seed=654789,
            ref_factor=15.74)   # scripts.jl:778
    if which in ("reising", "both"):
        X = rt.GraphSKRE(1024, 5, 2.0, 0.4, seed=8370275)
        out["REIsing"] = experiment(
            "REIsing SKRE N=1024 M=5 beta=0.4 gamma=2", X, 0.4, re_obs,
            t_limit=t_limit, chains=chains, seed=654790,
            ref_factor=20.8)    # scripts.jl:878

    with open("paper_quant_results.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote paper_quant_results.json")


if __name__ == "__main__":
    main()
