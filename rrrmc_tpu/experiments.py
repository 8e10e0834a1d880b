"""Experiment harness: timing, equal-wallclock factor tables, and the
time-binned energy / overlap statistics of the reference's paper scripts
(/root/reference/scripts/scripts.jl; SURVEY.md §6).

The reference aligns samplers by "factors" — how many nominal iterations each
sampler completes in the wall-clock time of one rrrMC iteration
(scripts.jl:34-37,163-166). `equal_wallclock_factors` measures those factors
directly on this hardware; `stats_time` / `overlap_moments` are the
vectorized analogs of stats_time / stats_overlaps (scripts.jl:368-764,
965-1097).
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp


def runtest(sampler: Callable, model, beta: float, iters: int, *,
            chains: int = 64, step: Optional[int] = None, seed: int = 167,
            **kw) -> Dict:
    """Timing harness (runtest, /root/reference/src/RRRMC.jl:733-760):
    run cold (compile included) and warm, report wall-clock, attempted
    flips/s, acceptance rate, and final mean energy."""
    step = step or max(1, iters // 100)
    t0 = time.time()
    Es, state = sampler(model, beta, iters, step=step, chains=chains,
                        seed=seed, **kw)
    np.asarray(state.E)  # block_until_ready does not block on remote backends
    t_cold = time.time() - t0
    # the first state=-shaped call can retrace (different arg structure than
    # the seed= cold call); time the best of two warm repetitions
    t_warm = float("inf")
    for _ in range(2):
        t0 = time.time()
        Es, state = sampler(model, beta, iters, step=step, chains=chains,
                            state=state, **kw)
        np.asarray(state.E)
        t_warm = min(t_warm, time.time() - t0)
    Es = np.asarray(Es)
    return {
        "sampler": getattr(sampler, "__name__", str(sampler)),
        "wall_cold_s": t_cold,
        "wall_warm_s": t_warm,
        "iters_per_s": iters / t_warm,
        "flips_per_s": iters * chains / t_warm,
        "accept_rate": float(np.mean(np.asarray(state.accepted)) / iters),
        "E_mean_final": float(Es[:, -1].mean()),
        "E_per_spin": float(Es[:, -1].mean() / model.N),
    }


def runtest_wtm(model, beta: float, samples: int, *, chains: int = 64,
                step: float = 1.0, seed: int = 167) -> Dict:
    """WTM timing in nominal-Metropolis-iteration units: one unit of WTM
    global time corresponds to N attempted Metropolis flips (the reference's
    wtm factors absorb exactly this time compression, scripts.jl:37)."""
    import rrrmc_tpu as rt

    t0 = time.time()
    Es, state = rt.wtmMC(model, beta, samples, step=step, chains=chains,
                         seed=seed)
    np.asarray(state.E)
    t_cold = time.time() - t0
    t0 = time.time()
    Es, state = rt.wtmMC(model, beta, samples, step=step, chains=chains,
                         seed=seed)
    np.asarray(state.E)
    t_warm = time.time() - t0
    nominal_iters = model.N * (step / model.N) * samples  # = step * samples
    return {"sampler": "wtmMC", "wall_cold_s": t_cold, "wall_warm_s": t_warm,
            "iters_per_s": nominal_iters / t_warm,
            "E_per_spin": float(np.asarray(Es)[:, -1].mean() / model.N)}


def equal_wallclock_factors(model, beta: float, *, iters: int = 20_000,
                            chains: int = 64, seed: int = 167,
                            samplers: Optional[Dict[str, Callable]] = None,
                            include_wtm: bool = True) -> Dict[str, float]:
    """Per-iteration speed of each sampler relative to rrrMC — the reference's
    `*_factor` alignment constants (scripts.jl:30-37: Met 3.7-4.5x, BKL
    95-6083x effective, WTM 53-3375x on RRG N=1e4). Factor > 1 means that
    sampler completes more nominal iterations than rrrMC in equal time."""
    import rrrmc_tpu as rt

    if samplers is None:
        samplers = {"standard": rt.standardMC, "rrr": rt.rrrMC,
                    "bkl": rt.bklMC}
    rates = {}
    for name, fn in samplers.items():
        r = runtest(fn, model, beta, iters, chains=chains, seed=seed)
        rates[name] = r["iters_per_s"]
    if include_wtm:
        # match nominal length: samples * step = iters
        samples = max(10, iters // model.N)
        r = runtest_wtm(model, beta, samples, chains=chains,
                        step=iters / samples, seed=seed)
        rates["wtm"] = r["iters_per_s"]
    base = rates.get("rrr")
    return {name: rate / base for name, rate in rates.items()}


def stats_time(Es: np.ndarray, *, step: int = 1, nbins: int = 20,
               log: bool = True) -> Dict[str, np.ndarray]:
    """Time-binned energy statistics (stats_time, scripts.jl:965-1097):
    Es [chains, n_checkpoints] -> per-bin (t, mean, sem) with log-spaced bins
    by default."""
    Es = np.asarray(Es, dtype=np.float64)
    B, n = Es.shape
    ts = (np.arange(n) + 1) * step
    if log:
        edges = np.unique(np.geomspace(1, n, nbins + 1).astype(np.int64))
    else:
        edges = np.linspace(0, n, nbins + 1).astype(np.int64)
    t_out, mean, sem = [], [], []
    for a, b in zip(edges[:-1], edges[1:]):
        if b <= a:
            continue
        block = Es[:, a:b]
        t_out.append(ts[a:b].mean())
        mean.append(block.mean())
        # chain-to-chain fluctuation is the honest error bar
        sem.append(block.mean(axis=1).std() / np.sqrt(B))
    return {"t": np.array(t_out), "E_mean": np.array(mean),
            "E_sem": np.array(sem)}


def overlap_moments(configs: np.ndarray, *, windows: Optional[Sequence] = None
                    ) -> Dict[str, np.ndarray]:
    """Self and cross overlap moments in log-spaced time windows — the q^2 /
    x^2 analysis of stats_overlaps (scripts.jl:368-764, pm1dot:283-295).

    configs: [chains, n_checkpoints, N] +-1 snapshots.
    q2[w] = mean over pairs of distinct times in window w of (s_t . s_t')^2/N^2
            (same chain, self-overlap);
    x2[w] = mean over chain pairs at equal time of (s^a . s^b)^2 / N^2."""
    c = np.asarray(configs, dtype=np.int8)
    B, n, N = c.shape
    if windows is None:
        edges = np.unique(np.geomspace(1, n, 11).astype(np.int64)) - 1
        windows = list(zip(edges[:-1], edges[1:]))
    q2, x2, t_out = [], [], []
    for a, b in windows:
        if b <= a:
            continue
        blk = c[:, a:b].astype(np.float64)        # [B, w, N]
        w = b - a
        # self overlaps: all distinct time pairs within the window
        g = np.einsum("bwn,bvn->bwv", blk, blk) / N
        iu = np.triu_indices(w, 1)
        q2.append(float((g[:, iu[0], iu[1]] ** 2).mean()) if len(iu[0]) else np.nan)
        # cross overlaps: all chain pairs at the same time
        h = np.einsum("bwn,cwn->bcw", blk, blk) / N
        bu = np.triu_indices(B, 1)
        x2.append(float((h[bu[0], bu[1]] ** 2).mean()))
        t_out.append((a + b) / 2)
    return {"t": np.array(t_out), "q2": np.array(q2), "x2": np.array(x2)}


def config_series_observer():
    """Observer collecting spin snapshots at each checkpoint (the script
    hooks' configuration dumps, scripts.jl:53-71). Use with samplers'
    `observer=` kwarg; the series then has shape [chains, n_ckpt, N]."""
    def obs(model, sigma, aux, E):
        return sigma
    return obs
