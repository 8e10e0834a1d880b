"""Experiment-harness smoke tests (runtest / factors / stats_time /
overlap_moments, the scripts.jl analogs)."""

import numpy as np

import rrrmc_tpu as rt
from rrrmc_tpu.experiments import (runtest, equal_wallclock_factors,
                                   stats_time, overlap_moments,
                                   config_series_observer)


def test_runtest_reports():
    X = rt.GraphEA(4, 2, (-1, 1), seed=1)
    r = runtest(rt.standardMC, X, 2.0, 2000, chains=8, seed=2)
    assert r["iters_per_s"] > 0 and r["flips_per_s"] > 0
    assert 0 <= r["accept_rate"] <= 1
    assert np.isfinite(r["E_per_spin"])


def test_equal_wallclock_factors():
    X = rt.GraphRRG(16, 3, (-1, 1), seed=2)
    f = equal_wallclock_factors(X, 2.0, iters=2000, chains=8)
    assert f["rrr"] == 1.0
    assert all(v > 0 for v in f.values())


def test_stats_time_bins():
    Es = np.random.default_rng(0).normal(size=(8, 200)) - 10
    st = stats_time(Es, step=5, nbins=8)
    assert len(st["t"]) == len(st["E_mean"]) == len(st["E_sem"])
    assert np.all(st["E_sem"] >= 0)
    assert np.all(np.diff(st["t"]) > 0)


def test_overlap_moments():
    X = rt.GraphEA(4, 2, (-1, 1), seed=3)
    Es, _ = rt.standardMC(X, 2.0, iters=2000, step=50, chains=6, seed=4,
                          observer=config_series_observer())
    configs = np.asarray(Es)  # [chains, ckpts, N]
    assert configs.shape == (6, 40, 16)
    m = overlap_moments(configs)
    assert np.all((m["q2"][~np.isnan(m["q2"])] >= 0)
                  & (m["q2"][~np.isnan(m["q2"])] <= 1))
    assert np.all((m["x2"] >= 0) & (m["x2"] <= 1))
