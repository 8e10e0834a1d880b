"""Overlap pipeline (experiments.overlap_stats / stats_overlaps) and the
generalized checkpoint drain (bkl/wtm `observer=`): semantics match a direct
numpy transcription of the reference's parseovs/parsexovs
(/root/reference/scripts/scripts.jl:368-458), and snapshots drained through
the bkl/wtm move streams stay consistent with the drained energies."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import rrrmc_tpu as rt
from rrrmc_tpu.experiments import (config_series_observer, log_windows,
                                   overlap_stats, stats_overlaps)


def ref_overlap_stats(configs, times, t0, incr):
    """Direct numpy transcription of parseovs (self, within-run time pairs)
    and parsexovs (cross, all time pairs between paired runs 2i/2i+1)."""
    c = np.asarray(configs, np.float64)
    B, n, N = c.shape
    windows, centers = log_windows(times, t0=t0, incr=incr)
    mq2s, sq2s, mx2s, sx2s = [], [], [], []
    for a, b in windows:
        q2s, x2s = [], []
        for ch in range(B):
            for i in range(a, b):
                for j in range(i + 1, b):
                    q2s.append((c[ch, i] @ c[ch, j] / N) ** 2)
        for p in range(B // 2):
            for i in range(a, b):
                for j in range(a, b):
                    x2s.append((c[2 * p, i] @ c[2 * p + 1, j] / N) ** 2)
        q2s = np.array(q2s) if q2s else np.array([np.nan])
        x2s = np.array(x2s)
        mq2s.append(q2s.mean())
        sq2s.append(np.sqrt(max(0.0, (q2s ** 2).mean() - q2s.mean() ** 2)))
        mx2s.append(x2s.mean())
        sx2s.append(np.sqrt(max(0.0, (x2s ** 2).mean() - x2s.mean() ** 2)))
    return centers, np.array(mq2s), np.array(sq2s), np.array(mx2s), np.array(sx2s)


def test_log_windows_power_of_two():
    times = np.arange(1, 129)
    ws, centers = log_windows(times, t0=1.0, incr=2.0)
    # windows [1,2) [2,4) [4,8) ... by time value; index = time-1
    assert ws[0] == (0, 1) and ws[1] == (1, 3) and ws[2] == (3, 7)
    assert np.allclose(centers[:3], [1.0, 2.0, 4.0])


def test_overlap_stats_matches_reference_semantics():
    rng = np.random.default_rng(7)
    B, n, N = 4, 12, 16
    configs = rng.choice(np.array([-1, 1], np.int8), size=(B, n, N))
    times = (np.arange(n) + 1) * 3.0
    out = overlap_stats(configs, times, t0=3.0, incr=2.0)
    t, mq2, sq2, mx2, sx2 = ref_overlap_stats(configs, times, 3.0, 2.0)
    # first window has a single snapshot -> no self pairs; skip it there
    sel = ~np.isnan(mq2)
    assert np.allclose(out["t"], t)
    assert np.allclose(out["q2_mean"][sel], mq2[sel], atol=1e-6)
    assert np.allclose(out["q2_std"][sel], sq2[sel], atol=1e-6)
    assert np.allclose(out["x2_mean"], mx2, atol=1e-6)
    assert np.allclose(out["x2_std"], sx2, atol=1e-6)


def test_overlap_stats_identical_configs():
    # all snapshots equal -> every overlap is exactly 1, stds 0
    configs = np.ones((2, 8, 8), np.int8)
    times = np.arange(1, 9, dtype=float)
    out = overlap_stats(configs, times, incr=2.0)
    # windows [1,2) [2,4) [4,8) [8,16): the first and last hold one snapshot
    # (no self pairs -> 0 by convention, NaN in the reference's parseovs)
    assert np.allclose(out["q2_mean"][1:3], 1.0)
    assert np.allclose(out["x2_mean"], 1.0)
    assert np.allclose(out["q2_std"][1:3], 0.0, atol=1e-6)


@pytest.mark.parametrize("sampler,iters,step", [
    (rt.bklMC, 64, 4),
    (rt.standardMC, 64, 4),
])
def test_observer_snapshots_consistent_with_energies(sampler, iters, step):
    X = rt.GraphRRG(32, 3, (-1, 1), seed=3)
    kw = dict(step=step, chains=4, seed=11, backend="xla") \
        if sampler is rt.bklMC else dict(step=step, chains=4, seed=11)
    Es, st1 = sampler(X, 1.5, iters, **kw)
    snaps, st2 = sampler(X, 1.5, iters, observer=config_series_observer(),
                         **kw)
    # same seed => identical trajectory; snapshot energies == drained energies
    E_snap = jax.vmap(jax.vmap(X.energy))(jnp.asarray(snaps))
    assert np.allclose(np.asarray(E_snap), np.asarray(Es))
    assert np.array_equal(np.asarray(st1.sigma), np.asarray(st2.sigma))


def test_wtm_observer_snapshots_consistent():
    X = rt.GraphRRG(32, 3, (-1, 1), seed=3)
    kw = dict(step=2.0, chains=4, seed=11, backend="xla")
    Es, st1 = rt.wtmMC(X, 1.5, 24, **kw)
    snaps, st2 = rt.wtmMC(X, 1.5, 24, observer=config_series_observer(), **kw)
    filled = np.any(np.asarray(snaps) != 0, axis=-1)  # reached checkpoints
    E_snap = np.asarray(jax.vmap(jax.vmap(X.energy))(jnp.asarray(snaps)))
    assert np.allclose(E_snap[filled], np.asarray(Es)[filled])
    assert np.array_equal(np.asarray(st1.sigma), np.asarray(st2.sigma))


def test_stats_overlaps_end_to_end():
    out = stats_overlaps(
        lambda s: rt.GraphRRG(24, 3, (-1, 1), seed=s), rt.standardMC,
        0.8, 96, chains=4, step=8, n_disorder=2, seed=5)
    for k in ("q2_mean", "x2_mean", "q2_std", "x2_std", "q2_sem_disorder"):
        assert out[k].shape == out["t"].shape
        assert np.all(np.isfinite(out[k]))
        assert np.all(out[k] >= -1e-9) and np.all(out[k] <= 1 + 1e-9)


def test_stats_overlaps_bkl_tag():
    out = stats_overlaps(
        lambda s: rt.GraphRRG(24, 3, (-1, 1), seed=s), rt.bklMC,
        0.8, 96, chains=4, step=8, n_disorder=1, seed=5,
        sampler_kw=dict(backend="xla"))
    assert np.all(np.isfinite(out["x2_mean"]))
