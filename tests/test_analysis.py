"""Exact transition-matrix validation — the deepest correctness check of the
sampler kernels (ports the reference's dev assertions,
/root/reference/src/RRRMC.jl:678-731): every kernel must hold the Boltzmann
law exactly (||p - Qp|| < 1e-12), BKL must be strictly rejection-free, and
RRR must reject less than Metropolis while mixing at least as fast."""

import numpy as np
import pytest

import rrrmc_tpu as rt
from rrrmc_tpu.analysis import (
    truep, transition_matrix_standard, transition_matrix_bkl,
    transition_matrix_rrr, second_eigenvalue, stationarity_error,
    rejection_rate, spectral_stats, tm, ravg)


BETA = 1.5


@pytest.fixture(scope="module")
def X():
    return rt.GraphRRG(8, 3, (-1, 1), seed=77)


def test_standard_kernel_stationary(X):
    p = truep(X, BETA)
    Q = transition_matrix_standard(X, BETA)
    assert np.allclose(Q.sum(axis=0), 1.0, atol=1e-13)
    assert stationarity_error(Q, p) < 1e-12


def test_bkl_kernel_rejection_free(X):
    Q = transition_matrix_standard(X, BETA)
    rfQ = transition_matrix_bkl(Q)
    assert np.allclose(np.diag(rfQ), 0.0, atol=1e-13)
    assert np.allclose(rfQ.sum(axis=0), 1.0, atol=1e-12)
    # stationary law of the embedded chain is p*(1-pr), RRRMC.jl:699
    p = truep(X, BETA)
    pr = np.diag(Q)
    q = p * (1 - pr)
    assert np.max(np.abs(q - rfQ @ q)) < 1e-12


def test_rrr_kernel_stationary_and_faster(X):
    p = truep(X, BETA)
    Qs = transition_matrix_standard(X, BETA)
    Qr = transition_matrix_rrr(X, BETA)
    assert np.allclose(Qr.sum(axis=0), 1.0, atol=1e-12)
    assert stationarity_error(Qr, p) < 1e-12
    # RRR rejects less and mixes at least as fast per iteration
    assert rejection_rate(Qr, p) <= rejection_rate(Qs, p) + 1e-12
    assert second_eigenvalue(Qr) <= second_eigenvalue(Qs) * 1.001


def test_spectral_stats_runs():
    taus, rrs = spectral_stats(
        lambda seed: rt.GraphRRG(6, 3, (-1, 1), seed=seed),
        betas=[1.0, 2.0], n_seeds=2)
    assert taus.shape == (2, 2, 3)
    assert np.all(taus > 0)
    # rejection-free chains mix faster per iteration than Metropolis
    assert np.all(taus[:, :, 1] <= taus[:, :, 0] + 1e-9)


def test_empirical_matches_kernel(X):
    """standardMC's empirical distribution converges to the exact kernel's
    stationary law (closes the loop between analysis.py and the sampler)."""
    import jax
    from rrrmc_tpu.observables import pack_config

    p = truep(X, BETA)
    Es, _ = rt.standardMC(X, BETA, iters=24000, step=20, chains=96, seed=3,
                          observer=lambda m, s, a, E: pack_config(s))
    samples = np.asarray(Es)[:, Es.shape[1] // 2:].astype(np.int64).ravel()
    p_emp = np.bincount(samples, minlength=1 << X.N) / samples.size
    assert 0.5 * np.abs(p_emp - p).sum() < 0.08


def test_tm_ravg():
    x = np.arange(100, dtype=float)
    r = ravg(x, step=10)
    assert r.shape == (10,)
    np.testing.assert_allclose(r[0], np.mean(np.arange(10)))
    m = tm(x, step=5)
    assert m.ndim == 1 and len(m) > 0
