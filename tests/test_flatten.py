"""flatten(): wrapper compositions merged into one flat Pairwise must
reproduce the wrapper's physical energies and per-spin deltas, and sample the
same equilibrium; non-pairwise parts must be rejected."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rrrmc_tpu as rt
from rrrmc_tpu.models.flatten import flatten


def _check_equivalence(wrapper, key, tol=1e-9):
    flat = flatten(wrapper)
    assert flat.N == wrapper.N
    for s in range(4):
        sigma = rt.random_spins(jax.random.fold_in(key, s), wrapper.N)
        e_w = float(wrapper.to_physical(wrapper.energy(sigma)))
        e_f = float(flat.to_physical(flat.energy(sigma)))
        assert abs(e_w - e_f) < tol * max(1.0, abs(e_w)), (e_w, e_f)
        d_w = np.asarray(wrapper.to_physical(
            wrapper.delta_all(sigma, wrapper.init_aux(sigma))), np.float64)
        d_f = np.asarray(flat.to_physical(
            flat.delta_all(sigma, flat.init_aux(sigma))), np.float64)
        np.testing.assert_allclose(d_f, d_w, atol=tol, rtol=tol)
    return flat


def test_flatten_quant_ea():
    base = rt.GraphEA(4, 2, (-1, 1), seed=3)          # N=16 EA-2D
    m = rt.GraphQuant(16, 4, Gamma=0.5, beta=2.0, base=base)
    _check_equivalence(m, jax.random.key(0))


def test_flatten_le_rrg():
    base = rt.GraphRRG(16, 3, (-1, 1), seed=5)
    m = rt.GraphLocalEntropy(16, 3, gamma=0.4, beta=1.5, base=base)
    _check_equivalence(m, jax.random.key(1))


def test_flatten_addfields_and_mixed():
    base = rt.GraphEA(4, 2, (-1, 1), seed=7)
    h = np.linspace(-0.5, 0.5, 16)
    m = rt.GraphAddFields(h, base)
    _check_equivalence(m, jax.random.key(2))
    m2 = rt.GraphAddSubFields(h, base)
    _check_equivalence(m2, jax.random.key(3))
    m3 = rt.mixed(base, rt.GraphIsing1D(16))
    _check_equivalence(m3, jax.random.key(4))


def test_flatten_rejects_nonpairwise():
    with pytest.raises(ValueError):
        flatten(rt.GraphRobustEnsemble(8, 3, gamma=0.3, beta=1.0,
                                       base=rt.GraphRRG(8, 3, (-1, 1), seed=1)))
    with pytest.raises(ValueError):
        flatten(rt.GraphSK(8, seed=1))


def test_flatten_densify_sweep_equilibrium():
    """The full transformer chain — sweepMC over densify(flatten(wrapper)) —
    must reach the wrapper's equilibrium (validated against rrrMC on the
    original Double model)."""
    base = rt.GraphEA(4, 2, (-1, 1), seed=21)
    m = rt.GraphQuant(16, 4, Gamma=0.4, beta=1.2, base=base)
    d = rt.densify(rt.flatten(m))
    Es_s, st_s = rt.sweepMC(d, 1.2, sweeps=3000, step=100, chains=32, seed=5)
    E_re = jax.vmap(d.energy)(st_s.sigma)
    np.testing.assert_allclose(np.asarray(E_re), np.asarray(st_s.E),
                               atol=1e-6)
    Es_r, _ = rt.rrrMC(m, 1.2, iters=60_000, step=2000, chains=16, seed=6)
    a = np.asarray(Es_s)[:, 10:].mean()
    b = np.asarray(Es_r)[:, 15:].mean()
    assert abs(a - b) < 1.0, (a, b)


def test_flatten_samples_same_equilibrium():
    """bklMC on the flat model reaches the wrapper model's equilibrium
    energy (same Hamiltonian, independent RNG streams)."""
    base = rt.GraphEA(4, 2, (-1, 1), seed=11)
    m = rt.GraphQuant(16, 4, Gamma=0.4, beta=1.2, base=base)
    flat = flatten(m)
    Es_w, st_w = rt.bklMC(m, 1.2, iters=30_000, step=1000, chains=16, seed=4)
    Es_f, st_f = rt.bklMC(flat, 1.2, iters=30_000, step=1000, chains=16,
                          seed=9)
    # flat invariant: running E equals recomputation (float tolerance)
    E_re = jax.jit(jax.vmap(flat.energy))(st_f.sigma)
    np.testing.assert_allclose(np.asarray(E_re), np.asarray(st_f.E),
                               atol=1e-8)
    a = np.asarray(Es_w)[:, 10:].mean()
    b = np.asarray(Es_f)[:, 10:].mean()
    assert abs(a - b) < 0.8, (a, b)
