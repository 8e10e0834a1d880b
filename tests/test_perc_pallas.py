"""Perceptron rejection-free Pallas kernel validation in interpreter mode.

The resident state is the [P, chains] int32 stability table (the TPU form of
the reference's incrementally-updated Delta vector + marginal sets,
/root/reference/src/graphs/PercStep.jl:30-43); per move the dE vector comes
from the stabilities-delta matmul identity with table-free elementwise g
(ops/perc_pallas.py), so the exactness tests cover both the identity and the
rank-1 stability update.
"""

import importlib
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def perc_interp():
    os.environ["RRRMC_PALLAS_INTERPRET"] = "1"
    import rrrmc_tpu.ops.perc_pallas as pp
    importlib.reload(pp)
    yield pp
    os.environ.pop("RRRMC_PALLAS_INTERPRET")
    importlib.reload(pp)


def _boltzmann_mean(model, beta):
    from rrrmc_tpu.observables import unpack_config
    states = unpack_config(jnp.arange(2 ** model.N, dtype=jnp.int32), model.N)
    E = np.asarray(jax.jit(jax.vmap(
        lambda s: model.to_physical(model.energy(s))))(states), np.float64)
    w = np.exp(-beta * (E - E.min()))
    return float((w * E).sum() / w.sum())


def test_perc_family_detection(perc_interp):
    import rrrmc_tpu as rt

    assert perc_interp.perc_family(rt.GraphPercStep(15, 7, seed=1)) == "step"
    assert perc_interp.perc_family(
        rt.GraphPercLinear(15, 7, seed=1)) == "linear"
    assert perc_interp.perc_family(
        rt.GraphPercXEntr(15, 7, 0.7, seed=1)) == "xentr"
    assert perc_interp.perc_family(rt.GraphSK(16, seed=1)) is None


@pytest.mark.parametrize("fam", ["step", "linear", "xentr"])
def test_perc_bkl_invariant_and_law(perc_interp, fam):
    import rrrmc_tpu as rt
    from rrrmc_tpu.samplers.common import LAST_ROUTE

    X = {"step": lambda: rt.GraphPercStep(31, 15, seed=5),
         "linear": lambda: rt.GraphPercLinear(31, 15, seed=5),
         "xentr": lambda: rt.GraphPercXEntr(31, 15, 1.0, seed=5)}[fam]()
    Es, st = rt.bklMC(X, 1.0, iters=4000, step=200, chains=128, seed=3,
                      backend="pallas")
    assert LAST_ROUTE["backend"] == "pallas-rejfree-perc"
    E_re = np.asarray(jax.jit(jax.vmap(X.energy))(st.sigma), np.float64)
    err = np.abs(E_re - np.asarray(st.E, np.float64)).max()
    assert err < (1e-3 if fam == "xentr" else 1e-9), err
    Ex, _ = rt.bklMC(X, 1.0, iters=4000, step=200, chains=128, seed=4,
                     backend="xla")
    a = np.asarray(Es)[:, 10:].mean()
    b = np.asarray(Ex)[:, 10:].mean()
    assert abs(a - b) < 0.05 * max(1.0, abs(b)), (a, b)


@pytest.mark.parametrize("fam", ["step", "xentr"])
@pytest.mark.slow
def test_perc_boltzmann(perc_interp, fam):
    """Time-weighted checkpoint mean vs exact 2^N enumeration."""
    import rrrmc_tpu as rt

    X = (rt.GraphPercStep(13, 9, seed=11) if fam == "step"
         else rt.GraphPercXEntr(13, 9, 1.0, seed=11))
    beta = 1.0
    E_exact = _boltzmann_mean(X, beta)
    Es, _ = rt.bklMC(X, beta, iters=40_000, step=200, chains=128, seed=9,
                     backend="pallas")
    Es = np.asarray(Es)
    got = Es[:, Es.shape[1] // 4:].mean()
    sem = Es[:, Es.shape[1] // 4:].std() / np.sqrt(Es.shape[0] * 3.0)
    assert abs(got - E_exact) < max(5 * sem, 0.05), (got, E_exact, sem)


def test_perc_rrr_and_warm_start(perc_interp):
    import rrrmc_tpu as rt

    X = rt.GraphPercLinear(31, 15, seed=6)
    _, st = rt.bklMC(X, 1.5, iters=1000, step=100, chains=128, seed=3,
                     backend="pallas")
    _, st2 = rt.rrrMC(X, 1.5, iters=500, step=100, chains=128, seed=8,
                      backend="pallas", state=st)
    E_re = np.asarray(jax.jit(jax.vmap(X.energy))(st2.sigma), np.float64)
    np.testing.assert_array_equal(E_re, np.asarray(st2.E, np.float64))


def test_perc_wtm_invariant(perc_interp):
    import rrrmc_tpu as rt

    X = rt.GraphPercStep(31, 15, seed=7)
    _, st = rt.wtmMC(X, 1.0, samples=30, step=5.0, chains=128, seed=5,
                     backend="pallas")
    E_re = np.asarray(jax.jit(jax.vmap(X.energy))(st.sigma), np.float64)
    np.testing.assert_array_equal(E_re, np.asarray(st.E, np.float64))


def test_perc_eo_kernel(perc_interp):
    """EO rank-select on the matmul-identity dE vector: route, invariants,
    and ground-state discovery on an under-constrained instance."""
    import rrrmc_tpu as rt
    from rrrmc_tpu.samplers.common import LAST_ROUTE

    X = rt.GraphPercStep(31, 7, seed=9)    # alpha < alpha_c: SAT whp
    res = rt.extremal_opt(X, 1.4, 500, chains=128, seed=7,
                          backend="pallas")
    assert LAST_ROUTE["backend"] == "pallas-eo-perc"
    E_fin = np.asarray(jax.jit(jax.vmap(X.energy))(res.sigma), np.float64)
    np.testing.assert_array_equal(E_fin, np.asarray(res.E, np.float64))
    smin_E = np.asarray(jax.jit(jax.vmap(X.energy))(res.sigma_min),
                        np.float64)
    np.testing.assert_array_equal(smin_E, np.asarray(res.Emin, np.float64))
    assert np.asarray(res.Emin).min() == 0.0
