"""Ring-replica (GraphQuant over dense base) kernel validation in
interpreter mode: the paper's QIsing workload engines
(/root/reference/scripts/scripts.jl:766-863).

The composite mixes the base's integer grid with the irrational Trotter
coupling fourK, so energies are f32 physical: invariants hold to f32
accumulation tolerance, laws to statistical tolerance against the XLA
paths (which run the reference's exact Double-graph formulation).
"""

import importlib
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def quant_interp():
    os.environ["RRRMC_PALLAS_INTERPRET"] = "1"
    import rrrmc_tpu.ops.quant_pallas as qp
    import rrrmc_tpu.ops.rejfree_pallas as rp
    importlib.reload(rp)
    importlib.reload(qp)
    yield qp
    os.environ.pop("RRRMC_PALLAS_INTERPRET")
    importlib.reload(rp)
    importlib.reload(qp)


@jax.jit
def _recompute(model, sigma):
    return jax.vmap(model.energy)(sigma)


def _qskt():
    import rrrmc_tpu as rt

    return rt.GraphQSKT(128, 4, 0.3, 2.0, seed=837)   # Nk=128 M=4 -> NM=512


def test_ring_spec_and_eligibility(quant_interp):
    import rrrmc_tpu as rt

    X = _qskt()
    spec = quant_interp.quant_ring_spec(X)
    assert spec is not None and spec["M"] == 4 and spec["Nk"] == 128
    assert not spec["flt"]                      # GraphSK base: exact bf16
    assert quant_interp.quant_ring_eligible(X, 128)
    assert not quant_interp.quant_ring_eligible(X, 64)   # chains % 128
    # Nk not a lane multiple -> ineligible (stays on the XLA path)
    q = rt.GraphQuant(16, 3, 0.4, 1.0, rt.GraphSK(16, seed=2))
    assert quant_interp.quant_ring_spec(q) is None


def test_ring_bkl_invariant_and_law(quant_interp):
    import rrrmc_tpu as rt
    from rrrmc_tpu.samplers.common import LAST_ROUTE

    X = _qskt()
    Es, st = rt.bklMC(X, 2.0, iters=30_000, step=300, chains=128, seed=3,
                      backend="pallas")
    assert LAST_ROUTE["backend"] == "pallas-rejfree-ring"
    E_re = np.asarray(_recompute(X, st.sigma), np.float64)
    np.testing.assert_allclose(np.asarray(st.E, np.float64), E_re,
                               atol=5e-3)
    assert np.asarray(st.accepted).min() > 0
    Ex, _ = rt.bklMC(X, 2.0, iters=30_000, step=300, chains=64, seed=4,
                     backend="xla")
    a = np.asarray(Es)[:, 40:].mean() / X.N
    b = np.asarray(Ex)[:, 40:].mean() / X.N
    assert abs(a - b) < 0.03, (a, b)


def test_ring_rrr_invariant_and_law(quant_interp):
    """Kernel rrr = SingleGraph rrr law on the flat composite: same
    stationary distribution as the XLA Double-graph rrr."""
    import rrrmc_tpu as rt
    from rrrmc_tpu.samplers.common import LAST_ROUTE

    X = _qskt()
    Es, st = rt.rrrMC(X, 2.0, iters=25_000, step=250, chains=128, seed=5,
                      backend="pallas")
    assert LAST_ROUTE["backend"] == "pallas-rejfree-ring"
    E_re = np.asarray(_recompute(X, st.sigma), np.float64)
    np.testing.assert_allclose(np.asarray(st.E, np.float64), E_re,
                               atol=5e-3)
    Ex, _ = rt.rrrMC(X, 2.0, iters=25_000, step=250, chains=32, seed=6,
                     backend="xla")
    a = np.asarray(Es)[:, 30:].mean() / X.N
    b = np.asarray(Ex)[:, 30:].mean() / X.N
    assert abs(a - b) < 0.04, (a, b)


def test_ring_sweep_invariant_law_and_state(quant_interp):
    import rrrmc_tpu as rt

    X = _qskt()
    Es, st = rt.sweepMC_quant(X, 2.0, sweeps=100, step=4, chains=128, seed=9)
    E_re = np.asarray(_recompute(X, st.sigma), np.float64)
    np.testing.assert_allclose(np.asarray(st.E, np.float64), E_re,
                               atol=5e-3)
    assert np.asarray(st.accepted).min() > 0
    # warm continuation round-trips
    Es2, st2 = rt.sweepMC_quant(X, 2.0, sweeps=8, step=8, chains=128,
                                seed=11, state=st)
    E_re2 = np.asarray(_recompute(X, st2.sigma), np.float64)
    np.testing.assert_allclose(np.asarray(st2.E, np.float64), E_re2,
                               atol=5e-3)
    # equilibrium law matches the XLA single-site Metropolis path
    Em, _ = rt.standardMC(X, 2.0, iters=40_000, step=400, chains=64,
                          seed=11)
    a = np.asarray(Es)[:, 13:].mean() / X.N
    b = np.asarray(Em)[:, 50:].mean() / X.N
    assert abs(a - b) < 0.03, (a, b)


def test_ring_wtm_invariant(quant_interp):
    import rrrmc_tpu as rt

    X = _qskt()
    Es, st = rt.wtmMC(X, 2.0, samples=30, step=10.0, chains=128, seed=5,
                      backend="pallas")
    E_re = np.asarray(_recompute(X, st.sigma), np.float64)
    np.testing.assert_allclose(np.asarray(st.E, np.float64), E_re,
                               atol=5e-3)
    assert np.all(np.isfinite(np.asarray(Es)))
