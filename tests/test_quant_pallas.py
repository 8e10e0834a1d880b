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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
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


# ---------------------------------------------------------------------------
# RE star composites (GraphRobustEnsemble over dense bases): same race /
# sweep machinery with the ring term swapped for the mu/fk star delta
# (/root/reference/src/graphs/RE.jl:60-104) — the REIsing workload engines.
# ---------------------------------------------------------------------------


def _skre():
    import rrrmc_tpu as rt

    return rt.GraphSKRE(128, 4, 2.0, 0.4, seed=991)   # Nk=128 M=4 -> NM=512


def test_star_spec_and_eligibility(quant_interp):
    import rrrmc_tpu as rt

    R = _skre()
    spec = quant_interp.composite_spec(R)
    assert spec is not None and spec["term"] == "star"
    assert len(spec["fk"]) == 4 and spec["c4"] == 0.0
    assert quant_interp.replica_composite_eligible(R, 128)
    assert quant_interp.quant_ring_spec(R) is None     # ring-only alias
    # spec cache distinguishes same-base wrappers with different gamma
    base = R.resid_m.base
    R2 = rt.GraphRobustEnsemble(128, 4, 3.0, 0.4, base)
    s2 = quant_interp.composite_spec(R2)
    assert tuple(s2["fk"]) != tuple(spec["fk"])


def test_star_bkl_invariant_and_law(quant_interp):
    import rrrmc_tpu as rt
    from rrrmc_tpu.samplers.common import LAST_ROUTE

    R = _skre()
    Es, st = rt.bklMC(R, 0.4, iters=30_000, step=300, chains=128, seed=3,
                      backend="pallas")
    assert LAST_ROUTE["backend"] == "pallas-rejfree-star"
    E_re = np.asarray(_recompute(R, st.sigma), np.float64)
    np.testing.assert_allclose(np.asarray(st.E, np.float64), E_re,
                               rtol=3e-5, atol=5e-3)
    assert np.asarray(st.accepted).min() > 0
    Ex, _ = rt.bklMC(R, 0.4, iters=30_000, step=300, chains=64, seed=4,
                     backend="xla")
    a = np.asarray(Es)[:, 40:].mean() / R.N
    b = np.asarray(Ex)[:, 40:].mean() / R.N
    assert abs(a - b) < 0.03, (a, b)


@pytest.mark.slow
def test_star_rrr_invariant_and_law(quant_interp):
    import rrrmc_tpu as rt
    from rrrmc_tpu.samplers.common import LAST_ROUTE

    R = _skre()
    Es, st = rt.rrrMC(R, 0.4, iters=20_000, step=200, chains=128, seed=5,
                      backend="pallas")
    assert LAST_ROUTE["backend"] == "pallas-rejfree-star"
    E_re = np.asarray(_recompute(R, st.sigma), np.float64)
    np.testing.assert_allclose(np.asarray(st.E, np.float64), E_re,
                               rtol=3e-5, atol=5e-3)
    # law check from a SHARED equilibrated start (the kernel relaxes much
    # faster, so window means from random starts differ by dynamics speed,
    # not by stationary law)
    Ex, _ = rt.rrrMC(R, 0.4, iters=20_000, step=200, chains=32, seed=6,
                     backend="xla", C0=np.asarray(st.sigma)[:32])
    a = np.asarray(Es)[:, 50:].mean() / R.N
    b = np.asarray(Ex).mean() / R.N
    assert abs(a - b) < 0.04, (a, b)


@pytest.mark.slow
def test_star_sweep_invariant_law_and_state(quant_interp):
    import rrrmc_tpu as rt

    R = _skre()
    Es, st = rt.sweepMC_replica(R, 0.4, sweeps=240, step=8, chains=128,
                                seed=9)
    E_re = np.asarray(_recompute(R, st.sigma), np.float64)
    np.testing.assert_allclose(np.asarray(st.E, np.float64), E_re,
                               rtol=3e-5, atol=5e-3)
    assert np.asarray(st.accepted).min() > 0
    # warm continuation round-trips (threaded base lf + in-kernel mu)
    Es2, st2 = rt.sweepMC_replica(R, 0.4, sweeps=8, step=8, chains=128,
                                  seed=11, state=st)
    E_re2 = np.asarray(_recompute(R, st2.sigma), np.float64)
    np.testing.assert_allclose(np.asarray(st2.E, np.float64), E_re2,
                               rtol=3e-5, atol=5e-3)
    # equilibrium law matches the XLA single-site Metropolis path, from a
    # SHARED equilibrated start (see the rrr law check above). The RE star
    # relaxes slowly at beta=0.4: the sweep window must sit past ~160
    # sweeps or it measures the transient, not the stationary law.
    Em, _ = rt.standardMC(R, 0.4, iters=40_000, step=400, chains=64,
                          seed=11, C0=np.asarray(st2.sigma)[:64])
    a = np.asarray(Es)[:, 20:].mean() / R.N
    b = np.asarray(Em).mean() / R.N
    assert abs(a - b) < 0.03, (a, b)


# ---------------------------------------------------------------------------
# Sparse-base composites: Quant/RE over sparse Pairwise bases ride the
# resident-base-lf inverse-column kernel (composite_sparse_spec) instead of
# the dense matmul spec — Quant(RRG)/RE(RRG) get rejfree/rrr kernel routes.
# ---------------------------------------------------------------------------


def test_sparse_ring_bkl_invariant_and_law(quant_interp):
    import rrrmc_tpu as rt
    from rrrmc_tpu.samplers.common import LAST_ROUTE

    base = rt.GraphRRG(60, 3, (-1, 1), seed=5)
    Q = rt.GraphQuant(60, 4, 0.6, 1.0, base)
    Es, st = rt.bklMC(Q, 1.0, iters=8000, step=200, chains=128, seed=3,
                      backend="pallas")
    assert LAST_ROUTE["backend"] == "pallas-rejfree-ring-sparse"
    E_re = np.asarray(jax.jit(jax.vmap(Q.energy))(st.sigma), np.float64)
    err = np.abs(E_re - np.asarray(st.E, np.float64)).max()
    assert err < 1e-2 * max(1.0, np.abs(E_re).max() * 1e-4), err
    Ex, _ = rt.bklMC(Q, 1.0, iters=8000, step=200, chains=128, seed=4,
                     backend="xla")
    a = np.asarray(Es)[:, 20:].mean()
    b = np.asarray(Ex)[:, 20:].mean()
    assert abs(a - b) / abs(b) < 0.02, (a, b)


def test_sparse_star_rrr_invariant(quant_interp):
    import rrrmc_tpu as rt
    from rrrmc_tpu.samplers.common import LAST_ROUTE

    R = rt.GraphRobustEnsemble(60, 4, 2.0, 0.5,
                               rt.GraphRRG(60, 3, (-1, 1), seed=7))
    _, st = rt.rrrMC(R, 0.5, iters=2000, step=100, chains=128, seed=6,
                     backend="pallas")
    assert LAST_ROUTE["backend"] == "pallas-rejfree-star-sparse"
    E_re = np.asarray(jax.jit(jax.vmap(R.energy))(st.sigma), np.float64)
    err = np.abs(E_re - np.asarray(st.E, np.float64)).max()
    assert err < 1e-2, err


@pytest.mark.slow
def test_sparse_star_law_vs_xla(quant_interp):
    """RE(RRG) kernel wtm equilibrium mean matches the XLA path (same
    stationary law through an entirely different engine)."""
    import rrrmc_tpu as rt

    R = rt.GraphRobustEnsemble(60, 4, 2.0, 0.5,
                               rt.GraphRRG(60, 3, (-1, 1), seed=7))
    Es, _ = rt.wtmMC(R, 0.5, samples=120, step=20.0, chains=128, seed=6,
                     backend="pallas")
    Ex, _ = rt.wtmMC(R, 0.5, samples=120, step=20.0, chains=128, seed=8,
                     backend="xla")
    a = np.asarray(Es)[:, 30:].mean()
    b = np.asarray(Ex)[:, 30:].mean()
    assert abs(a - b) / abs(b) < 0.02, (a, b)
