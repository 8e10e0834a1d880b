"""SAT rejection-free / EO Pallas kernel validation in interpreter mode.

The resident state is bit-packed per-variable clause-count words (the
TPU-native ClauseCache, ops/sat_pallas.py vs
/root/reference/src/graphs/SAT.jl:58-320); the exact int32 energy invariant
plus the time-weighted Boltzmann mean per mode validate both the packed-field
updates and the shared race/skip bookkeeping.
"""

import importlib
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def sat_interp():
    os.environ["RRRMC_PALLAS_INTERPRET"] = "1"
    import rrrmc_tpu.ops.sat_pallas as sp
    importlib.reload(sp)
    yield sp
    os.environ.pop("RRRMC_PALLAS_INTERPRET")
    importlib.reload(sp)


def _boltzmann_mean(model, beta):
    from rrrmc_tpu.observables import unpack_config
    states = unpack_config(jnp.arange(2 ** model.N, dtype=jnp.int32), model.N)
    E = np.asarray(jax.jit(jax.vmap(
        lambda s: model.to_physical(model.energy(s))))(states), np.float64)
    w = np.exp(-beta * (E - E.min()))
    return float((w * E).sum() / w.sum())


def test_sat_bkl_invariant_and_route(sat_interp):
    import rrrmc_tpu as rt
    from rrrmc_tpu.samplers.common import LAST_ROUTE

    X = rt.GraphSAT(40, 3, 3.0, seed=5)
    Es, st = rt.bklMC(X, 2.0, iters=8_000, step=100, chains=128, seed=3,
                      backend="pallas")
    assert LAST_ROUTE["backend"] == "pallas-rejfree-sat"
    E_re = jax.jit(jax.vmap(X.energy))(st.sigma)
    np.testing.assert_array_equal(np.asarray(E_re), np.asarray(st.E))
    assert np.all(np.isfinite(np.asarray(Es)))
    # equilibrium energy agrees with the XLA bkl path (same law)
    Ex, _ = rt.bklMC(X, 2.0, iters=8_000, step=100, chains=128, seed=4,
                     backend="xla")
    a = np.asarray(Es)[:, 30:].mean() / X.N
    b = np.asarray(Ex)[:, 30:].mean() / X.N
    assert abs(a - b) < 0.03, (a, b)


def test_sat_wtm_invariant_k4(sat_interp):
    """K=4 exercises 3-bit fields (10 slots/word)."""
    import rrrmc_tpu as rt

    X = rt.GraphSAT(24, 4, 2.5, seed=7)
    Es, st = rt.wtmMC(X, 1.5, samples=60, step=10.0, chains=128, seed=5,
                      backend="pallas")
    E_re = jax.jit(jax.vmap(X.energy))(st.sigma)
    np.testing.assert_array_equal(np.asarray(E_re), np.asarray(st.E))
    assert np.all(np.isfinite(np.asarray(Es)))


@pytest.mark.parametrize("mode", ["bkl", "wtm", "rrr"])
@pytest.mark.slow
def test_sat_boltzmann(sat_interp, mode):
    """Time-weighted checkpoint mean vs exact 2^N Boltzmann enumeration."""
    import rrrmc_tpu as rt

    X = rt.GraphSAT(14, 3, 2.5, seed=11)
    beta = 1.0
    E_exact = _boltzmann_mean(X, beta)
    if mode == "bkl":
        Es, _ = rt.bklMC(X, beta, iters=60_000, step=200, chains=128,
                         seed=9, backend="pallas")
    elif mode == "wtm":
        Es, _ = rt.wtmMC(X, beta, samples=300, step=30.0, chains=128,
                         seed=9, backend="pallas")
    else:
        Es, _ = rt.rrrMC(X, beta, iters=12_000, step=60, chains=128,
                         seed=9, backend="pallas")
    Es = np.asarray(Es)
    got = Es[:, Es.shape[1] // 4:].mean()
    sem = Es[:, Es.shape[1] // 4:].std() / np.sqrt(Es.shape[0] * 3.0)
    assert abs(got - E_exact) < max(5 * sem, 0.05), (got, E_exact, sem)


def test_sat_warm_start(sat_interp):
    """State round trip: a second run continues from the returned MCState."""
    import rrrmc_tpu as rt

    X = rt.GraphSAT(32, 3, 3.5, seed=6)
    _, st = rt.bklMC(X, 2.0, iters=800, step=100, chains=128, seed=3,
                     backend="pallas")
    _, st2 = rt.rrrMC(X, 2.0, iters=400, step=100, chains=128, seed=8,
                      backend="pallas", state=st)
    E_re = jax.jit(jax.vmap(X.energy))(st2.sigma)
    np.testing.assert_array_equal(np.asarray(E_re), np.asarray(st2.E))


def test_sat_eo_finds_solutions(sat_interp):
    import rrrmc_tpu as rt
    from rrrmc_tpu.ops.eo_pallas import pallas_eo_eligible

    X = rt.GraphSAT(30, 3, 2.0, seed=9)    # easy alpha: satisfiable whp
    assert pallas_eo_eligible(X, 128)
    res = rt.extremal_opt(X, 1.4, 1500, chains=128, seed=7,
                          backend="pallas")
    E_fin = np.asarray(jax.jit(jax.vmap(X.energy))(res.sigma))
    np.testing.assert_array_equal(E_fin, np.asarray(res.E).astype(E_fin.dtype))
    smin_E = np.asarray(jax.jit(jax.vmap(X.energy))(res.sigma_min))
    np.testing.assert_array_equal(smin_E,
                                  np.asarray(res.Emin).astype(smin_E.dtype))
    assert np.asarray(res.Emin).min() == 0.0    # found a satisfying assignment


def test_sat_eligibility_guards(sat_interp):
    import rrrmc_tpu as rt
    from rrrmc_tpu.models.sat import make_sat

    assert not sat_interp.sat_rejfree_ok(rt.GraphSK(16, seed=1))
    # K = 1 (unit clauses) stays on XLA
    X1 = rt.GraphSAT(16, 1, 1.0, seed=2)
    assert not sat_interp.sat_rejfree_ok(X1)
    # duplicate variable inside one clause -> declined
    Xd = make_sat(8, np.array([[0, 0, 1], [2, 3, 4]]),
                  np.array([[1, -1, 1], [1, 1, -1]]))
    assert not sat_interp.sat_rejfree_ok(Xd)
    # in-range instance accepted
    assert sat_interp.sat_rejfree_ok(rt.GraphSAT(16, 3, 2.0, seed=3))


def test_sat_field_packing_roundtrip(sat_interp):
    """_sat_prep packs exactly the gather-derived counts."""
    import rrrmc_tpu as rt

    X = rt.GraphSAT(20, 3, 3.0, seed=13)
    t = sat_interp._SatTables(X)
    key = jax.random.key(0)
    sigma = (jax.random.bernoulli(key, 0.5, (4, X.N)).astype(jnp.int8) * 2
             - 1)
    sigp, wTs = sat_interp._sat_prep(X, sigma, t.NP, t.Cmax, t.bits, t.spw,
                                     t.nw)
    S = np.asarray(jax.vmap(X._sat_counts)(sigma))    # [B, Mc]
    T = np.asarray(X.T)
    fmask = (1 << t.bits) - 1
    for c in range(t.Cmax):
        w, p = divmod(c, t.spw)
        got = (np.asarray(wTs[w]).T >> (p * t.bits)) & fmask  # [B, NP]
        for b in range(4):
            for j in range(X.N):
                a = T[j, c]
                want = S[b, a] if a < X.Mc else 2
                assert got[b, j] == want, (b, j, c)
