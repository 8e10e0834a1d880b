"""Replica-wrapper validation (Quant / RE / LE / TLE / AddFields / SK):

1. exact-vs-brute-force delta_energy on every wrapper (the check_delta
   analog, /root/reference/src/graphs/PercLinear.jl:182-190);
2. aux (local-field cache) consistency after random flip sequences — the
   vectorized equivalent of the reference's commented-in check_consistency;
3. sampler energy invariant (checkenergy_hook,
   /root/reference/test/runtests.jl:12-15) through every sampler on wrapper
   models, including the DoubleGraph rrrMC path;
4. exact Boltzmann stationarity of rrrMC on a small quantum model;
5. wrapper observables (Qenergy, overlaps, distances, cenergy) sanity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rrrmc_tpu as rt
from rrrmc_tpu.core.model import random_spins


def wrapper_zoo():
    ea = rt.GraphEA(2, 2, (-1, 1), seed=8)
    return {
        "SK": rt.GraphSK(8, seed=1),
        "SKNormal": rt.GraphSKNormal(8, seed=2),
        "QSKT": rt.GraphQSKT(6, 4, 0.5, 2.0, seed=3),
        "Q0T": rt.GraphQ0T(5, 3, 0.7, 1.5),
        "QEAT": rt.GraphQEAT(2, 2, 4, 0.3, 2.0, seed=9),
        "SKRE": rt.GraphSKRE(5, 4, 0.4, 2.0, seed=4),
        "0RE": rt.Graph0RE(4, 3, 0.3, 1.0),
        "EARE": rt.GraphEARE(2, 2, 4, 0.5, 2.0, seed=10),
        "SKLE": rt.GraphSKLE(4, 3, 0.4, 2.0, seed=5),
        "0LE": rt.Graph0LE(4, 3, 0.2, 1.0),
        "EALE": rt.GraphEALE(2, 2, 3, 0.5, 2.0, seed=11),
        "SKTLE": rt.GraphSKTLE(4, 3, 0.4, 0.2, 2.0, seed=6),
        "EATLE": rt.GraphEATLE(2, 2, 3, 0.4, 0.2, 2.0, seed=7),
        "AddFields": rt.GraphAddFields(np.linspace(-1, 1, 4), ea),
        "AddSubFields": rt.GraphAddSubFields(np.linspace(-1, 1, 4), ea),
        "Mixed": rt.mixed(rt.GraphEA(2, 2, (-1, 1), seed=12),
                          rt.GraphFields(4, (0.5, 1.5), seed=13)),
        # nested wrapper composition (the reference's
        # GraphRobustEnsemble(..., GraphQuant, ..., GraphSK, ...) case,
        # /root/reference/test/runtests.jl:105): RE over a Quant DoubleGraph
        "RE(Q(SK))": rt.GraphRobustEnsemble(
            20, 4, 1.5, 2.0,
            rt.GraphQuant(5, 4, 0.5, 2.0, rt.GraphSK(5, seed=14))),
        "LE(Q(SK))": rt.GraphLocalEntropy(
            12, 3, 0.5, 2.0,
            rt.GraphQuant(4, 3, 0.5, 2.0, rt.GraphSK(4, seed=15))),
    }


ZOO = wrapper_zoo()


@pytest.mark.parametrize("name", list(ZOO.keys()))
def test_delta_and_aux_consistency(name):
    model = ZOO[name]
    sigma0 = random_spins(jax.random.key(0), model.N)

    @jax.jit
    def run(sigma):
        aux = model.init_aux(sigma)
        E = model.to_physical(model.energy(sigma))
        dall = model.to_physical(model.delta_all(sigma, aux))

        def bf(i):
            return model.to_physical(model.energy(sigma.at[i].multiply(-1))) - E

        dbf = jax.vmap(bf)(jnp.arange(model.N))

        def body(carry, k):
            sigma, aux = carry
            i = jax.random.randint(k, (), 0, model.N)
            return model.flip(sigma, aux, i, jnp.asarray(True)), None

        (sig2, aux2), _ = jax.lax.scan(
            body, (sigma, aux), jax.random.split(jax.random.key(1), 50))
        return dall, dbf, aux2, model.init_aux(sig2)

    dall, dbf, aux2, aux_re = run(sigma0)
    np.testing.assert_allclose(np.asarray(dall, np.float64),
                               np.asarray(dbf, np.float64), atol=1e-9)
    for a, b in zip(jax.tree.leaves(aux2), jax.tree.leaves(aux_re)):
        np.testing.assert_allclose(np.asarray(a, np.float64),
                                   np.asarray(b, np.float64), atol=1e-9)


SAMPLER_MODELS = ["QSKT", "SKRE", "SKLE", "SKTLE", "AddFields", "SK",
                  "RE(Q(SK))"]


@pytest.mark.parametrize("name", SAMPLER_MODELS)
def test_sampler_energy_invariant(name):
    model = ZOO[name]
    for run in (
        lambda: rt.standardMC(model, 2.0, iters=1500, step=100, chains=4, seed=5),
        lambda: rt.rrrMC(model, 2.0, iters=800, step=100, chains=4, seed=6),
        lambda: rt.bklMC(model, 2.0, iters=1500, step=100, chains=4, seed=7),
    ):
        Es, state = run()
        E_re = jax.jit(jax.vmap(
            lambda s: model.to_physical(model.energy(s))))(state.sigma)
        E_run = jax.jit(jax.vmap(model.to_physical))(state.E)
        np.testing.assert_allclose(np.asarray(E_run), np.asarray(E_re),
                                   atol=1e-9)
        assert np.all(np.isfinite(np.asarray(Es)))


TABLE_MODELS = ["QSKT", "Q0T", "QEAT", "SKRE", "EARE", "SKLE", "EALE",
                "SKTLE", "EATLE", "AddFields", "Mixed", "RE(Q(SK))"]


@pytest.mark.parametrize("name", TABLE_MODELS)
def test_neighbor_table_covers_delta_changes(name):
    """Exact coverage check of the composite affected-spin tables feeding
    wtmMC's neighbor-only clock redraw: flipping spin i may only change
    delta_one(j) for j in neighbor_table()[i] (plus i itself) — a missing
    entry would leave a stale WTM clock and silently break the sampling law
    (/root/reference/src/WaitingTimes.jl:39-51)."""
    model = ZOO[name]
    tbl = model.neighbor_table()
    if tbl is None:
        pytest.skip("model falls back to full redraw")
    n = model.N
    tbl = np.asarray(tbl)
    allowed = np.zeros((n, n + 1), bool)
    allowed[np.arange(n)[:, None], np.clip(tbl, 0, n)] = True
    allowed[np.arange(n), np.arange(n)] = True  # the flipped spin itself
    sigma0 = random_spins(jax.random.key(3), n)

    @jax.jit
    def deltas_after_each_flip(sigma):
        aux = model.init_aux(sigma)
        d0 = model.to_physical(model.delta_all(sigma, aux))

        def one(i):
            s2, a2 = model.flip(sigma, aux, i, jnp.asarray(True))
            return model.to_physical(model.delta_all(s2, a2))

        return d0, jax.vmap(one)(jnp.arange(n))

    d0, d1 = deltas_after_each_flip(sigma0)
    changed = np.abs(np.asarray(d1) - np.asarray(d0)[None, :]) > 1e-9
    bad = changed & ~allowed[:, :n]
    assert not bad.any(), np.argwhere(bad)[:10]


@pytest.mark.parametrize("name", ["QSKT", "SKRE"])
def test_wtm_wrapper_stationarity(name):
    """wtmMC with the derived composite tables must still sample the exact
    Boltzmann law on small wrapper models."""
    model = {"QSKT": rt.GraphQSKT(3, 4, 0.6, 1.5, seed=21),
             "SKRE": rt.GraphSKRE(3, 4, 0.4, 1.5, seed=23)}[name]
    beta = 1.5
    E_exact = _boltzmann_mean_energy(model, beta)
    Es, _ = rt.wtmMC(model, beta, samples=400, step=20.0, chains=64, seed=9)
    Es = np.asarray(Es)[:, 100:]
    err = abs(Es.mean() - E_exact)
    sem = Es.std() / np.sqrt(Es.shape[0] * 3.0)
    assert err < max(5 * sem, 0.05), (err, sem, E_exact)


def _boltzmann_mean_energy(model, beta):
    from rrrmc_tpu.observables import unpack_config
    n = model.N
    states = unpack_config(jnp.arange(2 ** n, dtype=jnp.int32), n)
    E = jax.jit(jax.vmap(lambda s: model.to_physical(model.energy(s))))(states)
    E = np.asarray(E, np.float64)
    w = np.exp(-beta * (E - E.min()))
    return float((w * E).sum() / w.sum())


def test_quant_rrr_stationarity():
    """rrrMC on a DoubleGraph quantum model must sample the exact Boltzmann
    law (residual-corrected acceptance, /root/reference/src/RRRMC.jl:260-262)."""
    model = rt.GraphQSKT(3, 4, 0.6, 1.5, seed=21)  # N = 12
    beta = 1.5
    E_exact = _boltzmann_mean_energy(model, beta)
    Es, _ = rt.rrrMC(model, beta, iters=8000, step=20, chains=48, seed=2)
    Es = np.asarray(Es)[:, 100:]
    err = abs(Es.mean() - E_exact)
    assert err < 0.06, (Es.mean(), E_exact)


def test_le_standard_stationarity():
    model = rt.GraphSKLE(3, 3, 0.5, 2.0, seed=22)  # N = 12
    beta = 2.0
    E_exact = _boltzmann_mean_energy(model, beta)
    Es, _ = rt.standardMC(model, beta, iters=32000, step=40, chains=96, seed=3)
    Es = np.asarray(Es)[:, 400:]
    err = abs(Es.mean() - E_exact)
    assert err < 0.06, (Es.mean(), E_exact)


def test_quant_observables():
    q = rt.GraphQSKT(6, 4, 0.5, 2.0, seed=3)
    s = random_spins(jax.random.key(5), q.N)
    Qe, tm, Ren, ov = jax.jit(lambda s: (
        q.Qenergy(s), q.transverse_mag(s), q.Renergies(s), q.overlaps(s)))(s)
    assert Ren.shape == (4,)
    assert ov.shape == (2,)
    assert np.all(np.abs(np.asarray(ov)) <= 1.0)
    # Qenergy = -Gamma*tmag + mean replica energy per spin
    np.testing.assert_allclose(
        float(Qe), -0.5 * float(tm) + float(np.sum(np.asarray(Ren))) / q.N,
        rtol=1e-12)


def test_le_observables():
    le = rt.GraphSKLE(4, 3, 0.4, 2.0, seed=5)
    s = random_spins(jax.random.key(6), le.N)
    ce, dist, Es = jax.jit(lambda s: (
        le.cenergy(s), le.distances(s), le.LEenergies(s)))(s)
    dist = np.asarray(dist)
    assert dist.shape == (3, 3)
    assert np.all(dist == dist.T) and np.all(np.diag(dist) == 0)
    assert Es.shape == (3,)
    # cenergy equals base energy of the center block (internal layout is
    # replica-major: center = leading Nk block)
    base = le.resid_m.base
    cc = np.asarray(s)[:4]
    E_direct = float(base.to_physical(base.energy(jnp.asarray(cc))))
    np.testing.assert_allclose(float(ce), E_direct, rtol=1e-12)


def test_fourK_formula():
    import math
    beta, Gamma, M = 2.0, 0.3, 16
    fourK = rt.four_K(beta, Gamma, M)
    expect = 2.0 / beta * math.log(1.0 / math.tanh(beta * Gamma / M))
    assert abs(fourK - expect) < 1e-8


def test_annealing_rebind():
    """Annealing protocol via rebind (the reference's re-parameterize
    constructors + C0 warm starts, QT.jl:66): step Gamma down, rebuild the
    wrapper, rebind the state — spins and RNG keys carry over, aux/E are
    re-derived exactly under the new coupling."""
    import rrrmc_tpu as rt

    base = rt.GraphSK(16, seed=3)
    state = None
    for Gamma in (2.0, 1.0, 0.5):
        m = rt.GraphQuant(16, 4, Gamma=Gamma, beta=1.0, base=base)
        if state is None:
            state = rt.init_state(m, 8, seed=5)
        else:
            prev_sigma, prev_key = state.sigma, state.key
            state = rt.rebind(m, state)
            np.testing.assert_array_equal(np.asarray(state.sigma),
                                          np.asarray(prev_sigma))
            assert np.array_equal(
                np.asarray(jax.random.key_data(state.key)),
                np.asarray(jax.random.key_data(prev_key)))
        Es, state = rt.standardMC(m, 1.0, iters=500, step=100, chains=8,
                                  state=state)
        E_re = jax.jit(jax.vmap(m.energy))(state.sigma)
        np.testing.assert_allclose(np.asarray(E_re), np.asarray(state.E),
                                   atol=1e-9)


def test_reference_layout_roundtrip():
    """to/from_reference_layout invert each other and implement the exact
    reference index conventions (QT.jl:172-182 replica-major; RE.jl:255-263
    site-major; LE.jl:227-240 site-major with slot 0 = reference)."""
    import rrrmc_tpu as rt
    from rrrmc_tpu.models.replicas import (to_reference_layout,
                                           from_reference_layout)

    base = rt.GraphSK(8, seed=1)
    for m in (rt.GraphQuant(8, 4, Gamma=0.3, beta=1.0, base=base),
              rt.GraphRobustEnsemble(8, 3, gamma=0.2, beta=1.0, base=base),
              rt.GraphLocalEntropy(8, 3, gamma=0.2, beta=1.0, base=base)):
        sigma = rt.random_spins(jax.random.key(2), m.N)
        ref = to_reference_layout(m, sigma)
        back = from_reference_layout(m, ref)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(sigma))
    # RE: reference index j = k + i*M must read replica k, site i
    m = rt.GraphRobustEnsemble(8, 3, gamma=0.2, beta=1.0, base=base)
    sigma = jnp.arange(m.N, dtype=jnp.int8)  # internal: value = k*Nk + i
    ref = np.asarray(to_reference_layout(m, sigma))
    M, Nk = 3, 8
    for i in range(Nk):
        for k in range(M):
            assert ref[k + i * M] == k * Nk + i
    # LE: reference slot s=0 is the center block (internal block 0)
    m = rt.GraphLocalEntropy(8, 3, gamma=0.2, beta=1.0, base=base)
    sigma = jnp.arange(m.N, dtype=jnp.int8)
    ref = np.asarray(to_reference_layout(m, sigma))
    for i in range(8):
        assert ref[0 + i * 4] == i          # center block
        assert ref[1 + i * 4] == 8 + i      # replica 0 block
