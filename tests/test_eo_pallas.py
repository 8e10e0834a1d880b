"""EO (extremal optimization) Pallas kernel validation in interpreter mode.

The rank law is the load-bearing test: with a large tau the k^{-tau} rank
distribution concentrates on rank 0, so the kernel must flip a minimal-dE
site essentially every move — this exercises the inverse-CDF rank draw, the
binary-search order statistic, AND the in-class uniform race at once.
"""

import importlib
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def eo_interp():
    os.environ["RRRMC_PALLAS_INTERPRET"] = "1"
    import rrrmc_tpu.ops.eo_pallas as ep
    importlib.reload(ep)
    yield ep
    os.environ.pop("RRRMC_PALLAS_INTERPRET")
    importlib.reload(ep)


def _recompute(model, sigma):
    return np.asarray(jax.jit(jax.vmap(
        lambda s: model.to_physical(model.energy(s))))(sigma))


def test_eo_pallas_invariant_lattice(eo_interp):
    """Exact energy tracking: E and Emin match recomputation from configs."""
    import rrrmc_tpu as rt

    X = rt.GraphEA(4, 3, (-1, 1), seed=5)    # N = 64
    res = rt.extremal_opt(X, 1.4, iters=500, chains=128, seed=3,
                          backend="pallas")
    np.testing.assert_allclose(np.asarray(res.E), _recompute(X, res.sigma),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(res.Emin),
                               _recompute(X, res.sigma_min), rtol=1e-6)
    assert np.all(np.asarray(res.Emin) <= np.asarray(res.E) + 1e-6)
    itmin = np.asarray(res.itmin)
    assert np.all((itmin >= 0) & (itmin <= 500))


def test_eo_pallas_ferro_ground_state(eo_interp):
    """All-(+1) couplings: EO must reach the known ground state -D*N."""
    import rrrmc_tpu as rt

    X = rt.GraphEA(4, 2, (1, 1), seed=1)     # ferromagnet, N = 16, E0 = -32
    res = rt.extremal_opt(X, 1.5, iters=400, chains=128, seed=7,
                          backend="pallas")
    assert float(np.min(np.asarray(res.Emin))) == -2.0 * X.N


def test_eo_pallas_rank_law(eo_interp):
    """tau = 8: rank 0 has probability ~0.996, so a single move from a fixed
    config must flip a site of minimal dE in (almost) every chain."""
    import rrrmc_tpu as rt

    X = rt.GraphEA(4, 2, (-1, 1), seed=11)   # N = 16
    rng = np.random.RandomState(0)
    C0 = rng.choice(np.array([-1, 1], np.int8), size=X.N)
    res = rt.extremal_opt(X, 8.0, iters=1, chains=128, seed=13, C0=C0,
                          backend="pallas")
    sig = np.asarray(res.sigma)
    flips = sig != C0[None, :]
    assert np.all(flips.sum(axis=1) == 1), "exactly one flip per chain"
    C0j = jnp.asarray(C0)
    dE = np.asarray(X.delta_all(C0j, X.init_aux(C0j)))
    picked = dE[np.argmax(flips, axis=1)]
    n_min = int((picked == dE.min()).sum())
    assert n_min >= 120, (n_min, picked[:16], dE.min())


def test_eo_pallas_matches_xla_law(eo_interp):
    """Mean best-energy after a fixed budget agrees with the XLA EO path."""
    import rrrmc_tpu as rt

    X = rt.GraphEA(4, 2, (-1, 1), seed=21)   # N = 16
    rp = rt.extremal_opt(X, 1.3, iters=800, chains=128, seed=5,
                         backend="pallas")
    rx = rt.extremal_opt(X, 1.3, iters=800, chains=128, seed=6,
                         backend="xla")
    a = np.asarray(rp.Emin).mean() / X.N
    b = np.asarray(rx.Emin).mean() / X.N
    assert abs(a - b) < 0.03, (a, b)


def test_eo_pallas_lattice_fields(eo_interp):
    """LatticeEA WITH external fields (the AddFields composition,
    /root/reference/src/graphs/AddFields.jl) routes to the lattice kernel:
    exact energy tracking, and a strong uniform field pins the ground
    state found by EO to all-up."""
    import dataclasses

    import rrrmc_tpu as rt
    from rrrmc_tpu.ops.eo_pallas import pallas_eo_eligible

    X0 = rt.GraphEA(4, 2, (-1, 1), seed=11)   # N = 16
    rng = np.random.RandomState(3)
    h = rng.randint(-2, 3, size=X0.N)
    X = dataclasses.replace(X0, h=jnp.asarray(h, X0.h.dtype))
    assert pallas_eo_eligible(X, 128)
    res = rt.extremal_opt(X, 1.4, iters=500, chains=128, seed=3,
                          backend="pallas")
    np.testing.assert_allclose(np.asarray(res.E), _recompute(X, res.sigma),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(res.Emin),
                               _recompute(X, res.sigma_min), rtol=1e-6)
    # dominant uniform field: ground state is all-(+1) regardless of J
    hbig = jnp.full((X0.N,), 16, X0.h.dtype)
    Xf = dataclasses.replace(X0, h=hbig)
    rf = rt.extremal_opt(Xf, 1.5, iters=400, chains=128, seed=7,
                         backend="pallas")
    best = np.argmin(np.asarray(rf.Emin))
    assert np.all(np.asarray(rf.sigma_min)[best] == 1), \
        "E = -(pair + h*s): h>0 must pin the ground state to all-up"


def test_eo_pallas_dense_sk(eo_interp):
    """Dense variant (GraphSK, N=64 padded to 128): invariant + XLA law."""
    import rrrmc_tpu as rt

    X = rt.GraphSK(64, seed=3)
    res = rt.extremal_opt(X, 1.3, iters=600, chains=128, seed=9,
                          backend="pallas")
    np.testing.assert_allclose(np.asarray(res.E), _recompute(X, res.sigma),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(res.Emin),
                               _recompute(X, res.sigma_min), rtol=1e-6)
    rx = rt.extremal_opt(X, 1.3, iters=600, chains=64, seed=10,
                         backend="xla")
    a = np.asarray(res.Emin).mean() / X.N
    b = np.asarray(rx.Emin).mean() / X.N
    assert abs(a - b) < 0.04, (a, b)


def test_eo_pallas_dense_float(eo_interp):
    """Float-coupling dense variant (GraphSKNormal — the continuous analog
    of the reference's EOCacheCont, /root/reference/src/DeltaE.jl:556-635):
    f32 energy tracking within accumulation tolerance, Emin consistency,
    and best-energy law agreement with the XLA EO path."""
    import rrrmc_tpu as rt
    from rrrmc_tpu.ops.eo_pallas import pallas_eo_eligible

    X = rt.GraphSKNormal(64, seed=3)
    assert pallas_eo_eligible(X, 128)
    res = rt.extremal_opt(X, 1.3, iters=600, chains=128, seed=9,
                          backend="pallas")
    np.testing.assert_allclose(np.asarray(res.E), _recompute(X, res.sigma),
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(res.Emin),
                               _recompute(X, res.sigma_min), atol=5e-3)
    assert np.all(np.asarray(res.Emin) <= np.asarray(res.E) + 5e-3)
    rx = rt.extremal_opt(X, 1.3, iters=600, chains=64, seed=10,
                         backend="xla")
    a = np.asarray(res.Emin).mean() / X.N
    b = np.asarray(rx.Emin).mean() / X.N
    assert abs(a - b) < 0.04, (a, b)


@pytest.fixture
def eo_stream_small(eo_interp):
    """Tiny dense caps + stream windows: small models exercise the
    HBM-streamed EO variant's multi-block cyclic DMA schedule."""
    ep = eo_interp
    old = (ep._EO_DENSE_NP_MAX, ep._EO_DENSE_NP_MAX_F,
           ep._EO_STREAM_W, ep._EO_STREAM_W_F)
    ep._EO_DENSE_NP_MAX = 16
    ep._EO_DENSE_NP_MAX_F = 16
    ep._EO_STREAM_W = 64
    ep._EO_STREAM_W_F = 32
    import rrrmc_tpu.samplers.eo as se
    se._EO_CACHE.clear()
    yield ep
    (ep._EO_DENSE_NP_MAX, ep._EO_DENSE_NP_MAX_F,
     ep._EO_STREAM_W, ep._EO_STREAM_W_F) = old
    se._EO_CACHE.clear()


def test_eo_stream_invariant_densified_rrg(eo_stream_small):
    """densify(GraphRRG) N=150 -> NP=192, 3 streamed J blocks: stream kind
    taken, exact E/Emin tracking, itmin within range."""
    import rrrmc_tpu as rt
    import rrrmc_tpu.samplers.eo as se

    X = rt.densify(rt.GraphRRG(150, 3, (-1, 1), seed=21))
    res = rt.extremal_opt(X, 1.4, iters=400, chains=128, seed=3,
                          backend="pallas")
    kinds = {ent[2].kind for ent in se._EO_CACHE.values()}
    assert kinds == {"stream"}, kinds
    np.testing.assert_allclose(np.asarray(res.E), _recompute(X, res.sigma),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(res.Emin),
                               _recompute(X, res.sigma_min), rtol=1e-6)
    assert np.all(np.asarray(res.Emin) <= np.asarray(res.E) + 1e-6)
    itmin = np.asarray(res.itmin)
    assert np.all((itmin >= 0) & (itmin <= 400))


def test_eo_stream_matches_dense_law(eo_stream_small):
    """Mean best-energy after a fixed budget agrees between the streamed
    kernel and the XLA EO path (same rank law, independent streams)."""
    import rrrmc_tpu as rt

    X = rt.densify(rt.GraphRRG(96, 3, (-1, 1), seed=23))
    rp = rt.extremal_opt(X, 1.3, iters=800, chains=128, seed=5,
                         backend="pallas")
    rx = rt.extremal_opt(X, 1.3, iters=800, chains=128, seed=6,
                         backend="xla")
    a = np.asarray(rp.Emin).mean() / X.N
    b = np.asarray(rx.Emin).mean() / X.N
    assert abs(a - b) < 0.03, (a, b)


def test_eo_stream_float_sknormal(eo_stream_small):
    """GraphSKNormal rides the f32 streamed EO kernel (IEEE sort keys in
    the resident table): invariant within f32 accumulation error + law."""
    import rrrmc_tpu as rt
    import rrrmc_tpu.samplers.eo as se

    X = rt.GraphSKNormal(96, seed=5)
    res = rt.extremal_opt(X, 1.3, iters=600, chains=128, seed=9,
                          backend="pallas")
    kinds = {ent[2].kind for ent in se._EO_CACHE.values()}
    assert kinds == {"stream"}, kinds
    np.testing.assert_allclose(np.asarray(res.E), _recompute(X, res.sigma),
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(res.Emin),
                               _recompute(X, res.sigma_min), atol=5e-3)
    rx = rt.extremal_opt(X, 1.3, iters=600, chains=64, seed=10,
                         backend="xla")
    a = np.asarray(res.Emin).mean() / X.N
    b = np.asarray(rx.Emin).mean() / X.N
    assert abs(a - b) < 0.04, (a, b)


def test_eo_stream_rank_law(eo_stream_small):
    """tau = 8 on the streamed path: a single move from a fixed config must
    flip a minimal-dE site in (almost) every chain — exercises the streamed
    key-table rebuild + resident binary search end to end."""
    import rrrmc_tpu as rt

    X = rt.densify(rt.GraphRRG(72, 3, (-1, 1), seed=31))
    rng = np.random.RandomState(0)
    C0 = rng.choice(np.array([-1, 1], np.int8), size=X.N)
    res = rt.extremal_opt(X, 8.0, iters=1, chains=128, seed=13, C0=C0,
                          backend="pallas")
    sig = np.asarray(res.sigma)
    flips = sig != C0[None, :]
    assert np.all(flips.sum(axis=1) == 1), "exactly one flip per chain"
    C0j = jnp.asarray(C0)
    dE = np.asarray(X.delta_all(C0j, X.init_aux(C0j)))
    picked = dE[np.argmax(flips, axis=1)]
    n_min = int((picked == dE.min()).sum())
    assert n_min >= 120, (n_min, picked[:16], dE.min())


def test_eo_pallas_float_rank_law(eo_interp):
    """tau = 8 on a float model: the sort-key order statistic must still
    pick a minimal-dE site in (almost) every chain — exercises the IEEE
    bitcast key transform across positive AND negative dE values."""
    import rrrmc_tpu as rt

    X = rt.GraphSKNormal(16, seed=11)
    rng = np.random.RandomState(0)
    C0 = rng.choice(np.array([-1, 1], np.int8), size=X.N)
    res = rt.extremal_opt(X, 8.0, iters=1, chains=128, seed=13, C0=C0,
                          backend="pallas")
    sig = np.asarray(res.sigma)
    flips = sig != C0[None, :]
    assert np.all(flips.sum(axis=1) == 1), "exactly one flip per chain"
    C0j = jnp.asarray(C0)
    dE = np.asarray(X.delta_all(C0j, X.init_aux(C0j)))
    picked = dE[np.argmax(flips, axis=1)]
    n_min = int((np.abs(picked - dE.min()) < 1e-5).sum())
    assert n_min >= 120, (n_min, picked[:16], dE.min())


# ---------------------------------------------------------------------------
# Sparse variant (ops/eo_pallas._eo_sparse_kernel): resident lf +
# inverse-neighbor-column O(deg) updates — tau-EO on sparse graphs (the
# reference's flagship EO workload, RRG ground states) without densify.
# ---------------------------------------------------------------------------


def test_eo_sparse_invariant_rrg(eo_interp):
    """GraphRRG (sparse, no densify) routes to the sparse EO kernel: exact
    E/Emin tracking, itmin range."""
    import rrrmc_tpu as rt
    import rrrmc_tpu.samplers.eo as se

    se._EO_CACHE.clear()
    X = rt.GraphRRG(150, 3, (-1, 1), seed=21)
    res = rt.extremal_opt(X, 1.4, iters=400, chains=128, seed=3,
                          backend="pallas")
    kinds = {ent[2].kind for ent in se._EO_CACHE.values()}
    assert kinds == {"sparse"}, kinds
    np.testing.assert_allclose(np.asarray(res.E), _recompute(X, res.sigma),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(res.Emin),
                               _recompute(X, res.sigma_min), rtol=1e-6)
    assert np.all(np.asarray(res.Emin) <= np.asarray(res.E) + 1e-6)
    itmin = np.asarray(res.itmin)
    assert np.all((itmin >= 0) & (itmin <= 400))


def test_eo_sparse_rank_law(eo_interp):
    """tau = 8 on the sparse kernel: a single move must flip a minimal-dE
    site in (almost) every chain — exercises the resident half table, the
    binary search, AND the O(deg) update in one move."""
    import rrrmc_tpu as rt

    X = rt.GraphRRG(72, 3, (-1, 1), seed=31)
    rng = np.random.RandomState(0)
    C0 = rng.choice(np.array([-1, 1], np.int8), size=X.N)
    res = rt.extremal_opt(X, 8.0, iters=1, chains=128, seed=13, C0=C0,
                          backend="pallas")
    sig = np.asarray(res.sigma)
    flips = sig != C0[None, :]
    assert np.all(flips.sum(axis=1) == 1), "exactly one flip per chain"
    C0j = jnp.asarray(C0)
    dE = np.asarray(X.delta_all(C0j, X.init_aux(C0j)))
    picked = dE[np.argmax(flips, axis=1)]
    n_min = int((picked == dE.min()).sum())
    assert n_min >= 120, (n_min, picked[:16], dE.min())


def test_eo_sparse_matches_xla_law(eo_interp):
    """Mean best-energy after a fixed budget agrees with the XLA EO path
    (same rank law), and a float sparse model (GraphRRGNormal) tracks
    energies within f32 tolerance."""
    import rrrmc_tpu as rt

    X = rt.GraphRRG(96, 3, (-1, 1), seed=23)
    rp = rt.extremal_opt(X, 1.3, iters=800, chains=128, seed=5,
                         backend="pallas")
    rx = rt.extremal_opt(X, 1.3, iters=800, chains=128, seed=6,
                         backend="xla")
    a = np.asarray(rp.Emin).mean() / X.N
    b = np.asarray(rx.Emin).mean() / X.N
    assert abs(a - b) < 0.03, (a, b)
    Xf = rt.GraphRRGNormal(96, 3, seed=5)
    rf = rt.extremal_opt(Xf, 1.3, iters=400, chains=128, seed=9,
                         backend="pallas")
    np.testing.assert_allclose(np.asarray(rf.E), _recompute(Xf, rf.sigma),
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(rf.Emin),
                               _recompute(Xf, rf.sigma_min), atol=5e-3)


def test_eo_sparse_float_lattice(eo_interp):
    """GraphEANormal EO rides the sparse kernel (float lattices previously
    had no EO kernel): f32 invariant + law vs XLA."""
    import rrrmc_tpu as rt
    import rrrmc_tpu.samplers.eo as se

    se._EO_CACHE.clear()
    X = rt.GraphEANormal(4, 2, seed=7)
    res = rt.extremal_opt(X, 1.3, iters=500, chains=128, seed=9,
                          backend="pallas")
    kinds = {ent[2].kind for ent in se._EO_CACHE.values()}
    assert kinds == {"sparse"}, kinds
    np.testing.assert_allclose(np.asarray(res.E), _recompute(X, res.sigma),
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(res.Emin),
                               _recompute(X, res.sigma_min), atol=5e-3)
    rx = rt.extremal_opt(X, 1.3, iters=500, chains=128, seed=10,
                         backend="xla")
    a = np.asarray(res.Emin).mean() / X.N
    b = np.asarray(rx.Emin).mean() / X.N
    assert abs(a - b) < 0.05, (a, b)


def test_eo_pspin_invariant_and_rank_law(eo_interp):
    """GraphPSpin3 EO rides the 3-spin product-table kernel: exact E/Emin
    tracking, and the tau=8 rank law (minimal-dE flip in ~every chain)."""
    import rrrmc_tpu as rt
    import rrrmc_tpu.samplers.eo as se

    se._EO_CACHE.clear()
    X = rt.GraphPSpin3(150, 3, seed=21)
    res = rt.extremal_opt(X, 1.4, iters=400, chains=128, seed=3,
                          backend="pallas")
    kinds = {ent[2].kind for ent in se._EO_CACHE.values()}
    assert kinds == {"pspin"}, kinds
    np.testing.assert_allclose(np.asarray(res.E), _recompute(X, res.sigma),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(res.Emin),
                               _recompute(X, res.sigma_min), rtol=1e-6)
    # rank law: tau = 8, one move from a fixed config
    X2 = rt.GraphPSpin3(72, 3, seed=31)
    rng = np.random.RandomState(0)
    C0 = rng.choice(np.array([-1, 1], np.int8), size=X2.N)
    r1 = rt.extremal_opt(X2, 8.0, iters=1, chains=128, seed=13, C0=C0,
                         backend="pallas")
    flips = np.asarray(r1.sigma) != C0[None, :]
    assert np.all(flips.sum(axis=1) == 1), "exactly one flip per chain"
    C0j = jnp.asarray(C0)
    dE = np.asarray(X2.delta_all(C0j, X2.init_aux(C0j)))
    picked = dE[np.argmax(flips, axis=1)]
    assert int((picked == dE.min()).sum()) >= 120
    # law agreement with the XLA EO path
    rx = rt.extremal_opt(X, 1.4, iters=400, chains=128, seed=6,
                         backend="xla")
    a = np.asarray(res.Emin).mean() / X.N
    b = np.asarray(rx.Emin).mean() / X.N
    assert abs(a - b) < 0.04, (a, b)
    se._EO_CACHE.clear()
