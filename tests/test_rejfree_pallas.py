"""Rejection-free (BKL/WTM) Pallas kernel validation in interpreter mode.

The checkpoint-series energy mean is the load-bearing law test: BKL/WTM
checkpoint streams weight each state by its holding time (skip counts /
waiting times), so the series mean equals the Boltzmann average ONLY if both
the move selection (∝ min(1, e^{-beta dE})) AND the time bookkeeping
(geometric skips / exponential waits) are correct — a bug in either shows up
as a biased mean even when the energy invariant is exact.
"""

import importlib
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def rejfree_interp():
    os.environ["RRRMC_PALLAS_INTERPRET"] = "1"
    import rrrmc_tpu.ops.rejfree_pallas as rp
    importlib.reload(rp)
    # pin lattice models to the roll-identity kernel these tests validate
    # (by default small lattices route to the dense MXU variant, which has
    # its own law tests below); the reload at teardown restores the default
    rp._LATTICE_DENSE_MAX = 0
    yield rp
    os.environ.pop("RRRMC_PALLAS_INTERPRET")
    importlib.reload(rp)


def _boltzmann_mean(model, beta):
    from rrrmc_tpu.observables import unpack_config
    states = unpack_config(jnp.arange(2 ** model.N, dtype=jnp.int32), model.N)
    E = np.asarray(jax.jit(jax.vmap(
        lambda s: model.to_physical(model.energy(s))))(states), np.float64)
    w = np.exp(-beta * (E - E.min()))
    return float((w * E).sum() / w.sum())


def test_bkl_pallas_invariant_3d(rejfree_interp):
    import rrrmc_tpu as rt

    X = rt.GraphEA(4, 3, (-1, 1), seed=5)    # N = 64
    Es, st = rt.bklMC(X, 2.0, iters=20_000, step=200, chains=128, seed=3,
                      backend="pallas")
    E_re = jax.jit(jax.vmap(X.energy))(st.sigma)
    np.testing.assert_array_equal(np.asarray(E_re), np.asarray(st.E))
    assert np.all(np.isfinite(np.asarray(Es)))
    # equilibrium energy agrees with the XLA bkl path (same law)
    Ex, _ = rt.bklMC(X, 2.0, iters=20_000, step=200, chains=128, seed=4,
                     backend="xla")
    a = np.asarray(Es)[:, 50:].mean() / X.N
    b = np.asarray(Ex)[:, 50:].mean() / X.N
    assert abs(a - b) < 0.02, (a, b)


def test_wtm_pallas_invariant_odd_L(rejfree_interp):
    """Odd L: no checkerboard exists, but rejection-free needs no coloring."""
    import rrrmc_tpu as rt

    X = rt.GraphEA(5, 2, (-1, 1), seed=7)    # N = 25, odd L
    Es, st = rt.wtmMC(X, 2.0, samples=80, step=20.0, chains=128, seed=5,
                      backend="pallas")
    E_re = jax.jit(jax.vmap(X.energy))(st.sigma)
    np.testing.assert_array_equal(np.asarray(E_re), np.asarray(st.E))
    assert np.all(np.isfinite(np.asarray(Es)))


@pytest.mark.parametrize("mode", ["bkl", "wtm"])
def test_rejfree_pallas_boltzmann(rejfree_interp, mode):
    """Time-weighted checkpoint mean vs exact 2^N Boltzmann enumeration."""
    import rrrmc_tpu as rt

    X = rt.GraphEA(4, 2, (-1, 1), seed=11)   # N = 16
    beta = 1.0
    E_exact = _boltzmann_mean(X, beta)
    if mode == "bkl":
        Es, _ = rt.bklMC(X, beta, iters=60_000, step=200, chains=128, seed=9,
                         backend="pallas")
    else:
        Es, _ = rt.wtmMC(X, beta, samples=300, step=40.0, chains=128, seed=9,
                         backend="pallas")
    Es = np.asarray(Es)
    got = Es[:, Es.shape[1] // 4:].mean()
    sem = Es[:, Es.shape[1] // 4:].std() / np.sqrt(Es.shape[0] * 3.0)
    assert abs(got - E_exact) < max(5 * sem, 0.05), (got, E_exact, sem)


def test_bkl_pallas_warm_start(rejfree_interp):
    """state round trip: a second run continues from the returned MCState."""
    import rrrmc_tpu as rt

    X = rt.GraphEA(4, 3, (-1, 1), seed=6)
    _, st = rt.bklMC(X, 2.0, iters=1_000, step=100, chains=128, seed=3,
                     backend="pallas")
    Es2, st2 = rt.bklMC(X, 2.0, iters=1_000, step=100, chains=128, seed=8,
                        backend="pallas", state=st)
    E_re = jax.jit(jax.vmap(X.energy))(st2.sigma)
    np.testing.assert_array_equal(np.asarray(E_re), np.asarray(st2.E))


# ---------------------------------------------------------------------------
# Dense (FullyConnected) rejection-free kernel: matmul local fields, padded
# sites masked out of the race and out of z.
# ---------------------------------------------------------------------------


def test_bkl_dense_invariant_sk(rejfree_interp):
    """GraphSK (N=64 -> padded to 128): exact invariant + XLA-law agreement."""
    import rrrmc_tpu as rt

    X = rt.GraphSK(64, seed=5)
    Es, st = rt.bklMC(X, 1.0, iters=20_000, step=200, chains=128, seed=3,
                      backend="pallas")
    E_re = jax.jit(jax.vmap(X.energy))(st.sigma)
    np.testing.assert_array_equal(np.asarray(E_re), np.asarray(st.E))
    assert np.all(np.isfinite(np.asarray(Es)))
    Ex, _ = rt.bklMC(X, 1.0, iters=20_000, step=200, chains=128, seed=4,
                     backend="xla")
    a = np.asarray(Es)[:, 50:].mean() / X.N
    b = np.asarray(Ex)[:, 50:].mean() / X.N
    assert abs(a - b) < 0.03, (a, b)


@pytest.mark.parametrize("mode", ["bkl", "wtm"])
@pytest.mark.slow
def test_rejfree_dense_boltzmann_with_fields(rejfree_interp, mode):
    """Exact 2^N Boltzmann check on an integer FullyConnected WITH fields
    (N=12 -> 116 masked padding rows; fields exercise the h path)."""
    import rrrmc_tpu as rt

    rng = np.random.default_rng(13)
    N = 12
    A = rng.integers(-2, 3, size=(N, N))
    J = (A + A.T)
    h = rng.integers(-2, 3, size=N)
    X = rt.make_fully_connected(J * 0.25, h * 0.25, scale=0.25)
    beta = 0.8
    E_exact = _boltzmann_mean(X, beta)
    if mode == "bkl":
        Es, _ = rt.bklMC(X, beta, iters=50_000, step=200, chains=128, seed=9,
                         backend="pallas")
    else:
        Es, _ = rt.wtmMC(X, beta, samples=250, step=40.0, chains=128, seed=9,
                         backend="pallas")
    Es = np.asarray(Es)
    got = Es[:, Es.shape[1] // 4:].mean()
    sem = Es[:, Es.shape[1] // 4:].std() / np.sqrt(Es.shape[0] * 3.0)
    assert abs(got - E_exact) < max(5 * sem, 0.05), (got, E_exact, sem)


def test_wtm_dense_densified_rrg_warm_start(rejfree_interp):
    """densify(GraphRRG) rides the dense kernel; state round-trips."""
    import rrrmc_tpu as rt

    X = rt.densify(rt.GraphRRG(32, 3, (-1, 1), seed=21))
    _, st = rt.wtmMC(X, 2.0, samples=40, step=5.0, chains=128, seed=5,
                     backend="pallas")
    Es2, st2 = rt.wtmMC(X, 2.0, samples=40, step=5.0, chains=128, seed=8,
                        backend="pallas", state=st)
    E_re = jax.jit(jax.vmap(X.energy))(st2.sigma)
    np.testing.assert_array_equal(np.asarray(E_re), np.asarray(st2.E))
    assert np.all(np.isfinite(np.asarray(Es2)))


# ---------------------------------------------------------------------------
# rrr mode: race-select + staged z/z' acceptance (the namesake sampler on
# the Pallas path), lattice and dense variants.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("dense", [False, True])
@pytest.mark.slow
def test_rrr_pallas_boltzmann(rejfree_interp, dense):
    """Exact 2^N Boltzmann check: per-iteration checkpoint stream of
    mode="rrr" must average to the Boltzmann mean (every iteration emits a
    state, so the stream IS the chain marginal — unlike bkl/wtm no holding
    times are involved)."""
    import rrrmc_tpu as rt

    if dense:
        X = rt.densify(rt.GraphEA(4, 2, (-1, 1), seed=11))   # N = 16
    else:
        X = rt.GraphEA(4, 2, (-1, 1), seed=11)
    beta = 1.0
    E_exact = _boltzmann_mean(X, beta)
    Es, st = rt.rrrMC(X, beta, iters=40_000, step=100, chains=128, seed=9,
                      backend="pallas")
    E_re = jax.jit(jax.vmap(X.energy))(st.sigma)
    np.testing.assert_array_equal(np.asarray(E_re), np.asarray(st.E))
    Es = np.asarray(Es)
    got = Es[:, Es.shape[1] // 4:].mean()
    sem = Es[:, Es.shape[1] // 4:].std() / np.sqrt(Es.shape[0] * 3.0)
    assert abs(got - E_exact) < max(5 * sem, 0.05), (got, E_exact, sem)


@pytest.mark.slow
def test_rrr_pallas_matches_xla_law(rejfree_interp):
    """Equilibrium energy of the kernel rrr must match the XLA rrr path."""
    import rrrmc_tpu as rt

    X = rt.GraphSK(48, seed=7)
    beta = 1.0
    Es, st = rt.rrrMC(X, beta, iters=30_000, step=300, chains=128, seed=3,
                      backend="pallas")
    E_re = jax.jit(jax.vmap(X.energy))(st.sigma)
    np.testing.assert_array_equal(np.asarray(E_re), np.asarray(st.E))
    Ex, _ = rt.rrrMC(X, beta, iters=30_000, step=300, chains=64, seed=4,
                     backend="xla")
    a = np.asarray(Es)[:, 40:].mean() / X.N
    b = np.asarray(Ex)[:, 40:].mean() / X.N
    assert abs(a - b) < 0.03, (a, b)


# ---------------------------------------------------------------------------
# HBM-streamed variant (ops/rejfree_pallas._rejfree_stream_kernel): J row
# blocks DMA'd through a double-buffered VMEM window per move, race reduced
# streamingly per block. Windows shrunk here so small models exercise the
# MULTI-block cyclic DMA schedule; integer and float (SKNormal) couplings,
# lattice fields, and acceptance accounting.
# ---------------------------------------------------------------------------


@pytest.fixture
def stream_small(rejfree_interp):
    """Tiny stream windows + VMEM cap: small models take the streamed
    multi-block path instead of the VMEM-resident dense kernel."""
    rp = rejfree_interp
    old = (rp._DENSE_NP_MAX, rp._STREAM_W, rp._STREAM_W_F)
    rp._DENSE_NP_MAX = 16
    rp._STREAM_W = 64
    rp._STREAM_W_F = 32
    import rrrmc_tpu.samplers.bkl as sb
    sb._REJFREE_CACHE.clear()
    yield rp
    rp._DENSE_NP_MAX, rp._STREAM_W, rp._STREAM_W_F = old
    sb._REJFREE_CACHE.clear()


def test_stream_bkl_densified_rrg(stream_small):
    """densify(GraphRRG) N=150 -> NP=192, 3 streamed blocks: exact invariant,
    stream route taken, accepted counter updated."""
    import rrrmc_tpu as rt
    from rrrmc_tpu.samplers.common import LAST_ROUTE

    X = rt.densify(rt.GraphRRG(150, 3, (-1, 1), seed=21))
    Es, st = rt.bklMC(X, 2.0, iters=2_500, step=100, chains=128, seed=3,
                      backend="pallas")
    assert LAST_ROUTE["backend"] == "pallas-rejfree-stream"
    E_re = jax.jit(jax.vmap(X.energy))(st.sigma)
    np.testing.assert_array_equal(np.asarray(E_re), np.asarray(st.E))
    assert np.all(np.isfinite(np.asarray(Es)))
    acc = np.asarray(st.accepted)
    assert acc.min() > 0 and acc.max() <= 2_500


@pytest.mark.slow
def test_stream_bkl_boltzmann(stream_small):
    """Multi-block streamed bkl (W=8 -> 3 blocks at N=18): time-weighted
    checkpoint mean matches the exact 2^18 Boltzmann enumeration."""
    import rrrmc_tpu as rt

    stream_small._STREAM_W = 8
    X = rt.densify(rt.GraphRRG(18, 3, (-1, 1), seed=7))
    beta = 1.0
    E_exact = _boltzmann_mean(X, beta)
    Es, _ = rt.bklMC(X, beta, iters=60_000, step=200, chains=128, seed=9,
                     backend="pallas")
    Es = np.asarray(Es)
    got = Es[:, Es.shape[1] // 4:].mean()
    sem = Es[:, Es.shape[1] // 4:].std() / np.sqrt(Es.shape[0] * 3.0)
    assert abs(got - E_exact) < max(5 * sem, 0.05), (got, E_exact, sem)


@pytest.mark.slow
def test_stream_rrr_and_wtm_invariant(stream_small):
    """rrr (two streamed passes per move) and wtm on the streamed path."""
    import rrrmc_tpu as rt

    X = rt.densify(rt.GraphRRG(150, 3, (-1, 1), seed=11))
    Es, st = rt.rrrMC(X, 1.0, iters=4_000, step=100, chains=128, seed=5,
                      backend="pallas")
    E_re = jax.jit(jax.vmap(X.energy))(st.sigma)
    np.testing.assert_array_equal(np.asarray(E_re), np.asarray(st.E))
    Es, st = rt.wtmMC(X, 2.0, samples=40, step=5.0, chains=128, seed=5,
                      backend="pallas")
    E_re = jax.jit(jax.vmap(X.energy))(st.sigma)
    np.testing.assert_array_equal(np.asarray(E_re), np.asarray(st.E))


@pytest.mark.slow
def test_stream_float_sknormal(stream_small):
    """GraphSKNormal rides the f32 streamed kernel: energy invariant within
    f32 accumulation error, equilibrium law matches the XLA bkl path
    (the DeltaECacheCont regime, /root/reference/src/DeltaE.jl:299-410)."""
    import rrrmc_tpu as rt
    from rrrmc_tpu.samplers.common import LAST_ROUTE

    X = rt.GraphSKNormal(96, seed=5)
    Es, st = rt.bklMC(X, 1.0, iters=20_000, step=200, chains=128, seed=3,
                      backend="pallas")
    assert LAST_ROUTE["backend"] == "pallas-rejfree-stream"
    E_re = np.asarray(jax.jit(jax.vmap(X.energy))(st.sigma), np.float64)
    np.testing.assert_allclose(np.asarray(st.E, np.float64), E_re,
                               atol=5e-3)
    Ex, _ = rt.bklMC(X, 1.0, iters=20_000, step=200, chains=128, seed=4,
                     backend="xla")
    a = np.asarray(Es)[:, 50:].mean() / X.N
    b = np.asarray(Ex)[:, 50:].mean() / X.N
    assert abs(a - b) < 0.03, (a, b)


@pytest.mark.slow
def test_lattice_fields_bkl_boltzmann(rejfree_interp):
    """LatticeEA WITH external fields routes to the lattice kernel (the
    AddFields composition, /root/reference/src/graphs/AddFields.jl:16-123)
    and matches the exact 2^16 Boltzmann mean."""
    import dataclasses

    import rrrmc_tpu as rt
    from rrrmc_tpu.ops.rejfree_pallas import pallas_rejfree_eligible

    X0 = rt.GraphEA(4, 2, (-1, 1), seed=11)   # N = 16
    rng = np.random.default_rng(3)
    h = rng.integers(-2, 3, size=X0.N)
    X = dataclasses.replace(X0, h=jnp.asarray(h, X0.h.dtype))
    assert pallas_rejfree_eligible(X, 128)
    beta = 1.0
    E_exact = _boltzmann_mean(X, beta)
    Es, st = rt.bklMC(X, beta, iters=60_000, step=200, chains=128, seed=9,
                      backend="pallas")
    E_re = jax.jit(jax.vmap(X.energy))(st.sigma)
    np.testing.assert_array_equal(np.asarray(E_re), np.asarray(st.E))
    Es = np.asarray(Es)
    got = Es[:, Es.shape[1] // 4:].mean()
    sem = Es[:, Es.shape[1] // 4:].std() / np.sqrt(Es.shape[0] * 3.0)
    assert abs(got - E_exact) < max(5 * sem, 0.05), (got, E_exact, sem)


@pytest.mark.slow
def test_kernel_accept_accounting_matches_xla(rejfree_interp):
    """rrr kernel acceptance rate agrees statistically with the XLA rrr
    path; bkl kernel `accepted` counts applied (rejection-free) moves."""
    import rrrmc_tpu as rt

    X = rt.GraphEA(4, 3, (-1, 1), seed=5)
    iters = 20_000
    _, st_k = rt.rrrMC(X, 2.0, iters=iters, step=1000, chains=128, seed=3,
                       backend="pallas")
    _, st_x = rt.rrrMC(X, 2.0, iters=iters, step=1000, chains=128, seed=4,
                       backend="xla")
    rk = np.asarray(st_k.accepted).mean() / iters
    rx = np.asarray(st_x.accepted).mean() / iters
    assert abs(rk - rx) < 0.05, (rk, rx)
    _, st_b = rt.bklMC(X, 2.0, iters=5_000, step=1000, chains=128, seed=3,
                       backend="pallas")
    assert np.asarray(st_b.accepted).min() > 0


def test_rrr_pallas_double_stays_on_xla(rejfree_interp):
    """Double models (Quant wrappers) must NOT route to the kernel."""
    import rrrmc_tpu as rt

    base = rt.GraphEA(4, 2, (-1, 1), seed=2)
    q = rt.GraphQuant(16, 3, 0.4, 1.0, base)
    # backend="pallas" on a Double silently uses XLA (inner is not None)
    Es, st = rt.rrrMC(q, 1.0, iters=200, step=100, chains=4, seed=5,
                      backend="pallas")
    E_re = jax.jit(jax.vmap(q.energy))(st.sigma)
    np.testing.assert_allclose(np.asarray(E_re, np.float64),
                               np.asarray(st.E, np.float64), atol=1e-9)


def test_small_lattice_routes_to_dense_kernel(rejfree_interp):
    """Small integer lattices densify onto the MXU race variant (the
    _LATTICE_DENSE_MAX crossover): identical integer energy grid, same
    Boltzmann law, route reported as dense."""
    import rrrmc_tpu as rt
    from rrrmc_tpu.samplers.common import LAST_ROUTE

    rp = rejfree_interp
    saved = rp._LATTICE_DENSE_MAX
    rp._LATTICE_DENSE_MAX = 2048
    try:
        X = rt.GraphEA(4, 2, (-1, 2), seed=31)     # N = 16, |J| in {1, 2}
        beta = 1.0
        E_exact = _boltzmann_mean(X, beta)
        Es, st = rt.bklMC(X, beta, iters=60_000, step=200, chains=128,
                          seed=21, backend="pallas")
        assert LAST_ROUTE["backend"] == "pallas-rejfree-dense"
        E_re = jax.jit(jax.vmap(X.energy))(st.sigma)
        np.testing.assert_array_equal(np.asarray(E_re), np.asarray(st.E))
        Es = np.asarray(Es)
        got = Es[:, Es.shape[1] // 4:].mean()
        sem = Es[:, Es.shape[1] // 4:].std() / np.sqrt(Es.shape[0] * 3.0)
        assert abs(got - E_exact) < max(5 * sem, 0.05), (got, E_exact, sem)
    finally:
        rp._LATTICE_DENSE_MAX = saved


# ---------------------------------------------------------------------------
# Sparse variant (ops/rejfree_pallas._rejfree_sparse_kernel): resident lf +
# inverse-neighbor-column O(deg) updates — the TPU answer to the reference's
# O(deg) caches (/root/reference/src/DeltaE.jl:63-230). Any padded-table
# Pairwise model routes here WITHOUT densify(): integer and float
# couplings, external fields, all three modes.
# ---------------------------------------------------------------------------


def test_sparse_bkl_rrg_invariant(rejfree_interp):
    """GraphRRG (sparse, no densify) routes to the sparse kernel: exact
    energy invariant, route marker, acceptance accounting."""
    import rrrmc_tpu as rt
    from rrrmc_tpu.samplers.common import LAST_ROUTE

    X = rt.GraphRRG(150, 3, (-1, 1), seed=21)
    Es, st = rt.bklMC(X, 2.0, iters=8_000, step=100, chains=128, seed=3,
                      backend="pallas")
    assert LAST_ROUTE["backend"] == "pallas-rejfree-sparse"
    E_re = jax.jit(jax.vmap(X.energy))(st.sigma)
    np.testing.assert_array_equal(np.asarray(E_re), np.asarray(st.E))
    assert np.all(np.isfinite(np.asarray(Es)))
    acc = np.asarray(st.accepted)
    assert acc.min() > 0 and acc.max() <= 2_500


@pytest.mark.parametrize("mode", ["bkl", "wtm", "rrr"])
@pytest.mark.slow
def test_sparse_boltzmann(rejfree_interp, mode):
    """Exact 2^18 Boltzmann enumeration on a sparse RRG for all 3 modes:
    validates the race, the resident-lf O(deg) update, the log-domain z,
    AND each mode's time bookkeeping at once."""
    import rrrmc_tpu as rt

    X = rt.GraphRRG(18, 3, (-1, 1), seed=7)
    beta = 1.0
    E_exact = _boltzmann_mean(X, beta)
    if mode == "bkl":
        Es, st = rt.bklMC(X, beta, iters=60_000, step=200, chains=128,
                          seed=9, backend="pallas")
    elif mode == "wtm":
        Es, st = rt.wtmMC(X, beta, samples=300, step=40.0, chains=128,
                          seed=9, backend="pallas")
    else:
        Es, st = rt.rrrMC(X, beta, iters=40_000, step=100, chains=128,
                          seed=9, backend="pallas")
    E_re = jax.jit(jax.vmap(X.energy))(st.sigma)
    np.testing.assert_array_equal(np.asarray(E_re), np.asarray(st.E))
    Es = np.asarray(Es)
    got = Es[:, Es.shape[1] // 4:].mean()
    sem = Es[:, Es.shape[1] // 4:].std() / np.sqrt(Es.shape[0] * 3.0)
    assert abs(got - E_exact) < max(5 * sem, 0.05), (got, E_exact, sem)


def test_sparse_float_rrgnormal(rejfree_interp):
    """GraphRRGNormal rides the f32 sparse kernel: energy invariant within
    the O(deg)-per-move f32 rounding budget, law matches the XLA bkl path
    (the DeltaECacheCont regime, /root/reference/src/DeltaE.jl:299-410)."""
    import rrrmc_tpu as rt
    from rrrmc_tpu.samplers.common import LAST_ROUTE

    X = rt.GraphRRGNormal(96, 3, seed=5)
    Es, st = rt.bklMC(X, 1.0, iters=20_000, step=200, chains=128, seed=3,
                      backend="pallas")
    assert LAST_ROUTE["backend"] == "pallas-rejfree-sparse"
    E_re = np.asarray(jax.jit(jax.vmap(X.energy))(st.sigma), np.float64)
    np.testing.assert_allclose(np.asarray(st.E, np.float64), E_re,
                               atol=5e-3)
    Ex, _ = rt.bklMC(X, 1.0, iters=20_000, step=200, chains=128, seed=4,
                     backend="xla")
    a = np.asarray(Es)[:, 50:].mean() / X.N
    b = np.asarray(Ex)[:, 50:].mean() / X.N
    assert abs(a - b) < 0.03, (a, b)


def test_sparse_fields_boltzmann(rejfree_interp):
    """Sparse kernel WITH external fields (h enters through the resident lf
    init and survives every O(deg) update): exact invariant + Boltzmann."""
    import dataclasses

    import rrrmc_tpu as rt

    X0 = rt.GraphRRG(16, 3, (-1, 1), seed=11)
    rng = np.random.RandomState(3)
    h = rng.randint(-2, 3, size=X0.N)
    X = dataclasses.replace(X0, h=jnp.asarray(h, X0.h.dtype))
    beta = 1.0
    E_exact = _boltzmann_mean(X, beta)
    Es, st = rt.bklMC(X, beta, iters=60_000, step=200, chains=128, seed=9,
                      backend="pallas")
    E_re = jax.jit(jax.vmap(X.energy))(st.sigma)
    np.testing.assert_array_equal(np.asarray(E_re), np.asarray(st.E))
    Es = np.asarray(Es)
    got = Es[:, Es.shape[1] // 4:].mean()
    sem = Es[:, Es.shape[1] // 4:].std() / np.sqrt(Es.shape[0] * 3.0)
    assert abs(got - E_exact) < max(5 * sem, 0.05), (got, E_exact, sem)


def test_sparse_rrr_state_threading(rejfree_interp):
    """State-threaded sparse rrr segments stay exact (the lf table is
    rebuilt per run from the carried spins — no cross-run drift)."""
    import rrrmc_tpu as rt

    X = rt.GraphRRG(150, 3, (-1, 1), seed=13)
    _, st = rt.rrrMC(X, 1.5, iters=2_000, step=200, chains=128, seed=5,
                     backend="pallas")
    Es2, st2 = rt.rrrMC(X, 1.5, iters=2_000, step=200, chains=128, seed=8,
                        backend="pallas", state=st)
    E_re = jax.jit(jax.vmap(X.energy))(st2.sigma)
    np.testing.assert_array_equal(np.asarray(E_re), np.asarray(st2.E))
    assert np.all(np.isfinite(np.asarray(Es2)))


def test_sparse_flattened_wrapper_stack(rejfree_interp):
    """rt.flatten(GraphQuant(EA)) yields a plain Pairwise (ring + lattice
    edges, K = 2D + 2) that now rides the SPARSE kernel directly — the
    round-4 upgrade of the flatten() guidance (previously flattened stacks
    needed densify() for a kernel route). Invariant + law vs the XLA bkl
    path on the same flat model."""
    import rrrmc_tpu as rt
    from rrrmc_tpu.samplers.common import LAST_ROUTE

    base = rt.GraphEA(4, 2, (-1, 1), seed=2)
    q = rt.GraphQuant(16, 3, 0.4, 1.0, base)
    flat = rt.flatten(q)
    Es, st = rt.bklMC(flat, 1.0, iters=20_000, step=200, chains=128, seed=5,
                      backend="pallas")
    assert LAST_ROUTE["backend"] == "pallas-rejfree-sparse"
    E_re = np.asarray(jax.jit(jax.vmap(flat.energy))(st.sigma), np.float64)
    np.testing.assert_allclose(np.asarray(st.E, np.float64), E_re,
                               atol=5e-3)
    Ex, _ = rt.bklMC(flat, 1.0, iters=20_000, step=200, chains=128, seed=6,
                     backend="xla")
    a = np.asarray(Es)[:, 50:].mean() / flat.N
    b = np.asarray(Ex)[:, 50:].mean() / flat.N
    assert abs(a - b) < 0.03, (a, b)


def test_sparse_float_lattice_eanormal(rejfree_interp):
    """GraphEANormal (FLOAT lattice — previously no rejection-free kernel
    at all: the roll/dense variants are integer-only) rides the sparse
    kernel via its padded Pairwise tables: invariant + law vs XLA."""
    import rrrmc_tpu as rt
    from rrrmc_tpu.samplers.common import LAST_ROUTE

    X = rt.GraphEANormal(4, 2, seed=5)      # N = 16, float couplings
    Es, st = rt.bklMC(X, 1.0, iters=20_000, step=200, chains=128, seed=3,
                      backend="pallas")
    assert LAST_ROUTE["backend"] == "pallas-rejfree-sparse"
    E_re = np.asarray(jax.jit(jax.vmap(X.energy))(st.sigma), np.float64)
    np.testing.assert_allclose(np.asarray(st.E, np.float64), E_re,
                               atol=5e-3)
    Ex, _ = rt.bklMC(X, 1.0, iters=20_000, step=200, chains=128, seed=4,
                     backend="xla")
    a = np.asarray(Es)[:, 50:].mean() / X.N
    b = np.asarray(Ex)[:, 50:].mean() / X.N
    assert abs(a - b) < 0.03, (a, b)


def test_eligibility_declines_traced_models():
    """Under sample_disorder's vmap (or any user jit over the model) the
    eligibility checks see TRACED leaves; they must return False (-> XLA
    path) instead of crashing in a host-side np.asarray."""
    import rrrmc_tpu as rt
    from rrrmc_tpu.ops.eo_pallas import pallas_eo_eligible
    from rrrmc_tpu.ops.rejfree_pallas import pallas_rejfree_eligible
    from rrrmc_tpu.samplers.sweep import (_pallas_eligible,
                                          _site_sweep_eligible)

    X = rt.GraphRRG(64, 3, (-1, 1), seed=1)
    Xn = rt.GraphRRGNormal(64, 3, seed=1)
    L = rt.GraphEA(4, 2, (-1, 1), seed=1)
    seen = []

    @jax.jit
    def probe(m, mn, lat):
        seen.append((pallas_rejfree_eligible(m, 128),
                     pallas_rejfree_eligible(mn, 128),
                     pallas_eo_eligible(mn, 128),
                     _site_sweep_eligible(m, 128),
                     _pallas_eligible(lat, 128)))
        return m.h
    probe(X, Xn, L)
    assert seen and not any(seen[0]), seen
    # concrete models remain eligible
    assert pallas_rejfree_eligible(X, 128)
    assert pallas_rejfree_eligible(Xn, 128)
    assert _site_sweep_eligible(X, 128)


# ---------------------------------------------------------------------------
# PSpin3 variant: resident cavity + product tables (q_k = sigma_p1*sigma_p2
# negated by broadcast compares on the winner) — the 3-spin extension of the
# sparse kernel, matching /root/reference/src/graphs/PSpin3.jl:62-145.
# ---------------------------------------------------------------------------


def test_pspin_kernel_invariant(rejfree_interp):
    """GraphPSpin3 routes to the pspin kernel: exact energy invariant over
    state-threaded segments, route marker, acceptance accounting."""
    import rrrmc_tpu as rt
    from rrrmc_tpu.samplers.common import LAST_ROUTE

    X = rt.GraphPSpin3(150, 3, seed=21)
    Es, st = rt.bklMC(X, 1.5, iters=8_000, step=100, chains=128, seed=3,
                      backend="pallas")
    assert LAST_ROUTE["backend"] == "pallas-rejfree-pspin"
    E_re = jax.jit(jax.vmap(X.energy))(st.sigma)
    np.testing.assert_array_equal(np.asarray(E_re), np.asarray(st.E))
    Es2, st2 = rt.bklMC(X, 1.5, iters=8_000, step=100, chains=128, seed=5,
                        backend="pallas", state=st)
    E_re = jax.jit(jax.vmap(X.energy))(st2.sigma)
    np.testing.assert_array_equal(np.asarray(E_re), np.asarray(st2.E))
    acc = np.asarray(st2.accepted)
    assert acc.min() > 0


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["bkl", "wtm", "rrr"])
def test_pspin_boltzmann(rejfree_interp, mode):
    """Exact 2^18 Boltzmann enumeration on GraphPSpin3 N=18 for all three
    modes: validates the race, the product-table negation updates, the
    log-domain z, AND the time bookkeeping on a 3-SPIN Hamiltonian."""
    import rrrmc_tpu as rt

    X = rt.GraphPSpin3(18, 3, seed=7)
    beta = 0.6
    E_exact = _boltzmann_mean(X, beta)
    if mode == "bkl":
        Es, st = rt.bklMC(X, beta, iters=60_000, step=200, chains=128,
                          seed=9, backend="pallas")
    elif mode == "wtm":
        Es, st = rt.wtmMC(X, beta, samples=300, step=40.0, chains=128,
                          seed=9, backend="pallas")
    else:
        Es, st = rt.rrrMC(X, beta, iters=40_000, step=100, chains=128,
                          seed=9, backend="pallas")
    E_re = jax.jit(jax.vmap(X.energy))(st.sigma)
    np.testing.assert_array_equal(np.asarray(E_re), np.asarray(st.E))
    Es = np.asarray(Es)
    got = Es[:, Es.shape[1] // 4:].mean()
    sem = Es[:, Es.shape[1] // 4:].std() / np.sqrt(Es.shape[0] * 3.0)
    assert abs(got - E_exact) < max(5 * sem, 0.05), (got, E_exact, sem)


def test_dispatch_guard_splits_large_runs(rejfree_interp):
    """Structural relay-wedge guard: a large kernel run is auto-chunked into
    multiple probe-calibrated dispatches (samplers/bkl.py _staged_run), so no
    single dispatch can exceed the ~30 s relay budget by construction."""
    import rrrmc_tpu as rt
    import rrrmc_tpu.samplers.bkl as bkl
    from rrrmc_tpu.samplers.common import LAST_ROUTE

    X = rt.GraphEA(4, 2, (-1, 1), seed=3)
    bkl.FORCE_STAGING = True      # staging is skipped on CPU by default
    try:
        Es, st = rt.bklMC(X, 2.0, iters=20_000, step=500, chains=128,
                          seed=3, backend="pallas")
    finally:
        bkl.FORCE_STAGING = False
    assert LAST_ROUTE["dispatches"] >= 2
    E_re = jax.jit(jax.vmap(X.energy))(st.sigma)
    np.testing.assert_array_equal(np.asarray(E_re), np.asarray(st.E))
