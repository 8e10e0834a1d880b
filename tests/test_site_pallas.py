"""Pallas single-site Metropolis kernel (interpret mode): exact invariants,
the public standardMC(backend='pallas') path, and equilibrium agreement with
the XLA reference path."""

import importlib
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rrrmc_tpu as rt


@pytest.fixture(scope="module")
def site_interp():
    os.environ["RRRMC_PALLAS_INTERPRET"] = "1"
    import rrrmc_tpu.ops.site_pallas as sp
    import rrrmc_tpu.samplers.metropolis as met
    importlib.reload(sp)
    importlib.reload(met)
    yield sp
    os.environ.pop("RRRMC_PALLAS_INTERPRET")
    importlib.reload(sp)
    importlib.reload(met)


def test_site_kernel_invariants(site_interp):
    m = rt.GraphRRG(64, 3, (-1, 1), seed=2)
    ps = site_interp.PallasSiteSampler(m, 1.5, block_chains=128)
    st = rt.init_state(m, 128, seed=3)
    sig, E, lfT, key, acc = ps(st.sigma, st.E.astype(jnp.int32),
                               jax.random.key(7), seed=11, n_moves=1200)
    E_re = jax.jit(jax.vmap(m.energy))(sig)
    np.testing.assert_array_equal(np.asarray(E_re), np.asarray(E))
    lf_re = jax.jit(lambda s: jax.vmap(m.local_fields)(s).T)(sig)
    np.testing.assert_array_equal(np.asarray(lf_re), np.asarray(lfT))
    a = np.asarray(acc)
    assert a.min() >= 0 and a.max() <= 1200 and a.mean() > 0


@pytest.mark.slow
def test_standardmc_pallas_backend(site_interp):
    from rrrmc_tpu.samplers.metropolis import standardMC

    m = rt.GraphEA(4, 3, (-1, 1), seed=5)    # N=64, lattice is Pairwise too
    Es, st = standardMC(m, 2.0, iters=9_000, step=3_000, chains=128,
                        seed=9, backend="pallas")
    assert Es.shape == (128, 3)
    E_re = jax.jit(jax.vmap(m.energy))(st.sigma)
    np.testing.assert_array_equal(np.asarray(E_re), np.asarray(st.E))
    # equilibrium agrees with the XLA reference path
    Es_x, _ = standardMC(m, 2.0, iters=9_000, step=3_000, chains=64,
                         seed=10)
    a = float(np.asarray(Es)[:, -1].mean())
    b = float(np.asarray(Es_x)[:, -1].mean())
    assert abs(a - b) < 6.0, (a, b)   # N=64: ~0.1/spin


@pytest.mark.slow
def test_site_sampler_float_couplings(site_interp):
    """GraphRRGNormal (continuous J, /root/reference/src/graphs/RRG.jl:504)
    rides the f32 site kernel: invariant within f32 accumulation, law
    matches the XLA Metropolis path."""
    from rrrmc_tpu.samplers.metropolis import standardMC

    m = rt.GraphRRGNormal(64, 3, seed=1)
    Es, st = standardMC(m, 1.5, iters=30_000, step=1_000, chains=128,
                        seed=9, backend="pallas")
    E_re = np.asarray(jax.jit(jax.vmap(m.energy))(st.sigma), np.float64)
    np.testing.assert_allclose(np.asarray(st.E, np.float64), E_re, atol=2e-3)
    assert np.asarray(st.accepted).min() > 0
    Ex, _ = standardMC(m, 1.5, iters=30_000, step=1_000, chains=64, seed=4)
    a = np.asarray(Es)[:, 10:].mean() / m.N
    b = np.asarray(Ex)[:, 10:].mean() / m.N
    assert abs(a - b) < 0.03, (a, b)


# ---------------------------------------------------------------------------
# sweepMC on the site kernel (round 4): generic sparse Pairwise sweeps ride
# the single-site kernel with a permutation schedule (sweep_schedule=True).
# ---------------------------------------------------------------------------


def test_sweepmc_site_schedule_covers_every_site(site_interp):
    """beta = 0: every proposal accepts (up to a ~2^-25 RNG edge), so ONE
    sweep must flip EVERY spin exactly once — sigma -> -sigma. This proves
    the permutation schedule attempts each site exactly once per sweep."""
    import rrrmc_tpu.samplers.sweep as sw

    sw._SITE_SWEEPERS.clear()
    m = rt.GraphRRG(64, 3, (-1, 1), seed=2)
    st = rt.init_state(m, 128, seed=1)
    sig0 = np.asarray(st.sigma)
    Es, st2 = sw.sweepMC(m, 0.0, sweeps=1, step=1, chains=128, seed=3,
                         state=st, backend="pallas")
    from rrrmc_tpu.samplers.common import LAST_ROUTE
    assert LAST_ROUTE["backend"] == "pallas-site-sweep"
    np.testing.assert_array_equal(np.asarray(st2.sigma), -sig0)
    sw._SITE_SWEEPERS.clear()


def test_sweepmc_site_route_invariant_and_law(site_interp):
    """GraphRRG sweeps on the site kernel: exact energy tracking, accepted
    accounting, equilibrium agreement with the XLA color-mask sweep."""
    import rrrmc_tpu.samplers.sweep as sw

    sw._SITE_SWEEPERS.clear()
    m = rt.GraphRRG(96, 3, (-1, 1), seed=7)
    Es, st = sw.sweepMC(m, 1.5, sweeps=60, step=10, chains=128, seed=3,
                        backend="pallas")
    from rrrmc_tpu.samplers.common import LAST_ROUTE
    assert LAST_ROUTE["backend"] == "pallas-site-sweep"
    E_re = jax.jit(jax.vmap(m.energy))(st.sigma)
    np.testing.assert_array_equal(np.asarray(E_re), np.asarray(st.E))
    acc = np.asarray(st.accepted)
    assert acc.min() > 0 and acc.max() <= 60 * m.N
    Ex, _ = sw.sweepMC(m, 1.5, sweeps=60, step=10, chains=128, seed=4,
                       backend="xla")
    a = np.asarray(Es)[:, 2:].mean() / m.N
    b = np.asarray(Ex)[:, 2:].mean() / m.N
    assert abs(a - b) < 0.04, (a, b)
    sw._SITE_SWEEPERS.clear()


def test_sweepmc_site_route_float(site_interp):
    """GraphRRGNormal (float sparse) sweeps ride the same route with f32
    energies — the family that previously had NO kernel sweep at all."""
    import rrrmc_tpu.samplers.sweep as sw

    sw._SITE_SWEEPERS.clear()
    m = rt.GraphRRGNormal(96, 3, seed=5)
    Es, st = sw.sweepMC(m, 1.0, sweeps=40, step=10, chains=128, seed=3,
                        backend="pallas")
    E_re = np.asarray(jax.jit(jax.vmap(m.energy))(st.sigma), np.float64)
    np.testing.assert_allclose(np.asarray(st.E, np.float64), E_re,
                               atol=5e-3)
    Ex, _ = sw.sweepMC(m, 1.0, sweeps=40, step=10, chains=128, seed=4,
                       backend="xla")
    a = np.asarray(Es)[:, 2:].mean() / m.N
    b = np.asarray(Ex)[:, 2:].mean() / m.N
    assert abs(a - b) < 0.04, (a, b)
    sw._SITE_SWEEPERS.clear()
