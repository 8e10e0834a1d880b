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
