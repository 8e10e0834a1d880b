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
    sig, E, lfT, key = ps(st.sigma, st.E.astype(jnp.int32),
                          jax.random.key(7), seed=11, n_moves=1200)
    E_re = jax.jit(jax.vmap(m.energy))(sig)
    np.testing.assert_array_equal(np.asarray(E_re), np.asarray(E))
    lf_re = jax.jit(lambda s: jax.vmap(m.local_fields)(s).T)(sig)
    np.testing.assert_array_equal(np.asarray(lf_re), np.asarray(lfT))


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


def test_site_sampler_rejects_nonint(site_interp):
    with pytest.raises(AssertionError):
        site_interp.PallasSiteSampler(rt.GraphRRGNormal(16, 3, seed=1), 1.0)
