"""Pallas sweep kernel validation in interpreter mode (the compiled path is
exercised on the real chip by bench.py and the verify drives): exact energy
invariant, correct neighbor wraparound, agreement of the stationary energy
with the XLA sweep kernel."""

import importlib
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def pallas_interp():
    os.environ["RRRMC_PALLAS_INTERPRET"] = "1"
    import rrrmc_tpu.ops.sweep_pallas as sp
    importlib.reload(sp)
    yield sp
    os.environ.pop("RRRMC_PALLAS_INTERPRET")
    importlib.reload(sp)


def test_pallas_sweep_invariant_and_physics(pallas_interp):
    import rrrmc_tpu as rt

    X = rt.GraphEA(4, 3, (-1, 1), seed=5)     # N=64
    B = 128
    state = rt.init_state(X, B, seed=1)
    sweeper = pallas_interp.PallasSweeper(X, 2.0)
    sigma, E = sweeper(state.sigma, state.E, seed=3, n_sweeps=40)
    # exact integer energy tracking through the kernel
    E_re = jax.jit(jax.vmap(X.energy))(sigma)
    np.testing.assert_array_equal(np.asarray(E_re), np.asarray(E))
    # stationary energy matches the XLA sweep kernel's (same chain law)
    Es_x, _ = rt.sweepMC(X, 2.0, sweeps=60, step=60, chains=64, seed=2,
                         backend="xla")
    e_pallas = float(np.asarray(E).mean()) * X.scale / X.N
    e_xla = float(np.asarray(Es_x)[:, -1].mean()) / X.N
    assert abs(e_pallas - e_xla) < 0.12, (e_pallas, e_xla)


def test_pallas_rejects_unsupported(pallas_interp):
    import rrrmc_tpu as rt

    with pytest.raises(AssertionError):
        pallas_interp.PallasSweeper(rt.GraphEANormal(4, 3, seed=1), 2.0)
    with pytest.raises(AssertionError):
        pallas_interp.PallasSweeper(rt.GraphRRG(64, 3, (-1, 1), seed=1), 2.0)
