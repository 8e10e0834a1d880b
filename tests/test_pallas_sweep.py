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
    import rrrmc_tpu.samplers.sweep as sw
    importlib.reload(sp)
    # drop sweepers built before the reload (they captured the old kernel
    # functions); restore the cache afterwards so later tests never see
    # interpret-mode sweepers. This keeps sweep.py itself un-reloaded —
    # reloading a sampler module mid-suite rebinds shared global state.
    saved = dict(sw._LATTICE_SWEEPERS)
    sw._LATTICE_SWEEPERS.clear()
    yield sp
    os.environ.pop("RRRMC_PALLAS_INTERPRET")
    importlib.reload(sp)
    sw._LATTICE_SWEEPERS.clear()
    sw._LATTICE_SWEEPERS.update(saved)


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


def test_pallas_sweep_fields_boltzmann(pallas_interp):
    """LatticeEA WITH integer external fields (the AddFields composition,
    /root/reference/src/graphs/AddFields.jl:16-123): exact energy tracking
    and agreement with the exact 2^16 Boltzmann mean — exercises the h
    column in the direction table AND the widened threshold table."""
    import dataclasses

    import rrrmc_tpu as rt
    from rrrmc_tpu.observables import unpack_config

    X0 = rt.GraphEA(4, 2, (-1, 1), seed=11)   # N = 16
    rng = np.random.RandomState(3)
    h = rng.randint(-2, 3, size=X0.N)
    X = dataclasses.replace(X0, h=jnp.asarray(h, X0.h.dtype))
    beta = 1.0
    B = 256
    state = rt.init_state(X, B, seed=1)
    sweeper = pallas_interp.PallasSweeper(X, beta)
    sigma, E = sweeper(state.sigma, state.E, seed=3, n_sweeps=200)
    E_re = jax.jit(jax.vmap(X.energy))(sigma)
    np.testing.assert_array_equal(np.asarray(E_re), np.asarray(E))
    tot = np.zeros(B, np.float64)
    reps = 40
    for r in range(reps):
        sigma, E = sweeper(sigma, E, seed=100 + r, n_sweeps=5)
        tot += np.asarray(E, np.float64)
    got = (tot / reps).mean() * X.scale
    states = unpack_config(jnp.arange(2 ** X.N, dtype=jnp.int32), X.N)
    E_all = np.asarray(jax.jit(jax.vmap(
        lambda s: X.to_physical(X.energy(s))))(states), np.float64)
    w = np.exp(-beta * (E_all - E_all.min()))
    E_exact = (w * E_all).sum() / w.sum()
    assert abs(got - E_exact) < 0.25, (got, E_exact)


def test_sweepmc_routes_fields_to_pallas(pallas_interp):
    """sweepMC auto-routing accepts field-carrying integer lattices, and the
    sweeper cache distinguishes field variants sharing a Jd object."""
    import dataclasses

    import rrrmc_tpu as rt
    import rrrmc_tpu.samplers.sweep as sw

    X0 = rt.GraphEA(4, 2, (-1, 1), seed=7)
    X = dataclasses.replace(
        X0, h=jnp.asarray(np.full(X0.N, 3), X0.h.dtype))
    assert sw._pallas_eligible(X, 128)
    Es0, st0 = sw.sweepMC(X0, 1.0, sweeps=20, step=20, chains=128, seed=5,
                          backend="pallas")
    Es, st = sw.sweepMC(X, 1.0, sweeps=20, step=20, chains=128, seed=5,
                        backend="pallas")
    # strong field must magnetize: field run sits lower in energy and the
    # two runs must NOT have shared a sweeper (different h, same Jd)
    E0_re = jax.jit(jax.vmap(X0.energy))(st0.sigma)
    E_re = jax.jit(jax.vmap(X.energy))(st.sigma)
    np.testing.assert_array_equal(np.asarray(E0_re),
                                  np.asarray(st0.E / X0.scale).astype(np.int64))
    np.testing.assert_array_equal(np.asarray(E_re),
                                  np.asarray(st.E / X.scale).astype(np.int64))
    mag = np.asarray(st.sigma, np.float64).mean()
    assert mag > 0.5, mag
