"""Pallas dense-SK sweep kernel validation in interpreter mode (the compiled
path is exercised on the real chip by bench/verify): exact int32 energy and
local-field invariants across windows, warm lf continuation, and agreement of
the stationary energy with exact enumeration."""

import importlib
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rrrmc_tpu as rt
from rrrmc_tpu.observables import unpack_config


@pytest.fixture(scope="module")
def sk_interp():
    os.environ["RRRMC_PALLAS_INTERPRET"] = "1"
    import rrrmc_tpu.ops.sk_pallas as skp
    importlib.reload(skp)
    yield skp
    os.environ.pop("RRRMC_PALLAS_INTERPRET")
    importlib.reload(skp)


def test_sk_pallas_invariants_multiwindow(sk_interp):
    """Energy AND local fields tracked through the kernel must exactly match
    a from-scratch recomputation (the reference's load-bearing invariant,
    /root/reference/test/runtests.jl:12-15), across window boundaries."""
    m = rt.GraphSK(256, seed=1)
    B = 128
    sw = sk_interp.PallasSKSweeper(m, 1.2, window=128, block_chains=128)
    st = rt.init_state(m, B, seed=3)
    sig, E, lfT = sw(st.sigma, st.E.astype(jnp.int32), seed=11, n_sweeps=6)
    E_re = jax.jit(jax.vmap(m.energy))(sig)
    np.testing.assert_array_equal(np.asarray(E_re), np.asarray(E))
    lf_re = jax.jit(lambda s: jax.vmap(m.local_fields)(s).T)(sig)
    np.testing.assert_array_equal(np.asarray(lf_re), np.asarray(lfT))
    # warm continuation with the returned lf must stay exact
    sig, E, lfT = sw(sig, E, seed=12, n_sweeps=6, lfT=lfT)
    E_re = jax.jit(jax.vmap(m.energy))(sig)
    np.testing.assert_array_equal(np.asarray(E_re), np.asarray(E))


def test_sk_pallas_streamed_and_padded(sk_interp):
    """HBM-streamed J variant (double-buffered window DMA) + padding of N to
    a window multiple with zero-coupled free spins: exact invariants and
    warm continuation (the padded lfT round-trips)."""
    m = rt.GraphSK(200, seed=1)          # pads to Np=256 at W=128
    sw = sk_interp.PallasSKSweeper(m, 1.2, window=128, block_chains=128,
                                   stream_j=True)
    st = rt.init_state(m, 128, seed=3)
    sig, E, lfT = sw(st.sigma, st.E.astype(jnp.int32), seed=11, n_sweeps=4)
    assert lfT.shape[0] == 256
    E_re = jax.jit(jax.vmap(m.energy))(sig)
    np.testing.assert_array_equal(np.asarray(E_re), np.asarray(E))
    sig, E, lfT = sw(sig, E, seed=12, n_sweeps=4, lfT=lfT)
    E_re = jax.jit(jax.vmap(m.energy))(sig)
    np.testing.assert_array_equal(np.asarray(E_re), np.asarray(E))
    # streamed and VMEM variants draw the same bits -> identical trajectories
    sw2 = sk_interp.PallasSKSweeper(m, 1.2, window=128, block_chains=128,
                                    stream_j=False)
    a, Ea, _ = sw(st.sigma, st.E.astype(jnp.int32), seed=5, n_sweeps=3)
    b, Eb, _ = sw2(st.sigma, st.E.astype(jnp.int32), seed=5, n_sweeps=3)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(Ea), np.asarray(Eb))


def test_sweepmc_dense_pallas_backend(sk_interp):
    """Public sweepMC_dense(backend='pallas') path: checkpoint series shape,
    exact invariant, warm lf continuation across checkpoints."""
    import importlib
    import rrrmc_tpu.samplers.dense_sweep as ds
    importlib.reload(ds)  # rebind the reloaded sk_pallas
    m = rt.GraphSK(128, seed=4)
    Es, st = ds.sweepMC_dense(m, 1.0, sweeps=25, step=10, chains=128, seed=9,
                              backend="pallas")
    assert Es.shape == (128, 2)
    E_re = jax.jit(jax.vmap(m.energy))(st.sigma)
    np.testing.assert_array_equal(np.asarray(E_re), np.asarray(st.E))
    lf_re = jax.jit(lambda s: jax.vmap(m.local_fields)(s))(st.sigma)
    np.testing.assert_array_equal(np.asarray(lf_re),
                                  np.asarray(st.aux))


def test_sk_pallas_boltzmann(sk_interp):
    """Stationary mean energy matches exact 2^N enumeration within MC error
    (the typewriter scan is a valid sequential Metropolis variant)."""
    N, B, beta = 16, 256, 1.2
    m = rt.GraphSK(N, seed=2)
    sw = sk_interp.PallasSKSweeper(m, beta, window=N, block_chains=128)
    st = rt.init_state(m, B, seed=5)
    sig, E, lfT = sw(st.sigma, st.E.astype(jnp.int32), seed=21, n_sweeps=200)
    # sample the time average over a further stretch, chunked
    tot = np.zeros(B, np.float64)
    reps = 30
    for r in range(reps):
        sig, E, lfT = sw(sig, E, seed=100 + r, n_sweeps=10, lfT=lfT)
        tot += np.asarray(E, np.float64)
    got = (tot / reps).mean() * m.scale
    states = unpack_config(jnp.arange(2 ** N, dtype=jnp.int32), N)
    E_all = np.asarray(jax.jit(jax.vmap(
        lambda s: m.to_physical(m.energy(s))))(states), np.float64)
    w = np.exp(-beta * (E_all - E_all.min()))
    E_exact = (w * E_all).sum() / w.sum()
    assert abs(got - E_exact) < 0.15, (got, E_exact)


def test_sk_pallas_fields(sk_interp):
    """External fields (AddFields composition): exact energy/lf invariants
    AND stationary Boltzmann mean on a field-carrying integer dense model.
    The kernel needs no h plumbing — lf is seeded field-inclusive by
    init_lfT and h is flip-invariant under the rank-W J corrections."""
    import dataclasses

    N, B, beta = 16, 256, 1.0
    m0 = rt.GraphSK(N, seed=7)
    rng = np.random.RandomState(9)
    h = rng.randint(-2, 3, size=N)
    m = dataclasses.replace(m0, h=jnp.asarray(h, m0.h.dtype))
    sw = sk_interp.PallasSKSweeper(m, beta, window=N, block_chains=128)
    st = rt.init_state(m, B, seed=5)
    sig, E, lfT = sw(st.sigma, st.E.astype(jnp.int32), seed=31, n_sweeps=200)
    E_re = jax.jit(jax.vmap(m.energy))(sig)
    np.testing.assert_array_equal(np.asarray(E_re), np.asarray(E))
    lf_re = jax.jit(lambda s: jax.vmap(m.local_fields)(s).T)(sig)
    np.testing.assert_array_equal(np.asarray(lf_re), np.asarray(lfT))
    tot = np.zeros(B, np.float64)
    reps = 30
    for r in range(reps):
        sig, E, lfT = sw(sig, E, seed=200 + r, n_sweeps=10, lfT=lfT)
        tot += np.asarray(E, np.float64)
    got = (tot / reps).mean() * m.scale
    states = unpack_config(jnp.arange(2 ** N, dtype=jnp.int32), N)
    E_all = np.asarray(jax.jit(jax.vmap(
        lambda s: m.to_physical(m.energy(s))))(states), np.float64)
    w = np.exp(-beta * (E_all - E_all.min()))
    E_exact = (w * E_all).sum() / w.sum()
    assert abs(got - E_exact) < 0.2, (got, E_exact)
