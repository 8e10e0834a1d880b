"""Generalized ensemble exchange (parallel.tempering.tempered_ensembles):

1. plain beta ladder (identical models) — each rung's marginal must match the
   exact Boltzmann mean at its beta, and the cross-energy acceptance rule must
   reduce to the standard exp(dbeta * dE) tempering;
2. Gamma ladder of Quant wrapper models (slot-pinned Hamiltonians, the
   reference's annealing workload scripts.jl:766-863 turned into true replica
   exchange) — each slot's marginal must match the exact Boltzmann of ITS OWN
   Hamiltonian, and swaps must actually occur;
3. invariants: incrementally-tracked energies equal recomputation after
   config swaps, and walker tables stay permutations.
"""

import jax
import jax.numpy as jnp
import numpy as np

import rrrmc_tpu as rt
from rrrmc_tpu.parallel.tempering import tempered_ensembles
from rrrmc_tpu.observables import unpack_config


def exact_mean_energy(model, beta):
    states = unpack_config(jnp.arange(2 ** model.N, dtype=jnp.int32), model.N)
    E = np.asarray(jax.jit(jax.vmap(
        lambda s: model.to_physical(model.energy(s))))(states), np.float64)
    w = np.exp(-beta * (E - E.min()))
    return float((w * E).sum() / w.sum())


def _check_invariants(models, Es, walkers, state):
    T = len(models)
    for r, (m, st) in enumerate(zip(models, state.slots)):
        E_re = jax.jit(jax.vmap(m.energy))(st.sigma)
        np.testing.assert_allclose(np.asarray(E_re, np.float64),
                                   np.asarray(st.E, np.float64),
                                   rtol=0, atol=1e-9)
    w = np.asarray(walkers)[-1]                      # [T, B]
    for b in range(w.shape[1]):
        assert sorted(w[:, b]) == list(range(T)), w[:, b]


def test_beta_ladder_matches_boltzmann():
    X = rt.GraphEA(4, 2, (-1, 1), seed=3)            # N=16 EA-2D
    betas = [0.5, 1.0, 1.5, 2.0]
    models = [X] * len(betas)
    Es, walkers, state = tempered_ensembles(
        models, betas, n_rounds=800, moves_per_round=32, chains=16, seed=11)
    _check_invariants(models, Es, walkers, state)
    assert int(np.asarray(state.swap_acc).sum()) > 0
    Es = np.asarray(Es)                              # [rounds, T, B]
    for r, beta in enumerate(betas):
        got = float(Es[300:, r].mean())
        want = exact_mean_energy(X, beta)
        assert abs(got - want) < 0.6, (beta, got, want)


def test_gamma_ladder_quant_cross_energies():
    """Slot-pinned Gamma ladder: every slot has a DIFFERENT Hamiltonian
    (fourK(beta, Gamma) lives in static metadata), swaps exchange configs."""
    Nk, M, beta = 3, 3, 1.0                          # N = 9, 512 states
    base = rt.GraphSK(Nk, seed=5)
    gammas = [0.3, 0.8, 1.5]
    models = [rt.GraphQuant(Nk, M, g, beta, base) for g in gammas]
    betas = [beta] * len(models)
    Es, walkers, state = tempered_ensembles(
        models, betas, n_rounds=1200, moves_per_round=12, chains=24, seed=7)
    _check_invariants(models, Es, walkers, state)
    acc = np.asarray(state.swap_acc)
    assert acc.sum() > 0, "no swaps ever accepted"
    Es = np.asarray(Es)
    for r, m in enumerate(models):
        got = float(Es[400:, r].mean())
        want = exact_mean_energy(m, beta)
        assert abs(got - want) < 0.5, (gammas[r], got, want)


def test_n_mismatch_rejected():
    """Configs swap between slots, so ladder models must share N."""
    import pytest
    base = rt.GraphSK(4, seed=2)
    q = rt.GraphQuant(4, 3, 0.5, 1.0, base)
    with pytest.raises(AssertionError, match="share N"):
        tempered_ensembles([base, q], [1.0, 1.0], 2, chains=2)


def test_sweep_kernel_beta_ladder_boltzmann():
    """sweep_kernel (color-mask sweeps) as the move kernel: each rung's
    marginal must still match the exact Boltzmann mean at its beta."""
    X = rt.GraphRRG(14, 3, (-1, 1), seed=23)
    betas = [0.4, 0.8, 1.4]
    models = [X] * len(betas)
    Es, walkers, st = tempered_ensembles(
        models, betas, n_rounds=300, moves_per_round=3 * X.N, chains=32,
        seed=11, kernel=rt.sweep_kernel)
    _check_invariants(models, Es, walkers, st)
    Es = np.asarray(Es, np.float64)[100:]            # [rounds, T, B]
    acc = np.asarray(st.swap_acc)
    assert acc.mean() > 1.0, acc.mean()              # swaps flow
    for r, beta in enumerate(betas):
        exact = exact_mean_energy(X, beta)
        got = Es[:, r].mean()
        sem = Es[:, r].std() / np.sqrt(Es[:, r].size / 10.0)
        assert abs(got - exact) < max(5 * sem, 0.1), (beta, got, exact, sem)


def test_aux_fresh_after_conditional_recompute():
    """The per-slot aux recompute is skipped (lax.cond) on rounds where no
    chain of that slot swapped; after ANY mix of swap/no-swap rounds every
    slot's aux must still equal init_aux(sigma) exactly."""
    Nk, M, beta = 3, 3, 1.0
    base = rt.GraphSK(Nk, seed=5)
    models = [rt.GraphQuant(Nk, M, g, beta, base) for g in (0.3, 0.8, 1.5)]
    # near-identical slots swap constantly; the wide Gamma ladder rarely —
    # both paths of the cond run across these rounds
    _, _, st = tempered_ensembles(models, [beta] * 3, n_rounds=40,
                                  moves_per_round=6, chains=16, seed=13)
    for m, slot in zip(models, st.slots):
        fresh = jax.jit(jax.vmap(m.init_aux))(slot.sigma)
        for got, want in zip(jax.tree.leaves(slot.aux),
                             jax.tree.leaves(fresh)):
            np.testing.assert_allclose(np.asarray(got, np.float64),
                                       np.asarray(want, np.float64),
                                       rtol=0, atol=1e-9)


def test_sweep_kernel_rejects_wrapper():
    base = rt.GraphSK(16, seed=3)
    q = rt.GraphQuant(16, 3, 0.5, 1.0, base)
    try:
        tempered_ensembles([q, q], [1.0, 1.0], n_rounds=1, chains=8,
                           kernel=rt.sweep_kernel)
    except AssertionError as e:
        assert "flatten" in str(e)
    else:
        raise AssertionError("expected a loud rejection for non-Pairwise")
