"""Hook protocol (early stop + observation) and checkpoint/resume round trip
(the C0 warm-start + RNG-state persistence of SURVEY.md §5)."""

import os

import jax
import numpy as np
import pytest

import rrrmc_tpu as rt


def test_hook_called_and_early_stop():
    X = rt.GraphEA(4, 2, (-1, 1), seed=1)
    calls = []

    def hook(it, model, state):
        calls.append(it)
        return len(calls) < 3  # stop after 3 calls

    Es, state = rt.standardMC(X, 2.0, iters=10_000, step=10, chains=4, seed=2,
                              hook=hook, hook_every=5)
    assert calls == [50, 100, 150]  # hook_every=5 checkpoints x step=10 moves
    assert Es.shape == (4, 15)      # 3 chunks x 5 checkpoints, stopped early
    E_re = jax.jit(jax.vmap(X.energy))(state.sigma)
    np.testing.assert_array_equal(np.asarray(E_re), np.asarray(state.E))


def test_hook_bkl_early_stop():
    X = rt.GraphEA(4, 2, (-1, 1), seed=1)
    calls = []

    def hook(it, model, state):
        calls.append(it)
        return False

    Es, state = rt.bklMC(X, 2.0, iters=50_000, step=10, chains=4, seed=2,
                         chunk_moves=64, hook=hook)
    assert len(calls) == 1


def test_checkpoint_roundtrip_exact_continuation(tmp_path):
    X = rt.GraphEA(4, 2, (-1, 1), seed=1)
    p = str(tmp_path / "ck.npz")
    # run 1: 1000 iters, checkpoint, then 1000 more
    _, st = rt.standardMC(X, 2.0, iters=1000, step=100, chains=4, seed=3)
    rt.save_state(p, st)
    Es_a, st_a = rt.standardMC(X, 2.0, iters=1000, step=100, chains=4,
                               state=st)
    # run 2: restore and continue -- must be bit-identical
    template = rt.init_state(X, 4, seed=999)
    st2 = rt.load_state(p, like=template)
    Es_b, st_b = rt.standardMC(X, 2.0, iters=1000, step=100, chains=4,
                               state=st2)
    np.testing.assert_array_equal(np.asarray(Es_a), np.asarray(Es_b))
    np.testing.assert_array_equal(np.asarray(st_a.sigma), np.asarray(st_b.sigma))
    np.testing.assert_array_equal(np.asarray(st_a.E), np.asarray(st_b.E))


def test_checkpoint_shape_mismatch_rejected(tmp_path):
    X = rt.GraphEA(4, 2, (-1, 1), seed=1)
    p = str(tmp_path / "ck.npz")
    _, st = rt.standardMC(X, 2.0, iters=100, step=100, chains=4, seed=3)
    rt.save_state(p, st)
    bad_template = rt.init_state(X, 8, seed=0)  # wrong chain count
    with pytest.raises(AssertionError):
        rt.load_state(p, like=bad_template)
