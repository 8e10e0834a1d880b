"""Disorder-realization sharding: many (model, seed) instances advanced in
one vmapped program (the reference's per-seed script loops vectorized,
scripts.jl:83-149)."""

import jax
import numpy as np
import pytest

import rrrmc_tpu as rt
from rrrmc_tpu.parallel.mesh import make_mesh, sample_disorder, stack_models


def test_sample_disorder_matches_sequential():
    models = [rt.GraphEA(4, 2, (-1, 1), seed=s) for s in (1, 2, 3, 4)]
    Es_d, st_d = sample_disorder(rt.standardMC, models, 1.5,
                                 iters=1000, step=100, chains=8, seed=5)
    assert np.asarray(Es_d).shape == (4, 8, 10)
    # each disorder realization individually matches a sequential run
    for d, m in enumerate(models):
        st = rt.init_state(m, 8, 5 + 104729 * d)
        Es, st2 = rt.standardMC(m, 1.5, iters=1000, step=100, chains=8,
                                state=st)
        np.testing.assert_array_equal(np.asarray(Es_d)[d], np.asarray(Es))
        np.testing.assert_array_equal(np.asarray(st_d.sigma)[d],
                                      np.asarray(st2.sigma))


def test_sample_disorder_sharded():
    mesh = make_mesh({"disorder": 8})
    models = [rt.GraphEA(4, 2, (-1, 1), seed=s) for s in range(8)]
    Es, st = sample_disorder(rt.standardMC, models, 1.5,
                             iters=500, step=100, chains=4, seed=9,
                             mesh=mesh)
    assert np.asarray(Es).shape == (8, 4, 5)
    E_re = jax.jit(jax.vmap(jax.vmap(models[0].energy)))(st.sigma)
    # energies recomputed with disorder 0's couplings only match row 0
    np.testing.assert_array_equal(np.asarray(E_re)[0],
                                  np.asarray(st.E)[0])


def test_stack_models_keeps_static():
    models = [rt.GraphEA(4, 2, (-1, 1), seed=s) for s in (1, 2)]
    stacked = stack_models(models)
    assert stacked.N == models[0].N
    assert stacked.J.shape == (2,) + models[0].J.shape
