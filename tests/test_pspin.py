"""GraphPSpin3 validation: brute-force deltas, sampler invariant, discrete
class list (mirrors /root/reference/src/graphs/PSpin3.jl:62-180)."""

import jax
import jax.numpy as jnp
import numpy as np

import rrrmc_tpu as rt
from rrrmc_tpu.core.model import random_spins


def test_pspin_deltas():
    m = rt.GraphPSpin3(12, 3, seed=1)
    s0 = random_spins(jax.random.key(0), m.N)

    @jax.jit
    def run(sigma):
        aux = m.init_aux(sigma)
        E = m.energy(sigma)
        dall = m.delta_all(sigma, aux)
        done = jax.vmap(lambda i: m.delta_one(sigma, aux, i))(jnp.arange(m.N))
        dbf = jax.vmap(lambda i: m.energy(sigma.at[i].multiply(-1)) - E)(
            jnp.arange(m.N))
        return dall, done, dbf

    dall, done, dbf = run(s0)
    np.testing.assert_array_equal(np.asarray(dall), np.asarray(dbf))
    np.testing.assert_array_equal(np.asarray(done), np.asarray(dbf))


def test_pspin_classes():
    assert rt.GraphPSpin3(12, 3, seed=1).delta_classes() == (2.0, 6.0)
    assert rt.GraphPSpin3(12, 4, seed=1).delta_classes() == (0.0, 4.0, 8.0)


def test_pspin_sampler_invariant():
    m = rt.GraphPSpin3(12, 3, seed=1)
    _, state = rt.standardMC(m, 1.0, iters=2000, step=100, chains=8, seed=5)
    E_re = jax.jit(jax.vmap(m.energy))(state.sigma)
    np.testing.assert_array_equal(np.asarray(state.E), np.asarray(E_re))


def test_pspin_in_quant_wrapper():
    q = rt.GraphQuant(6, 4, 0.4, 2.0, rt.GraphPSpin3(6, 2, seed=2))
    s1 = random_spins(jax.random.key(1), q.N)

    @jax.jit
    def chk(sigma):
        aux = q.init_aux(sigma)
        E = q.to_physical(q.energy(sigma))
        dall = q.to_physical(q.delta_all(sigma, aux))
        dbf = jax.vmap(lambda i: q.to_physical(
            q.energy(sigma.at[i].multiply(-1))) - E)(jnp.arange(q.N))
        return dall, dbf

    dall, dbf = chk(s1)
    np.testing.assert_allclose(np.asarray(dall, np.float64),
                               np.asarray(dbf, np.float64), atol=1e-9)
