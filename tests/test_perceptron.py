"""Perceptron model validation: brute-force deltas, aux (stability vector)
consistency under flips, and replica-wrapper composition (the check_delta
analog of /root/reference/src/graphs/PercLinear.jl:182-190 run over every
spin)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rrrmc_tpu as rt
from rrrmc_tpu.core.model import random_spins


ZOO = {
    "PercStep": lambda: rt.GraphPercStep(11, 6, seed=1),
    "PercLinear": lambda: rt.GraphPercLinear(11, 6, seed=2),
    "PercXEntr": lambda: rt.GraphPercXEntr(11, 6, 0.8, seed=3),
    "QPercStepT": lambda: rt.GraphQPercStepT(5, 4, 4, 0.4, 2.0, seed=4),
    "PercLinearRE": lambda: rt.GraphPercLinearRE(5, 4, 3, 0.4, 2.0, seed=5),
    "PercStepLE": lambda: rt.GraphPercStepLE(5, 4, 3, 0.4, 2.0, seed=6),
}


@pytest.mark.parametrize("name", list(ZOO.keys()))
def test_perc_delta_and_aux(name):
    m = ZOO[name]()
    s0 = random_spins(jax.random.key(0), m.N)

    @jax.jit
    def run(sigma):
        aux = m.init_aux(sigma)
        E = m.to_physical(m.energy(sigma))
        dall = m.to_physical(m.delta_all(sigma, aux))
        done = jax.vmap(lambda i: m.to_physical(
            m.delta_one(sigma, aux, i)))(jnp.arange(m.N))

        def bf(i):
            return m.to_physical(m.energy(sigma.at[i].multiply(-1))) - E

        dbf = jax.vmap(bf)(jnp.arange(m.N))

        def body(carry, k):
            sigma, aux = carry
            i = jax.random.randint(k, (), 0, m.N)
            return m.flip(sigma, aux, i, jnp.asarray(True)), None

        (sig2, aux2), _ = jax.lax.scan(
            body, (sigma, aux), jax.random.split(jax.random.key(1), 60))
        return dall, done, dbf, aux2, m.init_aux(sig2)

    dall, done, dbf, aux2, aux_re = run(s0)
    np.testing.assert_allclose(np.asarray(dall, np.float64),
                               np.asarray(dbf, np.float64), atol=1e-9)
    np.testing.assert_allclose(np.asarray(done, np.float64),
                               np.asarray(dbf, np.float64), atol=1e-9)
    for a, b in zip(jax.tree.leaves(aux2), jax.tree.leaves(aux_re)):
        np.testing.assert_allclose(np.asarray(a, np.float64),
                                   np.asarray(b, np.float64), atol=1e-9)


def test_perc_step_energy_is_error_count():
    xi = np.array([[1, 1, 1], [-1, -1, -1], [1, -1, 1]], dtype=np.int8)
    m = rt.GraphPercStep(3, 3, xi=xi)
    sigma = jnp.asarray([1, 1, 1], jnp.int8)
    # stabilities: 3, -3, 1 -> one misclassified
    assert int(m.energy(sigma)) == 1


def test_perc_sampler_invariant():
    m = rt.GraphPercLinear(11, 8, seed=9)
    _, state = rt.standardMC(m, 2.0, iters=2000, step=100, chains=8, seed=5)
    E_re = jax.jit(jax.vmap(m.energy))(state.sigma)
    np.testing.assert_allclose(np.asarray(state.E), np.asarray(E_re), atol=1e-11)


def test_perc_eo_learns():
    """EO should find zero training error below capacity (alpha ~ 0.5)."""
    m = rt.GraphPercStep(21, 8, seed=10)
    res = rt.extremal_opt(m, 1.4, 3000, chains=8, seed=11)
    assert float(np.min(np.asarray(res.Emin))) == 0.0
