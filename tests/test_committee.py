"""Committee-machine validation: brute-force deltas, aux consistency, E =
misclassification count, wrapper composition (the check_delta analog,
/root/reference/src/graphs/CommStep.jl:244-252, run over every spin for all
three activation kinds, tree and fully-connected)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rrrmc_tpu as rt
from rrrmc_tpu.core.model import random_spins


ZOO = {
    "CommStep": lambda: rt.GraphCommStep(3, 3, 6, seed=1),
    "CommStep-fc": lambda: rt.GraphCommStep(5, 3, 6, fc=True, seed=2),
    "CommReLU": lambda: rt.GraphCommReLU(4, 2, 6, seed=3),
    "CommReLU-fc": lambda: rt.GraphCommReLU(4, 4, 6, fc=True, seed=4),
    "CommQu": lambda: rt.GraphCommQu(4, 2, 6, seed=5),
    "CommQu-fc": lambda: rt.GraphCommQu(4, 4, 6, fc=True, seed=6),
    "QCommStepT": lambda: rt.GraphQCommStepT(3, 3, 4, 4, 0.4, 2.0, seed=7),
    "CommReLURE": lambda: rt.GraphCommReLURE(2, 2, 4, 3, 0.4, 2.0, seed=8),
    "CommQuLE": lambda: rt.GraphCommQuLE(2, 2, 4, 3, 0.4, 2.0, seed=9),
}


@pytest.mark.parametrize("name", list(ZOO.keys()))
def test_committee_delta_and_aux(name):
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


def test_commstep_energy_by_hand():
    # one unit, identity-ish: K1=3, K2=1... K2 must be odd; 1 is odd.
    xi = np.array([[1, 1, 1], [-1, -1, -1]], dtype=np.int8)
    m = rt.GraphCommStep(3, 1, 2, xi=xi)
    sigma = jnp.asarray([1, 1, 1], jnp.int8)
    # pattern 0: Delta1=3 -> sign +1 -> ok; pattern 1: Delta1=-3 -> wrong
    assert int(m.energy(sigma)) == 1


def test_committee_sampler_invariant():
    m = rt.GraphCommReLU(4, 2, 8, seed=11)
    _, state = rt.standardMC(m, 1.5, iters=2000, step=100, chains=8, seed=5)
    E_re = jax.jit(jax.vmap(m.energy))(state.sigma)
    np.testing.assert_array_equal(np.asarray(state.E), np.asarray(E_re))


def test_committee_eo_learns():
    m = rt.GraphCommStep(5, 3, 5, seed=12)
    res = rt.extremal_opt(m, 1.4, 3000, chains=8, seed=13)
    assert float(np.min(np.asarray(res.Emin))) == 0.0


def test_commqu_re_alias_runs():
    import rrrmc_tpu as rt

    m = rt.GraphCommQuRE(8, 4, 4, M=3, gamma=0.3, beta=1.0, seed=2)
    Es, st = rt.standardMC(m, 1.0, iters=400, step=100, chains=4, seed=1)
    E_re = jax.jit(jax.vmap(m.energy))(st.sigma)
    np.testing.assert_allclose(np.asarray(E_re), np.asarray(st.E),
                               atol=1e-9)
