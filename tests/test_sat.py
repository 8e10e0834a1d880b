"""GraphSAT validation: exact clause-count energies, brute-force deltas, aux
(sat-count) consistency under flips, sampler invariants, and the RE/LE/TLE
SAT aliases (mirrors the reference zoo entries, /root/reference/test/runtests.jl
and src/graphs/SAT.jl semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rrrmc_tpu as rt
from rrrmc_tpu.core.model import random_spins


def test_sat_energy_is_violated_clause_count():
    A = np.array([[0, 1, 2], [1, 2, 3]], dtype=np.int32)
    L = np.array([[1, 1, 1], [-1, -1, -1]], dtype=np.int32)
    m = rt.make_sat(4, A, L)
    # all spins +1: clause 0 satisfied, clause 1 violated
    E = int(m.energy(jnp.ones(4, jnp.int8)))
    assert E == 1
    # all spins -1: clause 0 violated, clause 1 satisfied
    E = int(m.energy(-jnp.ones(4, jnp.int8)))
    assert E == 1


def test_sat_deltas_and_aux():
    model = rt.GraphSAT(12, 3, 2.5, seed=42)
    sigma0 = random_spins(jax.random.key(0), model.N)

    @jax.jit
    def run(sigma):
        aux = model.init_aux(sigma)
        E = model.to_physical(model.energy(sigma))
        dall = model.to_physical(model.delta_all(sigma, aux))
        done = jax.vmap(lambda i: model.to_physical(
            model.delta_one(sigma, aux, i)))(jnp.arange(model.N))

        def bf(i):
            return model.to_physical(model.energy(sigma.at[i].multiply(-1))) - E

        dbf = jax.vmap(bf)(jnp.arange(model.N))

        def body(carry, k):
            sigma, aux = carry
            i = jax.random.randint(k, (), 0, model.N)
            return model.flip(sigma, aux, i, jnp.asarray(True)), None

        (sig2, aux2), _ = jax.lax.scan(
            body, (sigma, aux), jax.random.split(jax.random.key(1), 80))
        return dall, done, dbf, aux2, model.init_aux(sig2)

    dall, done, dbf, aux2, aux_re = run(sigma0)
    np.testing.assert_array_equal(np.asarray(dall), np.asarray(dbf))
    np.testing.assert_array_equal(np.asarray(done), np.asarray(dbf))
    np.testing.assert_array_equal(np.asarray(aux2), np.asarray(aux_re))


def test_sat_sampler_invariant():
    model = rt.GraphSAT(12, 3, 2.5, seed=42)
    _, state = rt.standardMC(model, 2.0, iters=2000, step=100, chains=8, seed=5)
    E_re = jax.jit(jax.vmap(model.energy))(state.sigma)
    np.testing.assert_array_equal(np.asarray(state.E), np.asarray(E_re))
    _, state = rt.bklMC(model, 2.0, iters=2000, step=100, chains=8, seed=6)
    E_re = jax.jit(jax.vmap(model.energy))(state.sigma)
    np.testing.assert_array_equal(np.asarray(state.E), np.asarray(E_re))


@pytest.mark.parametrize("name,build", [
    ("SATRE", lambda: rt.GraphSATRE(6, 3, 2.0, 4, 0.4, 2.0, seed=1)),
    ("SATLE", lambda: rt.GraphSATLE(6, 3, 2.0, 3, 0.4, 2.0, seed=2)),
    ("SATTLE", lambda: rt.GraphSATTLE(6, 3, 2.0, 3, 0.4, 0.2, 2.0, seed=3)),
])
def test_sat_wrappers_delta(name, build):
    m = build()
    s0 = random_spins(jax.random.key(2), m.N)

    @jax.jit
    def chk(sigma):
        aux = m.init_aux(sigma)
        E = m.to_physical(m.energy(sigma))
        dall = m.to_physical(m.delta_all(sigma, aux))

        def bf(i):
            return m.to_physical(m.energy(sigma.at[i].multiply(-1))) - E

        return dall, jax.vmap(bf)(jnp.arange(m.N))

    dall, dbf = chk(s0)
    np.testing.assert_allclose(np.asarray(dall, np.float64),
                               np.asarray(dbf, np.float64), atol=1e-9)


def test_sat_eo_reaches_satisfying_assignment():
    """tau-EO on an easy under-constrained instance should find E=0."""
    model = rt.GraphSAT(20, 3, 1.5, seed=7)
    res = rt.extremal_opt(model, 1.4, 2000, chains=8, seed=8)
    assert float(np.min(np.asarray(res.Emin))) == 0.0


def test_export_cnf(tmp_path):
    model = rt.GraphSAT(10, 3, 2.0, seed=9)
    p = tmp_path / "f.cnf"
    rt.export_cnf(model, str(p))
    lines = p.read_text().strip().splitlines()
    assert lines[0] == f"p cnf 10 {model.Mc}"
    assert len(lines) == 1 + model.Mc
    assert all(ln.endswith(" 0") for ln in lines[1:])


def test_export_cnf_decimated(tmp_path):
    """Decimated export (SAT.jl:142-187): fixing variable 1 satisfies or
    shrinks its clauses; the written formula plus the units must be
    equisatisfiable assignments consistent with the original clauses."""
    model = rt.GraphSAT(10, 3, 2.0, seed=9)
    p = tmp_path / "d.cnf"
    rt.export_cnf(model, str(p), decimate=[1])
    lines = p.read_text().strip().splitlines()
    n_clauses = int(lines[0].split()[-1])
    assert len(lines) == 1 + n_clauses
    body = [list(map(int, ln.split()))[:-1] for ln in lines[1:]]
    # the decimated variable appears only as its unit clause
    assert [1] in body
    assert all(1 not in cl and -1 not in cl for cl in body if cl != [1])
    # no clause shrank below size 1 and none contains a var out of range
    assert all(1 <= len(cl) <= 3 for cl in body)
    assert all(abs(v) <= 10 for cl in body for v in cl)
