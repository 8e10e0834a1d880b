"""Model-contract tests: delta_all / delta_one / flip consistency against
brute-force energy recomputation (the per-model `check_delta` analog,
e.g. /root/reference/src/graphs/PercLinear.jl:182-190)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rrrmc_tpu as rt
from rrrmc_tpu.core.model import random_spins


def model_zoo_tier1():
    return {
        "EA2D": rt.GraphEA(4, 2, (-1, 1), seed=1),
        "EA3D": rt.GraphEA(3, 3, (-1, 1), seed=2),
        "EA2D_L2": rt.GraphEA(2, 2, (-1, 1), seed=3),
        "EA2D_frac": rt.GraphEA(4, 2, (-1.0, -0.5, 0.5, 1.0), seed=4),
        "EANormal": rt.GraphEANormal(4, 2, seed=5),
        "EANormalDiscr": rt.GraphEANormalDiscretized(4, 2, (-1.0, 1.0), seed=6),
        "RRG": rt.GraphRRG(12, 3, (-1, 1), seed=7),
        "RRG_frac": rt.GraphRRG(12, 3, (-1.0, -0.5, 0.5, 1.0), seed=8),
        "RRGNormal": rt.GraphRRGNormal(12, 3, seed=9),
        "RRGNormalDiscr": rt.GraphRRGNormalDiscretized(12, 3, (-1.0, 1.0), seed=10),
        "Ising1D": rt.GraphIsing1D(8),
        "Fields": rt.GraphFields(10, (0.5, 1.5), seed=11),
        "FieldsNormalDiscr": rt.GraphFieldsNormalDiscretized(10, (-1.0, 1.0), seed=12),
        "Empty": rt.GraphEmpty(6),
        "TwoSpin": rt.GraphTwoSpin(),
        "ThreeSpin": rt.GraphThreeSpin(),
    }


ZOO = model_zoo_tier1()


@jax.jit
def brute_delta_all(model, sigma):
    """[N] physical dE by flipping each spin and recomputing the energy."""
    e0 = model.to_physical(model.energy(sigma))

    def one(i):
        return model.to_physical(model.energy(sigma.at[i].multiply(-1))) - e0

    return jax.vmap(one)(jnp.arange(model.N))


@pytest.mark.parametrize("name", list(ZOO.keys()))
def test_delta_consistency(name):
    model = ZOO[name]
    sigma = random_spins(jax.random.key(42), model.N)
    aux = model.init_aux(sigma)
    d_all = model.to_physical(model.delta_all(sigma, aux))
    expected = brute_delta_all(model, sigma)
    np.testing.assert_allclose(d_all, expected, atol=1e-10, err_msg=name)
    d_one = jax.jit(jax.vmap(lambda i: model.to_physical(
        model.delta_one(sigma, aux, i))))(jnp.arange(model.N))
    np.testing.assert_allclose(d_one, expected, atol=1e-10, err_msg=name)


@pytest.mark.parametrize("name", list(ZOO.keys()))
def test_flip_updates_aux(name):
    """flip must keep aux identical to a fresh init_aux on the new sigma."""
    model = ZOO[name]
    sigma = random_spins(jax.random.key(7), model.N)
    aux = model.init_aux(sigma)
    moves = jnp.asarray(
        np.random.default_rng(0).integers(0, model.N, size=50))

    @jax.jit
    def run(sigma, aux):
        def body(carry, i):
            s, a = carry
            s, a = model.flip(s, a, i, jnp.asarray(True))
            return (s, a), None

        (sigma, aux), _ = jax.lax.scan(body, (sigma, aux), moves)
        return sigma, aux

    sigma, aux = run(sigma, aux)
    fresh = model.init_aux(sigma)
    for a, b in zip(jax.tree.leaves(aux), jax.tree.leaves(fresh)):
        np.testing.assert_allclose(a, b, atol=1e-10,
                                   err_msg=f"{name} aux drift after flips")


@pytest.mark.parametrize("name", list(ZOO.keys()))
def test_masked_flip_is_noop(name):
    model = ZOO[name]
    sigma = random_spins(jax.random.key(3), model.N)
    aux = model.init_aux(sigma)
    s2, a2 = jax.jit(model.flip)(sigma, aux, jnp.asarray(0), jnp.asarray(False))
    np.testing.assert_array_equal(s2, sigma)
    for a, b in zip(jax.tree.leaves(aux), jax.tree.leaves(a2)):
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("name", ["EA2D", "RRGNormalDiscr", "Ising1D",
                                  "FieldsNormalDiscr", "EANormalDiscr"])
def test_double_residual_split(name):
    model = ZOO[name]
    if model.inner is None:
        return
    sigma = random_spins(jax.random.key(5), model.N)
    aux = model.init_aux(sigma)
    idx = jnp.arange(model.N)

    @jax.jit
    def split(i):
        total = model.to_physical(model.delta_one(sigma, aux, i))
        inner_aux = model.inner_aux(aux)
        d0 = model.inner.to_physical(
            model.inner.delta_one(sigma, inner_aux, i))
        d1 = model.residual_delta_one(sigma, aux, i)
        return total, d0 + d1

    total, parts = jax.vmap(split)(idx)
    np.testing.assert_allclose(parts, total, atol=1e-10)


def test_integer_models_are_exact():
    m = ZOO["EA2D"]
    assert jnp.issubdtype(m.J.dtype, jnp.integer)
    sigma = random_spins(jax.random.key(1), m.N)
    assert jnp.issubdtype(m.energy(sigma).dtype, jnp.integer)


def test_delta_classes_cover_observed():
    for name in ["EA2D", "EA3D", "RRG", "Ising1D", "TwoSpin", "ThreeSpin"]:
        model = ZOO[name]
        classes = model.delta_classes()
        assert classes is not None
        sigma = random_spins(jax.random.key(11), model.N)
        aux = model.init_aux(sigma)
        d = np.abs(np.asarray(model.to_physical(model.delta_all(sigma, aux))))
        for v in d:
            assert any(abs(v - c) < 1e-9 for c in classes), (name, v, classes)


def test_ea_from_file(tmp_path):
    """Round-trip the reference's 2-D EA instance file format
    (gen_AJ, /root/reference/src/graphs/EA.jl:73-118)."""
    import numpy as np
    import rrrmc_tpu as rt

    X0 = rt.GraphEA(4, 2, (-1, 1), seed=3)
    adj = np.asarray(X0.neigh)
    J = np.asarray(X0.J)
    lines = ["type: EA", "size: 4", "name: test"]
    seen = set()
    for x in range(X0.N):
        for k, y in enumerate(adj[x]):
            if (min(x, y), max(x, y)) in seen:
                continue
            seen.add((min(x, y), max(x, y)))
            lines.append(f"{x + 1} {y + 1} {float(J[x, k]) * X0.scale}")
    p = tmp_path / "inst.txt"
    p.write_text("\n".join(lines) + "\n")
    X1 = rt.GraphEAFromFile(str(p))
    import jax, jax.numpy as jnp
    from rrrmc_tpu.core.model import random_spins
    s = random_spins(jax.random.key(0), X0.N)
    e0 = float(X0.to_physical(X0.energy(s)))
    e1 = float(X1.to_physical(X1.energy(s)))
    assert abs(e0 - e1) < 1e-9
