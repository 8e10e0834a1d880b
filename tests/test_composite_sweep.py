"""Composite color-mask sweeps for replica wrappers (sweepMC on
Quant/RE/LE/TLE over sparse Pairwise bases): mask validity, energy
invariant, stationarity vs the single-move samplers.

Reference semantics being matched: the wrapper coupling structures of
QT.jl:105-108 (same-site ring), RE.jl:70-104 (same-site star),
LE.jl:55-84 (center-replica star), TLE.jl:17-56 (base-edge 4-spin) — a
(slot x base color) mask contains no interacting pair.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rrrmc_tpu as rt
from rrrmc_tpu.samplers.sweep import composite_masks


@jax.jit
def _recompute(model, sigma):
    return jax.vmap(model.energy)(sigma)


def _base():
    return rt.GraphRRG(64, 3, (-1, 1), seed=3)


def _wrappers():
    b = _base()
    return [
        ("RE", rt.GraphRobustEnsemble(64, 4, 2.0, 1.0, b)),
        ("LE", rt.GraphLocalEntropy(64, 4, 1.0, 1.0, b)),
        ("Quant", rt.GraphQuant(64, 4, 0.4, 1.0, b)),
        ("TLE", rt.GraphTopologicalLocalEntropy(64, 4, 0.5, 0.3, 1.0, b)),
    ]


@pytest.mark.slow
def test_composite_masks_are_independent_sets():
    """Brute force: no mask may contain a pair (a, b) whose delta_energy
    interaction is nonzero — flipping b must not change a's delta."""
    for name, X in _wrappers():
        masks = np.asarray(composite_masks(X))
        assert masks.sum() == X.N, name              # exact partition
        key = jax.random.key(0)
        from rrrmc_tpu.core.model import random_spins
        sigma = random_spins(key, X.N)
        aux = X.init_aux(sigma)
        d0 = np.asarray(jax.jit(X.delta_all)(sigma, aux), np.float64)
        # flip each spin b, check deltas of same-mask partners unchanged
        rng = np.random.default_rng(1)
        for m in masks:
            members = np.nonzero(m)[0]
            for b in rng.choice(members, size=min(4, len(members)),
                                replace=False):
                s2, a2 = jax.jit(X.flip)(sigma, aux, jnp.asarray(b),
                                         jnp.asarray(True))
                d1 = np.asarray(jax.jit(X.delta_all)(s2, a2), np.float64)
                others = members[members != b]
                np.testing.assert_allclose(d1[others], d0[others],
                                           atol=1e-9, err_msg=name)


@pytest.mark.parametrize("name_i", range(4))
def test_composite_sweep_invariant_and_law(name_i):
    name, X = _wrappers()[name_i]
    Es, st = rt.sweepMC(X, 1.0, 60, step=10, chains=16, seed=5)
    E_re = np.asarray(_recompute(X, st.sigma), np.float64)
    np.testing.assert_allclose(np.asarray(st.E, np.float64), E_re,
                               atol=1e-9, err_msg=name)
    # equilibrium law matches the exact single-site chain
    Em, _ = rt.standardMC(X, 1.0, iters=X.N * 60, step=X.N * 10,
                          chains=16, seed=7)
    a = np.asarray(Es)[:, 2:].mean() / X.N
    b = np.asarray(Em)[:, 2:].mean() / X.N
    assert abs(a - b) < 0.06, (name, a, b)


def test_composite_sweep_dense_base_falls_through():
    """SK (dense) bases have no usable coloring: sweepMC must reject them
    (no silent wrong-mask route)."""
    X = rt.GraphSKRE(32, 4, 2.0, 0.5, seed=8)
    assert composite_masks(X) is None
    with pytest.raises(AssertionError):
        rt.sweepMC(X, 0.5, 4, chains=4, seed=3)


def test_composite_sweep_warm_continuation():
    b = _base()
    X = rt.GraphRobustEnsemble(64, 4, 2.0, 1.0, b)
    _, st = rt.sweepMC(X, 1.0, 10, step=10, chains=8, seed=5)
    Es2, st2 = rt.sweepMC(X, 1.0, 10, step=10, chains=8, seed=6, state=st)
    E_re = np.asarray(_recompute(X, st2.sigma), np.float64)
    np.testing.assert_allclose(np.asarray(st2.E, np.float64), E_re,
                               atol=1e-9)


def test_tle_sweep_reports_composite_route():
    """VERDICT r4 item 6: TLE sweepMC over a sparse base must not report
    the generic 'xla' route — the (slot x base-color) mask sweep carries
    the 4-spin topological term (TLE.jl:17-56)."""
    from rrrmc_tpu.samplers.common import LAST_ROUTE

    X = rt.GraphTopologicalLocalEntropy(64, 4, 0.5, 0.3, 1.0, _base())
    Es, st = rt.sweepMC(X, 1.0, 4, step=2, chains=4, seed=3)
    assert LAST_ROUTE["backend"] == "composite-mask-sweep"
    E_re = np.asarray(_recompute(X, st.sigma), np.float64)
    np.testing.assert_allclose(E_re, np.asarray(st.E, np.float64),
                               atol=1e-6 * max(1.0, np.abs(E_re).max()))
