"""Convenience aliases composing the replica wrappers with base models,
mirroring /root/reference/src/QAliases.jl, REAliases.jl, LEAliases.jl,
TLEAliases.jl. Each alias builds the base disorder once and shares it across
replicas (exactly the reference convention, e.g. QAliases.jl:43).

SAT/Perc/Comm aliases appear alongside their base models in sat.py /
perceptron.py.
"""

from __future__ import annotations

import numpy as np

from ..core.model import Model
from .graphs import GraphEA, GraphEANormal, GraphEmpty
from .dense import GraphSK, GraphSKNormal, FullyConnected
from .pairwise import Pairwise
from .replicas import (GraphQuant, GraphRobustEnsemble, GraphLocalEntropy,
                       GraphTopologicalLocalEntropy, QuantModel, REModel,
                       LEModel, TLEModel)


def _ea_normal(L: int, D: int, seed):
    """The reference's QEAT/EARE/EALE base: EA lattice with uniform couplings
    in [-2, 2) (REAliases.jl / QAliases.jl:58-67 use 4*rand() - 2)."""
    from .graphs import gen_ea_adjacency, assign_edge_couplings, make_pairwise
    rng = np.random.default_rng(seed)
    adj = gen_ea_adjacency(L, D)
    J = assign_edge_couplings(adj, lambda: float(4 * rng.random() - 2))
    return make_pairwise(adj, J, L ** D)


def _tle_neighb(base: Model):
    """Topological neighborhood of a base model (TLE.jl:390-396)."""
    if isinstance(base, FullyConnected):
        n = base.N
        return [[j for j in range(n) if j != i] for i in range(n)]
    if isinstance(base, Pairwise):
        nb = np.asarray(base.neigh)
        return [[int(j) for j in row if j < base.N] for row in nb]
    raise TypeError(f"cannot derive neighb from {type(base).__name__}")


# --- Quant (QAliases.jl:15-17) ---------------------------------------------

def GraphQ0T(Nk, M, Gamma, beta) -> QuantModel:
    """Transverse field on free spins (QAliases.jl:30); testing/debugging."""
    return GraphQuant(Nk, M, Gamma, beta, GraphEmpty(Nk))


def GraphQSKT(Nk, M, Gamma, beta, *, seed=None) -> QuantModel:
    """(QAliases.jl:43)"""
    return GraphQuant(Nk, M, Gamma, beta, GraphSK(Nk, seed=seed))


def GraphQSKNormalT(Nk, M, Gamma, beta, *, seed=None) -> QuantModel:
    """(QAliases.jl:47)"""
    return GraphQuant(Nk, M, Gamma, beta, GraphSKNormal(Nk, seed=seed))


def GraphQEAT(L, D, M, Gamma, beta, *, seed=None) -> QuantModel:
    """(QAliases.jl:58-67)"""
    return GraphQuant(L ** D, M, Gamma, beta, _ea_normal(L, D, seed))


# --- Robust Ensemble (REAliases.jl:16-18) ----------------------------------

def Graph0RE(Nk, M, gamma, beta) -> REModel:
    return GraphRobustEnsemble(Nk, M, gamma, beta, GraphEmpty(Nk))


def GraphSKRE(Nk, M, gamma, beta, *, seed=None) -> REModel:
    return GraphRobustEnsemble(Nk, M, gamma, beta, GraphSK(Nk, seed=seed))


def GraphEARE(L, D, M, gamma, beta, *, seed=None) -> REModel:
    return GraphRobustEnsemble(L ** D, M, gamma, beta, _ea_normal(L, D, seed))


# --- Local Entropy (LEAliases.jl:16-18) ------------------------------------

def Graph0LE(Nk, M, gamma, beta) -> LEModel:
    return GraphLocalEntropy(Nk, M, gamma, beta, GraphEmpty(Nk))


def GraphSKLE(Nk, M, gamma, beta, *, seed=None) -> LEModel:
    return GraphLocalEntropy(Nk, M, gamma, beta, GraphSK(Nk, seed=seed))


def GraphEALE(L, D, M, gamma, beta, *, seed=None) -> LEModel:
    return GraphLocalEntropy(L ** D, M, gamma, beta, _ea_normal(L, D, seed))


# --- Topological Local Entropy (TLEAliases.jl:11) --------------------------

def Graph0TLE(Nk, M, gamma, lambda_, beta) -> TLEModel:
    base = GraphEmpty(Nk)
    return GraphTopologicalLocalEntropy(Nk, M, gamma, lambda_, beta, base,
                                        neighb=[[] for _ in range(Nk)])


def GraphSKTLE(Nk, M, gamma, lambda_, beta, *, seed=None) -> TLEModel:
    base = GraphSK(Nk, seed=seed)
    return GraphTopologicalLocalEntropy(Nk, M, gamma, lambda_, beta, base,
                                        neighb=_tle_neighb(base))


def GraphEATLE(L, D, M, gamma, lambda_, beta, *, seed=None) -> TLEModel:
    base = _ea_normal(L, D, seed)
    return GraphTopologicalLocalEntropy(L ** D, M, gamma, lambda_, beta, base,
                                        neighb=_tle_neighb(base))
