"""Lattice-specialized EA model: local fields via axis rolls, not gathers.

A D-dimensional periodic lattice's neighbor structure is D pairs of +-1
shifts, so the local-field recompute that dominates the checkerboard sweep
kernel (samplers/sweep.py) is expressible as 2D `jnp.roll`s — contiguous
vector shifts XLA lowers to cheap slice/concat, instead of the generic padded
[B, N, K] gather of Pairwise.local_fields. The padded tables are still built
(LatticeEA subclasses Pairwise) so every single-site sampler works unchanged;
only `local_fields` and `sweep_masks` are overridden.

Couplings are stored direction-major: Jd[d] is the coupling of the edge from
site x to x + e_d (same disorder layout as gen_EA,
/root/reference/src/graphs/EA.jl:24-43, re-indexed for vector shifts):

    lf[x] = sum_d Jd[d][x] * sigma[x+e_d] + Jd[d][x-e_d] * sigma[x-e_d] + h[x]
          = sum_d Jd[d]*roll(sigma,-1,d) + roll(Jd[d]*sigma,+1,d) + h

Requires L > 2 (L=2 has doubled parallel edges, EA.jl:156-158 — that case
falls back to the generic Pairwise path in graphs.GraphEA).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from ..core.struct import pytree, static
from ..core.dtypes import ftype, itype
from .pairwise import Pairwise, make_pairwise, infer_integer_scale, \
    enumerate_pair_classes


@pytree
class LatticeEA(Pairwise):
    Jd: jnp.ndarray = None      # [D, *lat] edge couplings toward +e_d
    L: int = static(0)
    D: int = static(0)

    @property
    def lat_shape(self):
        return (self.L,) * self.D

    def local_fields(self, sigma):
        s = sigma.reshape(self.lat_shape).astype(self.Jd.dtype)
        lf = None
        for d in range(self.D):
            jd = self.Jd[d]
            t = jd * jnp.roll(s, -1, axis=d) + jnp.roll(jd * s, 1, axis=d)
            lf = t if lf is None else lf + t
        return lf.reshape(self.N) + self.h

    def sweep_masks(self):
        """Exact checkerboard 2-coloring for even L. Odd L is NOT bipartite
        (periodic wraparound joins same-parity sites), so it falls back to
        the generic greedy coloring — parity masks there would flip coupled
        neighbors simultaneously and break the chain law."""
        if self.L % 2:
            from ..samplers.sweep import color_masks
            return color_masks(self)
        coords = np.indices(self.lat_shape).sum(axis=0).reshape(self.N)
        par = coords % 2 == 0
        return jnp.asarray(np.stack([par, ~par]))


def _lattice_tables(L: int, D: int, Jd: np.ndarray):
    """Padded [N, 2D] neighbor/coupling tables from direction-major Jd."""
    n = L ** D
    shape = (L,) * D
    idx = np.arange(n).reshape(shape)
    neigh = np.empty((n, 2 * D), dtype=np.int32)
    jmat = np.empty((n, 2 * D), dtype=np.float64)
    for d in range(D):
        fwd = np.roll(idx, -1, axis=d).reshape(n)      # x + e_d
        bwd = np.roll(idx, 1, axis=d).reshape(n)       # x - e_d
        neigh[:, 2 * d] = fwd
        jmat[:, 2 * d] = Jd[d].reshape(n)
        neigh[:, 2 * d + 1] = bwd
        jmat[:, 2 * d + 1] = np.roll(Jd[d], 1, axis=d).reshape(n)
    return neigh, jmat


def make_lattice_ea(L: int, D: int, Jd: np.ndarray, *, h=None,
                    integer_scale: Optional[float] = None,
                    classes: Optional[Tuple[float, ...]] = None) -> LatticeEA:
    assert L > 2, "L must be > 2 (L=2 needs the doubled-edge Pairwise path)"
    n = L ** D
    neigh, jmat = _lattice_tables(L, D, Jd)
    hv = np.zeros(n) if h is None else np.asarray(h, dtype=np.float64)
    if integer_scale is not None:
        ji = np.round(jmat / integer_scale).astype(np.int32)
        jdi = np.round(Jd / integer_scale).astype(np.int32)
        hi = np.round(hv / integer_scale).astype(np.int32)
        assert np.allclose(ji * integer_scale, jmat, atol=1e-12)
        return LatticeEA(
            neigh=jnp.asarray(neigh), J=jnp.asarray(ji, itype()),
            h=jnp.asarray(hi, itype()), offset=jnp.asarray(0, itype()),
            N=n, K=2 * D, scale=float(integer_scale), classes=classes,
            Jd=jnp.asarray(jdi, itype()), L=L, D=D)
    ft = ftype()
    return LatticeEA(
        neigh=jnp.asarray(neigh), J=jnp.asarray(jmat, ft),
        h=jnp.asarray(hv, ft), offset=jnp.asarray(0.0, ft),
        N=n, K=2 * D, scale=1.0, classes=classes,
        Jd=jnp.asarray(Jd, ft), L=L, D=D)


def lattice_ea_from_levels(L: int, D: int, LEV: Sequence[float],
                           rng) -> LatticeEA:
    lev = [float(x) for x in LEV]
    Jd = rng.choice(lev, size=(D,) + (L,) * D)
    scale = infer_integer_scale(np.asarray(lev))
    classes = enumerate_pair_classes(lev, 2 * D)
    return make_lattice_ea(L, D, Jd, integer_scale=scale, classes=classes)


def lattice_ea_normal(L: int, D: int, rng) -> LatticeEA:
    Jd = rng.standard_normal((D,) + (L,) * D)
    return make_lattice_ea(L, D, Jd)
