"""Model combinators: Mixed (sum of models) and Double (inner + residual).

`Mixed` is the analog of GraphMixed (/root/reference/src/graphs/Mixed.jl:12):
the energy of a tuple of models on the same N spins, summed in physical units.

`Double` is the DoubleGraph analog (/root/reference/src/Interface.jl:212-268):
an `inner` part whose moves rrrMC samples exactly, plus a `resid` part whose
energy change enters as an extra Metropolis correction factor. All composite
energies are in physical (float) units; exact integer arithmetic lives inside
the parts.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..core.struct import pytree, static
from ..core.model import Model
from ..core.dtypes import ftype


def _phys(model, e):
    return model.to_physical(e)


@pytree
class Mixed(Model):
    parts: Tuple[Model, ...]
    N: int = static()
    scale: float = static(1.0)

    def energy(self, sigma):
        return sum(_phys(p, p.energy(sigma)) for p in self.parts)

    def init_aux(self, sigma):
        return tuple(p.init_aux(sigma) for p in self.parts)

    def delta_all(self, sigma, aux):
        return sum(_phys(p, p.delta_all(sigma, a)) for p, a in zip(self.parts, aux))

    def delta_one(self, sigma, aux, i):
        return sum(_phys(p, p.delta_one(sigma, a, i)) for p, a in zip(self.parts, aux))

    def flip(self, sigma, aux, i, do):
        new_aux = []
        out_sigma = None
        for p, a in zip(self.parts, aux):
            s2, a2 = p.flip(sigma, a, i, do)
            out_sigma = s2  # all parts compute the same flipped sigma
            new_aux.append(a2)
        return out_sigma, tuple(new_aux)

    def neighbor_table(self):
        """Union of the parts' affected-spin tables (column concat; duplicate
        entries are harmless for redraw scatters)."""
        tables = [p.neighbor_table() for p in self.parts]
        if any(t is None for t in tables):
            return None
        return jnp.concatenate([t.astype(jnp.int32) for t in tables], axis=1)


def mixed(*parts: Model) -> Mixed:
    assert len(parts) >= 2
    n = parts[0].N
    assert all(p.N == n for p in parts), "same N for all parts required"
    return Mixed(parts=tuple(parts), N=n)


@pytree
class Double(Model):
    """inner (exactly-sampled discrete part) + resid (Metropolis-corrected)."""

    inner_m: Model
    resid_m: Model
    N: int = static()
    scale: float = static(1.0)

    def energy(self, sigma):
        return _phys(self.inner_m, self.inner_m.energy(sigma)) + _phys(
            self.resid_m, self.resid_m.energy(sigma))

    def init_aux(self, sigma):
        return (self.inner_m.init_aux(sigma), self.resid_m.init_aux(sigma))

    def delta_all(self, sigma, aux):
        return _phys(self.inner_m, self.inner_m.delta_all(sigma, aux[0])) + _phys(
            self.resid_m, self.resid_m.delta_all(sigma, aux[1]))

    def delta_one(self, sigma, aux, i):
        return _phys(self.inner_m, self.inner_m.delta_one(sigma, aux[0], i)) + _phys(
            self.resid_m, self.resid_m.delta_one(sigma, aux[1], i))

    def flip(self, sigma, aux, i, do):
        s2, a0 = self.inner_m.flip(sigma, aux[0], i, do)
        s2, a1 = self.resid_m.flip(sigma, aux[1], i, do)
        return s2, (a0, a1)

    def neighbor_table(self):
        """Union of inner and residual affected-spin tables."""
        a = self.inner_m.neighbor_table()
        b = self.resid_m.neighbor_table()
        if a is None or b is None:
            return None
        return jnp.concatenate([a.astype(jnp.int32), b.astype(jnp.int32)],
                               axis=1)

    @property
    def inner(self):
        return self.inner_m

    def inner_aux(self, aux):
        return aux[0]

    def residual_delta_one(self, sigma, aux, i):
        return _phys(self.resid_m, self.resid_m.delta_one(sigma, aux[1], i))

    def delta_classes(self):
        return self.inner_m.delta_classes()
