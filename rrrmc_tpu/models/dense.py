"""Dense fully-connected models: Sherrington-Kirkpatrick and friends.

The reference stores SK couplings as BitVector rows with XOR-popcount energy
kernels and @simd cache updates (/root/reference/src/graphs/SK.jl:17-133).
TPU-native, a fully-connected model is *matmul-shaped*: the local-field cache
is lf = J @ sigma + h (one MXU matvec at init — and across a batch of chains a
[B, N] x [N, N] matmul), and a flip updates lf by adding a scaled row of J
(one fused VPU op). `neighbors = AllButOne` (/root/reference/src/graphs/SK.jl:165)
disappears: density is the point.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp

from ..core.struct import pytree, static
from ..core.model import Model, flip_spin
from ..core.dtypes import ftype, itype


@pytree
class FullyConnected(Model):
    """E = -1/2 sigma^T J sigma - h . sigma, with J symmetric, zero diagonal.

    Integer-valued J/h instances keep an exact int32 internal domain with a
    static `scale` to physical units (the SK +-1/sqrt(N) case)."""

    J: jnp.ndarray       # [N, N] symmetric, zero diagonal
    h: jnp.ndarray       # [N]
    N: int = static()
    scale: float = static(1.0)

    def local_fields(self, sigma):
        return self.J @ sigma.astype(self.J.dtype) + self.h

    def energy(self, sigma):
        s = sigma.astype(self.J.dtype)
        lf = self.J @ s
        quad = s @ lf
        if jnp.issubdtype(self.J.dtype, jnp.integer):
            quad = quad // 2  # exact: symmetric J, zero diag => quad is even
        else:
            quad = quad / 2
        return -(quad + s @ self.h)

    def init_aux(self, sigma):
        return self.local_fields(sigma)

    def delta_all(self, sigma, aux):
        return 2 * sigma.astype(self.J.dtype) * aux

    def delta_one(self, sigma, aux, i):
        return 2 * sigma[i].astype(self.J.dtype) * aux[i]

    def flip(self, sigma, aux, i, do):
        s_i = sigma[i].astype(self.J.dtype)
        row = self.J[i]
        upd = jnp.where(do, -2 * s_i, jnp.zeros_like(s_i))
        aux = aux + upd * row
        return flip_spin(sigma, i, do), aux


def _sym_zero_diag(J: np.ndarray) -> np.ndarray:
    J = np.triu(J, 1)
    return J + J.T


def GraphSK(N: int, *, seed=None) -> FullyConnected:
    """SK with binary couplings +-1/sqrt(N) (gen_J,
    /root/reference/src/graphs/SK.jl:17-26). Exact int32 internal domain with
    scale 1/sqrt(N)."""
    rng = np.random.default_rng(seed)
    J = _sym_zero_diag(rng.choice([-1, 1], size=(N, N)).astype(np.int32))
    return FullyConnected(J=jnp.asarray(J, itype()),
                          h=jnp.zeros((N,), itype()),
                          N=N, scale=1.0 / np.sqrt(N))


def GraphSKNormal(N: int, *, seed=None) -> FullyConnected:
    """SK with Gaussian couplings N(0, 1/N)
    (/root/reference/src/graphs/SK.jl:170-297)."""
    rng = np.random.default_rng(seed)
    J = _sym_zero_diag(rng.standard_normal((N, N)) / np.sqrt(N))
    return FullyConnected(J=jnp.asarray(J, ftype()),
                          h=jnp.zeros((N,), ftype()), N=N)


def make_fully_connected(J, h=None, *, scale: Optional[float] = None
                         ) -> FullyConnected:
    """Build from an explicit symmetric coupling matrix (zero diagonal
    enforced); `scale` marks J as exact integers in physical units J*scale."""
    J = np.asarray(J)
    N = J.shape[0]
    assert J.shape == (N, N) and np.allclose(J, J.T), "J must be symmetric"
    J = J - np.diag(np.diag(J))
    hv = np.zeros(N) if h is None else np.asarray(h, dtype=np.float64)
    if scale is not None:
        Ji = np.round(J / scale).astype(np.int32)
        hi = np.round(hv / scale).astype(np.int32)
        assert np.allclose(Ji * scale, J, atol=1e-12)
        assert np.allclose(hi * scale, hv, atol=1e-12)
        return FullyConnected(J=jnp.asarray(Ji, itype()),
                              h=jnp.asarray(hi, itype()), N=N, scale=scale)
    return FullyConnected(J=jnp.asarray(J, ftype()),
                          h=jnp.asarray(hv, ftype()), N=N)
