"""Observable helpers (the pull-based observable functions and hook payloads
of the reference, /root/reference/src/RRRMC.jl:61-64 and model-specific
observables in /root/reference/src/graphs/QT.jl:201-268 etc.).

These are plain functions over (model, sigma[, aux]); wrapper-specific
observables (Qenergy, overlaps, ...) live next to their wrappers in
models/."""

from __future__ import annotations

import jax.numpy as jnp


def magnetization(sigma):
    """Mean magnetization per spin; sigma [..., N]."""
    return jnp.mean(sigma.astype(jnp.float32), axis=-1)


def pack_config(sigma):
    """Pack an N<=30 spin vector into one int32 state id (the ba2int analog,
    /root/reference/src/RRRMC.jl:525, used for exact-enumeration tests)."""
    n = sigma.shape[-1]
    bits = (sigma > 0).astype(jnp.int32)
    return jnp.sum(bits << jnp.arange(n, dtype=jnp.int32), axis=-1)


def unpack_config(idx, n):
    """Inverse of pack_config: int state id -> +-1 int8 vector."""
    bits = (idx[..., None] >> jnp.arange(n, dtype=jnp.int32)) & 1
    return (2 * bits - 1).astype(jnp.int8)


def overlap(sigma1, sigma2):
    """Normalized overlap q = <s1 s2> (the pm1dot analog,
    /root/reference/scripts/scripts.jl:283)."""
    n = sigma1.shape[-1]
    return jnp.sum((sigma1 * sigma2).astype(jnp.int32), axis=-1) / n
