"""Pallas TPU kernel for dense (SK) sequential Metropolis sweeps.

The XLA delayed-update path (samplers/dense_sweep.py) is HBM-bound: every
window step streams the [W, B] correction state through HBM (~50 GB/s
effective -> ~7e7 flips/s). This kernel keeps EVERYTHING resident in VMEM —
the full [N, N] int8 coupling matrix (1 MB at N=1024), the chain block's
spins and local fields [N, BT] int32 — and processes each sweep as:

* systematic site order 0..N-1 (typewriter scan — a valid sequential
  Metropolis variant with the same stationary law; the random-permutation
  order lives in the XLA path when reference-faithful scan order matters);
* windows of W contiguous sites: the [W, W] diagonal block and the [W, N]
  row block are STATIC-stride VMEM slices;
* inside a window, W fully unrolled register-level steps: decision against
  the running in-window correction (O(W * BT) vector add per move);
* one [W, N]^T x [W, BT] int8 MXU matmul per window commits the rank-W
  local-field update.

Acceptance matches metropolis_accept (/root/reference/src/RRRMC.jl:39) with
hardware PRNG bits compared in the signed-int32 domain. Exact int32 energy
tracking. Chains ride the lane axis (BT = 128 per grid program).
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = (pltpu.InterpretParams()
              if int(os.environ.get("RRRMC_PALLAS_INTERPRET", "0"))
              else False)


def _sk_kernel(seed_ref, ns_ref, betas_ref, sigma_ref, lf_ref, J_ref,
               sigma_out, lf_out, dE_out, *, N, W, BT):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    n_sweeps = ns_ref[0]
    beta_s = betas_ref[0]          # beta * physical scale (f32)
    n_win = N // W

    def one_window(w, carry):
        sig, lf, dE_acc = carry    # sig/lf: [N, BT] i32; dE_acc [1, BT]
        base = pl.multiple_of(w * W, W)
        Jw = J_ref[pl.ds(base, W), pl.ds(base, W)].astype(jnp.int32)  # [W, W]
        # sig/lf are loop-carried VALUES (pl.ds only indexes refs)
        lf_w = jax.lax.dynamic_slice(lf, (base, 0), (W, BT))          # [W, BT]
        sig_w = jax.lax.dynamic_slice(sig, (base, 0), (W, BT))
        rbits = pltpu.bitcast(pltpu.prng_random_bits((W, BT)), jnp.int32)

        new_rows = []
        delta_rows = []
        dE_w = jnp.zeros((1, BT), jnp.int32)
        for k in range(W):         # fully unrolled: static row indices
            s_k = sig_w[k:k + 1, :]                       # [1, BT]
            dE = 2 * s_k * lf_w[k:k + 1, :]               # int32
            p = jnp.exp(-beta_s * dE.astype(jnp.float32))
            th = jnp.clip(
                p * jnp.float32(4294967296.0) - jnp.float32(2147483648.0),
                jnp.float32(-2147483648.0),
                jnp.float32(2147483520.0)).astype(jnp.int32)
            acc = (dE <= 0) | (rbits[k:k + 1, :] < th)
            d_k = jnp.where(acc, -2 * s_k, 0)             # [1, BT]
            new_rows.append(jnp.where(acc, -s_k, s_k))
            delta_rows.append(d_k)
            lf_w = lf_w + Jw[:, k:k + 1] * d_k            # [W, BT]
            dE_w = dE_w + jnp.where(acc, dE, 0)

        sig = jax.lax.dynamic_update_slice(
            sig, jnp.concatenate(new_rows, axis=0), (base, 0))
        delta = jnp.concatenate(delta_rows, axis=0)       # [W, BT] i32
        # rank-W local-field update on the MXU
        upd = jax.lax.dot_general(
            J_ref[pl.ds(base, W), :].astype(jnp.int8),
            delta.astype(jnp.int8),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)             # [N, BT]
        return sig, lf + upd, dE_acc + dE_w

    def one_sweep(_, carry):
        return jax.lax.fori_loop(0, n_win, one_window, carry)

    sig0 = sigma_ref[:].astype(jnp.int32)
    lf0 = lf_ref[:]
    dE0 = jnp.zeros((1, BT), jnp.int32)
    sig, lf, dE = jax.lax.fori_loop(0, n_sweeps, one_sweep, (sig0, lf0, dE0))
    sigma_out[:] = sig.astype(jnp.int8)
    lf_out[:] = lf
    dE_out[:] = dE


@partial(jax.jit, static_argnames=("W", "block_chains"))
def _pallas_sk(sigma, lfT, E, J8, seed, n_sweeps, beta_s, *, W, block_chains):
    sigmaT = sigma.T
    N, B = sigmaT.shape
    BT = block_chains
    grid = (B // BT,)
    kernel = partial(_sk_kernel, N=N, W=W, BT=BT)
    sig_out, lf_out, dE = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # seed
            pl.BlockSpec(memory_space=pltpu.SMEM),   # n_sweeps
            pl.BlockSpec(memory_space=pltpu.SMEM),   # beta_s
            pl.BlockSpec((N, BT), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, BT), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # J [N, N] int8
        ],
        out_specs=[
            pl.BlockSpec((N, BT), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, BT), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BT), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, B), jnp.int8),
            jax.ShapeDtypeStruct((N, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_INTERPRET,
    )(seed, n_sweeps, beta_s, sigmaT, lfT, J8)
    return sig_out.T, lf_out, E + dE[0]


class PallasSKSweeper:
    """Reusable dense-sweep runner; holds J on device, tracks lf across
    calls."""

    def __init__(self, model, beta: float, *, window: int = 128,
                 block_chains: int = 128):
        from ..models.dense import FullyConnected

        assert isinstance(model, FullyConnected)
        assert jnp.issubdtype(model.J.dtype, jnp.integer), \
            "pallas SK sweep requires integer couplings"
        assert int(jnp.max(jnp.abs(model.J))) <= 127
        assert int(jnp.max(jnp.abs(model.h))) == 0, \
            "external fields not supported yet"
        assert model.N % window == 0, (model.N, window)
        self.model = model
        self.J8 = model.J.astype(jnp.int8)
        self.beta_s = jnp.asarray([beta * model.scale], jnp.float32)
        self.W = window
        self.block_chains = block_chains

    def __call__(self, sigma, E, *, seed: int, n_sweeps: int, lfT=None):
        """sigma [B, N] int8, E [B] int32. Returns (sigma', E', lfT') — pass
        lfT back in for warm continuation (else recomputed)."""
        B, N = sigma.shape
        assert B % self.block_chains == 0
        if lfT is None:
            lfT = jax.jit(lambda s: jax.vmap(self.model.local_fields)(s)
                          .T.astype(jnp.int32))(sigma)
        return _pallas_sk(sigma, lfT, E, self.J8,
                          jnp.asarray([seed], jnp.int32),
                          jnp.asarray([n_sweeps], jnp.int32), self.beta_s,
                          W=self.W, block_chains=self.block_chains)
