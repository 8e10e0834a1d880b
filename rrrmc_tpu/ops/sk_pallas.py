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
tracking. Chains ride the lane axis; BT chains per grid program (auto up to
512 — wider blocks amortize the per-move [1, BT] vector ops; measured
1.05e10 attempted flips/s at N=1024, B=8192, W=128, BT=512 on one v5e chip
vs ~1.5e7 for the generic single-site path).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .prng import interpret_params, random_bits

_INTERPRET = interpret_params()


def _sk_kernel(seed_ref, ns_ref, betas_ref, sigma_ref, lf_ref, J_ref,
               sigma_out, lf_out, dE_out, sig_s, lf_s, dE_s, *, N, W, BT):
    """sig_s/lf_s/dE_s are VMEM scratch refs: Mosaic has no dynamic_slice on
    loop-carried VALUES, so the sweep state lives in mutable scratch and
    windows address it with ref-indexing (pl.ds)."""
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    salt0 = (seed_ref[0] + pl.program_id(0)) * jnp.int32(1000003)
    n_sweeps = ns_ref[0]
    beta_s = betas_ref[0]          # beta * physical scale (f32)
    n_win = N // W

    sig_s[:] = sigma_ref[:].astype(jnp.int32)
    lf_s[:] = lf_ref[:]
    dE_s[:] = jnp.zeros((1, BT), jnp.int32)

    def one_window(sw, w, _):
        base = pl.multiple_of(w * W, W)
        Jw = J_ref[pl.ds(base, W), pl.ds(base, W)].astype(jnp.int32)  # [W, W]
        lf_w = lf_s[pl.ds(base, W), :]                                # [W, BT]
        sig_w = sig_s[pl.ds(base, W), :]
        rbits = random_bits((W, BT), salt0 + sw * n_win + w)

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

        sig_s[pl.ds(base, W), :] = jnp.concatenate(new_rows, axis=0)
        delta = jnp.concatenate(delta_rows, axis=0)       # [W, BT] i32
        # rank-W local-field update on the MXU
        upd = jax.lax.dot_general(
            J_ref[pl.ds(base, W), :].astype(jnp.int8),
            delta.astype(jnp.int8),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)             # [N, BT]
        lf_s[:] = lf_s[:] + upd
        dE_s[:] = dE_s[:] + dE_w
        return 0

    def one_sweep(sw, carry):
        return jax.lax.fori_loop(0, n_win, partial(one_window, sw), carry)

    jax.lax.fori_loop(0, n_sweeps, one_sweep, 0)
    sigma_out[:] = sig_s[:].astype(jnp.int8)
    lf_out[:] = lf_s[:]
    dE_out[:] = dE_s[:]


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
        scratch_shapes=[
            pltpu.VMEM((N, BT), jnp.int32),   # sig_s
            pltpu.VMEM((N, BT), jnp.int32),   # lf_s
            pltpu.VMEM((1, BT), jnp.int32),   # dE_s
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_INTERPRET,
    )(seed, n_sweeps, beta_s, sigmaT, lfT, J8)
    return sig_out.T, E + dE[0], lf_out


class PallasSKSweeper:
    """Reusable dense-sweep runner; holds J on device, tracks lf across
    calls."""

    def __init__(self, model, beta: float, *, window: int = 128,
                 block_chains: int = 0):
        from ..models.dense import FullyConnected

        assert isinstance(model, FullyConnected)
        assert jnp.issubdtype(model.J.dtype, jnp.integer), \
            "pallas SK sweep requires integer couplings"
        assert int(jnp.max(jnp.abs(model.J))) <= 127
        assert int(jnp.max(jnp.abs(model.h))) == 0, \
            "external fields not supported yet"
        from .prng import interpret_mode
        assert window % 128 == 0 or interpret_mode(), \
            "window must be a multiple of 128 (lane-axis slice granularity)"
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
        bt = self.block_chains
        if not bt:  # auto: widest lane block <= 512 that tiles B (measured
            # peak at BT=512 on v5e; per-row ops widen with BT)
            bt = next((c for c in (512, 384, 256, 128) if B % c == 0), 0)
            assert bt, f"chain count {B} must be a multiple of 128"
        assert B % bt == 0
        if lfT is None:
            lfT = jax.jit(lambda s: jax.vmap(self.model.local_fields)(s)
                          .T.astype(jnp.int32))(sigma)
        return _pallas_sk(sigma, lfT, E, self.J8,
                          jnp.asarray([seed], jnp.int32),
                          jnp.asarray([n_sweeps], jnp.int32), self.beta_s,
                          W=self.W, block_chains=bt)
