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

from .prng import interpret_params, program_seed, random_bits

_INTERPRET = interpret_params()


def _window_moves(Jw, sig_w, lf_w, rbits, beta_s, *, W):
    """W fully unrolled sequential Metropolis decisions inside one window.
    Returns (new sig rows [W, BT], flip deltas [W, BT], accepted-dE [1, BT]).
    Exact: decision k sees the in-window correction from flips 0..k-1."""
    new_rows = []
    delta_rows = []
    dE_w = jnp.zeros((1, rbits.shape[1]), jnp.int32)
    for k in range(W):             # fully unrolled: static row indices
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
    return (jnp.concatenate(new_rows, axis=0),
            jnp.concatenate(delta_rows, axis=0), dE_w)


def _rank_w_update(Jrow, delta):
    """lf += Jrow^T @ delta on the MXU, in bf16 (EXACT here: products are
    int8 x {0,+-2} <= 508, f32 accumulation of integer partials < 2^24; v5e
    executes int8 dots at f32 rate but bf16 at 4x)."""
    return jax.lax.dot_general(
        Jrow.astype(jnp.bfloat16), delta.astype(jnp.bfloat16),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.int32)


def _sk_kernel(seed_ref, ns_ref, betas_ref, sigma_ref, lf_ref, J_ref,
               sigma_out, lf_out, dE_out, sig_s, lf_s, dE_s, *, N, W, BT):
    """VMEM-resident variant: the whole [N, N] J lives in VMEM. sig_s/lf_s/
    dE_s are VMEM scratch refs: Mosaic has no dynamic_slice on loop-carried
    VALUES, so the sweep state lives in mutable scratch and windows address
    it with ref-indexing (pl.ds)."""
    seed_p = program_seed(seed_ref[0], pl.program_id(0))
    pltpu.prng_seed(seed_p)
    salt0 = seed_p * jnp.int32(1000003)
    n_sweeps = ns_ref[0]
    beta_s = betas_ref[0]          # beta * physical scale (f32)
    n_win = N // W

    sig_s[:] = sigma_ref[:].astype(jnp.int32)
    lf_s[:] = lf_ref[:]
    dE_s[:] = jnp.zeros((1, BT), jnp.int32)

    def one_window(sw, w, _):
        base = pl.multiple_of(w * W, W)
        Jw = J_ref[pl.ds(base, W), pl.ds(base, W)].astype(jnp.int32)  # [W, W]
        rbits = random_bits((W, BT), salt0 + sw * n_win + w)
        new_rows, delta, dE_w = _window_moves(
            Jw, sig_s[pl.ds(base, W), :], lf_s[pl.ds(base, W), :],
            rbits, beta_s, W=W)
        sig_s[pl.ds(base, W), :] = new_rows
        lf_s[:] = lf_s[:] + _rank_w_update(J_ref[pl.ds(base, W), :], delta)
        dE_s[:] = dE_s[:] + dE_w
        return 0

    def one_sweep(sw, carry):
        return jax.lax.fori_loop(0, n_win, partial(one_window, sw), carry)

    jax.lax.fori_loop(0, n_sweeps, one_sweep, 0)
    sigma_out[:] = sig_s[:].astype(jnp.int8)
    lf_out[:] = lf_s[:]
    dE_out[:] = dE_s[:]


def _sk_kernel_hbm(seed_ref, ns_ref, betas_ref, sigma_ref, lf_ref, J_hbm,
                   sigma_out, lf_out, dE_out, sig_s, lf_s, dE_s, jbuf, sem,
                   *, N, W, BT):
    """HBM-streamed variant for large N (J does not fit VMEM): the [W, N]
    coupling row block of each window is DMA'd into a double-buffered VMEM
    scratch while the previous window computes. Same move semantics as the
    VMEM kernel (one shared window body)."""
    seed_p = program_seed(seed_ref[0], pl.program_id(0))
    pltpu.prng_seed(seed_p)
    salt0 = seed_p * jnp.int32(1000003)
    n_sweeps = ns_ref[0]
    beta_s = betas_ref[0]
    n_win = N // W
    total = n_sweeps * n_win

    sig_s[:] = sigma_ref[:].astype(jnp.int32)
    lf_s[:] = lf_ref[:]
    dE_s[:] = jnp.zeros((1, BT), jnp.int32)

    def j_dma(slot, w):
        return pltpu.make_async_copy(
            J_hbm.at[pl.ds(w * W, W), :], jbuf.at[slot], sem.at[slot])

    j_dma(0, 0).start()

    def step(g, _):
        w = g % n_win
        slot = g % 2

        @pl.when(g + 1 < total)
        def _():
            j_dma((g + 1) % 2, (g + 1) % n_win).start()

        j_dma(slot, w).wait()
        base = pl.multiple_of(w * W, W)
        Jrow = jbuf[slot]                                 # [W, N] int8
        Jw = jbuf[slot, :, pl.ds(base, W)].astype(jnp.int32)   # [W, W]
        rbits = random_bits((W, BT), salt0 + g)
        new_rows, delta, dE_w = _window_moves(
            Jw, sig_s[pl.ds(base, W), :], lf_s[pl.ds(base, W), :],
            rbits, beta_s, W=W)
        sig_s[pl.ds(base, W), :] = new_rows
        lf_s[:] = lf_s[:] + _rank_w_update(Jrow, delta)
        dE_s[:] = dE_s[:] + dE_w
        return 0

    jax.lax.fori_loop(0, total, step, 0)
    sigma_out[:] = sig_s[:].astype(jnp.int8)
    lf_out[:] = lf_s[:]
    dE_out[:] = dE_s[:]


@partial(jax.jit, static_argnames=("W", "block_chains", "stream_j"))
def _pallas_sk(sigma, lfT, E, J8, seed, n_sweeps, beta_s, *, W, block_chains,
               stream_j=False):
    sigmaT = sigma.T
    N, B = sigmaT.shape
    BT = block_chains
    grid = (B // BT,)
    scratch = [
        pltpu.VMEM((N, BT), jnp.int32),   # sig_s
        pltpu.VMEM((N, BT), jnp.int32),   # lf_s
        pltpu.VMEM((1, BT), jnp.int32),   # dE_s
    ]
    if stream_j:
        kernel = partial(_sk_kernel_hbm, N=N, W=W, BT=BT)
        j_space = pl.ANY                   # stays in HBM; windows DMA'd
        scratch += [pltpu.VMEM((2, W, N), jnp.int8),   # jbuf (double buffer)
                    pltpu.SemaphoreType.DMA((2,))]
    else:
        kernel = partial(_sk_kernel, N=N, W=W, BT=BT)
        j_space = pltpu.VMEM
    sig_out, lf_out, dE = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # seed
            pl.BlockSpec(memory_space=pltpu.SMEM),   # n_sweeps
            pl.BlockSpec(memory_space=pltpu.SMEM),   # beta_s
            pl.BlockSpec((N, BT), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, BT), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=j_space),      # J [N, N] int8
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
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_INTERPRET,
    )(seed, n_sweeps, beta_s, sigmaT, lfT, J8)
    return sig_out.T, E + dE[0], lf_out


class PallasSKSweeper:
    """Reusable dense-sweep runner; holds J on device, tracks lf across
    calls."""

    #: J byte size above which the HBM-streamed kernel is used (the VMEM
    #: variant needs the whole [N, N] int8 J resident; ~24 MB leaves room
    #: for state at wide chain blocks on a 128 MB-VMEM v5e)
    STREAM_THRESHOLD = 24 * 1024 * 1024

    def __init__(self, model, beta: float, *, window: int = 128,
                 block_chains: int = 0, stream_j=None):
        from ..models.dense import FullyConnected

        assert isinstance(model, FullyConnected)
        assert jnp.issubdtype(model.J.dtype, jnp.integer), \
            "pallas SK sweep requires integer couplings"
        assert int(jnp.max(jnp.abs(model.J))) <= 127
        # external fields need NO kernel support: init_lfT seeds lf from
        # model.local_fields (which includes +h), h is invariant under
        # flips so the rank-W J corrections keep lf exact, and the decision
        # dE = 2*s*lf is therefore field-inclusive (AddFields composition,
        # /root/reference/src/graphs/AddFields.jl:16-123). Integer-domain
        # only: E and lf are tracked in int32.
        assert jnp.issubdtype(model.h.dtype, jnp.integer), \
            "integer-domain fields only"
        from .prng import interpret_mode
        assert window % 128 == 0 or interpret_mode(), \
            "window must be a multiple of 128 (lane-axis slice granularity)"
        self.model = model
        self.N = model.N
        # pad to a window multiple with zero-coupled free spins: they flip
        # unconditionally (dE = 0) but contribute nothing to any energy, so
        # the chain law on the real N spins is unchanged
        self.Np = -(-model.N // window) * window
        J8 = model.J.astype(jnp.int8)
        if self.Np != model.N:
            pad = self.Np - model.N
            J8 = jnp.pad(J8, ((0, pad), (0, pad)))
        self.J8 = J8
        self.beta_s = jnp.asarray([beta * model.scale], jnp.float32)
        self.W = window
        self.block_chains = block_chains
        self.stream_j = (self.Np * self.Np > self.STREAM_THRESHOLD
                         if stream_j is None else bool(stream_j))

    def __call__(self, sigma, E, *, seed: int, n_sweeps: int, lfT=None):
        """sigma [B, N] int8, E [B] int32. Returns (sigma', E', lfT') — pass
        lfT back in for warm continuation (else recomputed). lfT is in the
        PADDED [Np, B] layout when N is not a multiple of the window."""
        B, N = sigma.shape
        assert N == self.N, (N, self.N)
        bt = self.block_chains
        if not bt:
            # footprint ~28 B/chain/site: sig in/out 2x1B + lf in/out 2x4B
            # (pipeline double-buffers windows) + sig_s/lf_s scratch; J
            # buffers come off the top of the budget
            from .tiling import VMEM_BUDGET, auto_block_chains
            bt = auto_block_chains(B, 28 * self.Np,
                                   budget=VMEM_BUDGET - 2 * self.W * self.Np)
        assert B % bt == 0
        if lfT is None:
            from ..samplers.common import init_lfT
            lfT = init_lfT(self.model, sigma)
        if self.Np != N:
            pad = self.Np - N
            sigma = jnp.pad(sigma, ((0, 0), (0, pad)), constant_values=1)
            if lfT.shape[0] == N:
                lfT = jnp.pad(lfT, ((0, pad), (0, 0)))
        sig, E, lfT = _pallas_sk(sigma, lfT, E, self.J8,
                                 jnp.asarray([seed], jnp.int32),
                                 jnp.asarray([n_sweeps], jnp.int32),
                                 self.beta_s,
                                 W=self.W, block_chains=bt,
                                 stream_j=self.stream_j)
        if self.Np != N:
            sig = sig[:, :N]
        return sig, E, lfT
