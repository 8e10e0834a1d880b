"""Pallas TPU kernel for tau-extremal optimization (extremal_opt).

Reference semantics (/root/reference/src/RRRMC.jl:474-521 + the EOCache rank
buckets /root/reference/src/DeltaE.jl:424-635): each move ranks all spins by
dE ascending, draws a rank k with P(k) ~ k^{-tau} (ties broken uniformly),
flips that spin unconditionally and tracks the best configuration seen.

TPU formulation — every stage is a fused [N, BT] vector pass over the
chain block (chains on lanes, sites on sublanes), no sort and no gather:

* rank draw: u ~ U[0,1) per chain; k = #(cdf < u) where cdf is the static
  cumulative k^{-tau} table resident in VMEM (one compare+sum pass);
* order statistic: the rank-k value v of the integer half-table
  (half_i = sigma_i * lf_i, dE_i = 2*half_i) via branchless per-lane binary
  search on the VALUE domain — t_bits passes of count(half <= mid), where
  t_bits = ceil(log2(value range)) is static (|half| <= max row coupling
  mass, known host-side). No per-lane row addressing needed, which is what
  rules out the reference's bucket walk on Mosaic (tpu.dynamic_gather does
  not lower on v5e);
* tie break: uniform race over the members of the class {half == v}
  (iid int32 scores, min-reduce + first-match one-hot — exactly uniform);
* flip: one-hot masked negate; Emin/sigma_min/itmin update under an
  E < Emin mask.

Unlike BKL/WTM the chains advance in LOCKSTEP (one move per iteration), so
there are no divergent coordinates and no checkpoint streams; the move count
is a dynamic SMEM scalar, one compile serves any `iters`.

Model families (same split as ops/rejfree_pallas.py):
* integer LatticeEA (external fields supported: h rides as the last column
  of the direction table, added into the roll-identity lf — matches
  /root/reference/src/graphs/AddFields.jl:16-123 composed onto EA) — lf
  from the lattice roll identity;
* integer FullyConnected (|J| <= 127, N <= 4096) — lf from one
  [NP, NP] x [NP, BT] bf16 MXU matmul per move; padding rows are excluded
  from the rank count, the class, and the race;
* float FullyConnected (N <= 2048, J f32 VMEM-resident) — the continuous
  analog of the reference's EOCacheCont
  (/root/reference/src/DeltaE.jl:556-635): lf from an f32 MXU matmul, and
  the binary-search order statistic runs on a MONOTONE int32 sort key of
  the f32 half values (bitcast b, then b ^ ((b >> 31) & 0x7fffffff) — the
  classic IEEE-754 total-order trick), so the same integer-domain search
  serves both dtypes (32 halvings cover the full key range). Ties are
  bitwise-equal values — a measure-zero event for continuous couplings
  (except the benign +-0.0 split).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .prng import interpret_params, program_seed, random_bits
from .sweep_pallas import _build_dir_tables

_INTERPRET = interpret_params()

_I32_MAX = np.int32(2 ** 31 - 1)


def _eo_kernel(seed_ref, n_ref, cdf_ref, jp_ref, jm_ref,
               sigma_ref, E_ref, emin_ref, smin_ref, itmin_ref,
               sigma_out, E_out, emin_out, smin_out, itmin_out,
               *, L, D, BT, t_bits, dense, n_phys, flt=False):
    """EO chunk: n_ref[0] (dynamic) moves on a [NP, BT] chain block.

    dense=False: jp_ref/jm_ref are the lattice direction tables; jp_ref is
    [N, D+1] with the external-field column h in column D.
    dense=True: jp_ref is Jb [NP, NP] bf16, jm_ref is h [NP, 1] int32;
    n_phys < NP rows are frozen padding."""
    seed_p = program_seed(seed_ref[0], pl.program_id(0))
    pltpu.prng_seed(seed_p)
    salt0 = seed_p * jnp.int32(1000003)
    n_moves = n_ref[0]

    if dense:
        NP = smin_ref.shape[0]
        N = n_phys

        mm_dt = jnp.float32 if flt else jnp.bfloat16

        def lf_fn(sig):
            lf = jax.lax.dot_general(
                jp_ref[:], sig.astype(mm_dt),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            if not flt:
                lf = lf.astype(jnp.int32)
            return lf + jm_ref[:]
    else:
        N = L ** D
        NP = N
        idx = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)
        strides = [L ** (D - 1 - d) for d in range(D)]
        coords_ = [(idx // s) % L for s in strides]
        wrap_hi = [c == (L - 1) for c in coords_]
        wrap_lo = [c == 0 for c in coords_]

        def roll_up(x, k):
            return pltpu.roll(x, N - k, axis=0)

        def lf_fn(sig):
            lf = jnp.zeros((N, BT), jnp.int32) + jp_ref[:, D][:, None]
            for d, s in enumerate(strides):
                nb_p = jnp.where(wrap_hi[d],
                                 roll_up(sig, N - s * (L - 1)),
                                 roll_up(sig, s))
                nb_m = jnp.where(wrap_lo[d],
                                 roll_up(sig, s * (L - 1)),
                                 roll_up(sig, N - s))
                lf = lf + jp_ref[:, d][:, None] * nb_p \
                        + jm_ref[:, d][:, None] * nb_m
            return lf

    iota_nb = jax.lax.broadcasted_iota(jnp.int32, (NP, BT), 0)
    valid = iota_nb < N
    imax = jnp.int32(_I32_MAX)
    inv32 = jnp.float32(2.0 ** -32)
    half_f = jnp.float32(0.5)

    def move(m, carry):
        sig, E, emin, smin, itmin = carry
        if flt:
            half = sig.astype(jnp.float32) * lf_fn(sig)   # dE = 2*half, f32
            # monotone int32 sort key of an f32: bitcast, then flip the low
            # 31 bits of negatives (IEEE-754 total order; -0.0 -> -1 < +0.0)
            b = jax.lax.bitcast_convert_type(half, jnp.int32)
            hkey = b ^ ((b >> 31) & jnp.int32(0x7FFFFFFF))
        else:
            half = sig * lf_fn(sig)                   # dE_int = 2*half
            hkey = half
        # rank draw: k = #(cdf < u) (padding cdf rows are 2.0, never < u)
        ub = random_bits((1, BT), salt0 + 2 * m)
        u = ub.astype(jnp.float32) * inv32 + half_f
        rank = jnp.sum((cdf_ref[:] < u).astype(jnp.int32), axis=0,
                       keepdims=True)                 # [1, BT] in [0, N-1]
        # rank-k order statistic by branchless binary search on the key
        # domain: smallest v with count(hkey <= v) >= rank + 1
        hvalid = jnp.where(valid, hkey, imax)
        lo = jnp.min(hvalid, axis=0, keepdims=True) - 1
        hi = jnp.max(jnp.where(valid, hkey, -imax), axis=0, keepdims=True)

        def bstep(_, lh):
            lo, hi = lh
            # overflow-safe floor((lo + hi) / 2): float keys span most of
            # the int32 range, so lo + hi can wrap
            mid = (lo >> 1) + (hi >> 1) + (lo & hi & 1)
            cnt = jnp.sum((hvalid <= mid).astype(jnp.int32),
                          axis=0, keepdims=True)
            ok = cnt >= rank + 1
            return jnp.where(ok, lo, mid + 1), jnp.where(ok, mid, hi)

        lo, hi = jax.lax.fori_loop(0, t_bits, bstep, (lo, hi))
        v = hi                                        # [1, BT] class key
        members = valid & (hkey == v)
        # uniform tie break: iid int32 race over the class members
        r = random_bits((NP, BT), salt0 + 2 * m + 1)
        score = jnp.where(members, jnp.minimum(r, imax - 1), imax)
        srow = jnp.min(score, axis=0, keepdims=True)
        sel = score == srow
        iwin = jnp.min(jnp.where(sel, iota_nb, NP), axis=0, keepdims=True)
        onehot = iota_nb == iwin
        acc_dt = jnp.float32 if flt else jnp.int32
        dE_i = jnp.sum(jnp.where(onehot, 2 * half,
                                 jnp.zeros((), acc_dt)),
                       axis=0, keepdims=True, dtype=acc_dt)
        sig = jnp.where(onehot, -sig, sig)            # unconditional flip
        E = E + dE_i
        better = E < emin                             # [1, BT]
        emin = jnp.where(better, E, emin)
        smin = jnp.where(better, sig, smin)
        itmin = jnp.where(better, m + 1, itmin)
        return sig, E, emin, smin, itmin

    sig0 = sigma_ref[:].astype(jnp.int32)
    sig, E, emin, smin, itmin = jax.lax.fori_loop(
        0, n_moves, move,
        (sig0, E_ref[:], emin_ref[:], smin_ref[:].astype(jnp.int32),
         itmin_ref[:]))
    sigma_out[:] = sig.astype(jnp.int8)
    E_out[:] = E
    emin_out[:] = emin
    smin_out[:] = smin.astype(jnp.int8)
    itmin_out[:] = itmin


@partial(jax.jit, static_argnames=("L", "D", "block_chains", "t_bits",
                                   "dense", "n_phys", "flt"))
def _pallas_eo_run(sigma, E, emin, smin, itmin, cdf, A, Bt, seed, n_moves, *,
                   L, D, block_chains, t_bits, dense, n_phys, flt=False):
    """sigma/smin [B, NP] int8, E/emin [B] int32 (flt: f32), itmin [B]
    int32 -> same, after n_moves (dynamic scalar) EO moves. A/Bt: (Jp, Jm)
    lattice tables or (Jb bf16/f32 [NP, NP], h [NP, 1]) dense tables."""
    sigmaT, sminT = sigma.T, smin.T
    NP, B = sigmaT.shape
    BT = block_chains
    grid = (B // BT,)
    et = jnp.float32 if flt else jnp.int32
    kernel = partial(_eo_kernel, L=L, D=D, BT=BT, t_bits=t_bits,
                     dense=dense, n_phys=n_phys, flt=flt)
    row = pl.BlockSpec((1, BT), lambda j: (0, j), memory_space=pltpu.VMEM)
    blk = pl.BlockSpec((NP, BT), lambda j: (0, j), memory_space=pltpu.VMEM)
    whole = pl.BlockSpec(memory_space=pltpu.VMEM)
    sig_out, E_out, emin_out, smin_out, itmin_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),      # seed
            pl.BlockSpec(memory_space=pltpu.SMEM),      # n_moves
            pl.BlockSpec((NP, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),      # cdf
            whole, whole,                               # tables
            blk, row, row, blk, row,
        ],
        out_specs=[blk, row, row, blk, row],
        out_shape=[
            jax.ShapeDtypeStruct((NP, B), jnp.int8),
            jax.ShapeDtypeStruct((1, B), et),
            jax.ShapeDtypeStruct((1, B), et),
            jax.ShapeDtypeStruct((NP, B), jnp.int8),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=_INTERPRET,
    )(seed, n_moves, cdf, A, Bt, sigmaT, E[None, :], emin[None, :], sminT,
      itmin[None, :])
    return (sig_out.T, E_out[0], emin_out[0], smin_out.T, itmin_out[0])


# ---------------------------------------------------------------------------
# HBM-streamed variant: FullyConnected models whose J cannot live in VMEM
# (integer N <= 32768 / float N <= 16384 — the continuous EOCacheCont regime
# /root/reference/src/DeltaE.jl:556-635 at sizes the dense kernel cannot
# hold). The order statistic needs the full half table RESIDENT (t_bits
# counting passes re-read it), but not J: per move, one streamed J pass
# rebuilds the [NP, BT] search-key table in a VMEM scratch (the
# rejfree_pallas double-buffered [W, NP] DMA window verbatim), then the rank
# draw, the value-domain binary search, and the tie race all run VMEM-local.
#
# Roofline honesty: EO advances ONE iteration per J pass (no rejection-free
# time compression), so the move rate is HBM-bound at ~BW / (NP^2 * jbytes)
# moves/s, amortized over the BT chains of the block — widen the block to
# amortize (auto_block_chains). For DENSIFIED SPARSE graphs the XLA path's
# O(deg) incremental local fields beat this streamed recompute; the kernel
# is for genuinely dense J beyond the VMEM caps.
# ---------------------------------------------------------------------------


def _eo_stream_kernel(seed_ref, n_ref, cdf_ref, h_ref,
                      sigma_ref, E_ref, emin_ref, smin_ref, itmin_ref,
                      J_hbm,
                      sigma_out, E_out, emin_out, smin_out, itmin_out,
                      sig_s, sigb_s, key_s, jbuf, sem,
                      *, N, NP, W, BT, t_bits, flt):
    """Streamed EO chunk: n_ref[0] (dynamic) moves on a [NP, BT] block.

    J_hbm [NP, NP] int8/f32 stays in HBM; jbuf is the [2, W, NP]
    double-buffered window; key_s holds the per-move search keys (integer
    half values, or the IEEE-754 monotone int32 sort keys of f32 halves);
    padding rows are stored as INT32_MAX so no later pass needs a mask."""
    seed_p = program_seed(seed_ref[0], pl.program_id(0))
    pltpu.prng_seed(seed_p)
    salt0 = seed_p * jnp.int32(1000003)
    n_moves = n_ref[0]
    n_blk = NP // W
    total = n_moves * n_blk
    mm_dt = jnp.float32 if flt else jnp.bfloat16
    acc_dt = jnp.float32 if flt else jnp.int32
    imax = jnp.int32(_I32_MAX)
    inv32 = jnp.float32(2.0 ** -32)
    half_f = jnp.float32(0.5)
    iota_nb = jax.lax.broadcasted_iota(jnp.int32, (NP, BT), 0)

    def j_dma(slot, blk):
        return pltpu.make_async_copy(
            J_hbm.at[pl.ds(blk * W, W), :], jbuf.at[slot], sem.at[slot])

    j_dma(0, 0).start()

    def key_pass(m):
        """One streamed J pass: rebuild key_s from the current spins."""
        sigb_s[:] = sig_s[:].astype(mm_dt)

        def blk(w, _):
            g = m * n_blk + w
            slot = g % 2

            @pl.when(g + 1 < total)
            def _():
                j_dma((g + 1) % 2, (g + 1) % n_blk).start()

            j_dma(slot, w).wait()
            base = pl.multiple_of(w * W, W)
            lfb = jax.lax.dot_general(
                jbuf[slot].astype(mm_dt), sigb_s[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            if not flt:
                lfb = lfb.astype(jnp.int32)
            lfb = lfb + h_ref[pl.ds(base, W), :]
            iota_b = jax.lax.broadcasted_iota(jnp.int32, (W, BT), 0) + base
            sig_b = sig_s[pl.ds(base, W), :]
            if flt:
                half_b = sig_b.astype(jnp.float32) * lfb
                b = jax.lax.bitcast_convert_type(half_b, jnp.int32)
                kb = b ^ ((b >> 31) & jnp.int32(0x7FFFFFFF))
            else:
                kb = sig_b * lfb
            key_s[pl.ds(base, W), :] = jnp.where(iota_b < N, kb, imax)
            return 0

        jax.lax.fori_loop(0, n_blk, blk, 0)

    def half_of(k):
        """Invert the sort-key map back to the half value (the key map is an
        involution for the float path; identity for integers)."""
        if flt:
            return jax.lax.bitcast_convert_type(
                k ^ ((k >> 31) & jnp.int32(0x7FFFFFFF)), jnp.float32)
        return k

    def move(m, carry):
        E, emin, itmin = carry
        key_pass(m)
        hkey = key_s[:]
        # rank draw: k = #(cdf < u) (padding cdf rows are 2.0, never < u)
        ub = random_bits((1, BT), salt0 + 2 * m)
        u = ub.astype(jnp.float32) * inv32 + half_f
        rank = jnp.sum((cdf_ref[:] < u).astype(jnp.int32), axis=0,
                       keepdims=True)
        # rank-k order statistic: smallest v with count(hkey <= v) >= rank+1
        # (padding rows hold INT32_MAX: never counted below a real key,
        # never the winner — rank <= N-1 always lands on a physical value)
        lo = jnp.min(hkey, axis=0, keepdims=True) - 1
        hi = jnp.max(jnp.where(hkey == imax, -imax, hkey),
                     axis=0, keepdims=True)

        def bstep(_, lh):
            lo, hi = lh
            mid = (lo >> 1) + (hi >> 1) + (lo & hi & 1)
            cnt = jnp.sum((hkey <= mid).astype(jnp.int32),
                          axis=0, keepdims=True)
            ok = cnt >= rank + 1
            return jnp.where(ok, lo, mid + 1), jnp.where(ok, mid, hi)

        lo, hi = jax.lax.fori_loop(0, t_bits, bstep, (lo, hi))
        v = hi
        members = hkey == v
        r = random_bits((NP, BT), salt0 + 2 * m + 1)
        score = jnp.where(members, jnp.minimum(r, imax - 1), imax)
        srow = jnp.min(score, axis=0, keepdims=True)
        iwin = jnp.min(jnp.where(score == srow, iota_nb, NP),
                       axis=0, keepdims=True)
        onehot = iota_nb == iwin
        dE_i = jnp.sum(jnp.where(onehot, 2 * half_of(hkey),
                                 jnp.zeros((), acc_dt)),
                       axis=0, keepdims=True, dtype=acc_dt)
        sig_s[:] = jnp.where(onehot, -sig_s[:], sig_s[:])
        E = E + dE_i
        better = E < emin
        emin = jnp.where(better, E, emin)
        smin_out[:] = jnp.where(better, sig_s[:].astype(jnp.int8),
                                smin_out[:])
        itmin = jnp.where(better, m + 1, itmin)
        return E, emin, itmin

    sig_s[:] = sigma_ref[:].astype(jnp.int32)
    smin_out[:] = smin_ref[:]
    E, emin, itmin = jax.lax.fori_loop(
        0, n_moves, move, (E_ref[:], emin_ref[:], itmin_ref[:]))
    sigma_out[:] = sig_s[:].astype(jnp.int8)
    E_out[:] = E
    emin_out[:] = emin
    itmin_out[:] = itmin


@partial(jax.jit, static_argnames=("block_chains", "t_bits", "n_phys",
                                   "window", "flt"))
def _pallas_eo_stream_run(sigma, E, emin, smin, itmin, cdf, hcol, Jhbm,
                          seed, n_moves, *, block_chains, t_bits, n_phys,
                          window, flt):
    """Streamed analog of _pallas_eo_run: sigma/smin [B, NP] int8, Jhbm
    [NP, NP] int8/f32 in HBM."""
    sigmaT, sminT = sigma.T, smin.T
    NP, B = sigmaT.shape
    BT = block_chains
    W = window
    grid = (B // BT,)
    et = jnp.float32 if flt else jnp.int32
    mm_dt = jnp.float32 if flt else jnp.bfloat16
    kernel = partial(_eo_stream_kernel, N=n_phys, NP=NP, W=W, BT=BT,
                     t_bits=t_bits, flt=flt)
    row = pl.BlockSpec((1, BT), lambda j: (0, j), memory_space=pltpu.VMEM)
    blk = pl.BlockSpec((NP, BT), lambda j: (0, j), memory_space=pltpu.VMEM)
    sig_out, E_out, emin_out, smin_out, itmin_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),      # seed
            pl.BlockSpec(memory_space=pltpu.SMEM),      # n_moves
            pl.BlockSpec((NP, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),      # cdf
            pl.BlockSpec((NP, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),      # h
            blk, row, row, blk, row,
            pl.BlockSpec(memory_space=pl.ANY),          # J stays in HBM
        ],
        out_specs=[blk, row, row, blk, row],
        out_shape=[
            jax.ShapeDtypeStruct((NP, B), jnp.int8),
            jax.ShapeDtypeStruct((1, B), et),
            jax.ShapeDtypeStruct((1, B), et),
            jax.ShapeDtypeStruct((NP, B), jnp.int8),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((NP, BT), jnp.int32),            # sig_s
            pltpu.VMEM((NP, BT), mm_dt),                # sigb_s (matmul rhs)
            pltpu.VMEM((NP, BT), jnp.int32),            # key_s
            pltpu.VMEM((2, W, NP), Jhbm.dtype),         # jbuf (double buffer)
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=_INTERPRET,
    )(seed, n_moves, cdf, hcol, sigmaT, E[None, :], emin[None, :], sminT,
      itmin[None, :], Jhbm)
    return (sig_out.T, E_out[0], emin_out[0], smin_out.T, itmin_out[0])


# ---------------------------------------------------------------------------
# Sparse variant: ANY padded-neighbor-table Pairwise model (GraphRRG — the
# reference's flagship tau-EO workload, /root/reference/src/RRRMC.jl:474-521
# — EA file graphs, Ising1D; integer or float couplings). Same resident-lf +
# inverse-neighbor-column O(deg) update machinery as the sparse
# rejection-free kernel (ops/rejfree_pallas.py): per move the half table
# sig*lf, the rank draw, the value-domain binary search, the tie race, the
# flip, and the K-pass lf update are ALL fused [NP, BT] VPU passes — no J
# matrix, no matmul, no gather, so the move cost is independent of N^2.
# ---------------------------------------------------------------------------


def _eo_sparse_kernel(seed_ref, n_ref, cdf_ref, nbr_ref, jc_ref,
                      sigma_ref, lf_ref, E_ref, emin_ref, smin_ref,
                      itmin_ref,
                      sigma_out, E_out, emin_out, smin_out,
                      itmin_out, *, N, NP, K, BT, t_bits, flt):
    """Sparse EO chunk: n_ref[0] (dynamic) moves on a [NP, BT] block with a
    RESIDENT local-field table. nbr_ref/jc_ref [NP, K] inverse-neighbor
    column tables (sentinel entries == N never match a winner row < N);
    rows >= N are frozen padding excluded from the rank count, the class,
    and the race."""
    seed_p = program_seed(seed_ref[0], pl.program_id(0))
    pltpu.prng_seed(seed_p)
    salt0 = seed_p * jnp.int32(1000003)
    n_moves = n_ref[0]
    iota_nb = jax.lax.broadcasted_iota(jnp.int32, (NP, BT), 0)
    valid = iota_nb < N
    lt = jnp.float32 if flt else jnp.int32
    imax = jnp.int32(_I32_MAX)
    inv32 = jnp.float32(2.0 ** -32)
    half_f = jnp.float32(0.5)

    # per-use column loads (hoisted [NP, 1] slices spill lane-padded
    # tiles across the move loop — see ops/rejfree_pallas.py)
    def nbr_col(k):
        return nbr_ref[:, k][:, None]

    def jc_col(k):
        return jc_ref[:, k][:, None]

    def move(m, carry):
        sig, lf, E, emin, smin, itmin = carry
        if flt:
            half = sig.astype(lt) * lf
            b = jax.lax.bitcast_convert_type(half, jnp.int32)
            hkey = b ^ ((b >> 31) & jnp.int32(0x7FFFFFFF))
        else:
            half = sig * lf
            hkey = half
        hvalid = jnp.where(valid, hkey, imax)
        # rank draw: k = #(cdf < u) (padding cdf rows are 2.0, never < u)
        ub = random_bits((1, BT), salt0 + 2 * m)
        u = ub.astype(jnp.float32) * inv32 + half_f
        rank = jnp.sum((cdf_ref[:] < u).astype(jnp.int32), axis=0,
                       keepdims=True)
        lo = jnp.min(hvalid, axis=0, keepdims=True) - 1
        hi = jnp.max(jnp.where(valid, hkey, -imax), axis=0, keepdims=True)

        def bstep(_, lh):
            lo, hi = lh
            mid = (lo >> 1) + (hi >> 1) + (lo & hi & 1)
            cnt = jnp.sum((hvalid <= mid).astype(jnp.int32),
                          axis=0, keepdims=True)
            ok = cnt >= rank + 1
            return jnp.where(ok, lo, mid + 1), jnp.where(ok, mid, hi)

        lo, hi = jax.lax.fori_loop(0, t_bits, bstep, (lo, hi))
        v = hi
        members = hvalid == v
        r = random_bits((NP, BT), salt0 + 2 * m + 1)
        score = jnp.where(members, jnp.minimum(r, imax - 1), imax)
        srow = jnp.min(score, axis=0, keepdims=True)
        iwin = jnp.min(jnp.where(score == srow, iota_nb, NP),
                       axis=0, keepdims=True)
        onehot = iota_nb == iwin
        dE_i = jnp.sum(jnp.where(onehot, 2 * half, jnp.zeros((), lt)),
                       axis=0, keepdims=True, dtype=lt)
        # winner's spin -> O(deg) lf update via the inverse columns (the
        # exact scatter of models/pairwise.py:77-85 as broadcast compares)
        d_row = jnp.sum(jnp.where(onehot, -2 * sig, 0), axis=0,
                        keepdims=True).astype(lt)
        for k in range(K):
            lf = lf + jc_col(k) * jnp.where(
                nbr_col(k) == iwin, d_row, jnp.zeros((), lt))
        sig = jnp.where(onehot, -sig, sig)            # unconditional flip
        E = E + dE_i
        better = E < emin
        emin = jnp.where(better, E, emin)
        smin = jnp.where(better, sig, smin)
        itmin = jnp.where(better, m + 1, itmin)
        return sig, lf, E, emin, smin, itmin

    sig0 = sigma_ref[:].astype(jnp.int32)
    sig, lf, E, emin, smin, itmin = jax.lax.fori_loop(
        0, n_moves, move,
        (sig0, lf_ref[:], E_ref[:], emin_ref[:],
         smin_ref[:].astype(jnp.int32), itmin_ref[:]))
    sigma_out[:] = sig.astype(jnp.int8)
    E_out[:] = E
    emin_out[:] = emin
    smin_out[:] = smin.astype(jnp.int8)
    itmin_out[:] = itmin


@partial(jax.jit, static_argnames=("block_chains", "t_bits", "n_phys",
                                   "flt"))
def _pallas_eo_sparse_run(sigma, lfT, E, emin, smin, itmin, cdf, nbr, jc,
                          seed, n_moves, *, block_chains, t_bits, n_phys,
                          flt):
    """Sparse analog of _pallas_eo_run: sigma/smin [B, NP] int8, lfT [NP, B]
    int32/f32 (site-major local fields, pad rows 0), nbr/jc [NP, K]."""
    sigmaT, sminT = sigma.T, smin.T
    NP, B = sigmaT.shape
    K = nbr.shape[1]
    BT = block_chains
    grid = (B // BT,)
    et = jnp.float32 if flt else jnp.int32
    kernel = partial(_eo_sparse_kernel, N=n_phys, NP=NP, K=K, BT=BT,
                     t_bits=t_bits, flt=flt)
    row = pl.BlockSpec((1, BT), lambda j: (0, j), memory_space=pltpu.VMEM)
    blk = pl.BlockSpec((NP, BT), lambda j: (0, j), memory_space=pltpu.VMEM)
    (sig_out, E_out, emin_out, smin_out,
     itmin_out) = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),      # seed
            pl.BlockSpec(memory_space=pltpu.SMEM),      # n_moves
            pl.BlockSpec((NP, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),      # cdf
            pl.BlockSpec((NP, K), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),      # nbr
            pl.BlockSpec((NP, K), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),      # jc
            blk, blk, row, row, blk, row,
        ],
        out_specs=[blk, row, row, blk, row],
        out_shape=[
            jax.ShapeDtypeStruct((NP, B), jnp.int8),
            jax.ShapeDtypeStruct((1, B), et),
            jax.ShapeDtypeStruct((1, B), et),
            jax.ShapeDtypeStruct((NP, B), jnp.int8),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=_INTERPRET,
    )(seed, n_moves, cdf, nbr, jc, sigmaT, lfT, E[None, :], emin[None, :],
      sminT, itmin[None, :])
    return (sig_out.T, E_out[0], emin_out[0], smin_out.T,
            itmin_out[0])


# ---------------------------------------------------------------------------
# 3-spin variant: PSpin3 hypergraphs via the resident cavity + product
# tables of the rejection-free pspin kernel (rejfree_pallas): half =
# sigma * c with c_j = sum_k q_k[j]; the rank-select machinery is identical
# to the sparse variant and the post-flip update negates exactly the
# products containing the winner (broadcast compares, no gathers).
# ---------------------------------------------------------------------------


def _eo_pspin_kernel(*refs, N, NP, K, BT, t_bits):
    """Sparse-EO analog for PSpin3. refs: seed, n_moves (SMEM), cdf, p1, p2
    [NP, K], sigma, c [NP, BT], K product tables q_k (INPUT-only: an EO
    run never resumes from them), E/emin rows, smin blk, itmin row; then
    the outputs (sigma, E, emin, smin, itmin)."""
    seed_ref, n_ref, cdf_ref, p1_ref, p2_ref, sigma_ref, c_ref = refs[:7]
    q_refs = refs[7:7 + K]
    E_ref, emin_ref, smin_ref, itmin_ref = refs[7 + K:11 + K]
    outs = refs[11 + K:]
    sigma_out = outs[0]
    E_out, emin_out, smin_out, itmin_out = outs[1:]
    seed_p = program_seed(seed_ref[0], pl.program_id(0))
    pltpu.prng_seed(seed_p)
    salt0 = seed_p * jnp.int32(1000003)
    n_moves = n_ref[0]
    iota_nb = jax.lax.broadcasted_iota(jnp.int32, (NP, BT), 0)
    valid = iota_nb < N
    imax = jnp.int32(_I32_MAX)
    inv32 = jnp.float32(2.0 ** -32)
    half_f = jnp.float32(0.5)

    def p1_col(k):
        return p1_ref[:, k][:, None]

    def p2_col(k):
        return p2_ref[:, k][:, None]

    def move(m, carry):
        sig, c, qs, E, emin, smin, itmin = carry
        half = sig * c
        hvalid = jnp.where(valid, half, imax)
        ub = random_bits((1, BT), salt0 + 2 * m)
        u = ub.astype(jnp.float32) * inv32 + half_f
        rank = jnp.sum((cdf_ref[:] < u).astype(jnp.int32), axis=0,
                       keepdims=True)
        lo = jnp.min(hvalid, axis=0, keepdims=True) - 1
        hi = jnp.max(jnp.where(valid, half, -imax), axis=0, keepdims=True)

        def bstep(_, lh):
            lo, hi = lh
            mid = (lo >> 1) + (hi >> 1) + (lo & hi & 1)
            cnt = jnp.sum((hvalid <= mid).astype(jnp.int32),
                          axis=0, keepdims=True)
            ok = cnt >= rank + 1
            return jnp.where(ok, lo, mid + 1), jnp.where(ok, mid, hi)

        lo, hi = jax.lax.fori_loop(0, t_bits, bstep, (lo, hi))
        v = hi
        members = hvalid == v
        r = random_bits((NP, BT), salt0 + 2 * m + 1)
        score = jnp.where(members, jnp.minimum(r, imax - 1), imax)
        srow = jnp.min(score, axis=0, keepdims=True)
        iwin = jnp.min(jnp.where(score == srow, iota_nb, NP),
                       axis=0, keepdims=True)
        onehot = iota_nb == iwin
        dE_i = jnp.sum(jnp.where(onehot, 2 * half, 0), axis=0,
                       keepdims=True, dtype=jnp.int32)
        for k in range(K):
            touched = (p1_col(k) == iwin) | (p2_col(k) == iwin)
            c = c - 2 * jnp.where(touched, qs[k], 0)
            qs[k] = jnp.where(touched, -qs[k], qs[k])
        sig = jnp.where(onehot, -sig, sig)            # unconditional flip
        E = E + dE_i
        better = E < emin
        emin = jnp.where(better, E, emin)
        smin = jnp.where(better, sig, smin)
        itmin = jnp.where(better, m + 1, itmin)
        return sig, c, qs, E, emin, smin, itmin

    sig0 = sigma_ref[:].astype(jnp.int32)
    qs0 = [q_refs[k][:] for k in range(K)]
    sig, c, qs, E, emin, smin, itmin = jax.lax.fori_loop(
        0, n_moves, move,
        (sig0, c_ref[:], qs0, E_ref[:], emin_ref[:],
         smin_ref[:].astype(jnp.int32), itmin_ref[:]))
    sigma_out[:] = sig.astype(jnp.int8)
    E_out[:] = E
    emin_out[:] = emin
    smin_out[:] = smin.astype(jnp.int8)
    itmin_out[:] = itmin


@partial(jax.jit, static_argnames=("block_chains", "t_bits", "n_phys"))
def _pallas_eo_pspin_run(sigma, cT, qTs, E, emin, smin, itmin, cdf, p1, p2,
                         seed, n_moves, *, block_chains, t_bits, n_phys):
    """PSpin3 EO: sigma/smin [B, NP] int8, cT [NP, B] i32, qTs K-tuple of
    [NP, B] i32."""
    sigmaT, sminT = sigma.T, smin.T
    NP, B = sigmaT.shape
    K = p1.shape[1]
    BT = block_chains
    grid = (B // BT,)
    kernel = partial(_eo_pspin_kernel, N=n_phys, NP=NP, K=K, BT=BT,
                     t_bits=t_bits)
    row = pl.BlockSpec((1, BT), lambda j: (0, j), memory_space=pltpu.VMEM)
    blk = pl.BlockSpec((NP, BT), lambda j: (0, j), memory_space=pltpu.VMEM)
    tbl = pl.BlockSpec((NP, K), lambda j: (0, 0), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=([pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
                  + [pl.BlockSpec((NP, 1), lambda j: (0, 0),
                                  memory_space=pltpu.VMEM)]      # cdf
                  + [tbl, tbl, blk, blk] + [blk] * K
                  + [row, row, blk, row]),
        out_specs=[blk] + [row, row, blk, row],
        out_shape=([jax.ShapeDtypeStruct((NP, B), jnp.int8)]
                   + [jax.ShapeDtypeStruct((1, B), jnp.int32),
                      jax.ShapeDtypeStruct((1, B), jnp.int32),
                      jax.ShapeDtypeStruct((NP, B), jnp.int8),
                      jax.ShapeDtypeStruct((1, B), jnp.int32)]),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=_INTERPRET,
    )(seed, n_moves, cdf, p1, p2, sigmaT, cT, *qTs, E[None, :],
      emin[None, :], sminT, itmin[None, :])
    sig_out = outs[0]
    E_out, emin_out, smin_out, itmin_out = outs[1:]
    return (sig_out.T, E_out[0], emin_out[0], smin_out.T, itmin_out[0])


#: dense EO J budget: bf16 [NP, NP] VMEM-resident (integer couplings) /
#: f32 (float couplings — tighter: 4 B/entry)
_EO_DENSE_NP_MAX = 4096
_EO_DENSE_NP_MAX_F = 2048
#: streamed EO caps (match the rejfree stream caps: int8 / f32 J in HBM)
_EO_STREAM_NP_MAX = 32768
_EO_STREAM_NP_MAX_F = 16384
#: streamed EO row-block windows (jbuf 2*W*NP next to three [NP, BT] tables)
_EO_STREAM_W = 256
_EO_STREAM_W_F = 128


#: VMEM working-set target for EO auto block-chain selection (limit 128MB;
#: headroom for Mosaic temporaries inside the move loop)
_EO_VMEM_BUDGET = 96 * 1024 * 1024


def auto_eo_block_chains(model, chains: int) -> int:
    """Chain-block width for the EO kernels. Same measured logic as
    rejfree_pallas.auto_block_chains: all variants are compute-bound per
    chain (matmul / VPU counting passes scale with the block) EXCEPT the
    f32 HBM stream, whose 4 B/element J pass makes the move DMA-bound —
    that one takes the widest block whose VMEM working set (three [NP, BT]
    tables + io + the J window) fits."""
    from ..models.dense import FullyConnected

    N = model.N
    flt = (isinstance(model, FullyConnected)
           and not jnp.issubdtype(model.J.dtype, jnp.integer))
    if not (flt and N > _EO_DENSE_NP_MAX_F):
        return 128
    W = _EO_STREAM_W_F
    NP = -(-N // W) * W
    fixed = 2 * W * NP * 4
    per_bt = NP * (16 + 4)
    for bt in (512, 256, 128):
        if (bt <= chains and chains % bt == 0
                and fixed + per_bt * bt <= _EO_VMEM_BUDGET):
            return bt
    return 128


def pallas_eo_eligible(model, chains: int) -> bool:
    """EO kernel eligibility: sparse Pairwise (N <= 16384, K <= 16 —
    resident-lf inverse-column kernel, no J matrix); dense VMEM-resident J
    up to N <= 4096 (int) / 2048 (float); beyond that the HBM-streamed
    variant keeps only the half/key table resident and rebuilds it each
    move from one streamed J pass (int N <= 32768 / float N <= 16384)."""
    from ..models.dense import FullyConnected
    from ..models.lattice import LatticeEA
    from ..models.pairwise import Pairwise
    from ..samplers.common import concrete_model
    from .rejfree_pallas import _dense_rejfree_ok, _sparse_rejfree_ok

    if chains % 128 != 0 or not concrete_model(model):
        return False
    if isinstance(model, LatticeEA):
        if (jnp.issubdtype(model.Jd.dtype, jnp.integer)
                and jnp.issubdtype(model.h.dtype, jnp.integer)
                and model.N >= 8):
            return True
        # float lattices (GraphEANormal) ride the sparse EO kernel
        return _sparse_rejfree_ok(model)
    if isinstance(model, FullyConnected):
        cap = (_EO_STREAM_NP_MAX
               if jnp.issubdtype(model.J.dtype, jnp.integer)
               else _EO_STREAM_NP_MAX_F)
        return model.N <= cap and _dense_rejfree_ok(model)
    if isinstance(model, Pairwise):
        return _sparse_rejfree_ok(model)
    from .rejfree_pallas import _pspin_rejfree_ok
    if _pspin_rejfree_ok(model):
        return True
    from .sat_pallas import sat_rejfree_ok
    if sat_rejfree_ok(model):
        return True
    from .perc_pallas import perc_rejfree_ok
    return perc_rejfree_ok(model)


class PallasEO:
    """Reusable EO runner for an integer LatticeEA (fields OK) or a
    FullyConnected model: integer |J| <= 127 (VMEM-resident J up to N=4096,
    HBM-streamed beyond, up to N=32768) or float couplings (VMEM up to
    N=2048, HBM-streamed up to N=16384); eligibility is
    `pallas_eo_eligible`. One compile serves any `iters` (dynamic SMEM trip
    count)."""

    def __init__(self, model, tau: float, *, block_chains: int = 128):
        from ..models.dense import FullyConnected
        from ..models.lattice import LatticeEA
        from ..models.pairwise import Pairwise
        from ..samplers.eo import _rank_cdf
        from .rejfree_pallas import _sparse_rejfree_ok

        assert model.N >= 8, "sublane tiling needs N >= 8"
        self.model = model
        self.block_chains = block_chains
        self.kind = "lattice"
        from .perc_pallas import perc_rejfree_ok, _PercTables
        if perc_rejfree_ok(model):
            self.tab = _PercTables(model)
            self.NP = self.tab.NP
            self.flt = self.tab.flt
            self.kind = "perc"
            # integer keys are 2*dE with |dE| <= P (each pattern moves the
            # loss by at most 1 per flip for step/linear); xentr runs on
            # IEEE-754 sort keys of the f32 costs
            self.t_bits = (32 if self.flt else
                           max(1, int(np.ceil(np.log2(4 * model.P + 2)))))
            cdf = np.full((self.NP, 1), 2.0, np.float32)
            cdf[:model.N, 0] = _rank_cdf(model.N, float(tau))
            self.cdf = jnp.asarray(cdf)
            return
        from .sat_pallas import sat_rejfree_ok, _SatTables
        if sat_rejfree_ok(model):
            self.tab = _SatTables(model)
            self.NP = self.tab.NP
            self.flt = False
            self.kind = "sat"
            # |dE| <= max_conn (allDeltaE = 0:max_conn, SAT.jl:325)
            self.t_bits = max(1, int(np.ceil(
                np.log2(2 * max(model.max_conn, 1) + 2))))
            cdf = np.full((self.NP, 1), 2.0, np.float32)
            cdf[:model.N, 0] = _rank_cdf(model.N, float(tau))
            self.cdf = jnp.asarray(cdf)
            return
        from .rejfree_pallas import _pspin_rejfree_ok
        if _pspin_rejfree_ok(model):
            NP = -(-model.N // 8) * 8
            A = np.asarray(model.A)
            p1 = np.full((NP, model.K), model.N, np.int32)
            p2 = np.full((NP, model.K), model.N, np.int32)
            p1[:model.N] = A[:, :, 0]
            p2[:model.N] = A[:, :, 1]
            self.A, self.B = jnp.asarray(p1), jnp.asarray(p2)
            self.NP = NP
            self.flt = False
            self.kind = "pspin"
            # |half| <= K (unit couplings, K triangles per spin)
            self.t_bits = max(1, int(np.ceil(np.log2(2 * model.K + 2))))
            cdf = np.full((NP, 1), 2.0, np.float32)
            cdf[:model.N, 0] = _rank_cdf(model.N, float(tau))
            self.cdf = jnp.asarray(cdf)
            return
        int_lattice = (isinstance(model, LatticeEA)
                       and jnp.issubdtype(model.Jd.dtype, jnp.integer)
                       and jnp.issubdtype(model.h.dtype, jnp.integer))
        if isinstance(model, Pairwise) and not int_lattice \
                and not isinstance(model, FullyConnected):
            # includes FLOAT lattices (GraphEANormal)
            assert _sparse_rejfree_ok(model), \
                "sparse EO needs a Pairwise model, N<=16384, K<=16"
            self.flt = not jnp.issubdtype(model.J.dtype, jnp.integer)
            NP = -(-model.N // 8) * 8
            nbr = np.full((NP, model.K), model.N, np.int32)
            nbr[:model.N] = np.asarray(model.neigh)
            jd = np.float32 if self.flt else np.int32
            jc = np.zeros((NP, model.K), jd)
            jc[:model.N] = np.asarray(model.J).astype(jd)
            self.A, self.B = jnp.asarray(nbr), jnp.asarray(jc)
            self.L = self.D = 0
            self.dense = False
            self.NP = NP
            self.kind = "sparse"
            max_half = (None if self.flt else
                        int(np.abs(np.asarray(model.J)).sum(axis=1).max()
                            + np.abs(np.asarray(model.h)).max()))
            if self.flt:
                self.t_bits = 32
            else:
                self.t_bits = max(1, int(np.ceil(np.log2(2 * max_half + 2))))
            cdf = np.full((NP, 1), 2.0, np.float32)
            cdf[:model.N, 0] = _rank_cdf(model.N, float(tau))
            self.cdf = jnp.asarray(cdf)
            return
        if isinstance(model, LatticeEA):
            assert jnp.issubdtype(model.Jd.dtype, jnp.integer)
            assert jnp.issubdtype(model.h.dtype, jnp.integer), \
                "integer-domain fields only"
            self.flt = False
            Jp, Jm = _build_dir_tables(model)
            hcol = np.asarray(model.h, np.int32).reshape(-1, 1)
            Jph = np.concatenate([np.asarray(Jp, np.int32), hcol], axis=1)
            self.A, self.B = jnp.asarray(Jph), jnp.asarray(Jm)
            self.L, self.D = model.L, model.D
            self.dense = False
            self.NP = model.N
            max_half = int((np.abs(Jp).sum(axis=1) + np.abs(Jm).sum(axis=1)
                            + np.abs(hcol[:, 0])).max())
        else:
            assert isinstance(model, FullyConnected), type(model)
            self.flt = not jnp.issubdtype(model.J.dtype, jnp.integer)
            self.L = self.D = 0
            dense_cap = _EO_DENSE_NP_MAX_F if self.flt else _EO_DENSE_NP_MAX
            if model.N <= dense_cap:
                NP = -(-model.N // 128) * 128
                J = np.zeros((NP, NP), np.float32)
                J[:model.N, :model.N] = np.asarray(model.J)
                self.A = jnp.asarray(J, jnp.float32 if self.flt
                                     else jnp.bfloat16)
                self.dense = True
                self.kind = "dense"
            else:
                # HBM-streamed: pad N to a window multiple; J stays int8
                # (cast to bf16 post-DMA, exact) or f32
                W = _EO_STREAM_W_F if self.flt else _EO_STREAM_W
                NP = -(-model.N // W) * W
                jd = np.float32 if self.flt else np.int8
                J = np.zeros((NP, NP), jd)
                J[:model.N, :model.N] = np.asarray(model.J).astype(jd)
                self.A = jnp.asarray(J)
                self.window = W
                self.dense = True
                self.kind = "stream"
            ht = np.float32 if self.flt else np.int32
            h = np.zeros((NP, 1), ht)
            h[:model.N, 0] = np.asarray(model.h)
            self.B = jnp.asarray(h)
            self.NP = NP
            # float path never derives search bounds from a coupling sum
            # (int truncation would make the bound wrong); keep it None
            max_half = (None if self.flt else
                        int(np.abs(np.asarray(model.J)).sum(axis=1).max()
                            + np.abs(h).max()))
        if self.flt:
            # float path: the search runs on int32 sort keys spanning (at
            # most) the full int32 range — 32 halvings always converge
            self.t_bits = 32
        else:
            # binary-search trip count: |half| <= max_half, searched range
            # (lo, hi] starts at width 2*max_half + 1
            self.t_bits = max(1, int(np.ceil(np.log2(2 * max_half + 2))))
        cdf = np.full((self.NP, 1), 2.0, np.float32)   # pad rows: never < u
        cdf[:model.N, 0] = _rank_cdf(model.N, float(tau))
        self.cdf = jnp.asarray(cdf)

    def run(self, sigma, E, iters: int, seed: int):
        """sigma [B, N] int8, E [B] internal-unit energies (int32 for
        integer couplings, f32 for float) -> (sigma', E', Emin, sigma_min,
        itmin), energies in the same internal units."""
        B, n = sigma.shape
        et = jnp.float32 if self.flt else jnp.int32
        pad = self.NP - n
        if pad:
            padc = jnp.ones((B, pad), jnp.int8)
            sigma = jnp.concatenate([sigma, padc], axis=1)
        smin = sigma
        zeros = jnp.zeros((B,), jnp.int32)
        if self.kind == "perc":
            from .perc_pallas import (_pallas_eo_perc_run, _pad_sigma_perc,
                                      _perc_delta_of)

            t = self.tab
            et = jnp.float32 if self.flt else jnp.int32
            sigp = _pad_sigma_perc(sigma[:, :n], t.NP)
            deltaT = _perc_delta_of(sigp, t.xi_i8, self.model.N, t.PP)
            cpar = jnp.asarray([t.c], jnp.float32)
            sig, E, emin, smin, itmin = _pallas_eo_perc_run(
                sigp, deltaT, E.astype(et), E.astype(et), smin, zeros,
                self.cdf, cpar, t.xiT, t.xi,
                jnp.asarray([seed % (2 ** 31)], jnp.int32),
                jnp.asarray([iters], jnp.int32),
                block_chains=self.block_chains, t_bits=self.t_bits,
                n_phys=self.model.N, p_phys=self.model.P, fam=t.fam)
            return (sig[:, :n], E, emin, smin[:, :n], itmin)
        if self.kind == "sat":
            from .sat_pallas import _sat_prep, _pallas_eo_sat_run

            t = self.tab
            sigp, wTs = _sat_prep(self.model, sigma[:, :n], t.NP, t.Cmax,
                                  t.bits, t.spw, t.nw)
            sig, E, emin, smin, itmin = _pallas_eo_sat_run(
                sigp, wTs, E.astype(et), E.astype(et), smin, zeros,
                self.cdf, t.TL, t.P,
                jnp.asarray([seed % (2 ** 31)], jnp.int32),
                jnp.asarray([iters], jnp.int32),
                block_chains=self.block_chains, t_bits=self.t_bits,
                n_phys=self.model.N, cmax=t.Cmax, k_=t.K, bits=t.bits,
                spw=t.spw, nw=t.nw)
            return (sig[:, :n], E, emin, smin[:, :n], itmin)
        if self.kind == "pspin":
            from .rejfree_pallas import _pspin_prep

            sigp, cT, qTs = _pspin_prep(self.model, sigma[:, :n], self.NP)
            sig, E, emin, smin, itmin = _pallas_eo_pspin_run(
                sigp, cT, qTs, E.astype(et), E.astype(et), smin, zeros,
                self.cdf, self.A, self.B,
                jnp.asarray([seed % (2 ** 31)], jnp.int32),
                jnp.asarray([iters], jnp.int32),
                block_chains=self.block_chains, t_bits=self.t_bits,
                n_phys=self.model.N)
            return (sig[:, :n], E, emin, smin[:, :n], itmin)
        if self.kind == "sparse":
            from .rejfree_pallas import _sparse_prep

            sigp, lfT = _sparse_prep(self.model, sigma[:, :n], self.NP)
            sig, E, emin, smin, itmin = _pallas_eo_sparse_run(
                sigp, lfT, E.astype(et), E.astype(et), smin, zeros,
                self.cdf, self.A, self.B,
                jnp.asarray([seed % (2 ** 31)], jnp.int32),
                jnp.asarray([iters], jnp.int32),
                block_chains=self.block_chains, t_bits=self.t_bits,
                n_phys=self.model.N, flt=self.flt)
            return (sig[:, :n], E, emin, smin[:, :n], itmin)
        if self.kind == "stream":
            sig, E, emin, smin, itmin = _pallas_eo_stream_run(
                sigma, E.astype(et), E.astype(et), smin, zeros,
                self.cdf, self.B, self.A,
                jnp.asarray([seed % (2 ** 31)], jnp.int32),
                jnp.asarray([iters], jnp.int32),
                block_chains=self.block_chains, t_bits=self.t_bits,
                n_phys=self.model.N, window=self.window, flt=self.flt)
        else:
            sig, E, emin, smin, itmin = _pallas_eo_run(
                sigma, E.astype(et), E.astype(et), smin, zeros,
                self.cdf, self.A, self.B,
                jnp.asarray([seed % (2 ** 31)], jnp.int32),
                jnp.asarray([iters], jnp.int32),
                L=self.L, D=self.D, block_chains=self.block_chains,
                t_bits=self.t_bits, dense=self.dense, n_phys=self.model.N,
                flt=self.flt)
        return (sig[:, :n], E, emin, smin[:, :n], itmin)
