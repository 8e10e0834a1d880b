"""Pallas TPU kernel for rejection-free sampling (BKL / WTM) on EA lattices.

The reference's namesake samplers pick each move from the acceptance-weight
distribution w_i = min(1, e^{-beta dE_i}) maintained by O(1) class buckets
(/root/reference/src/DeltaE.jl:63-167) or a heap
(/root/reference/src/WaitingTimes.jl). Vectorized over chains, per-chain site
selection is the hard TPU problem: each chain (lane) picks a DIFFERENT site
(sublane row), and Mosaic has no per-lane dynamic row addressing
(tpu.dynamic_gather does not lower on v5e — measured round 1), so the
reference's O(deg) bucket updates cannot be reproduced in-kernel. What CAN be
done at full VPU rate is an O(N)-per-move dense formulation with every pass a
fused [N, BT] vector op:

* selection = **exponential race**: t_i = Exp(1)/w_i, the argmin is
  distributed ~ w_i (exactly the WTM clock construction,
  /root/reference/src/WaitingTimes.jl:15-21). In log space
  score_i = log(-log u_i) + beta*dE_i^+ avoids overflow at any beta; the
  winner is extracted as a min-reduce + first-match one-hot (exact, no ties);
* the local-field table is recomputed from the in-VMEM spins each move via
  the lattice roll identity (same rolls as ops/sweep_pallas.py) — stateless,
  so masked no-op moves cannot desync anything;
* the flip is a one-hot masked negate; dE and z come from sublane reduces.

Per accepted move this is ~50 vector passes over [N, BT] — ~1e8 accepted
chain-moves/s at N=512 vs ~1.5e7 for the XLA single-move path, and each BKL
move advances time by skip+1 ~ N/z virtual Metropolis iterations (factor
1e2-1e5 at low T, /root/reference/scripts/scripts.jl:35), so effective
virtual-iteration throughput far exceeds the Metropolis sweep kernel in the
low-acceptance regime the rejection-free samplers exist for.

Three samplers share the kernel; they differ in the time bookkeeping and
(rrr only) an extra acceptance stage:

* BKL: coordinate = virtual iteration count; skip ~ Geometric(z/N) with
  z = sum_i w_i (rand_skip, /root/reference/src/DeltaE.jl:141-144);
* WTM: coordinate = global time; advance = the winning race time exp(min
  score). Redrawing ALL clocks each move is distributionally identical to
  the reference's neighbor-only redraw by exponential memorylessness (the
  same argument as samplers/wtm.py's dense fallback), and here it is free:
  the race scores ARE the redraw;
* RRR (mode="rrr", single models: /root/reference/src/RRRMC.jl:149-210):
  coordinate = iteration count, +1 per move; after the race picks i ~ w_i/z,
  a SECOND lf pass on the hypothetically flipped state yields the staged
  z', and the flip commits with prob min(1, z/z') — evaluated in a
  shifted-exponential/log domain so the test stays exact when every w
  underflows f32 at extreme beta.

Checkpoints: the kernel emits per-move (coordinate, E) streams; the driver
fills the checkpoint grid with samplers.bkl._fill_checkpoints — the batch
generalization of the reference's drain loops
(/root/reference/src/RRRMC.jl:339-344,402-407).

Three kernel variants share the race machinery and differ only in how the
local-field table is produced each move:

* integer-coupling LatticeEA (fields supported as a [N, 1] int32 column) —
  lf from the lattice roll identity (as the sweep kernel). Lattices with
  N <= _LATTICE_DENSE_MAX are transparently densified onto the dense MXU
  variant below instead (same integer grid and scale, so the energy
  bookkeeping is bit-identical): the matmul lf beats the ~14 VPU
  roll/select passes there (measured 2.28e9 vs 5.97e8 virtual
  iters*chains/s at beta=4, EA-3D N=512, B=1024, v5e);
* integer FullyConnected (GraphSK, densify()'d sparse graphs, |J| <= 127,
  N <= 4096) — lf from one [NP, NP] x [NP, BT] bf16 MXU matmul per move
  (exact in f32 accumulation; integer fields supported). N is padded to a
  lane multiple with frozen spins masked out of the race and out of z;
* HBM-streamed FullyConnected (integer N <= 32768, e.g. densified GraphRRG
  N=1e4 — the reference's flagship workload,
  /root/reference/scripts/scripts.jl:34-37 — or float-coupling models like
  GraphSKNormal, the DeltaECacheCont regime
  /root/reference/src/DeltaE.jl:299-410): J stays in HBM and each move
  streams [W, NP] row blocks through a double-buffered VMEM window (the
  ops/sk_pallas.py stream_j pattern); the race min/argmin/z reduce
  STREAMINGLY per block, so no full [NP, NP] J and no [NP, BT] lf tensor is
  ever resident.

Every kernel also emits per-chunk accepted-move counts and summed z/N (an
[1, BT] int32 / f32 row each) so MCState.accepted and acceptance diagnostics
stay correct on kernel routes.

Integer models keep exact int32 energies; float models carry f32 energies
(each move's dE comes from a freshly recomputed lf, so there is no lf drift
— only f32 summation error in E itself). The sampling law is exact up to
f32 rounding of the race scores (same order as the f32 exp() in every
Metropolis kernel here).
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

#: BKL skip cap: bounds coordinate growth so int32 never overflows
#: (iters <= 1e9 enforced by the driver)
_SKIP_CAP = 1.0e9


def _geom_skip(u2, p):
    """Geometric rejected-iteration count with success prob p (rand_skip,
    /root/reference/src/DeltaE.jl:141-144), capped so int32 never
    overflows. p = 0 (z underflow at extreme beta) yields the cap."""
    denom = jnp.log1p(-jnp.minimum(p, jnp.float32(1 - 1e-6)))
    sk = jnp.floor(jnp.log(jnp.maximum(1 - u2, jnp.float32(1e-38))) / denom)
    skip = jnp.minimum(sk, jnp.float32(_SKIP_CAP)).astype(jnp.int32)
    return jnp.where(p >= 1.0, 0, skip)


def _rejfree_kernel(seed_ref, beta2s_ref, target_ref, jp_ref, jm_ref, h_ref,
                    sigma_ref, E_ref, coord_ref, acc_ref, zacc_ref,
                    sigma_out, E_out, coord_out, acc_out, zacc_out,
                    cs_out, es_out, *, L, D, BT, n_moves, mode):
    """One chunk of `n_moves` race-selected moves for a [N, BT] chain block.

    mode: "bkl" / "wtm" / "rrr". coord_ref/coord_out/cs_out: f32 global time
    (wtm) or int32 iterations (bkl: virtual rejected-inclusive; rrr: one per
    move). Chains whose coordinate reached target_ref[0] keep racing but
    apply nothing (masked no-ops; the stream rows they emit are idempotent
    for the checkpoint fill). acc: applied-flip counts; zacc: summed z/N
    over active moves (acceptance diagnostics, runtest accept_rate)."""
    wtm = mode == "wtm"
    N = L ** D
    seed_p = program_seed(seed_ref[0], pl.program_id(0))
    pltpu.prng_seed(seed_p)
    salt0 = seed_p * jnp.int32(1000003)
    beta2s = beta2s_ref[0]
    target = target_ref[0]

    idx = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)
    strides = [L ** (D - 1 - d) for d in range(D)]
    coords_ = [(idx // s) % L for s in strides]
    wrap_hi = [c == (L - 1) for c in coords_]
    wrap_lo = [c == 0 for c in coords_]
    iota_nb = jax.lax.broadcasted_iota(jnp.int32, (N, BT), 0)

    def roll_up(x, k):
        return pltpu.roll(x, N - k, axis=0)

    def local_fields(sig):
        lf = jnp.zeros((N, BT), jnp.int32) + h_ref[:]
        for d, s in enumerate(strides):
            if d == 0:
                # outermost axis: a cyclic roll of the FULL flattened array
                # by +-s IS the periodic shift (i +- s mod N changes coord_0
                # by +-1 mod L and nothing else) — no wrap select needed
                nb_p = roll_up(sig, s)
                nb_m = roll_up(sig, N - s)
            else:
                nb_p = jnp.where(wrap_hi[d],
                                 roll_up(sig, N - s * (L - 1)),
                                 roll_up(sig, s))
                nb_m = jnp.where(wrap_lo[d],
                                 roll_up(sig, s * (L - 1)),
                                 roll_up(sig, N - s))
            lf = lf + jp_ref[:, d][:, None] * nb_p \
                    + jm_ref[:, d][:, None] * nb_m
        return lf

    inv32 = jnp.float32(2.0 ** -32)
    half_f = jnp.float32(0.5)

    def to_uniform(rb):
        """int32 bits -> u in [0, 1) (one f32 convert; u = 0 has prob 2^-32
        and makes that site's race time +inf => simply never picked)."""
        return rb.astype(jnp.float32) * inv32 + half_f

    def move(m, carry):
        sig, E, coord, acc, zacc = carry
        active = coord < target                       # [1, BT]
        half = sig * local_fields(sig)                # dE_int = 2*half
        bE = beta2s * jnp.maximum(half, 0).astype(jnp.float32)
        u = to_uniform(random_bits((N, BT), salt0 + 3 * m))
        score = jnp.log(-jnp.log(u)) + bE             # log race time
        mrow = jnp.min(score, axis=0, keepdims=True)  # [1, BT]
        sel = score == mrow
        imin = jnp.min(jnp.where(sel, iota_nb, N), axis=0, keepdims=True)
        onehot = iota_nb == imin                      # exact single winner
        dE_i = jnp.sum(jnp.where(onehot, 2 * half, 0), axis=0,
                       keepdims=True, dtype=jnp.int32)
        z = jnp.sum(jnp.exp(-bE), axis=0, keepdims=True)        # [1, BT]
        zacc = zacc + jnp.where(active, z * jnp.float32(1.0 / N),
                                jnp.float32(0.0))
        if mode == "rrr":
            # staged z': second lf pass on the hypothetically flipped state;
            # z/z' compared in a shifted-exponential/log domain so the
            # acceptance stays exact at any beta (w can underflow f32)
            sig2 = jnp.where(onehot, -sig, sig)
            bE2 = beta2s * jnp.maximum(sig2 * local_fields(sig2),
                                       0).astype(jnp.float32)
            m1 = jnp.min(bE, axis=0, keepdims=True)   # [1, BT]
            m2 = jnp.min(bE2, axis=0, keepdims=True)
            z1 = jnp.sum(jnp.exp(m1 - bE), axis=0, keepdims=True)
            z2 = jnp.sum(jnp.exp(m2 - bE2), axis=0, keepdims=True)
            ua = to_uniform(random_bits((1, BT), salt0 + 3 * m + 1))
            do = active & (jnp.log(ua)
                           < jnp.log(z1) - jnp.log(z2) + (m2 - m1))
            sig = jnp.where(onehot & do, -sig, sig)
            E = E + jnp.where(do, dE_i, 0)
            coord = coord + jnp.where(active, 1, 0)
            acc = acc + do.astype(jnp.int32)
        else:
            sig = jnp.where(onehot & active, -sig, sig)
            E = E + jnp.where(active, dE_i, 0)
            acc = acc + active.astype(jnp.int32)
        if wtm:
            coord = coord + jnp.where(active, jnp.exp(mrow),
                                      jnp.float32(0.0))
        elif mode == "bkl":
            u2 = to_uniform(random_bits((1, BT), salt0 + 3 * m + 1))
            skip = _geom_skip(u2, z * jnp.float32(1.0 / N))
            coord = coord + jnp.where(active, skip + 1, 0)
        cs_out[pl.ds(m, 1), :] = coord
        es_out[pl.ds(m, 1), :] = E
        return sig, E, coord, acc, zacc

    sig0 = sigma_ref[:].astype(jnp.int32)
    sig, E, coord, acc, zacc = jax.lax.fori_loop(
        0, n_moves, move,
        (sig0, E_ref[:], coord_ref[:], acc_ref[:], zacc_ref[:]))
    sigma_out[:] = sig.astype(jnp.int8)
    E_out[:] = E
    coord_out[:] = coord
    acc_out[:] = acc
    zacc_out[:] = zacc


@partial(jax.jit, static_argnames=("L", "D", "block_chains", "n_moves",
                                   "mode"))
def _pallas_rejfree_chunk(sigma, E, coord, acc, zacc, Jp, Jm, hcol, seed,
                          beta2s, target, *, L, D, block_chains, n_moves,
                          mode):
    """sigma [B, N] int8, E [B] int32, coord [B] (f32 wtm / i32 bkl) ->
    (sigma', E', coord', acc', zacc', coord_stream [n_moves, B],
    E_stream [n_moves, B])."""
    sigmaT = sigma.T
    N, B = sigmaT.shape
    BT = block_chains
    grid = (B // BT,)
    ct = jnp.float32 if mode == "wtm" else jnp.int32
    kernel = partial(_rejfree_kernel, L=L, D=D, BT=BT, n_moves=n_moves,
                     mode=mode)
    row = pl.BlockSpec((1, BT), lambda j: (0, j), memory_space=pltpu.VMEM)
    stream = pl.BlockSpec((n_moves, BT), lambda j: (0, j),
                          memory_space=pltpu.VMEM)
    sig_out, E_out, coord_out, acc_out, zacc_out, cs, es = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),      # seed
            pl.BlockSpec(memory_space=pltpu.SMEM),      # beta2s
            pl.BlockSpec(memory_space=pltpu.SMEM),      # target
            pl.BlockSpec(memory_space=pltpu.VMEM),      # Jp [N, D]
            pl.BlockSpec(memory_space=pltpu.VMEM),      # Jm [N, D]
            pl.BlockSpec((N, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),      # h [N, 1]
            pl.BlockSpec((N, BT), lambda j: (0, j), memory_space=pltpu.VMEM),
            row,                                        # E
            row,                                        # coord
            row,                                        # acc
            row,                                        # zacc
        ],
        out_specs=[
            pl.BlockSpec((N, BT), lambda j: (0, j), memory_space=pltpu.VMEM),
            row, row, row, row, stream, stream,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, B), jnp.int8),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), ct),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.float32),
            jax.ShapeDtypeStruct((n_moves, B), ct),
            jax.ShapeDtypeStruct((n_moves, B), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_INTERPRET,
    )(seed, beta2s, target, Jp, Jm, hcol, sigmaT,
      E[None, :].astype(jnp.int32), coord[None, :].astype(ct),
      acc[None, :], zacc[None, :])
    return (sig_out.T, E_out[0], coord_out[0], acc_out[0], zacc_out[0],
            cs, es)


@partial(jax.jit, static_argnames=("L", "D", "bt", "chunk_moves", "mode"))
def rejfree_run(Jp, Jm, hcol, beta2s, sigma, E, coord, Es, seed0, target,
                step, scale, *, L, D, bt, chunk_moves, mode):
    """Whole hookless rejection-free run in ONE jit: lax.while_loop over
    kernel chunks, checkpoint grid filled per chunk from the (coordinate, E)
    streams (no host sync; the Pallas analog of samplers.bkl._bkl_run).

    target/step: scalar arrays (i32 iters / f32 tmax); scale: physical-unit
    conversion for the emitted int32 energies. Returns (..., acc, zacc):
    per-chain applied-flip counts and summed z/N over the whole run."""
    from ..samplers.bkl import _fill_checkpoints

    target_arr = target.reshape(1)
    B = sigma.shape[0]
    acc = jnp.zeros((B,), jnp.int32)
    zacc = jnp.zeros((B,), jnp.float32)

    def cond(carry):
        coord = carry[2]
        return jnp.min(coord) < target

    def body(carry):
        sigma, E, coord, acc, zacc, Es, k = carry
        seed = (seed0 + k * jnp.int32(7919)).reshape(1)
        x_start = coord
        e_start = E.astype(Es.dtype) * scale
        sigma, E, coord, acc, zacc, cs, es = _pallas_rejfree_chunk(
            sigma, E, coord, acc, zacc, Jp, Jm, hcol, seed, beta2s,
            target_arr, L=L, D=D, block_chains=bt, n_moves=chunk_moves,
            mode=mode)
        Es = _fill_checkpoints(Es, step, x_start, e_start, cs,
                               es.astype(Es.dtype) * scale)
        return sigma, E, coord, acc, zacc, Es, k + 1

    k0 = jnp.zeros((), jnp.int32)
    sigma, E, coord, acc, zacc, Es, _ = jax.lax.while_loop(
        cond, body, (sigma, E, coord, acc, zacc, Es, k0))
    return sigma, E, coord, Es, acc, zacc


# ---------------------------------------------------------------------------
# Dense variant: FullyConnected (SK / densified sparse) models. Same
# exponential-race move; the per-move local-field table comes from ONE
# [NP, NP] x [NP, BT] bf16 matmul on the MXU instead of lattice rolls (exact:
# |J| <= 127 integer couplings, spins +-1, f32 accumulation, row sums < 2^24 —
# the same argument as the delayed-update sweep, models/dense.py:35-38).
# Mosaic has no per-lane dynamic row addressing, so an O(deg) incremental lf
# update is impossible; recomputing lf via the matmul is the same MXU cost as
# the rank-1 update J @ onehot would be and is stateless (masked no-op moves
# cannot desync anything). N is padded to a lane multiple with zero-coupled
# frozen spins that are masked OUT of the race and out of z, so the sampled
# law is exactly BKL/WTM on the physical N sites.
# ---------------------------------------------------------------------------


def _rejfree_dense_kernel(seed_ref, beta2s_ref, target_ref, jb_ref, h_ref,
                          sigma_ref, E_ref, coord_ref, acc_ref, zacc_ref,
                          sigma_out, E_out, coord_out, acc_out, zacc_out,
                          cs_out, es_out, *, N, NP, BT, n_moves, mode):
    """One chunk of `n_moves` race-selected moves (mode "bkl" / "wtm" /
    "rrr"), [NP, BT] block.

    jb_ref [NP, NP] bf16 (zero-padded), h_ref [NP, 1] int32; sites >= N are
    padding: frozen at +1, excluded from the race and from z."""
    wtm = mode == "wtm"
    seed_p = program_seed(seed_ref[0], pl.program_id(0))
    pltpu.prng_seed(seed_p)
    salt0 = seed_p * jnp.int32(1000003)
    beta2s = beta2s_ref[0]
    target = target_ref[0]
    iota_nb = jax.lax.broadcasted_iota(jnp.int32, (NP, BT), 0)
    valid = iota_nb < N
    inv32 = jnp.float32(2.0 ** -32)
    half_f = jnp.float32(0.5)
    inf = jnp.float32(3.0e38)

    def to_uniform(rb):
        return rb.astype(jnp.float32) * inv32 + half_f

    def dense_lf(s):
        lf = jax.lax.dot_general(
            jb_ref[:], s.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32)
        return lf + h_ref[:]

    def move(m, carry):
        sig, E, coord, acc, zacc = carry
        active = coord < target                       # [1, BT]
        half = sig * dense_lf(sig)                    # dE_int = 2*half
        bE = beta2s * jnp.maximum(half, 0).astype(jnp.float32)
        u = to_uniform(random_bits((NP, BT), salt0 + 3 * m))
        score = jnp.where(valid, jnp.log(-jnp.log(u)) + bE, inf)
        mrow = jnp.min(score, axis=0, keepdims=True)  # [1, BT]
        sel = score == mrow
        imin = jnp.min(jnp.where(sel, iota_nb, NP), axis=0, keepdims=True)
        onehot = iota_nb == imin                      # exact single winner
        dE_i = jnp.sum(jnp.where(onehot, 2 * half, 0), axis=0,
                       keepdims=True, dtype=jnp.int32)
        z = jnp.sum(jnp.where(valid, jnp.exp(-bE), jnp.float32(0.0)),
                    axis=0, keepdims=True)            # [1, BT]
        zacc = zacc + jnp.where(active, z * jnp.float32(1.0 / N),
                                jnp.float32(0.0))
        if mode == "rrr":
            # staged z' (second matmul on the hypothetical flip); shifted
            # exponential/log domain keeps the z/z' test exact at any beta;
            # padding rows are masked out of both mins and both sums
            sig2 = jnp.where(onehot, -sig, sig)
            bE2 = beta2s * jnp.maximum(sig2 * dense_lf(sig2),
                                       0).astype(jnp.float32)
            m1 = jnp.min(jnp.where(valid, bE, inf), axis=0, keepdims=True)
            m2 = jnp.min(jnp.where(valid, bE2, inf), axis=0, keepdims=True)
            z1 = jnp.sum(jnp.where(valid, jnp.exp(m1 - bE), 0.0),
                         axis=0, keepdims=True)
            z2 = jnp.sum(jnp.where(valid, jnp.exp(m2 - bE2), 0.0),
                         axis=0, keepdims=True)
            ua = to_uniform(random_bits((1, BT), salt0 + 3 * m + 1))
            do = active & (jnp.log(ua)
                           < jnp.log(z1) - jnp.log(z2) + (m2 - m1))
            sig = jnp.where(onehot & do, -sig, sig)
            E = E + jnp.where(do, dE_i, 0)
            coord = coord + jnp.where(active, 1, 0)
            acc = acc + do.astype(jnp.int32)
        else:
            sig = jnp.where(onehot & active, -sig, sig)
            E = E + jnp.where(active, dE_i, 0)
            acc = acc + active.astype(jnp.int32)
        if wtm:
            coord = coord + jnp.where(active, jnp.exp(mrow),
                                      jnp.float32(0.0))
        elif mode == "bkl":
            u2 = to_uniform(random_bits((1, BT), salt0 + 3 * m + 1))
            skip = _geom_skip(u2, z * jnp.float32(1.0 / N))
            coord = coord + jnp.where(active, skip + 1, 0)
        cs_out[pl.ds(m, 1), :] = coord
        es_out[pl.ds(m, 1), :] = E
        return sig, E, coord, acc, zacc

    sig0 = sigma_ref[:].astype(jnp.int32)
    sig, E, coord, acc, zacc = jax.lax.fori_loop(
        0, n_moves, move,
        (sig0, E_ref[:], coord_ref[:], acc_ref[:], zacc_ref[:]))
    sigma_out[:] = sig.astype(jnp.int8)
    E_out[:] = E
    coord_out[:] = coord
    acc_out[:] = acc
    zacc_out[:] = zacc


@partial(jax.jit, static_argnames=("n_phys", "block_chains", "n_moves",
                                   "mode"))
def _pallas_rejfree_dense_chunk(sigma, E, coord, acc, zacc, Jb, hcol, seed,
                                beta2s, target, *, n_phys, block_chains,
                                n_moves, mode):
    """sigma [B, NP] int8 (rows >= n_phys are +1 padding), Jb [NP, NP] bf16,
    hcol [NP, 1] int32 -> same stream outputs as the lattice chunk."""
    sigmaT = sigma.T
    NP, B = sigmaT.shape
    BT = block_chains
    grid = (B // BT,)
    ct = jnp.float32 if mode == "wtm" else jnp.int32
    kernel = partial(_rejfree_dense_kernel, N=n_phys, NP=NP, BT=BT,
                     n_moves=n_moves, mode=mode)
    row = pl.BlockSpec((1, BT), lambda j: (0, j), memory_space=pltpu.VMEM)
    stream = pl.BlockSpec((n_moves, BT), lambda j: (0, j),
                          memory_space=pltpu.VMEM)
    sig_out, E_out, coord_out, acc_out, zacc_out, cs, es = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),      # seed
            pl.BlockSpec(memory_space=pltpu.SMEM),      # beta2s
            pl.BlockSpec(memory_space=pltpu.SMEM),      # target
            pl.BlockSpec((NP, NP), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),      # Jb
            pl.BlockSpec((NP, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),      # h
            pl.BlockSpec((NP, BT), lambda j: (0, j), memory_space=pltpu.VMEM),
            row,                                        # E
            row,                                        # coord
            row,                                        # acc
            row,                                        # zacc
        ],
        out_specs=[
            pl.BlockSpec((NP, BT), lambda j: (0, j), memory_space=pltpu.VMEM),
            row, row, row, row, stream, stream,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NP, B), jnp.int8),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), ct),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.float32),
            jax.ShapeDtypeStruct((n_moves, B), ct),
            jax.ShapeDtypeStruct((n_moves, B), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=_INTERPRET,
    )(seed, beta2s, target, Jb, hcol, sigmaT,
      E[None, :].astype(jnp.int32), coord[None, :].astype(ct),
      acc[None, :], zacc[None, :])
    return (sig_out.T, E_out[0], coord_out[0], acc_out[0], zacc_out[0],
            cs, es)


@partial(jax.jit, static_argnames=("n_phys", "bt", "chunk_moves", "mode"))
def rejfree_dense_run(Jb, hcol, beta2s, sigma, E, coord, Es, seed0, target,
                      step, scale, *, n_phys, bt, chunk_moves, mode):
    """Dense analog of `rejfree_run`: whole hookless run in ONE jit. sigma is
    the UNPADDED [B, N] int8 state; padding to Jb's NP happens here once."""
    from ..samplers.bkl import _fill_checkpoints

    NP = Jb.shape[0]
    B = sigma.shape[0]
    pad = NP - n_phys
    if pad:
        sigma = jnp.concatenate(
            [sigma, jnp.ones((B, pad), jnp.int8)], axis=1)
    target_arr = target.reshape(1)
    acc = jnp.zeros((B,), jnp.int32)
    zacc = jnp.zeros((B,), jnp.float32)

    def cond(carry):
        coord = carry[2]
        return jnp.min(coord) < target

    def body(carry):
        sigma, E, coord, acc, zacc, Es, k = carry
        seed = (seed0 + k * jnp.int32(7919)).reshape(1)
        x_start = coord
        e_start = E.astype(Es.dtype) * scale
        sigma, E, coord, acc, zacc, cs, es = _pallas_rejfree_dense_chunk(
            sigma, E, coord, acc, zacc, Jb, hcol, seed, beta2s, target_arr,
            n_phys=n_phys, block_chains=bt, n_moves=chunk_moves, mode=mode)
        Es = _fill_checkpoints(Es, step, x_start, e_start, cs,
                               es.astype(Es.dtype) * scale)
        return sigma, E, coord, acc, zacc, Es, k + 1

    k0 = jnp.zeros((), jnp.int32)
    sigma, E, coord, acc, zacc, Es, _ = jax.lax.while_loop(
        cond, body, (sigma, E, coord, acc, zacc, Es, k0))
    return sigma[:, :n_phys], E, coord, Es, acc, zacc


# ---------------------------------------------------------------------------
# HBM-streamed variant: FullyConnected models whose J cannot live in VMEM
# (densified GraphRRG N=1e4 — the reference's flagship rejection-free
# workload, /root/reference/scripts/scripts.jl:34-37 — and all float-coupling
# models, the DeltaECacheCont regime /root/reference/src/DeltaE.jl:299-410).
# Per move, [W, NP] row blocks of J are DMA'd through a double-buffered VMEM
# window (the ops/sk_pallas.py stream_j pattern) and the race reduces
# STREAMINGLY: each block contributes its local (min score, argmin, dE at
# argmin) and a log-sum-exp update of log z; no [NP, NP] J and no full
# [NP, BT] lf tensor is ever resident. One J pass per move (two for rrr's
# staged z'), which is bandwidth/MXU-balanced at BT ~ 128-256 on v5e.
# Integer J streams as int8 (cast to bf16 post-DMA: exact, |J| <= 127);
# float J streams as f32 with f32 MXU accumulation and f32 energies.
# ---------------------------------------------------------------------------

#: finite -inf stand-in: keeps streaming lse exponents finite (exp of
#: (-1e38 - x) underflows to 0 cleanly; true -inf would make -inf - -inf NaN)
_NEG = -1.0e38


def _rejfree_stream_kernel(seed_ref, beta2s_ref, target_ref, h_ref,
                           sigma_ref, E_ref, coord_ref, acc_ref, zacc_ref,
                           J_hbm,
                           sigma_out, E_out, coord_out, acc_out, zacc_out,
                           cs_out, es_out,
                           sig_s, sigb_s, jbuf, sem,
                           *, N, NP, W, BT, n_moves, mode, flt):
    """Streamed chunk of `n_moves` race-selected moves, [NP, BT] block.

    J_hbm [NP, NP] int8/f32 stays in HBM; jbuf is the [2, W, NP]
    double-buffered window; sig_s (int32) / sigb_s (matmul dtype) hold the
    chain block's spins (Mosaic has no dynamic_slice on loop-carried VALUES,
    so the per-block row slices go through scratch refs). flt selects f32
    local fields / energies (float couplings) vs exact int32."""
    wtm = mode == "wtm"
    seed_p = program_seed(seed_ref[0], pl.program_id(0))
    pltpu.prng_seed(seed_p)
    salt0 = seed_p * jnp.int32(1000003)
    beta2s = beta2s_ref[0]
    target = target_ref[0]
    n_blk = NP // W
    passes = 2 if mode == "rrr" else 1
    total = n_moves * passes * n_blk
    salt_stride = jnp.int32(n_blk + 2)
    mm_dt = jnp.float32 if flt else jnp.bfloat16
    acc_dt = jnp.float32 if flt else jnp.int32
    inv32 = jnp.float32(2.0 ** -32)
    half_f = jnp.float32(0.5)
    inf = jnp.float32(3.0e38)
    neg = jnp.float32(_NEG)
    log_n = jnp.log(jnp.float32(N))

    def to_uniform(rb):
        return rb.astype(jnp.float32) * inv32 + half_f

    def j_dma(slot, blk):
        return pltpu.make_async_copy(
            J_hbm.at[pl.ds(blk * W, W), :], jbuf.at[slot], sem.at[slot])

    j_dma(0, 0).start()

    def block_lf(g, w):
        """Wait for block w's J rows, prefetch the next fetch in the global
        cyclic schedule, return (lf rows [W, BT], row base)."""
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
        return lfb + h_ref[pl.ds(base, W), :], base

    def block_half(g, w, flip_irow):
        """half_b = sig_b * lf_b for block w (dE = 2*half); flip_irow
        evaluates the hypothetically flipped state (sigb_s must already hold
        the flipped matmul operand)."""
        lfb, base = block_lf(g, w)
        iota_b = jax.lax.broadcasted_iota(jnp.int32, (W, BT), 0) + base
        sig_b = sig_s[pl.ds(base, W), :]
        if flip_irow is not None:
            sig_b = jnp.where(iota_b == flip_irow, -sig_b, sig_b)
        if flt:
            sig_b = sig_b.astype(jnp.float32)
        return sig_b * lfb, iota_b

    def lse_update(zm, zs, bE_b, validb):
        """Streaming log-sum-exp of -bE (log z = zm + log zs); all
        exponents <= 0 by construction, so nothing can overflow."""
        xb = jnp.where(validb, -bE_b, neg)
        bm = jnp.max(xb, axis=0, keepdims=True)
        zm_new = jnp.maximum(zm, bm)
        zs = (zs * jnp.exp(zm - zm_new)
              + jnp.sum(jnp.exp(xb - zm_new), axis=0, keepdims=True))
        return zm_new, zs

    def race_pass(g0, msalt):
        """Full J pass: race argmin (score min / winner / winner dE) plus
        streaming log z."""
        def blk(w, carry):
            mrow, irow, dEw, zm, zs = carry
            half_b, iota_b = block_half(g0 + w, w, None)
            validb = iota_b < N
            bE_b = beta2s * jnp.maximum(half_b, 0).astype(jnp.float32)
            zm, zs = lse_update(zm, zs, bE_b, validb)
            u = to_uniform(random_bits((W, BT), msalt + w))
            score = jnp.where(validb, jnp.log(-jnp.log(u)) + bE_b, inf)
            bmin = jnp.min(score, axis=0, keepdims=True)
            bidx = jnp.min(jnp.where(score == bmin, iota_b, NP),
                           axis=0, keepdims=True)
            bdE = jnp.sum(jnp.where(iota_b == bidx, 2 * half_b,
                                    jnp.zeros((), acc_dt)),
                          axis=0, keepdims=True, dtype=acc_dt)
            better = bmin < mrow
            mrow = jnp.where(better, bmin, mrow)
            irow = jnp.where(better, bidx, irow)
            dEw = jnp.where(better, bdE, dEw)
            return mrow, irow, dEw, zm, zs

        init = (jnp.full((1, BT), inf),
                jnp.full((1, BT), NP, jnp.int32),
                jnp.zeros((1, BT), acc_dt),
                jnp.full((1, BT), neg),
                jnp.zeros((1, BT), jnp.float32))
        return jax.lax.fori_loop(0, n_blk, blk, init)

    def z_pass(g0, flip_irow):
        """Full J pass on the hypothetically flipped state: log z' only."""
        def blk(w, carry):
            zm, zs = carry
            half_b, iota_b = block_half(g0 + w, w, flip_irow)
            bE_b = beta2s * jnp.maximum(half_b, 0).astype(jnp.float32)
            return lse_update(zm, zs, bE_b, iota_b < N)

        init = (jnp.full((1, BT), neg), jnp.zeros((1, BT), jnp.float32))
        return jax.lax.fori_loop(0, n_blk, blk, init)

    def move(m, carry):
        E, coord, acc, zacc = carry
        active = coord < target                       # [1, BT]
        sigb_s[:] = sig_s[:].astype(mm_dt)
        g0 = m * (passes * n_blk)
        msalt = salt0 + m * salt_stride
        mrow, irow, dEw, zm, zs = race_pass(g0, msalt)
        logz = zm + jnp.log(zs)
        z_over_n = jnp.exp(logz - log_n)
        zacc = zacc + jnp.where(active, z_over_n, jnp.float32(0.0))
        iota_nb = jax.lax.broadcasted_iota(jnp.int32, (NP, BT), 0)
        onehot = iota_nb == irow
        zero = jnp.zeros((), acc_dt)
        if mode == "rrr":
            sigb_s[:] = jnp.where(onehot, -sig_s[:], sig_s[:]).astype(mm_dt)
            z2m, z2s = z_pass(g0 + n_blk, irow)
            logz2 = z2m + jnp.log(z2s)
            ua = to_uniform(random_bits((1, BT), msalt + n_blk))
            do = active & (jnp.log(ua) < logz - logz2)
            sig_s[:] = jnp.where(onehot & do, -sig_s[:], sig_s[:])
            E = E + jnp.where(do, dEw, zero)
            coord = coord + jnp.where(active, 1, 0)
            acc = acc + do.astype(jnp.int32)
        else:
            sig_s[:] = jnp.where(onehot & active, -sig_s[:], sig_s[:])
            E = E + jnp.where(active, dEw, zero)
            acc = acc + active.astype(jnp.int32)
        if wtm:
            coord = coord + jnp.where(active, jnp.exp(mrow),
                                      jnp.float32(0.0))
        elif mode == "bkl":
            u2 = to_uniform(random_bits((1, BT), msalt + n_blk))
            skip = _geom_skip(u2, z_over_n)
            coord = coord + jnp.where(active, skip + 1, 0)
        cs_out[pl.ds(m, 1), :] = coord
        es_out[pl.ds(m, 1), :] = E
        return E, coord, acc, zacc

    sig_s[:] = sigma_ref[:].astype(jnp.int32)
    E, coord, acc, zacc = jax.lax.fori_loop(
        0, n_moves, move,
        (E_ref[:], coord_ref[:], acc_ref[:], zacc_ref[:]))
    sigma_out[:] = sig_s[:].astype(jnp.int8)
    E_out[:] = E
    coord_out[:] = coord
    acc_out[:] = acc
    zacc_out[:] = zacc


@partial(jax.jit, static_argnames=("n_phys", "window", "block_chains",
                                   "n_moves", "mode"))
def _pallas_rejfree_stream_chunk(sigma, E, coord, acc, zacc, Jhbm, hcol,
                                 seed, beta2s, target, *, n_phys, window,
                                 block_chains, n_moves, mode):
    """sigma [B, NP] int8 (rows >= n_phys are +1 padding), Jhbm [NP, NP]
    int8 (integer couplings) or f32 (float couplings, f32 energies)."""
    sigmaT = sigma.T
    NP, B = sigmaT.shape
    BT = block_chains
    W = window
    grid = (B // BT,)
    flt = not jnp.issubdtype(Jhbm.dtype, jnp.integer)
    et = jnp.float32 if flt else jnp.int32
    ct = jnp.float32 if mode == "wtm" else jnp.int32
    mm_dt = jnp.float32 if flt else jnp.bfloat16
    kernel = partial(_rejfree_stream_kernel, N=n_phys, NP=NP, W=W, BT=BT,
                     n_moves=n_moves, mode=mode, flt=flt)
    row = pl.BlockSpec((1, BT), lambda j: (0, j), memory_space=pltpu.VMEM)
    stream = pl.BlockSpec((n_moves, BT), lambda j: (0, j),
                          memory_space=pltpu.VMEM)
    sig_out, E_out, coord_out, acc_out, zacc_out, cs, es = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),      # seed
            pl.BlockSpec(memory_space=pltpu.SMEM),      # beta2s
            pl.BlockSpec(memory_space=pltpu.SMEM),      # target
            pl.BlockSpec((NP, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),      # h
            pl.BlockSpec((NP, BT), lambda j: (0, j), memory_space=pltpu.VMEM),
            row,                                        # E
            row,                                        # coord
            row,                                        # acc
            row,                                        # zacc
            pl.BlockSpec(memory_space=pl.ANY),          # J stays in HBM
        ],
        out_specs=[
            pl.BlockSpec((NP, BT), lambda j: (0, j), memory_space=pltpu.VMEM),
            row, row, row, row, stream, stream,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NP, B), jnp.int8),
            jax.ShapeDtypeStruct((1, B), et),
            jax.ShapeDtypeStruct((1, B), ct),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.float32),
            jax.ShapeDtypeStruct((n_moves, B), ct),
            jax.ShapeDtypeStruct((n_moves, B), et),
        ],
        scratch_shapes=[
            pltpu.VMEM((NP, BT), jnp.int32),            # sig_s
            pltpu.VMEM((NP, BT), mm_dt),                # sigb_s (matmul rhs)
            pltpu.VMEM((2, W, NP), Jhbm.dtype),         # jbuf (double buffer)
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_INTERPRET,
    )(seed, beta2s, target, hcol, sigmaT, E[None, :].astype(et),
      coord[None, :].astype(ct), acc[None, :], zacc[None, :], Jhbm)
    return (sig_out.T, E_out[0], coord_out[0], acc_out[0], zacc_out[0],
            cs, es)


@partial(jax.jit, static_argnames=("n_phys", "window", "bt", "chunk_moves",
                                   "mode"))
def rejfree_stream_run(Jhbm, hcol, beta2s, sigma, E, coord, Es, seed0,
                       target, step, scale, *, n_phys, window, bt,
                       chunk_moves, mode):
    """Streamed analog of `rejfree_dense_run`: whole hookless run in ONE
    jit; sigma is the UNPADDED [B, N] state."""
    from ..samplers.bkl import _fill_checkpoints

    NP = Jhbm.shape[0]
    B = sigma.shape[0]
    pad = NP - n_phys
    if pad:
        sigma = jnp.concatenate(
            [sigma, jnp.ones((B, pad), jnp.int8)], axis=1)
    target_arr = target.reshape(1)
    acc = jnp.zeros((B,), jnp.int32)
    zacc = jnp.zeros((B,), jnp.float32)

    def cond(carry):
        coord = carry[2]
        return jnp.min(coord) < target

    def body(carry):
        sigma, E, coord, acc, zacc, Es, k = carry
        seed = (seed0 + k * jnp.int32(7919)).reshape(1)
        x_start = coord
        e_start = E.astype(Es.dtype) * scale
        sigma, E, coord, acc, zacc, cs, es = _pallas_rejfree_stream_chunk(
            sigma, E, coord, acc, zacc, Jhbm, hcol, seed, beta2s,
            target_arr, n_phys=n_phys, window=window, block_chains=bt,
            n_moves=chunk_moves, mode=mode)
        Es = _fill_checkpoints(Es, step, x_start, e_start, cs,
                               es.astype(Es.dtype) * scale)
        return sigma, E, coord, acc, zacc, Es, k + 1

    k0 = jnp.zeros((), jnp.int32)
    sigma, E, coord, acc, zacc, Es, _ = jax.lax.while_loop(
        cond, body, (sigma, E, coord, acc, zacc, Es, k0))
    return sigma[:, :n_phys], E, coord, Es, acc, zacc


# ---------------------------------------------------------------------------
# Sparse variant: ANY padded-neighbor-table Pairwise model (GraphRRG — the
# reference's flagship rejection-free workload — RRG/EA file graphs,
# Ising1D; integer or float couplings). This is the TPU answer to the
# reference's O(deg) caches (/root/reference/src/DeltaE.jl:63-230,299-410):
# the local-field table lives RESIDENT in VMEM across moves and each flip
# updates it with K full-table vector passes — no J matrix, no matmul, no
# gather:
#
#     lf += J_col_k * where(nbr_col_k == winner_row, d_row, 0)   (k < K)
#
# where nbr_col_k[j] = j's k-th neighbor and J_col_k[j] = its coupling (the
# Pairwise [N, K] tables used as INVERSE maps: j receives the winner's flip
# exactly when the winner is one of j's neighbors — symmetric edges are
# stored twice, so this is the exact lf scatter of models/pairwise.py:77-85
# with the scatter replaced by a broadcast compare). Per move the race, the
# log-sum-exp z, the flip, and the O(K) update are ALL fused [NP, BT] VPU
# passes (~15 + 3K), so the move cost is independent of any J matrix:
# measured on RRG N=1e4 K=3 (v5e, BT=128): rrr 4.3e6 moves*chains/s (10.3x
# the HBM-streamed dense kernel, whose 2 J passes/move sit at the DMA/MXU
# roofline — see docs/tpu.md); bkl/wtm 1.8-2.3e10 virtual iters*chains/s
# at beta=4 across runs (committed rows 1.8e10; ~8x the streamed kernel).
#
# Exactness: integer couplings keep int32 lf/E with NO drift (the update is
# integer); float couplings carry f32 lf with O(deg) rounding per applied
# move — the same budget as the XLA float path and the site kernel. The
# race/z math is the shifted log-domain of the other variants (exact at any
# beta).
# ---------------------------------------------------------------------------


def _rejfree_sparse_kernel(seed_ref, beta2s_ref, target_ref, nbr_ref, jc_ref,
                           sigma_ref, lf_ref, E_ref, coord_ref, acc_ref,
                           zacc_ref,
                           sigma_out, lf_out, E_out, coord_out, acc_out,
                           zacc_out, cs_out, es_out,
                           *, N, NP, K, BT, n_moves, mode, flt):
    """One chunk of `n_moves` race-selected moves on a [NP, BT] block with a
    RESIDENT local-field table.

    nbr_ref [NP, K] int32 (sentinel entries == N never match a winner row
    < N), jc_ref [NP, K] int32/f32 (0 on padding); lf_ref/lf_out [NP, BT]
    carry the table across chunks (integer models: exact int32, no drift).
    Rows >= N are frozen padding excluded from the race and from z."""
    wtm = mode == "wtm"
    seed_p = program_seed(seed_ref[0], pl.program_id(0))
    pltpu.prng_seed(seed_p)
    salt0 = seed_p * jnp.int32(1000003)
    beta2s = beta2s_ref[0]
    target = target_ref[0]
    iota_nb = jax.lax.broadcasted_iota(jnp.int32, (NP, BT), 0)
    valid = iota_nb < N
    lt = jnp.float32 if flt else jnp.int32
    inv32 = jnp.float32(2.0 ** -32)
    half_f = jnp.float32(0.5)
    inf = jnp.float32(3.0e38)
    log_n = jnp.log(jnp.float32(N))

    def to_uniform(rb):
        return rb.astype(jnp.float32) * inv32 + half_f

    # per-use column loads: a pre-sliced [NP, 1] value is lane-padded to a
    # full (8, 128) tile and held live across the whole move loop (2K such
    # hoisted columns cost 2K * NP*BT*4 bytes of register spill — the SAT
    # kernel OOMed exactly this way at Cmax=27, see ops/sat_pallas.py);
    # in-loop ref loads are transient and reuse registers
    def nbr_col(k):
        return nbr_ref[:, k][:, None]

    def jc_col(k):
        return jc_ref[:, k][:, None]

    def logz_of(sig, lf):
        """Shifted log-sum-exp of -bE over valid rows: (bE, log z)."""
        half = (sig.astype(lt) if flt else sig) * lf
        bE = beta2s * jnp.maximum(half, 0).astype(jnp.float32)
        m = jnp.min(jnp.where(valid, bE, inf), axis=0, keepdims=True)
        zs = jnp.sum(jnp.where(valid, jnp.exp(m - bE), 0.0),
                     axis=0, keepdims=True)
        return half, bE, jnp.log(zs) - m

    def move(m, carry):
        sig, lf, E, coord, acc, zacc = carry
        active = coord < target                       # [1, BT]
        half, bE, logz = logz_of(sig, lf)
        u = to_uniform(random_bits((NP, BT), salt0 + 3 * m))
        score = jnp.where(valid, jnp.log(-jnp.log(u)) + bE, inf)
        mrow = jnp.min(score, axis=0, keepdims=True)  # [1, BT]
        irow = jnp.min(jnp.where(score == mrow, iota_nb, NP),
                       axis=0, keepdims=True)
        onehot = iota_nb == irow                      # exact single winner
        dE_i = jnp.sum(jnp.where(onehot, 2 * half, jnp.zeros((), lt)),
                       axis=0, keepdims=True, dtype=lt)
        z_over_n = jnp.exp(logz - log_n)
        zacc = zacc + jnp.where(active, z_over_n, jnp.float32(0.0))
        # winner's spin row -> the O(deg) lf update via inverse columns
        d_row = jnp.sum(jnp.where(onehot, -2 * sig, 0), axis=0,
                        keepdims=True).astype(lt)     # [1, BT]
        delta = jnp.zeros((NP, BT), lt)
        for k in range(K):
            delta = delta + jc_col(k) * jnp.where(
                nbr_col(k) == irow, d_row, jnp.zeros((), lt))
        if mode == "rrr":
            # staged z': the hypothetically flipped state's table is just
            # lf + delta (and the winner's own row is unchanged: no self
            # coupling) — no second pass over anything but the table
            sig2 = jnp.where(onehot, -sig, sig)
            _, _, logz2 = logz_of(sig2, lf + delta)
            ua = to_uniform(random_bits((1, BT), salt0 + 3 * m + 1))
            do = active & (jnp.log(ua) < logz - logz2)
            sig = jnp.where(onehot & do, -sig, sig)
            lf = lf + jnp.where(do, delta, jnp.zeros((), lt))
            E = E + jnp.where(do, dE_i, jnp.zeros((), lt))
            coord = coord + jnp.where(active, 1, 0)
            acc = acc + do.astype(jnp.int32)
        else:
            sig = jnp.where(onehot & active, -sig, sig)
            lf = lf + jnp.where(active, delta, jnp.zeros((), lt))
            E = E + jnp.where(active, dE_i, jnp.zeros((), lt))
            acc = acc + active.astype(jnp.int32)
        if wtm:
            coord = coord + jnp.where(active, jnp.exp(mrow),
                                      jnp.float32(0.0))
        elif mode == "bkl":
            u2 = to_uniform(random_bits((1, BT), salt0 + 3 * m + 2))
            skip = _geom_skip(u2, z_over_n)
            coord = coord + jnp.where(active, skip + 1, 0)
        cs_out[pl.ds(m, 1), :] = coord
        es_out[pl.ds(m, 1), :] = E
        return sig, lf, E, coord, acc, zacc

    sig0 = sigma_ref[:].astype(jnp.int32)
    sig, lf, E, coord, acc, zacc = jax.lax.fori_loop(
        0, n_moves, move,
        (sig0, lf_ref[:], E_ref[:], coord_ref[:], acc_ref[:], zacc_ref[:]))
    sigma_out[:] = sig.astype(jnp.int8)
    lf_out[:] = lf
    E_out[:] = E
    coord_out[:] = coord
    acc_out[:] = acc
    zacc_out[:] = zacc


@partial(jax.jit, static_argnames=("n_phys", "block_chains", "n_moves",
                                   "mode"))
def _pallas_rejfree_sparse_chunk(sigma, lfT, E, coord, acc, zacc, nbr, jc,
                                 seed, beta2s, target, *, n_phys,
                                 block_chains, n_moves, mode):
    """sigma [B, NP] int8 (rows >= n_phys are +1 padding), lfT [NP, B]
    int32/f32 (site-major local fields, pad rows 0), nbr/jc [NP, K]."""
    sigmaT = sigma.T
    NP, B = sigmaT.shape
    K = nbr.shape[1]
    BT = block_chains
    grid = (B // BT,)
    flt = not jnp.issubdtype(jc.dtype, jnp.integer)
    et = jnp.float32 if flt else jnp.int32
    ct = jnp.float32 if mode == "wtm" else jnp.int32
    kernel = partial(_rejfree_sparse_kernel, N=n_phys, NP=NP, K=K, BT=BT,
                     n_moves=n_moves, mode=mode, flt=flt)
    row = pl.BlockSpec((1, BT), lambda j: (0, j), memory_space=pltpu.VMEM)
    blk = pl.BlockSpec((NP, BT), lambda j: (0, j), memory_space=pltpu.VMEM)
    stream = pl.BlockSpec((n_moves, BT), lambda j: (0, j),
                          memory_space=pltpu.VMEM)
    (sig_out, lf_out, E_out, coord_out, acc_out, zacc_out,
     cs, es) = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),      # seed
            pl.BlockSpec(memory_space=pltpu.SMEM),      # beta2s
            pl.BlockSpec(memory_space=pltpu.SMEM),      # target
            pl.BlockSpec((NP, K), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),      # nbr
            pl.BlockSpec((NP, K), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),      # jc
            blk,                                        # sigma
            blk,                                        # lf
            row, row, row, row,
        ],
        out_specs=[blk, blk, row, row, row, row, stream, stream],
        out_shape=[
            jax.ShapeDtypeStruct((NP, B), jnp.int8),
            jax.ShapeDtypeStruct((NP, B), et),
            jax.ShapeDtypeStruct((1, B), et),
            jax.ShapeDtypeStruct((1, B), ct),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.float32),
            jax.ShapeDtypeStruct((n_moves, B), ct),
            jax.ShapeDtypeStruct((n_moves, B), et),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=_INTERPRET,
    )(seed, beta2s, target, nbr, jc, sigmaT, lfT,
      E[None, :].astype(et), coord[None, :].astype(ct),
      acc[None, :], zacc[None, :])
    return (sig_out.T, lf_out, E_out[0], coord_out[0], acc_out[0],
            zacc_out[0], cs, es)


@partial(jax.jit, static_argnames=("np_",))
def _sparse_prep(model, sigma, np_):
    """Padded ([B, NP] spins, [NP, B] local fields) for a sparse-kernel
    chunk call (module-level jit; see samplers/common.init_lfT)."""
    lfT = jax.vmap(model.local_fields)(sigma).T
    dt = (jnp.int32 if jnp.issubdtype(lfT.dtype, jnp.integer)
          else jnp.float32)
    lfT = lfT.astype(dt)
    pad = np_ - sigma.shape[1]
    if pad:
        B = sigma.shape[0]
        sigma = jnp.concatenate(
            [sigma, jnp.ones((B, pad), jnp.int8)], axis=1)
        lfT = jnp.concatenate([lfT, jnp.zeros((pad, B), dt)], axis=0)
    return sigma, lfT


@partial(jax.jit, static_argnames=("n_phys", "bt", "chunk_moves", "mode"))
def rejfree_sparse_run(nbr, jc, lfT, beta2s, sigma, E, coord, Es, seed0,
                       target, step, scale, *, n_phys, bt, chunk_moves,
                       mode):
    """Sparse analog of `rejfree_dense_run`: whole hookless run in ONE jit.
    sigma is the UNPADDED [B, N] state; lfT the matching [NP, B] local-field
    table (site-major, computed once by the caller)."""
    from ..samplers.bkl import _fill_checkpoints

    NP = nbr.shape[0]
    B = sigma.shape[0]
    pad = NP - n_phys
    if pad:
        sigma = jnp.concatenate(
            [sigma, jnp.ones((B, pad), jnp.int8)], axis=1)
        lfT = jnp.concatenate(
            [lfT, jnp.zeros((pad, B), lfT.dtype)], axis=0)
    target_arr = target.reshape(1)
    acc = jnp.zeros((B,), jnp.int32)
    zacc = jnp.zeros((B,), jnp.float32)

    def cond(carry):
        coord = carry[3]
        return jnp.min(coord) < target

    def body(carry):
        sigma, lfT, E, coord, acc, zacc, Es, k = carry
        seed = (seed0 + k * jnp.int32(7919)).reshape(1)
        x_start = coord
        e_start = E.astype(Es.dtype) * scale
        sigma, lfT, E, coord, acc, zacc, cs, es = \
            _pallas_rejfree_sparse_chunk(
                sigma, lfT, E, coord, acc, zacc, nbr, jc, seed, beta2s,
                target_arr, n_phys=n_phys, block_chains=bt,
                n_moves=chunk_moves, mode=mode)
        Es = _fill_checkpoints(Es, step, x_start, e_start, cs,
                               es.astype(Es.dtype) * scale)
        return sigma, lfT, E, coord, acc, zacc, Es, k + 1

    k0 = jnp.zeros((), jnp.int32)
    sigma, lfT, E, coord, acc, zacc, Es, _ = jax.lax.while_loop(
        cond, body, (sigma, lfT, E, coord, acc, zacc, Es, k0))
    return sigma[:, :n_phys], E, coord, Es, acc, zacc


# ---------------------------------------------------------------------------
# 3-spin variant: PSpin3 regular hypergraphs (GraphPSpin3 — the reference's
# p-spin model, /root/reference/src/graphs/PSpin3.jl:62-145, whose lfields
# cache updates over unique triangle neighbors). The sparse kernel's
# inverse-column trick extends to hyperedges by keeping K RESIDENT PRODUCT
# TABLES q_k[j] = sigma_{p1(j,k)} * sigma_{p2(j,k)} beside the cavity sum
# c_j = sum_k q_k[j] (half = sigma_j * c_j; dE = 2*half):
#
#   touched_k = (p1_k == winner_row) | (p2_k == winner_row)
#   c  += -2 * q_k * touched_k          (the partner product negates)
#   q_k = where(touched_k, -q_k, q_k)
#
# — a flip of the winner w negates exactly the products containing w, so c
# stays exact int32 with NO gathers (the per-row partner spin that a naive
# update would have to gather is exactly what q_k caches). The winner's own
# row is untouched (its products don't involve sigma_w). Race / z / modes /
# checkpoint streams are identical to the sparse kernel.
# ---------------------------------------------------------------------------


def _rejfree_pspin_kernel(*refs, N, NP, K, BT, n_moves, mode):
    """One chunk of `n_moves` race-selected moves on a [NP, BT] block with
    resident cavity/product tables.

    refs (positional, K-dependent): seed, beta2s, target (SMEM), p1/p2
    [NP, K] int32 partner tables (pad rows point at N — a winner row is
    always < N so padding never matches), sigma, c [NP, BT], K product
    tables q_k [NP, BT] (INPUT-ONLY: the run loop re-derives c/q from the
    updated spins each chunk, so their output windows — which Mosaic
    double-buffers at grid > 1 — cost no VMEM), E/coord/acc/zacc rows;
    then the outputs + the (coord, E) checkpoint streams. Rows >= N are
    frozen padding excluded from the race and z."""
    (seed_ref, beta2s_ref, target_ref, p1_ref, p2_ref, sigma_ref,
     c_ref) = refs[:7]
    q_refs = refs[7:7 + K]
    E_ref, coord_ref, acc_ref, zacc_ref = refs[7 + K:11 + K]
    outs = refs[11 + K:]
    sigma_out = outs[0]
    (E_out, coord_out, acc_out, zacc_out, cs_out, es_out) = outs[1:]
    wtm = mode == "wtm"
    seed_p = program_seed(seed_ref[0], pl.program_id(0))
    pltpu.prng_seed(seed_p)
    salt0 = seed_p * jnp.int32(1000003)
    beta2s = beta2s_ref[0]
    target = target_ref[0]
    iota_nb = jax.lax.broadcasted_iota(jnp.int32, (NP, BT), 0)
    valid = iota_nb < N
    inv32 = jnp.float32(2.0 ** -32)
    half_f = jnp.float32(0.5)
    inf = jnp.float32(3.0e38)
    log_n = jnp.log(jnp.float32(N))

    def to_uniform(rb):
        return rb.astype(jnp.float32) * inv32 + half_f

    # per-use column loads (see the sparse kernel note above)
    def p1_col(k):
        return p1_ref[:, k][:, None]

    def p2_col(k):
        return p2_ref[:, k][:, None]

    def logz_of(sig, c):
        half = sig * c
        bE = beta2s * jnp.maximum(half, 0).astype(jnp.float32)
        m = jnp.min(jnp.where(valid, bE, inf), axis=0, keepdims=True)
        zs = jnp.sum(jnp.where(valid, jnp.exp(m - bE), 0.0),
                     axis=0, keepdims=True)
        return half, bE, jnp.log(zs) - m

    def move(m, carry):
        sig, c, qs, E, coord, acc, zacc = carry
        active = coord < target                       # [1, BT]
        half, bE, logz = logz_of(sig, c)
        u = to_uniform(random_bits((NP, BT), salt0 + 3 * m))
        score = jnp.where(valid, jnp.log(-jnp.log(u)) + bE, inf)
        mrow = jnp.min(score, axis=0, keepdims=True)
        irow = jnp.min(jnp.where(score == mrow, iota_nb, NP),
                       axis=0, keepdims=True)
        onehot = iota_nb == irow
        dE_i = jnp.sum(jnp.where(onehot, 2 * half, 0), axis=0,
                       keepdims=True, dtype=jnp.int32)
        z_over_n = jnp.exp(logz - log_n)
        zacc = zacc + jnp.where(active, z_over_n, jnp.float32(0.0))
        touched = [((p1_col(k) == irow) | (p2_col(k) == irow))
                   for k in range(K)]
        delta = jnp.zeros((NP, BT), jnp.int32)
        for k in range(K):
            delta = delta - 2 * jnp.where(touched[k], qs[k], 0)
        if mode == "rrr":
            sig2 = jnp.where(onehot, -sig, sig)
            _, _, logz2 = logz_of(sig2, c + delta)
            ua = to_uniform(random_bits((1, BT), salt0 + 3 * m + 1))
            do = active & (jnp.log(ua) < logz - logz2)
            sig = jnp.where(onehot & do, -sig, sig)
            c = c + jnp.where(do, delta, 0)
            qs = [jnp.where(touched[k] & do, -qs[k], qs[k])
                  for k in range(K)]
            E = E + jnp.where(do, dE_i, 0)
            coord = coord + jnp.where(active, 1, 0)
            acc = acc + do.astype(jnp.int32)
        else:
            sig = jnp.where(onehot & active, -sig, sig)
            c = c + jnp.where(active, delta, 0)
            qs = [jnp.where(touched[k] & active, -qs[k], qs[k])
                  for k in range(K)]
            E = E + jnp.where(active, dE_i, 0)
            acc = acc + active.astype(jnp.int32)
        if wtm:
            coord = coord + jnp.where(active, jnp.exp(mrow),
                                      jnp.float32(0.0))
        elif mode == "bkl":
            u2 = to_uniform(random_bits((1, BT), salt0 + 3 * m + 2))
            skip = _geom_skip(u2, z_over_n)
            coord = coord + jnp.where(active, skip + 1, 0)
        cs_out[pl.ds(m, 1), :] = coord
        es_out[pl.ds(m, 1), :] = E
        return sig, c, qs, E, coord, acc, zacc

    sig0 = sigma_ref[:].astype(jnp.int32)
    qs0 = [q_refs[k][:] for k in range(K)]
    sig, c, qs, E, coord, acc, zacc = jax.lax.fori_loop(
        0, n_moves, move,
        (sig0, c_ref[:], qs0, E_ref[:], coord_ref[:], acc_ref[:],
         zacc_ref[:]))
    sigma_out[:] = sig.astype(jnp.int8)
    E_out[:] = E
    coord_out[:] = coord
    acc_out[:] = acc
    zacc_out[:] = zacc


@partial(jax.jit, static_argnames=("n_phys", "block_chains", "n_moves",
                                   "mode"))
def _pallas_rejfree_pspin_chunk(sigma, cT, qTs, E, coord, acc, zacc, p1, p2,
                                seed, beta2s, target, *, n_phys,
                                block_chains, n_moves, mode):
    """sigma [B, NP] int8 (rows >= n_phys are +1 padding), cT [NP, B] i32
    cavity sums, qTs: K-tuple of [NP, B] i32 product tables, p1/p2
    [NP, K]."""
    sigmaT = sigma.T
    NP, B = sigmaT.shape
    K = p1.shape[1]
    BT = block_chains
    grid = (B // BT,)
    ct = jnp.float32 if mode == "wtm" else jnp.int32
    kernel = partial(_rejfree_pspin_kernel, N=n_phys, NP=NP, K=K, BT=BT,
                     n_moves=n_moves, mode=mode)
    row = pl.BlockSpec((1, BT), lambda j: (0, j), memory_space=pltpu.VMEM)
    blk = pl.BlockSpec((NP, BT), lambda j: (0, j), memory_space=pltpu.VMEM)
    stream = pl.BlockSpec((n_moves, BT), lambda j: (0, j),
                          memory_space=pltpu.VMEM)
    tbl = pl.BlockSpec((NP, K), lambda j: (0, 0), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=([pl.BlockSpec(memory_space=pltpu.SMEM)] * 3   # scalars
                  + [tbl, tbl, blk, blk] + [blk] * K
                  + [row, row, row, row]),
        out_specs=[blk] + [row, row, row, row, stream, stream],
        out_shape=([jax.ShapeDtypeStruct((NP, B), jnp.int8)]
                   + [jax.ShapeDtypeStruct((1, B), jnp.int32),
                      jax.ShapeDtypeStruct((1, B), ct),
                      jax.ShapeDtypeStruct((1, B), jnp.int32),
                      jax.ShapeDtypeStruct((1, B), jnp.float32),
                      jax.ShapeDtypeStruct((n_moves, B), ct),
                      jax.ShapeDtypeStruct((n_moves, B), jnp.int32)]),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=_INTERPRET,
    )(seed, beta2s, target, p1, p2, sigmaT, cT, *qTs,
      E[None, :].astype(jnp.int32), coord[None, :].astype(ct),
      acc[None, :], zacc[None, :])
    sig_out = outs[0]
    E_out, coord_out, acc_out, zacc_out, cs, es = outs[1:]
    return (sig_out.T, E_out[0], coord_out[0], acc_out[0],
            zacc_out[0], cs, es)


@partial(jax.jit, static_argnames=("np_",))
def _pspin_prep(model, sigma, np_):
    """Padded ([B, NP] spins, [NP, B] cavity sums, K-tuple of [NP, B]
    product tables) for a pspin-kernel run (XLA gathers, once per run)."""
    s = sigma.astype(jnp.int32)                       # [B, N]
    pairs = s[:, model.A]                             # [B, N, K, 2]
    q = pairs[..., 0] * pairs[..., 1]                 # [B, N, K]
    c = q.sum(axis=2)                                 # [B, N]
    B, N, K = q.shape
    pad = np_ - N
    if pad:
        sigma = jnp.concatenate(
            [sigma, jnp.ones((B, pad), jnp.int8)], axis=1)
        c = jnp.concatenate([c, jnp.zeros((B, pad), jnp.int32)], axis=1)
        q = jnp.concatenate([q, jnp.zeros((B, pad, K), jnp.int32)], axis=1)
    qTs = tuple(q[:, :, k].T for k in range(K))
    return sigma, c.T.astype(jnp.int32), qTs


def _pspin_tables_of(sigma_pad, A, n_phys, np_):
    """(cT [NP, B], K-tuple of qT [NP, B]) re-derived from the padded
    spins (traceable: runs once per chunk inside the run loop)."""
    s = sigma_pad[:, :n_phys].astype(jnp.int32)       # [B, N]
    pairs = s[:, A]                                   # [B, N, K, 2]
    q = pairs[..., 0] * pairs[..., 1]                 # [B, N, K]
    c = q.sum(axis=2)
    B, N, K = q.shape
    pad = np_ - N
    if pad:
        c = jnp.concatenate([c, jnp.zeros((B, pad), jnp.int32)], axis=1)
        q = jnp.concatenate([q, jnp.zeros((B, pad, K), jnp.int32)], axis=1)
    return c.T.astype(jnp.int32), tuple(q[:, :, k].T for k in range(K))


@partial(jax.jit, static_argnames=("n_phys", "bt", "chunk_moves", "mode"))
def rejfree_pspin_run(p1, p2, A, beta2s, sigma, E, coord, Es, seed0,
                      target, step, scale, *, n_phys, bt, chunk_moves,
                      mode):
    """PSpin3 analog of `rejfree_sparse_run`: whole hookless run in ONE
    jit; sigma is the PADDED [B, NP] state (prep pads). The cavity and
    product tables are re-derived from the spins at every chunk boundary
    (one XLA gather pass), so the kernel carries them only WITHIN a chunk
    and their double-buffered output windows cost no VMEM at grid > 1."""
    from ..samplers.bkl import _fill_checkpoints

    B = sigma.shape[0]
    np_ = sigma.shape[1]
    target_arr = target.reshape(1)
    acc = jnp.zeros((B,), jnp.int32)
    zacc = jnp.zeros((B,), jnp.float32)

    def cond(carry):
        coord = carry[2]
        return jnp.min(coord) < target

    def body(carry):
        sigma, E, coord, acc, zacc, Es, k = carry
        cT, qTs = _pspin_tables_of(sigma, A, n_phys, np_)
        seed = (seed0 + k * jnp.int32(7919)).reshape(1)
        x_start = coord
        e_start = E.astype(Es.dtype) * scale
        sigma, E, coord, acc, zacc, cs, es = \
            _pallas_rejfree_pspin_chunk(
                sigma, cT, qTs, E, coord, acc, zacc, p1, p2, seed, beta2s,
                target_arr, n_phys=n_phys, block_chains=bt,
                n_moves=chunk_moves, mode=mode)
        Es = _fill_checkpoints(Es, step, x_start, e_start, cs,
                               es.astype(Es.dtype) * scale)
        return sigma, E, coord, acc, zacc, Es, k + 1

    k0 = jnp.zeros((), jnp.int32)
    sigma, E, coord, acc, zacc, Es, _ = jax.lax.while_loop(
        cond, body, (sigma, E, coord, acc, zacc, Es, k0))
    return sigma[:, :n_phys], E, coord, Es, acc, zacc


#: pspin-kernel caps: (K + 2) resident [NP, BT] i32 tables + ~10 temps at
#: BT=128 must fit the 128MB scoped limit
_PSPIN_N_MAX = 8192
_PSPIN_K_MAX = 8


def _pspin_rejfree_ok(model) -> bool:
    from ..models.pspin import PSpin3

    return (isinstance(model, PSpin3)
            and 9 <= model.N <= _PSPIN_N_MAX
            and model.K <= _PSPIN_K_MAX)


#: dense rejfree J budget: bf16 [NP, NP] must fit VMEM beside the state
#: and stream buffers (128MB scoped limit); above it, the HBM-streamed
#: variant takes over
_DENSE_NP_MAX = 4096
#: lattice -> dense crossover: below this N the MXU matmul lf (one
#: [NP, NP] x [NP, BT] bf16 dot, ~0.2us at N=512) beats the ~14 VPU
#: roll/select passes of the roll-identity lf; per-move cost is O(N^2/MXU)
#: vs O(N * passes / VPU), crossing near N ~ 45 * (MXU/VPU rate) ~ 4k —
#: kept at 2048 to stay clearly on the winning side (measured r3)
_LATTICE_DENSE_MAX = 2048
#: streamed-variant caps: int8 J in HBM <= 1 GB / f32 J in HBM <= 1 GB
_STREAM_NP_MAX = 32768
_STREAM_NP_MAX_F = 16384
#: streamed row-block windows (int8 jbuf 2*W*NP vs f32 4x larger)
_STREAM_W = 512
_STREAM_W_F = 128

#: VMEM working-set target for auto block-chain selection: under the 100MB
#: scoped limit with headroom for Mosaic temporaries
_VMEM_BUDGET = 88 * 1024 * 1024


def auto_block_chains(model, chains: int, *, chunk_moves: int = 1024) -> int:
    """Chain-block width for the rejection-free kernels.

    Measured on v5e (round 4, /tmp bt probes -> docs/tpu.md): every variant
    except the FLOAT HBM stream is compute-bound PER CHAIN — the per-move
    matmul (dense/int-stream: at the MXU roofline, e.g. int8-stream rrr
    N=1e4 runs 91% of the overlapped DMA+MXU speed-of-light at BT=128 and
    BT=512 measured 0.95x aggregate) or the VPU race passes (lattice/
    sparse) scale with the block width, so widening buys nothing: BT=128
    stays optimal. The f32 stream is the exception: its J window is 4
    B/element, making the move DMA-bound (measured rrr f32 N=1e4: BT=512 =
    3.7x the BT=128 aggregate), so it takes the widest block whose VMEM
    working set NP*BT*(8 + 4) + jbuf + streams fits."""
    from ..models.dense import FullyConnected

    N = model.N
    flt = (isinstance(model, FullyConnected)
           and not jnp.issubdtype(model.J.dtype, jnp.integer))
    if not flt:
        return 128
    W = _STREAM_W_F
    NP = -(-N // W) * W
    fixed = 2 * W * NP * 4
    per_bt = 12 * NP + 16 * chunk_moves
    for bt in (512, 256, 128):
        if (bt <= chains and chains % bt == 0
                and fixed + per_bt * bt <= _VMEM_BUDGET):
            return bt
    return 128


#: id(J)-keyed memo for the dense eligibility host checks (avoids an O(N^2)
#: device->host pull per bklMC/wtmMC call)
_DENSE_OK_CACHE: dict = {}
#: id(Jd)-keyed memo for small-lattice densification (host-side transform)
_LATTICE_DENSE_CACHE: dict = {}


def _dense_rejfree_ok(model) -> bool:
    from ..samplers.common import bound_cache_put

    integer = jnp.issubdtype(model.J.dtype, jnp.integer)
    if integer:
        if not (jnp.issubdtype(model.h.dtype, jnp.integer)
                and 8 <= model.N <= _STREAM_NP_MAX):
            return False
    elif not 8 <= model.N <= _STREAM_NP_MAX_F:
        return False
    key = id(model.J)
    ent = _DENSE_OK_CACHE.get(key)
    if ent is None or ent[0] is not model.J:
        if integer:
            J = np.asarray(model.J).astype(np.int64)
            ok = bool(np.abs(J).max() <= 127
                      and np.abs(J).sum(axis=1).max() < (1 << 24))
        else:
            ok = bool(np.all(np.isfinite(np.asarray(model.J)))
                      and np.all(np.isfinite(np.asarray(model.h))))
        ent = (model.J, ok)
        bound_cache_put(_DENSE_OK_CACHE, key, ent)
    return ent[1]


#: sparse-kernel caps: the move loop keeps ~12 live [NP, BT] arrays (lf,
#: sig, race temps, delta) — N*BT*48B + io must fit the 128MB scoped limit
_SPARSE_N_MAX = 16384
_SPARSE_K_MAX = 16

#: id(J)-keyed memo for the sparse float-finiteness host check
_SPARSE_OK_CACHE: dict = {}


def _sparse_rejfree_ok(model) -> bool:
    from ..models.pairwise import Pairwise
    from ..samplers.common import bound_cache_put

    if not (isinstance(model, Pairwise)
            and 8 <= model.N <= _SPARSE_N_MAX
            and model.K <= _SPARSE_K_MAX):
        return False
    if jnp.issubdtype(model.J.dtype, jnp.integer):
        return jnp.issubdtype(model.h.dtype, jnp.integer)
    key = id(model.J)
    ent = _SPARSE_OK_CACHE.get(key)
    if ent is None or ent[0] is not model.J:
        ok = bool(np.all(np.isfinite(np.asarray(model.J)))
                  and np.all(np.isfinite(np.asarray(model.h))))
        ent = (model.J, ok)
        bound_cache_put(_SPARSE_OK_CACHE, key, ent)
    return ent[1]


def pallas_rejfree_eligible(model, chains: int) -> bool:
    from ..models.dense import FullyConnected
    from ..models.lattice import LatticeEA
    from ..models.pairwise import Pairwise

    from ..samplers.common import concrete_model

    if chains % 128 != 0 or not concrete_model(model):
        return False
    if isinstance(model, LatticeEA):
        if (jnp.issubdtype(model.Jd.dtype, jnp.integer)
                and jnp.issubdtype(model.h.dtype, jnp.integer)
                and model.N >= 8):
            return True
        # float lattices (GraphEANormal) ride the sparse kernel instead
        return _sparse_rejfree_ok(model)
    if isinstance(model, FullyConnected):
        return _dense_rejfree_ok(model)
    if isinstance(model, Pairwise):
        return _sparse_rejfree_ok(model)
    if _pspin_rejfree_ok(model):
        return True
    from .sat_pallas import sat_rejfree_ok
    if sat_rejfree_ok(model):
        return True
    from .perc_pallas import perc_rejfree_ok
    if perc_rejfree_ok(model):
        return True
    from .quant_pallas import quant_ring_eligible
    return quant_ring_eligible(model, chains)


class PallasRejectionFree:
    """Reusable rejection-free runner for an integer LatticeEA (fields OK),
    a FullyConnected model — integer |J| <= 127 (VMEM-resident J up to
    N=4096, HBM-streamed beyond, up to N=32768) or float couplings
    (HBM-streamed f32, up to N=16384) — or ANY sparse Pairwise model up to
    N=16384, K<=16 (resident-lf inverse-column kernel, int or float J).

    mode = "bkl" (virtual-iteration coordinate), "wtm" (global time) or
    "rrr" (one iteration per move, staged z/z' acceptance)."""

    def __init__(self, model, beta: float, mode: str, *,
                 block_chains: int = 128, chunk_moves: int = 1024):
        from ..models.dense import FullyConnected
        from ..models.lattice import LatticeEA
        from ..models.pairwise import Pairwise

        assert mode in ("bkl", "wtm", "rrr")
        assert model.N >= 8, "sublane tiling needs N >= 8"
        self.beta2s = jnp.asarray([2.0 * beta * model.scale], jnp.float32)
        self.model, self.mode = model, mode
        self.block_chains = block_chains
        self.chunk_moves = chunk_moves
        self.flt = False
        from .sat_pallas import sat_rejfree_ok, _SatTables
        if sat_rejfree_ok(model):
            # K-SAT: resident bit-packed clause-count words + partner-
            # compare updates (ops/sat_pallas.py); dE = lf directly (not
            # 2*half), so the kernel takes beta*scale, not 2*beta*scale
            self.betas = jnp.asarray([beta * model.scale], jnp.float32)
            self.tab = _SatTables(model)
            self.NP = self.tab.NP
            self.kind = "sat"
            return
        from .perc_pallas import _PercTables, perc_rejfree_ok
        if perc_rejfree_ok(model):
            # perceptrons: resident [P, BT] stability table + the
            # stabilities-delta matmul identity (ops/perc_pallas.py); the
            # identity yields 2*dE, so the kernel takes beta*scale/2
            self.tab = _PercTables(model)
            self.betah = jnp.asarray([0.5 * beta * model.scale],
                                     jnp.float32)
            self.cparam = jnp.asarray([self.tab.c], jnp.float32)
            self.NP = self.tab.NP
            self.flt = self.tab.flt
            self.kind = "perc"
            return
        if _pspin_rejfree_ok(model):
            NP = -(-model.N // 8) * 8
            A = np.asarray(model.A)
            p1 = np.full((NP, model.K), model.N, np.int32)
            p2 = np.full((NP, model.K), model.N, np.int32)
            p1[:model.N] = A[:, :, 0]
            p2[:model.N] = A[:, :, 1]
            self.p1, self.p2 = jnp.asarray(p1), jnp.asarray(p2)
            self.NP = NP
            self.kind = "pspin"
            return
        int_lattice = (isinstance(model, LatticeEA)
                       and jnp.issubdtype(model.Jd.dtype, jnp.integer)
                       and jnp.issubdtype(model.h.dtype, jnp.integer))
        if isinstance(model, Pairwise) and not int_lattice \
                and not isinstance(model, FullyConnected):
            # includes FLOAT lattices (GraphEANormal): the roll/dense
            # variants are integer-only, the sparse kernel is not
            assert _sparse_rejfree_ok(model), \
                "sparse rejfree needs a Pairwise model, N<=16384, K<=16"
            self.flt = not jnp.issubdtype(model.J.dtype, jnp.integer)
            NP = -(-model.N // 8) * 8
            nbr = np.full((NP, model.K), model.N, np.int32)
            nbr[:model.N] = np.asarray(model.neigh)
            jd = np.float32 if self.flt else np.int32
            jc = np.zeros((NP, model.K), jd)
            jc[:model.N] = np.asarray(model.J).astype(jd)
            self.nbr = jnp.asarray(nbr)
            self.jc = jnp.asarray(jc)
            self.NP = NP
            self.kind = "sparse"
            return
        if isinstance(model, LatticeEA):
            assert jnp.issubdtype(model.Jd.dtype, jnp.integer)
            assert jnp.issubdtype(model.h.dtype, jnp.integer)
            md = self._lattice_densified(model)
            if md is not None:
                # small lattice: ride the MXU matmul-lf race kernel on the
                # densified couplings (same integer grid/scale — densify()
                # preserves both, models/dense.py:144-152 — so the int32
                # energy bookkeeping is bit-identical); ~2x the roll-identity
                # kernel at N=512 (the lf rolls dominated its move cost)
                model = md
            else:
                Jp, Jm = _build_dir_tables(model)
                self.Jp, self.Jm = jnp.asarray(Jp), jnp.asarray(Jm)
                self.hcol = jnp.asarray(np.asarray(model.h, np.int32)
                                        .reshape(model.N, 1))
                self.L, self.D = model.L, model.D
                self.kind = "lattice"
                return
        assert isinstance(model, FullyConnected), type(model)
        assert _dense_rejfree_ok(model), \
            "dense rejfree needs integer |J|<=127 N<=32768 or float N<=16384"
        integer = jnp.issubdtype(model.J.dtype, jnp.integer)
        if integer and model.N <= _DENSE_NP_MAX:
            NP = -(-model.N // 128) * 128
            J = np.zeros((NP, NP), np.float32)
            J[:model.N, :model.N] = np.asarray(model.J)
            h = np.zeros((NP, 1), np.int32)
            h[:model.N, 0] = np.asarray(model.h)
            self.Jb = jnp.asarray(J, jnp.bfloat16)
            self.hcol = jnp.asarray(h)
            self.kind = "dense"
            return
        # HBM-streamed: pad N to a window multiple; J stays int8 (cast to
        # bf16 post-DMA, exact) or f32 (float couplings -> f32 energies)
        self.flt = not integer
        W = _STREAM_W_F if self.flt else _STREAM_W
        NP = -(-model.N // W) * W
        jd = np.float32 if self.flt else np.int8
        J = np.zeros((NP, NP), jd)
        J[:model.N, :model.N] = np.asarray(model.J).astype(jd)
        h = np.zeros((NP, 1), np.float32 if self.flt else np.int32)
        h[:model.N, 0] = np.asarray(model.h)
        self.Jhbm = jnp.asarray(J)
        self.hcol = jnp.asarray(h)
        self.window = W
        self.kind = "stream"

    @staticmethod
    def _lattice_densified(model):
        """Densified couplings for a small integer lattice (or None): the
        MXU race variant wins below _LATTICE_DENSE_MAX. Cached by Jd
        identity — densify() is a host-side O(N*2D) python loop."""
        from ..models.dense import densify
        from ..samplers.common import bound_cache_put

        if model.N > _LATTICE_DENSE_MAX:
            return None
        # h identity matters: field variants share the Jd object and the
        # densified model carries h
        key = (id(model.Jd), id(model.h))
        ent = _LATTICE_DENSE_CACHE.get(key)
        if ent is None or ent[0] is not model.Jd or ent[2] is not model.h:
            try:
                md = densify(model)
            except AssertionError:
                md = None
            if md is not None and not (
                    jnp.issubdtype(md.J.dtype, jnp.integer)
                    and jnp.issubdtype(md.h.dtype, jnp.integer)
                    and _dense_rejfree_ok(md)):
                md = None
            ent = (model.Jd, md, model.h)
            bound_cache_put(_LATTICE_DENSE_CACHE, key, ent)
        return ent[1]

    def run(self, sigma, E, coord, Es, seed, target, step, scale):
        """Whole hookless run (while_loop over kernel chunks, one jit).
        Returns (sigma, E, coord, Es, acc, zacc): acc = applied flips per
        chain, zacc = summed z/N over moves (acceptance diagnostics)."""
        if self.kind == "sat":
            from .sat_pallas import _pad_sigma, rejfree_sat_run

            t = self.tab
            m = self.model
            return rejfree_sat_run(
                t.TL, t.P, m.A, m.L, m.T, self.betas,
                _pad_sigma(sigma, t.NP), E, coord, Es, seed, target, step,
                scale, n_phys=m.N, cmax=t.Cmax, k_=t.K,
                bt=self.block_chains, chunk_moves=self.chunk_moves,
                mode=self.mode, bits=t.bits, spw=t.spw, nw=t.nw)
        if self.kind == "sparse":
            from ..samplers.common import init_lfT

            return rejfree_sparse_run(
                self.nbr, self.jc, init_lfT(self.model, sigma), self.beta2s,
                sigma, E, coord, Es, seed, target, step, scale,
                n_phys=self.model.N, bt=self.block_chains,
                chunk_moves=self.chunk_moves, mode=self.mode)
        if self.kind == "perc":
            from .perc_pallas import rejfree_perc_run
            from .sat_pallas import _pad_sigma

            t = self.tab
            return rejfree_perc_run(
                t.xiT, t.xi, t.xi_i8, self.betah, self.cparam,
                _pad_sigma(sigma, t.NP), E, coord, Es, seed, target, step,
                scale, n_phys=self.model.N, p_phys=self.model.P,
                bt=self.block_chains, chunk_moves=self.chunk_moves,
                mode=self.mode, fam=t.fam)
        if self.kind == "pspin":
            from .sat_pallas import _pad_sigma

            return rejfree_pspin_run(
                self.p1, self.p2, self.model.A, self.beta2s,
                _pad_sigma(sigma, self.NP), E, coord,
                Es, seed, target, step, scale, n_phys=self.model.N,
                bt=self.block_chains, chunk_moves=self.chunk_moves,
                mode=self.mode)
        if self.kind == "lattice":
            return rejfree_run(
                self.Jp, self.Jm, self.hcol, self.beta2s, sigma, E, coord,
                Es, seed, target, step, scale, L=self.L, D=self.D,
                bt=self.block_chains, chunk_moves=self.chunk_moves,
                mode=self.mode)
        if self.kind == "dense":
            return rejfree_dense_run(
                self.Jb, self.hcol, self.beta2s, sigma, E, coord, Es, seed,
                target, step, scale, n_phys=self.model.N,
                bt=self.block_chains, chunk_moves=self.chunk_moves,
                mode=self.mode)
        return rejfree_stream_run(
            self.Jhbm, self.hcol, self.beta2s, sigma, E, coord, Es, seed,
            target, step, scale, n_phys=self.model.N, window=self.window,
            bt=self.block_chains, chunk_moves=self.chunk_moves,
            mode=self.mode)

    def chunk(self, sigma, E, coord, *, seed, target, acc=None, zacc=None):
        """Advance every chain by `chunk_moves` rejection-free moves.
        Returns (sigma, E, coord, acc, zacc, coord_stream, E_stream)."""
        tgt = jnp.asarray([target],
                          jnp.float32 if self.mode == "wtm" else jnp.int32)
        B = sigma.shape[0]
        if acc is None:
            acc = jnp.zeros((B,), jnp.int32)
        if zacc is None:
            zacc = jnp.zeros((B,), jnp.float32)
        if self.kind == "sat":
            from .sat_pallas import _sat_prep, _pallas_rejfree_sat_chunk

            t = self.tab
            sigp, wTs = _sat_prep(self.model, sigma, t.NP, t.Cmax, t.bits,
                                  t.spw, t.nw)
            sig, E, coord, acc, zacc, cs, es = \
                _pallas_rejfree_sat_chunk(
                    sigp, wTs, E, coord, acc, zacc, t.TL, t.P,
                    jnp.asarray([seed], jnp.int32), self.betas, tgt,
                    n_phys=self.model.N, cmax=t.Cmax, k_=t.K,
                    block_chains=self.block_chains,
                    n_moves=self.chunk_moves, mode=self.mode, bits=t.bits,
                    spw=t.spw, nw=t.nw)
            return sig[:, :self.model.N], E, coord, acc, zacc, cs, es
        if self.kind == "sparse":
            sigp, lfT = _sparse_prep(self.model, sigma, self.NP)
            sig, lfT, E, coord, acc, zacc, cs, es = \
                _pallas_rejfree_sparse_chunk(
                    sigp, lfT, E, coord, acc, zacc, self.nbr, self.jc,
                    jnp.asarray([seed], jnp.int32), self.beta2s, tgt,
                    n_phys=self.model.N, block_chains=self.block_chains,
                    n_moves=self.chunk_moves, mode=self.mode)
            return sig[:, :self.model.N], E, coord, acc, zacc, cs, es
        if self.kind == "perc":
            from .perc_pallas import (_pallas_rejfree_perc_chunk,
                                      _perc_delta_of)
            from .sat_pallas import _pad_sigma

            t = self.tab
            sigp = _pad_sigma(sigma, t.NP)
            deltaT = _perc_delta_of(sigp, t.xi_i8, self.model.N, t.PP)
            sig, E, coord, acc, zacc, cs, es = \
                _pallas_rejfree_perc_chunk(
                    sigp, deltaT, E, coord, acc, zacc, t.xiT, t.xi,
                    jnp.asarray([seed], jnp.int32), self.betah,
                    self.cparam, tgt, n_phys=self.model.N,
                    p_phys=self.model.P, block_chains=self.block_chains,
                    n_moves=self.chunk_moves, mode=self.mode, fam=t.fam)
            return sig[:, :self.model.N], E, coord, acc, zacc, cs, es
        if self.kind == "pspin":
            sigp, cT, qTs = _pspin_prep(self.model, sigma, self.NP)
            sig, E, coord, acc, zacc, cs, es = \
                _pallas_rejfree_pspin_chunk(
                    sigp, cT, qTs, E, coord, acc, zacc, self.p1, self.p2,
                    jnp.asarray([seed], jnp.int32), self.beta2s, tgt,
                    n_phys=self.model.N, block_chains=self.block_chains,
                    n_moves=self.chunk_moves, mode=self.mode)
            return sig[:, :self.model.N], E, coord, acc, zacc, cs, es
        if self.kind == "lattice":
            return _pallas_rejfree_chunk(
                sigma, E, coord, acc, zacc, self.Jp, self.Jm, self.hcol,
                jnp.asarray([seed], jnp.int32), self.beta2s, tgt,
                L=self.L, D=self.D, block_chains=self.block_chains,
                n_moves=self.chunk_moves, mode=self.mode)
        NP = (self.Jb if self.kind == "dense" else self.Jhbm).shape[0]
        if NP > self.model.N:
            sigma = jnp.concatenate(
                [sigma, jnp.ones((B, NP - self.model.N), jnp.int8)], axis=1)
        if self.kind == "dense":
            sig, E, coord, acc, zacc, cs, es = _pallas_rejfree_dense_chunk(
                sigma, E, coord, acc, zacc, self.Jb, self.hcol,
                jnp.asarray([seed], jnp.int32), self.beta2s, tgt,
                n_phys=self.model.N, block_chains=self.block_chains,
                n_moves=self.chunk_moves, mode=self.mode)
        else:
            sig, E, coord, acc, zacc, cs, es = _pallas_rejfree_stream_chunk(
                sigma, E, coord, acc, zacc, self.Jhbm, self.hcol,
                jnp.asarray([seed], jnp.int32), self.beta2s, tgt,
                n_phys=self.model.N, window=self.window,
                block_chains=self.block_chains,
                n_moves=self.chunk_moves, mode=self.mode)
        return sig[:, :self.model.N], E, coord, acc, zacc, cs, es
