"""Pallas TPU kernel for single-site Metropolis on sparse Pairwise models.

The XLA single-site path costs ~70us/move at any batch size: every move is a
handful of tiny gather/scatter/RNG ops, each paying full op-dispatch latency
inside the scan. This kernel executes one move as a few [1, BT] vector-row
operations with ALL state resident in VMEM:

* the site schedule is precomputed on the host and read per move from SMEM
  (one scalar read); neighbor ids and couplings are SMEM scalar tables;
* spins and local fields live in VMEM [N, BT] scratch; the move touches one
  row (dE, acceptance) plus K neighbor rows (lf scatter) via scalar-indexed
  ref slices — no gathers;
* acceptance bits come from the hardware PRNG, compared in int32.

Semantics: each chain is an exact Metropolis chain; the SITE SCHEDULE IS
SHARED across the chain batch (site choice is state-independent, so sharing
preserves every chain's law — the same argument as the dense sweep's shared
permutation, samplers/dense_sweep.py). Use the XLA path when fully
independent per-chain site sequences matter.

Integer-coupling Pairwise models keep exact int32 energies; float-coupling
models (GraphRRGNormal / GraphEANormal — the reference's continuous-J
regime, /root/reference/src/graphs/RRG.jl:504-627) run the same moves with
f32 local fields and energies (each flip's dE comes from the incrementally
maintained f32 lf; the O(deg) updates accumulate f32 rounding in lf bounded
by the run length — same budget as the XLA float path). Fields enter through
the local-field init. ~0.5us/move for a full chain block vs ~70us on the
XLA path. Emits per-call accepted-move counts (MCState.accepted stays
correct on the kernel route).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .prng import interpret_params, program_seed, random_bits
from .tiling import auto_block_chains

_INTERPRET = interpret_params()


def _site_kernel(seed_ref, nm_ref, betas_ref, sites_ref, neigh_ref, J_ref,
                 sigma_ref, lf_ref, sigma_out, lf_out, dE_out, acc_out,
                 sig_s, lf_s, dE_s, *, N, K, BT, flt):
    """sites_ref [MAX_MOVES] SMEM; neigh_ref/J_ref [N*K] SMEM (row-major,
    padded with site N -> the scratch sink row). flt: f32 lf/dE (float
    couplings) vs exact int32."""
    seed_p = program_seed(seed_ref[0], pl.program_id(0))
    pltpu.prng_seed(seed_p)
    salt0 = seed_p * jnp.int32(1000003)
    n_moves = nm_ref[0]
    beta_s = betas_ref[0]

    sig_s[pl.ds(0, N), :] = sigma_ref[:].astype(jnp.int32)
    lf_s[pl.ds(0, N), :] = lf_ref[:]
    dt = jnp.float32 if flt else jnp.int32
    dE_s[:] = jnp.zeros((1, BT), dt)

    def move(m, acc_cnt):
        i = sites_ref[m]
        s_row = sig_s[pl.ds(i, 1), :]                   # [1, BT]
        s_val = s_row.astype(dt)
        dE = 2 * s_val * lf_s[pl.ds(i, 1), :]
        p = jnp.exp(-beta_s * dE.astype(jnp.float32))
        th = jnp.clip(
            p * jnp.float32(4294967296.0) - jnp.float32(2147483648.0),
            jnp.float32(-2147483648.0),
            jnp.float32(2147483520.0)).astype(jnp.int32)
        rbits = random_bits((1, BT), salt0 + m)
        acc = (dE <= 0) | (rbits < th)
        d = jnp.where(acc, -2 * s_val, jnp.zeros((), dt))   # [1, BT]
        sig_s[pl.ds(i, 1), :] = jnp.where(acc, -s_row, s_row)
        for k in range(K):                              # unrolled
            nb = neigh_ref[i * K + k]       # padded entries point at N
            lf_s[pl.ds(nb, 1), :] = (lf_s[pl.ds(nb, 1), :]
                                     + J_ref[i * K + k] * d)
        dE_s[:] = dE_s[:] + jnp.where(acc, dE, jnp.zeros((), dt))
        return acc_cnt + acc.astype(jnp.int32)

    acc_cnt = jax.lax.fori_loop(0, n_moves, move,
                                jnp.zeros((1, BT), jnp.int32))
    sigma_out[:] = sig_s[pl.ds(0, N), :].astype(jnp.int8)
    lf_out[:] = lf_s[pl.ds(0, N), :]
    dE_out[:] = dE_s[:]
    acc_out[:] = acc_cnt


@partial(jax.jit, static_argnames=("K", "block_chains"))
def _pallas_site(sigma, lfT, E, acc, sites, neigh_flat, J_flat, seed,
                 n_moves, beta_s, *, K, block_chains):
    sigmaT = sigma.T
    N, B = sigmaT.shape
    BT = block_chains
    grid = (B // BT,)
    flt = not jnp.issubdtype(J_flat.dtype, jnp.integer)
    dt = jnp.float32 if flt else jnp.int32
    kernel = partial(_site_kernel, N=N, K=K, BT=BT, flt=flt)
    sig_out, lf_out, dE, acc_new = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # seed
            pl.BlockSpec(memory_space=pltpu.SMEM),   # n_moves
            pl.BlockSpec(memory_space=pltpu.SMEM),   # beta_s
            pl.BlockSpec(memory_space=pltpu.SMEM),   # sites
            pl.BlockSpec(memory_space=pltpu.SMEM),   # neigh flat [N*K]
            pl.BlockSpec(memory_space=pltpu.SMEM),   # J flat [N*K]
            pl.BlockSpec((N, BT), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, BT), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((N, BT), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, BT), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BT), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BT), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, B), jnp.int8),
            jax.ShapeDtypeStruct((N, B), dt),
            jax.ShapeDtypeStruct((1, B), dt),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((N + 1, BT), jnp.int32),   # sig_s (+ padding row)
            pltpu.VMEM((N + 1, BT), dt),          # lf_s (padding row = sink)
            pltpu.VMEM((1, BT), dt),              # dE_s
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_INTERPRET,
    )(seed, n_moves, beta_s, sites, neigh_flat, J_flat, sigmaT, lfT)
    return sig_out.T, E + dE[0], lf_out, acc + acc_new[0]


class PallasSiteSampler:
    """Reusable single-site Metropolis runner for a Pairwise model (integer
    couplings: exact int32 energies; float couplings: f32 lf/E).

    The neighbor-table padding convention (sentinel site N, J=0) routes
    padded updates to the scratch's extra sink row, exactly like the
    sentinel-scatter idiom of the XLA path (core/model.flip_spin)."""

    #: moves per kernel dispatch (bounded by the SMEM site table, 64 KB)
    MAX_MOVES = 16384

    def __init__(self, model, beta: float, *, block_chains: int = 0):
        from ..models.pairwise import Pairwise

        assert isinstance(model, Pairwise), "requires a Pairwise model"
        self.model = model
        self.N, self.K = model.N, model.K
        self.flt = not jnp.issubdtype(model.J.dtype, jnp.integer)
        jd = jnp.float32 if self.flt else jnp.int32
        self.neigh_flat = model.neigh.reshape(-1).astype(jnp.int32)
        self.J_flat = model.J.reshape(-1).astype(jd)
        self.beta_s = jnp.asarray([beta * model.scale], jnp.float32)
        self.block_chains = block_chains

    def __call__(self, sigma, E, key, *, seed: int, n_moves: int, lfT=None,
                 acc=None, sweep_schedule: bool = False):
        """sigma [B, N] int8, E [B] int32/f32, key: jax PRNG key for the
        shared site schedule. Returns (sigma', E', lfT', key', acc'):
        acc accumulates accepted-move counts across calls.

        sweep_schedule=True makes the shared schedule a concatenation of
        fresh random PERMUTATIONS of [0, N): every consecutive block of N
        moves attempts each site exactly once — sweepMC semantics on the
        site kernel (a composition of single-site kernels in a fixed order
        preserves the Boltzmann law exactly like the color-mask sweep; the
        order is shared across the chain batch as usual). Permutation
        phase is carried across the internal chunking so sweeps spanning a
        chunk boundary stay exact."""
        B, N = sigma.shape
        bt = self.block_chains or auto_block_chains(B, 30 * (N + 1))
        if lfT is None:
            from ..samplers.common import init_lfT
            lfT = init_lfT(self.model, sigma)
        if self.flt:
            lfT = lfT.astype(jnp.float32)
        if acc is None:
            acc = jnp.zeros((B,), jnp.int32)
        done = 0
        if sweep_schedule:
            import numpy as np

            def perm_of(s_idx):
                """Deterministic permutation for global sweep s_idx: a sweep
                split across chunks regenerates IDENTICAL entries."""
                rng = np.random.default_rng(
                    ((seed & 0x7FFFFFFF) << 20) ^ s_idx)
                return rng.permutation(N)

        while done < n_moves:
            m = min(self.MAX_MOVES, n_moves - done)
            if sweep_schedule:
                s0, s1 = done // N, (done + m - 1) // N
                stream = np.concatenate(
                    [perm_of(s) for s in range(s0, s1 + 1)])
                off = done - s0 * N
                sites_np = np.zeros(self.MAX_MOVES, np.int32)
                sites_np[:m] = stream[off:off + m].astype(np.int32)
                sites = jnp.asarray(sites_np)
            else:
                key, ks = jax.random.split(key)
                # fixed-size site bucket: one compile for every chunk length
                sites = jax.random.randint(ks, (self.MAX_MOVES,), 0, N,
                                           jnp.int32)
            sigma, E, lfT, acc = _pallas_site(
                sigma, lfT, E, acc, sites, self.neigh_flat, self.J_flat,
                jnp.asarray([seed + done], jnp.int32),
                jnp.asarray([m], jnp.int32), self.beta_s,
                K=self.K, block_chains=bt)
            done += m
        return sigma, E, lfT, key, acc
