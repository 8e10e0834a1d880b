"""Pallas TPU kernel for the EA-lattice checkerboard sweep — the
speed-of-light path of the framework.

The XLA sweep (samplers/sweep.py) round-trips sigma and the local-field aux
through HBM on every color step and pays threefry/rbg key machinery for its
uniforms. This kernel instead:

* keeps each chain block's spins resident in VMEM for ALL `n_sweeps` sweeps
  (HBM traffic = one read + one write of sigma per call);
* draws acceptance randomness from the per-core hardware PRNG
  (pltpu.prng_seed / prng_random_bits);
* recomputes local fields on the fly from in-VMEM rolls (no aux tensor).

Layout is the crucial TPU decision: spins are [N, BT] — CHAINS ON LANES,
SITES ON SUBLANES — so the periodic-neighbor rolls are sublane-axis rotates
(cheap register/addressing moves) instead of cross-lane shuffles, every
per-site constant (couplings, parity, wrap masks) is a [N, 1] column
broadcast across lanes, and all arithmetic is 32-bit (Mosaic's rotate only
handles 32-bit data). Wraparound on the flattened lattice uses the
two-roll + wrap-mask identity per direction.

Restricted to integer-coupling LatticeEA (the benchmark-headline family;
integer external fields ride as the last column of the Jp direction table —
the AddFields composition, /root/reference/src/graphs/AddFields.jl:16-123);
everything else uses the XLA path. Acceptance matches
metropolis_accept (/root/reference/src/RRRMC.jl:39): accept iff dE <= 0 or
u < exp(-beta dE), with u compared in the signed-int32 domain (no u32->f32
cast on TPU).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .prng import interpret_params, program_seed, random_bits

#: set RRRMC_PALLAS_INTERPRET=1 to run the kernel in the TPU interpreter
#: (CPU-testable; used by the test suite). The interpreter's
#: pltpu.prng_random_bits is all-zeros, so acceptance randomness comes from
#: ops/prng.py's counter hash there.
_INTERPRET = interpret_params()


def _build_dir_tables(model):
    """[N, D] coupling columns: Jp[:, d] = J on edge i -> i+stride_d,
    Jm[:, d] = J on edge i-stride_d -> i."""
    Jd = np.asarray(model.Jd)
    D = model.D
    n = model.N
    Jp = np.empty((n, D), dtype=np.int32)
    Jm = np.empty((n, D), dtype=np.int32)
    for d in range(D):
        Jp[:, d] = Jd[d].reshape(n)
        Jm[:, d] = np.roll(Jd[d], 1, axis=d).reshape(n)
    return Jp, Jm


def _sweep_kernel(seed_ref, ns_ref, beta2s_ref, th_ref, sigma_ref, jp_ref,
                  jm_ref, sigma_out, dE_out, *, L, D, BT, max_half,
                  has_field=False):
    """th_ref [max_half] SMEM: precomputed int32 acceptance thresholds for
    half = sigma*lf in 1..max_half (half <= 0 always accepts). The integer
    local field takes at most 2*D*|J|max+|h| values, so the acceptance
    probability is a tiny table — selects replace the per-element exp chain
    (exp + scale + clip + 2 converts on [N, BT] per color step)."""
    N = L ** D
    seed_p = program_seed(seed_ref[0], pl.program_id(0))
    pltpu.prng_seed(seed_p)
    salt0 = seed_p * jnp.int32(1000003)
    n_sweeps = ns_ref[0]    # dynamic trip count: one compile for any length
    beta2s = beta2s_ref[0]  # used only when the table is disabled

    idx = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)
    parity = jnp.zeros((N, 1), jnp.int32)
    strides = [L ** (D - 1 - d) for d in range(D)]
    coords = []
    for s in strides:
        c = (idx // s) % L
        coords.append(c)
        parity = parity + c
    even = (parity % 2) == 0           # [N, 1], broadcasts across chains

    wrap_hi = [c == (L - 1) for c in coords]
    wrap_lo = [c == 0 for c in coords]

    def roll_up(x, k):
        """x shifted so out[i] = x[(i + k) % N] (sublane-axis rotate;
        measured faster than static slice+concat on v5e)."""
        return pltpu.roll(x, N - k, axis=0)

    def local_fields(sig):
        # has_field: jp_ref is [N, D+1] with the external-field column h in
        # column D; h is flip-invariant so the roll identity needs no other
        # change. Static flag: the field-free headline family pays zero
        # extra vector work (the add costs ~5% of the EA-3D benchmark).
        if has_field:
            lf = jnp.zeros((N, BT), jnp.int32) + jp_ref[:, D][:, None]
        else:
            lf = jnp.zeros((N, BT), jnp.int32)
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

    def color_step(sig, dE_acc, mask, salt):
        half = sig * local_fields(sig)             # dE_int = 2 * half
        # integer-domain acceptance: r ~ U(int32) < p*2^32 - 2^31 <=> u < p,
        # thresholds from the tiny SMEM table (half <= 0 forces accept)
        rbits = random_bits((N, BT), salt)
        if max_half:   # small level set: thresholds by select chain
            thresh = jnp.full((N, BT), th_ref[0], jnp.int32)
            for v in range(2, max_half + 1):
                thresh = jnp.where(half >= v, th_ref[v - 1], thresh)
        else:          # wide integer range (fixed-point couplings): exp
            p = jnp.exp(-beta2s * half.astype(jnp.float32))
            thresh = jnp.clip(
                p * jnp.float32(4294967296.0) - jnp.float32(2147483648.0),
                jnp.float32(-2147483648.0),
                jnp.float32(2147483520.0)).astype(jnp.int32)
        acc = mask & ((half <= 0) | (rbits < thresh))
        sig = jnp.where(acc, -sig, sig)
        dE_acc = dE_acc + 2 * jnp.sum(
            jnp.where(acc, half, 0), axis=0, keepdims=True,
            dtype=jnp.int32)  # explicit: x64 mode must not widen the carry
        return sig, dE_acc

    def one_sweep(sw, carry):
        sig, dE_acc = carry
        sig, dE_acc = color_step(sig, dE_acc, even, salt0 + 2 * sw)
        sig, dE_acc = color_step(sig, dE_acc, ~even, salt0 + 2 * sw + 1)
        return sig, dE_acc

    sig0 = sigma_ref[:].astype(jnp.int32)
    dE0 = jnp.zeros((1, BT), jnp.int32)
    sig, dE = jax.lax.fori_loop(0, n_sweeps, one_sweep, (sig0, dE0))
    sigma_out[:] = sig.astype(jnp.int8)
    dE_out[:] = dE


def accept_thresholds(beta2s: float, max_half: int) -> np.ndarray:
    """int32 thresholds th[v-1] for half = v in 1..max_half: accept iff
    rbits < th where rbits ~ U(int32) — i.e. with prob e^(-beta2s*v)."""
    v = np.arange(1, max_half + 1, dtype=np.float64)
    p = np.exp(-float(beta2s) * v)
    return np.clip(p * 4294967296.0 - 2147483648.0,
                   -2147483648.0, 2147483520.0).astype(np.int32)


@partial(jax.jit, static_argnames=("L", "D", "block_chains", "max_half",
                                   "has_field"))
def _pallas_sweep(sigma, E, Jp, Jm, seed, n_sweeps, beta2s, th, *, L, D,
                  block_chains, max_half, has_field=False):
    # transposes stay inside the jit: the kernel layout is [sites, chains]
    sigmaT = sigma.T
    N, B = sigmaT.shape
    BT = block_chains
    grid = (B // BT,)
    kernel = partial(_sweep_kernel, L=L, D=D, BT=BT, max_half=max_half,
                     has_field=has_field)
    sig_out, dE = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),      # seed
            pl.BlockSpec(memory_space=pltpu.SMEM),      # n_sweeps
            pl.BlockSpec(memory_space=pltpu.SMEM),      # beta2s
            pl.BlockSpec(memory_space=pltpu.SMEM),      # thresholds
            pl.BlockSpec((N, BT), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),      # Jp [N, D]
            pl.BlockSpec(memory_space=pltpu.VMEM),      # Jm [N, D]
        ],
        out_specs=[
            pl.BlockSpec((N, BT), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BT), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, B), jnp.int8),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_INTERPRET,
    )(seed, n_sweeps, beta2s, th, sigmaT, Jp, Jm)
    return sig_out.T, E + dE[0]


class PallasSweeper:
    """Reusable pallas-sweep runner: builds the direction tables once and
    keeps them on device; each call is a single jitted dispatch."""

    def __init__(self, model, beta: float, block_chains: int = 0):
        from ..models.lattice import LatticeEA

        assert isinstance(model, LatticeEA), "pallas sweep requires LatticeEA"
        assert jnp.issubdtype(model.Jd.dtype, jnp.integer), \
            "pallas sweep requires integer couplings"
        assert model.L % 2 == 0, "checkerboard requires even L"
        assert jnp.issubdtype(model.h.dtype, jnp.integer), \
            "integer-domain fields only"
        Jp, Jm = _build_dir_tables(model)
        hcol = np.asarray(model.h, np.int32).reshape(-1, 1)
        self.has_field = bool(np.any(hcol))
        self.Jp = jnp.asarray(np.concatenate([Jp, hcol], axis=1)
                              if self.has_field else Jp)
        self.Jm = jnp.asarray(Jm)
        self.beta2s = jnp.asarray([2.0 * beta * model.scale], jnp.float32)
        # select-chain thresholds only pay off for small level sets;
        # fixed-point couplings (|lf| up to ~1e5 grid units) keep the exp
        # path (max_half=0 disables the table)
        mh = int((np.abs(Jp).sum(axis=1) + np.abs(Jm).sum(axis=1)
                  + np.abs(hcol[:, 0])).max())
        self.max_half = mh if mh <= 64 else 0
        self.th = jnp.asarray(accept_thresholds(
            2.0 * beta * model.scale, max(self.max_half, 1)))
        self.L, self.D = model.L, model.D
        self.block_chains = block_chains

    def __call__(self, sigma, E, *, seed: int, n_sweeps: int):
        """sigma [B, N] int8, E [B] int32 -> (sigma', E'), exact int32 E
        tracking. B must be a multiple of block_chains (chains on lanes);
        block_chains=0 auto-picks the widest of 512/384/256/128 that tiles B
        and fits VMEM (BT=512 measured 5.0e10 vs 3.4e10 at 128 on the
        EA-3D L=16 benchmark; >=1024 fails to compile)."""
        B, N = sigma.shape
        bt = self.block_chains
        if not bt:
            # ~20 B/chain/site: double-buffered int8 sigma windows in+out
            # + the in-kernel int32 sig + int32 lf temporaries
            from .tiling import auto_block_chains
            bt = auto_block_chains(B, 20 * N)
        assert B % bt == 0, (B, bt)
        return _pallas_sweep(sigma, E, self.Jp, self.Jm,
                             jnp.asarray([seed], jnp.int32),
                             jnp.asarray([n_sweeps], jnp.int32), self.beta2s,
                             self.th, L=self.L, D=self.D,
                             block_chains=bt, max_half=self.max_half,
                             has_field=self.has_field)


def sweep_ea_pallas(model, beta: float, sigma, E, *, seed: int,
                    n_sweeps: int, block_chains: int = 0):
    """One-shot convenience wrapper around PallasSweeper."""
    return PallasSweeper(model, beta, block_chains)(
        sigma, E, seed=seed, n_sweeps=n_sweeps)
