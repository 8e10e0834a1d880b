"""Pallas TPU rejection-free kernels (BKL/WTM/RRR) for binary perceptrons.

The reference serves PercStep/PercLinear/PercXEntr with incrementally-updated
pattern stabilities Delta_a = xi_a . sigma plus ArraySet "marginal" sets so a
serial move only touches boundary patterns
(/root/reference/src/graphs/PercStep.jl:30-43,108-179, PercLinear.jl,
PercXEntr.jl). TPU-native the whole move is MXU-shaped (the stabilities-delta
identity of models/perceptron.py delta_all):

    dE_i = (tot + sigma_i * (xi^T g)_i) / 2,
    g_a  = gm_a - gp_a,   tot = sum_a (gm_a + gp_a),

where gm_a = loss(Delta_a - 2) - loss(Delta_a) and gp_a the +2 shift — both
ELEMENTWISE in Delta (a flip moves every stability by exactly +-2, xi = +-1):

* step:   gm = (Delta == 1),          gp = -(Delta == -1)       (int, exact)
* linear: gm = (Delta < 2),           gp = -(Delta < 0)         (int, exact)
* xentr:  gm/gp from the stable softplus sp(x) = max(x,0) + log1p(e^-|x|)
          of -c(Delta -+ 2), c = 2 lam / sqrt(N)                (f32)

so no loss-table gather is ever needed in-kernel. Per move: one elementwise
g pass over the RESIDENT [PP, BT] stability table, one [NP, PP] x [PP, BT]
MXU matmul for the full dE vector, the shared exponential race
(ops/rejfree_pallas.py), and one [PP, NP] x [NP, BT] matmul that applies the
winner's rank-1 stability update (rhs = -2 sigma at the winner's one-hot row;
bf16 exact: +-1/+-2 operands, f32 accumulation, |Delta| <= N < 2^24).
Integer families keep exact int32 stabilities/energies; xentr carries f32.
The stability table is kernel INPUT-only — the run loop re-derives it from
the updated spins each chunk (one xi @ sigma matmul), so its output windows
cost no VMEM.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .prng import interpret_params, program_seed, random_bits
from .rejfree_pallas import _geom_skip
from .sat_pallas import _pad_sigma as _pad_sigma_perc

_INTERPRET = interpret_params()

#: caps: xi resident in BOTH orientations (bf16) + [PP, BT] stability table
#: + [NP, BT] race temps
_PERC_N_MAX = 4096
_PERC_P_MAX = 8192
_PERC_NP_PROD_MAX = 16 * 1024 * 1024


#: id(xi)-keyed memo for family detection
_PERC_FAM_CACHE: dict = {}


def perc_family(model):
    """"step" / "linear" / "xentr" / None — recovered from the loss table
    (the model stores only the table; the three reference families are the
    only constructors, models/perceptron.py:93-125)."""
    from ..models.perceptron import Perceptron

    if not isinstance(model, Perceptron):
        return None
    key = id(model.xi)
    ent = _PERC_FAM_CACHE.get(key)
    if ent is not None and ent[0] is model.xi:
        return ent[1]
    from ..samplers.common import bound_cache_put

    tab = np.asarray(model.loss_table)
    d = np.arange(-model.N, model.N + 1, 2)
    fam = None
    if np.issubdtype(tab.dtype, np.integer):
        if np.array_equal(tab, (d < 0).astype(tab.dtype)):
            fam = "step"
        elif np.array_equal(tab, np.where(d < 0, (-d - 1) // 2 + 1,
                                          0).astype(tab.dtype)):
            fam = "linear"
    else:
        # xentr: log1p(exp(-c d)) for some c > 0, recovered exactly from
        # the d = -1 entry (tab = log(1 + e^c) there) and verified against
        # the whole table
        c = 0.0
        i = np.searchsorted(d, -1)
        if d[i] == -1 and tab[i] > 0:
            c = float(np.log(np.expm1(tab[i])))
            x = -c * d.astype(np.float64)
            ref = np.where(x > 60, x, np.log1p(np.exp(np.minimum(x, 60))))
            if c > 0 and np.allclose(tab, ref, rtol=1e-4, atol=1e-6):
                fam = "xentr"
    ent = (model.xi, fam, float(c) if fam == "xentr" else 0.0)
    bound_cache_put(_PERC_FAM_CACHE, key, ent)
    return fam


def perc_rejfree_ok(model) -> bool:
    from ..models.perceptron import Perceptron

    return (isinstance(model, Perceptron)
            and 8 <= model.N <= _PERC_N_MAX
            and 1 <= model.P <= _PERC_P_MAX
            and model.N * model.P <= _PERC_NP_PROD_MAX
            and perc_family(model) is not None)


class _PercTables:
    """xiT [NP, PP] (dE matmul), xi [PP, NP] (stability update), both
    zero-padded; bf16 for the integer families (exact: +-1 entries, f32
    accumulation), f32 for xentr (its g vector is continuous — a bf16
    matmul would round the flip costs); c = 2 lam / sqrt(N) for xentr."""

    def __init__(self, model):
        fam = perc_family(model)
        assert fam is not None
        self.fam = fam
        N, P = model.N, model.P
        NP = -(-N // 128) * 128
        PP = -(-P // 128) * 128
        self.flt = fam == "xentr"
        mm_dt = jnp.float32 if self.flt else jnp.bfloat16
        xi = np.zeros((PP, NP), np.float32)
        xi[:P, :N] = np.asarray(model.xi)
        self.xi = jnp.asarray(xi, mm_dt)
        self.xiT = jnp.asarray(xi.T.copy(), mm_dt)
        self.xi_i8 = jnp.asarray(xi[:P, :N], jnp.int8)
        self.NP, self.PP = NP, PP
        self.c = float(_PERC_FAM_CACHE[id(model.xi)][2]) if self.flt else 0.0


def _softplus(x):
    return jnp.maximum(x, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(x)))


def _rejfree_perc_kernel(seed_ref, betah_ref, target_ref, c_ref,
                         xiT_ref, xi_ref, sigma_ref, delta_ref,
                         E_ref, coord_ref, acc_ref, zacc_ref,
                         sigma_out, E_out, coord_out, acc_out, zacc_out,
                         cs_out, es_out,
                         *, N, NP, P, PP, BT, n_moves, mode, fam):
    """One chunk of `n_moves` race-selected moves on a [NP, BT] chain block
    with the RESIDENT [PP, BT] stability table.

    betah_ref[0] = beta * scale / 2 (the dE identity yields 2*dE for the
    integer families); rows >= N / patterns >= P are zero padding (xi = 0
    there, so padded stabilities stay 0 and contribute only a constant that
    cancels in gm/gp... they DO NOT: gm/gp at Delta = 0 can be nonzero, so
    padded pattern rows are masked out of tot and g explicitly)."""
    wtm = mode == "wtm"
    flt = fam == "xentr"
    seed_p = program_seed(seed_ref[0], pl.program_id(0))
    pltpu.prng_seed(seed_p)
    salt0 = seed_p * jnp.int32(1000003)
    betah = betah_ref[0]
    target = target_ref[0]
    c = c_ref[0]
    lt = jnp.float32 if flt else jnp.int32
    inv32 = jnp.float32(2.0 ** -32)
    half_f = jnp.float32(0.5)
    inf = jnp.float32(3.0e38)
    log_n = jnp.log(jnp.float32(N))

    def to_uniform(rb):
        return rb.astype(jnp.float32) * inv32 + half_f

    def iota_n():
        return jax.lax.broadcasted_iota(jnp.int32, (NP, BT), 0)

    def pvalid():
        return jax.lax.broadcasted_iota(jnp.int32, (PP, BT), 0) < P

    def g_tot(delta):
        """(g [PP, BT], tot [1, BT]) from the resident stabilities."""
        if fam == "step":
            gm = jnp.where(delta == 1, 1, 0)
            gp = jnp.where(delta == -1, -1, 0)
        elif fam == "linear":
            gm = jnp.where(delta < 2, 1, 0)
            gp = jnp.where(delta < 0, -1, 0)
        else:
            d = delta.astype(jnp.float32)    # stabilities stay exact int32
            sp0 = _softplus(-c * d)
            gm = _softplus(-c * (d - 2.0)) - sp0
            gp = _softplus(-c * (d + 2.0)) - sp0
        pv = pvalid()
        gm = jnp.where(pv, gm, jnp.zeros((), lt))
        gp = jnp.where(pv, gp, jnp.zeros((), lt))
        tot = jnp.sum(gm + gp, axis=0, keepdims=True, dtype=lt)
        return (gm - gp).astype(lt), tot

    mm_dt = jnp.float32 if flt else jnp.bfloat16

    def dE2_of(delta, sig):
        """Twice the flip cost (exactly dE for xentr after the /2): one
        MXU matmul (bf16 exact for the integer families; f32 for the
        continuous xentr g)."""
        g, tot = g_tot(delta)
        proj = jax.lax.dot_general(
            xiT_ref[:], g.astype(mm_dt),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if not flt:
            proj = proj.astype(jnp.int32)
        return tot + (sig.astype(lt) if flt else sig) * proj

    def logz_of(dE2):
        bE = betah * jnp.maximum(dE2, 0).astype(jnp.float32)
        valid = iota_n() < N
        m = jnp.min(jnp.where(valid, bE, inf), axis=0, keepdims=True)
        zs = jnp.sum(jnp.where(valid, jnp.exp(m - bE), 0.0),
                     axis=0, keepdims=True)
        return bE, jnp.log(zs) - m

    def delta_upd(sig, onehot):
        """Stability update of the hypothetical winner flip: one matmul
        with the one-hot -2*sigma rhs (exact: +-1/+-2 operands, f32
        accumulation; stabilities stay int32 for every family)."""
        rhs = jnp.where(onehot, -2 * sig, 0).astype(mm_dt)
        upd = jax.lax.dot_general(
            xi_ref[:], rhs,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return upd.astype(jnp.int32)

    def move(m, carry):
        sig, delta, E, coord, acc, zacc = carry
        active = coord < target
        dE2 = dE2_of(delta, sig)
        bE, logz = logz_of(dE2)
        u = to_uniform(random_bits((NP, BT), salt0 + 3 * m))
        score = jnp.where(iota_n() < N, jnp.log(-jnp.log(u)) + bE, inf)
        mrow = jnp.min(score, axis=0, keepdims=True)
        irow = jnp.min(jnp.where(score == mrow, iota_n(), NP),
                       axis=0, keepdims=True)
        onehot = iota_n() == irow
        dE_i = jnp.sum(jnp.where(onehot, dE2, jnp.zeros((), lt)), axis=0,
                       keepdims=True, dtype=lt)
        if not flt:
            dE_i = dE_i >> 1            # exact: tot + sig*proj is even
        else:
            dE_i = dE_i * 0.5
        z_over_n = jnp.exp(logz - log_n)
        zacc = zacc + jnp.where(active, z_over_n, jnp.float32(0.0))
        upd = delta_upd(sig, onehot)
        if mode == "rrr":
            sig2 = jnp.where(onehot, -sig, sig)
            _, logz2 = logz_of(dE2_of(delta + upd, sig2))
            ua = to_uniform(random_bits((1, BT), salt0 + 3 * m + 1))
            do = active & (jnp.log(ua) < logz - logz2)
            sig = jnp.where(onehot & do, -sig, sig)
            delta = delta + jnp.where(do, upd, 0)
            E = E + jnp.where(do, dE_i, jnp.zeros((), lt))
            coord = coord + jnp.where(active, 1, 0)
            acc = acc + do.astype(jnp.int32)
        else:
            sig = jnp.where(onehot & active, -sig, sig)
            delta = delta + jnp.where(active, upd, 0)
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
        return sig, delta, E, coord, acc, zacc

    sig0 = sigma_ref[:].astype(jnp.int32)
    sig, delta, E, coord, acc, zacc = jax.lax.fori_loop(
        0, n_moves, move,
        (sig0, delta_ref[:], E_ref[:], coord_ref[:], acc_ref[:],
         zacc_ref[:]))
    sigma_out[:] = sig.astype(jnp.int8)
    E_out[:] = E
    coord_out[:] = coord
    acc_out[:] = acc
    zacc_out[:] = zacc


@partial(jax.jit, static_argnames=("n_phys", "p_phys", "block_chains",
                                   "n_moves", "mode", "fam"))
def _pallas_rejfree_perc_chunk(sigma, deltaT, E, coord, acc, zacc, xiT, xi,
                               seed, betah, cparam, target, *, n_phys,
                               p_phys, block_chains, n_moves, mode, fam):
    """sigma [B, NP] int8 (rows >= n_phys are +1 padding), deltaT [PP, B]
    stabilities (input-only)."""
    sigmaT = sigma.T
    NP, B = sigmaT.shape
    PP = deltaT.shape[0]          # deltaT int32 for every family
    BT = block_chains
    grid = (B // BT,)
    flt = fam == "xentr"
    et = jnp.float32 if flt else jnp.int32
    ct = jnp.float32 if mode == "wtm" else jnp.int32
    kernel = partial(_rejfree_perc_kernel, N=n_phys, NP=NP, P=p_phys,
                     PP=PP, BT=BT, n_moves=n_moves, mode=mode, fam=fam)
    row = pl.BlockSpec((1, BT), lambda j: (0, j), memory_space=pltpu.VMEM)
    nblk = pl.BlockSpec((NP, BT), lambda j: (0, j), memory_space=pltpu.VMEM)
    pblk = pl.BlockSpec((PP, BT), lambda j: (0, j), memory_space=pltpu.VMEM)
    stream = pl.BlockSpec((n_moves, BT), lambda j: (0, j),
                          memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=([pl.BlockSpec(memory_space=pltpu.SMEM)] * 4
                  + [pl.BlockSpec((NP, PP), lambda j: (0, 0),
                                  memory_space=pltpu.VMEM),
                     pl.BlockSpec((PP, NP), lambda j: (0, 0),
                                  memory_space=pltpu.VMEM),
                     nblk, pblk, row, row, row, row]),
        out_specs=[nblk, row, row, row, row, stream, stream],
        out_shape=[jax.ShapeDtypeStruct((NP, B), jnp.int8),
                   jax.ShapeDtypeStruct((1, B), et),
                   jax.ShapeDtypeStruct((1, B), ct),
                   jax.ShapeDtypeStruct((1, B), jnp.int32),
                   jax.ShapeDtypeStruct((1, B), jnp.float32),
                   jax.ShapeDtypeStruct((n_moves, B), ct),
                   jax.ShapeDtypeStruct((n_moves, B), et)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=_INTERPRET,
    )(seed, betah, target, cparam, xiT, xi, sigmaT, deltaT,
      E[None, :].astype(et), coord[None, :].astype(ct),
      acc[None, :], zacc[None, :])
    sig_out, E_out, coord_out, acc_out, zacc_out, cs, es = outs
    return (sig_out.T, E_out[0], coord_out[0], acc_out[0],
            zacc_out[0], cs, es)


def _perc_delta_of(sigma_pad, xi_i8, n_phys, pp):
    """[PP, B] int32 stabilities from the padded spins (one matmul)."""
    s = sigma_pad[:, :n_phys].astype(jnp.int32)       # [B, N]
    delta = jnp.einsum("pn,bn->pb", xi_i8.astype(jnp.int32), s)
    pad = pp - delta.shape[0]
    if pad:
        delta = jnp.concatenate(
            [delta, jnp.zeros((pad, s.shape[0]), jnp.int32)], axis=0)
    return delta


@partial(jax.jit, static_argnames=("n_phys", "p_phys", "bt", "chunk_moves",
                                   "mode", "fam"))
def rejfree_perc_run(xiT, xi, xi_i8, betah, cparam, sigma, E, coord, Es,
                     seed0, target, step, scale, *, n_phys, p_phys, bt,
                     chunk_moves, mode, fam):
    """Whole hookless run in ONE jit; sigma is the PADDED [B, NP] state.
    Stabilities are re-derived from the spins at every chunk boundary."""
    from ..samplers.bkl import _fill_checkpoints

    B = sigma.shape[0]
    pp = xi.shape[0]
    target_arr = target.reshape(1)
    acc = jnp.zeros((B,), jnp.int32)
    zacc = jnp.zeros((B,), jnp.float32)

    def cond(carry):
        return jnp.min(carry[2]) < target

    def body(carry):
        sigma, E, coord, acc, zacc, Es, k = carry
        deltaT = _perc_delta_of(sigma, xi_i8, n_phys, pp)
        if fam == "xentr":
            # E is reporting-only (acceptance never reads it), so the f32
            # VPU-transcendental drift of the in-kernel accumulation is
            # resynced EXACTLY from the integer stabilities at every chunk
            # boundary — drift stays bounded by one chunk's moves
            x = -cparam[0] * deltaT[:p_phys].astype(jnp.float32)
            E = jnp.sum(jnp.maximum(x, 0.0)
                        + jnp.log1p(jnp.exp(-jnp.abs(x))), axis=0)
        seed = (seed0 + k * jnp.int32(7919)).reshape(1)
        x_start = coord
        e_start = E.astype(Es.dtype) * scale
        sigma, E, coord, acc, zacc, cs, es = _pallas_rejfree_perc_chunk(
            sigma, deltaT, E, coord, acc, zacc, xiT, xi, seed, betah,
            cparam, target_arr, n_phys=n_phys, p_phys=p_phys,
            block_chains=bt, n_moves=chunk_moves, mode=mode, fam=fam)
        Es = _fill_checkpoints(Es, step, x_start, e_start, cs,
                               es.astype(Es.dtype) * scale)
        return sigma, E, coord, acc, zacc, Es, k + 1

    k0 = jnp.zeros((), jnp.int32)
    sigma, E, coord, acc, zacc, Es, _ = jax.lax.while_loop(
        cond, body, (sigma, E, coord, acc, zacc, Es, k0))
    return sigma[:, :n_phys], E, coord, Es, acc, zacc


# ---------------------------------------------------------------------------
# EO variant: tau-extremal optimization on the perceptrons — the binary-
# search order statistic + uniform tie race of ops/eo_pallas.py on the
# matmul-identity dE vector (integer keys for step/linear — exact — and
# IEEE-754 sort keys for xentr's f32 costs), with the same rank-1 stability
# update after each unconditional flip.
# ---------------------------------------------------------------------------

_I32_MAX = np.int32(2 ** 31 - 1)


def _eo_perc_kernel(seed_ref, n_ref, cdf_ref, c_ref, xiT_ref, xi_ref,
                    sigma_ref, delta_ref, E_ref, emin_ref, smin_ref,
                    itmin_ref,
                    sigma_out, E_out, emin_out, smin_out, itmin_out,
                    *, N, NP, P, PP, BT, t_bits, fam):
    flt = fam == "xentr"
    seed_p = program_seed(seed_ref[0], pl.program_id(0))
    pltpu.prng_seed(seed_p)
    salt0 = seed_p * jnp.int32(1000003)
    n_moves = n_ref[0]
    c = c_ref[0]
    lt = jnp.float32 if flt else jnp.int32
    imax = jnp.int32(_I32_MAX)
    inv32 = jnp.float32(2.0 ** -32)
    half_f = jnp.float32(0.5)
    mm_dt = jnp.float32 if flt else jnp.bfloat16

    def iota_n():
        return jax.lax.broadcasted_iota(jnp.int32, (NP, BT), 0)

    def pvalid():
        return jax.lax.broadcasted_iota(jnp.int32, (PP, BT), 0) < P

    def g_tot(delta):
        if fam == "step":
            gm = jnp.where(delta == 1, 1, 0)
            gp = jnp.where(delta == -1, -1, 0)
        elif fam == "linear":
            gm = jnp.where(delta < 2, 1, 0)
            gp = jnp.where(delta < 0, -1, 0)
        else:
            d = delta.astype(jnp.float32)
            sp0 = _softplus(-c * d)
            gm = _softplus(-c * (d - 2.0)) - sp0
            gp = _softplus(-c * (d + 2.0)) - sp0
        pv = pvalid()
        gm = jnp.where(pv, gm, jnp.zeros((), lt))
        gp = jnp.where(pv, gp, jnp.zeros((), lt))
        tot = jnp.sum(gm + gp, axis=0, keepdims=True, dtype=lt)
        return (gm - gp).astype(lt), tot

    def move(m, carry):
        sig, delta, E, emin, smin, itmin = carry
        g, tot = g_tot(delta)
        proj = jax.lax.dot_general(
            xiT_ref[:], g.astype(mm_dt),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if not flt:
            proj = proj.astype(jnp.int32)
        dE2 = tot + (sig.astype(lt) if flt else sig) * proj
        if flt:
            b = jax.lax.bitcast_convert_type(dE2, jnp.int32)
            hkey = b ^ ((b >> 31) & jnp.int32(0x7FFFFFFF))
        else:
            hkey = dE2
        hvalid = jnp.where(iota_n() < N, hkey, imax)
        ub = random_bits((1, BT), salt0 + 2 * m)
        u = ub.astype(jnp.float32) * inv32 + half_f
        rank = jnp.sum((cdf_ref[:] < u).astype(jnp.int32), axis=0,
                       keepdims=True)
        lo = jnp.min(hvalid, axis=0, keepdims=True) - 1
        hi = jnp.max(jnp.where(iota_n() < N, hkey, -imax), axis=0,
                     keepdims=True)

        def bstep(_, lh):
            lo, hi = lh
            mid = (lo >> 1) + (hi >> 1) + (lo & hi & 1)
            cnt = jnp.sum((hvalid <= mid).astype(jnp.int32),
                          axis=0, keepdims=True)
            ok = cnt >= rank + 1
            return jnp.where(ok, lo, mid + 1), jnp.where(ok, mid, hi)

        lo, hi = jax.lax.fori_loop(0, t_bits, bstep, (lo, hi))
        members = hvalid == hi
        r = random_bits((NP, BT), salt0 + 2 * m + 1)
        score = jnp.where(members, jnp.minimum(r, imax - 1), imax)
        srow = jnp.min(score, axis=0, keepdims=True)
        iwin = jnp.min(jnp.where(score == srow, iota_n(), NP),
                       axis=0, keepdims=True)
        onehot = iota_n() == iwin
        dE_i = jnp.sum(jnp.where(onehot, dE2, jnp.zeros((), lt)), axis=0,
                       keepdims=True, dtype=lt)
        dE_i = (dE_i >> 1) if not flt else dE_i * 0.5
        rhs = jnp.where(onehot, -2 * sig, 0).astype(mm_dt)
        upd = jax.lax.dot_general(
            xi_ref[:], rhs,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32)
        delta = delta + upd
        sig = jnp.where(onehot, -sig, sig)            # unconditional flip
        E = E + dE_i
        better = E < emin
        emin = jnp.where(better, E, emin)
        smin = jnp.where(better, sig, smin)
        itmin = jnp.where(better, m + 1, itmin)
        return sig, delta, E, emin, smin, itmin

    sig0 = sigma_ref[:].astype(jnp.int32)
    sig, delta, E, emin, smin, itmin = jax.lax.fori_loop(
        0, n_moves, move,
        (sig0, delta_ref[:], E_ref[:], emin_ref[:],
         smin_ref[:].astype(jnp.int32), itmin_ref[:]))
    sigma_out[:] = sig.astype(jnp.int8)
    E_out[:] = E
    emin_out[:] = emin
    smin_out[:] = smin.astype(jnp.int8)
    itmin_out[:] = itmin


@partial(jax.jit, static_argnames=("block_chains", "t_bits", "n_phys",
                                   "p_phys", "fam"))
def _pallas_eo_perc_run(sigma, deltaT, E, emin, smin, itmin, cdf, cparam,
                        xiT, xi, seed, n_moves, *, block_chains, t_bits,
                        n_phys, p_phys, fam):
    """Perceptron EO: sigma/smin [B, NP] int8, deltaT [PP, B] int32
    stabilities (input-only; an EO run never resumes from them)."""
    sigmaT, sminT = sigma.T, smin.T
    NP, B = sigmaT.shape
    PP = deltaT.shape[0]
    BT = block_chains
    grid = (B // BT,)
    flt = fam == "xentr"
    et = jnp.float32 if flt else jnp.int32
    kernel = partial(_eo_perc_kernel, N=n_phys, NP=NP, P=p_phys, PP=PP,
                     BT=BT, t_bits=t_bits, fam=fam)
    row = pl.BlockSpec((1, BT), lambda j: (0, j), memory_space=pltpu.VMEM)
    nblk = pl.BlockSpec((NP, BT), lambda j: (0, j), memory_space=pltpu.VMEM)
    pblk = pl.BlockSpec((PP, BT), lambda j: (0, j), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=([pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
                  + [pl.BlockSpec((NP, 1), lambda j: (0, 0),
                                  memory_space=pltpu.VMEM),    # cdf
                     pl.BlockSpec(memory_space=pltpu.SMEM),    # c
                     pl.BlockSpec((NP, PP), lambda j: (0, 0),
                                  memory_space=pltpu.VMEM),
                     pl.BlockSpec((PP, NP), lambda j: (0, 0),
                                  memory_space=pltpu.VMEM),
                     nblk, pblk, row, row, nblk, row]),
        out_specs=[nblk, row, row, nblk, row],
        out_shape=[jax.ShapeDtypeStruct((NP, B), jnp.int8),
                   jax.ShapeDtypeStruct((1, B), et),
                   jax.ShapeDtypeStruct((1, B), et),
                   jax.ShapeDtypeStruct((NP, B), jnp.int8),
                   jax.ShapeDtypeStruct((1, B), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=_INTERPRET,
    )(seed, n_moves, cdf, cparam, xiT, xi, sigmaT, deltaT, E[None, :],
      emin[None, :], sminT, itmin[None, :])
    sig_out, E_out, emin_out, smin_out, itmin_out = outs
    return (sig_out.T, E_out[0], emin_out[0], smin_out.T, itmin_out[0])
