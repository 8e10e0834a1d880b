"""Pallas TPU kernels for rejection-free sampling (BKL/WTM/RRR) and EO on
random K-SAT.

The reference serves K-SAT with a ClauseCache: per-clause satisfying-variable
counts S[a] plus identity lists, updated by ~40 lines of branchy incremental
bookkeeping per flip (/root/reference/src/graphs/SAT.jl:58-73,258-320), giving
O(deg)-per-move bkl/wtm/rrr/EO with allDeltaE = 0:max_conn (SAT.jl:325).

TPU-native the same cache is VARIABLE-major and BIT-PACKED: for variable j and
clause slot c < Cmax, the sat count S of j's c-th clause lives in a
ceil(log2(K+1))-bit field of a resident [NP, BT] int32 word column — the whole
cache is ceil(Cmax / slots_per_word) words (2 words for K=3, Cmax <= 32), kept
in VMEM across moves like the pspin kernel's product tables
(ops/rejfree_pallas.py:1095-1112). Everything per move is a fused [NP, BT]
VPU pass:

* dE recompute (the lfields of SAT.jl:213-225): per slot c,
  r = field_c, m = (sigma == TL_c) and
      dE += (r == 1 & m) - (r == 0)
  — +1 where j is the SOLE satisfier of its c-th clause, -1 where that clause
  is violated (then j cannot be satisfying, so no m test is needed);
* the flip of the race/rank winner w updates the counts by broadcast compares
  on static partner tables (the 3-spin inverse-column trick with literal
  signs): slot c of variable j changes by nsw * sign iff w is j itself
  (sign TL[j,c]) or one of the K-1 partners of j's c-th clause
  (sign SL_t[j,c] where P_t[j,c] == w). Per-slot updates accumulate into the
  packed words with static shifts, so the commit is O(words), not O(Cmax).

FIELD-ARITHMETIC CLOSURE (why +-1 adds into 2-3 bit fields can never borrow
or carry across fields): a count can only decrement when a satisfier flips
away — impossible at S = 0 (a violated clause has no satisfier) — and can
only increment when a non-satisfier flips to satisfy — impossible at S = K.
So each field stays in [0, K] by induction from a correct init, with no
inter-field carries. Padded slots hold the constant 2 (K >= 2), which is
neither 0 nor 1 and is never updated (partner sentinels == N never match a
winner row < N; padded own-slot signs are 0), so they contribute nothing.

Exactness: dE and E are exact int32 (#violated clauses); the race / log-z /
skip / staged-z' machinery is shared with ops/rejfree_pallas.py (shifted log
domain, exact at any beta); the EO rank selection is the integer binary
search + tie race of ops/eo_pallas.py. The clause count Mc never appears in
the kernel — move cost is O(Cmax * N / VPU), independent of Mc.
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

_INTERPRET = interpret_params()

_I32_MAX = np.int32(2 ** 31 - 1)

#: kernel caps: the move loop keeps ~10 live [NP, BT] i32 arrays plus the
#: packed word blocks; N*BT*~52B must fit the 128MB scoped limit at BT=128
_SAT_N_MAX = 16384
#: clause-slot cap (resident packed-word budget and per-move pass count)
_SAT_CMAX = 64
#: literals per clause: >= 2 (the padded-slot sentinel value 2 must be a
#: count that real updates can never produce... it can — 2 is a valid count —
#: but padded slots are never UPDATED, so any init in [2, K] works; K >= 2
#: guarantees 2 fits the field), <= 7 (3-bit fields)
_SAT_K_MIN = 2
_SAT_K_MAX = 7


def _field_params(K: int, Cmax: int):
    """(bits per field, slots per word, number of words)."""
    bits = max(1, int(np.ceil(np.log2(K + 1))))
    spw = 32 // bits
    return bits, spw, -(-Cmax // spw)


#: id(A)-keyed memo for the distinct-vars-per-clause host check
_SAT_OK_CACHE: dict = {}


def sat_rejfree_ok(model) -> bool:
    from ..models.sat import SATModel
    from ..samplers.common import bound_cache_put

    if not (isinstance(model, SATModel)
            and 8 <= model.N <= _SAT_N_MAX
            and _SAT_K_MIN <= model.K <= _SAT_K_MAX
            and 1 <= model.Cmax <= _SAT_CMAX):
        return False
    key = id(model.A)
    ent = _SAT_OK_CACHE.get(key)
    if ent is None or ent[0] is not model.A:
        A = np.asarray(model.A)
        # every clause must hold K distinct variables (gen_randomKSAT does;
        # make_sat accepts arbitrary input) — the partner-compare update
        # applies each slot's delta once, so duplicates would undercount
        srt = np.sort(A, axis=1)
        ok = bool(np.all(srt[:, 1:] != srt[:, :-1]))
        ent = (model.A, ok)
        bound_cache_put(_SAT_OK_CACHE, key, ent)
    return ent[1]


class _SatTables:
    """Static kernel tables for one SATModel.

    TL [NP, Cmax] i32: literal sign of j in its c-th clause (0 padding).
    P  [NP, (K-1)*Cmax] i32: the K-1 partner variables of j's c-th clause,
       column t*Cmax + c (sentinel N on padding).
    SL [NP, (K-1)*Cmax] i32: the partner literal signs (0 on padding).
    """

    def __init__(self, model):
        N, K, Cmax = model.N, model.K, model.Cmax
        NP = -(-N // 8) * 8
        A = np.asarray(model.A)
        L = np.asarray(model.L)
        T = np.asarray(model.T)
        TLm = np.asarray(model.TL)
        TL = np.zeros((NP, Cmax), np.int32)
        TL[:N] = TLm
        P = np.full((NP, (K - 1) * Cmax), N, np.int32)
        SL = np.zeros((NP, (K - 1) * Cmax), np.int32)
        Mc = model.Mc
        for j in range(N):
            for c in range(Cmax):
                a = T[j, c]
                if a >= Mc:
                    continue
                t = 0
                for k in range(K):
                    v = int(A[a, k])
                    if v == j or v >= N:
                        continue
                    P[j, t * Cmax + c] = v
                    SL[j, t * Cmax + c] = int(L[a, k])
                    t += 1
        self.TL = jnp.asarray(TL)
        self.P = jnp.asarray(P)
        self.SL = jnp.asarray(SL)
        self.NP = NP
        self.Cmax = Cmax
        self.K = K
        self.bits, self.spw, self.nw = _field_params(K, Cmax)


@partial(jax.jit, static_argnames=("np_", "cmax", "bits", "spw", "nw"))
def _sat_prep(model, sigma, np_, cmax, bits, spw, nw):
    """([B, NP] padded spins, nw-tuple of [NP, B] packed count words) for a
    kernel call — one XLA gather per chunk, never inside the kernel."""
    S = jax.vmap(model._sat_counts)(sigma)            # [B, Mc]
    B = sigma.shape[0]
    # clause sentinel row (T pads with Mc) and variable padding both read 2
    Se = jnp.concatenate([S, jnp.full((B, 1), 2, jnp.int32)], axis=1)
    R = Se[:, model.T[:, :cmax]]                      # [B, N, Cmax]
    pad = np_ - sigma.shape[1]
    if pad:
        sigma = jnp.concatenate(
            [sigma, jnp.ones((B, pad), jnp.int8)], axis=1)
        R = jnp.concatenate(
            [R, jnp.full((B, pad, cmax), 2, jnp.int32)], axis=1)
    words = []
    for w in range(nw):
        acc = jnp.zeros((B, np_), jnp.int32)
        for p in range(spw):
            c = w * spw + p
            if c >= cmax:
                break
            acc = (acc + (R[:, :, c] << (p * bits))).astype(jnp.int32)
        words.append(acc.T)
    return sigma, tuple(words)


def _sat_kernel_common(NP, BT, N):
    iota_nb = jax.lax.broadcasted_iota(jnp.int32, (NP, BT), 0)
    return iota_nb, iota_nb < N


def _rejfree_sat_kernel(*refs, N, NP, K, Cmax, BT, n_moves, mode, bits, spw,
                        nw):
    """One chunk of `n_moves` race-selected moves on a [NP, BT] block with
    resident packed clause-count words.

    refs: seed, betas, target (SMEM); TL [NP, Cmax], P/SL [NP, (K-1)*Cmax]
    (VMEM); sigma blk; nw packed word blks; E/coord/acc/zacc rows; then the
    matching outputs + the (coord, E) checkpoint streams."""
    (seed_ref, betas_ref, target_ref, tl_ref, p_ref, sl_ref,
     sigma_ref) = refs[:7]
    w_refs = refs[7:7 + nw]
    E_ref, coord_ref, acc_ref, zacc_ref = refs[7 + nw:11 + nw]
    outs = refs[11 + nw:]
    sigma_out = outs[0]
    w_outs = outs[1:1 + nw]
    (E_out, coord_out, acc_out, zacc_out, cs_out, es_out) = outs[1 + nw:]
    wtm = mode == "wtm"
    seed_p = program_seed(seed_ref[0], pl.program_id(0))
    pltpu.prng_seed(seed_p)
    salt0 = seed_p * jnp.int32(1000003)
    betas = betas_ref[0]
    target = target_ref[0]
    iota_nb, valid = _sat_kernel_common(NP, BT, N)
    fmask = jnp.int32((1 << bits) - 1)
    inv32 = jnp.float32(2.0 ** -32)
    half_f = jnp.float32(0.5)
    inf = jnp.float32(3.0e38)
    log_n = jnp.log(jnp.float32(N))

    def to_uniform(rb):
        return rb.astype(jnp.float32) * inv32 + half_f

    tl_cols = [tl_ref[:, c][:, None] for c in range(Cmax)]
    p_cols = [[p_ref[:, t * Cmax + c][:, None] for c in range(Cmax)]
              for t in range(K - 1)]
    sl_cols = [[sl_ref[:, t * Cmax + c][:, None] for c in range(Cmax)]
               for t in range(K - 1)]

    def field(ws, c):
        return (ws[c // spw] >> ((c % spw) * bits)) & fmask

    def lf_of(sig, ws):
        """dE of flipping each variable, recomputed from the resident
        counts (stateless — cannot desync; the lfields of SAT.jl:213-225)."""
        lf = jnp.zeros((NP, BT), jnp.int32)
        for c in range(Cmax):
            r = field(ws, c)
            m = sig == tl_cols[c]
            lf = lf + jnp.where((r == 1) & m, 1, 0) \
                    - jnp.where(r == 0, 1, 0)
        return lf

    def logz_of(lf):
        bE = betas * jnp.maximum(lf, 0).astype(jnp.float32)
        m = jnp.min(jnp.where(valid, bE, inf), axis=0, keepdims=True)
        zs = jnp.sum(jnp.where(valid, jnp.exp(m - bE), 0.0),
                     axis=0, keepdims=True)
        return bE, jnp.log(zs) - m

    def slot_upd(c, irow, onehot, nsw):
        """Count delta of slot c under a (hypothetical) flip of the winner:
        +-1 where the winner is the slot's variable itself or one of its
        K-1 clause partners, 0 elsewhere (sentinels never match)."""
        upd = onehot * tl_cols[c]
        for t in range(K - 1):
            upd = upd + jnp.where(p_cols[t][c] == irow, sl_cols[t][c], 0)
        return upd * nsw

    def move(m, carry):
        sig, ws, E, coord, acc, zacc = carry
        active = coord < target                       # [1, BT]
        lf = lf_of(sig, ws)
        bE, logz = logz_of(lf)
        u = to_uniform(random_bits((NP, BT), salt0 + 3 * m))
        score = jnp.where(valid, jnp.log(-jnp.log(u)) + bE, inf)
        mrow = jnp.min(score, axis=0, keepdims=True)  # [1, BT]
        irow = jnp.min(jnp.where(score == mrow, iota_nb, NP),
                       axis=0, keepdims=True)
        onehot = iota_nb == irow                      # exact single winner
        dE_i = jnp.sum(jnp.where(onehot, lf, 0), axis=0,
                       keepdims=True, dtype=jnp.int32)
        nsw = jnp.sum(jnp.where(onehot, -sig, 0), axis=0,
                      keepdims=True, dtype=jnp.int32)  # winner's NEW spin
        z_over_n = jnp.exp(logz - log_n)
        zacc = zacc + jnp.where(active, z_over_n, jnp.float32(0.0))
        if mode == "rrr":
            # trial pass: per-slot deltas accumulate into packed words AND
            # into the dE-table delta, so z' needs no second recompute
            sig2 = jnp.where(onehot, -sig, sig)
            updw = [jnp.zeros((NP, BT), jnp.int32) for _ in range(nw)]
            dlf = jnp.zeros((NP, BT), jnp.int32)
            for c in range(Cmax):
                upd = slot_upd(c, irow, onehot, nsw)
                r = field(ws, c)
                mo = sig == tl_cols[c]
                r2 = r + upd
                m2 = sig2 == tl_cols[c]
                dlf = dlf + jnp.where((r2 == 1) & m2, 1, 0) \
                          - jnp.where(r2 == 0, 1, 0) \
                          - jnp.where((r == 1) & mo, 1, 0) \
                          + jnp.where(r == 0, 1, 0)
                updw[c // spw] = updw[c // spw] + upd * (1 << ((c % spw)
                                                               * bits))
            _, logz2 = logz_of(lf + dlf)
            ua = to_uniform(random_bits((1, BT), salt0 + 3 * m + 1))
            do = active & (jnp.log(ua) < logz - logz2)
            sig = jnp.where(onehot & do, -sig, sig)
            ws = [(ws[w] + jnp.where(do, updw[w], 0)).astype(jnp.int32)
                  for w in range(nw)]
            E = E + jnp.where(do, dE_i, 0)
            coord = coord + jnp.where(active, 1, 0)
            acc = acc + do.astype(jnp.int32)
        else:
            updw = [jnp.zeros((NP, BT), jnp.int32) for _ in range(nw)]
            for c in range(Cmax):
                upd = slot_upd(c, irow, onehot, nsw)
                updw[c // spw] = updw[c // spw] + upd * (1 << ((c % spw)
                                                               * bits))
            sig = jnp.where(onehot & active, -sig, sig)
            ws = [(ws[w] + jnp.where(active, updw[w], 0)).astype(jnp.int32)
                  for w in range(nw)]
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
        return sig, ws, E, coord, acc, zacc

    sig0 = sigma_ref[:].astype(jnp.int32)
    ws0 = [w_refs[w][:] for w in range(nw)]
    sig, ws, E, coord, acc, zacc = jax.lax.fori_loop(
        0, n_moves, move,
        (sig0, ws0, E_ref[:], coord_ref[:], acc_ref[:], zacc_ref[:]))
    sigma_out[:] = sig.astype(jnp.int8)
    for w in range(nw):
        w_outs[w][:] = ws[w]
    E_out[:] = E
    coord_out[:] = coord
    acc_out[:] = acc
    zacc_out[:] = zacc


@partial(jax.jit, static_argnames=("n_phys", "cmax", "k_", "block_chains",
                                   "n_moves", "mode", "bits", "spw", "nw"))
def _pallas_rejfree_sat_chunk(sigma, wTs, E, coord, acc, zacc, TL, P, SL,
                              seed, betas, target, *, n_phys, cmax, k_,
                              block_chains, n_moves, mode, bits, spw, nw):
    """sigma [B, NP] int8 (rows >= n_phys are +1 padding), wTs: nw-tuple of
    [NP, B] packed count words."""
    sigmaT = sigma.T
    NP, B = sigmaT.shape
    BT = block_chains
    grid = (B // BT,)
    ct = jnp.float32 if mode == "wtm" else jnp.int32
    kernel = partial(_rejfree_sat_kernel, N=n_phys, NP=NP, K=k_, Cmax=cmax,
                     BT=BT, n_moves=n_moves, mode=mode, bits=bits, spw=spw,
                     nw=nw)
    row = pl.BlockSpec((1, BT), lambda j: (0, j), memory_space=pltpu.VMEM)
    blk = pl.BlockSpec((NP, BT), lambda j: (0, j), memory_space=pltpu.VMEM)
    stream = pl.BlockSpec((n_moves, BT), lambda j: (0, j),
                          memory_space=pltpu.VMEM)

    def tbl(cols):
        return pl.BlockSpec((NP, cols), lambda j: (0, 0),
                            memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=([pl.BlockSpec(memory_space=pltpu.SMEM)] * 3
                  + [tbl(cmax), tbl((k_ - 1) * cmax), tbl((k_ - 1) * cmax)]
                  + [blk] + [blk] * nw + [row, row, row, row]),
        out_specs=[blk] + [blk] * nw + [row, row, row, row, stream, stream],
        out_shape=([jax.ShapeDtypeStruct((NP, B), jnp.int8)]
                   + [jax.ShapeDtypeStruct((NP, B), jnp.int32)] * nw
                   + [jax.ShapeDtypeStruct((1, B), jnp.int32),
                      jax.ShapeDtypeStruct((1, B), ct),
                      jax.ShapeDtypeStruct((1, B), jnp.int32),
                      jax.ShapeDtypeStruct((1, B), jnp.float32),
                      jax.ShapeDtypeStruct((n_moves, B), ct),
                      jax.ShapeDtypeStruct((n_moves, B), jnp.int32)]),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=_INTERPRET,
    )(seed, betas, target, TL, P, SL, sigmaT, *wTs,
      E[None, :].astype(jnp.int32), coord[None, :].astype(ct),
      acc[None, :], zacc[None, :])
    sig_out = outs[0]
    w_outs = tuple(outs[1:1 + nw])
    E_out, coord_out, acc_out, zacc_out, cs, es = outs[1 + nw:]
    return (sig_out.T, w_outs, E_out[0], coord_out[0], acc_out[0],
            zacc_out[0], cs, es)


@partial(jax.jit, static_argnames=("n_phys", "cmax", "k_", "bt",
                                   "chunk_moves", "mode", "bits", "spw",
                                   "nw"))
def rejfree_sat_run(TL, P, SL, betas, sigma, wTs, E, coord, Es, seed0,
                    target, step, scale, *, n_phys, cmax, k_, bt,
                    chunk_moves, mode, bits, spw, nw):
    """SAT analog of `rejfree_sparse_run`: whole hookless run in ONE jit;
    sigma is the PADDED [B, NP] state (prep pads)."""
    from ..samplers.bkl import _fill_checkpoints

    B = sigma.shape[0]
    target_arr = target.reshape(1)
    acc = jnp.zeros((B,), jnp.int32)
    zacc = jnp.zeros((B,), jnp.float32)

    def cond(carry):
        coord = carry[3]
        return jnp.min(coord) < target

    def body(carry):
        sigma, wTs, E, coord, acc, zacc, Es, k = carry
        seed = (seed0 + k * jnp.int32(7919)).reshape(1)
        x_start = coord
        e_start = E.astype(Es.dtype) * scale
        sigma, wTs, E, coord, acc, zacc, cs, es = \
            _pallas_rejfree_sat_chunk(
                sigma, wTs, E, coord, acc, zacc, TL, P, SL, seed, betas,
                target_arr, n_phys=n_phys, cmax=cmax, k_=k_,
                block_chains=bt, n_moves=chunk_moves, mode=mode, bits=bits,
                spw=spw, nw=nw)
        Es = _fill_checkpoints(Es, step, x_start, e_start, cs,
                               es.astype(Es.dtype) * scale)
        return sigma, wTs, E, coord, acc, zacc, Es, k + 1

    k0 = jnp.zeros((), jnp.int32)
    sigma, wTs, E, coord, acc, zacc, Es, _ = jax.lax.while_loop(
        cond, body, (sigma, wTs, E, coord, acc, zacc, Es, k0))
    return sigma[:, :n_phys], E, coord, Es, acc, zacc


# ---------------------------------------------------------------------------
# EO variant: tau-extremal optimization on K-SAT — the integer binary-search
# order statistic + uniform tie race of ops/eo_pallas.py on the recomputed
# dE table, with the same packed-count update after each unconditional flip
# (EOCache analog, /root/reference/src/DeltaE.jl:424-554 over SAT.jl:325).
# ---------------------------------------------------------------------------


def _eo_sat_kernel(*refs, N, NP, K, Cmax, BT, t_bits, bits, spw, nw):
    (seed_ref, n_ref, cdf_ref, tl_ref, p_ref, sl_ref, sigma_ref) = refs[:7]
    w_refs = refs[7:7 + nw]
    E_ref, emin_ref, smin_ref, itmin_ref = refs[7 + nw:11 + nw]
    outs = refs[11 + nw:]
    sigma_out = outs[0]
    w_outs = outs[1:1 + nw]
    E_out, emin_out, smin_out, itmin_out = outs[1 + nw:]
    seed_p = program_seed(seed_ref[0], pl.program_id(0))
    pltpu.prng_seed(seed_p)
    salt0 = seed_p * jnp.int32(1000003)
    n_moves = n_ref[0]
    iota_nb, valid = _sat_kernel_common(NP, BT, N)
    fmask = jnp.int32((1 << bits) - 1)
    imax = jnp.int32(_I32_MAX)
    inv32 = jnp.float32(2.0 ** -32)
    half_f = jnp.float32(0.5)

    tl_cols = [tl_ref[:, c][:, None] for c in range(Cmax)]
    p_cols = [[p_ref[:, t * Cmax + c][:, None] for c in range(Cmax)]
              for t in range(K - 1)]
    sl_cols = [[sl_ref[:, t * Cmax + c][:, None] for c in range(Cmax)]
               for t in range(K - 1)]

    def field(ws, c):
        return (ws[c // spw] >> ((c % spw) * bits)) & fmask

    def move(m, carry):
        sig, ws, E, emin, smin, itmin = carry
        lf = jnp.zeros((NP, BT), jnp.int32)
        for c in range(Cmax):
            r = field(ws, c)
            mo = sig == tl_cols[c]
            lf = lf + jnp.where((r == 1) & mo, 1, 0) \
                    - jnp.where(r == 0, 1, 0)
        hvalid = jnp.where(valid, lf, imax)
        ub = random_bits((1, BT), salt0 + 2 * m)
        u = ub.astype(jnp.float32) * inv32 + half_f
        rank = jnp.sum((cdf_ref[:] < u).astype(jnp.int32), axis=0,
                       keepdims=True)
        lo = jnp.min(hvalid, axis=0, keepdims=True) - 1
        hi = jnp.max(jnp.where(valid, lf, -imax), axis=0, keepdims=True)

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
        dE_i = jnp.sum(jnp.where(onehot, lf, 0), axis=0,
                       keepdims=True, dtype=jnp.int32)
        nsw = jnp.sum(jnp.where(onehot, -sig, 0), axis=0, keepdims=True,
                      dtype=jnp.int32)
        updw = [jnp.zeros((NP, BT), jnp.int32) for _ in range(nw)]
        for c in range(Cmax):
            upd = onehot * tl_cols[c]
            for t in range(K - 1):
                upd = upd + jnp.where(p_cols[t][c] == iwin,
                                      sl_cols[t][c], 0)
            updw[c // spw] = updw[c // spw] + (upd * nsw) * (1 << ((c % spw)
                                                                   * bits))
        ws = [(ws[w] + updw[w]).astype(jnp.int32) for w in range(nw)]
        sig = jnp.where(onehot, -sig, sig)            # unconditional flip
        E = E + dE_i
        better = E < emin
        emin = jnp.where(better, E, emin)
        smin = jnp.where(better, sig, smin)
        itmin = jnp.where(better, m + 1, itmin)
        return sig, ws, E, emin, smin, itmin

    sig0 = sigma_ref[:].astype(jnp.int32)
    ws0 = [w_refs[w][:] for w in range(nw)]
    sig, ws, E, emin, smin, itmin = jax.lax.fori_loop(
        0, n_moves, move,
        (sig0, ws0, E_ref[:], emin_ref[:],
         smin_ref[:].astype(jnp.int32), itmin_ref[:]))
    sigma_out[:] = sig.astype(jnp.int8)
    for w in range(nw):
        w_outs[w][:] = ws[w]
    E_out[:] = E
    emin_out[:] = emin
    smin_out[:] = smin.astype(jnp.int8)
    itmin_out[:] = itmin


@partial(jax.jit, static_argnames=("block_chains", "t_bits", "n_phys",
                                   "cmax", "k_", "bits", "spw", "nw"))
def _pallas_eo_sat_run(sigma, wTs, E, emin, smin, itmin, cdf, TL, P, SL,
                       seed, n_moves, *, block_chains, t_bits, n_phys,
                       cmax, k_, bits, spw, nw):
    """SAT EO: sigma/smin [B, NP] int8, wTs nw-tuple of [NP, B] i32."""
    sigmaT, sminT = sigma.T, smin.T
    NP, B = sigmaT.shape
    BT = block_chains
    grid = (B // BT,)
    kernel = partial(_eo_sat_kernel, N=n_phys, NP=NP, K=k_, Cmax=cmax,
                     BT=BT, t_bits=t_bits, bits=bits, spw=spw, nw=nw)
    row = pl.BlockSpec((1, BT), lambda j: (0, j), memory_space=pltpu.VMEM)
    blk = pl.BlockSpec((NP, BT), lambda j: (0, j), memory_space=pltpu.VMEM)

    def tbl(cols):
        return pl.BlockSpec((NP, cols), lambda j: (0, 0),
                            memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=([pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
                  + [tbl(1)]                                       # cdf
                  + [tbl(cmax), tbl((k_ - 1) * cmax), tbl((k_ - 1) * cmax)]
                  + [blk] + [blk] * nw + [row, row, blk, row]),
        out_specs=[blk] + [blk] * nw + [row, row, blk, row],
        out_shape=([jax.ShapeDtypeStruct((NP, B), jnp.int8)]
                   + [jax.ShapeDtypeStruct((NP, B), jnp.int32)] * nw
                   + [jax.ShapeDtypeStruct((1, B), jnp.int32),
                      jax.ShapeDtypeStruct((1, B), jnp.int32),
                      jax.ShapeDtypeStruct((NP, B), jnp.int8),
                      jax.ShapeDtypeStruct((1, B), jnp.int32)]),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=_INTERPRET,
    )(seed, n_moves, cdf, TL, P, SL, sigmaT, *wTs, E[None, :],
      emin[None, :], sminT, itmin[None, :])
    sig_out = outs[0]
    E_out, emin_out, smin_out, itmin_out = outs[1 + nw:]
    return (sig_out.T, E_out[0], emin_out[0], smin_out.T, itmin_out[0])
