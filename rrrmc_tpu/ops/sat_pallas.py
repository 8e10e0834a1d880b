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
in VMEM across a kernel chunk like the pspin kernel's product tables
(ops/rejfree_pallas.py). Everything per move is a fused [NP, BT] VPU pass:

* dE recompute (the lfields of SAT.jl:213-225): per slot c,
  r = field_c, m = (sigma == TL_c) and
      dE += (r == 1 & m) - (r == 0)
  — +1 where j is the SOLE satisfier of its c-th clause, -1 where that clause
  is violated (then j cannot be satisfying, so no m test is needed);
* the flip of the race/rank winner w updates the counts by broadcast compares
  on static partner tables (the 3-spin inverse-column trick with literal
  signs): slot c of variable j changes by nsw * sign iff w is j itself
  (sign TL[j,c]) or one of the K-1 partners of j's c-th clause
  (sign SL_t[j,c] where P_t[j,c] == w).

FIELD-ARITHMETIC CLOSURE (why +-1 adds into 2-3 bit fields can never borrow
or carry across fields): a count can only decrement when a satisfier flips
away — impossible at S = 0 (a violated clause has no satisfier) — and can
only increment when a non-satisfier flips to satisfy — impossible at S = K.
So each field stays in [0, K] by induction from a correct init, with no
inter-field carries. Padded slots hold the constant 2 (K >= 2), which is
neither 0 nor 1 and is never updated (partner sentinels == N never match a
winner row < N; padded own-slot signs are 0), so they contribute nothing.

COMPILE-TIME SHAPE (learned the hard way): an unrolled python loop over the
Cmax slots multiplies the Mosaic program by Cmax, and every [NP, 1] ->
[NP, BT] lane-broadcast inside it is emitted per sublane tile — compile time
scaled ~N * Cmax (>28 min at N=1e4 before this restructuring; the
pre-sliced-columns variant additionally spilled 694 MB of lane-padded
registers). The slot loop is therefore a DYNAMIC `fori_loop`: the static
tables are laid out one slot per LANE of [NP, 128] arrays and rotated by one
lane per iteration (`pltpu.roll(x, 127, axis=1)`), so every per-slot access
is the STATIC lane-0 column; the packed-word index is resolved by a tiny
where-chain over the nw words and dynamic scalar shifts. One slot body in
the program instead of Cmax.

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

#: kernel caps: the move loop keeps ~12 live [NP, BT] i32 arrays plus the
#: packed word blocks and the rolled [NP, 128] tables
_SAT_N_MAX = 16384
#: clause-slot cap: one lane per slot in the rolled [NP, 128] tables
_SAT_CMAX = 128
#: literals per clause: >= 2 (so the padded-slot sentinel count 2 fits the
#: field and is never 0/1), <= 7 (3-bit fields)
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
            and 1 <= model.Cmax <= min(_SAT_CMAX,
                                       128 // max(model.K - 1, 1))):
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
    """Static kernel tables for one SATModel, one clause slot per LANE
    (rotated in-kernel so slot access is always the static lane 0):

    TL [NP, 128] i32: literal sign of j in its c-th clause (0 padding).
    P  [NP, 128] i32: the K-1 partner variables of j's c-th clause, packed
       as lane sections t*SEC + c with SEC = 128 // (K-1); each entry
       carries the partner id in its low 16 bits (sentinel 0xFFFF >= N on
       padding) and the partner's literal sign + 1 in bits 16-17 — one
       packed table instead of 2(K-1), which is what fits the rrr trial
       pass in VMEM at N=1e4.
    """

    def __init__(self, model):
        N, K, Cmax = model.N, model.K, model.Cmax
        NP = -(-N // 8) * 8
        SEC = 128 // (K - 1)
        assert Cmax <= SEC, (Cmax, SEC)
        A = np.asarray(model.A)
        L = np.asarray(model.L)
        T = np.asarray(model.T)
        TLm = np.asarray(model.TL)
        TL = np.zeros((NP, 128), np.int32)
        TL[:N, :Cmax] = TLm
        P = np.full((NP, 128), 0xFFFF | (1 << 16), np.int32)
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
                    P[j, t * SEC + c] = v | ((int(L[a, k]) + 1) << 16)
                    t += 1
        self.TL = jnp.asarray(TL)
        self.P = jnp.asarray(P)
        self.NP = NP
        self.Cmax = Cmax
        self.K = K
        self.SEC = SEC
        self.bits, self.spw, self.nw = _field_params(K, Cmax)


def _pack_counts(R, bits, spw, nw, cmax):
    """[B, NP, Cmax] counts -> nw-tuple of [NP, B] packed words."""
    words = []
    for w in range(nw):
        acc = jnp.zeros(R.shape[:2], jnp.int32)
        for pp in range(spw):
            c = w * spw + pp
            if c >= cmax:
                break
            acc = (acc + (R[:, :, c] << (pp * bits))).astype(jnp.int32)
        words.append(acc.T)
    return tuple(words)


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
    return sigma, _pack_counts(R, bits, spw, nw, cmax)


@partial(jax.jit, static_argnames=("np_",))
def _pad_sigma(sigma, np_):
    """[B, N] -> [B, NP] with +1 (frozen, zero-degree) padding rows."""
    pad = np_ - sigma.shape[1]
    if pad:
        B = sigma.shape[0]
        sigma = jnp.concatenate(
            [sigma, jnp.ones((B, pad), jnp.int8)], axis=1)
    return sigma


def _sat_machinery(tl_ref, p_ref, *, K, Cmax, BT, bits, spw, nw):
    """Shared dynamic slot-loop helpers (see COMPILE-TIME SHAPE above).
    p_ref packs the K-1 partner sections at lane stride SEC, each entry
    id | (sign+1) << 16."""
    SEC = 128 // (K - 1)
    fmask = jnp.int32((1 << bits) - 1)
    idmask = jnp.int32(0xFFFF)

    def roll1(x):
        return pltpu.roll(x, 127, axis=1)     # left by one lane

    def field(ws, c):
        """Packed count of slot c (dynamic): where-chain word select +
        dynamic scalar shift."""
        wsel = c // spw
        sh = jax.lax.rem(c, spw) * bits
        word = ws[0]
        for w in range(1, nw):
            word = jnp.where(wsel == w, ws[w], word)
        return (word >> sh) & fmask

    def lf_of(sig, ws):
        """dE of flipping each variable, recomputed from the resident
        counts (stateless — cannot desync; the lfields of
        SAT.jl:213-225)."""
        def step(c, carry):
            lf, tl_t = carry
            r = field(ws, c)
            m = sig == tl_t[:, 0:1]
            lf = lf + jnp.where((r == 1) & m, 1, 0) \
                    - jnp.where(r == 0, 1, 0)
            return lf, roll1(tl_t)

        lf, _ = jax.lax.fori_loop(
            0, Cmax, step,
            (jnp.zeros(sig.shape, jnp.int32), tl_ref[:]))
        return lf

    def slot_upd(tl_t, p_t, irow, onehot, nsw_eff):
        """Count delta of the CURRENT slot (lane 0 of each section) under
        a flip of the winner, scaled by the pre-masked new winner spin
        (0 rows apply nothing): +-1 where the winner is the slot's
        variable itself or one of its K-1 clause partners (sentinels
        never match a winner row < N)."""
        upd = onehot * tl_t[:, 0:1]
        for t in range(K - 1):
            pw = p_t[:, t * SEC:t * SEC + 1]
            upd = upd + jnp.where((pw & idmask) == irow,
                                  ((pw >> 16) & 3) - 1, 0)
        return upd * nsw_eff

    def apply_ws(ws, c, upd):
        """ws[c // spw] += upd << shift(c), dynamically."""
        wsel = c // spw
        sh = jax.lax.rem(c, spw) * bits
        upd_sh = jnp.left_shift(upd, sh)
        return [(ws[w] + jnp.where(wsel == w, upd_sh, 0)).astype(jnp.int32)
                for w in range(nw)]

    def update_pass(ws, irow, onehot, nsw_eff):
        """Commit all slot deltas for a flip of the winner."""
        def step(c, carry):
            ws, tl_t, p_t = carry
            upd = slot_upd(tl_t, p_t, irow, onehot, nsw_eff)
            ws = apply_ws(ws, c, upd)
            return (ws, roll1(tl_t), roll1(p_t))

        ws, _, _ = jax.lax.fori_loop(
            0, Cmax, step, (list(ws), tl_ref[:], p_ref[:]))
        return ws

    def trial_dlf(sig, ws, irow, onehot, nsw):
        """dE-table delta of the hypothetical flip (for the staged z'):
        per slot, new-contribution minus old-contribution. The flipped
        spins are re-derived per slot from (sig, onehot) instead of being
        held live across the pass."""
        def step(c, carry):
            dlf, tl_t, p_t = carry
            upd = slot_upd(tl_t, p_t, irow, onehot, nsw)
            r = field(ws, c)
            tl_c = tl_t[:, 0:1]
            mo = sig == tl_c
            r2 = r + upd
            m2 = jnp.where(onehot, -sig, sig) == tl_c
            dlf = dlf + jnp.where((r2 == 1) & m2, 1, 0) \
                      - jnp.where(r2 == 0, 1, 0) \
                      - jnp.where((r == 1) & mo, 1, 0) \
                      + jnp.where(r == 0, 1, 0)
            return (dlf, roll1(tl_t), roll1(p_t))

        dlf, _, _ = jax.lax.fori_loop(
            0, Cmax, step,
            (jnp.zeros(sig.shape, jnp.int32), tl_ref[:], p_ref[:]))
        return dlf

    return lf_of, update_pass, trial_dlf


def _rejfree_sat_kernel(*refs, N, NP, K, Cmax, BT, n_moves, mode, bits, spw,
                        nw):
    """One chunk of `n_moves` race-selected moves on a [NP, BT] block with
    resident packed clause-count words.

    refs: seed, betas, target (SMEM); TL/P/SL [NP, 128] lane-section tables; sigma blk; nw packed word blks
    (INPUT-ONLY — the run loop re-derives them from the updated spins each
    chunk, saving their output windows' VMEM); E/coord/acc/zacc rows; then
    the outputs + the (coord, E) checkpoint streams."""
    (seed_ref, betas_ref, target_ref, tl_ref, p_ref,
     sigma_ref) = refs[:6]
    w_refs = refs[6:6 + nw]
    E_ref, coord_ref, acc_ref, zacc_ref = refs[6 + nw:10 + nw]
    outs = refs[10 + nw:]
    sigma_out = outs[0]
    (E_out, coord_out, acc_out, zacc_out, cs_out, es_out) = outs[1:]
    wtm = mode == "wtm"
    seed_p = program_seed(seed_ref[0], pl.program_id(0))
    pltpu.prng_seed(seed_p)
    salt0 = seed_p * jnp.int32(1000003)
    betas = betas_ref[0]
    target = target_ref[0]

    def iota_nb_():
        # transient per use: a hoisted [NP, BT] iota lives across the
        # whole move loop as register spill (every MB counts in rrr)
        return jax.lax.broadcasted_iota(jnp.int32, (NP, BT), 0)

    inv32 = jnp.float32(2.0 ** -32)
    half_f = jnp.float32(0.5)
    inf = jnp.float32(3.0e38)
    log_n = jnp.log(jnp.float32(N))
    lf_of, update_pass, trial_dlf = _sat_machinery(
        tl_ref, p_ref, K=K, Cmax=Cmax, BT=BT, bits=bits, spw=spw, nw=nw)

    def to_uniform(rb):
        return rb.astype(jnp.float32) * inv32 + half_f

    def logz_of(lf):
        # the padding mask is re-derived per use (a hoisted [NP, BT] bool
        # would live across the whole move loop as spill)
        valid = iota_nb_() < N
        bE = betas * jnp.maximum(lf, 0).astype(jnp.float32)
        m = jnp.min(jnp.where(valid, bE, inf), axis=0, keepdims=True)
        zs = jnp.sum(jnp.where(valid, jnp.exp(m - bE), 0.0),
                     axis=0, keepdims=True)
        return bE, jnp.log(zs) - m

    def move(m, carry):
        sig, ws, E, coord, acc, zacc = carry
        active = coord < target                       # [1, BT]
        lf = lf_of(sig, ws)
        bE, logz = logz_of(lf)
        u = to_uniform(random_bits((NP, BT), salt0 + 3 * m))
        score = jnp.where(iota_nb_() < N, jnp.log(-jnp.log(u)) + bE, inf)
        mrow = jnp.min(score, axis=0, keepdims=True)  # [1, BT]
        irow = jnp.min(jnp.where(score == mrow, iota_nb_(), NP),
                       axis=0, keepdims=True)
        onehot = iota_nb_() == irow                   # exact single winner
        dE_i = jnp.sum(jnp.where(onehot, lf, 0), axis=0,
                       keepdims=True, dtype=jnp.int32)
        nsw = jnp.sum(jnp.where(onehot, -sig, 0), axis=0,
                      keepdims=True, dtype=jnp.int32)  # winner's NEW spin
        z_over_n = jnp.exp(logz - log_n)
        zacc = zacc + jnp.where(active, z_over_n, jnp.float32(0.0))
        if mode == "rrr":
            # staged z': the trial pass accumulates the dE-table delta, so
            # z' needs no second full recompute; the commit pass re-derives
            # the slot deltas under the accept mask
            dlf = trial_dlf(sig, ws, irow, onehot, nsw)
            _, logz2 = logz_of(lf + dlf)
            ua = to_uniform(random_bits((1, BT), salt0 + 3 * m + 1))
            do = active & (jnp.log(ua) < logz - logz2)
            sig = jnp.where(onehot & do, -sig, sig)
            ws = update_pass(ws, irow, onehot, jnp.where(do, nsw, 0))
            E = E + jnp.where(do, dE_i, 0)
            coord = coord + jnp.where(active, 1, 0)
            acc = acc + do.astype(jnp.int32)
        else:
            sig = jnp.where(onehot & active, -sig, sig)
            ws = update_pass(ws, irow, onehot, jnp.where(active, nsw, 0))
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
    E_out[:] = E
    coord_out[:] = coord
    acc_out[:] = acc
    zacc_out[:] = zacc


@partial(jax.jit, static_argnames=("n_phys", "cmax", "k_", "block_chains",
                                   "n_moves", "mode", "bits", "spw", "nw"))
def _pallas_rejfree_sat_chunk(sigma, wTs, E, coord, acc, zacc, TL, P,
                              seed, betas, target, *, n_phys, cmax, k_,
                              block_chains, n_moves, mode, bits, spw, nw):
    """sigma [B, NP] int8 (rows >= n_phys are +1 padding), wTs: nw-tuple of
    [NP, B] packed count words (input-only; callers re-derive from the
    returned spins). TL/P/SL [NP, 128]."""
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
    tbl = pl.BlockSpec((NP, 128), lambda j: (0, 0), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=([pl.BlockSpec(memory_space=pltpu.SMEM)] * 3
                  + [tbl, tbl]
                  + [blk] + [blk] * nw + [row, row, row, row]),
        out_specs=[blk, row, row, row, row, stream, stream],
        out_shape=[jax.ShapeDtypeStruct((NP, B), jnp.int8),
                   jax.ShapeDtypeStruct((1, B), jnp.int32),
                   jax.ShapeDtypeStruct((1, B), ct),
                   jax.ShapeDtypeStruct((1, B), jnp.int32),
                   jax.ShapeDtypeStruct((1, B), jnp.float32),
                   jax.ShapeDtypeStruct((n_moves, B), ct),
                   jax.ShapeDtypeStruct((n_moves, B), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=_INTERPRET,
    )(seed, betas, target, TL, P, sigmaT, *wTs,
      E[None, :].astype(jnp.int32), coord[None, :].astype(ct),
      acc[None, :], zacc[None, :])
    sig_out, E_out, coord_out, acc_out, zacc_out, cs, es = outs
    return (sig_out.T, E_out[0], coord_out[0], acc_out[0],
            zacc_out[0], cs, es)


def _sat_words_of(sigma_pad, A, L, T, *, n_phys, np_, cmax, bits, spw, nw):
    """Packed count words from the PADDED spins (traceable: runs inside the
    run-loop body once per chunk, so the kernel needs no word outputs)."""
    B = sigma_pad.shape[0]
    sig = sigma_pad[:, :n_phys].astype(jnp.int32)
    se = jnp.concatenate([sig, jnp.zeros((B, 1), jnp.int32)], axis=1)
    S = jnp.sum((se[:, A] == L[None]).astype(jnp.int32), axis=2)  # [B, Mc]
    Se = jnp.concatenate([S, jnp.full((B, 1), 2, jnp.int32)], axis=1)
    R = Se[:, T]                                       # [B, N, Cmax]
    pad = np_ - n_phys
    if pad:
        R = jnp.concatenate(
            [R, jnp.full((B, pad, cmax), 2, jnp.int32)], axis=1)
    return _pack_counts(R, bits, spw, nw, cmax)


@partial(jax.jit, static_argnames=("n_phys", "cmax", "k_", "bt",
                                   "chunk_moves", "mode", "bits", "spw",
                                   "nw"))
def rejfree_sat_run(TL, P, A, L, T, betas, sigma, E, coord, Es, seed0,
                    target, step, scale, *, n_phys, cmax, k_, bt,
                    chunk_moves, mode, bits, spw, nw):
    """SAT analog of `rejfree_sparse_run`: whole hookless run in ONE jit;
    sigma is the PADDED [B, NP] state. The packed count words are
    re-derived from the spins at every chunk boundary (one XLA gather pass,
    ~2% of a 1024-move chunk) — exactly equal to the kernel's internal
    words, so the kernel carries them only within a chunk."""
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
        wTs = _sat_words_of(sigma, A, L, T, n_phys=n_phys, np_=np_,
                            cmax=cmax, bits=bits, spw=spw, nw=nw)
        seed = (seed0 + k * jnp.int32(7919)).reshape(1)
        x_start = coord
        e_start = E.astype(Es.dtype) * scale
        sigma, E, coord, acc, zacc, cs, es = \
            _pallas_rejfree_sat_chunk(
                sigma, wTs, E, coord, acc, zacc, TL, P, seed, betas,
                target_arr, n_phys=n_phys, cmax=cmax, k_=k_,
                block_chains=bt, n_moves=chunk_moves, mode=mode, bits=bits,
                spw=spw, nw=nw)
        Es = _fill_checkpoints(Es, step, x_start, e_start, cs,
                               es.astype(Es.dtype) * scale)
        return sigma, E, coord, acc, zacc, Es, k + 1

    k0 = jnp.zeros((), jnp.int32)
    sigma, E, coord, acc, zacc, Es, _ = jax.lax.while_loop(
        cond, body, (sigma, E, coord, acc, zacc, Es, k0))
    return sigma[:, :n_phys], E, coord, Es, acc, zacc


# ---------------------------------------------------------------------------
# EO variant: tau-extremal optimization on K-SAT — the integer binary-search
# order statistic + uniform tie race of ops/eo_pallas.py on the recomputed
# dE table, with the same packed-count update after each unconditional flip
# (EOCache analog, /root/reference/src/DeltaE.jl:424-554 over SAT.jl:325).
# ---------------------------------------------------------------------------


def _eo_sat_kernel(*refs, N, NP, K, Cmax, BT, t_bits, bits, spw, nw):
    (seed_ref, n_ref, cdf_ref, tl_ref, p_ref,
     sigma_ref) = refs[:6]
    w_refs = refs[6:6 + nw]
    E_ref, emin_ref, smin_ref, itmin_ref = refs[6 + nw:10 + nw]
    outs = refs[10 + nw:]
    sigma_out, E_out, emin_out, smin_out, itmin_out = outs
    seed_p = program_seed(seed_ref[0], pl.program_id(0))
    pltpu.prng_seed(seed_p)
    salt0 = seed_p * jnp.int32(1000003)
    n_moves = n_ref[0]

    def iota_nb_():
        return jax.lax.broadcasted_iota(jnp.int32, (NP, BT), 0)

    imax = jnp.int32(_I32_MAX)
    inv32 = jnp.float32(2.0 ** -32)
    half_f = jnp.float32(0.5)
    lf_of, update_pass, _ = _sat_machinery(
        tl_ref, p_ref, K=K, Cmax=Cmax, BT=BT, bits=bits, spw=spw, nw=nw)

    def move(m, carry):
        sig, ws, E, emin, smin, itmin = carry
        lf = lf_of(sig, ws)
        hvalid = jnp.where(iota_nb_() < N, lf, imax)
        ub = random_bits((1, BT), salt0 + 2 * m)
        u = ub.astype(jnp.float32) * inv32 + half_f
        rank = jnp.sum((cdf_ref[:] < u).astype(jnp.int32), axis=0,
                       keepdims=True)
        lo = jnp.min(hvalid, axis=0, keepdims=True) - 1
        hi = jnp.max(jnp.where(iota_nb_() < N, lf, -imax), axis=0,
                     keepdims=True)

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
        iwin = jnp.min(jnp.where(score == srow, iota_nb_(), NP),
                       axis=0, keepdims=True)
        onehot = iota_nb_() == iwin
        dE_i = jnp.sum(jnp.where(onehot, lf, 0), axis=0,
                       keepdims=True, dtype=jnp.int32)
        nsw = jnp.sum(jnp.where(onehot, -sig, 0), axis=0, keepdims=True,
                      dtype=jnp.int32)
        ws = update_pass(ws, iwin, onehot, nsw)
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
    E_out[:] = E
    emin_out[:] = emin
    smin_out[:] = smin.astype(jnp.int8)
    itmin_out[:] = itmin


@partial(jax.jit, static_argnames=("block_chains", "t_bits", "n_phys",
                                   "cmax", "k_", "bits", "spw", "nw"))
def _pallas_eo_sat_run(sigma, wTs, E, emin, smin, itmin, cdf, TL, P,
                       seed, n_moves, *, block_chains, t_bits, n_phys,
                       cmax, k_, bits, spw, nw):
    """SAT EO: sigma/smin [B, NP] int8, wTs nw-tuple of [NP, B] i32
    (input-only; an EO run never resumes from the words)."""
    sigmaT, sminT = sigma.T, smin.T
    NP, B = sigmaT.shape
    BT = block_chains
    grid = (B // BT,)
    kernel = partial(_eo_sat_kernel, N=n_phys, NP=NP, K=k_, Cmax=cmax,
                     BT=BT, t_bits=t_bits, bits=bits, spw=spw, nw=nw)
    row = pl.BlockSpec((1, BT), lambda j: (0, j), memory_space=pltpu.VMEM)
    blk = pl.BlockSpec((NP, BT), lambda j: (0, j), memory_space=pltpu.VMEM)
    tbl = pl.BlockSpec((NP, 128), lambda j: (0, 0), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=([pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
                  + [pl.BlockSpec((NP, 1), lambda j: (0, 0),
                                  memory_space=pltpu.VMEM)]      # cdf
                  + [tbl, tbl]
                  + [blk] + [blk] * nw + [row, row, blk, row]),
        out_specs=[blk, row, row, blk, row],
        out_shape=[jax.ShapeDtypeStruct((NP, B), jnp.int8),
                   jax.ShapeDtypeStruct((1, B), jnp.int32),
                   jax.ShapeDtypeStruct((1, B), jnp.int32),
                   jax.ShapeDtypeStruct((NP, B), jnp.int8),
                   jax.ShapeDtypeStruct((1, B), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=_INTERPRET,
    )(seed, n_moves, cdf, TL, P, sigmaT, *wTs, E[None, :],
      emin[None, :], sminT, itmin[None, :])
    sig_out, E_out, emin_out, smin_out, itmin_out = outs
    return (sig_out.T, E_out[0], emin_out[0], smin_out.T, itmin_out[0])
