"""Pallas TPU kernels for replica composites over dense bases: GraphQuant
(Trotter ring) and GraphRobustEnsemble (RE star) — the paper's QIsing and
REIsing workloads at kernel speed.

Both wrappers are M replicas of a dense `base` plus a same-site coupling
across replicas (/root/reference/src/graphs/QT.jl:126-199, RE.jl:216-327).
Flattened to one [Nk*M, Nk*M] coupling matrix the ring would stream ~1 GB of
J per move, and the RE star is not pairwise at all (log-cosh of the replica
magnetization). Exploiting the replica structure instead, the composite
physical flip cost of site j = (i, k) is

    dE_j = 2 s_j * [ sb * (J_base @ s_k + h)_i ]  +  extra_j

    extra_j (ring) = 2 s_j * c4 * (s_{k-1,i} + s_{k+1,i})
                     — c4 = fourK/4; the ring neighbors are exactly +-Nk
                       rows of the replica-major composite
                       (QT.jl:105-108, models/replicas.py layout), ONE
                       sublane rotate;
    extra_j (star) = s_j * fk(mu_i - s_j)
                     — mu_i = sum_k s_{k,i} (M-1 sublane-block adds) and
                       fk the M-entry Delta-E table of RE.jl:60-67,
                       looked up by an unrolled M-way select (Mosaic has
                       no dynamic gather).

with sb = base.scale * resid.weight — i.e. M small [Nk, Nk] x [Nk, BT] MXU
matmuls on the VMEM-resident base J (exact bf16 for integer bases, f32 for
float bases) plus O(M) vector passes. ~M times fewer FLOPs than the
flattened dense form and no HBM streaming.

Two kernels share the dE identity:

* rejection-free race kernel (modes bkl / wtm / rrr) — identical move
  selection, time bookkeeping, and acceptance accounting to
  ops/rejfree_pallas.py, with f32 PHYSICAL energies (the composite mixes
  the base's integer grid with irrational wrapper constants);
* sequential Metropolis sweep kernel (the Metropolis baseline of the
  paper's experiments, /root/reference/scripts/scripts.jl:766-963) — the
  delayed-update window scheme of ops/sk_pallas.py, with windows contained
  in one replica block (cross-replica partners live in OTHER blocks, so the
  in-window correction needs only the base J block; the rank-W commit adds
  the base update to the mover's block plus, ring: the c4-scaled delta to
  the two ring-neighbor blocks' aligned rows / star: the integer delta to
  the mu table).

Kernel-rrr on the composite is the SingleGraph rrr law on the flattened
model (moves ~ min(1, e^{-beta dE_total}), staged z/z') — same stationary
distribution as the reference's Double-graph rrr, reached by a different
(typically faster-mixing) chain; the XLA path keeps the inner+residual
split.
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

#: composite-size cap: sig int32 + matmul copy + (sweep) lf f32 scratch at
#: BT=128 must fit VMEM
_RING_NM_MAX = 32768
#: star select-chain cap: the fk lookup costs M vector passes per move
_STAR_M_MAX = 16


# ---------------------------------------------------------------------------
# Spec extraction: QuantModel / REModel -> kernel tables (host-side, cached)
# ---------------------------------------------------------------------------

_SPEC_CACHE: dict = {}


def composite_spec(model):
    """Kernel tables for a GraphQuant / GraphRobustEnsemble over a
    FullyConnected (or densifiable Pairwise) base, or None if the model
    does not fit the kernel:

    {term: "ring"|"star", Jb [Nk, Nk] bf16/f32, hph [Nk*M, 1] f32
     (= sb*h tiled), sb, c4 (ring), fk [M] f32 (star), M, Nk, flt} —
    flt marks a float base (f32 matmul instead of exact bf16)."""
    from ..models.dense import FullyConnected, densify
    from ..models.pairwise import Pairwise
    from ..models.replicas import QuantModel, Replicated, REModel
    from ..samplers.common import bound_cache_put
    from .rejfree_pallas import _dense_rejfree_ok

    if isinstance(model, QuantModel):
        term = "ring"
    elif isinstance(model, REModel):
        term = "star"
    else:
        return None
    resid = model.resid_m
    if not isinstance(resid, Replicated) or resid.offset != 0:
        return None
    base = resid.base
    bid = base.J if hasattr(base, "J") else base
    # the wrapper constants live in static metadata: ring = c4 (inner
    # scale), star = the fk table's (gamma, beta) — both must key the cache
    consts = (float(model.inner_m.scale),
              float(getattr(model.inner_m, "gamma", 0.0)),
              float(getattr(model.inner_m, "beta_p", 0.0)))
    key = (id(bid), term, model.M, consts, float(resid.weight))
    ent = _SPEC_CACHE.get(key)
    if ent is not None and ent[0] is bid:
        return ent[1]
    dense = base
    if isinstance(dense, Pairwise) and not isinstance(dense, FullyConnected):
        if dense.N % 128 != 0 or dense.N * model.M > _RING_NM_MAX:
            return None       # can't qualify: skip the host-side densify
        try:
            dense = densify(dense)
        except AssertionError:
            return None
    if not isinstance(dense, FullyConnected):
        return None
    Nk, M = dense.N, model.M
    if Nk % 128 != 0 or M <= 2 or Nk * M > _RING_NM_MAX:
        return None
    if term == "star" and M > _STAR_M_MAX:
        return None
    integer = jnp.issubdtype(dense.J.dtype, jnp.integer)
    if integer and not _dense_rejfree_ok(dense):
        return None
    jd = jnp.bfloat16 if integer else jnp.float32
    sb = float(dense.scale) * float(resid.weight)
    h = np.asarray(dense.h, np.float64) * sb
    c4 = float(model.inner_m.scale) if term == "ring" else 0.0
    fk = (tuple(float(v) for v in np.asarray(model.inner_m.fk))
          if term == "star" else ())
    spec = {
        "term": term,
        "Jb": jnp.asarray(np.asarray(dense.J, np.float32), jd),
        "hph": jnp.asarray(np.tile(h.reshape(Nk, 1), (M, 1)), jnp.float32),
        "sb": sb, "c4": c4, "fk": fk,
        # wrapper constants ride SMEM so one compile serves a whole
        # Gamma/gamma ladder (fk/c4 as static args would recompile per rung)
        "params": jnp.asarray((sb, c4) + fk + (0.0,) * (M - len(fk)),
                              jnp.float32),
        "M": M, "Nk": Nk, "flt": not integer,
    }
    bound_cache_put(_SPEC_CACHE, key, (bid, spec))
    return spec


def quant_ring_spec(model):
    """Back-compat alias: spec when the model is a ring composite."""
    spec = composite_spec(model)
    return spec if spec is not None and spec["term"] == "ring" else None


def replica_composite_eligible(model, chains: int) -> bool:
    if chains % 128 != 0:
        return False
    if composite_spec(model) is not None:
        return True
    return composite_sparse_spec(model) is not None


#: back-compat name used by earlier routing call sites
quant_ring_eligible = replica_composite_eligible


# ---------------------------------------------------------------------------
# Shared dE identity
# ---------------------------------------------------------------------------


def _make_dE(jb_ref, hph_ref, params_ref, *, term, Nk, M, BT, flt):
    """Returns dE_phys(sig[int32 NM x BT]) -> f32 [NM, BT]: the physical
    cost of flipping each composite site at state sig. M static-sliced base
    matmuls, then the ring rotate or the star mu/fk select-chain."""
    NM = Nk * M
    mm_dt = jnp.float32 if flt else jnp.bfloat16
    sbc = params_ref[0]
    c4c = params_ref[1]

    def base_lf(sig):
        sigm = sig.astype(mm_dt)
        parts = []
        for k in range(M):                       # static slices of a VALUE
            s_k = sigm[k * Nk:(k + 1) * Nk, :]
            parts.append(jax.lax.dot_general(
                jb_ref[:], s_k,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        return sbc * jnp.concatenate(parts, axis=0) + hph_ref[:]

    if term == "ring":
        def dE_phys(sig):
            lf = base_lf(sig)
            ring = (pltpu.roll(sig, Nk, axis=0)
                    + pltpu.roll(sig, NM - Nk, axis=0))
            lf = lf + c4c * ring.astype(jnp.float32)
            return 2.0 * sig.astype(jnp.float32) * lf
        return dE_phys

    fk_c = [params_ref[2 + d] for d in range(M)]

    def dE_phys(sig):
        lf = base_lf(sig)
        mu = sig[0:Nk, :]
        for k in range(1, M):
            mu = mu + sig[k * Nk:(k + 1) * Nk, :]
        rows = []
        for k in range(M):
            s_b = sig[k * Nk:(k + 1) * Nk, :]
            idx = (mu - s_b + (M - 1)) >> 1      # int32 in [0, M-1]
            fkv = jnp.zeros((Nk, BT), jnp.float32)
            for d in range(M):                   # unrolled M-way select
                fkv = fkv + jnp.where(idx == d, fk_c[d], jnp.float32(0.0))
            s_f = s_b.astype(jnp.float32)
            rows.append(2.0 * s_f * lf[k * Nk:(k + 1) * Nk, :] + s_f * fkv)
        return jnp.concatenate(rows, axis=0)

    return dE_phys


# ---------------------------------------------------------------------------
# Rejection-free race kernel (bkl / wtm / rrr)
# ---------------------------------------------------------------------------


def _ring_rejfree_kernel(seed_ref, beta_ref, target_ref, params_ref,
                         jb_ref, hph_ref,
                         sigma_ref, E_ref, coord_ref, acc_ref, zacc_ref,
                         sigma_out, E_out, coord_out, acc_out, zacc_out,
                         cs_out, es_out, *, term, Nk, M, BT, n_moves,
                         mode, flt):
    """Same race machinery as ops/rejfree_pallas._rejfree_dense_kernel with
    the replica-composite dE and f32 physical energies."""
    wtm = mode == "wtm"
    NM = Nk * M
    seed_p = program_seed(seed_ref[0], pl.program_id(0))
    pltpu.prng_seed(seed_p)
    salt0 = seed_p * jnp.int32(1000003)
    beta = beta_ref[0]
    target = target_ref[0]
    dE_phys = _make_dE(jb_ref, hph_ref, params_ref, term=term, Nk=Nk,
                       M=M, BT=BT, flt=flt)
    iota_nb = jax.lax.broadcasted_iota(jnp.int32, (NM, BT), 0)
    inv32 = jnp.float32(2.0 ** -32)
    half_f = jnp.float32(0.5)

    def to_uniform(rb):
        return rb.astype(jnp.float32) * inv32 + half_f

    def move(m, carry):
        sig, E, coord, acc, zacc = carry
        active = coord < target                       # [1, BT]
        dE = dE_phys(sig)                             # f32 [NM, BT]
        bE = beta * jnp.maximum(dE, 0.0)
        u = to_uniform(random_bits((NM, BT), salt0 + 3 * m))
        score = jnp.log(-jnp.log(u)) + bE
        mrow = jnp.min(score, axis=0, keepdims=True)
        sel = score == mrow
        imin = jnp.min(jnp.where(sel, iota_nb, NM), axis=0, keepdims=True)
        onehot = iota_nb == imin
        dE_i = jnp.sum(jnp.where(onehot, dE, 0.0), axis=0, keepdims=True)
        z = jnp.sum(jnp.exp(-bE), axis=0, keepdims=True)
        zacc = zacc + jnp.where(active, z * jnp.float32(1.0 / NM),
                                jnp.float32(0.0))
        if mode == "rrr":
            sig2 = jnp.where(onehot, -sig, sig)
            bE2 = beta * jnp.maximum(dE_phys(sig2), 0.0)
            m1 = jnp.min(bE, axis=0, keepdims=True)
            m2 = jnp.min(bE2, axis=0, keepdims=True)
            z1 = jnp.sum(jnp.exp(m1 - bE), axis=0, keepdims=True)
            z2 = jnp.sum(jnp.exp(m2 - bE2), axis=0, keepdims=True)
            ua = to_uniform(random_bits((1, BT), salt0 + 3 * m + 1))
            do = active & (jnp.log(ua)
                           < jnp.log(z1) - jnp.log(z2) + (m2 - m1))
            sig = jnp.where(onehot & do, -sig, sig)
            E = E + jnp.where(do, dE_i, 0.0)
            coord = coord + jnp.where(active, 1, 0)
            acc = acc + do.astype(jnp.int32)
        else:
            sig = jnp.where(onehot & active, -sig, sig)
            E = E + jnp.where(active, dE_i, 0.0)
            acc = acc + active.astype(jnp.int32)
        if wtm:
            coord = coord + jnp.where(active, jnp.exp(mrow),
                                      jnp.float32(0.0))
        elif mode == "bkl":
            u2 = to_uniform(random_bits((1, BT), salt0 + 3 * m + 1))
            skip = _geom_skip(u2, z * jnp.float32(1.0 / NM))
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


@partial(jax.jit, static_argnames=("term", "Nk", "M", "block_chains",
                                   "n_moves", "mode", "flt"))
def _pallas_ring_rejfree_chunk(sigma, E, coord, acc, zacc, Jb, hph, params,
                               seed, beta, target, *, term, Nk, M,
                               block_chains, n_moves, mode, flt):
    sigmaT = sigma.T
    NM, B = sigmaT.shape
    BT = block_chains
    grid = (B // BT,)
    ct = jnp.float32 if mode == "wtm" else jnp.int32
    kernel = partial(_ring_rejfree_kernel, term=term, Nk=Nk, M=M,
                     BT=BT, n_moves=n_moves, mode=mode, flt=flt)
    row = pl.BlockSpec((1, BT), lambda j: (0, j), memory_space=pltpu.VMEM)
    stream = pl.BlockSpec((n_moves, BT), lambda j: (0, j),
                          memory_space=pltpu.VMEM)
    sig_out, E_out, coord_out, acc_out, zacc_out, cs, es = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),      # seed
            pl.BlockSpec(memory_space=pltpu.SMEM),      # beta
            pl.BlockSpec(memory_space=pltpu.SMEM),      # target
            pl.BlockSpec(memory_space=pltpu.SMEM),      # params [sb c4 fk..]
            pl.BlockSpec((Nk, Nk), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),      # Jb
            pl.BlockSpec((NM, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),      # hph
            pl.BlockSpec((NM, BT), lambda j: (0, j), memory_space=pltpu.VMEM),
            row, row, row, row,
        ],
        out_specs=[
            pl.BlockSpec((NM, BT), lambda j: (0, j), memory_space=pltpu.VMEM),
            row, row, row, row, stream, stream,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NM, B), jnp.int8),
            jax.ShapeDtypeStruct((1, B), jnp.float32),
            jax.ShapeDtypeStruct((1, B), ct),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.float32),
            jax.ShapeDtypeStruct((n_moves, B), ct),
            jax.ShapeDtypeStruct((n_moves, B), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=_INTERPRET,
    )(seed, beta, target, params, Jb, hph, sigmaT,
      E[None, :].astype(jnp.float32),
      coord[None, :].astype(ct), acc[None, :], zacc[None, :])
    return (sig_out.T, E_out[0], coord_out[0], acc_out[0], zacc_out[0],
            cs, es)


@partial(jax.jit, static_argnames=("term", "Nk", "M", "bt",
                                   "chunk_moves", "mode", "flt"))
def ring_rejfree_run(Jb, hph, params, beta, sigma, E, coord, Es, seed0,
                     target, step, scale, *, term, Nk, M, bt, chunk_moves,
                     mode, flt):
    """Whole hookless run in ONE jit (see rejfree_pallas.rejfree_run);
    energies are f32 PHYSICAL throughout (scale is 1.0 for composites)."""
    from ..samplers.bkl import _fill_checkpoints

    B = sigma.shape[0]
    target_arr = target.reshape(1)
    acc = jnp.zeros((B,), jnp.int32)
    zacc = jnp.zeros((B,), jnp.float32)

    def cond(carry):
        return jnp.min(carry[2]) < target

    def body(carry):
        sigma, E, coord, acc, zacc, Es, k = carry
        seed = (seed0 + k * jnp.int32(7919)).reshape(1)
        x_start = coord
        e_start = E.astype(Es.dtype) * scale
        sigma, E, coord, acc, zacc, cs, es = _pallas_ring_rejfree_chunk(
            sigma, E, coord, acc, zacc, Jb, hph, params, seed, beta,
            target_arr, term=term, Nk=Nk, M=M, block_chains=bt,
            n_moves=chunk_moves, mode=mode, flt=flt)
        Es = _fill_checkpoints(Es, step, x_start, e_start, cs,
                               es.astype(Es.dtype) * scale)
        return sigma, E, coord, acc, zacc, Es, k + 1

    k0 = jnp.zeros((), jnp.int32)
    sigma, E, coord, acc, zacc, Es, _ = jax.lax.while_loop(
        cond, body, (sigma, E, coord, acc, zacc, Es, k0))
    return sigma, E, coord, Es, acc, zacc


class PallasRingRejFree:
    """Rejection-free runner (bkl / wtm / rrr) for GraphQuant /
    GraphRobustEnsemble composites — same .run() surface as
    rejfree_pallas.PallasRejectionFree so samplers.bkl._rejfree_mc drives
    both. Energies are f32 physical (flt is always True for the driver's
    dtype selection); .kind reports ring / star."""

    flt = True

    def __init__(self, model, beta: float, mode: str, *,
                 block_chains: int = 128, chunk_moves: int = 512):
        spec = composite_spec(model)
        self.sparse = spec is None
        if self.sparse:
            spec = composite_sparse_spec(model)
        assert spec is not None, "model is not replica-composite eligible"
        assert mode in ("bkl", "wtm", "rrr")
        self.model, self.mode = model, mode
        self.spec = spec
        self.kind = spec["term"] + ("-sparse" if self.sparse else "")
        self.beta = jnp.asarray([beta], jnp.float32)
        self.block_chains = block_chains
        self.chunk_moves = chunk_moves

    def run(self, sigma, E, coord, Es, seed, target, step, scale):
        s = self.spec
        if self.sparse:
            base = self.model.resid_m.base
            sigp, lfT = _sparse_comp_prep(
                base, sigma, s["Nk"], s["NkP"], s["M"], not s["flt"])
            return sparse_comp_run(
                s["nbr"], s["jc"], s["hph"], s["vcol"], s["params"],
                self.beta, sigp, lfT, E, coord, Es, seed, target, step,
                scale, term=s["term"], Nk=s["Nk"], NkP=s["NkP"], M=s["M"],
                bt=self.block_chains, chunk_moves=self.chunk_moves,
                mode=self.mode, flt=s["flt"])
        return ring_rejfree_run(
            s["Jb"], s["hph"], s["params"], self.beta, sigma, E, coord,
            Es, seed, target, step, scale, term=s["term"], Nk=s["Nk"],
            M=s["M"], bt=self.block_chains, chunk_moves=self.chunk_moves,
            mode=self.mode, flt=s["flt"])


# ---------------------------------------------------------------------------
# Sequential Metropolis sweep kernel (the paper's Metropolis baseline)
# ---------------------------------------------------------------------------


def _ring_window_moves(Jw_sb, sig_w, lf_w, extra_w, rbits, beta, *, W):
    """W unrolled sequential Metropolis decisions in one window (all f32):
    decision k sees the in-window correction of flips 0..k-1 through the
    sb-scaled base J block (cross-replica partners are in other replica
    blocks). extra_w [W, BT] is the non-base dE contribution per row
    (ring: 2*s*c4*(ring neighbors); star: s*fk(mu - s)) — constant within
    the window because in-window rows are distinct sites."""
    new_rows, delta_rows = [], []
    dE_w = jnp.zeros((1, rbits.shape[1]), jnp.float32)
    acc_w = jnp.zeros((1, rbits.shape[1]), jnp.int32)
    for k in range(W):
        s_k = sig_w[k:k + 1, :]                       # [1, BT] int32
        s_f = s_k.astype(jnp.float32)
        dE = 2.0 * s_f * lf_w[k:k + 1, :] + extra_w[k:k + 1, :]
        p = jnp.exp(-beta * dE)
        th = jnp.clip(
            p * jnp.float32(4294967296.0) - jnp.float32(2147483648.0),
            jnp.float32(-2147483648.0),
            jnp.float32(2147483520.0)).astype(jnp.int32)
        acc = (dE <= 0) | (rbits[k:k + 1, :] < th)
        d_k = jnp.where(acc, -2.0 * s_f, 0.0)         # [1, BT] f32
        new_rows.append(jnp.where(acc, -s_k, s_k))
        delta_rows.append(d_k)
        lf_w = lf_w + Jw_sb[:, k:k + 1] * d_k
        dE_w = dE_w + jnp.where(acc, dE, 0.0)
        acc_w = acc_w + acc.astype(jnp.int32)
    return (jnp.concatenate(new_rows, axis=0),
            jnp.concatenate(delta_rows, axis=0), dE_w, acc_w)


def _ring_sweep_kernel(seed_ref, ns_ref, beta_ref, params_ref, jb_ref,
                       hph_ref,
                       sigma_ref, lf_ref, E_ref, acc_ref,
                       sigma_out, lf_out, E_out, acc_out,
                       sig_s, lf_s, mu_s, *, term, Nk, M, W, BT, flt):
    """n_sweeps (dynamic) typewriter sweeps over the [NM, BT] composite:
    windows of W sites inside one replica block; rank-W base commit to the
    mover's block plus the wrapper commit (ring: c4*delta to the two
    ring-neighbor blocks' aligned rows; star: integer delta into the mu
    table, from which the fk extra is evaluated per window)."""
    NM = Nk * M
    seed_p = program_seed(seed_ref[0], pl.program_id(0))
    pltpu.prng_seed(seed_p)
    salt0 = seed_p * jnp.int32(1000003)
    n_sweeps = ns_ref[0]
    beta = beta_ref[0]
    sbc = params_ref[0]
    c4c = params_ref[1]
    n_win = NM // W
    mm_dt = jnp.float32 if flt else jnp.bfloat16
    fk_c = [params_ref[2 + d] for d in range(M)]
    star = term == "star"

    sig_s[:] = sigma_ref[:].astype(jnp.int32)
    lf_s[:] = lf_ref[:]
    if star:
        # mu is cheap to rebuild per dispatch (M-1 adds): no state threading
        mu = sig_s[pl.ds(0, Nk), :]
        for k in range(1, M):
            mu = mu + sig_s[pl.ds(k * Nk, Nk), :]
        mu_s[:] = mu

    def window_extra(k, base_i, row0):
        """[W, BT] non-base dE contribution for window rows (see
        _ring_window_moves)."""
        sig_w = sig_s[pl.ds(row0, W), :]
        if star:
            mu_w = mu_s[pl.ds(base_i, W), :]
            idx = (mu_w - sig_w + (M - 1)) >> 1
            fkv = jnp.zeros((W, BT), jnp.float32)
            for d in range(M):
                fkv = fkv + jnp.where(idx == d, fk_c[d], jnp.float32(0.0))
            return sig_w.astype(jnp.float32) * fkv
        up = pl.multiple_of(((k + 1) % M) * Nk + base_i, W)
        dn = pl.multiple_of(((k + M - 1) % M) * Nk + base_i, W)
        ring = sig_s[pl.ds(up, W), :] + sig_s[pl.ds(dn, W), :]
        return (2.0 * c4c) * (sig_w * ring).astype(jnp.float32)

    def one_window(sw, w, carry):
        E, acc = carry
        k = (w * W) // Nk                     # replica block of this window
        base_i = (w * W) % Nk                 # row offset inside the base
        row0 = pl.multiple_of(w * W, W)
        bi = pl.multiple_of(base_i, W)
        Jw_sb = sbc * jb_ref[pl.ds(bi, W), pl.ds(bi, W)].astype(jnp.float32)
        rbits = random_bits((W, BT), salt0 + sw * n_win + w)
        new_rows, delta, dE_w, acc_w = _ring_window_moves(
            Jw_sb, sig_s[pl.ds(row0, W), :], lf_s[pl.ds(row0, W), :],
            window_extra(k, bi, row0), rbits, beta, W=W)
        sig_s[pl.ds(row0, W), :] = new_rows
        # base commit: lf[replica k block] += sb * J[win, :]^T @ delta
        upd = jax.lax.dot_general(
            jb_ref[pl.ds(bi, W), :].astype(mm_dt), delta.astype(mm_dt),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        krow = pl.multiple_of(k * Nk, W)
        lf_s[pl.ds(krow, Nk), :] = lf_s[pl.ds(krow, Nk), :] + sbc * upd
        if star:
            mu_s[pl.ds(bi, W), :] = (mu_s[pl.ds(bi, W), :]
                                     + delta.astype(jnp.int32))
        # ring needs no commit beyond the spins: window_extra reads the
        # ring partners' CURRENT spins from sig_s (lf_s stays base-only)
        return E + dE_w, acc + acc_w

    def one_sweep(sw, carry):
        return jax.lax.fori_loop(0, n_win, partial(one_window, sw), carry)

    E, acc = jax.lax.fori_loop(
        0, n_sweeps, one_sweep, (E_ref[:], acc_ref[:]))
    sigma_out[:] = sig_s[:].astype(jnp.int8)
    lf_out[:] = lf_s[:]
    E_out[:] = E
    acc_out[:] = acc


@partial(jax.jit, static_argnames=("term", "Nk", "M", "W",
                                   "block_chains", "flt"))
def _pallas_ring_sweep(sigma, lfT, E, acc, Jb, hph, params, seed, n_sweeps,
                       beta, *, term, Nk, M, W, block_chains, flt):
    sigmaT = sigma.T
    NM, B = sigmaT.shape
    BT = block_chains
    grid = (B // BT,)
    kernel = partial(_ring_sweep_kernel, term=term, Nk=Nk, M=M, W=W,
                     BT=BT, flt=flt)
    row = pl.BlockSpec((1, BT), lambda j: (0, j), memory_space=pltpu.VMEM)
    blk = pl.BlockSpec((NM, BT), lambda j: (0, j), memory_space=pltpu.VMEM)
    sig_out, lf_out, E_out, acc_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),      # seed
            pl.BlockSpec(memory_space=pltpu.SMEM),      # n_sweeps
            pl.BlockSpec(memory_space=pltpu.SMEM),      # beta
            pl.BlockSpec(memory_space=pltpu.SMEM),      # params [sb c4 fk..]
            pl.BlockSpec((Nk, Nk), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),      # Jb
            pl.BlockSpec((NM, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),      # hph
            blk, blk, row, row,
        ],
        out_specs=[blk, blk, row, row],
        out_shape=[
            jax.ShapeDtypeStruct((NM, B), jnp.int8),
            jax.ShapeDtypeStruct((NM, B), jnp.float32),
            jax.ShapeDtypeStruct((1, B), jnp.float32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((NM, BT), jnp.int32),            # sig_s
            pltpu.VMEM((NM, BT), jnp.float32),          # lf_s
            pltpu.VMEM((Nk, BT), jnp.int32),            # mu_s (star)
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=_INTERPRET,
    )(seed, n_sweeps, beta, params, Jb, hph, sigmaT, lfT,
      E[None, :].astype(jnp.float32), acc[None, :])
    return sig_out.T, lf_out, E_out[0], acc_out[0]


class PallasRingSweeper:
    """Reusable Metropolis sweep runner for GraphQuant /
    GraphRobustEnsemble composites; holds the base J on device, threads the
    f32 BASE local fields across calls (the wrapper extra is re-derived
    in-kernel: ring rows from the spins, star from the mu table)."""

    def __init__(self, model, beta: float, *, window: int = 128,
                 block_chains: int = 128):
        spec = composite_spec(model)
        assert spec is not None, "model is not replica-composite eligible"
        assert spec["Nk"] % window == 0
        self.model = model
        self.spec = spec
        self.beta = jnp.asarray([beta], jnp.float32)
        self.W = window
        self.block_chains = block_chains

    def lf_init(self, sigma):
        """BASE local fields [NM, B] f32 (one jitted call): sb*(J@s_k+h)."""
        s = self.spec
        return _base_lf_init(sigma, s["Jb"], s["hph"], Nk=s["Nk"],
                             M=s["M"], sb=s["sb"])

    def __call__(self, sigma, E, acc, *, seed: int, n_sweeps: int, lfT=None):
        """sigma [B, NM] int8, E [B] f32 physical. Returns
        (sigma', E', acc', lfT') — pass lfT back for warm continuation."""
        s = self.spec
        if lfT is None:
            lfT = self.lf_init(sigma)
        sig, lfT, E, acc = _pallas_ring_sweep(
            sigma, lfT, E, acc, s["Jb"], s["hph"], s["params"],
            jnp.asarray([seed], jnp.int32),
            jnp.asarray([n_sweeps], jnp.int32), self.beta,
            term=s["term"], Nk=s["Nk"], M=s["M"], W=self.W,
            block_chains=self.block_chains, flt=s["flt"])
        return sig, E, acc, lfT


@partial(jax.jit, static_argnames=("Nk", "M", "sb"))
def _base_lf_init(sigma, Jb, hph, *, Nk, M, sb):
    """sb*(J_base @ s_k + h) per replica block, [NM, B] f32 (one einsum).

    NOTE: the ring sweep kernel historically threaded the FULL composite lf
    (base + ring rows); it now threads the base-only lf and re-derives the
    wrapper extra in-kernel, which keeps one code path for ring and star."""
    B = sigma.shape[0]
    s = sigma.reshape(B, M, Nk).astype(jnp.float32)
    lf = jnp.float32(sb) * jnp.einsum(
        "ij,bkj->bki", Jb.astype(jnp.float32), s)
    return (lf.reshape(B, M * Nk) + hph[None, :, 0]).T

# ---------------------------------------------------------------------------
# Sparse-base composites: GraphQuant / GraphRobustEnsemble over a SPARSE
# Pairwise base (Quant(RRG), RE(RRG) — the reference's QT.jl:126-199 /
# RE.jl:70-104 over DeltaE.jl's O(deg) caches). Instead of M dense matmuls,
# the BASE local-field table lives RESIDENT in VMEM across moves (int32 for
# integer bases: exact, no drift) and each flip updates it with the sparse
# kernel's inverse-column trick on COMPOSITE-indexed neighbor tables (the
# base [Nk, Kb] tables tiled per replica block, so cross-block isolation is
# automatic). The wrapper term is re-derived per move: ring = two sublane
# rolls by the padded block stride; star = M block adds for mu + the
# unrolled fk select. Race / z / skip / staged-z' identical to the other
# rejection-free kernels; energies f32 physical.
# ---------------------------------------------------------------------------

#: sparse-composite caps (resident [NMp, BT] tables like the sparse kernel)
_SPARSE_COMP_NM_MAX = 16384
_SPARSE_COMP_KB_MAX = 16

_SPARSE_SPEC_CACHE: dict = {}


def composite_sparse_spec(model):
    """Kernel tables for a GraphQuant / GraphRobustEnsemble over a sparse
    Pairwise base, or None: {term, nbr/jc [NMp, Kb] composite-indexed
    inverse tables, hph/vcol [NMp, 1], params, M, Nk, NkP, flt}."""
    from ..models.dense import FullyConnected
    from ..models.pairwise import Pairwise
    from ..models.replicas import QuantModel, Replicated, REModel
    from ..samplers.common import bound_cache_put
    from .rejfree_pallas import _sparse_rejfree_ok

    if isinstance(model, QuantModel):
        term = "ring"
    elif isinstance(model, REModel):
        term = "star"
    else:
        return None
    resid = model.resid_m
    if not isinstance(resid, Replicated) or resid.offset != 0:
        return None
    base = resid.base
    if (not isinstance(base, Pairwise) or isinstance(base, FullyConnected)
            or not _sparse_rejfree_ok(base)):
        return None
    Nk, M = base.N, model.M
    NkP = -(-Nk // 8) * 8
    NMp = NkP * M
    if (M <= 2 or NMp > _SPARSE_COMP_NM_MAX
            or base.K > _SPARSE_COMP_KB_MAX):
        return None
    if term == "star" and M > _STAR_M_MAX:
        return None
    consts = (float(model.inner_m.scale),
              float(getattr(model.inner_m, "gamma", 0.0)),
              float(getattr(model.inner_m, "beta_p", 0.0)))
    key = (id(base.J), term, M, consts, float(resid.weight))
    ent = _SPARSE_SPEC_CACHE.get(key)
    if ent is not None and ent[0] is base.J:
        return ent[1]
    integer = jnp.issubdtype(base.J.dtype, jnp.integer)
    jd = np.int32 if integer else np.float32
    neigh = np.asarray(base.neigh)
    Jb = np.asarray(base.J).astype(jd)
    Kb = base.K
    nbr = np.full((NMp, Kb), NMp, np.int32)       # sentinel: never a winner
    jc = np.zeros((NMp, Kb), jd)
    vcol = np.zeros((NMp, 1), np.int32)
    sb = float(base.scale) * float(resid.weight)
    hph = np.zeros((NMp, 1), np.float32)
    hb = np.asarray(base.h, np.float64) * sb
    for k in range(M):
        r0 = k * NkP
        nbr[r0:r0 + Nk] = neigh + r0
        jc[r0:r0 + Nk] = Jb
        vcol[r0:r0 + Nk, 0] = 1
        hph[r0:r0 + Nk, 0] = hb
    c4 = float(model.inner_m.scale) if term == "ring" else 0.0
    fk = (tuple(float(v) for v in np.asarray(model.inner_m.fk))
          if term == "star" else ())
    spec = {
        "term": term,
        "nbr": jnp.asarray(nbr), "jc": jnp.asarray(jc),
        "hph": jnp.asarray(hph), "vcol": jnp.asarray(vcol),
        "sb": sb, "c4": c4, "fk": fk,
        "params": jnp.asarray((sb, c4) + fk + (0.0,) * (M - len(fk)),
                              jnp.float32),
        "M": M, "Nk": Nk, "NkP": NkP, "flt": not integer,
    }
    bound_cache_put(_SPARSE_SPEC_CACHE, key, (base.J, spec))
    return spec


def _sparse_comp_kernel(seed_ref, beta_ref, target_ref, params_ref,
                        nbr_ref, jc_ref, hph_ref, vcol_ref,
                        sigma_ref, lf_ref, E_ref, coord_ref, acc_ref,
                        zacc_ref,
                        sigma_out, lf_out, E_out, coord_out, acc_out,
                        zacc_out, cs_out, es_out,
                        *, term, Nk, NkP, M, Kb, BT, n_moves, mode, flt):
    """Race-selected moves on the [NMp, BT] composite with a RESIDENT base
    local-field table (int32 for integer bases). nbr/jc are the composite-
    indexed inverse tables; the wrapper extra is re-derived per move."""
    wtm = mode == "wtm"
    NMp = NkP * M
    NM = Nk * M
    seed_p = program_seed(seed_ref[0], pl.program_id(0))
    pltpu.prng_seed(seed_p)
    salt0 = seed_p * jnp.int32(1000003)
    beta = beta_ref[0]
    target = target_ref[0]
    sbc = params_ref[0]
    c4c = params_ref[1]
    fk_c = [params_ref[2 + d] for d in range(M)]
    iota_nb = jax.lax.broadcasted_iota(jnp.int32, (NMp, BT), 0)
    valid = vcol_ref[:] == 1
    lt = jnp.float32 if flt else jnp.int32
    inv32 = jnp.float32(2.0 ** -32)
    half_f = jnp.float32(0.5)
    inf = jnp.float32(3.0e38)
    log_n = jnp.log(jnp.float32(NM))

    def to_uniform(rb):
        return rb.astype(jnp.float32) * inv32 + half_f

    # per-use column loads (a pre-sliced [NP, 1] value is lane-padded to a
    # full tile and held live across the move loop — see ops/sat_pallas.py)
    def nbr_col(k):
        return nbr_ref[:, k][:, None]

    def jc_col(k):
        return jc_ref[:, k][:, None]

    def dE_phys(sig, lf):
        """f32 [NMp, BT] physical flip costs (the dense composite kernel's
        identity with the resident base lf in place of the matmuls)."""
        lff = sbc * lf.astype(jnp.float32) + hph_ref[:]
        s_f = sig.astype(jnp.float32)
        if term == "ring":
            ring = (pltpu.roll(sig, NkP, axis=0)
                    + pltpu.roll(sig, NMp - NkP, axis=0))
            return 2.0 * s_f * (lff + c4c * ring.astype(jnp.float32))
        mu = sig[0:NkP, :]
        for k in range(1, M):
            mu = mu + sig[k * NkP:(k + 1) * NkP, :]
        rows = []
        for k in range(M):
            s_b = sig[k * NkP:(k + 1) * NkP, :]
            idx = (mu - s_b + (M - 1)) >> 1
            fkv = jnp.zeros((NkP, BT), jnp.float32)
            for d in range(M):
                fkv = fkv + jnp.where(idx == d, fk_c[d], jnp.float32(0.0))
            rows.append(s_b.astype(jnp.float32) * fkv)
        extra = jnp.concatenate(rows, axis=0)
        return 2.0 * s_f * lff + extra

    def logz_of(dE):
        bE = beta * jnp.maximum(dE, 0.0)
        m = jnp.min(jnp.where(valid, bE, inf), axis=0, keepdims=True)
        zs = jnp.sum(jnp.where(valid, jnp.exp(m - bE), 0.0),
                     axis=0, keepdims=True)
        return bE, jnp.log(zs) - m

    def move(m, carry):
        sig, lf, E, coord, acc, zacc = carry
        active = coord < target
        dE = dE_phys(sig, lf)
        bE, logz = logz_of(dE)
        u = to_uniform(random_bits((NMp, BT), salt0 + 3 * m))
        score = jnp.where(valid, jnp.log(-jnp.log(u)) + bE, inf)
        mrow = jnp.min(score, axis=0, keepdims=True)
        irow = jnp.min(jnp.where(score == mrow, iota_nb, NMp),
                       axis=0, keepdims=True)
        onehot = iota_nb == irow
        dE_i = jnp.sum(jnp.where(onehot, dE, 0.0), axis=0, keepdims=True)
        z_over_n = jnp.exp(logz - log_n)
        zacc = zacc + jnp.where(active, z_over_n, jnp.float32(0.0))
        # base-lf delta via the composite inverse columns (exact scatter)
        d_row = jnp.sum(jnp.where(onehot, -2 * sig, 0), axis=0,
                        keepdims=True).astype(lt)
        delta = jnp.zeros((NMp, BT), lt)
        for k in range(Kb):
            delta = delta + jc_col(k) * jnp.where(
                nbr_col(k) == irow, d_row, jnp.zeros((), lt))
        if mode == "rrr":
            sig2 = jnp.where(onehot, -sig, sig)
            _, logz2 = logz_of(dE_phys(sig2, lf + delta))
            ua = to_uniform(random_bits((1, BT), salt0 + 3 * m + 1))
            do = active & (jnp.log(ua) < logz - logz2)
            sig = jnp.where(onehot & do, -sig, sig)
            lf = lf + jnp.where(do, delta, jnp.zeros((), lt))
            E = E + jnp.where(do, dE_i, 0.0)
            coord = coord + jnp.where(active, 1, 0)
            acc = acc + do.astype(jnp.int32)
        else:
            sig = jnp.where(onehot & active, -sig, sig)
            lf = lf + jnp.where(active, delta, jnp.zeros((), lt))
            E = E + jnp.where(active, dE_i, 0.0)
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


@partial(jax.jit, static_argnames=("term", "Nk", "NkP", "M", "block_chains",
                                   "n_moves", "mode", "flt"))
def _pallas_sparse_comp_chunk(sigma, lfT, E, coord, acc, zacc, nbr, jc, hph,
                              vcol, params, seed, beta, target, *, term,
                              Nk, NkP, M, block_chains, n_moves, mode, flt):
    """sigma [B, NMp] int8 (padded layout), lfT [NMp, B] base local
    fields."""
    sigmaT = sigma.T
    NMp, B = sigmaT.shape
    Kb = nbr.shape[1]
    BT = block_chains
    grid = (B // BT,)
    ct = jnp.float32 if mode == "wtm" else jnp.int32
    kernel = partial(_sparse_comp_kernel, term=term, Nk=Nk, NkP=NkP, M=M,
                     Kb=Kb, BT=BT, n_moves=n_moves, mode=mode, flt=flt)
    row = pl.BlockSpec((1, BT), lambda j: (0, j), memory_space=pltpu.VMEM)
    blk = pl.BlockSpec((NMp, BT), lambda j: (0, j), memory_space=pltpu.VMEM)
    stream = pl.BlockSpec((n_moves, BT), lambda j: (0, j),
                          memory_space=pltpu.VMEM)

    def tbl(cols):
        return pl.BlockSpec((NMp, cols), lambda j: (0, 0),
                            memory_space=pltpu.VMEM)

    (sig_out, lf_out, E_out, coord_out, acc_out, zacc_out,
     cs, es) = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=([pl.BlockSpec(memory_space=pltpu.SMEM)] * 4
                  + [tbl(Kb), tbl(Kb), tbl(1), tbl(1)]
                  + [blk, blk, row, row, row, row]),
        out_specs=[blk, blk, row, row, row, row, stream, stream],
        out_shape=[
            jax.ShapeDtypeStruct((NMp, B), jnp.int8),
            jax.ShapeDtypeStruct((NMp, B), lfT.dtype),
            jax.ShapeDtypeStruct((1, B), jnp.float32),
            jax.ShapeDtypeStruct((1, B), ct),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.float32),
            jax.ShapeDtypeStruct((n_moves, B), ct),
            jax.ShapeDtypeStruct((n_moves, B), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=_INTERPRET,
    )(seed, beta, target, params, nbr, jc, hph, vcol, sigmaT, lfT,
      E[None, :].astype(jnp.float32), coord[None, :].astype(ct),
      acc[None, :], zacc[None, :])
    return (sig_out.T, lf_out, E_out[0], coord_out[0], acc_out[0],
            zacc_out[0], cs, es)


@partial(jax.jit, static_argnames=("Nk", "NkP", "M", "base_int"))
def _sparse_comp_prep(base, sigma, Nk, NkP, M, base_int):
    """([B, NMp] padded spins, [NMp, B] base local fields) from the
    sampler's [B, M*Nk] replica-major composite state."""
    B = sigma.shape[0]
    s = sigma.reshape(B, M, Nk)
    lf = jax.vmap(jax.vmap(base.local_fields))(s)      # [B, M, Nk]
    dt = jnp.int32 if base_int else jnp.float32
    lf = lf.astype(dt)
    pad = NkP - Nk
    if pad:
        s = jnp.concatenate(
            [s, jnp.ones((B, M, pad), jnp.int8)], axis=2)
        lf = jnp.concatenate([lf, jnp.zeros((B, M, pad), dt)], axis=2)
    return s.reshape(B, M * NkP), lf.reshape(B, M * NkP).T


@partial(jax.jit, static_argnames=("term", "Nk", "NkP", "M", "bt",
                                   "chunk_moves", "mode", "flt"))
def sparse_comp_run(nbr, jc, hph, vcol, params, beta, sigma, lfT, E, coord,
                    Es, seed0, target, step, scale, *, term, Nk, NkP, M,
                    bt, chunk_moves, mode, flt):
    """Whole hookless run in ONE jit; sigma/lfT are the PADDED layout (prep
    pads); returns sigma in the sampler's [B, M*Nk] layout."""
    from ..samplers.bkl import _fill_checkpoints

    B = sigma.shape[0]
    target_arr = target.reshape(1)
    acc = jnp.zeros((B,), jnp.int32)
    zacc = jnp.zeros((B,), jnp.float32)

    def cond(carry):
        return jnp.min(carry[3]) < target

    def body(carry):
        sigma, lfT, E, coord, acc, zacc, Es, k = carry
        seed = (seed0 + k * jnp.int32(7919)).reshape(1)
        x_start = coord
        e_start = E.astype(Es.dtype) * scale
        sigma, lfT, E, coord, acc, zacc, cs, es = _pallas_sparse_comp_chunk(
            sigma, lfT, E, coord, acc, zacc, nbr, jc, hph, vcol, params,
            seed, beta, target_arr, term=term, Nk=Nk, NkP=NkP, M=M,
            block_chains=bt, n_moves=chunk_moves, mode=mode, flt=flt)
        Es = _fill_checkpoints(Es, step, x_start, e_start, cs,
                               es.astype(Es.dtype) * scale)
        return sigma, lfT, E, coord, acc, zacc, Es, k + 1

    k0 = jnp.zeros((), jnp.int32)
    sigma, lfT, E, coord, acc, zacc, Es, _ = jax.lax.while_loop(
        cond, body, (sigma, lfT, E, coord, acc, zacc, Es, k0))
    sig = sigma.reshape(B, M, NkP)[:, :, :Nk].reshape(B, M * Nk)
    return sig, E, coord, Es, acc, zacc
