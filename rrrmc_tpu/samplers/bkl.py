"""bklMC: rejection-free Bortz-Kalos-Lebowitz, generalized to arbitrary
(non-discrete) dE exactly as the reference does.

Semantics follow /root/reference/src/RRRMC.jl:311-359: each kernel step draws
a geometric number of virtually-rejected iterations `skip` with success
probability z/N (rand_skip, /root/reference/src/DeltaE.jl:141-144), then an
always-accepted move proportional to w_i = min(1, e^{-beta dE_i}); the
iteration counter advances by skip+1, so results are directly comparable with
standardMC at equal `iters`.

Vectorization note: chains advance *different* numbers of virtual iterations
per kernel step, so checkpoints cannot be emitted in lockstep. Instead each
chunk of moves records a per-chain (iteration, energy) stream, and checkpoint
energies are filled by a vectorized searchsorted over the stream — the batch
generalization of the reference's checkpoint drain loop
(/root/reference/src/RRRMC.jl:339-344), which pushes the pre-move energy for
every checkpoint index <= it + skip + 1.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.model import Model
from ..core.dtypes import ftype
from .common import DEFAULT_SEED, MCState, init_state
from .moves import acceptance_weights, categorical_from_weights, geometric_skip


def make_bkl_move(model: Model, beta: float, iters: int):
    n = model.N

    def move1(sigma, aux, E, key, accepted, it):
        active = it < iters
        key, k_skip, k_mv = jax.random.split(key, 3)
        dE = model.delta_all(sigma, aux)
        w = acceptance_weights(model.to_physical(dE), beta)
        i, z = categorical_from_weights(k_mv, w)
        skip = geometric_skip(k_skip, z / n)
        sigma, aux = model.flip(sigma, aux, i, active)
        E = E + jnp.where(active, dE[i], jnp.zeros_like(dE[i]))
        it = it + jnp.where(active, skip + 1, 0)
        accepted = accepted + active.astype(jnp.int32)
        return sigma, aux, E, key, accepted, it

    return move1


def _bkl_chunk_body(model, beta, iters, step, chunk_moves, state: MCState,
                    it, Es, observer=None):
    move1 = make_bkl_move(model, beta, iters)
    batched = jax.vmap(move1)
    obs_fn = (jax.vmap(partial(observer, model)) if observer is not None
              else lambda s, a, E: jax.vmap(model.to_physical)(E))

    def do_move(carry):
        s, it = carry
        sigma, aux, E, key, accepted, it = batched(
            s.sigma, s.aux, s.E, s.key, s.accepted, it)
        return MCState(sigma=sigma, aux=aux, E=E, key=key,
                       accepted=accepted), it

    def body(carry, _):
        # straggler tail: once EVERY chain reached `iters`, the remaining
        # scan steps of this chunk skip the O(N) move entirely (the emitted
        # stream rows repeat the last coordinate — idempotent for the
        # checkpoint fill). Under a disorder vmap the predicate is batched
        # and cond degrades to running the move as before — no regression.
        done = jnp.min(carry[1]) >= iters
        s, it = jax.lax.cond(done, lambda c: c, do_move, carry)
        return (s, it), (it, obs_fn(s.sigma, s.aux, s.E))

    it_start = it
    o_start = obs_fn(state.sigma, state.aux, state.E)
    (state, it), (its, ovs) = jax.lax.scan(body, (state, it), None,
                                           length=chunk_moves)
    Es = _fill_checkpoints(Es, step, it_start, o_start, its, ovs)
    return state, it, Es


_bkl_chunk = partial(jax.jit, static_argnames=(
    "iters", "step", "chunk_moves", "observer"))(_bkl_chunk_body)


@partial(jax.jit, static_argnames=("iters", "step", "chunk_moves",
                                   "observer"))
def _bkl_run(model, beta, iters, step, chunk_moves, state: MCState, it, Es,
             observer=None):
    """Whole hookless run in ONE jit: lax.while_loop over chunks, no host
    sync per chunk (and vmap-able, so sample_disorder can stack it)."""
    def cond(carry):
        _, it, _ = carry
        return jnp.min(it) < iters

    def body(carry):
        state, it, Es = carry
        return _bkl_chunk_body(model, beta, iters, step, chunk_moves,
                               state, it, Es, observer)

    state, it, Es = jax.lax.while_loop(cond, body, (state, it, Es))
    return state, it, Es


def _fill_checkpoints(S, step, x_start, o_start, xs, os_):
    """Fill the checkpoint series S[b, k, ...] (checkpoint coordinate
    ns_k = (k+1)*step) with the observable in effect just before the first
    move whose post-move coordinate reaches ns_k. xs: [chunk, B] per-move
    coordinate streams (non-decreasing); os_: [chunk, B, ...] post-move
    observable stream; o_start: [B, ...] value at the chunk start. The batch
    generalization of the reference's checkpoint drain
    (/root/reference/src/RRRMC.jl:339-344), for energies and any observer
    output alike."""
    n_ckpt = S.shape[1]
    ns = (jnp.arange(1, n_ckpt + 1, dtype=xs.dtype)) * step  # [K]

    def per_chain(Sb, xb, ob, o0, x0):
        idx = jnp.searchsorted(xb, ns, side="left")  # moves strictly before ns
        vals = jnp.concatenate([o0[None], ob])[idx]
        newly = (ns > x0) & (ns <= xb[-1])
        mask = newly.reshape((-1,) + (1,) * (Sb.ndim - 1))
        return jnp.where(mask, vals, Sb)

    return jax.vmap(per_chain, in_axes=(0, 1, 1, 0, 0))(
        S, xs, os_, o_start, x_start)


#: cached PallasRejectionFree runners (their ctors run eager table builds)
_REJFREE_CACHE: dict = {}

#: structural dispatch-length guard: the remote TPU relay wedges on single
#: dispatches over ~60 s (and can take >1 h to recover — see CLAUDE.md), so
#: every kernel run is auto-chunked into probe-calibrated stages each aiming
#: below this wall-clock. Growth between stages is clamped (one mis-scaled
#: rescale once produced a 220 s dispatch); the first stage is 1/256 of the
#: target, so the overhead is <= ~4 extra dispatches per run.
MAX_DISPATCH_S = 30.0
_STAGE_GROWTH_CAP = 16.0
#: staging exists for the REMOTE TPU relay (wedges past ~60 s/dispatch);
#: on CPU (tests, interpret mode) each stage would still pay >= 1 whole
#: kernel chunk, multiplying test cost ~4x for nothing — so CPU runs skip
#: it unless a test forces it on
FORCE_STAGING = False


def _staged_run(rf, sigma, E, coord, Es, seed, target, step, scale, ct):
    """Drive rf.run in wall-clock-bounded stages (one dispatch each).

    Returns (sigma, E, coord, Es, acc, zacc, n_dispatches). Each stage gets
    a decorrelated seed (a single-dispatch run reseeds per internal chunk;
    stages must not replay chunk 0's stream)."""
    import time

    import numpy as np

    if jax.default_backend() == "cpu" and not FORCE_STAGING:
        sigma, E, coord, Es, acc, zacc = rf.run(
            sigma, E, coord, Es, seed, jnp.asarray(target, ct), step, scale)
        return sigma, E, coord, Es, acc, zacc, 1

    total = float(target)
    done = 0.0
    # warm-started stage size: the runner remembers its measured coordinate
    # rate, so repeat calls (state-threaded segments, disorder loops) start
    # near the dispatch budget instead of re-probing from total/256
    rate = getattr(rf, "_stage_rate", None)
    if rate is None:
        stage = max(total / 256.0, 1.0)
    else:
        stage = min(total, max(rate * MAX_DISPATCH_S * 0.5, 1.0))
    acc_t = zacc_t = None
    t_all = time.perf_counter()
    k = 0
    while done < total:
        done = min(done + stage, total)
        tgt = jnp.asarray(done if ct == jnp.float32 else int(done), ct)
        t0 = time.perf_counter()
        sigma, E, coord, Es, acc, zacc = rf.run(
            sigma, E, coord, Es, seed + jnp.int32(k * 40993), tgt,
            step, scale)
        np.asarray(E)                     # materialize = the only real sync
        dt = time.perf_counter() - t0
        acc_t = acc if acc_t is None else acc_t + acc
        zacc_t = zacc if zacc_t is None else zacc_t + zacc
        k += 1
        if done < total:
            grow = min(_STAGE_GROWTH_CAP, MAX_DISPATCH_S / max(dt, 1e-3))
            stage = max(stage * grow, 1.0)
    rf._stage_rate = total / max(time.perf_counter() - t_all, 1e-3)
    return sigma, E, coord, Es, acc_t, zacc_t, k


def _rejfree_mc(model, beta: float, mode: str, target, step, chains: int,
                seed: int, state: MCState, n_ckpt: int,
                chunk_moves: int = 1024, block_chains: int | None = None):
    """Shared Pallas rejection-free driver for bklMC / wtmMC / rrrMC on
    integer LatticeEA / FullyConnected models (VMEM or HBM-streamed by
    size; float couplings stream with f32 energies). Hookless only.
    `accepted` counts applied flips (kernel acc output); the per-chain
    summed z/N diagnostic lands in samplers.common.LAST_ROUTE.

    block_chains=None picks the measured-best chain block
    (ops.rejfree_pallas.auto_block_chains): 128 everywhere except the
    DMA-bound f32 HBM stream, which takes the widest VMEM-fitting block
    (3.7x aggregate at BT=512, measured r4)."""
    import jax.numpy as jnp
    from ..ops.quant_pallas import PallasRingRejFree, quant_ring_eligible
    from ..ops.rejfree_pallas import PallasRejectionFree, auto_block_chains
    from .common import bound_cache_put, init_aux_batch, set_route

    ring = quant_ring_eligible(model, chains)
    if block_chains is None:
        # ring/star composite kernels keep their measured default; the
        # budget model in auto_block_chains covers the plain variants
        block_chains = 128 if ring else auto_block_chains(
            model, chains, chunk_moves=chunk_moves)
    assert chains % block_chains == 0, (chains, block_chains)
    if ring:
        Jid = getattr(model.resid_m.base, "J", model.resid_m.base)
        cls = PallasRingRejFree
        # wrapper constants are static metadata: two composites sharing one
        # base disorder (a Gamma/gamma ladder) must not share a runner
        consts = (type(model).__name__, model.M,
                  float(model.inner_m.scale),
                  float(getattr(model.inner_m, "gamma", 0.0)),
                  float(getattr(model.inner_m, "beta_p", 0.0)))
    else:
        # coupling-identity for the runner cache: lattices key on Jd,
        # pairwise/dense on J, PSpin3 on its partner table A
        Jid = next((getattr(model, a) for a in ("Jd", "J", "A", "xi")
                    if getattr(model, a, None) is not None), model)
        cls = PallasRejectionFree
        consts = ()
    # h identity matters: field variants share the coupling object
    hid = getattr(model, "h", None)
    key = (id(Jid), id(hid), float(beta), mode, chunk_moves, block_chains,
           ring, consts)
    ent = _REJFREE_CACHE.get(key)
    if ent is None or ent[0] is not Jid or ent[1] is not hid:
        ent = (Jid, hid, cls(model, beta, mode, block_chains=block_chains,
                             chunk_moves=chunk_moves))
        bound_cache_put(_REJFREE_CACHE, key, ent)
    rf = ent[2]
    wtm = mode == "wtm"
    ct = jnp.float32 if wtm else jnp.int32
    et = jnp.float32 if rf.flt else jnp.int32
    Es = jnp.zeros((chains, n_ckpt), ftype())
    coord = jnp.zeros((chains,), ct)
    sigma, E, coord, Es, acc, zacc, n_disp = _staged_run(
        rf, state.sigma, state.E.astype(et), coord, Es,
        jnp.asarray(seed % (2 ** 31), jnp.int32),
        target, jnp.asarray(step, ct), jnp.asarray(model.scale, ftype()),
        ct)
    aux = init_aux_batch(model, sigma)
    # store arrays unsynced (eager reductions cost ~0.1-1s on remote
    # backends); consumers materialize when reporting
    set_route(f"pallas-rejfree-{rf.kind}", mode=mode, acc=acc, z_over_n=zacc,
              dispatches=n_disp)
    return Es, MCState(sigma=sigma, aux=aux, E=E.astype(state.E.dtype),
                       key=state.key, accepted=state.accepted + acc)


def _series_buffer(model, state: MCState, n_ckpt: int, observer):
    """Zeroed [B, n_ckpt, ...] checkpoint series matching the observer's
    per-chain output shape/dtype (energy series when observer is None)."""
    if observer is None:
        return jnp.zeros((state.E.shape[0], n_ckpt), ftype())
    o0 = jax.eval_shape(jax.vmap(partial(observer, model)),
                        state.sigma, state.aux, state.E)
    return jnp.zeros((o0.shape[0], n_ckpt) + o0.shape[1:], o0.dtype)


def bklMC(model: Model, beta: float, iters: int, *, step: int = 1,
          chains: int = 1, seed: int = DEFAULT_SEED, C0=None,
          chunk_moves: int = 512, hook=None, observer=None,
          state: Optional[MCState] = None, backend: str = "auto",
          block_chains: Optional[int] = None):
    """Rejection-free BKL; `iters` counts virtual (rejected-inclusive)
    iterations. Returns (Es [chains, iters // step], final MCState).
    hook(it, model, state) -> False stops early (called once per chunk).
    observer(model, sigma, aux, E) replaces the checkpoint energies with any
    per-chain observable (e.g. config snapshots for the overlap pipeline);
    checkpoints take the observable in effect at the checkpoint coordinate
    exactly as energies do.

    backend: "pallas" / "auto" route hookless observer-less runs on sparse
    Pairwise (N <= 16384, K <= 16, int or float J — resident-lf inverse-
    column kernel, the fastest route for RRG-class graphs), integer
    LatticeEA, GraphSAT (2 <= K <= 7, max_conn <= 64 — bit-packed
    clause-count kernel, ops/sat_pallas.py), GraphPSpin3,
    and eligible FullyConnected models (chains % 128 == 0,
    iters <= 1e9) through the rejection-free race kernels
    (ops/rejfree_pallas.py: sparse / lattice / VMEM-dense / HBM-streamed by
    structure and J size; float couplings carry f32 energies);
    "xla" forces the generic path."""
    from .common import set_route

    if state is None:
        state = init_state(model, chains, seed, C0)
    n_ckpt = iters // step
    if (hook is None and observer is None and backend != "xla"
            and iters <= 10 ** 9):
        from ..ops.rejfree_pallas import pallas_rejfree_eligible
        if backend == "pallas" or (jax.default_backend() != "cpu"
                                   and pallas_rejfree_eligible(model, chains)):
            return _rejfree_mc(model, float(beta), "bkl", iters, step,
                               chains, seed, state, n_ckpt,
                               block_chains=block_chains)
    set_route("xla")
    Es = _series_buffer(model, state, n_ckpt, observer)
    it = jnp.zeros(chains, jnp.int64 if jax.config.jax_enable_x64 else jnp.int32)
    if hook is None:
        # hookless fast path: the whole run is one jitted while_loop (no
        # per-chunk host round trip; vmap-able under sample_disorder)
        state, it, Es = _bkl_run(model, float(beta), iters, step,
                                 chunk_moves, state, it, Es, observer)
        return Es, state
    while True:
        state, it, Es = _bkl_chunk(model, float(beta), iters, step,
                                   chunk_moves, state, it, Es, observer)
        if hook(int(jnp.min(it)), model, state) is False:
            break
        if int(jnp.min(it)) >= iters:
            break
    return Es, state
