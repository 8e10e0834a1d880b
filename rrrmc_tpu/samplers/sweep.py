"""sweepMC: masked simultaneous Metropolis over graph-coloring classes — the
TPU throughput kernel.

The reference's hot loop flips ONE spin per iteration
(/root/reference/src/RRRMC.jl:100-119); its O(1) bookkeeping exists to make
that serial loop fast. On TPU the roofline move is to flip an entire
*independent set* (color class) of spins per fused kernel: every spin in the
class sees fixed neighbors, so the update is a product of independent
single-site Metropolis decisions — a valid Glauber kernel with the same
stationary Boltzmann law (SURVEY.md §7 "checkerboard sweeps"; equilibrium
observables agree with the strict single-site chain, which standardMC keeps
for reference-equivalent dynamics).

For an EA lattice this is the classic checkerboard (2 colors); for arbitrary
Pairwise graphs a greedy coloring is computed at build time. Per color step,
for all B chains at once:

    dE     = 2 sigma * lf                  (elementwise, [B, N])
    accept = mask_c & (u < exp(-beta dE))  (one uniform draw per spin)
    sigma' = sigma * (1 - 2 accept)
    lf'    = J-gather recompute            (one padded gather, no scatter)

Work is O(B N K) per sweep for B*N attempted flips — pure gather + VPU
elementwise, no data-dependent control flow, so XLA fuses the whole sweep.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..core.dtypes import ftype
from ..models.pairwise import Pairwise
from .common import DEFAULT_SEED, MCState, init_state, series_to_chain_major


def greedy_coloring(neigh: np.ndarray, n: int) -> np.ndarray:
    """[N] color ids such that no edge joins same-colored spins (first-fit
    greedy; exact 2-coloring for bipartite lattices like EA with even L)."""
    colors = np.full(n, -1, dtype=np.int32)
    for i in range(n):
        used = {colors[j] for j in neigh[i] if j < n and colors[j] >= 0}
        c = 0
        while c in used:
            c += 1
        colors[i] = c
    return colors


def color_masks(model: Pairwise) -> jnp.ndarray:
    """[C, N] boolean independent-set masks for a Pairwise model."""
    neigh = np.asarray(model.neigh)
    colors = greedy_coloring(neigh, model.N)
    ncol = int(colors.max()) + 1
    return jnp.asarray(np.stack([colors == c for c in range(ncol)]))


def color_masks_dense(J: np.ndarray) -> jnp.ndarray:
    """[C, N] masks from a dense coupling matrix's sparsity pattern."""
    n = J.shape[0]
    rows = [np.nonzero(J[i])[0] for i in range(n)]
    kmax = max((len(r) for r in rows), default=0) or 1
    neigh = np.full((n, kmax), n, dtype=np.int32)
    for i, r in enumerate(rows):
        neigh[i, : len(r)] = r
    colors = greedy_coloring(neigh, n)
    ncol = int(colors.max()) + 1
    return jnp.asarray(np.stack([colors == c for c in range(ncol)]))


def composite_masks(model):
    """[C, N_composite] independent-set masks for replica composites
    (Quant/RE/LE/TLE wrappers over a SPARSE Pairwise base), or None.

    Validity: the wrapper terms couple only same-site replica pairs —
    Trotter ring (QT.jl:105-108), RE star (RE.jl:70-104), LE center-replica
    star (LE.jl:55-84) — or base-edge pairs (the TLE 4-spin term,
    TLE.jl:17-56). A mask = (one replica slot) x (one base color class)
    therefore contains no interacting pair: same-slot pairs are separated by
    the base coloring, same-site pairs by the slot split, and TLE's 4-spin
    (i, j) terms by both. Center blocks (LE/TLE offset slots) get their own
    per-color masks. Dense bases (SK) have no usable coloring -> None."""
    from ..models.composite import Double
    from ..models.replicas import (LEModel, QuantModel, Replicated, REModel,
                                   TLEModel)

    if not isinstance(model, (QuantModel, REModel, LEModel, TLEModel)):
        return None
    assert isinstance(model, Double)
    resid = model.resid_m
    if not isinstance(resid, Replicated):
        return None
    base = resid.base
    if not isinstance(base, Pairwise):
        return None
    neigh = np.asarray(base.neigh)
    colors = greedy_coloring(neigh, base.N)
    ncol = int(colors.max()) + 1
    if ncol > 32:          # dense-ish base: coloring degenerates
        return None
    Nk, n_slots = resid.Nk, resid.n_slots
    masks = np.zeros((ncol * n_slots, Nk * n_slots), dtype=bool)
    for s in range(n_slots):          # centers (offset blocks) + replicas
        for c in range(ncol):
            masks[s * ncol + c, s * Nk:(s + 1) * Nk] = colors == c
    return jnp.asarray(masks)


#: mask cache: greedy coloring is host-side O(N*K) python — once per model
_CMASK_CACHE: dict = {}


def _cached_composite_masks(model):
    from ..models.replicas import LEModel, QuantModel, REModel, TLEModel

    if not isinstance(model, (QuantModel, REModel, LEModel, TLEModel)):
        return None
    from .common import bound_cache_put

    base = getattr(model.resid_m, "base", None)
    anchor = getattr(base, "neigh", None)
    if anchor is None:
        return None
    key = (id(anchor), type(model).__name__, model.N)
    ent = _CMASK_CACHE.get(key)
    if ent is None or ent[0] is not anchor:
        ent = (anchor, composite_masks(model))
        bound_cache_put(_CMASK_CACHE, key, ent)
    return ent[1]


def _sweep_once_composite(model, beta, masks, sigma, aux, E, key):
    """One full sweep over a replica composite: per color-mask step, one
    fused delta_all pass (PHYSICAL energies — the Double contract) decides
    all mask members at once, then the aux cache is re-derived. Same
    stationary law as single-site Metropolis on the composite."""
    ft = ftype()

    def color_step(carry, mask):
        sigma, aux, E, key = carry
        key, ku = jax.random.split(key)
        dE = model.delta_all(sigma, aux)          # physical
        x = -beta * dE
        u = jax.random.uniform(ku, (model.N,), ft)
        acc = mask & ((x >= 0) | (u < jnp.exp(jnp.minimum(x, 0.0))))
        sigma = jnp.where(acc, -sigma, sigma)
        E = E + jnp.sum(jnp.where(acc, dE, jnp.zeros_like(dE)),
                        dtype=E.dtype)
        aux = model.init_aux(sigma)
        return (sigma, aux, E, key), None

    (sigma, aux, E, key), _ = jax.lax.scan(
        color_step, (sigma, aux, E, key), masks)
    return sigma, aux, E, key


@partial(jax.jit, static_argnames=("n_checkpoints", "sweeps_per_checkpoint"))
def _run_sweepmc_composite(model, state: MCState, beta, masks,
                           n_checkpoints: int, sweeps_per_checkpoint: int):
    batched = jax.vmap(partial(_sweep_once_composite, model, beta, masks))

    def one_sweep(s: MCState, _):
        sigma, aux, E, key = batched(s.sigma, s.aux, s.E, s.key)
        return MCState(sigma=sigma, aux=aux, E=E, key=key,
                       accepted=s.accepted), None

    def checkpoint(s: MCState, _):
        s, _ = jax.lax.scan(one_sweep, s, None, length=sweeps_per_checkpoint)
        return s, s.E.astype(ftype())              # already physical

    state, series = jax.lax.scan(checkpoint, state, None,
                                 length=n_checkpoints)
    return state, series


def _sweep_once(model: Pairwise, beta, masks, sigma, aux, E, key):
    """One full sweep: N attempted flips (all color classes), single chain."""
    ncol = masks.shape[0]
    ft = ftype()

    def color_step(carry, mask):
        sigma, aux, E, key = carry
        key, ku = jax.random.split(key)
        dE = 2 * sigma.astype(model.J.dtype) * aux
        x = -beta * model.to_physical(dE)
        u = jax.random.uniform(ku, (model.N,), ft)
        acc = mask & ((x >= 0) | (u < jnp.exp(jnp.minimum(x, 0.0))))
        sigma = jnp.where(acc, -sigma, sigma)
        E = E + jnp.sum(jnp.where(acc, dE, jnp.zeros_like(dE)),
                        dtype=E.dtype)  # x64 must not widen the carry
        aux = model.local_fields(sigma).astype(aux.dtype)
        return (sigma, aux, E, key), None

    (sigma, aux, E, key), _ = jax.lax.scan(
        color_step, (sigma, aux, E, key), masks)
    return sigma, aux, E, key


@partial(jax.jit, static_argnames=("n_checkpoints", "sweeps_per_checkpoint"))
def _run_sweepmc(model: Pairwise, state: MCState, beta, masks,
                 n_checkpoints: int, sweeps_per_checkpoint: int):
    batched = jax.vmap(partial(_sweep_once, model, beta, masks))

    def one_sweep(s: MCState, _):
        sigma, aux, E, key = batched(s.sigma, s.aux, s.E, s.key)
        return MCState(sigma=sigma, aux=aux, E=E, key=key,
                       accepted=s.accepted), None

    def checkpoint(s: MCState, _):
        s, _ = jax.lax.scan(one_sweep, s, None, length=sweeps_per_checkpoint)
        return s, jax.vmap(model.to_physical)(s.E)

    state, series = jax.lax.scan(checkpoint, state, None, length=n_checkpoints)
    return state, series


def _pallas_eligible(model, chains: int) -> bool:
    from ..models.lattice import LatticeEA
    from .common import concrete_model
    return (isinstance(model, LatticeEA)
            and jnp.issubdtype(model.Jd.dtype, jnp.integer)
            and jnp.issubdtype(model.h.dtype, jnp.integer)
            and model.L % 2 == 0
            and chains % 128 == 0
            and concrete_model(model))


#: site-sweep kernel caps: SMEM neighbor/coupling tables are N*K scalars
#: each (verified to fit at N=1e4 K=3 on v5e); VMEM state is 30*(N+1)
#: bytes/chain
_SITE_SWEEP_NK_MAX = 65536


def _site_sweep_eligible(model, chains: int) -> bool:
    """Sparse Pairwise models whose sweeps can ride the single-site kernel
    with a permutation schedule (ops/site_pallas.py sweep_schedule): the
    checkerboard kernel is for even-L integer lattices; everything else
    sparse (RRG, odd-L or float lattices, file graphs, flattened wrapper
    stacks) gets ~40x the XLA color-mask path this way, with no densify."""
    from .common import concrete_model

    return (chains % 128 == 0 and model.N >= 8
            and model.N * model.K <= _SITE_SWEEP_NK_MAX
            and concrete_model(model))


#: cached site-sweep samplers keyed on (couplings, fields, beta)
_SITE_SWEEPERS: dict = {}


def _run_sweepmc_site(model, state: MCState, beta, n_ckpt, step, seed):
    """Checkpointed sweepMC driver over the single-site kernel with the
    permutation (sweep) schedule; exact energy tracking, acceptance
    accounting via the kernel's acc output."""
    from ..ops.site_pallas import PallasSiteSampler
    from .common import (bound_cache_put, init_aux_batch, set_route,
                         stack_physical)

    key = (id(model.J), id(model.h), float(beta), "sweep")
    ent = _SITE_SWEEPERS.get(key)
    if ent is None or ent[0] is not model.J or ent[1] is not model.h:
        ent = (model.J, model.h, PallasSiteSampler(model, beta))
        bound_cache_put(_SITE_SWEEPERS, key, ent)
    sampler = ent[2]
    sigma, E, kkey = state.sigma, state.E, state.key[0]
    acc = None
    lfT = None
    series = []
    for k in range(n_ckpt):
        sigma, E, lfT, kkey, acc = sampler(
            sigma, E, kkey, seed=(seed + 7919 * k) % (2 ** 31),
            n_moves=step * model.N, lfT=lfT, acc=acc, sweep_schedule=True)
        series.append(E)
    aux = init_aux_batch(model, sigma)
    set_route("pallas-site-sweep", acc=acc)
    state = MCState(sigma=sigma, aux=aux, E=E, key=state.key,
                    accepted=state.accepted + acc)
    return state, stack_physical(tuple(series), float(model.scale))


_LATTICE_SWEEPERS: dict = {}


def _run_sweepmc_pallas(model, state: MCState, beta, n_ckpt, step, seed):
    """Checkpointed driver over the VMEM-resident Pallas kernel
    (ops/sweep_pallas.py): one kernel dispatch per checkpoint, exact int32
    energy tracking; aux is rebuilt once at the end."""
    from ..ops.sweep_pallas import PallasSweeper

    from .common import bound_cache_put, init_aux_batch, stack_physical

    # key on BOTH coupling and field identity: field-carrying models can
    # share a Jd object with their field-free base (dataclasses.replace)
    key = (id(model.Jd), id(model.h), float(beta))
    ent = _LATTICE_SWEEPERS.get(key)
    if ent is None or ent[0] is not model.Jd or ent[1] is not model.h:
        ent = (model.Jd, model.h, PallasSweeper(model, beta))
        bound_cache_put(_LATTICE_SWEEPERS, key, ent)
    sweeper = ent[2]
    sigma, E = state.sigma, state.E
    series = []
    for k in range(n_ckpt):
        sigma, E = sweeper(sigma, E, seed=(seed + 7919 * k) % (2 ** 31),
                           n_sweeps=step)
        series.append(E)
    aux = init_aux_batch(model, sigma)
    state = MCState(sigma=sigma, aux=aux, E=E, key=state.key,
                    accepted=state.accepted)
    return state, stack_physical(tuple(series), float(model.scale))


def sweepMC(model: Pairwise, beta: float, sweeps: int, *, step: int = 1,
            chains: int = 1, seed: int = DEFAULT_SEED, C0=None,
            state: Optional[MCState] = None, backend: str = "auto"):
    """Run `sweeps` full-lattice sweeps (N attempted flips each) per chain.

    Returns (Es [chains, sweeps // step], final MCState). Same stationary law
    as standardMC; use for throughput and equilibrium observables, use
    standardMC when strict single-site dynamics matter.

    backend: "auto" picks the Pallas VMEM-resident kernel for even-L
    integer-coupling LatticeEA models on TPU (~6x the XLA path), else the
    generic XLA color-mask kernel; "xla" / "pallas" force a choice.

    FullyConnected models route by structure: the VMEM-resident Pallas SK
    kernel when eligible; a color-mask sweep with MXU-matmul local-field
    recomputes when the dense J is sparse (few colors — densify()'d graphs);
    else the delayed-update sequential scan (true dense models)."""
    from ..models.dense import FullyConnected

    cmasks = _cached_composite_masks(model)
    if cmasks is not None:
        # Quant/RE/LE/TLE wrapper over a sparse Pairwise base: (slot x base
        # color) product masks; ~N / n_masks moves per fused delta_all pass
        # vs one move per pass on the single-move path
        if state is None:
            state = init_state(model, chains, seed, C0)
        from .common import set_route
        set_route("composite-mask-sweep", n_masks=int(cmasks.shape[0]))
        state, series = _run_sweepmc_composite(model, state, float(beta),
                                               cmasks, sweeps // step, step)
        return series_to_chain_major(series), state
    if isinstance(model, FullyConnected):
        from .dense_sweep import (sweepMC_dense, _pallas_dense_eligible,
                                  _model_meta)
        if backend == "pallas" or (backend == "auto"
                                   and jax.default_backend() != "cpu"
                                   and _pallas_dense_eligible(model, chains)):
            return sweepMC_dense(model, beta, sweeps, step=step,
                                 chains=chains, seed=seed, C0=C0,
                                 state=state, backend="pallas")
        meta = _model_meta(model)
        if "max_degree" not in meta:
            # one jitted scalar reduction — do NOT pull [N, N] J to host
            # just to discover the model is dense
            meta["max_degree"] = int(jax.jit(
                lambda J: jnp.max(jnp.sum(J != 0, axis=1)))(model.J))
        if meta["max_degree"] > 32:  # genuinely dense: coloring degenerates
            # float J (GraphSKNormal) runs the same delayed-update scan with
            # float local fields and f32/f64 rank-W MXU commits
            return sweepMC_dense(model, beta, sweeps, step=step,
                                 chains=chains, seed=seed, C0=C0,
                                 state=state, backend="xla")
        if "masks" not in meta:
            meta["masks"] = color_masks_dense(np.asarray(model.J))
        if state is None:
            state = init_state(model, chains, seed, C0)
        state, series = _run_sweepmc(model, state, float(beta),
                                     meta["masks"], sweeps // step, step)
        return series_to_chain_major(series), state
    assert isinstance(model, Pairwise), "sweepMC requires a Pairwise model"
    if state is None:
        state = init_state(model, chains, seed, C0)
    lattice_ok = _pallas_eligible(model, chains)
    use_pallas = (backend == "pallas" and lattice_ok) \
        or (backend == "auto" and jax.default_backend() not in ("cpu",)
            and lattice_ok)
    if use_pallas:
        state, series = _run_sweepmc_pallas(model, state, float(beta),
                                            sweeps // step, step, seed)
        return series_to_chain_major(series), state
    if backend != "xla" and _site_sweep_eligible(model, chains) and (
            backend == "pallas" or jax.default_backend() not in ("cpu",)):
        # generic sparse Pairwise: permutation-schedule sweeps on the
        # single-site kernel (~40x the XLA color-mask path, no densify)
        state, series = _run_sweepmc_site(model, state, float(beta),
                                          sweeps // step, step, seed)
        return series_to_chain_major(series), state
    from .common import set_route
    set_route("xla")
    masks = (model.sweep_masks() if hasattr(model, "sweep_masks")
             else color_masks(model))
    state, series = _run_sweepmc(model, state, float(beta), masks,
                                 sweeps // step, step)
    return series_to_chain_major(series), state
