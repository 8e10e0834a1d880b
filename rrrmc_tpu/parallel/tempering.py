"""Parallel tempering (replica exchange) over a temperature ladder, sharded
over the device mesh.

New component relative to the reference (which only offers C0 warm-start
annealing, /root/reference/src/RRRMC.jl:59-60; SURVEY.md §2.4 names this as a
required gap-fill). Design for ICI efficiency: configurations NEVER move
between devices. Each (slot, chain) carries a ladder `rank`; a swap exchanges
the *temperature assignment* (rank), not the spins, so the only cross-device
traffic per swap round is an all_gather of per-chain energies and ranks —
O(T*B) scalars — instead of O(T*B*N) spin tensors.

Swap rule (standard replica exchange): ladder pair (r, r+1) swaps with
probability min(1, exp((beta_{r+1}-beta_r) * (E_{r+1}-E_r))), alternating
even/odd pairs each round. Decisions are computed identically on every device
from a replicated key, so all rank tables stay consistent without extra
communication.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..core.struct import pytree, static
from ..core.dtypes import ftype
from ..models.pairwise import Pairwise
from ..samplers.common import DEFAULT_SEED, init_state
from ..samplers.sweep import color_masks, _sweep_once


@pytree
class PTState:
    sigma: jnp.ndarray    # [T, B, N]
    aux: object           # [T, B, ...]
    E: jnp.ndarray        # [T, B] internal units
    key: jnp.ndarray      # [T, B] PRNG keys
    rank: jnp.ndarray     # [T, B] int32: ladder rank held by (slot, chain)
    swap_acc: jnp.ndarray  # [T, B] int32 accepted swap count


def init_pt_state(model, betas, chains: int, seed: int) -> PTState:
    T = len(betas)
    states = [init_state(model, chains, seed + 7919 * t) for t in range(T)]
    stack = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    rank = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[:, None],
                            (T, chains))
    return PTState(sigma=stack.sigma, aux=stack.aux, E=stack.E,
                   key=stack.key, rank=rank,
                   swap_acc=jnp.zeros((T, chains), jnp.int32))


def _swap_ranks(E_phys, rank, betas, u, parity, axis_name):
    """Globally-consistent rank update. E_phys/rank: local [Tl, B]; u: full
    [T, B] (replicated); returns (new local rank, accepted mask [Tl, B])."""
    T = betas.shape[0]
    if axis_name is not None:
        E_all = jax.lax.all_gather(E_phys, axis_name, tiled=True)   # [T, B]
        rank_all = jax.lax.all_gather(rank, axis_name, tiled=True)
    else:
        E_all, rank_all = E_phys, rank
    B = E_all.shape[1]
    cols = jnp.broadcast_to(jnp.arange(B)[None, :], rank_all.shape)
    E_byrank = jnp.zeros_like(E_all).at[rank_all, cols].set(E_all)  # [T, B]

    # pair (r, r+1) for r % 2 == parity: accept w.p. min(1, e^{dbeta * dE})
    r = jnp.arange(T)
    dbeta = jnp.concatenate([betas[1:] - betas[:-1], jnp.zeros((1,), betas.dtype)])
    dE = jnp.concatenate([E_byrank[1:] - E_byrank[:-1],
                          jnp.zeros((1, B), E_byrank.dtype)])
    is_lead = (r % 2 == parity) & (r < T - 1)
    acc_pair = (u < jnp.exp(jnp.minimum(dbeta[:, None] * dE, 0.0))) \
        & is_lead[:, None]                                          # [T, B]

    # my slot's rank moves +1 if pair(my rank) accepted, -1 if pair(rank-1)
    cols_local = jnp.broadcast_to(jnp.arange(B)[None, :], rank.shape)
    up = acc_pair[rank, cols_local]
    down = acc_pair[jnp.maximum(rank - 1, 0), cols_local] & (rank > 0)
    new_rank = rank + up.astype(jnp.int32) - down.astype(jnp.int32)
    return new_rank, (up | down)


def _pt_round(model, masks, betas, n_sweeps, axis_name, chain_axis,
              state: PTState, swap_key, parity):
    """n_sweeps checkerboard sweeps at each slot's current beta, then one
    swap round. Operates on the local shard [Tl, B, ...]."""
    if chain_axis is not None:
        # distinct swap randomness per chain shard
        swap_key = jax.random.fold_in(swap_key, jax.lax.axis_index(chain_axis))
    beta_chain = betas[state.rank]                                  # [Tl, B]

    def slot_sweeps(sigma, aux, E, key, beta):
        def one(carry, _):
            sigma, aux, E, key = _sweep_once(model, beta, masks, *carry)
            return (sigma, aux, E, key), None
        (sigma, aux, E, key), _ = jax.lax.scan(
            one, (sigma, aux, E, key), None, length=n_sweeps)
        return sigma, aux, E, key

    sweep_tb = jax.vmap(jax.vmap(slot_sweeps))  # over [Tl, B]
    sigma, aux, E, key = sweep_tb(state.sigma, state.aux, state.E,
                                  state.key, beta_chain)

    T = betas.shape[0]
    B = sigma.shape[1]
    u = jax.random.uniform(swap_key, (T, B), ftype())  # replicated draw
    E_phys = model.to_physical(E)
    new_rank, moved = _swap_ranks(E_phys, state.rank, betas, u, parity,
                                  axis_name)
    return PTState(sigma=sigma, aux=aux, E=E, key=key, rank=new_rank,
                   swap_acc=state.swap_acc + moved.astype(jnp.int32)), E_phys


@partial(jax.jit,
         static_argnames=("n_rounds", "sweeps_per_round", "axis_name",
                          "chain_axis", "mesh"))
def _run_pt(model, masks, betas, state: PTState, base_key,
            n_rounds: int, sweeps_per_round: int,
            axis_name: Optional[str], chain_axis: Optional[str],
            mesh: Optional[Mesh]):
    step_fn = partial(_pt_round, model, masks, betas, sweeps_per_round,
                      axis_name, chain_axis)
    if mesh is not None:
        sh = P(axis_name, chain_axis)
        repl = P()
        state_spec = jax.tree.map(lambda _: sh, state)
        step_fn = shard_map(
            step_fn, mesh=mesh,
            in_specs=(state_spec, repl, repl),
            out_specs=(state_spec, sh),
            check_rep=False)

    def body(carry, i):
        state = carry
        swap_key = jax.random.fold_in(base_key, i)
        state, E_phys = step_fn(state, swap_key, i % 2)
        return state, (E_phys, state.rank)

    state, (Es, ranks) = jax.lax.scan(body, state, jnp.arange(n_rounds))
    return state, Es, ranks


def parallel_tempering(model: Pairwise, betas, n_rounds: int, *,
                       sweeps_per_round: int = 1, chains: int = 1,
                       seed: int = DEFAULT_SEED,
                       mesh: Optional[Mesh] = None, axis: str = "temp",
                       chain_axis: Optional[str] = None,
                       state: Optional[PTState] = None):
    """Replica-exchange sampling over the beta ladder.

    Returns (Es [n_rounds, T, B] physical energies by slot,
             ranks [n_rounds, T, B] ladder rank per slot after each round,
             final PTState). Sort E by rank to get per-temperature series.
    With `mesh`, the T axis is sharded over mesh axis `axis` (T must divide)."""
    betas = jnp.asarray(betas, ftype())
    T = betas.shape[0]
    masks = (model.sweep_masks() if hasattr(model, "sweep_masks")
             else color_masks(model))
    if mesh is not None:
        assert T % mesh.shape[axis] == 0, (T, mesh.shape)
        if chain_axis is not None:
            assert chains % mesh.shape[chain_axis] == 0

        def spec_of(ndim):
            return (P(axis, *([chain_axis] + [None] * (ndim - 2)))
                    if ndim >= 2 else P())

        if state is None:
            # build the PT state as one jitted SPMD program with sharded
            # outputs — works on multi-process meshes where an eager
            # device_put to non-addressable devices is rejected, and keeps
            # PRNG-key leaves on device
            import numpy as _np
            model_h = jax.tree.map(
                lambda x: _np.asarray(jax.device_get(x)), model)
            bl = [float(b) for b in np.asarray(betas)]
            build = lambda m: init_pt_state(m, bl, chains, seed)  # noqa: E731
            shapes = jax.eval_shape(build, model_h)
            shard = jax.tree.map(
                lambda s: NamedSharding(mesh, spec_of(s.ndim)), shapes)
            state = jax.jit(build, out_shardings=shard)(model_h)
        else:
            state = jax.tree.map(
                lambda x: jax.device_put(
                    x, NamedSharding(mesh, spec_of(x.ndim))), state)
        axis_name = axis
    else:
        if state is None:
            state = init_pt_state(model, betas, chains, seed)
        axis_name = None
        chain_axis = None
    base_key = jax.random.key(seed ^ 0x5EED)
    state, Es, ranks = _run_pt(model, masks, betas, state, base_key,
                               n_rounds, sweeps_per_round, axis_name,
                               chain_axis, mesh)
    return Es, ranks, state


def energies_by_rank(Es, ranks):
    """[rounds, T, B] slot-ordered -> rank-ordered (temperature series)."""
    rounds, T, B = Es.shape
    cols = np.broadcast_to(np.arange(B)[None, :], (T, B))
    out = np.empty_like(np.asarray(Es))
    Es, ranks = np.asarray(Es), np.asarray(ranks)
    for it in range(rounds):
        out[it][ranks[it], cols] = Es[it]
    return out
