"""extremal_opt: tau-extremal optimization ground-state search.

Semantics follow /root/reference/src/RRRMC.jl:474-521: rank all spins by dE
ascending (ties broken uniformly at random), draw a rank k with P(k)
proportional to k^{-tau}, flip that spin unconditionally, track the minimum
energy configuration seen.

TPU-native formulation: the reference maintains sorted class buckets with
cumulative rank weights f_tau (EOCache, /root/reference/src/DeltaE.jl:424-554)
or a full sortperm per move for continuous graphs (:556-635). Here each move
samples the rank by inverse CDF on a precomputed static cumulative k^{-tau}
table, then selects the rank-th order statistic of the dense dE vector with
exact uniform tie-breaking (count-within-equal-class trick) — O(N log N)
vectorized over the whole batch, no mutable buckets.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..core.model import Model
from ..core.struct import pytree
from ..core.dtypes import ftype
from .common import DEFAULT_SEED, MCState, init_state


@pytree
class EOResult:
    sigma: jnp.ndarray    # [B, N] final configurations
    E: jnp.ndarray        # [B] final physical energies
    Emin: jnp.ndarray     # [B] best physical energies found
    sigma_min: jnp.ndarray  # [B, N] best configurations
    itmin: jnp.ndarray    # [B] iteration of the best configuration


def _rank_cdf(n: int, tau: float) -> np.ndarray:
    """Cumulative P(rank <= k) with P(k) ~ k^{-tau} (the f_tau table,
    /root/reference/src/DeltaE.jl:434-441)."""
    w = np.arange(1, n + 1, dtype=np.float64) ** (-tau)
    c = np.cumsum(w)
    return c / c[-1]


def select_rank_with_ties(key, dE, rank):
    """Index of the `rank`-th smallest entry of dE, uniformly random among
    equal values (the rankshuffle! analog, /root/reference/src/DeltaE.jl:612)."""
    n = dE.shape[0]
    sorted_vals = jnp.sort(dE)
    v = sorted_vals[rank]
    eq = dE == v
    lo = jnp.searchsorted(sorted_vals, v, side="left")
    hi = jnp.searchsorted(sorted_vals, v, side="right")
    j = jax.random.randint(key, (), 0, jnp.maximum(hi - lo, 1))
    csum = jnp.cumsum(eq.astype(jnp.int32))
    return jnp.argmax(csum == (j + 1))


def make_eo_move(model: Model, tau: float, cdf):
    def move1(carry):
        sigma, aux, E, key, Emin, smin, itmin, it = carry
        key, k_rank, k_tie = jax.random.split(key, 3)
        dE = model.delta_all(sigma, aux)
        u = jax.random.uniform(k_rank, (), cdf.dtype)
        rank = jnp.searchsorted(cdf, u, side="right")
        rank = jnp.clip(rank, 0, model.N - 1)
        i = select_rank_with_ties(k_tie, dE, rank)
        sigma, aux = model.flip(sigma, aux, i, jnp.asarray(True))
        E = E + dE[i]
        it = it + 1
        better = E < Emin
        Emin = jnp.where(better, E, Emin)
        smin = jnp.where(better, sigma, smin)
        itmin = jnp.where(better, it, itmin)
        return sigma, aux, E, key, Emin, smin, itmin, it

    return move1


@partial(jax.jit, static_argnames=("iters",))
def _eo_run_xla(model, cdf, state: MCState, iters: int):
    move1 = make_eo_move(model, 0.0, cdf)  # tau is baked into cdf
    batched = jax.vmap(lambda *c: move1(c))

    def body(carry, _):
        return batched(*carry), None

    it0 = jnp.zeros(state.E.shape[0], jnp.int32)
    carry = (state.sigma, state.aux, state.E, state.key,
             state.E, state.sigma, it0, it0)
    carry, _ = jax.lax.scan(body, carry, None, length=iters)
    sigma, aux, E, key, Emin, smin, itmin, it = carry
    return sigma, E, Emin, smin, itmin


@jax.jit
def _to_phys_batch(model, E):
    """Module-level jit (a per-call jax.jit(vmap(...)) recompiles every
    call; see samplers/common.py:92)."""
    return jax.vmap(model.to_physical)(E)


#: cached PallasEO runners keyed on (coupling identity, tau)
_EO_CACHE: dict = {}


def _eo_pallas(model, tau: float, iters: int, chains: int, seed: int,
               state: MCState, block_chains=None) -> EOResult:
    from ..ops.eo_pallas import PallasEO, auto_eo_block_chains
    from .common import bound_cache_put

    if block_chains is None:
        block_chains = auto_eo_block_chains(model, chains)
    assert chains % block_chains == 0, (chains, block_chains)
    # coupling identity: lattices key on Jd, pairwise/dense on J, PSpin3
    # on its partner table A
    Jid = next((getattr(model, a) for a in ("Jd", "J", "A", "xi")
                if getattr(model, a, None) is not None), model)
    # h identity matters: field variants share the coupling object
    hid = getattr(model, "h", None)
    key = (id(Jid), id(hid), float(tau), block_chains)
    ent = _EO_CACHE.get(key)
    if ent is None or ent[0] is not Jid or ent[1] is not hid:
        ent = (Jid, hid,
               PallasEO(model, float(tau), block_chains=block_chains))
        bound_cache_put(_EO_CACHE, key, ent)
    from .common import set_route
    set_route(f"pallas-eo-{ent[2].kind}")
    sigma, E, emin, smin, itmin = ent[2].run(
        state.sigma, state.E, iters, seed)
    return EOResult(sigma=sigma, E=_to_phys_batch(model, E.astype(ftype())),
                    Emin=_to_phys_batch(model, emin.astype(ftype())),
                    sigma_min=smin, itmin=itmin)


def extremal_opt(model: Model, tau: float, iters: int, *, step: int = 1,
                 chains: int = 1, seed: int = DEFAULT_SEED, C0=None,
                 state: Optional[MCState] = None,
                 backend: str = "auto",
                 block_chains: Optional[int] = None) -> EOResult:
    """Ground-state search; returns an EOResult (the analog of the
    reference's (C, Emin, Cmin, itmin) tuple).

    backend: "pallas" / "auto" route integer LatticeEA (fields OK) and
    integer/float FullyConnected models (chains % 128 == 0) through the
    rank-select kernel (ops/eo_pallas.py: per-lane binary-search order
    statistic + uniform tie race; VMEM-resident J for integer N <= 4096 /
    float N <= 2048, HBM-streamed beyond up to int 32768 / float 16384 —
    one streamed J pass per move rebuilds the resident key table, so the
    streamed rate is HBM-bound at ~BW/(N^2 jbytes) per chain block; for
    SPARSE graphs the XLA O(deg) path is faster than densify+stream);
    "xla" forces the generic path."""
    from .common import set_route

    if state is None:
        state = init_state(model, chains, seed, C0)
    if backend != "xla":
        from ..ops.eo_pallas import pallas_eo_eligible
        if backend == "pallas" or (jax.default_backend() != "cpu"
                                   and pallas_eo_eligible(model, chains)):
            return _eo_pallas(model, float(tau), iters, chains, seed, state,
                              block_chains=block_chains)
    set_route("xla")
    cdf = jnp.asarray(_rank_cdf(model.N, float(tau)))
    sigma, E, Emin, smin, itmin = _eo_run_xla(model, cdf, state, iters)
    return EOResult(sigma=sigma, E=_to_phys_batch(model, E),
                    Emin=_to_phys_batch(model, Emin),
                    sigma_min=smin, itmin=itmin)
