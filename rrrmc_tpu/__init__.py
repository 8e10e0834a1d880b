"""rrrmc_tpu: a TPU-native many-chain Monte-Carlo framework for Ising spin
models, with the capability surface of RRRMC.jl (samplers x models x
observables) re-architected for JAX/XLA/Pallas.

Where the reference advances one chain with O(1) incremental bookkeeping on a
CPU (/root/reference/src/RRRMC.jl), this framework advances thousands of
chains in lockstep with vectorized kernels, shards chains / disorder /
temperatures over device meshes, and keeps the same sampler semantics
(Metropolis, reduced-rejection-rate, rejection-free BKL, waiting-time method,
tau-extremal-optimization).
"""

from .core.model import Model, random_spins
from .core.struct import pytree, static
from .models.pairwise import Pairwise, make_pairwise
from .models.composite import Double, Mixed, mixed
from .models.graphs import (
    GraphEA, GraphEANormal, GraphEANormalDiscretized,
    GraphRRG, GraphRRGNormal, GraphRRGNormalDiscretized,
    GraphIsing1D, GraphFields, GraphFieldsNormalDiscretized,
    GraphEmpty, GraphTwoSpin, GraphThreeSpin,
)
from .samplers.metropolis import standardMC
from .samplers.common import MCState, init_state, DEFAULT_SEED

__version__ = "0.1.0"
