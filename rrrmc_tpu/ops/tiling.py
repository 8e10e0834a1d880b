"""Shared kernel tiling policy."""

from __future__ import annotations

#: v5e VMEM working budget for one grid program (physical 128 MB minus
#: headroom for register spills and small scratch)
VMEM_BUDGET = 100 * 1024 * 1024


def auto_block_chains(B: int, bytes_per_chain: int, *,
                      budget: int = VMEM_BUDGET,
                      candidates=(512, 384, 256, 128)) -> int:
    """Widest lane block that tiles the chain count B and fits the VMEM
    budget (wider blocks amortize per-move vector ops; BT=512 measured best
    on v5e; >=1024 fails to compile). `bytes_per_chain` is the kernel's
    total per-chain VMEM footprint including the pallas pipeline's
    double-buffered in/out windows."""
    bt = next((c for c in candidates
               if B % c == 0 and bytes_per_chain * c <= budget), 0)
    assert bt, (f"chain count {B} must be a multiple of 128 and fit VMEM "
                f"({bytes_per_chain} B/chain)")
    return bt
