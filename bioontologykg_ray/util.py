"""Small shared runtime helpers."""

from __future__ import annotations

import ray


def clamp_pool(requested: int) -> int:
    """Clamp a fixed actor-pool size so the stateless task stages
    sharing the execution never starve (a pool that reserves every CPU
    deadlocks the streaming executor). Default ceiling: half the
    cluster CPUs; ``GRAFT_POOL_CLAMP=loose`` raises it to cpus-2
    (A/B measurement hook — see BASELINE.md)."""
    import os

    try:
        cpus = int(ray.cluster_resources().get("CPU", 2)) if ray.is_initialized() else 2
    except Exception:
        cpus = 2
    ceil = cpus - 2 if os.environ.get("GRAFT_POOL_CLAMP") == "loose" else cpus // 2
    return max(1, min(requested, ceil))
