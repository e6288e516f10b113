"""Small shared runtime helpers."""

from __future__ import annotations

import ray


def clamp_pool(requested: int) -> int:
    """Clamp a fixed actor-pool size to at most half the cluster CPUs so
    the stateless task stages sharing the execution never starve (a pool
    that reserves every CPU deadlocks the streaming executor)."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 2)) if ray.is_initialized() else 2
    except Exception:
        cpus = 2
    return max(1, min(requested, cpus // 2))
