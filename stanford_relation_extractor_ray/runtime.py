"""Cluster-aware stage sizing.

A pipeline with several concurrent actor pools must not reserve every
CPU for pool minima, or the stateless map/shuffle tasks starve and the
streaming executor livelocks (observed on a 4-CPU test cluster: 3 pools
× min-1 actor × 1 CPU + pending scale-ups = 4/4 CPUs held, zero
progress). Rules used here:

- pool minimum is always 1 actor;
- pool maximum scales with cluster CPUs divided by the number of
  concurrently-running pools (the KG pipeline runs ≤3);
- lightweight actors (linker, lang-id) reserve 0.5 CPU so two share a
  core with the heavy stages.
"""

from __future__ import annotations


def cluster_cpus(default: int = 8) -> int:
    try:
        import ray
        if ray.is_initialized():
            return int(ray.cluster_resources().get("CPU", default))
    except Exception:
        pass
    return default


def pool_size(share: float = 1 / 3, cap: int | None = None
              ) -> tuple[int, int]:
    """(min, max) actor-pool concurrency for one of ~3 parallel pools."""
    cpus = cluster_cpus()
    hi = max(1, int(cpus * share))
    if cap is not None:
        hi = min(hi, cap)
    return (1, hi)
