"""Cluster-aware stage sizing.

Fixed-size actor pools (not autoscaling) because a pool that ramps from
1 actor spends seconds of the job's wall-clock scaling up — measured as
the main reason a 32-CPU run failed to beat an 8-CPU run by more than
1.6× on the bench corpus.

The hard constraint: every fixed pool in a streaming pipeline reserves
its CPUs for the WHOLE execution, even while its stage has no input
yet, and Ray Data's stateless tasks (read/generate, shuffle map, sort,
map_groups) each need a full CPU slot. If the pools reserve ~all CPUs
the stateless stages never schedule and the pipeline livelocks at ~0%
CPU (observed on the 4-CPU test cluster: fused-extract pool 3×1 CPU +
linker 1×0.5 CPU = 3.5/4 reserved → the upstream doc-generate task
could not start, so the actors idled forever).

Rule: all pools together may reserve at most ``pool_budget()`` CPUs =
cluster − headroom, headroom = max(2, cpus/8). Each pool takes a
``share`` of that budget scaled by its per-actor ``num_cpus``.
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


def pool_budget() -> float:
    """CPUs available to actor pools after task headroom.

    Headroom cpus/16 (floor 2): at 32 CPUs this reserves 2 instead of
    the old cpus/8 = 4, freeing two more actors with generation fused
    into the pool; the 2-CPU floor still prevents the 4-CPU livelock
    documented above."""
    cpus = cluster_cpus()
    return max(1.0, cpus - max(2, cpus // 16))


def pool_size(share: float = 1 / 3, cap: int | None = None,
              num_cpus: float = 1.0) -> int:
    """Actor count for a pool taking ``share`` of the pool budget with
    ``num_cpus`` reserved per actor."""
    n = max(1, int(pool_budget() * share / num_cpus))
    if cap is not None:
        n = min(n, cap)
    return n
