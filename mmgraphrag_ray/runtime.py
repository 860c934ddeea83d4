"""Process-wide Ray Data execution tuning (DataContext only — never
ray.init; the session is owned by the caller/driver).

Why hash shuffle: Ray 2.49's default sort-based shuffle executes its map
phase with very low task parallelism on small/medium datasets, serializing
every groupby in the pipeline (measured: 5 groupbys -> scaling efficiency
0.36 at 8-vs-32 CPUs).  The hash-shuffle strategy streams partials into a
bounded pool of aggregator actors and scales with CPUs (measured efficiency
0.80+ on the same workload).  The aggregator count must be capped — the
default (~200 actors) fork-bombs a 32-CPU single node.
"""

from __future__ import annotations

import os

_configured = False


def configure(num_cpus: int | None = None, force: bool = False) -> None:
    """Idempotent DataContext tuning. Respects RAYKG_NO_CTX_TUNE=1."""
    global _configured
    if _configured and not force:
        return
    _configured = True

    from ray.data.context import DataContext, ShuffleStrategy

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    if os.environ.get("RAYKG_NO_CTX_TUNE"):
        return

    if num_cpus is None:
        try:
            import ray

            if ray.is_initialized():
                num_cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:  # noqa: BLE001
            pass
    n = num_cpus or 8

    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    ctx.default_hash_shuffle_parallelism = max(16, n)
    # Reduce-side parallelism must GROW with the cluster or shuffles become
    # the serial section (measured: max(2, n//4) pinned both the 2- and
    # 8-CPU scaling legs at 2 aggregators -> E = 0.57).  n//2 keeps the
    # aggregator pool proportional while staying far under the ~200-actor
    # default that fork-bombs a single node.
    agg_env = os.environ.get("RAYKG_MAX_AGGREGATORS")
    ctx.max_hash_shuffle_aggregators = (
        int(agg_env) if agg_env else max(1, n // 2)
    )
