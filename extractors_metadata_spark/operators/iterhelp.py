"""Shared helpers for bounded-iteration operators (r6 optimization round).

The eager-round operators (cluster_pairs, k_core, BFS/relaxation loops,
QuickHull, ...) pay two fixed costs per round that dominate wall time on
small-to-medium frames and are pure overhead at any scale:

1. every round's shuffles inherit ``spark.sql.shuffle.partitions`` (the
   bench pins 4x cores with AQE partition coalescing DISABLED — right for
   the Python-UDF pipeline stages it was measured on, wrong for narrow
   all-JVM label/edge frames where a 128-task reduce stage holds a few
   thousand rows);
2. every convergence probe / lineage truncation is its own Spark job.

``coalesced_small_shuffles`` scopes AQE partition coalescing to the eager
loop of such an operator: while active, post-shuffle partitions merge by
ADVISORY SIZE (scale-adaptive — a 100 TB run still gets full-width
reduces, a 3k-row label table gets 1), and the prior session values are
restored on exit so surrounding queries keep the caller's configuration.
Results are unaffected by partition counts everywhere this is used (the
iterative operators are integer/order-free by design — the engine's exact
-oracle contract depends on that already).
"""

from __future__ import annotations

from contextlib import contextmanager

_COALESCE_KEYS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # never below the defaults AQE would pick on a real cluster; on
    # local[N] this lets a tiny reduce collapse to one task
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1m",
    # the r6 one-job loops materialize through a persist(): without this,
    # cached plans are compiled WITHOUT AQE partition coalescing (Spark
    # keeps a cached plan's output partitioning stable by default) and
    # every round's exchange runs at full configured width — measured
    # simrank 24 -> 5903 tasks. All frames cached under this scope are
    # partition-invariant integer results by the engine's oracle
    # contract, so the partitioning freedom is safe.
    "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning": "true",
}


@contextmanager
def coalesced_small_shuffles(spark):
    """Enable AQE partition coalescing for the duration of an operator's
    eager iteration rounds; restore the caller's settings on exit."""
    conf = spark.conf
    old: dict[str, str | None] = {}
    for k, v in _COALESCE_KEYS.items():
        try:
            old[k] = conf.get(k)
        except Exception:
            old[k] = None
        conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            try:
                if v is None:
                    conf.unset(k)
                else:
                    conf.set(k, v)
            except Exception:
                pass


def materialize_coalesced(name: str, df):
    """Materialize a PURE-JVM query result under the coalesced scope.

    cache + count inside ``coalesced_small_shuffles``: every reduce stage
    of the query's whole chain sizes to its data (scale-adaptive AQE
    coalescing) instead of the session's Python-UDF-tuned width, and the
    caller's conf is restored on exit.  The r6 measurement: heavy JVM-only
    suite queries spend most of their degraded-window wall on fixed
    per-task cost of full-width reduce stages over kilobyte frames
    (pagerank 2709 -> 170 tasks with in-scope materialization).

    ONLY for plans with no Python eval stages: a coalesced reduce feeding
    a pandas UDF would under-provision its parallelism (the reason the
    bench session disables global coalescing).  The count() here is part
    of the timed region — the result is computed from the parquet inputs
    on every invocation (the per-name scope of ``_cache_scoped`` drops
    the previous invocation's cache first).
    """
    from .pip_knn import _cache_scoped

    with coalesced_small_shuffles(df.sparkSession):
        df = _cache_scoped(name, df)
        df.count()
    return df
