"""Deterministic sampling, splitting and sequence packing for training data.

At 100 TB, reproducibility beats randomness: a train/val/test split or a
corpus sample must be a PURE FUNCTION of the row (re-runs, backfills and
incremental appends land every row in the same subset — no RNG state, no seed
coordination across executors). All three ops key on the verifiable rolling
hash (functions/vhash.py), so they are exact-arithmetic reproducible in any
engine and carry FULL DuckDB oracles in __spark_entry__.py:

- ``hash_split``: weighted train/val/test assignment from hash(key) mod 1000;
- ``stratified_sample``: per-stratum keep-fractions via hash(key) mod 1e6 —
  content-stable sampling (the same doc stays in/out across runs);
- ``pack_sequences``: contiguous token-budget bin assignment per shard via a
  running token sum (the sequence-packing prepass for LLM training batches).

Plan shapes: hash_split/stratified_sample are pure narrow projections (zero
shuffle — they fuse into whatever scan feeds them); pack_sequences is one
window keyed by shard (pack within shards; a global pack would serialize the
world — at scale, shard = date/source bucket sized to executor memory).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.textstats import token_count
from ..functions.vhash import mix31 as _mix31
from ..functions.vhash import poly_hash


def _key_hash(key: Column, salt: str) -> Column:
    """Salted verifiable hash of a key column (salt decouples independent
    decisions — the split and the sample of one row must not correlate)."""
    return poly_hash(F.concat(F.lit(salt), F.lit(":"), key.cast("string")))


def hash_split(
    df: DataFrame, key_col: str, weights: dict[str, int] | None = None,
    out_col: str = "split", salt: str = "split",
) -> DataFrame:
    """Assign each row to a named split with ``weights`` in permille
    (default 800/100/100 train/val/test). Deterministic in the key: the same
    key lands in the same split on every run and every engine."""
    weights = weights or {"train": 800, "val": 100, "test": 100}
    assert sum(weights.values()) == 1000
    bucket = _key_hash(F.col(key_col), salt) % 1000
    expr = None
    hi = 0
    for name, w in weights.items():
        hi += w
        cond = bucket < hi
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn(out_col, expr)


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict[str, float],
    key_col: str, default_fraction: float = 0.0, salt: str = "sample",
) -> DataFrame:
    """Keep each row with its stratum's probability, decided by hash(key) —
    content-stable: appends/re-runs keep exactly the same rows, strata with
    no entry fall back to ``default_fraction``. Fractions are quantized to
    1e-6 (integer threshold compare — exact in every engine)."""
    bucket = _key_hash(F.col(key_col), salt) % 1_000_000
    thr = None
    for name, frac in fractions.items():
        t = int(round(frac * 1_000_000))
        cond = F.col(strata_col) == name
        thr = F.when(cond, t) if thr is None else thr.when(cond, t)
    thr = thr.otherwise(int(round(default_fraction * 1_000_000)))
    return df.filter(bucket < thr)


def weighted_order_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    key_col: str,
    per_col: str | None = None,
    salt: str = "wsample",
    out_col: str = "akey",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, order-sampling form (A-ES /
    Efraimidis-Spirakis): rank rows by ``ln(u) / w`` with ``u`` derived from
    the verifiable hash of ``key_col`` and take the top-``k`` (per
    ``per_col`` group if given) — each row's inclusion probability is
    proportional to its weight, yet the sample is a PURE FUNCTION of the
    keys (re-runs and engines agree row-for-row; ln(u)/w is the monotone
    log of the classic u^(1/w) key, so the selected set is identical).

    Exactness: u = (mix31(hash) + 0.5) / 2^31 is exact double arithmetic
    from exact ints (mix31 because threshold/order decisions on the raw
    poly value are biased — CLAUDE.md); ln runs in ONE Arrow pass with
    NumPy. NumPy's SIMD log is NOT bit-equal to libm/DuckDB ln (~1 ulp on
    ~15% of inputs, measured) — so ``akey`` is an ORDERING key, not an
    exact cross-engine value: the selected set and ranks replay exactly
    (a 1-ulp wobble can only flip an order if two keys collide within
    1 ulp), but oracles must compare set+rank, never raw akey. Ties
    (impossible for distinct keys, but contractual) break by ``key_col``.

    Plan: narrow projection + one Arrow pass + ONE window shuffle keyed by
    the group (k << group size; the window's sort is the standard top-k
    shape — groups are the parallelism unit, as in window_topk). Rows with
    weight <= 0 are excluded (zero-weight rows must never be sampled; ln/0
    is the alternative).
    """
    hv = _mix31(_key_hash(F.col(key_col), salt))
    u = (hv.cast("double") + F.lit(0.5)) / F.lit(2147483648.0)

    @F.pandas_udf("double")
    def _akey(us: pd.Series, ws: pd.Series) -> pd.Series:
        return pd.Series(
            np.log(us.to_numpy(np.float64)) / ws.to_numpy(np.float64)
        )

    out = df.filter(F.col(weight_col) > 0).withColumn(
        out_col, _akey(u, F.col(weight_col).cast("double"))
    )
    part = [per_col] if per_col else []
    w = Window.partitionBy(*part).orderBy(
        F.col(out_col).desc(), F.col(key_col).asc()
    )
    return out.withColumn(
        "rank", F.row_number().over(w).cast("int")
    ).filter(F.col("rank") <= k)


def pack_sequences(
    df: DataFrame, budget: int, shard_col: str, order_col: str,
    text_col: str = "text",
) -> DataFrame:
    """Token-budget bin assignment: within each shard, documents in
    ``order_col`` order fill contiguous bins of ~``budget`` tokens —
    ``bin_id = floor(tokens_before_this_doc / budget)`` (quantized greedy: a
    document whose tokens straddle a boundary stays in the earlier bin, so
    bins may overflow by at most one document — the standard prepass shape
    for LLM batch packing; exact bin-capped packing is a per-bin second pass
    over ~budget-sized groups).

    One window keyed by shard; ``order_col`` must be unique within a shard
    (frozen determinism rule — ties would make the running sum frame-order
    dependent).

    ``bin_id`` is PURE-INTEGER: ``(cum - n) div budget`` (both operands
    non-negative longs, so ``div`` == floor division). The earlier shape —
    ``floor(double_division)`` — was the only float step in the query and
    the sole candidate for the round-4 driver hash mismatch; integer ``div``
    replays bit-exactly in any engine."""
    w = (
        Window.partitionBy(shard_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df.withColumn("n_tokens", token_count(F.col(text_col)).cast("long"))
    cum = F.sum("n_tokens").over(w)
    return out.withColumn("cum_tokens", cum).withColumn(
        "bin_id", F.expr(f"(cum_tokens - n_tokens) div {int(budget)}")
    )


def mix_sources(
    df: DataFrame, group_col: str, weights: dict[str, int],
    key_col: str, salt: str = "mix",
) -> DataFrame:
    """Deterministic DOWN-SAMPLING to a target mixture — the data-mixing
    op of a training pipeline ("2 parts web : 1 part wiki : 1 part
    books"). ``weights`` are integer mixture parts per group; the op
    computes the largest total N whose per-group needs fit the data
    (N = min_s floor(n_s * W / w_s), exact integers), then keeps each
    group's share by a content-stable hash rule: row kept iff
    mix31(hash(salt:key)) < k_s * 2^31 / n_s. The mix31 avalanche
    finalizer is REQUIRED here (same reason as HLL ranks): the raw linear
    poly hash is badly biased on structured keys — measured 490/500
    sequential doc-ids landing in one decile — while the finalized value
    is uniform, so achieved group sizes track k_s.

    Properties: pure function of (key, group counts) — re-runs reproduce
    the same subset; groups without a weight are dropped; a weighted group
    absent from the data simply contributes nothing (the mix is computed
    over groups present). Per-group counts are collected to the driver —
    bounded by the number of mixture groups, never by rows (same bounded-
    collect precedent as pip_knn's dim build). The keep filter itself is a
    zero-shuffle narrow projection after one tiny broadcast join.

    Achieved sizes track k_s with hash-uniform deviation (exact-count
    mixing would need a per-group rank = a sort; the threshold rule is the
    100 TB shape). Exact arithmetic end to end: thresholds use Python
    bigints, the filter compares int64 — replayable in any engine
    (HUGEINT in the DuckDB oracle).
    """
    from ..functions.vhash import M31, mix31

    W = sum(weights.values())
    rows = (
        df.filter(F.col(group_col).isin(list(weights)))
        .groupBy(group_col)
        .count()
        .collect()
    )
    counts = {r[group_col]: r["count"] for r in rows}
    if not counts:
        return df.filter(F.lit(False))
    n_total = min(counts[g] * W // weights[g] for g in counts)
    thresholds = [
        (g, (weights[g] * n_total // W) * M31 // counts[g]) for g in counts
    ]
    spark = df.sparkSession
    thr = spark.createDataFrame(
        thresholds, f"{group_col} string, _mix_thr long"
    )
    h = mix31(_key_hash(F.col(key_col), salt))
    return (
        df.join(F.broadcast(thr), group_col)
        .filter(h < F.col("_mix_thr"))
        .drop("_mix_thr")
    )


def exact_count_split(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    weights: dict[str, int] | None = None,
    out_col: str = "split",
    salt: str = "xsplit",
) -> DataFrame:
    """EXACTLY-sized per-stratum splits (eval-set construction).

    ``hash_split`` buckets are proportional only in expectation — a 5%
    val cut of a 40-doc stratum can be 0 or 5 docs.  Eval sets want exact
    counts: within each stratum, rows rank by the SALTED MIX31 hash of
    the key (content-stable pseudo-random order — raw poly is badly
    biased on sequential keys, CLAUDE.md; ties break on the key) and
    integer-permille boundaries cut exact sizes: test gets
    (n*w_test) DIV 1000, val (n*w_val) DIV 1000, train the remainder.
    Deterministic in content: the same corpus gives the same split on
    every run, engine, and partitioning.

    Plan: the rank window, the stratum count, and the boundary CASE all
    ride ONE stratum-keyed Exchange.
    """
    from ..functions.vhash import mix31

    weights = weights or {"train": 900, "val": 50, "test": 50}
    assert sum(weights.values()) == 1000 and list(weights)[0] == "train"
    w_val = weights.get("val", 0)
    w_test = weights.get("test", 0)
    h = mix31(_key_hash(F.col(key_col), salt))
    wrank = Window.partitionBy(strata_col).orderBy(h, F.col(key_col))
    out = (
        df.withColumn("_rn", F.row_number().over(wrank))
        .withColumn(
            "_n", F.count(F.lit(1)).over(Window.partitionBy(strata_col))
        )
    )
    kv = F.expr(f"(_n * {w_val}) DIV 1000")
    kt = F.expr(f"(_n * {w_test}) DIV 1000")
    split = (
        F.when(F.col("_rn") <= F.col("_n") - kv - kt, "train")
        .when(F.col("_rn") <= F.col("_n") - kt, "val")
        .otherwise("test")
    )
    return out.withColumn(out_col, split).drop("_rn", "_n")


def poisson_cutoffs(max_k: int = 8) -> tuple[int, ...]:
    """Integer thresholds c_k = floor(CDF_Poisson(1)(k) * 2^31) for
    k = 0..max_k-1: a uniform 31-bit hash value u maps to the Poisson
    weight |{k : u >= c_k}| in [0, max_k] (the tail lumps into max_k).
    The SAME literals drive the engine and the oracle (the
    sprt_constants single-source rule); exp(-1)/k! in float64 is
    identical everywhere, and the floor makes the cutoffs exact ints."""
    import math

    cum, fact, out = 0.0, 1, []
    for k in range(max_k):
        if k > 0:
            fact *= k
        cum += math.exp(-1.0) / fact
        out.append(min(int(cum * 2147483648.0), 2147483647))
    return tuple(out)


def bootstrap_stats(
    df: DataFrame,
    b: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Poisson bootstrap (the at-scale resampling standard — per
    replicate each doc enters w ~ Poisson(1) times, the streaming limit
    of sampling n-of-n with replacement) -> one row per replicate:
    (rep_id, n_docs_w, tokens_w) plus the unweighted exact (n_docs,
    tokens) — the spread across replicates IS the confidence interval
    of the corpus statistics, computed without ever materializing a
    resample.

    Exactness: w is derived from the replayable hash family
    (mix31(poly('boot:b:' || id)) against the poisson_cutoffs integer
    thresholds), so every weight — and thus every replicate statistic —
    is a pure int64 both engines reproduce bit-for-bit.

    Scale shape: one x``b`` fan-out of a narrow (id, n_tok) projection,
    partial-aggregated map-side per rep_id (the only exchange carries
    <= b rows per partition); the exact totals are a 1-row broadcast."""
    cuts = poisson_cutoffs()
    base = df.select(
        F.col(id_col).alias("id"),
        token_count(F.col(text_col)).cast("long").alias("n_tok"),
    )
    exact = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("tokens"),
    )
    reps = base.select(
        "id",
        "n_tok",
        F.explode(F.sequence(F.lit(0), F.lit(b - 1))).alias("rep_id"),
    )
    u = _mix31(
        poly_hash(
            F.concat(
                F.lit("boot:"),
                F.col("rep_id").cast("string"),
                F.lit(":"),
                F.col("id").cast("string"),
            )
        )
    )
    w = None
    for c in cuts:
        term = (u >= F.lit(c)).cast("long")
        w = term if w is None else w + term
    stats = (
        reps.select("rep_id", "n_tok", w.alias("w"))
        .groupBy("rep_id")
        .agg(
            F.sum("w").cast("long").alias("n_docs_w"),
            F.sum(F.col("w") * F.col("n_tok")).cast("long").alias(
                "tokens_w"
            ),
        )
    )
    return stats.crossJoin(F.broadcast(exact)).select(
        F.col("rep_id").cast("long").alias("rep_id"),
        "n_docs_w",
        "tokens_w",
        "n_docs",
        "tokens",
    )
