"""As-of (temporal backward) join over event streams.

Engine-added capability (task mandate: operations a large-scale web/training
pipeline needs): match each left event with the MOST RECENT right event at or
before it for the same key — attributing purchases to the latest preceding
view, stamping documents with the last crawl-config change, aligning sensor
readings to irregular query times. Spark has no built-in as-of join; the
naive expression (range theta-join + argmax per left row) explodes the
candidate space O(|L|·|R|) per key.

Implementation — the union/last-carry-forward trick, composed entirely from
built-in operators:

  1. project both sides NARROW: (key, ts, side, row-id) — right payload does
     NOT ride through the shuffle (CLAUDE.md narrow-fan-out rule);
  2. union, then one window per key ordered by (ts, side, id): carrying
     ``last(right_ts, ignorenulls=True)`` forward gives every left row the
     timestamp of its as-of match in a single pass;
  3. join the matched (left-id -> right_ts) pairs back to the left payload
     (unique left id) and to the right payload (unique (key, right_ts)).

Scale design (100 TB): step 2 is ONE hash-uniform shuffle on the key plus a
partition-local sort — no range explosion, no driver collect, skew bounded
by the hottest key's row count (same bound any per-key window has; salt via
``operators/skew`` upstream if one key dominates). Steps 3 are unique-key
equi-joins Catalyst can broadcast when a side is small.

Determinism contract (driver oracle): right rows sort BEFORE left rows at
equal timestamps (side 0 < 1), making the match inclusive (right_ts <= ts) —
exactly DuckDB ``ASOF LEFT JOIN ... ON l.ts >= r.ts`` semantics, which the
driver oracle uses as a genuinely independent implementation. PRECONDITION:
``(key, right_ts)`` must be unique on the right (dedup first otherwise) and
``left_id`` unique on the left; gap arithmetic is exact int64 microseconds
(``unix_micros`` == DuckDB ``epoch_us`` under the pinned-UTC session).

Reference analog: none — the reference (terraref/extractors-metadata)
handles one message at a time; its closest shape is the geostreams
(stream, time) upsert sink (terra_sensorposition.py), which this operator
generalizes to cross-stream temporal alignment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    left_id: str = "event_id",
    tolerance_s: int | None = None,
    right_suffix: str = "_r",
) -> DataFrame:
    """Backward as-of join: left.* plus the right row with the greatest
    ``right_ts <= left_ts`` per key (LEFT semantics — unmatched keeps nulls),
    plus ``asof_gap_us`` (exact int64 microseconds, null when unmatched).

    ``tolerance_s``: matches farther back than this are dropped (row kept,
    match nulled) — the standard staleness bound.

    Right payload columns (everything except ``on``/``right_ts``) come back
    suffixed with ``right_suffix``; the right timestamp itself as
    ``<right_ts><suffix>``.
    """
    lus = F.unix_micros(F.col(left_ts).cast("timestamp"))
    rus = F.unix_micros(F.col(right_ts).cast("timestamp"))

    # narrow probe frames: payload never rides the union/window shuffle
    lu = left.select(
        F.col(on).alias("__k"),
        lus.alias("__us"),
        F.lit(1).alias("__side"),
        F.col(left_id).alias("__lid"),
        F.lit(None).cast("long").alias("__rts_src"),
    )
    ru = right.select(
        F.col(on).alias("__k"),
        rus.alias("__us"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(left.schema[left_id].dataType).alias("__lid"),
        rus.alias("__rts_src"),
    )
    # (ts, side, rts) is a total order: side splits equal timestamps
    # (right first -> inclusive match), and (key, rts) is unique on the right.
    w = (
        Window.partitionBy("__k")
        .orderBy("__us", "__side", "__rts_src")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        lu.unionByName(ru)
        .withColumn("__rts", F.last("__rts_src", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    if tolerance_s is not None:
        carried = carried.withColumn(
            "__rts",
            F.when(
                F.col("__us") - F.col("__rts") <= int(tolerance_s) * 1_000_000,
                F.col("__rts"),
            ),
        )
    matches = carried.select("__lid", "__rts")

    rpay = right.select(
        F.col(on).alias("__k"),
        rus.alias("__rts"),
        *[
            F.col(c).alias(c + right_suffix)
            for c in right.columns
            if c not in (on, right_ts)
        ],
        F.col(right_ts).alias(right_ts + right_suffix),
    )
    out = (
        left.join(matches, left[left_id] == matches["__lid"], "left")
        .join(
            rpay,
            (F.col(on) == rpay["__k"]) & (matches["__rts"] == rpay["__rts"]),
            "left",
        )
        .withColumn(
            "asof_gap_us",
            F.unix_micros(F.col(left_ts).cast("timestamp")) - matches["__rts"],
        )
    )
    return out.drop("__lid", "__rts", "__k")
