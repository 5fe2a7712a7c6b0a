"""Write-side Z-order data layout + file-skipping evidence.

Engine-added capability (north-rule framing: Iceberg tables at 10^12-document
scale): cluster rows on the Morton key of two dimensions before writing, so
parquet footer min/max statistics prune files for 2-D predicates — the
from-scratch twin of Delta ``OPTIMIZE ZORDER BY`` / Iceberg z-ordered
rewrites. The layout pays ONE range-partition shuffle at write time and
every subsequent spatial scan reads a small fraction of the files; at 100 TB
that trade is the difference between touching ~10^6 files and touching the
few whose z range intersects the query block.

Plan shape: ``z_value`` is pure codegen (functions/zcurve.py);
``repartitionByRange`` samples the z distribution (RangePartitioner) so file
sizes stay balanced even when the key space is sparse/skewed, then the
within-partition sort makes every file a contiguous z run. Nothing collects
to the driver.

``file_span_stats`` quantifies the win engine-side: per-file min/max spans of
the two dimensions (exactly the footer stats a reader would prune on),
aggregated to the fraction of files a point/region lookup must touch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.zcurve import z_value


def zorder_layout(
    df: DataFrame,
    x_col: str,
    y_col: str,
    n_files: int = 32,
    z_col: str = "zval",
) -> DataFrame:
    """Cluster ``df`` for writing: add the Morton key of (x_col, y_col),
    range-partition on it into ``n_files`` output partitions and sort within
    each — one parquet file per partition, each a contiguous z-run. The
    key column is kept (it is also the natural sort/bucket key for
    downstream co-located reads); drop it after write if unwanted."""
    keyed = df.withColumn(z_col, z_value(F.col(x_col), F.col(y_col)))
    return keyed.repartitionByRange(n_files, z_col).sortWithinPartitions(z_col)


def file_span_stats(df_with_file: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Per-file min/max spans of two dimensions — the parquet footer stats a
    pruning reader sees. Input must carry ``_file`` (e.g.
    ``spark.read.parquet(p).withColumn('_file', F.input_file_name())``).
    Returns one row per file: (``_file``, x_min, x_max, y_min, y_max, rows).
    """
    return df_with_file.groupBy("_file").agg(
        F.min(x_col).alias("x_min"),
        F.max(x_col).alias("x_max"),
        F.min(y_col).alias("y_min"),
        F.max(y_col).alias("y_max"),
        F.count(F.lit(1)).alias("rows"),
    )


def pruning_fraction(span_stats: DataFrame, x_col: str = "x", y_col: str = "y"):
    """Expected fraction of files touched by a uniform random POINT lookup =
    sum over files of (files whose [min,max] box covers the point) / points.
    Computed exactly as sum(file box area) / (global box area * n_files) —
    a single tiny aggregate (one row back to the driver, test/report use)."""
    row = span_stats.agg(
        F.sum(
            (F.col("x_max") - F.col("x_min") + 1)
            * (F.col("y_max") - F.col("y_min") + 1)
        ).alias("covered"),
        (
            (F.max("x_max") - F.min("x_min") + 1)
            * (F.max("y_max") - F.min("y_min") + 1)
        ).alias("domain"),
        F.count(F.lit(1)).alias("n_files"),
    ).collect()[0]
    return float(row["covered"]) / (float(row["domain"]) * float(row["n_files"]))
