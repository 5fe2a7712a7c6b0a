"""extractors_metadata_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Re-expresses the data-processing capabilities of the reference
``terraref/extractors-metadata`` (studied at /root/reference, behavior only) as an
idiomatic Spark DataFrame engine:

- vectorized pandas/Arrow UDF metadata parsing over web-page rows
  (url, warc_ts, html, text, lang),
- from-scratch NumPy geodesy (UTM <-> WGS84, haversine),
- H3-style hexagonal and S2-style Hilbert-quad cell indexing (res 7-12),
- point-in-polygon join via cell-candidate pruning + ray-cast refine,
- kNN join via k-ring expansion + distance re-rank,
- slippy Z/X/Y tile assignment,
- hot-cell salting + range repartitioning for skew,
- snapshot manifests with per-partition lineage for resumable runs,
- training-data ops: dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard /
  embedding cosine), ANN similarity search, text quality/language/token stats.

Everything here derives from public knowledge only (Apache Spark APIs, public
geodesy/spatial-indexing math, the reference repo's observable behavior).
"""

__version__ = "0.1.0"
