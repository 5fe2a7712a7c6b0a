"""Structured-Streaming veneer: the event-driven mode of the reference.

The reference is a queue consumer — one RabbitMQ "metadata added" event per
resource, idempotent via skip-if-processed
(``/root/reference/sensorposition/extractor_info.json:10-14``,
``terra_sensorposition.py:31-37``). The Spark mapping (SURVEY.md §2.10):

- ``readStream`` on the documents directory (file source = the queue);
- ``foreachBatch`` running the SAME batch pipeline functions (process_message
  ≡ the per-batch function);
- idempotency = ``dropDuplicates`` on url within the batch + the snapshot
  layer's resume anti-join across batches (at-least-once delivery tolerated);
- ``Trigger.AvailableNow`` = drain-and-stop; checkpointLocation = resume.

No watermark is required for parity: documents are independent events with no
cross-event state (T3 — absence verified across the whole reference repo).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schemas import WEBPAGES
from ..sources.snapshot import resume_gap, write_snapshot


def stream_pipeline(
    spark: SparkSession,
    input_dir: str,
    output_table: str,
    checkpoint_dir: str,
    plots,
    batch_fn=None,
) -> "pyspark.sql.streaming.StreamingQuery":  # noqa: F821
    """Stream documents from ``input_dir`` through the flagship pipeline into
    the ``output_table`` snapshot table; returns the started query (AvailableNow).

    ``batch_fn(spark, pages_df) -> DataFrame`` overrides the default datapoint
    pipeline (must keep a unique ``url`` column).
    """
    from ..plans.pipeline import datapoints

    if batch_fn is None:
        def batch_fn(s, pages):  # noqa: ANN001
            return datapoints(s, pages, plots)

    stream = (
        spark.readStream.schema(WEBPAGES)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        # T2: tolerate queue redelivery inside a batch, then across batches
        pages = batch_df.dropDuplicates(["url"])
        todo = resume_gap(spark, pages, output_table, "url")
        out = batch_fn(spark, todo)
        write_snapshot(out, output_table, "append")

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
