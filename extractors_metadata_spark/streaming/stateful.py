"""Custom stateful streaming operator: capture sessionization.

Groups the parsed document stream by sensor and assembles "capture sessions"
— bursts of scans separated by more than ``gap_s`` seconds — using
``applyInPandasWithState`` (the engine's custom-stateful-operator surface; no
built-in windowing expresses gap-based sessions).

State per sensor: the currently open session (start, last_ts, count). A batch
closes and emits every session whose gap to the next scan exceeds ``gap_s``;
the trailing open session persists in state across batches and is flushed via
ProcessingTimeTimeout when the sensor goes quiet.

No reference analog (the reference is stateless per event — SURVEY.md T3);
engine-added for the web-scale workload.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..schemas import WEBPAGES

OUTPUT_SCHEMA = "sensor string, session_start timestamp, session_end timestamp, n_docs long"
STATE_SCHEMA = "start long, last long, n long"  # epoch micros


def _session_fn(gap_s: float):
    gap_us = int(gap_s * 1_000_000)

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        sensor = key[0]
        ts = pd.concat([p["warc_ts"] for p in pdfs], ignore_index=True)

        if state.hasTimedOut:
            # sensor quiet past the timeout: flush the open session
            if state.exists:
                start, last, n = state.get
                state.remove()
                yield pd.DataFrame(
                    {
                        "sensor": [sensor],
                        "session_start": [pd.Timestamp(start, unit="us")],
                        "session_end": [pd.Timestamp(last, unit="us")],
                        "n_docs": [n],
                    }
                )
            return

        micros = ts.sort_values().astype("int64").to_numpy() // 1000  # ns -> us
        start, last, n = state.get if state.exists else (None, None, 0)

        out_start, out_end, out_n = [], [], []
        for t in micros:
            if start is None:
                start, last, n = int(t), int(t), 1
            elif t - last > gap_us:
                out_start.append(start)
                out_end.append(last)
                out_n.append(n)
                start, last, n = int(t), int(t), 1
            else:
                last, n = int(t), n + 1

        state.update((start, last, n))
        # flush timeout is PROCESSING time (how long the sensor is quiet on
        # the wire), independent of the EVENT-time gap that splits sessions —
        # keep it short so AvailableNow drains flush state promptly.
        state.setTimeoutDuration(5_000)
        if out_start:
            yield pd.DataFrame(
                {
                    "sensor": [sensor] * len(out_start),
                    "session_start": pd.to_datetime(out_start, unit="us"),
                    "session_end": pd.to_datetime(out_end, unit="us"),
                    "n_docs": out_n,
                }
            )

    return fn


def capture_sessions(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    gap_s: float = 60.0,
) -> "pyspark.sql.streaming.StreamingQuery":  # noqa: F821
    from ..plans.parse import parse_metadata

    stream = (
        spark.readStream.schema(WEBPAGES).option("maxFilesPerTrigger", 8).parquet(input_dir)
    )
    parsed = parse_metadata(stream).select("sensor", "warc_ts")
    sessions = parsed.groupBy("sensor").applyInPandasWithState(
        _session_fn(gap_s),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
    return (
        sessions.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
