"""Watermarked streaming rollup (SURVEY.md section 2.9 bonus surface).

The extraction pipeline itself needs no cross-batch state (per-turn
semantics -- see extract_stream.py), but a production events feed does:
this module is the hypertable-style hourly rollup as a genuinely STATEFUL
Structured Streaming query -- event-time windows + a watermark that bounds
state and defines late-data semantics.

Semantics (append mode):
  * a 1-hour window emits exactly once, when the watermark
    (max event time seen - delay) passes its end;
  * rows later than the watermark are DROPPED -- the rollup is stable
    once emitted, which is what makes the sink idempotent parquet append
    rather than an ever-rewritten table;
  * state is bounded by (delay / window) windows per event_type.

Aggregates follow the engine's determinism rule: integer cents, no float
aggregation.  (count-distinct is not available in streaming append mode;
the batch twin `plans/queries.q_events_hourly_rollup` carries n_users.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def hourly_rollup_stream(
    stream: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    watermark_delay: str = "30 minutes",
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Event-time hourly rollup over a streaming events source.

    ``stream`` must carry (ts timestamp, event_type string, value double).
    Returns the started query; callers awaitTermination().
    """
    agg = (
        stream
        .withWatermark("ts", watermark_delay)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
        .select(F.col("w.start").alias("hour"), "event_type", "n_events", "value_cents")
    )
    writer = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
