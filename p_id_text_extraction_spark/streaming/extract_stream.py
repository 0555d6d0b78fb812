"""Streaming wrapper (SURVEY.md section 2.9).

The reference is pure batch and so is the north_rule target; per the survey
note, the per-turn pipeline needs nothing stateful across micro-batches --
every operator keys on (conv_id, turn_idx) within the batch.  So streaming
support is exactly `foreachBatch` over the SAME batch plan: late-arriving
turns simply land in a later micro-batch and produce their spans then.
Checkpointing is Structured Streaming's own WAL; the batch engine's
manifest-based resume (plans/checkpoint.py) is for spark-submit batch jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from p_id_text_extraction_spark.config import DEFAULT_CONFIG, ExtractConfig
from p_id_text_extraction_spark.plans.pipeline import extract_pipeline


def extract_stream(
    stream: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    cfg: ExtractConfig = DEFAULT_CONFIG,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Run the extraction pipeline over a streaming transcripts source.

    ``stream`` must be a readStream DataFrame with the transcript schema.
    Each micro-batch runs the identical batch plan and appends to
    ``output_dir`` as parquet.
    """

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        (extract_pipeline(batch_df, cfg)
         .write.mode("append").parquet(output_dir))

    writer = stream.writeStream.foreachBatch(process_batch).option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
