"""Streaming exact dedup: emit each document fingerprint's FIRST-SEEN row.

The cross-batch dedup cache `state_stream.py`'s docstring promises: a
training-data ingest stream must admit a document only if no earlier
micro-batch (or an earlier row of the same batch) already carried the
same canonical content.  State is keyed BY THE FINGERPRINT itself, so
the state store shards with the fingerprint hash exactly like the batch
operator's groupBy -- per-group state is one tiny (first_doc_id,
n_seen) tuple, and a hot fingerprint (a viral boilerplate document)
concentrates state reads, not state size.

Semantics (mirrors `operators/dedup.exact_dups`' canonicalization):
  * fingerprint = md5 of the canonical normalization
    (`textstats.norm_text_col`), the SAME derivation the batch exact
    dedup and corpus_split use -- stream and batch agree on what "the
    same document" means;
  * the canonical row is the minimum doc_id within the fingerprint's
    FIRST batch; later batches never re-admit (stream order wins);
  * every batch re-emits the fingerprint's running n_seen with
    ``is_new=False``, so dup counts stay auditable; the state survives
    query restarts via the checkpoint.

Sink protocol: applyInPandasWithState requires update mode, so batches
land through foreachBatch with batch_id-partitioned dynamic overwrite --
replay of a failed batch overwrites its own partition, the same
idempotence contract as extract_stream/rollup_stream.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "fingerprint string, doc_id bigint, n_seen bigint, is_new boolean"
STATE_SCHEMA = "first_doc_id bigint, n_seen bigint"


def _first_seen(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    ids: list[int] = []
    for pdf in pdfs:
        ids.extend(int(x) for x in pdf["doc_id"])
    if state.exists:
        first, seen = state.get
        seen += len(ids)
        is_new = False
    else:
        first, seen = min(ids), len(ids)
        is_new = True
    state.update((first, seen))
    # first batch emits the ADMITTED row (is_new); later batches emit
    # count updates so the dup tally stays auditable downstream
    yield pd.DataFrame({"fingerprint": [key[0]], "doc_id": [first],
                        "n_seen": [seen], "is_new": [is_new]})


def dedup_stream(
    stream: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """First-seen exact dedup over a streaming documents source.

    ``stream`` must carry (doc_id bigint, text string).  Emits one row
    per touched fingerprint per batch: the first carries ``is_new=True``
    (the admitted canonical doc), later ones are running-count updates
    (``is_new=False``) -- consumers filter on is_new, auditors read each
    fingerprint's latest row.  Returns the started query; callers
    awaitTermination()."""
    from p_id_text_extraction_spark.operators.textstats import norm_text_col
    fp = F.md5(norm_text_col())
    admitted = (
        stream.select(fp.alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .applyInPandasWithState(
            _first_seen, OUTPUT_SCHEMA, STATE_SCHEMA, "update",
            GroupStateTimeout.NoTimeout,
        )
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        from p_id_text_extraction_spark.util import dynamic_partition_overwrite
        with dynamic_partition_overwrite(batch_df.sparkSession):
            (batch_df.filter(F.col("doc_id").isNotNull())
             .withColumn("batch_id", F.lit(batch_id))
             .write.mode("overwrite").partitionBy("batch_id").parquet(output_dir))

    writer = (admitted.writeStream.outputMode("update")
              .foreachBatch(process_batch)
              .option("checkpointLocation", checkpoint_dir))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
