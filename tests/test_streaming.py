"""Streaming wrapper test: file-source micro-batches through foreachBatch
produce the same spans as the batch pipeline."""

from __future__ import annotations

from p_id_text_extraction_spark.oracle.pipeline import extract_table
from p_id_text_extraction_spark.sources.transcripts import TRANSCRIPT_SCHEMA, gen_turns, transcripts_df
from p_id_text_extraction_spark.streaming.extract_stream import extract_stream


def test_stream_matches_oracle(spark, tmp_path):
    turns = gen_turns(10, max_turns=4, seed=5)
    src = str(tmp_path / "src")
    # two "arrival waves" -> two files the stream picks up
    transcripts_df(spark, turns[: len(turns) // 2]).coalesce(1).write.mode("append").parquet(src)
    transcripts_df(spark, turns[len(turns) // 2:]).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    q = extract_stream(stream, str(tmp_path / "out"), str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    got = [
        (r.conv_id, r.turn_idx, r.span_rank, r.text)
        for r in spark.read.parquet(str(tmp_path / "out"))
        .orderBy("conv_id", "turn_idx", "span_rank").collect()
    ]
    want = [(r["conv_id"], r["turn_idx"], r["span_rank"], r["text"]) for r in extract_table(turns)]
    assert got == want

    # retry idempotence: replaying the same micro-batches (fresh WAL, same
    # batch ids, same output dir) must overwrite, not duplicate -- the
    # at-least-once foreachBatch contract (ADVICE round 1)
    q2 = extract_stream(stream, str(tmp_path / "out"), str(tmp_path / "ckpt2"))
    q2.awaitTermination(120)
    got2 = [
        (r.conv_id, r.turn_idx, r.span_rank, r.text)
        for r in spark.read.parquet(str(tmp_path / "out"))
        .orderBy("conv_id", "turn_idx", "span_rank").collect()
    ]
    assert got2 == want
