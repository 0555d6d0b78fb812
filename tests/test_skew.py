"""Skew handling (SURVEY.md section 4 partitioning row, 7.3 hard part #4):
a hot conversation must spread across partitions because the pipeline keys
on the TURN, not the conversation -- plus byte-equality still holds on the
skewed fixture."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from p_id_text_extraction_spark.functions.udfs import make_detect_udf
from p_id_text_extraction_spark.operators.extract import candidates, detect
from p_id_text_extraction_spark.oracle.pipeline import extract_table
from p_id_text_extraction_spark.plans.pipeline import extract_pipeline
from p_id_text_extraction_spark.sources.transcripts import gen_turn, gen_turns, transcripts_df


@pytest.fixture(scope="module")
def skew_turns():
    """Scaled-down FIXTURES.md skew table: 20 normal convs + one hot conv
    with 400 turns, every 50th a ~20KB mega-turn."""
    turns = gen_turns(20, max_turns=10, seed=11)
    hot = "conv-hot000"
    from p_id_text_extraction_spark.sources.transcripts import _prose, _rng
    for t in range(400):
        row = gen_turn(hot, t, 0)
        if t % 50 == 0:
            row["text"] = _prose(_rng(hot, t, "mega"), 40, 60)
        turns.append(row)
    return turns


def test_hot_conversation_spreads_across_partitions(spark, skew_turns):
    df = transcripts_df(spark, skew_turns)
    cand = candidates(detect(df, make_detect_udf(), num_partitions=8))
    per_part = (
        cand.filter(F.col("conv_id") == "conv-hot000")
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid").count().collect()
    )
    assert len(per_part) >= 4, f"hot conv stuck in {len(per_part)} partitions"
    total = sum(r["count"] for r in per_part)
    biggest = max(r["count"] for r in per_part)
    assert biggest / total < 0.5, "one partition holds most of the hot conversation"


def test_skewed_fixture_byte_equality(spark, skew_turns):
    got = [
        (r.conv_id, r.turn_idx, r.span_rank, r.start, r.end, r.text, r.method)
        for r in extract_pipeline(transcripts_df(spark, skew_turns), num_partitions=8)
        .orderBy("conv_id", "turn_idx", "span_rank").collect()
    ]
    want = [
        (r["conv_id"], r["turn_idx"], r["span_rank"], r["start"], r["end"], r["text"], r["method"])
        for r in extract_table(skew_turns)
    ]
    assert got == want


def test_skewed_fixture_fused_byte_equality(spark, skew_turns):
    """The fused strategy on the skewed fixture: identical bytes, and the
    hot conversation costs nothing special -- map-only, per-turn work."""
    from p_id_text_extraction_spark.plans.pipeline import extract_pipeline_fused
    got = [
        (r.conv_id, r.turn_idx, r.span_rank, r.start, r.end, r.text, r.method)
        for r in extract_pipeline_fused(transcripts_df(spark, skew_turns))
        .orderBy("conv_id", "turn_idx", "span_rank").collect()
    ]
    want = [
        (r["conv_id"], r["turn_idx"], r["span_rank"], r["start"], r["end"], r["text"], r["method"])
        for r in extract_table(skew_turns)
    ]
    assert got == want


def test_mega_turn_bounded_blocks(spark, skew_turns):
    """A 20KB turn segments into ~n/step blocks -- per-row work stays
    bounded however large the turn (sahi_slicer W1 analogue)."""
    mega = [t for t in skew_turns if t["conv_id"] == "conv-hot000" and t["turn_idx"] == 0]
    df = transcripts_df(spark, mega)
    cand = candidates(detect(df, make_detect_udf(), num_partitions=2))
    n_blocks = cand.select(F.countDistinct("block_idx")).collect()[0][0]
    text_len = len(mega[0]["text"])
    assert n_blocks >= text_len // 230


def test_aqe_splits_skewed_join_partition(spark):
    """AQE skew-join: a hot join key whose shuffle partition dwarfs the
    median must be split into sub-partitions at runtime (the engine's
    answer for skew OUTSIDE the per-turn-keyed extraction path, where
    salting/keying is designed in)."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "262144",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "131072",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        fact = spark.range(120_000).select(
            F.when(F.col("id") % 20 < 19, "hot").otherwise((F.col("id") % 7).cast("string")).alias("k"),
            F.lpad(F.col("id").cast("string"), 120, "x").alias("payload"),
        )
        dim = spark.createDataFrame(
            [("hot", 1)] + [(str(i), 0) for i in range(7)], "k string, flag int")
        # keep payload in the output: pruning it would shrink the shuffle
        # below the skew threshold and AQE would just coalesce
        joined = fact.join(dim, "k").select("k", "payload", "flag")
        # execute THIS DataFrame (count() plans a separate aggregate and
        # would leave joined's own adaptive plan unfinalized)
        assert len(joined.collect()) == 120_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        # AQEShuffleRead marks the runtime-split hot partition as 'skewed'
        assert "AQEShuffleRead" in plan and "skewed" in plan, plan[:2000]
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
