"""Unit tests for scalar helpers and validation operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from p_id_text_extraction_spark.functions.text import block_number, mint_block_id
from p_id_text_extraction_spark.operators.validate import annotate_spans, dimension_check, validation_summary
from p_id_text_extraction_spark.plans.pipeline import extract_pipeline
from p_id_text_extraction_spark.sources.transcripts import gen_turns, transcripts_df


def test_block_number_parse(spark):
    df = spark.createDataFrame(
        [("conv-1_0_B0021",), ("conv-1_3_B0000",), ("garbage",), ("x_B12",)], "block_id string"
    )
    got = [r.n for r in df.select(block_number("block_id").alias("n")).collect()]
    assert got == [21, 0, 0, 12]


def test_mint_block_id_matches_spec(spark):
    from p_id_text_extraction_spark.oracle import spec
    df = spark.createDataFrame([("conv-7", 3, 21)], "conv_id string, turn_idx int, idx int")
    got = df.select(mint_block_id("conv_id", "turn_idx", "idx").alias("b")).collect()[0].b
    assert got == spec.block_id("conv-7", 3, 21)


def test_dimension_check_and_summary(spark):
    docs = spark.createDataFrame(
        [(1, "abcde", 5), (2, "abc", 100), (3, "", 0), (4, "xy", 0)],
        "doc_id long, text string, n_chars long",
    )
    rows = {r.doc_id: r for r in dimension_check(docs).collect()}
    assert rows[1].compatible is True
    assert rows[2].compatible is False
    assert rows[3].compatible is True      # 0 expected, 0 actual
    assert rows[4].compatible is False     # 0 expected, nonzero actual
    s = validation_summary(dimension_check(docs)).collect()[0]
    assert (s.compatible_count, s.total_count) == (2, 4)


def test_annotate_spans_debug_sink(spark):
    spans = extract_pipeline(transcripts_df(spark, gen_turns(4, max_turns=3, seed=2)))
    ann = annotate_spans(spans).collect()
    assert len(ann) > 0
    one = ann[0].annotated
    assert one.startswith("[1|")
