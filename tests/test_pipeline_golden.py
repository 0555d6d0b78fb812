"""Golden end-to-end: distributed Spark pipeline == pure-Python oracle,
byte-equal per turn under stable (conv_id, turn_idx, span_rank) ordering --
the north_rule invariant (SURVEY.md section 5 strategy #2/#3)."""

from __future__ import annotations

import math

import pytest

from p_id_text_extraction_spark.oracle.pipeline import extract_table
from p_id_text_extraction_spark.plans.pipeline import extract_pipeline, extract_pipeline_fused
from p_id_text_extraction_spark.sources.transcripts import gen_turns, transcripts_df

KEY = ["conv_id", "turn_idx", "span_rank"]


def _spark_rows(df):
    out = []
    for r in df.orderBy(*KEY).collect():
        d = r.asDict()
        d["provenance"] = list(d["provenance"])
        out.append(d)
    return out


def _oracle_rows(turns):
    return extract_table(turns)


def assert_equal_rows(spark_rows, oracle_rows):
    assert len(spark_rows) == len(oracle_rows), (
        f"row count: spark={len(spark_rows)} oracle={len(oracle_rows)}"
    )
    for s, o in zip(spark_rows, oracle_rows):
        for col in ("conv_id", "turn_idx", "span_rank", "start", "end", "kind",
                    "text", "method", "provenance", "is_grouped"):
            assert s[col] == o[col], f"{col} mismatch at {s['conv_id']}/{s['turn_idx']}/{s['span_rank']}: {s[col]!r} != {o[col]!r}"
        for col in ("start_frac", "end_frac", "start_norm", "end_norm", "confidence"):
            assert math.isclose(s[col], o[col], rel_tol=0, abs_tol=0) or s[col] == o[col], (
                f"{col} bit mismatch: {s[col]!r} != {o[col]!r}"
            )


@pytest.fixture(scope="module")
def tiny_turns():
    return gen_turns(8, max_turns=5, seed=42)


@pytest.fixture(scope="module")
def small_turns():
    return gen_turns(60, max_turns=12, seed=7)


def test_tiny_byte_equality(spark, tiny_turns):
    df = extract_pipeline(transcripts_df(spark, tiny_turns))
    assert_equal_rows(_spark_rows(df), _oracle_rows(tiny_turns))


def test_small_byte_equality(spark, small_turns):
    df = extract_pipeline(transcripts_df(spark, small_turns))
    rows = _spark_rows(df)
    assert len(rows) > 50  # fixture actually produces spans
    assert_equal_rows(rows, _oracle_rows(small_turns))


@pytest.mark.parametrize("k", [1, 3, 13])
def test_output_invariant_under_repartition(spark, tiny_turns, k):
    """Ordering-stability property: same bytes whatever the physical split
    (SURVEY.md 7.3 hard part #2)."""
    df = extract_pipeline(transcripts_df(spark, tiny_turns).repartition(k), num_partitions=k)
    assert_equal_rows(_spark_rows(df), _oracle_rows(tiny_turns))


def test_fused_byte_equality(spark, small_turns):
    """The FUSED (map-only) strategy must produce the same bytes as the
    oracle -- and therefore as the relational strategy."""
    df = extract_pipeline_fused(transcripts_df(spark, small_turns))
    rows = _spark_rows(df)
    assert len(rows) > 50
    assert_equal_rows(rows, _oracle_rows(small_turns))


def test_fused_plan_is_map_only(spark, tiny_turns):
    """Scale contract of the fused strategy: ZERO exchanges, zero sorts --
    a pure map plan that scales linearly with executors."""
    df = extract_pipeline_fused(transcripts_df(spark, tiny_turns))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 0
    assert plan.count("+- Sort ") == 0
    assert plan.count("MapInPandas") == 1


def test_fused_schema_matches_relational(spark, tiny_turns):
    a = extract_pipeline(transcripts_df(spark, tiny_turns)).schema
    b = extract_pipeline_fused(transcripts_df(spark, tiny_turns)).schema
    assert [(f.name, f.dataType.simpleString()) for f in a.fields] == \
           [(f.name, f.dataType.simpleString()) for f in b.fields]


def test_fused_degenerate_turns(spark):
    turns = [
        {"conv_id": "c0", "turn_idx": 0, "role": "user", "text": "", "tool": None, "ts": None},
        {"conv_id": "c0", "turn_idx": 1, "role": "user", "text": None, "tool": None, "ts": None},
    ]
    assert extract_pipeline_fused(transcripts_df(spark, turns)).count() == 0


def test_fused_byte_equality_generated_slice(spark):
    """Broader byte-equality evidence: a 300-conversation slice of the
    coordination-free distributed generator (the bench table's source),
    fused strategy vs oracle."""
    from p_id_text_extraction_spark.sources.transcripts import gen_conv
    turns = []
    for i in range(300):
        turns.extend(gen_conv(f"conv-{i:06d}", max_turns=50))
    df = extract_pipeline_fused(transcripts_df(spark, turns))
    rows = _spark_rows(df)
    assert len(rows) > 3000
    assert_equal_rows(rows, _oracle_rows(turns))


def test_degenerate_turns_produce_no_rows_but_run(spark):
    turns = [
        {"conv_id": "c0", "turn_idx": 0, "role": "user", "text": "", "tool": None, "ts": None},
        {"conv_id": "c0", "turn_idx": 1, "role": "user", "text": "   ", "tool": None, "ts": None},
        {"conv_id": "c0", "turn_idx": 2, "role": "user", "text": None, "tool": None, "ts": None},
        {"conv_id": "c1", "turn_idx": 0, "role": "user",
         "text": "Home | About | Contact | Blog", "tool": None, "ts": None},
    ]
    df = extract_pipeline(transcripts_df(spark, turns))
    assert df.count() == 0


def test_output_schema_contract(spark, tiny_turns):
    df = extract_pipeline(transcripts_df(spark, tiny_turns))
    assert [f.name for f in df.schema.fields] == [
        "conv_id", "turn_idx", "span_rank", "start", "end",
        "start_frac", "end_frac", "start_norm", "end_norm",
        "kind", "text", "confidence", "method", "provenance", "is_grouped",
    ]
    by_name = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert by_name["provenance"] == "array<string>"
    assert by_name["start_frac"] == "double"
    assert by_name["span_rank"] == "int"
