"""Lineage counters (A6 observe) + closed-form segmentation-formula
consistency + interval-join vs brute-force oracle."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from p_id_text_extraction_spark.config import DEFAULT_CONFIG
from p_id_text_extraction_spark.operators.interval_join import interval_join
from p_id_text_extraction_spark.oracle import spec
from p_id_text_extraction_spark.plans.pipeline import extract_pipeline
from p_id_text_extraction_spark.sources.transcripts import gen_turns, transcripts_df


def test_observe_counters(spark):
    turns = gen_turns(12, max_turns=6, seed=4)
    obs = Observation("lineage")
    df = extract_pipeline(transcripts_df(spark, turns), observation=obs)
    n_out = df.count()
    m = dict(obs.get)
    # spans_out <= candidates_in invariant (grouping_logic.py:979-983
    # analogue); sentinel rows are excluded from candidates_in
    assert m["turns_with_candidates"] <= len(turns)
    assert m["candidates_in"] >= m["turns_with_candidates"]
    assert n_out <= m["candidates_in"]
    assert n_out > 0


def test_segment_closed_form_matches_spec():
    """The SQL oracles compute block counts with a closed-form formula
    (queries._BLOCKS_SQL); it must agree with the generative spec for
    every length."""
    B, S = DEFAULT_CONFIG.block_size, DEFAULT_CONFIG.step
    for n in list(range(0, 2000)) + [5000, 10007, 123456]:
        blocks = spec.segment_offsets(n)
        if n == 0:
            nb = 0
        elif n <= B:
            nb = 1
        else:
            nb = (n - B - 1) // S + 2
        assert len(blocks) == nb, f"n={n}: spec={len(blocks)} formula={nb}"
        for k, (idx, s, e) in enumerate(blocks):
            if n <= B:
                want = (0, 0, n)
            elif k == nb - 1:
                want = (k, n - B, n)
            else:
                want = (k, k * S, k * S + B)
            assert (idx, s, e) == want, f"n={n} k={k}"


def test_interval_join_matches_bruteforce(spark):
    import random
    rng = random.Random(13)
    rows_a, rows_b = [], []
    for i in range(120):
        key = rng.randint(0, 3)
        s = rng.randint(0, 2000)
        ln = rng.randint(1, 700)     # intervals longer than bucket_size too
        (rows_a if i % 2 == 0 else rows_b).append((key, i, s, s + ln))
    a = spark.createDataFrame(rows_a, "k int, rid int, start long, end long")
    b = spark.createDataFrame(rows_b, "k int, rid int, start long, end long")
    got = {
        (r.k, r.rid_a, r.rid_b)
        for r in interval_join(a, b, ["k"], gap=5, bucket_size=256).collect()
    }
    want = set()
    for (ka, ra, sa, ea) in rows_a:
        for (kb, rb, sb, eb) in rows_b:
            if ka == kb and sa <= eb + 5 and sb <= ea + 5:
                want.add((ka, ra, rb))
    assert got == want
