"""Validation operators (SURVEY.md P12/A9 + S9 debug sink).

The reference validates image dimensions against PDF page sizes with a 5%
tolerance before coordinate conversion (src/convert_coord.py:91-149) and
summarizes pass rates (270-282).  Our analogue validates a table's recorded
metadata against the actual payload, emits a boolean projection + summary
counters, and never throws -- failures are data, not errors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dimension_check(docs: DataFrame, tol_pct: int = 5) -> DataFrame:
    """P12: recorded n_chars vs actual length(text), pass iff the relative
    difference is within tol_pct (both-axes check collapses to one axis in
    text space).  Division guarded for empty expectation
    (grouping_logic.py:155-156-style zero guards)."""
    expected = F.col("n_chars")
    actual = F.length("text")
    diff_pct = F.when(expected == 0, F.when(actual == 0, F.lit(0)).otherwise(F.lit(1000)))\
                .otherwise(F.floor(F.lit(100) * F.abs(actual - expected) / expected))
    return docs.select(
        "doc_id",
        expected.alias("expected_chars"),
        actual.alias("actual_chars"),
        diff_pct.cast("int").alias("diff_pct"),
        (diff_pct <= tol_pct).alias("compatible"),
    )


def validation_summary(checked: DataFrame) -> DataFrame:
    """A9: compatible_count / total (src/convert_coord.py:270-282)."""
    return checked.agg(
        F.sum(F.when(F.col("compatible"), 1).otherwise(0)).cast("long").alias("compatible_count"),
        F.count(F.lit(1)).alias("total_count"),
    )


def annotate_spans(spans: DataFrame) -> DataFrame:
    """S9 debug sink analogue: per-turn single-string rendering of extracted
    spans ('[rank|kind|start-end] text'), ordered -- the visualizer
    replacement (visualizer.py:8-125), written to a debug table or shown."""
    return (
        spans.withColumn(
            "ann",
            F.format_string("[%d|%s|%d-%d] %s", "span_rank", "kind", "start", "end", "text"),
        )
        .groupBy("conv_id", "turn_idx")
        .agg(F.array_join(F.array_sort(F.collect_list(F.struct("span_rank", "ann"))).getField("ann"), "\n")
             .alias("annotated"))
    )
