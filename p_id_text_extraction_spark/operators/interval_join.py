"""General interval/range join (SURVEY.md J5's general form).

The reference builds proximity edges with an O(n^2) pairwise loop
(grouping_logic.py:465-501).  Within a turn the engine replaces that with
the window sweep; the GENERAL form -- intervals from two tables, match iff
``a.start <= b.end + gap AND b.start <= a.end + gap`` within a partition
key -- is needed when the sides are different tables (e.g. spans vs
annotations).  A naive theta-join is O(|A| x |B|) per key; this operator
buckets both sides by interval-sized grid cells so each pair meets in at
most a few buckets: an equi-join Catalyst can hash/shuffle normally, with
the exact predicate re-checked after.  This is the standard scalable
range-join decomposition (the same shape Databricks' range-join hints
produce).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    a: DataFrame,
    b: DataFrame,
    keys: list[str],
    gap: int = 0,
    bucket_size: int = 256,
    suffixes: tuple[str, str] = ("_a", "_b"),
) -> DataFrame:
    """Join rows of ``a`` and ``b`` (each with int columns start/end) whose
    intervals overlap or sit within ``gap`` of each other, per ``keys``.

    ``bucket_size`` should be >= the typical interval length; long
    intervals span multiple buckets (explode covers them), duplicates are
    dropped by the final distinct on the pair identity.
    """
    sa, sb = suffixes

    def bucketed(df: DataFrame, suf: str) -> DataFrame:
        cols = [F.col(k) for k in keys]
        renamed = df.select(
            *cols,
            *[F.col(c).alias(f"{c}{suf}") for c in df.columns if c not in keys],
        )
        lo = (F.col(f"start{suf}") - gap) / bucket_size
        hi = (F.col(f"end{suf}") + gap) / bucket_size
        return renamed.withColumn(
            "_bucket",
            F.explode(F.sequence(F.floor(lo).cast("long"), F.floor(hi).cast("long"))),
        )

    ba = bucketed(a, sa)
    bb = bucketed(b, sb)
    on = [*keys, "_bucket"]
    joined = ba.join(bb, on)
    exact = (F.col(f"start{sa}") <= F.col(f"end{sb}") + gap) & (
        F.col(f"start{sb}") <= F.col(f"end{sa}") + gap
    )
    out_cols = [c for c in joined.columns if c != "_bucket"]
    return joined.filter(exact).select(*out_cols).distinct()
