"""As-of (temporal) join: for every left row, the LATEST right row with
``right_ts <= left_ts`` per key -- the standard "state at event time"
operator (config active when a turn happened, latest metric before a
query) that Spark has no native operator for.

Scale shape: NO range join and NO per-left-row candidate blowup.  Both
sides union into one stream and a single window partitioned by the key
carries the last-seen right payload forward
(``last(_rv, ignorenulls=True)`` over an unbounded-preceding frame):
exactly ONE shuffle on the key, cost O(n log n) in the partition sort --
the same shape at 100 TB, with AQE skew-split applying to hot keys.  A
broadcast-range or interval-bucket formulation would pay a candidate
multiplication this operator never does.

Determinism contract: equal-timestamp ties resolve as (1) a right row at
exactly ``left_ts`` IS visible (backward-inclusive, matching DuckDB's
``ASOF JOIN ON l.ts >= r.ts``); (2) multiple right rows sharing
(key, ts) resolve to the lexicographically greatest payload struct --
callers wanting engine-portable results should pre-dedupe equal-ts right
rows (see plans/queries.q_asof_state_lookup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, keys: list[str],
              left_ts: str = "ts", right_ts: str = "ts",
              value_cols: list[str] | None = None,
              prefix: str = "matched_",
              tolerance_ms: int | None = None) -> DataFrame:
    """Left as-of join.  Output: every left column, plus ``{prefix}ts``
    (the matched right timestamp, null when no right row precedes) and
    ``{prefix}{c}`` for each right value column.

    ``tolerance_ms``: a match older than ``left_ts - tolerance`` is
    discarded (nulled), the standard staleness bound.
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in set(keys) | {right_ts}]

    rv = F.struct(F.col(right_ts).alias("_mts"),
                  *[F.col(c) for c in value_cols])
    lv = F.struct(*[F.col(c) for c in left.columns])
    rv_type = right.select(rv.alias("x")).schema["x"].dataType
    lv_type = left.select(lv.alias("x")).schema["x"].dataType

    r = (right.filter(F.col(right_ts).isNotNull())
         .select(*keys, F.col(right_ts).alias("_ts"), rv.alias("_rv"),
                 F.lit(0).alias("_side"), F.lit(None).cast(lv_type).alias("_lv")))
    lft = left.select(*keys, F.col(left_ts).alias("_ts"),
                      F.lit(None).cast(rv_type).alias("_rv"),
                      F.lit(1).alias("_side"), lv.alias("_lv"))

    # right rows sort before left rows at the same timestamp (inclusive
    # semantics); equal-ts right rows resolve by struct order (see module
    # docstring).  NULL left timestamps sort first -> no match (null out).
    w = (Window.partitionBy(*keys)
         .orderBy(F.col("_ts").asc_nulls_first(), F.col("_side").asc(), F.col("_rv").asc())
         .rowsBetween(Window.unboundedPreceding, 0))
    matched = F.last("_rv", ignorenulls=True).over(w)

    out = (r.unionByName(lft)
           .withColumn("_m", matched)
           .filter(F.col("_side") == 1))
    if tolerance_ms is not None:
        fresh = (F.unix_millis(F.col("_m._mts"))
                 >= F.unix_millis(F.col("_ts")) - tolerance_ms)
        out = out.withColumn("_m", F.when(fresh, F.col("_m")))
    drop_null_ts_match = F.when(F.col("_ts").isNotNull(), F.col("_m"))
    out = out.withColumn("_m", drop_null_ts_match)
    return out.select(
        "_lv.*",
        F.col("_m._mts").alias(f"{prefix}ts"),
        *[F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in value_cols],
    )
