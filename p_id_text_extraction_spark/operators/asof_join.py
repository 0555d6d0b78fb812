"""As-of (temporal) join: for every left row, the LATEST right row with
``right_ts <= left_ts`` per key -- the standard "state at event time"
operator (config active when a turn happened, latest metric before a
query) that Spark has no native operator for.

Scale shape: NO range join and NO per-left-row candidate blowup.  Both
sides union into one stream and a single window partitioned by the key
carries the last-seen right payload forward
(``last(_rv, ignorenulls=True)`` over an unbounded-preceding frame):
exactly ONE shuffle on the key, cost O(n log n) in the partition sort --
the same shape at 100 TB.  A broadcast-range or interval-bucket
formulation would pay a candidate multiplication this operator never
does.  Caveat: window functions get no AQE skew split, so ONE key's
entire history lands in one task -- for keys whose per-key volume is not
naturally bounded (the transcript domain's is conversation-bounded),
``hot_keys=True`` switches to a time-bucketed two-phase plan whose
per-task bound is (key, bucket)-sized; see ``asof_join``.

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
              tolerance_ms: int | None = None,
              hot_keys: bool = False,
              bucket_ms: int = 3_600_000) -> DataFrame:
    """Left as-of join.  Output: every left column, plus ``{prefix}ts``
    (the matched right timestamp, null when no right row precedes) and
    ``{prefix}{c}`` for each right value column.

    ``tolerance_ms``: a match older than ``left_ts - tolerance`` is
    discarded (nulled), the standard staleness bound.

    ``hot_keys``: the default single key-window puts an entire key in one
    task, and window functions get no AQE skew split -- a key with 10^9
    rows stalls the stage.  The opt-in hot-key path buckets time into
    ``bucket_ms`` ranges and runs TWO bounded passes: (1) the same
    last-seen window partitioned by (key, bucket) -- per-task work is one
    key's rows within one time bucket; (2) each bucket's final right
    state (an order-free max) flows through a per-key window over the
    TINY bucket-level frame (#buckets rows per key) and joins back
    co-partitioned on (key, bucket).  A row's match = its within-bucket
    match, else the latest previous bucket's carry.  Byte-identical to
    the default path (property-tested); same tie/NULL contract.
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
    union = r.unionByName(lft)

    # right rows sort before left rows at the same timestamp (inclusive
    # semantics); equal-ts right rows resolve by struct order (see module
    # docstring).  NULL left timestamps sort first -> no match (null out).
    order = [F.col("_ts").asc_nulls_first(), F.col("_side").asc(), F.col("_rv").asc()]

    if hot_keys:
        union = union.withColumn(
            "_b", F.floor(F.unix_millis("_ts") / F.lit(bucket_ms)))
        w1 = (Window.partitionBy(*keys, "_b").orderBy(*order)
              .rowsBetween(Window.unboundedPreceding, 0))
        within = union.withColumn("_within", F.last("_rv", ignorenulls=True).over(w1))
        # bucket finals: the last right row of a bucket is the max of
        # (_ts, _rv) over its right rows -- order-free aggregate, so the
        # groupBy gets map-side combine and no bucket ever concentrates
        finals = union.groupBy(*keys, "_b").agg(
            F.max(F.when(F.col("_side") == 0,
                         F.struct(F.col("_ts").alias("_fts"),
                                  F.col("_rv").alias("_frv")))).alias("_bf"))
        wb = (Window.partitionBy(*keys).orderBy(F.col("_b").asc_nulls_first())
              .rowsBetween(Window.unboundedPreceding, -1))
        carry = (finals
                 .withColumn("_carry", F.last("_bf", ignorenulls=True).over(wb))
                 .select(*keys, "_b", F.col("_carry._frv").alias("_cv")))
        out = (within.join(carry, [*keys, "_b"], "left")
               .withColumn("_m", F.coalesce(F.col("_within"), F.col("_cv")))
               .filter(F.col("_side") == 1))
    else:
        w = (Window.partitionBy(*keys).orderBy(*order)
             .rowsBetween(Window.unboundedPreceding, 0))
        out = (union
               .withColumn("_m", F.last("_rv", ignorenulls=True).over(w))
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
