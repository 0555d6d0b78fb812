"""Checkpoint manifest + idempotent anti-join resume (SURVEY.md J7).

The reference restarts at stage granularity (`--start-at`,
run_pipeline.py:336-341,368-387).  At 10^12-turn scale the unit of restart
is an input *bucket*: ``bucket_id = pmod(xxhash64(conv_id), n_buckets)``
(deterministic across runs -- xxhash64 is seed-stable).  A manifest table
records each completed (bucket_id, job_fingerprint) with lineage counters
(FIXTURES.md section 3); resume left-anti-joins the input against it and
re-processes only missing buckets.

Idempotence and isolation rules:
  * the fingerprint covers config AND n_buckets -- a manifest row can never
    satisfy a numerically-equal bucket id from a different bucketing;
  * output is partitioned by (job_fingerprint, bucket_id), so runs with
    different configs never share partition directories and a config change
    can never surface another config's stale rows;
  * every todo bucket's partition directory is explicitly cleared before
    the write -- a bucket that died mid-write is fully rewritten on retry,
    and a todo bucket that yields ZERO spans still ends up empty instead of
    retaining rows from an aborted earlier attempt;
  * counters come from the in-plan DataFrame (observe + a groupBy on the
    cached spans), never from re-reading the output directory -- at 100 TB
    a read-back is two extra full passes over everything ever written.

Production target is two Iceberg tables; the sandbox has no Iceberg jars,
so both land as partitioned parquet with identical semantics.
"""

from __future__ import annotations

import os
from dataclasses import asdict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from p_id_text_extraction_spark.config import DEFAULT_CONFIG, ExtractConfig
from p_id_text_extraction_spark.plans.pipeline import extract_pipeline

MANIFEST_COLUMNS = ["bucket_id", "job_fingerprint", "turns_in", "spans_out",
                    "classifier_drop_rate", "task_rows_max",
                    "task_rows_median", "input_probe", "completed_ts"]

MANIFEST_SCHEMA = ("bucket_id int, job_fingerprint string, turns_in long, "
                   "spans_out long, classifier_drop_rate double, "
                   "task_rows_max long, task_rows_median long, "
                   "input_probe string, completed_ts timestamp")

# input_probe values: an audit trail for zero-turn buckets.  'counted'
# means the bucket's rows were observed directly; 'hash_empty_verified'
# means the bucket saw zero rows but THIS run positively observed input
# elsewhere (the global probe) -- so a later audit can distinguish a
# legitimately hash-empty bucket from one recorded complete while an
# eventually-consistent listing was hiding its files.
PROBE_COUNTED = "counted"
PROBE_HASH_EMPTY = "hash_empty_verified"


def job_fingerprint(cfg: ExtractConfig, n_buckets: int,
                    bucket_fn: str = "xxhash") -> str:
    """Run-identity hash: a manifest row only skips work for the exact same
    parameters (config singleton analogue, config_manager.py:9-109).
    ``n_buckets`` is part of the identity -- bucket id 3 of a 16-bucketing
    and bucket id 3 of a 256-bucketing cover different conversations.
    ``bucket_fn`` likewise: xxhash and iceberg-murmur3 bucketings assign
    the same id to different conversation sets (folded into the blob only
    when non-default, so historical fingerprints stay valid)."""
    import hashlib
    import json
    d = {**asdict(cfg), "n_buckets": n_buckets}
    if bucket_fn != "xxhash":
        d["bucket_fn"] = bucket_fn
    blob = json.dumps(d, sort_keys=True)
    return hashlib.md5(blob.encode()).hexdigest()[:16]


def with_bucket(turns: DataFrame, n_buckets: int,
                bucket_fn: str = "xxhash") -> DataFrame:
    """Deterministic restart bucket.  'xxhash' (default): JVM-side
    pmod(xxhash64(conv_id), n) -- the cheap codegen path.  'iceberg': the
    spec's bucket[n](conv_id) murmur3 (Arrow-batched kernel), so the
    restart unit IS the spans table's hidden bucket partition and a
    retried bucket maps to exactly one overwritten partition."""
    if bucket_fn == "iceberg":
        from p_id_text_extraction_spark.sources.iceberg_format import (
            bucket_transform_col,
        )
        return turns.withColumn(
            "bucket_id", bucket_transform_col("conv_id", n_buckets, "string"))
    return turns.withColumn("bucket_id", F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).cast("int"))


def completed_buckets(spark: SparkSession, manifest_dir: str, fingerprint: str) -> DataFrame:
    """Bucket ids already done for this fingerprint; empty if no manifest yet."""
    if not os.path.isdir(manifest_dir) or not any(
        f.endswith(".parquet") for root, _d, files in os.walk(manifest_dir) for f in files
    ):
        return spark.createDataFrame([], "bucket_id int")
    m = spark.read.parquet(manifest_dir)
    return m.filter(F.col("job_fingerprint") == fingerprint).select("bucket_id").distinct()


def _clear_todo_partitions(spark: SparkSession, output_dir: str,
                           fingerprint: str, todo_ids: list[int]) -> None:
    """Remove the partition dirs this run is about to (re)write.  Covers the
    two dynamic-overwrite blind spots: a bucket that died mid-write, and a
    todo bucket that produces zero spans this time (dynamic overwrite would
    rewrite nothing, silently keeping an aborted attempt's rows).  Deletion
    goes through the Hadoop FileSystem API so file:// / hdfs:// / s3a://
    output paths are handled, not just bare local paths."""
    from p_id_text_extraction_spark.util import delete_path
    base = f"{output_dir.rstrip('/')}/job_fingerprint={fingerprint}"
    for b in todo_ids:
        delete_path(spark, f"{base}/bucket_id={b}")


def run_with_resume(
    spark: SparkSession,
    turns: DataFrame,
    output_dir: str,
    manifest_dir: str,
    cfg: ExtractConfig = DEFAULT_CONFIG,
    n_buckets: int = 16,
    bucket_filter: list[int] | None = None,
    write_partitions: int | None = None,
    strategy: str = "relational",
    catalog: str = "parquet",
    spans_layout: str = "identity",
) -> dict:
    """Run the pipeline over not-yet-completed buckets; append manifest rows.

    ``bucket_filter`` (tests only) simulates a run killed after finishing a
    subset of buckets.  ``write_partitions`` sizes the final shuffle before
    the write (default: session shuffle partitions) -- the write fans out
    over (bucket_id, conv_id), NOT just bucket_id, so output parallelism
    tracks the cluster instead of collapsing to n_buckets tasks.

    ``strategy``: 'relational' (default -- the declarative window/aggregate
    plan, with observe()-based candidate lineage) or 'fused' (the map-only
    kernel: fastest and shuffle-free, but candidate counts never
    materialize, so classifier_drop_rate is recorded as NaN).
    Both strategies produce byte-identical spans (tests/test_resume.py).

    ``catalog``: 'parquet' (partitioned parquet + explicit todo-partition
    clears) or 'iceberg' (both sinks are Iceberg tables via
    sources/iceberg.py -- spans retried buckets land as an atomic
    overwrite-partitions snapshot, so no pre-clear is needed, and the
    manifest append is a snapshot commit with isolation).

    ``spans_layout`` (iceberg only): 'identity' (default -- explicit
    bucket_id column, identity-partitioned) or 'bucket' (the north_rule's
    natural layout: spans partitioned by the SPEC's hidden
    ``bucket(conv_id, n_buckets)`` transform, no bucket_id data column;
    the restart bucketing switches to the same murmur3 function so one
    todo bucket == one overwritten table partition, and downstream
    per-conversation scans prune by bucket without any column).

    Returns the counter dict for the run.
    """
    if strategy not in ("relational", "fused"):
        raise ValueError(f"unknown strategy {strategy!r}: use 'relational' or 'fused'")
    if catalog not in ("parquet", "iceberg"):
        raise ValueError(f"unknown catalog {catalog!r}: use 'parquet' or 'iceberg'")
    if spans_layout not in ("identity", "bucket"):
        raise ValueError(f"unknown spans_layout {spans_layout!r}: use 'identity' or 'bucket'")
    if spans_layout == "bucket" and catalog != "iceberg":
        raise ValueError("spans_layout='bucket' requires catalog='iceberg' "
                         "(hidden partition transforms are an Iceberg concept)")
    bucket_fn = "iceberg" if spans_layout == "bucket" else "xxhash"
    fingerprint = job_fingerprint(cfg, n_buckets, bucket_fn)
    bucketed = with_bucket(turns, n_buckets, bucket_fn)

    if catalog == "iceberg":
        from p_id_text_extraction_spark.sources import iceberg as ice
        from p_id_text_extraction_spark.sources.iceberg_format import table_exists
        if table_exists(manifest_dir):
            done = (ice.read_table(spark, manifest_dir)
                    .filter(F.col("job_fingerprint") == fingerprint)
                    .select("bucket_id").distinct())
        else:
            done = spark.createDataFrame([], "bucket_id int")
    else:
        done = completed_buckets(spark, manifest_dir, fingerprint)
    done_ids = {r.bucket_id for r in done.collect()}           # <= n_buckets rows
    todo = bucketed.join(done, "bucket_id", "left_anti")       # J7: resume anti-join
    if bucket_filter is not None:
        todo = todo.filter(F.col("bucket_id").isin(bucket_filter))
    todo_ids = [b for b in range(n_buckets)
                if b not in done_ids and (bucket_filter is None or b in bucket_filter)]

    # re-derive the bucket on the output side: it is a deterministic
    # function of conv_id, no need to thread it through the pipeline
    from pyspark.sql import Observation
    if strategy == "fused":
        from p_id_text_extraction_spark.plans.pipeline import extract_pipeline_fused
        obs = None
        base = extract_pipeline_fused(todo.drop("bucket_id"), cfg)
    else:
        obs = Observation("lineage")
        base = extract_pipeline(todo.drop("bucket_id"), cfg, observation=obs)
    n_write = write_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    spans = (
        with_bucket(base, n_buckets, bucket_fn)
        .withColumn("job_fingerprint", F.lit(fingerprint))
        .repartition(n_write, "bucket_id", "conv_id")
        .sortWithinPartitions("conv_id", "turn_idx", "span_rank")
        .persist()
    )
    from p_id_text_extraction_spark.util import dynamic_partition_overwrite
    try:
        if catalog == "iceberg":
            # one atomic overwrite-partitions snapshot: replaced partitions
            # are EXPLICIT (the todo set), so a bucket retried to zero
            # spans still drops its old files -- no pre-clear step, and a
            # reader never observes a half-written state.  A fully-resumed
            # run (no todo buckets) commits nothing: no empty snapshots.
            if spans_layout == "bucket":
                # hidden partitioning: no bucket_id data column -- the
                # table's bucket(conv_id, n) transform IS the bucketing,
                # and the restart bucket ids align by construction (same
                # murmur3 function on both sides)
                spans_w = spans.drop("bucket_id")
                ice.ensure_table(spark, output_dir, spans_w.schema,
                                 ("job_fingerprint",
                                  f"bucket(conv_id, {n_buckets})"))
                if todo_ids:
                    ice.overwrite_span_partitions(
                        spans_w, output_dir,
                        replaced=[{"job_fingerprint": fingerprint,
                                   "conv_id_bucket": b} for b in todo_ids])
            else:
                ice.ensure_table(spark, output_dir, spans.schema,
                                 ("job_fingerprint", "bucket_id"))
                if todo_ids:
                    ice.overwrite_span_partitions(
                        spans, output_dir,
                        replaced=[{"job_fingerprint": fingerprint, "bucket_id": b}
                                  for b in todo_ids])
        else:
            _clear_todo_partitions(spark, output_dir, fingerprint, todo_ids)
            with dynamic_partition_overwrite(spark):
                (spans.write.mode("overwrite")
                 .partitionBy("job_fingerprint", "bucket_id")
                 .parquet(output_dir))

        # lineage counters per completed bucket (FIXTURES.md section 3), all
        # from THIS run's plan: observe() rode the candidate scan, and the
        # per-bucket span counts aggregate the cached spans -- no read-back.
        # classifier_drop_rate (candidates dropped by suppress/merge vs
        # candidates detected -- the boxes-before/after ratio of
        # grouping_logic.py:978-983) is a run-level rate stamped on each
        # bucket row of this run.
        per_bucket = {r.bucket_id: r.cnt
                      for r in spans.groupBy("bucket_id").agg(F.count(F.lit(1)).alias("cnt")).collect()}
        # WRITE-STAGE SKEW COUNTERS: rows per task of the cached spans'
        # (bucket_id, conv_id) partitioning -- the production measurement
        # of the skew story (a hot conversation concentrates its spans in
        # one task).  One pass over the cache, <= n_write tiny rows back.
        import statistics
        pp = [r.cnt for r in spans.groupBy(
            F.spark_partition_id().alias("pid"))
            .agg(F.count(F.lit(1)).alias("cnt")).collect()]
        task_rows_max = max(pp) if pp else 0
        task_rows_median = int(statistics.median(pp)) if pp else 0
    finally:
        spans.unpersist()
    try:
        m = dict(obs.get) if obs is not None else {}
    except Exception:  # noqa: BLE001 - zero-task plans never emit the observed row
        m = {}
    candidates_in = int(m.get("candidates_in") or 0)
    spans_total = sum(per_bucket.values())
    if obs is None:
        drop_rate = float("nan")   # fused kernel never materializes candidates
    else:
        drop_rate = (candidates_in - spans_total) / candidates_in if candidates_in else 0.0

    turns_in = {r.bucket_id: r.cnt
                for r in todo.groupBy("bucket_id").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    from datetime import datetime, timezone
    now = datetime.now(timezone.utc)
    # every todo bucket this run COVERED gets a manifest row -- including
    # buckets the hash left empty (turns_in 0), otherwise sparse buckets
    # are re-cleared and re-scanned on every resume forever.  The only
    # skip: an INPUT with zero rows overall -- marking all buckets
    # complete off a misconfigured (empty) input path would poison later
    # resumes.  (turns_in empty but input non-empty = a resume whose
    # remaining todo buckets are all legitimately hash-empty: record them,
    # or the run livelocks re-clearing them forever.)
    if turns_in:
        record = True
    elif todo_ids:
        record = bool(turns.limit(1).count())
    else:
        record = False
    manifest_rows = [
        (b, fingerprint, int(turns_in.get(b, 0)), int(per_bucket.get(b, 0)), float(drop_rate),
         int(task_rows_max), int(task_rows_median),
         PROBE_COUNTED if turns_in.get(b, 0) else PROBE_HASH_EMPTY, now)
        for b in sorted(todo_ids)
    ] if record else []
    if manifest_rows:
        mdf = spark.createDataFrame(manifest_rows, MANIFEST_SCHEMA)
        if catalog == "iceberg":
            ice.ensure_table(spark, manifest_dir, mdf.schema)
            ice.append_spans(mdf, manifest_dir)   # snapshot-isolated append
        else:
            mdf.write.mode("append").parquet(manifest_dir)

    return {"fingerprint": fingerprint, "buckets_completed": len(manifest_rows),
            "task_rows_max": int(task_rows_max),
            "task_rows_median": int(task_rows_median)}
