"""Checkpoint manifest + idempotent anti-join resume (SURVEY.md J7).

The reference restarts at stage granularity (`--start-at`,
run_pipeline.py:336-341,368-387).  At 10^12-turn scale the unit of restart
is an input *bucket*: ``bucket_id = pmod(xxhash64(conv_id), n_buckets)``
(deterministic across runs -- xxhash64 is seed-stable).  A manifest table
records each completed (bucket_id, job_fingerprint) with lineage counters
(FIXTURES.md section 3); resume left-anti-joins the input against it and
re-processes only missing buckets.  Output is written with dynamic
partition overwrite keyed by bucket_id, so a bucket that died mid-write is
fully rewritten on retry -- idempotent by construction.

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
                    "classifier_drop_rate", "completed_ts"]


def job_fingerprint(cfg: ExtractConfig) -> str:
    """Config-derived identity: a manifest row only skips work for the
    exact same parameters (config singleton analogue, config_manager.py:9-109)."""
    import hashlib
    import json
    blob = json.dumps(asdict(cfg), sort_keys=True)
    return hashlib.md5(blob.encode()).hexdigest()[:16]


def with_bucket(turns: DataFrame, n_buckets: int) -> DataFrame:
    return turns.withColumn("bucket_id", F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).cast("int"))


def completed_buckets(spark: SparkSession, manifest_dir: str, fingerprint: str) -> DataFrame:
    """Bucket ids already done for this fingerprint; empty if no manifest yet."""
    if not os.path.isdir(manifest_dir) or not any(
        f.endswith(".parquet") for root, _d, files in os.walk(manifest_dir) for f in files
    ):
        return spark.createDataFrame([], "bucket_id int")
    m = spark.read.parquet(manifest_dir)
    return m.filter(F.col("job_fingerprint") == fingerprint).select("bucket_id").distinct()


def run_with_resume(
    spark: SparkSession,
    turns: DataFrame,
    output_dir: str,
    manifest_dir: str,
    cfg: ExtractConfig = DEFAULT_CONFIG,
    n_buckets: int = 16,
    bucket_filter: list[int] | None = None,
) -> dict:
    """Run the pipeline over not-yet-completed buckets; append manifest rows.

    ``bucket_filter`` (tests only) simulates a run killed after finishing a
    subset of buckets.  Returns the counter dict for the run.
    """
    fingerprint = job_fingerprint(cfg)
    bucketed = with_bucket(turns, n_buckets)

    done = completed_buckets(spark, manifest_dir, fingerprint)
    todo = bucketed.join(done, "bucket_id", "left_anti")    # J7: resume anti-join
    if bucket_filter is not None:
        todo = todo.filter(F.col("bucket_id").isin(bucket_filter))

    # re-derive the bucket on the output side: it is a deterministic
    # function of conv_id, no need to thread it through the pipeline
    from pyspark.sql import Observation
    obs = Observation("lineage")
    spans = extract_pipeline(todo.drop("bucket_id"), cfg, observation=obs).withColumn(
        "bucket_id", F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).cast("int")
    )

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    (spans
     .repartition("bucket_id")
     .sortWithinPartitions("conv_id", "turn_idx", "span_rank")
     .write.mode("overwrite")
     .partitionBy("bucket_id")
     .parquet(output_dir))

    # lineage counters per completed bucket (FIXTURES.md section 3); the
    # spans side reads back the just-written columnar files (metadata-cheap).
    # classifier_drop_rate (candidates dropped by suppress/merge vs
    # candidates detected -- the boxes-before/after ratio of
    # grouping_logic.py:978-983) comes from the observe() counters; it is a
    # run-level rate stamped on each bucket row of this run.
    try:
        m = dict(obs.get)
    except Exception:  # noqa: BLE001 - zero-task plans never emit the observed row
        m = {}
    candidates_in = int(m.get("candidates_in") or 0)
    spans_total = int(spark.read.parquet(output_dir).join(done, "bucket_id", "left_anti").count()) \
        if candidates_in else 0
    drop_rate = (candidates_in - spans_total) / candidates_in if candidates_in else 0.0

    turns_in = todo.groupBy("bucket_id").agg(F.count(F.lit(1)).alias("turns_in"))
    spans_out = (
        spark.read.parquet(output_dir)
        .join(done, "bucket_id", "left_anti")
        .groupBy("bucket_id").agg(F.count(F.lit(1)).alias("spans_out"))
    )
    manifest = (
        turns_in.join(spans_out, "bucket_id", "left")
        .select(
            "bucket_id",
            F.lit(fingerprint).alias("job_fingerprint"),
            "turns_in",
            F.coalesce("spans_out", F.lit(0)).alias("spans_out"),
            F.lit(drop_rate).alias("classifier_drop_rate"),
            F.current_timestamp().alias("completed_ts"),
        )
    )
    if bucket_filter is not None:
        manifest = manifest.filter(F.col("bucket_id").isin(bucket_filter))
    manifest.write.mode("append").parquet(manifest_dir)

    rows = manifest.count()
    return {"fingerprint": fingerprint, "buckets_completed": rows}
