"""Iceberg table source/sink (production path; SURVEY.md S1/S6).

The north_rule input is an Iceberg table partitioned by
``bucket(16, conv_id)``; this sandbox has no Iceberg runtime jars, so every
function degrades to parquet with identical schema and semantics.  The
degradation is detected once per session and cached.

Production notes (the parts that matter at 10^12 turns):
  * reads prune on bucket(conv_id) + days(ts) partitions, plus column
    pruning and parquet row-group skipping -- Catalyst pushes our filters
    automatically because the pipeline is declarative;
  * the spans sink appends with ``writeTo(...).append()``; retried buckets
    use ``overwritePartitions()`` which is the Iceberg-native equivalent of
    the dynamic-partition-overwrite resume in plans/checkpoint.py;
  * the checkpoint manifest is a normal (small) Iceberg table -- its
    snapshot isolation is what makes concurrent resume attempts safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_HAS_ICEBERG: bool | None = None


def has_iceberg(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is on the classpath."""
    global _HAS_ICEBERG
    if _HAS_ICEBERG is None:
        try:
            spark._jvm.java.lang.Class.forName(
                "org.apache.iceberg.spark.source.IcebergSource"
            )
            _HAS_ICEBERG = True
        except Exception:  # noqa: BLE001 - Py4J wraps ClassNotFound opaquely
            _HAS_ICEBERG = False
    return _HAS_ICEBERG


def read_table(spark: SparkSession, table_or_path: str) -> DataFrame:
    """Read an Iceberg table by name, or parquet by path in the sandbox."""
    if has_iceberg(spark) and "/" not in table_or_path:
        return spark.read.format("iceberg").load(table_or_path)
    return spark.read.parquet(table_or_path)


def append_spans(df: DataFrame, table_or_path: str) -> None:
    """Append extracted spans (S6 sink)."""
    if has_iceberg(df.sparkSession) and "/" not in table_or_path:
        df.writeTo(table_or_path).append()
    else:
        df.write.mode("append").parquet(table_or_path)


def overwrite_span_partitions(df: DataFrame, table_or_path: str,
                              partition_cols: tuple[str, ...] = ("bucket_id",)) -> None:
    """Idempotent bucket-retry sink: Iceberg ``overwritePartitions()`` (the
    native equivalent of plans/checkpoint.py's dynamic partition overwrite)
    or the parquet dynamic-overwrite fallback in the sandbox.

    The fallback MUST partitionBy: dynamic overwrite is a no-op for
    unpartitioned writes, where mode('overwrite') truncates the whole
    directory -- the opposite of the per-partition semantics this sink
    promises."""
    if has_iceberg(df.sparkSession) and "/" not in table_or_path:
        df.writeTo(table_or_path).overwritePartitions()
    else:
        from p_id_text_extraction_spark.util import dynamic_partition_overwrite
        with dynamic_partition_overwrite(df.sparkSession):
            df.write.mode("overwrite").partitionBy(*partition_cols).parquet(table_or_path)
