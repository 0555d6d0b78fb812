"""Bucketed-table sink/scan: co-located joins without a shuffle.

The north_rule input is an Iceberg table partitioned by
``bucket(16, conv_id)``; this module is the Spark-native equivalent for
managed tables: ``bucketBy(n, conv_id)`` + ``sortBy`` at write time records
the hash-partitioning in the catalog, so ANY later equi-join or aggregate
on conv_id between tables bucketed the same way is planned WITHOUT an
exchange -- at 100 TB that turns the spans-joins-transcripts pattern
(enrichment, span/turn audits, incremental reprocessing diffs) from a
full-shuffle join into a zip of co-located buckets.

Sandbox notes: Spark's bucketing needs ``saveAsTable`` (a catalog), not a
bare parquet path; the session here uses the default in-memory catalog +
spark-warehouse directory, which is exactly how the physical plan behaves
on a production metastore.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, n_buckets: int = 16,
                   bucket_col: str = "conv_id", sort_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
                   mode: str = "overwrite") -> None:
    """Persist ``df`` as a managed table bucketed by ``bucket_col``.

    Both sides of a future join must use the SAME n_buckets and bucket
    column for the exchange-free plan, and the join/aggregate keys must
    EQUAL the bucket column -- Spark's planner disables the bucketed scan
    when the equi-join keys are a superset (e.g. joining on
    (conv_id, turn_idx) over conv_id-bucketed tables still shuffles; join
    on conv_id alone, or bucket by the compound key).  sortBy additionally
    pre-sorts each bucket file so sort-merge joins skip their sort."""
    (df.write.mode(mode)
     .bucketBy(n_buckets, bucket_col)
     .sortBy(*sort_cols)
     .format("parquet")
     .saveAsTable(table))


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog scan: the bucketing spec rides along in the plan."""
    return spark.table(table)
