"""Small shared helpers."""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession

_OVERWRITE_MODE_KEY = "spark.sql.sources.partitionOverwriteMode"


@contextmanager
def dynamic_partition_overwrite(spark: SparkSession):
    """Temporarily switch partition overwrite to dynamic, restoring the
    caller's setting afterwards -- writers must not leak a session-global
    semantics change into unrelated jobs sharing the session."""
    try:
        prev = spark.conf.get(_OVERWRITE_MODE_KEY)
    except Exception:  # noqa: BLE001 - unset => engine default ("static")
        prev = None
    spark.conf.set(_OVERWRITE_MODE_KEY, "dynamic")
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(_OVERWRITE_MODE_KEY)
        else:
            spark.conf.set(_OVERWRITE_MODE_KEY, prev)


def delete_path(spark: SparkSession, path: str) -> None:
    """Delete a directory through the Hadoop FileSystem API, so the same
    code works for local paths AND file://, hdfs://, s3a:// URIs (a plain
    shutil.rmtree silently no-ops on anything with a scheme)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.delete(hpath, True)
