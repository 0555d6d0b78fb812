"""Small shared helpers."""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.storagelevel import StorageLevel

_OVERWRITE_MODE_KEY = "spark.sql.sources.partitionOverwriteMode"

# Registry of operator-internal caches (multi-consumer intermediates like
# shingle arrays and quantized corpus projections).  Operators return LAZY
# plans that still reference their caches, so they cannot unpersist
# eagerly; a long-lived caller materializes results and then calls
# unpersist_tracked() -- without it, repeated invocations would pile up
# cached RDDs and lean on LRU eviction (the r2 behavior ADVICE flagged).
_TRACKED_CACHES: list[DataFrame] = []


def track_persist(df: DataFrame,
                  level: StorageLevel = StorageLevel.MEMORY_AND_DISK) -> DataFrame:
    """persist() with a lifecycle: MEMORY_AND_DISK by default (an evicted
    hot block degrades to a disk read instead of a full subtree recompute)
    and registered for ``unpersist_tracked``."""
    out = df.persist(level)
    _TRACKED_CACHES.append(out)
    return out


def unpersist_tracked(blocking: bool = False) -> int:
    """Release every registered operator cache; returns how many were
    dropped.  Call after materializing query results (bench.py and
    tools/check_oracles.py do, per query)."""
    n = 0
    while _TRACKED_CACHES:
        df = _TRACKED_CACHES.pop()
        try:
            df.unpersist(blocking)
            n += 1
        except Exception:  # noqa: BLE001 - session may already be stopped
            pass
    return n


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
