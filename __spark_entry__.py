"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship extraction pipeline on sf0.001;
`queries()` / `oracle_sql()` expose every implemented operator from
SURVEY.md section 2 plus the training-data ops (dedup / similarity /
text stats / multimodal plumbing).  Implementations live in
p_id_text_extraction_spark.plans.queries.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from p_id_text_extraction_spark.plans.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["extract_full"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twins.  Omitted ONLY for the two pandas-UDF
    extraction strategies (extract_full / extract_fused), whose byte-level
    equality is pinned by the golden tests instead; every other query --
    including the MinHash/SimHash/LSH sketches, via engine-portable
    md5-derived hashing -- is value-hash-checked."""
    return dict(ORACLES)
