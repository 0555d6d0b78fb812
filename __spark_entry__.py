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
    """DuckDB-runnable ANSI-SQL twins -- one per query, INCLUDING the two
    pandas-UDF extraction strategies: _EXTRACT_FULL_SQL mirrors every
    pipeline stage (parse for ALL FOUR payload classes -- plain/markdown
    identity, tool_json unwrap, html block pipeline -- then segment ->
    line-feature detect -> suppress -> cluster -> merge -> crop ->
    normalize -> coord -> rank; tests/test_documents_equality.py fuzzes
    the parse stage on 1000 generated payloads and proves the full twin
    on an adversarial multi-line/html/json corpus).  The sketch queries
    (MinHash/SimHash/LSH) twin via engine-portable md5-derived hashing."""
    return dict(ORACLES)
