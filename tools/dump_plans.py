"""Dump .explain('formatted') for queries to plans/r06/<query>_<tag>.txt.

Usage: python tools/dump_plans.py <tag> [query ...]
Default query set: every QUERIES entry.  The judge checks plan claims in
OPTIMIZATION_r06.md against these files.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from p_id_text_extraction_spark.plans.queries import QUERIES
from p_id_text_extraction_spark.session import get_spark
from p_id_text_extraction_spark.util import unpersist_tracked

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "plans", "r06")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or list(QUERIES)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark(app=f"plans_{tag}", cores=8, shuffle_partitions=8,
                      extra={"spark.driver.memory": "6g"})
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(OUT_DIR, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        unpersist_tracked()
        print(f"wrote {name}_{tag}.txt ({plan.count('Exchange')} Exchange)")
    spark.stop()


if __name__ == "__main__":
    main()
