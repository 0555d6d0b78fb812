"""Extra benchmarks (guide section 1.4): per-query noop-sink isolation.

NOT part of the frozen driver bench (bench.py) -- this harness exists for
in-round A/B measurement: it times individual QUERIES entries with the
noop sink inside one session, interleaved over several sweeps, and prints
one JSON line.  Run two repo versions alternately (PYTHONPATH switches the
package) to compare implementations inside one drift window.

Usage: python bench_extra.py [sweeps] [query ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from p_id_text_extraction_spark.plans.queries import QUERIES  # noqa: E402
from p_id_text_extraction_spark.session import get_spark  # noqa: E402
from p_id_text_extraction_spark.util import unpersist_tracked  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sweeps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    names = sys.argv[2:] or list(QUERIES)
    spark = get_spark(app="bench_extra", cores=cpus, shuffle_partitions=cpus)
    walls: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(sweeps):
        for name in names:
            fn = QUERIES[name]
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
            t0 = time.monotonic()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls[name].append(round(time.monotonic() - t0, 3))
            unpersist_tracked()
    print(json.dumps({
        n: {"min": round(min(w), 3), "median": round(statistics.median(w), 3),
            "walls": w} for n, w in walls.items()
    }))
    spark.stop()


if __name__ == "__main__":
    main()
