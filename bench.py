"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line {"metric", "value", "unit", "queries", "sf", ...}.

The headline metric is total wall time over the query set; per-query times
let the judge compare against BASELINE.md. Each query is fully materialized
(count + a cheap checksum via collect of an aggregate) to force execution.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run() -> dict:
    from hebrew_ner_spark.queries import QUERIES
    from hebrew_ner_spark.session import get_spark

    spark = get_spark("bench")
    # Warm the JVM + parquet footers once so per-query times measure the plan.
    for t in ("documents", "lineitem", "orders", "embeddings", "events"):
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            spark.read.parquet(p).count()

    times: dict[str, float] = {}
    for name, fn in QUERIES.items():
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        n = df.count()
        times[name] = round(time.perf_counter() - t0, 4)
        assert n >= 0

    total = round(sum(times.values()), 4)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "total_query_wall_time",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8)),
    }
    spark.stop()
    return result


if __name__ == "__main__":
    print(json.dumps(run()))
