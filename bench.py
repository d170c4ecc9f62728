"""Benchmark harness: runs every registered qid at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric", "value" (total sec), "unit", "queries": {qid:
sec}, "sf"}.

Execution is forced through the noop sink — full plan runs (scan ->
shuffle -> sink) with zero driver-collect cost, so timings measure the
engine, not py4j row transfer. First a warmup query JITs codegen paths.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from aprsdb_spark.registry import QUERIES, load_all
    from aprsdb_spark.session import get_spark

    load_all()
    # initial shuffle partitions sized to the local SF (AQE coalesces down,
    # but task-launch overhead of the initial number still costs ~30% at
    # sf0.1); a real cluster run sets 2-3x total executor cores instead.
    spark = get_spark("aprsdb_spark-bench", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: touch every table + codegen paths once
    from aprsdb_spark.tables import load

    t = load(spark, sf_dir)
    t.lineitem.groupBy("l_returnflag").count().write.format("noop").mode("overwrite").save()
    # warm the python UDF workers too — their ~3s daemon startup is a
    # per-session fixed cost, not a property of whichever UDF query
    # happens to run first
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    _ident = pandas_udf(lambda s: s, "long")
    t.region.select(_ident(F.col("r_regionkey"))).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for qid in sorted(QUERIES):
        fn = QUERIES[qid]
        start = time.perf_counter()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[qid] = round(time.perf_counter() - start, 3)
        except Exception as e:  # a failing query must not kill the bench
            timings[qid] = -1.0
            print(f"BENCH-ERROR {qid}: {e}", file=sys.stderr)

    total = round(sum(v for v in timings.values() if v >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
