"""Dump .explain("formatted") for named qids to a directory.

Usage:
    python scripts/dump_plans.py <outdir> <suffix> qid [qid ...]

Writes <outdir>/<qid>_<suffix>.txt for each qid. Used to produce the
plans/r16/<qid>_{before,after}.txt evidence files: run once from a
worktree pinned at the pre-optimization commit (suffix "before") and
once from HEAD (suffix "after").
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    qids = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from aprsdb_spark.registry import QUERIES, load_all
    from aprsdb_spark.session import get_spark

    load_all()
    spark = get_spark("aprsdb_spark-plans", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    for qid in qids:
        if qid not in QUERIES:
            print(f"SKIP unknown qid {qid}", file=sys.stderr)
            continue
        df = QUERIES[qid](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{qid}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        spark.catalog.clearCache()
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
