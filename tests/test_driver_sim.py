"""Driver-conditions simulation: run ALL registered qids exactly the way
the correctness driver does, in a subprocess that is deliberately NOT our
test harness —

  * cwd is a temp dir, not the repo (workers can't rely on cwd imports;
    the known failure mode is ModuleNotFoundError in pandas-UDF workers,
    mitigated by session._ship_package via the registry tune() wrapper),
  * the SparkSession is a VANILLA builder (none of aprsdb_spark.session's
    confs — each query must self-apply UTC/nanosAsLong through tune()),
  * results go through the driver's pandas canonicalization
    (toPandas -> sort_values over every column), the exact step that
    crashed round 1 on array-typed cells with
    `TypeError: unhashable type: 'numpy.ndarray'`.

This is the pre-flight for CORRECTNESS_r{N}.json: if this passes, the
driver reaches every qid.
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

_SCRIPT = r"""
import json, sys
sys.path.insert(0, {repo!r})

from pyspark.sql import SparkSession

# Vanilla session: ONLY what the driver is known to set (a master), none
# of aprsdb_spark.session's confs — tune() inside each registered query
# must supply those.
spark = (
    SparkSession.builder.master("local[8]")
    .appName("driver-sim")
    .config("spark.sql.shuffle.partitions", "8")
    .getOrCreate()
)

import __spark_entry__ as entry_mod

failures = {{}}

def canon(df):
    # The driver's canonicalization: pandas sort_values over all columns
    # (column order normalized first). Crashes on non-scalar cells.
    pdf = df.toPandas()
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    if cols:
        pdf = pdf.sort_values(by=cols)
    return len(pdf)

try:
    n = len(entry_mod.entry(spark).collect())
    assert n >= 0
except Exception as e:
    failures["__entry__"] = repr(e)

qs = entry_mod.queries()
for qid, fn in qs.items():
    try:
        canon(fn(spark, {sf_dir!r}))
    except Exception as e:
        failures[qid] = repr(e)[:500]

print("DRIVER_SIM_RESULT " + json.dumps({{"total": len(qs), "failures": failures}}))
sys.exit(1 if failures else 0)
"""


def test_all_qids_under_driver_conditions(tmp_path):
    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
    script = tmp_path / "driver_sim.py"
    script.write_text(_SCRIPT.format(repo=str(REPO), sf_dir=sf_dir))
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the driver does not export the repo path
    proc = subprocess.run(
        [sys.executable, str(script)],
        cwd=tmp_path,
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    marker = [ln for ln in proc.stdout.splitlines() if ln.startswith("DRIVER_SIM_RESULT ")]
    assert marker, f"simulation produced no result line\nstdout:{proc.stdout[-2000:]}\nstderr:{proc.stderr[-2000:]}"
    import json

    result = json.loads(marker[-1].removeprefix("DRIVER_SIM_RESULT "))
    assert result["total"] >= 96, f"registry shrank: {result['total']} qids"
    assert not result["failures"], f"qids failing under driver conditions: {result['failures']}"
