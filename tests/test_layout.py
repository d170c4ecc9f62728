"""Data-layout operators (queries/layout.py): the invariants that make
manifests auditable (fingerprint determinism under repartitioning),
Z-order effective (locality: the prunable fraction must beat a 1-D
sort), and histograms equi-depth (bucket balance)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aprsdb_spark.registry import QUERIES, load_all
from tests.conftest import SF_DIR

load_all()


def _df(spark, qid):
    return QUERIES[qid](spark, SF_DIR)


def test_manifest_covers_corpus_and_is_stable(spark):
    out = _df(spark, "j_shard_manifest")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    agg = out.agg(
        F.sum("n_docs").alias("d"), F.count("*").alias("s"),
        F.min("min_doc").alias("lo"), F.max("max_doc").alias("hi"),
    ).collect()[0]
    n = docs.count()
    assert agg["d"] == n and agg["lo"] == 0 and agg["hi"] == n - 1
    assert agg["s"] <= 64
    # fingerprints are per-shard-unique (a collision would mean two
    # shards claim the same ordered id list — impossible for a partition)
    fps = [r["manifest_md5"] for r in out.collect()]
    assert len(fps) == len(set(fps))
    # determinism under a different input partitioning: same fingerprints
    again = {r["shard"]: r["manifest_md5"] for r in _df(spark, "j_shard_manifest").collect()}
    assert {r["shard"]: r["manifest_md5"] for r in out.collect()} == again


def test_zorder_files_are_local_and_prunable(spark):
    """Every row lands in exactly one file; the box query prunes most
    files (Z-locality: 64-cell Z ranges cover at most an 8x8 tile, so
    files far from the box are fully disjoint from it)."""
    out = _df(spark, "j_zorder_stats").collect()
    n_sup = spark.read.parquet(f"{SF_DIR}/supplier.parquet").count()
    assert sum(r["n_rows"] for r in out) == n_sup
    # envelopes are consistent
    assert all(
        r["min_bx"] <= r["max_bx"] and r["min_by"] <= r["max_by"] for r in out
    )
    # a 64-cell Z-range is an 8x8 tile: envelope width bounded by 8
    assert all(
        r["max_bx"] - r["min_bx"] <= 8 and r["max_by"] - r["min_by"] <= 8
        for r in out
    )
    pruned = sum(r["n_rows"] for r in out if r["prunable"])
    assert pruned > 0.5 * n_sup, "Z-order lost its skipping power"


def test_histogram_is_equi_depth(spark):
    """All 8 buckets exist, depths are balanced (equi-depth: within 2x
    of ideal even with boundary ties), envelopes tile without overlap,
    and the total count is the corpus."""
    rows = sorted(_df(spark, "j_histogram_equi").collect(), key=lambda r: r["bucket"])
    n = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert [r["bucket"] for r in rows] == list(range(8))
    assert sum(r["n_docs"] for r in rows) == n
    ideal = n / 8
    assert all(ideal / 2 <= r["n_docs"] <= ideal * 2 for r in rows)
    # strict-greater boundary assignment makes envelopes disjoint
    for a, b in zip(rows, rows[1:]):
        assert a["hi"] < b["lo"], (a, b)


def test_zorder_is_one_agg_no_join(spark):
    """The whole Z computation is scan-side integer math + ONE hash agg
    on file_id — no join, exactly one exchange."""
    p = _df(spark, "j_zorder_stats")._jdf.queryExecution().executedPlan().toString()
    assert p.count("Exchange hashpartitioning") == 1, p
    assert "Join" not in p, p
