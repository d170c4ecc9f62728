"""Semantics tests for the curation/analytics additions that the oracle
hash-match can't isolate: funnel stage ordering, the distributed prefix
sum vs a naive global window, and stratified-sample determinism."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F


def test_funnel_order_matters(spark):
    """An event BEFORE the previous stage's conversion time must not
    convert the next stage; at-or-after (>=) must."""
    from aprsdb_spark.queries.analytics import funnel_counts

    rows = [
        # u1: full ordered funnel
        (1, "signup", 10), (1, "view", 20), (1, "click", 30), (1, "purchase", 40),
        # u2: view BEFORE signup only -> stops after signup
        (2, "view", 5), (2, "signup", 10),
        # u3: view exactly AT signup time (>= counts), click never
        (3, "signup", 10), (3, "view", 10), (3, "purchase", 50),
        # u4: never signed up -> no stage at all
        (4, "view", 1), (4, "click", 2), (4, "purchase", 3),
    ]
    e = spark.createDataFrame(rows, "user_id long, event_type string, ts_ms long")
    got = funnel_counts(
        e,
        [("signup", "n_signup"), ("view", "n_view"),
         ("click", "n_click"), ("purchase", "n_purchase")],
    ).collect()[0]
    assert (got.n_signup, got.n_view, got.n_click, got.n_purchase) == (3, 2, 1, 1)


def test_distributed_prefix_sum_equals_global_window(spark):
    """Two-level prefix sum == single global-order window, including
    with id gaps, empty ranges, and a range boundary mid-run."""
    from aprsdb_spark.queries.curation import distributed_prefix_sum

    rows = [(i, (i * 37) % 11 + 1) for i in [0, 1, 2, 5, 255, 256, 257, 900, 1000, 1023, 1024]]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    fast = {
        r.doc_id: r.cum
        for r in distributed_prefix_sum(df, "doc_id", "n_tok", 256).collect()
    }
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    naive = {
        r.doc_id: r.cum
        for r in df.withColumn("cum", F.sum("n_tok").over(w)).collect()
    }
    assert fast == naive and len(fast) == len(rows)


def test_distributed_prefix_sum_property(spark):
    """Property form of the equivalence: arbitrary sparse id sets and
    values, tiny range size (8) so many range boundaries are exercised,
    must equal a plain python running sum. One Spark round-trip over a
    batch of generated cases (a per-example session call would take
    minutes); hypothesis still drives the case generation."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from aprsdb_spark.queries.curation import distributed_prefix_sum

    cases = []

    @settings(max_examples=30, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(
        st.dictionaries(
            st.integers(min_value=0, max_value=200),
            st.integers(min_value=0, max_value=1000),
            min_size=1,
            max_size=40,
        )
    )
    def collect(case):
        cases.append(sorted(case.items()))

    collect()
    rows = [
        (ci, doc_id, v) for ci, case in enumerate(cases) for doc_id, v in case
    ]
    df = spark.createDataFrame(rows, "case long, doc_id long, n_tok long")
    # run each case independently: offset ids by case * 1000 so ranges
    # never span cases, then subtract per-case base cum
    df = df.withColumn("gid", F.col("case") * 1000 + F.col("doc_id"))
    got = {
        (r.case, r.doc_id): r.cum
        for r in distributed_prefix_sum(
            df.select(F.col("gid").alias("doc_id"), "n_tok", "case",
                      F.col("doc_id").alias("orig")),
            "doc_id", "n_tok", 8,
        ).select("case", F.col("orig").alias("doc_id"), "cum").collect()
    }
    for ci, case in enumerate(cases):
        run = 0
        prev_cum = got[(ci - 1, cases[ci - 1][-1][0])] if ci else 0
        for doc_id, v in case:
            run += v
            assert got[(ci, doc_id)] == prev_cum + run, (ci, doc_id)


def test_stratified_sample_is_deterministic_and_stratified(spark, duck):
    """Same rows on repeated runs (pure function of doc_id), and the
    en-stratum keep-rate lands near its 30% target."""
    from aprsdb_spark.registry import QUERIES
    from tests.conftest import SF_DIR

    a = {r.doc_id for r in QUERIES["j_sample_stratified"](spark, SF_DIR).collect()}
    b = {r.doc_id for r in QUERIES["j_sample_stratified"](spark, SF_DIR).collect()}
    assert a == b
    n_en = duck.execute(
        f"SELECT COUNT(*) FROM read_parquet('{SF_DIR}/documents.parquet') WHERE lang='en'"
    ).fetchone()[0]
    kept_en = duck.execute(
        f"""SELECT COUNT(*) FROM read_parquet('{SF_DIR}/documents.parquet')
        WHERE lang='en' AND substr(md5('smp' || CAST(doc_id AS VARCHAR)), 1, 4) < '4ccc'"""
    ).fetchone()[0]
    assert 0.15 <= kept_en / n_en <= 0.45  # 30% target, binomial slack


def test_pointer_doubling_cc_matches_union_find(spark):
    """cluster_labels_doubling == union-find ground truth on random
    graphs, with rounds ~ log2(n) — including a 60-node PATH (diameter
    59), which plain propagation at the same round count cannot close.
    Cases batched into one Spark run via per-case id offsets."""
    import random

    from aprsdb_spark.queries.curation import cluster_labels_doubling

    random.seed(20260813)
    cases = []
    for ci in range(6):
        n = random.randint(8, 40)
        n_edges = random.randint(0, n)
        edges = [
            tuple(random.sample(range(n), 2)) for _ in range(n_edges)
        ]
        cases.append((n, edges))
    cases.append((60, [(i, i + 1) for i in range(59)]))  # the path

    OFF = 1000
    node_rows = [
        (ci * OFF + i,) for ci, (n, _) in enumerate(cases) for i in range(n)
    ]
    edge_rows = [
        (ci * OFF + a, ci * OFF + b)
        for ci, (_, es) in enumerate(cases)
        for a, b in es
    ]
    nodes = spark.createDataFrame(node_rows, "doc_id long")
    pairs = spark.createDataFrame(edge_rows or [(0, 0)], "id_a long, id_b long")
    got = {
        r.doc_id: r.label
        for r in cluster_labels_doubling(nodes, pairs, rounds=6).collect()
    }

    for ci, (n, es) in enumerate(cases):
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in es:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        comp_min = {}
        for i in range(n):
            r = find(i)
            comp_min[r] = min(comp_min.get(r, i), i)
        for i in range(n):
            assert got[ci * OFF + i] == ci * OFF + comp_min[find(i)], (ci, i)


def test_contamination_self_is_total(spark):
    """A benchmark document's own shingles are 100% contaminated by
    construction — sanity-check the ratio math by running the hit join
    on a doc copied into both sides."""
    from aprsdb_spark.operators.dedup import shingles_col

    docs = spark.createDataFrame(
        [(1, "a b c d e f", "bench"), (2, "a b c d e f", "cand"), (3, "x y z w v u", "cand")],
        "doc_id long, text string, source string",
    ).select("doc_id", "source", shingles_col("text").alias("sh"))
    bench = docs.where(F.col("source") == "bench").select(
        F.explode("sh").alias("term")
    ).distinct()
    cand = docs.where(F.col("source") == "cand")
    hits = (
        cand.select("doc_id", F.explode("sh").alias("term"))
        .join(F.broadcast(bench), "term")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n"))
    )
    got = {r.doc_id: r.n for r in hits.collect()}
    assert got == {2: 4}  # all 4 shingles of the copy, none of doc 3


def test_dsir_upweights_target_domain(spark):
    """The DSIR signal must do its job: documents FROM the target
    domain score higher mean log-importance than the rest of the
    corpus (they are what the target bigram model was fit on)."""
    from aprsdb_spark.queries.quality import _DSIR_TARGET, j_dsir_weights
    from aprsdb_spark.tables import load
    from tests.conftest import SF_DIR

    w = j_dsir_weights(spark, SF_DIR)
    docs = load(spark, SF_DIR).documents.select("doc_id", "source")
    j = w.join(docs, "doc_id")
    rows = j.groupBy(F.col("source") == _DSIR_TARGET).agg(
        F.avg("log_w").alias("m")
    ).collect()
    means = {r[0]: r.m for r in rows}
    assert means[True] > means[False], means


def test_shuffle_shards_is_a_permutation(spark):
    """Every document appears exactly once; per-shard positions are
    exactly 1..n_shard; the assignment is salt-deterministic (two
    builds collect identically)."""
    from aprsdb_spark.queries.curation import j_shuffle_shards
    from aprsdb_spark.tables import load
    from tests.conftest import SF_DIR

    out = j_shuffle_shards(spark, SF_DIR).collect()
    n_docs = load(spark, SF_DIR).documents.count()
    assert len(out) == n_docs
    assert len({r.doc_id for r in out}) == n_docs
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r.pos)
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), shard
    again = j_shuffle_shards(spark, SF_DIR).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
