"""Information-theoretic corpus stats + BM25 + PageRank: mathematical
invariants the oracle compare can't express (non-negativity, bounds,
probability-mass conservation, damping-factor fixpoint structure) and
the plan shapes behind the 100 TB story."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from aprsdb_spark.registry import QUERIES, load_all
from tests.conftest import SF_DIR

load_all()


def _df(spark, qid):
    return QUERIES[qid](spark, SF_DIR)


def _physical(spark, qid):
    return _df(spark, qid)._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------- semantics


def test_entropy_bounds(spark):
    """0 <= H <= ln(n_distinct) (max-entropy bound), and the normalized
    form sits in [0, 1]."""
    out = _df(spark, "j_entropy")
    # outputs round at 1e-6 (half-up), so the bound check gets 2e-6 slack
    bad = out.where(
        (F.col("entropy") < 0)
        | (F.col("entropy") > F.log(F.col("n_distinct")) + 2e-6)
        | (F.col("entropy_norm") < 0)
        | (F.col("entropy_norm") > 1.0 + 2e-6)
    ).count()
    assert bad == 0
    assert 0 < out.where("low_entropy").count() < out.count(), "flag degenerate"


def test_kl_nonnegative_and_complete(spark):
    """Gibbs' inequality: KL >= 0 for every source; every source of the
    corpus appears exactly once."""
    rows = _df(spark, "j_kl_sources").collect()
    assert len(rows) == 20 and len({r["source"] for r in rows}) == 20
    assert all(r["kl_div"] >= 0 for r in rows)


def test_pmi_collocations_beat_independence(spark):
    """Everything surfaced in the top-K must be a POSITIVE association
    (pmi > 0 — observed co-occurrence above the independence rate), and
    support holds the minimum."""
    rows = _df(spark, "j_pmi_bigrams").collect()
    assert len(rows) == 20
    assert all(r["pmi"] > 0 and r["n_pair"] >= 5 for r in rows)
    # descending order with the deterministic tie-break
    keys = [(-r["pmi"], r["bigram"]) for r in rows]
    assert keys == sorted(keys)


def test_bm25_scores_match_reference_formula(spark):
    """Recompute one returned document's score from raw counts with
    plain Python floats — the engine chain must agree to 1e-6."""
    top = _df(spark, "j_bm25_topk").collect()
    assert 0 < len(top) <= 10
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    texts = {r["doc_id"]: r["text"].split(" ") for r in docs.collect()}
    n = len(texts)
    avgdl = sum(len(v) for v in texts.values()) / n
    from aprsdb_spark.queries.infostats import _BM25_B, _BM25_K1, _BM25_QUERY

    df = {q: sum(1 for v in texts.values() if q in v) for q in _BM25_QUERY}
    doc = top[0]
    toks = texts[doc["doc_id"]]
    score = 0.0
    for q in _BM25_QUERY:
        tf = toks.count(q)
        if tf == 0:
            continue
        idf = math.log((n - df[q] + 0.5) / (df[q] + 0.5) + 1)
        score += idf * tf * (_BM25_K1 + 1) / (
            tf + _BM25_K1 * (1 - _BM25_B + _BM25_B * len(toks) / avgdl)
        )
    assert abs(score - doc["score"]) < 1e-5


def test_pagerank_conserves_teleport_mass(spark):
    """Ranks stay positive, every nation gets a rank, and total mass
    stays <= 1 (dangling nodes leak mass in the no-redistribution
    variant, so the sum can only fall below 1, never above)."""
    rows = _df(spark, "j_pagerank").collect()
    assert len(rows) == 25
    total = sum(r["pagerank"] for r in rows)
    assert 0.5 < total <= 1.0 + 1e-6, total
    assert all(r["pagerank"] >= 0.15 / 25 - 1e-9 for r in rows), "teleport floor"
    # the fan-out-capped graph must NOT be rank-uniform
    assert len({round(r["pagerank"], 9) for r in rows}) > 5


# --------------------------------------------------------------- plan shapes


def test_entropy_is_two_stacked_aggs(spark):
    """Entropy must stay explode → two hash aggs (doc,tok → doc): the
    ln(n) - Σc·ln(c)/n identity means NO join-back of totals — exactly
    two hashpartitioning exchanges, no join operator at all."""
    p = _physical(spark, "j_entropy")
    assert p.count("Exchange hashpartitioning") == 2, p
    assert "Join" not in p, "entropy grew a join — identity lost"


def test_bm25_prunes_corpus_through_broadcast_query(spark):
    """The literal query relation must broadcast into the posting probe
    and the top-K must be TakeOrderedAndProject."""
    p = _physical(spark, "j_bm25_topk")
    assert "TakeOrderedAndProject" in p
    assert "BroadcastHashJoin" in p


def test_pagerank_iterations_broadcast_ranks(spark):
    """Every iteration joins edges⋈ranks with the |V|-row rank table on
    the broadcast side — a sort-merge here would shuffle the edge list
    once per iteration."""
    p = _physical(spark, "j_pagerank")
    assert "SortMergeJoin" not in p, "rank table stopped broadcasting"
