"""Property-based tests (hypothesis) for the corpus-structure kernels:
generated corpora drive the frame-level cores and a plain-Python model
checks every answer. One Spark round-trip per property over a batch of
generated cases (the test_curation prefix-sum pattern — a per-example
session call would take minutes)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

# a tiny alphabet so cross-doc segment collisions actually happen
_TOK = st.sampled_from(["a", "b", "c"])
_DOC = st.lists(_TOK, min_size=1, max_size=30).map(lambda t: " ".join(t))


def _collect_cases(strategy, n):
    cases = []

    @settings(max_examples=n, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(strategy)
    def run(case):
        cases.append(case)

    run()
    return cases


def _model_line_dedup(texts, width=4, min_df=2):
    """Plain-Python RefinedWeb line dedup over one corpus."""
    segs = {}
    for i, t in enumerate(texts):
        toks = t.split(" ")
        segs[i] = [
            " ".join(toks[j * width : (j + 1) * width])
            for j in range((len(toks) + width - 1) // width)
        ]
    from collections import Counter

    df = Counter()
    for i, ss in segs.items():
        for s in set(ss):
            df[s] += 1
    out = {}
    for i, ss in segs.items():
        kept = [s for s in ss if df[s] < min_df]
        out[i] = (len(ss), len(ss) - len(kept), " ".join(kept))
    return out


def test_line_dedup_matches_python_model(spark):
    from aprsdb_spark.queries.corpus import line_dedup

    corpora = _collect_cases(st.lists(_DOC, min_size=1, max_size=8), 25)
    rows = [
        (ci * 1000 + i, text)
        for ci, corpus in enumerate(corpora)
        for i, text in enumerate(corpus)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # width=4 so short generated docs still produce multiple segments.
    # NOTE: doc_ids are offset per corpus but the vote runs over the
    # UNION of corpora — so the model must too.
    all_texts = [t for corpus in corpora for t in corpus]
    flat_model = _model_line_dedup(all_texts, width=4, min_df=2)
    flat_ids = [
        ci * 1000 + i
        for ci, corpus in enumerate(corpora)
        for i, _ in enumerate(corpus)
    ]
    expect = dict(zip(flat_ids, flat_model.values()))
    got = {
        r["doc_id"]: (r["n_segs"], r["n_dropped"], r["text_clean"])
        for r in line_dedup(df, width=4, min_df=2).collect()
    }
    assert got == expect


def test_chunking_matches_python_model(spark):
    from aprsdb_spark.queries.corpus import chunk_docs

    docs = _collect_cases(st.lists(_TOK, min_size=1, max_size=60), 40)
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in chunk_docs(df, size=7, stride=5).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["chunk_start"], r["n_chunk_tokens"], r["chunk_text"])
        )
    for i, toks in enumerate(docs):
        n = len(toks)
        expect = []
        for k in range((n + 4) // 5):
            s = k * 5
            ct = toks[s : s + 7]
            expect.append((k, s, len(ct), " ".join(ct)))
        assert sorted(got[i]) == expect, (i, toks)


def test_morton_interleave_is_bijective_and_matches_model(spark):
    from aprsdb_spark.queries.layout import _interleave_sql

    pairs = _collect_cases(
        st.tuples(st.integers(0, 255), st.integers(0, 255)), 60
    )
    pairs = sorted(set(pairs))
    df = spark.createDataFrame(pairs, "bx long, by long").select(
        "bx", "by", F.expr(_interleave_sql("bx", "by")).alias("z")
    )
    got = {(r["bx"], r["by"]): r["z"] for r in df.collect()}

    def model(bx, by):
        z = 0
        for i in range(8):
            z |= ((bx >> i) & 1) << (2 * i)
            z |= ((by >> i) & 1) << (2 * i + 1)
        return z

    assert got == {(bx, by): model(bx, by) for bx, by in pairs}
    assert len(set(got.values())) == len(pairs), "interleave not injective"
