"""§2.J additions (r6 continuation, batch 2) — information-theoretic
corpus statistics and sparse lexical similarity, the measurement side
of a training-data pipeline (the dedup/quality families act; these
quantify):

- per-document Shannon entropy (the informativeness signal: gibberish
  and template text sit at the entropy extremes),
- per-source KL divergence from the corpus unigram distribution
  (domain-shift detection for mixture design),
- PMI collocations (the word2vec/GloVe-era phrase-mining statistic),
- BM25 ranked retrieval (Robertson & Spärck Jones probabilistic
  weighting, Lucene idf form) over an inverted-index join — the
  LEXICAL retrieval twin of the dense-embedding j_sim_topk.

Float discipline: every statistic ends in an order-dependent sum
(entropy, KL, norms, dot products), so outputs round through the
portable floor form at 1e-6 on both engines; thresholds compare the
ROUNDED value (the j_semdedup rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import rnd, sql_rnd
from ..operators.dedup import tokens_col
from ..registry import query
from ..tables import load, spread
from .quality import ngrams_col

# Entropy: normalized entropy below this flags template/repetitive text.
# (Fixture calibration: the 31-token vocabulary keeps every doc's
# normalized entropy in [0.92, 1.0]; 0.95 splits the corpus ~1/3 : 2/3.)
_LOW_ENTROPY = 0.95

# PMI: collocation candidates need support; top-K by (pmi, bigram).
_PMI_MIN = 5
_PMI_K = 20

# BM25: standard Robertson parameters; a fixed literal query (all terms
# are in the fixture vocabulary); top-K by (score desc, doc_id asc).
_BM25_K1, _BM25_B = 1.2, 0.75
_BM25_QUERY = ("spark", "merge", "window", "sort", "hash")
_BM25_TOPK = 10

# Hoisted out of the j_pmi_bigrams oracle f-string (nested triple quotes
# are a 3.12-only f-string feature).
_PMI_EXPR = (
    "ln((bc.n_pair * 1.0 / tb.tb)"
    " / ((a.cu * 1.0 / tu.tu) * (b.cu * 1.0 / tu.tu)))"
)


@query(
    "j_entropy",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                 FROM documents),
    tc AS (SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY doc_id, tok),
    agg AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
                   CAST(COUNT(*) AS BIGINT) AS n_distinct,
                   SUM(c * ln(c)) AS s
            FROM tc GROUP BY doc_id),
    ent AS (SELECT doc_id, n_tokens, n_distinct,
                   ln(n_tokens) - s / n_tokens AS h
            FROM agg)
    SELECT doc_id, n_tokens, n_distinct,
           {sql_rnd('h', 6)} AS entropy,
           CASE WHEN n_distinct > 1
                THEN {sql_rnd('h / ln(n_distinct)', 6)} ELSE 0.0 END AS entropy_norm,
           CASE WHEN n_distinct > 1
                THEN {sql_rnd('h / ln(n_distinct)', 6)} < {_LOW_ENTROPY}
                ELSE TRUE END AS low_entropy
    FROM ent
    """,
)
def j_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon entropy of the token distribution, plus the
    [0,1]-normalized form (H / ln(n_distinct)) and a low-entropy flag —
    the informativeness filter that catches keyword-stuffed and
    template documents that length/stopword heuristics miss.

    One explode and TWO stacked hash aggs, both keyed on doc_id: the
    identity H = ln(n) - (Σ c·ln c)/n turns entropy into plain
    aggregates of the per-(doc,token) counts — no per-token probability
    join-back, no second pass over the corpus. Both aggs partial-
    aggregate map-side; the shuffle carries (doc_id, token) count rows,
    never text. The threshold compares the ROUNDED normalized entropy
    so the flag is engine-stable."""
    t = load(spark, sf_dir)
    tc = (
        t.documents.select("doc_id", F.explode(tokens_col("text")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
    )
    agg = tc.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_distinct"),
        F.sum(F.col("c") * F.log("c")).alias("s"),
    )
    h = F.log("n_tokens") - F.col("s") / F.col("n_tokens")
    hn = rnd(h / F.log("n_distinct"), 6)
    return agg.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        rnd(h, 6).alias("entropy"),
        F.when(F.col("n_distinct") > 1, hn).otherwise(0.0).alias("entropy_norm"),
        F.when(F.col("n_distinct") > 1, hn < _LOW_ENTROPY)
        .otherwise(F.lit(True))
        .alias("low_entropy"),
    )


@query(
    "j_kl_sources",
    oracle=f"""
    WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS tok
                 FROM documents),
    sc AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
           FROM tok GROUP BY source, tok),
    st AS (SELECT source, CAST(SUM(c) AS BIGINT) AS nt FROM sc GROUP BY source),
    cc AS (SELECT tok, CAST(SUM(c) AS BIGINT) AS cc FROM sc GROUP BY tok),
    ct AS (SELECT CAST(SUM(cc) AS BIGINT) AS n FROM cc),
    term AS (SELECT sc.source,
                    (sc.c * 1.0 / st.nt)
                        * ln((sc.c * 1.0 / st.nt) / (cc.cc * 1.0 / ct.n)) AS kl_t
             FROM sc JOIN st USING (source) JOIN cc USING (tok) CROSS JOIN ct),
    red AS (SELECT source, {sql_rnd('SUM(kl_t)', 6)} AS kl_div
            FROM term GROUP BY source),
    terms AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_terms
              FROM sc GROUP BY source)
    SELECT st.source, st.nt AS n_tokens, terms.n_terms, red.kl_div
    FROM st JOIN terms USING (source) JOIN red USING (source)
    """,
)
def j_kl_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source KL divergence from the corpus unigram distribution —
    KL(P_source ‖ P_corpus) — the domain-shift statistic that tells a
    mixture designer which sources are redundant with the corpus body
    and which carry novel distribution mass (the measurement behind
    j_domain_mix / j_mix_temperature reweighting).

    P_source ⊆ P_corpus by construction (every source term is a corpus
    term), so no smoothing is needed and KL is finite and exact. Plan:
    one (source, token) hash agg, then the corpus vocabulary — tiny by
    Heaps' law relative to the corpus — BROADCASTS back onto the
    per-source term rows; the per-source reduction is a second hash agg
    on source. The corpus total is a 1-row broadcast. No shuffle ever
    carries more than (source, token) count rows."""
    t = load(spark, sf_dir)
    sc = (
        t.documents.select("source", F.explode(tokens_col("text")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count("*").cast("long").alias("c"))
    )
    sc.persist()  # 3 consumers: source totals, corpus vocab, term rows
    st = sc.groupBy("source").agg(F.sum("c").cast("long").alias("nt"))
    cc = sc.groupBy("tok").agg(F.sum("c").cast("long").alias("cc"))
    ct = cc.agg(F.sum("cc").cast("long").alias("n"))
    ps = F.col("c") * 1.0 / F.col("nt")
    pc = F.col("cc") * 1.0 / F.col("n")
    term = (
        sc.join(F.broadcast(st), "source")
        .join(F.broadcast(cc), "tok")
        .crossJoin(F.broadcast(ct))
        .select("source", (ps * F.log(ps / pc)).alias("kl_t"))
    )
    red = term.groupBy("source").agg(rnd(F.sum("kl_t"), 6).alias("kl_div"))
    n_terms = sc.groupBy("source").agg(F.count("*").cast("long").alias("n_terms"))
    return (
        st.join(n_terms, "source")
        .join(red, "source")
        .select("source", F.col("nt").alias("n_tokens"), "n_terms", "kl_div")
    )


@query(
    "j_pmi_bigrams",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    bg AS (SELECT unnest(list_transform(
                      range(1, greatest(len(toks) - 1, 0) + 1),
                      i -> toks[i] || ' ' || toks[i + 1])) AS bigram
           FROM t),
    bc AS (SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n_pair
           FROM bg GROUP BY bigram),
    tb AS (SELECT CAST(SUM(n_pair) AS BIGINT) AS tb FROM bc),
    tok AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
    uc AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cu FROM tok GROUP BY tok),
    tu AS (SELECT CAST(SUM(cu) AS BIGINT) AS tu FROM uc),
    sc AS (SELECT bc.bigram, bc.n_pair,
                  {sql_rnd(_PMI_EXPR, 6)} AS pmi
           FROM bc CROSS JOIN tb CROSS JOIN tu
           JOIN uc a ON a.tok = string_split(bc.bigram, ' ')[1]
           JOIN uc b ON b.tok = string_split(bc.bigram, ' ')[2]
           WHERE bc.n_pair >= {_PMI_MIN})
    SELECT bigram, n_pair, pmi FROM sc
    ORDER BY pmi DESC, bigram LIMIT {_PMI_K}
    """,
)
def j_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI collocations: pointwise mutual information of adjacent token
    pairs — ln(p(ab) / (p(a)·p(b))) — with a minimum support of 5,
    top-20 by (pmi desc, bigram asc). The phrase-mining statistic used
    to decide which token sequences deserve single vocabulary entries
    (word2vec's phrase pass, public).

    Plan: one bigram explode → hash agg; the unigram table (corpus
    vocabulary — tiny) BROADCASTS onto the bigram counts twice (left
    and right token), totals are 1-row broadcasts, and the top-K is
    TakeOrderedAndProject (pinned) — never a global sort. The ordering
    key (rounded pmi, bigram) is a total order, so the LIMIT is
    deterministic on both engines."""
    t = load(spark, sf_dir)
    bc = (
        t.documents.select(F.explode(ngrams_col("text", 2)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").cast("long").alias("n_pair"))
    )
    uc = (
        t.documents.select(F.explode(tokens_col("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").cast("long").alias("cu"))
    )
    uc.persist()  # consumers: totals, left-token join, right-token join
    tb = bc.agg(F.sum("n_pair").cast("long").alias("tb"))
    tu = uc.agg(F.sum("cu").cast("long").alias("tu"))
    a, b = uc.alias("a"), uc.alias("b")
    parts = F.split("bigram", " ")
    scored = (
        bc.where(F.col("n_pair") >= _PMI_MIN)
        .crossJoin(F.broadcast(tb))
        .crossJoin(F.broadcast(tu))
        .withColumn("l", parts.getItem(0))
        .withColumn("r", parts.getItem(1))
        .join(F.broadcast(a), F.col("l") == F.col("a.tok"))
        .join(F.broadcast(b), F.col("r") == F.col("b.tok"))
    )
    p_ab = F.col("n_pair") * 1.0 / F.col("tb")
    p_a = F.col("a.cu") * 1.0 / F.col("tu")
    p_b = F.col("b.cu") * 1.0 / F.col("tu")
    return (
        scored.select(
            "bigram", "n_pair", rnd(F.log(p_ab / (p_a * p_b)), 6).alias("pmi")
        )
        .orderBy(F.col("pmi").desc(), F.col("bigram").asc())
        .limit(_PMI_K)
    )


# BM25 scored-frame CTE chain, shared by the j_bm25_topk and
# j_rank_fusion oracles (ends at `sc(doc_id, n_terms, score)`).
_BM25_CTES = f"""q(qt) AS (VALUES {', '.join(f"('{t}')" for t in _BM25_QUERY)}),
    tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents),
    tc AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
           FROM tok GROUP BY doc_id, tok),
    dl AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
           FROM documents),
    st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                  SUM(len(string_split(text, ' '))) * 1.0 / COUNT(*) AS avgdl
           FROM documents),
    df AS (SELECT tc.tok, CAST(COUNT(*) AS BIGINT) AS df
           FROM tc JOIN q ON tc.tok = q.qt GROUP BY tc.tok),
    hit AS (SELECT tc.doc_id,
                   ln((st.n - df.df + 0.5) / (df.df + 0.5) + 1)
                       * tc.tf * ({_BM25_K1} + 1)
                       / (tc.tf + {_BM25_K1} * (1 - {_BM25_B}
                          + {_BM25_B} * dl.dl / st.avgdl)) AS part
            FROM tc JOIN df USING (tok) JOIN dl USING (doc_id) CROSS JOIN st),
    sc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
                  {sql_rnd('SUM(part)', 6)} AS score
           FROM hit GROUP BY doc_id)"""


@query(
    "j_bm25_topk",
    oracle=f"""
    WITH {_BM25_CTES}
    SELECT doc_id, n_terms, score FROM sc
    ORDER BY score DESC, doc_id LIMIT {_BM25_TOPK}
    """,
)
def j_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval (Robertson & Spärck Jones probabilistic
    weighting, Lucene's +1 idf form; k1=1.2, b=0.75) for a fixed
    5-term query: top-10 documents by (score desc, doc_id asc) — the
    LEXICAL retrieval twin of the dense j_sim_topk, and the decontam/
    attribution lookup every corpus tooling stack ships.

    Scale shape: the query relation is a literal handful of terms, so
    the inverted-index probe is a BROADCAST semi-join of the
    (doc, term, tf) rows against the query terms — only the matching
    posting rows (Σ df over 5 query terms, NOT the corpus) survive into
    the per-doc score agg, and the df/corpus statistics are 1-row or
    K-row broadcasts. The final top-K is TakeOrderedAndProject
    (pinned). avgdl is an exact integer-sum ratio, identical on both
    engines; the score's 5-term sum rounds to 1e-6 (the j_semdedup
    rule) so the ORDER BY key is engine-stable."""
    t = load(spark, sf_dir)
    return (
        _bm25_scored(spark, t)
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(_BM25_TOPK)
    )


def _bm25_scored(spark: SparkSession, t) -> DataFrame:
    """The BM25-scored hit frame (doc_id, n_terms, score) for the fixed
    literal query — shared by j_bm25_topk (top-K directly) and
    j_rank_fusion (lexical leg of the RRF fuse)."""
    q = spark.createDataFrame([(x,) for x in _BM25_QUERY], ["qt"])
    tc = (
        t.documents.select("doc_id", F.explode(tokens_col("text")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").cast("long").alias("tf"))
        .join(F.broadcast(q), F.col("tok") == F.col("qt"))
        .drop("qt")
    )
    tc.persist()  # consumers: df vote + score rows
    df = tc.groupBy("tok").agg(F.count("*").cast("long").alias("df"))
    dl = t.documents.select(
        "doc_id", F.size(tokens_col("text")).cast("long").alias("dl")
    )
    st = t.documents.agg(
        F.count("*").cast("long").alias("n"),
        (F.sum(F.size(tokens_col("text"))) * 1.0 / F.count("*")).alias("avgdl"),
    )
    idf = F.log((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1)
    part = (
        idf
        * F.col("tf")
        * (_BM25_K1 + 1)
        / (
            F.col("tf")
            + _BM25_K1 * (1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
        )
    )
    return (
        tc.join(F.broadcast(df), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(st))
        .select("doc_id", part.alias("part"))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_terms"),
            rnd(F.sum("part"), 6).alias("score"),
        )
    )


# RRF fusion: top-N from each retriever, k=60 (the constant from
# Cormack, Clarke & Buettcher 2009), final top-K.
_RRF_N = 20
_RRF_C = 60
_RRF_TOPK = 10


@query(
    "j_rank_fusion",
    oracle=f"""
    WITH {_BM25_CTES},
    lextop AS (SELECT doc_id, score FROM sc
               ORDER BY score DESC, doc_id LIMIT {_RRF_N}),
    lex AS (SELECT doc_id,
                   ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS r_lex
            FROM lextop),
    dtop AS (SELECT vec_id AS doc_id,
                    FLOOR(list_dot_product(CAST(embedding AS DOUBLE[]), qv)
                          * 1000000 + 0.5) / 1000000 AS score
             FROM embeddings,
                  (SELECT CAST(embedding AS DOUBLE[]) AS qv
                   FROM embeddings WHERE vec_id = 0)
             ORDER BY score DESC, vec_id LIMIT {_RRF_N}),
    den AS (SELECT doc_id,
                   ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS r_den
            FROM dtop),
    fused AS (SELECT doc_id, r_lex, r_den,
                     COALESCE(1.0 / ({_RRF_C} + r_lex), 0)
                       + COALESCE(1.0 / ({_RRF_C} + r_den), 0) AS rrf
              FROM lex FULL JOIN den USING (doc_id))
    SELECT doc_id, r_lex, r_den,
           FLOOR(rrf * 1000000000 + 0.5) / 1000000000 AS rrf_score
    FROM fused ORDER BY rrf DESC, doc_id LIMIT {_RRF_TOPK}
    """,
)
def j_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009, public)
    of the two retrieval legs this registry already ships: the BM25
    lexical ranking (j_bm25_topk's scored frame, same fixed query) and
    the dense cosine ranking against the vec_id=0 query vector
    (j_sim_topk's scoring, doc_id == vec_id by fixture construction).
    Each leg contributes 1/(60 + rank) over its top-20 list; documents
    found by only one leg keep that leg's term alone — the hybrid-search
    primitive every RAG stack ships.

    Scale shape: RRF fuses top-N LISTS, not full rankings — each leg is
    TakeOrderedAndProject (per-partition heaps, no global sort), and the
    only ranking windows run AFTER the limit, over N=20-row frames (the
    j_pack_sequences single-partition argument: bounded by the list
    size, never by the corpus). The fuse itself is a full outer join of
    two 20-row frames. Both legs' scores are pre-rounded to 1e-6 before
    ranking so rank order is engine-stable; ranks are then integers and
    the RRF sum is the same short IEEE sequence on both engines."""
    from ..operators.similarity import as_double, dot_expr

    t = load(spark, sf_dir)
    lextop = (
        _bm25_scored(spark, t)
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(_RRF_N)
    )
    wl = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    lex = lextop.select("doc_id", F.row_number().over(wl).alias("r_lex"))
    qv = t.embeddings.where(F.col("vec_id") == 0).select(
        as_double("embedding").alias("qv")
    )
    dtop = (
        t.embeddings.crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            rnd(dot_expr(as_double("embedding"), F.col("qv")), 6).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(_RRF_N)
    )
    den = dtop.select("doc_id", F.row_number().over(wl).alias("r_den"))
    rrf = F.coalesce(1.0 / (_RRF_C + F.col("r_lex")), F.lit(0.0)) + F.coalesce(
        1.0 / (_RRF_C + F.col("r_den")), F.lit(0.0)
    )
    return (
        lex.join(den, "doc_id", "full_outer")
        .select("doc_id", "r_lex", "r_den", rrf.alias("rrf"))
        .orderBy(F.col("rrf").desc(), F.col("doc_id").asc())
        .limit(_RRF_TOPK)
        .select("doc_id", "r_lex", "r_den", rnd(F.col("rrf"), 9).alias("rrf_score"))
    )


# Co-occurrence: ordered token pairs within a ±2 window — word2vec /
# GloVe-style context-matrix construction; top-K by support.
_COOC_WINDOW = 2
_COOC_TOPK = 50


@query(
    "j_cooccur_window",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
    pos AS (SELECT doc_id, unnest(tok) AS w, generate_subscripts(tok, 1) AS i
            FROM t),
    pr AS (SELECT a.w AS a, b.w AS b, a.doc_id
           FROM pos a JOIN pos b
             ON a.doc_id = b.doc_id AND b.i - a.i BETWEEN 1 AND {_COOC_WINDOW}),
    g AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
          FROM pr GROUP BY a, b)
    SELECT a, b, n, n_docs FROM g ORDER BY n DESC, a, b LIMIT {_COOC_TOPK}
    """,
)
def j_cooccur_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed co-occurrence counts: every ORDERED token pair (a
    precedes b) within a ±{w}-token window, with pair frequency and
    document support — the context-matrix statistic word2vec/GloVe-era
    embedding training and phrase mining consume (j_pmi_bigrams is its
    distance-1 normalized cousin).

    Lowering: pair generation is PER-ROW array arithmetic — for each
    offset d ≤ {w}, zip the token array against itself shifted by d
    (transform over sequence(1, n−d)) — so no positional self-join ever
    happens in Spark; the oracle states the same set relationally
    (position join on b.i − a.i ∈ [1, {w}]). One explode (×{w}·n_tok
    fan-out of small (a, b) structs) feeds ONE hash agg keyed on the
    pair; distinct-doc support rides the same exchange. Top-{k} by
    (n DESC, a, b) is a total order, so the LIMIT boundary is
    engine-independent.

    100 TB: shuffle carries (token, token, partial-count) triples —
    digests of the corpus, not text; vocabulary² caps the group count
    far below the row count, and map-side partials collapse the
    explode fan-out before the exchange. TakeOrderedAndProject keeps
    {k}."""
    t = load(spark, sf_dir)

    def pairs_expr(d: int) -> str:
        return (
            f"CASE WHEN size(tok) > {d} THEN transform(sequence(1, size(tok) - {d}),"
            f" i -> struct(element_at(tok, i) AS a, element_at(tok, i + {d}) AS b))"
            f" ELSE array() END"
        )

    exploded = (
        # spread: the d-offset zip fan-out ran in the scan's ONE task
        # (no-op at scale, tables.spread)
        spread(spark, sf_dir, "documents").select("doc_id", tokens_col("text").alias("tok"))
        .select(
            "doc_id",
            F.explode(
                F.concat(
                    *[F.expr(pairs_expr(d)) for d in range(1, _COOC_WINDOW + 1)]
                )
            ).alias("p"),
        )
        .select("doc_id", F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    )
    g = exploded.groupBy("a", "b").agg(
        F.count("*").cast("long").alias("n"),
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
    )
    return g.orderBy(F.col("n").desc(), F.col("a").asc(), F.col("b").asc()).limit(
        _COOC_TOPK
    )


j_cooccur_window.__doc__ = j_cooccur_window.__doc__.replace(
    "{w}", str(_COOC_WINDOW)
).replace("{k}", str(_COOC_TOPK))


# Negative sampling: k deterministic negatives per document from the
# frequency-ranked vocabulary — the contrastive-pair side of word2vec
# prep (j_cooccur_window builds the positive side).
_NEG_K = 4


@query(
    "j_negative_sampling",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                 FROM documents),
    v AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY w),
    rv AS (SELECT w, n,
                  CAST(ROW_NUMBER() OVER (ORDER BY n DESC, w) AS BIGINT) AS rnk
           FROM v),
    c AS (SELECT CAST(COUNT(*) AS BIGINT) AS vsz FROM v),
    s AS (SELECT doc_id, text, CAST(unnest(range(0, {_NEG_K})) AS BIGINT) AS slot
          FROM documents),
    h AS (SELECT doc_id, text, slot,
                 CAST('0x' || substr(md5('neg' || CAST(doc_id AS VARCHAR) || ':'
                     || CAST(slot AS VARCHAR)), 9, 8) AS BIGINT) AS hw
          FROM s)
    SELECT h.doc_id, h.slot, rv.w AS neg_token, rv.n AS neg_count,
           list_contains(string_split(h.text, ' '), rv.w) AS collision
    FROM h CROSS JOIN c
    JOIN rv ON rv.rnk = h.hw % c.vsz + 1
    """,
)
def j_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling: {k} negatives per document,
    drawn uniformly from the frequency-ranked vocabulary by the
    portable low-md5-word of (doc_id, slot) — the contrastive
    counterpart to j_cooccur_window's positive pairs in word2vec-style
    training prep. No RNG state: a sample is a pure function of stable
    ids, so it survives retries, repartitioning, and engine swaps (the
    j_split_train_val discipline). A drawn negative that actually
    occurs in the document is FLAGGED (collision), not silently
    resampled — rejection loops are non-deterministic under
    distribution; the trainer drops flagged rows.

    "Uniform" carries the standard hash-mod caveat (r9 ADVICE): the
    draw maps a 32-bit hash word by `hw % |V|`, so when |V| does not
    divide 2^32 the first 2^32 mod |V| ranks are selected with excess
    probability |V|/2^32 (< 10^-5 at any realistic vocabulary) —
    negligible by design, and parity-neutral since both engines share
    the identical expression.

    Plan: the vocabulary is one token hash agg; its frequency ranking
    is a |V|-row window — index METADATA next to the corpus (if |V|
    itself outgrows one task, the rank lowers to the
    distributed_prefix_sum_ord count pattern unchanged). The draw is a
    narrow md5 map over ×{k} exploded slots, an equi-join against the
    BROADCAST vocabulary on the computed rank, and the 1-row |V| side
    broadcasts into the modulus. Zero corpus-sized shuffles."""
    t = load(spark, sf_dir)
    tokw = t.documents.select("doc_id", F.explode(tokens_col("text")).alias("w"))
    v = tokw.groupBy("w").agg(F.count("*").cast("long").alias("n"))
    rv = v.withColumn(
        "rnk",
        F.row_number()
        .over(Window.orderBy(F.col("n").desc(), F.col("w").asc()))
        .cast("long"),
    )
    vsz = v.agg(F.count("*").cast("long").alias("vsz"))
    s = t.documents.select(
        "doc_id",
        tokens_col("text").alias("tok"),
        F.explode(F.expr(f"sequence(CAST(0 AS BIGINT), {_NEG_K - 1})")).alias("slot"),
    )
    key = F.concat(
        F.lit("neg"),
        F.col("doc_id").cast("string"),
        F.lit(":"),
        F.col("slot").cast("string"),
    )
    hw = F.conv(F.substring(F.md5(key), 9, 8), 16, 10).cast("long")
    cand = (
        s.withColumn("hw", hw)
        .crossJoin(F.broadcast(vsz))
        .withColumn("neg_rank", F.col("hw") % F.col("vsz") + 1)
    )
    return cand.join(F.broadcast(rv), cand.neg_rank == rv.rnk).select(
        "doc_id",
        "slot",
        F.col("w").alias("neg_token"),
        F.col("n").alias("neg_count"),
        F.array_contains(F.col("tok"), F.col("w")).alias("collision"),
    )


j_negative_sampling.__doc__ = j_negative_sampling.__doc__.replace("{k}", str(_NEG_K))


_FH_DIM = 64


@query(
    "j_feature_hashing",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
    b AS (SELECT doc_id, w,
                 CAST(('0x' || substr(md5(w), 9, 8))::BIGINT % {_FH_DIM}
                      AS BIGINT) AS bucket
          FROM tok),
    wc AS (SELECT bucket, w, CAST(COUNT(*) AS BIGINT) AS c
           FROM b GROUP BY bucket, w)
    SELECT b.bucket,
           CAST(COUNT(*) AS BIGINT) AS total_count,
           CAST(COUNT(DISTINCT b.w) AS BIGINT) AS n_tokens,
           CAST(COUNT(DISTINCT b.doc_id) AS BIGINT) AS n_docs,
           (SELECT MIN(w) FROM wc
            WHERE wc.bucket = b.bucket
              AND wc.c = (SELECT MAX(c) FROM wc w2 WHERE w2.bucket = b.bucket))
             AS top_token
    FROM b
    GROUP BY b.bucket
    """,
)
def j_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick feature space audit (Weinberger et al. 2009,
    public): every token maps to one of {d} buckets by the portable
    low-md5 word — the fixed-dimension, vocabulary-free featurization
    bag-of-words models train on at corpus scale (no vocab dictionary
    to build, broadcast, or version). The relation profiles each
    bucket: total mass, DISTINCT tokens sharing it (the collision
    count that dilutes the feature), documents touching it, and the
    dominant token (max count, ties to the lexicographically smallest
    — a deterministic argmax without packed keys since the domain is
    strings). A skewed n_tokens column says the hash dimension is too
    small; that diagnostic is the point.

    Plan: explode -> one (bucket, token) hash agg -> one bucket-keyed
    rollup; the shuffle carries digests and counts, never text bodies,
    and the output is exactly {d} rows — dashboard-sized at any corpus
    size. distinct-counts are exact here because the per-bucket token
    domain is the unit being audited; at 10^10 docs swap
    approx_count_distinct and keep the schema."""
    from ..operators.dedup import portable_bucket

    t = load(spark, sf_dir)
    tok = t.documents.select("doc_id", F.explode(tokens_col("text")).alias("w"))
    b = tok.select("doc_id", "w", portable_bucket(F.col("w"), _FH_DIM).alias("bucket"))
    wc = b.groupBy("bucket", "w").agg(F.count("*").cast("long").alias("c"))
    # deterministic argmax over strings: max (c, reversed-lex w) would
    # need packing; min_by on (negated count, w) keeps it one hash agg.
    top = wc.groupBy("bucket").agg(
        F.min_by("w", F.struct((-F.col("c")).alias("nc"), F.col("w").alias("w"))).alias(
            "top_token"
        )
    )
    prof = b.groupBy("bucket").agg(
        F.count("*").cast("long").alias("total_count"),
        F.countDistinct("w").cast("long").alias("n_tokens"),
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
    )
    return prof.join(top, "bucket").select(
        "bucket", "total_count", "n_tokens", "n_docs", "top_token"
    )


j_feature_hashing.__doc__ = j_feature_hashing.__doc__.replace("{d}", str(_FH_DIM))


@query(
    "j_source_overlap",
    oracle="""
    WITH toks AS (SELECT source, string_split(text, ' ') AS t FROM documents),
    g AS (SELECT DISTINCT source, md5(s) AS h FROM (
            SELECT source,
                   unnest(list_transform(
                     range(1, greatest(len(t) - 2, 0) + 1),
                     i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS s
            FROM toks)),
    tot AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_grams
            FROM g GROUP BY source),
    pair AS (SELECT a.source AS source_a, b.source AS source_b,
                    CAST(COUNT(*) AS BIGINT) AS n_shared
             FROM g a JOIN g b USING (h)
             WHERE a.source <> b.source GROUP BY 1, 2)
    SELECT source_a, source_b, n_shared,
           FLOOR(n_shared * 1.0 / n_grams * 1000000 + 0.5) / 1000000
             AS containment
    FROM pair JOIN tot ON pair.source_a = tot.source
    """,
)
def j_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source 3-gram containment matrix: for every ordered source
    pair, the fraction of a's distinct trigram vocabulary also present
    in b — the SET-overlap companion to j_kl_sources' distribution
    divergence (KL sees frequency shift; containment sees verbatim
    shared phrasing, i.e. syndication and template reuse BETWEEN
    corpus slices before any doc-level dedup pair exists). Asymmetric
    by design: a small feed inside a big crawl scores high a->b and
    low b->a.

    Plan: one explode -> distinct on (source, digest) — the shuffle
    carries 16-byte md5 digests, never gram text (the corpus.py
    discipline) — then a digest-keyed self equi-join whose per-key
    fan-out is bounded by |sources| (a gram contributes at most
    20x19 pairs), a pair-keyed hash agg, and a broadcast 20-row
    totals join. Output is |sources|^2-bounded metadata at any corpus
    size; at 100 TB the distinct and the join bucket by digest and
    the (lang,source)-blocked variant runs per language shard."""
    from ..operators.dedup import shingle_rows

    g = (
        # spread: shingling + md5 ran in the scan's ONE task (no-op at
        # scale, tables.spread)
        shingle_rows(spread(spark, sf_dir, "documents"), ["source"], "text", 3)
        .select("source", F.md5("sh").alias("h"))
        .distinct()
    )
    tot = g.groupBy("source").agg(F.count("*").cast("long").alias("n_grams"))
    a, b = g.alias("a"), g.alias("b")
    pair = (
        a.join(b, "h")
        .where(F.col("a.source") != F.col("b.source"))
        .groupBy(
            F.col("a.source").alias("source_a"), F.col("b.source").alias("source_b")
        )
        .agg(F.count("*").cast("long").alias("n_shared"))
    )
    return pair.join(
        F.broadcast(tot), pair.source_a == tot.source
    ).select(
        "source_a",
        "source_b",
        "n_shared",
        rnd(F.col("n_shared") * 1.0 / F.col("n_grams"), 6).alias("containment"),
    )


@query(
    "j_gini_tokens",
    oracle=f"""
    WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS w
                 FROM documents),
    vc AS (SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
           FROM tok GROUP BY source, w),
    rk AS (SELECT source, c,
                  CAST(ROW_NUMBER() OVER (PARTITION BY source
                                          ORDER BY c, w) AS BIGINT) AS rnk
           FROM vc),
    agg AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS vocab_size,
                   CAST(SUM(c) AS BIGINT) AS n_tokens,
                   CAST(SUM(rnk * c) AS BIGINT) AS t
            FROM rk GROUP BY source)
    SELECT source, vocab_size, n_tokens,
           {sql_rnd("(2 * t - (vocab_size + 1) * n_tokens) * 1.0"
                    " / (vocab_size * n_tokens)", 6)} AS gini
    FROM agg
    """,
)
def j_gini_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Gini coefficient of the token-frequency distribution —
    the vocabulary-concentration statistic (0 = every token equally
    frequent, →1 = a handful of tokens carry all the mass). The
    corpus-health companion to j_entropy (per-document) and
    j_kl_sources (cross-source shift): a source whose Gini spikes after
    a crawl refresh usually picked up boilerplate.

    Exact-integer identity: with per-source frequencies ranked
    ascending c_1 ≤ … ≤ c_V (ties broken by token — Σ rnk·c is
    invariant to permutation within a tie block, so the rank order is
    engine-independent), Gini = (2·Σ i·c_i − (V+1)·Σ c_i) / (V·Σ c_i).
    Every sum is BIGINT; the only float op is the final division, the
    same single IEEE op on both engines (rounded 1e-6 for the habit,
    not the need).

    Tie-block lowering (the 100-TB form — r9 verdict asked for the
    per-source full-vocabulary rank window to be bounded): because a
    tie block of b tokens sharing count c occupies the consecutive
    rank run (a, a+b] (a = tokens with strictly smaller count), its
    Σ rnk·c collapses to c·(b·(2a+b+1) div 2) — an exact BIGINT
    triangular-run identity (b·(2a+b+1) is always even). So ranks are
    never materialized: the only window runs over the per-source
    HISTOGRAM OF DISTINCT COUNTS, whose size is ≤ √(2·n_tokens) rows
    (Σ of k distinct counts ≥ k²/2), i.e. ~1.4M rows for a 10^12-token
    source — actual metadata, vs the O(10^8)-row vocabulary the
    previous row_number form sorted in one task. The oracle keeps the
    literal rank formulation, so the compare also proves the identity.

    Plan: one explode → (source, token) hash agg → (source, count)
    hash agg (the histogram), an exclusive per-source prefix sum over
    that histogram, and a source-keyed rollup. Shuffles carry
    (source, token, count) then (source, count, b) — never text."""
    t = load(spark, sf_dir)
    vc = (
        t.documents.select("source", F.explode(tokens_col("text")).alias("w"))
        .groupBy("source", "w")
        .agg(F.count("*").cast("long").alias("c"))
    )
    hist = vc.groupBy("source", "c").agg(F.count("*").cast("long").alias("b"))
    w_excl = (
        Window.partitionBy("source")
        .orderBy(F.col("c").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    blocks = hist.select(
        "source",
        "c",
        "b",
        F.coalesce(F.sum("b").over(w_excl), F.lit(0)).cast("long").alias("a"),
    )
    t_block = F.col("c") * F.expr("(b * (2 * a + b + 1)) div 2")
    agg = blocks.groupBy("source").agg(
        F.sum("b").cast("long").alias("vocab_size"),
        F.sum(F.col("c") * F.col("b")).cast("long").alias("n_tokens"),
        F.sum(t_block).cast("long").alias("t"),
    )
    gini = (
        (2 * F.col("t") - (F.col("vocab_size") + 1) * F.col("n_tokens"))
        * 1.0
        / (F.col("vocab_size") * F.col("n_tokens"))
    )
    return agg.select("source", "vocab_size", "n_tokens", rnd(gini, 6).alias("gini"))


# Context-length audit: the packing-efficiency question asked before
# any training run — at which sequence length does this corpus waste
# the least (truncation loss vs padding waste, one doc per sequence)?
_CTX_LENGTHS = (32, 64, 128, 256)


@query(
    "j_context_fit",
    oracle=f"""
    WITH dl AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n
                FROM documents),
    x AS (SELECT n, CAST(unnest([{", ".join(map(str, _CTX_LENGTHS))}]) AS BIGINT)
                        AS ctx_len
          FROM dl)
    SELECT ctx_len,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN n <= ctx_len THEN 1 ELSE 0 END) AS BIGINT) AS n_fit,
           CAST(SUM(least(n, ctx_len)) AS BIGINT) AS tokens_kept,
           CAST(SUM(greatest(n - ctx_len, 0)) AS BIGINT) AS tokens_truncated,
           CAST(SUM(greatest(ctx_len - n, 0)) AS BIGINT) AS pad_waste,
           {sql_rnd("SUM(least(n, ctx_len)) * 1.0 / (COUNT(*) * ctx_len)", 6)}
             AS utilization
    FROM x GROUP BY ctx_len
    """,
)
def j_context_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-length fit audit: for each candidate training sequence
    length L, how the corpus splits into kept / truncated / padded
    token mass under the naive one-document-per-sequence layout —
    n_fit (docs that fit whole), tokens_kept = Σ min(n, L),
    tokens_truncated = Σ max(n−L, 0), pad_waste = Σ max(L−n, 0), and
    utilization = kept / (n_docs·L). The measurement that decides
    whether j_pack_sequences' bin-packing is worth running and which
    L to pack toward; every term is an exact BIGINT sum (utilization
    is the one division).

    Plan: token counts are a NARROW map over the scan (size(split) —
    no explode, text never leaves the map stage), the ×{k} candidate
    lengths come from exploding a literal array, and the whole audit
    is ONE hash agg keyed on ctx_len with map-side partials — output
    is exactly {k} rows at any corpus size."""
    t = load(spark, sf_dir)
    n = F.col("n")
    ctx = F.col("ctx_len")
    x = t.documents.select(
        F.size(tokens_col("text")).cast("long").alias("n")
    ).select(
        "n",
        F.explode(
            F.array(*[F.lit(c).cast("long") for c in _CTX_LENGTHS])
        ).alias("ctx_len"),
    )
    return x.groupBy("ctx_len").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.when(n <= ctx, 1).otherwise(0)).cast("long").alias("n_fit"),
        F.sum(F.least(n, ctx)).cast("long").alias("tokens_kept"),
        F.sum(F.greatest(n - ctx, F.lit(0))).cast("long").alias("tokens_truncated"),
        F.sum(F.greatest(ctx - n, F.lit(0))).cast("long").alias("pad_waste"),
        rnd(F.sum(F.least(n, ctx)) * 1.0 / (F.count("*") * ctx), 6).alias(
            "utilization"
        ),
    )


j_context_fit.__doc__ = j_context_fit.__doc__.replace("{k}", str(len(_CTX_LENGTHS)))


# Poisson bootstrap (Chamandy et al. 2012, "Estimating Uncertainty for
# Massive Data Streams", public): each document contributes an
# independent Poisson(1) weight per replica, so a replica is computable
# in ONE pass without sampling n rows out of n. Weights are drawn by
# inverse-CDF on the portable md5 uniform; the cumulative-probability
# thresholds are spelled as full-precision literals so both engines
# compare against the identical double (exp(-1) is never evaluated at
# query time).
_BOOT_B = 64
# cumulative Poisson(1) CDF at k = 0..4; weights cap at 5.
_BOOT_CDF = (
    "0.36787944117144233",
    "0.7357588823428847",
    "0.9196986029286058",
    "0.9810118431238463",
    "0.9963401531726563",
)
# rank-based 95% CI bounds for B=64 replica means: ceil(0.025·64)=2,
# B+1-2=63 (symmetric order statistics, no interpolation — rank picks
# are engine-stable where interpolated quantiles are not).
_BOOT_LO_RANK = 2
_BOOT_HI_RANK = _BOOT_B + 1 - _BOOT_LO_RANK

_BOOT_W_SQL = (
    "CASE "
    + " ".join(
        f"WHEN u < {c} THEN {k}" for k, c in enumerate(_BOOT_CDF)
    )
    + " ELSE 5 END"
)


@query(
    "j_bootstrap_ci",
    oracle=f"""
    WITH s AS (SELECT doc_id, n_chars,
                      CAST(unnest(range(0, {_BOOT_B})) AS BIGINT) AS rep
               FROM documents),
    h AS (SELECT rep, n_chars,
                 CAST('0x' || substr(md5('boot' || CAST(doc_id AS VARCHAR)
                     || ':' || CAST(rep AS VARCHAR)), 9, 8) AS BIGINT)
                   / 4294967296.0 AS u
          FROM s),
    w AS (SELECT rep, n_chars, {_BOOT_W_SQL} AS w FROM h),
    r AS (SELECT rep, CAST(SUM(w) AS BIGINT) AS sw,
                 CAST(SUM(w * n_chars) AS BIGINT) AS swl
          FROM w GROUP BY rep),
    m AS (SELECT rep, swl * 1.0 / sw AS mean_r FROM r),
    rk AS (SELECT mean_r,
                  CAST(ROW_NUMBER() OVER (ORDER BY mean_r, rep) AS BIGINT) AS rnk
           FROM m),
    ci AS (SELECT MAX(CASE WHEN rnk = {_BOOT_LO_RANK} THEN mean_r END) AS lo,
                  MAX(CASE WHEN rnk = {_BOOT_HI_RANK} THEN mean_r END) AS hi
           FROM rk),
    pt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                  SUM(n_chars) * 1.0 / COUNT(*) AS mean
           FROM documents)
    SELECT pt.n_docs, CAST({_BOOT_B} AS BIGINT) AS n_replicas,
           {sql_rnd("pt.mean", 6)} AS point_mean,
           {sql_rnd("ci.lo", 6)} AS ci_lo,
           {sql_rnd("ci.hi", 6)} AS ci_hi
    FROM pt CROSS JOIN ci
    """,
)
def j_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Poisson bootstrap 95% CI for the mean document
    length (n_chars): {b} replicas, each document contributing an
    independent Poisson(1) weight per replica drawn by inverse-CDF on
    the portable low-md5-word of (doc_id, replica) — the resampling
    scheme that makes bootstrap uncertainty computable in one
    distributed pass (Chamandy et al. 2012, public), and the statistic
    a data-quality dashboard attaches to every corpus-mean it reports.
    No RNG state: a replica is a pure function of stable ids (the
    j_split_train_val discipline), so the CI survives retries,
    repartitioning, and engine swaps. CI bounds are ORDER STATISTICS
    of the replica means (ranks {lo}/{hi} of {b}), not interpolated
    quantiles — rank picks compare exactly across engines.

    Float discipline: per-replica sums are BIGINT (weights 0–5 ×
    integer lengths); each replica mean is ONE division of two
    BIGINTs — bit-identical on both engines — and the CDF thresholds
    are full-precision literals compared against u = hw / 2^32, an
    exact dyadic rational. Only the final display columns round.

    Plan: the ×{b} replica fan-out is a narrow explode of a literal
    sequence (no shuffle); the per-replica reduction is ONE hash agg
    keyed on rep with map-side partials ({b} groups at any corpus
    size); the rank window and CI pick run over a {b}-row metadata
    frame (the j_pack_sequences single-partition argument); the point
    estimate is a 1-row broadcast cross-joined in (allowlisted BNLJ)."""
    t = load(spark, sf_dir)
    s = t.documents.select(
        "doc_id",
        "n_chars",
        F.explode(
            F.expr(f"sequence(CAST(0 AS BIGINT), CAST({_BOOT_B - 1} AS BIGINT))")
        ).alias("rep"),
    )
    key = F.concat(
        F.lit("boot"),
        F.col("doc_id").cast("string"),
        F.lit(":"),
        F.col("rep").cast("string"),
    )
    u = (
        F.conv(F.substring(F.md5(key), 9, 8), 16, 10).cast("long") / 4294967296.0
    ).alias("u")
    h = s.select("rep", "n_chars", u)
    w = F.when(F.col("u") < float(_BOOT_CDF[0]), 0)
    for k, c in enumerate(_BOOT_CDF[1:], start=1):
        w = w.when(F.col("u") < float(c), k)
    w = w.otherwise(5)
    r = h.select("rep", "n_chars", w.alias("w")).groupBy("rep").agg(
        F.sum("w").cast("long").alias("sw"),
        F.sum(F.col("w") * F.col("n_chars")).cast("long").alias("swl"),
    )
    m = r.select("rep", (F.col("swl") * 1.0 / F.col("sw")).alias("mean_r"))
    rk = m.select(
        "mean_r",
        F.row_number()
        .over(Window.orderBy(F.col("mean_r").asc(), F.col("rep").asc()))
        .cast("long")
        .alias("rnk"),
    )
    ci = rk.agg(
        F.max(F.when(F.col("rnk") == _BOOT_LO_RANK, F.col("mean_r"))).alias("lo"),
        F.max(F.when(F.col("rnk") == _BOOT_HI_RANK, F.col("mean_r"))).alias("hi"),
    )
    pt = t.documents.agg(
        F.count("*").cast("long").alias("n_docs"),
        (F.sum("n_chars") * 1.0 / F.count("*")).alias("mean"),
    )
    return pt.crossJoin(F.broadcast(ci)).select(
        "n_docs",
        F.lit(_BOOT_B).cast("long").alias("n_replicas"),
        rnd(F.col("mean"), 6).alias("point_mean"),
        rnd(F.col("lo"), 6).alias("ci_lo"),
        rnd(F.col("hi"), 6).alias("ci_hi"),
    )


j_bootstrap_ci.__doc__ = (
    j_bootstrap_ci.__doc__.replace("{b}", str(_BOOT_B))
    .replace("{lo}", str(_BOOT_LO_RANK))
    .replace("{hi}", str(_BOOT_HI_RANK))
)


# Zipf fit: OLS of ln(freq) on ln(rank) over each source's top-N
# tokens. Natural language sits near slope -1; template/boilerplate
# text flattens the head, gibberish steepens it.
_ZIPF_TOPN = 50


@query(
    "j_zipf_fit",
    oracle=f"""
    WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS w
                 FROM documents),
    vc AS (SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
           FROM tok GROUP BY source, w),
    rk AS (SELECT source, c,
                  CAST(ROW_NUMBER() OVER (PARTITION BY source
                                          ORDER BY c DESC, w) AS BIGINT) AS r
           FROM vc),
    top AS (SELECT source, ln(CAST(r AS DOUBLE)) AS x,
                   ln(CAST(c AS DOUBLE)) AS y
            FROM rk WHERE r <= {_ZIPF_TOPN}),
    s AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(x) AS sx, SUM(y) AS sy,
                 SUM(x * y) AS sxy, SUM(x * x) AS sxx
          FROM top GROUP BY source)
    SELECT source, n,
           {sql_rnd("(n * sxy - sx * sy) / (n * sxx - sx * sx)", 6)}
             AS zipf_slope,
           {sql_rnd("(sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n",
                    6)} AS ln_c0
    FROM s
    """,
)
def j_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Zipf's-law fit: OLS slope of ln(freq) on ln(rank)
    over the top-{n} ranked tokens (plus the intercept, ln of the
    implied rank-1 frequency). Natural text sits near slope −1
    (Zipf 1949, public); a flattened head means template/boilerplate
    mass, a steep one means degenerate vocabulary — the distributional
    companion to j_gini_tokens' concentration scalar, and the
    j_ts_trend exact-sufficient-statistics pattern applied to rank
    space.

    Determinism: ranks are row_number over (count desc, token) — a
    total order — and x = ln(rank), y = ln(count) are single libm
    calls on identical integers, bit-identical per row on both
    engines. The five sufficient statistics are {n}-term sums whose
    accumulation order may differ, so both output columns round at
    1e-6 (the j_entropy rule; boundary odds ~1e-10/source).

    Plan: one explode → (source, token) hash agg, a per-source
    top-{n} rank, and ONE source-keyed rollup. The r ≤ {n} filter
    sits directly on the row_number window, so Catalyst's
    InferWindowGroupLimit inserts a PARTIAL WindowGroupLimit on the
    map side: every task keeps at most {n} rows per source BEFORE the
    source-keyed exchange, and no task ever sorts a full source
    vocabulary (plan-pinned, tests/test_plans.py) — the bound the r9
    verdict asked for. The slope lands as a per-source quality
    feature next to gini/entropy in mixture design."""
    t = load(spark, sf_dir)
    vc = (
        t.documents.select("source", F.explode(tokens_col("text")).alias("w"))
        .groupBy("source", "w")
        .agg(F.count("*").cast("long").alias("c"))
    )
    rk = vc.select(
        "source",
        "c",
        F.row_number()
        .over(Window.partitionBy("source").orderBy(F.col("c").desc(), F.col("w")))
        .cast("long")
        .alias("r"),
    )
    top = rk.where(F.col("r") <= _ZIPF_TOPN).select(
        "source",
        F.log(F.col("r").cast("double")).alias("x"),
        F.log(F.col("c").cast("double")).alias("y"),
    )
    s = top.groupBy("source").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    slope = (n * F.col("sxy") - sx * sy) / (n * F.col("sxx") - sx * sx)
    return s.select(
        "source",
        "n",
        rnd(slope, 6).alias("zipf_slope"),
        rnd((sy - slope * sx) / n, 6).alias("ln_c0"),
    )


j_zipf_fit.__doc__ = j_zipf_fit.__doc__.replace("{n}", str(_ZIPF_TOPN))


@query(
    "j_simpson_diversity",
    oracle=f"""
    WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS w
                 FROM documents),
    vc AS (SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
           FROM tok GROUP BY source, w),
    agg AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS vocab_size,
                   CAST(SUM(c) AS BIGINT) AS n_tokens,
                   CAST(SUM(c * (c - 1)) AS BIGINT) AS coll
            FROM vc GROUP BY source)
    SELECT source, vocab_size, n_tokens, coll,
           {sql_rnd("1.0 - coll * 1.0 / (n_tokens * (n_tokens - 1))", 6)}
             AS simpson
    FROM agg
    """,
)
def j_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Simpson diversity index 1 − Σ c·(c−1) / (n·(n−1)) —
    the probability that two tokens drawn without replacement differ
    (Simpson 1949, public). The collision-probability view of lexical
    diversity: where j_gini_tokens measures rank-inequality and
    j_entropy information content, Simpson is what a dedup/quality
    gate actually experiences — the chance a random token pair
    repeats. The unrounded collision sum Σ c·(c−1) is emitted for the
    audit trail.

    EXACT end to end: counts, the collision sum, and n·(n−1) are all
    BIGINT (c·(c−1) caps at n² — DECIMAL(38) upgrade documented for
    10^10-token sources); the index is ONE division. Plan: one
    explode → (source, token) hash agg → source-keyed rollup — the
    j_gini_tokens shape minus its rank window (no ordering needed at
    all), so shuffles carry only (source, token, count) digests."""
    t = load(spark, sf_dir)
    vc = (
        t.documents.select("source", F.explode(tokens_col("text")).alias("w"))
        .groupBy("source", "w")
        .agg(F.count("*").cast("long").alias("c"))
    )
    agg = vc.groupBy("source").agg(
        F.count("*").cast("long").alias("vocab_size"),
        F.sum("c").cast("long").alias("n_tokens"),
        F.sum(F.col("c") * (F.col("c") - 1)).cast("long").alias("coll"),
    )
    simpson = 1.0 - F.col("coll") * 1.0 / (
        F.col("n_tokens") * (F.col("n_tokens") - 1)
    )
    return agg.select(
        "source", "vocab_size", "n_tokens", "coll", rnd(simpson, 6).alias("simpson")
    )


@query(
    "j_ks_lengths",
    oracle="""
    WITH dl AS (SELECT source,
                       CAST(len(string_split(text, ' ')) AS BIGINT) AS n
                FROM documents),
    cl AS (SELECT n, CAST(COUNT(*) AS BIGINT) AS c FROM dl GROUP BY n),
    ctot AS (SELECT CAST(SUM(c) AS BIGINT) AS nc FROM cl),
    ccum AS (SELECT n, CAST(SUM(c) OVER (ORDER BY n) AS BIGINT) AS cc FROM cl),
    sl AS (SELECT source, n, CAST(COUNT(*) AS BIGINT) AS c
           FROM dl GROUP BY source, n),
    stot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS ns
             FROM sl GROUP BY source),
    grid AS (SELECT st.source, st.ns, cc.n, cc.cc, COALESCE(sl.c, 0) AS c
             FROM stot st CROSS JOIN ccum cc
             LEFT JOIN sl ON sl.source = st.source AND sl.n = cc.n),
    cum AS (SELECT source, ns, n, cc,
                   CAST(SUM(c) OVER (PARTITION BY source ORDER BY n)
                        AS BIGINT) AS cs
            FROM grid),
    d AS (SELECT source, ns, n,
                 abs(cs * ct.nc - cc * ns) AS dnum
          FROM cum CROSS JOIN ctot ct),
    mx AS (SELECT source, ns, CAST(MAX(dnum) AS BIGINT) AS ks_num,
                  CAST(MIN(CASE WHEN dnum = (SELECT MAX(dnum) FROM d d2
                                             WHERE d2.source = d.source)
                                THEN n END) AS BIGINT) AS at_length
           FROM d GROUP BY source, ns)
    SELECT source, ns AS n_docs, ks_num, at_length,
           FLOOR(ks_num * 1.0 / (ns * ct.nc) * 1000000 + 0.5) / 1000000
             AS ks_stat
    FROM mx CROSS JOIN ctot ct
    """,
)
def j_ks_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov distance between each source's
    document-length distribution and the whole corpus — max over x of
    |ECDF_source(x) − ECDF_corpus(x)| plus the length where the max
    occurs — the distribution-drift alarm a curation pipeline runs per
    ingest batch (KL sees token-frequency shift; KS sees length-shape
    shift, e.g. a source that silently started truncating).

    EXACT integer arithmetic end-to-end: both ECDFs are count ratios,
    so the gap cross-multiplies to |cs·N − cc·n_s| — a BIGINT — and
    the max, its argmax (min length on ties, a total order), and the
    comparison all happen in integers; the only float op is the final
    display division. Both step functions jump only at corpus-distinct
    lengths, so evaluating on that grid is exhaustive, not sampled.

    Plan: one narrow map (size(split), text never leaves the scan) →
    two hash aggs; the distinct-length grid is METADATA (bounded by
    the length domain, not the corpus), so the sources × lengths
    cross product, both cumulative windows, and the argmax all run on
    broadcast-scale frames. The corpus total is a 1-row broadcast."""
    t = load(spark, sf_dir)
    dl = t.documents.select(
        "source", F.size(tokens_col("text")).cast("long").alias("n")
    )
    cl = dl.groupBy("n").agg(F.count("*").cast("long").alias("c"))
    ccum = cl.select(
        "n",
        F.sum("c").over(Window.orderBy("n")).cast("long").alias("cc"),
    )
    nc = cl.agg(F.sum("c").cast("long").alias("nc"))
    sl = dl.groupBy("source", "n").agg(F.count("*").cast("long").alias("c"))
    stot = sl.groupBy("source").agg(F.sum("c").cast("long").alias("ns"))
    grid = (
        stot.crossJoin(F.broadcast(ccum))
        .join(sl, ["source", "n"], "left")
        .select("source", "ns", "n", "cc", F.coalesce("c", F.lit(0)).alias("c"))
    )
    cum = grid.select(
        "source",
        "ns",
        "n",
        "cc",
        F.sum("c")
        .over(Window.partitionBy("source").orderBy("n"))
        .cast("long")
        .alias("cs"),
    )
    d = cum.crossJoin(F.broadcast(nc)).select(
        "source",
        "ns",
        "n",
        F.abs(F.col("cs") * F.col("nc") - F.col("cc") * F.col("ns")).alias("dnum"),
    )
    mx = d.groupBy("source", "ns").agg(
        F.max("dnum").cast("long").alias("ks_num"),
        F.min_by(
            "n", F.struct((-F.col("dnum")).alias("d"), F.col("n").alias("n"))
        )
        .cast("long")
        .alias("at_length"),
    )
    return mx.crossJoin(F.broadcast(nc)).select(
        "source",
        F.col("ns").alias("n_docs"),
        "ks_num",
        "at_length",
        rnd(F.col("ks_num") * 1.0 / (F.col("ns") * F.col("nc")), 6).alias("ks_stat"),
    )


@query(
    "j_mutual_info",
    oracle=f"""
    WITH jc AS (SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS c
                FROM documents GROUP BY lang, source),
    lm AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS cl FROM jc GROUP BY lang),
    sm AS (SELECT source, CAST(SUM(c) AS BIGINT) AS cs FROM jc GROUP BY source),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM jc),
    term AS (SELECT (jc.c * 1.0 / t.n)
                      * ln((jc.c * 1.0 / t.n)
                           / ((lm.cl * 1.0 / t.n) * (sm.cs * 1.0 / t.n)))
                      AS mi_t,
                    (jc.c * 1.0 / t.n) * ln(lm.cl * 1.0 / t.n) AS hl_t,
                    (jc.c * 1.0 / t.n) * ln(sm.cs * 1.0 / t.n) AS hs_t
             FROM jc JOIN lm USING (lang) JOIN sm USING (source)
             CROSS JOIN tot t),
    mi AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cells, SUM(mi_t) AS mi,
                  -SUM(hl_t) AS h_lang, -SUM(hs_t) AS h_source
           FROM term)
    SELECT n_cells, {sql_rnd("mi", 6)} AS mi_nats,
           {sql_rnd("h_lang", 6)} AS h_lang,
           {sql_rnd("h_source", 6)} AS h_source,
           {sql_rnd("CASE WHEN least(h_lang, h_source) > 0"
                    " THEN mi / least(h_lang, h_source)"
                    " ELSE 0.0 END", 6)} AS nmi
    FROM mi
    """,
)
def j_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between the lang and source labels —
    I(L;S) = Σ p(l,s)·ln(p(l,s)/(p(l)·p(s))) in nats, with both
    marginal entropies and the normalized form min-entropy NMI — the
    mixture-design audit that says whether languages are concentrated
    in particular sources (high NMI = dropping a source silently drops
    a language; NMI ≈ 0 = the two axes can be rebalanced
    independently, j_domain_mix's implicit assumption).

    Determinism: every probability is a ratio of BIGINT counts; the
    ln terms sum over the |langs|×|sources| CELL table (metadata, not
    corpus rows), and the three sums round at 1e-6 (the j_kl_sources
    rule). Both entropies come from the SAME cell sum via
    H(L) = −Σ_cells p(l,s)·ln p(l) (marginalization is exact, and one
    summation shape covers all three statistics), so the whole query
    is ONE corpus hash agg on (lang, source) — map-side partial,
    digest-only shuffle — plus broadcast-scale marginal joins and a
    single-row final rollup; the 1-row total cross-joins in
    (allowlisted BNLJ). Output is a single audit row at any corpus
    size."""
    t = load(spark, sf_dir)
    jc = t.documents.groupBy("lang", "source").agg(
        F.count("*").cast("long").alias("c")
    )
    jc.persist()  # consumers: both marginals, total, term table
    lm = jc.groupBy("lang").agg(F.sum("c").cast("long").alias("cl"))
    sm = jc.groupBy("source").agg(F.sum("c").cast("long").alias("cs"))
    tot = jc.agg(F.sum("c").cast("long").alias("n"))
    pj = F.col("c") * 1.0 / F.col("n")
    pl = F.col("cl") * 1.0 / F.col("n")
    ps = F.col("cs") * 1.0 / F.col("n")
    term = (
        jc.join(F.broadcast(lm), "lang")
        .join(F.broadcast(sm), "source")
        .crossJoin(F.broadcast(tot))
        .select(
            (pj * F.log(pj / (pl * ps))).alias("mi_t"),
            (pj * F.log(pl)).alias("hl_t"),
            (pj * F.log(ps)).alias("hs_t"),
        )
    )
    mi = term.agg(
        F.count("*").cast("long").alias("n_cells"),
        F.sum("mi_t").alias("mi"),
        (-F.sum("hl_t")).alias("h_lang"),
        (-F.sum("hs_t")).alias("h_source"),
    )
    hmin = F.least(F.col("h_lang"), F.col("h_source"))
    return mi.select(
        "n_cells",
        rnd(F.col("mi"), 6).alias("mi_nats"),
        rnd(F.col("h_lang"), 6).alias("h_lang"),
        rnd(F.col("h_source"), 6).alias("h_source"),
        rnd(F.when(hmin > 0, F.col("mi") / hmin).otherwise(0.0), 6).alias("nmi"),
    )


# Bigram conditional entropy: the sequential-structure companion to
# j_entropy's unigram (bag-of-words) rate. Public formulation: Shannon
# 1951's entropy-rate estimate from n-gram statistics.
_BIGRAM_SQL = """
    SELECT source,
           unnest(list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
                                 i -> toks[i] || ' ' || toks[i+1])) AS g
    FROM (SELECT source, string_split(text, ' ') AS toks FROM documents)
"""


@query(
    "j_entropy_rate",
    oracle=f"""
    WITH bg AS ({_BIGRAM_SQL}),
    c12 AS (SELECT source, g, split_part(g, ' ', 1) AS w1,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM bg GROUP BY source, g),
    c1 AS (SELECT source, w1, CAST(SUM(c) AS BIGINT) AS cp
           FROM c12 GROUP BY source, w1),
    agg AS (SELECT c12.source,
                   CAST(SUM(c12.c) AS BIGINT) AS n_bigrams,
                   CAST(COUNT(*) AS BIGINT) AS distinct_bigrams,
                   SUM(c12.c * (ln(CAST(c1.cp AS DOUBLE))
                                - ln(CAST(c12.c AS DOUBLE)))) AS h_num
            FROM c12 JOIN c1 ON c1.source = c12.source AND c1.w1 = c12.w1
            GROUP BY c12.source),
    pfx AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS distinct_prefixes
            FROM c1 GROUP BY source)
    SELECT a.source, a.n_bigrams, a.distinct_bigrams, p.distinct_prefixes,
           {sql_rnd("a.h_num / a.n_bigrams", 6)} AS cond_entropy
    FROM agg a JOIN pfx p USING (source)
    """,
)
def j_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source bigram conditional entropy H(w₂|w₁) in nats — the
    entropy-RATE estimate (Shannon 1951, public): how predictable the
    next token is given the current one. Template/boilerplate text
    scores far below its unigram entropy (j_entropy) because the
    sequences repeat even when the vocabulary doesn't — the gap
    H(w) − H(w₂|w₁) is the repetition signal n-gram novelty audits
    threshold on, computed here from counts alone.

    Identity: H = Σ c₁₂·(ln c₁ − ln c₁₂) / N over bigram types, where
    c₁ is the count of w₁ as a bigram prefix — all counts exact
    BIGINTs; ln evaluates on identical integers in both engines (the
    j_zipf_fit precedent) and the term sum is of UNROUNDED libm values
    (order-boundary odds ~1e-10/row — the documented convention),
    rounded 1e-6 only at display.

    Plan: one bigram explode → (source, bigram) hash agg, a prefix
    re-agg (the gini histogram discipline — shuffles carry counts,
    never text beyond the gram keys), one (source, w1)-keyed join, and
    a source rollup. No windows, no corpus sort."""
    t = load(spark, sf_dir)
    bg = t.documents.select(
        "source", F.explode(ngrams_col("text", 2)).alias("g")
    )
    c12 = (
        bg.groupBy("source", "g")
        .agg(F.count("*").cast("long").alias("c"))
        .select("source", F.substring_index("g", " ", 1).alias("w1"), "c")
    )
    c1 = c12.groupBy("source", "w1").agg(F.sum("c").cast("long").alias("cp"))
    agg = (
        c12.join(c1, ["source", "w1"])
        .groupBy("source")
        .agg(
            F.sum("c").cast("long").alias("n_bigrams"),
            F.count("*").cast("long").alias("distinct_bigrams"),
            F.sum(
                F.col("c")
                * (F.log(F.col("cp").cast("double")) - F.log(F.col("c").cast("double")))
            ).alias("h_num"),
        )
    )
    pfx = c1.groupBy("source").agg(F.count("*").cast("long").alias("distinct_prefixes"))
    return agg.join(pfx, "source").select(
        "source",
        "n_bigrams",
        "distinct_bigrams",
        "distinct_prefixes",
        rnd(F.col("h_num") / F.col("n_bigrams"), 6).alias("cond_entropy"),
    )


@query(
    "j_fertility_audit",
    oracle=f"""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(SUM(octet_length(CAST(text AS BLOB))) AS BIGINT) AS sum_bytes,
           {sql_rnd("SUM(n_chars) * 1.0 / SUM(len(string_split(text, ' ')))", 6)}
             AS chars_per_token,
           {sql_rnd("SUM(octet_length(CAST(text AS BLOB))) * 1.0"
                    " / SUM(len(string_split(text, ' ')))", 6)} AS bytes_per_token,
           {sql_rnd("SUM(len(string_split(text, ' '))) * 1.0 / COUNT(*)", 6)}
             AS tokens_per_doc
    FROM documents GROUP BY lang
    """,
)
def j_fertility_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language tokenizer-fertility audit: chars/token, bytes/token
    (UTF-8 octets — the number a byte-level BPE actually pays) and
    tokens/doc. THE pre-training budget table: sequence-length and
    cost planning happen in tokens, storage and network in bytes, and
    the ratio between them varies by language — a lang whose
    bytes/token drifts up after a crawl refresh is accumulating
    multi-byte or concatenated junk. Exact BIGINT sums (token counts
    via size(split) — no explode, text never leaves the map stage);
    each display ratio is ONE division of exact integers (rnd 1e-6),
    so there is no accumulation-order exposure anywhere.

    Plan: a narrow map over the documents scan and ONE |langs|-row
    hash agg with map-side partials — the cheapest possible shape."""
    t = load(spark, sf_dir)
    n_tok = F.size(tokens_col("text")).cast("long")
    return (
        t.documents.select(
            "lang",
            n_tok.alias("nt"),
            F.col("n_chars").cast("long").alias("nc"),
            F.octet_length("text").cast("long").alias("nb"),
        )
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("nt").cast("long").alias("n_tokens"),
            F.sum("nc").cast("long").alias("sum_chars"),
            F.sum("nb").cast("long").alias("sum_bytes"),
            rnd(F.sum("nc") * 1.0 / F.sum("nt"), 6).alias("chars_per_token"),
            rnd(F.sum("nb") * 1.0 / F.sum("nt"), 6).alias("bytes_per_token"),
            rnd(F.sum("nt") * 1.0 / F.count("*"), 6).alias("tokens_per_doc"),
        )
    )


@query(
    "j_wasserstein_lengths",
    oracle="""
    WITH dl AS (SELECT source,
                       CAST(len(string_split(text, ' ')) AS BIGINT) AS n
                FROM documents),
    cl AS (SELECT n, CAST(COUNT(*) AS BIGINT) AS c FROM dl GROUP BY n),
    ctot AS (SELECT CAST(SUM(c) AS BIGINT) AS nc FROM cl),
    ccum AS (SELECT n, CAST(SUM(c) OVER (ORDER BY n) AS BIGINT) AS cc,
                    LEAD(n) OVER (ORDER BY n) - n AS gap
             FROM cl),
    sl AS (SELECT source, n, CAST(COUNT(*) AS BIGINT) AS c
           FROM dl GROUP BY source, n),
    stot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS ns
             FROM sl GROUP BY source),
    grid AS (SELECT st.source, st.ns, cc.n, cc.cc, cc.gap,
                    COALESCE(sl.c, 0) AS c
             FROM stot st CROSS JOIN ccum cc
             LEFT JOIN sl ON sl.source = st.source AND sl.n = cc.n),
    cum AS (SELECT source, ns, n, cc, gap,
                   CAST(SUM(c) OVER (PARTITION BY source ORDER BY n)
                        AS BIGINT) AS cs
            FROM grid),
    w AS (SELECT source, ns,
                 CAST(SUM(abs(cs * ct.nc - cc * ns) * COALESCE(gap, 0))
                      AS BIGINT) AS w1_num
          FROM cum CROSS JOIN ctot ct GROUP BY source, ns)
    SELECT source, ns AS n_docs, w1_num,
           FLOOR(w1_num * 1.0 / (ns * ct.nc) * 1000000 + 0.5) / 1000000
             AS w1_tokens
    FROM w CROSS JOIN ctot ct
    """,
)
def j_wasserstein_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Earth-mover (Wasserstein-1) distance between each source's
    document-length distribution and the whole corpus, in TOKEN units —
    the INTEGRAL twin of j_ks_lengths' max-gap: W1 = ∫|F_s − F_c| dx
    over the length axis. KS fires on one sharp step (a truncation
    cliff); W1 fires on broad mass displacement KS under-weights (a
    source drifting 20 tokens longer everywhere moves W1 by ~20 while
    KS barely moves) — drift dashboards want both numbers from the
    same scan (Ramdas et al. 2017, public, for the CDF-integral form).

    EXACT integer arithmetic end-to-end (the j_ks_lengths discipline):
    both ECDFs cross-multiply to |cs·N − cc·n_s|, each grid step is
    weighted by its gap to the next distinct length, and the weighted
    BIGINT sum is order-free; the only float op is the final display
    division by n_s·N. The step function is piecewise-constant between
    corpus-distinct lengths, so the grid integral is the exact
    integral, not a quadrature.

    Plan: shares j_ks_lengths' shape — one narrow map (text never
    leaves the scan), two hash aggs, then everything runs on the
    METADATA-sized distinct-length grid (bounded by the length domain):
    broadcast grid cross sources, one per-source cumulative window, a
    per-source rollup. At extreme corpus counts the cs·N product
    upgrades to DECIMAL(38,0), same shape."""
    t = load(spark, sf_dir)
    dl = t.documents.select(
        "source", F.size(tokens_col("text")).cast("long").alias("n")
    )
    cl = dl.groupBy("n").agg(F.count("*").cast("long").alias("c"))
    wn = Window.orderBy("n")
    ccum = cl.select(
        "n",
        F.sum("c").over(wn).cast("long").alias("cc"),
        (F.lead("n").over(wn) - F.col("n")).alias("gap"),
    )
    nc = cl.agg(F.sum("c").cast("long").alias("nc"))
    sl = dl.groupBy("source", "n").agg(F.count("*").cast("long").alias("c"))
    stot = sl.groupBy("source").agg(F.sum("c").cast("long").alias("ns"))
    grid = (
        stot.crossJoin(F.broadcast(ccum))
        .join(sl, ["source", "n"], "left")
        .select(
            "source", "ns", "n", "cc", "gap", F.coalesce("c", F.lit(0)).alias("c")
        )
    )
    cum = grid.select(
        "source",
        "ns",
        "n",
        "cc",
        "gap",
        F.sum("c")
        .over(Window.partitionBy("source").orderBy("n"))
        .cast("long")
        .alias("cs"),
    )
    w = (
        cum.crossJoin(F.broadcast(nc))
        .groupBy("source", "ns")
        .agg(
            F.sum(
                F.abs(F.col("cs") * F.col("nc") - F.col("cc") * F.col("ns"))
                * F.coalesce("gap", F.lit(0))
            )
            .cast("long")
            .alias("w1_num")
        )
    )
    return w.crossJoin(F.broadcast(nc)).select(
        "source",
        F.col("ns").alias("n_docs"),
        "w1_num",
        rnd(F.col("w1_num") * 1.0 / (F.col("ns") * F.col("nc")), 6).alias(
            "w1_tokens"
        ),
    )


@query(
    "j_heaps_law",
    oracle=f"""
    WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS w
                 FROM documents),
    sv AS (SELECT source,
                  CAST(COUNT(*) AS BIGINT) AS n_tokens,
                  CAST(COUNT(DISTINCT w) AS BIGINT) AS n_types
           FROM tok GROUP BY source),
    pts AS (SELECT source, n_tokens, n_types,
                   ln(CAST(n_tokens AS DOUBLE)) AS x,
                   ln(CAST(n_types AS DOUBLE)) AS y
            FROM sv),
    fit AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS sx, SUM(y) AS sy,
                   SUM(x * y) AS sxy, SUM(x * x) AS sxx
            FROM pts)
    SELECT p.source, p.n_tokens, p.n_types,
           {sql_rnd("(f.n * f.sxy - f.sx * f.sy) / (f.n * f.sxx - f.sx * f.sx)", 6)}
             AS heaps_beta,
           {sql_rnd("(f.sy - (f.n * f.sxy - f.sx * f.sy) / (f.n * f.sxx - f.sx * f.sx) * f.sx) / f.n", 6)}
             AS ln_k,
           {sql_rnd("p.y - ((f.sy - (f.n * f.sxy - f.sx * f.sy) / (f.n * f.sxx - f.sx * f.sx) * f.sx) / f.n + (f.n * f.sxy - f.sx * f.sy) / (f.n * f.sxx - f.sx * f.sx) * p.x)", 6)}
             AS resid
    FROM pts p CROSS JOIN fit f
    """,
)
def j_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit of vocabulary growth: OLS of ln(types) on
    ln(tokens) across sources gives the growth exponent β (natural
    text ~0.4-0.6; Heaps 1978, public) and ln K, plus each source's
    RESIDUAL from the fitted line — the per-source audit number. A
    source whose vocabulary grows too slowly for its token mass
    (negative residual) is template/boilerplate-heavy; one above the
    line is noisy/OCR-damaged — the growth-curve companion to
    j_zipf_fit's rank-frequency slope, answering "is this source's
    vocabulary SIZE consistent with its size" where zipf answers "is
    its head shape natural".

    Determinism (the j_zipf_fit rule): n_tokens/n_types are exact
    BIGINTs, x/y are single libm calls on those integers —
    bit-identical per row — and the |sources|-term sufficient sums
    plus the final fold round at 1e-6 on both engines.

    Plan: one explode feeding ONE (source, token) partial-agg pair —
    count + distinct-count share the shuffle — then everything runs on
    the |sources|-row metadata frame (1-row broadcast fit joined
    back). The corpus explode happens once; text never leaves the
    scan."""
    t = load(spark, sf_dir)
    sv = (
        t.documents.select("source", F.explode(tokens_col("text")).alias("w"))
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.countDistinct("w").cast("long").alias("n_types"),
        )
    )
    pts = sv.select(
        "source",
        "n_tokens",
        "n_types",
        F.log(F.col("n_tokens").cast("double")).alias("x"),
        F.log(F.col("n_types").cast("double")).alias("y"),
    )
    fit = pts.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    j = pts.crossJoin(F.broadcast(fit))
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    slope = (n * F.col("sxy") - sx * sy) / (n * F.col("sxx") - sx * sx)
    intercept = (sy - slope * sx) / n
    return j.select(
        "source",
        "n_tokens",
        "n_types",
        rnd(slope, 6).alias("heaps_beta"),
        rnd(intercept, 6).alias("ln_k"),
        rnd(F.col("y") - (intercept + slope * F.col("x")), 6).alias("resid"),
    )


# Hill estimator: tail sample size (top-_HILL_K order statistics of the
# token-frequency distribution, plus the (k+1)-th as the threshold).
# 20, not the zipf 50: the estimator needs k+1 DISTINCT token types per
# source, and the fixture vocabulary is ~31 types/source at every SF —
# k=50 made the relation empty-by-construction (verified tri-scale).
_HILL_K = 20


@query(
    "j_hill_tail",
    oracle=f"""
    WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS w
                 FROM documents),
    vc AS (SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
           FROM tok GROUP BY source, w),
    rk AS (SELECT source, c,
                  CAST(ROW_NUMBER() OVER (PARTITION BY source
                                          ORDER BY c DESC, w) AS BIGINT) AS r
           FROM vc),
    s AS (SELECT source,
                 CAST(SUM(CASE WHEN r <= {_HILL_K} THEN 1 ELSE 0 END)
                      AS BIGINT) AS k_used,
                 SUM(CASE WHEN r <= {_HILL_K} THEN ln(CAST(c AS DOUBLE)) END)
                   AS sum_ln_top,
                 MAX(CASE WHEN r = {_HILL_K} + 1 THEN ln(CAST(c AS DOUBLE)) END)
                   AS ln_thresh
          FROM rk WHERE r <= {_HILL_K} + 1 GROUP BY source)
    SELECT source, k_used,
           {sql_rnd("sum_ln_top / k_used - ln_thresh", 6)} AS hill_xi,
           {sql_rnd("1.0 / (sum_ln_top / k_used - ln_thresh)", 6)} AS hill_alpha
    FROM s WHERE ln_thresh IS NOT NULL
    """,
)
def j_hill_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the token-frequency tail index per source
    (Hill 1975, public): ξ̂ = mean(ln c_(1..k)) − ln c_(k+1) over the
    top-k frequency order statistics, α̂ = 1/ξ̂. Zipfian text has
    α ≈ 1/zipf-slope; a COLLAPSED tail (α runs high) means the head
    dominates — boilerplate mass — while heavy α < 1 signals
    degenerate token inflation. This is the estimator drift monitors
    prefer over the OLS zipf fit because it has a known asymptotic
    variance (ξ²/k) to alarm against; sources without k+1 distinct
    tokens drop out (the estimator is undefined there).

    Determinism: counts rank by (c desc, token) — a total order — and
    the estimator only consumes COUNT VALUES at rank positions, which
    ties cannot perturb. ln runs per-row on identical BIGINTs; the
    k-term sum and the final fold round at 1e-6 (the j_zipf_fit rule).

    Plan: identical scale shape to j_zipf_fit — explode → (source,
    token) hash agg, and the r ≤ k+1 filter sits directly on the
    row_number window so the map side keeps ≤ k+1 rows per source
    BEFORE the source exchange (partial WindowGroupLimit); the rollup
    runs on ≤ (k+1)·|sources| metadata rows."""
    t = load(spark, sf_dir)
    vc = (
        t.documents.select("source", F.explode(tokens_col("text")).alias("w"))
        .groupBy("source", "w")
        .agg(F.count("*").cast("long").alias("c"))
    )
    rk = vc.select(
        "source",
        "c",
        F.row_number()
        .over(Window.partitionBy("source").orderBy(F.col("c").desc(), F.col("w")))
        .cast("long")
        .alias("r"),
    )
    lnc = F.log(F.col("c").cast("double"))
    s = (
        rk.where(F.col("r") <= _HILL_K + 1)
        .groupBy("source")
        .agg(
            F.sum(F.when(F.col("r") <= _HILL_K, 1).otherwise(0))
            .cast("long")
            .alias("k_used"),
            F.sum(F.when(F.col("r") <= _HILL_K, lnc)).alias("sum_ln_top"),
            F.max(F.when(F.col("r") == _HILL_K + 1, lnc)).alias("ln_thresh"),
        )
    )
    xi = F.col("sum_ln_top") / F.col("k_used") - F.col("ln_thresh")
    return s.where(F.col("ln_thresh").isNotNull()).select(
        "source",
        "k_used",
        rnd(xi, 6).alias("hill_xi"),
        rnd(1.0 / xi, 6).alias("hill_alpha"),
    )


# Coverage curve: cumulative occurrence mass of the top-k bigram TYPES
# at these literal k marks (the vocab-size sizing grid).
_COVERAGE_GRID = (100, 300, 1000, 3000, 10000)


@query(
    "j_ngram_coverage",
    oracle=f"""
    WITH bg AS (SELECT unnest(list_transform(
                    range(1, greatest(len(toks) - 1, 0) + 1),
                    i -> toks[i] || ' ' || toks[i+1])) AS term
                FROM (SELECT string_split(text, ' ') AS toks FROM documents)),
    bc AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS c FROM bg GROUP BY term),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
                   CAST(COUNT(*) AS BIGINT) AS v FROM bc),
    rk AS (SELECT c, CAST(ROW_NUMBER() OVER (ORDER BY c DESC, term) AS BIGINT)
                       AS r
           FROM bc),
    cum AS (SELECT r, CAST(SUM(c) OVER (ORDER BY r) AS BIGINT) AS cc
            FROM rk WHERE r <= {max(_COVERAGE_GRID)}),
    grid AS (SELECT CAST(unnest(ARRAY{list(_COVERAGE_GRID)}) AS BIGINT) AS k)
    SELECT g.k,
           CAST(LEAST(g.k, t.v) AS BIGINT) AS n_types_used,
           CAST(COALESCE(MAX(cum.cc), 0) AS BIGINT) AS covered,
           t.n AS n_occurrences,
           FLOOR(COALESCE(MAX(cum.cc), 0) * 1.0 / t.n * 1000000 + 0.5)
             / 1000000 AS coverage
    FROM grid g CROSS JOIN tot t
    LEFT JOIN cum ON cum.r <= g.k
    GROUP BY g.k, t.v, t.n
    """,
)
def j_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-coverage curve: the fraction of all corpus bigram
    OCCURRENCES covered by the top-k bigram TYPES, at a literal k
    grid — the number that sizes a phrase vocabulary / merges budget
    (the inverse question of j_topp_vocab, which asks how many types
    a mass threshold needs; both read off the same ranked histogram).
    The curve's knee is where enlarging the vocabulary stops paying.

    EXACT integers end-to-end: coverage numerators are cumulative
    BIGINT counts at rank positions of the (count desc, term) total
    order; the single float op is the display ratio (1e-6 floor form).

    Plan: ONE bigram explode collapsed by a type hash agg with
    map-side partials; the top-{max(_COVERAGE_GRID)} selection is a
    heap TakeOrderedAndProject (per-partition bounded heaps merged on
    the driver — unpartitioned rank windows get NO WindowGroupLimit,
    measured r11, so orderBy().limit() is the form that keeps the map
    side bounded); the rank/cumsum windows, grid join, and rollup all
    run AFTER it, on ≤ {max(_COVERAGE_GRID)} metadata rows. The
    |grid|-row output is dashboard-sized at any corpus scale."""
    t = load(spark, sf_dir)
    bc = (
        t.documents.select(F.explode(ngrams_col("text", 2)).alias("term"))
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("c"))
    )
    tot = bc.agg(
        F.sum("c").cast("long").alias("n"), F.count("*").cast("long").alias("v")
    )
    top = bc.orderBy(F.col("c").desc(), F.col("term")).limit(max(_COVERAGE_GRID))
    rk = top.select(
        "c",
        F.row_number()
        .over(Window.orderBy(F.col("c").desc(), F.col("term")))
        .cast("long")
        .alias("r"),
    )
    cum = rk.select(
        "r", F.sum("c").over(Window.orderBy("r")).cast("long").alias("cc")
    )
    grid = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(k).cast("long") for k in _COVERAGE_GRID])
        ).alias("k")
    )
    return (
        grid.crossJoin(F.broadcast(tot))
        .join(F.broadcast(cum), F.col("r") <= F.col("k"), "left")
        .groupBy("k", "v", "n")
        .agg(F.coalesce(F.max("cc"), F.lit(0)).cast("long").alias("covered"))
        .select(
            "k",
            F.least(F.col("k"), F.col("v")).cast("long").alias("n_types_used"),
            "covered",
            F.col("n").alias("n_occurrences"),
            rnd(F.col("covered") * 1.0 / F.col("n"), 6).alias("coverage"),
        )
    )


@query(
    "j_perplexity_eval",
    oracle=f"""
    WITH bg AS ({_BIGRAM_SQL}),
    sb AS (SELECT source, g, CAST(COUNT(*) AS BIGINT) AS tf
           FROM bg GROUP BY source, g),
    gb AS (SELECT g, CAST(SUM(tf) AS BIGINT) AS c FROM sb GROUP BY g),
    gp AS (SELECT split_part(g, ' ', 1) AS w1, CAST(SUM(c) AS BIGINT) AS cp
           FROM gb GROUP BY 1),
    v AS (SELECT CAST(COUNT(DISTINCT split_part(g, ' ', 2)) AS BIGINT) AS v
          FROM gb),
    scored AS (SELECT sb.source, sb.tf,
                      ln((gb.c + 1.0) / (gp.cp + v.v)) AS lp
               FROM sb JOIN gb ON gb.g = sb.g
               JOIN gp ON gp.w1 = split_part(sb.g, ' ', 1)
               CROSS JOIN v),
    agg AS (SELECT source,
                   CAST(SUM(tf) AS BIGINT) AS n_bigrams,
                   CAST(FLOOR((-SUM(tf * lp) / SUM(tf)) * 1000000 + 0.5)
                        AS BIGINT) AS ce6
            FROM scored GROUP BY source)
    SELECT source, n_bigrams,
           ce6 / 1000000.0 AS cross_entropy,
           {sql_rnd("exp(ce6 / 1000000.0)", 6)} AS perplexity
    FROM agg
    """,
)
def j_perplexity_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source perplexity under the GLOBAL add-one-smoothed bigram
    LM — the language-model FIT audit (Jelinek et al. 1977, public):
    j_entropy_rate scores each source under its OWN bigram statistics;
    this scores it under the corpus-wide model, so the spread across
    sources is the mixture-design signal (a source the global model
    predicts badly is out-of-domain mass — the sequential
    complement of j_kl_sources' unigram divergence, and the number
    data-mixing papers threshold on when down-weighting a domain).

    Identity: H_s = −Σ tf·ln((c+1)/(c₁·+V)) / N_s over the source's
    bigram TYPES (tf-weighted type sum — the j_chargram_confusion
    collapse), PPL = exp(H ROUNDED): the entropy sum floors to the
    1e-6 scaled-BIGINT grid FIRST and exp() is applied to that grid
    value — so the one query-time exp() in the registry receives an
    IDENTICAL double on both engines instead of an order-dependent
    float sum (the banned amplify-then-round shape: PPL·δH can cross
    a 1e-6 boundary on a 1-ulp H difference). All counts exact
    BIGINTs; ln on identical doubles both engines.

    Plan: ONE bigram explode → (source, bigram) hash agg; the global
    model derives from a RE-AGG of those type rows (no second corpus
    pass — the sum of per-source tf IS the global count), then prefix
    totals and vocab are metadata-scale re-aggs; scoring is an
    equi-join on the gram key over type rows with map-side partials
    into the source rollup."""
    t = load(spark, sf_dir)
    sb = (
        t.documents.select("source", F.explode(ngrams_col("text", 2)).alias("g"))
        .groupBy("source", "g")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    gb = sb.groupBy("g").agg(F.sum("tf").cast("long").alias("c"))
    gp = (
        gb.select(F.substring_index("g", " ", 1).alias("w1"), "c")
        .groupBy("w1")
        .agg(F.sum("c").cast("long").alias("cp"))
    )
    v = gb.agg(
        F.countDistinct(F.substring_index("g", " ", -1)).cast("long").alias("v")
    )
    scored = (
        sb.join(gb, "g")
        .withColumn("w1", F.substring_index("g", " ", 1))
        .join(gp, "w1")
        .crossJoin(F.broadcast(v))
        .select(
            "source",
            "tf",
            F.log((F.col("c") + 1.0) / (F.col("cp") + F.col("v"))).alias("lp"),
        )
    )
    h = -F.sum(F.col("tf") * F.col("lp")) / F.sum("tf")
    agg = scored.groupBy("source").agg(
        F.sum("tf").cast("long").alias("n_bigrams"),
        F.floor(h * 1000000 + F.lit(0.5)).cast("long").alias("ce6"),
    )
    ce = F.col("ce6") / F.lit(1000000.0)
    return agg.select(
        "source",
        "n_bigrams",
        ce.alias("cross_entropy"),
        rnd(F.exp(ce), 6).alias("perplexity"),
    )


@query(
    "j_hapax_rate",
    oracle=f"""
    WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS w
                 FROM documents),
    vc AS (SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
           FROM tok GROUP BY source, w)
    SELECT source,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
           {sql_rnd("SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*)", 6)}
             AS hapax_type_rate,
           {sql_rnd("SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1.0 / SUM(c)", 6)}
             AS hapax_token_rate
    FROM vc GROUP BY source
    """,
)
def j_hapax_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hapax-legomenon rate per source: the share of vocabulary TYPES
    (and of token mass) that occurs exactly once — the classic OCR /
    tokenizer-damage tripwire (clean prose runs ~40-60% hapax types
    by Zipf; OCR noise and concatenation bugs push it far higher, and
    template text far lower). The fourth corner of the distribution
    panel: zipf = head slope, hill = tail index, heaps = growth,
    hapax = the frequency-1 mass both tails meet at — all four read
    off the SAME (source, token) count relation.

    EXACT integers end-to-end: hapax counts are conditional BIGINT
    sums over type counts; the two rates are one rounded division
    each.

    Plan: one explode → (source, token) hash agg with map-side
    partials → ONE source rollup; |sources| output rows at any
    corpus scale."""
    t = load(spark, sf_dir)
    vc = (
        t.documents.select("source", F.explode(tokens_col("text")).alias("w"))
        .groupBy("source", "w")
        .agg(F.count("*").cast("long").alias("c"))
    )
    hapax = F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
    return vc.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_types"),
        hapax.cast("long").alias("n_hapax"),
        rnd(hapax * 1.0 / F.count("*"), 6).alias("hapax_type_rate"),
        rnd(hapax * 1.0 / F.sum("c"), 6).alias("hapax_token_rate"),
    )


@query(
    "j_vocab_jaccard_sources",
    oracle="""
    WITH sv AS (SELECT DISTINCT source, unnest(string_split(text, ' ')) AS w
                FROM documents),
    sz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS v FROM sv GROUP BY source),
    inter AS (SELECT a.source AS src_a, b.source AS src_b,
                     CAST(COUNT(*) AS BIGINT) AS n_common
              FROM sv a JOIN sv b ON a.w = b.w AND a.source < b.source
              GROUP BY a.source, b.source)
    SELECT i.src_a, i.src_b, za.v AS v_a, zb.v AS v_b, i.n_common,
           FLOOR(i.n_common * 1.0 / (za.v + zb.v - i.n_common)
                 * 1000000 + 0.5) / 1000000 AS vocab_jaccard
    FROM inter i
    JOIN sz za ON za.source = i.src_a
    JOIN sz zb ON zb.source = i.src_b
    """,
)
def j_vocab_jaccard_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary Jaccard between sources — the source-level
    similarity matrix mixture design reads before merging or
    re-weighting domains (two sources with near-identical vocabularies
    are one domain for sampling purposes; j_kl_sources compares each
    source to the CORPUS, this compares sources to EACH OTHER). Exact
    set semantics over the deduped (source, token) relation.

    EXACT integers: intersection sizes are counts over an equi-join
    of deduped type rows; |A∪B| = |A|+|B|−|A∩B|; one rounded division
    per pair.

    Plan: one explode collapsed by DISTINCT (source, token) — the
    shuffle carries type rows, not occurrences — then a token-keyed
    self-join whose per-token fan-out is ≤|sources|² (bounded by the
    source count, not the corpus; a stop-word token contributes one
    row per source pair, same as any other), and a |sources|²-row
    rollup joined to the size table. At 100 TB token keys would hash
    to 8-byte xxhash64 digests first (the Jaccard-join rule in
    SCALE.md §4)."""
    t = load(spark, sf_dir)
    sv = (
        t.documents.select("source", F.explode(tokens_col("text")).alias("w"))
        .distinct()
    )
    sz = sv.groupBy("source").agg(F.count("*").cast("long").alias("v"))
    a, b = sv.alias("a"), sv.alias("b")
    inter = (
        a.join(b, (F.col("a.w") == F.col("b.w")) & (F.col("a.source") < F.col("b.source")))
        .groupBy(F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b"))
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    za = sz.select(F.col("source").alias("src_a"), F.col("v").alias("v_a"))
    zb = sz.select(F.col("source").alias("src_b"), F.col("v").alias("v_b"))
    return (
        inter.join(F.broadcast(za), "src_a")
        .join(F.broadcast(zb), "src_b")
        .select(
            "src_a",
            "src_b",
            "v_a",
            "v_b",
            "n_common",
            rnd(
                F.col("n_common") * 1.0
                / (F.col("v_a") + F.col("v_b") - F.col("n_common")),
                6,
            ).alias("vocab_jaccard"),
        )
    )


def _gram_entropy_sql(n: int) -> str:
    """One UNION leg of the n-gram entropy curve: DuckDB positional
    n-grams via list_transform over the split-token range (the
    ngrams_col twin), collapsed to type counts."""
    if n == 1:
        g = "unnest(string_split(text, ' '))"
        return f"""
    SELECT 1 AS n, {g} AS g FROM documents"""
    joins = " || ' ' || ".join(f"toks[i+{k}]" for k in range(n))
    return f"""
    SELECT {n} AS n, unnest(list_transform(
             range(1, greatest(len(toks) - {n - 1}, 0) + 1),
             i -> {joins})) AS g
    FROM (SELECT string_split(text, ' ') AS toks FROM documents)"""


@query(
    "j_ngram_entropy_curve",
    oracle=f"""
    WITH grams AS ({_gram_entropy_sql(1)} UNION ALL {_gram_entropy_sql(2)}
                   UNION ALL {_gram_entropy_sql(3)}),
    tc AS (SELECT n, g, CAST(COUNT(*) AS BIGINT) AS c
           FROM grams GROUP BY n, g),
    agg AS (SELECT n, CAST(SUM(c) AS BIGINT) AS n_grams,
                   CAST(COUNT(*) AS BIGINT) AS n_types,
                   SUM(c * ln(c)) AS s
            FROM tc GROUP BY n),
    ent AS (SELECT n, n_grams, n_types,
                   ln(n_grams) - s / n_grams AS h
            FROM agg),
    -- round ONCE onto the 1e-6 grid, then derive every display ratio
    -- from the rounded value: IEEE divide/multiply of identical grid
    -- doubles is correctly rounded, so no column divides two UNROUNDED
    -- order-dependent libm sums (r12 verdict low)
    ent6 AS (SELECT n, n_grams, n_types, {sql_rnd('h', 6)} AS e FROM ent),
    base AS (SELECT e AS e1 FROM ent6 WHERE n = 1)
    SELECT ent6.n, n_grams, n_types,
           e AS entropy,
           {sql_rnd('e / ent6.n', 6)} AS per_token_entropy,
           {sql_rnd('1.0 - e / (ent6.n * b.e1)', 6)} AS redundancy
    FROM ent6 CROSS JOIN base b
    """,
)
def j_ngram_entropy_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus n-gram entropy curve for n = 1, 2, 3 — Shannon's
    classic redundancy ladder (Shannon 1951, public): H_n/n falls as
    context grows, and redundancy = 1 − H_n/(n·H_1) measures how much
    of the corpus is predictable from short context. Template-heavy
    or boilerplate corpora show redundancy jumping at n=2 (phrases
    repeat verbatim); healthy prose climbs gently. The curve is the
    corpus-level complement of j_entropy (per-doc) and the model-free
    sibling of j_perplexity_eval's fitted-LM number.

    Identity per n: H = ln(N) − (Σ c·ln c)/N over type counts — the
    j_entropy discipline, rounded 1e-6 at display (ln on identical
    BIGINTs; the type sum is the accepted unrounded-libm-term class).
    per_token_entropy and redundancy are derived from the ALREADY
    ROUNDED grid entropies (e/n and 1 − e_n/(n·e_1)): IEEE divide and
    multiply of identical grid doubles are correctly rounded, so the
    ratios carry exactly ONE accepted-class term each (e itself),
    never a quotient of two unrounded order-dependent sums (r12
    verdict low, same discipline that closed j_perplexity_eval).

    Plan: three positional-gram explodes UNION ALL'd into ONE
    (n, gram) hash agg with map-side partials (re-scanning the text
    column per n beats caching a corpus-derivative — the measured
    SCALE.md §4r cache rule), then a 3-row rollup; the redundancy
    join is 3 rows × 1 row. Output is exactly three dashboard rows
    at any corpus scale."""
    t = load(spark, sf_dir)
    legs = [
        t.documents.select(
            F.lit(n).alias("n"), F.explode(ngrams_col("text", n)).alias("g")
        )
        for n in (1, 2, 3)
    ]
    grams = legs[0].unionAll(legs[1]).unionAll(legs[2])
    tc = grams.groupBy("n", "g").agg(F.count("*").cast("long").alias("c"))
    agg = tc.groupBy("n").agg(
        F.sum("c").cast("long").alias("n_grams"),
        F.count("*").cast("long").alias("n_types"),
        F.sum(F.col("c") * F.log("c")).alias("s"),
    )
    # round ONCE onto the 1e-6 grid, then derive the display ratios from
    # the rounded value (the oracle does the same) — see docstring
    ent = agg.select(
        "n",
        "n_grams",
        "n_types",
        rnd(F.log("n_grams") - F.col("s") / F.col("n_grams"), 6).alias("e"),
    )
    base = F.broadcast(ent.where(F.col("n") == 1).select(F.col("e").alias("e1")))
    return ent.crossJoin(base).select(
        "n",
        "n_grams",
        "n_types",
        F.col("e").alias("entropy"),
        rnd(F.col("e") / F.col("n"), 6).alias("per_token_entropy"),
        rnd(F.lit(1.0) - F.col("e") / (F.col("n") * F.col("e1")), 6).alias(
            "redundancy"
        ),
    )


# Top-K stability: ranking depth compared across the two doc_id-parity
# halves of the corpus.
_TKS_K = 50


@query(
    "j_topk_stability",
    oracle=f"""
    WITH tok AS (SELECT doc_id % 2 AS half,
                        unnest(string_split(text, ' ')) AS term
                 FROM documents),
    c AS (SELECT half, term, CAST(COUNT(*) AS BIGINT) AS n
          FROM tok GROUP BY half, term),
    r AS (SELECT half, term, n,
                 ROW_NUMBER() OVER (PARTITION BY half
                                    ORDER BY n DESC, term) AS rk
          FROM c),
    t0 AS (SELECT term, rk FROM r WHERE half = 0 AND rk <= {_TKS_K}),
    t1 AS (SELECT term, rk FROM r WHERE half = 1 AND rk <= {_TKS_K}),
    iv AS (SELECT t0.term, t0.rk AS rk0, t1.rk AS rk1
           FROM t0 JOIN t1 USING (term)),
    s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_common,
                 CAST(COALESCE(SUM(abs(rk0 - rk1)), 0) AS BIGINT) AS disp
          FROM iv)
    SELECT CAST({_TKS_K} AS BIGINT) AS k, n_common,
           ((2000000 * CAST(n_common AS HUGEINT) + (2 * {_TKS_K} - n_common))
            // (2 * CAST(2 * {_TKS_K} - n_common AS HUGEINT))) / 1000000.0
               AS jaccard_at_k,
           disp AS rank_displacement,
           CASE WHEN n_common > 0
                THEN ((2000000 * CAST(disp AS HUGEINT) + n_common)
                      // (2 * CAST(n_common AS HUGEINT))) / 1000000.0
                ELSE NULL END AS mean_displacement
    FROM s
    """,
)
def j_topk_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} vocabulary STABILITY across the two doc_id-parity
    halves of the corpus: overlap of the two top-{k} term rankings
    (Jaccard@k) and the mean rank displacement of the shared terms —
    the split-half reliability check for every frequency-derived
    artifact in the registry (vocab truncation j_topp_vocab, BPE
    merges, tf-idf, stopword lists): an unstable top-{k} means those
    artifacts are sampling noise, a stable one licenses computing
    them on a sample at 100 TB.

    EXACT: per-half counts are integers; rankings tiebreak (count
    DESC, term) — total orders, identical both engines; overlap and
    displacement are integer joins/sums; the two display ratios use
    the (2S+n) div 2n half-up idiom in HUGEINT. |A∪B| = 2k − |A∩B|
    by construction.

    Plan: ONE (half, term) hash agg over the corpus (the j_text_stats
    shuffle with a 1-bit salt), a per-half rank window over the
    vocab-sized count relation, and a {k}-row equi-join — everything
    after the first agg is metadata-scale."""
    t = load(spark, sf_dir)
    tok = t.documents.select(
        (F.col("doc_id") % 2).alias("half"),
        F.explode(tokens_col("text")).alias("term"),
    )
    c = tok.groupBy("half", "term").agg(F.count("*").cast("long").alias("n"))
    w = Window.partitionBy("half").orderBy(F.col("n").desc(), F.col("term"))
    r = c.select("*", F.row_number().over(w).alias("rk")).where(
        F.col("rk") <= _TKS_K
    )
    r = r.persist()  # both halves sliced from one window pass
    t0 = r.where(F.col("half") == 0).select("term", F.col("rk").alias("rk0"))
    t1 = r.where(F.col("half") == 1).select("term", F.col("rk").alias("rk1"))
    iv = t0.join(t1, "term")
    s = iv.agg(
        F.count("*").cast("long").alias("n_common"),
        F.coalesce(F.sum(F.abs(F.col("rk0") - F.col("rk1"))), F.lit(0))
        .cast("long")
        .alias("disp"),
    )
    return s.select(
        F.lit(_TKS_K).cast("long").alias("k"),
        "n_common",
        (
            F.expr(
                f"(2000000 * CAST(n_common AS DECIMAL(38,0))"
                f" + (2 * {_TKS_K} - n_common))"
                f" div (2 * CAST(2 * {_TKS_K} - n_common AS DECIMAL(38,0)))"
            )
            / 1000000.0
        ).alias("jaccard_at_k"),
        F.col("disp").alias("rank_displacement"),
        F.when(
            F.col("n_common") > 0,
            F.expr(
                "(2000000 * CAST(disp AS DECIMAL(38,0)) + n_common)"
                " div (2 * CAST(n_common AS DECIMAL(38,0)))"
            )
            / 1000000.0,
        ).alias("mean_displacement"),
    )


j_topk_stability.__doc__ = j_topk_stability.__doc__.replace("{k}", str(_TKS_K))


# Good-Turing: smoothed estimates for the first _GT_RMAX frequency
# classes (the classes above the tail threshold keep their raw counts
# in practice; the readout stops where N_{r+1} data runs out).
_GT_RMAX = 10


@query(
    "j_good_turing",
    oracle=f"""
    WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
    tok AS (SELECT unnest(list_transform(
                range(1, greatest(len(toks) - 2, 0) + 1),
                i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))
              AS tok
            FROM t),
    f AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS r FROM tok GROUP BY 1),
    nn AS (SELECT r, CAST(COUNT(*) AS BIGINT) AS nr FROM f GROUP BY 1),
    tot AS (SELECT CAST(SUM(r * nr) AS BIGINT) AS n_tokens,
                   CAST(SUM(nr) AS BIGINT) AS v_types
            FROM nn),
    o AS (SELECT a.r, a.nr, b.nr AS nr1
          FROM nn a LEFT JOIN nn b ON b.r = a.r + 1
          WHERE a.r <= {_GT_RMAX})
    SELECT o.r, o.nr,
           CASE WHEN o.nr1 IS NOT NULL THEN
             FLOOR((o.r + 1) * CAST(o.nr1 AS DOUBLE) / o.nr
                   * 1000000 + 0.5) / 1000000
           END AS r_star,
           FLOOR(o.r * CAST(o.nr AS DOUBLE) / t.n_tokens * 1000000 + 0.5)
             / 1000000 AS raw_mass,
           CASE WHEN o.nr1 IS NOT NULL THEN
             FLOOR((o.r + 1) * CAST(o.nr1 AS DOUBLE) / t.n_tokens
                   * 1000000 + 0.5) / 1000000
           END AS gt_mass
    FROM o, tot t
    """,
)
def j_good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing frequency smoothing (public 1953 statistic) over
    the corpus token-TRIGRAM counts (the n-gram LM count table — the
    31-token fixture vocabulary saturates unigrams, while trigrams
    keep a genuine low-frequency tail at every scale): the
    count-of-counts table N_r for
    r <= {rmax}, the smoothed count r* = (r+1)·N_(r+1)/N_r, and the
    probability mass each class holds raw vs smoothed — row r=1's
    raw_mass N_1/N is Turing's UNSEEN-TYPE estimate read directly:
    how much probability the corpus owes to vocabulary it has never
    seen, which is the number the n-gram LM
    (j_ngram_lm, same trigram stream) needs for its backoff and the new-data view of
    j_heaps_law's type-growth curve (both built on this same token
    stream; j_hapax_rate IS N_1/V, one cell of this relation).

    EXACT: token and count-of-count relations are BIGINT; every
    output applies ONE multiply-divide IEEE sequence to exact
    integers and rounds 1e-6; classes whose N_(r+1) is absent emit
    NULL r*/gt_mass (no smoothing data) rather than a fabricated 0.

    Plan: one explode-agg to the |trigram-vocab| histogram
    (Heaps-law-small),
    one agg to count-of-counts (<= max_r rows), a self-join on r+1
    within that tiny relation. The corpus is touched once."""
    from .quality import ngrams_col

    t = load(spark, sf_dir)
    tok = t.documents.select(F.explode(ngrams_col("text", 3)).alias("tok"))
    f = tok.groupBy("tok").agg(F.count("*").cast("long").alias("r"))
    nn = f.groupBy("r").agg(F.count("*").cast("long").alias("nr"))
    nn = nn.persist()  # consumers: totals + the shifted self-join x2
    tot = nn.agg(
        F.sum(F.col("r") * F.col("nr")).cast("long").alias("n_tokens"),
        F.sum("nr").cast("long").alias("v_types"),
    )
    b = nn.select((F.col("r") - 1).alias("r"), F.col("nr").alias("nr1"))
    o = (
        nn.where(F.col("r") <= _GT_RMAX)
        .join(b, "r", "left")
        .crossJoin(F.broadcast(tot))
    )
    return o.select(
        "r",
        "nr",
        F.when(
            F.col("nr1").isNotNull(),
            rnd((F.col("r") + 1) * F.col("nr1").cast("double") / F.col("nr"), 6),
        ).alias("r_star"),
        rnd(F.col("r") * F.col("nr").cast("double") / F.col("n_tokens"), 6).alias(
            "raw_mass"
        ),
        F.when(
            F.col("nr1").isNotNull(),
            rnd(
                (F.col("r") + 1) * F.col("nr1").cast("double") / F.col("n_tokens"),
                6,
            ),
        ).alias("gt_mass"),
    )


j_good_turing.__doc__ = j_good_turing.__doc__.replace("{rmax}", str(_GT_RMAX))


# Burrows's Delta: z-score panel over the top-M corpus tokens.
_BD_TOPM = 30


@query(
    "j_burrows_delta",
    oracle=f"""
    WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS tok
                 FROM documents),
    st AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
           FROM tok GROUP BY 1, 2),
    stot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS tot FROM st GROUP BY 1),
    top AS (SELECT tok FROM (
              SELECT tok, SUM(c) AS tc FROM st GROUP BY 1
              ORDER BY tc DESC, tok LIMIT {_BD_TOPM})),
    spine AS (SELECT s.source, t.tok, s.tot,
                     COALESCE(st.c, 0) AS c
              FROM stot s CROSS JOIN top t
              LEFT JOIN st ON st.source = s.source AND st.tok = t.tok),
    fq AS (SELECT source, tok,
                  (2 * c * 1000000 + tot) // (2 * tot) AS f6
           FROM spine),
    ts AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(SUM(f6) AS BIGINT) AS s,
                  CAST(SUM(f6 * f6) AS BIGINT) AS q
           FROM fq GROUP BY 1),
    z AS (SELECT fq.source, fq.tok,
                 CASE WHEN ts.n * ts.q - ts.s * ts.s > 0 THEN
                   CAST(FLOOR((ts.n * fq.f6 - ts.s)
                        / sqrt(CAST(ts.n * ts.q - ts.s * ts.s AS DOUBLE)
                               * ts.n / (ts.n - 1))
                        * 1000000 + 0.5) AS BIGINT)
                 END AS z6
          FROM fq JOIN ts ON fq.tok = ts.tok),
    pairs AS (SELECT a.source AS source_a, b.source AS source_b,
                     CAST(COUNT(*) FILTER (a.z6 IS NOT NULL
                                           AND b.z6 IS NOT NULL) AS BIGINT)
                       AS m_used,
                     CAST(SUM(abs(a.z6 - b.z6)) AS BIGINT) AS sz
              FROM z a JOIN z b ON a.tok = b.tok AND a.source < b.source
              GROUP BY 1, 2)
    SELECT source_a, source_b, m_used,
           FLOOR(CAST(sz AS DOUBLE) / m_used / 1000000.0 * 1000000 + 0.5)
             / 1000000 AS delta
    FROM pairs
    """,
)
def j_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows's Delta (public 2002 stylometry statistic) between
    every source pair: z-score each source's relative frequency of
    the {m} most frequent corpus tokens (the classical function-word
    panel) against the cross-source mean and sd, then Delta = mean
    |z_a - z_b| — the authorship/register distance that reads style,
    not topic. The stylometric member of the source-similarity family
    (j_vocab_jaccard_sources compares vocabularies, j_kl_sources
    compares distributions, this compares DEVIATION PROFILES), and
    in a training-data pipeline the signal for "these two crawls are
    the same generator wearing different domains".

    EXACT: relative frequencies land on the 1e-6 integer grid via
    pure-integer round-half-up (2c*10^6 + tot) // (2 tot); per-token
    moments are BIGINT; each z applies ONE div-sqrt IEEE sequence to
    exact integers and re-rounds to an integer z6, so the pair sums
    are exact integer arithmetic; zero-variance tokens yield NULL z
    and drop from both sides' m_used. One rounded division at the
    end.

    Plan: one explode-agg to (source, token) counts; the top-{m}
    pick is a heap TakeOrdered on the |vocab| relation (no global
    sort); everything after runs on the |sources| x {m} spine —
    hundreds of rows of metadata whatever the corpus size."""
    t = load(spark, sf_dir)
    tok = t.documents.select("source", F.explode(tokens_col("text")).alias("tok"))
    st = tok.groupBy("source", "tok").agg(F.count("*").cast("long").alias("c"))
    st = st.persist()  # consumers: source totals, top-M pick, spine join
    stot = st.groupBy("source").agg(F.sum("c").cast("long").alias("tot"))
    top = (
        st.groupBy("tok")
        .agg(F.sum("c").alias("tc"))
        .orderBy(F.col("tc").desc(), F.col("tok"))
        .limit(_BD_TOPM)
        .select("tok")
    )
    spine = (
        stot.crossJoin(F.broadcast(top))
        .join(st, ["source", "tok"], "left")
        .select(
            "source",
            "tok",
            "tot",
            F.coalesce(F.col("c"), F.lit(0)).alias("c"),
        )
    )
    fq = spine.select(
        "source",
        "tok",
        F.expr("(2 * c * 1000000 + tot) div (2 * tot)").alias("f6"),
    )
    fq = fq.persist()  # consumers: token stats + the z join
    ts = fq.groupBy("tok").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("f6").cast("long").alias("s"),
        F.sum(F.col("f6") * F.col("f6")).cast("long").alias("q"),
    )
    varn = F.col("n") * F.col("q") - F.col("s") * F.col("s")
    z = fq.join(F.broadcast(ts), "tok").select(
        "source",
        "tok",
        F.when(
            varn > 0,
            F.floor(
                (F.col("n") * F.col("f6") - F.col("s"))
                / F.sqrt(
                    varn.cast("double") * F.col("n") / (F.col("n") - 1)
                )
                * 1000000
                + F.lit(0.5)
            ).cast("long"),
        ).alias("z6"),
    )
    za = z.select(
        F.col("source").alias("source_a"), "tok", F.col("z6").alias("za")
    )
    zb = z.select(
        F.col("source").alias("source_b"), "tok", F.col("z6").alias("zb")
    )
    pairs = (
        za.join(zb, "tok")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(
            F.count(
                F.when(F.col("za").isNotNull() & F.col("zb").isNotNull(), 1)
            )
            .cast("long")
            .alias("m_used"),
            F.sum(F.abs(F.col("za") - F.col("zb"))).cast("long").alias("sz"),
        )
    )
    return pairs.select(
        "source_a",
        "source_b",
        "m_used",
        rnd(F.col("sz").cast("double") / F.col("m_used") / 1000000.0, 6).alias(
            "delta"
        ),
    )


j_burrows_delta.__doc__ = j_burrows_delta.__doc__.replace("{m}", str(_BD_TOPM))


@query(
    "j_capture_recapture",
    oracle="""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                 FROM documents),
    caught AS (SELECT tok,
                      MAX(CASE WHEN CAST(concat('0x', substr(
                            md5(CAST(doc_id AS VARCHAR) || ':cr1'), 9, 8))
                            AS BIGINT) % 2 = 0 THEN 1 ELSE 0 END) AS in_a,
                      MAX(CASE WHEN CAST(concat('0x', substr(
                            md5(CAST(doc_id AS VARCHAR) || ':cr2'), 9, 8))
                            AS BIGINT) % 2 = 0 THEN 1 ELSE 0 END) AS in_b
               FROM tok GROUP BY 1),
    s AS (SELECT CAST(COUNT(*) AS BIGINT) AS v_exact,
                 CAST(SUM(in_a) AS BIGINT) AS n1,
                 CAST(SUM(in_b) AS BIGINT) AS n2,
                 CAST(SUM(in_a * in_b) AS BIGINT) AS m
          FROM caught)
    SELECT v_exact, n1, n2, m,
           FLOOR((CAST(n1 + 1 AS DOUBLE) * (n2 + 1) / (m + 1) - 1)
                 * 1000000 + 0.5) / 1000000 AS chapman_est,
           FLOOR(((CAST(n1 + 1 AS DOUBLE) * (n2 + 1) / (m + 1) - 1)
                  - v_exact) / v_exact * 1000000 + 0.5) / 1000000
             AS rel_err
    FROM s
    """,
)
def j_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capture-recapture vocabulary estimation (Chapman's estimator,
    public 1951 statistic): two INDEPENDENT half-corpus document
    samples (disjoint salted md5 parities — the j_split_train_val
    device, two salts) each "capture" the token types they contain;
    the Chapman estimate (n1+1)(n2+1)/(m+1) - 1 reconstructs total
    vocabulary from the two catch sizes and their overlap, read
    against the exact count. The ecology-style member of the
    species-estimation family: j_heaps_law fits growth, j_good_turing
    prices unseen mass, this one estimates population size from TWO
    SAMPLES ONLY — and its systematic UNDERSHOOT on text (rare types
    violate equal-catchability; common types are caught twice) is the
    documented readout, the same heterogeneity the other two
    quantify.

    EXACT: capture flags are md5-parity maxima per type (integer);
    catch sizes and overlap are BIGINT; the estimator and its
    relative error each apply one fixed IEEE sequence and round 1e-6.

    Plan: one explode-agg to the |vocab| relation carrying two flag
    maxima (map-side combine), one fold to a single row. The corpus
    is touched once; both "samples" are computed ON THE FLY from the
    doc_id hash — no data is ever duplicated or moved."""
    t = load(spark, sf_dir)

    def parity(salt: str) -> Column:
        return F.when(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(salt))),
                    9,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 2
            == 0,
            1,
        ).otherwise(0)

    tok = t.documents.select(
        F.explode(tokens_col("text")).alias("tok"),
        parity(":cr1").alias("pa"),
        parity(":cr2").alias("pb"),
    )
    caught = tok.groupBy("tok").agg(
        F.max("pa").alias("in_a"), F.max("pb").alias("in_b")
    )
    s = caught.agg(
        F.count("*").cast("long").alias("v_exact"),
        F.sum("in_a").cast("long").alias("n1"),
        F.sum("in_b").cast("long").alias("n2"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("m"),
    )
    est = (F.col("n1") + 1).cast("double") * (F.col("n2") + 1) / (F.col("m") + 1) - 1
    return s.select(
        "v_exact",
        "n1",
        "n2",
        "m",
        rnd(est, 6).alias("chapman_est"),
        rnd((est - F.col("v_exact")) / F.col("v_exact"), 6).alias("rel_err"),
    )


# ln(2) as the SAME repr literal in both engines (the JS upper bound
# and the absent-mass coefficient — no query-time ln of a constant).
import math as _math

_LN2 = _math.log(2.0)


@query(
    "j_js_divergence",
    oracle=f"""
    WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS tok
                 FROM documents),
    sc AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
           FROM tok GROUP BY source, tok),
    st AS (SELECT source, CAST(SUM(c) AS BIGINT) AS nt FROM sc GROUP BY source),
    cc AS (SELECT tok, CAST(SUM(c) AS BIGINT) AS cc FROM sc GROUP BY tok),
    ct AS (SELECT CAST(SUM(cc) AS BIGINT) AS n FROM cc),
    term AS (SELECT sc.source,
                    0.5 * ((sc.c * 1.0 / st.nt)
                           * ln((sc.c * 1.0 / st.nt)
                                / (0.5 * (sc.c * 1.0 / st.nt)
                                   + 0.5 * (cc.cc * 1.0 / ct.n)))
                         + (cc.cc * 1.0 / ct.n)
                           * ln((cc.cc * 1.0 / ct.n)
                                / (0.5 * (sc.c * 1.0 / st.nt)
                                   + 0.5 * (cc.cc * 1.0 / ct.n)))) AS js_t,
                    cc.cc * 1.0 / ct.n AS pc
             FROM sc JOIN st USING (source) JOIN cc USING (tok) CROSS JOIN ct),
    red AS (SELECT source,
                   {sql_rnd(
                       f"SUM(js_t) + 0.5 * CAST({_LN2!r} AS DOUBLE)"
                       " * (1.0 - SUM(pc))", 6)} AS js_div
            FROM term GROUP BY source),
    terms AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_terms
              FROM sc GROUP BY source)
    SELECT st.source, st.nt AS n_tokens, terms.n_terms, red.js_div,
           red.js_div <= CAST({_LN2!r} AS DOUBLE) AS bounded
    FROM st JOIN terms USING (source) JOIN red USING (source)
    """,
)
def j_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Jensen-Shannon divergence from the corpus unigram
    distribution (public 1991 statistic) — the SYMMETRIC, BOUNDED twin
    of j_kl_sources, and the standard drift metric when distributions
    can have disjoint support (KL blows up on a zero; JS never exceeds
    ln 2, which the `bounded` column asserts per row): JS(P_s, P_c) =
    0.5 KL(P_s||M) + 0.5 KL(P_c||M), M the even mixture. Drift
    dashboards trend JS where mixture designers read KL — the two
    relations share one (source, token) aggregation shape on purpose.

    EXACT-enough by the documented convention: present-term
    contributions sum unrounded libm terms (~1e-10/term boundary
    odds, the j_kl_sources precedent); the corpus-mass ABSENT from the
    source enters in closed form 0.5 ln2 (1 - SUM_present p_c) — ln 2
    is a repr literal in both engines, never computed at query time —
    and the per-source reduction rounds 1e-6.

    Plan: identical to j_kl_sources — one (source, token) hash agg,
    Heaps-small vocabulary broadcasts back, per-source reduction; no
    shuffle carries more than (source, token) rows at any scale."""
    t = load(spark, sf_dir)
    sc = (
        t.documents.select("source", F.explode(tokens_col("text")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count("*").cast("long").alias("c"))
    )
    sc.persist()  # 3 consumers: source totals, corpus vocab, term rows
    st = sc.groupBy("source").agg(F.sum("c").cast("long").alias("nt"))
    cc = sc.groupBy("tok").agg(F.sum("c").cast("long").alias("cc"))
    ct = cc.agg(F.sum("cc").cast("long").alias("n"))
    ps = F.col("c") * 1.0 / F.col("nt")
    pc = F.col("cc") * 1.0 / F.col("n")
    m = 0.5 * ps + 0.5 * pc
    term = (
        sc.join(F.broadcast(st), "source")
        .join(F.broadcast(cc), "tok")
        .crossJoin(F.broadcast(ct))
        .select(
            "source",
            (0.5 * (ps * F.log(ps / m) + pc * F.log(pc / m))).alias("js_t"),
            pc.alias("pc"),
        )
    )
    red = term.groupBy("source").agg(
        rnd(
            F.sum("js_t") + 0.5 * F.lit(_LN2) * (F.lit(1.0) - F.sum("pc")), 6
        ).alias("js_div")
    )
    n_terms = sc.groupBy("source").agg(F.count("*").cast("long").alias("n_terms"))
    return (
        st.join(n_terms, "source")
        .join(red, "source")
        .select(
            "source",
            F.col("nt").alias("n_tokens"),
            "n_terms",
            "js_div",
            (F.col("js_div") <= F.lit(_LN2)).alias("bounded"),
        )
    )


@query(
    "j_theil_index",
    oracle=f"""
    WITH h AS (SELECT source, n_chars AS x, CAST(COUNT(*) AS BIGINT) AS c
               FROM documents GROUP BY 1, 2),
    g AS (SELECT source, CAST(SUM(c) AS BIGINT) AS ng,
                 CAST(SUM(c * x) AS BIGINT) AS xg
          FROM h GROUP BY 1),
    t AS (SELECT CAST(SUM(ng) AS BIGINT) AS n, CAST(SUM(xg) AS BIGINT) AS xt
          FROM g),
    wi AS (SELECT h.source,
                  SUM(h.c * (h.x * 1.0 * g.ng / g.xg)
                      * ln(h.x * 1.0 * g.ng / g.xg)) / MAX(g.ng) AS tw
           FROM h JOIN g USING (source) GROUP BY h.source),
    bt AS (SELECT {sql_rnd(
               "SUM((g.xg * 1.0 / t.xt)"
               " * ln((g.xg * 1.0 / t.xt) / (g.ng * 1.0 / t.n)))", 6)}
               AS t_between
           FROM g CROSS JOIN t)
    SELECT g.source, g.ng AS n_docs,
           {sql_rnd("g.xg * 1.0 / g.ng", 6)} AS mean_chars,
           {sql_rnd("wi.tw", 6)} AS theil_within,
           {sql_rnd("g.xg * 1.0 / t.xt", 6)} AS share_of_total,
           bt.t_between
    FROM g JOIN wi USING (source) CROSS JOIN t CROSS JOIN bt
    """,
)
def j_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T inequality index of document length, DECOMPOSED by
    source (public 1967 statistic) — the property j_gini_tokens
    cannot offer: Theil splits EXACTLY into between-group +
    weighted within-group terms (T = T_between + SUM share_g * T_g),
    so a curation dashboard reads WHERE the length inequality lives —
    a few verbose sources (between) vs heavy tails inside every
    source (within). Per-source rows carry the within index and the
    length share; t_between repeats as the decomposition's other half.

    Float discipline: terms are (x/mu) ln(x/mu) over the VALUE
    HISTOGRAM (one row per (source, distinct length) — the
    j_mannwhitney collapse), so the libm sums run over
    value-domain-bounded rows (unrounded-term convention, ~1e-10/term
    boundary odds) and every output rounds 1e-6.

    Plan: one (source, n_chars) hash agg bounds everything; group
    totals are |sources| rows, the corpus total is 1 row broadcast —
    nothing after the first agg scales with the corpus."""
    t = load(spark, sf_dir)
    h = t.documents.groupBy("source", F.col("n_chars").alias("x")).agg(
        F.count("*").cast("long").alias("c")
    )
    h.persist()  # 2 consumers: group totals + within terms
    g = h.groupBy("source").agg(
        F.sum("c").cast("long").alias("ng"),
        F.sum(F.col("c") * F.col("x")).cast("long").alias("xg"),
    )
    tt = g.agg(
        F.sum("ng").cast("long").alias("n"), F.sum("xg").cast("long").alias("xt")
    )
    ratio = F.col("x") * 1.0 * F.col("ng") / F.col("xg")
    wi = (
        h.join(F.broadcast(g), "source")
        .groupBy("source")
        .agg(
            (F.sum(F.col("c") * ratio * F.log(ratio)) / F.max("ng")).alias("tw")
        )
    )
    shr = F.col("xg") * 1.0 / F.col("xt")
    bt = g.crossJoin(F.broadcast(tt)).agg(
        rnd(
            F.sum(shr * F.log(shr / (F.col("ng") * 1.0 / F.col("n")))), 6
        ).alias("t_between")
    )
    return (
        g.join(wi, "source")
        .crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(bt))
        .select(
            "source",
            F.col("ng").alias("n_docs"),
            rnd(F.col("xg") * 1.0 / F.col("ng"), 6).alias("mean_chars"),
            rnd(F.col("tw"), 6).alias("theil_within"),
            rnd(shr, 6).alias("share_of_total"),
            "t_between",
        )
    )


@query(
    "j_hellinger",
    oracle=f"""
    WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS tok
                 FROM documents),
    sc AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
           FROM tok GROUP BY source, tok),
    st AS (SELECT source, CAST(SUM(c) AS BIGINT) AS nt FROM sc GROUP BY source),
    cc AS (SELECT tok, CAST(SUM(c) AS BIGINT) AS cc FROM sc GROUP BY tok),
    ct AS (SELECT CAST(SUM(cc) AS BIGINT) AS n FROM cc),
    term AS (SELECT sc.source,
                    sqrt((sc.c * 1.0 / st.nt) * (cc.cc * 1.0 / ct.n)) AS bt
             FROM sc JOIN st USING (source) JOIN cc USING (tok) CROSS JOIN ct),
    red AS (SELECT source, SUM(bt) AS bc_raw FROM term GROUP BY source),
    terms AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_terms
              FROM sc GROUP BY source)
    SELECT st.source, st.nt AS n_tokens, terms.n_terms,
           {sql_rnd('red.bc_raw', 6)} AS bhattacharyya_coef,
           {sql_rnd('sqrt(GREATEST(1.0 - red.bc_raw, 0.0))', 6)} AS hellinger,
           {sql_rnd('-LN(red.bc_raw)', 6)} AS bhattacharyya_dist
    FROM st JOIN terms USING (source) JOIN red USING (source)
    """,
)
def j_hellinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hellinger distance (and Bhattacharyya coefficient/distance,
    public 1909/1943 statistics) between each source's unigram
    distribution and the corpus distribution — the BOUNDED METRIC
    companion to j_kl_sources (KL is unbounded and asymmetric; H is a
    true metric in [0,1], the right axis for thresholded drift alarms)
    and the geometric twin of j_js_divergence on the same rollup:
    BC = SUM_t sqrt(p_s(t) * p_c(t)), H = sqrt(1 - BC),
    D_B = -ln(BC). Terms absent from the source contribute 0 by
    construction (P_source's support), so no smoothing is needed.

    Determinism: sqrt is IEEE-correctly-rounded on both engines; the
    per-source sum adds UNROUNDED terms (the j_kl_sources convention —
    boundary odds ~1e-10/row), H and D_B derive from the UNROUNDED
    coefficient, and all three round 1e-6 at display. 1 - BC clamps at
    0 (fp can land a hair above 1 when a source IS the corpus).

    Plan: identical lowering to j_kl_sources — one (source, token)
    hash agg, Heaps-small vocabulary broadcast back, per-source
    reduction, 1-row corpus total broadcast. The corpus never crosses
    a shuffle as text."""
    t = load(spark, sf_dir)
    sc = (
        t.documents.select("source", F.explode(tokens_col("text")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count("*").cast("long").alias("c"))
    )
    sc.persist()  # 3 consumers: source totals, corpus vocab, term rows
    st = sc.groupBy("source").agg(F.sum("c").cast("long").alias("nt"))
    cc = sc.groupBy("tok").agg(F.sum("c").cast("long").alias("cc"))
    ct = cc.agg(F.sum("cc").cast("long").alias("n"))
    bt = F.sqrt(
        (F.col("c") * 1.0 / F.col("nt")) * (F.col("cc") * 1.0 / F.col("n"))
    )
    term = (
        sc.join(F.broadcast(st), "source")
        .join(F.broadcast(cc), "tok")
        .crossJoin(F.broadcast(ct))
        .select("source", bt.alias("bt"))
    )
    red = term.groupBy("source").agg(F.sum("bt").alias("bc_raw"))
    n_terms = sc.groupBy("source").agg(F.count("*").cast("long").alias("n_terms"))
    return (
        st.join(n_terms, "source")
        .join(red, "source")
        .select(
            "source",
            F.col("nt").alias("n_tokens"),
            "n_terms",
            rnd(F.col("bc_raw"), 6).alias("bhattacharyya_coef"),
            rnd(F.sqrt(F.greatest(1.0 - F.col("bc_raw"), F.lit(0.0))), 6).alias(
                "hellinger"
            ),
            rnd(-F.log("bc_raw"), 6).alias("bhattacharyya_dist"),
        )
    )


@query(
    "j_chao1",
    oracle="""
    WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS tok
                 FROM documents),
    sc AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
           FROM tok GROUP BY source, tok),
    agg AS (SELECT source,
                   CAST(COUNT(*) AS BIGINT) AS s_obs,
                   CAST(SUM(c) AS BIGINT) AS n_tokens,
                   CAST(COUNT(*) FILTER (c = 1) AS BIGINT) AS f1,
                   CAST(COUNT(*) FILTER (c = 2) AS BIGINT) AS f2
            FROM sc GROUP BY source)
    SELECT source, n_tokens, s_obs, f1, f2,
           FLOOR((s_obs + CAST(f1 AS DOUBLE) * (f1 - 1) / (2.0 * (f2 + 1)))
                 * 10000 + 0.5) / 10000 AS chao1,
           FLOOR((1.0 - CAST(f1 AS DOUBLE) / n_tokens) * 1000000 + 0.5)
             / 1000000 AS good_coverage
    FROM agg
    """,
)
def j_chao1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chao1 vocabulary-richness estimator per source (Chao 1984,
    public; bias-corrected form S + F1(F1-1)/(2(F2+1)), defined even
    when no doubletons exist) plus Good's sample coverage 1 - F1/n —
    the UNSEEN-vocabulary readout that completes the lexical-growth
    shelf: j_heaps_law fits how vocabulary grows with corpus size,
    j_good_turing reallocates mass to unseen TYPES, j_hapax_rate
    counts the singletons; Chao1 answers "how many types does this
    source actually HAVE", the number a dedup/mixture planner wants
    before deciding whether more crawl of a source buys new tokens.

    EXACT: type counts, singleton (F1) and doubleton (F2) counts are
    integers off one (source, token) hash agg; the estimator and
    coverage are single rounded divisions of exact integers.

    Plan: the j_kl_sources lowering's first half only — one
    (source, token) hash agg then a |sources|-row rollup; the corpus
    crosses the shuffle once as tokens, nothing else."""
    t = load(spark, sf_dir)
    sc = (
        t.documents.select("source", F.explode(tokens_col("text")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count("*").cast("long").alias("c"))
    )
    agg = sc.groupBy("source").agg(
        F.count("*").cast("long").alias("s_obs"),
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.when(F.col("c") == 1, 1)).cast("long").alias("f1"),
        F.count(F.when(F.col("c") == 2, 1)).cast("long").alias("f2"),
    )
    return agg.select(
        "source",
        "n_tokens",
        "s_obs",
        "f1",
        "f2",
        rnd(
            F.col("s_obs")
            + F.col("f1").cast("double") * (F.col("f1") - 1) / (2.0 * (F.col("f2") + 1)),
            4,
        ).alias("chao1"),
        rnd(1.0 - F.col("f1").cast("double") / F.col("n_tokens"), 6).alias(
            "good_coverage"
        ),
    )
