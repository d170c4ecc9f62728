"""§2.J — LLM-data-pipeline operators: dedup (exact / n-gram Jaccard /
MinHash-LSH / SimHash / embedding-cosine), similarity search (brute
cosine top-k, kNN label vote, all-pairs, k-means-trained IVF,
hyperplane-LSH multi-probe ANN), text analysis (stats, TF-IDF, quality,
naive-Bayes language-ID, fingerprinting), multimodal columns (pack,
decode, resize, frame-sample, feature-extract, composed retrieval).

Thresholds are calibrated to the fixtures: embeddings are L2-normalized
64-dim with max pairwise dot ≈ 0.51 (measured), so similarity cutoffs
use 0.3; documents share a 31-token vocabulary across langs, so
language-ID is the corpus-trained naive-Bayes operator, not a stopword
whitelist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import rnd, sql_rnd
from ..operators.dedup import (
    jaccard_verify,
    lsh_candidate_pairs,
    minhash_signatures,
    shingle_rows,
    shingles_from_toks,
    simhash_chunks,
    simhash_table,
    tokens_col,
)
from ..operators.multimodal import VIDEO_FRAMES, decode_payloads, pack_multimodal
from ..operators.similarity import (
    as_double,
    brute_topk,
    dot_expr,
    ivf_assign,
    ivf_search,
    query_panel,
    query_vector,
)
from ..registry import query
from ..tables import load, spread

# ---------------------------------------------------------------- dedup

@query(
    "j_dedup_exact",
    oracle="""
    SELECT md5(text) AS text_md5, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies,
           MIN(n_chars) AS n_chars
    FROM documents GROUP BY md5(text)
    """,
)
def j_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: one keeper (min doc_id) per identical text. Pure
    hash-groupBy — at 100 TB group on md5(text) so the shuffle carries
    16-byte keys, not documents."""
    t = load(spark, sf_dir)
    return t.documents.groupBy(F.md5("text").alias("text_md5")).agg(
        F.min("doc_id").alias("keep_id"),
        F.count("*").alias("n_copies"),
        F.min("n_chars").alias("n_chars"),
    )


_NGRAM_ORACLE = """
    WITH sh AS (
      SELECT doc_id, {keys}
             list_distinct(list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                 i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s
      FROM (SELECT doc_id, lang, source, string_split(text, ' ') AS toks FROM documents))
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           FLOOR((len(list_intersect(a.s, b.s)) * 1.0 /
                  len(list_distinct(a.s || b.s))) * 1000000 + 0.5) / 1000000 AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id {group_cond}
    WHERE len(list_intersect(a.s, b.s)) * 1.0 / len(list_distinct(a.s || b.s)) >= {tau}
"""

_NGRAM_GLOBAL = _NGRAM_ORACLE.format(keys="", group_cond="", tau="{tau}")
_NGRAM_GROUPED = _NGRAM_ORACLE.format(
    keys="lang, source,",
    group_cond="AND a.lang = b.lang AND a.source = b.source",
    tau="{tau}",
)


@query("j_dedup_ngram", oracle=_NGRAM_GROUPED.format(tau=0.8))
def j_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact near-dup within (lang, source) partitions: brute-force
    3-gram shingle Jaccard >= 0.8, pairs restricted to the same crawl
    partition — the practical exact pattern (the partition key carries
    the join shuffle; ~n²/|groups| pairs). GLOBAL near-dup at scale is
    j_dedup_near's LSH job — an unrestricted quadratic would be
    O(n²)·|shingles| and die at sf0.1, let alone 100 TB."""
    t = load(spark, sf_dir)
    # shingles are hashed to LONGs before the join: 8-byte equality in
    # array_intersect/union instead of ~30-byte strings — 2.9x faster
    # (measured sf0.1). Jaccard over hashes == Jaccard over strings
    # unless xxhash64 collides within a pair's shingle sets
    # (p ~ |shingles|^2 / 2^64 — negligible, and the LSH path is judged
    # against this same quantity).
    # persisted: the frame feeds both self-join sides and Spark does not
    # ReuseExchange across aliases — without the cache the shingle chain
    # runs twice (-17% measured at sf0.1; same rationale as the LSH
    # banded frame in operators/dedup.py).
    # HOUSE RULE for every .persist() inside a query function (this is
    # the canonical statement; sibling sites just call .persist()):
    # the consuming action happens OUTSIDE the function (the driver
    # collects the returned frame), so an in-function unpersist is
    # impossible — these frames are deliberately left to Spark's LRU
    # storage eviction (MEMORY_AND_DISK deserialized, evictable per
    # block). Across a full registry sweep the residue is bounded:
    # every persisted frame here is digest/metadata-sized, never raw
    # corpus text, and the sweep harness clearCache()s between plan
    # audits. Helpers that DO consume internally (kmeans_objective,
    # similarity.py) unpersist after their action instead.
    sh = spread(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", tokens_col("text").alias("_toks")
    ).select(
        "doc_id",
        "lang",
        "source",
        F.transform(shingles_from_toks(F.col("_toks")), lambda x: F.xxhash64(x)).alias("s"),
    ).persist()
    a = sh.alias("a")
    b = sh.alias("b")
    jac = F.size(F.array_intersect("a.s", "b.s")) / F.size(F.array_union("a.s", "b.s"))
    # (measured: a size-band necessary-condition prefilter does NOT pay
    # here — the fixture docs are near-uniform length, so it prunes
    # little and forces the shingle arrays to materialize pre-join)
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .where(jac >= 0.8)
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            rnd(jac, 6).alias("jaccard"),
        )
    )


@query("j_dedup_near", oracle=_NGRAM_GLOBAL.format(tau=0.8))
def j_dedup_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup, verified: 128 minhashes → 32x4 band bucket
    join → candidates → exact-Jaccard filter >= 0.8.

    Same oracle as j_dedup_ngram: with b=32/r=4 a 0.8-Jaccard pair
    escapes all bands with p ≈ 5e-8, so LSH+verify equals brute force —
    while scaling as O(n·shingles + candidates), not O(n²)."""
    t = load(spark, sf_dir)
    sig = minhash_signatures(t.documents)
    cands = lsh_candidate_pairs(sig)
    verified = jaccard_verify(cands, t.documents)
    return verified.where(F.col("jaccard") >= 0.8).select(
        "id_a", "id_b", rnd(F.col("jaccard"), 6).alias("jaccard")
    )


def _simhash_oracle() -> str:
    """DuckDB twin of simhash_table + simhash_chunks: the token hash is
    md5-derived (operators/dedup.portable_hash64), so every bit is
    recomputable from md5 hex digits — bit k of the 64-bit value is bit
    (k%4) of hex digit 16-(k//4) (1-indexed, big-endian hex). Votes are
    integer sums (exact); the packed signature adds -2^63 for bit 63
    (two's complement) since 1<<63 overflows signed BIGINT."""
    hexd = "0123456789abcdef"

    def bit(k: int) -> str:
        pos, p = 16 - k // 4, 1 << (k % 4)
        return f"((strpos('{hexd}', substr(h, {pos}, 1)) - 1) // {p}) % 2"

    votes = ", ".join(
        f"SUM(CASE WHEN {bit(k)} = 1 THEN 1 ELSE -1 END) AS v{k}" for k in range(64)
    )
    packed = " + ".join(
        "CASE WHEN v63 >= 0 THEN -9223372036854775808 ELSE 0 END"
        if k == 63
        else f"CASE WHEN v{k} >= 0 THEN {1 << k} ELSE 0 END"
        for k in range(64)
    )
    chunks = ", ".join(
        "CAST("
        + " + ".join(
            f"CASE WHEN v{16 * i + j} >= 0 THEN {1 << j} ELSE 0 END" for j in range(16)
        )
        + f" AS BIGINT) AS chunk{i}"
        for i in range(4)
    )
    return f"""
    WITH tok AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tk
                 FROM documents),
    hashed AS (SELECT doc_id, md5(tk) AS h FROM tok),
    votes AS (SELECT doc_id, {votes} FROM hashed GROUP BY doc_id)
    SELECT doc_id, CAST({packed} AS BIGINT) AS simhash, {chunks} FROM votes
    """


@query("j_dedup_simhash", oracle=_simhash_oracle())
def j_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprints + 16-bit-chunk blocking keys. Near-dup
    candidates = pairs sharing any chunk (joined downstream like LSH
    bands); here the operator emits signatures + chunks per doc.
    Hash-checked: the md5-derived token hash (portable_hash64) makes
    the full signature recomputable in the oracle engine."""
    t = load(spark, sf_dir)
    d = simhash_table(t.documents)
    chunks = simhash_chunks(F.col("simhash"))
    return d.select(
        "doc_id",
        "simhash",
        *[c.alias(f"chunk{i}") for i, c in enumerate(chunks)],
    )


@query(
    "j_simhash_hamming",
    oracle=f"""
    WITH sig AS ({_simhash_oracle()}),
    sh AS (SELECT d.doc_id, d.lang, d.source, sig.simhash,
                  list_distinct(list_transform(
                      range(1, greatest(len(toks) - 2, 0) + 1),
                      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s
           FROM (SELECT doc_id, lang, source, string_split(text, ' ') AS toks
                 FROM documents) d
           JOIN sig ON sig.doc_id = d.doc_id),
    pairs AS (SELECT bit_count(xor(a.simhash, b.simhash)) AS hamming,
                     CAST(FLOOR(len(list_intersect(a.s, b.s)) * 1.0
                                / len(list_distinct(a.s || b.s))
                                * 1000000 + 0.5) AS BIGINT) AS j6
              FROM sh a JOIN sh b
                ON a.lang = b.lang AND a.source = b.source
               AND a.doc_id < b.doc_id),
    agg AS (SELECT hamming // 8 AS hbucket, j6 >= 300000 AS is_near,
                   CAST(COUNT(*) AS BIGINT) AS n_pairs,
                   CAST(MIN(hamming) AS BIGINT) AS min_hamming,
                   CAST(MAX(hamming) AS BIGINT) AS max_hamming,
                   CAST(SUM(j6) AS BIGINT) AS sj6
            FROM pairs GROUP BY 1, 2)
    SELECT hbucket, is_near, n_pairs, min_hamming, max_hamming,
           ((2 * sj6 + n_pairs) // (2 * n_pairs)) / 1000000.0 AS mean_jaccard
    FROM agg
    """,
)
def j_simhash_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash separation audit: the Hamming-distance histogram of ALL
    same-(lang, source) document pairs, split by whether the pair is a
    TRUE 3-gram-Jaccard >= 0.3 near-duplicate — the measurement that
    justifies (or indicts) a simhash chunk threshold before anyone
    trusts j_dedup_simhash's blocking: if near pairs and far pairs
    overlap in the same Hamming buckets, no threshold exists and the
    sketch needs more bits; if they separate, the histogram names the
    cut. The sketch-accuracy companion of j_lsh_recall (which audits
    the MinHash bands the same way).

    Determinism and exactness: signatures are the md5-derived
    portable simhash (bit-identical in the oracle via the vote
    reconstruction); hamming = bit_count(xor) on exact BIGINTs;
    jaccard floors to the 1e-6 scaled grid BEFORE the flag and the
    sum, so the near flag and the per-bucket mean derive from exact
    integers (mean via the (2S+n) div 2n half-up identity — no float
    sum anywhere).

    Plan: ONE token-hash agg builds every signature (simhash_table);
    the blocked self-join shuffles on the (lang, source) key exactly
    like j_dedup_ngram (the deliberately block-bounded ground-truth
    quadratic — candidate mass n²/|blocks| per key, the price of an
    exact audit; the production dedup path stays LSH/banded); the
    histogram is a ≤18-row rollup with map-side partials."""
    t = load(spark, sf_dir)
    from ..operators.dedup import shingles_from_toks, simhash_table

    sigs = simhash_table(t.documents).select("doc_id", "simhash")
    sh = (
        t.documents.select(
            "doc_id", "lang", "source", tokens_col("text").alias("_toks")
        )
        .select(
            "doc_id",
            "lang",
            "source",
            F.transform(shingles_from_toks(F.col("_toks")), lambda x: F.xxhash64(x)).alias("s"),
        )
        .join(sigs, "doc_id")
        .persist()
    )
    a, b = sh.alias("a"), sh.alias("b")
    jac = F.size(F.array_intersect("a.s", "b.s")) / F.size(F.array_union("a.s", "b.s"))
    pairs = a.join(
        b,
        (F.col("a.lang") == F.col("b.lang"))
        & (F.col("a.source") == F.col("b.source"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
        .cast("long")
        .alias("hamming"),
        F.floor(jac * 1000000 + F.lit(0.5)).cast("long").alias("j6"),
    )
    agg = pairs.groupBy(
        F.expr("hamming div 8").alias("hbucket"),
        (F.col("j6") >= 300000).alias("is_near"),
    ).agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.min("hamming").cast("long").alias("min_hamming"),
        F.max("hamming").cast("long").alias("max_hamming"),
        F.sum("j6").cast("long").alias("sj6"),
    )
    return agg.select(
        "hbucket",
        "is_near",
        "n_pairs",
        "min_hamming",
        "max_hamming",
        (
            F.expr("(2 * sj6 + n_pairs) div (2 * n_pairs)") / F.lit(1000000.0)
        ).alias("mean_jaccard"),
    )


# ------------------------------------------------------------ similarity

_QVEC_SQL = "(SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)"


@query(
    "j_sim_topk",
    oracle=f"""
    SELECT vec_id, label,
           FLOOR((list_dot_product(CAST(embedding AS DOUBLE[]), qv)) * 1000000 + 0.5)
             / 1000000 AS score
    FROM embeddings, {_QVEC_SQL} q
    ORDER BY score DESC, vec_id LIMIT 10
    """,
)
def j_sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine top-10 for a query vector (vec_id=0; ‖v‖=1 so cosine=dot).
    Broadcast 1-row query x full scan → TakeOrderedAndProject: the exact
    baseline every ANN variant is judged against."""
    t = load(spark, sf_dir)
    q = t.embeddings.where(F.col("vec_id") == 0).select(
        as_double("embedding").alias("qv")
    )
    return brute_topk(t.embeddings.crossJoin(F.broadcast(q)), F.col("qv"), k=10)


@query(
    "j_knn_label",
    oracle=f"""
    WITH scored AS (
      SELECT vec_id, label,
             FLOOR((list_dot_product(CAST(embedding AS DOUBLE[]), qv)) * 1000000 + 0.5)
               / 1000000 AS score
      FROM embeddings, {_QVEC_SQL} q
      WHERE vec_id <> 0),
    knn AS (SELECT * FROM scored ORDER BY score DESC, vec_id LIMIT 10),
    votes AS (SELECT label, COUNT(*) AS n_votes FROM knn GROUP BY label)
    SELECT CAST(label AS BIGINT) AS predicted_label, n_votes
    FROM votes ORDER BY n_votes DESC, label LIMIT 1
    """,
)
def j_knn_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN (k=10) majority-vote label for the query vector, self
    excluded; deterministic tie-breaks at both stages."""
    t = load(spark, sf_dir)
    q = t.embeddings.where(F.col("vec_id") == 0).select(as_double("embedding").alias("qv"))
    knn = brute_topk(
        t.embeddings.where(F.col("vec_id") != 0).crossJoin(F.broadcast(q)),
        F.col("qv"),
        k=10,
    )
    return (
        knn.groupBy("label")
        .agg(F.count("*").alias("n_votes"))
        .orderBy(F.col("n_votes").desc(), F.col("label"))
        .limit(1)
        .select(F.col("label").cast("long").alias("predicted_label"), "n_votes")
    )


@query(
    "j_sim_pairs",
    oracle="""
    SELECT e1.vec_id AS id_a, e2.vec_id AS id_b, e1.label AS label,
           FLOOR((list_dot_product(CAST(e1.embedding AS DOUBLE[]),
                                   CAST(e2.embedding AS DOUBLE[]))) * 1000000 + 0.5)
             / 1000000 AS score
    FROM embeddings e1 JOIN embeddings e2
      ON e1.label = e2.label AND e1.vec_id < e2.vec_id
    WHERE FLOOR((list_dot_product(CAST(e1.embedding AS DOUBLE[]),
                                  CAST(e2.embedding AS DOUBLE[]))) * 1000000 + 0.5)
            / 1000000 >= 0.3
    """,
)
def j_sim_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs similarity >= 0.3 within label groups — the EXACT
    ground-truth variant: with ~10 labels the candidate space is
    Σn_g² ≈ n²/10 pairs, which does not survive 100×. The registered
    production paths are `j_sim_pairs_bucketed`/`j_sim_pairs_banded`;
    keep this one for oracle-exact verification and recall measurement
    of the approximate variants.

    Scored via the per-group blocked numpy kernel (label_gemm_pairs) —
    the candidate pairs exist only to be scored and filtered, so the
    Σn_g² intermediate never materializes as JVM join rows; the strict
    left-fold accumulate keeps it bit-identical to the declarative
    label self-join and to the DuckDB oracle (j_dedup_embed remains
    the declarative-join exact variant for plan diversity)."""
    t = load(spark, sf_dir)
    from ..operators.similarity import label_gemm_pairs

    tagged = t.embeddings.select(
        "vec_id", as_double("embedding").alias("v"), "label"
    )
    return label_gemm_pairs(
        tagged, tau=0.3, parallelism=spark.sparkContext.defaultParallelism
    ).select("id_a", "id_b", "label", "score")


@query(
    "j_dedup_embed",
    oracle="""
    WITH pairs AS (
      SELECT e1.vec_id AS a, e2.vec_id AS b
      FROM embeddings e1 JOIN embeddings e2
        ON e1.label = e2.label AND e1.vec_id <> e2.vec_id
      WHERE FLOOR((list_dot_product(CAST(e1.embedding AS DOUBLE[]),
                                    CAST(e2.embedding AS DOUBLE[]))) * 1000000 + 0.5)
              / 1000000 >= 0.3)
    SELECT v.vec_id, v.label,
           LEAST(v.vec_id, COALESCE(MIN(p.b), v.vec_id)) AS keep_id,
           CAST(COUNT(p.b) AS BIGINT) AS n_near,
           (LEAST(v.vec_id, COALESCE(MIN(p.b), v.vec_id)) = v.vec_id) AS is_keeper
    FROM embeddings v LEFT JOIN pairs p ON p.a = v.vec_id
    GROUP BY v.vec_id, v.label
    """,
)
def j_dedup_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup dedup: each vector's keeper is the
    min vec_id among itself and its >= 0.3-cosine neighbors (same label)
    — the single-hop greedy keeper assignment of a semantic-dedup pass.
    EXACT ground-truth variant (label-keyed Σn_g² pairs — quadratic at
    100×); the registered production path is `j_dedup_embed_bucketed`
    (hyperplane-sketch equi-key, candidate pairs per bucket —
    plan-pinned). Keep this one as the oracle-exact recall reference
    for the bucketed variant.

    Scored via the per-group blocked numpy kernel (label_gemm_pairs,
    the j_sim_pairs r11 treatment — it was the registry's last
    r3-era Σn_g² JVM join, 3.9 s at sf0.1): the quadratic candidate
    space lives only inside blk×blk GEMM tiles, never as join rows;
    each undirected surviving pair then mirrors into its two directed
    rows for the per-vector neighbor rollup. The strict left-fold
    accumulate keeps scores bit-identical to the declarative self-join
    the DuckDB oracle still runs — pair SET equality is exactly what
    the hash check asserts."""
    t = load(spark, sf_dir)
    from ..operators.similarity import label_gemm_pairs

    tagged = t.embeddings.select(
        "vec_id", as_double("embedding").alias("v"), "label"
    )
    und = label_gemm_pairs(
        tagged, tau=0.3, parallelism=spark.sparkContext.defaultParallelism
    )
    pairs = und.select(F.col("id_a").alias("a"), F.col("id_b").alias("b")).unionAll(
        und.select(F.col("id_b").alias("a"), F.col("id_a").alias("b"))
    )
    base = t.embeddings.select("vec_id", "label")
    keep = F.least(F.col("vec_id"), F.coalesce(F.min("b"), F.col("vec_id")))
    return (
        base.join(pairs, base.vec_id == pairs.a, "left")
        .groupBy("vec_id", "label")
        .agg(
            keep.alias("keep_id"),
            F.count("b").alias("n_near"),
            (keep == F.col("vec_id")).alias("is_keeper"),
        )
    )


# ---- bucketed all-pairs (the 100 TB replacements for the label-keyed
# quadratics above) ----------------------------------------------------
#
# The join key is the random-hyperplane sign sketch (operators/
# similarity.hyperplane_sketch): data-independent ±1 plane patterns,
# computed on the driver and embedded as literals on BOTH engines — the
# oracle SQL below interpolates the exact same sign matrix, so bucket
# assignment is bit-identical (list_dot_product folds sequentially like
# dot_expr; signs are exact ±1.0 doubles).

_BUCKET_PLANES = 8
_BUCKET_DIM = 64


def _bucket_sql_expr() -> str:
    """DuckDB twin of hyperplane_sketch(embedding, 8, 64): sum over
    planes of 2^p * (dot(v, signs_p) >= 0)."""
    from ..operators.similarity import _plane_sign

    terms = []
    for p in range(_BUCKET_PLANES):
        signs = ", ".join(
            str(_plane_sign(p, j)) for j in range(_BUCKET_DIM)
        )
        terms.append(
            f"(CASE WHEN list_dot_product(v, [{signs}]) >= 0 THEN {1 << p} ELSE 0 END)"
        )
    return " + ".join(terms)


def _bucketed_base_sql() -> str:
    return f"""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    b AS (SELECT vec_id, label, v, {_bucket_sql_expr()} AS bucket FROM e)
"""


@query(
    "j_sim_pairs_bucketed",
    oracle=_bucketed_base_sql()
    + """
    , scored AS (
      SELECT a.vec_id AS id_a, b2.vec_id AS id_b, CAST(a.bucket AS BIGINT) AS bucket,
             FLOOR((list_dot_product(a.v, b2.v)) * 1000000 + 0.5) / 1000000 AS score
      FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id)
    SELECT id_a, id_b, bucket, score FROM scored WHERE score >= 0.3
    """,
)
def j_sim_pairs_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs similarity >= 0.3 restricted to hyperplane-LSH buckets —
    the scale-safe registered replacement for j_sim_pairs' label-keyed
    quadratic. 8 sign-planes → 256 buckets; the bucket is the join
    equi-key, so candidate pairs are Σ n_b² over buckets (~n²/256 for
    balanced buckets) instead of n²/|labels|, and the key is available
    at WRITE time: at 100 TB the table is bucketed/partitioned by
    `bucket` and the self-join is exchange-free.

    Recall caveat (measured, j_lsh_recall): ALL 8 sign bits must match,
    so a cosine-0.32 pair collides with only ~0.6^8 ≈ 2% probability —
    this is a HIGH-PRECISION cheap candidate filter, not a
    recall-oriented path. For recall at a weak threshold use the
    AND/OR-amplified j_sim_pairs_banded (recall ~0.70 measured,
    floor-pinned).

    The operator's contract is "same-bucket pairs with score >= 0.3" —
    the oracle computes the identical definition (same literal sign
    matrix), so this is hash-checked, not rows-only."""
    t = load(spark, sf_dir)
    from ..operators.similarity import hyperplane_sketch

    tagged = t.embeddings.select(
        "vec_id",
        "label",
        "embedding",
        hyperplane_sketch("embedding", n_planes=_BUCKET_PLANES, dim=_BUCKET_DIM)
        .cast("long")
        .alias("bucket"),
    )
    e1 = tagged.alias("e1")
    e2 = tagged.alias("e2")
    score = rnd(dot_expr(as_double(F.col("e1.embedding")), as_double(F.col("e2.embedding"))), 6)
    return (
        e1.join(
            e2,
            (F.col("e1.bucket") == F.col("e2.bucket"))
            & (F.col("e1.vec_id") < F.col("e2.vec_id")),
        )
        .select(
            F.col("e1.vec_id").alias("id_a"),
            F.col("e2.vec_id").alias("id_b"),
            F.col("e1.bucket").alias("bucket"),
            score.alias("score"),
        )
        .where(F.col("score") >= 0.3)
    )


@query(
    "j_dedup_embed_bucketed",
    oracle=_bucketed_base_sql()
    + """
    , pairs AS (
      SELECT a.vec_id AS a, b2.vec_id AS b
      FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id <> b2.vec_id
      WHERE FLOOR((list_dot_product(a.v, b2.v)) * 1000000 + 0.5) / 1000000 >= 0.3)
    SELECT v.vec_id, v.label, CAST(v.bucket AS BIGINT) AS bucket,
           LEAST(v.vec_id, COALESCE(MIN(p.b), v.vec_id)) AS keep_id,
           CAST(COUNT(p.b) AS BIGINT) AS n_near,
           (LEAST(v.vec_id, COALESCE(MIN(p.b), v.vec_id)) = v.vec_id) AS is_keeper
    FROM b v LEFT JOIN pairs p ON p.a = v.vec_id
    GROUP BY v.vec_id, v.label, v.bucket
    """,
)
def j_dedup_embed_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine dedup keyed on hyperplane-LSH buckets — the
    scale-safe registered replacement for j_dedup_embed's label-keyed
    quadratic. Same greedy keeper rule (min vec_id among self and
    >= 0.3-cosine same-bucket neighbors); the bucket equi-key carries
    the self-join shuffle, and at 100 TB it is a write-time bucketing
    key so the candidate join co-locates without an exchange."""
    t = load(spark, sf_dir)
    from ..operators.similarity import hyperplane_sketch

    tagged = t.embeddings.select(
        "vec_id",
        "label",
        "embedding",
        hyperplane_sketch("embedding", n_planes=_BUCKET_PLANES, dim=_BUCKET_DIM)
        .cast("long")
        .alias("bucket"),
    )
    e1 = tagged.alias("e1")
    e2 = tagged.alias("e2")
    score = rnd(dot_expr(as_double(F.col("e1.embedding")), as_double(F.col("e2.embedding"))), 6)
    pairs = (
        e1.join(
            e2,
            (F.col("e1.bucket") == F.col("e2.bucket"))
            & (F.col("e1.vec_id") != F.col("e2.vec_id")),
        )
        .where(score >= 0.3)
        .select(F.col("e1.vec_id").alias("a"), F.col("e2.vec_id").alias("b"))
    )
    base = tagged.select("vec_id", "label", "bucket")
    keep = F.least(F.col("vec_id"), F.coalesce(F.min("b"), F.col("vec_id")))
    return (
        base.join(pairs, base.vec_id == pairs.a, "left")
        .groupBy("vec_id", "label", "bucket")
        .agg(
            keep.alias("keep_id"),
            F.count("b").alias("n_near"),
            (keep == F.col("vec_id")).alias("is_keeper"),
        )
    )


@query(
    "j_semdedup",
    oracle=_bucketed_base_sql()
    + """
    , flat AS (SELECT bucket, generate_subscripts(v, 1) AS dim, unnest(v) AS x FROM b),
    centd AS (SELECT bucket, dim, FLOOR((AVG(x)) * 1000000 + 0.5) / 1000000 AS c
              FROM flat GROUP BY bucket, dim),
    cent AS (SELECT bucket, list(c ORDER BY dim) AS cv FROM centd GROUP BY bucket),
    scored AS (
      SELECT vec_id, label, b.bucket, v,
             FLOOR((list_dot_product(v, cv)) * 1000000 + 0.5) / 1000000 AS sim
      FROM b JOIN cent ON b.bucket = cent.bucket),
    ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY bucket
                                            ORDER BY sim DESC, vec_id) AS rk
               FROM scored),
    dropped AS (
      SELECT DISTINCT lo.vec_id AS d
      FROM ranked hi JOIN ranked lo ON hi.bucket = lo.bucket AND hi.rk < lo.rk
      WHERE FLOOR((list_dot_product(hi.v, lo.v)) * 1000000 + 0.5) / 1000000 >= 0.3)
    SELECT r.vec_id, r.label, CAST(r.bucket AS BIGINT) AS bucket,
           r.sim AS sim_centroid, (d.d IS NULL) AS keep
    FROM ranked r LEFT JOIN dropped d ON r.vec_id = d.d
    """,
)
def j_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, public): semantic dedup that keeps,
    within each embedding cluster, the best-centroid-fit representative
    of every >= tau cosine neighborhood. Clusters here are the same
    hyperplane sign-buckets the other *_bucketed ops key on (at 100 TB
    the cluster id comes from the IVF k-means instead — swap the bucket
    column, the rest of the plan is unchanged). Deterministic rule:
    rank by (rounded centroid-similarity DESC, vec_id); a vector is
    dropped iff a HIGHER-ranked same-bucket vector is >= 0.3 cosine.

    Scale shape: centroids are (bucket, dim) partial aggs reassembled
    into 256 broadcast rows; ranking windows over the bucket key (the
    write-time partition key — no single-partition window); the
    pairwise check is the bucket-keyed self-join all *_bucketed ops
    share. Centroid sims are rounded to 1e-6 BEFORE ranking so the
    rank order cannot differ between engines on last-ulp sums."""
    t = load(spark, sf_dir)
    from ..operators.similarity import hyperplane_sketch

    tagged = t.embeddings.select(
        "vec_id",
        "label",
        as_double("embedding").alias("v"),
        hyperplane_sketch("embedding", n_planes=_BUCKET_PLANES, dim=_BUCKET_DIM)
        .cast("long")
        .alias("bucket"),
    )
    flat = tagged.select("bucket", F.posexplode("v").alias("pos", "x"))
    centd = flat.groupBy("bucket", "pos").agg(rnd(F.avg("x"), 6).alias("c"))
    cent = centd.groupBy("bucket").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
        ).alias("cv")
    )
    scored = tagged.join(F.broadcast(cent), "bucket").select(
        "vec_id",
        "label",
        "bucket",
        "v",
        rnd(dot_expr(F.col("v"), F.col("cv")), 6).alias("sim"),
    )
    w = Window.partitionBy("bucket").orderBy(F.col("sim").desc(), "vec_id")
    ranked = scored.withColumn("rk", F.row_number().over(w)).persist()
    hi, lo = ranked.alias("hi"), ranked.alias("lo")
    dropped = (
        hi.join(
            lo,
            (F.col("hi.bucket") == F.col("lo.bucket")) & (F.col("hi.rk") < F.col("lo.rk")),
        )
        .where(rnd(dot_expr(F.col("hi.v"), F.col("lo.v")), 6) >= 0.3)
        .select(F.col("lo.vec_id").alias("d"))
        .distinct()
    )
    return ranked.join(dropped, ranked.vec_id == dropped.d, "left").select(
        "vec_id",
        "label",
        "bucket",
        F.col("sim").alias("sim_centroid"),
        F.col("d").isNull().alias("keep"),
    )


@query(
    "j_ann_lsh",
    oracle=_bucketed_base_sql()
    + """
    , q AS (SELECT v AS qv, bucket AS qb FROM b WHERE vec_id = 0)
    SELECT vec_id, label, CAST(bucket AS BIGINT) AS bucket,
           FLOOR((list_dot_product(v, qv)) * 1000000 + 0.5) / 1000000 AS score
    FROM b, q
    WHERE bit_count(xor(CAST(bucket AS BIGINT), CAST(qb AS BIGINT))) <= 2
    ORDER BY score DESC, vec_id LIMIT 10
    """,
)
def j_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH bucketed ANN (the scale path next to j_ann_ivf):
    8 sign-bits → 256 buckets, multi-probe Hamming radius 2 (37 buckets,
    ~14% of the corpus). At 100 TB the bucket is a write-time partition
    key, so the probe is partition pruning — no shuffle, no full scan.

    Hash-checked, not rows-only: "approximate" here means a DEFINED
    candidate set (Hamming <= 2 of the query's bucket), and the oracle
    computes the identical definition — same literal sign matrix as the
    *_bucketed qids, Hamming via bit_count(xor(...)). The multi-probe
    isin() on the Spark side and the bit_count predicate are the same
    set by construction (lsh_probe_buckets enumerates that ball)."""
    from ..operators.similarity import lsh_search

    t = load(spark, sf_dir)
    return lsh_search(t.embeddings, query_id=0, k=10, n_planes=8, radius=2)


def _centroid_values_sql() -> str:
    """Train the coarse quantizer once at import time (driver-side,
    bounded sample — see kmeans_train_local) on the canonical
    correctness SF and render the centroids as a DuckDB VALUES list —
    the shared literal-model half of the IVF oracles. A training
    failure (missing testdata, numpy change) PROPAGATES: silently
    downgrading to oracle=None would shrink test_oracle's
    parametrization and flip j_ann_ivf/j_ann_recall to rows-only
    without any test going red (the r8 verdict's finding; the
    queries==oracles invariant test now pins the 0-rows-only claim)."""
    import os

    from ..operators.similarity import kmeans_train_local

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
    cents = kmeans_train_local(sf_dir, k=_IVF_K, iters=_IVF_ITERS)
    return ", ".join(
        f"({cid}, [{', '.join(repr(x) for x in v)}])" for cid, v in cents
    )


def _ivf_oracle() -> str:
    """DuckDB twin of j_ann_ivf: literal centroids from
    _centroid_values_sql; assignment (argmax dot, tie -> smallest cid),
    probe ranking (dot DESC, cid ASC, nprobe=4) and scoring replicate
    the Spark plan with the shared sequential-fold dot, so every float
    is bit-identical."""
    rows = _centroid_values_sql()
    return f"""
    WITH cents(cid, cv) AS (VALUES {rows}),
    e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    scored AS (SELECT e.vec_id, e.label, e.v, c.cid,
                      list_dot_product(e.v, cv) AS s
               FROM e CROSS JOIN cents c),
    assigned AS (SELECT vec_id, label, v, cid AS cluster_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                     ORDER BY s DESC, cid) AS rk
        FROM scored) WHERE rk = 1),
    q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
    probe AS (SELECT cid FROM cents, q
              ORDER BY list_dot_product(qv, cv) DESC, cid LIMIT {_IVF_NPROBE})
    SELECT vec_id, label, CAST(cluster_id AS BIGINT) AS cluster_id,
           FLOOR((list_dot_product(v, qv)) * 1000000 + 0.5) / 1000000 AS score
    FROM assigned, q
    WHERE cluster_id IN (SELECT cid FROM probe)
    ORDER BY score DESC, vec_id LIMIT 10
    """


_IVF_K = 16
_IVF_ITERS = 2
_IVF_NPROBE = 4


@query("j_ann_ivf", oracle=_ivf_oracle())
def j_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate NN: 16 spherical-k-means centroids, probe 4 —
    scans ~1/4 of the corpus; top-1 recall asserted in tests (the
    query's own cluster is always probed).

    The quantizer is trained driver-side on a bounded deterministic
    sample (kmeans_train_local) and enters the plan as a LITERAL
    centroid matrix, which upgrades this qid from rows-only to
    hash-checked: the oracle embeds the same literals and replicates
    assignment + probe with the shared sequential-fold dot. Strictly
    better at scale too — the query runs zero training shuffles
    (assignment is one narrow map stage; at 100 TB it's a write-time
    partition key and the probe is partition pruning)."""
    from ..operators.similarity import kmeans_train_local

    t = load(spark, sf_dir)
    cents = kmeans_train_local(sf_dir, k=_IVF_K, iters=_IVF_ITERS)
    assigned, cents = ivf_assign(t.embeddings, k_clusters=_IVF_K, cents=cents)
    # query vector: driver-side memoized metadata read (similarity.query_vector)
    qvec = list(query_vector(sf_dir))
    return ivf_search(assigned, cents, qvec, k=10, nprobe=_IVF_NPROBE)


# ---------------------------------------------------------- text analysis

@query(
    "j_text_stats",
    oracle="""
    SELECT lang, source, COUNT(*) AS n_docs,
           FLOOR((AVG(n_chars)) * 10000 + 0.5) / 10000 AS avg_chars,
           MAX(n_chars) AS max_chars,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
    FROM documents GROUP BY lang, source
    """,
)
def j_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus stats by lang x source: doc/char/token counts."""
    t = load(spark, sf_dir)
    return t.documents.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        rnd(F.avg("n_chars"), 4).alias("avg_chars"),
        F.max("n_chars").alias("max_chars"),
        F.sum(F.size(tokens_col("text"))).cast("long").alias("n_tokens"),
    )


@query(
    "j_tfidf",
    oracle="""
    WITH corpus AS (SELECT COUNT(*) AS n FROM documents),
    tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
            WHERE doc_id < 20),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
    dtok AS (SELECT DISTINCT doc_id, term
             FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)),
    idf AS (SELECT term, COUNT(*) AS df FROM dtok GROUP BY term),
    scored AS (
      SELECT tf.doc_id, tf.term,
             FLOOR((tf.tf * ln((corpus.n + 1.0) / (idf.df + 1.0))) * 1000000 + 0.5)
               / 1000000 AS tfidf
      FROM tf JOIN idf USING (term) CROSS JOIN corpus),
    ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                            ORDER BY tfidf DESC, term) AS rk
               FROM scored)
    SELECT doc_id, term, tfidf, rk FROM ranked WHERE rk <= 5
    """,
)
def j_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-5 terms per doc (docs 0-19; DF over the full corpus).
    All expressions: explode → two hash aggs → broadcast idf join →
    ranked window. The idf side is tiny (vocab) — always broadcast.

    The corpus size enters the plan as a broadcast 1-row aggregate
    cross-join (exactly like the oracle's `CROSS JOIN corpus`), not a
    driver-side .count(): building this DataFrame runs zero Spark jobs,
    and at 100 TB there is no eager full-scan sync point."""
    t = load(spark, sf_dir)
    corpus = t.documents.agg(F.count("*").alias("n_corpus"))
    tok = t.documents.where(F.col("doc_id") < 20).select(
        "doc_id", F.explode(tokens_col("text")).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dtok = t.documents.select("doc_id", F.explode(tokens_col("text")).alias("term")).distinct()
    idf = dtok.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        tf.join(F.broadcast(idf), "term")
        .crossJoin(F.broadcast(corpus))
        .select(
            "doc_id",
            "term",
            rnd(
                F.col("tf") * F.log((F.col("n_corpus") + 1.0) / (F.col("df") + 1.0)), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return scored.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= 5)


@query(
    "j_source_tfidf",
    oracle="""
    WITH st AS (SELECT source, unnest(string_split(text, ' ')) AS term
                FROM documents),
    tf AS (SELECT source, term, CAST(COUNT(*) AS BIGINT) AS tf
           FROM st GROUP BY source, term),
    df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
    ns AS (SELECT CAST(COUNT(DISTINCT source) AS BIGINT) AS s FROM documents),
    scored AS (
      SELECT tf.source, tf.term, tf.tf, df.df,
             CAST(FLOOR((tf.tf * ln((ns.s + 1.0) / (df.df + 1.0)))
                        * 1000000 + 0.5) AS BIGINT) AS score6
      FROM tf JOIN df USING (term) CROSS JOIN ns),
    ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                                            ORDER BY score6 DESC, term) AS rk
               FROM scored)
    SELECT source, term, tf, df,
           score6 / 1000000.0 AS tfidf, rk
    FROM ranked WHERE rk <= 5
    """,
)
def j_source_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinctive-term profile per SOURCE: tf-idf where the "document"
    is the source and df counts how many SOURCES contain the term —
    the slice-characterization panel a mixture designer reads next to
    j_kl_sources (this names WHICH terms make a source diverge, KL
    only says how much) and the per-doc j_tfidf (whose df is
    document-frequency; a term common in every doc of ONE source is
    noise there but exactly the signal here).

    Determinism: ranking runs on the 1e-6-FLOORED scaled score (exact
    BIGINT) with a term tiebreak. The flooring removes the
    accumulation-order flake class, but the score itself contains ONE
    ln((s+1)/(df+1)) libm term per (source, term) — ln is
    implementation-defined (the repo's sqrt-safe / exp-ln-unsafe
    convention), so a 1-ulp JVM-vs-DuckDB divergence CAN flip score6
    on a 1e-6 grid boundary and with it the top-5 rank. Accepted
    unrounded-libm-term class (same as j_ngram_entropy_curve's
    entropy column); boundary odds are ~1e-10 per cell and the
    tri-scale sweep has never hit one, but this is an accepted risk,
    not a guarantee (r12 ADVICE).

    Plan: ONE (source, term) hash agg with map-side partials; df is a
    RE-AGG of those type rows (no second corpus pass — the
    j_perplexity_eval collapse); the source-count 1-row aggregate and
    the vocab-sized df relation broadcast into the scoring join; the
    rank window partitions by source (map-side WindowGroupLimit).
    Output is 5·|sources| dashboard rows at any corpus scale."""
    t = load(spark, sf_dir)
    tf = (
        t.documents.select("source", F.explode(tokens_col("text")).alias("term"))
        .groupBy("source", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    ns = t.documents.agg(F.countDistinct("source").cast("long").alias("s"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(ns))
        .select(
            "source",
            "term",
            "tf",
            "df",
            F.floor(
                F.col("tf") * F.log((F.col("s") + 1.0) / (F.col("df") + 1.0)) * 1000000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("score6"),
        )
    )
    w = Window.partitionBy("source").orderBy(F.col("score6").desc(), F.col("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 5)
        .select(
            "source",
            "term",
            "tf",
            "df",
            (F.col("score6") / F.lit(1000000.0)).alias("tfidf"),
            "rk",
        )
    )


@query(
    "j_lang_quality",
    oracle="""
    SELECT doc_id, lang, n_chars,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           FLOOR((len(string_split(text, ' ')) * 1.0 / n_chars) * 1000000 + 0.5)
             / 1000000 AS tok_density
    FROM documents
    WHERE lang IN ('en', 'de', 'fr')
      AND n_chars BETWEEN 100 AND 2000
      AND n_chars = length(text)
      AND len(string_split(text, ' ')) >= 20
    """,
)
def j_lang_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality filter: lang whitelist, length bounds, metadata-integrity
    check (n_chars == length(text)), minimum token count."""
    t = load(spark, sf_dir)
    n_tok = F.size(tokens_col("text"))
    return (
        t.documents.where(
            F.col("lang").isin("en", "de", "fr")
            & F.col("n_chars").between(100, 2000)
            & (F.col("n_chars") == F.length("text"))
            & (n_tok >= 20)
        )
        .select(
            "doc_id",
            "lang",
            "n_chars",
            n_tok.cast("long").alias("n_tokens"),
            rnd(n_tok * 1.0 / F.col("n_chars"), 6).alias("tok_density"),
        )
    )


def _lang_scores(t) -> DataFrame:
    """The full (doc_id, cand, score) naive-Bayes score relation behind
    j_lang_id — extracted so the selective-prediction audit can see the
    runner-up score; j_lang_id composes rk=1 on top unchanged."""
    tok = t.documents.select("doc_id", F.explode(tokens_col("text")).alias("term"))
    langs = t.documents.select("lang").distinct()
    # Vocabulary size as a broadcast 1-row aggregate (the oracle's
    # `CROSS JOIN vocab`) — not an eager distinct().count(), which at
    # 100 TB would be a full shuffle executed during plan construction.
    vocab = tok.agg(F.countDistinct("term").alias("v"))
    prof = (
        t.documents.select("lang", F.explode(tokens_col("text")).alias("term"))
        .groupBy("lang", "term")
        .agg(F.count("*").alias("cnt"))
    )
    totals = prof.groupBy("lang").agg(F.sum("cnt").alias("tot"))
    prof_t = F.broadcast(
        prof.join(totals, "lang").select(
            F.col("lang").alias("cand"), "term", "cnt", "tot"
        )
    )
    totals_b = F.broadcast(totals.select(F.col("lang").alias("cand"), "tot"))
    return (
        tok.crossJoin(F.broadcast(langs.select(F.col("lang").alias("cand"))))
        .join(prof_t, ["cand", "term"], "left")
        .drop("tot")
        .join(totals_b, "cand")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id", "cand")
        .agg(
            rnd(
                F.sum(
                    F.log(
                        (F.coalesce(F.col("cnt"), F.lit(0)) + 1.0) / (F.col("tot") + F.col("v"))
                    )
                ),
                4,
            ).alias("score")
        )
    )



@query(
    "j_lang_id",
    oracle="""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
    langs AS (SELECT DISTINCT lang FROM documents),
    vocab AS (SELECT COUNT(DISTINCT term) AS v FROM tok),
    prof AS (SELECT lang, term, COUNT(*) AS cnt
             FROM (SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents)
             GROUP BY lang, term),
    totals AS (SELECT lang, SUM(cnt) AS tot FROM prof GROUP BY lang),
    scores AS (
      SELECT tok.doc_id, langs.lang AS cand,
             FLOOR((SUM(ln((COALESCE(prof.cnt, 0) + 1.0) / (totals.tot + vocab.v))))
                   * 10000 + 0.5) / 10000 AS score
      FROM tok CROSS JOIN langs CROSS JOIN vocab
      LEFT JOIN prof ON prof.lang = langs.lang AND prof.term = tok.term
      JOIN totals ON totals.lang = langs.lang
      GROUP BY tok.doc_id, langs.lang, vocab.v),
    ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                            ORDER BY score DESC, cand) AS rk
               FROM scores)
    SELECT doc_id, cand AS pred_lang, score FROM ranked WHERE rk = 1
    """,
)
def j_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID: add-one-smoothed unigram naive Bayes, profiles
    trained on the corpus itself (the fixture langs share one vocabulary,
    so a stopword whitelist cannot discriminate — the operator shape is
    what's under test). Scale: profile is vocab x langs — broadcast."""
    t = load(spark, sf_dir)
    scores = _lang_scores(t)
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("cand"))
    return (
        scores.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("doc_id", F.col("cand").alias("pred_lang"), "score")
    )


@query(
    "j_fingerprint",
    oracle="""
    WITH sh AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                 i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS s
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents))
    SELECT doc_id, MIN(md5(s)) AS fingerprint, COUNT(*) AS n_shingles
    FROM sh GROUP BY doc_id
    """,
)
def j_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: min-of-hashes over 3-gram shingles (a
    1-permutation MinHash / winnowing-style sketch) using portable md5.
    Docs with < 3 tokens have no shingles and hence NO fingerprint row
    (the unnest-based oracle drops them identically)."""
    t = load(spark, sf_dir)
    # explode + min-agg beats array_min(transform(...)) ~30% (measured):
    # md5 runs in the agg's codegen loop with map-side partial min
    return (
        shingle_rows(t.documents, ["doc_id"])
        .groupBy("doc_id")
        .agg(F.min(F.md5("sh")).alias("fingerprint"), F.count("*").alias("n_shingles"))
    )


# ------------------------------------------------------------ multimodal

@query(
    "j_multimodal",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
           md5(text) AS checksum,
           2 AS n_modalities
    FROM documents
    """,
)
def j_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal packing: struct<text, payload binary, meta map> with
    per-modality size + checksum (payload == utf8(text) in fixtures, so
    md5 matches across engines)."""
    t = load(spark, sf_dir)
    mm = pack_multimodal(t.documents)
    return mm.select(
        "doc_id",
        F.octet_length(F.col("mm.payload")).cast("long").alias("n_bytes"),
        F.md5(F.col("mm.payload")).alias("checksum"),
        F.lit(2).alias("n_modalities"),
    )


# Shared CTEs for the media oracles: the SQL twin of
# operators/multimodal.media_dims + the exact container bytes
# (fixture text is pure printable ASCII — tests pin this — so the
# utf-8 payload reconstructs as a SQL string and md5 matches the raw
# bytes the kernel hashed).
_MEDIA_DIMS_SQL = """
    d AS (SELECT doc_id, text, 8 + doc_id % 24 AS w, 8 + (doc_id // 5) % 24 AS h
          FROM documents)
"""
_PPM_HEADER_SQL = (
    "'P6' || chr(10) || CAST(w AS VARCHAR) || ' ' || CAST(h AS VARCHAR)"
    " || chr(10) || '255' || chr(10)"
)
# tiled pixel fill: text repeated to exactly w*h*3 bytes (shift 0)
_MEDIA_PIX_SQL = f"""
    px AS (SELECT doc_id, w, h,
             substr(repeat(text, CAST(w * h * 3 // len(text) AS INTEGER) + 1),
                    1, w * h * 3) AS pix
           FROM d)
"""


@query(
    "j_multimodal_frames",
    oracle=f"""
    WITH {_MEDIA_DIMS_SQL},
    f AS (SELECT d.*, t.frame_idx,
            CAST((({VIDEO_FRAMES} - 1) * t.frame_idx) // 3 AS INTEGER) AS k
          FROM d CROSS JOIN range(0, 4) t(frame_idx)),
    rot AS (SELECT doc_id, frame_idx, w, h,
              substr(text, (k % len(text)) + 1) || substr(text, 1, k % len(text))
                AS rtext
            FROM f),
    px AS (SELECT doc_id, frame_idx, w, h,
             substr(repeat(rtext, CAST(w * h * 3 // len(rtext) AS INTEGER) + 1),
                    1, w * h * 3) AS pix
           FROM rot)
    SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
           CAST(length({_PPM_HEADER_SQL}) + w * h * 3 AS BIGINT) AS n_bytes,
           md5({_PPM_HEADER_SQL} || pix) AS checksum
    FROM px
    """,
)
def j_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling stage (video path): the payload is a REAL
    concatenated-P6 stream (8 frames, pack_video) and the kernel walks
    the actual container, picking 4 evenly-spaced frames — 1→N row
    multiplication inside the Arrow batch, no explode shuffle.
    BYTE-level verified: the oracle reconstructs each sampled frame's
    exact container bytes (dims, header, rotated-tile pixel fill) and
    md5-matches the frame the stream walk emitted."""
    from ..operators.multimodal import pack_video, sample_frames

    t = load(spark, sf_dir)
    frames = sample_frames(pack_video(t.documents), n_frames=4)
    return frames.select(
        "doc_id",
        "frame_idx",
        F.octet_length("frame").cast("long").alias("n_bytes"),
        F.md5("frame").alias("checksum"),
    )


_RESIZE_BYTES = len(b"P6\n64 64\n255\n") + 64 * 64 * 3


@query(
    "j_multimodal_resize",
    oracle=f"""
    WITH {_MEDIA_DIMS_SQL},
    {_MEDIA_PIX_SQL},
    rs AS (SELECT doc_id,
             list_aggregate(list_transform(range(0, 4096, 1),
                i -> substr(pix,
                            3 * ((((i // 64) * h // 64) * w) + ((i % 64) * w // 64)) + 1,
                            3)),
                'string_agg', '') AS rpix
           FROM px)
    SELECT doc_id, CAST(64 AS BIGINT) AS width, CAST(64 AS BIGINT) AS height,
           CAST({_RESIZE_BYTES} AS BIGINT) AS n_bytes,
           md5('P6' || chr(10) || '64 64' || chr(10) || '255' || chr(10) || rpix)
             AS checksum
    FROM rs
    """,
)
def j_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize stage: binary in → binary out at 64×64 via a REAL
    nearest-neighbor pixel-buffer resample (numpy fancy-indexing over
    the decoded (h, w, 3) array), re-encoded as P6. BYTE-level
    verified: the oracle recomputes the resample INDEPENDENTLY —
    per output pixel i it selects source pixel
    ((y*h)//64)*w + (x*w)//64 straight from the reconstructed pixel
    string — and md5-matches the kernel's entire output container."""
    from ..operators.multimodal import pack_media, resize_payloads

    t = load(spark, sf_dir)
    resized = resize_payloads(pack_media(t.documents), width=64, height=64)
    return resized.select(
        "doc_id",
        "width",
        "height",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.md5("payload").alias("checksum"),
    )


@query(
    "j_multimodal_features",
    oracle="""
    WITH flat AS (
      SELECT doc_id, unnest(list_transform(range(1, length(text) + 1),
             i -> ord(substr(text, i, 1)) // 16)) AS bucket
      FROM documents),
    hist AS (SELECT doc_id, bucket, COUNT(*) AS c FROM flat GROUP BY doc_id, bucket),
    norms AS (SELECT doc_id, sqrt(SUM(c * c)) AS n FROM hist GROUP BY doc_id)
    SELECT hist.doc_id, CAST(bucket AS BIGINT) AS bucket,
           FLOOR((c / n) * 1000000 + 0.5) / 1000000 AS v
    FROM hist JOIN norms ON hist.doc_id = norms.doc_id
    """,
)
def j_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-extract stage over binary payloads: L2-normalized 16-bin
    byte histogram via a numpy-vectorized mapInPandas kernel — a REAL
    (non-stub) embedding, and the proof that the Arrow kernel path has
    exact engine parity: the oracle recomputes the histogram character-
    wise in SQL (payload == utf8(text), ASCII fixtures) and the values
    hash-match. Zero buckets are dropped on both sides."""
    from ..operators.multimodal import extract_features

    t = load(spark, sf_dir)
    feats = extract_features(pack_multimodal(t.documents))
    return (
        feats.select("doc_id", F.posexplode("features").alias("bucket", "v"))
        .where(F.col("v") > 0)
        .select("doc_id", F.col("bucket").cast("long").alias("bucket"), rnd(F.col("v"), 6).alias("v"))
    )


@query(
    "j_multimodal_sim",
    oracle="""
    WITH flat AS (
      SELECT doc_id, unnest(list_transform(range(1, length(text) + 1),
             i -> ord(substr(text, i, 1)) // 16)) AS bucket
      FROM documents),
    hist AS (SELECT doc_id, bucket, COUNT(*) AS c FROM flat GROUP BY doc_id, bucket),
    norms AS (SELECT doc_id, sqrt(SUM(c * c)) AS n FROM hist GROUP BY doc_id),
    grid AS (SELECT d.doc_id, b.bucket
             FROM (SELECT DISTINCT doc_id FROM documents) d,
                  (SELECT unnest(range(0, 16)) AS bucket) b),
    densev AS (
      SELECT grid.doc_id,
             list(COALESCE(hist.c / norms.n, 0.0) ORDER BY grid.bucket) AS v
      FROM grid
      LEFT JOIN hist ON hist.doc_id = grid.doc_id AND hist.bucket = grid.bucket
      JOIN norms ON norms.doc_id = grid.doc_id
      GROUP BY grid.doc_id),
    q AS (SELECT v AS qv FROM densev WHERE doc_id = 0)
    SELECT densev.doc_id,
           FLOOR(list_dot_product(densev.v, q.qv) * 1000000 + 0.5) / 1000000 AS score
    FROM densev, q
    ORDER BY score DESC, doc_id LIMIT 10
    """,
)
def j_multimodal_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed multimodal retrieval pipeline: binary payload →
    feature-extract (Arrow kernel) → cosine top-10 vs doc 0's features.
    Same broadcast-query/TakeOrderedAndProject shape as j_sim_topk, but
    the embedding column is PRODUCED by the mapInPandas stage rather
    than read from parquet — end-to-end oracle-checked (the SQL twin
    rebuilds the histogram and uses list_dot_product on the dense
    bucket-ordered vector, matching dot_expr's fold order)."""
    from ..operators.multimodal import extract_features

    t = load(spark, sf_dir)
    feats = extract_features(pack_multimodal(t.documents))
    # filter BEFORE the kernel: predicates cannot push through the
    # opaque mapInPandas stage, so filtering feats would re-extract the
    # whole corpus just to keep one query row
    q = extract_features(
        pack_multimodal(t.documents.where(F.col("doc_id") == 0))
    ).select(F.col("features").alias("qv"))
    scored = feats.crossJoin(F.broadcast(q)).select(
        "doc_id", rnd(dot_expr(F.col("features"), F.col("qv")), 6).alias("score")
    )
    return scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(10)


@query(
    "j_multimodal_decode",
    oracle=f"""
    WITH {_MEDIA_DIMS_SQL},
    {_MEDIA_PIX_SQL}
    SELECT doc_id,
           CAST(length({_PPM_HEADER_SQL}) + w * h * 3 AS BIGINT) AS n_bytes,
           CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
           'ppm' AS format,
           md5({_PPM_HEADER_SQL} || pix) AS checksum
    FROM px
    """,
)
def j_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas decode over binary payloads. The
    payloads are genuine P6 PPM containers (pack_media) and the kernel
    PARSES their headers. BYTE-level verified: the oracle reconstructs
    every container (header + tiled pixel fill) and md5-matches the
    raw bytes the kernel hashed, alongside the parsed dims — a
    batching, alignment, or parsing bug hash-fails. Compressed codecs
    (jpeg/mp4) remain env-blocked; they would enter through this same
    kernel as another `format` branch."""
    from ..operators.multimodal import pack_media

    t = load(spark, sf_dir)
    return decode_payloads(pack_media(t.documents))


@query(
    "j_token_count",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(list_sum(list_transform(string_split(text, ' '),
                x -> CAST(ceil(len(x) / 4.0) AS BIGINT))) AS BIGINT) AS n_subwords,
           FLOOR((n_chars * 1.0 / len(string_split(text, ' '))) * 10000 + 0.5) / 10000
             AS chars_per_token
    FROM documents
    """,
)
def j_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting for training-data budgeting: whitespace tokens +
    a BPE-ish subword estimate (ceil(len/4) units per token ≈ the 4-chars
    -per-token rule of thumb) — pure array HOFs, no tokenizer library."""
    t = load(spark, sf_dir)
    # toks is materialized through its own projection before its three
    # references — inlined, Catalyst evaluates split() once per
    # reference (3 split nodes in the physical plan vs 1 staged; same
    # pattern measured 2-3.7x at sf0.1 on the quality.py ops).
    base = t.documents.select("doc_id", "n_chars", tokens_col("text").alias("toks"))
    toks = F.col("toks")
    return base.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda a, x: a + F.ceil(F.length(x) / 4.0)
        ).alias("n_subwords"),
        rnd(F.col("n_chars") * 1.0 / F.size(toks), 4).alias("chars_per_token"),
    )


@query(
    "j_quality_score",
    oracle="""
    WITH t AS (SELECT doc_id, lang, n_chars, string_split(text, ' ') AS toks
               FROM documents)
    SELECT doc_id, lang,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           FLOOR((len(list_filter(toks, x -> x IN ('the', 'a', 'of', 'to', 'in', 'and')))
                  * 1.0 / len(toks)) * 1000000 + 0.5) / 1000000 AS stopword_ratio,
           FLOOR((len(list_distinct(toks)) * 1.0 / len(toks)) * 1000000 + 0.5) / 1000000
             AS distinct_ratio,
           (n_chars BETWEEN 200 AND 5000
            AND len(toks) >= 30
            AND len(list_distinct(toks)) * 1.0 / len(toks) >= 0.1) AS keep
    FROM t
    """,
)
def j_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring (Gopher-rule style, public): stopword
    ratio, lexical diversity, length bounds → keep flag. All expression-
    level; at 100 TB this is a single scan with zero shuffles."""
    t = load(spark, sf_dir)
    # staged toks projection: the ratios reference the token array six
    # times; inlined that is 8 split() nodes in the physical plan, 1
    # staged (see quality.py for the measured 2-3.7x effect).
    base = t.documents.select("doc_id", "lang", "n_chars", tokens_col("text").alias("toks"))
    toks = F.col("toks")
    n = F.size(toks)
    stop_ratio = (
        F.size(F.filter(toks, lambda x: x.isin("the", "a", "of", "to", "in", "and"))) * 1.0 / n
    )
    distinct_ratio = F.size(F.array_distinct(toks)) * 1.0 / n
    return base.select(
        "doc_id",
        "lang",
        n.cast("long").alias("n_tokens"),
        rnd(stop_ratio, 6).alias("stopword_ratio"),
        rnd(distinct_ratio, 6).alias("distinct_ratio"),
        (
            F.col("n_chars").between(200, 5000) & (n >= 30) & (distinct_ratio >= 0.1)
        ).alias("keep"),
    )


@query(
    "j_embed_centroid",
    oracle="""
    WITH flat AS (
      SELECT label,
             generate_subscripts(embedding, 1) AS dim,
             unnest(CAST(embedding AS DOUBLE[])) AS x
      FROM embeddings)
    SELECT label, CAST(dim AS INTEGER) AS dim,
           FLOOR((AVG(x)) * 1000000 + 0.5) / 1000000 AS centroid,
           COUNT(*) AS n
    FROM flat GROUP BY label, dim
    """,
)
def j_embed_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroids of the embedding space (the training step of
    IVF/k-means): posexplode to (label, dim, value), one hash agg.
    At 100 TB: partial aggregation means the shuffle carries
    |labels| x dim rows per partition — constant, not data-sized."""
    t = load(spark, sf_dir)
    flat = t.embeddings.select(
        "label", F.posexplode(as_double("embedding")).alias("pos", "x")
    )
    return flat.groupBy("label", (F.col("pos") + 1).cast("int").alias("dim")).agg(
        rnd(F.avg("x"), 6).alias("centroid"),
        F.count("*").alias("n"),
    )


@query(
    "j_pipeline_curate",
    oracle="""
    WITH keepers AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text),
    curated AS (
      SELECT d.doc_id, d.lang, d.n_chars, len(string_split(d.text, ' ')) AS n_tok,
             len(list_distinct(string_split(d.text, ' '))) * 1.0 /
               len(string_split(d.text, ' ')) AS ldiv
      FROM documents d JOIN keepers USING (doc_id))
    SELECT doc_id, lang, n_chars,
           CAST(n_tok AS BIGINT) AS n_tokens,
           FLOOR(ldiv * 1000000 + 0.5) / 1000000 AS lexical_diversity
    FROM curated
    WHERE n_chars BETWEEN 200 AND 5000 AND n_tok >= 30 AND ldiv >= 0.1
    """,
)
def j_pipeline_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data curation pipeline: exact-dedup (keep
    min doc_id per text) → quality gate (length/tokens/diversity) →
    per-doc stats. One declarative plan: Catalyst fuses the semi-join
    and filters; at 100 TB this is one shuffle (the dedup groupBy) plus
    a scan — the shape of a production corpus-curation job."""
    t = load(spark, sf_dir)
    keepers = t.documents.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    # two-level staging (toks, then n_tok/ldiv) so the five references
    # share one split(): 7 split nodes inlined -> 5 staged (predicate
    # pushdown re-substitutes the filter's aliases; the projection-side
    # references stay shared).
    base = t.documents.join(keepers.select("doc_id"), "doc_id", "left_semi").select(
        "doc_id", "lang", "n_chars", tokens_col("text").alias("toks")
    )
    n_tok = F.size(F.col("toks"))
    ldiv = F.size(F.array_distinct(F.col("toks"))) * 1.0 / n_tok
    staged = base.select(
        "doc_id", "lang", "n_chars", n_tok.alias("n_tok"), ldiv.alias("ldiv")
    )
    return (
        staged.where(
            F.col("n_chars").between(200, 5000) & (F.col("n_tok") >= 30) & (F.col("ldiv") >= 0.1)
        )
        .select(
            "doc_id",
            "lang",
            "n_chars",
            F.col("n_tok").cast("long").alias("n_tokens"),
            rnd(F.col("ldiv"), 6).alias("lexical_diversity"),
        )
    )


def _lsh_recall_oracle() -> str:
    """Composes the already-registered exact and bucketed all-pairs
    oracles (registry.ORACLE — both are plain SELECTs) into a
    precision/recall evaluation. Built lazily at decoration time, after
    both constituent qids have registered."""
    from ..registry import ORACLE

    return f"""
    WITH exact AS ({ORACLE["j_sim_pairs"]}),
    approx AS ({ORACLE["j_sim_pairs_bucketed"]}),
    j AS (SELECT e.id_a AS eid, a.id_a AS aid
          FROM exact e FULL JOIN approx a
            ON e.id_a = a.id_a AND e.id_b = a.id_b),
    c AS (SELECT CAST(COUNT(*) FILTER (eid IS NOT NULL AND aid IS NOT NULL) AS BIGINT) AS tp,
                 CAST(COUNT(*) FILTER (aid IS NULL) AS BIGINT) AS fn,
                 CAST(COUNT(*) FILTER (eid IS NULL) AS BIGINT) AS fp
          FROM j)
    SELECT tp + fn AS n_exact, tp + fp AS n_approx, tp, fp, fn,
           FLOOR(tp * 1.0 / (tp + fp) * 1000000 + 0.5) / 1000000 AS precision_,
           FLOOR(tp * 1.0 / (tp + fn) * 1000000 + 0.5) / 1000000 AS recall,
           FLOOR(2.0 * tp / (2 * tp + fp + fn) * 1000000 + 0.5) / 1000000 AS f1
    FROM c
    """


@query("j_lsh_recall", oracle=_lsh_recall_oracle())
def j_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-evaluation of the approximate similarity path: precision /
    recall / F1 of the SINGLE-BAND hyperplane-LSH bucketed all-pairs
    (j_sim_pairs_bucketed) against the exact label-blocked quadratic
    (j_sim_pairs, the labeled ground truth) on the pair-key level —
    the measurement that justifies (or, here, indicts) shipping an
    approximate operator at 100 TB. What it measures at tau=0.3:
    recall ~0 — all 8 sign bits must match, ~0.6^8 ≈ 2% per true pair
    — which is precisely why this qid exists and why the registered
    recall-oriented path is the banded j_lsh_recall_banded twin
    (recall ~0.70, pytest-floored). Missed pairs (fn) are >= tau
    neighbors split across bucket boundaries; spurious pairs (fp) are
    cross-label bucket cohabitants the label-blocked truth excludes by
    definition.

    Both legs reuse the registered plans verbatim (registry lookup, not
    a re-derivation — what ships is what is measured); the fuse is ONE
    full-outer join on the pair key followed by a 1-row conditional
    aggregate. precision/recall/f1 derive from integer counts with one
    IEEE division each — engine-parity needs no pre-rounding beyond the
    display floor. At scale the ground-truth leg is the cost (it is a
    deliberate quadratic); production recall monitoring runs this on a
    label-stratified sample, exactly as this fixture-sized corpus is to
    a real one. `precision_` is aliased with a trailing underscore:
    PRECISION is a reserved type-modifier keyword in ANSI/DuckDB."""
    from ..registry import QUERIES

    ex = QUERIES["j_sim_pairs"](spark, sf_dir).select("id_a", "id_b")
    ap = QUERIES["j_sim_pairs_bucketed"](spark, sf_dir).select("id_a", "id_b")
    j = ex.withColumn("e", F.lit(1)).join(
        ap.withColumn("p", F.lit(1)), ["id_a", "id_b"], "full_outer"
    )
    c = j.agg(
        F.count(F.when(F.col("e").isNotNull() & F.col("p").isNotNull(), 1))
        .cast("long")
        .alias("tp"),
        F.count(F.when(F.col("p").isNull(), 1)).cast("long").alias("fn"),
        F.count(F.when(F.col("e").isNull(), 1)).cast("long").alias("fp"),
    )
    return c.select(
        (F.col("tp") + F.col("fn")).alias("n_exact"),
        (F.col("tp") + F.col("fp")).alias("n_approx"),
        "tp",
        "fp",
        "fn",
        rnd(F.col("tp") * 1.0 / (F.col("tp") + F.col("fp")), 6).alias("precision_"),
        rnd(F.col("tp") * 1.0 / (F.col("tp") + F.col("fn")), 6).alias("recall"),
        rnd(
            2.0 * F.col("tp") / (2 * F.col("tp") + F.col("fp") + F.col("fn")), 6
        ).alias("f1"),
    )


# Banded (OR-construction) LSH all-pairs: r planes per band, b bands —
# AND within a band, OR across bands. Plane index = band*r + i, same
# deterministic ±1 family as the single-band sketch.
_BAND_R = 4
_BAND_B = 8


def _band_key_sql(b: int) -> str:
    """DuckDB twin of band b's key in hyperplane_band_keys."""
    from ..operators.similarity import _plane_sign

    terms = []
    for i in range(_BAND_R):
        p = b * _BAND_R + i
        signs = ", ".join(str(_plane_sign(p, j)) for j in range(_BUCKET_DIM))
        terms.append(
            f"(CASE WHEN list_dot_product(v, [{signs}]) >= 0 THEN {1 << i} ELSE 0 END)"
        )
    return " + ".join(terms)


def _banded_pairs_sql() -> str:
    keys = ",\n           ".join(f"{_band_key_sql(b)} AS k{b}" for b in range(_BAND_B))
    legs = "\n      UNION ALL\n      ".join(
        f"""SELECT a.vec_id AS id_a, b2.vec_id AS id_b, {b} AS band,
             FLOOR(list_dot_product(a.v, b2.v) * 1000000 + 0.5) / 1000000 AS score
      FROM kb a JOIN kb b2 ON a.k{b} = b2.k{b} AND a.vec_id < b2.vec_id"""
        for b in range(_BAND_B)
    )
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    kb AS (SELECT vec_id, v,
           {keys}
           FROM e),
    cand AS (
      {legs})
    SELECT id_a, id_b, CAST(MIN(band) AS BIGINT) AS band, MIN(score) AS score
    FROM cand WHERE score >= 0.3 GROUP BY id_a, id_b
    """


@query("j_sim_pairs_banded", oracle=_banded_pairs_sql())
def j_sim_pairs_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs similarity >= 0.3 via BANDED hyperplane LSH (AND/OR
    amplification: 4 planes per band AND-ed into a 16-way key, 8 bands
    OR-ed) — the RECALL-ORIENTED registered scale path. The single-band
    j_sim_pairs_bucketed collides a cosine-0.32 pair with ~0.6^8 ≈ 2%
    probability (measured recall ~0 vs the exact tau=0.3 truth —
    j_lsh_recall); banding lifts that to 1-(1-0.6^4)^8 ≈ 0.70 (measured
    0.70-0.73 across sf0.001/0.01/0.1, floor-pinned in
    tests/test_scale_paths.py), the honest LSH cost/recall tradeoff at
    a weak threshold.

    Plan: one narrow posexplode (×8 rows, no shuffle), ONE shuffle on
    (band, key), then per-bucket VECTORIZED scoring inside
    applyInPandas (operators/similarity.banded_gemm_pairs): Arrow
    ships |rows|·bands rows into numpy, which scores each bucket in
    256-row blocked strips with a strict left-fold accumulate (the
    same IEEE order as dot_expr/list_dot_product — bit-identical to
    the declarative (band, key) equi-join form, and 4-5x faster at
    sf0.1 because ~1M candidate pairs never materialize as JVM join
    rows; only the ~10k survivors come back). At 100 TB the exploded
    table is written bucketed by (band, key), making the group stage
    exchange-free. Output band = lowest band where the pair collided;
    score is band-invariant (same two vectors, same fold); the final
    pair-dedup agg shuffles only survivors.

    Hot buckets: SPARK_GRAFT_BANDED_SPLITS=S salts every (band, key)
    bucket into S(S+1)/2 co-grouped split-pair tasks (bit-identical
    output — the whole registered plan is equality-tested at S=3 in
    tests/test_scale_paths.py). When to raise S: run j_skew_stats'
    top-bucket diagnostic over the exploded tag table; SCALE.md §4n
    gives the sizing rule (S ≈ ceil(m_max / m_target) for the largest
    observed bucket m_max)."""
    import os

    t = load(spark, sf_dir)
    from ..operators.similarity import banded_gemm_pairs, hyperplane_band_keys

    tagged = t.embeddings.select(
        "vec_id",
        as_double("embedding").alias("v"),
        F.posexplode(
            hyperplane_band_keys(
                "embedding", bands=_BAND_B, planes_per_band=_BAND_R, dim=_BUCKET_DIM
            )
        ).alias("band", "key"),
    )
    cand = banded_gemm_pairs(
        tagged,
        tau=0.3,
        parallelism=spark.sparkContext.defaultParallelism,
        n_splits=int(os.environ.get("SPARK_GRAFT_BANDED_SPLITS", "1")),
    )
    return cand.groupBy("id_a", "id_b").agg(
        F.min("band").cast("long").alias("band"), F.min("score").alias("score")
    )


def _lsh_recall_banded_oracle() -> str:
    """Same fuse as _lsh_recall_oracle, approximate leg = the banded
    pairs (built after j_sim_pairs_banded registers)."""
    from ..registry import ORACLE

    return f"""
    WITH exact AS ({ORACLE["j_sim_pairs"]}),
    approx AS ({ORACLE["j_sim_pairs_banded"]}),
    j AS (SELECT e.id_a AS eid, a.id_a AS aid
          FROM exact e FULL JOIN approx a
            ON e.id_a = a.id_a AND e.id_b = a.id_b),
    c AS (SELECT CAST(COUNT(*) FILTER (eid IS NOT NULL AND aid IS NOT NULL) AS BIGINT) AS tp,
                 CAST(COUNT(*) FILTER (aid IS NULL) AS BIGINT) AS fn,
                 CAST(COUNT(*) FILTER (eid IS NULL) AS BIGINT) AS fp
          FROM j)
    SELECT tp + fn AS n_exact, tp + fp AS n_approx, tp, fp, fn,
           FLOOR(tp * 1.0 / (tp + fp) * 1000000 + 0.5) / 1000000 AS precision_,
           FLOOR(tp * 1.0 / (tp + fn) * 1000000 + 0.5) / 1000000 AS recall,
           FLOOR(2.0 * tp / (2 * tp + fp + fn) * 1000000 + 0.5) / 1000000 AS f1
    FROM c
    """


@query("j_lsh_recall_banded", oracle=_lsh_recall_banded_oracle())
def j_lsh_recall_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision / recall / F1 of the BANDED LSH all-pairs
    (j_sim_pairs_banded, the recall-oriented registered scale path)
    against the exact label-blocked tau=0.3 truth (j_sim_pairs). The
    single-band twin j_lsh_recall measures the high-precision bucket
    filter and reads ~0 recall at this weak threshold — keeping BOTH
    measurements registered is the point: parameter changes to either
    construction show up as driver-checked value changes, and the
    banded recall additionally carries a >= 0.6 pytest floor
    (tests/test_scale_paths.py) so drift cannot pass silently. The
    low precision_ against the LABEL-blocked truth is expected: the
    banded path also surfaces genuinely >= tau cross-label pairs that
    the label-keyed ground truth excludes by definition."""
    from ..registry import QUERIES

    ex = QUERIES["j_sim_pairs"](spark, sf_dir).select("id_a", "id_b")
    ap = QUERIES["j_sim_pairs_banded"](spark, sf_dir).select("id_a", "id_b")
    j = ex.withColumn("e", F.lit(1)).join(
        ap.withColumn("p", F.lit(1)), ["id_a", "id_b"], "full_outer"
    )
    c = j.agg(
        F.count(F.when(F.col("e").isNotNull() & F.col("p").isNotNull(), 1))
        .cast("long")
        .alias("tp"),
        F.count(F.when(F.col("p").isNull(), 1)).cast("long").alias("fn"),
        F.count(F.when(F.col("e").isNull(), 1)).cast("long").alias("fp"),
    )
    return c.select(
        (F.col("tp") + F.col("fn")).alias("n_exact"),
        (F.col("tp") + F.col("fp")).alias("n_approx"),
        "tp",
        "fp",
        "fn",
        rnd(F.col("tp") * 1.0 / (F.col("tp") + F.col("fp")), 6).alias("precision_"),
        rnd(F.col("tp") * 1.0 / (F.col("tp") + F.col("fn")), 6).alias("recall"),
        rnd(
            2.0 * F.col("tp") / (2 * F.col("tp") + F.col("fp") + F.col("fn")), 6
        ).alias("f1"),
    )


# Batch kNN: query set = first _KNNB_NQ vectors, top-_KNNB_K each.
_KNNB_NQ = 20
_KNNB_K = 5


@query(
    "j_knn_batch",
    oracle=f"""
    WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id < {_KNNB_NQ}),
    s AS (SELECT q.qid, e.vec_id, e.label,
                 FLOOR(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)
                       * 1000000 + 0.5) / 1000000 AS score
          FROM embeddings e CROSS JOIN q WHERE e.vec_id != q.qid),
    r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                       ORDER BY score DESC, vec_id) AS rk
          FROM s)
    SELECT qid, vec_id, label, score, CAST(rk AS BIGINT) AS rk
    FROM r WHERE rk <= {_KNNB_K}
    """,
)
def j_knn_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BATCH kNN: exact top-{k} neighbors for EACH of the first {nq}
    vectors in one pass — the many-queries retrieval shape (j_sim_topk
    serves one query; production reranking and dedup-verification serve
    thousands per batch). Self-matches excluded; ranking on the
    pre-rounded score with vec_id tie-break so rank order is
    engine-stable.

    Plan: the {nq}-row query set BROADCASTS onto the candidate scan
    (the whitelisted tiny-build-side nested-loop — the fan-out is
    |queries| x |candidates| by definition of batch kNN), then ONE
    window keyed on qid ranks each query's candidates independently —
    queries parallelize across the cluster instead of looping {nq}
    TakeOrderedAndProject jobs. At 100 TB the candidate side is first
    pruned per-query by the ANN bucket structures (j_ann_lsh/_ivf);
    this qid is the exact batch baseline those are judged against."""
    t = load(spark, sf_dir)
    q = t.embeddings.where(F.col("vec_id") < _KNNB_NQ).select(
        F.col("vec_id").alias("qid"), as_double("embedding").alias("qv")
    )
    s = (
        spread(spark, sf_dir, "embeddings").crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            "label",
            rnd(dot_expr(as_double("embedding"), F.col("qv")), 6).alias("score"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("vec_id").asc())
    return (
        s.select("*", F.row_number().over(w).cast("long").alias("rk"))
        .where(F.col("rk") <= _KNNB_K)
    )


j_knn_batch.__doc__ = j_knn_batch.__doc__.replace("{k}", str(_KNNB_K)).replace(
    "{nq}", str(_KNNB_NQ)
)


def _ann_recall_oracle() -> str:
    """DuckDB twin of j_ann_recall: the IVF batch search (same literal
    centroids, assignment, per-query probe ranking and candidate
    scoring as the Spark plan, all on the shared sequential-fold dot)
    fused against the exact j_knn_batch oracle. Training failures
    propagate — see _centroid_values_sql."""
    from ..registry import ORACLE

    rows = _centroid_values_sql()
    return f"""
    WITH cents(cid, cv) AS (VALUES {rows}),
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    scored AS (SELECT e.vec_id, e.v, c.cid,
                      list_dot_product(e.v, cv) AS s
               FROM e CROSS JOIN cents c),
    assigned AS (SELECT vec_id, v, cid AS cluster_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                     ORDER BY s DESC, cid) AS rk
        FROM scored) WHERE rk = 1),
    q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
          FROM embeddings WHERE vec_id < {_KNNB_NQ}),
    probe AS (SELECT qid, cid FROM (
        SELECT q.qid, c.cid,
               ROW_NUMBER() OVER (PARTITION BY q.qid
                                  ORDER BY list_dot_product(qv, cv) DESC, cid) AS rk
        FROM q CROSS JOIN cents c) WHERE rk <= {_IVF_NPROBE}),
    cand AS (SELECT q.qid, a.vec_id,
                    FLOOR(list_dot_product(a.v, q.qv) * 1000000 + 0.5)
                      / 1000000 AS score
             FROM assigned a
             JOIN probe p ON a.cluster_id = p.cid
             JOIN q ON q.qid = p.qid
             WHERE a.vec_id <> q.qid),
    approx AS (SELECT qid, vec_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                     ORDER BY score DESC, vec_id) AS rk
        FROM cand) WHERE rk <= {_KNNB_K}),
    exact AS (SELECT qid, vec_id FROM ({ORACLE["j_knn_batch"]}) x),
    hits AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_hits
             FROM exact e JOIN approx a
               ON e.qid = a.qid AND e.vec_id = a.vec_id),
    nex AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_exact FROM exact)
    SELECT n_exact, n_hits,
           {_KNNB_K} AS k, {_IVF_NPROBE} AS nprobe,
           FLOOR(n_hits * 1.0 / n_exact * 1000000 + 0.5) / 1000000 AS recall
    FROM hits, nex
    """


@query("j_ann_recall", oracle=_ann_recall_oracle())
def j_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the IVF approximate search against the exact batch
    kNN — the ANN twin of j_lsh_recall_banded, closing the loop on the
    second approximate-similarity path: every approximate operator in
    this repo now ships with a driver-checked measurement of what it
    gives up. IVF probes {nprobe}/{nk} clusters (~{nprobe}/{nk} of the
    corpus scanned per query); recall is the fraction of the exact
    top-{k} (per query, {nq} queries) that the probed clusters contain.
    Measured 0.82 / 0.84 / 0.92 at sf0.001/0.01/0.1 — the trained
    quantizer captures the label clusters well enough that a 4x scan
    reduction keeps most true neighbors — with a >= 0.6 pytest floor
    (tests/test_scale_paths.py) so quantizer/probe drift fails loudly.

    Plan: assignment is the narrow zero-Exchange argmax stage
    (j_ann_ivf's pin); the (qid, cid) probe plan is driver-computed
    index METADATA (nq x nprobe rows, seq_dot — bit-reproducible by
    the oracle) broadcast into the candidate join; ONE window ranks
    each query's candidates; the exact leg reuses the registered
    j_knn_batch plan verbatim. At 100 TB this runs on a stratified
    query sample, exactly as the fixture's {nq} queries are to a real
    query log."""
    from ..operators.similarity import ivf_assign, kmeans_train_local, seq_dot
    from ..registry import QUERIES

    t = load(spark, sf_dir)
    cents = kmeans_train_local(sf_dir, k=_IVF_K, iters=_IVF_ITERS)
    assigned, cents = ivf_assign(t.embeddings, k_clusters=_IVF_K, cents=cents)
    # panel: driver-side memoized metadata read (similarity.query_panel)
    probe_pairs = []
    for vid, emb in query_panel(sf_dir, _KNNB_NQ):
        qv = list(emb)
        order = sorted(((seq_dot(qv, v), -int(cid)) for cid, v in cents), reverse=True)
        probe_pairs += [(vid, -ncid) for _, ncid in order[:_IVF_NPROBE]]
    probe = spark.createDataFrame(probe_pairs, "qid long, cid int")
    q = t.embeddings.where(F.col("vec_id") < _KNNB_NQ).select(
        F.col("vec_id").alias("qid"), as_double("embedding").alias("qv")
    )
    cand = (
        assigned.join(F.broadcast(probe), assigned.cluster_id == probe.cid)
        .join(F.broadcast(q), "qid")
        .where(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            rnd(dot_expr(as_double("embedding"), F.col("qv")), 6).alias("score"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("vec_id").asc())
    approx = (
        cand.select("qid", "vec_id", F.row_number().over(w).alias("rk"))
        .where(F.col("rk") <= _KNNB_K)
        .select("qid", "vec_id")
    )
    exact = QUERIES["j_knn_batch"](spark, sf_dir).select("qid", "vec_id")
    # ONE pass over the exact leg (r16 VERDICT item 5): n_exact and
    # n_hits come from a single LEFT join against the (unique-keyed)
    # approx set — count(*) is the exact row count, count(hit) the
    # match count. The former hits/nex pair evaluated the expensive
    # exact-kNN subtree TWICE (no persist dedupe across the two aggs).
    return (
        exact.join(
            F.broadcast(approx.withColumn("hit", F.lit(1))),
            ["qid", "vec_id"],
            "left",
        )
        .agg(
            F.count("*").cast("long").alias("n_exact"),
            F.count("hit").cast("long").alias("n_hits"),
        )
        .select(
            "n_exact",
            "n_hits",
            F.lit(_KNNB_K).alias("k"),
            F.lit(_IVF_NPROBE).alias("nprobe"),
            rnd(F.col("n_hits") * 1.0 / F.col("n_exact"), 6).alias("recall"),
        )
    )


j_ann_recall.__doc__ = (
    j_ann_recall.__doc__.replace("{nprobe}", str(_IVF_NPROBE))
    .replace("{nk}", str(_IVF_K))
    .replace("{k}", str(_KNNB_K))
    .replace("{nq}", str(_KNNB_NQ))
)


# Hard-negative mining: per query, the top-K most-similar WRONG-label
# candidates (contrastive-training negatives).
_HN_K = 5


@query(
    "j_hard_negatives",
    oracle=f"""
    WITH q AS (SELECT vec_id AS qid, label AS qlabel,
                      CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id < {_KNNB_NQ}),
    s AS (SELECT q.qid, e.vec_id, e.label,
                 FLOOR(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)
                       * 1000000 + 0.5) / 1000000 AS score
          FROM embeddings e CROSS JOIN q
          WHERE e.label <> q.qlabel),
    r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                       ORDER BY score DESC, vec_id) AS rk
          FROM s)
    SELECT qid, vec_id, label, score, CAST(rk AS BIGINT) AS rk
    FROM r WHERE rk <= {_HN_K}
    """,
)
def j_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive embedding training (the
    in-batch-negatives upgrade every retrieval/embedding recipe uses,
    public): per query, the top-{k} HIGHEST-cosine candidates whose
    label DIFFERS — near misses carry the gradient signal random
    negatives don't. Same engine as j_knn_batch (broadcast query set,
    one qid-keyed rank window, pre-rounded scores with vec_id
    tie-break) plus the label-mismatch predicate, which is exactly the
    point: the miner is the exact kNN with a relational filter, so at
    100 TB it inherits the same ANN-pruned candidate generation
    (j_ann_lsh/_ivf buckets) with `label <> qlabel` pushed into the
    candidate scan."""
    t = load(spark, sf_dir)
    q = t.embeddings.where(F.col("vec_id") < _KNNB_NQ).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        as_double("embedding").alias("qv"),
    )
    s = (
        t.embeddings.crossJoin(F.broadcast(q))
        .where(F.col("label") != F.col("qlabel"))
        .select(
            "qid",
            "vec_id",
            "label",
            rnd(dot_expr(as_double("embedding"), F.col("qv")), 6).alias("score"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("vec_id").asc())
    return s.select("*", F.row_number().over(w).cast("long").alias("rk")).where(
        F.col("rk") <= _HN_K
    )


j_hard_negatives.__doc__ = j_hard_negatives.__doc__.replace("{k}", str(_HN_K))


@query(
    "j_class_weights",
    oracle="""
    WITH c AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n
               FROM embeddings GROUP BY label),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS total,
                 CAST(COUNT(*) AS BIGINT) AS n_classes
          FROM c)
    SELECT label, n,
           FLOOR(n * 1.0 / total * 1000000 + 0.5) / 1000000 AS freq,
           FLOOR(total * 1.0 / (n_classes * n) * 1000000 + 0.5) / 1000000
             AS weight
    FROM c, t
    ORDER BY label
    """,
)
def j_class_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-frequency class weights (the sklearn 'balanced' formula,
    public: total / (n_classes * count_c)) over the embedding labels —
    the reweighting relation a trainer broadcasts to correct label
    imbalance. One label agg (map-side combined to |classes| rows), a
    1-row totals broadcast, and one exact division per class on
    identical BIGINT operands — |classes| output rows at any corpus
    size."""
    t = load(spark, sf_dir)
    c = t.embeddings.groupBy("label").agg(F.count("*").cast("long").alias("n"))
    tot = c.agg(
        F.sum("n").cast("long").alias("total"),
        F.count("*").cast("long").alias("n_classes"),
    )
    return c.crossJoin(F.broadcast(tot)).select(
        "label",
        "n",
        rnd(F.col("n") * 1.0 / F.col("total"), 6).alias("freq"),
        rnd(F.col("total") * 1.0 / (F.col("n_classes") * F.col("n")), 6).alias(
            "weight"
        ),
    )


# ------------------------------------------------------- product quantization

_PQ_BLOCKS = 8
_PQ_SUBDIM = _BUCKET_DIM // _PQ_BLOCKS
_PQ_K = 32
_PQ_ITERS = 4
_PQ_SHORTLIST = 200
_PQ_TOPK = 10


def _pq_model():
    """Codebooks + query-dependent literals for the PQ qids, computed
    once at import on the canonical correctness SF (the IVF oracle
    discipline; training failures propagate — see _centroid_values_sql).
    Returns (books, q, halves, adc): per-block [(code, subvector)],
    the query vector (vec_id 0), per-(block, code) half-|c|² and
    ADC lookup values — all driver-side left folds, so both engines
    subtract/add the IDENTICAL doubles."""
    import os

    import pyarrow.parquet as pq_

    from ..operators.similarity import pq_train_local, seq_dot

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
    books = pq_train_local(sf_dir, n_blocks=_PQ_BLOCKS, k=_PQ_K, iters=_PQ_ITERS)
    tbl = pq_.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).to_pydict()
    q = [float(x) for v, e in zip(tbl["vec_id"], tbl["embedding"]) if v == 0 for x in e]
    halves = [
        [0.5 * seq_dot(cv, cv) for _, cv in book] for book in books
    ]
    adc = [
        [
            seq_dot(q[b * _PQ_SUBDIM : (b + 1) * _PQ_SUBDIM], cv)
            for _, cv in book
        ]
        for b, book in enumerate(books)
    ]
    return books, q, halves, adc


def _pq_sum_sql() -> str:
    """Fixed left-to-right 8-term ADC sum — the same association order
    as the Spark column fold, so the double is bit-identical."""
    expr = "a0"
    for b in range(1, _PQ_BLOCKS):
        expr = f"({expr} + a{b})"
    return expr


def _pq_oracle() -> str:
    """DuckDB twin of j_ann_pq: identical literal codebooks, the same
    argmax (v·c − half) assignment per block (tie → smallest code, via
    ROW_NUMBER), the same fixed-order ADC sum, the same
    shortlist-then-exact-re-rank two-stage plan."""
    books, _q, halves, adc = _pq_model()
    d = _PQ_SUBDIM
    rows = ", ".join(
        f"({b}, {cid}, [{', '.join(repr(x) for x in cv)}], "
        f"CAST('{halves[b][cid]!r}' AS DOUBLE), CAST('{adc[b][cid]!r}' AS DOUBLE))"
        for b, book in enumerate(books)
        for cid, cv in book
    )
    cases_a = ",\n             ".join(
        f"MAX(CASE WHEN b = {b} THEN adc END) AS a{b}" for b in range(_PQ_BLOCKS)
    )
    return f"""
    WITH cents(b, cid, cv, half, adc) AS (VALUES {rows}),
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    scored AS (SELECT e.vec_id, c.b, c.cid, c.adc,
                      list_dot_product(
                          list_slice(e.v, c.b * {d} + 1, c.b * {d} + {d}), c.cv)
                        - c.half AS s
               FROM e CROSS JOIN cents c),
    codes AS (SELECT vec_id, b, cid, adc FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, b
                                     ORDER BY s DESC, cid) AS rk
        FROM scored) WHERE rk = 1),
    p AS (SELECT vec_id,
             {cases_a}
          FROM codes GROUP BY vec_id),
    short AS (SELECT vec_id,
                     FLOOR({_pq_sum_sql()} * 1000000 + 0.5) / 1000000 AS adc_score
              FROM p WHERE vec_id <> 0
              ORDER BY adc_score DESC, vec_id LIMIT {_PQ_SHORTLIST}),
    q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)
    SELECT s.vec_id, s.adc_score,
           FLOOR(list_dot_product(e.v, qv) * 1000000 + 0.5) / 1000000 AS score
    FROM short s JOIN e ON e.vec_id = s.vec_id CROSS JOIN q
    ORDER BY score DESC, s.vec_id LIMIT {_PQ_TOPK}
    """


@query("j_ann_pq", oracle=_pq_oracle())
def j_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN — the standard two-stage
    memory-bandwidth design (Jégou et al.'s PQ + ADC, re-expressed
    declaratively): (1) each vector's 8 contiguous 8-dim subvectors
    snap to the L2-nearest of 32 trained codes (argmax (v·c − |c|²/2),
    the exact-L2 identity on the shared sequential fold; tie → smallest
    code) — 64 float32 dims (256 B) compress to 8 codes (5 bytes,
    ~51×); (2) ADC scoring reads CODES ONLY — Σ_b adc_b[code_b], 8
    lookups in driver-computed 32-entry tables + 7 adds per candidate,
    no float vector touched — to cut a {short}-candidate shortlist;
    (3) the shortlist re-ranks at full precision (one fold dot per
    shortlisted vector) for the final top-{k}. Shortlist recall@{k}
    measured by the registered j_ann_pq_recall twin.

    100 TB: code assignment is a narrow zero-shuffle map over literal
    codebooks (index metadata, the j_ann_ivf discipline), run once at
    write time; the ADC pass scans a few-byte code column with the
    lookup tables broadcast (memory traffic ÷50), TakeOrdered keeps
    {short} rows; the re-rank is a {short}-row broadcast semi-join
    back to the float column. Both wide ops are O(shortlist), not
    O(corpus)."""
    from ..operators.similarity import _lit_vector, pq_adc_arrow, pq_train_local

    t = load(spark, sf_dir)
    books = pq_train_local(sf_dir, n_blocks=_PQ_BLOCKS, k=_PQ_K, iters=_PQ_ITERS)
    # query vector: driver-side memoized metadata read (similarity.query_vector)
    q = list(query_vector(sf_dir))
    # assignment + ADC fused in ONE Arrow pass (pq_adc_arrow — the
    # j_pq_distortion engine path; bit-identical to the best_code_expr
    # + chained element_at expression form, which remains the
    # registered reference in the streaming ingest and the oracle)
    short = (
        pq_adc_arrow(t.embeddings.where(F.col("vec_id") != 0), books, q)
        .orderBy(F.col("adc_score").desc(), F.col("vec_id").asc())
        .limit(_PQ_SHORTLIST)
    )
    qlit = _lit_vector(q)
    return (
        t.embeddings.join(F.broadcast(short), "vec_id")
        .select(
            "vec_id",
            "adc_score",
            rnd(dot_expr(as_double("embedding"), qlit), 6).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("vec_id").asc())
        .limit(_PQ_TOPK)
    )


j_ann_pq.__doc__ = j_ann_pq.__doc__.replace("{short}", str(_PQ_SHORTLIST)).replace(
    "{k}", str(_PQ_TOPK)
)


def _pq_recall_oracle() -> str:
    """Exact top-k (full-precision fold dot) fused against the PQ ADC
    top-k — the same recall harness as _ann_recall_oracle, one query."""
    from ..registry import ORACLE

    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
    exact AS (SELECT vec_id FROM (
        SELECT vec_id,
               FLOOR(list_dot_product(v, qv) * 1000000 + 0.5) / 1000000 AS score
        FROM e, q WHERE vec_id <> 0
        ORDER BY score DESC, vec_id LIMIT {_PQ_TOPK})),
    approx AS (SELECT vec_id FROM ({ORACLE["j_ann_pq"]}) x),
    hits AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_hits
             FROM exact e2 JOIN approx a ON e2.vec_id = a.vec_id),
    nex AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_exact FROM exact)
    SELECT n_exact, n_hits, {_PQ_TOPK} AS k,
           FLOOR(n_hits * 1.0 / n_exact * 1000000 + 0.5) / 1000000 AS recall
    FROM hits, nex
    """


@query("j_ann_pq_recall", oracle=_pq_recall_oracle())
def j_ann_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the PQ ADC search against the exact full-precision
    top-k for the same query — the self-evaluation twin every
    approximate path in this registry ships with (j_lsh_recall_banded,
    j_ann_recall). What ~51× code compression costs in neighbor
    fidelity is a REGISTERED, driver-checked number, not a prose
    claim: with the {short}-candidate ADC shortlist + exact re-rank,
    measured recall@{k} = 1.0 / 1.0 / 0.8 at sf0.001/0.01/0.1,
    floored >= 0.6 in tests/test_scale_paths.py.

    Plan: the exact leg is one narrow scored scan + TakeOrdered (the
    production brute-force baseline); the approx leg reuses the
    registered j_ann_pq plan verbatim; the fuse is a 10-row join."""
    from ..operators.similarity import _lit_vector
    from ..registry import QUERIES

    t = load(spark, sf_dir)
    # query vector: driver-side memoized metadata read (similarity.query_vector)
    qlit = _lit_vector(list(query_vector(sf_dir)))
    exact = (
        t.embeddings.where(F.col("vec_id") != 0)
        .select("vec_id", rnd(dot_expr(as_double("embedding"), qlit), 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col("vec_id").asc())
        .limit(_PQ_TOPK)
        .select("vec_id")
    )
    approx = QUERIES["j_ann_pq"](spark, sf_dir).select("vec_id")
    hits = exact.join(approx, "vec_id").agg(F.count("*").cast("long").alias("n_hits"))
    nex = exact.agg(F.count("*").cast("long").alias("n_exact"))
    return nex.crossJoin(F.broadcast(hits)).select(
        "n_exact",
        "n_hits",
        F.lit(_PQ_TOPK).alias("k"),
        rnd(F.col("n_hits") * 1.0 / F.col("n_exact"), 6).alias("recall"),
    )


j_ann_pq_recall.__doc__ = j_ann_pq_recall.__doc__.replace(
    "{short}", str(_PQ_SHORTLIST)
).replace("{k}", str(_PQ_TOPK))


@query("j_ann_pq_sink", oracle=_pq_oracle())
def j_ann_pq_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ index WRITE-PATH twin (r9 verdict item 5): j_ann_pq assigns
    codes inside the query plan; at 100 TB codes are computed ONCE at
    write time and persisted, and every later search reads the ~5-byte
    code column, never the 256-byte float vector. This qid proves that
    split end-to-end: (1) the write leg snaps every vector to its
    8 per-block codes and saves them as a catalog table bucketed 8
    ways on vec_id (the a_sink_bucketed mechanism — bucket metadata in
    the catalog, idempotence latched on a source-fingerprint table
    property stamped after a successful write, so the assignment cost
    is paid once per SF until the embeddings change underneath —
    exactly the write-once contract, crash- and regeneration-safe); (2) the search leg ADC-scores the CODE TABLE
    ONLY (8 broadcast-literal lookups + 7 adds per row), TakeOrdered
    keeps the {short}-candidate shortlist, and the float column is
    touched solely by the {short}-row broadcast re-rank join.
    Plan-pinned in tests/test_plans.py: the shortlist subtree's scan
    reads struct<vec_id,c0..c7> — no `embedding` anywhere below the
    re-rank join. Result is byte-identical to j_ann_pq (same oracle):
    persisting the index loses nothing. vec_id bucketing co-locates
    the code table with any future (vec_id-keyed) delta appends —
    s_ann_ingest maintains the streaming twin of this table."""
    import os
    import shutil

    from ..operators.similarity import _lit_vector, pq_codes_arrow, pq_train_local, seq_dot
    from .sources import _SCRATCH

    t = load(spark, sf_dir)
    books = pq_train_local(sf_dir, n_blocks=_PQ_BLOCKS, k=_PQ_K, iters=_PQ_ITERS)
    d = _PQ_SUBDIM
    base = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    db = f"sg_pqidx_{base}"
    loc = os.path.join(_SCRATCH, base, "pqdb")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{loc}'")
    # Write-once idempotence is latched on a SOURCE FINGERPRINT stamped
    # into the table properties after a successful write, not on bare
    # table existence (r10 ADVICE: same-basename regenerated embeddings,
    # or a crash between saveAsTable and completion, would be served a
    # stale/partial code table silently forever). size+mtime_ns of the
    # source parquet is a free, scan-less fingerprint; the stamp lands
    # strictly AFTER the data, so a crash mid-write leaves a missing/
    # mismatched stamp and the next session rebuilds.
    src = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(src)
    stamp = f"{st.st_size}:{st.st_mtime_ns}"

    def _stamp_of() -> str | None:
        rows = spark.sql(
            f"SHOW TBLPROPERTIES {db}.pq_codes ('sg.src_stamp')"
        ).collect()
        v = rows[0].value if rows else None
        return None if v is None or "does not have property" in str(v) else v

    if not spark.catalog.tableExists(f"{db}.pq_codes") or _stamp_of() != stamp:
        spark.sql(f"DROP TABLE IF EXISTS {db}.pq_codes")
        shutil.rmtree(os.path.join(loc, "pq_codes"), ignore_errors=True)
        # write-time assignment via the fused Arrow kernel — row-for-row
        # identical to the best_code_expr form (pq_codes_arrow contract)
        codes = pq_codes_arrow(t.embeddings, books)
        (
            codes.write.bucketBy(8, "vec_id")
            .sortBy("vec_id")
            .mode("overwrite")
            .saveAsTable(f"{db}.pq_codes")
        )
        spark.sql(
            f"ALTER TABLE {db}.pq_codes SET TBLPROPERTIES "
            f"('sg.src_stamp' = '{stamp}')"
        )
    ct = spark.table(f"{db}.pq_codes")
    # query vector: driver-side memoized metadata read (similarity.query_vector)
    q = list(query_vector(sf_dir))
    adc_lits = [
        _lit_vector([seq_dot(q[b * d : (b + 1) * d], cv) for _, cv in books[b]])
        for b in range(_PQ_BLOCKS)
    ]
    adc = None
    for b in range(_PQ_BLOCKS):
        term = F.element_at(adc_lits[b], (F.col(f"c{b}") + 1).cast("int"))
        adc = term if adc is None else adc + term
    short = (
        ct.where(F.col("vec_id") != 0)
        .select("vec_id", rnd(adc, 6).alias("adc_score"))
        .orderBy(F.col("adc_score").desc(), F.col("vec_id").asc())
        .limit(_PQ_SHORTLIST)
    )
    qlit = _lit_vector(q)
    return (
        t.embeddings.join(F.broadcast(short), "vec_id")
        .select(
            "vec_id",
            "adc_score",
            rnd(dot_expr(as_double("embedding"), qlit), 6).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("vec_id").asc())
        .limit(_PQ_TOPK)
    )


j_ann_pq_sink.__doc__ = j_ann_pq_sink.__doc__.replace("{short}", str(_PQ_SHORTLIST))


def _recall_curve_oracle() -> str:
    from ..registry import ORACLE

    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
    exact AS (SELECT vec_id,
                     ROW_NUMBER() OVER (ORDER BY score DESC, vec_id) AS re
              FROM (SELECT vec_id,
                           FLOOR(list_dot_product(v, qv) * 1000000 + 0.5) / 1000000
                             AS score
                    FROM e, q WHERE vec_id <> 0
                    ORDER BY score DESC, vec_id LIMIT {_PQ_TOPK}) x),
    approx AS (SELECT vec_id,
                      ROW_NUMBER() OVER (ORDER BY score DESC, vec_id) AS ra
               FROM ({ORACLE["j_ann_pq"]}) y),
    pairs AS (SELECT e2.re, a.ra
              FROM exact e2 JOIN approx a ON e2.vec_id = a.vec_id),
    grid AS (SELECT CAST(unnest(range(1, {_PQ_TOPK} + 1)) AS BIGINT) AS k),
    hits AS (SELECT g.k,
                    CAST(COALESCE(SUM(CASE WHEN p.re <= g.k AND p.ra <= g.k
                                           THEN 1 ELSE 0 END), 0) AS BIGINT)
                      AS n_hits
             FROM grid g LEFT JOIN pairs p ON TRUE GROUP BY g.k)
    SELECT k, n_hits,
           FLOOR(n_hits * 1.0 / k * 1000000 + 0.5) / 1000000 AS recall
    FROM hits
    """


@query("j_recall_curve", oracle=_recall_curve_oracle())
def j_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k CURVE (k = 1..{k}) of the PQ ADC search against the
    exact top-{k} — where j_ann_pq_recall reports the single recall@{k}
    scalar, the curve shows WHERE the approximate ranking diverges:
    head-heavy loss (recall@1 low) means the re-rank shortlist is too
    small or a subspace codebook is degenerate (j_pq_distortion says
    which); tail-only loss is the normal ADC noise the shortlist
    absorbs. The k-sweep costs nothing extra — both rankings are
    already ≤{k}-row relations, so the curve is a metadata join
    against a literal k-grid, the j_jaccard_threshold_curve principle
    applied to ANN evaluation.

    Determinism: both ranks order by (rounded score desc, vec_id) —
    total orders on both engines; counts are exact and recall is one
    division per k (rnd 1e-6).

    Plan: the exact leg is one scored scan + TakeOrdered; the approx
    leg reuses the registered j_ann_pq plan verbatim; everything after
    is ≤{k}·{k} rows."""
    from ..operators.similarity import _lit_vector
    from ..registry import QUERIES

    t = load(spark, sf_dir)
    # query vector: driver-side memoized metadata read (similarity.query_vector)
    qlit = _lit_vector(list(query_vector(sf_dir)))
    exact = (
        t.embeddings.where(F.col("vec_id") != 0)
        .select("vec_id", rnd(dot_expr(as_double("embedding"), qlit), 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col("vec_id").asc())
        .limit(_PQ_TOPK)
    )
    w = Window.orderBy(F.col("score").desc(), F.col("vec_id").asc())
    ex = exact.select("vec_id", F.row_number().over(w).cast("long").alias("re"))
    ap = (
        QUERIES["j_ann_pq"](spark, sf_dir)
        .select("vec_id", "score")
        .select("vec_id", F.row_number().over(w).cast("long").alias("ra"))
    )
    pairs = ex.join(ap, "vec_id").select("re", "ra")
    grid = spark.range(1, _PQ_TOPK + 1).select(F.col("id").cast("long").alias("k"))
    hits = (
        F.broadcast(grid)
        .join(pairs, F.lit(True), "left")
        .groupBy("k")
        .agg(
            F.coalesce(
                F.sum(
                    F.when((F.col("re") <= F.col("k")) & (F.col("ra") <= F.col("k")), 1)
                    .otherwise(0)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("n_hits")
        )
    )
    return hits.select(
        "k", "n_hits", rnd(F.col("n_hits") * 1.0 / F.col("k"), 6).alias("recall")
    )


j_recall_curve.__doc__ = j_recall_curve.__doc__.replace("{k}", str(_PQ_TOPK))


# ---------------------------------------------------------- PCA projection


def _pca_oracle() -> str:
    """DuckDB twin of j_embed_pca: the SAME literal (axis, offset) the
    Spark plan embeds — training runs once driver-side (pca_axis_local)
    on the canonical correctness SF; a training failure propagates (the
    _centroid_values_sql rule)."""
    import os

    from ..operators.similarity import pca_axis_local

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
    _, axis, offset = pca_axis_local(sf_dir)
    alit = "[" + ", ".join(repr(x) for x in axis) + "]"
    return f"""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    p AS (SELECT label,
                 CAST(FLOOR((list_dot_product(v, {alit})
                             - CAST('{offset!r}' AS DOUBLE)) * 1000000 + 0.5)
                      AS BIGINT) AS ps
          FROM e)
    SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(ps) AS BIGINT) AS proj_sum_scaled,
           CAST(MIN(ps) AS BIGINT) AS proj_min_scaled,
           CAST(MAX(ps) AS BIGINT) AS proj_max_scaled,
           CAST(SUM(ps * ps) AS BIGINT) AS proj_sq_sum_scaled
    FROM p GROUP BY label
    """


@query("j_embed_pca", oracle=_pca_oracle())
def j_embed_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Principal-axis projection profile of the embedding space: every
    vector projects onto the top PCA component (power iteration on a
    bounded driver-side sample — see pca_axis_local) and each label's
    projection distribution is profiled (count, scaled-integer sum /
    min / max / sum-of-squares, from which mean and variance derive
    exactly). The 1-D shadow is the standard first look at embedding
    health: labels whose projection ranges collapse onto each other
    are inseparable along the dominant direction — the cheap
    drift/clustering diagnostic before any ANN index is built.

    Parity: the axis and its mean-offset enter BOTH engines as
    literals; the per-row projection is the shared sequential fold
    (dot_expr == list_dot_product), centered by subtracting the
    literal offset (identical double on both sides), then floored to a
    scaled BIGINT per ROW before summation — integer aggregation, so
    no accumulation-order ulp exists (the j_dsir_weights rule).

    100 TB: training cost is capped (sample-bounded, driver-side);
    the distributed pass is one narrow zero-shuffle map + a hash agg
    on the tiny label key with map-side partials. At scale the
    projection lands as a write-time column and this profile becomes
    the per-partition statistics a z-order / range-partition layout
    consumes (j_zorder_stats' input)."""
    from ..operators.similarity import _lit_vector, pca_axis_local

    t = load(spark, sf_dir)
    _, axis, offset = pca_axis_local(sf_dir)
    proj = dot_expr(as_double("embedding"), _lit_vector(axis)) - F.expr(
        f"CAST('{offset!r}' AS DOUBLE)"
    )
    ps = F.floor(proj * 1000000 + F.lit(0.5)).cast("long")
    return (
        t.embeddings.select("label", ps.alias("ps"))
        .groupBy("label")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("ps").cast("long").alias("proj_sum_scaled"),
            F.min("ps").cast("long").alias("proj_min_scaled"),
            F.max("ps").cast("long").alias("proj_max_scaled"),
            F.sum(F.col("ps") * F.col("ps")).cast("long").alias("proj_sq_sum_scaled"),
        )
    )


# ---------------------------------------------------------- kNN evaluation


@query(
    "j_knn_confusion",
    oracle=f"""
    WITH q AS (SELECT vec_id AS qid, label AS true_label,
                      CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id < {_KNNB_NQ}),
    s AS (SELECT q.qid, q.true_label, e.vec_id, e.label,
                 FLOOR((list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv))
                       * 1000000 + 0.5) / 1000000 AS score
          FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.qid),
    nn AS (SELECT * FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                          ORDER BY score DESC, vec_id) AS rk
             FROM s) WHERE rk <= {_KNNB_K}),
    votes AS (SELECT qid, true_label, label AS pred_label,
                     COUNT(*) AS c
              FROM nn GROUP BY qid, true_label, label),
    pred AS (SELECT qid, true_label, pred_label FROM (
               SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                            ORDER BY c DESC, pred_label) AS vk
               FROM votes) WHERE vk = 1)
    SELECT true_label, pred_label,
           CAST(COUNT(*) AS BIGINT) AS n_queries,
           CAST(COUNT(*) FILTER (WHERE true_label = pred_label) AS BIGINT)
             AS n_correct
    FROM pred GROUP BY true_label, pred_label
    """,
)
def j_knn_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN-classifier confusion matrix — the EVALUATION closing the
    retrieval loop: each of the first {nq} vectors is classified by
    majority vote of its k={k} exact nearest neighbors (ties -> count
    desc then smallest label, so the vote is engine-deterministic) and
    the (true, predicted) cells report how often retrieval agrees with
    labels. High off-diagonal mass between two labels means their
    embedding regions interleave — the per-class companion to
    j_embed_pca's 1-D separability profile and the quality gate for
    j_knn_label-style pseudo-labeling pipelines.

    Plan: the same broadcast-query-set fan-out as j_knn_batch (one
    window ranks all queries' candidates in parallel), then two
    metadata-sized aggregations (votes are <= nq x k rows). At 100 TB
    the candidate leg swaps in the ANN shortlist (j_ann_ivf/_pq) while
    this exact form stays the audit baseline on sampled queries."""
    t = load(spark, sf_dir)
    q = t.embeddings.where(F.col("vec_id") < _KNNB_NQ).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("true_label"),
        as_double("embedding").alias("qv"),
    )
    s = (
        spread(spark, sf_dir, "embeddings").crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "true_label",
            "vec_id",
            "label",
            rnd(dot_expr(as_double("embedding"), F.col("qv")), 6).alias("score"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("vec_id").asc())
    nn = s.select("*", F.row_number().over(w).alias("rk")).where(F.col("rk") <= _KNNB_K)
    votes = nn.groupBy("qid", "true_label", F.col("label").alias("pred_label")).agg(
        F.count("*").alias("c")
    )
    vw = Window.partitionBy("qid").orderBy(F.col("c").desc(), F.col("pred_label").asc())
    pred = votes.select("*", F.row_number().over(vw).alias("vk")).where(F.col("vk") == 1)
    return pred.groupBy("true_label", "pred_label").agg(
        F.count("*").cast("long").alias("n_queries"),
        F.count(F.when(F.col("true_label") == F.col("pred_label"), 1))
        .cast("long")
        .alias("n_correct"),
    )


j_knn_confusion.__doc__ = j_knn_confusion.__doc__.replace("{nq}", str(_KNNB_NQ)).replace(
    "{k}", str(_KNNB_K)
)


@query(
    "j_auc_rank",
    oracle="""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv, label AS qlabel
               FROM embeddings WHERE vec_id = 0),
    s AS (SELECT CAST(FLOOR(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)
                            * 1000000 + 0.5) AS BIGINT) AS s6,
                 CASE WHEN e.label = q.qlabel THEN 1 ELSE 0 END AS y
          FROM embeddings e, q WHERE e.vec_id <> 0),
    g AS (SELECT s6, CAST(SUM(y) AS BIGINT) AS np,
                 CAST(COUNT(*) - SUM(y) AS BIGINT) AS nn
          FROM s GROUP BY s6),
    c AS (SELECT s6, np, nn,
                 CAST(COALESCE(SUM(nn) OVER (ORDER BY s6
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                      AS BIGINT) AS neg_below
          FROM g),
    t AS (SELECT CAST(SUM(np * (2 * neg_below + nn)) AS BIGINT) AS u2,
                 CAST(SUM(np) AS BIGINT) AS n_pos,
                 CAST(SUM(nn) AS BIGINT) AS n_neg
          FROM c)
    SELECT n_pos, n_neg, u2,
           FLOOR(u2 * 1.0 / (2 * n_pos * n_neg) * 1000000 + 0.5) / 1000000
             AS auc
    FROM t
    """,
)
def j_auc_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval ROC-AUC by the Mann-Whitney rank identity: does
    similarity to the query vector rank same-label vectors above the
    rest? 2U = sum over score groups of np*(2*neg_below + nn) — ties
    get the midrank automatically and the statistic stays a 64-bit
    INTEGER until the single final division, so no accumulation-order
    ulp exists (the statistic twin of j_ab_ttest for ranking quality;
    the threshold-free complement to j_knn_confusion's hard votes).

    Plan note — why there is NO global rank window: per-row ranking
    over the corpus would be the Exchange-SinglePartition scale-killer
    (the j_token_budget lesson). Instead scores pre-round to the 1e-6
    grid (one narrow map), aggregate per DISTINCT score (map-side
    partials), and the running negative-count rides a window over the
    per-score relation — index metadata (<= |distinct scores| rows,
    bounded by the score grid), not the corpus. At 100 TB the same
    shape holds: the only data-sized pass is the scored scan."""
    t = load(spark, sf_dir)
    qrow = t.embeddings.where(F.col("vec_id") == 0).select("embedding", "label").head()
    from ..operators.similarity import _lit_vector

    qlit = _lit_vector([float(x) for x in qrow.embedding])
    s6 = F.floor(dot_expr(as_double("embedding"), qlit) * 1000000 + F.lit(0.5)).cast("long")
    s = t.embeddings.where(F.col("vec_id") != 0).select(
        s6.alias("s6"),
        (F.col("label") == F.lit(int(qrow.label))).cast("long").alias("y"),
    )
    g = s.groupBy("s6").agg(
        F.sum("y").cast("long").alias("np"),
        (F.count("*") - F.sum("y")).cast("long").alias("nn"),
    )
    w = Window.orderBy("s6").rowsBetween(Window.unboundedPreceding, -1)
    c = g.select(
        "np", "nn", F.coalesce(F.sum("nn").over(w), F.lit(0)).cast("long").alias("neg_below")
    )
    t2 = c.agg(
        F.sum(F.col("np") * (2 * F.col("neg_below") + F.col("nn"))).cast("long").alias("u2"),
        F.sum("np").cast("long").alias("n_pos"),
        F.sum("nn").cast("long").alias("n_neg"),
    )
    return t2.select(
        "n_pos",
        "n_neg",
        "u2",
        rnd(F.col("u2") * 1.0 / (2 * F.col("n_pos") * F.col("n_neg")), 6).alias("auc"),
    )


@query(
    "j_retrieval_mrr",
    oracle=f"""
    WITH q AS (SELECT vec_id AS qid, label AS qlabel,
                      CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id < {_KNNB_NQ}),
    s AS (SELECT q.qid, q.qlabel, e.vec_id, e.label,
                 FLOOR((list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv))
                       * 1000000 + 0.5) / 1000000 AS score
          FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.qid),
    r AS (SELECT qid, qlabel, label,
                 ROW_NUMBER() OVER (PARTITION BY qid
                                    ORDER BY score DESC, vec_id) AS rk
          FROM s)
    SELECT qid, qlabel AS true_label,
           CAST(MIN(CASE WHEN label = qlabel THEN rk END) AS BIGINT)
             AS first_rel_rank,
           FLOOR(1.0 / MIN(CASE WHEN label = qlabel THEN rk END)
                 * 1000000 + 0.5) / 1000000 AS rr,
           MIN(CASE WHEN label = qlabel THEN rk END) <= 10 AS hit_at_10
    FROM r GROUP BY qid, qlabel
    """,
)
def j_retrieval_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank retrieval evaluation per query: the rank of the
    FIRST same-label candidate, its reciprocal (the MRR contribution),
    and a hit@10 flag — the ranked-list companion to j_knn_confusion's
    hard votes and j_auc_rank's threshold-free separability; together
    the three are the standard retrieval scorecard. RR is 1/rank of an
    integer rank, so the only float is one division on identical
    operands.

    Plan: identical fan-out to j_knn_batch — the {nq}-row query set
    broadcasts onto the candidate scan, ONE qid-partitioned window
    ranks all queries in parallel (never a global window), and the
    min-over-relevant collapses each query to one row. At 100 TB the
    candidate leg is the ANN shortlist; this exact form audits it on
    sampled queries (j_ann_recall's protocol)."""
    t = load(spark, sf_dir)
    q = t.embeddings.where(F.col("vec_id") < _KNNB_NQ).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        as_double("embedding").alias("qv"),
    )
    s = (
        t.embeddings.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "qlabel",
            "vec_id",
            "label",
            rnd(dot_expr(as_double("embedding"), F.col("qv")), 6).alias("score"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("vec_id").asc())
    r = s.select("qid", "qlabel", "label", F.row_number().over(w).alias("rk"))
    rel_rk = F.min(F.when(F.col("label") == F.col("qlabel"), F.col("rk")))
    return r.groupBy("qid", F.col("qlabel").alias("true_label")).agg(
        rel_rk.cast("long").alias("first_rel_rank"),
        rnd(F.lit(1.0) / rel_rk, 6).alias("rr"),
        (rel_rk <= 10).alias("hit_at_10"),
    )


def _margin_oracle() -> str:
    """DuckDB twin of j_active_margin: same literal centroids, scores
    floored to scaled BIGINTs so the margin is exact integer math."""
    rows = _centroid_values_sql()
    return f"""
    WITH cents(cid, cv) AS (VALUES {rows}),
    e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings),
    s AS (SELECT e.vec_id, e.label, c.cid,
                 CAST(FLOOR(list_dot_product(e.v, c.cv) * 1000000 + 0.5)
                      AS BIGINT) AS sc
          FROM e CROSS JOIN cents c),
    r AS (SELECT vec_id, label, cid, sc,
                 ROW_NUMBER() OVER (PARTITION BY vec_id
                                    ORDER BY sc DESC, cid) AS rk
          FROM s),
    m AS (SELECT a.vec_id, a.label,
                 CAST(a.cid AS BIGINT) AS best_cid,
                 a.sc AS s1_scaled, b.sc AS s2_scaled,
                 a.sc - b.sc AS margin_scaled
          FROM r a JOIN r b ON a.vec_id = b.vec_id AND a.rk = 1 AND b.rk = 2)
    SELECT vec_id, label, best_cid, s1_scaled, s2_scaled, margin_scaled
    FROM m ORDER BY margin_scaled, vec_id LIMIT 20
    """


@query("j_active_margin", oracle=_margin_oracle())
def j_active_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncertainty sampling by centroid margin (the active-learning /
    data-selection loop): each vector scores against the literal
    16-centroid quantizer, and the 20 vectors whose top-2 centroid
    scores are CLOSEST (smallest margin) are the ones a labeling or
    curation pass should look at first — points near cluster
    boundaries, the selection dual of j_hard_negatives (which picks
    near-miss NEGATIVES for contrastive training). Scores floor to the
    1e-6 grid per centroid, so the margin is exact BIGINT subtraction
    and the top-20 order (margin, vec_id) is engine-stable.

    Plan: one HOF over the broadcast-free literal matrix per row (the
    _best_centroid discipline — constant-folded, k-independent
    expression tree), zero shuffles for scoring, then ONE
    TakeOrderedAndProject for the global top-20 (no full sort). At
    100 TB margins land as a write-time column and this query is
    partition-pruned to the freshest slice."""
    from ..operators.similarity import _lit_matrix, kmeans_train_local

    t = load(spark, sf_dir)
    cents = kmeans_train_local(sf_dir, k=_IVF_K, iters=_IVF_ITERS)
    mat = _lit_matrix([[float(x) for x in vec] for _, vec in cents])
    ncids = F.expr("array(" + ",".join(str(-int(cid)) for cid, _ in cents) + ")")
    e = t.embeddings.select("vec_id", "label", as_double("embedding").alias("v"))
    scored = e.withColumn(
        "pairs",
        F.zip_with(
            F.transform(mat, lambda c: F.floor(dot_expr(c, F.col("v")) * 1000000 + F.lit(0.5)).cast("long")),
            ncids,
            lambda sc, nc: F.struct(sc.alias("sc"), nc.alias("ncid")),
        ),
    )
    best = F.array_max(F.col("pairs"))
    second = F.array_max(F.filter(F.col("pairs"), lambda p: p["ncid"] != best["ncid"]))
    out = scored.select(
        "vec_id",
        "label",
        (-best["ncid"]).cast("long").alias("best_cid"),
        best["sc"].alias("s1_scaled"),
        second["sc"].alias("s2_scaled"),
        (best["sc"] - second["sc"]).alias("margin_scaled"),
    )
    return out.orderBy(F.col("margin_scaled").asc(), F.col("vec_id").asc()).limit(20)


# Shared by the j_lang_confusion oracle and (as a subquery) the
# j_cohen_kappa oracle — the full lang-ID prediction + label join.
_LANG_CONFUSION_SQL = """
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
    langs AS (SELECT DISTINCT lang FROM documents),
    vocab AS (SELECT COUNT(DISTINCT term) AS v FROM tok),
    prof AS (SELECT lang, term, COUNT(*) AS cnt
             FROM (SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents)
             GROUP BY lang, term),
    totals AS (SELECT lang, SUM(cnt) AS tot FROM prof GROUP BY lang),
    scores AS (
      SELECT tok.doc_id, langs.lang AS cand,
             FLOOR((SUM(ln((COALESCE(prof.cnt, 0) + 1.0) / (totals.tot + vocab.v))))
                   * 10000 + 0.5) / 10000 AS score
      FROM tok CROSS JOIN langs CROSS JOIN vocab
      LEFT JOIN prof ON prof.lang = langs.lang AND prof.term = tok.term
      JOIN totals ON totals.lang = langs.lang
      GROUP BY tok.doc_id, langs.lang, vocab.v),
    pred AS (SELECT doc_id, cand AS pred_lang FROM (
               SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                            ORDER BY score DESC, cand) AS rk
               FROM scores) WHERE rk = 1)
    SELECT d.lang AS true_lang, p.pred_lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents d JOIN pred p USING (doc_id)
    GROUP BY d.lang, p.pred_lang
    """


@query("j_lang_confusion", oracle=_LANG_CONFUSION_SQL)
def j_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix: the registered j_lang_id
    classifier's predictions against the labeled lang column — the
    per-class audit every classifier in this registry now carries
    (j_knn_confusion for retrieval, this for lang-id). Off-diagonal
    mass localizes WHICH language pairs the unigram profiles conflate,
    which decides whether the production fix is more profile data or a
    char-n-gram upgrade.

    Plan: reuses the registered j_lang_id plan verbatim (broadcast
    profiles, one doc-keyed agg), joins the doc-keyed prediction back
    to the labels on the table's natural key, and collapses to <=
    |langs|^2 cells. The join is doc_id-equi so at 100 TB it co-
    partitions with the prediction shuffle; output is metadata."""
    from ..registry import QUERIES

    t = load(spark, sf_dir)
    pred = QUERIES["j_lang_id"](spark, sf_dir).select("doc_id", "pred_lang")
    truth = t.documents.select("doc_id", F.col("lang").alias("true_lang"))
    return truth.join(pred, "doc_id").groupBy("true_lang", "pred_lang").agg(
        F.count("*").cast("long").alias("n_docs")
    )


@query(
    "j_cohen_kappa",
    oracle=f"""
    WITH conf AS ({_LANG_CONFUSION_SQL}),
    n AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n FROM conf),
    ag AS (SELECT CAST(SUM(CASE WHEN true_lang = pred_lang
                                THEN n_docs ELSE 0 END) AS BIGINT) AS n_agree
           FROM conf),
    rm AS (SELECT true_lang AS lang, CAST(SUM(n_docs) AS BIGINT) AS r
           FROM conf GROUP BY true_lang),
    cm AS (SELECT pred_lang AS lang, CAST(SUM(n_docs) AS BIGINT) AS c
           FROM conf GROUP BY pred_lang),
    e AS (SELECT CAST(SUM(rm.r * cm.c) AS BIGINT) AS e_sum
          FROM rm JOIN cm USING (lang))
    SELECT n.n AS n_docs, ag.n_agree, e.e_sum,
           FLOOR(ag.n_agree * 1.0 / n.n * 1000000 + 0.5) / 1000000 AS p_o,
           FLOOR(e.e_sum * 1.0 / (n.n * n.n) * 1000000 + 0.5) / 1000000 AS p_e,
           FLOOR((n.n * ag.n_agree - e.e_sum) * 1.0
                 / (n.n * n.n - e.e_sum) * 1000000 + 0.5) / 1000000 AS kappa
    FROM n CROSS JOIN ag CROSS JOIN e
    """,
)
def j_cohen_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa for the lang-ID classifier against the labeled
    lang column — chance-corrected agreement (Cohen 1960, public): raw
    accuracy p_o overstates a classifier on imbalanced label mixes,
    and kappa = (p_o − p_e)/(1 − p_e) subtracts the agreement two
    independent raters with these marginals would reach by luck. The
    scalar roll-up of j_lang_confusion's cell matrix, and the number a
    model-selection loop actually thresholds on.

    EXACT integer arithmetic: kappa cross-multiplies to
    (N·n_agree − Σ r_l·c_l) / (N² − Σ r_l·c_l), all BIGINT (at 10^10
    docs N² needs DECIMAL(38) — documented upgrade, same shape); the
    three display ratios are each ONE division of exact integers. The
    raw numerator/denominator terms (n_agree, e_sum) are emitted
    unrounded so the decision grid is auditable.

    Plan: reuses the registered j_lang_confusion cells (≤ |langs|²
    metadata); marginals, the diagonal, and the expected-agreement sum
    are aggregates OVER that cell table — zero additional corpus
    passes; the three 1-row frames cross-join in (allowlisted BNLJ)."""
    from ..registry import QUERIES

    conf = QUERIES["j_lang_confusion"](spark, sf_dir)
    conf.persist()  # consumers: total+diagonal agg, both marginals
    n = conf.agg(
        F.sum("n_docs").cast("long").alias("n"),
        F.sum(
            F.when(F.col("true_lang") == F.col("pred_lang"), F.col("n_docs")).otherwise(0)
        )
        .cast("long")
        .alias("n_agree"),
    )
    rm = conf.groupBy(F.col("true_lang").alias("lang")).agg(
        F.sum("n_docs").cast("long").alias("r")
    )
    cm = conf.groupBy(F.col("pred_lang").alias("lang")).agg(
        F.sum("n_docs").cast("long").alias("c")
    )
    e = (
        rm.join(cm, "lang")
        .agg(F.sum(F.col("r") * F.col("c")).cast("long").alias("e_sum"))
    )
    nn = F.col("n") * F.col("n")
    return (
        n.crossJoin(F.broadcast(e))
        .select(
            F.col("n").alias("n_docs"),
            "n_agree",
            "e_sum",
            rnd(F.col("n_agree") * 1.0 / F.col("n"), 6).alias("p_o"),
            rnd(F.col("e_sum") * 1.0 / nn, 6).alias("p_e"),
            rnd(
                (F.col("n") * F.col("n_agree") - F.col("e_sum"))
                * 1.0
                / (nn - F.col("e_sum")),
                6,
            ).alias("kappa"),
        )
    )


@query(
    "j_f1_macro",
    oracle=f"""
    WITH conf AS ({_LANG_CONFUSION_SQL}),
    classes AS (SELECT DISTINCT lang FROM documents),
    rowm AS (SELECT true_lang AS lang, CAST(SUM(n_docs) AS BIGINT) AS row_n,
                    CAST(SUM(CASE WHEN true_lang = pred_lang
                                  THEN n_docs ELSE 0 END) AS BIGINT) AS tp
             FROM conf GROUP BY true_lang),
    colm AS (SELECT pred_lang AS lang, CAST(SUM(n_docs) AS BIGINT) AS col_n
             FROM conf GROUP BY pred_lang),
    per AS (SELECT c.lang,
                   COALESCE(rowm.tp, 0) AS tp,
                   COALESCE(colm.col_n, 0) - COALESCE(rowm.tp, 0) AS fp,
                   COALESCE(rowm.row_n, 0) - COALESCE(rowm.tp, 0) AS fn
            FROM classes c LEFT JOIN rowm USING (lang)
                           LEFT JOIN colm USING (lang)),
    sc AS (SELECT lang, tp, fp, fn,
                  CASE WHEN tp + fp = 0 THEN 0
                       ELSE (tp * 1000000) // (tp + fp) END AS p6,
                  CASE WHEN tp + fn = 0 THEN 0
                       ELSE (tp * 1000000) // (tp + fn) END AS r6,
                  CASE WHEN 2 * tp + fp + fn = 0 THEN 0
                       ELSE (2 * tp * 1000000) // (2 * tp + fp + fn) END AS f6
           FROM per),
    mic AS (SELECT CAST(SUM(tp) AS BIGINT) AS tp, CAST(SUM(fp) AS BIGINT) AS fp,
                   CAST(SUM(fn) AS BIGINT) AS fn
            FROM sc),
    mics AS (SELECT '(micro)' AS lang, tp, fp, fn,
                    CASE WHEN tp + fp = 0 THEN 0
                         ELSE (tp * 1000000) // (tp + fp) END AS p6,
                    CASE WHEN tp + fn = 0 THEN 0
                         ELSE (tp * 1000000) // (tp + fn) END AS r6,
                    CASE WHEN 2 * tp + fp + fn = 0 THEN 0
                         ELSE (2 * tp * 1000000) // (2 * tp + fp + fn) END AS f6
             FROM mic),
    macs AS (SELECT '(macro)' AS lang, CAST(NULL AS BIGINT) AS tp,
                    CAST(NULL AS BIGINT) AS fp, CAST(NULL AS BIGINT) AS fn,
                    CAST(CAST(SUM(p6) AS BIGINT) // COUNT(*) AS BIGINT) AS p6,
                    CAST(CAST(SUM(r6) AS BIGINT) // COUNT(*) AS BIGINT) AS r6,
                    CAST(CAST(SUM(f6) AS BIGINT) // COUNT(*) AS BIGINT) AS f6
             FROM sc),
    u AS (SELECT * FROM sc UNION ALL SELECT * FROM mics
          UNION ALL SELECT * FROM macs)
    SELECT lang, tp, fp, fn,
           p6 / 1000000.0 AS prec, r6 / 1000000.0 AS rec, f6 / 1000000.0 AS f1
    FROM u
    """,
)
def j_f1_macro(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class precision/recall/F1 plus the micro and macro rollups
    for the lang-ID classifier — the scalar grid model selection reads
    after j_lang_confusion localizes the errors and j_cohen_kappa
    chance-corrects the total (van Rijsbergen 1979, public). Macro
    weights classes equally (the low-resource-language guard in corpus
    mixture design); micro re-derives accuracy from pooled counts.

    EXACT integer arithmetic end-to-end: per class, precision, recall
    and F1 lower to single integer floor-divisions on 1e-6-scaled
    BIGINTs — F1 via the sufficient form 2·tp/(2·tp+fp+fn), never
    p·r composition, so there is NO float accumulation anywhere; the
    macro averages are integer sums of those scaled values divided by
    the class count. All numerators non-negative, so Spark `div` ==
    DuckDB `//` (the sign precondition documented per the r9 ADVICE
    discipline). The display columns are each scaled-int / 1e6 — one
    identical IEEE op per engine.

    Plan: everything after the persisted ≤|langs|² confusion cells is
    metadata-sized — two cell rollups, a |langs|-row join, and three
    1-row frames unioned in. Zero additional corpus passes."""
    from ..registry import QUERIES

    t = load(spark, sf_dir)
    conf = QUERIES["j_lang_confusion"](spark, sf_dir)
    conf.persist()  # consumers: row marginals + tp diagonal, col marginals
    classes = t.documents.select("lang").distinct()
    rowm = conf.groupBy(F.col("true_lang").alias("lang")).agg(
        F.sum("n_docs").cast("long").alias("row_n"),
        F.sum(
            F.when(F.col("true_lang") == F.col("pred_lang"), F.col("n_docs")).otherwise(0)
        )
        .cast("long")
        .alias("tp"),
    )
    colm = conf.groupBy(F.col("pred_lang").alias("lang")).agg(
        F.sum("n_docs").cast("long").alias("col_n")
    )
    per = (
        classes.join(rowm, "lang", "left")
        .join(colm, "lang", "left")
        .select(
            "lang",
            F.coalesce("tp", F.lit(0)).cast("long").alias("tp"),
            (F.coalesce("col_n", F.lit(0)) - F.coalesce("tp", F.lit(0)))
            .cast("long")
            .alias("fp"),
            (F.coalesce("row_n", F.lit(0)) - F.coalesce("tp", F.lit(0)))
            .cast("long")
            .alias("fn"),
        )
    )

    def scaled(df):
        return df.select(
            "lang",
            "tp",
            "fp",
            "fn",
            F.when(F.col("tp") + F.col("fp") == 0, F.lit(0).cast("long"))
            .otherwise(F.expr("(tp * 1000000) div (tp + fp)"))
            .alias("p6"),
            F.when(F.col("tp") + F.col("fn") == 0, F.lit(0).cast("long"))
            .otherwise(F.expr("(tp * 1000000) div (tp + fn)"))
            .alias("r6"),
            F.when(2 * F.col("tp") + F.col("fp") + F.col("fn") == 0, F.lit(0).cast("long"))
            .otherwise(F.expr("(2 * tp * 1000000) div (2 * tp + fp + fn)"))
            .alias("f6"),
        )

    sc = scaled(per)
    sc.persist()  # consumers: per-class rows, micro sums, macro average
    mic = scaled(
        sc.agg(
            F.lit("(micro)").alias("lang"),
            F.sum("tp").cast("long").alias("tp"),
            F.sum("fp").cast("long").alias("fp"),
            F.sum("fn").cast("long").alias("fn"),
        )
    )
    mac = sc.agg(
        F.lit("(macro)").alias("lang"),
        F.lit(None).cast("long").alias("tp"),
        F.lit(None).cast("long").alias("fp"),
        F.lit(None).cast("long").alias("fn"),
        F.expr("CAST(SUM(p6) AS BIGINT) div COUNT(*)").alias("p6"),
        F.expr("CAST(SUM(r6) AS BIGINT) div COUNT(*)").alias("r6"),
        F.expr("CAST(SUM(f6) AS BIGINT) div COUNT(*)").alias("f6"),
    )
    u = sc.unionByName(mic).unionByName(mac)
    return u.select(
        "lang",
        "tp",
        "fp",
        "fn",
        (F.col("p6") / F.lit(1000000.0)).alias("prec"),
        (F.col("r6") / F.lit(1000000.0)).alias("rec"),
        (F.col("f6") / F.lit(1000000.0)).alias("f1"),
    )


_LANG_SCORES_CTES = """tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                FROM documents),
    langs AS (SELECT DISTINCT lang FROM documents),
    vocab AS (SELECT COUNT(DISTINCT term) AS v FROM tok),
    prof AS (SELECT lang, term, COUNT(*) AS cnt
             FROM (SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents)
             GROUP BY lang, term),
    totals AS (SELECT lang, SUM(cnt) AS tot FROM prof GROUP BY lang),
    scores AS (
      SELECT tok.doc_id, langs.lang AS cand,
             FLOOR((SUM(ln((COALESCE(prof.cnt, 0) + 1.0) / (totals.tot + vocab.v))))
                   * 10000 + 0.5) / 10000 AS score
      FROM tok CROSS JOIN langs CROSS JOIN vocab
      LEFT JOIN prof ON prof.lang = langs.lang AND prof.term = tok.term
      JOIN totals ON totals.lang = langs.lang
      GROUP BY tok.doc_id, langs.lang, vocab.v)"""


@query(
    "j_selective_accuracy",
    oracle=f"""
    WITH {_LANG_SCORES_CTES},
    top2 AS (SELECT doc_id,
                    MAX(CASE WHEN rk = 1 THEN cand END) AS pred_lang,
                    MAX(CASE WHEN rk = 1 THEN score END) AS s1,
                    MAX(CASE WHEN rk = 2 THEN score END) AS s2
             FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                                ORDER BY score DESC, cand) AS rk
                   FROM scores)
             WHERE rk <= 2 GROUP BY doc_id),
    m AS (SELECT CAST(FLOOR((t.s1 - t.s2) * 10) AS BIGINT) AS margin_deci,
                 CASE WHEN t.pred_lang = d.lang THEN 1 ELSE 0 END AS ok
          FROM top2 t JOIN documents d USING (doc_id)),
    g AS (SELECT margin_deci, CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(ok) AS BIGINT) AS n_correct
          FROM m GROUP BY margin_deci),
    cum AS (SELECT margin_deci, n_docs, n_correct,
                   CAST(SUM(n_docs) OVER win AS BIGINT) AS n_ge,
                   CAST(SUM(n_correct) OVER win AS BIGINT) AS correct_ge
            FROM g WINDOW win AS (ORDER BY margin_deci DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    ct AS (SELECT *, CAST(MAX(n_ge) OVER () AS BIGINT) AS nn FROM cum)
    SELECT margin_deci, n_docs, n_correct, n_ge, correct_ge,
           {sql_rnd("n_ge * 1.0 / nn", 6)} AS coverage,
           {sql_rnd("correct_ge * 1.0 / n_ge", 6)} AS sel_accuracy
    FROM ct
    """,
)
def j_selective_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Risk–coverage curve for the lang-ID classifier (selective
    prediction, Geifman & El-Yaniv 2017, public): docs bucket by the
    top-1 vs top-2 log-odds margin (0.1-nat buckets), and each bucket
    row reports the coverage and accuracy of predicting ONLY docs at
    or above that margin. The operational output is the margin
    threshold at which accuracy clears the routing bar — above it
    auto-label, below it route to human review / a bigger model; the
    j_active_margin companion for CLASSIFIER confidence rather than
    kNN neighborhood ambiguity.

    Determinism: s1, s2 are the registered 1e-4-rounded scores, so the
    margin is ONE subtraction of identical doubles and the ×10 floor
    bucket is engine-independent (margin ≥ 0 by rank construction —
    the div/floor sign precondition holds). Counts are exact BIGINTs;
    coverage/accuracy are single divisions rounded 1e-6.

    Plan: reuses _lang_scores (the j_lang_id pipeline verbatim), one
    doc-keyed top-2 window co-partitioned with the score agg, a
    doc_id-equi join to the labels, and then ONE hash agg to ≤ a few
    hundred margin buckets — the cumulative window runs over bucket
    METADATA (the j_jaccard_threshold_curve shape), never corpus
    rows."""
    t = load(spark, sf_dir)
    scores = _lang_scores(t)
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("cand"))
    top2 = (
        scores.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 2)
        .groupBy("doc_id")
        .agg(
            F.max(F.when(F.col("rk") == 1, F.col("cand"))).alias("pred_lang"),
            F.max(F.when(F.col("rk") == 1, F.col("score"))).alias("s1"),
            F.max(F.when(F.col("rk") == 2, F.col("score"))).alias("s2"),
        )
    )
    truth = t.documents.select("doc_id", "lang")
    m = top2.join(truth, "doc_id").select(
        F.floor((F.col("s1") - F.col("s2")) * 10).cast("long").alias("margin_deci"),
        F.when(F.col("pred_lang") == F.col("lang"), 1).otherwise(0).alias("ok"),
    )
    g = m.groupBy("margin_deci").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("ok").cast("long").alias("n_correct"),
    )
    wc = (
        Window.orderBy(F.col("margin_deci").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = g.select(
        "margin_deci",
        "n_docs",
        "n_correct",
        F.sum("n_docs").over(wc).cast("long").alias("n_ge"),
        F.sum("n_correct").over(wc).cast("long").alias("correct_ge"),
    )
    # the grand total is the LAST cumulative value — max(n_ge) over the
    # bucket-metadata frame — so the scoring pipeline is referenced
    # exactly once (no second aggregate over g, no reliance on
    # ReuseExchange to dedup it)
    w_all = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ct = cum.withColumn("nn", F.max("n_ge").over(w_all).cast("long"))
    return ct.select(
        "margin_deci",
        "n_docs",
        "n_correct",
        "n_ge",
        "correct_ge",
        rnd(F.col("n_ge") * 1.0 / F.col("nn"), 6).alias("coverage"),
        rnd(F.col("correct_ge") * 1.0 / F.col("n_ge"), 6).alias("sel_accuracy"),
    )


def _purity_oracle() -> str:
    """DuckDB twin of j_cluster_purity: the IVF assignment CTE with the
    shared literal centroids, then per-cluster majority-label purity."""
    rows = _centroid_values_sql()
    return f"""
    WITH cents(cid, cv) AS (VALUES {rows}),
    e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    scored AS (SELECT e.vec_id, e.label, c.cid,
                      list_dot_product(e.v, cv) AS s
               FROM e CROSS JOIN cents c),
    assigned AS (SELECT vec_id, label, cid AS cluster_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                     ORDER BY s DESC, cid) AS rk
        FROM scored) WHERE rk = 1),
    votes AS (SELECT cluster_id, label, CAST(COUNT(*) AS BIGINT) AS n
              FROM assigned GROUP BY cluster_id, label),
    tot AS (SELECT cluster_id, CAST(SUM(n) AS BIGINT) AS n_vecs,
                   CAST(COUNT(*) AS BIGINT) AS n_labels
            FROM votes GROUP BY cluster_id),
    top AS (SELECT cluster_id, label AS major_label, n AS n_major FROM (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY cluster_id
                                           ORDER BY n DESC, label) AS rk
              FROM votes) WHERE rk = 1)
    SELECT CAST(t.cluster_id AS BIGINT) AS cluster_id, n_vecs, n_labels,
           CAST(major_label AS BIGINT) AS major_label, n_major,
           FLOOR(n_major * 1.0 / n_vecs * 1000000 + 0.5) / 1000000 AS purity
    FROM tot t JOIN top USING (cluster_id)
    """


@query("j_cluster_purity", oracle=_purity_oracle())
def j_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-vs-label purity of the IVF quantizer: per cluster, the
    majority label's share of members — the unsupervised-quality audit
    for the SAME literal centroids j_ann_ivf/j_ann_pq route queries
    through (low purity on a hot cluster predicts poor ANN label
    locality, which j_knn_confusion then shows from the query side;
    the three close the index-health loop). Majority ties break to the
    smallest label; purity is one rounded division of exact counts.

    Plan: assignment is the zero-shuffle literal-matrix HOF map
    (ivf_assign), then two metadata-sized aggs (votes <= k x |labels|
    rows) and a top-1 window over them. At 100 TB assignment is the
    write-time partition key, so this audit reads counts per
    partition — effectively free."""
    from ..operators.similarity import ivf_assign, kmeans_train_local

    t = load(spark, sf_dir)
    cents = kmeans_train_local(sf_dir, k=_IVF_K, iters=_IVF_ITERS)
    assigned, _ = ivf_assign(t.embeddings, k_clusters=_IVF_K, cents=cents)
    votes = assigned.groupBy("cluster_id", "label").agg(
        F.count("*").cast("long").alias("n")
    )
    tot = votes.groupBy("cluster_id").agg(
        F.sum("n").cast("long").alias("n_vecs"),
        F.count("*").cast("long").alias("n_labels"),
    )
    w = Window.partitionBy("cluster_id").orderBy(F.col("n").desc(), F.col("label").asc())
    top = (
        votes.select("*", F.row_number().over(w).alias("rk"))
        .where(F.col("rk") == 1)
        .select(
            "cluster_id",
            F.col("label").cast("long").alias("major_label"),
            F.col("n").alias("n_major"),
        )
    )
    return tot.join(top, "cluster_id").select(
        F.col("cluster_id").cast("long").alias("cluster_id"),
        "n_vecs",
        "n_labels",
        "major_label",
        "n_major",
        rnd(F.col("n_major") * 1.0 / F.col("n_vecs"), 6).alias("purity"),
    )


def _pq_distortion_oracle() -> str:
    """DuckDB twin of j_pq_distortion: same literal codebooks and the
    same fixed double sequence err = (vv - 2*(s + half)) + cc."""
    books, _q, halves, _adc = _pq_model()
    from ..operators.similarity import seq_dot

    d = _PQ_SUBDIM
    rows = ", ".join(
        f"({b}, {cid}, [{', '.join(repr(x) for x in cv)}], "
        f"CAST('{halves[b][cid]!r}' AS DOUBLE), "
        f"CAST('{seq_dot(cv, cv)!r}' AS DOUBLE))"
        for b, book in enumerate(books)
        for cid, cv in book
    )
    return f"""
    WITH cents(b, cid, cv, half, cc) AS (VALUES {rows}),
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    scored AS (SELECT e.vec_id, c.b, c.cid, c.half, c.cc,
                      list_dot_product(
                          list_slice(e.v, c.b * {d} + 1, c.b * {d} + {d}), c.cv)
                        - c.half AS s,
                      list_dot_product(
                          list_slice(e.v, c.b * {d} + 1, c.b * {d} + {d}),
                          list_slice(e.v, c.b * {d} + 1, c.b * {d} + {d})) AS vv
               FROM e CROSS JOIN cents c),
    codes AS (SELECT vec_id, b, cid, half, cc, s, vv FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, b
                                     ORDER BY s DESC, cid) AS rk
        FROM scored) WHERE rk = 1),
    err AS (SELECT b, cid,
                   CAST(FLOOR(((vv - 2 * (s + half)) + cc) * 1000000000 + 0.5)
                        AS BIGINT) AS e9
            FROM codes)
    SELECT CAST(b AS BIGINT) AS block,
           CAST(COUNT(DISTINCT cid) AS BIGINT) AS n_codes_used,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(e9) AS BIGINT) AS err_sum_scaled,
           CAST(MAX(e9) AS BIGINT) AS err_max_scaled
    FROM err GROUP BY b
    """


@query("j_pq_distortion", oracle=_pq_distortion_oracle())
def j_pq_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ reconstruction-distortion audit per subspace block: the exact
    L2 error ||v_b − c_b||² of every vector's assigned code, from the
    identity (|v|² − 2·v·c) + |c|² evaluated as the SAME fixed double
    sequence in both engines (the winning v·c comes back from the
    assignment fold as s + half; |c|² is a driver literal), floored to
    a 1e-9 scaled BIGINT per row before the integer sum. Codebook
    health in one relation: per-block total/max distortion and how
    many of the 32 codes are actually used — a block with high error
    or collapsed code usage is where the ~51× compression is paying
    with recall (j_ann_pq_recall measures the end-to-end effect; this
    localizes WHICH subspace causes it).

    Engine path (r10, the r9 verdict's mapInArrow option): the first
    form unrolled 8 blocks of transform/aggregate HOF folds over
    literal codebooks — correct and zero-shuffle, but Catalyst HOFs
    are CodegenFallback (interpreted, one JVM object per lambda step),
    so the 8×32×8 multiply-adds per vector ran ~8 s of pure constant
    at sf0.1's 2k vectors. This is exactly the "built-ins genuinely
    can't express it efficiently" case: the same arithmetic is now an
    Arrow-batched numpy kernel (mapInArrow, the k_map_in_arrow
    discipline) whose per-dim accumulation replays the dot_expr LEFT
    FOLD order — S starts at 0.0 and adds x_j·c_j one dim at a time —
    so every double is bit-identical to the declarative form and the
    DuckDB oracle is UNCHANGED. np.argmax takes the first max, which
    is the smallest code id, matching the array_max(struct(s, -cid))
    tie-break.

    Plan: a narrow Arrow map emitting ≤ 256 per-batch partial rows
    (block, cid, n, Σe9, max e9) — the corpus never leaves the map
    stage — then ONE 8-row final agg. At 100 TB this is the
    write-time audit that decides when codebooks need retraining."""
    import pyarrow as pa

    from ..operators.similarity import pq_train_local, seq_dot

    t = load(spark, sf_dir)
    books = pq_train_local(sf_dir, n_blocks=_PQ_BLOCKS, k=_PQ_K, iters=_PQ_ITERS)
    d = _PQ_SUBDIM
    # plain-python closure payload: per block a (k, d) code matrix in
    # ascending-cid order plus the driver-literal |c|^2 halves/fulls
    mats = [[cv for _, cv in sorted(book)] for book in books]
    halves = [[0.5 * seq_dot(cv, cv) for _, cv in sorted(book)] for book in books]
    fulls = [[seq_dot(cv, cv) for _, cv in sorted(book)] for book in books]
    n_blocks = _PQ_BLOCKS

    def batches(it):
        import numpy as np

        C = [np.array(m, dtype=np.float64) for m in mats]  # (k, d) each
        H = [np.array(h, dtype=np.float64) for h in halves]
        CC = [np.array(c, dtype=np.float64) for c in fulls]
        for batch in it:
            emb = batch.column("embedding")
            flat = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
            offs = emb.offsets.to_numpy(zero_copy_only=False)
            dims = (offs[1:] - offs[:-1]).astype(np.int64)
            n = len(dims)
            if not n:
                continue
            v = flat.reshape(n, int(dims[0]))
            blocks, cids, ns, s9s, m9s = [], [], [], [], []
            for b in range(n_blocks):
                sub = v[:, b * d : (b + 1) * d]
                # left-fold dot: acc = 0.0; acc += x_j * c_j per dim —
                # the dot_expr IEEE sequence, vectorized across rows
                S = np.zeros((n, C[b].shape[0]))
                vv = np.zeros(n)
                for j in range(d):
                    S += sub[:, j : j + 1] * C[b][None, :, j]
                    vv += sub[:, j] * sub[:, j]
                S -= H[b][None, :]
                best = np.argmax(S, axis=1)  # first max == smallest cid
                s_win = S[np.arange(n), best]
                err = (vv - 2.0 * (s_win + H[b][best])) + CC[b][best]
                e9 = np.floor(err * 1e9 + 0.5).astype(np.int64)
                for cid in np.unique(best):
                    sel = e9[best == cid]
                    blocks.append(b)
                    cids.append(int(cid))
                    ns.append(int(sel.size))
                    s9s.append(int(sel.sum()))
                    m9s.append(int(sel.max()))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(blocks, type=pa.int64()),
                    pa.array(cids, type=pa.int64()),
                    pa.array(ns, type=pa.int64()),
                    pa.array(s9s, type=pa.int64()),
                    pa.array(m9s, type=pa.int64()),
                ],
                names=["block", "cid", "n", "s9", "m9"],
            )

    part = t.embeddings.select("embedding").mapInArrow(
        batches, "block long, cid long, n long, s9 long, m9 long"
    )
    return part.groupBy("block").agg(
        F.countDistinct("cid").cast("long").alias("n_codes_used"),
        F.sum("n").cast("long").alias("n_vecs"),
        F.sum("s9").cast("long").alias("err_sum_scaled"),
        F.max("m9").cast("long").alias("err_max_scaled"),
    )


_JACCARD_CURVE_ORACLE = """
    WITH sh AS (
      SELECT doc_id, lang, source,
             list_distinct(list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                 i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s
      FROM (SELECT doc_id, lang, source, string_split(text, ' ') AS toks
            FROM documents)),
    pj AS (SELECT CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
                  CAST(len(list_distinct(a.s || b.s)) AS DOUBLE) AS jac
           FROM sh a JOIN sh b ON a.doc_id < b.doc_id
                AND a.lang = b.lang AND a.source = b.source),
    p1 AS (SELECT jac, ((jac * jac) * jac) * jac AS s4 FROM pj),
    p2 AS (SELECT jac, CAST(1 AS DOUBLE) - s4 AS u FROM p1),
    p3 AS (SELECT jac, u * u AS u2 FROM p2),
    p4 AS (SELECT jac, u2 * u2 AS u4 FROM p3),
    p5 AS (SELECT jac, u4 * u4 AS u8 FROM p4),
    p6 AS (SELECT jac, u8 * u8 AS u16 FROM p5),
    p7 AS (SELECT jac, CAST(1 AS DOUBLE) - (u16 * u16) AS p FROM p6),
    bkt AS (SELECT CAST(FLOOR(jac * 20) AS BIGINT) AS c,
                   CAST(FLOOR(p * 1000000000 + 0.5) AS BIGINT) AS e9 FROM p7),
    g AS (SELECT c, COUNT(*) AS n_b, SUM(e9) AS s_b FROM bkt GROUP BY c),
    cum AS (SELECT c,
                   CAST(SUM(n_b) OVER win AS BIGINT) AS n_pairs_ge,
                   CAST(SUM(s_b) OVER win AS BIGINT) AS exp_caught_scaled
            FROM g WINDOW win AS (ORDER BY c DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
    SELECT c * 5 AS tau_centi, n_pairs_ge, exp_caught_scaled,
           FLOOR(((CAST(exp_caught_scaled AS DOUBLE) / CAST(1000000000 AS DOUBLE))
                  / CAST(n_pairs_ge AS DOUBLE)) * 1000000 + 0.5) / 1000000
             AS exp_recall
    FROM cum
"""


@query("j_jaccard_threshold_curve", oracle=_JACCARD_CURVE_ORACLE)
def j_jaccard_threshold_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded-LSH tuning curve from ONE exact pass: every
    (lang, source)-blocked pair's 3-gram Jaccard is binned at 0.05
    granularity, and each 0.05 edge's row reports (a) how many pairs
    sit at-or-above that bin and (b) the expected number/fraction the
    registered 32-band x 4-row MinHash banding would catch there —
    Sum 1-(1-s^4)^32 over those pairs, the S-curve that decides b and r
    BEFORE paying for a full LSH job. The probability is evaluated as a
    FIXED IEEE sequence (s^4 as ((s*s)*s)*s, (1-s^4)^32 as five
    squarings) so Spark and DuckDB produce bit-identical doubles with
    no pow() in either engine, then floored to a 1e-9-scaled BIGINT
    per pair before the integer suffix sum.

    Plan: the quadratic leg is the SAME deliberately-blocked
    ground-truth pass j_dedup_ngram runs (at 100 TB: on a sampled
    stratum); everything after it is one ~21-row hash aggregate and a
    window over that aggregate — the curve costs nothing beyond the
    exact pass it audits. Tuning loop closed by j_lsh_recall_banded,
    which measures the banding's ACTUAL recall at tau=0.3."""
    sh = (
        # spread: tokenization + shingle hashing feed the persisted
        # self-join input; ONE task without it (no-op at scale,
        # tables.spread)
        spread(spark, sf_dir, "documents").select(
            "doc_id", "lang", "source", tokens_col("text").alias("_toks")
        )
        .select(
            "doc_id",
            "lang",
            "source",
            F.transform(
                shingles_from_toks(F.col("_toks")), lambda x: F.xxhash64(x)
            ).alias("s"),
        )
        .persist()
    )
    a, b = sh.alias("a"), sh.alias("b")
    jac = (
        F.size(F.array_intersect("a.s", "b.s")).cast("double")
        / F.size(F.array_union("a.s", "b.s")).cast("double")
    )
    pairs = a.join(
        b,
        (F.col("a.lang") == F.col("b.lang"))
        & (F.col("a.source") == F.col("b.source"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(jac.alias("jac"))
    j = F.col("jac")
    s4 = ((j * j) * j) * j
    u = F.lit(1.0) - s4
    u2 = u * u
    u4 = u2 * u2
    u8 = u4 * u4
    u16 = u8 * u8
    p = F.lit(1.0) - (u16 * u16)
    binned = pairs.select(
        F.floor(j * 20).cast("long").alias("c"),
        F.floor(p * 1000000000 + F.lit(0.5)).cast("long").alias("e9"),
    ).groupBy("c").agg(F.count("*").alias("n_b"), F.sum("e9").alias("s_b"))
    # suffix-cumulative over the <=21-row bucket AGGREGATE — the
    # unpartitioned window runs on index metadata, never on the corpus
    w = Window.orderBy(F.col("c").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = binned.select(
        (F.col("c") * 5).cast("long").alias("tau_centi"),
        F.sum("n_b").over(w).cast("long").alias("n_pairs_ge"),
        F.sum("s_b").over(w).cast("long").alias("exp_caught_scaled"),
    )
    return cum.select(
        "tau_centi",
        "n_pairs_ge",
        "exp_caught_scaled",
        rnd(
            (F.col("exp_caught_scaled").cast("double") / F.lit(1000000000).cast("double"))
            / F.col("n_pairs_ge").cast("double"),
            6,
        ).alias("exp_recall"),
    )


_CHARGRAM_SPARK = (
    "CASE WHEN length(text) >= 3 "
    "THEN transform(sequence(1, length(text) - 2), i -> substring(text, i, 3)) "
    "ELSE array() END"
)
_CHARGRAM_DUCK = (
    "list_transform(range(1, greatest(length(text) - 2, 0) + 1),"
    " i -> substr(text, i, 3))"
)


@query(
    "j_chargram_confusion",
    oracle=f"""
    WITH cg AS (SELECT doc_id, unnest({_CHARGRAM_DUCK}) AS term FROM documents),
    dtf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
            FROM cg GROUP BY doc_id, term),
    langs AS (SELECT DISTINCT lang FROM documents),
    vocab AS (SELECT COUNT(DISTINCT term) AS v FROM cg),
    prof AS (SELECT lang, term, COUNT(*) AS cnt
             FROM (SELECT lang, unnest({_CHARGRAM_DUCK}) AS term FROM documents)
             GROUP BY lang, term),
    totals AS (SELECT lang, SUM(cnt) AS tot FROM prof GROUP BY lang),
    scores AS (
      SELECT dtf.doc_id, langs.lang AS cand,
             FLOOR((SUM(dtf.tf * ln((COALESCE(prof.cnt, 0) + 1.0)
                                    / (totals.tot + vocab.v))))
                   * 10000 + 0.5) / 10000 AS score
      FROM dtf CROSS JOIN langs CROSS JOIN vocab
      LEFT JOIN prof ON prof.lang = langs.lang AND prof.term = dtf.term
      JOIN totals ON totals.lang = langs.lang
      GROUP BY dtf.doc_id, langs.lang, vocab.v),
    pred AS (SELECT doc_id, cand AS pred_lang FROM (
               SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                            ORDER BY score DESC, cand) AS rk
               FROM scores) WHERE rk = 1)
    SELECT d.lang AS true_lang, p.pred_lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents d JOIN pred p USING (doc_id)
    GROUP BY d.lang, p.pred_lang
    """,
)
def j_chargram_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-TRIGRAM naive-Bayes lang-ID confusion matrix — the
    "char-n-gram upgrade" j_lang_confusion's docstring names as the
    production fix when word-unigram profiles conflate language pairs
    (Cavnar & Trenkle 1994, public: char n-grams survive tokenizer
    damage, code-switching and short inputs). Same add-one-smoothed
    scoring shape as j_lang_id with term = sliding 3-char window of
    the RAW text (punctuation and whitespace carry signal), so the two
    confusion matrices are directly comparable cell by cell — the
    model-selection diff is one join away.

    Determinism: both engines enumerate trigrams by absolute character
    position (empty below 3 chars); the score is the TF-WEIGHTED type
    sum Σ tf·ln(p) — a repeated trigram contributes one multiply, not
    tf additions, and both engines share the identical expression —
    rounded 1e-4 before the total-order (score desc, cand) argmax.

    Plan: trigram explode ≈ n_chars rows/doc, immediately collapsed by
    a (doc, trigram) hash agg with map-side partials, so the ×|langs|
    fan-out and the profile join run over TYPE rows, not occurrence
    rows (~2-3× fewer; the tf weighting is what makes that collapse
    exact). Profile stays |langs|·|trigram vocab| — SMALLER than the
    word profile (char-trigram space saturates) and broadcast; one
    doc-keyed score agg; ≤|langs|² output cells.

    Why the corpus is deliberately exploded more than once (r11 A/B,
    SCALE.md §4r): deriving profile+vocab from a persisted (doc, term,
    tf) frame — one explode — measured 8.5-10.6 s vs 4.6-5.0 s for
    this plan at sf0.1, and caching only the small profile measured
    5.5 s. The explode passes are read-only streaming maps fused with
    partial aggs (no added shuffle, no storage pressure); every cache
    variant pays materialization plus, for the dtf route, a
    corpus-wide doc_id shuffle for the doc→lang join. Re-reading the
    columnar text beats materializing its derivative."""
    t = load(spark, sf_dir)
    cg = spread(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.expr(_CHARGRAM_SPARK)).alias("term")
    )
    dtf = cg.groupBy("doc_id", "term").agg(F.count("*").cast("long").alias("tf"))
    langs = t.documents.select("lang").distinct()
    vocab = cg.agg(F.countDistinct("term").alias("v"))
    prof = (
        spread(spark, sf_dir, "documents").select("lang", F.explode(F.expr(_CHARGRAM_SPARK)).alias("term"))
        .groupBy("lang", "term")
        .agg(F.count("*").alias("cnt"))
    )
    totals = prof.groupBy("lang").agg(F.sum("cnt").alias("tot"))
    prof_t = F.broadcast(
        prof.join(totals, "lang").select(
            F.col("lang").alias("cand"), "term", "cnt", "tot"
        )
    )
    totals_b = F.broadcast(totals.select(F.col("lang").alias("cand"), "tot"))
    scores = (
        dtf.crossJoin(F.broadcast(langs.select(F.col("lang").alias("cand"))))
        .join(prof_t, ["cand", "term"], "left")
        .drop("tot")
        .join(totals_b, "cand")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id", "cand")
        .agg(
            rnd(
                F.sum(
                    F.col("tf")
                    * F.log(
                        (F.coalesce(F.col("cnt"), F.lit(0)) + 1.0)
                        / (F.col("tot") + F.col("v"))
                    )
                ),
                4,
            ).alias("score")
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("cand"))
    pred = (
        scores.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("doc_id", F.col("cand").alias("pred_lang"))
    )
    truth = t.documents.select("doc_id", F.col("lang").alias("true_lang"))
    return truth.join(pred, "doc_id").groupBy("true_lang", "pred_lang").agg(
        F.count("*").cast("long").alias("n_docs")
    )


_BLEU_PAIR_BIGRAMS = """
    SELECT doc_id,
           unnest(list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
                                 i -> toks[i] || ' ' || toks[i+1])) AS term
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
"""


@query(
    "j_bleu_precision",
    oracle=f"""
    WITH pairs AS (SELECT cand_doc, ref_doc FROM (
              SELECT doc_id AS cand_doc,
                     LEAD(doc_id) OVER (PARTITION BY lang, source
                                        ORDER BY doc_id) AS ref_doc
              FROM documents) x WHERE ref_doc IS NOT NULL),
    u AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
    uc AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS c
           FROM u GROUP BY doc_id, term),
    bg AS ({_BLEU_PAIR_BIGRAMS}),
    bc AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS c
           FROM bg GROUP BY doc_id, term),
    t1 AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n FROM uc GROUP BY doc_id),
    t2 AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n FROM bc GROUP BY doc_id),
    clip1 AS (SELECT p.cand_doc,
                     CAST(SUM(LEAST(a.c, b.c)) AS BIGINT) AS clip
              FROM pairs p
              JOIN uc a ON a.doc_id = p.cand_doc
              JOIN uc b ON b.doc_id = p.ref_doc AND b.term = a.term
              GROUP BY p.cand_doc),
    clip2 AS (SELECT p.cand_doc,
                     CAST(SUM(LEAST(a.c, b.c)) AS BIGINT) AS clip
              FROM pairs p
              JOIN bc a ON a.doc_id = p.cand_doc
              JOIN bc b ON b.doc_id = p.ref_doc AND b.term = a.term
              GROUP BY p.cand_doc)
    SELECT p.cand_doc, p.ref_doc,
           t1.n AS n1, COALESCE(clip1.clip, 0) AS clip1,
           t2.n AS n2, COALESCE(clip2.clip, 0) AS clip2,
           CASE WHEN t1.n = 0 THEN 0.0
                ELSE CAST(COALESCE(clip1.clip, 0) * 1000000 // t1.n AS BIGINT)
                     / 1000000.0 END AS p1,
           CASE WHEN t2.n = 0 THEN 0.0
                ELSE CAST(COALESCE(clip2.clip, 0) * 1000000 // t2.n AS BIGINT)
                     / 1000000.0 END AS p2
    FROM pairs p
    JOIN t1 ON t1.doc_id = p.cand_doc
    JOIN t2 ON t2.doc_id = p.cand_doc
    LEFT JOIN clip1 ON clip1.cand_doc = p.cand_doc
    LEFT JOIN clip2 ON clip2.cand_doc = p.cand_doc
    """,
)
def j_bleu_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modified (clipped) n-gram precision between adjacent same-slice
    documents — BLEU's p₁/p₂ core (Papineni et al. 2002, public)
    repurposed as a paraphrase/boilerplate-similarity score: each doc
    scores against the NEXT doc_id in its (lang, source) slice (LEAD
    over the slice order — a deterministic stand-in for any candidate
    pairing), p_n = Σ_g min(c_cand(g), c_ref(g)) / Σ_g c_cand(g).
    MULTISET semantics — where j_dedup_containment compares distinct
    shingle SETS, clipping counts repeated phrases the way templated
    spam actually repeats them; high p2 with moderate p1 is the
    reordered-boilerplate signature. (Brevity penalty omitted: exp()
    at query time is the libm parity risk the conventions ban; p1/p2
    plus both lengths carry the same information.)

    Exactness: all counts BIGINT; each precision is ONE non-negative
    scaled floor-division (`div` == `//`) displayed by an exact /1e6.

    Plan: the pairing is one LEAD window over the slim (doc_id, lang,
    source) projection, partition-bounded per slice; per-doc n-gram
    counts shuffle once keyed (doc_id, term) and each clip is a
    (doc-pair, term) equi-join feeding a cand-keyed agg — every key is
    bounded by one document's gram set.
    At 100 TB the neighbor pairing generalizes to any (cand, ref)
    candidate relation (e.g. j_dedup_near's survivors) unchanged."""
    from .quality import ngrams_col

    t = load(spark, sf_dir)
    wp = Window.partitionBy("lang", "source").orderBy("doc_id")
    pairs = (
        t.documents.select(
            F.col("doc_id").alias("cand_doc"),
            F.lead("doc_id").over(wp).alias("ref_doc"),
        )
        .where(F.col("ref_doc").isNotNull())
    )
    uc = (
        spread(spark, sf_dir, "documents").select("doc_id", F.explode(tokens_col("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("c"))
    )
    bc = (
        spread(spark, sf_dir, "documents").select("doc_id", F.explode(ngrams_col("text", 2)).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("c"))
    )

    def clip(counts):
        ca, cb = counts.alias("ca"), counts.alias("cb")
        return (
            pairs.join(ca, F.col("ca.doc_id") == F.col("cand_doc"))
            .join(
                cb,
                (F.col("cb.doc_id") == F.col("ref_doc"))
                & (F.col("cb.term") == F.col("ca.term")),
            )
            .groupBy("cand_doc")
            .agg(F.sum(F.least(F.col("ca.c"), F.col("cb.c"))).cast("long").alias("clip"))
        )

    t1 = uc.groupBy("doc_id").agg(F.sum("c").cast("long").alias("n1"))
    t2 = bc.groupBy("doc_id").agg(F.sum("c").cast("long").alias("n2"))
    out = (
        pairs.join(t1, F.col("doc_id") == F.col("cand_doc"))
        .drop("doc_id")
        .join(t2, F.col("doc_id") == F.col("cand_doc"))
        .drop("doc_id")
        .join(clip(uc).withColumnRenamed("clip", "clip1"), "cand_doc", "left")
        .join(clip(bc).withColumnRenamed("clip", "clip2"), "cand_doc", "left")
        .select(
            "cand_doc",
            "ref_doc",
            "n1",
            F.coalesce("clip1", F.lit(0)).cast("long").alias("clip1"),
            "n2",
            F.coalesce("clip2", F.lit(0)).cast("long").alias("clip2"),
            F.when(F.col("n1") == 0, F.lit(0.0))
            .otherwise(
                F.expr("COALESCE(clip1, CAST(0 AS BIGINT)) * 1000000 div n1")
                / F.lit(1000000.0)
            )
            .alias("p1"),
            F.when(F.col("n2") == 0, F.lit(0.0))
            .otherwise(
                F.expr("COALESCE(clip2, CAST(0 AS BIGINT)) * 1000000 div n2")
                / F.lit(1000000.0)
            )
            .alias("p2"),
        )
    )
    return out


def _ndcg_oracle() -> str:
    from ..registry import ORACLE

    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
    exact AS (SELECT vec_id,
                     ROW_NUMBER() OVER (ORDER BY score DESC, vec_id) AS re
              FROM (SELECT vec_id,
                           FLOOR(list_dot_product(v, qv) * 1000000 + 0.5) / 1000000
                             AS score
                    FROM e, q WHERE vec_id <> 0
                    ORDER BY score DESC, vec_id LIMIT {_PQ_TOPK}) x),
    approx AS (SELECT vec_id,
                      ROW_NUMBER() OVER (ORDER BY score DESC, vec_id) AS ra
               FROM ({ORACLE["j_ann_pq"]}) y),
    gains AS (SELECT a.ra,
                     COALESCE({_PQ_TOPK} + 1 - e2.re, 0) AS g
              FROM approx a LEFT JOIN exact e2 ON e2.vec_id = a.vec_id),
    grid AS (SELECT CAST(unnest(range(1, {_PQ_TOPK} + 1)) AS BIGINT) AS k),
    dcg AS (SELECT g2.k,
                   COALESCE(SUM(gains.g / ln(1.0 + gains.ra)), 0) AS dcg,
                   CAST(COALESCE(SUM(gains.g), 0) AS BIGINT) AS gain_mass
            FROM grid g2 LEFT JOIN gains ON gains.ra <= g2.k
            GROUP BY g2.k),
    ideal AS (SELECT g2.k,
                     SUM(({_PQ_TOPK} + 1 - i.i) / ln(1.0 + i.i)) AS idcg
              FROM grid g2
              JOIN (SELECT CAST(unnest(range(1, {_PQ_TOPK} + 1)) AS BIGINT) AS i) i
                ON i.i <= g2.k
              GROUP BY g2.k)
    SELECT d.k, d.gain_mass,
           FLOOR(d.dcg / i.idcg * 1000000 + 0.5) / 1000000 AS ndcg
    FROM dcg d JOIN ideal i USING (k)
    """


@query("j_ndcg", oracle=_ndcg_oracle())
def j_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@k curve (k = 1..{k}) of the PQ ADC ranking against graded
    relevance DERIVED from the exact ranking (gain of the item at
    exact rank r is {k}+1−r, 0 outside the exact top-{k}) — the
    position-weighted companion to j_recall_curve: recall counts set
    overlap per prefix; NDCG (Järvelin & Kekäläinen 2002, public)
    additionally charges the approximate index for SHUFFLING the head
    — a PQ ranking can hold recall@10 = 1.0 while NDCG@1 collapses,
    which is exactly the "re-rank shortlist too small" signature.

    Determinism: both rankings order by (rounded score desc, vec_id) —
    total orders; gains are exact integers; 1/ln(1+i) evaluates on
    identical small integers in both engines, and the ≤{k}-term DCG
    sums round 1e-6 at display. Ideal DCG is a pure function of the
    k-grid (the exact top-{k} has all {k} graded items by
    construction), so ndcg ≤ 1 with equality iff the prefix order
    agrees.

    Plan: both legs are the registered ≤{k}-row relations
    (j_recall_curve's construction — the exact TakeOrdered leg and the
    j_ann_pq plan verbatim); every join after is metadata vs the
    literal k-grid."""
    from ..operators.similarity import _lit_vector
    from ..registry import QUERIES

    t = load(spark, sf_dir)
    # query vector: driver-side memoized metadata read (similarity.query_vector)
    qlit = _lit_vector(list(query_vector(sf_dir)))
    w = Window.orderBy(F.col("score").desc(), F.col("vec_id").asc())
    exact = (
        t.embeddings.where(F.col("vec_id") != 0)
        .select("vec_id", rnd(dot_expr(as_double("embedding"), qlit), 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col("vec_id").asc())
        .limit(_PQ_TOPK)
        .select("vec_id", F.row_number().over(w).cast("long").alias("re"))
    )
    ap = (
        QUERIES["j_ann_pq"](spark, sf_dir)
        .select("vec_id", "score")
        .select("vec_id", F.row_number().over(w).cast("long").alias("ra"))
    )
    gains = ap.join(exact, "vec_id", "left").select(
        "ra",
        F.coalesce(F.lit(_PQ_TOPK) + 1 - F.col("re"), F.lit(0)).cast("long").alias("g"),
    )
    grid = spark.range(1, _PQ_TOPK + 1).select(F.col("id").cast("long").alias("k"))
    dcg = (
        F.broadcast(grid)
        .join(gains, F.col("ra") <= F.col("k"), "left")
        .groupBy("k")
        .agg(
            F.coalesce(F.sum(F.col("g") / F.log(1.0 + F.col("ra"))), F.lit(0.0)).alias(
                "dcg"
            ),
            F.coalesce(F.sum("g"), F.lit(0)).cast("long").alias("gain_mass"),
        )
    )
    igrid = spark.range(1, _PQ_TOPK + 1).select(F.col("id").cast("long").alias("i"))
    ideal = (
        F.broadcast(grid)
        .join(igrid, F.col("i") <= F.col("k"))
        .groupBy("k")
        .agg(
            F.sum((F.lit(_PQ_TOPK) + 1 - F.col("i")) / F.log(1.0 + F.col("i"))).alias(
                "idcg"
            )
        )
    )
    return dcg.join(ideal, "k").select(
        "k", "gain_mass", rnd(F.col("dcg") / F.col("idcg"), 6).alias("ndcg")
    )


j_ndcg.__doc__ = j_ndcg.__doc__.replace("{k}", str(_PQ_TOPK))


# Calibration protocol: the first _ECE_NQ vectors query the rest; the
# top-_ECE_K neighbor vote count IS the confidence bin (v/K), so the
# reliability diagram needs no float binning at all.
_ECE_NQ = 200
_ECE_K = 10


def _ece_votes(t, sf_dir: str) -> DataFrame:
    """Spark twin of _ECE_VOTES_CTES: the (qid, qlabel, label, v) kNN
    vote distribution over the _ECE_NQ-query panel, via the Arrow
    batch-partial top-k kernel (see j_ece_calibration's docstring for
    the boundary argument; the panel collect is documented index
    metadata, the literal-centroid contract)."""
    # panel: driver-side memoized metadata read (similarity.query_panel)
    qrows = query_panel(sf_dir, _ECE_NQ, with_label=True)
    qids_l = [vid for vid, _, _ in qrows]
    qlabels_l = [lab for _, lab, _ in qrows]
    qmat = [list(emb) for _, _, emb in qrows]
    from ..operators.similarity import topk_scores_arrow

    part = topk_scores_arrow(
        t.embeddings.where(F.col("vec_id") >= _ECE_NQ), qmat, qids_l, _ECE_K
    )
    qlab = F.create_map(
        *[x for qid_, lab in zip(qids_l, qlabels_l) for x in (F.lit(qid_), F.lit(lab))]
    )
    wr = Window.partitionBy("qid").orderBy(F.col("s6").desc(), F.col("vec_id").asc())
    nn = (
        part.withColumn("rk", F.row_number().over(wr))
        .where(F.col("rk") <= _ECE_K)
        .select("qid", qlab[F.col("qid")].alias("qlabel"), "label")
    )
    return nn.groupBy("qid", "qlabel", "label").agg(
        F.count("*").cast("long").alias("v")
    )


# The kNN vote distribution per query — shared by j_ece_calibration
# (reliability diagram over argmax confidence) and j_brier_score (the
# proper-scoring-rule sum over the WHOLE distribution).
_ECE_VOTES_CTES = f"""q AS (SELECT vec_id AS qid, label AS qlabel,
                      CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id < {_ECE_NQ}),
    s AS (SELECT q.qid, q.qlabel, e.vec_id, e.label,
                 FLOOR(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)
                       * 1000000 + 0.5) / 1000000 AS score
          FROM embeddings e CROSS JOIN q WHERE e.vec_id >= {_ECE_NQ}),
    nn AS (SELECT qid, qlabel, label FROM (
             SELECT qid, qlabel, label,
                    ROW_NUMBER() OVER (PARTITION BY qid
                                       ORDER BY score DESC, vec_id) AS rk
             FROM s) WHERE rk <= {_ECE_K}),
    votes AS (SELECT qid, qlabel, label, CAST(COUNT(*) AS BIGINT) AS v
              FROM nn GROUP BY qid, qlabel, label)"""


@query(
    "j_ece_calibration",
    oracle=f"""
    WITH {_ECE_VOTES_CTES},
    pred AS (SELECT qid, qlabel, label AS plabel, v FROM (
               SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                            ORDER BY v DESC, label) AS rk
               FROM votes) WHERE rk = 1)
    SELECT v AS votes,
           FLOOR(v * 1.0 / {_ECE_K} * 1000000 + 0.5) / 1000000 AS confidence,
           CAST(COUNT(*) AS BIGINT) AS n_queries,
           CAST(SUM(CASE WHEN plabel = qlabel THEN 1 ELSE 0 END) AS BIGINT)
             AS n_correct,
           FLOOR(SUM(CASE WHEN plabel = qlabel THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*) * 1000000 + 0.5) / 1000000 AS accuracy,
           FLOOR(abs(SUM(CASE WHEN plabel = qlabel THEN 1 ELSE 0 END) * 1.0
                     / COUNT(*) - v * 1.0 / {_ECE_K}) * COUNT(*)
                 / {_ECE_NQ} * 1000000 + 0.5) / 1000000 AS ece_term
    FROM pred GROUP BY v
    """,
)
def j_ece_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram + expected-calibration-error terms for the
    kNN label classifier (Naeini et al. 2015 for ECE, public): each of
    the {nq} query vectors takes its top-{kk} neighbor majority vote;
    the VOTE COUNT is the confidence bin (v/{kk} — no float binning,
    the bins are exact integers by construction), and each bin reports
    accuracy vs stated confidence plus its weighted ECE term
    (Σ ece_term = the scalar ECE). An over-confident retrieval
    classifier (acc ≪ conf at high v) means label noise or duplicate
    leakage between query and candidate sets — the calibration
    companion to j_knn_confusion (which classes confuse) and
    j_selective_accuracy (where to abstain).

    Determinism: neighbor rank is (1e-6-floored scaled score desc,
    vec_id); the majority vote breaks ties (v desc, label) — total
    orders; every count is BIGINT; ratios round 1e-6 at display.

    Engine path (the j_pq_distortion boundary rule, SCALE.md §4q):
    the {nq}×corpus scoring fan-out runs ~{nq}·N interpreted
    Catalyst-HOF lambda steps per dim if written as the broadcast
    crossJoin — past the ~10^6-step line at any real scale. It is
    instead ONE Arrow-batched numpy kernel whose per-dim accumulation
    replays the dot_expr LEFT-FOLD order (bit-identical doubles, so
    the DuckDB oracle is UNCHANGED), and which emits only each
    batch's per-query top-{kk} under the (s6 desc, vec_id) total
    order — a sound partial top-k: a row outside its batch's top-{kk}
    cannot be in the global top-{kk} under the same order. The
    corpus never leaves the map stage; ≤ {nq}·{kk} rows per batch do.

    Plan: narrow Arrow map (queries are a documented {nq}-row driver
    collect of index metadata, shipped as a closure literal like
    every trainer model) → ONE qid exchange over partial-top rows →
    final top-{kk} window, votes, argmax, ≤{kk}-bin rollup — all
    metadata-scale. At 100 TB the candidate leg is the ANN shortlist
    and this exact form audits it on sampled queries."""
    t = load(spark, sf_dir)
    votes = _ece_votes(t, sf_dir)
    wv = Window.partitionBy("qid").orderBy(F.col("v").desc(), F.col("label").asc())
    pred = (
        votes.withColumn("rk", F.row_number().over(wv))
        .where(F.col("rk") == 1)
        .select("qid", "qlabel", F.col("label").alias("plabel"), "v")
    )
    correct = F.sum(F.when(F.col("plabel") == F.col("qlabel"), 1).otherwise(0))
    return pred.groupBy(F.col("v").alias("votes")).agg(
        rnd(F.first("v") * 1.0 / _ECE_K, 6).alias("confidence"),
        F.count("*").cast("long").alias("n_queries"),
        correct.cast("long").alias("n_correct"),
        rnd(correct * 1.0 / F.count("*"), 6).alias("accuracy"),
        rnd(
            F.abs(correct * 1.0 / F.count("*") - F.first("v") * 1.0 / _ECE_K)
            * F.count("*")
            / F.lit(_ECE_NQ),
            6,
        ).alias("ece_term"),
    )


j_ece_calibration.__doc__ = (
    j_ece_calibration.__doc__.replace("{nq}", str(_ECE_NQ)).replace(
        "{kk}", str(_ECE_K)
    )
)


@query(
    "j_brier_score",
    oracle=f"""
    WITH {_ECE_VOTES_CTES},
    per AS (SELECT qid, qlabel,
                   CAST(SUM(v * v) AS BIGINT) AS vsq,
                   CAST(SUM(CASE WHEN label = qlabel THEN v ELSE 0 END)
                        AS BIGINT) AS vt
            FROM votes GROUP BY qid, qlabel),
    b AS (SELECT qid, qlabel,
                 vsq - 2 * {_ECE_K} * vt + {_ECE_K * _ECE_K} AS bq
          FROM per)
    SELECT qlabel AS true_label,
           CAST(COUNT(*) AS BIGINT) AS n_queries,
           CAST(SUM(bq) AS BIGINT) AS brier_sum_scaled,
           FLOOR(SUM(bq) * 1.0 / (COUNT(*) * {_ECE_K * _ECE_K})
                 * 1000000 + 0.5) / 1000000 AS brier
    FROM b GROUP BY qlabel
    """,
)
def j_brier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiclass Brier score of the kNN vote classifier, per true
    label (Brier 1950, public — the PROPER scoring rule ECE is not):
    ECE only sees the argmax confidence, so a classifier that spreads
    wrong votes across labels scores the same as one that concentrates
    them; Brier charges the whole vote distribution,
    Σ_labels (p_l − [l = truth])². Per-label decomposition localizes
    which classes the retrieval classifier is sharply wrong about —
    the proper-scoring companion to j_ece_calibration (same panel,
    same votes) and j_knn_confusion (which classes).

    EXACT integers end-to-end: with p_l = v_l/K the per-query Brier
    scales to K²·B = Σv² − 2·K·v_truth + K² — pure BIGINT arithmetic
    over the vote counts (labels with no votes contribute only the
    constant, absorbed by K²). The only float is the display division,
    floored 1e-6.

    Plan: reuses the _ece_votes Arrow batch-partial top-k pipeline
    (corpus never leaves the map stage; ≤ nq·K rows shuffle); the
    Brier rollup is two metadata-scale hash aggs over ≤ nq·|labels|
    vote rows."""
    t = load(spark, sf_dir)
    votes = _ece_votes(t, sf_dir)
    per = votes.groupBy("qid", "qlabel").agg(
        F.sum(F.col("v") * F.col("v")).cast("long").alias("vsq"),
        F.sum(F.when(F.col("label") == F.col("qlabel"), F.col("v")).otherwise(0))
        .cast("long")
        .alias("vt"),
    )
    bq = F.col("vsq") - 2 * _ECE_K * F.col("vt") + F.lit(_ECE_K * _ECE_K)
    b = per.select("qid", "qlabel", bq.alias("bq"))
    return b.groupBy(F.col("qlabel").alias("true_label")).agg(
        F.count("*").cast("long").alias("n_queries"),
        F.sum("bq").cast("long").alias("brier_sum_scaled"),
        rnd(
            F.sum("bq") * 1.0 / (F.count("*") * F.lit(_ECE_K * _ECE_K)), 6
        ).alias("brier"),
    )


def _rank_tau_oracle() -> str:
    from ..registry import ORACLE

    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
    exact AS (SELECT vec_id,
                     ROW_NUMBER() OVER (ORDER BY score DESC, vec_id) AS re
              FROM (SELECT vec_id,
                           FLOOR(list_dot_product(v, qv) * 1000000 + 0.5) / 1000000
                             AS score
                    FROM e, q WHERE vec_id <> 0
                    ORDER BY score DESC, vec_id LIMIT {_PQ_TOPK}) x),
    approx AS (SELECT vec_id,
                      ROW_NUMBER() OVER (ORDER BY score DESC, vec_id) AS ra
               FROM ({ORACLE["j_ann_pq"]}) y),
    p AS (SELECT e2.re, a.ra FROM exact e2 JOIN approx a USING (vec_id)),
    pairs AS (SELECT CAST(SUM(CASE WHEN (a.re - b.re) * (a.ra - b.ra) > 0
                                   THEN 1 ELSE 0 END) AS BIGINT) AS conc,
                     CAST(SUM(CASE WHEN (a.re - b.re) * (a.ra - b.ra) < 0
                                   THEN 1 ELSE 0 END) AS BIGINT) AS disc,
                     CAST(COUNT(*) AS BIGINT) AS npairs
              FROM p a JOIN p b ON a.re < b.re),
    sp AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(SUM((re - ra) * (re - ra)) AS BIGINT) AS d2
           FROM p)
    SELECT sp.n AS n_common, pairs.conc AS concordant, pairs.disc AS discordant,
           CASE WHEN sp.n < 2 THEN NULL
                ELSE FLOOR((pairs.conc - pairs.disc) * 1.0 / pairs.npairs
                           * 1000000 + 0.5) / 1000000 END AS kendall_tau,
           CASE WHEN sp.n < 2 THEN NULL
                ELSE FLOOR((1.0 - 6.0 * sp.d2 / (sp.n * (sp.n * sp.n - 1)))
                           * 1000000 + 0.5) / 1000000 END AS spearman_rho
    FROM sp CROSS JOIN pairs
    """


@query("j_rank_tau", oracle=_rank_tau_oracle())
def j_rank_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-correlation audit of the PQ ADC ranking against the exact
    ranking over their COMMON top-{k} items: Kendall τ-a (concordant −
    discordant over all pairs — every pair the approximate index
    swaps costs 2/n(n−1)) and Spearman ρ (1 − 6Σd²/n(n²−1)) in one
    row. j_recall_curve asks "are the right items present", j_ndcg
    asks "is the head ordered"; τ/ρ ask "how scrambled is the whole
    permutation" — the single-number agreement stat to trend per
    index rebuild (Kendall 1938 / Spearman 1904, public).

    EXACT integers end-to-end: both ranks are row_numbers over
    (rounded score desc, vec_id) total orders; concordance signs,
    pair counts, and Σd² are BIGINT; each statistic is ONE display
    division (NULL below 2 common items, where neither is defined).

    Plan: both legs are the registered ≤{k}-row relations; the pair
    self-join is over ≤{k} metadata rows (≤45 pairs) — free at any
    corpus scale."""
    from ..operators.similarity import _lit_vector
    from ..registry import QUERIES

    t = load(spark, sf_dir)
    # query vector: driver-side memoized metadata read (similarity.query_vector)
    qlit = _lit_vector(list(query_vector(sf_dir)))
    w = Window.orderBy(F.col("score").desc(), F.col("vec_id").asc())
    exact = (
        t.embeddings.where(F.col("vec_id") != 0)
        .select("vec_id", rnd(dot_expr(as_double("embedding"), qlit), 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col("vec_id").asc())
        .limit(_PQ_TOPK)
        .select("vec_id", F.row_number().over(w).cast("long").alias("re"))
    )
    ap = (
        QUERIES["j_ann_pq"](spark, sf_dir)
        .select("vec_id", "score")
        .select("vec_id", F.row_number().over(w).cast("long").alias("ra"))
    )
    p = exact.join(ap, "vec_id").select("re", "ra")
    a, b = p.alias("a"), p.alias("b")
    sgn = (F.col("a.re") - F.col("b.re")) * (F.col("a.ra") - F.col("b.ra"))
    pairs = a.join(b, F.col("a.re") < F.col("b.re")).agg(
        F.sum(F.when(sgn > 0, 1).otherwise(0)).cast("long").alias("conc"),
        F.sum(F.when(sgn < 0, 1).otherwise(0)).cast("long").alias("disc"),
        F.count("*").cast("long").alias("npairs"),
    )
    sp = p.agg(
        F.count("*").cast("long").alias("n"),
        F.sum((F.col("re") - F.col("ra")) * (F.col("re") - F.col("ra")))
        .cast("long")
        .alias("d2"),
    )
    n = F.col("n")
    return sp.crossJoin(pairs).select(
        n.alias("n_common"),
        F.col("conc").alias("concordant"),
        F.col("disc").alias("discordant"),
        F.when(n < 2, F.lit(None).cast("double"))
        .otherwise(rnd((F.col("conc") - F.col("disc")) * 1.0 / F.col("npairs"), 6))
        .alias("kendall_tau"),
        F.when(n < 2, F.lit(None).cast("double"))
        .otherwise(rnd(1.0 - 6.0 * F.col("d2") / (n * (n * n - 1)), 6))
        .alias("spearman_rho"),
    )


j_rank_tau.__doc__ = j_rank_tau.__doc__.replace("{k}", str(_PQ_TOPK))


def _norm_audit_oracle() -> str:
    rows = _centroid_values_sql()
    return f"""
    WITH cents(cid, cv) AS (VALUES {rows}),
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    scored AS (SELECT e.vec_id, e.v, c.cid,
                      list_dot_product(e.v, cv) AS s
               FROM e CROSS JOIN cents c),
    assigned AS (SELECT vec_id, v, cid AS cluster_id, s FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                     ORDER BY s DESC, cid) AS rk
        FROM scored) WHERE rk = 1),
    n AS (SELECT vec_id, cluster_id,
                 sqrt(list_dot_product(v, v)) AS nrm, s
          FROM assigned)
    SELECT CAST(cluster_id AS BIGINT) AS cluster_id,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           FLOOR(AVG(nrm) * 1000000 + 0.5) / 1000000 AS mean_norm,
           FLOOR(MIN(nrm) * 1000000 + 0.5) / 1000000 AS min_norm,
           FLOOR(MAX(nrm) * 1000000 + 0.5) / 1000000 AS max_norm,
           FLOOR(AVG(s / nrm) * 1000000 + 0.5) / 1000000 AS mean_cos,
           CAST(SUM(CASE WHEN nrm < 0.5 OR nrm > 2.0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outlier_norm
    FROM n GROUP BY cluster_id
    """


@query("j_embed_norm_audit", oracle=_norm_audit_oracle())
def j_embed_norm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-health audit per IVF cluster: member count, norm
    statistics (mean/min/max + a count outside the [0.5, 2.0] sanity
    band), and mean cosine to the assigned centroid — the table an
    index operator checks when recall drifts. Near-zero or exploding
    norms mean upstream encoder damage (dead inputs, fp16 overflow);
    a cluster whose mean cosine sags is a diffuse cluster the
    quantizer should split (the geometric companion to
    j_cluster_purity's label view and j_pq_distortion's subspace
    view — the three triangulate WHERE index quality leaks).

    Determinism: assignment is the same argmax-dot / smallest-cid
    total order as every IVF qid; norm = sqrt(dot(v,v)) and cos =
    s/norm are per-row folds on identical doubles in both engines;
    the per-cluster float aggs round 1e-6 at display and the outlier
    band compares per-row bit-identical values against literal
    thresholds.

    Plan: zero-shuffle literal-matrix assignment map (text/vector
    never reshuffles), ONE (cluster_id) hash agg with map-side
    partials — ≤k output rows at any corpus scale; at 100 TB this
    rides the same scan that writes the partition key."""
    from ..operators.similarity import ivf_assign, kmeans_train_local

    t = load(spark, sf_dir)
    cents = kmeans_train_local(sf_dir, k=_IVF_K, iters=_IVF_ITERS)
    assigned, _ = ivf_assign(t.embeddings, k_clusters=_IVF_K, cents=cents)
    v = as_double("embedding")
    n = assigned.select(
        "cluster_id",
        F.sqrt(dot_expr(v, v)).alias("nrm"),
        F.col("cscore").alias("s"),
    )
    return n.groupBy(F.col("cluster_id").cast("long").alias("cluster_id")).agg(
        F.count("*").cast("long").alias("n_vecs"),
        rnd(F.avg("nrm"), 6).alias("mean_norm"),
        rnd(F.min("nrm"), 6).alias("min_norm"),
        rnd(F.max("nrm"), 6).alias("max_norm"),
        rnd(F.avg(F.col("s") / F.col("nrm")), 6).alias("mean_cos"),
        F.sum(F.when((F.col("nrm") < 0.5) | (F.col("nrm") > 2.0), 1).otherwise(0))
        .cast("long")
        .alias("n_outlier_norm"),
    )


def _logreg_model():
    import os

    from ..operators.similarity import logreg_train_local

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
    return logreg_train_local(sf_dir)


def _logreg_score_sql(nt: str, dr: str, ml: str) -> str:
    """The shared scoring expression: identical literal text rendered
    into BOTH engines, so every float op runs in the same sequence on
    the same doubles (the _lit_matrix repr/CAST discipline)."""
    (w0, w1, w2, w3), (m1, m2, m3), (s1, s2, s3) = _logreg_model()

    def d(x: float) -> str:
        return f"CAST('{x!r}' AS DOUBLE)"

    return (
        f"({d(w0)} + {d(w1)} * (({nt}) - {d(m1)}) / {d(s1)}"
        f" + {d(w2)} * (({dr}) - {d(m2)}) / {d(s2)}"
        f" + {d(w3)} * (({ml}) - {d(m3)}) / {d(s3)})"
    )


def _logreg_oracle() -> str:
    z = _logreg_score_sql(
        "CAST(nt AS DOUBLE)", "CAST(nd AS DOUBLE) / nt",
        "CAST(length(text) - (nt - 1) AS DOUBLE) / nt"
    )
    return f"""
    WITH f AS (SELECT lang, text,
                      CAST(len(string_split(text, ' ')) AS BIGINT) AS nt,
                      CAST(len(list_distinct(string_split(text, ' ')))
                           AS BIGINT) AS nd
               FROM documents),
    p AS (SELECT lang,
                 FLOOR((1.0 / (1.0 + exp(-{z}))) * 1000000 + 0.5) / 1000000
                   AS p
          FROM f)
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           FLOOR(AVG(p) * 1000000 + 0.5) / 1000000 AS mean_score,
           CAST(SUM(CASE WHEN p >= 0.5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pred_en,
           FLOOR(SUM(CASE WHEN (p >= 0.5) = (lang = 'en') THEN 1 ELSE 0 END)
                 * 1.0 / COUNT(*) * 1000000 + 0.5) / 1000000 AS accuracy
    FROM p GROUP BY lang
    """


@query("j_logreg_quality", oracle=_logreg_oracle())
def j_logreg_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic-regression text classifier scored over the corpus —
    the trainer-discipline extended from retrieval models (kmeans /
    PQ / PCA) to CLASSIFICATION: a 10-float model (weights +
    standardization constants) trains driver-side by deterministic
    fixed-round gradient descent on a bounded sample
    (logreg_train_local), enters BOTH engines as repr/CAST literals,
    and the distributed pass is pure scoring. Target here is
    lang=='en' from three cheap text statistics (token count,
    distinct-token ratio, mean token length) — the same shape as a
    fastText-style quality filter (Joulin et al. 2016, public), whose
    per-lang score/accuracy table this qid reports (weak features are
    the point: the table SHOWS what the cheap model can and cannot
    separate, per slice, before anyone trusts it as a filter).

    Determinism: the scoring expression is ONE shared literal string
    (identical op sequence both engines); features are exact
    integers/ratios of them; p rounds 1e-6 BEFORE the 0.5 threshold
    so the decision compares rounded values (the j_semdedup rule).

    Plan: one narrow map (split/distinct per row — text never leaves
    the scan) + ONE lang-keyed hash agg with map-side partials;
    |langs| output rows at any corpus size. At 100 TB the score is
    computed at write time as a quality column (j_quality_score's
    deployment note)."""
    t = load(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    f = t.documents.select(
        "lang",
        "text",
        F.size(toks).cast("long").alias("nt"),
        F.size(F.array_distinct(toks)).cast("long").alias("nd"),
    )
    z = _logreg_score_sql(
        "CAST(nt AS DOUBLE)",
        "CAST(nd AS DOUBLE) / nt",
        "CAST(length(text) - (nt - 1) AS DOUBLE) / nt",
    )
    p = f.select(
        "lang", rnd(F.lit(1.0) / (F.lit(1.0) + F.expr(f"exp(-{z})")), 6).alias("p")
    )
    pred_en = F.col("p") >= 0.5
    is_en = F.col("lang") == "en"
    return p.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        rnd(F.avg("p"), 6).alias("mean_score"),
        F.sum(F.when(pred_en, 1).otherwise(0)).cast("long").alias("n_pred_en"),
        rnd(
            F.sum(F.when(pred_en == is_en, 1).otherwise(0)) * 1.0 / F.count("*"), 6
        ).alias("accuracy"),
    )


@query(
    "j_embed_mmd",
    oracle="""
    WITH flat AS (
      SELECT label,
             generate_subscripts(embedding, 1) AS dim,
             unnest(CAST(embedding AS DOUBLE[])) AS x
      FROM embeddings),
    acc AS (SELECT label, dim,
                   SUM(CAST(FLOOR(x * 1000000000 + 0.5) AS BIGINT)) AS s9,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM flat GROUP BY label, dim),
    mu AS (SELECT label, dim, n,
                  CAST(CASE WHEN ((2 * s9 + 1000 * n) % (2000 * n)) < 0
                       THEN ((2 * s9 + 1000 * n) // (2000 * n)) - 1
                       ELSE  (2 * s9 + 1000 * n) // (2000 * n)
                       END AS BIGINT) AS m6
           FROM acc),
    sz AS (SELECT label, CAST(MAX(n) AS BIGINT) AS n FROM mu GROUP BY label),
    pair AS (SELECT a.label AS label_a, b.label AS label_b,
                    CAST(SUM((a.m6 - b.m6) * (a.m6 - b.m6)) AS BIGINT)
                      AS mmd2_s12
             FROM mu a JOIN mu b ON a.dim = b.dim AND a.label < b.label
             GROUP BY a.label, b.label)
    SELECT p.label_a, p.label_b, za.n AS n_a, zb.n AS n_b, p.mmd2_s12,
           FLOOR(p.mmd2_s12 / 1000000.0 + 0.5) / 1000000.0 AS mmd2
    FROM pair p
    JOIN sz za ON za.label = p.label_a
    JOIN sz zb ON zb.label = p.label_b
    """,
)
def j_embed_mmd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-kernel Maximum Mean Discrepancy between every pair of
    label groups in embedding space: MMD²_linear = ||μ_a − μ_b||²
    (Gretton et al. 2012, public — for the linear kernel the witness
    collapses to the mean difference), the two-sample drift statistic
    for EMBEDDINGS that j_ks_lengths/j_wasserstein_lengths are for
    scalar columns. A pair whose MMD² sits near zero is one merged
    mode (labels the encoder cannot separate — j_knn_confusion will
    show the symptom from the classifier side); the matrix is the
    embedding-space companion to j_vocab_jaccard_sources' lexical
    source similarity.

    EXACT end to end, order-free: each ELEMENT quantizes to the 1e-9
    scaled-BIGINT grid first (floor(x·1e9 + 0.5) — one deterministic
    per-value double op, identical on both engines), the per-(label,
    dim) sum s9 runs in exact integer arithmetic (DECIMAL(38,0) ↔
    HUGEINT, overflow-free past 10^28 elements), and the 1e-6-grid
    mean lowers to one sign-safe integer floor-div:
    m6 = floor(s9/(1000·n) + 0.5) = floordiv(2·s9 + 1000·n, 2000·n).
    Unlike FLOOR(AVG(x)·1e6 + 0.5) — whose AVG is an order-dependent
    float sum that can flip the floor when a mean lands within an ulp
    of a grid boundary — no step here depends on partition order or
    engine summation, so the pairwise matrix cannot ulp-flip. Squared
    differences and the 64-term sum stay exact BIGINTs (≤ 64·(4e6)² ≈
    1e15); mmd2 is one exact scaled division for display.

    Plan: posexplode → ONE (label, dim) hash agg with map-side
    partials (the j_embed_centroid shuffle: |labels|·dim rows per
    partition, constant); the pairwise self-join and rollup run on
    the |labels|·dim metadata relation — ≤|labels|² output rows at
    any corpus scale."""
    t = load(spark, sf_dir)
    flat = t.embeddings.select(
        "label", F.posexplode(as_double("embedding")).alias("dim", "x")
    )
    acc = flat.groupBy("label", "dim").agg(
        F.sum(
            F.floor(F.col("x") * 1000000000 + F.lit(0.5)).cast("decimal(38,0)")
        ).alias("s9"),
        F.count("*").cast("long").alias("n"),
    )
    num = 2 * F.col("s9") + 1000 * F.col("n")
    den = 2000 * F.col("n")
    q = F.call_function("div", num, den)
    mu = acc.select(
        "label",
        "dim",
        "n",
        F.when((num % den) < 0, q - 1).otherwise(q).cast("long").alias("m6"),
    )
    sz = mu.groupBy("label").agg(F.max("n").cast("long").alias("n"))
    a, b = mu.alias("a"), mu.alias("b")
    pair = (
        a.join(
            b,
            (F.col("a.dim") == F.col("b.dim")) & (F.col("a.label") < F.col("b.label")),
        )
        .groupBy(F.col("a.label").alias("label_a"), F.col("b.label").alias("label_b"))
        .agg(
            F.sum(
                (F.col("a.m6") - F.col("b.m6")) * (F.col("a.m6") - F.col("b.m6"))
            )
            .cast("long")
            .alias("mmd2_s12")
        )
    )
    za = sz.select(F.col("label").alias("label_a"), F.col("n").alias("n_a"))
    zb = sz.select(F.col("label").alias("label_b"), F.col("n").alias("n_b"))
    return (
        pair.join(F.broadcast(za), "label_a")
        .join(F.broadcast(zb), "label_b")
        .select(
            "label_a",
            "label_b",
            "n_a",
            "n_b",
            "mmd2_s12",
            (F.floor(F.col("mmd2_s12") / F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)).alias(
                "mmd2"
            ),
        )
    )


# ------------------------------------------------------- r12 wave 5 (llm)

_KS_EMBED_GRID = 1000  # 1e-3 projection grid: bounded domain at any scale
_MH_EST_K = 16  # portable minhash functions for the estimator audit


def _ks_embed_oracle() -> str:
    """DuckDB twin of j_ks_embed: the SAME literal (axis, offset) as
    j_embed_pca (pca_axis_local on the canonical correctness SF)."""
    import os

    from ..operators.similarity import pca_axis_local

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
    _, axis, offset = pca_axis_local(sf_dir)
    alit = "[" + ", ".join(repr(x) for x in axis) + "]"
    return f"""
    WITH p AS (SELECT label,
                      CAST(FLOOR((list_dot_product(CAST(embedding AS DOUBLE[]), {alit})
                                  - CAST('{offset!r}' AS DOUBLE))
                                 * {_KS_EMBED_GRID} + 0.5) AS BIGINT) AS p3
               FROM embeddings),
    cl AS (SELECT label, p3, CAST(COUNT(*) AS BIGINT) AS c
           FROM p GROUP BY label, p3),
    g AS (SELECT p3, CAST(SUM(c) AS BIGINT) AS cg FROM cl GROUP BY p3),
    cg AS (SELECT p3, SUM(cg) OVER (ORDER BY p3) AS cumg FROM g),
    labs AS (SELECT label, CAST(SUM(c) AS BIGINT) AS nl FROM cl GROUP BY label),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS big_n FROM cl),
    mat AS (SELECT labs.label, labs.nl, cg.p3, cg.cumg,
                   SUM(COALESCE(cl.c, 0)) OVER (PARTITION BY labs.label
                                                ORDER BY cg.p3) AS cuml
            FROM labs CROSS JOIN cg
            LEFT JOIN cl ON cl.label = labs.label AND cl.p3 = cg.p3),
    num AS (SELECT label, nl, p3,
                   ABS(CAST(cuml AS HUGEINT) * (tot.big_n - nl)
                       - CAST(cumg - cuml AS HUGEINT) * nl) AS d,
                   tot.big_n
            FROM mat CROSS JOIN tot),
    ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY label
                                            ORDER BY d DESC, p3) AS rk
               FROM num)
    SELECT n.label, n.nl AS n_in, n.big_n - n.nl AS n_rest,
           FLOOR(CAST(MAX(n.d) AS DOUBLE)
                 / CAST(CAST(n.nl AS HUGEINT) * (n.big_n - n.nl) AS DOUBLE)
                 * 1000000 + 0.5) / 1000000 AS ks_stat,
           MIN(r.p3) / {_KS_EMBED_GRID}.0 AS ks_at
    FROM num n JOIN ranked r ON r.label = n.label AND r.rk = 1
    GROUP BY n.label, n.nl, n.big_n
    """


@query("j_ks_embed", oracle=_ks_embed_oracle())
def j_ks_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-vs-rest Kolmogorov–Smirnov statistic per label on the PCA
    projection — the DISTRIBUTIONAL embedding-drift test that sees
    what j_embed_mmd's linear kernel cannot (two groups with equal
    means but different spread/shape have MMD²_linear ≈ 0 and a large
    KS gap): D_l = max_v |F_l(v) − F_rest(v)| over the 1-D shadow
    j_embed_pca profiles, with ks_at naming WHERE the CDFs diverge.

    Scale-critical design choice: projections quantize to the 1e-3
    grid FIRST, so the CDF support is bounded by the grid (a few
    thousand cells for unit-norm embeddings) at ANY corpus size — the
    cumulative windows run over grid×|labels| metadata rows, never
    corpus rows (a raw-value KS would need a corpus-wide sort; this
    is the j_ks_lengths bounded-domain trick made explicit). All
    counts exact BIGINTs; D's numerator is exact integer arithmetic
    (widened before the multiply); one floored display division.

    Plan: one narrow map (literal-axis fold + floor) → ONE (label,
    cell) hash agg; grid, label totals, and the CDF matrix are
    re-aggs; both windows partition by label over grid rows."""
    t = load(spark, sf_dir)
    from ..operators.similarity import _lit_vector, pca_axis_local

    _, axis, offset = pca_axis_local(sf_dir)
    proj = dot_expr(_lit_vector(list(axis)), as_double("embedding")) - F.lit(offset)
    p = t.embeddings.select(
        "label",
        F.floor(proj * _KS_EMBED_GRID + F.lit(0.5)).cast("long").alias("p3"),
    )
    # (label, cell) counts: grid-bounded metadata behind the corpus
    # shuffle, re-aggregated four ways — persist (SCALE.md 4r rule)
    cl = p.groupBy("label", "p3").agg(F.count("*").cast("long").alias("c")).persist()
    g = cl.groupBy("p3").agg(F.sum("c").cast("long").alias("cg"))
    wg = Window.orderBy("p3").rowsBetween(Window.unboundedPreceding, 0)
    cg = g.select("p3", F.sum("cg").over(wg).cast("long").alias("cumg"))
    labs = cl.groupBy("label").agg(F.sum("c").cast("long").alias("nl"))
    tot = F.broadcast(cl.agg(F.sum("c").cast("long").alias("big_n")))
    wl = (
        Window.partitionBy("label")
        .orderBy("p3")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    mat = (
        F.broadcast(labs)
        .crossJoin(cg)
        .join(cl, ["label", "p3"], "left")
        .select(
            "label",
            "nl",
            "p3",
            "cumg",
            F.sum(F.coalesce(F.col("c"), F.lit(0)))
            .over(wl)
            .cast("long")
            .alias("cuml"),
        )
    )
    dec = "decimal(38,0)"
    num = mat.crossJoin(tot).select(
        "label",
        "nl",
        "p3",
        "big_n",
        F.abs(
            F.col("cuml").cast(dec) * (F.col("big_n") - F.col("nl"))
            - (F.col("cumg") - F.col("cuml")).cast(dec) * F.col("nl")
        ).alias("d"),
    )
    ranked = num.select(
        "*",
        F.row_number()
        .over(Window.partitionBy("label").orderBy(F.col("d").desc(), F.col("p3")))
        .alias("rk"),
    ).where(F.col("rk") == 1)
    agg = num.groupBy("label", "nl", "big_n").agg(F.max("d").alias("dmax"))
    return (
        agg.join(
            ranked.select(F.col("label").alias("r_label"), F.col("p3").alias("at3")),
            F.col("label") == F.col("r_label"),
        )
        .select(
            "label",
            F.col("nl").alias("n_in"),
            (F.col("big_n") - F.col("nl")).alias("n_rest"),
            (
                F.floor(
                    F.col("dmax").cast("double")
                    / (F.col("nl").cast(dec) * (F.col("big_n") - F.col("nl"))).cast(
                        "double"
                    )
                    * 1000000
                    + F.lit(0.5)
                )
                / 1000000
            ).alias("ks_stat"),
            (F.col("at3") / F.lit(float(_KS_EMBED_GRID))).alias("ks_at"),
        )
    )


def _mh_est_oracle() -> str:
    """DuckDB twin of j_minhash_est_error: the identical 16-function
    portable (md5-word) minhash family, reconstructed per shingle."""
    mins = ",\n                  ".join(
        f"list_min(list_transform(s, x -> CAST('0x' || substr(md5(x || '#{k}'), 1, 8)"
        f" AS BIGINT))) AS mh{k}"
        for k in range(_MH_EST_K)
    )
    matches = " + ".join(
        f"CASE WHEN a.mh{k} = b.mh{k} THEN 1 ELSE 0 END" for k in range(_MH_EST_K)
    )
    return f"""
    WITH sh AS (
      SELECT doc_id, lang, source,
             list_distinct(list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                 i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s
      FROM (SELECT doc_id, lang, source, string_split(text, ' ') AS toks
            FROM documents)
      -- sub-3-token docs have NO shingles: excluded EXPLICITLY here and
      -- by the same len >= 3 predicate Spark-side, so both engines agree
      -- on the pair universe (Spark's inner join to the signature agg
      -- would drop them while this oracle would keep them with NULL
      -- signatures and still emit their pairs — a latent row-count
      -- divergence in the n_matches=0 bucket, r12 ADVICE)
      WHERE len(toks) >= 3),
    m AS (SELECT doc_id, lang, source, s,
                  {mins}
          FROM sh),
    pairs AS (SELECT ({matches}) AS n_matches,
                     CAST(FLOOR(len(list_intersect(a.s, b.s)) * 1.0
                                / len(list_distinct(a.s || b.s))
                                * 1000000 + 0.5) AS BIGINT) AS j6
              FROM m a JOIN m b
                ON a.lang = b.lang AND a.source = b.source
               AND a.doc_id < b.doc_id),
    agg AS (SELECT CAST(n_matches AS BIGINT) AS n_matches,
                   CAST(COUNT(*) AS BIGINT) AS n_pairs,
                   CAST(SUM(j6) AS BIGINT) AS sj6,
                   CAST(SUM(ABS(n_matches * 62500 - j6)) AS BIGINT) AS se6
            FROM pairs GROUP BY n_matches)
    SELECT n_matches,
           n_matches * 62500 / 1000000.0 AS est_jaccard,
           n_pairs,
           ((2 * sj6 + n_pairs) // (2 * n_pairs)) / 1000000.0 AS mean_jaccard,
           ((2 * se6 + n_pairs) // (2 * n_pairs)) / 1000000.0 AS mean_abs_err
    FROM agg
    """


@query("j_minhash_est_error", oracle=_mh_est_oracle())
def j_minhash_est_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimator calibration: for every same-(lang, source)
    pair, the {K}-function minhash Jaccard ESTIMATE (matching
    signature positions / {K}) against the exact shingle Jaccard,
    rolled up per match count — the measurement that tells you what
    signature WIDTH buys before you pick b·r for LSH (j_lsh_recall
    audits the banding; this audits the estimator the bands quantize;
    E[matches]/{K} = J and the audit shows the spread around it).
    Uses the PORTABLE md5-word hash family — unlike the production
    xxhash64 signatures (j_dedup_near), every bit is recomputable in
    the oracle engine, so the whole audit is hash-checked.

    Exactness: match counts are integers; est6 = matches·62500 is
    exact on the 1e-6 grid; per-pair |error| and the per-bucket means
    run entirely in scaled BIGINTs ((2S+n) div 2n half-up — no float
    sums). The jaccard leg floors per pair before aggregation.

    Plan: ONE shingle explode → a {K}-min hash agg per doc (map-side
    partials — the minhash_signatures shape, just portable and
    narrower), joined back to the shingle arrays; the blocked
    self-join shuffles on (lang, source) exactly like j_dedup_ngram
    (the deliberate ground-truth quadratic); the rollup is ≤{K}+1
    rows."""
    t = load(spark, sf_dir)
    from ..operators.dedup import portable_hash32, shingle_rows, shingles_from_toks

    rows = shingle_rows(t.documents, ["doc_id", "lang", "source"])
    mins = rows.groupBy("doc_id").agg(
        *[
            F.min(portable_hash32(F.concat(F.col("sh"), F.lit(f"#{k}"))))
            .cast("long")
            .alias(f"mh{k}")
            for k in range(_MH_EST_K)
        ]
    )
    arrs = (
        t.documents.select(
            "doc_id", "lang", "source", tokens_col("text").alias("_toks")
        )
        # sub-3-token docs have no shingles: the inner join to `mins`
        # below would drop them implicitly, but the oracle's pair
        # universe must agree BY CONSTRUCTION, so both engines filter
        # on the same len >= 3 predicate (r12 ADVICE)
        .where(F.size("_toks") >= 3)
        .select(
            "doc_id",
            "lang",
            "source",
            F.transform(
                shingles_from_toks(F.col("_toks")), lambda x: F.xxhash64(x)
            ).alias("s"),
        )
    )
    d = arrs.join(mins, "doc_id").persist()
    a, b = d.alias("a"), d.alias("b")
    jac = F.size(F.array_intersect("a.s", "b.s")) / F.size(F.array_union("a.s", "b.s"))
    nm = sum(
        F.when(F.col(f"a.mh{k}") == F.col(f"b.mh{k}"), 1).otherwise(0)
        for k in range(_MH_EST_K)
    )
    pairs = a.join(
        b,
        (F.col("a.lang") == F.col("b.lang"))
        & (F.col("a.source") == F.col("b.source"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        nm.cast("long").alias("n_matches"),
        F.floor(jac * 1000000 + F.lit(0.5)).cast("long").alias("j6"),
    )
    agg = pairs.groupBy("n_matches").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum("j6").cast("long").alias("sj6"),
        F.sum(F.abs(F.col("n_matches") * 62500 - F.col("j6")))
        .cast("long")
        .alias("se6"),
    )
    return agg.select(
        "n_matches",
        (F.col("n_matches") * 62500 / F.lit(1000000.0)).alias("est_jaccard"),
        "n_pairs",
        (F.expr("(2 * sj6 + n_pairs) div (2 * n_pairs)") / F.lit(1000000.0)).alias(
            "mean_jaccard"
        ),
        (F.expr("(2 * se6 + n_pairs) div (2 * n_pairs)") / F.lit(1000000.0)).alias(
            "mean_abs_err"
        ),
    )


j_minhash_est_error.__doc__ = j_minhash_est_error.__doc__.replace(
    "{K}", str(_MH_EST_K)
)


# --------------------------------------------- r13: ANN/index audits

def _ivf_balance_oracle() -> str:
    """DuckDB twin of j_ivf_balance: the identical literal-centroid
    assignment CTE as _ivf_oracle, rolled up to per-cell occupancy
    over the full 16-cell spine (empty cells included)."""
    rows = _centroid_values_sql()
    return f"""
    WITH cents(cid, cv) AS (VALUES {rows}),
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    scored AS (SELECT e.vec_id, c.cid, list_dot_product(e.v, cv) AS s
               FROM e CROSS JOIN cents c),
    assigned AS (SELECT vec_id, cid AS cluster_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                     ORDER BY s DESC, cid) AS rk
        FROM scored) WHERE rk = 1),
    occ AS (SELECT c.cid AS cluster_id,
                   CAST(COUNT(a.vec_id) AS BIGINT) AS n_vecs
            FROM cents c LEFT JOIN assigned a ON a.cluster_id = c.cid
            GROUP BY c.cid),
    tot AS (SELECT CAST(SUM(n_vecs) AS BIGINT) AS big_n,
                   CAST(COUNT(*) AS BIGINT) AS n_cells FROM occ)
    SELECT CAST(cluster_id AS BIGINT) AS cluster_id, n_vecs,
           -- HUGEINT, not DECIMAL: DuckDB's // on DECIMAL operands is
           -- TRUE division (the BIGINT-cast then rounds); HUGEINT //
           -- floors like Spark's div
           CAST((2000000 * CAST(n_vecs AS HUGEINT) + big_n)
                // (2 * CAST(big_n AS HUGEINT)) AS BIGINT)
               / 1000000.0 AS share,
           CAST((2000000 * CAST(n_vecs AS HUGEINT) * n_cells + big_n)
                // (2 * CAST(big_n AS HUGEINT)) AS BIGINT)
               / 1000000.0 AS load_factor,
           CAST(n_vecs AS HUGEINT) * n_cells
               > 2 * CAST(big_n AS HUGEINT) AS is_hot
    FROM occ CROSS JOIN tot
    """


@query("j_ivf_balance", oracle=_ivf_balance_oracle())
def j_ivf_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF cell-occupancy balance audit: rows per coarse-quantizer
    cell over the FULL cell spine (empty cells included — an empty
    cell is wasted nprobe budget, a hot cell is a scan hotspot), each
    with its corpus share and load factor (occupancy / perfect-balance
    occupancy) and an is_hot flag at 2x fair share. This is the
    partition-skew number an ANN rollout reads BEFORE choosing nprobe
    and cell count: j_ann_recall says how good the index is, this
    says whether its shards are evenly loaded (at 100 TB cluster_id
    is the write-time partition key, so cell skew IS storage skew).

    EXACT: occupancy counts are BIGINTs; share and load_factor round
    half-up on the 1e-6 grid via the (2S+n) div 2n integer idiom with
    operands WIDENED to DECIMAL(38,0) BEFORE multiply (2e6·n·K
    overflows BIGINT past N ~ 3e11); the is_hot flag compares exact
    integers, so it can never flip between engines.

    Plan: assignment is the j_ann_ivf literal-centroid map stage
    (zero shuffles, zero training jobs at query time); occupancy is
    ONE 16-row hash agg; the spine join and the 1-row total broadcast.
    Output is exactly |cells| rows at any corpus scale."""
    from ..operators.similarity import kmeans_train_local

    t = load(spark, sf_dir)
    cents = kmeans_train_local(sf_dir, k=_IVF_K, iters=_IVF_ITERS)
    assigned, cents = ivf_assign(t.embeddings, k_clusters=_IVF_K, cents=cents)
    spine = spark.range(_IVF_K).select(F.col("id").cast("int").alias("cluster_id"))
    occ = (
        spine.join(
            assigned.select("vec_id", "cluster_id"), "cluster_id", "left"
        )
        .groupBy("cluster_id")
        .agg(F.count("vec_id").cast("long").alias("n_vecs"))
    )
    return ivf_balance_from_occ(occ)


def ivf_balance_from_occ(occ: DataFrame) -> DataFrame:
    """The j_ivf_balance output relation from a spine-complete
    (cluster_id, n_vecs) occupancy — factored out so the streaming
    occupancy monitor (streaming/ingest.ivf_occupancy_sink) serves the
    IDENTICAL relation from its accumulated counter state: occupancy
    counts merge by plain ADDITION across micro-batches, so streamed ≡
    batch is an identity over equal counts (the drift_from_counts
    sharing rule)."""
    tot = occ.agg(
        F.sum("n_vecs").cast("long").alias("big_n"),
        F.count("*").cast("long").alias("n_cells"),
    )
    return occ.crossJoin(F.broadcast(tot)).select(
        F.col("cluster_id").cast("long").alias("cluster_id"),
        "n_vecs",
        (
            F.expr(
                "CAST((2000000 * CAST(n_vecs AS DECIMAL(38,0)) + big_n)"
                " div (2 * CAST(big_n AS DECIMAL(38,0))) AS BIGINT)"
            )
            / 1000000.0
        ).alias("share"),
        (
            F.expr(
                "CAST((2000000 * CAST(n_vecs AS DECIMAL(38,0)) * n_cells + big_n)"
                " div (2 * CAST(big_n AS DECIMAL(38,0))) AS BIGINT)"
            )
            / 1000000.0
        ).alias("load_factor"),
        F.expr(
            "CAST(n_vecs AS DECIMAL(38,0)) * n_cells"
            " > 2 * CAST(big_n AS DECIMAL(38,0))"
        ).alias("is_hot"),
    )


# Portable-LSH banding geometry for the skew audit: 16 md5 minhash
# functions (the j_minhash_est_error family) banded 4x4.
_SKEW_R = 4
_SKEW_B = 4


def _lsh_skew_oracle() -> str:
    """DuckDB twin of j_lsh_bucket_skew: identical portable minhash
    family and 4x4 banding; the band key is the ':'-joined decimal
    rendering of the band's minhashes (string-portable — no second
    hash needed for a GROUP BY key)."""
    # ONE md5 per (shingle, band): each band's 4 minhash functions are
    # the 4 independent 32-bit WORDS of md5(x || '#band') — 4 hash
    # invocations per shingle instead of 16 (measured the hot stage of
    # the signature agg), still fully portable
    mins = ",\n                  ".join(
        f"list_min(list_transform(s, x -> CAST('0x' ||"
        f" substr(md5(x || '#{b}'), {1 + 8 * j}, 8) AS BIGINT))) AS mh{b}_{j}"
        for b in range(_SKEW_B)
        for j in range(_SKEW_R)
    )
    legs = []
    for b in range(_SKEW_B):
        key = " || ':' || ".join(
            f"CAST(mh{b}_{j} AS VARCHAR)" for j in range(_SKEW_R)
        )
        legs.append(f"SELECT doc_id, {b} AS band, {key} AS key FROM m")
    return f"""
    WITH sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                 i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
      WHERE len(toks) >= 3),
    m AS (SELECT doc_id, {mins} FROM sh),
    bands AS ({' UNION ALL '.join(legs)}),
    bk AS (SELECT band, key, CAST(COUNT(*) AS BIGINT) AS c
           FROM bands GROUP BY band, key)
    SELECT CAST(band AS INT) AS band,
           CAST(COUNT(*) AS BIGINT) AS n_buckets,
           CAST(MAX(c) AS BIGINT) AS max_bucket,
           CAST(COUNT(*) FILTER (c = 1) AS BIGINT) AS singleton_buckets,
           CAST(SUM((CAST(c AS HUGEINT) * (c - 1)) // 2) AS BIGINT)
               AS candidate_pairs
    FROM bk GROUP BY band
    """


@query("j_lsh_bucket_skew", oracle=_lsh_skew_oracle())
def j_lsh_bucket_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH bucket-skew audit: per band of the portable 4x4 minhash
    banding, the bucket count, the LARGEST bucket, the singleton
    share, and the candidate-pair mass sum(c·(c−1)/2) — the exact
    row count the band's bucket self-join will produce. This is the
    shuffle-skew number for the dedup join at 100 TB: the band key
    IS the shuffle key, so max_bucket is the biggest reduce task and
    candidate_pairs is the join's output cardinality, measured
    before anyone runs the join (j_sim_pairs_banded/j_dedup_near pay
    it; this prices it — a viral duplicate cluster shows up here as
    one monster bucket, which is exactly when AQE skew-split or
    in-bucket salting earns its keep).

    EXACT: bucket sizes are integer counts; pair mass widens to
    DECIMAL(38,0) BEFORE c·(c−1) (a 1e10-doc bucket squares past
    BIGINT); the display cast to BIGINT is exact below 9.2e18 pairs.
    The band key is the ':'-joined DECIMAL RENDERING of the band's
    minhashes — string-identical across engines, no re-hash. The hash
    family is ONE md5 per (shingle, band) split into its four
    independent 32-bit words (portable on both engines; measured 23%
    faster warm than 16 separate md5 invocations, and 4x less hashing
    at any scale).

    Plan: ONE shingle explode → the 16-min signature agg (map-side
    partials, the minhash_signatures shape) → a 4-way band explode →
    ONE (band, key) hash agg → a 4-row rollup. No self-join: the
    audit prices the join without running it."""
    from ..operators.dedup import shingle_rows

    t = load(spark, sf_dir)
    docs = spread(spark, sf_dir, "documents").select("doc_id", "text").where(
        F.size(tokens_col("text")) >= 3
    )
    rows = shingle_rows(docs, ["doc_id"])
    # stage the per-band md5 hex ONCE per shingle row so the 4 word
    # extractions share one hash computation (the staged-array rule)
    hexed = rows.select(
        "doc_id",
        *[
            F.md5(F.concat(F.col("sh"), F.lit(f"#{b}"))).alias(f"hx{b}")
            for b in range(_SKEW_B)
        ],
    )
    mins = hexed.groupBy("doc_id").agg(
        *[
            F.min(
                F.conv(F.substring(F.col(f"hx{b}"), 1 + 8 * j, 8), 16, 10).cast(
                    "long"
                )
            )
            .cast("long")
            .alias(f"mh{b}_{j}")
            for b in range(_SKEW_B)
            for j in range(_SKEW_R)
        ]
    )
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                ":",
                *[
                    F.col(f"mh{b}_{j}").cast("string")
                    for j in range(_SKEW_R)
                ],
            ).alias("key"),
        )
        for b in range(_SKEW_B)
    ]
    bands = mins.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("x")
    ).select(F.col("x.band").alias("band"), F.col("x.key").alias("key"))
    bk = bands.groupBy("band", "key").agg(F.count("*").cast("long").alias("c"))
    return bk.groupBy(F.col("band").cast("int").alias("band")).agg(
        F.count("*").cast("long").alias("n_buckets"),
        F.max("c").cast("long").alias("max_bucket"),
        F.count(F.when(F.col("c") == 1, 1)).cast("long").alias("singleton_buckets"),
        F.sum(F.expr("(CAST(c AS DECIMAL(38,0)) * (c - 1)) div 2"))
        .cast("long")
        .alias("candidate_pairs"),
    )


# Candidate band plans for the analytic tuner: (rows_per_band, bands)
# with r*b = 16 portable minhash functions.
_BAND_PLANS = [(2, 8), (4, 4), (8, 2)]
_BAND_TAU6 = 500000  # true-dup threshold on the 1e-6 Jaccard grid


def _band_plan_oracle() -> str:
    """DuckDB twin of j_lsh_band_plan: exact blocked pair Jaccard on
    the 1e-6 grid, then the s-curve p = 1-(1-J^r)^b per plan built
    from REPEATED SQUARING (x2=x*x, x4=x2*x2, ... — every step one
    correctly-rounded IEEE multiply on grid-identical doubles, no
    libm pow anywhere), rounded per pair to a scaled BIGINT and
    integer-summed."""
    return f"""
    WITH sh AS (
      SELECT doc_id, lang, source,
             list_distinct(list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                 i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s
      FROM (SELECT doc_id, lang, source, string_split(text, ' ') AS toks
            FROM documents)
      WHERE len(toks) >= 3),
    pairs AS (SELECT CAST(FLOOR(len(list_intersect(a.s, b.s)) * 1.0
                               / len(list_distinct(a.s || b.s))
                               * 1000000 + 0.5) AS BIGINT) AS j6
              FROM sh a JOIN sh b
                ON a.lang = b.lang AND a.source = b.source
               AND a.doc_id < b.doc_id),
    px AS (SELECT j6 >= {_BAND_TAU6} AS is_dup,
                  CAST(j6 AS DOUBLE) / CAST(1000000 AS DOUBLE) AS x
           FROM pairs),
    p2 AS (SELECT is_dup, x * x AS x2 FROM px),
    p3 AS (SELECT is_dup, x2, x2 * x2 AS x4 FROM p2),
    p4 AS (SELECT is_dup, x2, x4, x4 * x4 AS x8 FROM p3),
    q0 AS (SELECT is_dup,
                  CAST(1 AS DOUBLE) - x2 AS qa,
                  CAST(1 AS DOUBLE) - x4 AS qb,
                  CAST(1 AS DOUBLE) - x8 AS qc FROM p4),
    q1 AS (SELECT is_dup, qa * qa AS qa2, qb * qb AS qb2, qc * qc AS qc2
           FROM q0),
    q2 AS (SELECT is_dup, qa2 * qa2 AS qa4, qb2 * qb2 AS qb4, qc2 FROM q1),
    q3 AS (SELECT is_dup, qa4 * qa4 AS qa8, qb4, qc2 FROM q2),
    p6 AS (SELECT is_dup,
                  CAST(FLOOR((CAST(1 AS DOUBLE) - qa8) * 1000000 + 0.5)
                       AS BIGINT) AS pa6,
                  CAST(FLOOR((CAST(1 AS DOUBLE) - qb4) * 1000000 + 0.5)
                       AS BIGINT) AS pb6,
                  CAST(FLOOR((CAST(1 AS DOUBLE) - qc2) * 1000000 + 0.5)
                       AS BIGINT) AS pc6
           FROM q3),
    agg AS (SELECT is_dup, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(pa6) AS BIGINT) AS sa,
                   CAST(SUM(pb6) AS BIGINT) AS sb,
                   CAST(SUM(pc6) AS BIGINT) AS sc
            FROM p6 GROUP BY is_dup)
    SELECT 2 AS rows_per_band, 8 AS bands, is_dup, n AS n_pairs,
           ((2 * sa + n) // (2 * n)) / 1000000.0 AS mean_detect_p
    FROM agg
    UNION ALL
    SELECT 4, 4, is_dup, n, ((2 * sb + n) // (2 * n)) / 1000000.0 FROM agg
    UNION ALL
    SELECT 8, 2, is_dup, n, ((2 * sc + n) // (2 * n)) / 1000000.0 FROM agg
    """


@query("j_lsh_band_plan", oracle=_band_plan_oracle())
def j_lsh_band_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic LSH band-plan tuner: for each candidate (r, b) split
    of a 16-function minhash budget — (2,8), (4,4), (8,2) — the mean
    detection probability p = 1−(1−J^r)^b over the EXACT pair-Jaccard
    distribution, split into true dups (J ≥ 0.5) and non-dups. The
    true-dup row is the plan's expected recall; the non-dup row is
    its false-candidate rate — the two numbers that choose b·r
    BEFORE building an index (j_minhash_est_error audits the
    estimator's spread; this turns the measured J distribution into
    the s-curve economics of every banding you could buy with it).

    Determinism: J sits on the 1e-6 grid; every J^r and (1−J^r)^b is
    REPEATED SQUARING — a fixed sequence of correctly-rounded IEEE
    multiplies, no libm pow — so per-pair p is bit-identical across
    engines; p rounds per pair to a scaled BIGINT and aggregates as
    exact integers ((2S+n) div 2n half-up at display).

    Plan: the pair source is the deliberate (lang, source)-blocked
    ground-truth quadratic (the j_dedup_ngram audit contract); the
    s-curve math is a pure map over pairs; the rollup is a 2-row agg
    fanned to 6 dashboard rows. At 100 TB you run it on the audit
    block sample, not the corpus — the qid prices plans, the banded
    joins execute them."""
    t = load(spark, sf_dir)
    d = t.documents.select(
        "doc_id", "lang", "source", tokens_col("text").alias("_toks")
    ).where(F.size("_toks") >= 3)
    arrs = d.select(
        "doc_id",
        "lang",
        "source",
        F.transform(shingles_from_toks(F.col("_toks")), lambda x: F.xxhash64(x)).alias(
            "s"
        ),
    )
    a, b = arrs.alias("a"), arrs.alias("b")
    jac = F.size(F.array_intersect("a.s", "b.s")) / F.size(F.array_union("a.s", "b.s"))
    pairs = a.join(
        b,
        (F.col("a.lang") == F.col("b.lang"))
        & (F.col("a.source") == F.col("b.source"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(F.floor(jac * 1000000 + F.lit(0.5)).cast("long").alias("j6"))
    px = pairs.select(
        (F.col("j6") >= _BAND_TAU6).alias("is_dup"),
        (F.col("j6").cast("double") / F.lit(1000000.0)).alias("x"),
    )
    p2 = px.select("is_dup", (F.col("x") * F.col("x")).alias("x2"))
    p3 = p2.select("is_dup", "x2", (F.col("x2") * F.col("x2")).alias("x4"))
    p4 = p3.select("is_dup", "x2", "x4", (F.col("x4") * F.col("x4")).alias("x8"))
    one = F.lit(1.0)
    q0 = p4.select(
        "is_dup",
        (one - F.col("x2")).alias("qa"),
        (one - F.col("x4")).alias("qb"),
        (one - F.col("x8")).alias("qc"),
    )
    q1 = q0.select(
        "is_dup",
        (F.col("qa") * F.col("qa")).alias("qa2"),
        (F.col("qb") * F.col("qb")).alias("qb2"),
        (F.col("qc") * F.col("qc")).alias("qc2"),
    )
    q2 = q1.select(
        "is_dup", (F.col("qa2") * F.col("qa2")).alias("qa4"),
        (F.col("qb2") * F.col("qb2")).alias("qb4"), "qc2",
    )
    q3 = q2.select(
        "is_dup", (F.col("qa4") * F.col("qa4")).alias("qa8"), "qb4", "qc2"
    )
    p6 = q3.select(
        "is_dup",
        F.floor((one - F.col("qa8")) * 1000000 + F.lit(0.5)).cast("long").alias("pa6"),
        F.floor((one - F.col("qb4")) * 1000000 + F.lit(0.5)).cast("long").alias("pb6"),
        F.floor((one - F.col("qc2")) * 1000000 + F.lit(0.5)).cast("long").alias("pc6"),
    )
    agg = p6.groupBy("is_dup").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("pa6").cast("long").alias("sa"),
        F.sum("pb6").cast("long").alias("sb"),
        F.sum("pc6").cast("long").alias("sc"),
    )
    # the 2-row aggregate is referenced by all three plan legs and its
    # subtree contains the blocked quadratic — persist, or the pair
    # join runs three times (SCALE.md 4r rule)
    agg = agg.persist()
    legs = []
    for (r, bnd), s_col in zip(_BAND_PLANS, ("sa", "sb", "sc")):
        legs.append(
            agg.select(
                F.lit(r).alias("rows_per_band"),
                F.lit(bnd).alias("bands"),
                "is_dup",
                F.col("n").alias("n_pairs"),
                (
                    F.expr(f"(2 * {s_col} + n) div (2 * n)") / F.lit(1000000.0)
                ).alias("mean_detect_p"),
            )
        )
    return legs[0].unionAll(legs[1]).unionAll(legs[2])


@query(
    "j_pr_auc",
    oracle="""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv, label AS qlabel
               FROM embeddings WHERE vec_id = 0),
    s AS (SELECT CAST(FLOOR(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)
                            * 1000000 + 0.5) AS BIGINT) AS s6,
                 CASE WHEN e.label = q.qlabel THEN 1 ELSE 0 END AS y
          FROM embeddings e, q WHERE e.vec_id <> 0),
    g AS (SELECT s6, CAST(SUM(y) AS BIGINT) AS np,
                 CAST(COUNT(*) - SUM(y) AS BIGINT) AS nn
          FROM s GROUP BY s6),
    c AS (SELECT s6, np, nn,
                 CAST(SUM(np) OVER (ORDER BY s6 DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS BIGINT) AS tp,
                 CAST(SUM(np + nn) OVER (ORDER BY s6 DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS BIGINT) AS cum
          FROM g),
    terms AS (SELECT np, nn, tp, cum,
                     -- HUGEINT, not DECIMAL: DuckDB's // on DECIMAL
                     -- operands ROUNDS (decimal division semantics)
                     -- where HUGEINT // floors like Spark's div
                     CAST((2000000 * CAST(np AS HUGEINT) * tp + cum)
                          // (2 * CAST(cum AS HUGEINT)) AS BIGINT) AS t6
              FROM c),
    f AS (SELECT CAST(SUM(np) AS BIGINT) AS n_pos,
                 CAST(SUM(nn) AS BIGINT) AS n_neg,
                 CAST(COUNT(*) AS BIGINT) AS n_thresholds,
                 CAST(SUM(t6) AS BIGINT) AS ap6s
          FROM terms)
    SELECT n_pos, n_neg, n_thresholds,
           ((2 * ap6s + n_pos) // (2 * n_pos)) / 1000000.0 AS avg_precision
    FROM f
    """,
)
def j_pr_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision-recall AUC (average precision, the sklearn
    step-interpolation definition) of retrieval by similarity to
    query vector 0: AP = (1/P)·Σ_thresholds np_t · TP_t/(TP_t+FP_t)
    over DISTINCT score thresholds — the class-imbalance-honest
    companion to j_auc_rank's ROC-AUC (ROC flatters a 1:15 positive
    rate; the PR curve collapses when precision does, which is what a
    retrieval gate actually experiences).

    EXACT: scores pre-round to the 1e-6 grid, per-threshold positive
    and negative counts aggregate per DISTINCT score; each threshold's
    precision term rounds half-up to a scaled BIGINT via the
    (2S+n) div 2n idiom with DECIMAL(38,0) WIDENED operands, the term
    sum is exact integers, and AP is one final integer division —
    no float accumulates anywhere (same discipline as j_auc_rank's
    rank identity; the two qids share the grouped-score relation
    shape).

    Plan: one scored corpus scan collapsing to ≤ |distinct scores|
    rows map-side (the j_auc_rank no-global-rank-window rule); the
    cumulative window rides the grid-bounded score relation; the fold
    is one row. At 100 TB only the scored scan touches data."""
    t = load(spark, sf_dir)
    qrow = t.embeddings.where(F.col("vec_id") == 0).select("embedding", "label").head()
    from ..operators.similarity import _lit_vector

    qlit = _lit_vector([float(x) for x in qrow.embedding])
    s6 = F.floor(dot_expr(as_double("embedding"), qlit) * 1000000 + F.lit(0.5)).cast(
        "long"
    )
    s = t.embeddings.where(F.col("vec_id") != 0).select(
        s6.alias("s6"),
        (F.col("label") == F.lit(int(qrow.label))).cast("long").alias("y"),
    )
    g = s.groupBy("s6").agg(
        F.sum("y").cast("long").alias("np"),
        (F.count("*") - F.sum("y")).cast("long").alias("nn"),
    )
    w = Window.orderBy(F.col("s6").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = g.select(
        "np",
        "nn",
        F.sum("np").over(w).cast("long").alias("tp"),
        F.sum(F.col("np") + F.col("nn")).over(w).cast("long").alias("cum"),
    )
    terms = c.select(
        "np",
        "nn",
        F.expr(
            "CAST((2000000 * CAST(np AS DECIMAL(38,0)) * tp + cum)"
            " div (2 * CAST(cum AS DECIMAL(38,0))) AS BIGINT)"
        ).alias("t6"),
    )
    f = terms.agg(
        F.sum("np").cast("long").alias("n_pos"),
        F.sum("nn").cast("long").alias("n_neg"),
        F.count("*").cast("long").alias("n_thresholds"),
        F.sum("t6").cast("long").alias("ap6s"),
    )
    return f.select(
        "n_pos",
        "n_neg",
        "n_thresholds",
        (F.expr("(2 * ap6s + n_pos) div (2 * n_pos)") / F.lit(1000000.0)).alias(
            "avg_precision"
        ),
    )


# nprobe tuning curve: candidate probe depths (max must stay <= _IVF_K).
_NPROBE_CURVE = [1, 2, 4, 8]


def _nprobe_curve_oracle() -> str:
    """DuckDB twin of j_ivf_nprobe_curve: the _ann_recall_oracle IVF
    batch search with a probe RANK, one approx/recall leg per probe
    depth — same literal centroids, shared sequential-fold dot."""
    from ..registry import ORACLE

    rows = _centroid_values_sql()
    legs = []
    for np_ in _NPROBE_CURVE:
        legs.append(f"""
    SELECT {np_} AS nprobe, n_exact, n_hits,
           FLOOR(n_hits * 1.0 / n_exact * 1000000 + 0.5) / 1000000 AS recall
    FROM (SELECT CAST(COUNT(*) AS BIGINT) AS n_hits
          FROM exact e JOIN (
            SELECT qid, vec_id FROM (
              SELECT qid, vec_id,
                     ROW_NUMBER() OVER (PARTITION BY qid
                                        ORDER BY score DESC, vec_id) AS rk
              FROM cand WHERE prk <= {np_}) WHERE rk <= {_KNNB_K}) a
            ON e.qid = a.qid AND e.vec_id = a.vec_id) h
    CROSS JOIN nex""")
    return f"""
    WITH cents(cid, cv) AS (VALUES {rows}),
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    scored AS (SELECT e.vec_id, e.v, c.cid,
                      list_dot_product(e.v, cv) AS s
               FROM e CROSS JOIN cents c),
    assigned AS (SELECT vec_id, v, cid AS cluster_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                     ORDER BY s DESC, cid) AS rk
        FROM scored) WHERE rk = 1),
    q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
          FROM embeddings WHERE vec_id < {_KNNB_NQ}),
    probe AS (SELECT qid, cid, rk AS prk FROM (
        SELECT q.qid, c.cid,
               ROW_NUMBER() OVER (PARTITION BY q.qid
                                  ORDER BY list_dot_product(qv, cv) DESC, cid) AS rk
        FROM q CROSS JOIN cents c) WHERE rk <= {max(_NPROBE_CURVE)}),
    cand AS (SELECT q.qid, a.vec_id, p.prk,
                    FLOOR(list_dot_product(a.v, q.qv) * 1000000 + 0.5)
                      / 1000000 AS score
             FROM assigned a
             JOIN probe p ON a.cluster_id = p.cid
             JOIN q ON q.qid = p.qid
             WHERE a.vec_id <> q.qid),
    exact AS (SELECT qid, vec_id FROM ({ORACLE["j_knn_batch"]}) x),
    nex AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_exact FROM exact)
    {' UNION ALL '.join(legs)}
    """


@query("j_ivf_nprobe_curve", oracle=_nprobe_curve_oracle())
def j_ivf_nprobe_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF TUNING curve: recall@{k} of the probed search at nprobe =
    {curve} from ONE candidate pass — the scan-fraction-vs-recall
    table that picks the operating point (j_ann_recall measures the
    registered nprobe=4 config; this prices every depth you could
    run, the j_lsh_band_plan of the IVF path, read beside
    j_ivf_balance's occupancy skew: recall says what a probe buys,
    balance says what it costs).

    Determinism: a candidate carries the PROBE RANK of its cluster,
    so "searched at nprobe = n" is a filter prk ≤ n over one shared
    candidate relation; scores pre-round 1e-6; ranks tiebreak
    (score DESC, vec_id); recall is one rounded division of exact
    counts. Centroids are the driver-trained LITERALS both engines
    share (the j_ann_ivf contract).

    Plan: assignment is the zero-Exchange argmax map; the probe plan
    is nq x max(nprobe) driver metadata broadcast into ONE candidate
    join; each candidate explodes to its eligible depths (≤ |curve|
    rows of metadata each) so ONE window ranks all (depth, query)
    slices and ONE join+agg counts hits — the j_bloom_fpr_curve
    single-pass fold. At 100 TB the curve costs one probed scan at
    the DEEPEST depth — shallower depths are free filters over it."""
    from ..operators.similarity import ivf_assign, kmeans_train_local, seq_dot
    from ..registry import QUERIES

    t = load(spark, sf_dir)
    cents = kmeans_train_local(sf_dir, k=_IVF_K, iters=_IVF_ITERS)
    assigned, cents = ivf_assign(t.embeddings, k_clusters=_IVF_K, cents=cents)
    # panel: driver-side memoized metadata read (similarity.query_panel)
    max_np = max(_NPROBE_CURVE)
    probe_pairs = []
    for vid, emb in query_panel(sf_dir, _KNNB_NQ):
        qv = list(emb)
        order = sorted(((seq_dot(qv, v), -int(cid)) for cid, v in cents), reverse=True)
        probe_pairs += [
            (vid, -ncid, prk + 1)
            for prk, (_, ncid) in enumerate(order[:max_np])
        ]
    probe = spark.createDataFrame(probe_pairs, "qid long, cid int, prk int")
    q = t.embeddings.where(F.col("vec_id") < _KNNB_NQ).select(
        F.col("vec_id").alias("qid"), as_double("embedding").alias("qv")
    )
    cand = (
        assigned.join(F.broadcast(probe), assigned.cluster_id == probe.cid)
        .join(F.broadcast(q), "qid")
        .where(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            "prk",
            rnd(dot_expr(as_double("embedding"), F.col("qv")), 6).alias("score"),
        )
    )
    # Fold the per-depth legs into ONE pass (r16 VERDICT item 5, the
    # j_bloom_fpr_curve device): each candidate explodes to the curve
    # depths whose probe budget includes it (prk <= d — exactly the
    # old per-leg filter's row set), ONE window ranks every
    # (nprobe, qid) slice, and ONE join+agg counts hits per depth.
    # The former loop re-windowed and re-joined the persisted
    # candidate/exact relations once per depth: 4 window exchanges +
    # 4 joins + a 4-leg union (52 jobs, 3.3 s cold at sf0.1).
    curve_sql = ",".join(str(d) for d in _NPROBE_CURVE)
    cand = cand.persist()  # the scored-candidate relation the fold ranks
    expanded = cand.select(
        "qid",
        "vec_id",
        "score",
        F.expr(f"explode(filter(array({curve_sql}), d -> prk <= d))").alias("nprobe"),
    )
    w = Window.partitionBy("nprobe", "qid").orderBy(
        F.col("score").desc(), F.col("vec_id").asc()
    )
    approx = (
        expanded.select(
            "nprobe", "qid", "vec_id", F.row_number().over(w).alias("rk")
        )
        .where(F.col("rk") <= _KNNB_K)
        .select("nprobe", "qid", "vec_id")
    )
    exact = QUERIES["j_knn_batch"](spark, sf_dir).select("qid", "vec_id")
    exact = exact.persist()  # two consumers: the hit join and n_exact
    nex = exact.agg(F.count("*").cast("long").alias("n_exact"))
    hits = (
        exact.join(approx, ["qid", "vec_id"])
        .groupBy("nprobe")
        .agg(F.count("*").cast("long").alias("n_hits"))
    )
    # depth spine: a depth whose probe finds NO exact neighbor must
    # still emit its row (the oracle's scalar COUNT legs always do)
    depths = spark.createDataFrame([(d,) for d in _NPROBE_CURVE], "nprobe int")
    return (
        depths.join(hits, "nprobe", "left")
        .crossJoin(F.broadcast(nex))
        .select(
            "nprobe",
            "n_exact",
            F.coalesce(F.col("n_hits"), F.lit(0).cast("long")).alias("n_hits"),
            rnd(
                F.coalesce(F.col("n_hits"), F.lit(0).cast("long"))
                * 1.0
                / F.col("n_exact"),
                6,
            ).alias("recall"),
        )
    )


j_ivf_nprobe_curve.__doc__ = j_ivf_nprobe_curve.__doc__.replace(
    "{curve}", str(_NPROBE_CURVE)
).replace("{k}", str(_KNNB_K))


@query(
    "j_mcc_multiclass",
    oracle=f"""
    WITH q AS (SELECT vec_id AS qid, label AS true_label,
                      CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id < {_KNNB_NQ}),
    s AS (SELECT q.qid, q.true_label, e.vec_id, e.label,
                 FLOOR((list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv))
                       * 1000000 + 0.5) / 1000000 AS score
          FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.qid),
    nn AS (SELECT * FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                          ORDER BY score DESC, vec_id) AS rk
             FROM s) WHERE rk <= {_KNNB_K}),
    votes AS (SELECT qid, true_label, label AS pred_label, COUNT(*) AS c
              FROM nn GROUP BY qid, true_label, label),
    pred AS (SELECT qid, true_label, pred_label FROM (
               SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                            ORDER BY c DESC, pred_label) AS vk
               FROM votes) WHERE vk = 1),
    cell AS (SELECT true_label, pred_label, CAST(COUNT(*) AS BIGINT) AS n
             FROM pred GROUP BY true_label, pred_label),
    tk AS (SELECT true_label AS k, CAST(SUM(n) AS BIGINT) AS t FROM cell
           GROUP BY true_label),
    pk AS (SELECT pred_label AS k, CAST(SUM(n) AS BIGINT) AS p FROM cell
           GROUP BY pred_label),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS s_all,
                   CAST(SUM(CASE WHEN true_label = pred_label THEN n
                                 ELSE 0 END) AS BIGINT) AS c_all
            FROM cell),
    cross_ AS (SELECT CAST(COALESCE(SUM(CAST(tk.t AS HUGEINT) * pk.p), 0)
                           AS HUGEINT) AS tp_dot,
                      CAST(COALESCE((SELECT SUM(CAST(t AS HUGEINT) * t)
                                     FROM tk), 0) AS HUGEINT) AS tt_dot,
                      CAST(COALESCE((SELECT SUM(CAST(p AS HUGEINT) * p)
                                     FROM pk), 0) AS HUGEINT) AS pp_dot
               FROM tk JOIN pk ON tk.k = pk.k)
    SELECT tot.s_all AS n_queries, tot.c_all AS n_correct,
           CASE WHEN (CAST(tot.s_all AS HUGEINT) * tot.s_all - cross_.tt_dot) > 0
                 AND (CAST(tot.s_all AS HUGEINT) * tot.s_all - cross_.pp_dot) > 0
                THEN FLOOR(CAST(CAST(tot.c_all AS HUGEINT) * tot.s_all
                                - cross_.tp_dot AS DOUBLE)
                           / (sqrt(CAST(CAST(tot.s_all AS HUGEINT) * tot.s_all
                                        - cross_.pp_dot AS DOUBLE))
                              * sqrt(CAST(CAST(tot.s_all AS HUGEINT) * tot.s_all
                                          - cross_.tt_dot AS DOUBLE)))
                           * 1000000 + 0.5) / 1000000
                ELSE NULL END AS mcc
    FROM tot CROSS JOIN cross_
    """,
)
def j_mcc_multiclass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiclass Matthews correlation (the Gorodkin 2004 R_K
    statistic, public) of the kNN label-vote classifier:
    MCC = (c·s − Σ_k t_k·p_k) / sqrt((s² − Σp_k²)(s² − Σt_k²)) over
    the SAME confusion matrix j_knn_confusion registers — the one
    chance-corrected single number that stays honest under class
    imbalance where accuracy and even macro-F1 flatter (j_cohen_kappa
    corrects against annotator-style chance; MCC is its
    correlation-form sibling and the standard leaderboard statistic).

    EXACT: every term is an integer dot product of class-marginal
    counts, widened to HUGEINT ↔ DECIMAL(38,0) BEFORE multiply (s² at
    1e10 queries passes 2^63); the statistic applies IEEE sqrt + one
    division to those exact integers (the j_assortativity recipe) and
    floors 1e-6. Degenerate single-class panels yield NULL.

    Plan: reuses the j_knn_confusion vote pipeline verbatim (broadcast
    query fan-out, one rank window, vote argmax); marginals and dot
    products are re-aggs of the ≤|labels|² cell relation — everything
    after the scored scan is metadata."""
    t = load(spark, sf_dir)
    dec = "decimal(38,0)"
    q = t.embeddings.where(F.col("vec_id") < _KNNB_NQ).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("true_label"),
        as_double("embedding").alias("qv"),
    )
    s = (
        t.embeddings.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "true_label",
            "vec_id",
            "label",
            rnd(dot_expr(as_double("embedding"), F.col("qv")), 6).alias("score"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("vec_id").asc())
    nn = s.select("*", F.row_number().over(w).alias("rk")).where(
        F.col("rk") <= _KNNB_K
    )
    votes = nn.groupBy("qid", "true_label", F.col("label").alias("pred_label")).agg(
        F.count("*").alias("c")
    )
    vw = Window.partitionBy("qid").orderBy(F.col("c").desc(), F.col("pred_label").asc())
    pred = votes.select("*", F.row_number().over(vw).alias("vk")).where(
        F.col("vk") == 1
    )
    cell = pred.groupBy("true_label", "pred_label").agg(
        F.count("*").cast("long").alias("n")
    )
    cell = cell.persist()  # marginals + totals + dot products
    tk = cell.groupBy(F.col("true_label").alias("k")).agg(
        F.sum("n").cast("long").alias("t")
    )
    pk = cell.groupBy(F.col("pred_label").alias("k")).agg(
        F.sum("n").cast("long").alias("p")
    )
    tot = cell.agg(
        F.sum("n").cast("long").alias("s_all"),
        F.sum(F.when(F.col("true_label") == F.col("pred_label"), F.col("n")).otherwise(0))
        .cast("long")
        .alias("c_all"),
    )
    dots = (
        tk.join(pk, "k")
        .agg(
            F.sum(F.col("t").cast(dec) * F.col("p")).cast(dec).alias("tp_dot"),
        )
        .crossJoin(
            F.broadcast(
                tk.agg(F.sum(F.col("t").cast(dec) * F.col("t")).cast(dec).alias("tt_dot"))
            )
        )
        .crossJoin(
            F.broadcast(
                pk.agg(F.sum(F.col("p").cast(dec) * F.col("p")).cast(dec).alias("pp_dot"))
            )
        )
        .select(
            F.coalesce(F.col("tp_dot"), F.lit(0).cast(dec)).alias("tp_dot"),
            "tt_dot",
            "pp_dot",
        )
    )
    num = F.col("c_all").cast(dec) * F.col("s_all") - F.col("tp_dot")
    d1 = F.col("s_all").cast(dec) * F.col("s_all") - F.col("pp_dot")
    d2 = F.col("s_all").cast(dec) * F.col("s_all") - F.col("tt_dot")
    mcc = (
        F.floor(
            num.cast("double")
            / (F.sqrt(d1.cast("double")) * F.sqrt(d2.cast("double")))
            * 1000000
            + F.lit(0.5)
        )
        / 1000000
    )
    return tot.crossJoin(F.broadcast(dots)).select(
        F.col("s_all").alias("n_queries"),
        F.col("c_all").alias("n_correct"),
        F.when((d1 > 0) & (d2 > 0), mcc).alias("mcc"),
    )


# --- r14 additions: retrieval-pathology and operating-point economics ------

# Hubness: k-occurrence counts over the kNN lists of the first _HUB_NQ
# query vectors at depth _HUB_K.
_HUB_NQ = 200
_HUB_K = 10


@query(
    "j_hubness",
    oracle=f"""
    WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id < {_HUB_NQ}),
    s AS (SELECT q.qid, e.vec_id,
                 FLOOR(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)
                       * 1000000 + 0.5) / 1000000 AS score
          FROM embeddings e CROSS JOIN q WHERE e.vec_id != q.qid),
    r AS (SELECT qid, vec_id FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                         ORDER BY score DESC, vec_id) AS rk
            FROM s) WHERE rk <= {_HUB_K}),
    occ AS (SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS k_occ FROM r
            GROUP BY 1),
    full_occ AS (SELECT e.vec_id, COALESCE(occ.k_occ, 0) AS k_occ
                 FROM embeddings e LEFT JOIN occ USING (vec_id)),
    h AS (SELECT k_occ, CAST(COUNT(*) AS BIGINT) AS n_vecs
          FROM full_occ GROUP BY 1),
    t AS (SELECT CAST(SUM(n_vecs) AS BIGINT) AS n FROM h)
    SELECT h.k_occ, h.n_vecs,
           FLOOR(h.n_vecs * 1.0 / t.n * 1000000 + 0.5) / 1000000 AS share
    FROM h, t
    """,
)
def j_hubness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hubness audit (Radovanović et al. 2010, public) of the
    embedding space: how many of the {nq} query kNN lists (depth
    {k}) each candidate appears in — the k-occurrence histogram,
    INCLUDING the zero row (anti-hubs: vectors no query ever
    retrieves). A heavy right tail here is the high-dimensional
    pathology that silently degrades every retrieval operator this
    repo ships (hubs dominate j_knn_label votes, stuff j_semdedup
    buckets, and soak up j_retrieval_mrr ranks); the histogram is
    the one-pass diagnosis, read beside j_embed_norm_audit (hubs
    correlate with norm) and j_ivf_balance (hub cells go hot).

    EXACT: scores pre-round to the 1e-6 grid with vec_id tie-break
    (the j_knn_batch convention), occurrence counts and the spine
    join are BIGINT; one rounded share division.

    Plan: the {nq}-row query set broadcasts onto the candidate scan
    (the deliberate batch-kNN fan-out, j_knn_batch's plan note); ONE
    qid-partitioned rank window; the k-occurrence agg collapses to
    <= {nq}x{k} rows map-side; the zero-row spine is a left join of
    corpus ids against that metadata. At 100 TB the scored leg is
    the ANN shortlist and this audit rides it unchanged."""
    t = load(spark, sf_dir)
    q = t.embeddings.where(F.col("vec_id") < _HUB_NQ).select(
        F.col("vec_id").alias("qid"), as_double("embedding").alias("qv")
    )
    # unrolled fixed-width dot: bit-identical left fold, stays in
    # whole-stage codegen (measured ~2x on this exact fan-out). The
    # 64-term sum is ONE parsed SQL expression over a staged _e
    # projection — the per-term Column-op loop (dot_expr_unrolled) cost
    # ~256 py4j round-trips of driver time per build (measured r16);
    # `(a+b)+c` parse association keeps the IEEE fold order identical.
    dot64 = " + ".join(f"_e[{i}] * qv[{i}]" for i in range(64))
    s = (
        spread(spark, sf_dir, "embeddings").crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", as_double("embedding").alias("_e"), "qv")
        .select("qid", "vec_id", rnd(F.expr(dot64), 6).alias("score"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("vec_id"))
    r = (
        s.select("qid", "vec_id", F.row_number().over(w).alias("rk"))
        .where(F.col("rk") <= _HUB_K)
    )
    occ = r.groupBy("vec_id").agg(F.count("*").cast("long").alias("k_occ"))
    full_occ = (
        t.embeddings.select("vec_id")
        .join(F.broadcast(occ), "vec_id", "left")
        .select(F.coalesce(F.col("k_occ"), F.lit(0)).alias("k_occ"))
    )
    h = full_occ.groupBy("k_occ").agg(F.count("*").cast("long").alias("n_vecs"))
    tt = h.agg(F.sum("n_vecs").cast("long").alias("n"))
    return h.crossJoin(F.broadcast(tt)).select(
        "k_occ",
        "n_vecs",
        rnd(F.col("n_vecs") * 1.0 / F.col("n"), 6).alias("share"),
    )


j_hubness.__doc__ = j_hubness.__doc__.replace("{nq}", str(_HUB_NQ)).replace(
    "{k}", str(_HUB_K)
)


# Matryoshka truncation: recall@k of prefix-dimension search vs the
# full-dimension exact top-k, per prefix width.
_DIMC_DIMS = (8, 16, 32, 64)


def _dim_trunc_oracle() -> str:
    legs = []
    for d in _DIMC_DIMS:
        legs.append(f"""
    SELECT {d} AS dim, CAST(COUNT(*) AS BIGINT) AS n_hits
    FROM (SELECT qid, vec_id FROM (
            SELECT s.qid, s.vec_id,
                   ROW_NUMBER() OVER (PARTITION BY s.qid
                                      ORDER BY s.score DESC, s.vec_id) AS rk
            FROM (SELECT q.qid, e.vec_id,
                         FLOOR(list_dot_product(
                             CAST(e.embedding AS DOUBLE[])[1:{d}],
                             q.qv[1:{d}]) * 1000000 + 0.5) / 1000000 AS score
                  FROM embeddings e CROSS JOIN
                       (SELECT vec_id AS qid,
                               CAST(embedding AS DOUBLE[]) AS qv
                        FROM embeddings WHERE vec_id < {_KNNB_NQ}) q
                  WHERE e.vec_id != q.qid) s) WHERE rk <= {_KNNB_K}) a
    JOIN (SELECT qid, vec_id FROM (
            SELECT s.qid, s.vec_id,
                   ROW_NUMBER() OVER (PARTITION BY s.qid
                                      ORDER BY s.score DESC, s.vec_id) AS rk
            FROM (SELECT q.qid, e.vec_id,
                         FLOOR(list_dot_product(
                             CAST(e.embedding AS DOUBLE[]),
                             q.qv) * 1000000 + 0.5) / 1000000 AS score
                  FROM embeddings e CROSS JOIN
                       (SELECT vec_id AS qid,
                               CAST(embedding AS DOUBLE[]) AS qv
                        FROM embeddings WHERE vec_id < {_KNNB_NQ}) q
                  WHERE e.vec_id != q.qid) s) WHERE rk <= {_KNNB_K}) b
      ON a.qid = b.qid AND a.vec_id = b.vec_id""")
    return f"""
    WITH hits AS ({' UNION ALL '.join(legs)})
    SELECT dim, n_hits,
           FLOOR(n_hits * 1.0 / ({_KNNB_NQ} * {_KNNB_K}) * 1000000 + 0.5)
             / 1000000 AS recall
    FROM hits
    """


@query("j_dim_truncation_curve", oracle=_dim_trunc_oracle())
def j_dim_truncation_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka/dimension-truncation operating curve (the MRL
    reading of Kusupati et al. 2022, public): recall@{k} of exact
    search run on only the FIRST d dimensions of each embedding,
    for d in {dims}, against the full-width exact top-{k} over the
    {nq}-query j_knn_batch panel. Prefix width is the third index
    budget axis next to j_ivf_nprobe_curve (scan fraction) and
    j_ann_pq_recall (code size): d/64-width vectors cost d/64 of
    the RAM and dot-product FLOPs, and this curve prices what that
    saves in recall BEFORE anyone re-indexes 100 TB of vectors —
    the d=64 row is the recall=1.0 identity check.

    EXACT: every leg pre-rounds scores to the 1e-6 grid with vec_id
    tie-break (the shared kNN convention); hits are BIGINT joins of
    the two rank relations; one rounded division per row.

    Plan: per width, the same broadcast fan-out + ONE qid-keyed rank
    window as j_knn_batch (widths run as a unioned four-leg plan —
    each leg scans the slice it scores, so Tungsten never material-
    izes a truncated copy of the corpus); the hit join runs on
    {nq}x{k}-row metadata."""
    t = load(spark, sf_dir)
    q = t.embeddings.where(F.col("vec_id") < _KNNB_NQ).select(
        F.col("vec_id").alias("qid"), as_double("embedding").alias("qv")
    )
    base = spread(spark, sf_dir, "embeddings").crossJoin(F.broadcast(q)).where(
        F.col("vec_id") != F.col("qid")
    )
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("vec_id"))

    def topk(dim: int | None) -> DataFrame:
        # A/B note (r14): the unrolled fixed-width dot that wins on
        # j_hubness LOSES here — four legs x up-to-64 unrolled terms
        # bloat the generated code and planning, measured 1.4 -> 3.3 s.
        # The interpreted fold amortizes fine across the four slices.
        emb = as_double("embedding")
        qv = F.col("qv")
        if dim is not None:
            emb = F.slice(emb, 1, dim)
            qv = F.slice(qv, 1, dim)
        return (
            base.select(
                "qid", "vec_id", rnd(dot_expr(emb, qv), 6).alias("score")
            )
            .select("qid", "vec_id", F.row_number().over(w).alias("rk"))
            .where(F.col("rk") <= _KNNB_K)
            .select("qid", "vec_id")
        )

    exact = topk(None).persist()  # joined by all four truncated legs
    legs = []
    for d in _DIMC_DIMS:
        hits = (
            topk(d)
            .join(exact, ["qid", "vec_id"])
            .agg(F.count("*").cast("long").alias("n_hits"))
            .select(F.lit(d).cast("long").alias("dim"), "n_hits")
        )
        legs.append(hits)
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out.select(
        "dim",
        "n_hits",
        rnd(F.col("n_hits") * 1.0 / (_KNNB_NQ * _KNNB_K), 6).alias("recall"),
    )


j_dim_truncation_curve.__doc__ = (
    j_dim_truncation_curve.__doc__
    .replace("{k}", str(_KNNB_K))
    .replace("{nq}", str(_KNNB_NQ))
    .replace("{dims}", str(_DIMC_DIMS))
)


def _score_groups_sql() -> str:
    """The j_auc_rank scored relation (query-0 similarity vs same-label
    flag), collapsed to per-distinct-score positive/negative counts —
    the shared CTE base of j_lift_gains / j_youden_threshold."""
    return """
    q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv, label AS qlabel
          FROM embeddings WHERE vec_id = 0),
    sc AS (SELECT CAST(FLOOR(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                              q.qv) * 1000000 + 0.5)
                   AS BIGINT) AS s6,
                  CASE WHEN e.label = q.qlabel THEN 1 ELSE 0 END AS y
           FROM embeddings e, q WHERE e.vec_id <> 0),
    g AS (SELECT s6, CAST(SUM(y) AS BIGINT) AS np,
                 CAST(COUNT(*) - SUM(y) AS BIGINT) AS nn
          FROM sc GROUP BY s6),
    c AS (SELECT s6, np, nn,
                 CAST(COALESCE(SUM(np + nn) OVER (ORDER BY s6 DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                      AS BIGINT) AS cum_before,
                 CAST(SUM(np) OVER (ORDER BY s6 DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS BIGINT) AS cum_pos,
                 CAST(SUM(nn) OVER (ORDER BY s6 DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS BIGINT) AS cum_neg
          FROM g),
    tot AS (SELECT CAST(SUM(np) AS BIGINT) AS pos,
                   CAST(SUM(nn) AS BIGINT) AS neg,
                   CAST(SUM(np + nn) AS BIGINT) AS n
            FROM g)
    """


def _score_groups(t):
    """Spark twin of _score_groups_sql: (s6, np, nn, cum_before,
    cum_pos, cum_neg) per distinct score, descending-cumulative."""
    qrow = t.embeddings.where(F.col("vec_id") == 0).select("embedding", "label").head()
    from ..operators.similarity import _lit_vector

    qlit = _lit_vector([float(x) for x in qrow.embedding])
    s6 = F.floor(dot_expr(as_double("embedding"), qlit) * 1000000 + F.lit(0.5)).cast(
        "long"
    )
    sc = t.embeddings.where(F.col("vec_id") != 0).select(
        s6.alias("s6"),
        (F.col("label") == F.lit(int(qrow.label))).cast("long").alias("y"),
    )
    g = sc.groupBy("s6").agg(
        F.sum("y").cast("long").alias("np"),
        (F.count("*") - F.sum("y")).cast("long").alias("nn"),
    )
    wb = Window.orderBy(F.col("s6").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    wc = Window.orderBy(F.col("s6").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return g.select(
        "s6",
        "np",
        "nn",
        F.coalesce(F.sum(F.col("np") + F.col("nn")).over(wb), F.lit(0))
        .cast("long")
        .alias("cum_before"),
        F.sum("np").over(wc).cast("long").alias("cum_pos"),
        F.sum("nn").over(wc).cast("long").alias("cum_neg"),
    )


@query(
    "j_lift_gains",
    oracle=f"""
    WITH {_score_groups_sql()},
    dec AS (SELECT (cum_before * 10) // tot.n AS decile,
                   np, nn FROM c, tot),
    d2 AS (SELECT decile, CAST(SUM(np) AS BIGINT) AS np,
                  CAST(SUM(np + nn) AS BIGINT) AS nrows
           FROM dec GROUP BY 1),
    d3 AS (SELECT decile, np, nrows,
                  CAST(SUM(np) OVER (ORDER BY decile
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cpos,
                  CAST(SUM(nrows) OVER (ORDER BY decile
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS crows
           FROM d2)
    SELECT CAST(d3.decile AS BIGINT) AS decile, d3.nrows AS n_rows,
           d3.np AS n_pos, d3.cpos AS cum_pos,
           FLOOR(d3.cpos * 1.0 / tot.pos * 1000000 + 0.5) / 1000000 AS gain,
           FLOOR(CAST(d3.cpos AS DOUBLE) * tot.n
                 / (CAST(d3.crows AS DOUBLE) * tot.pos) * 1000000 + 0.5)
             / 1000000 AS lift
    FROM d3, tot
    """,
)
def j_lift_gains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gains / lift table (the classic campaign-targeting
    readout, public) for the query-0 retrieval scorer: rank all
    candidates by similarity, cut into score-ordered DECILES, and per
    decile report the positive count, cumulative gain (share of all
    positives captured so far) and lift (gain / share of rows read).
    The budgeted-READING view of the family: j_auc_rank scores
    threshold-free separability, j_pr_auc scores it under imbalance,
    j_recall_curve tracks depth — this one answers the operator's
    question "if I can only afford to hand-review 20% of candidates,
    what fraction of the duplicates/contaminants do I catch, and how
    much better than random is that?".

    EXACT: deciles derive from integer cumulative row counts on the
    per-distinct-score relation ((cum_before*10) div N — a score
    group belongs wholly to the decile of its first row, the
    documented tie convention); positives/rows/cums are BIGINT; the
    two output ratios round 1e-6.

    Plan: one scored scan collapsing to |distinct scores| rows
    map-side (the j_auc_rank no-global-rank-window rule); decile
    windows ride the <= 10-row relation. At 100 TB the scored scan
    is the only data pass."""
    t = load(spark, sf_dir)
    c = _score_groups(t)
    tot = c.agg(
        F.sum("np").cast("long").alias("pos"),
        F.sum(F.col("np") + F.col("nn")).cast("long").alias("n"),
    )
    dec = c.crossJoin(F.broadcast(tot)).select(
        F.expr("(cum_before * 10) div n").alias("decile"), "np", "nn"
    )
    d2 = dec.groupBy("decile").agg(
        F.sum("np").cast("long").alias("np"),
        F.sum(F.col("np") + F.col("nn")).cast("long").alias("nrows"),
    )
    wd = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    d3 = d2.select(
        "decile",
        "np",
        "nrows",
        F.sum("np").over(wd).cast("long").alias("cpos"),
        F.sum("nrows").over(wd).cast("long").alias("crows"),
    )
    return d3.crossJoin(F.broadcast(tot)).select(
        F.col("decile").cast("long").alias("decile"),
        F.col("nrows").alias("n_rows"),
        F.col("np").alias("n_pos"),
        F.col("cpos").alias("cum_pos"),
        rnd(F.col("cpos") * 1.0 / F.col("pos"), 6).alias("gain"),
        rnd(
            F.col("cpos").cast("double")
            * F.col("n")
            / (F.col("crows").cast("double") * F.col("pos")),
            6,
        ).alias("lift"),
    )


@query(
    "j_youden_threshold",
    oracle=f"""
    WITH {_score_groups_sql()},
    j AS (SELECT c.s6, c.cum_pos AS tp, c.cum_neg AS fp,
                 tot.pos - c.cum_pos AS fn, tot.neg - c.cum_neg AS tn,
                 c.cum_pos * tot.neg - c.cum_neg * tot.pos AS jnum,
                 tot.pos, tot.neg
          FROM c, tot),
    best AS (SELECT * FROM j ORDER BY jnum DESC, s6 DESC LIMIT 1)
    SELECT s6 / 1000000.0 AS threshold, tp, fp, fn, tn,
           FLOOR(tp * 1.0 / pos * 1000000 + 0.5) / 1000000 AS tpr,
           FLOOR(fp * 1.0 / neg * 1000000 + 0.5) / 1000000 AS fpr,
           FLOOR(CAST(jnum AS DOUBLE) / (CAST(pos AS DOUBLE) * neg)
                 * 1000000 + 0.5) / 1000000 AS youden_j
    FROM best
    """,
)
def j_youden_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Youden's J operating point (public 1950 statistic) for the
    query-0 scorer: the score threshold maximizing TPR - FPR, with
    its full confusion cell counts — the ANSWER the threshold-free
    family defers: j_auc_rank says the scorer separates, j_pr_auc
    says it survives imbalance, and this qid says WHERE to cut when
    one number must be deployed (e.g. the j_semdedup/j_dedup_embed
    similarity cutoffs, which were hand-literals until now have this
    as their data-driven counterpart).

    EXACT argmax: J's sign-structure maximizer tp*NEG - fp*POS is an
    integer per distinct score (no division before the compare);
    ties break to the HIGHEST threshold (the conservative cut,
    documented); only the three display ratios round 1e-6.

    Plan: the same |distinct scores| relation as j_lift_gains; the
    argmax is a heap TakeOrdered(1) on that metadata — never a
    global sort of candidates."""
    t = load(spark, sf_dir)
    c = _score_groups(t)
    tot = c.agg(
        F.sum("np").cast("long").alias("pos"),
        F.sum("nn").cast("long").alias("neg"),
    )
    j = c.crossJoin(F.broadcast(tot)).select(
        "s6",
        F.col("cum_pos").alias("tp"),
        F.col("cum_neg").alias("fp"),
        (F.col("pos") - F.col("cum_pos")).alias("fn"),
        (F.col("neg") - F.col("cum_neg")).alias("tn"),
        (F.col("cum_pos") * F.col("neg") - F.col("cum_neg") * F.col("pos")).alias(
            "jnum"
        ),
        "pos",
        "neg",
    )
    best = j.orderBy(F.col("jnum").desc(), F.col("s6").desc()).limit(1)
    return best.select(
        (F.col("s6") / 1000000.0).alias("threshold"),
        "tp",
        "fp",
        "fn",
        "tn",
        rnd(F.col("tp") * 1.0 / F.col("pos"), 6).alias("tpr"),
        rnd(F.col("fp") * 1.0 / F.col("neg"), 6).alias("fpr"),
        rnd(
            F.col("jnum").cast("double")
            / (F.col("pos").cast("double") * F.col("neg")),
            6,
        ).alias("youden_j"),
    )


# RBO geometry: top-weighting p = 1/2 (dyadic — every weight 2^-i is
# IEEE-exact, dodging the libm pow() parity ban) at the PQ audit depth.
_RBO_SCALE = 10**12


def _rbo_oracle() -> str:
    from ..registry import ORACLE

    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
    exact AS (SELECT vec_id,
                     ROW_NUMBER() OVER (ORDER BY score DESC, vec_id) AS re
              FROM (SELECT vec_id,
                           FLOOR(list_dot_product(v, qv) * 1000000 + 0.5) / 1000000
                             AS score
                    FROM e, q WHERE vec_id <> 0
                    ORDER BY score DESC, vec_id LIMIT {_PQ_TOPK}) x),
    approx AS (SELECT vec_id,
                      ROW_NUMBER() OVER (ORDER BY score DESC, vec_id) AS ra
               FROM ({ORACLE["j_ann_pq"]}) y),
    m AS (SELECT CAST(GREATEST(e2.re, a.ra) AS BIGINT) AS m
          FROM exact e2 JOIN approx a USING (vec_id)),
    grid AS (SELECT CAST(unnest(range(1, {_PQ_TOPK + 1})) AS BIGINT) AS i),
    c AS (SELECT g.i,
                 CAST(COUNT(m.m) AS BIGINT) AS ci
          FROM grid g LEFT JOIN m ON m.m <= g.i GROUP BY g.i),
    terms AS (SELECT i, ci,
                     (2 * ci * {_RBO_SCALE} + i * (1::BIGINT << i))
                       // (2 * i * (1::BIGINT << i)) AS term
              FROM c)
    SELECT CAST({_PQ_TOPK} AS BIGINT) AS depth,
           CAST(0.5 AS DOUBLE) AS p,
           CAST(MAX(CASE WHEN i = {_PQ_TOPK} THEN ci END) AS BIGINT)
               AS n_common,
           {sql_rnd(f"MAX(CASE WHEN i = {_PQ_TOPK} THEN ci END) * 1.0 / {_PQ_TOPK}", 6)}
               AS overlap_at_depth,
           {sql_rnd(f"SUM(term) * 1.0 / {_RBO_SCALE}", 6)} AS rbo
    FROM terms
    """


@query("j_rbo_overlap", oracle=_rbo_oracle())
def j_rbo_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-Biased Overlap (Webber et al. 2010, public) between the
    exact and PQ-approximate top-{k} rankings — the third axis of the
    index-quality triptych: j_recall_curve asks "are the right items
    present", j_rank_tau asks "how scrambled are the COMMON items",
    RBO handles what tau cannot — NON-CONJOINT lists (an item the
    approximate index missed entirely still costs weight at every
    depth it should have occupied) with explicit top-weighting:
    rbo = SUM_i (1-p) p^(i-1) |A_1..i INTERSECT B_1..i| / i, truncated
    at depth {k}. p = 1/2, so every weight (1-p)p^(i-1) = 2^-i is a
    dyadic rational — IEEE-exact by construction, dodging the
    libm-pow parity ban that a textbook p = 0.9 would hit.

    EXACT: intersection sizes come from the integer device
    c_i = |{{max(rank_exact, rank_approx) <= i}}|; each weighted term
    is the pure-integer round-half-up (2 c_i S + i 2^i) div (2 i 2^i)
    at S = 1e12, summed exactly — the display value is ONE division of
    that integer sum (the j_dsir_weights scaled-BIGINT convention).

    Plan: both rankings are the registered <={k}-row audit relations;
    the depth grid is {k} rows broadcast against a <={k}-row m
    relation — everything after the two index legs is free at any
    corpus scale."""
    from ..operators.similarity import _lit_vector
    from ..registry import QUERIES

    t = load(spark, sf_dir)
    # query vector: driver-side memoized metadata read (similarity.query_vector)
    qlit = _lit_vector(list(query_vector(sf_dir)))
    w = Window.orderBy(F.col("score").desc(), F.col("vec_id").asc())
    exact = (
        t.embeddings.where(F.col("vec_id") != 0)
        .select("vec_id", rnd(dot_expr(as_double("embedding"), qlit), 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col("vec_id").asc())
        .limit(_PQ_TOPK)
        .select("vec_id", F.row_number().over(w).cast("long").alias("re"))
    )
    ap = (
        QUERIES["j_ann_pq"](spark, sf_dir)
        .select("vec_id", "score")
        .select("vec_id", F.row_number().over(w).cast("long").alias("ra"))
    )
    m = exact.join(ap, "vec_id").select(
        F.greatest(F.col("re"), F.col("ra")).cast("long").alias("m")
    )
    grid = spark.range(1, _PQ_TOPK + 1).select(F.col("id").cast("long").alias("i"))
    # broadcast the BUILD (right) side: Spark cannot broadcast the
    # preserved side of a left outer join, so a hint on grid is ignored
    # — hinting m (<= k rows) pins BroadcastNestedLoopJoin(right).
    c = (
        grid.join(F.broadcast(m), F.col("m") <= F.col("i"), "left")
        .groupBy("i")
        .agg(F.count("m").cast("long").alias("ci"))
    )
    terms = c.select(
        "i",
        "ci",
        F.expr(
            f"(2 * ci * {_RBO_SCALE} + i * shiftleft(CAST(1 AS BIGINT), CAST(i AS INT)))"
            f" div (2 * i * shiftleft(CAST(1 AS BIGINT), CAST(i AS INT)))"
        ).alias("term"),
    )
    at_depth = F.max(F.when(F.col("i") == _PQ_TOPK, F.col("ci")))
    return terms.agg(
        F.lit(_PQ_TOPK).cast("long").alias("depth"),
        F.lit(0.5).alias("p"),
        at_depth.cast("long").alias("n_common"),
        rnd(at_depth * 1.0 / _PQ_TOPK, 6).alias("overlap_at_depth"),
        rnd(F.sum("term") * 1.0 / _RBO_SCALE, 6).alias("rbo"),
    )


j_rbo_overlap.__doc__ = j_rbo_overlap.__doc__.replace("{k}", str(_PQ_TOPK))


@query(
    "j_rouge_recall",
    oracle=f"""
    WITH pairs AS (SELECT cand_doc, ref_doc FROM (
              SELECT doc_id AS cand_doc,
                     LEAD(doc_id) OVER (PARTITION BY lang, source
                                        ORDER BY doc_id) AS ref_doc
              FROM documents) x WHERE ref_doc IS NOT NULL),
    u AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
    uc AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS c
           FROM u GROUP BY doc_id, term),
    bg AS ({_BLEU_PAIR_BIGRAMS}),
    bc AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS c
           FROM bg GROUP BY doc_id, term),
    t1 AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n FROM uc GROUP BY doc_id),
    t2 AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n FROM bc GROUP BY doc_id),
    clip1 AS (SELECT p.cand_doc,
                     CAST(SUM(LEAST(a.c, b.c)) AS BIGINT) AS clip
              FROM pairs p
              JOIN uc a ON a.doc_id = p.cand_doc
              JOIN uc b ON b.doc_id = p.ref_doc AND b.term = a.term
              GROUP BY p.cand_doc),
    clip2 AS (SELECT p.cand_doc,
                     CAST(SUM(LEAST(a.c, b.c)) AS BIGINT) AS clip
              FROM pairs p
              JOIN bc a ON a.doc_id = p.cand_doc
              JOIN bc b ON b.doc_id = p.ref_doc AND b.term = a.term
              GROUP BY p.cand_doc)
    SELECT p.cand_doc, p.ref_doc,
           t1.n AS ref_n1, COALESCE(clip1.clip, 0) AS clip1,
           t2.n AS ref_n2, COALESCE(clip2.clip, 0) AS clip2,
           CASE WHEN t1.n = 0 THEN 0.0
                ELSE CAST(COALESCE(clip1.clip, 0) * 1000000 // t1.n AS BIGINT)
                     / 1000000.0 END AS r1,
           CASE WHEN t2.n = 0 THEN 0.0
                ELSE CAST(COALESCE(clip2.clip, 0) * 1000000 // t2.n AS BIGINT)
                     / 1000000.0 END AS r2
    FROM pairs p
    JOIN t1 ON t1.doc_id = p.ref_doc
    JOIN t2 ON t2.doc_id = p.ref_doc
    LEFT JOIN clip1 ON clip1.cand_doc = p.cand_doc
    LEFT JOIN clip2 ON clip2.cand_doc = p.cand_doc
    """,
)
def j_rouge_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-1/ROUGE-2 RECALL between the same adjacent same-slice
    document pairs as j_bleu_precision (Lin 2004, public) — the recall
    twin: the clipped overlap divided by the REFERENCE's gram total
    instead of the candidate's. Precision asks "how much of the
    candidate is copied"; recall asks "how much of the reference is
    covered" — a templated header stuffed into a long document scores
    high r_n with low p_n, the opposite signature from boilerplate
    padding, so curation dashboards read the two relations as one
    precision/recall plane per pair.

    Exactness and plan identical to j_bleu_precision (the same clip
    joins and BIGINT floor-division discipline; the only change is
    which side's total is the denominator), so the pair of qids shares
    every shuffle shape: (doc_id, term)-keyed counts, (pair,
    term)-bounded clip joins, LEAD pairing over the slim slice
    projection."""
    from .quality import ngrams_col

    t = load(spark, sf_dir)
    wp = Window.partitionBy("lang", "source").orderBy("doc_id")
    pairs = (
        t.documents.select(
            F.col("doc_id").alias("cand_doc"),
            F.lead("doc_id").over(wp).alias("ref_doc"),
        )
        .where(F.col("ref_doc").isNotNull())
    )
    uc = (
        t.documents.select("doc_id", F.explode(tokens_col("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("c"))
    )
    bc = (
        t.documents.select("doc_id", F.explode(ngrams_col("text", 2)).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("c"))
    )

    def clip(counts):
        ca, cb = counts.alias("ca"), counts.alias("cb")
        return (
            pairs.join(ca, F.col("ca.doc_id") == F.col("cand_doc"))
            .join(
                cb,
                (F.col("cb.doc_id") == F.col("ref_doc"))
                & (F.col("cb.term") == F.col("ca.term")),
            )
            .groupBy("cand_doc")
            .agg(F.sum(F.least(F.col("ca.c"), F.col("cb.c"))).cast("long").alias("clip"))
        )

    t1 = uc.groupBy("doc_id").agg(F.sum("c").cast("long").alias("ref_n1"))
    t2 = bc.groupBy("doc_id").agg(F.sum("c").cast("long").alias("ref_n2"))
    out = (
        pairs.join(t1, F.col("doc_id") == F.col("ref_doc"))
        .drop("doc_id")
        .join(t2, F.col("doc_id") == F.col("ref_doc"))
        .drop("doc_id")
        .join(clip(uc).withColumnRenamed("clip", "clip1"), "cand_doc", "left")
        .join(clip(bc).withColumnRenamed("clip", "clip2"), "cand_doc", "left")
        .select(
            "cand_doc",
            "ref_doc",
            "ref_n1",
            F.coalesce("clip1", F.lit(0)).cast("long").alias("clip1"),
            "ref_n2",
            F.coalesce("clip2", F.lit(0)).cast("long").alias("clip2"),
            F.when(F.col("ref_n1") == 0, F.lit(0.0))
            .otherwise(
                F.expr("CAST(coalesce(clip1, 0) * 1000000 div ref_n1 AS BIGINT)")
                / 1000000.0
            )
            .alias("r1"),
            F.when(F.col("ref_n2") == 0, F.lit(0.0))
            .otherwise(
                F.expr("CAST(coalesce(clip2, 0) * 1000000 div ref_n2 AS BIGINT)")
                / 1000000.0
            )
            .alias("r2"),
        )
    )
    return out


# MMR re-ranking: lambda = 0.7, select 5 from the exact top-10
# shortlist; sims and scores round 1e-6 BEFORE every argmax so the
# selection can never float-flip between engines.
_MMR_SELECT = 5
_MMR_POOL = 10
_MMR_LAM = 0.7


def _mmr_oracle() -> str:
    """Unrolled DuckDB CTE chain m1..m{R}, s1..s{R} (the _bpe_ctes
    discipline): round k computes every remaining candidate's rounded
    max-similarity to the k-1 picks, then takes the (mmr desc, vec_id)
    argmax."""
    lam, com = repr(_MMR_LAM), repr(1.0 - _MMR_LAM)
    ctes = [
        f"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
    cand AS (SELECT vec_id,
                    FLOOR(list_dot_product(v, qv) * 1000000 + 0.5) / 1000000
                        AS rel6, v
             FROM e, q WHERE vec_id <> 0
             ORDER BY rel6 DESC, vec_id LIMIT {_MMR_POOL})"""
    ]
    for k in range(1, _MMR_SELECT + 1):
        if k == 1:
            ctes.append(
                "m1 AS (SELECT vec_id, rel6, v, CAST(0.0 AS DOUBLE) AS ms FROM cand)"
            )
        else:
            sims = ", ".join(
                f"FLOOR(list_dot_product(c.v, s{j}.v) * 1000000 + 0.5) / 1000000"
                for j in range(1, k)
            )
            ms = sims if k == 2 else f"GREATEST({sims})"
            notin = ", ".join(f"s{j}.vec_id" for j in range(1, k))
            froms = ", ".join(f"s{j}" for j in range(1, k))
            ctes.append(
                f"""m{k} AS (SELECT c.vec_id, c.rel6, c.v, {ms} AS ms
           FROM cand c, {froms}
           WHERE c.vec_id NOT IN ({notin}))"""
            )
        ctes.append(
            f"""s{k} AS (SELECT * FROM (
        SELECT vec_id, rel6, v, ms,
               FLOOR(({lam} * rel6 - {com} * ms) * 1000000 + 0.5) / 1000000
                   AS mmr
        FROM m{k}) ORDER BY mmr DESC, vec_id LIMIT 1)"""
        )
    finals = " UNION ALL ".join(
        f"SELECT CAST({k} AS BIGINT) AS rank, vec_id, rel6 AS relevance,"
        f" ms AS max_sim, mmr AS mmr_score FROM s{k}"
        for k in range(1, _MMR_SELECT + 1)
    )
    return f"WITH {', '.join(ctes)}\n    {finals}"


@query("j_mmr_diversity", oracle=_mmr_oracle())
def j_mmr_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998, public) of the exact top-{P} shortlist for the standard
    query (vec_id 0): pick {R} results greedily by
    mmr = {L} * relevance - {C} * max_sim_to_already_picked — the
    retrieval-side DIVERSITY operator that complements the dedup
    family (j_semdedup removes near-duplicates from the corpus; MMR
    removes them from a RESULT LIST at serve time, the standard RAG
    context-packing trick). The returned relation is the audit: each
    pick's relevance, its similarity to the prior picks at selection
    time, and the blended score — rank 1 is pure relevance (empty-set
    max_sim defined as 0 on both engines), later ranks trade
    relevance for novelty.

    EXACT: every dot product rounds 1e-6 (the pinned dot_expr ≡
    list_dot_product bit-identity), the blend applies one fixed IEEE
    sequence to rounded operands and rounds again BEFORE the argmax,
    and every argmax tie-breaks on vec_id — so the greedy trajectory
    is engine-deterministic by construction. The oracle unrolls the
    {R} rounds as CTEs (the _bpe_ctes discipline).

    Plan: corpus-touching work is ONE scored scan + TakeOrdered({P})
    (the production brute-force / index shortlist leg); the {P}-row
    shortlist is BOUNDED MODEL STATE by construction (a top-{P} result
    list is {P} rows at any corpus size), so the greedy loop runs
    driver-side over the one collected shortlist (guide §5 "the driver
    does metadata" — the kmeans/BPE bounded-collect discipline; r16 ran
    {R} sequential 1-row Spark jobs here, ~1 s of pure round-trip
    latency over 10 rows). Every driver-side operation replays the
    EXACT IEEE sequence of the former in-plan expressions: seq_dot is
    dot_expr's left fold, the 1e-6 floor-round is rnd's op order, max
    over rounded sims is F.greatest, and the argmax tie-breaks
    (mmr desc, vec_id asc) — value-identity verified tri-scale against
    the unchanged oracle. At 100 TB the shortlist leg swaps for any
    registered ANN index; the MMR stage is O({P}*{R}) always."""
    from ..operators.similarity import _lit_vector

    t = load(spark, sf_dir)
    # query vector: driver-side memoized metadata read (similarity.query_vector)
    qlit = _lit_vector(list(query_vector(sf_dir)))
    cand = (
        t.embeddings.where(F.col("vec_id") != 0)
        .select(
            "vec_id",
            rnd(dot_expr(as_double("embedding"), qlit), 6).alias("rel6"),
            as_double("embedding").alias("v"),
        )
        .orderBy(F.col("rel6").desc(), F.col("vec_id").asc())
        .limit(_MMR_POOL)
    )
    out_rows = _mmr_greedy(cand.collect())
    return spark.createDataFrame(
        out_rows,
        "rank long, vec_id long, relevance double, max_sim double, mmr_score double",
    )


def _mmr_greedy(shortlist: list) -> list[tuple]:
    """The R bounded greedy rounds, driver-side over the collected
    ≤_MMR_POOL-row shortlist. Bit-parity with the former in-plan form:
    seq_dot ≡ dot_expr (left fold), _r6 ≡ rnd(…, 6) (floor(x*1e6+0.5)
    is BIGINT-exact, /1e6 one correctly-rounded division), max ≡
    F.greatest, and the blend applies the identical constant doubles
    (_MMR_LAM, 1.0 - _MMR_LAM) in the identical multiply-multiply-
    subtract order."""
    import math

    from ..operators.similarity import seq_dot

    def _r6(x: float) -> float:
        return math.floor(x * 1000000 + 0.5) / 1000000

    cands = [
        (int(r.vec_id), float(r.rel6), [float(x) for x in r.v]) for r in shortlist
    ]
    picked: list[tuple[int, list[float]]] = []
    out_rows: list[tuple] = []
    for k in range(1, _MMR_SELECT + 1):
        taken = {vid for vid, _ in picked}
        best = None  # (mmr, -vec_id) max == (mmr desc, vec_id asc) argmax
        for vid, rel6, v in cands:
            if vid in taken:
                continue
            ms = (
                max(_r6(seq_dot(v, pv)) for _, pv in picked) if picked else 0.0
            )
            mmr = _r6(_MMR_LAM * rel6 - (1.0 - _MMR_LAM) * ms)
            key = (mmr, -vid)
            if best is None or key > best[0]:
                best = (key, vid, rel6, v, ms, mmr)
        _, vid, rel6, v, ms, mmr = best
        picked.append((vid, v))
        out_rows.append((k, vid, rel6, ms, mmr))
    return out_rows


j_mmr_diversity.__doc__ = (
    j_mmr_diversity.__doc__.replace("{P}", str(_MMR_POOL))
    .replace("{R}", str(_MMR_SELECT))
    .replace("{L}", str(_MMR_LAM))
    .replace("{C}", str(round(1.0 - _MMR_LAM, 10)))
)


@query(
    "j_log_loss",
    oracle=f"""
    WITH {_ECE_VOTES_CTES},
    nl AS (SELECT CAST(COUNT(DISTINCT label) AS BIGINT) AS nlab
           FROM embeddings),
    per AS (SELECT v.qid, v.qlabel,
                   CAST(SUM(CASE WHEN v.label = v.qlabel THEN v.v ELSE 0 END)
                        AS BIGINT) AS vt
            FROM votes v GROUP BY v.qid, v.qlabel),
    term AS (SELECT qid, qlabel, vt,
                    CAST(FLOOR(-LN((vt + 1.0) / ({_ECE_K} + nl.nlab))
                               * 1000000 + 0.5) AS BIGINT) AS t6
             FROM per CROSS JOIN nl)
    SELECT qlabel AS true_label,
           CAST(COUNT(*) AS BIGINT) AS n_queries,
           CAST(SUM(CASE WHEN vt = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_zero_vote,
           CAST(SUM(t6) AS BIGINT) AS loss_sum6,
           FLOOR(SUM(t6) * 1.0 / COUNT(*) / 1000000 * 1000000 + 0.5) / 1000000
             AS log_loss
    FROM term GROUP BY qlabel
    """,
)
def j_log_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-entropy (logarithmic) loss of the kNN vote classifier per
    true label — the THIRD proper-scoring readout on the shared
    _ece_votes panel: ECE sees only argmax confidence, Brier charges
    quadratically, log loss charges -ln(p_truth) and so punishes
    CONFIDENT wrongness hardest (a zero-vote truth under Brier costs a
    bounded 2; under log loss it dominates the mean — n_zero_vote
    counts exactly those). Laplace-smoothed p = (v_truth + 1) /
    (K + |labels|) keeps p > 0 with a deterministic integer recipe
    (the standard add-one smoothing; |labels| from the corpus).

    EXACT: vote counts are integers; each query's -ln(p) term floors
    ONCE onto the 1e-6 grid as BIGINT (the libm containment), the
    per-label sum is integer, display is one rounded division.

    Plan: reuses the _ece_votes Arrow batch-partial top-k pipeline
    (corpus never leaves the map stage; <= nq*K rows shuffle); the
    loss rollup is two metadata-scale hash aggs + a 1-row label-count
    broadcast."""
    t = load(spark, sf_dir)
    votes = _ece_votes(t, sf_dir)
    nl = t.embeddings.agg(
        F.countDistinct("label").cast("long").alias("nlab")
    )
    per = votes.groupBy("qid", "qlabel").agg(
        F.sum(F.when(F.col("label") == F.col("qlabel"), F.col("v")).otherwise(0))
        .cast("long")
        .alias("vt"),
    )
    term = per.crossJoin(F.broadcast(nl)).select(
        "qid",
        "qlabel",
        "vt",
        F.floor(
            -F.log((F.col("vt") + 1.0) / (F.lit(_ECE_K) + F.col("nlab")))
            * 1000000
            + F.lit(0.5)
        )
        .cast("long")
        .alias("t6"),
    )
    return term.groupBy(F.col("qlabel").alias("true_label")).agg(
        F.count("*").cast("long").alias("n_queries"),
        F.sum(F.when(F.col("vt") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_zero_vote"),
        F.sum("t6").cast("long").alias("loss_sum6"),
        rnd(F.sum("t6") * 1.0 / F.count("*") / 1000000, 6).alias("log_loss"),
    )


@query(
    "j_map_eval",
    oracle=f"""
    WITH q AS (SELECT vec_id AS qid, label AS qlabel,
                      CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id < {_KNNB_NQ}),
    s AS (SELECT q.qid, q.qlabel, e.vec_id, e.label,
                 FLOOR((list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv))
                       * 1000000 + 0.5) / 1000000 AS score
          FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.qid),
    r AS (SELECT qid, qlabel,
                 CASE WHEN label = qlabel THEN 1 ELSE 0 END AS rel,
                 ROW_NUMBER() OVER (PARTITION BY qid
                                    ORDER BY score DESC, vec_id) AS rk
          FROM s),
    c AS (SELECT qid, qlabel, rel, rk,
                 CAST(SUM(rel) OVER (PARTITION BY qid ORDER BY rk) AS BIGINT)
                   AS cum_rel
          FROM r)
    SELECT qid, qlabel AS true_label,
           CAST(SUM(rel) AS BIGINT) AS n_rel,
           CAST(SUM(CASE WHEN rel = 1
                         THEN (1000000 * cum_rel) // rk ELSE 0 END)
                AS BIGINT) AS ap6_sum,
           FLOOR(SUM(CASE WHEN rel = 1
                          THEN (1000000 * cum_rel) // rk ELSE 0 END)
                 * 1.0 / SUM(rel) / 1000000 * 1000000 + 0.5) / 1000000
             AS avg_precision,
           FLOOR(SUM(CASE WHEN rk <= 10 THEN rel ELSE 0 END) / 10.0
                 * 1000000 + 0.5) / 1000000 AS p_at_10
    FROM c GROUP BY qid, qlabel
    """,
)
def j_map_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average Precision per query over the {nq}-query panel (MAP's
    per-query decomposition; public TREC-era metric): AP = (1/R)
    SUM over relevant ranks k of precision@k — the area-under-PR
    readout that completes the ranked-retrieval scorecard
    (j_retrieval_mrr = first hit only, j_ndcg = graded positions,
    j_auc_rank = threshold-free separability; AP is what
    ad-hoc-retrieval leaderboards actually average), plus p@10.

    EXACT: relevance and ranks are integers; each precision@k term is
    the exact integer (1e6 * cum_rel) div k, the per-query sum is
    BIGINT, and AP/p@10 are single rounded display divisions (the
    no-pre-rounded-double-sums rule applied to the harmonic-ish sum).

    Plan: the j_retrieval_mrr fan-out verbatim — {nq}-row broadcast
    query panel onto the candidate scan, ONE qid-partitioned rank
    window + ONE qid-partitioned running-sum window, one group agg.
    At 100 TB the candidate leg is the ANN shortlist (j_ann_recall's
    protocol)."""
    t = load(spark, sf_dir)
    q = t.embeddings.where(F.col("vec_id") < _KNNB_NQ).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        as_double("embedding").alias("qv"),
    )
    s = (
        t.embeddings.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "qlabel",
            "vec_id",
            (F.col("label") == F.col("qlabel")).cast("long").alias("rel"),
            rnd(dot_expr(as_double("embedding"), F.col("qv")), 6).alias("score"),
        )
    )
    wrk = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("vec_id").asc())
    r = s.select("qid", "qlabel", "rel", F.row_number().over(wrk).alias("rk"))
    wcum = Window.partitionBy("qid").orderBy("rk")
    c = r.select(
        "qid",
        "qlabel",
        "rel",
        "rk",
        F.sum("rel").over(wcum).cast("long").alias("cum_rel"),
    )
    term = F.when(
        F.col("rel") == 1, F.expr("(1000000 * cum_rel) div rk")
    ).otherwise(0)
    return c.groupBy("qid", F.col("qlabel").alias("true_label")).agg(
        F.sum("rel").cast("long").alias("n_rel"),
        F.sum(term).cast("long").alias("ap6_sum"),
        rnd(F.sum(term) * 1.0 / F.sum("rel") / 1000000, 6).alias("avg_precision"),
        rnd(F.sum(F.when(F.col("rk") <= 10, F.col("rel")).otherwise(0)) / 10.0, 6).alias(
            "p_at_10"
        ),
    )


j_map_eval.__doc__ = j_map_eval.__doc__.replace("{nq}", str(_KNNB_NQ))
