"""§2.J additions (r6 continuation) — corpus-STRUCTURE operators from the
public training-data literature that act on sub-document granularity or
whole-corpus statistics, complementing the doc-level dedup/quality
families:

- line/segment-level corpus dedup (RefinedWeb, Penedo et al. 2023: drop
  any line that repeats across the corpus, then reassemble documents),
- exact substring dedup via sliding token windows (Lee et al. 2021
  "Deduplicating Training Data Makes Language Models Better" — their
  suffix-array pass, approximated distributably as fixed-width window
  hashing),
- overlapping chunking for sequence/RAG prep,
- top-K vocabulary coverage / OOV rate,
- bloom-prefiltered benchmark decontamination (the bitmap is BUILT with
  DataFrame expressions and broadcast as one row — no driver-side
  filter object, no false negatives, exact verify join after),
- temperature-scaled language mixture (the multilingual sampling rule
  popularized by mT5/UniMax: q_i ∝ p_i^τ).

Fixture note: documents.parquet has no newlines, so "lines" are
deterministic 8-token segments — the operator semantics (drop exact
sub-units repeated across documents, reassemble in order) are the
RefinedWeb ones regardless of how the unit boundary is drawn.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import rnd, sql_rnd
from ..operators.dedup import shingles_from_toks, tokens_col
from ..registry import query
from ..tables import load, spread
from .quality import ngrams_col

# Segment width for line-level dedup; a segment is "boilerplate" when its
# exact text occurs in >= _LINE_DF distinct documents (RefinedWeb uses
# occurrence thresholds in the single digits for its line-dedup pass).
_SEG = 8
_LINE_DF = 2

# Sliding-window width for exact substring dedup (Lee et al. use 50 BPE
# tokens; the fixture's 31-word vocabulary makes 12 whitespace tokens a
# comparable specificity).
_SUB_W = 12
_SUB_FLAG = 0.2

# Chunking geometry: 32-token chunks, stride 24 (8-token overlap).
_CHUNK, _STRIDE = 32, 24

# Vocabulary coverage: top-K corpus tokens; a doc is well covered when
# at most 35% of its token positions fall outside that vocabulary.
_VOCAB_K = 16
_OOV_MAX = 0.35

# Bloom decontamination: 8-token windows, 2^17-bit filter, 3 probes.
_BLOOM_W = 8
_BLOOM_BITS = 1 << 17
_BLOOM_K = 3
_LEAK_FLAG = 0.05

_TAU = 0.7  # sampling temperature


def _seg_frame(docs: DataFrame, width: int) -> DataFrame:
    """Explode documents into consecutive `width`-token segments:
    (doc_id, n_segs, seg_id, seg_text). Zero-shuffle narrow explode; the
    guarded sequence() keeps Spark from generating a DESCENDING range on
    empty docs (sequence(0,-1) = [0,-1], a silent two-row bug)."""
    base = docs.select("doc_id", tokens_col("text").alias("toks")).select(
        "doc_id", "toks", F.ceil(F.size("toks") / F.lit(width)).alias("n_segs")
    )
    seg_ids = F.when(
        F.col("n_segs") > 0, F.sequence(F.lit(0), (F.col("n_segs") - 1).cast("int"))
    ).otherwise(F.array().cast("array<int>"))
    return base.select(
        "doc_id",
        F.col("n_segs").cast("long").alias("n_segs"),
        F.explode(seg_ids).alias("seg_id"),
        F.concat_ws(
            " ", F.slice(F.col("toks"), F.col("seg_id") * width + 1, width)
        ).alias("seg_text"),
    )


@query(
    "j_dedup_lines",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    base AS (SELECT doc_id, toks,
                    CAST((len(toks) + {_SEG - 1}) // {_SEG} AS BIGINT) AS n_segs
             FROM t),
    seg AS (SELECT doc_id, i AS seg_id,
                   array_to_string(toks[(i*{_SEG}+1):(i*{_SEG}+{_SEG})], ' ') AS seg_text
            FROM base, UNNEST(range(0, n_segs)) AS u(i)),
    boiler AS (SELECT seg_text FROM seg GROUP BY seg_text
               HAVING COUNT(DISTINCT doc_id) >= {_LINE_DF}),
    kept AS (SELECT * FROM seg
             WHERE seg_text NOT IN (SELECT seg_text FROM boiler)),
    re AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
                  string_agg(seg_text, ' ' ORDER BY seg_id) AS text_clean
           FROM kept GROUP BY doc_id)
    SELECT b.doc_id, b.n_segs,
           b.n_segs - COALESCE(re.n_kept, 0) AS n_dropped,
           COALESCE(re.text_clean, '') AS text_clean,
           (b.n_segs - COALESCE(re.n_kept, 0)) > 0 AS changed
    FROM base b LEFT JOIN re USING (doc_id)
    """,
)
def j_dedup_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-level corpus dedup (RefinedWeb, public): any 8-token segment
    whose exact text appears in >= 2 distinct documents is boilerplate
    and is struck from EVERY document containing it; surviving segments
    reassemble in order. This is the pass that removes nav bars, cookie
    banners, and license headers that doc-level dedup can't see.

    Scale shape: the segment explode is narrow; the boilerplate vote
    groups on md5(seg_text) — the shuffle carries 16-byte digests plus a
    doc_id, never segment text, and the distinct-doc count partial-
    aggregates map-side. The strike is a left-anti join on the same
    digest, and reassembly is one doc_id-keyed agg whose in-group order
    is explicit (sort_array over (seg_id, seg_text) structs — the
    d_agg_collect pattern), so the result is deterministic under any
    partitioning."""
    t = load(spark, sf_dir)
    return line_dedup(t.documents)


def line_dedup(docs: DataFrame, width: int = _SEG, min_df: int = _LINE_DF) -> DataFrame:
    """Frame-level core of j_dedup_lines over any (doc_id, text) frame —
    separated so property tests can drive it with generated corpora
    (the funnel_counts pattern)."""
    seg = _seg_frame(docs, width).withColumn("h", F.md5("seg_text"))
    seg.persist()  # 3 consumers: boilerplate vote, anti-join probe, totals
    boiler = (
        seg.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .where(F.col("nd") >= min_df)
        .select("h")
    )
    kept = seg.join(boiler, "h", "left_anti")
    reasm = kept.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("seg_id", "seg_text"))),
                lambda s: s["seg_text"],
            ),
        ).alias("text_clean"),
    )
    totals = seg.groupBy("doc_id").agg(F.max("n_segs").alias("n_segs"))
    dropped = F.col("n_segs") - F.coalesce(F.col("n_kept"), F.lit(0).cast("long"))
    return totals.join(reasm, "doc_id", "left").select(
        "doc_id",
        "n_segs",
        dropped.alias("n_dropped"),
        F.coalesce(F.col("text_clean"), F.lit("")).alias("text_clean"),
        (dropped > 0).alias("changed"),
    )


@query(
    "j_dedup_substr",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    w AS (SELECT doc_id,
                 list_transform(range(1, greatest(len(toks) - {_SUB_W - 1}, 0) + 1),
                                i -> array_to_string(toks[i:i+{_SUB_W - 1}], ' ')) AS wins
          FROM t),
    base AS (SELECT doc_id, CAST(len(wins) AS BIGINT) AS n_windows, wins FROM w),
    dh AS (SELECT doc_id, unnest(list_distinct(wins)) AS s FROM base),
    shared AS (SELECT s FROM dh GROUP BY s HAVING COUNT(*) >= 2),
    pos AS (SELECT doc_id, unnest(wins) AS s FROM base),
    hits AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_pos
             FROM pos JOIN shared USING (s) GROUP BY doc_id)
    SELECT b.doc_id, b.n_windows,
           COALESCE(h.n_dup_pos, 0) AS n_dup_pos,
           CASE WHEN b.n_windows > 0
                THEN {sql_rnd('COALESCE(h.n_dup_pos, 0) * 1.0 / b.n_windows', 6)}
                ELSE 0.0 END AS dup_frac,
           CASE WHEN b.n_windows > 0
                THEN COALESCE(h.n_dup_pos, 0) * 1.0 / b.n_windows >= {_SUB_FLAG}
                ELSE FALSE END AS substring_dup
    FROM base b LEFT JOIN hits h USING (doc_id)
    """,
)
def j_dedup_substr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring dedup signals (Lee et al. 2021, public): slide a
    12-token window over every document; a window POSITION is duplicated
    when the same 12-token string occurs in at least one OTHER document.
    Reports per doc the duplicated-position fraction — the statistic
    their suffix-array pass thresholds on before cutting spans. Windows
    repeated only WITHIN a doc don't count (that's j_repetition's job).

    Scale shape: the window array is staged through one projection (the
    j_repetition staged-array rule — inlined, Catalyst re-evaluates the
    whole split/zip_with chain per reference), then hashed to md5 ONCE
    so both explodes and the share vote shuffle 16-byte digests. The
    cross-doc vote runs on array_distinct'd hashes (one row per
    (doc, distinct window)), so COUNT(*) per digest IS the distinct-doc
    count — no countDistinct expand. Never O(n^2): a suffix array is
    pointer-chasing and single-node; window hashing is one explode and
    two hash aggs at any corpus size."""
    t = load(spark, sf_dir)
    # spread: persisted with no exchange — see tables.spread
    staged = spread(spark, sf_dir, "documents").select(
        "doc_id", ngrams_col("text", _SUB_W).alias("wins")
    ).select(
        "doc_id",
        F.size("wins").cast("long").alias("n_windows"),
        F.transform("wins", lambda c: F.md5(c)).alias("hs"),
    )
    staged.persist()  # 3 consumers: distinct vote, position probe, totals
    doch = staged.select("doc_id", F.explode(F.array_distinct("hs")).alias("h"))
    shared = (
        doch.groupBy("h")
        .agg(F.count("*").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("h")
    )
    pos = staged.select("doc_id", F.explode("hs").alias("h"))
    hits = (
        pos.join(shared, "h")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_dup_pos"))
    )
    n_dup = F.coalesce(F.col("n_dup_pos"), F.lit(0).cast("long"))
    frac = n_dup * 1.0 / F.col("n_windows")
    return (
        staged.select("doc_id", "n_windows")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_windows",
            n_dup.alias("n_dup_pos"),
            F.when(F.col("n_windows") > 0, rnd(frac, 6))
            .otherwise(F.lit(0.0))
            .alias("dup_frac"),
            F.when(F.col("n_windows") > 0, frac >= _SUB_FLAG)
            .otherwise(F.lit(False))
            .alias("substring_dup"),
        )
    )


@query(
    "j_chunk_overlap",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    b AS (SELECT doc_id, toks,
                 (len(toks) + {_STRIDE - 1}) // {_STRIDE} AS n_chunks FROM t),
    c AS (SELECT doc_id, i AS chunk_id,
                 toks[(i*{_STRIDE}+1):(i*{_STRIDE}+{_CHUNK})] AS ct
          FROM b, UNNEST(range(0, n_chunks)) AS u(i))
    SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(chunk_id * {_STRIDE} AS BIGINT) AS chunk_start,
           CAST(len(ct) AS BIGINT) AS n_chunk_tokens,
           array_to_string(ct, ' ') AS chunk_text,
           md5(array_to_string(ct, ' ')) AS chunk_md5
    FROM c
    """,
)
def j_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping chunking for sequence/RAG prep: 32-token chunks at
    stride 24 (8-token overlap so no sentence boundary is lost), one row
    per (doc, chunk) with a content digest for downstream shard routing
    and chunk-level dedup.

    Scale shape: a pure narrow explode — ZERO Exchange in the physical
    plan (pinned in tests/test_plans.py): the chunk geometry is computed
    from the already-scanned token array, so 100 TB of documents chunk
    at scan speed with no shuffle at all. chunk_md5 doubles as a uniform
    write-time partition key for the chunk store."""
    t = load(spark, sf_dir)
    return chunk_docs(t.documents)


def chunk_docs(
    docs: DataFrame, size: int = _CHUNK, stride: int = _STRIDE
) -> DataFrame:
    """Frame-level core of j_chunk_overlap over any (doc_id, text)
    frame — separated for property tests over generated geometries."""
    base = docs.select("doc_id", tokens_col("text").alias("toks")).select(
        "doc_id", "toks", F.ceil(F.size("toks") / F.lit(stride)).alias("n_chunks")
    )
    chunk_ids = F.when(
        F.col("n_chunks") > 0, F.sequence(F.lit(0), (F.col("n_chunks") - 1).cast("int"))
    ).otherwise(F.array().cast("array<int>"))
    chunks = base.select("doc_id", F.explode(chunk_ids).alias("chunk_id"), "toks")
    ct = F.slice(F.col("toks"), F.col("chunk_id") * stride + 1, size)
    text = F.concat_ws(" ", ct)
    return chunks.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        (F.col("chunk_id").cast("long") * stride).alias("chunk_start"),
        F.size(ct).cast("long").alias("n_chunk_tokens"),
        text.alias("chunk_text"),
        F.md5(text).alias("chunk_md5"),
    )


@query(
    "j_vocab_coverage",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                 FROM documents),
    vocab AS (SELECT tok FROM tok GROUP BY tok
              ORDER BY COUNT(*) DESC, tok LIMIT {_VOCAB_K}),
    oov AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_oov FROM tok
            WHERE tok NOT IN (SELECT tok FROM vocab) GROUP BY doc_id),
    base AS (SELECT doc_id,
                    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
             FROM documents)
    SELECT b.doc_id, b.n_tokens, COALESCE(o.n_oov, 0) AS n_oov,
           {sql_rnd('COALESCE(o.n_oov, 0) * 1.0 / b.n_tokens', 6)} AS oov_frac,
           COALESCE(o.n_oov, 0) * 1.0 / b.n_tokens <= {_OOV_MAX} AS well_covered
    FROM base b LEFT JOIN oov o USING (doc_id)
    """,
)
def j_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage / OOV rate: build the top-16 corpus vocabulary
    (frequency desc, token asc for a deterministic tie-break), then score
    every document by the fraction of token POSITIONS outside it — the
    tokenizer-fit statistic that decides whether a corpus slice needs
    vocab extension before training.

    Scale shape: one exploded-token frame feeds both sides. The vocab is
    orderBy().limit(K) — TakeOrderedAndProject over the token counts,
    not a global sort — and at K rows it BROADCASTS into a left-anti
    probe, so the corpus-side explode never shuffles for the membership
    test; the only wide ops are the two doc_id/token hash aggs, both
    partial-aggregated map-side."""
    t = load(spark, sf_dir)
    tok = t.documents.select("doc_id", F.explode(tokens_col("text")).alias("tok"))
    tok.persist()  # 2 consumers: vocab vote + membership probe
    vocab = (
        tok.groupBy("tok")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("tok").asc())
        .limit(_VOCAB_K)
        .select("tok")
    )
    oov = (
        tok.join(F.broadcast(vocab), "tok", "left_anti")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_oov"))
    )
    base = t.documents.select(
        "doc_id", F.size(tokens_col("text")).cast("long").alias("n_tokens")
    )
    n_oov = F.coalesce(F.col("n_oov"), F.lit(0).cast("long"))
    frac = n_oov * 1.0 / F.col("n_tokens")
    return base.join(oov, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        n_oov.alias("n_oov"),
        rnd(frac, 6).alias("oov_frac"),
        (frac <= _OOV_MAX).alias("well_covered"),
    )


def _bloom_pos(col: Column, probe: int) -> Column:
    """Bit position for probe j: pmod(xxhash64(digest, j), m). Hashing
    the (digest, j) tuple gives _BLOOM_K independent positions from one
    hash family — the standard double-hashing-free construction."""
    return F.pmod(F.xxhash64(col, F.lit(probe)), F.lit(_BLOOM_BITS))


@query(
    "j_bloom_decontam",
    oracle=f"""
    WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks
               FROM documents),
    g AS (SELECT doc_id, source,
                 list_distinct(list_transform(
                     range(1, greatest(len(toks) - {_BLOOM_W - 1}, 0) + 1),
                     i -> array_to_string(toks[i:i+{_BLOOM_W - 1}], ' '))) AS gs
          FROM t),
    bench AS (SELECT DISTINCT unnest(gs) AS s FROM g WHERE source = 'src0'),
    tr AS (SELECT doc_id, unnest(gs) AS s FROM g WHERE source <> 'src0'),
    hits AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hit
             FROM tr JOIN bench USING (s) GROUP BY doc_id),
    base AS (SELECT doc_id, CAST(len(gs) AS BIGINT) AS n_grams FROM g
             WHERE source <> 'src0')
    SELECT b.doc_id, b.n_grams, COALESCE(h.n_hit, 0) AS n_hit,
           CASE WHEN b.n_grams > 0
                THEN {sql_rnd('COALESCE(h.n_hit, 0) * 1.0 / b.n_grams', 6)}
                ELSE 0.0 END AS hit_frac,
           CASE WHEN b.n_grams > 0
                THEN COALESCE(h.n_hit, 0) * 1.0 / b.n_grams >= {_LEAK_FLAG}
                ELSE FALSE END AS leaked
    FROM base b LEFT JOIN hits h USING (doc_id)
    """,
)
def j_bloom_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered benchmark decontamination: docs from the held-
    out benchmark source ('src0') contribute their distinct 8-token
    windows to a 2^17-bit Bloom filter BUILT WITH DATAFRAME EXPRESSIONS
    — each digest sets 3 bit positions, bit_or-aggregated into sparse
    64-bit words collected as one map<long,long> row — which broadcasts
    into the corpus-side probe. Survivors are exact-verified with an
    equi-join on the same digests, so the RESULT is exact (blooms have
    no false negatives; false positives die in the verify join) and the
    oracle is the plain overlap SQL.

    Why not reuse j_contamination's broadcast term table? A benchmark
    SUITE's n-gram dictionary can be GBs of strings — too big to
    broadcast as a hash relation — while this bitmap is 16 KB at ANY
    benchmark size (size m to taste for the false-positive budget: the
    probe is a prefilter, so FPs cost verify-join work, never
    correctness). The verify join itself carries 16-byte md5s, and at
    production FP rates the bitmap prunes ~99% of the corpus explode
    before that shuffle. This is the runtime-bloom-join pattern Spark
    applies to selective joins, made explicit because OSS Spark does not
    expose bloom_filter_agg/might_contain in its public function
    registry."""
    t = load(spark, sf_dir)
    # NOT spread (r16): interleaved A/B measured a wash (plain 0.81 vs
    # spread 0.77 s median warm) while two full-sweep benches flagged
    # the spread form >2x — no win to defend against the gate.
    g = t.documents.select(
        "doc_id", "source", ngrams_col("text", _BLOOM_W).alias("wins")
    ).select(
        "doc_id",
        "source",
        F.array_distinct(F.transform("wins", lambda c: F.md5(c))).alias("hs"),
    )
    g.persist()  # consumers: bloom build, bench verify side, probe, totals
    bench = (
        g.where(F.col("source") == "src0").select(F.explode("hs").alias("h")).distinct()
    )
    # Build: every digest sets _BLOOM_K bits; sparse words via bit_or.
    bits = bench.select(
        F.explode(F.array(*[_bloom_pos(F.col("h"), j) for j in range(_BLOOM_K)])).alias(
            "p"
        )
    )
    words = bits.select(
        (F.col("p") / F.lit(64)).cast("long").alias("w"),
        F.expr("shiftleft(1L, CAST(p % 64 AS INT))").alias("m"),
    ).groupBy("w")
    bloom = (
        words.agg(F.bit_or("m").alias("bits"))
        .agg(F.map_from_entries(F.collect_list(F.struct("w", "bits"))).alias("bf"))
    )
    # Probe: all _BLOOM_K bits must be set.
    probe = g.where(F.col("source") != "src0").select(
        "doc_id", F.explode("hs").alias("h")
    )
    staged = probe.crossJoin(F.broadcast(bloom)).select(
        "doc_id",
        "h",
        *[_bloom_pos(F.col("h"), j).alias(f"p{j}") for j in range(_BLOOM_K)],
    )
    bit_tests = [
        f"(coalesce(element_at(bf, CAST(p{j} / 64 AS LONG)), 0L)"
        f" & shiftleft(1L, CAST(p{j} % 64 AS INT))) != 0"
        for j in range(_BLOOM_K)
    ]
    pruned = staged.where(F.expr(" AND ".join(bit_tests))).select("doc_id", "h")
    hits = (
        pruned.join(bench, "h")  # exact verify: kills bloom false positives
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_hit"))
    )
    base = g.where(F.col("source") != "src0").select(
        "doc_id", F.size("hs").cast("long").alias("n_grams")
    )
    n_hit = F.coalesce(F.col("n_hit"), F.lit(0).cast("long"))
    frac = n_hit * 1.0 / F.col("n_grams")
    return base.join(hits, "doc_id", "left").select(
        "doc_id",
        "n_grams",
        n_hit.alias("n_hit"),
        F.when(F.col("n_grams") > 0, rnd(frac, 6)).otherwise(F.lit(0.0)).alias(
            "hit_frac"
        ),
        F.when(F.col("n_grams") > 0, frac >= _LEAK_FLAG)
        .otherwise(F.lit(False))
        .alias("leaked"),
    )


@query(
    "j_mix_temperature",
    oracle=f"""
    WITH c AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
               FROM documents GROUP BY lang),
    t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n_total FROM c),
    b AS (SELECT lang, n_docs, n_total,
                 n_docs * 1.0 / n_total AS p,
                 {sql_rnd(f'pow(n_docs * 1.0 / n_total, {_TAU})', 6)} AS qraw
          FROM c, t),
    z AS (SELECT SUM(qraw) AS zz FROM b)
    SELECT lang, n_docs,
           {sql_rnd('p', 6)} AS p_frac,
           {sql_rnd('qraw / zz', 6)} AS q_frac,
           {sql_rnd('(qraw / zz) / p', 6)} AS mix_weight,
           {sql_rnd('qraw / zz * n_total', 2)} AS expected_docs
    FROM b, z
    """,
)
def j_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled language mixture (the mT5/UniMax sampling rule,
    public): sampling share q_i ∝ p_i^τ with τ=0.7 — upweights tail
    languages, damps the head — plus the per-language resampling factor
    (q/p) and the expected post-mix doc count. The companion to
    j_domain_mix (fixed targets) when no explicit target mix exists.

    Scale shape: one hash agg on lang, then two 1-row broadcast
    cross-joins (corpus total, partition constant Z) — the j_domain_mix
    totals shape, never a global window. pow() is the one engine-
    implementation-defined op in the chain, so q_raw is rounded to 1e-6
    on BOTH engines before the Z sum — everything downstream is
    arithmetic on identical doubles."""
    t = load(spark, sf_dir)
    cnt = t.documents.groupBy("lang").agg(F.count("*").cast("long").alias("n_docs"))
    tot = cnt.agg(F.sum("n_docs").cast("long").alias("n_total"))
    p = F.col("n_docs") * 1.0 / F.col("n_total")
    b = cnt.crossJoin(F.broadcast(tot)).select(
        "lang", "n_docs", "n_total", p.alias("p"), rnd(F.pow(p, _TAU), 6).alias("qraw")
    )
    z = b.agg(F.sum("qraw").alias("zz"))
    q = F.col("qraw") / F.col("zz")
    return b.crossJoin(F.broadcast(z)).select(
        "lang",
        "n_docs",
        rnd(F.col("p"), 6).alias("p_frac"),
        rnd(q, 6).alias("q_frac"),
        rnd(q / F.col("p"), 6).alias("mix_weight"),
        rnd(q * F.col("n_total"), 2).alias("expected_docs"),
    )


# ---------------------------------------------------------------- BPE

# Fixed-round BPE training (Sennrich et al. 2016, public): R merge
# rounds learned from the corpus word-frequency table, each round
# unrolled in both engines (the j_pagerank fixed-round philosophy
# applied to tokenizer training). SEP is the ASCII unit separator —
# guaranteed absent from fixture tokens; a general deployment picks any
# byte outside the text alphabet.
_BPE_ROUNDS = 6
_BPE_SEP = "\x1f"


def _bpe_ctes(rounds: int) -> str:
    """The unrolled DuckDB CTE chain w0..w{R}, b1..b{R}: w0 is the
    char-split word-frequency table; each round counts adjacent symbol
    pairs (pK), picks the argmax with (count desc, pair asc) tie-break
    (bK), and rewrites every word via the string-accumulator
    list_reduce — merging appends the right symbol WITHOUT a separator,
    which is exactly the left-to-right non-overlapping BPE merge (the
    merged symbol can never re-match its own left half, and runs like
    'aaa' merge at alternating positions as the reference algorithm
    does)."""
    sep = "chr(31)"
    ctes = [
        """w0 AS (
      SELECT tok AS word, CAST(COUNT(*) AS BIGINT) AS wcount,
             list_transform(range(1, len(tok) + 1), i -> tok[i]) AS s
      FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      GROUP BY tok)"""
    ]
    for k in range(1, rounds + 1):
        ctes.append(f"""p{k} AS (
      SELECT pr.a AS a, pr.b AS b, SUM(wcount) AS cnt FROM (
        SELECT wcount,
               unnest(list_transform(range(1, len(s)),
                                     i -> {{'a': s[i], 'b': s[i+1]}})) AS pr
        FROM w{k - 1}) GROUP BY 1, 2)""")
        ctes.append(
            f"b{k} AS (SELECT a, b, cnt FROM p{k} ORDER BY cnt DESC, a, b LIMIT 1)"
        )
        ctes.append(f"""w{k} AS (
      SELECT word, wcount,
             string_split(list_reduce(s, (acc, x) -> CASE
                 WHEN string_split(acc, {sep})[-1] = b{k}.a AND x = b{k}.b
                 THEN acc || x ELSE acc || {sep} || x END), {sep}) AS s
      FROM w{k - 1} CROSS JOIN b{k})""")
    return ",\n".join(ctes)


def bpe_merge_expr(s, a: str, b: str):
    """One BPE merge round as a pure column expression: rewrite the
    symbol array `s` by merging every left-to-right non-overlapping
    occurrence of the adjacent pair (a, b) into a||b. The fold keeps a
    SEP-joined string accumulator; a merge appends the right symbol
    WITHOUT a separator — the merged symbol can never equal its own
    left half, so no false re-merge, and equal-symbol runs merge at
    alternating positions, exactly the reference greedy semantics
    (property-tested against a plain-Python model in
    tests/test_new_ops.py)."""
    sep = F.lit(_BPE_SEP)
    ba, bb = F.lit(a), F.lit(b)
    merged_str = F.aggregate(
        F.slice(s, 2, F.size(s) - 1),
        F.element_at(s, 1),
        lambda acc, x: F.when(
            (F.element_at(F.split(acc, _BPE_SEP), -1) == ba) & (x == bb),
            F.concat(acc, x),
        ).otherwise(F.concat(acc, sep, x)),
    )
    return F.split(merged_str, _BPE_SEP)


def _bpe_frames(spark: SparkSession, t) -> tuple[list[tuple], DataFrame]:
    """Spark twin of _bpe_ctes: returns ([(round, a, b, cnt), ...], final
    words frame). Each round's argmax pair is COLLECTED driver-side —
    1 row x R rounds of bounded model state, the operators/similarity
    kmeans_train precedent — because keeping the argmax as a lazy 1-row
    frame makes every later round reference the previous words frame
    twice and the LINEAGE (not just execution) grows 2^R: the R=6 plan
    carried 63 duplicated TakeOrderedAndProject nodes before this
    change. With literal merges the lineage is linear, the corpus is
    scanned once (w0 persists), and each round is one tiny job over the
    |vocab|-row frequency table.

    r17 round-loop latency (guide §1.2/§2.4): the corpus-sized w0 agg
    materializes FIRST, under AQE (its shuffle is the one data-sized
    exchange and must stay adaptively coalesced at scale); the R
    argmax rounds then run over the persisted |vocab|-row frame with
    (a) the frame coalesced to a vocab-size-derived partition count
    (~2M words/partition — 1 here, so the per-round groupBy needs no
    exchange at all), and (b) AQE disabled for the round loop only
    (try/finally): adaptive re-planning adds a materialize-replan
    round-trip per tiny exchange and has nothing to coalesce at
    |vocab| scale. Measured at sf0.1: training 1.9-5.2 s -> 1.3-1.4 s
    with bit-identical merges; values are unaffected by construction
    (coalesce only merges partitions, and every consumer aggregate is
    exact-integer or a rounded ratio of exact integers)."""
    w0 = (
        t.documents.select(F.explode(tokens_col("text")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("wcount"))
        .select(
            "word",
            "wcount",
            F.expr(
                "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
            ).alias("s"),
        )
    )
    w0.persist()
    n_vocab = w0.count()  # materialize the data-sized agg under AQE
    parts = max(1, -(-n_vocab // 2_000_000))
    w = w0.coalesce(parts)
    merges: list[tuple] = []
    aqe_was = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for k in range(1, _BPE_ROUNDS + 1):
            pairs = (
                w.select(
                    "wcount",
                    F.explode(
                        F.zip_with(
                            F.slice(F.col("s"), 1, F.size("s") - 1),
                            F.slice(F.col("s"), 2, F.size("s") - 1),
                            lambda a, b: F.struct(a.alias("a"), b.alias("b")),
                        )
                    ).alias("pr"),
                )
                .groupBy(F.col("pr.a").alias("a"), F.col("pr.b").alias("b"))
                .agg(F.sum("wcount").alias("cnt"))
            )
            row = pairs.orderBy(
                F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc()
            ).limit(1).collect()[0]
            merges.append((k, row["a"], row["b"], int(row["cnt"])))
            w = w.select(
                "word", "wcount",
                bpe_merge_expr(F.col("s"), row["a"], row["b"]).alias("s"),
            ).coalesce(parts)
            w.persist()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_was)
    return merges, w


@query(
    "j_bpe_train",
    oracle=f"""
    WITH {_bpe_ctes(_BPE_ROUNDS)}
    {" UNION ALL ".join(
        f"SELECT {k} AS round, a AS left_sym, b AS right_sym, a || b AS merged,"
        f" CAST(cnt AS BIGINT) AS pair_weight FROM b{k}"
        for k in range(1, _BPE_ROUNDS + 1))}
    """,
)
def j_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer TRAINING (Sennrich et al. 2016, public), {R} merge
    rounds learned from the corpus: each round counts adjacent symbol
    pairs over the word-frequency table (weighted by corpus occurrence,
    the standard word-level BPE), picks the most frequent pair
    (deterministic (count desc, pair asc) tie-break), and rewrites every
    word by the left-to-right non-overlapping merge. Output is the
    learned merge table — the artifact a tokenizer ships.

    The merge rewrite is a string-accumulator fold (aggregate /
    list_reduce): a merge appends the right symbol to the accumulator
    WITHOUT a separator, which reproduces reference BPE greedy-merge
    semantics exactly — the merged symbol can never equal its own left
    half, so no false re-merge, and equal-symbol runs merge at
    alternating positions. Both engines run the identical fold; rounds
    are unrolled (the j_pagerank fixed-round oracle pattern).

    Scale shape: the corpus is touched ONCE (the w0 token explode +
    word-count agg — the shuffle carries (word, count)); every round
    after that operates on the |vocab|-row frequency table (Heaps-law
    small) with a 1-row collected argmax — at 100 TB, BPE training cost
    is corpus-scan + R tiny rounds, which is exactly how production
    tokenizer trainers are structured. Per-round frames persist: the
    two-consumer round lineage would otherwise re-read the corpus 2^R
    times."""
    t = load(spark, sf_dir)
    merges, _ = _bpe_frames(spark, t)
    return spark.createDataFrame(
        [(k, a, b, a + b, c) for k, a, b, c in merges],
        "round int, left_sym string, right_sym string, merged string, pair_weight long",
    )


@query(
    "j_bpe_encode",
    oracle=f"""
    WITH {_bpe_ctes(_BPE_ROUNDS)},
    enc AS (SELECT word, CAST(len(s) AS BIGINT) AS n_sub FROM w{_BPE_ROUNDS}),
    tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
            FROM documents)
    SELECT tok.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens_ws,
           CAST(SUM(enc.n_sub) AS BIGINT) AS n_tokens_bpe,
           FLOOR(SUM(enc.n_sub) * 1.0 / COUNT(*) * 1000000 + 0.5)
             / 1000000 AS subtokens_per_word
    FROM tok JOIN enc USING (word)
    GROUP BY tok.doc_id
    """,
)
def j_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODING pass with the just-trained merges: per document, the
    whitespace token count, the BPE sub-token count after the {R}
    learned merges, and the fan-out ratio — the real token-budget
    number a training pipeline bills by (j_token_count's whitespace
    proxy, corrected by an actual tokenizer).

    Encoding joins the corpus token stream against the trained
    vocabulary's final segmentation (word -> |subwords|) — a BROADCAST
    of the Heaps-law-small vocab table, so the encode pass adds zero
    shuffles beyond the per-doc count agg. This is the standard
    production shape: tokenize-by-lookup against a trained merge table,
    not re-running merges per document."""
    t = load(spark, sf_dir)
    _, wfinal = _bpe_frames(spark, t)
    enc = wfinal.select("word", F.size("s").cast("long").alias("n_sub"))
    tok = t.documents.select(
        "doc_id", F.explode(tokens_col("text")).alias("word")
    )
    return (
        tok.join(F.broadcast(enc), "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens_ws"),
            F.sum("n_sub").cast("long").alias("n_tokens_bpe"),
            rnd(F.sum("n_sub") * 1.0 / F.count("*"), 6).alias("subtokens_per_word"),
        )
    )


j_bpe_train.__doc__ = j_bpe_train.__doc__.replace("{R}", str(_BPE_ROUNDS))
j_bpe_encode.__doc__ = j_bpe_encode.__doc__.replace("{R}", str(_BPE_ROUNDS))


@query(
    "j_ngram_novelty",
    oracle="""
    WITH sh AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
                 range(1, greatest(len(toks) - 2, 0) + 1),
                 i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS g
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
    e AS (SELECT doc_id, md5(g) AS h FROM sh),
    f AS (SELECT h, MIN(doc_id) AS first_doc FROM e GROUP BY h)
    SELECT e.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(COUNT(CASE WHEN f.first_doc = e.doc_id THEN 1 END) AS BIGINT)
             AS n_novel,
           FLOOR(COUNT(CASE WHEN f.first_doc = e.doc_id THEN 1 END) * 1.0
                 / COUNT(*) * 1000000 + 0.5) / 1000000 AS novelty
    FROM e JOIN f ON e.h = f.h
    GROUP BY e.doc_id
    """,
)
def j_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram novelty score: per document, the fraction of its distinct
    3-gram shingles appearing for the FIRST time in corpus order (min
    doc_id owns a shingle) — the curriculum/diversity signal that
    separates fresh material from recombinations of earlier text, and
    the document-level view of the same first-occurrence structure
    RefinedWeb-style line dedup exploits.

    Plan discipline: shingles shuffle as md5 DIGESTS, never as raw
    text (the repo-wide corpus rule) — one digest-keyed MIN agg builds
    the first-occurrence table, one digest-keyed join scores docs, one
    doc-keyed agg rolls up. The novelty ratio divides two exact
    BIGINTs once, on identical operands."""
    t = load(spark, sf_dir)
    sh = spread(spark, sf_dir, "documents").select(
        "doc_id",
        F.explode(shingles_from_toks(tokens_col("text"))).alias("g"),
    ).select("doc_id", F.md5("g").alias("h"))
    first = sh.groupBy("h").agg(F.min("doc_id").alias("first_doc"))
    return (
        sh.join(first, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_shingles"),
            F.count(F.when(F.col("first_doc") == F.col("doc_id"), 1))
            .cast("long")
            .alias("n_novel"),
            rnd(
                F.count(F.when(F.col("first_doc") == F.col("doc_id"), 1))
                * 1.0
                / F.count("*"),
                6,
            ).alias("novelty"),
        )
    )


@query(
    "j_topp_vocab",
    oracle="""
    WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS tok
                 FROM documents),
    c AS (SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS n
          FROM tok GROUP BY lang, tok),
    t AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS total,
                 CAST(COUNT(*) AS BIGINT) AS n_vocab
          FROM c GROUP BY lang),
    w AS (SELECT c.lang, c.tok, c.n, t.total, t.n_vocab,
                 CAST(COALESCE(SUM(c.n) OVER (PARTITION BY c.lang
                        ORDER BY c.n DESC, c.tok
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                      AS BIGINT) AS mass_before
          FROM c JOIN t USING (lang))
    SELECT lang, n_vocab, total AS total_mass,
           CAST(COUNT(*) FILTER (WHERE mass_before * 10 < total * 9)
                AS BIGINT) AS n_kept,
           CAST(SUM(n) FILTER (WHERE mass_before * 10 < total * 9)
                AS BIGINT) AS mass_kept
    FROM w GROUP BY lang, n_vocab, total
    """,
)
def j_topp_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-p (nucleus) vocabulary truncation per language: the smallest
    frequency-ranked prefix whose cumulative mass reaches p=0.9 of the
    language's token mass — the vocabulary-sizing statistic behind
    tokenizer budgets and frequency-truncated softmax layers. A token
    is kept iff the mass BEFORE it is still under p*total; the
    comparison is mass_before*10 < total*9, exact 64-bit integers on
    both engines — no float p ever multiplies.

    Plan: one explode -> (lang, token) hash agg (map-side partials),
    a 5-row totals join, and a cumulative window over the per-language
    VOCABULARY relation — index metadata, not the corpus (the
    j_auc_rank rule; if one language's vocab outgrows a task, the
    distributed_prefix_sum_ord lowering applies unchanged). Output is
    one row per language at any corpus size."""
    t = load(spark, sf_dir)
    tok = t.documents.select("lang", F.explode(tokens_col("text")).alias("tok"))
    c = tok.groupBy("lang", "tok").agg(F.count("*").cast("long").alias("n"))
    tot = c.groupBy("lang").agg(
        F.sum("n").cast("long").alias("total"), F.count("*").cast("long").alias("n_vocab")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy(F.col("n").desc(), F.col("tok").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    joined = c.join(F.broadcast(tot), "lang").select(
        "lang",
        "tok",
        "n",
        "total",
        "n_vocab",
        F.coalesce(F.sum("n").over(w), F.lit(0)).cast("long").alias("mass_before"),
    )
    kept = F.col("mass_before") * 10 < F.col("total") * 9
    return joined.groupBy("lang", "n_vocab", F.col("total").alias("total_mass")).agg(
        F.count(F.when(kept, 1)).cast("long").alias("n_kept"),
        F.sum(F.when(kept, F.col("n"))).cast("long").alias("mass_kept"),
    )


@query(
    "j_bpe_compression",
    oracle=f"""
    WITH {_bpe_ctes(_BPE_ROUNDS)},
    enc AS (SELECT word, CAST(len(s) AS BIGINT) AS n_sub FROM w{_BPE_ROUNDS}),
    tok AS (SELECT source, unnest(string_split(text, ' ')) AS word
            FROM documents)
    SELECT tok.source,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(length(tok.word)) AS BIGINT) AS n_word_chars,
           CAST(SUM(enc.n_sub) AS BIGINT) AS n_subtokens,
           {sql_rnd("SUM(enc.n_sub) * 1.0 / COUNT(*)", 6)} AS subtokens_per_word,
           {sql_rnd("SUM(length(tok.word)) * 1.0 / SUM(enc.n_sub)", 6)}
             AS chars_per_subtoken
    FROM tok JOIN enc USING (word)
    GROUP BY tok.source
    """,
)
def j_bpe_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-SOURCE tokenizer efficiency under the trained BPE merges:
    sub-tokens per word and characters per sub-token — the
    "bytes-per-token" figure LLM data budgeting actually quotes, and
    the slice view that exposes WHERE a tokenizer underserves the mix
    (a source whose chars/sub-token sits far below the corpus norm is
    paying fertility tax — usually a script or domain the merges never
    saw; j_bpe_encode gives the same number per document, this is the
    mixture-design rollup). Counts exact BIGINTs; two rounded display
    ratios.

    Plan: the corpus token stream joins the Heaps-law-small trained
    vocabulary BROADCAST (the j_bpe_encode shape), then ONE
    |sources|-keyed hash agg with map-side partials — no added
    shuffle beyond the rollup at any scale."""
    t = load(spark, sf_dir)
    _, wfinal = _bpe_frames(spark, t)
    enc = wfinal.select("word", F.size("s").cast("long").alias("n_sub"))
    tok = t.documents.select(
        "source", F.explode(tokens_col("text")).alias("word")
    )
    return (
        tok.join(F.broadcast(enc), "word")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum(F.length("word")).cast("long").alias("n_word_chars"),
            F.sum("n_sub").cast("long").alias("n_subtokens"),
            rnd(F.sum("n_sub") * 1.0 / F.count("*"), 6).alias("subtokens_per_word"),
            rnd(F.sum(F.length("word")) * 1.0 / F.sum("n_sub"), 6).alias(
                "chars_per_subtoken"
            ),
        )
    )


# Bloom sizing curve: candidate filter sizes in BITS (all powers of two
# so position = hash mod m is cheap), k = 3 positions per key — the
# j_bloom_decontam geometry at three budgets.
_BFPR_MS = [4096, 16384, 131072]
_BFPR_K = 3


def _bfpr_pos_sql(j: int, m: int, col: str = "s") -> str:
    return (
        f"CAST(concat('0x', substr(md5({j} || '|' || {col}), 1, 8)) AS BIGINT)"
        f" % {m}"
    )


def _bfpr_oracle() -> str:
    """DuckDB twin of j_bloom_fpr_curve: per filter size m, the same
    3x md5 bit positions, the bit_or word bitmap, and the all-k-bits
    probe over ground-truth NEGATIVES (corpus grams provably not in
    the benchmark set) — measured FPR next to the load-based
    (bits_set/m)^3 prediction, cubed by repeated multiply."""
    legs = []
    for m in _BFPR_MS:
        pos_b = " UNION ALL ".join(
            f"SELECT {_bfpr_pos_sql(j, m)} AS pos FROM bench" for j in range(1, _BFPR_K + 1)
        )
        pos_p = ", ".join(
            f"{_bfpr_pos_sql(j, m)} AS pos{j}" for j in range(1, _BFPR_K + 1)
        )
        hit_all = " AND ".join(
            f"COALESCE((w{j}.word >> CAST(pr.pos{j} % 32 AS INT)) & 1, 0) = 1"
            for j in range(1, _BFPR_K + 1)
        )
        wjoins = " ".join(
            f"LEFT JOIN words_{m} w{j} ON w{j}.widx = pr.pos{j} // 32"
            for j in range(1, _BFPR_K + 1)
        )
        legs.append(f"""
    SELECT {m} AS m_bits, n_keys, bits_set, n_probes, n_false_pos,
           ((2000000 * CAST(n_false_pos AS HUGEINT) + n_probes)
            // (2 * CAST(n_probes AS HUGEINT))) / 1000000.0 AS fpr,
           FLOOR(((CAST(bits_set AS DOUBLE) / CAST({m} AS DOUBLE))
                  * (CAST(bits_set AS DOUBLE) / CAST({m} AS DOUBLE)))
                 * (CAST(bits_set AS DOUBLE) / CAST({m} AS DOUBLE))
                 * 1000000 + 0.5) / 1000000 AS predicted_fpr
    FROM (
      WITH pos_{m} AS (SELECT DISTINCT pos FROM ({pos_b})),
      words_{m} AS (SELECT pos // 32 AS widx,
                       bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INT)) AS word
                FROM pos_{m} GROUP BY pos // 32),
      probes_{m} AS (SELECT s, {pos_p} FROM neg),
      fp_{m} AS (SELECT COUNT(*) AS n_fp FROM probes_{m} pr {wjoins}
             WHERE {hit_all})
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM bench) AS n_keys,
             (SELECT CAST(SUM(bit_count(word)) AS BIGINT) FROM words_{m})
                 AS bits_set,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM neg) AS n_probes,
             (SELECT CAST(n_fp AS BIGINT) FROM fp_{m}) AS n_false_pos)""")
    return f"""
    WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks
               FROM documents),
    g AS (SELECT doc_id, source,
                 list_distinct(list_transform(
                     range(1, greatest(len(toks) - {_BLOOM_W - 1}, 0) + 1),
                     i -> array_to_string(toks[i:i+{_BLOOM_W - 1}], ' '))) AS gs
          FROM t),
    bench AS (SELECT DISTINCT unnest(gs) AS s FROM g WHERE source = 'src0'),
    corpus AS (SELECT DISTINCT unnest(gs) AS s FROM g WHERE source <> 'src0'),
    neg AS (SELECT s FROM corpus WHERE s NOT IN (SELECT s FROM bench))
    {' UNION ALL '.join(legs)}
    """


@query("j_bloom_fpr_curve", oracle=_bfpr_oracle())
def j_bloom_fpr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter SIZING curve: the j_bloom_decontam bitmap built at
    m = {ms} bits (k = {k} md5 positions per key), probed with
    ground-truth NEGATIVES — corpus 8-token windows provably absent
    from the benchmark set — so each row is a MEASURED false-positive
    rate next to the load-based prediction (bits_set/m)^{k}. The
    bits-vs-FPR table you read before sizing a decontamination
    prefilter (FPs cost verify-join work downstream), completing the
    sketch-sizing family: j_cms_width_curve (counts),
    j_hll_precision_curve (distincts), this (membership).

    Determinism: bit positions are portable md5 mod m; the bitmap is
    integer bit_or words; bits_set is an exact popcount sum; measured
    FPR rounds via (2S+n) div 2n in HUGEINT; the prediction is two
    IEEE divides and two multiplies on exact integers (repeated
    multiply, no libm pow), floored 1e-6.

    Plan: ONE gram explode feeds the persisted bench/negative key
    relations; the bitmaps for EVERY size live in one (m, widx, word)
    bit_or agg (≤ Σm/32 rows — 16 KB-scale at any benchmark size) that
    BROADCASTS into ONE size-exploded probe pass of |negatives|·|sizes|
    rows x k broadcast lookups (the j_bloom_decontam shape; the per-m
    probe-pass loop this replaces cost |sizes| passes over the same
    persisted negatives, r16). Output is |sizes| rows."""
    t = load(spark, sf_dir)
    g = t.documents.select(
        "doc_id", "source", ngrams_col("text", _BLOOM_W).alias("gs")
    )
    bench = (
        g.where(F.col("source") == "src0")
        .select(F.explode("gs").alias("s"))
        .distinct()
    )
    corpus = (
        g.where(F.col("source") != "src0")
        .select(F.explode("gs").alias("s"))
        .distinct()
    )
    neg = corpus.join(bench, "s", "left_anti")
    bench.persist()  # consumers: |sizes| bitmap builds + n_keys
    neg.persist()  # consumers: |sizes| probe joins + n_probes
    # positions are computed ONCE at the LARGEST m and derived for the
    # smaller sizes by modulo: every _BFPR_MS entry divides the largest
    # (all powers of two), so md5 % m_small == (md5 % m_big) % m_small —
    # one hash pass serves the whole curve (measured: the r13 bench's
    # per-m position rebuild was the curve's hot spot)
    m_big = max(_BFPR_MS)
    assert all(m_big % m == 0 for m in _BFPR_MS)

    def pos_big(j, col="s"):
        return (
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"{j}|"), F.col(col))), 1, 8),
                16,
                10,
            ).cast("long")
            % m_big
        )

    bpos_big = None
    for j in range(1, _BFPR_K + 1):
        leg = bench.select(pos_big(j).alias("posb"))
        bpos_big = leg if bpos_big is None else bpos_big.unionAll(leg)
    bpos_big = bpos_big.distinct().persist()  # one build, |sizes| reads
    probes_big = neg.select(
        "s", *[pos_big(j).alias(f"posb{j}") for j in range(1, _BFPR_K + 1)]
    ).persist()
    # The whole curve in ONE probe pass (r16): the per-m loop ran
    # |sizes| probe passes (each k broadcast joins over the persisted
    # negatives) plus |sizes| bitmap aggs; exploding the size array
    # instead keys every device by m and computes identical integers —
    # same distinct (m, pos) set, same per-m bit_or words, same
    # all-bits-hit count (an unmatched m never exists: the explode
    # seeds every size on every row). Output rows sort by m_bits,
    # reproducing the loop's ascending-union order.
    ms_arr = F.expr("array(" + ",".join(str(m) for m in _BFPR_MS) + ")")
    words_all = (
        bpos_big.select(F.explode(ms_arr).alias("m"), "posb")
        .select("m", (F.col("posb") % F.col("m")).alias("pos"))
        .distinct()
        .groupBy("m", F.expr("pos div 32").alias("widx"))
        .agg(
            F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))"))
            .alias("word")
        )
    )
    bits = words_all.groupBy("m").agg(
        F.sum(F.bit_count("word")).cast("long").alias("bits_set")
    )
    pr = probes_big.select(F.explode(ms_arr).alias("m"), "s", *[f"posb{j}" for j in range(1, _BFPR_K + 1)]).select(
        "m",
        "s",
        *[
            (F.col(f"posb{j}") % F.col("m")).alias(f"pos{j}")
            for j in range(1, _BFPR_K + 1)
        ],
    )
    conds = []
    for j in range(1, _BFPR_K + 1):
        wj = words_all.select(
            F.col("m").alias(f"m{j}"),
            F.col("widx").alias(f"widx{j}"),
            F.col("word").alias(f"word{j}"),
        )
        pr = pr.join(
            F.broadcast(wj),
            (F.col("m") == F.col(f"m{j}"))
            & (F.expr(f"pos{j} div 32") == F.col(f"widx{j}")),
            "left",
        )
        conds.append(
            F.coalesce(
                F.expr(f"(word{j} >> CAST(pos{j} % 32 AS INT)) & 1"),
                F.lit(0),
            )
            == 1
        )
    allhit = conds[0]
    for c in conds[1:]:
        allhit = allhit & c
    fp = pr.groupBy("m").agg(
        F.sum(F.when(allhit, 1).otherwise(0)).cast("long").alias("n_fp")
    )
    nk = bench.agg(F.count("*").cast("long").alias("n_keys"))
    npr = neg.agg(F.count("*").cast("long").alias("n_probes"))
    load_frac = F.col("bits_set").cast("double") / F.col("m").cast("double")
    return (
        fp.join(bits, "m")
        .crossJoin(F.broadcast(nk))
        .crossJoin(F.broadcast(npr))
        .select(
            F.col("m").alias("m_bits"),
            "n_keys",
            "bits_set",
            "n_probes",
            F.col("n_fp").alias("n_false_pos"),
            (
                F.expr(
                    "(2000000 * CAST(n_fp AS DECIMAL(38,0)) + n_probes)"
                    " div (2 * CAST(n_probes AS DECIMAL(38,0)))"
                )
                / 1000000.0
            ).alias("fpr"),
            (
                F.floor((load_frac * load_frac) * load_frac * 1000000 + F.lit(0.5))
                / 1000000
            ).alias("predicted_fpr"),
        )
        .orderBy("m_bits")
    )


j_bloom_fpr_curve.__doc__ = j_bloom_fpr_curve.__doc__.replace(
    "{ms}", str(_BFPR_MS)
).replace("{k}", str(_BFPR_K))


# Epoch-plan budget: total training tokens as a multiple of the corpus.
_EPOCH_MULT = 4


@query(
    "j_epoch_plan",
    oracle=f"""
    WITH c AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                      CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tok
               FROM documents GROUP BY lang),
    t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS nd,
                 CAST(SUM(n_tok) AS BIGINT) AS nt FROM c),
    b AS (SELECT lang, n_tok, nt,
                 FLOOR(pow(n_docs * 1.0 / nd, {_TAU}) * 1000000 + 0.5) AS q6raw
          FROM c, t),
    z AS (SELECT CAST(SUM(q6raw) AS BIGINT) AS zz FROM b),
    w AS (SELECT lang, n_tok, nt,
                 CAST((2 * 1000000 * CAST(q6raw AS HUGEINT) + zz)
                      // (2 * CAST(zz AS HUGEINT)) AS BIGINT) AS q6
          FROM b, z),
    plan AS (SELECT lang, n_tok, q6,
                    CAST((2 * {_EPOCH_MULT} * CAST(nt AS HUGEINT) * q6 + 1000000)
                         // (2 * CAST(1000000 AS HUGEINT)) AS BIGINT)
                        AS target_tokens
             FROM w)
    SELECT lang, n_tok AS source_tokens, q6 / 1000000.0 AS mix_share,
           target_tokens,
           CAST(target_tokens // n_tok AS BIGINT) AS full_epochs,
           CAST((2000000 * CAST(target_tokens % n_tok AS HUGEINT) + n_tok)
                // (2 * CAST(n_tok AS HUGEINT)) AS BIGINT) / 1000000.0
               AS partial_epoch
    FROM plan
    """,
)
def j_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-epoch training MIX EXECUTION plan: the j_mix_temperature
    shares (q ∝ p^τ, τ = 0.7, rounded to the 1e-6 grid on both
    engines BEFORE normalization) applied to a token budget of
    {mult}x the corpus — per language, the target token mass, the
    number of FULL passes over that language's data, and the partial
    final epoch. This is the table a training scheduler executes
    (the LLaMA-style data-recipe form): j_mix_temperature says the
    proportions, j_token_budget prices one pass, this turns both
    into integer epochs per source.

    Determinism: the ONE libm pow rounds to a scaled BIGINT per lang
    before the normalizer sum (the j_mix_temperature discipline made
    integer); shares, targets, and the epoch split are pure integer
    (2S+n) div 2n / floordiv / modulo arithmetic — HUGEINT in the
    oracle, DECIMAL(38,0) in Spark (operands widened BEFORE the
    budget multiply: 4·corpus-tokens·q6 passes 2^63 near 2e12
    tokens).

    Plan: one lang hash agg (map-side partials), two 1-row broadcast
    cross-joins (corpus totals, normalizer) — |langs| output rows at
    any corpus scale."""
    t = load(spark, sf_dir)
    c = t.documents.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.size(tokens_col("text"))).cast("long").alias("n_tok"),
    )
    tot = c.agg(
        F.sum("n_docs").cast("long").alias("nd"),
        F.sum("n_tok").cast("long").alias("nt"),
    )
    b = c.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_tok",
        "nt",
        F.floor(
            F.pow(F.col("n_docs") * 1.0 / F.col("nd"), F.lit(_TAU)) * 1000000
            + F.lit(0.5)
        )
        .cast("long")
        .alias("q6raw"),
    )
    b = b.persist()  # normalizer + plan legs
    z = b.agg(F.sum("q6raw").cast("long").alias("zz"))
    w = b.crossJoin(F.broadcast(z)).select(
        "lang",
        "n_tok",
        "nt",
        F.expr(
            "CAST((2 * 1000000 * CAST(q6raw AS DECIMAL(38,0)) + zz)"
            " div (2 * CAST(zz AS DECIMAL(38,0))) AS BIGINT)"
        ).alias("q6"),
    )
    plan = w.select(
        "lang",
        "n_tok",
        "q6",
        F.expr(
            f"CAST((2 * {_EPOCH_MULT} * CAST(nt AS DECIMAL(38,0)) * q6 + 1000000)"
            " div (2 * CAST(1000000 AS DECIMAL(38,0))) AS BIGINT)"
        ).alias("target_tokens"),
    )
    return plan.select(
        "lang",
        F.col("n_tok").alias("source_tokens"),
        (F.col("q6") / F.lit(1000000.0)).alias("mix_share"),
        "target_tokens",
        F.expr("target_tokens div n_tok").cast("long").alias("full_epochs"),
        (
            F.expr(
                "CAST((2000000 * CAST(target_tokens % n_tok AS DECIMAL(38,0)) + n_tok)"
                " div (2 * CAST(n_tok AS DECIMAL(38,0))) AS BIGINT)"
            )
            / 1000000.0
        ).alias("partial_epoch"),
    )


j_epoch_plan.__doc__ = j_epoch_plan.__doc__.replace("{mult}", str(_EPOCH_MULT))


@query(
    "j_bpe_roundtrip",
    oracle=f"""
    WITH {_bpe_ctes(_BPE_ROUNDS)},
    enc AS (SELECT word, CAST(len(s) AS BIGINT) AS n_sub,
                   CASE WHEN md5(array_to_string(s, '')) = md5(word)
                        THEN 1 ELSE 0 END AS ok
            FROM w{_BPE_ROUNDS}),
    tok AS (SELECT source, unnest(string_split(text, ' ')) AS word
            FROM documents)
    SELECT tok.source,
           CAST(COUNT(*) AS BIGINT) AS n_word_occurrences,
           CAST(COUNT(DISTINCT tok.word) AS BIGINT) AS n_distinct_words,
           CAST(SUM(enc.n_sub) AS BIGINT) AS n_subtokens,
           CAST(SUM(1 - enc.ok) AS BIGINT) AS n_roundtrip_fail,
           {sql_rnd("SUM(enc.ok) * 1.0 / COUNT(*)", 6)} AS fidelity,
           {sql_rnd("SUM(enc.n_sub) * 1.0 / COUNT(*)", 6)}
               AS subtokens_per_word
    FROM tok JOIN enc USING (word)
    GROUP BY tok.source
    """,
)
def j_bpe_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE encode -> decode ROUND-TRIP fidelity over the trained merges
    (the tokenizer-integrity audit the r14 verdict queued): decode is
    separator-free concatenation of each word's final segmentation, and
    the proof is BYTE-LEVEL — md5(concat(subtokens)) == md5(word),
    checked per vocabulary word and rolled up occurrence-weighted per
    source. Lossless segmentation is a THEOREM of correct BPE (merges
    only ever join adjacent symbols), so n_roundtrip_fail > 0 is always
    a tokenizer-implementation bug — the tripwire a training pipeline
    wants between tokenizer training and corpus billing; the live
    columns (occurrence/vocab/subtoken counts, fan-out ratio) carry the
    per-source billing signal alongside.

    EXACT: md5 equality and counts are integers end-to-end; the two
    ratios are single int/int divisions rounded 1e-6.

    Plan: the merge table is trained once (j_bpe_train's collected
    1-row-per-round argmax discipline — corpus scanned once, linear
    lineage); the audit itself is a BROADCAST join of the corpus token
    stream against the Heaps-law-small vocabulary segmentation carrying
    (n_sub, ok) and ONE per-source hash agg. Zero extra shuffles beyond
    j_bpe_encode's shape; at 100 TB the md5 proof rides the same scan
    the billing numbers already pay for."""
    t = load(spark, sf_dir)
    _, wfinal = _bpe_frames(spark, t)
    enc = wfinal.select(
        "word",
        F.size("s").cast("long").alias("n_sub"),
        (F.md5(F.array_join("s", "")) == F.md5(F.col("word")))
        .cast("long")
        .alias("ok"),
    )
    tok = t.documents.select("source", F.explode(tokens_col("text")).alias("word"))
    return (
        tok.join(F.broadcast(enc), "word")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_word_occurrences"),
            F.countDistinct("word").cast("long").alias("n_distinct_words"),
            F.sum("n_sub").cast("long").alias("n_subtokens"),
            F.sum(1 - F.col("ok")).cast("long").alias("n_roundtrip_fail"),
            rnd(F.sum("ok") * 1.0 / F.count("*"), 6).alias("fidelity"),
            rnd(F.sum("n_sub") * 1.0 / F.count("*"), 6).alias("subtokens_per_word"),
        )
    )
