"""§2.J additions (r5) — corpus-quality / data-mixture operators a
production training-data pipeline runs alongside dedup and filtering:
repetition signals (Gopher-style duplicate n-gram fractions), domain
mixture reweighting, unigram-LM quality scoring, and embedding-space
outlier detection.

Fixture calibration: documents share a 31-token vocabulary (so
duplicate-bigram fractions are substantial and discriminative) and
embeddings are L2-normalized 64-dim (so outliers are measured as
distance to the label centroid, not vector norm).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import rnd
from ..operators.dedup import tokens_col
from ..operators.similarity import as_double
from ..registry import query
from ..tables import load, spread


def ngrams_col(text: str | Column = "text", k: int = 2) -> Column:
    """Positional (NON-distinct) k-token n-grams as array<string> —
    repetition metrics need every occurrence, unlike the deduped
    shingles_col. Same slice+zip_with shape (split() evaluated k times
    per row, not once per n-gram position)."""
    toks = tokens_col(text)
    m = F.greatest(F.size(toks) - (k - 1), F.lit(0))
    parts = [F.slice(toks, j + 1, m) for j in range(k)]
    out = parts[0]
    for j in range(1, k):
        out = F.zip_with(out, parts[j], lambda a, b: F.concat(a, F.lit(" "), b))
    return out


@query(
    "j_repetition",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    g AS (SELECT doc_id, len(toks) AS n,
            list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
                           i -> toks[i] || ' ' || toks[i + 1]) AS g2,
            list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                           i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]) AS g3
          FROM t),
    tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
    tc AS (SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY doc_id, tok),
    tt AS (SELECT doc_id, MAX(c) AS mx FROM tc GROUP BY doc_id),
    sig AS (
      SELECT g.doc_id, CAST(g.n AS BIGINT) AS n_tokens,
             CASE WHEN len(g2) > 0
                  THEN 1.0 - len(list_distinct(g2)) * 1.0 / len(g2) ELSE 0.0 END AS d2,
             CASE WHEN len(g3) > 0
                  THEN 1.0 - len(list_distinct(g3)) * 1.0 / len(g3) ELSE 0.0 END AS d3,
             tt.mx * 1.0 / g.n AS tf
      FROM g JOIN tt USING (doc_id))
    SELECT doc_id, n_tokens,
           FLOOR(d2 * 1000000 + 0.5) / 1000000 AS dup_2gram_frac,
           FLOOR(d3 * 1000000 + 0.5) / 1000000 AS dup_3gram_frac,
           FLOOR(tf * 1000000 + 0.5) / 1000000 AS top_token_frac,
           (d2 > 0.5 OR d3 > 0.3 OR tf > 0.2) AS repetitive
    FROM sig
    """,
)
def j_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition signals per document (the Gopher/C4 family, public):
    duplicate bigram/trigram fractions + most-frequent-token fraction →
    a `repetitive` flag. The n-gram fractions are pure array expressions
    on the scan (zero shuffles); the top-token fraction is the one part
    that genuinely needs explode → two hash aggs keyed by doc_id, then a
    doc_id-keyed join back — at 100 TB both aggs partial-aggregate
    map-side and the join key is the table's natural key, so the shuffle
    carries one row per (doc, distinct-token), never raw text."""
    t = load(spark, sf_dir)
    toks = tokens_col("text")
    # n-gram arrays are materialized through their own projection before
    # the three references each (size guard, distinct-size, divisor):
    # inlined, Catalyst re-evaluates the whole split+zip_with chain per
    # reference (9 zip_with / 31 split nodes in the physical plan vs
    # 3 / 11 staged — measured 2x slower at sf0.1).
    # spread: the split+zip_with n-gram chains and the explode leg are
    # per-row compute off a single row-group scan — ONE task without it
    # (no-op at scale, tables.spread)
    docs = spread(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        ngrams_col("text", 2).alias("g2"),
        ngrams_col("text", 3).alias("g3"),
    )

    def dup_frac(c):
        return F.when(
            F.size(c) > 0, 1.0 - F.size(F.array_distinct(c)) * 1.0 / F.size(c)
        ).otherwise(0.0)

    sig = base.select(
        "doc_id",
        "n_tokens",
        dup_frac(F.col("g2")).alias("d2"),
        dup_frac(F.col("g3")).alias("d3"),
    )
    top = (
        docs.select("doc_id", F.explode(toks).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("mx"))
    )
    tf = F.col("mx") * 1.0 / F.col("n_tokens")
    return sig.join(top, "doc_id").select(
        "doc_id",
        "n_tokens",
        rnd(F.col("d2"), 6).alias("dup_2gram_frac"),
        rnd(F.col("d3"), 6).alias("dup_3gram_frac"),
        rnd(tf, 6).alias("top_token_frac"),
        ((F.col("d2") > 0.5) | (F.col("d3") > 0.3) | (tf > 0.2)).alias("repetitive"),
    )


@query(
    "j_domain_mix",
    oracle="""
    WITH per AS (
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source),
    tot AS (SELECT COUNT(*) AS n, COUNT(DISTINCT source) AS s FROM documents)
    SELECT source, n_docs, n_tokens,
           FLOOR((n_docs * 1.0 / tot.n) * 1000000 + 0.5) / 1000000 AS actual_frac,
           FLOOR((1.0 / tot.s) * 1000000 + 0.5) / 1000000 AS target_frac,
           FLOOR(least((1.0 / tot.s) / (n_docs * 1.0 / tot.n), 4.0) * 1000000 + 0.5)
             / 1000000 AS mix_weight
    FROM per CROSS JOIN tot
    """,
)
def j_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture reweighting: per-source sampling weights that move
    the corpus toward a uniform target mixture, upsampling capped at 4x
    (the public DoReMi/Pile-style recipe shape). One hash agg by source
    plus a broadcast 1-row totals cross-join — corpus size and domain
    count enter the plan as aggregates, never as driver-side .count()
    sync points, so building this DataFrame runs zero jobs."""
    t = load(spark, sf_dir)
    per = t.documents.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(tokens_col("text"))).cast("long").alias("n_tokens"),
    )
    tot = t.documents.agg(
        F.count("*").alias("n"), F.countDistinct("source").alias("s")
    )
    actual = F.col("n_docs") * 1.0 / F.col("n")
    target = 1.0 / F.col("s")
    return per.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        rnd(actual, 6).alias("actual_frac"),
        rnd(target, 6).alias("target_frac"),
        rnd(F.least(target / actual, F.lit(4.0)), 6).alias("mix_weight"),
    )


_LM_SQL = """
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
    cnt AS (SELECT term, COUNT(*) AS c FROM tok GROUP BY term),
    tot AS (SELECT SUM(c) AS t, COUNT(*) AS v FROM cnt),
    scored AS (
      SELECT tok.doc_id, ln((cnt.c + 1.0) / (tot.t + tot.v)) AS lp
      FROM tok JOIN cnt USING (term) CROSS JOIN tot)
    SELECT doc_id, COUNT(*) AS n_tokens,
           FLOOR((AVG(lp)) * 10000 + 0.5) / 10000 AS avg_logp
    FROM scored GROUP BY doc_id
"""


@query("j_ngram_lm", oracle=_LM_SQL)
def j_ngram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM quality score: mean add-one-smoothed log-probability
    of each document under a model trained on the corpus itself (the
    public CCNet/KenLM-filtering recipe, reduced to the unigram case
    that built-in expressions cover). Scale shape: one explode → token
    counts (vocab-sized, broadcast), totals as a broadcast 1-row agg,
    then a per-doc hash agg — the only data-sized shuffle is the final
    groupBy(doc_id). Scores round to 4 decimals (like j_lang_id) so the
    float sum order across engines cannot flip the hash."""
    t = load(spark, sf_dir)
    tok = t.documents.select("doc_id", F.explode(tokens_col("text")).alias("term"))
    cnt = tok.groupBy("term").agg(F.count("*").alias("c"))
    tot = cnt.agg(F.sum("c").alias("t"), F.count("*").alias("v"))
    return (
        tok.join(F.broadcast(cnt), "term")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", F.log((F.col("c") + 1.0) / (F.col("t") + F.col("v"))).alias("lp"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            rnd(F.avg("lp"), 4).alias("avg_logp"),
        )
    )


@query(
    "j_lm_buckets",
    oracle=f"""
    WITH lm AS ({_LM_SQL}),
    cut AS (SELECT quantile_cont(avg_logp, [0.3333333333333333, 0.6666666666666666]) AS cs
            FROM lm)
    SELECT doc_id, avg_logp,
           CASE WHEN avg_logp <= cs[1] THEN 'tail'
                WHEN avg_logp <= cs[2] THEN 'middle'
                ELSE 'head' END AS bucket
    FROM lm CROSS JOIN cut
    """,
)
def j_lm_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing: documents split into
    head/middle/tail by LM-score terciles (head = most probable). The
    cutpoints enter the plan as a broadcast 1-row percentile aggregate —
    bucketing is then a stateless comparison on the scan, NOT a global
    ntile() window (which would move every row to one partition). At
    100 TB swap `percentile` for `approx_percentile`: the bucketing
    expression is unchanged, only the sketch that feeds it; exact
    percentile is kept here so the oracle matches bit-for-bit.

    Tercile comparisons are engine-stable: scores are pre-rounded to
    1e-4, so interpolated cutpoints either equal a score exactly (both
    engines agree) or sit >= 5e-5 away — last-ulp interpolation
    differences cannot flip a bucket."""
    return lm_buckets(spark, sf_dir, approx=False)


def lm_buckets(spark: SparkSession, sf_dir: str, approx: bool = False) -> DataFrame:
    """The j_lm_buckets plan with the percentile sketch selectable:
    exact `percentile` for oracle-checkable small-SF runs, and the
    100 TB path `approx_percentile` (t-digest: mergeable, bounded
    memory, one pass) — the bucketing expression and the broadcast
    1-row cutpoint aggregate are IDENTICAL either way, which is the
    whole point: the swap touches the sketch only, never the plan
    shape. The approx variant is exercised by
    tests/test_scale_paths.py::test_lm_buckets_approx_swap."""
    scores = j_ngram_lm(spark, sf_dir)
    fracs = "array(0.3333333333333333D, 0.6666666666666666D)"
    sketch = (
        f"approx_percentile(avg_logp, {fracs}, 10000)"
        if approx
        else f"percentile(avg_logp, {fracs})"
    )
    cuts = scores.agg(F.expr(sketch).alias("cs"))
    c1, c2 = F.element_at("cs", 1), F.element_at("cs", 2)
    return scores.crossJoin(F.broadcast(cuts)).select(
        "doc_id",
        "avg_logp",
        F.when(F.col("avg_logp") <= c1, "tail")
        .when(F.col("avg_logp") <= c2, "middle")
        .otherwise("head")
        .alias("bucket"),
    )


_WINNOW_K = 3  # k-gram size
_WINNOW_W = 4  # winnowing window (consecutive k-gram hashes per window)


@query(
    "j_winnow_fingerprints",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    h AS (SELECT doc_id,
            list_transform(range(1, greatest(len(toks) - {_WINNOW_K - 1}, 0) + 1),
              i -> md5(toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS hs
          FROM t),
    w AS (SELECT doc_id,
            list_transform(range(1, greatest(len(hs) - {_WINNOW_W - 1}, 0) + 1),
              i -> list_min(hs[i:i + {_WINNOW_W - 1}])) AS wins
          FROM h)
    SELECT doc_id, unnest(list_distinct(wins)) AS fingerprint FROM w
    """,
)
def j_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint index (the MOSS/local-fingerprinting
    algorithm, public): md5 over positional 3-gram shingles, min hash
    per sliding window of 4, distinct selected fingerprints per
    document — the guarantee is every shared substring of length
    >= k+w-1 = 6 tokens produces at least one shared fingerprint.
    All array HOFs on the scan (the window-min is zip_with(least) over
    w shifted slices), then one explode; at 100 TB the output is the
    posting list a substring-dedup join consumes, partitioned by
    fingerprint.

    The hash array is MATERIALIZED through its own projection before
    the w slices reference it: inlined, Catalyst duplicates the
    transform(md5) into every slice (8 md5 evaluations per row in the
    physical plan — measured 3.7x slower at sf0.1); staged, the plan
    carries exactly one."""
    t = load(spark, sf_dir)
    hs = F.transform(ngrams_col("text", _WINNOW_K), F.md5)
    staged = spread(spark, sf_dir, "documents").select("doc_id", hs.alias("hs"))
    h = F.col("hs")
    m = F.greatest(F.size(h) - (_WINNOW_W - 1), F.lit(0))
    wins = F.slice(h, 1, m)
    for j in range(1, _WINNOW_W):
        wins = F.zip_with(wins, F.slice(h, j + 1, m), lambda a, b: F.least(a, b))
    return staged.select(
        "doc_id", F.explode(F.array_distinct(wins)).alias("fingerprint")
    )


@query(
    "j_embed_outlier",
    oracle="""
    WITH flat AS (
      SELECT vec_id, label,
             generate_subscripts(embedding, 1) AS dim,
             unnest(CAST(embedding AS DOUBLE[])) AS x
      FROM embeddings),
    cent AS (SELECT label, dim, AVG(x) AS c FROM flat GROUP BY label, dim),
    d AS (SELECT flat.vec_id, flat.label,
                 FLOOR(sqrt(SUM((x - c) * (x - c))) * 1000000 + 0.5) / 1000000 AS dist
          FROM flat JOIN cent ON cent.label = flat.label AND cent.dim = flat.dim
          GROUP BY flat.vec_id, flat.label),
    st AS (SELECT label, FLOOR(AVG(dist) * 1000000 + 0.5) / 1000000 AS mu,
                  FLOOR(stddev_pop(dist) * 1000000 + 0.5) / 1000000 AS sd
           FROM d GROUP BY label)
    SELECT d.vec_id, d.label, dist AS dist_to_centroid,
           dist > mu + 2 * sd AS is_outlier
    FROM d JOIN st USING (label)
    """,
)
def j_embed_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space outlier detection (mislabeled/noise candidates):
    distance to the label centroid, flagged beyond mean + 2 sigma of the
    label. Vectors are L2-normalized so norm-based checks are blind —
    centroid distance is the discriminating signal. Scale shape:
    posexplode → centroid agg (labels x dims rows — broadcast) → joined
    recomposition keyed by vec_id, then label-level stats broadcast back;
    no window over a skewed label partition, no driver-side model state.

    dist, mu, and sd are all pre-rounded to 1e-6 BEFORE the 2-sigma
    comparison (the j_semdedup/j_lm_buckets convention): they come from
    order-dependent float sums, and an unrounded threshold test could
    flip for a vector sitting at the boundary between engines."""
    t = load(spark, sf_dir)
    flat = t.embeddings.select(
        "vec_id", "label", F.posexplode(as_double("embedding")).alias("pos", "x")
    )
    cent = flat.groupBy("label", "pos").agg(F.avg("x").alias("c"))
    d = (
        flat.join(F.broadcast(cent), ["label", "pos"])
        .groupBy("vec_id", "label")
        .agg(
            rnd(
                F.sqrt(F.sum((F.col("x") - F.col("c")) * (F.col("x") - F.col("c")))), 6
            ).alias("dist")
        )
    )
    st = d.groupBy("label").agg(
        rnd(F.avg("dist"), 6).alias("mu"), rnd(F.stddev_pop("dist"), 6).alias("sd")
    )
    return d.join(F.broadcast(st), "label").select(
        "vec_id",
        "label",
        F.col("dist").alias("dist_to_centroid"),
        (F.col("dist") > F.col("mu") + 2 * F.col("sd")).alias("is_outlier"),
    )


# ------------------------------------------------------------ DSIR (r6)

_DSIR_B = 1024  # hashed-feature buckets
_DSIR_TARGET = "src0"  # target domain (DSIR's "Wikipedia" stand-in)

_DSIR_HB_SQL = f"""
    tok AS (SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents),
    ng AS (SELECT doc_id, source,
             unnest(list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
               i -> toks[i] || ' ' || toks[i + 1])) AS ng
           FROM tok),
    hb AS (SELECT doc_id, source,
             CAST(concat('0x', substr(md5(ng), 9, 8)) AS BIGINT) % {_DSIR_B} AS b
           FROM ng)
"""


@query(
    "j_dsir_weights",
    oracle=f"""
    WITH {_DSIR_HB_SQL},
    cnt AS (SELECT b, COUNT(*) AS qc,
                   SUM(CASE WHEN source = '{_DSIR_TARGET}' THEN 1 ELSE 0 END) AS tc
            FROM hb GROUP BY b),
    tot AS (SELECT SUM(qc) AS qt, SUM(tc) AS tt FROM cnt),
    lr AS (SELECT b,
             CAST(FLOOR((ln((tc + 1.0) / (tt + {_DSIR_B})) - ln((qc + 1.0) / (qt + {_DSIR_B})))
                   * 1000000 + 0.5) AS BIGINT) AS lr_u
           FROM cnt, tot)
    SELECT doc_id, COUNT(*) AS n_ngrams,
           FLOOR(SUM(lr_u) / 100.0 + 0.5) / 10000 AS log_w
    FROM hb JOIN lr USING (b)
    GROUP BY doc_id
    """,
)
def j_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, public): log importance
    of each document under hashed-bigram bag-of-ngrams models of a
    TARGET domain vs the RAW corpus — the data-selection signal used to
    resample pretraining data toward a high-quality distribution.
    log_w(doc) = Σ_ngram [ln p_target(b) - ln p_raw(b)] over the
    ngram's hash bucket b, add-1 smoothed over B=1024 buckets.

    Scale shape: bucket counts are a B-bounded hash agg (map-side
    partials, B rows total), totals a broadcast 1-row agg, the
    log-ratio table a broadcast B-row join — the only data-sized
    shuffle is the final doc_id aggregation. The bucket hash is the
    portable low md5 word, so the oracle recomputes it exactly.

    Float parity: per-bucket log-ratios are FLOORED TO SCALED BIGINTS
    (lr_u = floor(lr*1e6+0.5)) and the per-doc sum runs in exact
    integer arithmetic — summing the rounded DOUBLES instead left the
    total order-dependent in its last ulp, which flipped the 1e-4
    display floor for docs whose sum sat exactly on a .00005 boundary
    (caught by the sf0.1 sweep: 15 of 50k docs, invisible at sf0.01).
    log_w = floor(s/100.0 + 0.5)/1e4 is then deterministic: s is
    exactly representable, and (100k+50)/100.0 yields k+0.5 exactly in
    IEEE, so the boundary case itself is engine-independent. Docs with
    < 2 tokens have no features and are excluded (DSIR is undefined on
    them)."""
    from ..operators.dedup import portable_bucket

    t = load(spark, sf_dir)
    base = t.documents.select(
        "doc_id", "source", F.explode(ngrams_col("text", 2)).alias("ng")
    )
    # persisted: the exploded (doc_id, source, bucket) frame feeds BOTH
    # the bucket-count aggregate and the final join-back — unpersisted,
    # Spark recomputes the explode + md5 chain per consumer (the
    # multi-consumer rule the LSH/ngram qids follow; measured ~2x here)
    g = base.select(
        "doc_id", "source", portable_bucket(F.col("ng"), _DSIR_B).alias("b")
    ).persist()
    cnt = g.groupBy("b").agg(
        F.count("*").alias("qc"),
        F.sum(F.when(F.col("source") == _DSIR_TARGET, 1).otherwise(0)).alias("tc"),
    )
    tot = cnt.agg(F.sum("qc").alias("qt"), F.sum("tc").alias("tt"))
    lr = cnt.crossJoin(F.broadcast(tot)).select(
        "b",
        F.floor(
            (
                F.log((F.col("tc") + 1.0) / (F.col("tt") + _DSIR_B))
                - F.log((F.col("qc") + 1.0) / (F.col("qt") + _DSIR_B))
            )
            * 1000000
            + F.lit(0.5)
        )
        .cast("long")
        .alias("lr_u"),
    )
    return (
        g.join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_ngrams"), F.sum("lr_u").alias("_s"))
        .select(
            "doc_id",
            "n_ngrams",
            (F.floor(F.col("_s") / 100.0 + F.lit(0.5)) / 10000).alias("log_w"),
        )
    )


# Winnow-pair candidates: pairs sharing >= _WINNOW_MIN_SHARED selected
# fingerprints; fingerprints appearing in > _WINNOW_DF_CAP documents are
# dropped as corpus boilerplate before pairing (skew guard, mirrored in
# the oracle — the j_dedup_containment df-cap convention).
_WINNOW_MIN_SHARED = 3
_WINNOW_DF_CAP = 50


def _winnow_pairs_oracle() -> str:
    """Composes the registered winnowing-index oracle into the pair
    query (registry lookup at decoration time, after
    j_winnow_fingerprints registers)."""
    from ..registry import ORACLE

    return f"""
    WITH fp AS ({ORACLE["j_winnow_fingerprints"]}),
    keep AS (SELECT fingerprint FROM fp GROUP BY fingerprint
             HAVING COUNT(*) <= {_WINNOW_DF_CAP}),
    k AS (SELECT fp.doc_id, fp.fingerprint FROM fp JOIN keep USING (fingerprint))
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM k a JOIN k b ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING COUNT(*) >= {_WINNOW_MIN_SHARED}
    """


@query("j_winnow_pairs", oracle=_winnow_pairs_oracle())
def j_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The JOIN consumer of the winnowing index: candidate near-dup
    pairs sharing >= {m} selected fingerprints — the MOSS match step,
    and the substring-level candidate generator that complements
    token-set LSH (a shared fingerprint certifies a shared substring of
    >= k+w-1 = 6 tokens, so these candidates localize WHERE the overlap
    is, which Jaccard-style signals cannot).

    Plan: the registered index plan is reused verbatim (registry
    lookup), then ONE fingerprint-keyed equi-join of the posting list
    against itself + a pair-keyed count agg. The df-cap (> {cap} docs)
    drops corpus-boilerplate fingerprints BEFORE pairing — identical
    filter in the oracle — which is the skew guard: posting-list join
    fan-out is bounded by {cap}^2 per fingerprint regardless of corpus
    size (the j_dedup_containment convention). The posting frame
    persists across its df-vote and join-probe consumers."""
    from ..registry import QUERIES

    fp = QUERIES["j_winnow_fingerprints"](spark, sf_dir)
    fp.persist()  # consumers: df vote + two join legs
    keep = fp.groupBy("fingerprint").agg(F.count("*").alias("df")).where(
        F.col("df") <= _WINNOW_DF_CAP
    )
    k = fp.join(F.broadcast(keep.select("fingerprint")), "fingerprint")
    a = k.select(F.col("fingerprint"), F.col("doc_id").alias("id_a"))
    b = k.select(F.col("fingerprint"), F.col("doc_id").alias("id_b"))
    return (
        a.join(b, "fingerprint")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("long").alias("n_shared"))
        .where(F.col("n_shared") >= _WINNOW_MIN_SHARED)
    )


j_winnow_pairs.__doc__ = j_winnow_pairs.__doc__.replace(
    "{m}", str(_WINNOW_MIN_SHARED)
).replace("{cap}", str(_WINNOW_DF_CAP))


@query(
    "j_head_template",
    oracle="""
    WITH h AS (SELECT source,
                      md5(array_to_string(
                        array_slice(string_split(text, ' '), 1, 8), ' '))
                        AS head_md5
               FROM documents),
    c AS (SELECT source, head_md5, CAST(COUNT(*) AS BIGINT) AS n
          FROM h GROUP BY source, head_md5),
    t AS (SELECT source, CAST(SUM(n) AS BIGINT) AS n_docs,
                 CAST(COUNT(*) AS BIGINT) AS n_templates
          FROM c GROUP BY source),
    top AS (SELECT source, head_md5 AS top_head_md5, n AS n_top FROM (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                                           ORDER BY n DESC, head_md5) AS rk
              FROM c) WHERE rk = 1)
    SELECT t.source, n_docs, n_templates, top_head_md5, n_top,
           FLOOR(n_top * 1.0 / n_docs * 1000000 + 0.5) / 1000000
             AS top_share
    FROM t JOIN top USING (source)
    """,
)
def j_head_template(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Head-template boilerplate detector: the md5 of each document's
    first 8 tokens groups documents that open identically — the
    page-header / navigation / license-preamble signature that
    doc-level dedup misses (bodies differ) and line-level dedup
    over-segments. Per source: distinct head count, the dominant head,
    and its share; a share spike says the source needs a
    template-strip pass (j_dedup_chunks at chunk granularity, or
    j_span-style skipping at tokenize time).

    Plan: one zero-explode scan (slice + join + md5 per row), a
    (source, digest) hash agg whose shuffle carries 16-byte digests,
    a |sources|-row totals agg, and a per-source top-1 window over the
    digest-count relation (metadata-sized). Output = one row per
    source at any corpus size."""
    t = load(spark, sf_dir)
    h = t.documents.select(
        "source",
        F.md5(F.array_join(F.slice(tokens_col("text"), 1, 8), " ")).alias("head_md5"),
    )
    c = h.groupBy("source", "head_md5").agg(F.count("*").cast("long").alias("n"))
    tot = c.groupBy("source").agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.count("*").cast("long").alias("n_templates"),
    )
    w = Window.partitionBy("source").orderBy(F.col("n").desc(), F.col("head_md5").asc())
    top = (
        c.select("*", F.row_number().over(w).alias("rk"))
        .where(F.col("rk") == 1)
        .select("source", F.col("head_md5").alias("top_head_md5"), F.col("n").alias("n_top"))
    )
    return tot.join(top, "source").select(
        "source",
        "n_docs",
        "n_templates",
        "top_head_md5",
        "n_top",
        rnd(F.col("n_top") * 1.0 / F.col("n_docs"), 6).alias("top_share"),
    )


@query(
    "j_feature_corr",
    oracle="""
    WITH f AS (SELECT source,
                      CAST(n_chars AS BIGINT) AS x,
                      CAST(len(string_split(text, ' ')) AS BIGINT) AS y
               FROM documents),
    m AS (SELECT source,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx,
                 CAST(SUM(y) AS BIGINT) AS sy,
                 SUM(x * x) AS sxx,
                 SUM(y * y) AS syy,
                 SUM(x * y) AS sxy
          FROM f GROUP BY source),
    d AS (SELECT source, n, sx, sy,
                 n * sxy - sx * sy AS num,
                 n * sxx - sx * sx AS d1,
                 n * syy - sy * sy AS d2
          FROM m)
    SELECT source, n AS n_docs, sx AS sum_chars, sy AS sum_tokens,
           CAST(num AS DOUBLE) AS cov_num,
           CASE WHEN d1 > 0 AND d2 > 0
                THEN FLOOR(CAST(num AS DOUBLE)
                           / (sqrt(CAST(d1 AS DOUBLE)) * sqrt(CAST(d2 AS DOUBLE)))
                           * 1000000 + 0.5) / 1000000
                ELSE NULL END AS pearson_r,
           CASE WHEN d1 > 0
                THEN FLOOR(CAST(num AS DOUBLE) / CAST(d1 AS DOUBLE)
                           * 1000000 + 0.5) / 1000000
                ELSE NULL END AS slope
    FROM d
    """,
)
def j_feature_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Pearson correlation (and regression slope) between
    document length in chars and in whitespace tokens — the metadata-
    integrity audit behind every length filter: a source whose
    char/token correlation collapses is mixing scripts or carrying
    tokenizer-hostile content (CJK without spaces, minified code,
    base64 blobs), and its char-keyed length filter silently measures
    the wrong thing there. The slope is chars-per-token's regression
    twin, robust to the intercept.

    EXACT moments: all five sums accumulate in exact integer
    arithmetic (Spark DECIMAL(38,0) ↔ DuckDB HUGEINT for the three
    product sums — n·Σx² style terms overflow BIGINT past ~10⁹ docs
    per source), so num/d1/d2 are order-free integers; r and the
    slope apply IEEE-correctly-rounded sqrt + one division to the
    SAME integers on both engines, then floor 1e-6. Degenerate
    sources (constant feature → d=0) yield NULL, not a div-by-zero.

    Plan: one narrow map into ONE |sources|-keyed hash agg with
    map-side partials; the correlation arithmetic runs on |sources|
    rows. Only (source, six numbers) ever shuffles."""
    t = load(spark, sf_dir)
    dec = "decimal(38,0)"
    f = t.documents.select(
        "source",
        F.col("n_chars").cast("long").alias("x"),
        F.size(tokens_col("text")).cast("long").alias("y"),
    )
    m = f.groupBy("source").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast(dec)).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast(dec)).alias("syy"),
        F.sum((F.col("x") * F.col("y")).cast(dec)).alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx").cast(dec) * F.col("sy").cast(dec)
    d1 = F.col("n") * F.col("sxx") - F.col("sx").cast(dec) * F.col("sx").cast(dec)
    d2 = F.col("n") * F.col("syy") - F.col("sy").cast(dec) * F.col("sy").cast(dec)
    d = m.select("source", "n", "sx", "sy",
                 num.alias("num"), d1.alias("d1"), d2.alias("d2"))
    r = (
        F.floor(
            F.col("num").cast("double")
            / (F.sqrt(F.col("d1").cast("double")) * F.sqrt(F.col("d2").cast("double")))
            * 1000000
            + F.lit(0.5)
        )
        / 1000000
    )
    slope = (
        F.floor(
            F.col("num").cast("double") / F.col("d1").cast("double") * 1000000
            + F.lit(0.5)
        )
        / 1000000
    )
    return d.select(
        "source",
        F.col("n").alias("n_docs"),
        F.col("sx").alias("sum_chars"),
        F.col("sy").alias("sum_tokens"),
        # DOUBLE on purpose: a BIGINT display cast would wrap in Spark
        # but raise in DuckDB once num passes 2^63; the double rounding
        # is identical (round-to-nearest) on both engines at any scale.
        F.col("num").cast("double").alias("cov_num"),
        F.when((F.col("d1") > 0) & (F.col("d2") > 0), r).alias("pearson_r"),
        F.when(F.col("d1") > 0, slope).alias("slope"),
    )


# Text-integrity tripwires (r15): the byte-level corruption classes an
# ingestion pipeline must catch BEFORE tokenization — classic
# UTF-8-read-as-Latin-1 mojibake digraphs, the U+FFFD replacement char
# a lossy decode leaves behind, and raw control bytes. The fixture
# corpus is clean ASCII, so the tripwire columns read 0 here BY DESIGN
# (the oracle verifies the same detectors compute the same zeros); the
# detectors themselves are proven to fire on crafted dirty rows in
# tests/test_r15_props.py.
_TI_CTRL = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"


@query(
    "j_text_integrity",
    oracle=f"""
    WITH d AS (SELECT source,
                      CASE WHEN regexp_matches(text, '{_TI_CTRL}')
                           THEN 1 ELSE 0 END AS is_ctrl,
                      CASE WHEN contains(text, chr(65533))
                           THEN 1 ELSE 0 END AS is_repl,
                      CASE WHEN contains(text, chr(195))
                             OR contains(text, chr(226) || chr(8364))
                           THEN 1 ELSE 0 END AS is_moji,
                      CASE WHEN strlen(text) <> length(text)
                           THEN 1 ELSE 0 END AS is_nonascii,
                      length(regexp_replace(text, '[^a-z]', '', 'g'))
                          AS letters,
                      length(text) - length(replace(text, ' ', ''))
                          AS spaces,
                      length(text) AS chars
               FROM documents)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(is_ctrl) AS BIGINT) AS ctrl_docs,
           CAST(SUM(is_repl) AS BIGINT) AS repl_docs,
           CAST(SUM(is_moji) AS BIGINT) AS moji_docs,
           CAST(SUM(is_nonascii) AS BIGINT) AS non_ascii_docs,
           FLOOR((COUNT(*) - SUM(is_nonascii)) * 1.0 / COUNT(*)
                 * 1000000 + 0.5) / 1000000 AS ascii_share,
           CAST(SUM(letters) AS BIGINT) AS letter_chars,
           CAST(SUM(spaces) AS BIGINT) AS space_chars,
           FLOOR(SUM(chars) * 1.0 / COUNT(*) * 1000000 + 0.5) / 1000000
               AS mean_chars
    FROM d GROUP BY source
    """,
)
def j_text_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source text-INTEGRITY audit — the encoding-level tripwires
    upstream of every token-level quality score (j_quality_score /
    j_clean_text assume their input already decoded cleanly; this
    relation is what PROVES it): documents carrying raw control bytes,
    the U+FFFD replacement character (the scar a lossy UTF-8 decode
    leaves), and the classic UTF-8-read-as-Latin-1 mojibake digraphs
    ('Ã', 'â€'), beside the byte-vs-char length disagreement that
    flags any non-ASCII content at all — plus the character-class
    composition (letters / spaces / mean length) that carries live
    signal on every corpus. On this clean-ASCII fixture the tripwires
    read zero BY DESIGN and the oracle pins that the two engines'
    detectors agree on those zeros; the detectors fire on dirty rows
    (proven in tests/test_r15_props.py on crafted strings).

    EXACT: every detector is an integer indicator (regexp/contains/
    length compares — no float until the two display ratios, rnd 1e-6).
    The replacement char and mojibake literals enter DuckDB as chr()
    codepoints and Spark as Python unicode escapes, so no non-ASCII
    bytes live in SQL text.

    Plan: ONE narrow projection over the corpus scan (every detector is
    a stateless map — WholeStageCodegen keeps it in one pass) feeding
    ONE per-source hash agg with map-side partials. Zero joins, zero
    windows; at 100 TB this is scan-speed."""
    t = load(spark, sf_dir)
    text = F.col("text")
    d = t.documents.select(
        "source",
        text.rlike(_TI_CTRL).cast("long").alias("is_ctrl"),
        text.contains(F.lit("\ufffd")).cast("long").alias("is_repl"),
        (text.contains(F.lit("\u00c3")) | text.contains(F.lit("\u00e2\u20ac")))
        .cast("long")
        .alias("is_moji"),
        (F.octet_length(text) != F.length(text)).cast("long").alias("is_nonascii"),
        F.length(F.regexp_replace(text, "[^a-z]", "")).cast("long").alias("letters"),
        (F.length(text) - F.length(F.replace(text, F.lit(" "), F.lit(""))))
        .cast("long")
        .alias("spaces"),
        F.length(text).cast("long").alias("chars"),
    )
    return d.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("is_ctrl").cast("long").alias("ctrl_docs"),
        F.sum("is_repl").cast("long").alias("repl_docs"),
        F.sum("is_moji").cast("long").alias("moji_docs"),
        F.sum("is_nonascii").cast("long").alias("non_ascii_docs"),
        rnd((F.count("*") - F.sum("is_nonascii")) * 1.0 / F.count("*"), 6).alias(
            "ascii_share"
        ),
        F.sum("letters").cast("long").alias("letter_chars"),
        F.sum("spaces").cast("long").alias("space_chars"),
        rnd(F.sum("chars") * 1.0 / F.count("*"), 6).alias("mean_chars"),
    )


def text_integrity_flags(text: Column) -> list[Column]:
    """The three tripwire detectors as reusable columns (ctrl, repl,
    moji) — exported so tests can prove they FIRE on dirty strings (the
    fixture corpus is clean, so the qid's zeros alone would be a
    vacuous detector)."""
    return [
        text.rlike(_TI_CTRL).cast("long"),
        text.contains(F.lit("\ufffd")).cast("long"),
        (text.contains(F.lit("\u00c3")) | text.contains(F.lit("\u00e2\u20ac"))).cast(
            "long"
        ),
    ]


# Flesch reading-ease class boundaries (compare on the ROUNDED score).
_FRE_EASY = 70.0
_FRE_STANDARD = 50.0


@query(
    "j_readability",
    oracle="""
    WITH per AS (
      SELECT source,
             CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS BIGINT)
               AS w,
             CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
               AS y,
             CAST(GREATEST(1, len(regexp_extract_all(text, '[.!?]+')))
                  AS BIGINT) AS s
      FROM documents),
    agg AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(w) AS BIGINT) AS n_words,
             CAST(SUM(s) AS BIGINT) AS n_sentences,
             CAST(GREATEST(SUM(y), SUM(w)) AS BIGINT) AS n_syllables
      FROM per GROUP BY source),
    r AS (
      SELECT *,
             CAST(n_words AS DOUBLE) / n_sentences AS wps,
             CAST(n_syllables AS DOUBLE) / n_words AS spw
      FROM agg),
    f AS (
      SELECT source, n_docs, n_words, n_sentences, n_syllables,
             FLOOR(wps * 10000 + 0.5) / 10000 AS words_per_sentence,
             FLOOR(spw * 10000 + 0.5) / 10000 AS syllables_per_word,
             FLOOR((206.835 - 1.015 * wps - 84.6 * spw) * 10000 + 0.5) / 10000
               AS flesch,
             FLOOR((0.39 * wps + 11.8 * spw - 15.59) * 10000 + 0.5) / 10000
               AS fk_grade
      FROM r)
    SELECT *,
           CASE WHEN flesch >= 70.0 THEN 'easy'
                WHEN flesch >= 50.0 THEN 'standard'
                ELSE 'difficult' END AS reading_level
    FROM f
    """,
)
def j_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source readability: Flesch reading ease and Flesch-Kincaid
    grade (public 1948/1975 formulas) from three integer count
    devices — words = [a-z]+ runs of the lowercased text, sentences =
    [.!?]+ terminator runs floored at 1 per document, syllables = the
    standard vowel-group proxy ([aeiouy]+ runs, floored at the word
    count corpus-wide so syllables/word >= 1). The quality-scoring
    shelf's AUDIENCE axis: j_quality_score flags structurally bad
    text, j_lang_quality grades fluency per language — this grades
    difficulty, the knob curriculum ordering (j_curriculum_order)
    actually wants.

    EXACT: all three devices are integer counts from anchored
    character-class regexes (identical RE semantics on both engines —
    no lookaround, no flags); the two ratios derive from exact BIGINT
    sums, the formulas apply one fixed IEEE sequence, and scores round
    1e-4 BEFORE the reading-level thresholds compare.

    Plan: one stateless projection + one source hash agg —
    map-side-combined; the corpus crosses the shuffle as three
    integers per document."""
    t = load(spark, sf_dir)
    low = F.lower(F.col("text"))
    w = F.size(F.regexp_extract_all(low, F.lit("[a-z]+"), F.lit(0))).cast("long")
    y = F.size(F.regexp_extract_all(low, F.lit("[aeiouy]+"), F.lit(0))).cast("long")
    s = F.greatest(
        F.lit(1),
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[.!?]+"), F.lit(0))),
    ).cast("long")
    agg = (
        t.documents.select(
            "source", w.alias("w"), y.alias("y"), s.alias("s")
        )
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("w").cast("long").alias("n_words"),
            F.sum("s").cast("long").alias("n_sentences"),
            F.greatest(F.sum("y"), F.sum("w")).cast("long").alias("n_syllables"),
        )
    )
    wps = F.col("n_words").cast("double") / F.col("n_sentences")
    spw = F.col("n_syllables").cast("double") / F.col("n_words")
    flesch = rnd(206.835 - 1.015 * wps - 84.6 * spw, 4)
    return agg.select(
        "source",
        "n_docs",
        "n_words",
        "n_sentences",
        "n_syllables",
        rnd(wps, 4).alias("words_per_sentence"),
        rnd(spw, 4).alias("syllables_per_word"),
        flesch.alias("flesch"),
        rnd(0.39 * wps + 11.8 * spw - 15.59, 4).alias("fk_grade"),
        F.when(flesch >= _FRE_EASY, "easy")
        .when(flesch >= _FRE_STANDARD, "standard")
        .otherwise("difficult")
        .alias("reading_level"),
    )
