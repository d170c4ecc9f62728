"""§2.J extensions — corpus-curation operators a production training-data
pipeline runs beyond dedup/similarity: PII redaction, deterministic
train/val/test splitting, duplicate-cluster resolution (connected
components), and an inverted index for exact-match / contamination
lookups. All hash-checked against DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import rnd
from ..operators.dedup import (
    jaccard_verify,
    lsh_candidate_pairs,
    minhash_signatures,
    shingle_rows,
    shingles_from_toks,
    tokens_col,
)
from ..registry import query
from ..tables import load, spread

# Conservative regex subset that parses identically under Java regex
# (Spark) and RE2 (DuckDB): no lookaround, no backrefs.
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"
_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


@query(
    "j_pii_scrub",
    oracle=f"""
    SELECT doc_id,
           md5(regexp_replace(regexp_replace(regexp_replace(text,
               '{_EMAIL_RE}', '<EMAIL>', 'g'),
               '{_PHONE_RE}', '<PHONE>', 'g'),
               '{_IPV4_RE}', '<IP>', 'g')) AS scrubbed_md5,
           CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(text, '{_PHONE_RE}')) AS BIGINT) AS n_phones,
           CAST(len(regexp_extract_all(text, '{_IPV4_RE}')) AS BIGINT) AS n_ips
    FROM documents
    """,
)
def j_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction pass: emails/phones/IPv4 → typed placeholders, with
    per-doc match counts and an md5 of the scrubbed text (the hash makes
    the full rewritten text hash-checkable without shipping it).

    Single scan, pure codegen expressions — zero shuffles at any scale.
    The regex subset is deliberately lookaround-free so the exact same
    pattern compiles under Java regex and RE2; fixtures contain no PII,
    so counts are zero there — the contract under test is the rewrite
    plumbing, verified end-to-end by the scrubbed-text hash."""
    t = load(spark, sf_dir)
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), _EMAIL_RE, "<EMAIL>"),
            _PHONE_RE,
            "<PHONE>",
        ),
        _IPV4_RE,
        "<IP>",
    )
    return t.documents.select(
        "doc_id",
        F.md5(scrubbed).alias("scrubbed_md5"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_EMAIL_RE))).cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_PHONE_RE))).cast("long").alias("n_phones"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_IPV4_RE))).cast("long").alias("n_ips"),
    )


@query(
    "j_split_train_val",
    oracle="""
    SELECT doc_id, lang,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def j_split_train_val(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment by md5-prefix range —
    the split every training pipeline needs to be STABLE across runs,
    engines, and data re-partitioning (random() is none of those).
    First hex byte < 0xcd → train (~80.1%), < 0xe6 → val (~9.8%), else
    test (~10.2%): lowercase-hex string comparison is identical in both
    engines, and the hash keys on doc_id alone so adding columns or
    re-sharding never moves a document between splits.

    Single narrow scan, no shuffle; at 100 TB the split column is
    computed at write time and used as a partition key."""
    t = load(spark, sf_dir)
    prefix = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    return t.documents.select(
        "doc_id",
        "lang",
        F.when(prefix < "cd", "train").when(prefix < "e6", "val").otherwise("test").alias("split"),
    )


_CLUSTER_PAIRS_SQL = """
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.s, b.s)) * 1.0 /
            len(list_distinct(a.s || b.s)) >= 0.8
"""


@query(
    "j_dedup_cluster",
    oracle=f"""
    WITH RECURSIVE sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                 i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
    pairs AS ({_CLUSTER_PAIRS_SQL}),
    edges AS (SELECT id_a AS u, id_b AS v FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs),
    reach(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
    comp AS (SELECT u AS doc_id, MIN(v) AS min_reach FROM reach GROUP BY u)
    SELECT d.doc_id,
           LEAST(d.doc_id, COALESCE(comp.min_reach, d.doc_id)) AS cluster_id,
           (LEAST(d.doc_id, COALESCE(comp.min_reach, d.doc_id)) = d.doc_id) AS is_keeper
    FROM documents d LEFT JOIN comp ON comp.doc_id = d.doc_id
    """,
)
def j_dedup_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-CLUSTER resolution: connected components over the
    verified near-dup graph (MinHash-LSH candidates → exact Jaccard >=
    0.8), cluster_id = min doc_id in the component, keeper = that doc.
    This is the step after pairwise dedup — A~B and B~C must collapse to
    ONE keeper even though A~C was never scored directly.

    Spark lowering: min-label propagation as a FIXED number of
    declarative rounds (4) — each round joins labels to the edge list
    and takes the neighborhood min. No driver-side convergence loop, so
    building the DataFrame runs zero jobs (the iterative .count()-per-
    round pattern would be an eager full-scan sync point per iteration).
    Exact whenever component diameter <= rounds; near-dup components are
    quasi-cliques (measured max diameter 1 at sf0.01; tests pin
    convergence with an extra-round fixpoint check). At 100 TB swap
    plain propagation for the pointer-doubling variant (O(log d) rounds)
    behind the same interface. Oracle = true transitive closure via
    recursive CTE."""
    t = load(spark, sf_dir)
    sig = minhash_signatures(t.documents)
    cands = lsh_candidate_pairs(sig)
    pairs = (
        jaccard_verify(cands, t.documents)
        .where(F.col("jaccard") >= 0.8)
        .select("id_a", "id_b")
    )
    labels = cluster_labels(t.documents.select("doc_id"), pairs, rounds=4)
    return labels.select(
        "doc_id",
        F.col("label").alias("cluster_id"),
        (F.col("label") == F.col("doc_id")).alias("is_keeper"),
    )


def cluster_labels(nodes: DataFrame, pairs: DataFrame, rounds: int) -> DataFrame:
    """Min-label propagation over an undirected edge list, expressed as
    `rounds` declarative join+agg rounds (no driver loop, no action).
    nodes: (doc_id); pairs: (id_a, id_b). Returns (doc_id, label).

    Each round references the running `labels` frame exactly ONCE:
    new_label(x) = min over {label(y) : y ∈ N(x) ∪ {x}}, with the
    "∪ {x}" expressed as a self-loop edge per node instead of a second
    left-join back onto labels. The obvious two-reference formulation
    (neighbor-min join + left-join merge) makes the lineage a binary
    tree — 2^rounds copies of the base subtree, which Spark executes
    and Catalyst analyzes in full (measured: 28.7 s at sf0.1 vs ~2 s
    for this linear-chain form). Self-loops also keep isolated nodes
    present without an outer join."""
    edges = (
        pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
        .unionByName(pairs.select(F.col("id_b").alias("u"), F.col("id_a").alias("v")))
        .unionByName(nodes.select(F.col("doc_id").alias("u"), F.col("doc_id").alias("v")))
    )
    # Persist the (tiny: 2|E|+|V| longs) edge list pre-hashed on the join
    # key: every round joins it, and without a cache each round would
    # re-execute the ENTIRE upstream pair computation (minhash → LSH
    # bucket join → Jaccard verify) — rounds× the most expensive subtree
    # in the query. persist() is lazy (no job here); round 1
    # materializes it and rounds 2..R read the cache, already
    # partitioned by v so only the labels side of each join shuffles.
    # This is the canonical iterative-algorithm pattern: the working set
    # an iteration loop touches every round must be cached, at any scale.
    edges = edges.repartition(F.col("v")).persist()
    labels = nodes.select("doc_id", F.col("doc_id").alias("label"))
    for _ in range(rounds):
        labels = (
            edges.join(labels, edges.v == labels.doc_id)
            .groupBy("u")
            .agg(F.min("label").alias("label"))
            .withColumnRenamed("u", "doc_id")
        )
    return labels


# 3-token shingle sets as a DuckDB CTE body — the SQL twin of
# operators.dedup.shingles_col (same tokenization, same k=3, distinct).
_SHINGLE_SETS_SQL = """
      SELECT doc_id, source,
             list_distinct(list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                 i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s
      FROM (SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents)
"""

# Stratified sampling rates by lang, expressed as 4-hex-digit thresholds
# on md5('smp' || doc_id): floor(rate * 0x10000) in lowercase hex, so the
# same string comparison runs in both engines. zh keeps everything.
_SAMPLE_THRESH = {"en": "4ccc", "de": "8000", "es": "b333", "fr": "e666"}


@query(
    "j_sample_stratified",
    oracle=f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE substr(md5('smp' || CAST(doc_id AS VARCHAR)), 1, 4) <
          CASE lang WHEN 'en' THEN '{_SAMPLE_THRESH["en"]}'
                    WHEN 'de' THEN '{_SAMPLE_THRESH["de"]}'
                    WHEN 'es' THEN '{_SAMPLE_THRESH["es"]}'
                    WHEN 'fr' THEN '{_SAMPLE_THRESH["fr"]}'
                    ELSE 'gggg' END
    """,
)
def j_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: per-lang keep rates (en 30%,
    de 50%, es 70%, fr 90%, zh 100%) decided by an md5-prefix threshold
    per row — the downsampling step that rebalances a web-scale corpus
    across languages. Unlike df.sample(), membership is a pure function
    of doc_id, so it is stable across runs, engines, partitionings and
    retries (a lost-task re-execution cannot change the sample), and a
    row's fate is decidable without seeing any other row.

    Single narrow scan, zero shuffles at any scale; the 'smp' salt
    decorrelates this hash from j_split_train_val's split hash."""
    t = load(spark, sf_dir)
    h = F.substring(F.md5(F.concat(F.lit("smp"), F.col("doc_id").cast("string"))), 1, 4)
    thresh = F.lit("gggg")  # > any hex digit: keep-all default (zh)
    for lang, hx in _SAMPLE_THRESH.items():
        thresh = F.when(F.col("lang") == lang, hx).otherwise(thresh)
    return t.documents.select("doc_id", "lang", "source").where(h < thresh)


_PACK_RANGE = 256  # docs per prefix-sum range
_PACK_BUDGET = 2048  # tokens per packed sequence


@query(
    "j_pack_sequences",
    oracle=f"""
    WITH tok AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
                 FROM documents),
         c AS (SELECT doc_id, n_tok,
                      SUM(n_tok) OVER (ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
               FROM tok)
    SELECT doc_id, n_tok,
           CAST((cum - n_tok) // {_PACK_BUDGET} AS BIGINT) AS bin_id,
           CAST((cum - n_tok) % {_PACK_BUDGET} AS BIGINT) AS bin_pos
    FROM c
    """,
)
def j_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training-batch assembly: documents laid out
    end-to-end in doc_id order; each lands in the 2048-token bin where
    its start offset falls (block packing — a doc may straddle its bin
    boundary; the trainer splits there).

    The naive lowering is a GLOBAL-order running sum — a single-
    partition window, the classic scale killer. This is the two-level
    distributed prefix sum instead: (1) within-range running sums,
    windowed per range_id = doc_id div 256 (parallel across ranges);
    (2) per-range totals cumulated in a tiny ranges-count-sized window;
    (3) broadcast the range offsets back. Only step 2 is single-
    partition, over n/256 rows — and recurses to three levels if ranges
    themselves outgrow a partition. Exactness vs the one-window form is
    what the oracle checks."""
    t = load(spark, sf_dir)
    tok = t.documents.select(
        "doc_id", F.size(tokens_col("text")).cast("long").alias("n_tok")
    )
    packed = distributed_prefix_sum(tok, "doc_id", "n_tok", _PACK_RANGE)
    start = F.col("cum") - F.col("n_tok")
    return packed.select(
        "doc_id",
        "n_tok",
        F.expr(f"(cum - n_tok) div {_PACK_BUDGET}").alias("bin_id"),
        (start % _PACK_BUDGET).alias("bin_pos"),
    )


def distributed_prefix_sum(
    df: DataFrame, id_col: str, val_col: str, range_size: int
) -> DataFrame:
    """Inclusive running sum of val_col in id_col order WITHOUT a
    global-order window: within-range window (parallel) + tiny
    per-range-offset window + broadcast join back. Adds column `cum`.
    Exact for any id distribution (gaps/clumps fine — ranges only need
    to be order-preserving, not balanced)."""
    return distributed_prefix_sum_ord(
        df, [F.col(id_col).asc()], val_col, F.expr(f"{id_col} div {range_size}")
    )


def distributed_prefix_sum_ord(
    df: DataFrame, order_cols: list, val_col: str, range_expr
) -> DataFrame:
    """General form of distributed_prefix_sum: inclusive running sum of
    ``val_col`` along an arbitrary total order ``order_cols`` (list of
    Column sort expressions), bucketed by ``range_expr`` — any Column
    that is (a) non-decreasing along the sort order and (b) constant
    across order-ties, so a range boundary can never split the order.
    Plan shape: one range-partitioned window over the big relation, one
    SinglePartition window over |ranges| rows, one broadcast join back;
    recurses to three levels only if |ranges| itself outgrows a
    partition. Adds column `cum`."""
    tok = df.withColumn("range_id", range_expr)
    w_in = (
        Window.partitionBy("range_id")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = tok.withColumn("cum_in", F.sum(val_col).over(w_in))
    w_rng = Window.orderBy("range_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = (
        tok.groupBy("range_id")
        .agg(F.sum(val_col).alias("range_tok"))
        .withColumn("offset", F.sum("range_tok").over(w_rng) - F.col("range_tok"))
        .select("range_id", "offset")
    )
    return (
        within.join(F.broadcast(offsets), "range_id")
        .withColumn("cum", F.col("offset") + F.col("cum_in"))
        .drop("range_id", "cum_in", "offset")
    )


@query(
    "j_contamination",
    oracle=f"""
    WITH sh AS ({_SHINGLE_SETS_SQL}),
         bench AS (SELECT DISTINCT unnest(s) AS term FROM sh WHERE source = 'src0'),
         cand AS (SELECT doc_id, unnest(s) AS term FROM sh WHERE source <> 'src0'),
         hits AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_matched
                  FROM cand JOIN bench USING (term) GROUP BY doc_id)
    SELECT d.doc_id, CAST(len(sh.s) AS BIGINT) AS n_shingles,
           COALESCE(hits.n_matched, 0) AS n_matched,
           FLOOR(COALESCE(hits.n_matched, 0) * 1.0 / len(sh.s) * 10000 + 0.5) / 10000
               AS contam_ratio,
           (COALESCE(hits.n_matched, 0) * 1.0 / len(sh.s) >= 0.2) AS contaminated
    FROM documents d
    JOIN sh ON sh.doc_id = d.doc_id
    LEFT JOIN hits ON hits.doc_id = d.doc_id
    WHERE d.source <> 'src0'
    """,
)
def j_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: treat source 'src0' as the held-out
    benchmark; for every other document, the fraction of its 3-gram
    shingles that appear ANYWHERE in the benchmark. The decontamination
    gate every training pipeline runs before a data release.

    The benchmark shingle dictionary is tiny relative to the corpus
    (benchmarks are thousands of docs, the corpus is billions), so it
    BROADCASTS: the candidate side streams through a broadcast hash
    semi-join with no shuffle of the corpus, then one hash agg on doc_id.
    Per-doc totals come from the same frame pre-explosion — keyed on
    doc_id, co-partitioned with the hit counts."""
    t = load(spark, sf_dir)
    docs = spread(spark, sf_dir, "documents").select(
        "doc_id", "source", tokens_col("text").alias("_toks")
    ).select("doc_id", "source", shingles_from_toks(F.col("_toks")).alias("sh"))
    cand = docs.where(F.col("source") != "src0")
    bench_terms = (
        docs.where(F.col("source") == "src0")
        .select(F.explode("sh").alias("term"))
        .distinct()
    )
    hits = (
        cand.select("doc_id", F.explode("sh").alias("term"))
        .join(F.broadcast(bench_terms), "term")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_matched"))
    )
    totals = cand.select("doc_id", F.size("sh").cast("long").alias("n_shingles"))
    out = totals.join(hits, "doc_id", "left").withColumn(
        "n_matched", F.coalesce(F.col("n_matched"), F.lit(0).cast("long"))
    )
    ratio = F.col("n_matched") / F.col("n_shingles")
    return out.select(
        "doc_id",
        "n_shingles",
        "n_matched",
        rnd(ratio, 4).alias("contam_ratio"),
        (ratio >= 0.2).alias("contaminated"),
    )


_CONTAIN_DF_CAP = 1000  # skew guard: drop stop-shingle postings


@query(
    "j_dedup_containment",
    oracle=f"""
    WITH sh AS ({_SHINGLE_SETS_SQL}),
         post AS (SELECT doc_id, term FROM
                      (SELECT doc_id, unnest(s) AS term FROM sh)),
         keep AS (SELECT term FROM post GROUP BY term
                  HAVING COUNT(*) <= {_CONTAIN_DF_CAP}),
         p AS (SELECT post.doc_id, post.term FROM post JOIN keep USING (term)),
         shared AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                           CAST(COUNT(*) AS BIGINT) AS n_shared
                    FROM p a JOIN p b ON a.term = b.term AND a.doc_id <> b.doc_id
                    GROUP BY 1, 2),
         sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM p GROUP BY doc_id)
    SELECT id_a, id_b, n_shared, sizes.n_sh AS n_a,
           FLOOR(n_shared * 1.0 / sizes.n_sh * 10000 + 0.5) / 10000 AS containment
    FROM shared JOIN sizes ON sizes.doc_id = shared.id_a
    WHERE n_shared * 1.0 / sizes.n_sh >= 0.9
    """,
)
def j_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment dedup: pairs where >= 90% of doc A's shingles appear
    in doc B — catches near-SUBSET duplicates (a doc embedded in a
    longer one) that Jaccard-based MinHash misses, because containment
    is asymmetric while Jaccard punishes the size gap.

    Candidate generation is an inverted-index equi-join on the shingle
    (shuffle keyed by term), counted per ordered pair, then one join
    against |A|'s shingle count. The skew guard is the df cap: a
    stop-shingle appearing in f docs contributes f^2 candidate rows, so
    postings with df > 1000 are dropped from BOTH the numerator and
    denominator (identically in the oracle — semantics, not
    approximation). On this corpus max df is ~25, so the cap is inert
    at fixture scale; at 100 TB it is what bounds the join."""
    t = load(spark, sf_dir)
    post = shingle_rows(t.documents, ["doc_id"]).withColumnRenamed("sh", "term")
    keep = post.groupBy("term").agg(F.count("*").alias("df")).where(
        F.col("df") <= _CONTAIN_DF_CAP
    )
    # The capped postings list feeds three consumers (sizes, both join
    # sides); without a cache each re-runs shingling + the df join.
    # Lazy persist — same pattern as cluster_labels' edge list.
    p = post.join(keep.select("term"), "term").persist()
    sizes = p.groupBy("doc_id").agg(F.count("*").cast("long").alias("n_sh"))
    a = p.select(F.col("doc_id").alias("id_a"), "term")
    b = p.select(F.col("doc_id").alias("id_b"), "term")
    shared = (
        a.join(b, "term")
        .where(F.col("id_a") != F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("long").alias("n_shared"))
    )
    ratio = F.col("n_shared") / F.col("n_a")
    return (
        shared.join(sizes.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("n_a")), "id_a")
        .where(ratio >= 0.9)
        .select("id_a", "id_b", "n_shared", "n_a", rnd(ratio, 4).alias("containment"))
    )


@query(
    "j_embed_quantize",
    oracle="""
    WITH q AS (
      SELECT vec_id,
             -- DuckDB binds FLOAT op DOUBLE as float32 arithmetic; Spark
             -- promotes to double. Explicit DOUBLE casts keep both
             -- engines on the identical IEEE-754 op sequence.
             CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE) AS m,
             embedding
      FROM embeddings)
    SELECT vec_id,
           m / 127.0 AS scale,
           CAST(list_aggregate(list_transform(embedding,
                    x -> CAST(FLOOR(CAST(x AS DOUBLE) * 127.0 / m + 0.5) AS BIGINT)), 'sum')
                AS BIGINT) AS code_sum,
           md5(array_to_string(list_transform(embedding,
                    x -> CAST(FLOOR(CAST(x AS DOUBLE) * 127.0 / m + 0.5) AS BIGINT)), ',')) AS code_md5
    FROM q
    """,
)
def j_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 scalar quantization of the embedding column — the
    4x storage/bandwidth cut applied before shipping vectors to an ANN
    index. Per vector: scale = max|x|/127, code_i = round(x_i/scale).
    Codes are checked via their sum and an md5 of the serialized array
    (hash-stable without shipping 64 columns).

    Pure higher-order functions (transform/aggregate) over the array
    column — JVM-side, zero shuffles, scales linearly. The round is the
    portable floor(x+0.5) form; float->double promotion is exact and
    identical in both engines, so the codes hash-match bit-for-bit.
    Embeddings are L2-normalized (max|x| > 0), so no zero-scale guard
    branch is needed beyond the one the oracle shares."""
    t = load(spark, sf_dir)
    m = F.array_max(F.transform(F.col("embedding"), lambda x: F.abs(x)))
    withm = t.embeddings.select("vec_id", "embedding", m.alias("m"))
    codes = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x * F.lit(127.0) / F.col("m") + F.lit(0.5)).cast("long"),
    )
    return withm.select(
        "vec_id",
        (F.col("m") / F.lit(127.0)).alias("scale"),
        F.aggregate(
            codes, F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("code_sum"),
        F.md5(F.concat_ws(",", F.transform(codes, lambda c: c.cast("string")))).alias(
            "code_md5"
        ),
    )


def cluster_labels_doubling(nodes: DataFrame, pairs: DataFrame, rounds: int) -> DataFrame:
    """Pointer-doubling variant of cluster_labels — the 100 TB path for
    HIGH-diameter graphs (SCALE.md §3): each round does one neighborhood
    min (propagate) then one shortcut (label ← label-of-label), so the
    frontier a label crosses roughly DOUBLES per round — ~log2(diameter)
    rounds instead of diameter. Near-dup graphs are quasi-cliques and
    don't need it (plain propagation is fewer joins per round); chain- or
    mesh-shaped entity graphs do. Same interface and result as
    cluster_labels; equivalence to union-find is property-tested.

    Each round's labels frame feeds the next round THREE times (edge
    join + both shortcut sides), so a plain persist still grows the
    ANALYZED plan 3^rounds — enough to OOM the driver before any task
    runs. localCheckpoint(eager=False) truncates the lineage at the
    plan itself (lazy: no job until the first action), keeping both
    execution AND planning linear in rounds — the cluster_labels
    lineage lesson, squared."""
    edges = (
        pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
        .unionByName(pairs.select(F.col("id_b").alias("u"), F.col("id_a").alias("v")))
        .unionByName(nodes.select(F.col("doc_id").alias("u"), F.col("doc_id").alias("v")))
        .repartition(F.col("v"))
        .persist()
    )
    labels = nodes.select("doc_id", F.col("doc_id").alias("label"))
    for _ in range(rounds):
        labels = (
            edges.join(labels, edges.v == labels.doc_id)
            .groupBy("u")
            .agg(F.min("label").alias("label"))
            .withColumnRenamed("u", "doc_id")
            .localCheckpoint(eager=False)
        )
        hop = labels.select(F.col("doc_id").alias("k"), F.col("label").alias("l2"))
        labels = (
            labels.join(hop, labels.label == hop.k)
            .select("doc_id", F.least(F.col("label"), F.col("l2")).alias("label"))
            .localCheckpoint(eager=False)
        )
    return labels


@query(
    "j_pipeline_release",
    oracle=f"""
    WITH keepers AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
    q AS (SELECT d.doc_id, d.lang, d.text,
                 CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens
          FROM documents d JOIN keepers USING (doc_id)
          WHERE d.n_chars BETWEEN 100 AND 5000
            AND len(string_split(d.text, ' ')) >= 20),
    sampled AS (
      SELECT * FROM q
      WHERE substr(md5('smp' || CAST(doc_id AS VARCHAR)), 1, 4) <
            CASE lang WHEN 'en' THEN '{_SAMPLE_THRESH["en"]}'
                      WHEN 'de' THEN '{_SAMPLE_THRESH["de"]}'
                      WHEN 'es' THEN '{_SAMPLE_THRESH["es"]}'
                      WHEN 'fr' THEN '{_SAMPLE_THRESH["fr"]}'
                      ELSE 'gggg' END)
    SELECT doc_id, lang, n_tokens,
           md5(regexp_replace(regexp_replace(regexp_replace(text,
               '{_EMAIL_RE}', '<EMAIL>', 'g'),
               '{_PHONE_RE}', '<PHONE>', 'g'),
               '{_IPV4_RE}', '<IP>', 'g')) AS scrubbed_md5,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
                ELSE 'test' END AS split
    FROM sampled
    """,
)
def j_pipeline_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed data-RELEASE pipeline, stitching the curation family
    end-to-end the way a production corpus release runs it: exact dedup
    (keep min doc_id per text) → quality gate (length + token floor) →
    deterministic stratified downsample by lang → PII scrub → stable
    train/val/test assignment. Everything downstream of the dedup agg is
    narrow, so the whole release is ONE shuffle + one scan at any scale;
    every stage is a pure function of (doc_id, text), so a retried or
    re-sharded run emits the identical release. The dedup groups on
    md5(text), not text — the shuffle carries 16-byte keys instead of
    multi-KB documents (the difference between shuffling 2 TB and
    100 TB at scale)."""
    t = load(spark, sf_dir)
    keepers = t.documents.groupBy(F.md5("text")).agg(F.min("doc_id").alias("doc_id"))
    toks = tokens_col("text")
    n_tok = F.size(toks).cast("long")
    smp = F.substring(
        F.md5(F.concat(F.lit("smp"), F.col("doc_id").cast("string"))), 1, 4
    )
    thresh = F.lit("gggg")
    for lang, hx in _SAMPLE_THRESH.items():
        thresh = F.when(F.col("lang") == lang, hx).otherwise(thresh)
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), _EMAIL_RE, "<EMAIL>"),
            _PHONE_RE,
            "<PHONE>",
        ),
        _IPV4_RE,
        "<IP>",
    )
    split_prefix = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    return (
        t.documents.join(keepers.select("doc_id"), "doc_id", "left_semi")
        .where(F.col("n_chars").between(100, 5000) & (n_tok >= 20))
        .where(smp < thresh)
        .select(
            "doc_id",
            "lang",
            n_tok.alias("n_tokens"),
            F.md5(scrubbed).alias("scrubbed_md5"),
            F.when(split_prefix < "cd", "train")
            .when(split_prefix < "e6", "val")
            .otherwise("test")
            .alias("split"),
        )
    )


@query(
    "j_inverted_index",
    oracle="""
    WITH dtok AS (SELECT DISTINCT doc_id, term
                  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                        FROM documents))
    SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
           array_to_string(list(doc_id ORDER BY doc_id), ',') AS postings
    FROM dtok GROUP BY term
    """,
)
def j_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index over the corpus: term → document frequency +
    sorted posting list — the lookup structure behind exact-match
    contamination checks and targeted decontamination.

    explode → distinct → one hash agg; the posting list is sorted
    in-expression (sort_array) so the serialization is deterministic.
    At 100 TB the postings for stop-word-grade terms are the skew risk:
    cap or drop terms with df above a threshold at write time (they
    carry no lookup value) — here the full index is kept so the oracle
    is total."""
    t = load(spark, sf_dir)
    dtok = t.documents.select(
        "doc_id", F.explode(tokens_col("text")).alias("term")
    ).distinct()
    return dtok.groupBy("term").agg(
        F.count("*").cast("long").alias("df"),
        F.concat_ws(",", F.sort_array(F.collect_list("doc_id"))).alias("postings"),
    )


# ----------------------------------------------- deterministic shuffle (r6)

_SHUFFLE_SHARDS = 64
_SHUFFLE_SALT = "epoch1"


@query(
    "j_shuffle_shards",
    oracle=f"""
    WITH k AS (SELECT doc_id,
                 md5(CAST(doc_id AS VARCHAR) || ':{_SHUFFLE_SALT}') AS h
               FROM documents),
    s AS (SELECT doc_id,
            CAST(concat('0x', substr(h, 9, 8)) AS BIGINT) % {_SHUFFLE_SHARDS} AS shard,
            CAST(concat('0x', substr(h, 1, 8)) AS BIGINT) AS sort_key
          FROM k)
    SELECT doc_id, shard, sort_key,
           CAST(ROW_NUMBER() OVER (PARTITION BY shard
                                   ORDER BY sort_key, doc_id) AS INTEGER) AS pos
    FROM s
    """,
)
def j_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-order shuffle: every document gets a
    shard and an in-shard position from a salted portable hash — the
    standard way a 100 TB training run gets a reproducible global
    shuffle WITHOUT a global sort: shard = write-time partition (the
    only exchange), in-shard order = local sort within each partition,
    re-shuffle for the next epoch = new salt, no data movement
    decision depends on any other row. The per-shard window is
    scale-safe because shard count is a knob: size it so a shard is
    one task's worth of data.

    Hash-checked: shard is the low md5 word mod N, the sort key the
    high word (one md5 per row), both exact integers in any engine."""
    from ..operators.dedup import portable_bucket, portable_hash32

    t = load(spark, sf_dir)
    key = F.concat(F.col("doc_id").cast("string"), F.lit(f":{_SHUFFLE_SALT}"))
    s = t.documents.select(
        "doc_id",
        portable_bucket(key, _SHUFFLE_SHARDS).alias("shard"),
        portable_hash32(key).alias("sort_key"),
    )
    w = Window.partitionBy("shard").orderBy("sort_key", "doc_id")
    return s.select(
        "doc_id", "shard", "sort_key", F.row_number().over(w).alias("pos")
    )


# Per-stratum reservoir size for j_reservoir_pergroup.
_RES_K = 10


@query(
    "j_reservoir_pergroup",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id, lang, source,
             ROW_NUMBER() OVER (
               PARTITION BY lang, source
               ORDER BY md5('res' || CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents)
    SELECT doc_id, lang, source, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= {_RES_K}
    """,
)
def j_reservoir_pergroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-stratum reservoir: exactly min(k, |stratum|)
    documents from every (lang, source) cell, selected by ranking on an
    md5 priority — the DISTRIBUTED, rerun-stable equivalent of
    Vitter's algorithm-R reservoir per group (same selection law: each
    member equally likely under a uniform priority; md5 stands in for
    the uniform draw so the reservoir never changes across runs,
    engines, or repartitioning). Complements rate-based
    j_sample_stratified (keep-fraction per stratum) with the fixed-
    QUOTA semantics evaluation sets need.

    One window keyed on the stratum, rank filter pushed right after —
    at 100 TB this is one exchange on (lang, source) where a true
    streaming reservoir would need per-partition state merge; skewed
    strata salt the key exactly as operators/skew.py documents."""
    t = load(spark, sf_dir)
    pri = F.md5(F.concat(F.lit("res"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("lang", "source").orderBy(pri.asc(), F.col("doc_id").asc())
    return (
        t.documents.select(
            "doc_id", "lang", "source", F.row_number().over(w).alias("rk")
        )
        .where(F.col("rk") <= _RES_K)
        .select("doc_id", "lang", "source", F.col("rk").cast("long").alias("rk"))
    )


# Token-budget selection: keep the half of the corpus (by whitespace
# tokens) with the longest documents — "budget" derives from the corpus
# itself so the operator binds at every scale factor.
_KFOLDS = 5


@query(
    "j_token_budget",
    oracle="""
    WITH d AS (SELECT doc_id, lang,
                      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
                      n_chars
               FROM documents),
    budget AS (SELECT CAST(SUM(n_tok) // 2 AS BIGINT) AS b FROM d),
    cum AS (SELECT doc_id, lang, n_tok,
                   SUM(n_tok) OVER (ORDER BY n_chars DESC, doc_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS running
            FROM d)
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_sel,
           CAST(SUM(n_tok) AS BIGINT) AS tokens_sel,
           CAST(MAX(running) AS BIGINT) AS max_running
    FROM cum CROSS JOIN budget
    WHERE running <= b
    GROUP BY lang
    """,
)
def j_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus selection — the training-run staple "take
    the best documents until the budget is spent": documents ranked by
    a deterministic priority (length desc, doc_id tiebreak), admitted
    while the RUNNING token total stays within budget (here: half the
    corpus tokens, a scale-free cutoff derived inside the query). All
    counts are exact BIGINTs; the cumulative sum is a window over a
    total order ending in the unique doc_id, so the admission boundary
    is engine-independent.

    100 TB: the naive lowering — one ORDER-only window — is Exchange
    SinglePartition + a one-task sort over the whole corpus, the
    classic scale killer. This is j_pack_sequences' two-level
    distributed prefix sum instead, generalized to the (n_chars DESC,
    doc_id) priority order: range_id = -(n_chars div 16) is monotone
    along that order and constant across n_chars ties, so the
    corpus-sized running sum rides a range-partitioned window; only
    the |ranges|-row offset roll-up is single-partition (pinned in
    tests/test_plans.py). The 1-row budget side is a broadcast cross
    join, not a shuffle."""
    t = load(spark, sf_dir)
    d = t.documents.select(
        "doc_id", "lang", "n_chars", F.size(tokens_col("text")).cast("long").alias("n_tok")
    )
    budget = d.agg((F.sum("n_tok") / 2).cast("long").alias("b"))
    cum = distributed_prefix_sum_ord(
        d,
        [F.col("n_chars").desc(), F.col("doc_id").asc()],
        "n_tok",
        -F.expr("n_chars div 16"),
    ).select("doc_id", "lang", "n_tok", F.col("cum").alias("running"))
    return (
        cum.crossJoin(F.broadcast(budget))
        .where(F.col("running") <= F.col("b"))
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_sel"),
            F.sum("n_tok").cast("long").alias("tokens_sel"),
            F.max("running").cast("long").alias("max_running"),
        )
    )


@query(
    "j_kfold_assign",
    oracle=f"""
    WITH d AS (SELECT doc_id, lang,
                      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
                      CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 9, 8)
                           AS BIGINT) % {_KFOLDS} AS fold
               FROM documents)
    SELECT lang, fold,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc
    FROM d GROUP BY lang, fold
    """,
)
def j_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-fold assignment for cross-validation over the
    corpus: fold = portable low-md5-word of the doc_id modulo k — the
    same hash-split discipline as j_split_train_val, extended to the
    k-way case, so fold membership is a pure function of the stable id
    (reproducible across engines, runs, and cluster sizes; no RNG
    state to version). The relation reports per-(lang, fold) document
    and token masses — the balance check that validates hash-splitting
    before a CV run trusts it.

    100 TB: fold assignment is a map-stage expression (one md5 per
    row); the profile is one (lang, fold) hash agg with ≤ 5·k groups.
    Training jobs then read fold != i via partition pruning when the
    corpus is written fold-partitioned."""
    from ..operators.dedup import portable_bucket

    t = load(spark, sf_dir)
    d = t.documents.select(
        "lang",
        "doc_id",
        F.size(tokens_col("text")).cast("long").alias("n_tok"),
        portable_bucket(F.col("doc_id").cast("string"), _KFOLDS).alias("fold"),
    )
    return d.groupBy("lang", "fold").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
        F.min("doc_id").cast("long").alias("first_doc"),
    )


@query(
    "j_clean_text",
    oracle="""
    WITH dirty AS (SELECT doc_id,
                          '  ' || upper(lang) || ': ' || text || '!!  ' AS raw
                   FROM documents),
    c AS (SELECT doc_id, raw,
                 trim(regexp_replace(regexp_replace(lower(raw),
                     '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS clean
          FROM dirty)
    SELECT doc_id,
           md5(clean) AS clean_md5,
           CAST(length(raw) - length(clean) AS BIGINT) AS n_removed,
           CAST(len(string_split(clean, ' ')) AS BIGINT) AS n_tokens
    FROM c
    """,
)
def j_clean_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text normalization for corpus ingestion — the lowercase /
    strip-punctuation / collapse-whitespace / trim pipeline every
    tokenizer assumes upstream. The input is deliberately dirtied from
    table columns (leading blanks, an uppercase prefix, trailing
    punctuation) so each stage provably fires; the md5 of the cleaned
    text is the byte-level proof both engines produced the identical
    string (the j_pii_scrub oracle discipline — hash the transform,
    not just its stats). ASCII-only operations, so Java regex and RE2
    agree; the [^a-z0-9 ] class runs AFTER lower(), making the
    uppercase path observable.

    100 TB: pure codegen expressions, zero shuffle — normalization is
    a map stage fused into whatever scan feeds it."""
    t = load(spark, sf_dir)
    raw = F.concat(
        F.lit("  "), F.upper(F.col("lang")), F.lit(": "), F.col("text"), F.lit("!!  ")
    )
    clean = F.trim(
        F.regexp_replace(F.regexp_replace(F.lower(raw), "[^a-z0-9 ]", " "), " +", " ")
    )
    return t.documents.select(
        "doc_id",
        F.md5(clean).alias("clean_md5"),
        (F.length(raw) - F.length(clean)).cast("long").alias("n_removed"),
        F.size(F.split(clean, " ")).cast("long").alias("n_tokens"),
    )


# Chunking: fixed token windows with overlap — the RAG / long-context
# training prep that turns documents into model-sized pieces.
_CHUNK_SIZE = 64    # tokens per chunk
_CHUNK_STRIDE = 48  # tokens between chunk starts (16-token overlap)


# Shared chunk CTE chain (oracle side) — j_chunk_documents emits it
# verbatim; j_dedup_chunks builds its repetition analysis on top.
_CHUNK_CTES = f"""
    d AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
    n AS (SELECT doc_id, tok, CAST(len(tok) AS BIGINT) AS n_tok,
                 CAST(1 + GREATEST(0, (len(tok) - {_CHUNK_SIZE} + {_CHUNK_STRIDE} - 1)
                                       // {_CHUNK_STRIDE}) AS BIGINT) AS n_chunks
          FROM d),
    c AS (SELECT doc_id, tok, n_tok, n_chunks,
                 CAST(unnest(range(0, n_chunks)) AS BIGINT) AS chunk_id
          FROM n),
    chunks AS (SELECT doc_id, n_tok, n_chunks, chunk_id,
                 chunk_id * {_CHUNK_STRIDE} AS start_tok,
                 LEAST({_CHUNK_SIZE}, n_tok - chunk_id * {_CHUNK_STRIDE}) AS chunk_len,
                 CAST('0x' || substr(md5(
                     array_to_string(list_slice(tok, chunk_id * {_CHUNK_STRIDE} + 1,
                         chunk_id * {_CHUNK_STRIDE}
                           + LEAST({_CHUNK_SIZE}, n_tok - chunk_id * {_CHUNK_STRIDE})), ' ')
                 ), 1, 8) AS BIGINT) AS chunk_hash
          FROM c)
"""


@query(
    "j_chunk_documents",
    oracle=f"""
    WITH {_CHUNK_CTES}
    SELECT doc_id, chunk_id, n_chunks,
           CAST(start_tok AS BIGINT) AS start_tok,
           CAST(chunk_len AS BIGINT) AS chunk_len,
           chunk_hash
    FROM chunks
    """,
)
def j_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking — 64-token chunks on a 48-token
    stride (16-token overlap), the standard RAG-indexing / long-context
    training preparation. Chunk count is the exact integer form
    1 + max(0, ceil((n_tok − C) / S)): every token is covered, the last
    chunk may be short, and a doc shorter than one chunk still yields
    exactly one. The per-chunk portable md5-word over the re-joined
    token slice proves BOTH engines cut byte-identical chunks (the
    j_pii_scrub hash-the-transform discipline), not just matching
    counts. Integer-division portability: the ceil numerator can go
    negative (short docs) where Spark's `div` truncates toward zero but
    DuckDB's `//` floors — GREATEST(0, ·) clamps both to the same 0.

    100 TB: one narrow map + posexplode, ZERO shuffle — chunking fuses
    into the scan that feeds it, with ~n_tok/S output fan-out; at
    write time chunks partition by hash(doc_id) so a doc's chunks
    co-locate for sequence re-assembly."""
    t = load(spark, sf_dir)
    return chunk_frame(t.documents)


def chunk_frame(docs: DataFrame) -> DataFrame:
    """The sliding-window chunk relation (doc_id, chunk_id, n_chunks,
    start_tok, chunk_len, chunk_hash) — shared by j_chunk_documents
    (emits it) and j_dedup_chunks (analyzes hash repetition over it).
    Mirrors the _CHUNK_CTES oracle chain expression-for-expression."""
    d = (
        docs.select("doc_id", tokens_col("text").alias("tok"))
        .withColumn("n_tok", F.size("tok").cast("long"))
        .withColumn(
            "n_chunks",
            (
                F.lit(1)
                + F.greatest(
                    F.lit(0).cast("long"),
                    F.expr(
                        f"(n_tok - {_CHUNK_SIZE} + {_CHUNK_STRIDE} - 1)"
                        f" div {_CHUNK_STRIDE}"
                    ),
                )
            ).cast("long"),
        )
    )
    c = d.select(
        "doc_id",
        "tok",
        "n_tok",
        "n_chunks",
        F.explode(F.expr("sequence(CAST(0 AS BIGINT), n_chunks - 1)")).alias("chunk_id"),
    )
    start = F.col("chunk_id") * _CHUNK_STRIDE
    clen = F.least(F.lit(_CHUNK_SIZE).cast("long"), F.col("n_tok") - start)
    chunk_text = F.array_join(
        F.slice(F.col("tok"), (start + 1).cast("int"), clen.cast("int")), " "
    )
    from ..operators.dedup import portable_hash32

    return c.select(
        "doc_id",
        "chunk_id",
        "n_chunks",
        start.cast("long").alias("start_tok"),
        clen.cast("long").alias("chunk_len"),
        portable_hash32(chunk_text).alias("chunk_hash"),
    )


@query(
    "j_dedup_chunks",
    oracle=f"""
    WITH {_CHUNK_CTES},
    rep AS (SELECT chunk_hash FROM chunks
            GROUP BY chunk_hash HAVING COUNT(DISTINCT doc_id) >= 2),
    per AS (SELECT c.doc_id,
                   MAX(c.n_chunks) AS n_chunks,
                   CAST(COUNT(r.chunk_hash) AS BIGINT) AS n_boiler
            FROM chunks c LEFT JOIN rep r USING (chunk_hash)
            GROUP BY c.doc_id)
    SELECT doc_id, CAST(n_chunks AS BIGINT) AS n_chunks, n_boiler,
           FLOOR(n_boiler * 1.0 / n_chunks * 1000000 + 0.5) / 1000000
             AS boiler_ratio,
           (n_boiler * 1.0 / n_chunks < 0.5) AS keep
    FROM per
    """,
)
def j_dedup_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate-chunk detection — chunk-granular dedup between the
    line level (j_dedup_lines) and the whole-document level
    (j_dedup_exact): a chunk whose hash appears in ≥2 DISTINCT
    documents is boilerplate (headers, navigation, license blocks
    repeating across a crawl); each document reports its boilerplate
    chunk fraction and a keep verdict (< 50% repeated). Reuses
    j_chunk_documents' chunk relation verbatim (chunk_frame /
    _CHUNK_CTES), so the two qids can never disagree on what a chunk
    is.

    100 TB: the repetition profile is ONE hash agg keyed on the 8-byte
    chunk_hash (digests shuffle, text never does); the flag-back is a
    hash-keyed join on the same digest, then a doc_id rollup. All
    exchanges carry fixed-width keys; the final ratio is a single
    int/int division, identical IEEE on both engines."""
    t = load(spark, sf_dir)
    ch = chunk_frame(t.documents)
    rep = (
        ch.groupBy("chunk_hash")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("chunk_hash", F.lit(1).alias("is_rep"))
    )
    per = (
        ch.join(rep, "chunk_hash", "left")
        .groupBy("doc_id")
        .agg(
            F.max("n_chunks").cast("long").alias("n_chunks"),
            F.count("is_rep").cast("long").alias("n_boiler"),
        )
    )
    ratio = F.col("n_boiler") / F.col("n_chunks")
    return per.select(
        "doc_id",
        "n_chunks",
        "n_boiler",
        rnd(ratio, 6).alias("boiler_ratio"),
        (ratio < 0.5).alias("keep"),
    )


# Curriculum: phase assignment by global difficulty rank, without a
# global sort — the ordered-training twin of j_token_budget's lowering.
_CURR_PHASES = 4


@query(
    "j_curriculum_order",
    oracle=f"""
    WITH d AS (SELECT doc_id, lang,
                      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
                      n_chars / CAST(len(string_split(text, ' ')) AS BIGINT)
                        AS difficulty
               FROM documents),
    r AS (SELECT doc_id, lang, n_tok, difficulty,
                 ROW_NUMBER() OVER (ORDER BY difficulty, doc_id) AS rnk
          FROM d),
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d)
    SELECT CAST((rnk - 1) * {_CURR_PHASES} // n AS BIGINT) AS phase, lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           CAST(SUM(CAST(FLOOR(difficulty * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
             AS diff_sum_scaled,
           CAST(MIN(CAST(FLOOR(difficulty * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
             AS min_diff_scaled,
           CAST(MAX(CAST(FLOOR(difficulty * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
             AS max_diff_scaled
    FROM r CROSS JOIN t
    GROUP BY 1, 2
    """,
)
def j_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum phase assignment: documents ranked globally by a
    deterministic difficulty proxy (avg chars per token — longer words
    ≈ harder text; tie → doc_id) and cut into {p} equal-rank phases,
    phase = (rank−1)·{p} div N — the easy-to-hard ordering
    curriculum-learning schedules consume. The relation profiles each
    (phase, lang) cell: doc/token mass plus scaled-BIGINT difficulty
    stats (per-term floor to 1e-6 then exact integer sums — the
    j_dsir_weights rule, so no engine-order last-ulp can flip a sum).

    The global rank is NOT a global sort: it is the generalized
    two-level distributed prefix sum (distributed_prefix_sum_ord)
    counting ones along (difficulty, doc_id), bucketed by the monotone
    range expression floor(difficulty·4) — corpus window
    range-partitioned, one |ranges|-row roll-up, broadcast offsets —
    exactly j_token_budget's r9 lowering. The 1-row N side broadcasts.

    100 TB: two corpus-scans' worth of narrow work + one range-keyed
    window exchange; at write time phase becomes the partition key so
    each training stage reads its phase by pruning."""
    t = load(spark, sf_dir)
    d = t.documents.select(
        "doc_id",
        "lang",
        F.size(tokens_col("text")).cast("long").alias("n_tok"),
        (F.col("n_chars") / F.size(tokens_col("text")).cast("long")).alias("difficulty"),
    ).withColumn("one", F.lit(1).cast("long"))
    ranked = distributed_prefix_sum_ord(
        d,
        [F.col("difficulty").asc(), F.col("doc_id").asc()],
        "one",
        F.floor(F.col("difficulty") * _CURR_PHASES).cast("long"),
    ).withColumnRenamed("cum", "rnk")
    total = d.agg(F.count("*").cast("long").alias("n"))
    scaled = F.floor(F.col("difficulty") * 1000000 + F.lit(0.5)).cast("long")
    return (
        ranked.crossJoin(F.broadcast(total))
        .select(
            F.expr(f"(rnk - 1) * {_CURR_PHASES} div n").alias("phase"),
            "lang",
            "n_tok",
            scaled.alias("diff_scaled"),
        )
        .groupBy("phase", "lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
            F.sum("diff_scaled").cast("long").alias("diff_sum_scaled"),
            F.min("diff_scaled").cast("long").alias("min_diff_scaled"),
            F.max("diff_scaled").cast("long").alias("max_diff_scaled"),
        )
    )


j_curriculum_order.__doc__ = j_curriculum_order.__doc__.replace("{p}", str(_CURR_PHASES))


@query(
    "j_span_corruption",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks,
                      CAST(len(string_split(text, ' ')) AS BIGINT) AS n
               FROM documents),
    b AS (SELECT doc_id, toks, n,
                 range(0, CAST(ceil(n / 5.0) AS BIGINT)) AS blocks
          FROM t),
    f AS (SELECT doc_id, toks, n, blocks,
                 list_transform(blocks, i ->
                   (i * 5 + 3 <= n) AND
                   (CAST('0x' || substr(md5(doc_id || ':sp:' || i), 9, 8)
                         AS BIGINT) % 2 = 0)) AS mflag
          FROM b),
    parts AS (SELECT doc_id, n,
                 CAST(len(blocks) AS BIGINT) AS n_blocks,
                 CAST(len(list_filter(blocks, j -> mflag[j + 1])) AS BIGINT)
                   AS n_masked_blocks,
                 array_to_string(list_transform(blocks, i ->
                   CASE WHEN mflag[i + 1]
                        THEN '<X' || len(list_filter(blocks,
                                         j -> j < i AND mflag[j + 1])) || '>'
                             || CASE WHEN len(array_slice(toks, i*5+4,
                                                least(i*5+5, n))) > 0
                                     THEN ' ' || array_to_string(
                                            array_slice(toks, i*5+4,
                                              least(i*5+5, n)), ' ')
                                     ELSE '' END
                        ELSE array_to_string(
                               array_slice(toks, i*5+1, least(i*5+5, n)), ' ')
                   END), ' ') AS corrupted,
                 COALESCE(array_to_string(list_transform(
                   list_filter(blocks, i -> mflag[i + 1]), i ->
                     '<X' || len(list_filter(blocks,
                                  j -> j < i AND mflag[j + 1])) || '> '
                     || array_to_string(array_slice(toks, i*5+1, i*5+3), ' ')),
                   ' '), '') AS targets
              FROM f)
    SELECT doc_id, n AS n_tokens, n_blocks, n_masked_blocks,
           md5(corrupted) AS corrupted_md5,
           md5(targets) AS targets_md5
    FROM parts
    """,
)
def j_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span-corruption prep (Raffel et al. 2020, public),
    DETERMINISTIC: token positions group into 5-token blocks; a block
    is masked iff the portable low-md5 word of (doc_id, block) is even
    (~50% of blocks, 3 of 5 tokens each -> ~30% mask rate); the
    corrupted text replaces each masked span with an ordinal sentinel
    <Xk> and the target sequence pairs each sentinel with its hidden
    tokens. Block alignment is what makes the span set NON-OVERLAPPING
    without the sequential greedy scan the original algorithm uses —
    the recursion-free form a distributed engine wants (the
    j_negative_sampling retry-determinism rule: masks are pure
    functions of stable ids). Both reconstructed strings are checked
    at the BYTE level via md5 (the multimodal discipline).

    Plan: pure per-row array expressions — ZERO shuffles, whole-stage
    codegen end to end; the k²-looking sentinel numbering is a
    filter-count over the <=~25-element block list, constant work per
    row. At 100 TB this is the map stage of the tokenize-and-pack
    pipeline feeding j_pack_sequences. r17: the scan rides spread()
    (guide §2.5 single-row-group heal) — the per-row mask/rebuild
    chain is compute-heavy and the qid is pure row-identity, so
    partitioning cannot move values."""
    t = load(spark, sf_dir)
    from ..tables import spread

    base = spread(spark, sf_dir, "documents").select(
        "doc_id", tokens_col("text").alias("toks"), F.size(tokens_col("text")).cast("long").alias("n")
    )
    base = base.withColumn("blocks", F.sequence(F.lit(0).cast("long"), F.ceil(F.col("n") / 5.0).cast("long") - 1))
    mask = lambda i: (i * 5 + 3 <= F.col("n")) & (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":sp:"), i.cast("string"))),
                9,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 2
        == 0
    )
    f = base.withColumn("mflag", F.transform("blocks", mask))

    def sent_k(i):
        return F.size(
            F.filter(
                F.col("blocks"),
                lambda j: (j < i) & F.element_at(F.col("mflag"), j.cast("int") + 1),
            )
        )

    def kept_tail(i):
        return F.slice(F.col("toks"), (i * 5 + 4).cast("int"), 2)

    def corrupted_part(i):
        sentinel = F.concat(F.lit("<X"), sent_k(i).cast("string"), F.lit(">"))
        tail = kept_tail(i)
        masked = F.when(
            F.size(tail) > 0,
            F.concat(sentinel, F.lit(" "), F.array_join(tail, " ")),
        ).otherwise(sentinel)
        return F.when(
            F.element_at(F.col("mflag"), i.cast("int") + 1),
            masked,
        ).otherwise(F.array_join(F.slice(F.col("toks"), (i * 5 + 1).cast("int"), 5), " "))

    def target_part(i):
        return F.concat(
            F.lit("<X"),
            sent_k(i).cast("string"),
            F.lit("> "),
            F.array_join(F.slice(F.col("toks"), (i * 5 + 1).cast("int"), 3), " "),
        )

    out = f.select(
        "doc_id",
        F.col("n").alias("n_tokens"),
        F.size("blocks").cast("long").alias("n_blocks"),
        F.size(
            F.filter(F.col("blocks"), lambda j: F.element_at(F.col("mflag"), j.cast("int") + 1))
        )
        .cast("long")
        .alias("n_masked_blocks"),
        F.md5(F.array_join(F.transform("blocks", corrupted_part), " ")).alias("corrupted_md5"),
        F.md5(
            F.array_join(
                F.transform(
                    F.filter(
                        F.col("blocks"),
                        lambda i: F.element_at(F.col("mflag"), i.cast("int") + 1),
                    ),
                    target_part,
                ),
                " ",
            )
        ).alias("targets_md5"),
    )
    return out


@query(
    "j_fim_transform",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks,
                      CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
                      text
               FROM documents),
    c AS (SELECT doc_id, toks, n, text,
                 n >= 3 AS applied,
                 CASE WHEN n >= 3 THEN
                   1 + CAST('0x' || substr(md5(doc_id || ':fim1'), 9, 8)
                            AS BIGINT) % (n - 2)
                 END AS a
          FROM t),
    c2 AS (SELECT doc_id, toks, n, text, applied, a,
                  CASE WHEN applied THEN
                    a + 1 + CAST('0x' || substr(md5(doc_id || ':fim2'), 9, 8)
                                 AS BIGINT) % (n - 1 - a)
                  END AS b
           FROM c)
    SELECT doc_id, n AS n_tokens, applied,
           CAST(COALESCE(a, 0) AS BIGINT) AS prefix_len,
           CAST(COALESCE(b - a, 0) AS BIGINT) AS middle_len,
           md5(CASE WHEN applied THEN
                 '<PRE> ' || array_to_string(array_slice(toks, 1, a), ' ')
                 || ' <SUF> ' || array_to_string(array_slice(toks, b + 1, n), ' ')
                 || ' <MID> ' || array_to_string(array_slice(toks, a + 1, b), ' ')
               ELSE text END) AS psm_md5
    FROM c2
    """,
)
def j_fim_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill-in-the-middle transform (Bavarian et al. 2022, public), the
    code-LLM twin of j_span_corruption: each document splits into
    non-empty (prefix, middle, suffix) at two hash-derived cut points
    and re-serializes in PSM order '<PRE> p <SUF> s <MID> m' — the
    document-level rearrangement FIM training consumes (span
    corruption hides many small spans; FIM relocates ONE contiguous
    middle). Cuts are pure functions of doc_id (the retry-determinism
    rule); docs under 3 tokens pass through with applied=false. The
    serialized string is byte-checked via md5.

    Plan: zero-shuffle per-row expressions (two md5s, three slices,
    one concat) — whole-stage codegen; at 100 TB this rides the same
    tokenize-map stage as j_span_corruption with a deterministic
    PSM/SPM choice hash-able per doc the same way."""
    t = load(spark, sf_dir)
    base = t.documents.select(
        "doc_id",
        "text",
        tokens_col("text").alias("toks"),
        F.size(tokens_col("text")).cast("long").alias("n"),
    )

    def hword(tag):
        return F.conv(
            F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(tag))), 9, 8),
            16,
            10,
        ).cast("long")

    applied = F.col("n") >= 3
    a = F.when(applied, 1 + hword(":fim1") % (F.col("n") - 2))
    base = base.withColumn("applied", applied).withColumn("a", a)
    b = F.when(F.col("applied"), F.col("a") + 1 + hword(":fim2") % (F.col("n") - 1 - F.col("a")))
    base = base.withColumn("b", b)
    psm = F.concat(
        F.lit("<PRE> "),
        F.array_join(F.slice(F.col("toks"), 1, F.col("a").cast("int")), " "),
        F.lit(" <SUF> "),
        F.array_join(
            F.slice(
                F.col("toks"),
                (F.col("b") + 1).cast("int"),
                (F.col("n") - F.col("b")).cast("int"),
            ),
            " ",
        ),
        F.lit(" <MID> "),
        F.array_join(
            F.slice(
                F.col("toks"),
                (F.col("a") + 1).cast("int"),
                (F.col("b") - F.col("a")).cast("int"),
            ),
            " ",
        ),
    )
    return base.select(
        "doc_id",
        F.col("n").alias("n_tokens"),
        "applied",
        F.coalesce(F.col("a"), F.lit(0)).cast("long").alias("prefix_len"),
        F.coalesce(F.col("b") - F.col("a"), F.lit(0)).cast("long").alias("middle_len"),
        F.md5(F.when(F.col("applied"), psm).otherwise(F.col("text"))).alias("psm_md5"),
    )


_PREFIX_TOKENS = 16


@query(
    "j_dedup_prefix",
    oracle=f"""
    WITH p AS (SELECT doc_id,
                      md5(array_to_string(list_slice(string_split(text, ' '),
                                                     1, {_PREFIX_TOKENS}), ' '))
                        AS ph,
                      md5(text) AS fh
               FROM documents)
    SELECT ph AS prefix_md5,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS keeper_id,
           CAST(COUNT(DISTINCT fh) AS BIGINT) AS n_distinct_full,
           COUNT(DISTINCT fh) > 1 AS prefix_only
    FROM p GROUP BY ph HAVING COUNT(*) > 1
    """,
)
def j_dedup_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-duplicate detection: documents sharing their first
    {n}-token prefix are grouped by a prefix hash — the boilerplate
    signature of SEO templates, license headers, and crawler mirror
    pages, which exact dedup misses (the bodies differ) and shingle
    LSH dilutes (the shared mass is position-locked at the head, a
    small Jaccard fraction of a long doc). Each group reports its
    keeper (min doc_id — the family's first-seen rule), and
    `prefix_only` separates true template families (distinct full
    texts behind one prefix → route to a boilerplate-strip pass) from
    plain exact duplicates j_dedup_exact already handles.

    Determinism: prefix = the literal first {n} space-split tokens
    (shorter docs hash their whole text); both engines hash the
    identical reassembled string; all outputs are counts/min over
    exact hashes.

    Plan: one narrow map — slice+concat+md5, the text never leaves
    the scan — then ONE hash agg keyed on the 16-byte prefix hash
    with map-side partials; the HAVING filter drops singleton groups
    before anything leaves the agg. Output is |duplicate families|
    rows; at 100 TB this is the cheap first pass that runs BEFORE
    MinHash (same discipline as j_dedup_exact, one hash different)."""
    t = load(spark, sf_dir)
    toks = tokens_col("text")
    p = t.documents.select(
        "doc_id",
        F.md5(F.concat_ws(" ", F.slice(toks, 1, _PREFIX_TOKENS))).alias("ph"),
        F.md5("text").alias("fh"),
    )
    return (
        p.groupBy(F.col("ph").alias("prefix_md5"))
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("doc_id").cast("long").alias("keeper_id"),
            F.countDistinct("fh").cast("long").alias("n_distinct_full"),
            (F.countDistinct("fh") > 1).alias("prefix_only"),
        )
        .where(F.col("n_docs") > 1)
    )


j_dedup_prefix.__doc__ = j_dedup_prefix.__doc__.replace("{n}", str(_PREFIX_TOKENS))


@query(
    "j_dedup_keep_best",
    oracle=f"""
    WITH p AS (SELECT doc_id,
                      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
                      md5(array_to_string(list_slice(string_split(text, ' '),
                                                     1, {_PREFIX_TOKENS}), ' '))
                        AS ph
               FROM documents),
    r AS (SELECT doc_id, n_tok, ph,
                 ROW_NUMBER() OVER (PARTITION BY ph
                                    ORDER BY n_tok DESC, doc_id) AS rk,
                 CAST(COUNT(*) OVER (PARTITION BY ph) AS BIGINT) AS n_docs,
                 CAST(SUM(n_tok) OVER (PARTITION BY ph) AS BIGINT) AS tot_tok
          FROM p)
    SELECT ph AS prefix_md5, n_docs,
           doc_id AS keep_id,
           n_tok AS keep_n_tokens,
           tot_tok - n_tok AS tokens_dropped
    FROM r WHERE rk = 1 AND n_docs > 1
    """,
)
def j_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware keeper election: within each prefix-duplicate
    family (j_dedup_prefix's first-{_PREFIX_TOKENS}-token hash), keep
    the member with the MOST tokens (tie → smallest doc_id) instead of
    the blind first-seen min-id rule — the policy real curation
    pipelines use, because among template mirrors the longest variant
    is usually the superset page and min-id keeps whichever crawl
    happened first. `tokens_dropped` totals the token mass the
    election discards, the number a curation review sizes the pass by.

    Determinism: election is a total order (n_tok DESC, doc_id) — no
    engine-specific arg_max tie behavior; all outputs are exact
    BIGINTs over that order.

    Plan: one narrow map (token count + prefix hash — the text never
    leaves the scan), then ONE hash-partition shuffle on the 16-byte
    family key serving all three windows (rank, count, token sum share
    the partitioning); keeper filter + singleton drop run map-side
    after the windows. Output is |duplicate families| rows. Partition
    by the family key gives the rank window the map-side
    WindowGroupLimit treatment at 100 TB; no corpus-wide window
    exists."""
    t = load(spark, sf_dir)
    toks = tokens_col("text")
    p = t.documents.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tok"),
        F.md5(F.concat_ws(" ", F.slice(toks, 1, _PREFIX_TOKENS))).alias("ph"),
    )
    fam = Window.partitionBy("ph")
    r = p.select(
        "doc_id",
        "n_tok",
        "ph",
        F.row_number()
        .over(fam.orderBy(F.col("n_tok").desc(), F.col("doc_id")))
        .alias("rk"),
        F.count("*").over(fam).cast("long").alias("n_docs"),
        F.sum("n_tok").over(fam).cast("long").alias("tot_tok"),
    )
    return r.where((F.col("rk") == 1) & (F.col("n_docs") > 1)).select(
        F.col("ph").alias("prefix_md5"),
        "n_docs",
        F.col("doc_id").alias("keep_id"),
        F.col("n_tok").alias("keep_n_tokens"),
        (F.col("tot_tok") - F.col("n_tok")).alias("tokens_dropped"),
    )


j_dedup_keep_best.__doc__ = j_dedup_keep_best.__doc__.replace(
    "{_PREFIX_TOKENS}", str(_PREFIX_TOKENS)
)


# _SAMPLE_THRESH hex prefixes as exact integers out of 16^4 — the
# Horvitz-Thompson inverse weights for j_sample_debias (zh keeps all).
_SAMPLE_THRESH_INT = {"en": 0x4CCC, "de": 0x8000, "es": 0xB333, "fr": 0xE666}


def _ht_rate_sql() -> str:
    cases = " ".join(
        f"WHEN lang = '{lang}' THEN {v}"
        for lang, v in _SAMPLE_THRESH_INT.items()
    )
    return f"CASE {cases} ELSE 65536 END"


def _ht_hex_sql() -> str:
    """Hex-prefix threshold CASE — 'gggg' (> any hex digit) is the
    keep-all sentinel, matching j_sample_stratified exactly."""
    cases = " ".join(
        f"WHEN lang = '{lang}' THEN '{hx}'" for lang, hx in _SAMPLE_THRESH.items()
    )
    return f"CASE {cases} ELSE 'gggg' END"


@query(
    "j_sample_debias",
    oracle=f"""
    WITH d AS (SELECT lang,
                      CASE WHEN substr(md5('smp' || CAST(doc_id AS VARCHAR)),
                                       1, 4) < {_ht_hex_sql()}
                           THEN 1 ELSE 0 END AS kept,
                      {_ht_rate_sql()} AS thresh
               FROM documents)
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_true,
           CAST(SUM(kept) AS BIGINT) AS n_kept,
           FLOOR(thresh * 1.0 / 65536 * 1000000 + 0.5) / 1000000 AS keep_rate,
           FLOOR(SUM(kept) * 65536.0 / thresh * 1000000 + 0.5) / 1000000
             AS ht_estimate,
           FLOOR((SUM(kept) * 65536.0 / thresh - COUNT(*)) / COUNT(*)
                 * 1000000 + 0.5) / 1000000 AS rel_err
    FROM d GROUP BY lang, thresh
    """,
)
def j_sample_debias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Horvitz–Thompson de-biasing audit of the stratified sampler:
    every statistic computed on j_sample_stratified's kept rows must be
    reweighted by 1/keep-rate before it speaks for the corpus, and
    THIS table measures how well that works on the corpus itself —
    per lang, the true count, the kept count, the exact keep rate
    (the md5-prefix threshold over 16^4), the HT estimate
    n_kept/rate, and its relative error (Horvitz & Thompson 1952,
    public). The error column is the finite-sample bias a mixture
    design inherits when it trusts sampled counts — measured, not
    assumed (the j_kfold_assign balance-audit principle applied to
    sampling weights).

    Determinism: kept is the IDENTICAL hash-threshold predicate as
    j_sample_stratified (pure function of doc_id); rates are exact
    integer thresholds; the two ratios round 1e-6 at display.

    Plan: one narrow map + ONE lang-keyed hash agg with map-side
    partials — |langs| rows out at any corpus scale; the audit rides
    the same scan that writes the sample."""
    t = load(spark, sf_dir)
    h = F.substring(
        F.md5(F.concat(F.lit("smp"), F.col("doc_id").cast("string"))), 1, 4
    )
    thresh_hex = F.lit("gggg")
    thresh_int = F.lit(65536)
    for lang, hx in _SAMPLE_THRESH.items():
        thresh_hex = F.when(F.col("lang") == lang, hx).otherwise(thresh_hex)
        thresh_int = F.when(
            F.col("lang") == lang, _SAMPLE_THRESH_INT[lang]
        ).otherwise(thresh_int)
    d = t.documents.select(
        "lang",
        F.when(h < thresh_hex, 1).otherwise(0).alias("kept"),
        thresh_int.alias("thresh"),
    )
    return d.groupBy("lang", "thresh").agg(
        F.count("*").cast("long").alias("n_true"),
        F.sum("kept").cast("long").alias("n_kept"),
        rnd(F.first("thresh") * 1.0 / 65536, 6).alias("keep_rate"),
        rnd(F.sum("kept") * 65536.0 / F.first("thresh"), 6).alias("ht_estimate"),
        rnd(
            (F.sum("kept") * 65536.0 / F.first("thresh") - F.count("*"))
            / F.count("*"),
            6,
        ).alias("rel_err"),
    ).drop("thresh")


_SPLIT_CASE_SQL = """
    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
         WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
         ELSE 'test' END
"""


@query(
    "j_split_leakage",
    oracle=f"""
    WITH d AS (SELECT md5(text) AS h, 'exact' AS kind,
                      {_SPLIT_CASE_SQL} AS split
               FROM documents
               UNION ALL
               SELECT md5(array_to_string(
                        list_slice(string_split(text, ' '), 1,
                                   {_PREFIX_TOKENS}), ' ')) AS h,
                      'prefix16' AS kind, {_SPLIT_CASE_SQL} AS split
               FROM documents),
    hs AS (SELECT kind, h, split, CAST(COUNT(*) AS BIGINT) AS n
           FROM d GROUP BY kind, h, split)
    SELECT a.kind, a.split AS split_a, b.split AS split_b,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(a.n) AS BIGINT) AS n_docs_a,
           CAST(SUM(b.n) AS BIGINT) AS n_docs_b
    FROM hs a JOIN hs b ON a.kind = b.kind AND a.h = b.h
                       AND a.split < b.split
    GROUP BY a.kind, a.split, b.split
    """,
)
def j_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-split duplicate leakage at TWO granularities: exact text
    groups ('exact') and first-{n}-token prefix families ('prefix16')
    that span two different splits of the canonical j_split_train_val
    assignment — every such group is an evaluation row whose answer
    (verbatim, or up to shared boilerplate) sits in the training set,
    the documented failure mode behind inflated held-out numbers.
    j_contamination audits leakage against an EXTERNAL benchmark;
    this audits the split against ITSELF — hash-splitting by doc_id
    is stable but duplicate CONTENT still crosses it, which is why
    dedup must run before splitting, and this table is the proof it
    did (the prefix kind catches the template families j_dedup_prefix
    groups, which exact dedup would miss entirely). Per (kind, split
    pair): spanning group count and the document mass on each side.

    Determinism: groups key on md5 of the text / of the literal
    first-{n}-token join; the split is the identical md5-prefix CASE
    as j_split_train_val; all outputs are exact counts; pair
    orientation is the lexicographic split-name order.

    Plan: one narrow two-kind map (a union of two digest
    projections) → (kind, hash, split) hash agg with map-side
    partials (shuffles carry 16-byte digests + counts, never text);
    the self-join runs on the DEDUPED relation — ≤3 rows per (kind,
    hash) — and the rollup emits ≤6 pair rows at any corpus scale."""
    t = load(spark, sf_dir)
    prefix = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = (
        F.when(prefix < "cd", "train").when(prefix < "e6", "val").otherwise("test")
    )
    toks = tokens_col("text")
    d = t.documents.select(
        F.md5("text").alias("h"), F.lit("exact").alias("kind"), split.alias("split")
    ).unionAll(
        t.documents.select(
            F.md5(F.concat_ws(" ", F.slice(toks, 1, _PREFIX_TOKENS))).alias("h"),
            F.lit("prefix16").alias("kind"),
            split.alias("split"),
        )
    )
    hs = d.groupBy("kind", "h", "split").agg(F.count("*").cast("long").alias("n"))
    a = hs.alias("a")
    b = hs.alias("b")
    return (
        a.join(
            b,
            (F.col("a.kind") == F.col("b.kind"))
            & (F.col("a.h") == F.col("b.h"))
            & (F.col("a.split") < F.col("b.split")),
        )
        .groupBy(
            F.col("a.kind").alias("kind"),
            F.col("a.split").alias("split_a"),
            F.col("b.split").alias("split_b"),
        )
        .agg(
            F.count("*").cast("long").alias("n_groups"),
            F.sum("a.n").cast("long").alias("n_docs_a"),
            F.sum("b.n").cast("long").alias("n_docs_b"),
        )
    )


j_split_leakage.__doc__ = j_split_leakage.__doc__.replace(
    "{n}", str(_PREFIX_TOKENS)
)


@query(
    "j_dedup_survivors",
    oracle=f"""
    WITH n0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
    ex AS (SELECT CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n FROM documents),
    pf AS (SELECT CAST(COUNT(DISTINCT md5(array_to_string(
                    list_slice(string_split(text, ' '), 1, {_PREFIX_TOKENS}),
                    ' '))) AS BIGINT) AS n
           FROM documents),
    sh AS (SELECT doc_id, lang, source,
                  list_distinct(list_transform(
                      range(1, greatest(len(toks) - 2, 0) + 1),
                      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s
           FROM (SELECT doc_id, lang, source, string_split(text, ' ') AS toks
                 FROM documents)),
    dropped AS (SELECT DISTINCT b.doc_id
                FROM sh a JOIN sh b
                  ON a.lang = b.lang AND a.source = b.source
                 AND a.doc_id < b.doc_id
                WHERE len(list_intersect(a.s, b.s)) * 1.0
                      / len(list_distinct(a.s || b.s)) >= 0.8),
    nr AS (SELECT n0.n - CAST(COUNT(*) AS BIGINT) AS n
           FROM dropped CROSS JOIN n0 GROUP BY n0.n),
    stages AS (SELECT 0 AS stage, 'raw' AS strategy, n0.n AS n_survivors FROM n0
        UNION ALL SELECT 1, 'exact_md5', ex.n FROM ex
        UNION ALL SELECT 2, 'prefix{_PREFIX_TOKENS}', pf.n FROM pf
        UNION ALL SELECT 3, 'near_jaccard08', nr.n FROM nr)
    SELECT stage, strategy, n_survivors,
           n0.n - n_survivors AS n_removed,
           FLOOR((n0.n - n_survivors) * 1.0 / n0.n * 1000000 + 0.5) / 1000000
             AS removal_rate
    FROM stages CROSS JOIN n0
    """,
)
def j_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivor counts per dedup STRATEGY, side by side — the one-table
    answer to "how much does each dedup pass actually buy on this
    corpus": raw count, exact-text keepers (j_dedup_exact), prefix-
    family keepers (j_dedup_prefix), and single-hop near-dup keepers
    at Jaccard ≥ 0.8 within (lang, source) blocks (j_dedup_ngram's
    pair set; a document is removed when any smaller-id partner
    exists — the greedy min-id keeper rule of j_dedup_embed). Each
    strategy measures independently from raw, so the table ranks
    strategies rather than hiding them behind a pipeline order.

    All counts exact BIGINTs over hash groups / the exact blocked pair
    set; removal_rate is one rounded display division.

    Plan: two digest distinct-counts (16-byte keys shuffle, never
    text), the blocked ground-truth quadratic for the near leg (the
    documented j_dedup_ngram price — the production path is LSH), and
    a 4-row union; every broadcast side is a 1-row count."""
    t = load(spark, sf_dir)
    from ..operators.dedup import shingles_from_toks

    toks = tokens_col("text")
    n0 = t.documents.agg(F.count("*").cast("long").alias("n"))
    ex = t.documents.agg(F.countDistinct(F.md5("text")).cast("long").alias("n"))
    pf = t.documents.agg(
        F.countDistinct(
            F.md5(F.concat_ws(" ", F.slice(toks, 1, _PREFIX_TOKENS)))
        )
        .cast("long")
        .alias("n")
    )
    sh = spread(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", tokens_col("text").alias("_toks")
    ).select(
        "doc_id",
        "lang",
        "source",
        F.transform(shingles_from_toks(F.col("_toks")), lambda x: F.xxhash64(x)).alias(
            "s"
        ),
    ).persist()
    a, b = sh.alias("a"), sh.alias("b")
    jac = F.size(F.array_intersect("a.s", "b.s")) / F.size(F.array_union("a.s", "b.s"))
    dropped = (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .where(jac >= 0.8)
        .select(F.col("b.doc_id").alias("doc_id"))
        .distinct()
        .agg(F.count("*").cast("long").alias("nd"))
    )
    nr = dropped.crossJoin(F.broadcast(n0)).select(
        (F.col("n") - F.col("nd")).alias("n")
    )
    stages = (
        n0.select(F.lit(0).alias("stage"), F.lit("raw").alias("strategy"),
                  F.col("n").alias("n_survivors"))
        .unionAll(ex.select(F.lit(1), F.lit("exact_md5"), F.col("n")))
        .unionAll(pf.select(F.lit(2), F.lit(f"prefix{_PREFIX_TOKENS}"), F.col("n")))
        .unionAll(nr.select(F.lit(3), F.lit("near_jaccard08"), F.col("n")))
    )
    return stages.crossJoin(F.broadcast(n0)).select(
        "stage",
        "strategy",
        "n_survivors",
        (F.col("n") - F.col("n_survivors")).alias("n_removed"),
        rnd((F.col("n") - F.col("n_survivors")) * 1.0 / F.col("n"), 6).alias(
            "removal_rate"
        ),
    )


@query(
    "j_dup_transitivity",
    oracle="""
    WITH sh AS (SELECT doc_id, lang, source,
                       list_distinct(list_transform(
                           range(1, greatest(len(toks) - 2, 0) + 1),
                           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s
                FROM (SELECT doc_id, lang, source, string_split(text, ' ') AS toks
                      FROM documents)),
    e AS (SELECT a.doc_id AS u, b.doc_id AS v
          FROM sh a JOIN sh b
            ON a.lang = b.lang AND a.source = b.source
           AND a.doc_id < b.doc_id
          WHERE len(list_intersect(a.s, b.s)) * 1.0
                / len(list_distinct(a.s || b.s)) >= 0.8),
    adj AS (SELECT u AS m, v AS o FROM e UNION ALL SELECT v, u FROM e),
    wedge AS (SELECT a1.o AS x, a2.o AS y
              FROM adj a1 JOIN adj a2 ON a1.m = a2.m AND a1.o < a2.o),
    closed AS (SELECT CAST(COUNT(*) AS BIGINT) AS n
               FROM wedge JOIN e ON e.u = wedge.x AND e.v = wedge.y),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM wedge),
    ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM e)
    SELECT ne.n AS n_edges, tot.n AS n_wedges, closed.n AS n_closed,
           CASE WHEN tot.n > 0
                THEN FLOOR(closed.n * 1.0 / tot.n * 1000000 + 0.5) / 1000000
                ELSE NULL END AS closure_rate
    FROM ne CROSS JOIN tot CROSS JOIN closed
    """,
)
def j_dup_transitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitivity (wedge-closure rate) of the near-duplicate graph —
    the measurement that justifies or indicts connected-component
    cluster resolution (j_dedup_cluster): a closure rate near 1 means
    near-dup clusters are cliques and CC keepers are safe; a low rate
    means CC chains UNRELATED documents through middlemen and the
    cluster pass over-merges (the classic transitive-closure dedup
    failure). Same wedge/triangle identity as j_clustering_coeff, run
    on the DEDUP pair set instead of the trade graph.

    Exact: the edge set is the j_dedup_ngram grouped ground truth
    (Jaccard ≥ 0.8 within (lang, source) blocks); wedges and closures
    are exact BIGINT counts over integer id pairs; one rounded
    display division.

    Plan: the blocked ground-truth quadratic builds edges (the
    documented exact-audit price); the wedge join is doc_id-keyed on
    the EDGE relation (near-dup graphs are sparse — degrees bounded
    by cluster sizes), and closure is one more equi-join on the pair
    key. All counts are 1-row aggregates."""
    t = load(spark, sf_dir)
    from ..operators.dedup import shingles_from_toks

    sh = t.documents.select(
        "doc_id", "lang", "source", tokens_col("text").alias("_toks")
    ).select(
        "doc_id",
        "lang",
        "source",
        F.transform(shingles_from_toks(F.col("_toks")), lambda x: F.xxhash64(x)).alias(
            "s"
        ),
    ).persist()
    a, b = sh.alias("a"), sh.alias("b")
    jac = F.size(F.array_intersect("a.s", "b.s")) / F.size(F.array_union("a.s", "b.s"))
    e = (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .where(jac >= 0.8)
        .select(F.col("a.doc_id").alias("u"), F.col("b.doc_id").alias("v"))
        .persist()
    )
    adj = e.select(F.col("u").alias("m"), F.col("v").alias("o")).unionAll(
        e.select(F.col("v").alias("m"), F.col("u").alias("o"))
    )
    a1, a2 = adj.alias("a1"), adj.alias("a2")
    wedge = a1.join(
        a2, (F.col("a1.m") == F.col("a2.m")) & (F.col("a1.o") < F.col("a2.o"))
    ).select(F.col("a1.o").alias("x"), F.col("a2.o").alias("y"))
    closed = wedge.join(
        e, (F.col("x") == F.col("u")) & (F.col("y") == F.col("v"))
    ).agg(F.count("*").cast("long").alias("n_closed"))
    tot = wedge.agg(F.count("*").cast("long").alias("n_wedges"))
    ne = e.agg(F.count("*").cast("long").alias("n_edges"))
    return (
        ne.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(closed))
        .select(
            "n_edges",
            "n_wedges",
            "n_closed",
            F.when(
                F.col("n_wedges") > 0,
                rnd(F.col("n_closed") * 1.0 / F.col("n_wedges"), 6),
            ).alias("closure_rate"),
        )
    )


# Yield-curve thresholds on the 1e-6 Jaccard grid.
_YIELD_TAUS6 = [500000, 600000, 700000, 800000, 900000]


@query(
    "j_dedup_yield_curve",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, lang, source,
             list_distinct(list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                 i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s
      FROM (SELECT doc_id, lang, source, string_split(text, ' ') AS toks
            FROM documents)
      WHERE len(toks) >= 3),
    pairs AS (SELECT b.doc_id AS hi,
                     CAST(FLOOR(len(list_intersect(a.s, b.s)) * 1.0
                                / len(list_distinct(a.s || b.s))
                                * 1000000 + 0.5) AS BIGINT) AS j6
              FROM sh a JOIN sh b
                ON a.lang = b.lang AND a.source = b.source
               AND a.doc_id < b.doc_id),
    mj AS (SELECT hi AS doc_id, CAST(MAX(j6) AS BIGINT) AS mj6
           FROM pairs GROUP BY hi),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM sh),
    taus(t6) AS (VALUES {', '.join(f'({t})' for t in _YIELD_TAUS6)})
    SELECT t6 / 1000000.0 AS tau, n_docs,
           CAST(COALESCE((SELECT COUNT(*) FROM mj WHERE mj6 >= taus.t6), 0)
                AS BIGINT) AS n_dropped,
           n_docs - CAST(COALESCE((SELECT COUNT(*) FROM mj
                                   WHERE mj6 >= taus.t6), 0) AS BIGINT)
               AS n_survivors
    FROM taus CROSS JOIN tot
    """,
)
def j_dedup_yield_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup YIELD curve: keeper-set size under min-id near-dup
    dedup at thresholds tau = 0.5..0.9 — all five from ONE exact
    blocked pair pass, because a doc is dropped at tau iff its
    MAXIMUM Jaccard to any smaller-id partner clears tau: one
    max-per-doc aggregate answers every threshold. This is the
    corpus-economics side of the tuning pair — j_jaccard_threshold_
    curve prices what the banding CATCHES per tau, this prices what
    the corpus KEEPS — the two curves an operator overlays to pick
    the dedup operating point (tokens saved vs recall risk).

    EXACT: pair Jaccards floor to the 1e-6 grid (the j_dedup_ngram
    contract, sub-3-token docs excluded symmetrically on both
    engines); per-doc max and the per-tau counts are pure integers —
    a threshold compare on grid BIGINTs can never flip between
    engines.

    Plan: the blocked ground-truth quadratic (audit-scale by intent,
    the j_dedup_survivors contract) collapses to ONE |docs|-row max
    aggregate; the five-threshold rollup is a broadcast VALUES cross
    join over that metadata-scale relation. At 100 TB the pair
    source swaps to the banded candidate set; the curve logic is
    unchanged."""
    t = load(spark, sf_dir)
    d = t.documents.select(
        "doc_id", "lang", "source", tokens_col("text").alias("_toks")
    ).where(F.size("_toks") >= 3)
    arrs = d.select(
        "doc_id",
        "lang",
        "source",
        F.transform(
            shingles_from_toks(F.col("_toks")), lambda x: F.xxhash64(x)
        ).alias("s"),
    )
    a, b = arrs.alias("a"), arrs.alias("b")
    jac = F.size(F.array_intersect("a.s", "b.s")) / F.size(
        F.array_union("a.s", "b.s")
    )
    pairs = a.join(
        b,
        (F.col("a.lang") == F.col("b.lang"))
        & (F.col("a.source") == F.col("b.source"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("b.doc_id").alias("hi"),
        F.floor(jac * 1000000 + F.lit(0.5)).cast("long").alias("j6"),
    )
    mj = pairs.groupBy(F.col("hi").alias("doc_id")).agg(
        F.max("j6").cast("long").alias("mj6")
    )
    tot = arrs.agg(F.count("*").cast("long").alias("n_docs"))
    # every threshold is a CONDITIONAL COUNT over the one per-doc max
    # relation — no tau x docs join (a 5-row cross over |docs| rows is
    # a CartesianProduct the plan audit rightly bans); the fan-out to
    # five rows happens on the 1-row aggregate
    drops = mj.agg(
        *[
            F.count(F.when(F.col("mj6") >= t6, 1))
            .cast("long")
            .alias(f"d{t6}")
            for t6 in _YIELD_TAUS6
        ]
    ).crossJoin(F.broadcast(tot))
    drops = drops.persist()  # 1 row fanned to |taus| output rows
    legs = [
        drops.select(
            F.lit(t6 / 1000000.0).alias("tau"),
            "n_docs",
            F.col(f"d{t6}").alias("n_dropped"),
            (F.col("n_docs") - F.col(f"d{t6}")).alias("n_survivors"),
        )
        for t6 in _YIELD_TAUS6
    ]
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionAll(leg)
    return out
