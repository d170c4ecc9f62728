"""§2.J extensions — corpus-curation operators a production training-data
pipeline runs beyond dedup/similarity: PII redaction, deterministic
train/val/test splitting, duplicate-cluster resolution (connected
components), and an inverted index for exact-match / contamination
lookups. All hash-checked against DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    jaccard_verify,
    lsh_candidate_pairs,
    minhash_signatures,
    tokens_col,
)
from ..registry import query
from ..tables import load

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
    declarative rounds (6) — each round joins labels to the edge list
    and takes the neighborhood min. No driver-side convergence loop, so
    building the DataFrame runs zero jobs (the iterative .count()-per-
    round pattern would be an eager full-scan sync point per iteration).
    Exact whenever component diameter <= rounds; near-dup components are
    quasi-cliques (diameter 1-2 — tests pin convergence on the fixture
    with a 7th-round fixpoint check). At 100 TB swap plain propagation
    for the pointer-doubling variant (O(log d) rounds) behind the same
    interface. Oracle = true transitive closure via recursive CTE."""
    t = load(spark, sf_dir)
    sig = minhash_signatures(t.documents)
    cands = lsh_candidate_pairs(sig)
    pairs = (
        jaccard_verify(cands, t.documents)
        .where(F.col("jaccard") >= 0.8)
        .select("id_a", "id_b")
    )
    labels = cluster_labels(t.documents.select("doc_id"), pairs, rounds=6)
    return labels.select(
        "doc_id",
        F.col("label").alias("cluster_id"),
        (F.col("label") == F.col("doc_id")).alias("is_keeper"),
    )


def cluster_labels(nodes: DataFrame, pairs: DataFrame, rounds: int) -> DataFrame:
    """Min-label propagation over an undirected edge list, expressed as
    `rounds` declarative join+agg rounds (no driver loop, no action).
    nodes: (doc_id); pairs: (id_a, id_b). Returns (doc_id, label)."""
    edges = pairs.select(
        F.col("id_a").alias("u"), F.col("id_b").alias("v")
    ).unionByName(pairs.select(F.col("id_b").alias("u"), F.col("id_a").alias("v")))
    # Persist the edge list: every round references it, and without a
    # cache each round re-executes the ENTIRE upstream pair computation
    # (minhash → LSH bucket join → Jaccard verify) — 6x the most
    # expensive subtree in the query. persist() is lazy (no job here);
    # the first round materializes it and rounds 2..R read the cache.
    # This is the canonical iterative-algorithm pattern: the working set
    # an iteration loop touches every round must be cached, at any scale.
    edges = edges.persist()
    labels = nodes.select("doc_id", F.col("doc_id").alias("label"))
    for _ in range(rounds):
        neigh = (
            edges.join(labels, edges.v == labels.doc_id)
            .groupBy("u")
            .agg(F.min("label").alias("nmin"))
        )
        labels = (
            labels.join(neigh, labels.doc_id == neigh.u, "left")
            .select(
                "doc_id",
                F.least(F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))).alias(
                    "label"
                ),
            )
        )
    return labels


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
