"""Deduplication operators for training-data pipelines.

Four tiers, all expression-first (no Python in the hot path):

- exact:       hash-groupBy on the text (or md5 of it)
- n-gram:      exact Jaccard over token shingles, brute-force pairs
               (the small-scale ground truth)
- MinHash+LSH: shingle → 128 minhashes → 32 bands x 4 rows →
               band-bucket join → candidate pairs → exact-Jaccard verify.
               THE 100 TB path: cost is O(docs x shingles) for
               signatures (one shuffle, map-side partial min) plus a
               band-bucket equi-join that only pairs likely dups —
               never the O(n²) all-pairs.
- SimHash:     64-bit fingerprint; near-dups share chunks (blocking on
               16-bit quarters). Token hash is md5-derived
               (portable_hash64), so signatures are value-checkable
               by any engine with md5.

LSH parameters: b=32 bands, r=4 rows -> s-curve threshold
(1/b)^(1/r) ≈ 0.42; a pair with true Jaccard 0.8 is missed with
probability (1-0.8^4)^32 ≈ 5e-8 — why the verified output can be
oracle-checked against brute force.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NUM_HASHES = 128
BAND_ROWS = 4
NUM_BANDS = NUM_HASHES // BAND_ROWS
SHINGLE_K = 3


def tokens_col(text: str | Column = "text") -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def shingles_from_toks(toks: Column, k: int = SHINGLE_K) -> Column:
    """Distinct k-token shingles from an already-materialized token
    array column; empty if < k tokens. Prefer this over shingles_col
    when the DataFrame can stage `toks` through its own projection —
    the k+1 internal references (k slices + the size guard) then share
    ONE split() instead of re-evaluating it per reference (6 -> 1 split
    nodes in the physical plan, ~20% on the fingerprint job at sf0.1)."""
    m = F.greatest(F.size(toks) - (k - 1), F.lit(0))  # shingle count, >=0
    parts = [F.slice(toks, j + 1, m) for j in range(k)]
    out = parts[0]
    for j in range(1, k):
        out = F.zip_with(out, parts[j], lambda a, b: F.concat(a, F.lit(" "), b))
    return F.array_distinct(out)


def shingles_col(text: str | Column = "text", k: int = SHINGLE_K) -> Column:
    """Distinct k-token shingles as array<string>; empty if < k tokens.

    Shape matters: zip_with over k SHIFTED SLICES of the token array
    evaluates split() k times per ROW. The naive transform(sequence,
    i -> element_at(toks, i+j)) form inlines the split into the lambda,
    re-splitting the text per shingle POSITION — O(k·n) splits per row,
    ~4x slower on the whole dedup family (measured at sf0.1). Callers
    that control the DataFrame should stage the token array and use
    shingles_from_toks instead (one further split-sharing level)."""
    return shingles_from_toks(tokens_col(text), k)


def shingle_rows(
    docs: DataFrame, id_cols: list[str], text_col: str = "text", k: int = SHINGLE_K
) -> DataFrame:
    """(id..., sh) — one row per distinct k-shingle, with the token
    array staged through its own projection (see shingles_from_toks)."""
    base = docs.select(*id_cols, tokens_col(text_col).alias("_toks"))
    return base.select(*id_cols, F.explode(shingles_from_toks(F.col("_toks"), k)).alias("sh"))


def minhash_signatures(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, h0..h127) — min over shingles of xxhash64(shingle || seed).

    Shape: explode shingles then ONE groupBy(id) computing all 128 mins —
    map-side partial aggregation means the shuffle carries one 128-long
    row per document, not per shingle.
    """
    sh = shingle_rows(docs, [id_col], text_col)
    # Hash the shingle STRING once to a long, then derive the 128 seeded
    # hashes from the 8-byte long: each xxhash64(h, i) consumes 8 bytes
    # instead of re-consuming the full shingle bytes 128 times. Identical
    # shingles still yield identical rows of the signature, and the
    # family stays pairwise-uniform (xxhash64 seeded by column position),
    # so the b/r s-curve analysis in the module docstring is unchanged.
    sh = sh.select(F.col(id_col), F.xxhash64("sh").alias("h"))
    # The 128 min-aggregates are built as ONE parsed SQL struct instead
    # of a per-hash Column-op loop: the loop form cost ~640 py4j
    # round-trips of pure driver time per query build (~1 ms each on
    # this host, measured r16). The optimizer's SimplifyExtractValueOps
    # collapses struct(...).h_i back to the bare aggregates, so the
    # physical plan and the signature values are identical.
    fields = ", ".join(f"min(xxhash64(h, {i})) AS h{i}" for i in range(NUM_HASHES))
    return (
        sh.groupBy(id_col)
        .agg(F.expr(f"struct({fields})").alias("_s"))
        .select(id_col, "_s.*")
    )


def lsh_candidate_pairs(sig: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Band the signature and bucket-join: (id_a, id_b) candidate pairs.

    The join key (band, band_hash) is equi — Spark hash-partitions it;
    identical texts land in the same bucket in all 32 bands, hence the
    distinct. Bucket skew (a viral duplicate cluster) is AQE-split.

    The banded frame is PERSISTED: it feeds both sides of the self-join
    and Spark does not ReuseExchange across the two aliases, so without
    the cache the whole minhash pipeline (explode + 128-min agg) runs
    twice (154 xxhash64 nodes in the physical plan; persist measured
    -31% on the LSH job at sf0.1). The cached rows are 3 longs per
    (doc, band) — ~768 bytes/doc at 32 bands, MEMORY_AND_DISK so it
    spills rather than evicts; at 100 TB checkpoint the signatures to
    storage instead (write-once, read-both-sides). CacheManager dedups
    by canonicalized plan, so repeated builds of the same query share
    one cache entry.
    """
    # The 32 band structs are built as ONE parsed SQL array expression
    # instead of a per-band Column-op loop (~260 py4j round-trips of
    # driver time per build — same r16 measurement as minhash above).
    # multi-arg xxhash64 folds the 4 longs directly — no
    # cast-to-string/concat allocation per band.
    band_structs = ", ".join(
        "struct({b} AS band, xxhash64({cols}) AS bh)".format(
            b=b,
            cols=", ".join(f"h{b * BAND_ROWS + j}" for j in range(BAND_ROWS)),
        )
        for b in range(NUM_BANDS)
    )
    bands = sig.select(
        F.col(id_col), F.explode(F.expr(f"array({band_structs})")).alias("x")
    ).select(
        F.col(id_col), F.col("x.band").alias("band"), F.col("x.bh").alias("bh")
    ).persist()
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def jaccard_verify(
    pairs: DataFrame, docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact shingle-Jaccard for each candidate pair (cheap: |pairs| is
    tiny after LSH). Returns (id_a, id_b, jaccard).

    Shingles are hashed to longs first — 8-byte equality in the
    intersect/union; identical to string Jaccard modulo ~2^-64
    collision probability per pair."""
    sh = docs.select(F.col(id_col).alias("_id"), tokens_col(text_col).alias("_toks")).select(
        "_id",
        F.transform(shingles_from_toks(F.col("_toks")), lambda x: F.xxhash64(x)).alias("_sh"),
    )
    out = (
        pairs.join(sh.withColumnRenamed("_id", "id_a").withColumnRenamed("_sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("_id", "id_b").withColumnRenamed("_sh", "sh_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b"))
            ).alias("jaccard"),
        )
    )
    return out


def portable_hash64(c: Column) -> Column:
    """Signed 64-bit hash = first 16 hex chars of md5, as a LONG.

    md5 exists with identical output on Spark, DuckDB, and Python, so
    anything derived from these bits (SimHash votes, chunks) is
    value-checkable by an oracle engine — unlike xxhash64, whose bit
    pattern is Spark-internal. Packed as two 32-bit conv() halves
    because conv('ffff...',16,10) of a full 64-bit value overflows the
    signed-long cast; (hi << 32) | lo is exact two's complement."""
    h = F.md5(c)
    hi = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
    return F.shiftleft(hi, 32).bitwiseOR(lo)


def portable_hash32(c: Column) -> Column:
    """Non-negative 32-bit hash = HIGH md5 word (one conv). Pairs with
    portable_bucket (low word) when two independent-ish portable hash
    values are needed from a single md5 evaluation."""
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def portable_bucket(c: Column, buckets: int) -> Column:
    """Non-negative bucket id from the LOW 32-bit md5 word. One conv,
    no signed-modulo pitfalls (the word is non-negative on both
    engines), recomputable in SQL as CAST('0x'||substr(md5(x),9,8) AS
    BIGINT) % buckets."""
    return F.conv(F.substring(F.md5(c), 9, 8), 16, 10).cast("long") % buckets


def simhash_col(text: str | Column = "text", bits: int = 64) -> Column:
    """64-bit SimHash over distinct tokens, as a signed LONG.

    bit_k(sig) = majority over tokens of bit_k(portable_hash64(token)).
    Pure expressions: per bit, sum ±1 across the token array via
    aggregate(); shiftleft+bitwise-or folds the bits back together.
    """
    toks = F.array_distinct(tokens_col(text))
    hashes = F.transform(toks, lambda t: portable_hash64(t))

    def bit(k: int) -> Column:
        # 1<<63 overflows a signed-long literal — build the mask JVM-side
        mask = F.shiftleft(F.lit(1).cast("long"), k)
        vote = F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc + F.when(h.bitwiseAND(mask) != 0, 1).otherwise(-1),
        )
        return F.when(vote >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))

    sig = F.lit(0).cast("long")
    for k in range(bits):
        sig = sig.bitwiseOR(F.shiftleft(bit(k), k))
    return sig


def simhash_chunks(sig: Column, chunk_bits: int = 16) -> list[Column]:
    """Blocking keys: near-dup signatures (small Hamming distance) agree
    on at least one 16-bit chunk with high probability."""
    mask = (1 << chunk_bits) - 1
    return [
        F.shiftrightunsigned(sig, i * chunk_bits).bitwiseAND(F.lit(mask).cast("long"))
        for i in range(64 // chunk_bits)
    ]


def simhash_table(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, simhash) via explode + one hash agg — bit-identical to
    simhash_col but 3-4x faster (measured): one token hash per distinct
    token instead of 64 re-walks of the token array per row, and the 64
    bit-votes become map-side partial sums."""
    tok = docs.select(F.col(id_col), F.explode(F.array_distinct(tokens_col(text_col))).alias("tk"))
    h = tok.select(id_col, portable_hash64(F.col("tk")).alias("h"))
    # The 64 vote aggregates and the bit-packing are built as parsed SQL
    # strings (one F.expr per agg, ONE for the packed signature) instead
    # of per-bit Column-op loops: the loop form cost ~900 py4j
    # round-trips of pure driver time per query build (~1 ms each on
    # this host, measured r16). shiftleft(1L, k) keeps the k=63 mask
    # exact (a 1<<63 literal overflows signed BIGINT); the CASE/IF and
    # bitwise semantics are identical, so signatures are bit-identical.
    aggs = [
        F.expr(
            f"sum(CASE WHEN (h & shiftleft(CAST(1 AS BIGINT), {k})) != 0 "
            f"THEN 1 ELSE -1 END) AS b{k}"
        )
        for k in range(64)
    ]
    votes = h.groupBy(id_col).agg(*aggs)
    sig = " | ".join(
        f"shiftleft(CASE WHEN b{k} >= 0 THEN CAST(1 AS BIGINT) "
        f"ELSE CAST(0 AS BIGINT) END, {k})"
        for k in range(64)
    )
    return votes.select(id_col, F.expr(f"CAST(0 AS BIGINT) | {sig}").alias("simhash"))
