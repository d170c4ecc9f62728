"""§2.J additions (r6 continuation, batch 3) — data-LAYOUT operators:
the writer-side machinery that decides whether a 100 TB table is
scannable or prunable at all. Query engines get graded on reads, but a
training-data pipeline spends half its life writing: shard manifests
(release auditing / incremental diff), Z-order keys (multi-dimensional
data skipping — the Morton-curve layout popularized by Delta/Iceberg
OPTIMIZE ZORDER, public), and equi-depth histograms (the ANALYZE-stats
primitive cost-based optimizers and skew planners read).

All three emit STATISTICS relations — small, per-shard/file/bucket —
so every one is an aggregation whose output is orders of magnitude
smaller than its input: the natural shape for collect-free layout
tooling at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import rnd, sql_rnd
from ..operators.dedup import tokens_col
from ..registry import query
from ..tables import load

# Z-order: 8-bit grid per dimension (16-bit Morton key), 64-cell files,
# and a literal box query to score prunability against.
_Z_BITS = 8
_Z_FILE_SHIFT = 6
_Z_BOX = (100, 140, 60, 100)  # bx_lo, bx_hi, by_lo, by_hi

# Equi-depth histogram: B buckets over documents.n_chars.
_HIST_B = 8


def _interleave_sql(bx: str, by: str) -> str:
    """16-bit Morton interleave as portable integer bit ops (SQL)."""
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"((({bx} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({by} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


@query(
    "j_shard_manifest",
    oracle="""
    WITH k AS (SELECT doc_id,
                      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
                      md5(CAST(doc_id AS VARCHAR) || ':epoch0') AS h
               FROM documents),
    s AS (SELECT doc_id, n_tok,
                 CAST(concat('0x', substr(h, 9, 8)) AS BIGINT) % 64 AS shard,
                 CAST(concat('0x', substr(h, 1, 8)) AS BIGINT) AS sort_key
          FROM k)
    SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc,
           md5(string_agg(CAST(doc_id AS VARCHAR), ','
                          ORDER BY sort_key, doc_id)) AS manifest_md5
    FROM s GROUP BY shard
    """,
)
def j_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard manifest for a training-data release: per shard (the
    j_shuffle_shards scheme — salted portable hash, here epoch
    'epoch0'), the doc/token counts,
    the doc_id range, and a FINGERPRINT — md5 over the shard's doc_ids
    in training order — that makes releases auditable and incremental
    diffs O(shards) instead of O(docs): two releases disagree exactly
    where the 64 fingerprints disagree.

    One shard-keyed hash agg; the in-shard training order is explicit
    (array_sort over (sort_key, doc_id) structs — the d_agg_collect
    determinism pattern), so the fingerprint is stable under any
    partitioning. Output is |shards| rows regardless of corpus size —
    the manifest of a 100 TB release is kilobytes."""
    from ..operators.dedup import portable_bucket, portable_hash32

    t = load(spark, sf_dir)
    key = F.concat(F.col("doc_id").cast("string"), F.lit(":epoch0"))
    s = t.documents.select(
        "doc_id",
        F.size(tokens_col("text")).cast("long").alias("n_tok"),
        portable_bucket(key, 64).alias("shard"),
        portable_hash32(key).alias("sort_key"),
    )
    ordered_ids = F.transform(
        F.array_sort(F.collect_list(F.struct("sort_key", "doc_id"))),
        lambda x: x["doc_id"].cast("string"),
    )
    return s.groupBy("shard").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
        F.md5(F.concat_ws(",", ordered_ids)).alias("manifest_md5"),
    )


@query(
    "j_zorder_stats",
    oracle=f"""
    WITH pt AS (SELECT s_suppkey,
                       ((s_suppkey * 13) % 300) * 256 // 300 AS bx,
                       ((s_suppkey * 7) % 120) * 256 // 120 AS by
                FROM supplier),
    z AS (SELECT s_suppkey, bx, by,
                 ({_interleave_sql('bx', 'by')}) AS zkey
          FROM pt),
    f AS (SELECT zkey >> {_Z_FILE_SHIFT} AS file_id,
                 CAST(COUNT(*) AS BIGINT) AS n_rows,
                 MIN(bx) AS min_bx, MAX(bx) AS max_bx,
                 MIN(by) AS min_by, MAX(by) AS max_by
          FROM z GROUP BY 1)
    SELECT CAST(file_id AS BIGINT) AS file_id, n_rows,
           CAST(min_bx AS BIGINT) AS min_bx, CAST(max_bx AS BIGINT) AS max_bx,
           CAST(min_by AS BIGINT) AS min_by, CAST(max_by AS BIGINT) AS max_by,
           (max_bx < {_Z_BOX[0]} OR min_bx > {_Z_BOX[1]}
            OR max_by < {_Z_BOX[2]} OR min_by > {_Z_BOX[3]}) AS prunable
    FROM f
    """,
)
def j_zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton curve) layout statistics: grid the synthetic
    supplier coordinates (the h_geo_* convention) to an 8-bit cell per
    dimension, interleave the bits into a 16-bit Z key, group rows into
    Z-range 'files' (zkey >> 6), and emit per-file min/max envelopes
    plus whether a literal box query could PRUNE the file — the
    mechanics behind Delta/Iceberg OPTIMIZE ZORDER, made inspectable.

    Why it matters at 100 TB: sorting a write by the Morton key makes
    parquet row-group min/max stats selective in BOTH dimensions at
    once, so a 2-D range query skips most files (the prunable flag
    measures exactly that); a 1-D sort gives one selective dimension
    and leaves the other's envelope full-width. The whole computation
    is integer bit arithmetic on the scan (modular grid → shifts/ands),
    one hash agg on file_id — no shuffle carries more than the grid
    cells, and the output is |files| rows."""
    t = load(spark, sf_dir)
    pt = t.supplier.select(
        "s_suppkey",
        F.expr("((s_suppkey * 13) % 300 * 256) div 300").alias("bx"),
        F.expr("((s_suppkey * 7) % 120 * 256) div 120").alias("by"),
    )
    z = pt.select(
        "s_suppkey", "bx", "by", F.expr(_interleave_sql("bx", "by")).alias("zkey")
    )
    f = z.groupBy(F.shiftright("zkey", _Z_FILE_SHIFT).cast("long").alias("file_id")).agg(
        F.count("*").cast("long").alias("n_rows"),
        F.min("bx").alias("min_bx"),
        F.max("bx").alias("max_bx"),
        F.min("by").alias("min_by"),
        F.max("by").alias("max_by"),
    )
    bx_lo, bx_hi, by_lo, by_hi = _Z_BOX
    return f.select(
        "file_id",
        "n_rows",
        "min_bx",
        "max_bx",
        "min_by",
        "max_by",
        (
            (F.col("max_bx") < bx_lo)
            | (F.col("min_bx") > bx_hi)
            | (F.col("max_by") < by_lo)
            | (F.col("min_by") > by_hi)
        ).alias("prunable"),
    )


@query(
    "j_histogram_equi",
    oracle=f"""
    WITH b AS (SELECT {', '.join(
        f"quantile_cont(n_chars, {i}.0/{_HIST_B}) AS q{i}"
        for i in range(1, _HIST_B))}
               FROM documents),
    a AS (SELECT d.n_chars,
                 ({' + '.join(
        f"CASE WHEN d.n_chars > b.q{i} THEN 1 ELSE 0 END"
        for i in range(1, _HIST_B))}) AS bucket
          FROM documents d CROSS JOIN b)
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(n_chars) AS lo, MAX(n_chars) AS hi
    FROM a GROUP BY bucket
    """,
)
def j_histogram_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth histogram of documents.n_chars (8 buckets) — the
    ANALYZE-TABLE statistic cost-based optimizers and skew planners
    consume: bucket boundaries are the exact 1/8..7/8 percentiles
    (linear interpolation, the d_agg_percentile parity contract), rows
    land in the bucket counting boundaries strictly below them, and
    each bucket reports its actual [lo, hi] envelope and depth.

    Plan: ONE pass computes all 7 boundaries (percentile with an array
    argument — a single 1-row aggregate), which then broadcasts into a
    stateless bucket-assignment projection and one hash agg on the
    bucket id. The percentile agg is the only non-mergeable piece —
    at 100 TB swap `percentile` for `approx_percentile` exactly as
    j_lm_buckets documents (tests/test_scale_paths.py pins that swap's
    plan); boundaries compare on identical doubles in both engines
    because n_chars is integer-valued."""
    t = load(spark, sf_dir)
    fracs = ", ".join(f"{i}D / {_HIST_B}" for i in range(1, _HIST_B))
    b = t.documents.agg(
        F.expr(f"percentile(n_chars, array({fracs}))").alias("qs")
    )
    bucket = sum(
        F.when(F.col("n_chars") > F.col("qs").getItem(i - 1), 1).otherwise(0)
        for i in range(1, _HIST_B)
    )
    return (
        t.documents.select("n_chars")
        .crossJoin(F.broadcast(b))
        .select(bucket.cast("long").alias("bucket"), "n_chars")
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("n_chars").alias("lo"),
            F.max("n_chars").alias("hi"),
        )
    )


# Columns profiled by j_profile_stats (ANALYZE-style table stats).
_PROFILE_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)


@query(
    "j_profile_stats",
    oracle="\nUNION ALL\n".join(
        f"""
    SELECT '{c}' AS column_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
           FLOOR((COUNT(*) - COUNT({c})) * 1.0 / COUNT(*) * 1000000 + 0.5)
             / 1000000 AS null_frac
    FROM orders"""
        for c in _PROFILE_COLS
    ),
)
def j_profile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style per-column table profile of `orders`: row count,
    null count, exact distinct count, and null fraction for every
    column — the statistics relation a cost-based optimizer (and a data
    steward) reads before anything else, and the sibling of
    j_histogram_equi's distribution stats.

    One pass: a single wide aggregate computes all 6 columns' counts
    (Spark plans multi-column exact DISTINCT as one Expand — 6x the agg
    input rows but still a single shuffle and one scan), then a
    stack() unpivots the 1-row result into the (column, stats) relation
    client tools expect. At 100 TB the exact distinct swaps for
    approx_count_distinct (HLL++, the d_agg_approx path) and the Expand
    disappears — stats collection must never cost more than the queries
    it serves; exact is kept here for value-level verifiability."""
    t = load(spark, sf_dir)
    aggs = [F.count("*").cast("long").alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).cast("long").alias(f"null_{c}")
        )
        aggs.append(F.countDistinct(c).cast("long").alias(f"dist_{c}"))
    one = t.orders.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', null_{c}, dist_{c}" for c in _PROFILE_COLS
    )
    return one.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_args}) AS (column_name, n_null, n_distinct)",
        "n_rows",
    ).select(
        "column_name",
        "n_rows",
        "n_null",
        "n_distinct",
        rnd(F.col("n_null") * 1.0 / F.col("n_rows"), 6).alias("null_frac"),
    )


# Skew diagnostic: top-N heavy hitters reported.
_SKEW_TOPN = 10

# Compaction planner: "files" are (source, doc_id div 50) groups; bins
# target this many chars.
_COMPACT_FILE_DIV = 50
_COMPACT_TARGET = 20000


@query(
    "j_skew_stats",
    oracle=f"""
    WITH k AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total,
                   CAST(COUNT(*) AS BIGINT) AS nkeys
            FROM k),
    top AS (SELECT user_id, n,
                   ROW_NUMBER() OVER (ORDER BY n DESC, user_id) AS rk
            FROM k)
    SELECT CAST(rk AS BIGINT) AS rk, user_id, CAST(n AS BIGINT) AS n_rows,
           nkeys AS n_keys, total AS n_total,
           FLOOR(n * 1.0 / total * 1000000 + 0.5) / 1000000 AS share,
           FLOOR(n * 1.0 * nkeys / total * 10000 + 0.5) / 10000 AS x_avg
    FROM top, tot WHERE rk <= {_SKEW_TOPN}
    """,
)
def j_skew_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/aggregation-key skew diagnostic over events.user_id: the
    top-{N} heavy hitters with their row counts, share of the table,
    and multiple-of-average (x_avg) — the relation a planner (or an
    engineer deciding whether d_agg_salted / c_join_salted is worth
    its extra exchange) reads BEFORE the big job runs. x_avg is the
    skew factor: x_avg ~ 1 means uniform keys, x_avg >> shuffle
    parallelism means one straggler task owns the job's tail latency.

    Plan: one hash agg on the key (map-side combined — the diagnostic
    costs one pass over the table and |keys| shuffled rows), a 1-row
    totals broadcast, and a top-{N} TakeOrderedAndProject + rank over
    {N} rows — never a global sort or a full-key window. Output is
    {N} rows at any scale. Shares divide exact BIGINTs once, on
    identical operands, in both engines."""
    t = load(spark, sf_dir)
    k = t.events.groupBy("user_id").agg(F.count("*").alias("n"))
    tot = k.agg(
        F.sum("n").cast("long").alias("n_total"),
        F.count("*").cast("long").alias("n_keys"),
    )
    top = k.orderBy(F.col("n").desc(), F.col("user_id")).limit(_SKEW_TOPN)
    from pyspark.sql import Window

    w = Window.orderBy(F.col("n").desc(), F.col("user_id"))
    return (
        top.crossJoin(F.broadcast(tot))
        .select(
            F.row_number().over(w).cast("long").alias("rk"),
            "user_id",
            F.col("n").cast("long").alias("n_rows"),
            "n_keys",
            "n_total",
            rnd(F.col("n") * 1.0 / F.col("n_total"), 6).alias("share"),
            rnd(F.col("n") * 1.0 * F.col("n_keys") / F.col("n_total"), 4).alias(
                "x_avg"
            ),
        )
    )


j_skew_stats.__doc__ = j_skew_stats.__doc__.replace("{N}", str(_SKEW_TOPN))


@query(
    "j_compaction_plan",
    oracle=f"""
    WITH files AS (
      SELECT source, doc_id // {_COMPACT_FILE_DIV} AS file_id,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS bytes
      FROM documents GROUP BY 1, 2),
    planned AS (
      SELECT source, file_id, n_docs, bytes,
             CAST((SUM(bytes) OVER (PARTITION BY source
                                    ORDER BY file_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) - bytes)
                  // {_COMPACT_TARGET} AS BIGINT) AS bin
      FROM files)
    SELECT source, bin, CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(n_docs) AS BIGINT) AS n_docs,
           CAST(SUM(bytes) AS BIGINT) AS bytes,
           MIN(file_id) AS first_file, MAX(file_id) AS last_file,
           SUM(bytes) >= {_COMPACT_TARGET} AS full_bin
    FROM planned GROUP BY source, bin
    """,
)
def j_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planner (the OPTIMIZE/bin-packing step of
    Delta/Iceberg table maintenance, public): model files as
    (source, doc_id div {D}) groups with bytes = total chars, then
    greedily pack consecutive files per source into target-size bins
    via the prefix-sum trick — bin = (bytes before me) div target —
    the order-preserving first-fit that table formats use so compacted
    files keep their clustering. Emits per-bin rollups: file count,
    bytes, the [first_file, last_file] range each rewrite task reads,
    and whether the bin reached the target (the trailing partial bin
    per source is expected — it rolls into the next compaction run).

    Plan: one groupBy builds the file manifest (|files| rows — already
    tiny relative to the table), ONE per-source window computes the
    exclusive prefix sum (integer-exact in both engines), one hash agg
    forms bins. At 100 TB the manifest comes from the table format's
    metadata layer instead of a scan, and the plan relation this emits
    IS the rewrite job list — bounded by |files|, never by rows."""
    t = load(spark, sf_dir)
    from pyspark.sql import Window

    files = t.documents.groupBy(
        "source", (F.col("doc_id") / _COMPACT_FILE_DIV).cast("long").alias("file_id")
    ).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("bytes"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("file_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    planned = files.select(
        "source",
        "file_id",
        "n_docs",
        "bytes",
        ((F.sum("bytes").over(w) - F.col("bytes")) / _COMPACT_TARGET)
        .cast("long")
        .alias("bin"),
    )
    return planned.groupBy("source", "bin").agg(
        F.count("*").cast("long").alias("n_files"),
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("bytes").cast("long").alias("bytes"),
        F.min("file_id").alias("first_file"),
        F.max("file_id").alias("last_file"),
        (F.sum("bytes") >= _COMPACT_TARGET).alias("full_bin"),
    )


j_compaction_plan.__doc__ = j_compaction_plan.__doc__.replace(
    "{D}", str(_COMPACT_FILE_DIV)
)


@query(
    "j_length_deciles",
    oracle=f"""
    WITH hist AS (SELECT n_chars, CAST(COUNT(*) AS BIGINT) AS n
                  FROM documents GROUP BY n_chars),
    cum AS (SELECT n_chars, n,
                   CAST(SUM(n) OVER (ORDER BY n_chars
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS c
            FROM hist),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM hist),
    grid AS (SELECT CAST(unnest(range(1, 10)) AS BIGINT) AS decile, nn,
                    (CAST(unnest(range(1, 10)) AS BIGINT) * nn + 9) // 10
                      AS target_rank
             FROM tot),
    hit AS (SELECT g.decile, g.nn, g.target_rank,
                   MIN(cum.n_chars) AS boundary, MIN(cum.c) AS n_le
            FROM grid g JOIN cum ON cum.c >= g.target_rank
            GROUP BY g.decile, g.nn, g.target_rank)
    SELECT decile, target_rank, boundary, n_le,
           {sql_rnd("n_le * 1.0 / nn", 6)} AS frac_le
    FROM hit
    """,
)
def j_length_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT discrete deciles of documents.n_chars WITHOUT a global
    sort — the scalable form of percentile_disc: the boundary for
    quantile q is the smallest value whose cumulative count reaches
    ceil(q·N/10), read off a VALUE HISTOGRAM instead of ranked rows.
    Where j_histogram_equi interpolates (percentile_cont — a
    non-mergeable exact aggregate), this is the type-1/lower quantile
    on exact BIGINT counts, and it distributes: the histogram is one
    hash agg with map-side partials, and the only window runs over
    DISTINCT VALUES (≤ max doc length rows — actual metadata at any
    corpus size), the j_gini_tokens tie-block discipline applied to
    quantile selection. No task ever sees ranked corpus rows.

    Exactness: target ranks are ceil via (q·N + 9) div 10 on BIGINTs
    (non-negative, so `div`/`//` agree — the documented sign
    precondition); boundary/n_le are MINs over the monotone cum
    relation; the single float op is the display fraction (rnd 1e-6).

    Plan: corpus-touching work is ONE (n_chars) hash agg; the
    cumulative window, the 9-row grid theta-join and the final rollup
    are all histogram-sized."""
    t = load(spark, sf_dir)
    hist = t.documents.groupBy("n_chars").agg(F.count("*").cast("long").alias("n"))
    # single-partition window over DISTINCT LENGTHS only (metadata) —
    # the same deliberate shape as the jaccard/selective curves
    w = Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select("n_chars", "n", F.sum("n").over(w).cast("long").alias("c"))
    tot = hist.agg(F.sum("n").cast("long").alias("nn"))
    grid = tot.select(
        "nn",
        F.explode(F.array(*[F.lit(i).cast("long") for i in range(1, 10)])).alias(
            "decile"
        ),
    ).select("decile", "nn", F.expr("(decile * nn + 9) div 10").alias("target_rank"))
    hit = (
        F.broadcast(grid)
        .join(cum, F.col("c") >= F.col("target_rank"))
        .groupBy("decile", "nn", "target_rank")
        .agg(F.min("n_chars").alias("boundary"), F.min("c").alias("n_le"))
    )
    return hit.select(
        "decile",
        "target_rank",
        "boundary",
        "n_le",
        rnd(F.col("n_le") * 1.0 / F.col("nn"), 6).alias("frac_le"),
    )


@query(
    "j_slice_deciles",
    oracle=f"""
    WITH hist AS (SELECT lang, n_chars, CAST(COUNT(*) AS BIGINT) AS n
                  FROM documents GROUP BY lang, n_chars),
    cum AS (SELECT lang, n_chars, n,
                   CAST(SUM(n) OVER (PARTITION BY lang ORDER BY n_chars
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS c
            FROM hist),
    tot AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS nn FROM hist GROUP BY lang),
    grid AS (SELECT lang, CAST(unnest(range(1, 10)) AS BIGINT) AS decile, nn,
                    (CAST(unnest(range(1, 10)) AS BIGINT) * nn + 9) // 10
                      AS target_rank
             FROM tot),
    hit AS (SELECT g.lang, g.decile, g.nn, g.target_rank,
                   MIN(cum.n_chars) AS boundary, MIN(cum.c) AS n_le
            FROM grid g JOIN cum ON cum.lang = g.lang
                                AND cum.c >= g.target_rank
            GROUP BY g.lang, g.decile, g.nn, g.target_rank)
    SELECT lang, decile, target_rank, boundary, n_le,
           {sql_rnd("n_le * 1.0 / nn", 6)} AS frac_le
    FROM hit
    """,
)
def j_slice_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-LANG exact discrete deciles of n_chars — j_length_deciles'
    histogram discipline applied per slice, which is how a curation
    dashboard actually consumes quantiles (a global decile table hides
    that zh documents run half the length of en ones; per-slice
    boundaries are what length filters and packing budgets should key
    on). Same type-1/lower-quantile semantics: boundary(lang, q) =
    smallest value whose per-lang cumulative count reaches
    ceil(q·N_lang/10), all counts exact BIGINTs.

    Plan: ONE (lang, n_chars) hash agg with map-side partials; the
    cumulative window PARTITIONS BY lang over distinct values (so it
    parallelizes across slices AND gets the map-side WindowGroupLimit
    treatment unavailable to global windows — measured r11); the
    9·|langs|-row grid theta-joins against the cum relation. Output
    is 9·|langs| dashboard rows at any corpus scale."""
    t = load(spark, sf_dir)
    hist = t.documents.groupBy("lang", "n_chars").agg(
        F.count("*").cast("long").alias("n")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.select(
        "lang", "n_chars", "n", F.sum("n").over(w).cast("long").alias("c")
    )
    tot = hist.groupBy("lang").agg(F.sum("n").cast("long").alias("nn"))
    grid = tot.select(
        "lang",
        "nn",
        F.explode(F.array(*[F.lit(i).cast("long") for i in range(1, 10)])).alias(
            "decile"
        ),
    ).select(
        "lang",
        "nn",
        "decile",
        # integer `div`, not double /: (decile*nn+9)/10 rounds through a
        # double and can diverge from the exact integer result once
        # decile*nn+9 exceeds 2^53 — the oracle and the sibling
        # j_length_deciles both compute this in pure BIGINT arithmetic
        # (operands are positive, so trunc-div == floor-div here).
        F.expr("(decile * nn + 9) div 10").alias("target_rank"),
    )
    g = grid.alias("g")
    cm = cum.alias("cm")
    hit = (
        F.broadcast(g)
        .join(
            cm,
            (F.col("g.lang") == F.col("cm.lang"))
            & (F.col("cm.c") >= F.col("g.target_rank")),
        )
        .groupBy(F.col("g.lang").alias("lang"), "decile", "nn", "target_rank")
        .agg(
            F.min(F.col("cm.n_chars")).cast("long").alias("boundary"),
            F.min(F.col("cm.c")).cast("long").alias("n_le"),
        )
    )
    return hit.select(
        "lang",
        "decile",
        "target_rank",
        "boundary",
        "n_le",
        rnd(F.col("n_le") * 1.0 / F.col("nn"), 6).alias("frac_le"),
    )


def _gridleg_sql(col: str, alias: str) -> str:
    """Boundary-array CTEs for one feature: exact type-1 deciles of
    `col` collected into a 9-element sorted list (metadata-scale)."""
    return f"""
    {alias}_hist AS (SELECT {col} AS v, CAST(COUNT(*) AS BIGINT) AS n
                     FROM feat GROUP BY {col}),
    {alias}_cum AS (SELECT v, SUM(n) OVER (ORDER BY v) AS c FROM {alias}_hist),
    {alias}_tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM {alias}_hist),
    {alias}_bnd AS (SELECT list(b ORDER BY b) AS barr FROM (
        SELECT g.decile, MIN(cum.v) AS b
        FROM (SELECT unnest(range(1, 10)) AS decile) g
        CROSS JOIN {alias}_tot t
        JOIN {alias}_cum cum ON cum.c >= (g.decile * t.nn + 9) // 10
        GROUP BY g.decile))"""


@query(
    "j_decile_grid_2d",
    oracle=f"""
    WITH feat AS (SELECT CAST(n_chars AS BIGINT) AS x,
                         CAST(len(string_split(text, ' ')) AS BIGINT) AS y
                  FROM documents),
    {_gridleg_sql('x', 'bx')},
    {_gridleg_sql('y', 'by')},
    assigned AS (SELECT 1 + len(list_filter(bx_bnd.barr, b -> x > b)) AS gx,
                        1 + len(list_filter(by_bnd.barr, b -> y > b)) AS gy
                 FROM feat CROSS JOIN bx_bnd CROSS JOIN by_bnd),
    cell AS (SELECT gx, gy, CAST(COUNT(*) AS BIGINT) AS n
             FROM assigned GROUP BY gx, gy),
    rt AS (SELECT gx, CAST(SUM(n) AS BIGINT) AS row_tot FROM cell GROUP BY gx),
    ct AS (SELECT gy, CAST(SUM(n) AS BIGINT) AS col_tot FROM cell GROUP BY gy),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM cell)
    SELECT cell.gx, cell.gy, cell.n, rt.row_tot, ct.col_tot,
           {sql_rnd("rt.row_tot * 1.0 * ct.col_tot / tot.nn", 6)} AS expected,
           {sql_rnd("cell.n * 1.0 * tot.nn / (rt.row_tot * 1.0 * ct.col_tot)", 6)}
             AS lift
    FROM cell JOIN rt USING (gx) JOIN ct USING (gy) CROSS JOIN tot
    """,
)
def j_decile_grid_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D decile occupancy grid: every document lands in a
    (char-length decile × token-count decile) cell, with the
    independence-expected count and the observed/expected lift — the
    stratified-sampling DESIGN audit (a sampler stratifying on both
    features needs to know which cells are empty or exploding before
    it allocates quotas) and the 2-D generalization of
    j_length_deciles' exact-quantile discipline. Off-diagonal mass is
    the same metadata-integrity signal j_feature_corr scores as one
    number, here localized to the offending cells.

    EXACT: decile boundaries are type-1 lower quantiles from
    cumulative BIGINT counts (the j_length_deciles identity, (q·N+9)
    div 10 in pure integer arithmetic); cell assignment counts
    boundaries strictly below the value against a collected 9-element
    boundary array (exact comparisons); expected/lift are single
    rounded display divisions over exact integers.

    Plan: per feature, ONE distinct-value hash agg (value domains are
    bounded — lengths, token counts) + a cumulative window over
    distinct values + a 9-row boundary grid COLLECTED into one array
    literal-like 1-row relation; assignment is a doubly-broadcast
    crossJoin (two 1-row arrays) evaluated map-side on the scan, then
    ONE ≤100-cell hash agg. Marginals and lift run on ≤100 rows. The
    cumulative windows are unpartitioned but over |distinct values|
    rows, not corpus rows — the j_length_deciles precedent."""
    t = load(spark, sf_dir)
    feat = t.documents.select(
        F.col("n_chars").cast("long").alias("x"),
        F.size(tokens_col("text")).cast("long").alias("y"),
    )

    def boundaries(col: str):
        # distinct-value histogram: metadata-scale, shuffle-containing,
        # referenced by cum/tot — persist per the SCALE.md 4r rule
        hist = feat.groupBy(col).agg(F.count("*").cast("long").alias("n")).persist()
        w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, 0)
        cum = hist.select(
            F.col(col).alias("v"), F.sum("n").over(w).cast("long").alias("c")
        )
        tot = hist.agg(F.sum("n").cast("long").alias("nn"))
        grid = tot.select(
            F.explode(F.array(*[F.lit(i).cast("long") for i in range(1, 10)])).alias(
                "decile"
            ),
            "nn",
        ).select("decile", F.expr("(decile * nn + 9) div 10").alias("tr"))
        b = (
            F.broadcast(grid)
            .join(cum, F.col("c") >= F.col("tr"))
            .groupBy("decile")
            .agg(F.min("v").alias("b"))
        )
        return F.broadcast(b.agg(F.sort_array(F.collect_list("b")).alias("barr")))

    bx = boundaries("x").select(F.col("barr").alias("bx"))
    by = boundaries("y").select(F.col("barr").alias("by"))
    assigned = (
        feat.crossJoin(bx)
        .crossJoin(by)
        .select(
            (
                1 + F.size(F.filter("bx", lambda b: F.col("x") > b))
            ).cast("long").alias("gx"),
            (
                1 + F.size(F.filter("by", lambda b: F.col("y") > b))
            ).cast("long").alias("gy"),
        )
    )
    cell = assigned.groupBy("gx", "gy").agg(
        F.count("*").cast("long").alias("n")
    ).persist()  # <=100 rows, feeds rt/ct/tot and the final join
    rt = cell.groupBy("gx").agg(F.sum("n").cast("long").alias("row_tot"))
    ct = cell.groupBy("gy").agg(F.sum("n").cast("long").alias("col_tot"))
    tot = cell.agg(F.sum("n").cast("long").alias("nn"))
    return (
        cell.join(F.broadcast(rt), "gx")
        .join(F.broadcast(ct), "gy")
        .crossJoin(F.broadcast(tot))
        .select(
            "gx",
            "gy",
            "n",
            "row_tot",
            "col_tot",
            rnd(F.col("row_tot") * 1.0 * F.col("col_tot") / F.col("nn"), 6).alias(
                "expected"
            ),
            rnd(
                F.col("n") * 1.0 * F.col("nn") / (F.col("row_tot") * 1.0 * F.col("col_tot")),
                6,
            ).alias("lift"),
        )
    )


@query(
    "j_shard_skew",
    oracle="""
    WITH k AS (SELECT doc_id,
                      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
                      md5(CAST(doc_id AS VARCHAR) || ':epoch0') AS h
               FROM documents),
    s AS (SELECT CAST(concat('0x', substr(h, 9, 8)) AS BIGINT) % 64 AS shard,
                 n_tok
          FROM k),
    m AS (SELECT shard, CAST(SUM(n_tok) AS BIGINT) AS toks
          FROM s GROUP BY shard),
    agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_shards,
                   CAST(SUM(toks) AS BIGINT) AS total_tokens,
                   CAST(MIN(toks) AS BIGINT) AS min_tokens,
                   CAST(MAX(toks) AS BIGINT) AS max_tokens,
                   SUM(CAST(toks AS HUGEINT) * toks) AS q
            FROM m)
    SELECT n_shards, total_tokens, min_tokens, max_tokens,
           CAST((2 * total_tokens + n_shards) // (2 * n_shards) AS BIGINT)
               AS mean_tokens,
           FLOOR(sqrt(CAST(n_shards * q
                           - CAST(total_tokens AS HUGEINT) * total_tokens
                           AS DOUBLE))
                 / CAST(total_tokens AS DOUBLE) * 1000000 + 0.5) / 1000000
               AS cov,
           CAST((2000000 * CAST(max_tokens AS HUGEINT) * n_shards
                 + total_tokens)
                // (2 * CAST(total_tokens AS HUGEINT)) AS BIGINT)
               / 1000000.0 AS straggler_factor
    FROM agg
    """,
)
def j_shard_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-skew economics of the j_shard_manifest release layout in
    ONE row: min/max/mean token mass across the 64 shards, the
    coefficient of variation, and the straggler factor max/mean — the
    number a data-parallel training run multiplies its wall-clock by,
    since the epoch ends when the FATTEST shard does. Reads next to
    j_shard_manifest (which fingerprints the shards) and
    j_shuffle_shards (which assigns them): manifest says what's in
    each shard, this says whether the assignment is load-balanced
    enough to train on.

    EXACT: shard masses are BIGINT sums; the second moment widens to
    HUGEINT ↔ DECIMAL(38,0) BEFORE squaring; cov applies IEEE sqrt +
    one division to exact integers (n·Q − S² is the exact variance
    numerator — the j_assortativity recipe) and rounds 1e-6; mean and
    straggler_factor are pure integer (2S+n) div 2n half-up (HUGEINT
    in the oracle — DuckDB's // on DECIMAL is true division).

    Plan: one corpus pass collapsing to 64 (shard, mass) rows
    map-side, then a 1-row fold — the statistic costs one scan at any
    corpus scale, and at 100 TB it reads the manifest's stored
    per-shard masses instead of re-tokenizing."""
    from ..operators.dedup import portable_bucket

    t = load(spark, sf_dir)
    dec = "decimal(38,0)"
    key = F.concat(F.col("doc_id").cast("string"), F.lit(":epoch0"))
    s = t.documents.select(
        portable_bucket(key, 64).alias("shard"),
        F.size(tokens_col("text")).cast("long").alias("n_tok"),
    )
    m = s.groupBy("shard").agg(F.sum("n_tok").cast("long").alias("toks"))
    agg = m.agg(
        F.count("*").cast("long").alias("n_shards"),
        F.sum("toks").cast("long").alias("total_tokens"),
        F.min("toks").cast("long").alias("min_tokens"),
        F.max("toks").cast("long").alias("max_tokens"),
        F.sum(F.col("toks").cast(dec) * F.col("toks")).cast(dec).alias("q"),
    )
    return agg.select(
        "n_shards",
        "total_tokens",
        "min_tokens",
        "max_tokens",
        F.expr("(2 * total_tokens + n_shards) div (2 * n_shards)")
        .cast("long")
        .alias("mean_tokens"),
        (
            F.floor(
                F.sqrt(
                    (
                        F.col("n_shards") * F.col("q")
                        - F.col("total_tokens").cast(dec) * F.col("total_tokens")
                    ).cast("double")
                )
                / F.col("total_tokens").cast("double")
                * 1000000
                + F.lit(0.5)
            )
            / 1000000
        ).alias("cov"),
        (
            F.expr(
                "CAST((2000000 * CAST(max_tokens AS DECIMAL(38,0)) * n_shards"
                " + total_tokens)"
                " div (2 * CAST(total_tokens AS DECIMAL(38,0))) AS BIGINT)"
            )
            / 1000000.0
        ).alias("straggler_factor"),
    )
