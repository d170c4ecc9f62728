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


# --- r14 additions: I/O-pruning and join-pricing economics -----------------

# Zone-map audit: shard count and predicate-grid resolution. 64 shards
# models one file per shard; 7 thresholds sweep the ship-day range.
_MM_SHARDS = 64
_MM_GRID = 8
_DAY_MS = 86400000


@query(
    "j_minmax_prune",
    oracle=f"""
    WITH d AS (SELECT l_orderkey, epoch_ms(l_shipdate) // {_DAY_MS} AS day
               FROM lineitem),
    mm AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM d),
    sh AS (SELECT layout, shard, CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(MAX(day) AS BIGINT) AS mx
           FROM (SELECT day,
                        'hash' AS layout, l_orderkey % {_MM_SHARDS} AS shard
                 FROM d
                 UNION ALL
                 SELECT day, 'sorted' AS layout,
                        ((day - mm.lo) * {_MM_SHARDS}) // (mm.hi - mm.lo + 1)
                          AS shard
                 FROM d, mm)
           GROUP BY 1, 2),
    th AS (SELECT i, mm.lo + ((mm.hi - mm.lo + 1) * i) // {_MM_GRID} AS t
           FROM range(1, {_MM_GRID}) r(i), mm),
    sk AS (SELECT layout, th.i AS q_idx, th.t AS threshold_day,
                  CAST(SUM(CASE WHEN mx < th.t THEN 1 ELSE 0 END) AS BIGINT)
                    AS shards_skipped,
                  CAST(SUM(CASE WHEN mx < th.t THEN n ELSE 0 END) AS BIGINT)
                    AS rows_skipped,
                  CAST(SUM(n) AS BIGINT) AS total_rows
           FROM sh CROSS JOIN th GROUP BY 1, 2, 3)
    SELECT layout, CAST(q_idx AS BIGINT) AS q_idx, threshold_day,
           shards_skipped, rows_skipped,
           FLOOR((1.0 - rows_skipped * 1.0 / total_rows) * 1000000 + 0.5)
             / 1000000 AS scan_frac
    FROM sk
    """,
)
def j_minmax_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map (per-file min/max) skip-fraction audit — the number
    that decides whether a 100 TB scan with a date predicate reads
    100 TB or 2: lay lineitem out {s} ways into {n} shards ( 'hash' =
    orderkey mod {n}, the layout a hash-partitioned writer produces;
    'sorted' = equal-width ship-day ranges, the layout OPTIMIZE/sort-
    on-write produces), record each shard's max ship-day (the zone
    map), and sweep `day >= T` predicates over a {g}-point grid: a
    shard is skippable iff its max < T. The output is the scan-
    fraction curve per layout — sorted decays linearly to ~1/{n},
    hash stays pinned at 1.0, and the GAP is the measured value of
    sort-on-write (the j_zorder_stats sibling for the 1-D case, and
    the read-side twin of j_shard_manifest's writer audit).

    EXACT throughout: ship-day is epoch-ms integer-div, both shard
    keys are non-negative integer division (DuckDB `//` floors on
    BIGINT — the SCALE.md 4t rule), thresholds are integer lattice
    points, and skip counts are BIGINT sums; the only division is the
    final 1e-6-rounded scan fraction.

    Plan: ONE data-sized pass builds both layouts' zone maps (the
    union doubles rows but collapses map-side to {n}x2 shard rows);
    the min/max scalar broadcasts onto it (at 100 TB this comes free
    from table statistics); the threshold sweep runs on the
    {n}x2-row zone-map relation — metadata, never data. Real engines
    read this exact relation from the parquet footers; the qid prices
    the decision with the engine's own operators."""
    t = load(spark, sf_dir)
    d = t.lineitem.select(
        "l_orderkey",
        # l_shipdate is TIMESTAMP_NTZ; the session is tune()-pinned UTC,
        # so the cast is the identity wall-clock -> epoch map DuckDB's
        # epoch_ms applies
        F.expr(f"unix_millis(cast(l_shipdate as timestamp)) div {_DAY_MS}").alias(
            "day"
        ),
    )
    mm = d.agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    both = d.crossJoin(F.broadcast(mm)).select(
        "day",
        F.expr(
            f"stack(2, 'hash', l_orderkey % {_MM_SHARDS},"
            f" 'sorted', ((day - lo) * {_MM_SHARDS}) div (hi - lo + 1))"
        ).alias("layout", "shard"),
    )
    sh = both.groupBy("layout", "shard").agg(
        F.count("*").cast("long").alias("n"),
        F.max("day").cast("long").alias("mx"),
    )
    th = (
        spark.range(1, _MM_GRID)
        .select(F.col("id").alias("i"))
        .crossJoin(F.broadcast(mm))
        .select(
            "i",
            F.expr(f"lo + ((hi - lo + 1) * i) div {_MM_GRID}").alias("t"),
        )
    )
    sk = (
        sh.crossJoin(F.broadcast(th))
        .groupBy("layout", F.col("i").alias("q_idx"), F.col("t").alias("threshold_day"))
        .agg(
            F.sum(F.when(F.col("mx") < F.col("t"), 1).otherwise(0))
            .cast("long")
            .alias("shards_skipped"),
            F.sum(F.when(F.col("mx") < F.col("t"), F.col("n")).otherwise(0))
            .cast("long")
            .alias("rows_skipped"),
            F.sum("n").cast("long").alias("total_rows"),
        )
    )
    return sk.select(
        "layout",
        F.col("q_idx").cast("long").alias("q_idx"),
        "threshold_day",
        "shards_skipped",
        "rows_skipped",
        rnd(1.0 - F.col("rows_skipped") * 1.0 / F.col("total_rows"), 6).alias(
            "scan_frac"
        ),
    )


j_minmax_prune.__doc__ = (
    j_minmax_prune.__doc__
    .replace("{s}", "2")
    .replace("{n}", str(_MM_SHARDS))
    .replace("{g}", str(_MM_GRID - 1))
)


@query(
    "j_join_card_est",
    oracle=f"""
    WITH d AS (SELECT l_partkey, epoch_ms(l_shipdate) // {_DAY_MS} AS day
               FROM lineitem),
    mm AS (SELECT MIN(day) + (MAX(day) - MIN(day) + 1) // 2 AS split FROM d),
    h1 AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n1
           FROM d, mm WHERE day < mm.split GROUP BY 1),
    h2 AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n2
           FROM d, mm WHERE day >= mm.split GROUP BY 1),
    j AS (SELECT h1.l_partkey, n1 * n2 AS p FROM h1 JOIN h2 USING (l_partkey)),
    r AS (SELECT p, ROW_NUMBER() OVER (ORDER BY p DESC, l_partkey) AS rk
          FROM j),
    s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
                 CAST(SUM(p) AS BIGINT) AS est, CAST(MAX(p) AS BIGINT) AS mx
          FROM j),
    k AS (SELECT GREATEST(1, (s.n_keys + 99) // 100) AS kk FROM s),
    tp AS (SELECT CAST(SUM(r.p) AS BIGINT) AS top_p FROM r, k
           WHERE r.rk <= k.kk)
    SELECT s.n_keys, s.est AS est_join_rows, s.mx AS max_key_product,
           CAST(k.kk AS BIGINT) AS top1pct_keys,
           FLOOR(tp.top_p * 1.0 / s.est * 1000000 + 0.5) / 1000000
             AS top1pct_share
    FROM s, k, tp
    """,
)
def j_join_card_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality pricing WITHOUT running the join: the
    early-half x late-half lineitem self-join on l_partkey ("which
    parts recur across the two halves of the shipping window" — the
    recurrence shape of every dedup-candidate and feature-backfill
    join) is priced from the two per-key COUNT HISTOGRAMS alone:
    |R1 join R2| = sum over keys of n1(k)*n2(k), exactly. The output
    is the estimated row count, the worst single key, and the share
    of output owed to the top 1% of keys — the skew number that says
    whether the shuffle needs salting (j_lsh_bucket_skew's sibling
    for equi-joins; at 100 TB this histogram product is what a
    cost-based optimizer reads, and computing it costs two metadata-
    sized aggs instead of the join's full shuffle).

    EXACT: day split and per-key counts are BIGINT; every product and
    sum stays integer; the only division is the final 1e-6-rounded
    top-share.

    Plan: one scan feeds both half-histograms (two hash aggs that
    AQE runs off one shuffle read of (partkey, day)); the histogram
    join is |parts|-sized metadata co-partitioned on its own group
    key, so no second data shuffle exists; the top-1% rank window
    runs UNPARTITIONED on that bounded relation by design (the
    j_histogram_equi argument — parts, not lineitems)."""
    t = load(spark, sf_dir)
    d = t.lineitem.select(
        "l_partkey",
        F.expr(f"unix_millis(cast(l_shipdate as timestamp)) div {_DAY_MS}").alias(
            "day"
        ),
    )
    mm = d.agg(
        (F.min("day") + F.expr("(max(day) - min(day) + 1) div 2")).alias("split")
    )
    dd = d.crossJoin(F.broadcast(mm))
    h1 = (
        dd.where(F.col("day") < F.col("split"))
        .groupBy("l_partkey")
        .agg(F.count("*").cast("long").alias("n1"))
    )
    h2 = (
        dd.where(F.col("day") >= F.col("split"))
        .groupBy("l_partkey")
        .agg(F.count("*").cast("long").alias("n2"))
    )
    # |parts|-row metadata with four consumers (rank window, the
    # summary agg, the top-share agg) — persist (SCALE.md 4r rule)
    j = (
        h1.join(h2, "l_partkey")
        .select("l_partkey", (F.col("n1") * F.col("n2")).alias("p"))
        .persist()
    )
    rk = F.row_number().over(Window.orderBy(F.col("p").desc(), F.col("l_partkey")))
    r = j.select("p", rk.alias("rk"))
    s = j.agg(
        F.count("*").cast("long").alias("n_keys"),
        F.sum("p").cast("long").alias("est"),
        F.max("p").cast("long").alias("mx"),
    )
    k = s.select(F.greatest(F.lit(1), F.expr("(n_keys + 99) div 100")).alias("kk"))
    tp = (
        r.crossJoin(F.broadcast(k))
        .where(F.col("rk") <= F.col("kk"))
        .agg(F.sum("p").cast("long").alias("top_p"))
    )
    return (
        s.crossJoin(F.broadcast(k))
        .crossJoin(F.broadcast(tp))
        .select(
            "n_keys",
            F.col("est").alias("est_join_rows"),
            F.col("mx").alias("max_key_product"),
            F.col("kk").cast("long").alias("top1pct_keys"),
            rnd(F.col("top_p") * 1.0 / F.col("est"), 6).alias("top1pct_share"),
        )
    )


# AMS tug-of-war: 64 independent +/-1 estimators in 8 groups of 8
# (median-of-means). Signs come from the parity of the LOW md5 word of
# (partkey ':' estimator_id) — engine-portable, provably +/-1.
_AMS_EST = 64
_AMS_GRP = 8


@query(
    "j_ams_f2",
    oracle=f"""
    WITH h AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS f
               FROM lineitem GROUP BY 1),
    ex AS (SELECT CAST(SUM(f * f) AS BIGINT) AS f2, CAST(COUNT(*) AS BIGINT)
             AS n_keys FROM h),
    c AS (SELECT r.i,
                 CAST(SUM(CASE WHEN CAST(concat('0x', substr(
                          md5(CAST(l_partkey AS VARCHAR) || ':' ||
                              CAST(r.i AS VARCHAR)), 9, 8)) AS BIGINT) % 2 = 1
                          THEN f ELSE -f END) AS BIGINT) AS ci
          FROM h CROSS JOIN range(0, {_AMS_EST}) r(i) GROUP BY 1),
    g AS (SELECT i // {_AMS_GRP} AS grp, CAST(SUM(ci * ci) AS BIGINT) AS s8
          FROM c GROUP BY 1),
    m AS (SELECT CAST(SUM(s8) AS BIGINT) AS tot,
                 CAST(SUM(CASE WHEN rk IN (4, 5) THEN s8 ELSE 0 END)
                      AS BIGINT) AS med2
          FROM (SELECT s8, ROW_NUMBER() OVER (ORDER BY s8, grp) AS rk FROM g))
    SELECT ex.n_keys, ex.f2 AS f2_exact,
           FLOOR(m.tot / ({_AMS_EST}.0) * 1000000 + 0.5) / 1000000
             AS est_mean,
           FLOOR(m.med2 / ({2 * _AMS_GRP}.0) * 1000000 + 0.5) / 1000000
             AS est_medmeans,
           FLOOR((m.tot / ({_AMS_EST}.0) - ex.f2) / ex.f2 * 1000000 + 0.5)
             / 1000000 AS rel_err_mean,
           FLOOR((m.med2 / ({2 * _AMS_GRP}.0) - ex.f2) / ex.f2 * 1000000
                 + 0.5) / 1000000 AS rel_err_medmeans
    FROM ex, m
    """,
)
def j_ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS "tug-of-war" sketch (Alon-Matias-Szegedy 1996, public) of
    the second frequency moment F2 = sum f_k^2 of l_partkey — which IS
    the self-join size |lineitem join lineitem on partkey|, so this is
    the SKETCHED twin of j_join_card_est's exact histogram pricing:
    {e} independent +/-1-signed counters C_i = sum f_k*s_i(k), each
    estimating F2 as C_i^2, read out as the plain mean and as the
    median-of-{g}-means (the variance-then-tail reduction the paper
    composes). Output includes exact F2 and both relative errors, so
    the sizing family (j_cms_width_curve / j_hll_precision_curve /
    j_bloom_fpr_curve) extends to join-size estimation: the error
    column says how many counters a 100 TB join-size estimate needs.

    EXACT: counters are BIGINT sums of +/-f with md5-parity signs
    (engine-portable word, % 2 on a non-negative value); C^2 sums and
    the rank-4/5 median pick stay integer; the four output divisions
    round 1e-6.

    Plan: ONE data-sized hash agg builds the key histogram; the {e}x
    estimator fan-out runs on the |parts|-row HISTOGRAM, not the
    corpus (the sketch matrix is |parts| x {e} products collapsing
    map-side to {e} rows); the median picks from {g} rows. At 100 TB
    the sketch would fold directly over the scan with the same
    per-partition partials — fanning out the histogram here makes the
    estimator-vs-truth audit one relation."""
    t = load(spark, sf_dir)
    h = t.lineitem.groupBy("l_partkey").agg(F.count("*").cast("long").alias("f"))
    h = h.persist()  # consumers: exact F2 + the 64-estimator fan-out
    ex = h.agg(
        F.sum(F.col("f") * F.col("f")).cast("long").alias("f2"),
        F.count("*").cast("long").alias("n_keys"),
    )
    sign_bit = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("l_partkey").cast("string"),
                        F.lit(":"),
                        F.col("i").cast("string"),
                    )
                ),
                9,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 2
    )
    c = (
        h.select("l_partkey", "f", F.explode(F.sequence(F.lit(0), F.lit(_AMS_EST - 1))).alias("i"))
        .select(
            "i",
            F.when(sign_bit == 1, F.col("f")).otherwise(-F.col("f")).alias("sf"),
        )
        .groupBy("i")
        .agg(F.sum("sf").cast("long").alias("ci"))
    )
    g = c.groupBy(F.expr(f"i div {_AMS_GRP}").alias("grp")).agg(
        F.sum(F.col("ci") * F.col("ci")).cast("long").alias("s8")
    )
    rk = F.row_number().over(Window.orderBy("s8", "grp"))
    m = g.select("s8", rk.alias("rk")).agg(
        F.sum("s8").cast("long").alias("tot"),
        F.sum(F.when(F.col("rk").isin(4, 5), F.col("s8")).otherwise(0))
        .cast("long")
        .alias("med2"),
    )
    mean_est = F.col("tot") / float(_AMS_EST)
    med_est = F.col("med2") / float(2 * _AMS_GRP)
    return ex.crossJoin(F.broadcast(m)).select(
        "n_keys",
        F.col("f2").alias("f2_exact"),
        rnd(mean_est, 6).alias("est_mean"),
        rnd(med_est, 6).alias("est_medmeans"),
        rnd((mean_est - F.col("f2")) / F.col("f2"), 6).alias("rel_err_mean"),
        rnd((med_est - F.col("f2")) / F.col("f2"), 6).alias("rel_err_medmeans"),
    )


j_ams_f2.__doc__ = j_ams_f2.__doc__.replace("{e}", str(_AMS_EST)).replace(
    "{g}", str(_AMS_GRP)
)


# Encoding audit: 64 shards model one file per shard; runs are counted
# within a shard in (orderkey, linenumber) write order.
_ENC_SHARDS = 64


@query(
    "j_encoding_audit",
    oracle=f"""
    WITH d AS (SELECT l_orderkey % {_ENC_SHARDS} AS shard,
                      l_orderkey, l_linenumber,
                      l_returnflag AS c_returnflag,
                      l_linestatus AS c_linestatus,
                      l_quantity AS c_quantity,
                      epoch_ms(l_shipdate) // {_DAY_MS} AS c_shipday
               FROM lineitem),
    r AS (SELECT shard,
                 CASE WHEN LAG(c_returnflag) OVER w IS NULL
                        OR LAG(c_returnflag) OVER w <> c_returnflag
                      THEN 1 ELSE 0 END AS r1,
                 CASE WHEN LAG(c_linestatus) OVER w IS NULL
                        OR LAG(c_linestatus) OVER w <> c_linestatus
                      THEN 1 ELSE 0 END AS r2,
                 CASE WHEN LAG(c_quantity) OVER w IS NULL
                        OR LAG(c_quantity) OVER w <> c_quantity
                      THEN 1 ELSE 0 END AS r3,
                 CASE WHEN LAG(c_shipday) OVER w IS NULL
                        OR LAG(c_shipday) OVER w <> c_shipday
                      THEN 1 ELSE 0 END AS r4
          FROM d
          WINDOW w AS (PARTITION BY shard ORDER BY l_orderkey, l_linenumber,
                       c_returnflag, c_linestatus, c_quantity, c_shipday)),
    s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                 CAST(SUM(r1) AS BIGINT) AS runs1,
                 CAST(SUM(r2) AS BIGINT) AS runs2,
                 CAST(SUM(r3) AS BIGINT) AS runs3,
                 CAST(SUM(r4) AS BIGINT) AS runs4
          FROM r),
    dc AS (SELECT CAST(COUNT(DISTINCT c_returnflag) AS BIGINT) AS d1,
                  CAST(COUNT(DISTINCT c_linestatus) AS BIGINT) AS d2,
                  CAST(COUNT(DISTINCT c_quantity) AS BIGINT) AS d3,
                  CAST(COUNT(DISTINCT c_shipday) AS BIGINT) AS d4
           FROM d),
    u AS (SELECT * FROM (VALUES
            ('l_returnflag', 1), ('l_linestatus', 2),
            ('l_quantity', 3), ('l_shipday', 4)) v(col_name, idx)),
    f AS (SELECT u.col_name, s.n_rows,
                 CASE u.idx WHEN 1 THEN dc.d1 WHEN 2 THEN dc.d2
                            WHEN 3 THEN dc.d3 ELSE dc.d4 END AS n_distinct,
                 CASE u.idx WHEN 1 THEN s.runs1 WHEN 2 THEN s.runs2
                            WHEN 3 THEN s.runs3 ELSE s.runs4 END AS n_runs
          FROM u, s, dc)
    SELECT col_name, n_rows, n_distinct, n_runs,
           FLOOR(n_rows * 1.0 / n_runs * 1000000 + 0.5) / 1000000
             AS avg_run_len,
           CAST(CASE WHEN n_distinct <= 1 THEN 0
                     ELSE LENGTH(bin(n_distinct - 1)) END AS BIGINT)
             AS dict_bits,
           FLOOR((CASE WHEN n_distinct <= 1 THEN 0
                       ELSE LENGTH(bin(n_distinct - 1)) END)
                 * CAST(n_runs AS DOUBLE) / n_rows * 1000000 + 0.5) / 1000000
             AS est_bits_per_value
    FROM f
    """,
)
def j_encoding_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-encoding audit — "how well will this column compress
    under parquet RLE+dictionary" read BEFORE the write: for four
    lineitem columns, the distinct count (dictionary size), the run
    count in write order within each of {n} shard-files, the average
    run length, and the modelled bits/value = ceil(log2(distinct)) /
    avg_run_len (one dictionary code per run under RLE). The writer-
    side sibling of j_minmax_prune: that qid prices READ skipping
    under a layout, this one prices STORAGE under the same layout —
    together they are the two halves of the sort-on-write business
    case (sorting by a column collapses its run count, and this
    relation shows by how much).

    EXACT: run flags are integer window compares within shards;
    distinct/run/row counts are BIGINT; dict bits avoid log2's libm
    boundary entirely via LENGTH(bin(d-1)) — exact on both engines —
    and only the two final ratios round 1e-6.

    Plan: ONE window pass keyed on shard (the write order a file
    writer already holds — at 100 TB this audit folds into the write
    task per file, no shuffle beyond the writer's own partitioning)
    computes all four columns' run flags together; the distinct
    counts are one multi-distinct agg Spark expands with map-side
    partials. Output is 4 rows whatever the corpus size."""
    t = load(spark, sf_dir)
    d = t.lineitem.select(
        (F.col("l_orderkey") % _ENC_SHARDS).alias("shard"),
        "l_orderkey",
        "l_linenumber",
        F.col("l_returnflag").alias("c1"),
        F.col("l_linestatus").alias("c2"),
        F.col("l_quantity").alias("c3"),
        F.expr(f"unix_millis(cast(l_shipdate as timestamp)) div {_DAY_MS}").alias(
            "c4"
        ),
    )
    # (orderkey, linenumber) is NOT unique in the synthetic lineitem —
    # the audited values themselves break the tie, which leaves run
    # counts deterministic (fully identical rows are interchangeable)
    w = Window.partitionBy("shard").orderBy(
        "l_orderkey", "l_linenumber", "c1", "c2", "c3", "c4"
    )
    flags = d.select(
        *[
            F.when(
                F.lag(f"c{i}").over(w).isNull()
                | (F.lag(f"c{i}").over(w) != F.col(f"c{i}")),
                1,
            )
            .otherwise(0)
            .alias(f"r{i}")
            for i in range(1, 5)
        ]
    )
    s = flags.agg(
        F.count("*").cast("long").alias("n_rows"),
        *[F.sum(f"r{i}").cast("long").alias(f"runs{i}") for i in range(1, 5)],
    )
    dc = d.agg(
        *[F.countDistinct(f"c{i}").cast("long").alias(f"d{i}") for i in range(1, 5)]
    )
    names = ["l_returnflag", "l_linestatus", "l_quantity", "l_shipday"]
    stacked = s.crossJoin(F.broadcast(dc)).select(
        F.expr(
            "stack(4, "
            + ", ".join(
                f"'{names[i - 1]}', n_rows, d{i}, runs{i}" for i in range(1, 5)
            )
            + ")"
        ).alias("col_name", "n_rows", "n_distinct", "n_runs")
    )
    bits = F.when(F.col("n_distinct") <= 1, 0).otherwise(
        F.length(F.bin(F.col("n_distinct") - 1))
    )
    return stacked.select(
        "col_name",
        "n_rows",
        "n_distinct",
        "n_runs",
        rnd(F.col("n_rows") * 1.0 / F.col("n_runs"), 6).alias("avg_run_len"),
        bits.cast("long").alias("dict_bits"),
        rnd(bits * F.col("n_runs").cast("double") / F.col("n_rows"), 6).alias(
            "est_bits_per_value"
        ),
    )
