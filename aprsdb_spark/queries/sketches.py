"""§2.J additions (r6 continuation) — PORTABLE probabilistic sketches,
built from md5-derived hashes so the sketch CONTENTS (not just a
tolerance band) hash-match the DuckDB oracle bit-for-bit:

- count-min sketch (Cormode & Muthukrishnan 2005, public): depth-4 x
  width-256 counter array over the corpus token stream, plus the
  point-query estimates for every distinct token next to their true
  counts — the CMS overestimate guarantee (est >= true, error bounded
  by collisions) becomes a driver-checked fact,
- HyperLogLog (Flajolet et al. 2007, public): 256 registers over the
  event user stream with the small-range linear-counting branch —
  unlike d_agg_approx (whose engine-internal HLL++ sketch can only be
  tolerance-checked), every register and the final estimate are
  value-identical across engines.

Float discipline: register weights are dyadic rationals 2^-rho built
with integer shifts (1.0 / (1 << rho)) — exact in IEEE doubles at any
summation order, so the harmonic sum needs no rounding; only the
ln-based linear-counting output rounds (libm)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import rnd, sql_rnd
from ..operators.dedup import tokens_col
from ..registry import query
from ..tables import load, spread

# Count-min geometry.
_CMS_D = 4
_CMS_W = 256

# HLL geometry: p = 8 -> m = 256 registers; 32-bit hash leaves 24 bits
# for the rank. alpha_256 from the HLL paper's formula, emitted as the
# SAME decimal literal into both engines.
_HLL_P = 8
_HLL_M = 1 << _HLL_P
_HLL_ALPHA = 0.7213 / (1 + 1.079 / _HLL_M)


def _cms_bucket_sql(d: int) -> str:
    return (
        f"CAST(concat('0x', substr(md5({d} || ':' || tok), 1, 4)) AS BIGINT)"
        f" % {_CMS_W}"
    )


def _cms_bucket_col(d: int):
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{d}:"), F.col("tok"))), 1, 4), 16, 10
        ).cast("long")
        % _CMS_W
    )




def cms_cells(tok: DataFrame) -> DataFrame:
    """(d, bucket, c) — the depth-{d} x width-{w} counter matrix over a
    token frame. Counters are plain sums, so partials from any split of
    the stream MERGE BY ADDITION — the property the streaming
    cms_monitor_sink's state store is built on (one definition here
    serves the batch qid AND the monitor, the drift_from_counts
    sharing rule)."""
    cells = tok.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"), _cms_bucket_col(d).alias("bucket")
                    )
                    for d in range(1, _CMS_D + 1)
                ]
            )
        ).alias("cell")
    ).select("cell.d", "cell.bucket")
    return cells.groupBy("d", "bucket").agg(
        F.count("*").cast("long").alias("c")
    )


def cms_truth(tok: DataFrame) -> DataFrame:
    """(tok, true_count) — exact token counts; additive across stream
    splits for the same reason as cms_cells."""
    return tok.groupBy("tok").agg(F.count("*").cast("long").alias("true_count"))


def cms_relation(cms: DataFrame, truth: DataFrame) -> DataFrame:
    """The j_cms_sketch output relation from a counter matrix and a
    truth relation — shared verbatim by the batch qid and
    streaming/ingest.cms_current_view, so streamed ≡ batch is an
    identity over equal (matrix, truth) states."""
    probes = truth.select(
        "tok",
        "true_count",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"), _cms_bucket_col(d).alias("bucket")
                    )
                    for d in range(1, _CMS_D + 1)
                ]
            )
        ).alias("cell"),
    ).select("tok", "true_count", "cell.d", "cell.bucket")
    est = (
        probes.join(F.broadcast(cms), ["d", "bucket"])
        .groupBy("tok", "true_count")
        .agg(F.min("c").alias("cms_est"))
    )
    return est.select(
        "tok",
        "true_count",
        "cms_est",
        (F.col("cms_est") - F.col("true_count")).alias("overcount"),
        (F.col("cms_est") >= F.col("true_count")).alias("never_undercounts"),
    )


@query(
    "j_cms_sketch",
    oracle=f"""
    WITH tok AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
    cells AS (SELECT d.d, CASE d.d
                {' '.join(f'WHEN {d} THEN {_cms_bucket_sql(d)}' for d in range(1, _CMS_D + 1))}
              END AS bucket
              FROM tok CROSS JOIN (VALUES {', '.join(f'({d})' for d in range(1, _CMS_D + 1))}) d(d)),
    cms AS (SELECT d, bucket, CAST(COUNT(*) AS BIGINT) AS c
            FROM cells GROUP BY d, bucket),
    truth AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS true_count
              FROM tok GROUP BY tok),
    probes AS (SELECT truth.tok, truth.true_count, d.d, CASE d.d
                 {' '.join(f'WHEN {d} THEN {_cms_bucket_sql(d).replace("tok", "truth.tok")}' for d in range(1, _CMS_D + 1))}
               END AS bucket
               FROM truth CROSS JOIN (VALUES {', '.join(f'({d})' for d in range(1, _CMS_D + 1))}) d(d)),
    est AS (SELECT probes.tok, probes.true_count,
                   MIN(cms.c) AS cms_est
            FROM probes JOIN cms ON cms.d = probes.d AND cms.bucket = probes.bucket
            GROUP BY probes.tok, probes.true_count)
    SELECT tok, true_count, cms_est,
           cms_est - true_count AS overcount,
           cms_est >= true_count AS never_undercounts
    FROM est
    """,
)
def j_cms_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over the corpus token stream, depth {d} x width
    {w}, with md5-derived row hashes — the streaming-frequency sketch
    whose merge is plain counter addition (mergeable across partitions,
    shards, and days), plus the point-query estimate for every distinct
    token against its true count. `never_undercounts` is the CMS
    one-sided guarantee, asserted per token by the oracle.

    Hashes are engine-portable (md5 prefix mod width), so the ENTIRE
    sketch is value-identical across engines — the d_agg_approx HLL++
    can only be tolerance-checked because its sketch is
    engine-internal; this one is the auditable twin. Plan: one token
    explode fans out x{d} depths (a generated VALUES cross join — {d}
    rows, broadcast), one (d, bucket) count agg (the sketch: {d}x{w}
    cells regardless of corpus size — THE point of CMS at 100 TB), and
    the probe joins the {d}-row-per-token frame against the broadcast
    sketch. Counters and estimates are integers: no float discipline
    needed anywhere."""
    t = load(spark, sf_dir)
    # spread: the token explode is persisted with NO exchange, so a
    # plain single-row-group scan pins the cached relation (and every
    # consumer pass) to ONE partition (no-op at scale, tables.spread)
    tok = spread(spark, sf_dir, "documents").select(F.explode(tokens_col("text")).alias("tok"))
    tok.persist()  # consumers: sketch build + truth
    cms = cms_cells(tok)
    truth = cms_truth(tok)
    return cms_relation(cms, truth)


j_cms_sketch.__doc__ = j_cms_sketch.__doc__.replace("{d}", str(_CMS_D)).replace(
    "{w}", str(_CMS_W)
)


@query(
    "j_hll_portable",
    oracle=f"""
    WITH x AS (
      SELECT DISTINCT
             CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                  AS BIGINT) AS h
      FROM events),
    rr AS (SELECT h // 16777216 AS reg, h % 16777216 AS rest FROM x),
    rho AS (SELECT reg,
                   CASE WHEN rest = 0 THEN 25
                        ELSE 25 - length(bin(rest)) END AS rho
            FROM rr),
    regs AS (SELECT reg, MAX(rho) AS r FROM rho GROUP BY reg),
    s AS (SELECT CAST(COUNT(*) AS BIGINT) AS hit,
                 SUM(1.0 / (1 << r)) AS harm
          FROM regs),
    raw AS (SELECT hit, (CAST({_HLL_ALPHA!r} AS DOUBLE) * {_HLL_M} * {_HLL_M})
                        / (harm + ({_HLL_M} - hit)) AS raw_est
            FROM s),
    fin AS (SELECT hit,
                   CASE WHEN raw_est <= 2.5 * {_HLL_M} AND hit < {_HLL_M}
                        THEN FLOOR({_HLL_M} * ln({_HLL_M} * 1.0 / ({_HLL_M} - hit))
                                   * 10000 + 0.5) / 10000
                        ELSE FLOOR(raw_est * 10000 + 0.5) / 10000 END AS est
            FROM raw),
    truth AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_true
              FROM events)
    SELECT n_true, hit AS n_registers_hit, est,
           FLOOR(abs(est - n_true) / n_true * 10000 + 0.5) / 10000 AS rel_err,
           abs(est - n_true) / n_true < 0.2 AS within_bounds
    FROM fin CROSS JOIN truth
    """,
)
def j_hll_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PORTABLE HyperLogLog over the event user stream: p={p} (m={m}
    registers), md5-derived 32-bit hash split into a register index
    (top {p} bits) and a 24-bit rank field; rho = leading zeros + 1 via
    string bin() length — identical on both engines. Applies the
    original paper's small-range linear-counting branch. Where
    d_agg_approx can only band-check Spark's engine-internal HLL++,
    every REGISTER of this sketch and the estimate itself hash-match
    the oracle.

    Float discipline: the harmonic sum adds dyadic rationals 2^-rho
    built with integer shifts (1.0/(1 << rho)) — exact in IEEE doubles
    at any accumulation order with m=256 terms, so no pre-rounding is
    needed until the ln-based output (libm -> rnd 1e-4). Plan: one
    DISTINCT on the hash (at 100 TB: per-partition register partials +
    a {m}-row merge — max() is the HLL merge, which is why the sketch
    distributes), a {m}-row register agg, and 1-row finals."""
    t = load(spark, sf_dir)
    regs = hll_registers(t.events)
    truth = t.events.agg(F.countDistinct("user_id").cast("long").alias("n_true"))
    return hll_relation(regs, truth)


def hll_registers(events: DataFrame) -> DataFrame:
    """(reg, r) — the m=256-register HLL state over an event frame's
    user_id stream. Registers MERGE BY MAX (max of maxes; duplicate
    hashes cannot raise a max), so per-batch partials from any split
    of the stream fold into the same state — the property the
    streaming hll_monitor_sink's store is built on."""
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    x = events.select(h.alias("h")).distinct()
    rr = x.select(
        F.expr("h div 16777216").alias("reg"),
        (F.col("h") % 16777216).alias("rest"),
    )
    rho = rr.select(
        "reg",
        F.when(F.col("rest") == 0, 25)
        .otherwise(25 - F.length(F.bin("rest")))
        .alias("rho"),
    )
    return rho.groupBy("reg").agg(F.max("rho").alias("r"))


def hll_relation(regs: DataFrame, truth: DataFrame) -> DataFrame:
    """The j_hll_portable output relation from a register state and a
    1-row exact-distinct truth — shared verbatim by the batch qid and
    streaming/ingest.hll_current_view."""
    s = regs.agg(
        F.count("*").cast("long").alias("hit"),
        # CAST to DOUBLE first: a bare 1.0 literal parses as DECIMAL and
        # the division evaluates in DECIMAL(13,12) (2^-25 would round to
        # 2.9802E-8), silently breaking the exact-dyadic invariant the
        # oracle's DOUBLE 1.0/(1<<r) relies on (ADVICE r6)
        F.sum(F.expr("CAST(1.0 AS DOUBLE) / shiftleft(1, r)")).alias("harm"),
    )
    raw = s.select(
        "hit",
        (
            F.lit(_HLL_ALPHA * _HLL_M * _HLL_M)
            / (F.col("harm") + (_HLL_M - F.col("hit")))
        ).alias("raw_est"),
    )
    fin = raw.select(
        "hit",
        F.when(
            (F.col("raw_est") <= 2.5 * _HLL_M) & (F.col("hit") < _HLL_M),
            rnd(F.lit(_HLL_M) * F.log(_HLL_M * 1.0 / (_HLL_M - F.col("hit"))), 4),
        )
        .otherwise(rnd(F.col("raw_est"), 4))
        .alias("est"),
    )
    return fin.crossJoin(F.broadcast(truth)).select(
        "n_true",
        F.col("hit").alias("n_registers_hit"),
        "est",
        rnd(F.abs(F.col("est") - F.col("n_true")) / F.col("n_true"), 4).alias(
            "rel_err"
        ),
        (F.abs(F.col("est") - F.col("n_true")) / F.col("n_true") < 0.2).alias(
            "within_bounds"
        ),
    )


j_hll_portable.__doc__ = j_hll_portable.__doc__.replace("{p}", str(_HLL_P)).replace(
    "{m}", str(_HLL_M)
)


_HLL_FINAL_SQL = f"""
      CASE WHEN raw_est <= 2.5 * {_HLL_M} AND hit < {_HLL_M}
           THEN FLOOR({_HLL_M} * ln({_HLL_M} * 1.0 / ({_HLL_M} - hit))
                      * 10000 + 0.5) / 10000
           ELSE FLOOR(raw_est * 10000 + 0.5) / 10000 END"""


@query(
    "j_hll_merge",
    oracle=f"""
    WITH x AS (
      SELECT DISTINCT event_type,
             CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                  AS BIGINT) AS h
      FROM events),
    rho AS (SELECT event_type, h // 16777216 AS reg,
                   CASE WHEN h % 16777216 = 0 THEN 25
                        ELSE 25 - length(bin(h % 16777216)) END AS rho
            FROM x),
    regs_t AS (SELECT event_type, reg, MAX(rho) AS r
               FROM rho GROUP BY event_type, reg),
    merged AS (SELECT '(merged)' AS scope, reg, MAX(r) AS r
               FROM regs_t GROUP BY reg),
    allr AS (SELECT event_type AS scope, reg, r FROM regs_t
             UNION ALL SELECT scope, reg, r FROM merged),
    s AS (SELECT scope, CAST(COUNT(*) AS BIGINT) AS hit,
                 SUM(1.0 / (1 << r)) AS harm
          FROM allr GROUP BY scope),
    raw AS (SELECT scope, hit,
                   (CAST({_HLL_ALPHA!r} AS DOUBLE) * {_HLL_M} * {_HLL_M})
                   / (harm + ({_HLL_M} - hit)) AS raw_est
            FROM s),
    fin AS (SELECT scope, hit, {_HLL_FINAL_SQL} AS est FROM raw),
    truth AS (SELECT event_type AS scope,
                     CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_true
              FROM events GROUP BY event_type
              UNION ALL
              SELECT '(merged)', CAST(COUNT(DISTINCT user_id) AS BIGINT)
              FROM events)
    SELECT f.scope, t.n_true, f.hit AS n_registers_hit, f.est,
           FLOOR(abs(f.est - t.n_true) / t.n_true * 10000 + 0.5) / 10000
             AS rel_err
    FROM fin f JOIN truth t USING (scope)
    """,
)
def j_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL MERGEABILITY, register by register: one portable sketch per
    event_type plus the '(merged)' row built purely by max() over the
    per-type register tables — never re-touching the raw stream. The
    merged registers are IDENTICAL to a direct global sketch (max of
    per-group maxes over a partitioned distinct == global max), which
    is the whole reason HLL state distributes: per-partition partials
    at 100 TB combine with the same {m}-row max the '(merged)' row
    exercises here, and sketches persisted per day/source roll up to
    any ad-hoc scope without a corpus pass. The oracle value-checks
    every per-type estimate AND the merged one against exact distinct
    counts.

    Same float discipline as j_hll_portable: dyadic 2^-rho harmonic
    terms are order-exact; ln only at the display boundary (rnd 1e-4).
    Plan: ONE (event_type, hash) distinct; register tables and
    everything after are (|types|+1)·{m}-row metadata."""
    t = load(spark, sf_dir)
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    x = t.events.select("event_type", h.alias("h")).distinct()
    rho = x.select(
        "event_type",
        F.expr("h div 16777216").alias("reg"),
        F.when(F.col("h") % 16777216 == 0, 25)
        .otherwise(25 - F.length(F.bin(F.col("h") % 16777216)))
        .alias("rho"),
    )
    regs_t = rho.groupBy("event_type", "reg").agg(F.max("rho").alias("r"))
    regs_t.persist()  # consumers: per-type rows + the merged max
    merged = (
        regs_t.groupBy("reg")
        .agg(F.max("r").alias("r"))
        .select(F.lit("(merged)").alias("scope"), "reg", "r")
    )
    allr = regs_t.select(
        F.col("event_type").alias("scope"), "reg", "r"
    ).unionByName(merged)
    s = allr.groupBy("scope").agg(
        F.count("*").cast("long").alias("hit"),
        F.sum(F.expr("CAST(1.0 AS DOUBLE) / shiftleft(1, r)")).alias("harm"),
    )
    raw = s.select(
        "scope",
        "hit",
        (
            F.lit(_HLL_ALPHA * _HLL_M * _HLL_M)
            / (F.col("harm") + (_HLL_M - F.col("hit")))
        ).alias("raw_est"),
    )
    fin = raw.select(
        "scope",
        "hit",
        F.when(
            (F.col("raw_est") <= 2.5 * _HLL_M) & (F.col("hit") < _HLL_M),
            rnd(F.lit(_HLL_M) * F.log(_HLL_M * 1.0 / (_HLL_M - F.col("hit"))), 4),
        )
        .otherwise(rnd(F.col("raw_est"), 4))
        .alias("est"),
    )
    truth = (
        t.events.groupBy(F.col("event_type").alias("scope"))
        .agg(F.countDistinct("user_id").cast("long").alias("n_true"))
        .unionByName(
            t.events.agg(
                F.lit("(merged)").alias("scope"),
                F.countDistinct("user_id").cast("long").alias("n_true"),
            )
        )
    )
    return fin.join(truth, "scope").select(
        "scope",
        "n_true",
        F.col("hit").alias("n_registers_hit"),
        "est",
        rnd(F.abs(F.col("est") - F.col("n_true")) / F.col("n_true"), 4).alias(
            "rel_err"
        ),
    )


j_hll_merge.__doc__ = j_hll_merge.__doc__.replace("{m}", str(_HLL_M))


# Sketch-sizing curve: candidate widths at the shared depth. The token
# vocabulary is Heaps-small, so the narrow widths FORCE collisions —
# the curve's whole point is to show the error knee.
_CMSW_WIDTHS = [8, 32, 256]


def _cmsw_bucket_sql(d: int, w: int) -> str:
    return (
        f"CAST(concat('0x', substr(md5({d} || ':' || tok), 1, 4)) AS BIGINT)"
        f" % {w}"
    )


def _cmsw_oracle() -> str:
    """DuckDB twin of j_cms_width_curve: per candidate width, the same
    depth-{d} md5 row hashes mod that width, and the point-query
    overcount rollup (mean on the exact (2e6·S+n) div 2n grid)."""
    legs = []
    for w in _CMSW_WIDTHS:
        cases = " ".join(
            f"WHEN {d} THEN {_cmsw_bucket_sql(d, w)}" for d in range(1, _CMS_D + 1)
        )
        pcases = " ".join(
            f"WHEN {d} THEN {_cmsw_bucket_sql(d, w).replace('tok', 'truth.tok')}"
            for d in range(1, _CMS_D + 1)
        )
        legs.append(f"""
    SELECT {w} AS width, n_tokens, mean_overcount, max_overcount, n_exact
    FROM (
      WITH cells_{w} AS (SELECT d.d, CASE d.d {cases} END AS bucket
                 FROM tok CROSS JOIN dd d),
      cms_{w} AS (SELECT d, bucket, CAST(COUNT(*) AS BIGINT) AS c
              FROM cells_{w} GROUP BY d, bucket),
      probes_{w} AS (SELECT truth.tok, truth.true_count, d.d,
                    CASE d.d {pcases} END AS bucket
                 FROM truth CROSS JOIN dd d),
      est_{w} AS (SELECT probes_{w}.tok, probes_{w}.true_count,
                    MIN(cms_{w}.c) AS cms_est
              FROM probes_{w} JOIN cms_{w}
                ON cms_{w}.d = probes_{w}.d AND cms_{w}.bucket = probes_{w}.bucket
              GROUP BY probes_{w}.tok, probes_{w}.true_count)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST((2000000 * CAST(SUM(cms_est - true_count) AS HUGEINT)
                   + COUNT(*))
                  // (2 * CAST(COUNT(*) AS HUGEINT)) AS BIGINT)
                 / 1000000.0 AS mean_overcount,
             CAST(MAX(cms_est - true_count) AS BIGINT) AS max_overcount,
             CAST(COUNT(*) FILTER (cms_est = true_count) AS BIGINT) AS n_exact
      FROM est_{w})""")
    return f"""
    WITH tok AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
    dd AS (SELECT * FROM (VALUES {', '.join(f'({d})' for d in range(1, _CMS_D + 1))}) v(d)),
    truth AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS true_count
              FROM tok GROUP BY tok)
    {' UNION ALL '.join(legs)}
    """


def _cmsw_bucket_col(d: int, w: int):
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{d}:"), F.col("tok"))), 1, 4), 16, 10
        ).cast("long")
        % w
    )


@query("j_cms_width_curve", oracle=_cmsw_oracle())
def j_cms_width_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min SIZING curve: the j_cms_sketch estimator re-run at
    candidate widths {widths} (shared depth {d}, same md5 row-hash
    family), each width summarized by its mean/max point-query
    overcount and the fraction of exactly-answered tokens — the
    bytes-vs-error table you read BEFORE provisioning the sketch
    (j_cms_sketch proves the estimator at one geometry; this prices
    the geometry choice, the j_lsh_band_plan of the counting world).
    The narrow widths are chosen to FORCE collisions on the fixture
    vocabulary so the error knee is visible in the output.

    EXACT: counters and overcounts are integers end to end; the mean
    rounds half-up via (2e6·S+n) div 2n in HUGEINT (DuckDB's // on
    DECIMAL is true division — the r13 parity gotcha) and exact
    integer sums — no float anywhere.

    Plan: ONE persisted token explode feeds every width's cells AND
    the shared truth relation; each width costs a {d}x|width| hash
    agg (the sketch — constant size regardless of corpus) plus a
    vocab-sized probe join against the BROADCAST sketch. The union
    is |widths| rows. At 100 TB the explode is the only corpus pass,
    amortized across the whole curve."""
    t = load(spark, sf_dir)
    # spread: the token explode is persisted with NO exchange, so a
    # plain single-row-group scan pins the cached relation (and every
    # consumer pass) to ONE partition (no-op at scale, tables.spread)
    tok = spread(spark, sf_dir, "documents").select(F.explode(tokens_col("text")).alias("tok"))
    tok.persist()  # consumers: |widths| sketch builds + shared truth
    truth = tok.groupBy("tok").agg(F.count("*").cast("long").alias("true_count"))
    truth.persist()  # probed once per width
    out = None
    for w in _CMSW_WIDTHS:
        cells = tok.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(d).alias("d"), _cmsw_bucket_col(d, w).alias("bucket")
                        )
                        for d in range(1, _CMS_D + 1)
                    ]
                )
            ).alias("cell")
        ).select("cell.d", "cell.bucket")
        cms = cells.groupBy("d", "bucket").agg(F.count("*").cast("long").alias("c"))
        probes = truth.select(
            "tok",
            "true_count",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(d).alias("d"), _cmsw_bucket_col(d, w).alias("bucket")
                        )
                        for d in range(1, _CMS_D + 1)
                    ]
                )
            ).alias("cell"),
        ).select("tok", "true_count", "cell.d", "cell.bucket")
        est = (
            probes.join(F.broadcast(cms), ["d", "bucket"])
            .groupBy("tok", "true_count")
            .agg(F.min("c").alias("cms_est"))
        )
        row = est.agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.expr(
                "CAST((2000000 * CAST(SUM(cms_est - true_count) AS DECIMAL(38,0))"
                " + COUNT(*))"
                " div (2 * CAST(COUNT(*) AS DECIMAL(38,0))) AS BIGINT)"
            ).alias("m6"),
            F.max(F.col("cms_est") - F.col("true_count"))
            .cast("long")
            .alias("max_overcount"),
            F.count(F.when(F.col("cms_est") == F.col("true_count"), 1))
            .cast("long")
            .alias("n_exact"),
        ).select(
            F.lit(w).alias("width"),
            "n_tokens",
            (F.col("m6") / 1000000.0).alias("mean_overcount"),
            "max_overcount",
            "n_exact",
        )
        out = row if out is None else out.unionAll(row)
    return out


j_cms_width_curve.__doc__ = j_cms_width_curve.__doc__.replace(
    "{widths}", str(_CMSW_WIDTHS)
).replace("{d}", str(_CMS_D))


# HLL sizing curve: candidate precisions. alpha_m per the HLL paper's
# small-m table (0.673 / 0.709) and the general formula at m >= 128;
# the SAME python-repr decimal literal is emitted into both engines.
_HLLP_PS = [4, 6, 8]


def _hll_alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def _hllp_oracle() -> str:
    """DuckDB twin of j_hll_precision_curve: per precision p, the same
    md5 32-bit hash split into top-p register index and (32-p)-bit
    rank field, the dyadic harmonic sum, and the paper's small-range
    branch — the j_hll_portable arithmetic at three geometries."""
    legs = []
    for p in _HLLP_PS:
        m = 1 << p
        rest_bits = 32 - p
        rest_mod = 1 << rest_bits
        alpha = _hll_alpha(m)
        legs.append(f"""
    SELECT {p} AS p, {m} AS m, n_true, hit AS n_registers_hit,
           CASE WHEN raw_est <= 2.5 * {m} AND hit < {m}
                THEN FLOOR({m} * ln({m} * 1.0 / ({m} - hit)) * 10000 + 0.5)
                     / 10000
                ELSE FLOOR(raw_est * 10000 + 0.5) / 10000 END AS est
    FROM (
      SELECT n_true, hit,
             (CAST({alpha!r} AS DOUBLE) * {m} * {m}) / (harm + ({m} - hit))
                 AS raw_est
      FROM (
        SELECT CAST(COUNT(*) AS BIGINT) AS hit,
               SUM(CAST(1 AS DOUBLE) / (1 << r)) AS harm
        FROM (
          SELECT reg, MAX(CASE WHEN rest = 0 THEN {rest_bits + 1}
                               ELSE {rest_bits + 1} - length(bin(rest)) END)
                     AS r
          FROM (SELECT h // {rest_mod} AS reg, h % {rest_mod} AS rest FROM x)
          GROUP BY reg)) CROSS JOIN truth)""")
    return f"""
    WITH x AS (
      SELECT DISTINCT
             CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                  AS BIGINT) AS h
      FROM events),
    truth AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_true
              FROM events)
    {' UNION ALL '.join(legs)}
    """


@query("j_hll_precision_curve", oracle=_hllp_oracle())
def j_hll_precision_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog SIZING curve: the j_hll_portable estimator at
    precisions p = {ps} (m = 16/64/256 registers) over the SAME
    md5-hashed user stream — estimate and register occupancy per
    geometry, next to the exact distinct count. The bytes-vs-error
    table for distinct-count sketches, completing the sizing trilogy
    with j_cms_width_curve (counting) and j_lsh_band_plan (pair
    detection): the paper's 1.04/sqrt(m) error bound becomes three
    measured rows.

    Float discipline (the j_hll_portable argument per geometry): the
    harmonic sum adds dyadic rationals 2^-rho — exact in IEEE doubles
    at any accumulation order — and each alpha_m enters BOTH engines
    as the same repr() decimal literal; only the ln-based output
    rounds (1e-4).

    Plan: ONE persisted distinct-hash relation (|users| rows) feeds
    all three geometries — reg/rest splits are integer div/mod on the
    same 32-bit hash, so the curve costs one corpus DISTINCT plus
    three m-row register aggs. Output is |precisions| rows."""
    t = load(spark, sf_dir)
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    x = t.events.select(h.alias("h")).distinct()
    x.persist()  # consumers: the three register aggs
    truth = t.events.agg(F.countDistinct("user_id").cast("long").alias("n_true"))
    truth.persist()
    out = None
    for p in _HLLP_PS:
        m = 1 << p
        rest_bits = 32 - p
        rest_mod = 1 << rest_bits
        alpha = _hll_alpha(m)
        rr = x.select(
            F.expr(f"h div {rest_mod}").alias("reg"),
            (F.col("h") % rest_mod).alias("rest"),
        )
        rho = rr.select(
            "reg",
            F.when(F.col("rest") == 0, rest_bits + 1)
            .otherwise((rest_bits + 1) - F.length(F.bin("rest")))
            .alias("rho"),
        )
        regs = rho.groupBy("reg").agg(F.max("rho").alias("r"))
        s = regs.agg(
            F.count("*").cast("long").alias("hit"),
            F.sum(F.expr("CAST(1.0 AS DOUBLE) / shiftleft(1, r)")).alias("harm"),
        )
        raw = s.select(
            "hit",
            (F.lit(alpha * m * m) / (F.col("harm") + (m - F.col("hit")))).alias(
                "raw_est"
            ),
        )
        fin = raw.select(
            "hit",
            F.when(
                (F.col("raw_est") <= 2.5 * m) & (F.col("hit") < m),
                rnd(F.lit(m) * F.log(m * 1.0 / (m - F.col("hit"))), 4),
            )
            .otherwise(rnd(F.col("raw_est"), 4))
            .alias("est"),
        )
        row = fin.crossJoin(F.broadcast(truth)).select(
            F.lit(p).alias("p"),
            F.lit(m).alias("m"),
            "n_true",
            F.col("hit").alias("n_registers_hit"),
            "est",
        )
        out = row if out is None else out.unionAll(row)
    return out


j_hll_precision_curve.__doc__ = j_hll_precision_curve.__doc__.replace(
    "{ps}", str(_HLLP_PS)
)


# KMV: k minimum hash values per group; 60-bit non-negative hash space
# (15 hex chars of md5 — one conv, no sign handling on either engine).
_KMV_K = 64
_KMV_M = float(1 << 60)


@query(
    "j_kmv_distinct",
    oracle=f"""
    WITH h AS (SELECT DISTINCT event_type,
                      CAST(concat('0x', substr(
                          md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
               FROM events),
    r AS (SELECT event_type, h,
                 ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rk
          FROM h),
    s AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_exact,
                 CAST(MAX(CASE WHEN rk = {_KMV_K} THEN h END) AS BIGINT) AS hk
          FROM r GROUP BY 1)
    SELECT event_type, n_exact, CAST({_KMV_K} AS BIGINT) AS kmv_k,
           FLOOR(CASE WHEN n_exact < {_KMV_K} THEN CAST(n_exact AS DOUBLE)
                      ELSE ({_KMV_M!r} / CAST(hk AS DOUBLE)) * {_KMV_K - 1}
                 END * 1000000 + 0.5) / 1000000 AS est,
           FLOOR((CASE WHEN n_exact < {_KMV_K} THEN CAST(n_exact AS DOUBLE)
                       ELSE ({_KMV_M!r} / CAST(hk AS DOUBLE)) * {_KMV_K - 1}
                  END - n_exact) / n_exact * 1000000 + 0.5) / 1000000
             AS rel_err
    FROM s
    """,
)
def j_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-Minimum-Values distinct-count sketch (Bar-Yossef et al. 2002,
    public) per event type: hash each user into a 60-bit space, keep
    the {k} smallest values, estimate |distinct| = (k-1)·M/h_(k) from
    the k-th minimum alone — the ORDER-STATISTIC route to the same
    answer HyperLogLog reaches via register maxima, so reading this
    next to j_hll_portable (same stream, same hash family) shows the
    two classical distinct-sketch designs against the same exact
    truth; when a group holds fewer than k distinct hashes the sketch
    IS the exact set (est = n_exact, the standard small-range branch,
    exercised at sf0.001 where groups hold 15 users). Unlike HLL,
    KMV also supports set INTERSECTION estimates, which is why
    engines ship both.

    EXACT: the hash is one conv of 15 md5 hex chars (non-negative on
    both engines); the k-th min is an integer order statistic; the
    estimate applies one fixed div-then-mul IEEE sequence to exact
    integers (M = 2^60 is dyadic-exact; the BIGINT→DOUBLE cast of
    h_k rounds identically on both engines) and rounds 1e-6.

    Plan: DISTINCT collapses the stream to |users-per-type| rows
    map-side; the rank window partitions by event_type over that
    BOUNDED relation (users, not events — the j_mannwhitney
    argument); output is |types| rows. At 100 TB the same shape
    holds: a production KMV keeps a k-row heap per group in one
    pass; this relational form is its audit twin sharing the driver
    gate."""
    t = load(spark, sf_dir)
    h = (
        t.events.select(
            "event_type",
            F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
            .cast("long")
            .alias("h"),
        )
        .distinct()
    )
    rk = F.row_number().over(Window.partitionBy("event_type").orderBy("h"))
    r = h.select("event_type", "h", rk.alias("rk"))
    s = r.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_exact"),
        F.max(F.when(F.col("rk") == _KMV_K, F.col("h"))).cast("long").alias("hk"),
    )
    est = F.when(
        F.col("n_exact") < _KMV_K, F.col("n_exact").cast("double")
    ).otherwise(
        (F.lit(_KMV_M) / F.col("hk").cast("double")) * F.lit(_KMV_K - 1)
    )
    return s.select(
        "event_type",
        "n_exact",
        F.lit(_KMV_K).cast("long").alias("kmv_k"),
        rnd(est, 6).alias("est"),
        rnd((est - F.col("n_exact")) / F.col("n_exact"), 6).alias("rel_err"),
    )


j_kmv_distinct.__doc__ = j_kmv_distinct.__doc__.replace("{k}", str(_KMV_K))


# Quantile sketch sizing curve: the deterministic hash-coin Bernoulli
# sampler that fronts a KLL sketch (Karnin-Lang-Liberty 2016, public),
# at three geometries (keep rates 2^-1, 2^-2, 2^-3 via 60-bit md5 hash
# thresholds). Level 0 (rate 1) is the exact truth computed through the
# IDENTICAL pipeline, so the curve measures ONLY sampling error.
_QSK_LEVELS = 3
_QSK_M = 1 << 60


@query(
    "j_quantile_sketch_curve",
    oracle=f"""
    WITH h AS (SELECT n_chars,
                      CAST(concat('0x', substr(
                          md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
               FROM documents),
    lv AS (SELECT l.lvl, h.n_chars
           FROM h, (SELECT CAST(unnest(range(0, {_QSK_LEVELS + 1})) AS BIGINT)
                        AS lvl) l
           WHERE h.h < ({_QSK_M} >> l.lvl)),
    hist AS (SELECT lvl, n_chars, CAST(COUNT(*) AS BIGINT) AS n
             FROM lv GROUP BY 1, 2),
    cum AS (SELECT lvl, n_chars, n,
                   CAST(SUM(n) OVER (PARTITION BY lvl ORDER BY n_chars
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS c
            FROM hist),
    tot AS (SELECT lvl, CAST(SUM(n) AS BIGINT) AS nn FROM hist GROUP BY 1),
    grid AS (SELECT lvl, nn, CAST(unnest(range(1, 10)) AS BIGINT) AS decile
             FROM tot),
    g2 AS (SELECT lvl, nn, decile, (decile * nn + 9) // 10 AS target_rank
           FROM grid),
    hit AS (SELECT g.lvl, g.decile, g.nn, MIN(c.n_chars) AS boundary
            FROM g2 g JOIN cum c ON c.lvl = g.lvl AND c.c >= g.target_rank
            GROUP BY 1, 2, 3),
    wb AS (SELECT lvl, nn, boundary,
                  MAX(CASE WHEN lvl = 0 THEN boundary END)
                      OVER (PARTITION BY decile) AS b0
           FROM hit),
    er AS (SELECT lvl, nn, ABS(boundary - b0) AS err FROM wb WHERE lvl > 0)
    SELECT lvl, CAST(1 << lvl AS BIGINT) AS rate_denom,
           nn AS n_sample,
           CAST(MAX(err) AS BIGINT) AS max_abs_err,
           {sql_rnd("SUM(err) / 9.0", 6)} AS mean_abs_err
    FROM er GROUP BY lvl, nn
    """,
)
def j_quantile_sketch_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-sketch sizing curve: the deterministic hash-coin
    Bernoulli sampler that fronts a KLL sketch (Karnin-Lang-Liberty
    2016, public — level-l items survive with probability 2^-l), run at
    three geometries (keep rates 1/2, 1/4, 1/8 via a 60-bit md5
    threshold on doc_id) against the EXACT decile truth of
    documents.n_chars. Level 0 (rate 1) is that truth, computed through
    the IDENTICAL histogram-rank pipeline as the samples
    (j_length_deciles' discipline: boundary for decile d = smallest
    value whose cumulative count reaches ceil(d*n/10)), so the reported
    errors isolate SAMPLING error — exactly the number a 100 TB
    percentile dashboard needs to size its sketch: one row per level
    with the sample size and the max/mean absolute decile-boundary
    error. Completes the sketch-sizing family next to j_cms_width_curve
    / j_hll_precision_curve / j_bloom_fpr_curve (same shape: geometry ->
    measured error vs exact truth, one pass).

    EXACT: the hash threshold is an integer compare in a dyadic 2^60
    space (the j_kmv_distinct hash family); boundaries and errors are
    BIGINTs; the only float op is the display mean (sum/9.0, rnd 1e-6).

    Plan: corpus-touching work is ONE hash agg over (level, n_chars) —
    4x the j_length_deciles histogram, still bounded by 4*|distinct
    lengths| rows (metadata at any corpus size); the cumulative window
    partitions BY LEVEL over that bounded relation, and the decile grid
    join is a 36-row broadcast. At 100 TB the identical shape holds —
    the sampler is a stateless filter, the histogram has map-side
    partials, and nothing ever sorts corpus rows."""
    t = load(spark, sf_dir)
    h = t.documents.select(
        "n_chars",
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        .alias("h"),
    )
    lv = (
        h.select(
            "n_chars",
            "h",
            F.explode(
                F.array(*[F.lit(l).cast("long") for l in range(_QSK_LEVELS + 1)])
            ).alias("lvl"),
        )
        .where(
            F.col("h")
            < F.expr(f"shiftright(CAST({_QSK_M} AS BIGINT), CAST(lvl AS INT))")
        )
    )
    hist = lv.groupBy("lvl", "n_chars").agg(F.count("*").cast("long").alias("n"))
    w = Window.partitionBy("lvl").orderBy("n_chars").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = hist.select("lvl", "n_chars", F.sum("n").over(w).cast("long").alias("c"))
    tot = hist.groupBy("lvl").agg(F.sum("n").cast("long").alias("nn"))
    grid = tot.select(
        "lvl",
        "nn",
        F.explode(F.array(*[F.lit(i).cast("long") for i in range(1, 10)])).alias(
            "decile"
        ),
    ).select(
        "lvl", "nn", "decile", F.expr("(decile * nn + 9) div 10").alias("target_rank")
    )
    hit = (
        F.broadcast(grid.withColumnRenamed("lvl", "glvl"))
        .join(cum, (F.col("glvl") == F.col("lvl")) & (F.col("c") >= F.col("target_rank")))
        .groupBy("glvl", "decile", "nn")
        .agg(F.min("n_chars").alias("boundary"))
        .withColumnRenamed("glvl", "lvl")
    )
    # b0 via a window over the 36-row hit relation instead of a
    # filter+self-join: a fork at `hit` would recompute the corpus scan
    # + histogram once per branch (2x I/O at any scale)
    b0 = F.max(F.when(F.col("lvl") == 0, F.col("boundary"))).over(
        Window.partitionBy("decile")
    )
    er = (
        hit.withColumn("b0", b0)
        .where(F.col("lvl") > 0)
        .select("lvl", "nn", F.abs(F.col("boundary") - F.col("b0")).alias("err"))
    )
    return er.groupBy("lvl", "nn").agg(
        F.max("err").cast("long").alias("max_abs_err"),
        rnd(F.sum("err") / 9.0, 6).alias("mean_abs_err"),
    ).select(
        "lvl",
        F.expr("CAST(shiftleft(CAST(1 AS BIGINT), CAST(lvl AS INT)) AS BIGINT)").alias(
            "rate_denom"
        ),
        F.col("nn").alias("n_sample"),
        "max_abs_err",
        "mean_abs_err",
    )


# KMV set-intersection: the capability j_kmv_distinct's docstring
# promises over HLL, measured. Panel of 6 suppliers -> 15 unordered
# pairs; universe = each supplier's distinct part set (genuinely
# partial overlaps at every scale, unlike the saturated user/vocab
# sets); k = 64 minimum hash values of the pair UNION.
_KMVJ_K = 64
_KMVJ_SUPPS = 6


@query(
    "j_kmv_jaccard",
    oracle=f"""
    WITH pairs AS (SELECT a.s AS supp_a, b.s AS supp_b
                   FROM (SELECT CAST(unnest(range(1, {_KMVJ_SUPPS + 1}))
                             AS BIGINT) AS s) a,
                        (SELECT CAST(unnest(range(1, {_KMVJ_SUPPS + 1}))
                             AS BIGINT) AS s) b
                   WHERE a.s < b.s),
    h AS (SELECT DISTINCT l_suppkey AS supp,
                 CAST(concat('0x', substr(
                     md5(CAST(l_partkey AS VARCHAR)), 1, 15)) AS BIGINT) AS h
          FROM lineitem WHERE l_suppkey <= {_KMVJ_SUPPS}),
    mem AS (SELECT p.supp_a, p.supp_b, h.h,
                   CAST(MAX(CASE WHEN h.supp = p.supp_a THEN 1 ELSE 0 END)
                       AS BIGINT) AS in_a,
                   CAST(MAX(CASE WHEN h.supp = p.supp_b THEN 1 ELSE 0 END)
                       AS BIGINT) AS in_b
            FROM pairs p JOIN h ON h.supp = p.supp_a OR h.supp = p.supp_b
            GROUP BY 1, 2, 3),
    rk AS (SELECT supp_a, supp_b, in_a, in_b,
                  ROW_NUMBER() OVER (PARTITION BY supp_a, supp_b ORDER BY h)
                      AS rk
           FROM mem),
    agg AS (SELECT supp_a, supp_b,
                   CAST(COUNT(*) AS BIGINT) AS n_union_exact,
                   CAST(SUM(in_a * in_b) AS BIGINT) AS n_both_exact,
                   CAST(SUM(CASE WHEN rk <= {_KMVJ_K} THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_union_k,
                   CAST(SUM(CASE WHEN rk <= {_KMVJ_K} THEN in_a * in_b
                            ELSE 0 END) AS BIGINT) AS n_both_k
            FROM rk GROUP BY 1, 2)
    SELECT supp_a, supp_b, CAST({_KMVJ_K} AS BIGINT) AS kmv_k,
           n_union_exact,
           {sql_rnd("n_both_exact * 1.0 / n_union_exact", 6)}
               AS exact_jaccard,
           {sql_rnd("n_both_k * 1.0 / n_union_k", 6)} AS est_jaccard,
           {sql_rnd(
               "ABS(n_both_k * 1.0 / n_union_k"
               " - n_both_exact * 1.0 / n_union_exact)", 6)}
               AS abs_err
    FROM agg
    """,
)
def j_kmv_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV set-INTERSECTION estimation (Beyer et al. 2007, public) —
    the capability j_kmv_distinct's docstring promises over HLL,
    measured against exact truth: for each of the 15 unordered pairs
    of panel suppliers 1..{S}, estimate the Jaccard similarity of
    their distinct PART sets from the k = {k} smallest hash values of
    the pair UNION (est = |both-flagged among the union's k minima| /
    |union's k minima|; when the union holds fewer than k hashes the
    sketch IS the exact set and est = exact). Part sets per supplier
    overlap PARTIALLY at every scale — unlike the fixture's user or
    vocab sets, which saturate to Jaccard 1 — so the measured abs_err
    column carries real signal for the sketch-sizing family
    (j_cms_width_curve / j_hll_precision_curve /
    j_quantile_sketch_curve: geometry -> error vs exact, one pass).

    EXACT: membership flags and counts are BIGINTs over the
    j_kmv_distinct 60-bit md5 hash space; the three ratios are single
    int/int divisions rounded 1e-6, and abs_err applies the identical
    raw-ratio expression on both engines before its own rounding.

    Plan: the scan keeps only panel suppliers (predicate pushed to the
    parquet scan), DISTINCT collapses to parts-per-supplier map-side,
    the 15-row pair grid broadcasts into a theta-join, and the rank
    window partitions by pair over pair-union relations bounded by
    2x|parts per supplier| — the fixed-panel audit convention
    (j_hubness), linear in panel size, never all-pairs over
    suppliers."""
    t = load(spark, sf_dir)
    s = F.explode(
        F.array(*[F.lit(i).cast("long") for i in range(1, _KMVJ_SUPPS + 1)])
    )
    one = spark.range(1).select(F.lit(1).alias("one"))
    panel = one.select(s.alias("s"))
    pairs = (
        panel.select(F.col("s").alias("supp_a"))
        .crossJoin(panel.select(F.col("s").alias("supp_b")))
        .where(F.col("supp_a") < F.col("supp_b"))
    )
    h = (
        t.lineitem.where(F.col("l_suppkey") <= _KMVJ_SUPPS)
        .select(
            F.col("l_suppkey").cast("long").alias("supp"),
            F.conv(
                F.substring(F.md5(F.col("l_partkey").cast("string")), 1, 15), 16, 10
            )
            .cast("long")
            .alias("h"),
        )
        .distinct()
    )
    mem = (
        F.broadcast(pairs)
        .join(h, (F.col("supp") == F.col("supp_a")) | (F.col("supp") == F.col("supp_b")))
        .groupBy("supp_a", "supp_b", "h")
        .agg(
            F.max((F.col("supp") == F.col("supp_a")).cast("long")).alias("in_a"),
            F.max((F.col("supp") == F.col("supp_b")).cast("long")).alias("in_b"),
        )
    )
    rk = mem.select(
        "supp_a",
        "supp_b",
        "in_a",
        "in_b",
        F.row_number()
        .over(Window.partitionBy("supp_a", "supp_b").orderBy("h"))
        .alias("rk"),
    )
    # ONE conditional aggregation computes sketch and exact counts
    # together — a mem -> (ex, sk) fork would rescan lineitem per branch
    kin = (F.col("rk") <= _KMVJ_K).cast("long")
    agg = rk.groupBy("supp_a", "supp_b").agg(
        F.count("*").cast("long").alias("n_union_exact"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("n_both_exact"),
        F.sum(kin).cast("long").alias("n_union_k"),
        F.sum(F.col("in_a") * F.col("in_b") * kin).cast("long").alias("n_both_k"),
    )
    exact_j = F.col("n_both_exact") * 1.0 / F.col("n_union_exact")
    est_j = F.col("n_both_k") * 1.0 / F.col("n_union_k")
    return agg.select(
        "supp_a",
        "supp_b",
        F.lit(_KMVJ_K).cast("long").alias("kmv_k"),
        "n_union_exact",
        rnd(exact_j, 6).alias("exact_jaccard"),
        rnd(est_j, 6).alias("est_jaccard"),
        rnd(F.abs(est_j - exact_j), 6).alias("abs_err"),
    )


j_kmv_jaccard.__doc__ = j_kmv_jaccard.__doc__.replace("{S}", str(_KMVJ_SUPPS)).replace(
    "{k}", str(_KMVJ_K)
)
