"""§2.H — scalar function families: string / date / math(+haversine) /
conditional / array HOFs / map / json / hash.

These are the APRS parse workhorses (regexp over packet text, haversine
for APRS-IS `r/lat/lon/dist` range filters) exercised on the driver's
relational tables; the packet-specific rows live in aprs_queries.py.

Cross-engine type discipline: Spark's INT-returning functions (size,
year, levenshtein, datediff) are cast to LONG to match DuckDB's BIGINT;
DuckDB's DOUBLE-returning ceil/floor are cast to BIGINT to match
Spark's LONG. All scalar math is identical IEEE ops on both engines —
only libm-backed fns (sin/cos/ln) get a 6-digit portable round.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import rnd
from ..registry import query
from ..tables import load, spread


@query(
    "h_str",
    oracle="""
    SELECT p_partkey,
           substr(p_name, 1, 5) AS name5,
           upper(p_brand) AS brand_up,
           lpad(CAST(p_size AS VARCHAR), 3, '0') AS size_pad,
           array_to_string(string_split(p_type, ' '), '|') AS words,
           CAST(len(string_split(p_type, ' ')) AS BIGINT) AS n_words,
           concat_ws('_', p_brand, p_type) AS tagged,
           regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
           regexp_replace(p_name, '[aeiou]', '', 'g') AS novowel,
           trim('  ' || p_name || '  ') AS trimmed,
           levenshtein(p_brand, 'Brand#12') AS lev
    FROM part
    """,
)
def h_str(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: substr/upper/lpad/split/concat_ws/regexp_*/trim/
    levenshtein — all JVM-side built-ins, no UDF.

    `words` is the split array serialized with '|' (p_type never contains
    '|'): the driver canonicalizer needs all-scalar output columns."""
    t = load(spark, sf_dir)
    return t.part.select(
        "p_partkey",
        F.substring("p_name", 1, 5).alias("name5"),
        F.upper("p_brand").alias("brand_up"),
        F.lpad(F.col("p_size").cast("string"), 3, "0").alias("size_pad"),
        F.concat_ws("|", F.split("p_type", " ")).alias("words"),
        F.size(F.split("p_type", " ")).cast("long").alias("n_words"),
        F.concat_ws("_", "p_brand", "p_type").alias("tagged"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("novowel"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("trimmed"),
        F.levenshtein("p_brand", F.lit("Brand#12")).cast("long").alias("lev"),
    )


@query(
    "h_date",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) AS od,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
           CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS mo,
           CAST(EXTRACT(DOW FROM o_orderdate) AS BIGINT) AS dow_sun0,
           epoch_ms(date_trunc('month', o_orderdate)) AS month_start_ms,
           CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
             AS days_since_95,
           epoch_ms(o_orderdate + INTERVAL 90 DAY) AS deadline_ms,
           epoch_ms(o_orderdate) AS od_ms
    FROM orders
    """,
)
def h_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: extract, trunc, datediff, interval arithmetic,
    epoch conversion. dow normalized to Sunday=0 (Spark's dayofweek is
    Sunday=1; DuckDB's dow is Sunday=0)."""
    t = load(spark, sf_dir)
    od = F.col("o_orderdate")
    return t.orders.select(
        "o_orderkey",
        od.cast("date").alias("od"),
        F.year(od).cast("long").alias("yr"),
        F.month(od).cast("long").alias("mo"),
        (F.dayofweek(od) - 1).cast("long").alias("dow_sun0"),
        F.unix_millis(F.date_trunc("month", od)).alias("month_start_ms"),
        F.datediff(od.cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_95"),
        # parquet ms-timestamps surface as TIMESTAMP_NTZ; with the session
        # pinned to UTC the cast to TIMESTAMP is the identity mapping.
        F.unix_millis((od + F.expr("INTERVAL 90 DAYS")).cast("timestamp")).alias("deadline_ms"),
        F.unix_millis(od.cast("timestamp")).alias("od_ms"),
    )


def _haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in pure column expressions (no UDF) — the
    engine's implementation of the APRS-IS `r/lat/lon/dist` range filter.
    2*R*asin(sqrt(sin²(Δφ/2) + cosφ1·cosφ2·sin²(Δλ/2)))."""
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlon / 2) * F.sin(dlon / 2)
    )
    return 2 * 6371.0 * F.asin(F.sqrt(a))


@query(
    "h_math",
    oracle="""
    SELECT s_suppkey,
           abs(s_acctbal) AS abs_bal,
           CAST(ceil(s_acctbal) AS BIGINT) AS ceil_bal,
           CAST(floor(s_acctbal) AS BIGINT) AS floor_bal,
           FLOOR((pow(s_acctbal, 2)) * 1000000 + 0.5) / 1000000 AS pow2,
           FLOOR((ln(abs(s_acctbal) + 1)) * 1000000 + 0.5) / 1000000 AS ln_bal,
           FLOOR((log10(abs(s_acctbal) + 1)) * 1000000 + 0.5) / 1000000 AS log10_bal,
           FLOOR((sqrt(abs(s_acctbal))) * 1000000 + 0.5) / 1000000 AS sqrt_bal,
           FLOOR((2 * 6371.0 * asin(sqrt(
               sin(radians(48.85 - (((s_suppkey * 7) % 120) - 60)) / 2)
             * sin(radians(48.85 - (((s_suppkey * 7) % 120) - 60)) / 2)
             + cos(radians(((s_suppkey * 7) % 120) - 60)) * cos(radians(48.85))
             * sin(radians(2.35 - (((s_suppkey * 13) % 300) - 150)) / 2)
             * sin(radians(2.35 - (((s_suppkey * 13) % 300) - 150)) / 2)
           ))) * 10000 + 0.5) / 10000 AS dist_km
    FROM supplier
    """,
)
def h_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family + haversine distance in pure SQL expressions.

    The synthetic coordinates derive from s_suppkey; dist_km is the
    distance to (48.85, 2.35). At 100 TB the geo range filter gets a
    coarse grid-cell equality pre-join before the exact haversine
    (operators/geo.py) — here the formula itself is under test."""
    t = load(spark, sf_dir)
    bal = F.col("s_acctbal")
    lat1 = ((F.col("s_suppkey") * 7) % 120 - 60).cast("double")
    lon1 = ((F.col("s_suppkey") * 13) % 300 - 150).cast("double")
    return t.supplier.select(
        "s_suppkey",
        F.abs(bal).alias("abs_bal"),
        F.ceil(bal).cast("long").alias("ceil_bal"),
        F.floor(bal).cast("long").alias("floor_bal"),
        # pow is libm-implementation-defined (JVM fdlibm vs DuckDB's
        # libm differ by 1 ulp on some inputs — first seen at sf0.1,
        # supplier 50), so it rounds like the other transcendentals.
        rnd(F.pow(bal, 2), 6).alias("pow2"),
        rnd(F.log(F.abs(bal) + 1), 6).alias("ln_bal"),
        rnd(F.log10(F.abs(bal) + 1), 6).alias("log10_bal"),
        rnd(F.sqrt(F.abs(bal)), 6).alias("sqrt_bal"),
        rnd(_haversine_km(lat1, lon1, F.lit(48.85), F.lit(2.35)), 4).alias("dist_km"),
    )


@query(
    "h_cond",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'neg'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END AS tier,
           greatest(c_acctbal, 0.0) AS bal_pos,
           least(c_acctbal, 1000.0) AS bal_cap,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_nb
    FROM customer
    """,
)
def h_cond(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional family: CASE WHEN / greatest / least / nullif+coalesce."""
    t = load(spark, sf_dir)
    bal = F.col("c_acctbal")
    return t.customer.select(
        "c_custkey",
        F.when(bal < 0, "neg").when(bal < 5000, "mid").otherwise("high").alias("tier"),
        F.greatest(bal, F.lit(0.0)).alias("bal_pos"),
        F.least(bal, F.lit(1000.0)).alias("bal_cap"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg_nb"
        ),
    )


@query(
    "h_array",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           FLOOR((sqrt(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) * 1000000 + 0.5)
             / 1000000 AS l2_norm,
           array_to_string(list_transform(embedding[1:4],
                 x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)), ',')
             AS first4,
           array_to_string(list_sort(list_transform(embedding[1:4],
                 x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT))), ',')
             AS first4_sorted,
           FLOOR((list_sum(list_transform(range(1, CAST(len(embedding) AS INTEGER) + 1),
                 i -> CAST(embedding[i] AS DOUBLE)
                    * CAST(embedding[len(embedding) + 1 - i] AS DOUBLE))))
               * 1000000 + 0.5) / 1000000 AS dot_rev
    FROM embeddings
    """,
)
def h_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array HOFs on the embedding column: size, transform, slice,
    sort_array, and zip_with+aggregate as a pure-SQL dot product (the
    basis of j_sim_topk). ‖v‖=1 on this data, so l2_norm also validates
    the FIXTURES.md normalization claim.

    first4/first4_sorted serialize as comma-joined micro-unit BIGINTs
    (floor(x*1e6+0.5) — the portable-round integer, same IEEE ops both
    engines): the driver canonicalizer needs scalar columns, and integer
    to-string is formatting-stable where double to-string is not. Sorting
    the scaled longs ≡ sorting the rounded doubles (monotonic map)."""
    t = load(spark, sf_dir)
    emb_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    dot_rev = F.aggregate(
        F.zip_with(emb_d, F.reverse(emb_d), lambda x, y: x * y),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    first4_us = F.transform(
        F.slice(emb_d, 1, 4), lambda x: F.floor(x * 1000000 + F.lit(0.5)).cast("long")
    )
    as_csv = lambda arr: F.concat_ws(",", F.transform(arr, lambda x: x.cast("string")))  # noqa: E731
    return t.embeddings.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        rnd(F.sqrt(F.aggregate(emb_d, F.lit(0.0), lambda a, x: a + x * x)), 6).alias("l2_norm"),
        as_csv(first4_us).alias("first4"),
        as_csv(F.sort_array(first4_us)).alias("first4_sorted"),
        rnd(dot_rev, 6).alias("dot_rev"),
    )


@query(
    "h_map",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           CAST(len(json_keys(props)) AS BIGINT) AS n_keys
    FROM events
    """,
)
def h_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family: parse the JSON props column into map<string,bigint>,
    element_at + map_keys."""
    t = load(spark, sf_dir)
    m = F.from_json("props", "map<string,bigint>")
    return t.events.select(
        "event_id",
        F.element_at(m, "k").alias("k_val"),
        F.size(F.map_keys(m)).cast("long").alias("n_keys"),
    )


@query(
    "h_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           to_json(struct_pack(t := event_type)) AS packed
    FROM events
    """,
)
def h_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family: path extraction (get_json_object) and struct→JSON
    (string fields only — float JSON formatting is engine-specific)."""
    t = load(spark, sf_dir)
    return t.events.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.to_json(F.struct(F.col("event_type").alias("t"))).alias("packed"),
    )


@query(
    "h_hash",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT text) AS n_distinct,
           MIN(md5(text)) AS md5_min,
           MIN(sha256(text)) AS sha_min
    FROM documents GROUP BY lang
    """,
)
def h_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash family — dedup keys. xxhash64 is Spark-internal (not
    portable), so the oracle checks it via the distinct-count identity:
    COUNT(DISTINCT xxhash64(text)) == COUNT(DISTINCT text) barring a
    collision; md5/sha256 hex strings are portable and compared raw."""
    t = load(spark, sf_dir)
    return t.documents.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct(F.xxhash64("text")).alias("n_distinct"),
        F.min(F.md5("text")).alias("md5_min"),
        F.min(F.sha2("text", 256)).alias("sha_min"),
    )


@query(
    "h_geo_range",
    oracle="""
    SELECT s_suppkey,
           FLOOR((2 * 6371.0 * asin(sqrt(
               sin(radians(48.85 - (((s_suppkey * 7) % 120) - 60)) / 2)
             * sin(radians(48.85 - (((s_suppkey * 7) % 120) - 60)) / 2)
             + cos(radians(((s_suppkey * 7) % 120) - 60)) * cos(radians(48.85))
             * sin(radians(2.35 - (((s_suppkey * 13) % 300) - 150)) / 2)
             * sin(radians(2.35 - (((s_suppkey * 13) % 300) - 150)) / 2)
           ))) * 10000 + 0.5) / 10000 AS dist_km
    FROM supplier
    WHERE 2 * 6371.0 * asin(sqrt(
               sin(radians(48.85 - (((s_suppkey * 7) % 120) - 60)) / 2)
             * sin(radians(48.85 - (((s_suppkey * 7) % 120) - 60)) / 2)
             + cos(radians(((s_suppkey * 7) % 120) - 60)) * cos(radians(48.85))
             * sin(radians(2.35 - (((s_suppkey * 13) % 300) - 150)) / 2)
             * sin(radians(2.35 - (((s_suppkey * 13) % 300) - 150)) / 2)
           )) <= 3000
    """,
)
def h_geo_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APRS-IS `r/lat/lon/dist` range filter at scale: sargable bbox
    prefilter (pushes to parquet row-group stats) + exact haversine —
    operators/geo.py. The oracle runs the UNfiltered haversine predicate:
    the bbox is a necessary condition, so the row sets are provably
    identical — that equality is exactly what this qid checks."""
    from ..operators.geo import within_radius

    t = load(spark, sf_dir)
    pts = t.supplier.select(
        "s_suppkey",
        ((F.col("s_suppkey") * 7) % 120 - 60).cast("double").alias("lat"),
        ((F.col("s_suppkey") * 13) % 300 - 150).cast("double").alias("lon"),
    )
    from ..operators.geo import haversine_km

    return within_radius(pts, "lat", "lon", 48.85, 2.35, 3000.0).select(
        "s_suppkey",
        rnd(haversine_km(F.col("lat"), F.col("lon"), F.lit(48.85), F.lit(2.35)), 4).alias(
            "dist_km"
        ),
    )


@query(
    "h_geo_pairs",
    oracle="""
    WITH pts AS (
      SELECT s_suppkey AS id,
             CAST(((s_suppkey * 7) % 120) - 60 AS DOUBLE) AS lat,
             CAST(((s_suppkey * 13) % 300) - 150 AS DOUBLE) AS lon
      FROM supplier)
    SELECT a.id AS id_a, b.id AS id_b,
           FLOOR((2 * 6371.0 * asin(sqrt(
               sin(radians(b.lat - a.lat) / 2) * sin(radians(b.lat - a.lat) / 2)
             + cos(radians(a.lat)) * cos(radians(b.lat))
             * sin(radians(b.lon - a.lon) / 2) * sin(radians(b.lon - a.lon) / 2)
           ))) * 10000 + 0.5) / 10000 AS dist_km
    FROM pts a JOIN pts b ON a.id < b.id
    WHERE 2 * 6371.0 * asin(sqrt(
               sin(radians(b.lat - a.lat) / 2) * sin(radians(b.lat - a.lat) / 2)
             + cos(radians(a.lat)) * cos(radians(b.lat))
             * sin(radians(b.lon - a.lon) / 2) * sin(radians(b.lon - a.lon) / 2)
           )) <= 1500
    """,
)
def h_geo_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise geo join — all station pairs within 1500 km — via grid-
    cell bucketing (operators/geo.geo_pairs_within): 3x3 neighbor-cell
    equi-join instead of an O(n²) haversine cross join. The oracle IS
    the brute-force theta join, so cell coverage correctness (no pair
    missed at cell borders) is exactly what the hash-match proves."""
    from ..operators.geo import geo_pairs_within

    t = load(spark, sf_dir)
    pts = t.supplier.select(
        F.col("s_suppkey").alias("id"),
        ((F.col("s_suppkey") * 7) % 120 - 60).cast("double").alias("lat"),
        ((F.col("s_suppkey") * 13) % 300 - 150).cast("double").alias("lon"),
    )
    pairs = geo_pairs_within(pts, "id", "lat", "lon", 1500.0, max_abs_lat=60.0)
    return pairs.select("id_a", "id_b", rnd(F.col("dist_km"), 4).alias("dist_km"))


@query(
    "h_url",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             'https://' || source || '.example.com/docs/' || doc_id
             || '?lang=' || lang || '&n=' || n_chars AS url
      FROM documents)
    SELECT doc_id, url,
           regexp_extract(url, '^https://([^/]+)', 1) AS host,
           regexp_extract(url, '^https://[^/]+(/[^?#]*)', 1) AS path,
           regexp_extract(url, '\\?([^#]*)', 1) AS query,
           regexp_extract(url, '[?&]lang=([^&#]*)', 1) AS lang_param,
           'https' AS protocol
    FROM u
    """,
)
def h_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL scalar family via parse_url (HOST/PATH/QUERY/QUERY:key/
    PROTOCOL) — the web-corpus staple for domain extraction, per-domain
    quotas, and tracking-param stripping. The URL is constructed from
    table columns (documents carries no URL column), so both engines
    parse identical strings; the oracle mirrors parse_url with anchored
    regexps. Pure JVM expressions, zero shuffle, codegen-friendly."""
    t = load(spark, sf_dir)
    u = t.documents.select(
        "doc_id",
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.com/docs/"),
            F.col("doc_id").cast("string"), F.lit("?lang="), F.col("lang"),
            F.lit("&n="), F.col("n_chars").cast("string"),
        ).alias("url"),
    )
    return u.select(
        "doc_id",
        "url",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
        F.lower(F.parse_url("url", F.lit("PROTOCOL"))).alias("protocol"),
    )


@query(
    "h_variant",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(props ->> '$.k' AS INT)) AS BIGINT) AS sum_k,
           CAST(MIN(CAST(props ->> '$.k' AS INT)) AS INT) AS min_k,
           CAST(MAX(CAST(props ->> '$.k' AS INT)) AS INT) AS max_k,
           CAST(COUNT(CASE WHEN props ->> '$.missing' IS NULL THEN 1 END)
                AS BIGINT) AS n_missing
    FROM events GROUP BY event_type
    """,
)
def h_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT ingestion (new engine type in Spark 4.0): parse the
    events.props JSON once into a VARIANT and extract typed fields
    with variant_get — the schema-on-read path for semi-structured
    columns that replaces per-query JSON string re-parsing (the
    VARIANT binary encoding is parsed once and field access is a
    typed offset lookup, not a string scan). The oracle is DuckDB's
    JSON extraction of the same fields; values are integers, so the
    rollup is exact on both engines. Missing-path extraction must
    yield NULL (counted per group), not an error — the
    schema-drift-tolerance contract of semi-structured ingestion."""
    t = load(spark, sf_dir)
    v = F.parse_json(F.col("props"))
    k = F.try_variant_get(v, "$.k", "int")
    missing = F.try_variant_get(v, "$.missing", "int")
    return t.events.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(k).cast("long").alias("sum_k"),
        F.min(k).cast("int").alias("min_k"),
        F.max(k).cast("int").alias("max_k"),
        F.count(F.when(missing.isNull(), 1)).cast("long").alias("n_missing"),
    )


@query(
    "h_try_arith",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(CASE WHEN o_custkey % 5 = 0 THEN 1 END) AS BIGINT)
             AS n_div_null,
           FLOOR(SUM(CASE WHEN o_custkey % 5 <> 0
                          THEN CAST(CAST(o_totalprice AS DECIMAL(12,2))
                                    / (o_custkey % 5) AS DOUBLE) END)
                 * 10000 + 0.5) / 10000 AS sum_div,
           CAST(COUNT(CASE WHEN TRY_CAST(o_orderpriority AS INT) IS NULL
                           THEN 1 END) AS BIGINT) AS n_cast_null,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders GROUP BY o_orderstatus
    """,
)
def h_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe TRY arithmetic (try_divide / try_cast): under Spark's
    ANSI dialect a division by zero or an invalid cast THROWS — the
    try_ family yields NULL instead, which is what an analytics
    pipeline over dirty data needs (one bad row must not kill a 100 TB
    job). The qid divides by a key-derived value that is zero for 1/5
    of rows and casts a non-numeric string: null counts and the sum of
    the surviving quotients must match the oracle's explicit CASE
    formulation exactly. Division parity: the dividend is DECIMAL-
    exact and the divisor a small integer, so each surviving quotient
    is one IEEE division on identical operands; the quotient sum is
    pre-divided by per-row DISTINCT divisors (1-4), so terms stay
    order-independent enough only because each is floored AFTER the
    sum — per the sums-of-unrounded-libm-free-terms rule (exact-operand
    divisions, boundary odds ~1e-10/row)."""
    t = load(spark, sf_dir)
    div = F.expr("try_divide(CAST(o_totalprice AS DECIMAL(12,2)), o_custkey % 5)")
    # NOT spread (r16): repartitioning before the agg reorders the
    # double quotient sum and flipped the 1e-4 floor boundary on one
    # sf0.1 group (…277.3225 vs .3226) — the win (1.77->0.65 s) is not
    # worth an order-dependent value.
    return t.orders.groupBy("o_orderstatus").agg(
        F.count(F.when(div.isNull(), 1)).cast("long").alias("n_div_null"),
        (
            F.floor(F.sum(div.cast("double")) * 10000 + F.lit(0.5)) / 10000
        ).alias("sum_div"),
        F.count(F.when(F.expr("try_cast(o_orderpriority AS INT)").isNull(), 1))
        .cast("long")
        .alias("n_cast_null"),
        F.count("*").cast("long").alias("n"),
    )


@query(
    "h_regexp",
    oracle="""
    SELECT doc_id,
           COALESCE(array_to_string(
               regexp_extract_all(text, '([a-z]{6,})', 1), ' '), '')
             AS long_words,
           CAST(len(regexp_extract_all(text, 'merge|join')) AS INT) AS n_relops,
           regexp_extract(text, '([a-z]+) ([a-z]+)', 2) AS second_word,
           regexp_replace(text, '[aeiou]', '_', 'g') AS devoweled,
           split_part(lang || ':' || source || ':' || doc_id, ':', 2) AS mid_part,
           split_part(lang || ':' || source || ':' || doc_id, ':', -1) AS last_part
    FROM documents
    """,
)
def h_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp scalar family — regexp_extract_all / regexp_count /
    regexp_extract(group) / global regexp_replace, plus ANSI
    split_part with positive AND negative indexes (Spark 3.5+/4.0
    surface; both engines implement the same negative-index
    from-the-end rule). Patterns stay in the RE2-compatible subset
    (char classes, alternation, bounded repeats) where Java regex and
    DuckDB's RE2 agree; Spark's regexp_count mirrors as
    len(regexp_extract_all) and Spark's non-flag regexp_replace is
    global by default, matching DuckDB's explicit 'g'. The extract_all
    list is flattened with array_join/array_to_string per the repo's
    no-array-output-cells rule (the driver's pandas canonicalizer
    cannot sort ndarray cells); DuckDB's array_to_string maps the
    EMPTY list to NULL where Spark's array_join yields '' — pinned
    with COALESCE on the oracle side. Pure codegen expressions, zero
    shuffle."""
    t = load(spark, sf_dir)
    ident = F.concat_ws(":", F.col("lang"), F.col("source"), F.col("doc_id").cast("string"))
    return t.documents.select(
        "doc_id",
        F.array_join(
            F.regexp_extract_all(F.col("text"), F.lit("([a-z]{6,})"), F.lit(1)), " "
        ).alias("long_words"),
        F.regexp_count(F.col("text"), F.lit("merge|join")).cast("int").alias("n_relops"),
        F.regexp_extract(F.col("text"), "([a-z]+) ([a-z]+)", 2).alias("second_word"),
        F.regexp_replace(F.col("text"), "[aeiou]", "_").alias("devoweled"),
        F.split_part(ident, F.lit(":"), F.lit(2)).alias("mid_part"),
        F.split_part(ident, F.lit(":"), F.lit(-1)).alias("last_part"),
    )


@query(
    "h_mask",
    oracle="""
    WITH s AS (SELECT doc_id,
                      upper(substr(source, 1, 3)) || '-' || n_chars || '-' || lang
                        AS raw
               FROM documents)
    SELECT doc_id, raw,
           regexp_replace(regexp_replace(regexp_replace(raw,
             '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
             AS masked_default,
           regexp_replace(regexp_replace(regexp_replace(regexp_replace(raw,
             '[A-Z]', 'U', 'g'), '[a-z]', 'l', 'g'), '[0-9]', '#', 'g'),
             '[^Ul#]', '*', 'g') AS masked_custom
    FROM s
    """,
)
def h_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mask() — the PII-redaction scalar (Spark 3.4+/4.0): default form
    maps upper→X, lower→x, digit→n, other preserved; the 4-arg form
    substitutes every class including other-chars. The input is
    constructed from columns (mixed case, digits, punctuation) so all
    four classes are exercised; ASCII-only, where Java's and RE2's
    case classes agree, so the oracle mirrors via per-class global
    regexp_replace. Order matters in the custom oracle: the other-char
    pass must run LAST and exclude the substitution alphabet itself.
    Codegen expression, zero shuffle — the shape of a 100 TB scrub
    pass (j_pii_scrub is the regex-surgical sibling)."""
    t = load(spark, sf_dir)
    raw = F.concat_ws(
        "-",
        F.upper(F.substring(F.col("source"), 1, 3)),
        F.col("n_chars").cast("string"),
        F.col("lang"),
    )
    return t.documents.select(
        "doc_id",
        raw.alias("raw"),
        F.mask(raw).alias("masked_default"),
        F.mask(raw, F.lit("U"), F.lit("l"), F.lit("#"), F.lit("*")).alias("masked_custom"),
    )


@query(
    "h_encode",
    oracle="""
    SELECT doc_id,
           base64(CAST(substr(text, 1, 14) AS BLOB)) AS b64,
           hex(substr(text, 1, 8)) AS hexed,
           substr(text, 1, 8) = CAST(from_hex(hex(substr(text, 1, 8))) AS VARCHAR)
             AS roundtrip_ok,
           CAST(bit_count(n_chars) AS INT) AS popcount,
           CAST((n_chars >> 3) & 1 AS INT) AS bit3
    FROM documents
    """,
)
def h_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary encoding scalars — base64 / hex / unhex round-trip plus
    bit_count and getbit. Portability notes encoded as constraints:
    Spark's base64 is MIME-chunked (a CRLF every 57 BYTES of input),
    and substring() counts CHARACTERS — so the encoded prefix is
    capped at 14 chars, whose UTF-8 encoding is <= 56 bytes even at
    the 4-byte worst case, keeping Spark's and DuckDB's output
    identically unchunked for ANY corpus content (the r8 ADVICE
    byte-vs-char trap: 24 chars of multibyte text can exceed 57
    bytes); hex() is uppercase on both; getbit(n, i) mirrors as the
    engine-neutral (n >> i) & 1 (DuckDB's get_bit addresses
    BITSTRINGs, not integers). The round-trip equality proves
    unhex∘hex is lossless on the corpus bytes. All codegen, zero
    shuffle."""
    t = load(spark, sf_dir)
    prefix8 = F.substring(F.col("text"), 1, 8)
    return t.documents.select(
        "doc_id",
        F.base64(F.substring(F.col("text"), 1, 14).cast("binary")).alias("b64"),
        F.hex(prefix8).alias("hexed"),
        (prefix8 == F.unhex(F.hex(prefix8)).cast("string")).alias("roundtrip_ok"),
        F.bit_count(F.col("n_chars")).cast("int").alias("popcount"),
        F.getbit(F.col("n_chars"), F.lit(3)).cast("int").alias("bit3"),
    )


@query(
    "h_struct",
    oracle="""
    WITH s AS (SELECT event_id, user_id, value,
                      epoch_ms(ts) AS ts_ms
               FROM events WHERE event_id % 50 = 0)
    SELECT event_id,
           LEAST(user_id, event_id % 97) AS lo,
           GREATEST(user_id, event_id % 97) AS hi,
           ROW(user_id, ts_ms) < ROW(event_id % 97, ts_ms) AS struct_lt,
           struct_extract(list_zip([user_id, event_id % 97],
                                   [ts_ms, ts_ms + 1])[2], 1) AS second_key,
           struct_extract(list_zip([user_id, event_id % 97],
                                   [ts_ms, ts_ms + 1])[2], 2) AS second_ord
    FROM s
    """,
)
def h_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRUCT scalar family: named_struct packing + field access,
    lexicographic struct comparison (the tie-break engine behind every
    deterministic argmax in this repo — pinned here as a first-class
    surface), and arrays_zip + element_at + field flattening. Output
    columns are FLATTENED scalars: a struct-typed output cell would
    compare Row-vs-dict across engines in the driver's canonicalizer,
    so the contract is that operators unpack structs before returning
    (the same rule every aprs_* parse query follows). Spark's
    arrays_zip names fields after its input columns — aliased
    explicitly on both sides (DuckDB's list_zip builds UNNAMED structs
    — extracted by numeric index).
    Pure codegen, zero shuffle."""
    t = load(spark, sf_dir)
    e = t.events.where(F.col("event_id") % 50 == 0).select(
        "event_id", "user_id", "value", "ts_ms"
    )
    alt = F.col("event_id") % 97
    pair = F.named_struct(F.lit("lo"), F.least(F.col("user_id"), alt),
                          F.lit("hi"), F.greatest(F.col("user_id"), alt))
    zipped = F.arrays_zip(
        F.array(F.col("user_id"), alt).alias("k"),
        F.array(F.col("ts_ms"), F.col("ts_ms") + 1).alias("o"),
    )
    second = F.element_at(zipped, 2)
    return e.select(
        "event_id",
        pair.getField("lo").alias("lo"),
        pair.getField("hi").alias("hi"),
        (
            F.struct(F.col("user_id"), F.col("ts_ms"))
            < F.struct(alt.alias("user_id"), F.col("ts_ms"))
        ).alias("struct_lt"),
        second.getField("k").alias("second_key"),
        second.getField("o").alias("second_ord"),
    )


@query(
    "h_collate",
    oracle="""
    SELECT doc_id,
           contains(lower(text), 'merge') AS has_merge_ci,
           starts_with(lower(source), 'c') AS src_c_ci,
           lower(text) LIKE '%data' AS ends_data_ci,
           lower(lang) < lower(source) AS lang_lt_src_ci,
           lower(lang) = lower(upper(lang)) AS eq_folded,
           CASE WHEN lower(lang) = 'en' THEN 1 ELSE 0 END AS is_en_ci
    FROM documents
    """,
)
def h_collate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String collations (Spark 4.0, SPARK-46830): UTF8_LCASE attaches
    case-insensitivity to the TYPE, so every comparison, predicate, and
    string function downstream folds case without the caller sprinkling
    lower() — the collation travels with the column through joins and
    aggregates, which is the point at 100 TB: one declaration instead
    of N rewrite sites, and Catalyst still prunes/pushes because the
    collated compare is a native expression, not a UDF wrapper. Pinned
    surfaces: contains / startswith / endswith-via-compare, ordering
    (<), and equality under UTF8_LCASE; the oracle mirrors each with
    explicit lower() (UTF8_LCASE is defined as lowercase-mapping
    comparison, so the mirror is exact — unlike UNICODE_CI, which
    full-case-folds and has no DuckDB twin). Pure codegen, zero
    shuffle."""
    t = load(spark, sf_dir)
    text_ci = F.collate(F.col("text"), "UTF8_LCASE")
    lang_ci = F.collate(F.col("lang"), "UTF8_LCASE")
    src_ci = F.collate(F.col("source"), "UTF8_LCASE")
    return t.documents.select(
        "doc_id",
        F.contains(text_ci, F.lit("MERGE")).alias("has_merge_ci"),
        F.startswith(src_ci, F.lit("C")).alias("src_c_ci"),
        F.endswith(text_ci, F.lit("DATA")).alias("ends_data_ci"),
        (lang_ci < src_ci).alias("lang_lt_src_ci"),
        (lang_ci == F.collate(F.upper(F.col("lang")), "UTF8_LCASE")).alias("eq_folded"),
        F.when(lang_ci == F.lit("EN"), 1).otherwise(0).alias("is_en_ci"),
    )


@query(
    "h_xml",
    oracle="""
    SELECT o_orderkey,
           o_custkey AS rt_custkey,
           o_orderstatus AS rt_status,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
             AS rt_cents,
           o_custkey AS xp_custkey,
           o_orderstatus AS xp_status
    FROM orders WHERE o_orderkey % 20 = 0
    """,
)
def h_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native XML (Spark 4.0, SPARK-44265): to_xml serializes a struct
    row to an XML document, from_xml parses it back against an explicit
    schema, and the xpath_* family extracts typed scalars by path
    expression. The qid is a ROUND-TRIP identity: original columns →
    XML text → parsed struct → flattened scalars, plus the same values
    re-extracted via xpath_long/xpath_string, so the oracle is the
    identity projection — a hash match proves serializer and both
    parsers agree on longs, strings, and exact DECIMAL cents without
    the oracle needing to know Spark's XML formatting. Money crosses
    the XML boundary as integer cents (doubles-in-text would reopen
    shortest-round-trip questions). Pure codegen-adjacent expressions
    (XML functions are JVM-side). r17: the scan rides spread() — the
    serialize+parse+2x-XPath chain is exactly the compute-heavy
    per-row map the single-row-group heal exists for (guide §2.5;
    measured 1.19 -> 0.55 s warm min-of-3), and the qid is pure
    row-identity, so partitioning cannot move values."""
    t = load(spark, sf_dir)
    from ..tables import spread
    cents = (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")
    xml = F.to_xml(
        F.struct(
            F.col("o_custkey").alias("ck"),
            F.col("o_orderstatus").alias("st"),
            cents.alias("cents"),
        )
    )
    parsed = F.from_xml(xml, "ck BIGINT, st STRING, cents BIGINT")
    return (
        spread(spark, sf_dir, "orders").where(F.col("o_orderkey") % 20 == 0)
        .select("o_orderkey", xml.alias("x"))
        .select(
            "o_orderkey",
            F.from_xml(F.col("x"), "ck BIGINT, st STRING, cents BIGINT").alias("s"),
            F.xpath_long(F.col("x"), F.lit("/ROW/ck")).alias("xp_custkey"),
            F.xpath_string(F.col("x"), F.lit("/ROW/st")).alias("xp_status"),
        )
        .select(
            "o_orderkey",
            F.col("s.ck").alias("rt_custkey"),
            F.col("s.st").alias("rt_status"),
            F.col("s.cents").alias("rt_cents"),
            "xp_custkey",
            "xp_status",
        )
    )


@query(
    "h_interval",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE)
             AS due_date,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           CAST(CAST(o_orderdate AS DATE)
                + CAST(((4 - (epoch(o_orderdate)//86400) % 7 + 6) % 7 + 1)
                       AS INT) AS DATE) AS next_monday,
           CAST(quarter(o_orderdate) AS INT) AS qtr,
           CAST(weekofyear(o_orderdate) AS INT) AS iso_week,
           make_date(CAST(year(o_orderdate) AS INT),
                     CAST(month(o_orderdate) AS INT), 1) AS month_start,
           CAST(date_diff('day', DATE '1995-01-01',
                          CAST(o_orderdate AS DATE)) AS INT) AS days_since
    FROM orders WHERE o_orderkey % 10 = 0
    """,
)
def h_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-interval date math: add_months (month addition with
    end-of-month CLAMPING — 2024-01-31 + 1 month = 2024-02-29, the
    semantics both engines share, pinned here because naive
    day-arithmetic ports get it wrong), last_day, next_day (strictly-
    later weekday search — DuckDB has no twin, so the oracle derives it
    from the epoch-day grid: day 0 = 1970-01-01 = Thursday, Monday ≡ 4
    (mod 7), advance ((4 - ed%7 + 6) % 7) + 1 ∈ [1,7] days), ISO
    weekofyear / quarter, make_date month anchoring, and datediff from
    a fixed epoch. All integer calendar arithmetic — no floats, no
    timezones (session is UTC-pinned), exact at any scale. Pure
    codegen, zero shuffle."""
    t = load(spark, sf_dir)
    od = F.col("o_orderdate").cast("date")
    return t.orders.where(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        F.add_months(od, 3).alias("due_date"),
        F.last_day(od).alias("month_end"),
        F.next_day(od, "Mon").alias("next_monday"),
        F.quarter(od).cast("int").alias("qtr"),
        F.weekofyear(od).cast("int").alias("iso_week"),
        F.make_date(F.year(od), F.month(od), F.lit(1)).alias("month_start"),
        F.datediff(od, F.lit("1995-01-01").cast("date")).cast("int").alias("days_since"),
    )


@query(
    "h_lateral_alias",
    oracle="""
    SELECT o_orderkey,
           CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
           cents % 100 AS rem_cents,
           (cents - rem_cents) // 100 AS dollars,
           CASE WHEN dollars >= 300000 THEN 'high'
                WHEN dollars >= 150000 THEN 'mid'
                ELSE 'low' END AS band,
           band || ':' || CAST(dollars // 100000 AS VARCHAR) AS shard_key
    FROM orders
    WHERE o_orderkey % 5 = 0
    """,
)
def h_lateral_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral column aliases (Spark 3.4, SPARK-27561): a SELECT item
    referencing an alias defined EARLIER IN THE SAME SELECT — the
    four-deep chain cents -> rem_cents/dollars -> band -> shard_key
    would classically need three nested subqueries (or repeated
    expression text, which drifts). Catalyst resolves the chain by
    inline substitution, so the physical plan is the SAME single
    zero-shuffle projection as the hand-expanded form — sugar at parse
    time, free at run time, and the idiom that keeps derived-column
    pipelines (cents -> band -> shard key) single-sourced in 100 TB
    ETL SQL. Arithmetic is exact-integer after the first FLOOR, so
    both engines agree bit-for-bit; DuckDB resolves the identical
    chain under its own lateral-alias rule, pinning the semantics."""
    t = load(spark, sf_dir)
    t.orders.createOrReplaceTempView("v_orders")
    return spark.sql("""
        SELECT o_orderkey,
               CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
               cents % 100 AS rem_cents,
               (cents - rem_cents) DIV 100 AS dollars,
               CASE WHEN dollars >= 300000 THEN 'high'
                    WHEN dollars >= 150000 THEN 'mid'
                    ELSE 'low' END AS band,
               band || ':' || CAST(dollars DIV 100000 AS STRING) AS shard_key
        FROM v_orders
        WHERE o_orderkey % 5 = 0
    """)
