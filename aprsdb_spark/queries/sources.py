"""§2.A — batch source connectors beyond parquet: CSV, JSON lines, and
schema-evolution (mergeSchema) parquet reads.

Each qid derives its input from the canonical parquet ONCE per
(sf_dir, format) into a deterministic scratch path, then reads it back
through the connector under test. Because the derived file carries
exactly the parquet table's rows, the DuckDB oracle runs the same
aggregate directly against the parquet view: any disagreement is a
round-trip defect in the connector path (quoting, timestamp parsing,
double formatting, schema merge), which is precisely what these qids
exist to catch. Text fidelity is proven at the byte level by summing
the portable md5 word over a string column (operators/dedup
portable_hash32) — a formatting-lossy round trip changes the sum.

100 TB notes: the derived-write step is test scaffolding (coalesce(1)
for a stable layout at bench scale), NOT the sink story — the real
sinks are the partitioned parquet writers in streaming/ingest.py and
queries/layout.py. The READ paths are the product surface: Spark's CSV
and JSON sources split large files by range and read them in parallel
with an explicit schema exactly as written here (schema inference is
avoided — at 100 TB an inference pass is a full extra scan); the
mergeSchema read is how a decade of slowly-evolving parquet partitions
is queried in place without a rewrite."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.dedup import portable_hash32
from ..registry import query
from ..tables import load

_SCRATCH = "/tmp/aprsdb_spark_sources"

_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"

_ORDERS_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        # parquet stores orderdate as isAdjustedToUTC=false -> NTZ; the
        # CSV round trip must preserve that type, and the CSV source's
        # NTZ columns are governed by timestampNTZFormat, NOT
        # timestampFormat (the silent-null failure mode this qid pins).
        T.StructField("o_orderdate", T.TimestampNTZType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)

_DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def _derived_path(sf_dir: str, name: str) -> str:
    return os.path.join(_SCRATCH, os.path.basename(os.path.normpath(sf_dir)), name)


def _ensure(path: str, write) -> str:
    """Materialize a derived source once per path: write to the target,
    then drop a marker so later calls (bench warm runs, the driver's
    repeated scoring) skip the job. The write callback must be
    deterministic given the parquet input."""
    marker = os.path.join(path, "_DERIVED_OK")
    if not os.path.exists(marker):
        write(path)
        with open(marker, "w") as f:
            f.write("ok\n")
    return path


@query(
    "a_scan_csv",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n_orders,
           FLOOR(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                 * 100 + 0.5) / 100 AS sum_price,
           CAST(MIN(o_orderdate) AS DATE) AS first_day,
           CAST(MAX(o_orderdate) AS DATE) AS last_day,
           CAST(SUM(CAST('0x' || substr(md5(o_orderpriority), 1, 8) AS BIGINT))
                AS BIGINT) AS prio_check
    FROM orders GROUP BY o_orderstatus
    """,
)
def a_scan_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source connector: orders round-tripped parquet -> CSV ->
    DataFrame with an EXPLICIT schema (no inference pass) and a pinned
    timestampFormat, then aggregated. The oracle aggregates the parquet
    table directly, so a hash match proves the CSV path preserves longs,
    doubles (Spark writes the shortest round-trip representation),
    micros timestamps, and strings (prio_check sums the md5 word) —
    byte-for-byte."""
    path = _derived_path(sf_dir, "orders_csv")

    def write(p: str) -> None:
        (
            load(spark, sf_dir)
            .orders.coalesce(1)
            .write.mode("overwrite")
            .option("header", True)
            .option("timestampNTZFormat", _TS_FMT)
            .csv(p)
        )

    _ensure(path, write)
    df = (
        spark.read.schema(_ORDERS_SCHEMA)
        .option("header", True)
        .option("timestampNTZFormat", _TS_FMT)
        .csv(path)
    )
    return df.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        (
            F.floor(
                F.sum(F.col("o_totalprice").cast("decimal(12,2)")).cast("double")
                * 100
                + F.lit(0.5)
            )
            / 100
        ).alias("sum_price"),
        F.min("o_orderdate").cast("date").alias("first_day"),
        F.max("o_orderdate").cast("date").alias("last_day"),
        F.sum(portable_hash32(F.col("o_orderpriority"))).cast("long").alias("prio_check"),
    )


@query(
    "a_scan_json",
    oracle="""
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(CAST('0x' || substr(md5(text), 1, 8) AS BIGINT))
                AS BIGINT) AS text_check
    FROM documents GROUP BY lang
    """,
)
def a_scan_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines source connector: documents round-tripped parquet ->
    JSONL -> DataFrame with an explicit schema. JSON escaping makes the
    text column's round trip lossless by construction (control chars,
    quotes, unicode); text_check (md5-word sum over the full text)
    proves it at the byte level against the parquet-side oracle."""
    path = _derived_path(sf_dir, "documents_json")

    def write(p: str) -> None:
        (
            load(spark, sf_dir)
            .documents.coalesce(1)
            .write.mode("overwrite")
            .json(p)
        )

    _ensure(path, write)
    df = spark.read.schema(_DOCS_SCHEMA).json(path)
    return df.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.sum(portable_hash32(F.col("text"))).cast("long").alias("text_check"),
    )


@query(
    "a_scan_evolve",
    oracle="""
    SELECT CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority
                ELSE '<pre-schema>' END AS priority,
           COUNT(*) AS n_orders,
           FLOOR(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                 * 100 + 0.5) / 100 AS sum_price
    FROM orders GROUP BY 1
    """,
)
def a_scan_evolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution read: two parquet generations of orders — v1
    (even orderkeys) written BEFORE the o_orderpriority column existed,
    v2 (odd orderkeys) with it — read together via mergeSchema, the
    missing column surfacing as NULL for v1 rows. This is the in-place
    query path for a long-lived partitioned dataset whose schema grew
    over time; the oracle reconstructs the same view from the canonical
    table with a parity CASE."""
    path = _derived_path(sf_dir, "orders_evolve")

    def write(p: str) -> None:
        orders = load(spark, sf_dir).orders
        v1 = orders.where(F.col("o_orderkey") % 2 == 0).select(
            "o_orderkey", "o_totalprice"
        )
        v2 = orders.where(F.col("o_orderkey") % 2 == 1).select(
            "o_orderkey", "o_totalprice", "o_orderpriority"
        )
        v1.coalesce(1).write.mode("overwrite").parquet(os.path.join(p, "gen=1"))
        v2.coalesce(1).write.mode("overwrite").parquet(os.path.join(p, "gen=2"))

    _ensure(path, write)
    df = (
        spark.read.option("mergeSchema", True)
        .option("recursiveFileLookup", True)
        .parquet(path)
    )
    return df.groupBy(
        F.coalesce(F.col("o_orderpriority"), F.lit("<pre-schema>")).alias("priority")
    ).agg(
        F.count("*").alias("n_orders"),
        (
            F.floor(
                F.sum(F.col("o_totalprice").cast("decimal(12,2)")).cast("double")
                * 100
                + F.lit(0.5)
            )
            / 100
        ).alias("sum_price"),
    )


@query(
    "a_scan_orc",
    oracle="""
    SELECT lang, source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(SUM(CAST('0x' || substr(md5(text), 1, 8) AS BIGINT))
                AS BIGINT) AS text_check
    FROM documents GROUP BY lang, source
    """,
)
def a_scan_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source connector: documents round-tripped parquet -> ORC ->
    DataFrame, then aggregated. Same contract as a_scan_csv/json: the
    oracle aggregates the parquet table directly, so a hash match
    proves the ORC path preserves longs and strings byte-for-byte
    (text_check sums the portable md5 word over the full document
    text). ORC is the second columnar format large estates actually
    hold (Hive-era tables); Spark reads it with the same vectorized
    reader architecture, predicate pushdown, and split-parallel scans
    as parquet — the point of the qid is that switching `format()` is
    the ONLY change."""
    path = _derived_path(sf_dir, "documents_orc")

    def write(p: str) -> None:
        load(spark, sf_dir).documents.coalesce(1).write.mode("overwrite").orc(p)

    _ensure(path, write)
    df = spark.read.orc(path)
    return df.groupBy("lang", "source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.sum(portable_hash32(F.col("text"))).cast("long").alias("text_check"),
    )


def _pysrc_oracle() -> str:
    """Per-file rollup over the SAME committed replay lines, embedded as
    fixture-VALUES relations (the aprs_* oracle machinery)."""
    from .aprs_queries import _fixture_values_sql
    from ..sources.pysource import REPLAY_FILES

    legs = "\n    UNION ALL\n    ".join(
        f"""SELECT '{f}' AS fname, CAST(COUNT(*) AS BIGINT) AS n_lines,
           MIN(recv_ms) AS first_ms, MAX(recv_ms) AS last_ms,
           CAST(SUM(CAST('0x' || substr(md5(raw), 1, 8) AS BIGINT))
                AS BIGINT) AS raw_check
    FROM {_fixture_values_sql(f)}"""
        for f in REPLAY_FILES
    )
    return legs


@query("a_pysrc_replay", oracle=_pysrc_oracle())
def a_pysrc_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom connector via the Python Data Source API (Spark 4.0,
    SPARK-44076): the `aprs_replay` source reads the five committed
    replay fixtures with ONE InputPartition per file — Spark schedules
    a task per partition and the reader executes in executor Python
    workers, the real connector contract (pre-4.0 this required a JVM
    DataSourceV2). The qid rolls up per file: line counts, the
    timestamp span, and the portable md5-word sum over the raw lines —
    a byte-fidelity proof against the fixture-VALUES oracle, which
    parses the SAME committed lines with the same Hadoop line-split
    rule. sf_dir is unused (fixture-backed, like the aprs_* family);
    registration is idempotent per session."""
    from ..queries.aprs_queries import FIXTURE_DIR
    from ..sources.pysource import AprsReplayDataSource

    # idempotent: re-registration replaces the prior entry with a
    # DataSourceManager WARN, it does not raise (verified on 4.1.2)
    spark.dataSource.register(AprsReplayDataSource)
    df = spark.read.format("aprs_replay").option("path", str(FIXTURE_DIR)).load()
    return df.groupBy("fname").agg(
        F.count("*").cast("long").alias("n_lines"),
        F.min("recv_ms").alias("first_ms"),
        F.max("recv_ms").alias("last_ms"),
        F.sum(portable_hash32(F.col("raw"))).cast("long").alias("raw_check"),
    )


def _binfile_oracle() -> str:
    """Expected (fname, n_bytes, content_md5) for every committed replay
    fixture, computed at import from the SAME bytes Spark's binaryFile
    scan will deliver — the exact-byte-reconstruction oracle technique
    (the multimodal kernels' discipline, applied to a connector)."""
    import hashlib
    import os

    from ..queries.aprs_queries import FIXTURE_DIR

    rows = []
    # EVERY file in the fixture dir, not just REPLAY_FILES — binaryFile
    # scans the whole directory, so the oracle must cover what it sees
    # (late_data.txt / mice_compressed.txt included).
    for f in sorted(os.listdir(FIXTURE_DIR)):
        data = (FIXTURE_DIR / f).read_bytes()
        rows.append(f"('{f}', CAST({len(data)} AS BIGINT), "
                    f"'{hashlib.md5(data).hexdigest()}')")
    return (
        "SELECT fname, n_bytes, content_md5 FROM (VALUES "
        + ", ".join(rows)
        + ") AS t(fname, n_bytes, content_md5)"
    )


@query("a_scan_binary", oracle=_binfile_oracle())
def a_scan_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binaryFile source connector: whole files as rows of (path,
    modificationTime, length, content BINARY) — the ingestion surface
    for opaque media blobs (the j_multimodal_* operators assume their
    binary column arrived through exactly this reader). The qid scans
    the committed replay fixtures and emits name, byte length, and
    content md5; the oracle carries the expected values computed from
    the same committed bytes at import, so a transcoding or truncation
    anywhere in the read path is a value mismatch. Determinism note:
    modificationTime is environment state and is deliberately NOT in
    the output contract.

    100 TB: one task per file (no splitting — files are the atomic
    unit); production bounds file size via pathGlobFilter +
    spark.sql.files.maxPartitionBytes and stores large media pre-
    chunked, which is why the multimodal operators carry chunk columns
    rather than assuming splittable blobs."""
    from ..queries.aprs_queries import FIXTURE_DIR

    df = spark.read.format("binaryFile").load(str(FIXTURE_DIR))
    return df.select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("fname"),
        F.col("length").cast("long").alias("n_bytes"),
        F.md5(F.col("content")).alias("content_md5"),
    )


@query(
    "a_sink_partitioned",
    oracle="""
    SELECT o_orderpriority,
           o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                         AS BIGINT)) AS BIGINT) AS sum_cents,
           CAST(SUM(o_orderkey) AS BIGINT) AS key_check
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    GROUP BY o_orderpriority, o_orderstatus
    """,
)
def a_sink_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned parquet SINK + partition-pruned read-back: the
    canonical write layout for a 100 TB table. Orders are written once
    per sf_dir with partitionBy(o_orderpriority) — each distinct value
    becomes a directory (`o_orderpriority=1-URGENT/...`), the partition
    column is carried by the PATH, not the data files — then read back
    with a two-partition IN filter. That filter is satisfied by
    LISTING: Spark prunes to the two matching directories before any
    file is opened (PartitionFilters in the scan node, pinned in
    test_plans), so the read cost scales with the selected partitions,
    not the table — the mechanism behind date-partitioned fact tables
    where a day's query never touches the decade. Round-trip fidelity
    is the oracle's job: the partition value is re-parsed from the
    directory name (string → string here; escaping of the space in
    '4-NOT SPECIFIED' is exercised by the write), and sums over cents
    and keys prove row fidelity. partitionOverwriteMode=dynamic is the
    production setting for incremental rewrites; the once-per-path
    marker makes repeated scoring read-only."""
    path = _derived_path(sf_dir, "orders_part")

    def write(p: str) -> None:
        (
            load(spark, sf_dir)
            .orders.repartition("o_orderpriority")
            .write.mode("overwrite")
            .partitionBy("o_orderpriority")
            .parquet(p)
        )

    _ensure(path, write)
    df = spark.read.parquet(path).where(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    )
    return df.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.sum((F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("long"))
        .cast("long")
        .alias("sum_cents"),
        F.sum("o_orderkey").cast("long").alias("key_check"),
    )


@query(
    "a_sink_bucketed",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
                         AS BIGINT)) AS BIGINT) AS sum_cents,
           CAST(SUM(l_orderkey) AS BIGINT) AS key_check
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def a_sink_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed SINK + shuffle-FREE fact-fact join read-back: lineitem
    and orders are saved as catalog tables bucketed (and sorted) 8 ways
    on the join key, so the sort-merge join between them runs with NO
    Exchange on either side — bucket i joins bucket i in place. This is
    THE 100 TB fact-fact mechanism: the shuffle is paid ONCE at write
    time (where it amortizes over every later join/agg on that key)
    instead of per-query on petabytes. Plan pinned in test_plans
    (no Exchange under the join) alongside the tmp-warehouse twin in
    test_scale_paths; the oracle joins the raw parquet relationally,
    proving the bucketed round trip loses nothing. Bucket metadata
    lives in the catalog, so a fresh session (in-memory derby) rewrites
    the tables once — catalog presence, not a path marker, is the
    idempotence latch. At scale bucket counts follow data volume
    (buckets ~ total_size / target_file_size, matched across co-joined
    tables); 8 here mirrors the 8-way local parallelism."""
    base = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    db = f"sg_bucket_{base}"
    loc = os.path.join(_SCRATCH, base, "bucketdb")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{loc}'")
    t = load(spark, sf_dir)
    # A fresh session has an empty (in-memory derby) catalog even when a
    # previous process left table files behind; managed-table creation
    # refuses a pre-existing location, so clear the stale directory and
    # rewrite (the data is a deterministic function of the parquet).
    import shutil

    def _write_bucketed(spec) -> None:
        name, src, key, cols = spec
        if not spark.catalog.tableExists(f"{db}.{name}"):
            shutil.rmtree(os.path.join(loc, name), ignore_errors=True)
            (
                # hash-repartition to the bucket count first: the
                # repartition uses the same murmur3 pmod placement as
                # the bucket spec, so each of the 8 write tasks holds
                # exactly one bucket and sorts/writes it in parallel —
                # the plain form funneled the single-row-group scan
                # into ONE task that sorted and wrote all 8 bucket
                # files serially (guide §2.5 input skew). Same table
                # content and file-per-bucket layout either way.
                src.select(*cols)
                .repartition(8, F.col(key))
                .write.bucketBy(8, key)
                .sortBy(key)
                .mode("overwrite")
                .saveAsTable(f"{db}.{name}")
            )

    # the two table writes are independent jobs — overlap them from a
    # 2-thread pool so one write's commit/DDL tail back-fills the other
    # (guide §2.6); each job is still the same plan as the serial form
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        list(
            pool.map(
                _write_bucketed,
                (
                    ("li_b", t.lineitem, "l_orderkey", ["l_orderkey", "l_extendedprice"]),
                    ("ord_b", t.orders, "o_orderkey", ["o_orderkey", "o_orderpriority"]),
                ),
            )
        )
    li = spark.table(f"{db}.li_b")
    od = spark.table(f"{db}.ord_b")
    j = li.hint("merge").join(od, li.l_orderkey == od.o_orderkey)
    return j.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n_items"),
        F.sum((F.col("l_extendedprice").cast("decimal(12,2)") * 100).cast("long"))
        .cast("long")
        .alias("sum_cents"),
        F.sum("l_orderkey").cast("long").alias("key_check"),
    )


_CUST_SCHEMA = T.StructType(
    [
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_mktsegment", T.StringType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.LongType()),
    ]
)


@query(
    "a_scan_xml",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_cust,
           FLOOR(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                 * 100 + 0.5) / 100 AS sum_bal,
           CAST(SUM(c_custkey) AS BIGINT) AS key_check,
           CAST(SUM(CAST('0x' || substr(md5(c_name), 1, 8) AS BIGINT))
                AS BIGINT) AS name_check,
           CAST(SUM(c_nationkey) AS BIGINT) AS nation_check
    FROM customer GROUP BY c_mktsegment
    """,
)
def a_scan_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native XML source connector (Spark 4's built-in `xml` format,
    upstreamed from spark-xml): customer round-tripped parquet -> XML
    rows -> DataFrame with an EXPLICIT schema (no inference pass over
    the files), then aggregated. The oracle aggregates the parquet
    table directly, so a hash match proves the XML path preserves
    longs, doubles (shortest round-trip representation), and strings
    through XML escaping (name_check sums the md5 word — any entity
    mangling flips it). Same contract as a_scan_csv/json/orc.

    100 TB: XML is an ingest-boundary format, not a storage format —
    the qid documents the connector's fidelity so a pipeline can land
    third-party XML feeds straight into the same derived-source
    `_ensure` flow; schema-explicit reads keep the scan single-pass."""
    path = _derived_path(sf_dir, "customer_xml")

    def write(p: str) -> None:
        (
            load(spark, sf_dir)
            .customer.coalesce(1)
            .write.mode("overwrite")
            .format("xml")
            .option("rowTag", "row")
            .save(p)
        )

    _ensure(path, write)
    df = (
        spark.read.schema(_CUST_SCHEMA)
        .format("xml")
        .option("rowTag", "row")
        .load(path)
    )
    return df.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_cust"),
        (
            F.floor(
                F.sum(F.col("c_acctbal").cast("decimal(12,2)")).cast("double") * 100
                + F.lit(0.5)
            )
            / 100
        ).alias("sum_bal"),
        F.sum("c_custkey").cast("long").alias("key_check"),
        F.sum(portable_hash32(F.col("c_name"))).cast("long").alias("name_check"),
        F.sum("c_nationkey").cast("long").alias("nation_check"),
    )


# --- r16: malformed-input semantics (PERMISSIVE mode + _corrupt_record) ---
#
# The clean round-trip qids above prove fidelity on well-formed input;
# every 100 TB ingest also hits MALFORMED rows on day one, and the
# public Spark contract there is PERMISSIVE mode: parse what parses,
# null what doesn't, and record the raw line in
# columnNameOfCorruptRecord — rows are never silently dropped. These
# qids pin that contract against a deterministically-corrupted derived
# file: corruption is keyed on the row's primary key (k % p == 0), so
# the DuckDB oracle reproduces the same classification relationally
# from the clean parquet and even reconstructs the corrupt lines
# byte-for-byte (corrupt_check sums the md5 word over the raw lines
# Spark captured vs the lines the oracle rebuilds).

# Corruption-class moduli (pairwise coprime; checked in order).
_BAD_NUM_MOD = 97   # price token replaced by a non-numeric string
_SHORT_MOD = 89     # line truncated to 2 of 4 fields
_EXTRA_MOD = 83     # one extra trailing field appended
_JSON_BROKEN_MOD = 101  # line truncated mid-object (unparseable)
_JSON_TYPE_MOD = 103    # n_chars written as a JSON string (type error)

_PERM_ORDERS_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderpriority", T.StringType()),
        T.StructField("_corrupt_record", T.StringType()),
    ]
)

_CSV_CAT_SQL = f"""CASE WHEN o_orderkey % {_BAD_NUM_MOD} = 0 THEN 'bad_number'
                 WHEN o_orderkey % {_SHORT_MOD} = 0 THEN 'short_row'
                 WHEN o_orderkey % {_EXTRA_MOD} = 0 THEN 'extra_field'
                 ELSE 'clean' END"""


@query(
    "a_scan_csv_permissive",
    oracle=f"""
    WITH base AS (
      SELECT o_orderkey AS k, o_orderstatus AS st,
             CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS ps,
             o_orderpriority AS pr,
             {_CSV_CAT_SQL} AS category
      FROM orders),
    lines AS (
      SELECT category, st,
             CASE WHEN category IN ('bad_number', 'short_row')
                  THEN NULL
                  ELSE CAST(ps AS DOUBLE) END AS price,
             CASE WHEN category = 'short_row' THEN NULL ELSE pr END AS prio,
             CASE category
               WHEN 'bad_number' THEN k || ',' || st || ',x9.99,' || pr
               WHEN 'short_row'  THEN k || ',' || st
               WHEN 'extra_field'
                 THEN k || ',' || st || ',' || ps || ',' || pr || ',XTRA'
             END AS raw
      FROM base)
    SELECT category,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(raw) AS BIGINT) AS n_corrupt,
           CAST(COUNT(*) - COUNT(price) AS BIGINT) AS n_price_null,
           FLOOR(CAST(SUM(CAST(price AS DECIMAL(12,2))) AS DOUBLE)
                 * 100 + 0.5) / 100 AS sum_price,
           CAST(SUM(CAST('0x' || substr(md5(st), 1, 8) AS BIGINT))
                AS BIGINT) AS status_check,
           CAST(SUM(CAST('0x' || substr(md5(prio), 1, 8) AS BIGINT))
                AS BIGINT) AS prio_check,
           CAST(SUM(CAST('0x' || substr(md5(raw), 1, 8) AS BIGINT))
                AS BIGINT) AS corrupt_check
    FROM lines GROUP BY category
    """,
)
def a_scan_csv_permissive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source under PERMISSIVE mode with _corrupt_record accounting
    — the malformed-input contract every large-scale ingest depends on.
    A derived orders CSV is corrupted deterministically by key: every
    {_BAD_NUM_MOD}th key gets a non-numeric price token, every
    {_SHORT_MOD}th a truncated 2-field line, every {_EXTRA_MOD}th an
    extra trailing field. PERMISSIVE parsing must (a) keep EVERY row
    (n_rows per class equals the parquet-side count — dirty rows land
    in the corrupt column, not the floor), (b) null exactly the
    unparseable fields while keeping the parseable prefix (price null
    on bad_number/short_row; prio null only on short_row; extra_field
    parses fully), and (c) capture the raw line VERBATIM in
    _corrupt_record — corrupt_check sums the md5 word over Spark's
    captured lines while the oracle rebuilds the same lines from clean
    parquet and hashes those: a single shifted byte breaks the match.

    PINNED GOTCHA — CSV column pruning changes malformation semantics:
    with spark.sql.csv.parser.columnPruning.enabled (default true), a
    query that skips a schema column makes the parser skip it too, and
    an extra trailing token is then NOT detected as corrupt (observed:
    dropping o_orderstatus from this agg zeroed extra_field's
    n_corrupt). This qid references EVERY schema column (status_check
    exists for exactly that reason), pinning full-parse semantics; an
    audit query over a PERMISSIVE scan must do the same or read the
    cached full parse.

    Plan: the derived write is scaffolding (coalesce(1)); the product
    surface is the parallel schema-explicit CSV scan + one hash agg on
    the 4-class category — PERMISSIVE adds no extra pass (corrupt
    capture rides the same parse), which is why it is the default at
    100 TB over FAILFAST (kill the job) or DROPMALFORMED (silent
    loss)."""
    path = _derived_path(sf_dir, "orders_csv_dirty")

    def write(p: str) -> None:
        o = load(spark, sf_dir).orders
        k = F.col("o_orderkey")
        ps = F.col("o_totalprice").cast("decimal(12,2)").cast("string")
        clean = F.concat_ws(
            ",", k, F.col("o_orderstatus"), ps, F.col("o_orderpriority")
        )
        line = (
            F.when(
                k % _BAD_NUM_MOD == 0,
                F.concat_ws(
                    ",", k, F.col("o_orderstatus"), F.lit("x9.99"),
                    F.col("o_orderpriority"),
                ),
            )
            .when(k % _SHORT_MOD == 0, F.concat_ws(",", k, F.col("o_orderstatus")))
            .when(k % _EXTRA_MOD == 0, F.concat(clean, F.lit(",XTRA")))
            .otherwise(clean)
        )
        o.select(line.alias("value")).coalesce(1).write.mode("overwrite").text(p)

    _ensure(path, write)
    df = (
        spark.read.schema(_PERM_ORDERS_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )
    k = F.col("o_orderkey")
    cat = (
        F.when(k % _BAD_NUM_MOD == 0, "bad_number")
        .when(k % _SHORT_MOD == 0, "short_row")
        .when(k % _EXTRA_MOD == 0, "extra_field")
        .otherwise("clean")
    )
    return df.groupBy(cat.alias("category")).agg(
        F.count("*").cast("long").alias("n_rows"),
        F.count("_corrupt_record").cast("long").alias("n_corrupt"),
        (F.count("*") - F.count("o_totalprice")).cast("long").alias("n_price_null"),
        (
            F.floor(
                F.sum(F.col("o_totalprice").cast("decimal(12,2)")).cast("double")
                * 100
                + F.lit(0.5)
            )
            / 100
        ).alias("sum_price"),
        F.sum(portable_hash32(F.col("o_orderstatus")))
        .cast("long")
        .alias("status_check"),
        F.sum(portable_hash32(F.col("o_orderpriority")))
        .cast("long")
        .alias("prio_check"),
        F.sum(portable_hash32(F.col("_corrupt_record")))
        .cast("long")
        .alias("corrupt_check"),
    )


_PERM_DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("lang", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("_corrupt_record", T.StringType()),
    ]
)


@query(
    "a_scan_json_permissive",
    oracle=f"""
    WITH base AS (
      SELECT doc_id AS d, lang, n_chars, text,
             CASE WHEN doc_id % {_JSON_BROKEN_MOD} = 0 THEN 'unparseable'
                  WHEN doc_id % {_JSON_TYPE_MOD} = 0 THEN 'type_error'
                  ELSE 'clean' END AS category
      FROM documents),
    cls AS (
      SELECT category,
             CASE WHEN category = 'unparseable' THEN NULL ELSE lang END AS lang,
             CASE WHEN category = 'clean' THEN n_chars END AS n_chars,
             CASE WHEN category = 'unparseable' THEN NULL ELSE text END AS text,
             CASE WHEN category = 'unparseable'
                  THEN substr('{{"doc_id":' || d || ',"lang":"' || lang, 1, 20)
             END AS raw_prefix,
             CASE WHEN category = 'clean' THEN 0 ELSE 1 END AS corrupt
      FROM base)
    SELECT category,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(corrupt) AS BIGINT) AS n_corrupt,
           CAST(COUNT(*) - COUNT(n_chars) AS BIGINT) AS n_chars_null,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(SUM(CAST('0x' || substr(md5(lang), 1, 8) AS BIGINT))
                AS BIGINT) AS lang_check,
           CAST(SUM(CAST('0x' || substr(md5(text), 1, 8) AS BIGINT))
                AS BIGINT) AS text_check,
           CAST(SUM(CAST('0x' || substr(md5(raw_prefix), 1, 8) AS BIGINT))
                AS BIGINT) AS corrupt_prefix_check
    FROM cls GROUP BY category
    """,
)
def a_scan_json_permissive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines source under PERMISSIVE mode — the sibling of
    a_scan_csv_permissive for the other half of day-one ingest
    corruption: structurally BROKEN documents (every {_JSON_BROKEN_MOD}th
    doc's line truncated mid-object — nothing parses, every schema
    field null, the raw fragment lands in _corrupt_record) vs FIELD
    TYPE errors (every {_JSON_TYPE_MOD}th doc's n_chars written as a
    JSON string — only that field nulls, the rest of the row parses,
    and the line is still recorded as corrupt). The category is
    derived from the PARSE RESULT (corrupt null / doc_id present),
    exactly how a production quarantine splits a dirty feed, and the
    oracle reproduces the same three-way split relationally from clean
    parquet. corrupt_prefix_check proves the unparseable rows' raw
    fragments byte-for-byte: the oracle rebuilds the 20-char JSON
    prefix ('{{"doc_id":N,"lang":"...') from parquet values and hashes
    it against what Spark captured. text_check over the two parseable
    categories proves the type-error rows still round-trip their text
    exactly (partial parse loses nothing it could keep).

    Same full-parse discipline as the CSV twin: every schema field is
    referenced in the agg, so field pruning cannot weaken the
    malformation semantics being pinned.

    Plan: schema-explicit parallel JSONL scan + one 3-class hash agg;
    PERMISSIVE is the 100 TB default for the same reason as CSV —
    quarantine beats kill-the-job beats silent loss."""
    path = _derived_path(sf_dir, "documents_json_dirty")

    def write(p: str) -> None:
        docs = load(spark, sf_dir).documents
        d = F.col("doc_id")
        clean_js = F.to_json(F.struct("doc_id", "lang", "n_chars", "text"))
        type_js = F.to_json(
            F.struct(
                F.col("doc_id"),
                F.col("lang"),
                F.lit("n/a").alias("n_chars"),
                F.col("text"),
            )
        )
        line = (
            F.when(d % _JSON_BROKEN_MOD == 0, F.substring(clean_js, 1, 20))
            .when(d % _JSON_TYPE_MOD == 0, type_js)
            .otherwise(clean_js)
        )
        docs.select(line.alias("value")).coalesce(1).write.mode("overwrite").text(p)

    _ensure(path, write)
    df = (
        spark.read.schema(_PERM_DOCS_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    corrupt = F.col("_corrupt_record").isNotNull()
    cat = (
        F.when(~corrupt, "clean")
        .when(F.col("doc_id").isNotNull(), "type_error")
        .otherwise("unparseable")
    )
    return df.groupBy(cat.alias("category")).agg(
        F.count("*").cast("long").alias("n_rows"),
        F.count("_corrupt_record").cast("long").alias("n_corrupt"),
        (F.count("*") - F.count("n_chars")).cast("long").alias("n_chars_null"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.sum(portable_hash32(F.col("lang"))).cast("long").alias("lang_check"),
        F.sum(portable_hash32(F.col("text"))).cast("long").alias("text_check"),
        F.sum(
            F.when(
                F.col("doc_id").isNull(), portable_hash32(F.col("_corrupt_record"))
            )
        )
        .cast("long")
        .alias("corrupt_prefix_check"),
    )
