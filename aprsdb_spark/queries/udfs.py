"""§2.K — the UDF escape-hatch surface, demonstrated end-to-end: scalar
pandas UDF, grouped-agg pandas UDF, applyInPandas (grouped map), python
UDTF, and SQL-registered UDF. Each is oracle-checked where the python
arithmetic is portable (numpy IEEE ops + portable rounding).

These exist to prove the slow paths WORK — the engine's rule stays
"built-ins first": every one of these has a pure-expression twin
elsewhere in the inventory that beats it by 10-100x.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..registry import query
from ..tables import load


@query(
    "k_pandas_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net
    FROM lineitem WHERE l_linenumber = 1
    """,
)
def k_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched scalar pandas UDF. numpy does the same IEEE double
    ops as the JVM, so the unrounded result hash-matches."""

    def _net(price: pd.Series, disc: pd.Series) -> pd.Series:
        return price * (1 - disc)

    net = pandas_udf(_net, "double")
    t = load(spark, sf_dir)
    return t.lineitem.where(F.col("l_linenumber") == 1).select(
        "l_orderkey",
        "l_linenumber",
        net(F.col("l_extendedprice"), F.col("l_discount")).alias("net"),
    )


@query(
    "k_pandas_grouped_agg",
    oracle="""
    SELECT l_returnflag,
           FLOOR((SUM(l_extendedprice * l_discount) / SUM(l_extendedprice)) * 1000000 + 0.5)
             / 1000000 AS wavg_discount
    FROM lineitem GROUP BY l_returnflag
    """,
)
def k_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas UDF: weighted average discount. (pandas uses
    pairwise summation vs SQL's sequential — the 1e-12 relative noise is
    absorbed by the portable 6-digit round.)"""
    import numpy as np

    def _wavg(price: pd.Series, disc: pd.Series) -> float:
        p = price.to_numpy()
        return float(np.floor((p * disc.to_numpy()).sum() / p.sum() * 1e6 + 0.5) / 1e6)

    wavg = pandas_udf(_wavg, "double", F.PandasUDFType.GROUPED_AGG)
    t = load(spark, sf_dir)
    return t.lineitem.groupBy("l_returnflag").agg(
        wavg(F.col("l_extendedprice"), F.col("l_discount")).alias("wavg_discount")
    )


@query(
    "k_apply_in_pandas",
    oracle="""
    SELECT event_id,
           FLOOR(((value - AVG(value) OVER (PARTITION BY event_type)) /
                  STDDEV_SAMP(value) OVER (PARTITION BY event_type)) * 10000 + 0.5)
             / 10000 AS zscore
    FROM events
    """,
)
def k_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-event-type z-score normalization
    (the track-smoothing / per-station-normalization shape). Whole
    groups stream through a python worker as Arrow batches."""

    def _norm(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        v = pdf["value"]
        z = (v - v.mean()) / v.std(ddof=1)
        return pd.DataFrame(
            {"event_id": pdf["event_id"], "zscore": np.floor(z * 1e4 + 0.5) / 1e4}
        )

    t = load(spark, sf_dir)
    return (
        t.events.select("event_id", "event_type", "value")
        .groupBy("event_type")
        .applyInPandas(_norm, "event_id long, zscore double")
    )


@query(
    "k_udtf",
    oracle="""
    SELECT p_partkey, t.word, CAST(t.pos AS INTEGER) AS pos
    FROM (SELECT p_partkey, string_split(p_type, ' ') AS words FROM part WHERE p_partkey < 100),
         LATERAL (SELECT unnest(words) AS word, generate_subscripts(words, 1) AS pos) t
    """,
)
def k_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF: one row fans out to N typed rows (the packet-line →
    N entity rows shape). Lateral-joined against the part table."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word: string, pos: int")
    class SplitWords:
        def eval(self, text: str):
            for i, w in enumerate(text.split(" ")):
                yield w, i + 1

    spark.udtf.register("split_words", SplitWords)
    t = load(spark, sf_dir)
    t.part.where(F.col("p_partkey") < 100).createOrReplaceTempView("_udtf_part")
    return spark.sql(
        "SELECT p_partkey, s.word, s.pos FROM _udtf_part, "
        "LATERAL split_words(p_type) s"
    )


@query(
    "k_sql_udf",
    oracle="""
    SELECT n_nationkey,
           FLOOR((2 * 6371.0 * asin(sqrt(
               sin(radians(48.85 - (n_nationkey * 3 - 36)) / 2)
             * sin(radians(48.85 - (n_nationkey * 3 - 36)) / 2)
             + cos(radians(n_nationkey * 3 - 36)) * cos(radians(48.85))
             * sin(radians(2.35 - (n_nationkey * 7 - 84)) / 2)
             * sin(radians(2.35 - (n_nationkey * 7 - 84)) / 2)))) * 10000 + 0.5) / 10000
             AS dist_km
    FROM nation
    """,
)
def k_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-registered python UDF callable from spark.sql — the row-at-a-
    time slow path, registered once as `haversine_py` (the expression
    form in operators/geo.py is the fast path)."""
    import math

    def hav(lat1: float, lon1: float, lat2: float, lon2: float) -> float:
        dlat = math.radians(lat2 - lat1)
        dlon = math.radians(lon2 - lon1)
        a = (
            math.sin(dlat / 2) ** 2
            + math.cos(math.radians(lat1)) * math.cos(math.radians(lat2)) * math.sin(dlon / 2) ** 2
        )
        d = 2 * 6371.0 * math.asin(math.sqrt(a))
        return math.floor(d * 1e4 + 0.5) / 1e4

    spark.udf.register("haversine_py", hav, "double")
    t = load(spark, sf_dir)
    t.nation.createOrReplaceTempView("_udf_nation")
    # SQL float literals parse as DECIMAL and reach the python UDF as
    # decimal.Decimal — cast to DOUBLE explicitly
    return spark.sql(
        "SELECT n_nationkey, haversine_py(CAST(n_nationkey * 3 - 36 AS DOUBLE), "
        "CAST(n_nationkey * 7 - 84 AS DOUBLE), CAST(48.85 AS DOUBLE), "
        "CAST(2.35 AS DOUBLE)) AS dist_km FROM _udf_nation"
    )


@query(
    "k_arrow_udf",
    oracle="""
    SELECT o_orderkey,
           upper(o_orderpriority) || '#' || CAST(o_orderkey % 7 AS VARCHAR)
             AS tag
    FROM orders WHERE o_orderkey % 100 = 0
    """,
)
def k_arrow_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-OPTIMIZED Python UDF (`useArrow=True`, Spark 3.5+): the
    row-at-a-time Python signature with Arrow-batched transport —
    Spark pickles nothing, columns cross as Arrow buffers, and the plan
    shows ArrowEvalPython instead of BatchEvalPython. The missing
    middle of the §2.K ladder: same authoring model as the legacy
    Python UDF (k_sql_udf), ~an order of magnitude less serialization
    overhead, still slower than the fully vectorized pandas_udf
    (k_pandas_scalar). String ops only — no float portability
    concerns."""

    @F.udf("string", useArrow=True)
    def _tag(prio: str, key: int) -> str:
        return f"{prio.upper()}#{key % 7}"

    t = load(spark, sf_dir)
    return t.orders.where(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey", _tag(F.col("o_orderpriority"), F.col("o_orderkey")).alias("tag")
    )


@query(
    "k_pandas_iter",
    oracle="""
    SELECT event_id, value,
           FLOOR((value * 0.01 + 7.5) * 1000000 + 0.5) / 1000000 AS calibrated
    FROM events WHERE event_type = 'error'
    """,
)
def k_pandas_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ITERATOR-form pandas UDF (Iterator[Series] -> Iterator[Series]):
    the §2.K surface for per-worker one-time initialization — the
    expensive setup (a model handle, a codec table; here a stand-in
    calibration constant) happens ONCE per python worker, outside the
    batch loop, instead of per batch as a scalar pandas UDF would. The
    shape every model-scoring stage at 100 TB uses: amortize load time
    across all Arrow batches a worker sees."""
    @pandas_udf("double")
    def _calibrate(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        scale, offset = 0.01, 7.5  # loaded once per worker
        for batch in batches:
            yield batch * scale + offset

    from ..functions import rnd

    t = load(spark, sf_dir)
    return t.events.where(F.col("event_type") == "error").select(
        "event_id",
        "value",
        rnd(_calibrate(F.col("value")), 6).alias("calibrated"),
    )


@query(
    "k_map_in_arrow",
    oracle="""
    SELECT vec_id,
           FLOOR(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                       CAST(embedding AS DOUBLE[])))
                 * 1000000 + 0.5) / 1000000 AS l2_norm,
           CAST(len(embedding) AS INT) AS dim
    FROM embeddings
    """,
)
def k_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow (Spark 3.5+): per-partition RecordBatch processing on
    RAW Arrow buffers — no pandas conversion at all, the leanest
    Python boundary Spark offers (the multimodal kernels use the
    pandas flavor for its struct ergonomics; this qid pins the Arrow
    one). Computes each embedding's L2 norm with numpy over the
    zero-copy Arrow values buffer; the squared terms accumulate with a
    strict LEFT FOLD (np.add.accumulate — the dot_expr/list_dot_product
    IEEE order), and np.sqrt is correctly-rounded IEEE, so the result
    is bit-identical to the oracle's sqrt(list_dot_product(v, v))."""
    import pyarrow as pa

    def batches(it):
        import numpy as np

        for batch in it:
            ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
            emb = batch.column("embedding")
            # ListArray -> (n, dim) float64. flatten() is SLICE-AWARE:
            # unlike .values (the full child buffer), it honors the
            # array's offset, so a sliced RecordBatch cannot silently
            # misalign rows (r7 ADVICE). offsets[0] is nonzero on a
            # slice — rebase dims from consecutive diffs, which are
            # slice-invariant. (embedding is non-nullable here; a null
            # list entry would shift flatten()'s packing.)
            flat = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
            offs = emb.offsets.to_numpy(zero_copy_only=False)
            dims = (offs[1:] - offs[:-1]).astype(np.int32)
            n, d = len(ids), int(dims[0]) if len(dims) else 0
            v = flat.reshape(n, d) if n and (dims == d).all() else flat.reshape(n, -1)
            sq = v * v
            dots = np.add.accumulate(sq, axis=1)[:, -1] if d else np.zeros(n)
            norm = np.floor(np.sqrt(dots) * 1e6 + 0.5) / 1e6
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, type=pa.int64()),
                    pa.array(norm, type=pa.float64()),
                    pa.array(dims, type=pa.int32()),
                ],
                names=["vec_id", "l2_norm", "dim"],
            )

    t = load(spark, sf_dir)
    return t.embeddings.select("vec_id", "embedding").mapInArrow(
        batches, "vec_id long, l2_norm double, dim int"
    )


@query(
    "k_udtf_table",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
             AS sum_s,
           CAST(MIN(event_id) AS BIGINT) AS first_id
    FROM events GROUP BY event_type
    """,
)
def k_udtf_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF with a TABLE argument + PARTITION BY (Spark 4.0,
    SPARK-44503): the engine shuffles the input on the partition key
    and feeds each group to ONE UDTF instance (eval per row, terminate
    per group) — the table-function form of a custom aggregate, the
    surface to reach for when per-group logic needs real Python state
    (parsers, model objects) but applyInPandas' whole-group-in-memory
    materialization is unwanted: eval() streams rows. State here is
    three scalars per group, oracle = the plain GROUP BY; the scaled
    sum is exact BIGINT arithmetic in Python (unbounded ints), so
    parity holds at any accumulation order.

    Declined A/B (r17, guide §4): ``useArrow=True`` on this UDTF was
    measured 12.8-17.4 s vs 2.8-3.8 s for the default pickle path at
    sf0.1 (3 alternating warm runs, value parity confirmed) — Arrow
    only changes SERIALIZATION for UDTFs while eval stays per-row, and
    the per-batch Arrow->Row rehydration costs far more than pickle
    here. The per-row eval dispatch is the surface this qid exists to
    demonstrate; batching it away (mapInArrow) would demonstrate a
    different operator."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="event_type string, n bigint, sum_s bigint, first_id bigint")
    class GroupStats:
        def __init__(self) -> None:
            self.key = None
            self.n = 0
            self.sum_s = 0
            self.first_id = None

        def eval(self, row):
            self.key = row["event_type"]
            self.n += 1
            self.sum_s += int(row["v_s"])
            eid = int(row["event_id"])
            self.first_id = eid if self.first_id is None else min(self.first_id, eid)

        def terminate(self):
            if self.n:
                yield self.key, self.n, self.sum_s, self.first_id

    spark.udtf.register("group_stats_udtf", GroupStats)
    t = load(spark, sf_dir)
    t.events.select(
        "event_type",
        "event_id",
        F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("long").alias("v_s"),
    ).createOrReplaceTempView("_udtf_events")
    return spark.sql(
        "SELECT * FROM group_stats_udtf(TABLE(SELECT * FROM _udtf_events) "
        "PARTITION BY event_type)"
    )


@query(
    "k_udtf_analyze",
    oracle="""
    SELECT doc_id,
           split_part(text, ' ', 1) AS tok1,
           split_part(text, ' ', 2) AS tok2,
           split_part(text, ' ', 3) AS tok3
    FROM documents
    """,
)
def k_udtf_analyze(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF (Spark 4.0 analyze(): the output schema
    is computed at plan time from the LITERAL argument — here the
    requested column count — instead of being fixed at registration).
    This is the Spark-4 answer to variadic table functions (CSV
    splitters, pivoting parsers) that previously needed one registered
    UDTF per arity. Lateral-applied per document; the oracle mirrors
    with split_part columns. Empty-position semantics pinned: both
    engines return '' for a missing token (documents always have ≥3
    tokens here, making the comparison exact regardless)."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import IntegerType, StringType, StructField, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class FirstTokens:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            return AnalyzeResult(
                schema=StructType(
                    [StructField(f"tok{i + 1}", StringType()) for i in range(int(n.value))]
                )
            )

        def eval(self, text: str, n: int):
            parts = text.split(" ")
            yield tuple(parts[i] if i < len(parts) else "" for i in range(n))

    spark.udtf.register("first_tokens", udtf(FirstTokens))
    t = load(spark, sf_dir)
    t.documents.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, f.* FROM _udtf_docs d, LATERAL first_tokens(d.text, 3) f"
    )


@query(
    "k_apply_in_arrow",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
             AS sum_s6,
           CAST(MIN(event_id) AS BIGINT) AS min_id,
           CAST(MAX(event_id) AS BIGINT) AS max_id
    FROM events GROUP BY event_type
    """,
)
def k_apply_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInArrow (Spark 4.0, SPARK-40307): whole groups
    stream into the Python worker as RAW Arrow tables — the grouped
    sibling of k_map_in_arrow, skipping pandas conversion entirely
    (no index materialization, no object boxing; the right boundary
    when the kernel is numpy over columnar buffers). Per event_type
    the kernel emits exact stats: the value sum is floored PER ELEMENT
    to a 1e-6 BIGINT grid and summed in int64 — order-independent by
    construction, so the Python-side arithmetic needs no float-parity
    argument at all (the j_pq_distortion discipline).

    Scale note: applyInArrow materializes EACH GROUP in one worker
    (documented Spark constraint) — correct here because groups are
    |event_type| slices of bounded stats state; an unbounded-group
    variant belongs in mapInArrow with partial aggregation like
    j_pq_distortion's."""
    import pyarrow as pa

    def _stats(tbl: pa.Table) -> pa.Table:
        import numpy as np

        et = tbl.column("event_type")[0].as_py()
        v = tbl.column("value").to_numpy(zero_copy_only=False)
        ids = tbl.column("event_id").to_numpy(zero_copy_only=False)
        s6 = int(np.floor(v * 1e6 + 0.5).astype(np.int64).sum())
        return pa.table(
            {
                "event_type": [et],
                "n": [len(v)],
                "sum_s6": [s6],
                "min_id": [int(ids.min())],
                "max_id": [int(ids.max())],
            }
        )

    t = load(spark, sf_dir)
    return (
        t.events.select("event_id", "event_type", "value")
        .groupBy("event_type")
        .applyInArrow(
            _stats, "event_type string, n long, sum_s6 long, min_id long, max_id long"
        )
    )


_COGROUP_CUT = 1000


@query(
    "k_cogrouped_pandas",
    oracle=f"""
    WITH o AS (SELECT o_orderkey, o_custkey,
                      CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS total_c
               FROM orders WHERE o_orderkey < {_COGROUP_CUT}),
    l AS (SELECT l_orderkey,
                 CAST(COUNT(*) AS BIGINT) AS n_lines,
                 CAST(SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT))
                      AS BIGINT) AS qty_c,
                 CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
                      AS BIGINT) AS ext_c
          FROM lineitem WHERE l_orderkey < {_COGROUP_CUT} GROUP BY l_orderkey)
    SELECT o.o_orderkey, o.o_custkey,
           COALESCE(l.n_lines, 0) AS n_lines,
           COALESCE(l.qty_c, 0) AS qty_cents,
           COALESCE(l.ext_c, 0) AS ext_cents,
           o.total_c AS total_cents,
           COALESCE(l.ext_c, 0) - o.total_c AS recon_diff_cents
    FROM o LEFT JOIN l ON l.l_orderkey = o.o_orderkey
    """,
)
def k_cogrouped_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped-map applyInPandas — the §2.K surface where TWO grouped
    relations stream into one python function per key
    (df1.groupBy(k).cogroup(df2.groupBy(k)).applyInPandas): each
    orderkey's orders row and its lineitem block arrive together as
    pandas frames and the function emits an order-level reconciliation
    row (line count, exact-cents quantity/extended-price masses, and
    the diff against the order header's total) — the header-vs-detail
    audit shape that genuinely needs BOTH sides of a key in one place
    and is awkward as a join when the per-key logic grows imperative.

    Determinism: all money floors to cents PER ROW before integer
    summation (the repo's exact-cents rule), so the pandas sums are
    order-free BIGINTs matching the SQL twin; orders without lines
    emit zero masses (cogroup delivers left-only keys with an empty
    right frame — pinned here by the LEFT JOIN oracle).

    Plan: both sides hash-partition on the key (two Exchanges — the
    cogroup contract), then ONE python stage; Arrow moves whole
    groups. MEASURED COST MODEL (r11, sf0.1): the per-KEY python
    dispatch is ~4 ms regardless of group size or function leanness
    (2000 keys ≈ 8 s, 1000 ≈ 3.5 s, 500 ≈ 2.7 s) — which is the real
    production guidance for this surface: cogroup pays per key, so it
    is for COMPLEX per-key logic over few-but-fat keys, never a cheap
    aggregate over many keys (that is a join+agg). The
    o_orderkey < {cut} cut keeps the demo honest at bench scale; at
    100 TB the same two-shuffle co-partitioned shape holds and the
    header side would be bucketed."""
    import numpy as np

    def _recon(key, odf: pd.DataFrame, ldf: pd.DataFrame) -> pd.DataFrame:
        q = ldf["l_quantity"].to_numpy()
        e = ldf["l_extendedprice"].to_numpy()
        qty_c = int(np.floor(q * 100 + 0.5).sum())
        ext_c = int(np.floor(e * 100 + 0.5).sum())
        total_c = np.floor(odf["o_totalprice"].to_numpy() * 100 + 0.5).astype(
            "int64"
        )
        n = len(odf)
        return pd.DataFrame(
            {
                "o_orderkey": np.full(n, key[0], dtype="int64"),
                "o_custkey": odf["o_custkey"].to_numpy().astype("int64"),
                "n_lines": np.full(n, len(ldf), dtype="int64"),
                "qty_cents": np.full(n, qty_c, dtype="int64"),
                "ext_cents": np.full(n, ext_c, dtype="int64"),
                "total_cents": total_c,
                "recon_diff_cents": ext_c - total_c,
            }
        )

    t = load(spark, sf_dir)
    o = t.orders.where(F.col("o_orderkey") < _COGROUP_CUT).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    li = t.lineitem.where(F.col("l_orderkey") < _COGROUP_CUT).select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    return (
        o.groupBy("o_orderkey")
        .cogroup(li.groupBy("l_orderkey"))
        .applyInPandas(
            _recon,
            "o_orderkey long, o_custkey long, n_lines long, qty_cents long, "
            "ext_cents long, total_cents long, recon_diff_cents long",
        )
    )


k_cogrouped_pandas.__doc__ = k_cogrouped_pandas.__doc__.replace(
    "{cut}", str(_COGROUP_CUT)
)
