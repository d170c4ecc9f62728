"""Scale-path demonstrations: the plans/equivalences that make the
100 TB story concrete — bucketed zero-shuffle joins, salted hot-key
aggregation, AQE behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aprsdb_spark.tables import load

SF = "/root/testdata/sf0.01"


def test_bucketed_join_elides_shuffle(spark, tmp_path):
    """Write lineitem+orders bucketed by the join key -> the SMJ has no
    Exchange: this is how the 100 TB fact-fact join avoids shuffling
    petabytes (co-located buckets, sort-merge in place)."""
    t = load(spark, SF)
    wh = str(tmp_path / "wh")
    # warehouse.dir is a static conf — point the database at tmp instead
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bdemo LOCATION '{wh}'")
    t.lineitem.select("l_orderkey", "l_extendedprice").write.bucketBy(
        8, "l_orderkey"
    ).sortBy("l_orderkey").mode("overwrite").saveAsTable("bdemo.li_b")
    t.orders.select("o_orderkey", "o_orderpriority").write.bucketBy(
        8, "o_orderkey"
    ).sortBy("o_orderkey").mode("overwrite").saveAsTable("bdemo.ord_b")

    li = spark.table("bdemo.li_b")
    od = spark.table("bdemo.ord_b")
    joined = li.hint("merge").join(od, li.l_orderkey == od.o_orderkey)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan[:2000]}"
    # and it computes the same thing as the plain join
    plain = t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey")).count()
    assert joined.count() == plain


def test_salted_agg_matches_direct(spark):
    """Salted two-phase aggregate == direct groupBy (hot-key safe form)."""
    from aprsdb_spark.operators.skew import salted_sum_count

    t = load(spark, SF)
    direct = {
        r.event_type: (r.s, r.c)
        for r in t.events.groupBy("event_type")
        .agg(F.sum("value").alias("s"), F.count("*").alias("c"))
        .collect()
    }
    salted = {
        r.event_type: (r.sum_value, r.n_rows)
        for r in salted_sum_count(
            t.events, "event_type", "value", uniquifier="event_id"
        ).collect()
    }
    assert direct.keys() == salted.keys()
    for k in direct:
        assert direct[k][1] == salted[k][1]
        assert abs(direct[k][0] - salted[k][0]) < 1e-6 * abs(direct[k][0])


def test_salted_topk_matches_direct(spark):
    """Salted per-key top-k == window top-k."""
    from pyspark.sql import Window

    from aprsdb_spark.operators.skew import salted_topk

    t = load(spark, SF)
    order = [F.col("value").desc(), F.col("event_id").asc()]
    w = Window.partitionBy("user_id").orderBy(*order)
    direct = (
        t.events.withColumn("rk", F.row_number().over(w))
        .where("rk <= 5")
        .select("user_id", "event_id", "rk")
    )
    salted = salted_topk(
        t.events,
        key="user_id",
        order=order,
        select=["user_id", "event_id"],
        k=5,
        uniquifier="event_id",
    )
    assert direct.subtract(salted).count() == 0
    assert salted.subtract(direct).count() == 0


def test_aqe_coalesces_small_shuffle(spark):
    """AQE shrinks the static shuffle partition count for small data —
    the knob that keeps sf0.01 tests fast AND 100 TB runs sized by
    actual bytes, with the same code."""
    t = load(spark, SF)
    df = t.events.groupBy("user_id").count()
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "AQEShuffleRead" in plan or "coalesced" in plan.lower()


def test_date_partitioned_layout_prunes(spark, tmp_path):
    """The 100 TB event-table layout: date-partitioned parquet; a 1-day
    predicate shows up as PartitionFilters (directory pruning before IO),
    and the partition column never reaches the data files."""
    from aprsdb_spark.plans.inspect import formatted_plan, partition_filters
    from aprsdb_spark.sources.layout import read_partitioned, write_partitioned

    t = load(spark, SF)
    out = str(tmp_path / "events_by_date")
    write_partitioned(t.events, out, ts_ms_col="ts_ms", entity_col="user_id")

    back = read_partitioned(spark, out)
    one_day = back.where(F.col("p_date") == "2024-01-05")
    pf = partition_filters(one_day)
    assert pf and any("p_date" in f for f in pf), formatted_plan(one_day)[:1500]
    # pruning is real: only that day's rows come back, and the full
    # round-trip preserves every row
    import datetime
    rows = one_day.select("event_id").count()
    expect = t.events.where(
        F.to_date(F.timestamp_millis(F.col("ts_ms"))) == "2024-01-05"
    ).count()
    assert rows == expect > 0
    assert back.count() == t.events.count()


def test_exchange_counting(spark):
    """plans.inspect.count_exchanges: broadcast star join costs zero
    fact-side shuffles besides the agg; the asof lowering costs one."""
    from aprsdb_spark.plans.inspect import count_exchanges
    from aprsdb_spark.registry import QUERIES, load_all

    load_all()
    bcast = QUERIES["c_join_bcast"](spark, SF)
    # broadcast exchanges are not shuffles; count real Exchange hashpartitioning
    from aprsdb_spark.plans.inspect import formatted_plan

    p = formatted_plan(bcast)
    assert p.count("Exchange hashpartitioning") <= 1  # just the groupBy


def test_ann_bucket_layout_prunes(spark, tmp_path):
    """The 100 TB ANN layout behind j_ann_lsh: embeddings written
    partitioned by the hyperplane-sketch bucket; a multi-probe query
    shows up as PartitionFilters (directory pruning — only ~probe/256
    of the corpus is read) and returns exactly the probed rows."""
    from aprsdb_spark.operators.similarity import hyperplane_sketch, lsh_probe_buckets
    from aprsdb_spark.plans.inspect import formatted_plan, partition_filters

    emb = load(spark, SF).embeddings
    tagged = emb.withColumn("bucket", hyperplane_sketch("embedding", n_planes=8, dim=64))
    out = str(tmp_path / "emb_by_bucket")
    tagged.write.partitionBy("bucket").parquet(out)

    back = spark.read.parquet(out)
    qbucket = int(back.where(F.col("vec_id") == 0).select("bucket").head().bucket)
    probe = lsh_probe_buckets(qbucket, 8, 2)
    probed = back.where(F.col("bucket").isin(probe))
    pf = partition_filters(probed)
    assert pf and any("bucket" in f for f in pf), formatted_plan(probed)[:1500]
    assert probed.count() == tagged.where(F.col("bucket").isin(probe)).count() > 0


def test_ivf_index_layout_prunes(spark, tmp_path):
    """The stored-IVF layout behind j_ann_ivf at 100 TB: assignments
    written partitioned by cluster_id; an nprobe query shows up as
    PartitionFilters and reads only the probed clusters."""
    from aprsdb_spark.operators.similarity import ivf_assign
    from aprsdb_spark.plans.inspect import formatted_plan, partition_filters

    emb = load(spark, SF).embeddings
    assigned, cents = ivf_assign(emb, k_clusters=8)
    out = str(tmp_path / "emb_by_cluster")
    assigned.write.partitionBy("cluster_id").parquet(out)

    back = spark.read.parquet(out)
    probe = [cid for cid, _ in cents[:2]]
    probed = back.where(F.col("cluster_id").isin(probe))
    pf = partition_filters(probed)
    assert pf and any("cluster_id" in f for f in pf), formatted_plan(probed)[:1500]
    assert probed.count() == assigned.where(F.col("cluster_id").isin(probe)).count() > 0


def test_lm_buckets_approx_swap(spark):
    """The j_lm_buckets docstring's 100 TB claim, executed: swapping the
    exact percentile for approx_percentile (mergeable t-digest) changes
    ONLY the cutpoint sketch — no window appears, the cutpoints stay a
    broadcast 1-row aggregate, and every document still lands in exactly
    one tercile bucket."""
    from aprsdb_spark.plans.inspect import formatted_plan
    from aprsdb_spark.queries.quality import lm_buckets

    approx = lm_buckets(spark, SF, approx=True)
    plan = formatted_plan(approx)
    assert "Window" not in plan, plan[:1500]  # ntile would move all rows
    assert "approx_percentile" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan

    n_docs = load(spark, SF).documents.count()
    rows = approx.collect()
    assert len(rows) == n_docs
    assert {r.bucket for r in rows} <= {"head", "middle", "tail"}
    # the sketch is accurate at this SF: buckets are roughly terciles
    from collections import Counter

    counts = Counter(r.bucket for r in rows)
    assert all(c > n_docs // 5 for c in counts.values()), counts


def test_banded_lsh_recall_floor(spark):
    """The recall of the banded LSH path vs the exact tau=0.3 truth is
    MEASURED (j_lsh_recall_banded) but nothing else bounds it —
    parameter drift (halving the plane/band count, a sign-matrix typo)
    would silently degrade the production dedup path while every oracle
    stays green (parity, not quality). Pin the floor: r=4/b=8 measures
    0.70-0.73 across sf0.001/0.01/0.1; 0.6 leaves honest headroom
    without tolerating a construction regression. Also pin that the
    single-band measurement stays registered BELOW the banded one —
    the pair documents the tradeoff."""
    from aprsdb_spark.registry import QUERIES, load_all

    load_all()
    row = QUERIES["j_lsh_recall_banded"](spark, SF).collect()[0]
    assert row.recall >= 0.6, f"banded LSH recall regressed: {row}"
    assert row.n_exact > 0 and row.tp > 0
    single = QUERIES["j_lsh_recall"](spark, SF).collect()[0]
    assert single.recall <= row.recall, (single, row)


def test_banded_lsh_plan_shape(spark):
    """The banded pair generation must stay bucket-grouped: one narrow
    posexplode (Generate), ONE exchange on the (band, key) group key,
    Arrow-batched per-bucket scoring (FlatMapGroupsInPandas — NOT a
    row-at-a-time BatchEvalPython, and NOT a cartesian/nested-loop
    join materializing every candidate pair as JVM rows)."""
    from aprsdb_spark.plans.inspect import formatted_plan
    from aprsdb_spark.registry import QUERIES, load_all

    load_all()
    plan = formatted_plan(QUERIES["j_sim_pairs_banded"](spark, SF))
    assert "CartesianProduct" not in plan, plan[:1500]
    assert "BroadcastNestedLoopJoin" not in plan, plan[:1500]
    assert "Generate" in plan  # the posexplode
    assert "FlatMapGroupsInPandas" in plan, "per-bucket Arrow scoring lost"
    assert "BatchEvalPython" not in plan, "row-at-a-time python crept in"


def test_ann_ivf_recall_floor(spark):
    """Same discipline as the banded-LSH floor, for the second
    approximate path: j_ann_recall measures IVF recall@5 vs the exact
    batch kNN (0.82-0.92 across the three scales with the trained
    16-centroid / nprobe=4 quantizer); 0.6 is the drift alarm — halve
    nprobe or break the k-means and this fails before any oracle
    does (oracles check parity, not quality)."""
    from aprsdb_spark.registry import QUERIES, load_all

    load_all()
    row = QUERIES["j_ann_recall"](spark, SF).collect()[0]
    assert row.n_exact > 0 and row.recall >= 0.6, f"IVF recall regressed: {row}"


def test_gemm_pairs_blocking_and_split_invariance(spark):
    """The all-pairs kernel must produce the EXACT same pair set and
    bit-identical scores regardless of how it is tiled or salted — that
    is what makes its scale knobs safe to turn at 100 TB:

    - blk: pair memory is one (blk, blk, dim) tile; a hot bucket far
      bigger than blk (here m=700 vs blk=16 -> 44x44 tile grid, both
      diagonal and off-diagonal tiles) must not change a single bit.
    - n_splits: a hot bucket's O(m²) compute is spread over S(S+1)/2
      co-grouped tasks; every unordered pair must land in exactly one
      (sa, sb) group — no dupes, no drops.

    Ground truth is a driver-side strict left fold (seq_dot) with the
    same 1e-6 floor — the oracle arithmetic — compared EXACTLY (==),
    not approximately."""
    import math

    from aprsdb_spark.operators.similarity import _gemm_pairs, seq_dot

    dim, m = 8, 700
    rows = []
    for i in range(m):
        raw = [math.sin(1.0 + 7.0 * i + 3.0 * j) for j in range(dim)]
        n = math.sqrt(sum(x * x for x in raw))
        vec = [x / n for x in raw]
        rows.append((i * 13 + 5, vec, i % 2, 0))  # two buckets, ids not 0..m
    df = spark.createDataFrame(
        rows, "vec_id long, v array<double>, band int, key int"
    )
    tau = 0.5

    expected = set()
    for a in range(m):
        for b in range(a + 1, m):
            if rows[a][2] != rows[b][2]:
                continue
            s = math.floor(seq_dot(rows[a][1], rows[b][1]) * 1e6 + 0.5) / 1e6
            if s >= tau:
                ia, ib = rows[a][0], rows[b][0]
                expected.add((min(ia, ib), max(ia, ib), s))
    assert len(expected) > 50, "fixture too sparse to exercise the kernel"

    def run(**kw):
        out = _gemm_pairs(df, ["band", "key"], "band", tau, 8, **kw)
        return {(r.id_a, r.id_b, r.score) for r in out.collect()}

    assert run() == expected                      # default 256 blocking
    assert run(blk=16) == expected                # 44x44 tile grid
    assert run(blk=16, n_splits=3) == expected    # salted hot bucket
    assert run(n_splits=4) == expected            # salt alone


def test_pq_recall_floor(spark):
    """PQ ADC shortlist + exact re-rank must keep recall@10 >= 0.6
    (measured 1.0 / 1.0 / 0.8 at sf0.001/0.01/0.1) — codebook or
    shortlist drift fails loudly, the same self-evaluation discipline
    as the banded-LSH and IVF recall floors."""
    from aprsdb_spark.registry import QUERIES, load_all

    load_all()
    row = QUERIES["j_ann_pq_recall"](spark, SF).collect()[0]
    assert row.n_exact == 10 and row.recall >= 0.6, f"PQ recall regressed: {row}"


def test_registered_banded_plan_split_invariance(spark, monkeypatch):
    """End-to-end skew-split proof on the REGISTERED qid, not just the
    kernel helper: j_sim_pairs_banded with SPARK_GRAFT_BANDED_SPLITS=3
    (every (band, key) bucket salted into 6 co-grouped split-pair
    tasks) must return the bit-identical relation to the unsalted run —
    same pairs, same lowest-collision band, same scores. This is the
    recipe SCALE.md §4n prescribes for hot buckets at 100 TB, executed
    through the full plan: posexplode -> split replication ->
    applyInPandas -> pair-dedup agg."""
    from aprsdb_spark.registry import QUERIES, load_all

    load_all()
    monkeypatch.delenv("SPARK_GRAFT_BANDED_SPLITS", raising=False)
    base = {tuple(r) for r in QUERIES["j_sim_pairs_banded"](spark, SF).collect()}
    monkeypatch.setenv("SPARK_GRAFT_BANDED_SPLITS", "3")
    salted = {tuple(r) for r in QUERIES["j_sim_pairs_banded"](spark, SF).collect()}
    assert len(base) > 100, "fixture too sparse to exercise the banded path"
    assert salted == base


def test_chargram_upgrade_beats_word_model(spark):
    """The registry's evaluation loop, closing on itself: the
    char-trigram lang-ID (j_chargram_confusion — the upgrade
    j_lang_confusion's docstring prescribes for conflated language
    pairs) must score STRICTLY higher diagonal accuracy than the
    word-unigram model on the same labels, with an absolute floor.
    Measured at review time: 0.552 (trigram) vs 0.364 (word) at
    sf0.01 — if either drops below its bound, a scoring or profile
    regression slipped in."""
    from aprsdb_spark.registry import QUERIES, load_all

    load_all()

    def acc(qid):
        rows = QUERIES[qid](spark, SF).collect()
        tot = sum(r.n_docs for r in rows)
        diag = sum(r.n_docs for r in rows if r.true_lang == r.pred_lang)
        return diag / tot

    word, tri = acc("j_lang_confusion"), acc("j_chargram_confusion")
    assert tri > word, f"char-trigram ({tri:.3f}) no longer beats word ({word:.3f})"
    assert tri >= 0.45, f"char-trigram accuracy collapsed: {tri:.3f}"
