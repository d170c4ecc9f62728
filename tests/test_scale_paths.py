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
