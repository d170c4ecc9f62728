"""tables.table() contract: self-healing session confs and loud failure
on events.ts encodings that cannot be safely normalized to epoch-ms."""

from __future__ import annotations

import pytest

from aprsdb_spark.tables import TABLE_NAMES, load, table


def test_unknown_table_raises_keyerror(spark):
    with pytest.raises(KeyError):
        table(spark, "/root/testdata/sf0.001", "nonexistent")


def test_unsupported_events_ts_encoding_raises(spark, tmp_path):
    # An int32 ts cannot hold epoch nanoseconds (max ~2.1s past epoch);
    # strings need parsing rules. Both must fail loudly, not cast.
    sf = str(tmp_path / "badsf")
    spark.createDataFrame(
        [("2024-01-01T00:00:00Z", "A")], "ts string, src string"
    ).write.parquet(f"{sf}/events.parquet")
    with pytest.raises(TypeError, match="unsupported events.ts encoding"):
        table(spark, sf, "events")


def test_int32_events_ts_encoding_raises(spark, tmp_path):
    sf = str(tmp_path / "badsf32")
    spark.createDataFrame([(1, "A")], "ts int, src string").write.parquet(
        f"{sf}/events.parquet"
    )
    with pytest.raises(TypeError, match="unsupported events.ts encoding"):
        table(spark, sf, "events")


def test_direct_table_call_pins_utc(spark):
    # table() is a public entry point; correctness of the NTZ cast must
    # not depend on the caller routing through load(). Simulate a driver
    # session left on a non-UTC zone.
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        table(spark, "/root/testdata/sf0.001", "events")
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def test_events_ts_ms_present_for_all_shipped_encodings(spark):
    df = table(spark, "/root/testdata/sf0.001", "events")
    assert "ts_ms" in df.columns
    row = df.selectExpr("min(ts_ms) as lo", "max(ts_ms) as hi").first()
    # epoch-ms sanity: 2000-01-01 .. 2100-01-01
    assert 946_684_800_000 < row.lo <= row.hi < 4_102_444_800_000


def test_lazy_namespace_covers_all_tables(spark):
    t = load(spark, "/root/testdata/sf0.001")
    for name in TABLE_NAMES:
        assert getattr(t, name).columns
    with pytest.raises(AttributeError):
        t.nonexistent
