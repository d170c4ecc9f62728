"""Property pins for the r16 additions — cross-column identities the
oracle compare cannot see (it proves Spark == DuckDB, not that either
is sensible). Same contract as test_r15_props: every family pins
non-emptiness plus at least one structural invariant per qid, at
sf0.001 AND the suite SF, so a vacuous empty-vs-empty oracle pass
(the j_good_turing lesson) cannot recur.
"""

from __future__ import annotations

import os

import pytest

from aprsdb_spark.registry import QUERIES, load_all
from tests.conftest import SF_DIR

load_all()

SF1 = os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.001")


def _rows(spark, qid, sf=SF1):
    out = QUERIES[qid](spark, sf).collect()
    assert out, f"{qid} returned an empty relation at {sf}"
    return out


def test_csv_permissive_quarantines_but_never_drops(spark):
    for sf in (SF1, SF_DIR):
        rows = {r["category"]: r for r in _rows(spark, "a_scan_csv_permissive", sf)}
        assert "clean" in rows and "bad_number" in rows and "short_row" in rows
        # the malformed-input contract: every dirty row is COUNTED and
        # FLAGGED (not dropped), every clean row is neither
        for cat, r in rows.items():
            if cat == "clean":
                assert r["n_corrupt"] == 0 and r["n_price_null"] == 0
                assert r["corrupt_check"] is None
            else:
                assert r["n_corrupt"] == r["n_rows"] > 0
                assert r["corrupt_check"] is not None
        # field-level semantics: price nulls exactly on the two classes
        # that lose the token; extra_field still parses fully
        assert rows["bad_number"]["n_price_null"] == rows["bad_number"]["n_rows"]
        assert rows["short_row"]["n_price_null"] == rows["short_row"]["n_rows"]
        if "extra_field" in rows:
            assert rows["extra_field"]["n_price_null"] == 0
            assert rows["extra_field"]["sum_price"] is not None
        # short rows lose prio too (no prio hash), bad_number keeps it
        assert rows["short_row"]["prio_check"] is None
        assert rows["bad_number"]["prio_check"] is not None


def test_json_permissive_three_way_split_semantics(spark):
    for sf in (SF1, SF_DIR):
        rows = {r["category"]: r for r in _rows(spark, "a_scan_json_permissive", sf)}
        assert "clean" in rows and "unparseable" in rows
        assert rows["clean"]["n_corrupt"] == 0
        assert rows["clean"]["n_chars_null"] == 0
        # unparseable: NOTHING parses, but the raw fragment is captured
        u = rows["unparseable"]
        assert u["n_corrupt"] == u["n_rows"] > 0
        assert u["lang_check"] is None and u["text_check"] is None
        assert u["corrupt_prefix_check"] is not None
        # type_error (when the scale has one): partial parse keeps
        # everything except the mistyped field
        if "type_error" in rows:
            te = rows["type_error"]
            assert te["n_corrupt"] == te["n_rows"] > 0
            assert te["n_chars_null"] == te["n_rows"]
            assert te["text_check"] is not None and te["lang_check"] is not None
