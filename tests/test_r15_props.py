"""Property pins for the r15 additions — cross-column identities the
oracle compare cannot see (it proves Spark == DuckDB, not that either
is sensible). Same contract as test_r14_props: every family pins
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


def test_quantile_sketch_curve_is_a_real_curve(spark):
    for sf in (SF1, SF_DIR):
        rows = {r["lvl"]: r for r in _rows(spark, "j_quantile_sketch_curve", sf)}
        assert sorted(rows) == [1, 2, 3], sorted(rows)
        for lvl, r in rows.items():
            assert r["rate_denom"] == 1 << lvl
            assert r["n_sample"] > 0
            assert r["max_abs_err"] >= 0
            # mean over 9 deciles can never exceed the max
            assert r["mean_abs_err"] <= r["max_abs_err"] + 1e-9
        # deterministic hash thinning: each level keeps a strict subset
        assert rows[1]["n_sample"] > rows[2]["n_sample"] > rows[3]["n_sample"]


def test_kmv_jaccard_estimates_are_bounded_and_consistent(spark):
    for sf in (SF1, SF_DIR):
        rows = _rows(spark, "j_kmv_jaccard", sf)
        assert len(rows) == 15, len(rows)  # C(6,2) supplier pairs
        for r in rows:
            assert r["supp_a"] < r["supp_b"]
            assert 0.0 <= r["est_jaccard"] <= 1.0
            assert 0.0 <= r["exact_jaccard"] <= 1.0
            assert r["abs_err"] == pytest.approx(
                abs(r["est_jaccard"] - r["exact_jaccard"]), abs=2e-6
            )
            # small-range branch: a union within k IS the exact set
            if r["n_union_exact"] <= 64:
                assert r["est_jaccard"] == r["exact_jaccard"]
        # the panel must carry real signal, not saturated overlap
        assert any(0.0 < r["exact_jaccard"] < 1.0 for r in rows)
