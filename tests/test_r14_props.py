"""Property pins for the r14 additions — cross-column identities the
oracle compare cannot see (it proves Spark == DuckDB, not that either
is sensible). The j_good_turing lesson this round: an empty relation
hash-matches an empty oracle, so every family here pins non-emptiness
plus one structural invariant per qid.
"""

from __future__ import annotations

import os

import pytest

from aprsdb_spark.registry import QUERIES, load_all
from tests.conftest import SF_DIR

load_all()

# Derive the sf0.001 fixture from the same root as conftest's SF_DIR so
# a relocated fixture tree (SPARK_GRAFT_TEST_SF_DIR override) moves both
# (ADVICE r14 — the hard-coded path passed the oracle tests but failed
# every property test on a missing sibling).
SF1 = os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.001")


def _rows(spark, qid, sf=SF1):
    out = QUERIES[qid](spark, sf).collect()
    assert out, f"{qid} returned an empty relation at {sf}"
    return out


def test_good_turing_has_low_frequency_classes(spark):
    # the r14 vacuous-pass regression: trigram counts must populate the
    # low-r classes at EVERY scale, and the hapax row must exist
    for sf in (SF1, SF_DIR):
        rows = _rows(spark, "j_good_turing", sf)
        assert any(r.r == 1 for r in rows), f"no hapax class at {sf}"
        # each class mass rounds half-up at 1e-6, so the sum may
        # overshoot 1 by up to 5e-7 per row
        assert sum(r.raw_mass for r in rows) <= 1.0 + 5e-7 * len(rows)


def test_dim_truncation_full_width_is_identity(spark):
    rows = {r.dim: r for r in _rows(spark, "j_dim_truncation_curve")}
    assert rows[64].recall == 1.0, "full-width leg must reproduce exact top-k"
    for r in rows.values():
        assert 0.0 <= r.recall <= 1.0


def test_minmax_prune_sorted_dominates_hash(spark):
    rows = _rows(spark, "j_minmax_prune")
    by = {(r.layout, r.q_idx): r for r in rows}
    for i in range(1, 8):
        assert by[("sorted", i)].rows_skipped >= by[("hash", i)].rows_skipped
        assert 0.0 <= by[("sorted", i)].scan_frac <= 1.0


def test_youden_confusion_cells_reconcile(spark):
    r = _rows(spark, "j_youden_threshold")[0]
    assert r.tp >= 0 and r.fp >= 0 and r.fn >= 0 and r.tn >= 0
    assert abs((r.tpr - r.fpr) - r.youden_j) < 2e-6
    assert r.youden_j >= 0.0


def test_lift_gains_cumulative_and_complete(spark):
    rows = sorted(_rows(spark, "j_lift_gains"), key=lambda r: r.decile)
    gains = [r.gain for r in rows]
    assert gains == sorted(gains), "cumulative gain must be nondecreasing"
    assert rows[-1].gain == 1.0, "last decile must capture every positive"
    assert rows[0].lift >= 1.0, "top decile of a working scorer beats random"


def test_capture_recapture_overlap_bounds(spark):
    r = _rows(spark, "j_capture_recapture")[0]
    assert r.m <= min(r.n1, r.n2)
    assert r.chapman_est > 0
    assert r.v_exact >= max(r.n1, r.n2)


def test_kmv_small_range_branch_is_exact(spark):
    # sf0.001 holds 15 users per type < k=64: the sketch IS the set
    for r in _rows(spark, "j_kmv_distinct"):
        assert r.est == float(r.n_exact)
        assert r.rel_err == 0.0


def test_fdr_bh_procedure_shape(spark):
    rows = sorted(_rows(spark, "j_fdr_bh"), key=lambda r: r.p_rank)
    assert [r.p_rank for r in rows] == list(range(1, len(rows) + 1))
    ps = [r.p_value for r in rows]
    assert ps == sorted(ps)
    for r in rows:
        assert 0.0 <= r.p_value <= 1.0
        if r.rejected:
            assert r.p_value <= rows[-1].bh_cutoff + 1e-9


def test_common_neighbors_jaccard_bounds(spark):
    for r in _rows(spark, "j_common_neighbors"):
        assert 0.0 < r.jaccard <= 1.0
        assert r.n_common <= min(r.deg_u, r.deg_v)


def test_l_diversity_bounds(spark):
    for r in _rows(spark, "j_l_diversity"):
        assert 1 <= r.l_distinct <= r.n_rows
        assert r.diverse == (r.l_distinct >= 3)


def test_encoding_audit_run_arithmetic(spark):
    import math

    for r in _rows(spark, "j_encoding_audit"):
        assert r.n_runs <= r.n_rows
        assert r.avg_run_len >= 1.0
        want_bits = 0 if r.n_distinct <= 1 else math.ceil(math.log2(r.n_distinct))
        assert r.dict_bits == want_bits


def test_burrows_delta_panel(spark):
    rows = _rows(spark, "j_burrows_delta")
    n_sources = len({r.source_a for r in rows} | {r.source_b for r in rows})
    assert len(rows) == n_sources * (n_sources - 1) // 2
    for r in rows:
        assert 0 < r.m_used <= 30
        assert r.delta >= 0.0


def test_spearman_rho_bounds(spark):
    for r in _rows(spark, "j_spearman_corr"):
        if r.rho is not None:
            assert -1.0 - 1e-9 <= r.rho <= 1.0 + 1e-9


def test_jackknife_se_positive(spark):
    r = _rows(spark, "j_jackknife_variance")[0]
    # only OCCUPIED shards count: sf0.001's 15 users fill 15 of the 32
    assert 2 <= r.m_shards <= 32
    assert r.jk_se > 0 and r.iid_se > 0


def test_median_test_margins(spark):
    rows = _rows(spark, "j_median_test")
    n = sum(r.n_le + r.n_gt for r in rows)
    n_le = sum(r.n_le for r in rows)
    # the lower median puts AT LEAST half the mass at-or-below
    assert n_le >= n // 2
    for r in rows:
        assert r.chi2_cells >= 0.0


def test_ams_f2_bounds(spark):
    r = _rows(spark, "j_ams_f2")[0]
    assert r.f2_exact >= r.n_keys  # every f >= 1 contributes >= 1
    assert r.est_mean > 0


def test_hubness_occurrence_mass_conserved(spark):
    rows = _rows(spark, "j_hubness")
    total_occ = sum(r.k_occ * r.n_vecs for r in rows)
    from aprsdb_spark.queries.llm import _HUB_K, _HUB_NQ

    assert total_occ == _HUB_NQ * _HUB_K
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-4


def test_join_card_est_skew_columns(spark):
    r = _rows(spark, "j_join_card_est")[0]
    assert r.est_join_rows >= r.max_key_product
    assert 0.0 < r.top1pct_share <= 1.0


def test_levene_single_row(spark):
    r = _rows(spark, "j_levene_test")[0]
    assert r.k_groups == 5
    assert r.w_stat >= 0.0


def test_unrolled_dot_is_bit_identical_to_fold(spark):
    """dot_expr_unrolled claims the SAME left-fold IEEE sequence as the
    generic dot_expr (0.0 + x == x) — pin it with an exact equality
    sweep over the real corpus fan-out, not a tolerance: one flipped
    ulp here silently reorders kNN ranks downstream."""
    from pyspark.sql import functions as F

    from aprsdb_spark.operators.similarity import (
        as_double,
        dot_expr,
        dot_expr_unrolled,
    )
    from aprsdb_spark.tables import load

    t = load(spark, SF_DIR)
    q = t.embeddings.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), as_double("embedding").alias("qv")
    )
    both = (
        t.embeddings.crossJoin(F.broadcast(q))
        .select(
            dot_expr(as_double("embedding"), F.col("qv")).alias("a"),
            dot_expr_unrolled(as_double("embedding"), F.col("qv"), 64).alias("b"),
        )
    )
    n_diff = both.where(F.col("a") != F.col("b")).count()
    assert n_diff == 0, f"{n_diff} rows where unrolled dot != fold dot"


def test_hubness_scoring_stays_out_of_interpreted_hof(spark):
    """The r14 measured win (3.9 -> 2.7 s) is the scoring projection
    living in whole-stage codegen instead of the interpreted
    higher-order aggregate — pin the plan so a refactor back to
    dot_expr on this fan-out goes red, not unnoticed."""
    plan = (
        QUERIES["j_hubness"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "aggregate(zip_with" not in plan, (
        "j_hubness scoring fell back to the interpreted fold dot"
    )
