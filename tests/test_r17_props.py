"""Property pins for the r16 continuation-session additions (wave 9+,
r17-queued) — cross-column identities the oracle compare cannot see
(it proves Spark == DuckDB, not that either is sensible). Same
contract as test_r15_props / test_r16_props: every family pins
non-emptiness plus at least one structural invariant per qid, at
sf0.001 AND the suite SF, so a vacuous empty-vs-empty oracle pass
(the j_good_turing lesson) cannot recur.
"""

from __future__ import annotations

import os

from aprsdb_spark.registry import QUERIES, load_all
from tests.conftest import SF_DIR

load_all()

SF1 = os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.001")


def _rows(spark, qid, sf=SF1):
    out = QUERIES[qid](spark, sf).collect()
    assert out, f"{qid} returned an empty relation at {sf}"
    return out


def test_mann_kendall_integer_devices_are_consistent(spark):
    for sf in (SF1, SF_DIR):
        rows = _rows(spark, "j_mann_kendall", sf)
        # one row per event type, all five present
        assert {r["event_type"] for r in rows} == {
            "click", "view", "purchase", "signup", "error",
        }
        for r in rows:
            n = r["n_days"]
            # the pair grid is exactly n-choose-2
            assert r["n_pairs"] == n * (n - 1) // 2
            # S is a signed pair count: |S| <= n_pairs
            assert abs(r["s_stat"]) <= r["n_pairs"]
            # tie-corrected variance never exceeds the tie-free ceiling
            assert 0 < r["var_s18"] <= n * (n - 1) * (2 * n + 5)
            # z carries S's sign (continuity correction cannot flip it)
            if r["z_score"] is not None and r["s_stat"] != 0:
                assert (r["z_score"] > 0) == (r["s_stat"] > 0) or r["z_score"] == 0
            # trending is exactly the |z| >= 1.96 compare on the
            # ROUNDED z the row itself carries
            if r["z_score"] is not None:
                assert r["trending"] == (abs(r["z_score"]) >= 1.96)


def test_sen_slope_median_is_an_order_statistic_average(spark):
    for sf in (SF1, SF_DIR):
        rows = _rows(spark, "j_sen_slope", sf)
        assert {r["event_type"] for r in rows} == {
            "click", "view", "purchase", "signup", "error",
        }
        for r in rows:
            # the two middle order statistics are ordered and adjacent
            assert r["med_lo"] <= r["med_hi"]
            # odd pair count => the medians coincide
            if r["n_pairs"] % 2 == 1:
                assert r["med_lo"] == r["med_hi"]
            # sen_slope is EXACTLY their average on the 1e-6 grid
            assert r["sen_slope"] == (r["med_lo"] + r["med_hi"]) / 2000000.0


def test_mann_kendall_and_sen_agree_on_strict_monotonicity(spark):
    """Cross-qid coupling: if MK reports S == +/-n_pairs (every pair
    strictly ordered), every pairwise slope has that sign, so the Sen
    median must share it."""
    for sf in (SF1, SF_DIR):
        mk = {r["event_type"]: r for r in _rows(spark, "j_mann_kendall", sf)}
        sen = {r["event_type"]: r for r in _rows(spark, "j_sen_slope", sf)}
        assert set(mk) == set(sen)
        for et, r in mk.items():
            assert r["n_pairs"] == sen[et]["n_pairs"]
            if r["s_stat"] == r["n_pairs"]:
                assert sen[et]["sen_slope"] > 0
            if r["s_stat"] == -r["n_pairs"]:
                assert sen[et]["sen_slope"] < 0


def test_kaplan_meier_curve_is_a_valid_survival_function(spark):
    for sf in (SF1, SF_DIR):
        rows = sorted(_rows(spark, "j_kaplan_meier", sf),
                      key=lambda r: r["dur_days"])
        # the first at-risk set is the whole cohort; thereafter each
        # step sheds exactly the deaths + censorings of the prior row
        for a, b in zip(rows, rows[1:]):
            assert b["n_risk"] == a["n_risk"] - a["n_events"] - a["n_censored"]
            # survival never increases
            assert b["survival"] <= a["survival"] + 1e-12
        # every user is accounted for exactly once
        assert rows[0]["n_risk"] == sum(
            r["n_events"] + r["n_censored"] for r in rows
        )
        for r in rows:
            assert 0.0 <= r["survival"] <= 1.0
            assert r["n_events"] + r["n_censored"] <= r["n_risk"]


def test_logrank_internal_identities_and_km_coupling(spark):
    for sf in (SF1, SF_DIR):
        (lr,) = _rows(spark, "j_logrank_test", sf)
        km = _rows(spark, "j_kaplan_meier", sf)
        # the two cohorts partition the KM cohort exactly
        assert lr["n1_total"] + lr["n2_total"] == sum(
            r["n_events"] + r["n_censored"] for r in km
        )
        # observed deaths per cohort sum to the KM death total
        assert lr["o1"] + lr["o2"] == sum(r["n_events"] for r in km)
        assert 0 <= lr["o1"] <= lr["n1_total"]
        assert 0 <= lr["o2"] <= lr["n2_total"]
        if lr["z_score"] is not None:
            # chi2 is the square of z (both rounded from the same raw)
            assert abs(lr["chi2_stat"] - lr["z_score"] ** 2) < 1e-4
            assert lr["significant"] == (lr["chi2_stat"] > 3.8415)
            assert lr["var_lr"] > 0


def test_jarque_bera_statistic_recomposes_from_its_moments(spark):
    for sf in (SF1, SF_DIR):
        rows = _rows(spark, "j_jarque_bera", sf)
        assert {r["event_type"] for r in rows} == {
            "click", "view", "purchase", "signup", "error",
        }
        for r in rows:
            if r["jb_stat"] is None:
                continue
            assert r["jb_stat"] >= 0
            # kurtosis of a real sample is strictly positive
            assert r["kurtosis"] > 0
            # JB recomposes from the rounded moments to rounding slack
            jb = r["n_days"] / 6.0 * (
                r["skewness"] ** 2 + (r["kurtosis"] - 3.0) ** 2 / 4.0
            )
            assert abs(jb - r["jb_stat"]) < 1e-3
            assert r["normal"] == (r["jb_stat"] <= 5.991)


def test_durbin_watson_range_and_rho_identity(spark):
    for sf in (SF1, SF_DIR):
        rows = _rows(spark, "j_durbin_watson", sf)
        assert {r["event_type"] for r in rows} == {
            "click", "view", "purchase", "signup", "error",
        }
        for r in rows:
            if r["dw_stat"] is None:
                continue
            # DW lives in [0, 4] by construction
            assert 0.0 <= r["dw_stat"] <= 4.0
            # rho_lag1 is exactly 1 - dw/2 up to the two roundings
            assert abs(r["rho_lag1"] - (1.0 - r["dw_stat"] / 2.0)) < 2e-6
            assert r["positive_autocorr"] == (r["dw_stat"] < 1.5)


def test_cronbach_alpha_panel_identities(spark):
    for sf in (SF1, SF_DIR):
        rows = _rows(spark, "j_cronbach_alpha", sf)
        assert {r["item"] for r in rows} == {
            "click", "view", "purchase", "signup", "error",
        }
        alphas = {r["alpha"] for r in rows}
        # the overall alpha is one number repeated per item row
        assert len(alphas) == 1
        (alpha,) = alphas
        # alpha is bounded above by 1 (k/(k-1) * (1 - pos/pos))
        assert alpha <= 1.0
        for r in rows:
            assert r["item_var"] > 0
            if r["item_rest_corr"] is not None:
                assert -1.0 <= r["item_rest_corr"] <= 1.0
            assert r["alpha_if_deleted"] <= 1.0


def test_partial_corr_is_bounded_and_consistent(spark):
    for sf in (SF1, SF_DIR):
        (r,) = _rows(spark, "j_partial_corr", sf)
        for c in ("r_xy", "r_xz", "r_yz", "r_partial"):
            assert -1.0 <= r[c] <= 1.0, c
        # t recomposes from r_partial and n to rounding slack
        import math
        t = r["r_partial"] * math.sqrt(
            (r["n_users"] - 3) / (1.0 - r["r_partial"] ** 2)
        )
        assert abs(t - r["t_stat"]) < 1e-3
        assert r["significant"] == (abs(r["t_stat"]) > 1.96)


def test_cusum_drift_magnitudes_are_nonnegative(spark):
    for sf in (SF1, SF_DIR):
        rows = _rows(spark, "j_cusum_drift", sf)
        assert {r["event_type"] for r in rows} == {
            "click", "view", "purchase", "signup", "error",
        }
        for r in rows:
            assert r["sd_daily"] is not None and r["sd_daily"] >= 0
            if r["cusum_pos_sd"] is None:
                continue
            # prefix-max identities: both one-sided magnitudes >= 0
            assert r["cusum_pos_sd"] >= 0
            assert r["cusum_neg_sd"] >= 0
            assert r["peak_day"] is not None
            assert r["drift"] == (
                r["cusum_pos_sd"] > 4.0 or r["cusum_neg_sd"] > 4.0
            )


def test_ewma_chart_stays_between_observations_and_mean(spark):
    for sf in (SF1, SF_DIR):
        rows = _rows(spark, "j_ewma_chart", sf)
        bytype = {}
        for r in rows:
            bytype.setdefault(r["event_type"], []).append(r)
        assert set(bytype) == {"click", "view", "purchase", "signup", "error"}
        for et, rs in bytype.items():
            rs.sort(key=lambda r: r["day"])
            vs = [r["n_events"] for r in rs]
            mu = sum(vs) / len(vs)
            lo, hi = min(min(vs), mu), max(max(vs), mu)
            for r in rs:
                # a convex combination of observations and the center
                # can never leave their hull (grid slack only)
                assert lo - 1e-4 <= r["ewma"] <= hi + 1e-4
                # the band is symmetric around the center and widens
                assert r["ucl"] >= r["lcl"]
                assert r["anomaly"] == (
                    r["ewma"] > r["ucl"] or r["ewma"] < r["lcl"]
                )
            # sigma_t grows with t: the band is monotone non-shrinking
            for a, b in zip(rs, rs[1:]):
                assert b["ucl"] >= a["ucl"] - 1e-9


def test_krippendorff_alpha_couples_to_fleiss_kappa(spark):
    for sf in (SF1, SF_DIR):
        (ka,) = _rows(spark, "j_krippendorff_alpha", sf)
        (fk,) = QUERIES["j_fleiss_kappa"](spark, sf).collect()
        assert ka["alpha"] is not None and ka["alpha"] <= 1.0
        assert 0.0 <= ka["d_o"] <= 1.0 and 0.0 < ka["d_e"] <= 1.0
        # disagreement mass is bounded by 2 per doc (k(3-k) <= 2)
        assert 0 <= ka["dis_mass"] <= 2 * ka["n_docs"]
        # binary 3-rater alpha differs from Fleiss kappa only by the
        # (3n-1) small-sample correction: O(1/n) apart
        assert abs(ka["alpha"] - fk["kappa"]) < 0.05


def test_mantel_haenszel_pooling_identities(spark):
    for sf in (SF1, SF_DIR):
        (r,) = _rows(spark, "j_mantel_haenszel", sf)
        assert r["n_strata"] >= 4
        assert r["or_mh"] is not None and r["or_mh"] > 0
        assert r["var_mh"] > 0
        # chi2 recomposes from (a_total - e_total) and var to slack
        chi2 = (r["a_total"] - r["e_total"]) ** 2 / r["var_mh"]
        assert abs(chi2 - r["chi2_stat"]) < 1e-3
        assert r["significant"] == (r["chi2_stat"] > 3.8415)


def test_seasonal_decompose_residuals_conserve(spark):
    for sf in (SF1, SF_DIR):
        rows = _rows(spark, "j_seasonal_decompose", sf)
        bytype = {}
        for r in rows:
            bytype.setdefault(r["event_type"], []).append(r)
        assert set(bytype) == {"click", "view", "purchase", "signup", "error"}
        for et, rs in bytype.items():
            assert {r["dow"] for r in rs} == set(range(7))
            # OLS residuals sum to ~0: the weighted seasonal indexes
            # cancel (grid slack: one 1e-6 floor per day + per dow)
            tot = sum(r["n_days"] * r["seasonal_idx"] for r in rs)
            assert abs(tot) < 1e-3, (et, tot)
            # exactly one peak weekday flagged per type (max of 7
            # rounded values; ties would flag more — require >= 1)
            assert sum(1 for r in rs if r["is_peak"]) >= 1


def test_hurst_curve_and_exponent_are_sane(spark):
    for sf in (SF1, SF_DIR):
        rows = _rows(spark, "j_hurst_exponent", sf)
        bytype = {}
        for r in rows:
            bytype.setdefault(r["event_type"], []).append(r)
        assert set(bytype) == {"click", "view", "purchase", "signup", "error"}
        for et, rs in bytype.items():
            ks = sorted(r["block_size"] for r in rs)
            # the full grid survives on the 30-day series
            assert ks == [5, 10, 15, 30], (et, ks)
            hs = {r["hurst"] for r in rs}
            assert len(hs) == 1  # one exponent per type, repeated
            (h,) = hs
            if h is not None:
                # R/S slopes live strictly inside (0, 1) for any
                # non-degenerate finite series
                assert 0.0 < h < 1.0, (et, h)
            for r in rs:
                # R/S >= 1 in a block is typical but not guaranteed;
                # the log mean must at least be finite and bounded
                assert -14.0 < r["log_rs"] < 14.0
                # block accounting: at most 30/k full blocks
                assert 1 <= r["n_blocks"] <= 30 // r["block_size"]


def test_pacf_matches_durbin_levinson_recomputation(spark):
    for sf in (SF1, SF_DIR):
        rows = sorted(_rows(spark, "j_pacf", sf), key=lambda r: r["lag"])
        assert [r["lag"] for r in rows] == [1, 2, 3]
        r1, r2, r3 = (r["rho"] for r in rows)
        p = {r["lag"]: r["pacf"] for r in rows}
        # lag 1: pacf IS rho
        assert p[1] == r1
        # recompute lags 2-3 from the emitted rhos (rounding slack)
        den2 = 1.0 - r1 * r1
        if den2 > 0 and p[2] is not None:
            assert abs(p[2] - (r2 - r1 * r1) / den2) < 1e-4
            phi21 = r1 * (1.0 - r2) / den2
            den3 = 1.0 - phi21 * r1 - p[2] * r2
            if p[3] is not None and abs(den3) > 1e-9:
                assert abs(p[3] - (r3 - phi21 * r2 - p[2] * r1) / den3) < 1e-3
        for r in rows:
            assert -1.0 - 1e-9 <= r["pacf"] <= 1.0 + 1e-9
            assert r["n_pairs"] > 0


def test_breslow_day_couples_to_mantel_haenszel(spark):
    for sf in (SF1, SF_DIR):
        (bd,) = _rows(spark, "j_breslow_day", sf)
        (mh,) = QUERIES["j_mantel_haenszel"](spark, sf).collect()
        # the pooled OR seeding the quadratic IS the MH estimate
        assert bd["or_mh"] == mh["or_mh"]
        assert bd["n_strata"] == mh["n_strata"]
        assert 2 <= bd["n_used"] <= bd["n_strata"]
        assert bd["df"] == bd["n_used"] - 1
        assert bd["bd_chi2"] is not None and bd["bd_chi2"] >= 0
        if bd["critical"] is not None:
            assert bd["homogeneous"] == (bd["bd_chi2"] <= bd["critical"])
