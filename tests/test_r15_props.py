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


def test_text_integrity_tripwires_are_zero_but_armed(spark):
    from pyspark.sql import functions as F

    from aprsdb_spark.queries.quality import text_integrity_flags

    for sf in (SF1, SF_DIR):
        rows = _rows(spark, "j_text_integrity", sf)
        assert len(rows) == 20  # one per source
        for r in rows:
            # clean-ASCII fixture: tripwires read zero BY DESIGN...
            assert r["ctrl_docs"] == r["repl_docs"] == r["moji_docs"] == 0
            assert r["non_ascii_docs"] == 0 and r["ascii_share"] == 1.0
            # ...while the live composition columns carry real signal
            assert r["letter_chars"] > 0 and r["space_chars"] > 0
            assert r["mean_chars"] > 0
    # ...and the DETECTORS fire on crafted dirty strings (a zero from a
    # detector that can never fire would be vacuous)
    dirty = spark.createDataFrame(
        [
            ("a\x07bell",),          # control byte
            ("lossy � here",),  # replacement char
            ("cafÃ© moji",),  # UTF-8-as-Latin-1 'Ã©'
            ("clean ascii text",),
        ],
        "text string",
    )
    ctrl, repl, moji = text_integrity_flags(F.col("text"))
    got = dirty.select(
        ctrl.alias("c"), repl.alias("r"), moji.alias("m")
    ).collect()
    assert [r["c"] for r in got] == [1, 0, 0, 0]
    assert [r["r"] for r in got] == [0, 1, 0, 0]
    assert [r["m"] for r in got] == [0, 0, 1, 0]


def test_bpe_roundtrip_is_lossless_with_live_billing(spark):
    for sf in (SF1, SF_DIR):
        rows = _rows(spark, "j_bpe_roundtrip", sf)
        assert len(rows) == 20
        for r in rows:
            # losslessness is a THEOREM of correct BPE — any failure is
            # an implementation bug, which is what the tripwire is for
            assert r["n_roundtrip_fail"] == 0 and r["fidelity"] == 1.0
            assert r["n_word_occurrences"] > 0 and r["n_distinct_words"] > 0
            # merges actually fired: fewer subtokens than characters,
            # more than whitespace words
            assert r["n_subtokens"] >= r["n_word_occurrences"]
            assert r["subtokens_per_word"] >= 1.0


def test_anova_and_kruskal_agree_on_group_structure(spark):
    for sf in (SF1, SF_DIR):
        (a,) = _rows(spark, "j_anova_oneway", sf)
        assert a["k_groups"] == 5 and a["n_total"] > 0
        assert a["f_stat"] >= 0.0
        assert 0.0 <= a["eta_sq"] <= 1.0
        (k,) = _rows(spark, "j_kruskal_wallis", sf)
        assert k["k_groups"] == 5 and k["n_total"] > 0
        assert k["h_stat"] >= 0.0
        assert 0.0 < k["tie_correction"] <= 1.0
        # the tie correction can only GROW H
        assert k["h_corrected"] >= k["h_stat"] - 1e-9


def test_fleiss_kappa_is_well_formed(spark):
    for sf in (SF1, SF_DIR):
        (r,) = _rows(spark, "j_fleiss_kappa", sf)
        assert r["n_raters"] == 3 and r["n_docs"] > 0
        # every rater casts MIXED votes (a constant rater makes kappa
        # read agreement that is really prevalence)
        for c in ("r1_keeps", "r2_keeps", "r3_keeps"):
            assert 0 < r[c] < r["n_docs"], (c, r[c], r["n_docs"])
        assert 0.0 <= r["p_observed"] <= 1.0
        assert 0.0 <= r["p_expected"] <= 1.0
        assert -1.0 <= r["kappa"] <= 1.0


def test_rbo_overlap_bounds_and_identity(spark):
    for sf in (SF1, SF_DIR):
        (r,) = _rows(spark, "j_rbo_overlap", sf)
        assert r["depth"] == 10 and r["p"] == 0.5
        assert 0 <= r["n_common"] <= r["depth"]
        assert 0.0 <= r["overlap_at_depth"] <= 1.0
        assert 0.0 <= r["rbo"] <= 1.0
        # truncated RBO can never exceed the depth-capped weight mass
        # and identical-ranking RBO at p=.5 depth 10 would be ~0.999;
        # overlap at depth lower-bounds nothing, but rbo <= 1 - 2^-D + eps
        assert r["rbo"] <= 1.0


def test_rouge_recall_mirrors_bleu_pairing(spark):
    for sf in (SF1, SF_DIR):
        rows = _rows(spark, "j_rouge_recall", sf)
        bleu = QUERIES["j_bleu_precision"](spark, sf).collect()
        # identical (cand, ref) pairing by construction
        assert {(r["cand_doc"], r["ref_doc"]) for r in rows} == {
            (b["cand_doc"], b["ref_doc"]) for b in bleu
        }
        for r in rows:
            assert 0.0 <= r["r1"] <= 1.0 and 0.0 <= r["r2"] <= 1.0
            assert r["clip1"] <= r["ref_n1"] and r["clip2"] <= r["ref_n2"]
        # unigram recall dominates bigram recall in aggregate
        assert sum(r["r1"] for r in rows) >= sum(r["r2"] for r in rows)


def test_t_closeness_closes_the_governance_triptych(spark):
    for sf in (SF1, SF_DIR):
        rows = _rows(spark, "j_t_closeness", sf)
        ldiv = {
            (r["lang"], r["chars_bucket"]): r
            for r in QUERIES["j_l_diversity"](spark, sf).collect()
        }
        # same quasi-identifier cells as l-diversity, same row counts
        assert {(r["lang"], r["chars_bucket"]) for r in rows} == set(ldiv)
        for r in rows:
            assert r["n_rows"] == ldiv[(r["lang"], r["chars_bucket"])]["n_rows"]
            assert 0.0 <= r["t_closeness"] <= 1.0
            # flag matches the displayed t away from the exact 0.25
            # boundary (ON the boundary the exact integer compare is
            # authoritative and the 1e-6-rounded display can't tell)
            if abs(r["t_closeness"] - 0.25) > 1e-5:
                assert r["close"] == (r["t_closeness"] <= 0.25)
        # signal: the fixture is skewed enough that both flags occur
        assert any(r["close"] for r in rows) and any(not r["close"] for r in rows)


def test_ts_crosscorr_lag_zero_matches_plain_corr(spark):
    for sf in (SF1, SF_DIR):
        rows = {r["lag"]: r for r in _rows(spark, "j_ts_crosscorr", sf)}
        assert sorted(rows) == list(range(8))
        # lag 0 is plain Pearson over the full span — recompute it
        # driver-side from the daily series
        from pyspark.sql import functions as F

        from aprsdb_spark.tables import load

        t = load(spark, sf)
        d = (
            t.events.select(
                F.timestamp_millis(F.col("ts_ms")).cast("date").alias("day"),
                "event_type",
            )
            .groupBy("day")
            .agg(
                F.count(F.when(F.col("event_type") == "click", 1)).alias("x"),
                F.count(F.when(F.col("event_type") == "view", 1)).alias("y"),
            )
        )
        got = d.agg(F.corr("x", "y")).head()[0]
        if rows[0]["xcorr"] is not None and got is not None:
            assert abs(rows[0]["xcorr"] - got) < 1e-4
        for r in rows.values():
            if r["xcorr"] is not None:
                assert -1.0 <= r["xcorr"] <= 1.0


def test_mcnemar_and_cochran_share_the_kappa_panel(spark):
    for sf in (SF1, SF_DIR):
        (m,) = _rows(spark, "j_mcnemar_test", sf)
        (q,) = _rows(spark, "j_cochran_q", sf)
        (k,) = _rows(spark, "j_fleiss_kappa", sf)
        assert m["n_docs"] == q["n_docs"] == k["n_docs"] > 0
        # the Q totals ARE the kappa keep totals — one panel
        assert (q["r1_keeps"], q["r2_keeps"], q["r3_keeps"]) == (
            k["r1_keeps"],
            k["r2_keeps"],
            k["r3_keeps"],
        )
        # discordant cells are live (the statistic is defined)
        assert m["len_only"] + m["div_only"] > 0
        assert m["mcnemar_chi2"] is not None and m["mcnemar_chi2"] >= 0.0
        assert q["cochran_q"] is not None and q["cochran_q"] >= 0.0


def test_benford_digits_is_a_complete_distribution(spark):
    import math

    for sf in (SF1, SF_DIR):
        rows = {r["digit"]: r for r in _rows(spark, "j_benford_digits", sf)}
        assert sorted(rows) == list(range(1, 10))
        assert abs(sum(r["share"] for r in rows.values()) - 1.0) < 1e-4
        for d, r in rows.items():
            assert r["n"] > 0
            assert abs(r["benford_expected"] - math.log10(1 + 1 / d)) < 1e-12
            assert abs(r["abs_dev"] - abs(r["share"] - r["benford_expected"])) < 2e-6


def test_mmr_trades_relevance_for_novelty(spark):
    for sf in (SF1, SF_DIR):
        rows = sorted(_rows(spark, "j_mmr_diversity", sf), key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
        assert len({r["vec_id"] for r in rows}) == 5  # no repeats
        # rank 1 is pure relevance: max_sim defined 0, mmr = 0.7*rel
        assert rows[0]["max_sim"] == 0.0
        assert abs(rows[0]["mmr_score"] - 0.7 * rows[0]["relevance"]) < 2e-6
        # greedy argmax: blended score is non-increasing... NOT guaranteed
        # for MMR in general (max_sim grows as picks accumulate), but the
        # FIRST pick must dominate every later blended score
        assert all(rows[0]["mmr_score"] >= r["mmr_score"] - 1e-9 for r in rows[1:])
        # later picks actually saw similarity pressure
        assert any(r["max_sim"] > 0.0 for r in rows[1:])


def test_js_divergence_is_bounded_and_ordered_like_kl(spark):
    import math

    for sf in (SF1, SF_DIR):
        rows = _rows(spark, "j_js_divergence", sf)
        kl = {r["source"]: r for r in QUERIES["j_kl_sources"](spark, sf).collect()}
        assert len(rows) == 20
        for r in rows:
            assert r["bounded"] is True
            assert 0.0 <= r["js_div"] <= math.log(2.0) + 1e-9
            # JS <= KL/... no universal per-pair inequality vs KL(P||C),
            # but both read the same aggregation: token/term counts agree
            assert r["n_tokens"] == kl[r["source"]]["n_tokens"]
            assert r["n_terms"] == kl[r["source"]]["n_terms"]


def test_theil_decomposition_identity(spark):
    import math

    from pyspark.sql import functions as F

    from aprsdb_spark.tables import load

    for sf in (SF1, SF_DIR):
        rows = _rows(spark, "j_theil_index", sf)
        assert len(rows) == 20
        t_between = {r["t_between"] for r in rows}
        assert len(t_between) == 1
        (tb,) = t_between
        assert tb >= -1e-9
        assert abs(sum(r["share_of_total"] for r in rows) - 1.0) < 1e-4
        for r in rows:
            assert r["theil_within"] >= -1e-9  # Theil T is non-negative
        # decomposition: T_total == T_between + sum(share_g * T_g),
        # recomputed exactly from the corpus driver-side
        t = load(spark, sf)
        vals = t.documents.select("n_chars").collect()
        xs = [r["n_chars"] for r in vals]
        mu = sum(xs) / len(xs)
        t_total = sum((x / mu) * math.log(x / mu) for x in xs) / len(xs)
        t_decomp = tb + sum(r["share_of_total"] * r["theil_within"] for r in rows)
        assert abs(t_total - t_decomp) < 1e-3, (t_total, t_decomp)


def test_filter_bias_reads_the_panel_and_balances(spark):
    for sf in (SF1, SF_DIR):
        rows = _rows(spark, "j_filter_bias", sf)
        assert len(rows) == 5  # one per language
        overall = {r["overall_rate"] for r in rows}
        assert len(overall) == 1
        n = sum(r["n_lang"] for r in rows)
        kept = sum(r["n_kept"] for r in rows)
        (ov,) = overall
        assert abs(ov - kept / n) < 2e-6
        for r in rows:
            assert 0 < r["n_kept"] <= r["n_lang"]
            assert r["biased"] == (abs(r["z_score"]) >= 1.96)
        # enrichment z-scores of a partition sum to ~0 in expectation
        # only under equal sizes — don't pin that; pin definedness
        assert all(r["z_score"] is not None for r in rows)


def test_two_proportion_z_matches_the_ab_split(spark):
    for sf in (SF1, SF_DIR):
        (r,) = _rows(spark, "j_two_proportion_z", sf)
        assert r["n_a"] + r["n_b"] > 0 and r["c_a"] + r["c_b"] > 0
        assert abs(r["rate_a"] - r["c_a"] / r["n_a"]) < 2e-6
        assert abs(r["rate_b"] - r["c_b"] / r["n_b"]) < 2e-6
        # same md5 'ab' assignment as j_ab_ttest: group sizes must match
        tt = QUERIES["j_ab_ttest"](spark, sf).collect()
        assert sum(x["n_a"] for x in tt) == r["n_a"] * 1  # per-type sums
        assert r["significant"] == (abs(r["z_score"]) >= 1.96)


def test_runs_test_counts_are_consistent(spark):
    for sf in (SF1, SF_DIR):
        (r,) = _rows(spark, "j_runs_test", sf)
        # runs partition the sign sequence: 1 <= R <= a + b
        assert 1 <= r["n_runs"] <= r["n_plus"] + r["n_minus"]
        assert r["n_plus"] > 0 and r["n_minus"] > 0
        a, b = r["n_plus"], r["n_minus"]
        assert abs(r["expected_runs"] - (1 + 2 * a * b / (a + b))) < 2e-6
        assert r["z_score"] is not None
        assert r["nonrandom"] == (abs(r["z_score"]) >= 1.96)
