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


def test_label_propagation_partition_is_wellformed(spark):
    for sf in (SF1, SF_DIR):
        rows = _rows(spark, "j_label_propagation", sf)
        assert len(rows) == 25
        nks = {r["n_nationkey"] for r in rows}
        comms = {r["community"] for r in rows}
        # labels are node ids, always
        assert comms <= nks
        # n_members is the actual member count of each community
        from collections import Counter

        sizes = Counter(r["community"] for r in rows)
        for r in rows:
            assert r["n_members"] == sizes[r["community"]], r
        # nontrivial at the data scales we run (not 25 singletons)
        assert len(comms) < 25


def test_modularity_is_bounded_and_decomposes(spark):
    for sf in (SF1, SF_DIR):
        rows = _rows(spark, "j_modularity", sf)
        q = sum(r["q_contrib"] for r in rows)
        assert -0.5 - 1e-6 <= q <= 1.0, q  # Newman bound
        assert sum(r["n_nodes"] for r in rows) == 25
        total_deg = sum(r["degree_sum"] for r in rows)
        assert total_deg % 2 == 0  # handshake lemma: sum deg = 2m
        for r in rows:
            # intra edges contribute 2 endpoint-degrees each
            assert 2 * r["intra_edges"] <= r["degree_sum"], r
        # the partition is the SAME relation j_label_propagation emits
        lp = _rows(spark, "j_label_propagation", sf)
        lp_sizes = {
            (r["community"], r["n_members"]) for r in lp
        }
        mod_sizes = {(r["community"], r["n_nodes"]) for r in rows}
        assert lp_sizes == mod_sizes


def test_connected_components_converged_and_consistent(spark):
    from aprsdb_spark.queries.analytics import _sym_neighbors
    from aprsdb_spark.tables import load as tload

    for sf in (SF1, SF_DIR):
        rows = _rows(spark, "j_connected_components", sf)
        assert len(rows) == 25
        comp = {r["n_nationkey"]: r["component"] for r in rows}
        # min-label semantics: the label never exceeds the node's own id,
        # and every component id is one of its members' ids
        for r in rows:
            assert r["component"] <= r["n_nationkey"]
        for c in set(comp.values()):
            assert comp[c] == c, f"component id {c} is not its own min member"
        # CONVERGENCE (fixed rounds reached the fixpoint): every edge
        # joins equal labels
        und = _sym_neighbors(tload(spark, sf)).collect()
        for e in und:
            assert comp[e["u"]] == comp[e["v"]], (e, sf)
        # sizes are the actual member counts
        from collections import Counter

        sizes = Counter(comp.values())
        for r in rows:
            assert r["comp_size"] == sizes[r["component"]]


def test_adamic_adar_agrees_with_common_neighbors(spark):
    for sf in (SF1, SF_DIR):
        aa = _rows(spark, "j_adamic_adar", sf)
        cn = _rows(spark, "j_common_neighbors", sf)
        # same pair universe, same shared-neighbor counts, same adjacency
        aa_m = {(r["u"], r["v"]): (r["n_common"], r["adjacent"]) for r in aa}
        cn_m = {(r["u"], r["v"]): (r["n_common"], r["adjacent"]) for r in cn}
        assert aa_m == cn_m
        for r in aa:
            assert r["u"] < r["v"]
            assert r["aa6"] > 0
            assert r["aa_score"] == pytest.approx(r["aa6"] / 1e6, abs=1e-12)
            # each term is 1e6/ln(d) with 2 <= d <= 24:
            # 1e6/ln(24) <= term <= 1e6/ln(2)
            assert 314658 * r["n_common"] <= r["aa6"] <= 1442696 * r["n_common"]


def test_harmonic_centrality_terms_are_bounded(spark):
    for sf in (SF1, SF_DIR):
        rows = _rows(spark, "j_harmonic_centrality", sf)
        assert len(rows) == 25
        cc = {r["n_nationkey"]: r["comp_size"] for r in _rows(spark, "j_connected_components", sf)}
        for r in rows:
            assert 0 <= r["n_reached"] <= 24
            # every reached node is 1..R hops away: term in
            # [1e6 div R, 1e6]
            assert r["n_reached"] * (1000000 // 4) <= r["hc6"] <= r["n_reached"] * 1000000
            assert r["harmonic"] == pytest.approx(r["hc6"] / 1e6, abs=1e-12)
            # can never reach beyond the node's own component
            assert r["n_reached"] <= cc[r["n_nationkey"]] - 1


def test_wilcoxon_signed_rank_identities(spark):
    for sf in (SF1, SF_DIR):
        r = _rows(spark, "j_wilcoxon_signed", sf)[0]
        n = r["n_pairs"]
        assert n > 0
        # doubled rank sums partition the doubled total n(n+1)
        assert r["w2_plus"] + r["w2_minus"] == n * (n + 1)
        assert 0 <= r["w2_plus"] <= n * (n + 1)
        assert r["n_zero"] >= 0
        assert r["significant"] == (abs(r["z_stat"]) > 1.96)


def test_friedman_and_kendall_share_a_coherent_panel(spark):
    for sf in (SF1, SF_DIR):
        f = _rows(spark, "j_friedman_test", sf)[0]
        n, k = f["n_blocks"], f["k_treatments"]
        assert k == 3
        # doubled within-block midranks sum to k(k+1) = 12 per block
        assert f["r2_1"] + f["r2_2"] + f["r2_3"] == 12 * n
        assert f["chi2_f"] >= 0
        assert f["significant"] == (f["chi2_f"] > 5.991)
        w = _rows(spark, "j_kendall_w", sf)[0]
        assert w["n_items"] == n  # same corpus, same panel
        assert 0.0 <= w["w"] <= 1.0
        # avg pairwise Spearman = (mW - 1)/(m - 1), within rounding
        assert w["avg_spearman"] == pytest.approx((3 * w["w"] - 1) / 2, abs=5e-6)
        assert -0.5 <= w["avg_spearman"] <= 1.0  # m=3 lower bound


def test_cohens_d_is_consistent_with_the_t_test_panel(spark):
    for sf in (SF1, SF_DIR):
        d = {r["event_type"]: r for r in _rows(spark, "j_cohens_d", sf)}
        t = {r["event_type"]: r for r in _rows(spark, "j_ab_ttest", sf)}
        assert set(d) == set(t)  # same split, same types
        for et, r in d.items():
            assert r["n_a"] == t[et]["n_a"] and r["n_b"] == t[et]["n_b"]
            # d and t share the sign of (mean_a - mean_b)
            if t[et]["t_stat"] != 0:
                assert (r["cohens_d"] >= 0) == (t[et]["t_stat"] >= 0)
            # Hedges' correction shrinks toward zero, never flips sign
            assert abs(r["hedges_g"]) <= abs(r["cohens_d"]) + 1e-4
            lab = r["effect_class"]
            a = abs(r["cohens_d"])
            want = (
                "negligible" if a < 0.2 else
                "small" if a < 0.5 else
                "medium" if a < 0.8 else "large"
            )
            assert lab == want


def test_log_loss_bounds_and_zero_vote_accounting(spark):
    import math

    for sf in (SF1, SF_DIR):
        rows = _rows(spark, "j_log_loss", sf)
        assert sum(r["n_queries"] for r in rows) == 200  # the ECE panel
        # Laplace p ranges over {1..K+1}/(K+L): loss per query is
        # bounded by -ln(1/(K+L)) and below by -ln((K+1)/(K+L))
        for r in rows:
            lo = -math.log(11 / 20)  # vt = K, L = 10 labels
            hi = -math.log(1 / 20)   # vt = 0
            per = r["loss_sum6"] / r["n_queries"] / 1e6
            assert lo - 1e-6 <= per <= hi + 1e-6, r
            assert 0 <= r["n_zero_vote"] <= r["n_queries"]
            # zero-vote queries each contribute exactly the max term
            assert r["loss_sum6"] >= r["n_zero_vote"] * int(hi * 1e6) - r["n_queries"]


def test_hellinger_is_a_bounded_metric_coherent_with_kl(spark):
    for sf in (SF1, SF_DIR):
        h = {r["source"]: r for r in _rows(spark, "j_hellinger", sf)}
        kl = {r["source"]: r for r in _rows(spark, "j_kl_sources", sf)}
        assert set(h) == set(kl)
        for src, r in h.items():
            assert 0.0 <= r["hellinger"] <= 1.0
            assert 0.0 < r["bhattacharyya_coef"] <= 1.0 + 1e-6
            assert r["bhattacharyya_dist"] >= -1e-6
            # same rollup: token/term counts must agree with the KL qid
            assert r["n_tokens"] == kl[src]["n_tokens"]
            assert r["n_terms"] == kl[src]["n_terms"]


def test_readability_count_devices_are_coherent(spark):
    for sf in (SF1, SF_DIR):
        for r in _rows(spark, "j_readability", sf):
            assert r["n_words"] > 0 and r["n_sentences"] >= r["n_docs"]
            assert r["n_syllables"] >= r["n_words"]  # floored proxy
            assert r["syllables_per_word"] >= 1.0
            assert r["words_per_sentence"] > 0
            lvl = r["reading_level"]
            fl = r["flesch"]
            want = "easy" if fl >= 70 else "standard" if fl >= 50 else "difficult"
            assert lvl == want


def test_map_decomposition_is_coherent_with_mrr(spark):
    for sf in (SF1, SF_DIR):
        ap = {r["qid"]: r for r in _rows(spark, "j_map_eval", sf)}
        mrr = {r["qid"]: r for r in _rows(spark, "j_retrieval_mrr", sf)}
        assert set(ap) == set(mrr) and len(ap) == 20
        for qid, r in ap.items():
            assert 0.0 <= r["avg_precision"] <= 1.0
            assert 0.0 <= r["p_at_10"] <= 1.0
            assert r["n_rel"] > 0
            # AP is bounded above by the first-hit reciprocal-rank
            # ONLY when every doc is relevant... the true identity:
            # the first relevant hit contributes cum/k = 1/rank_first
            # and AP <= 1; cross-pin the rank itself instead:
            assert r["true_label"] == mrr[qid]["true_label"]
            # precision@k terms start at the MRR first-hit rank
            assert r["ap6_sum"] >= (1000000 * 1) // mrr[qid]["first_rel_rank"]


def test_cliffs_delta_is_the_mannwhitney_u_transform(spark):
    for sf in (SF1, SF_DIR):
        cd = _rows(spark, "j_cliffs_delta", sf)[0]
        mw = _rows(spark, "j_mannwhitney", sf)[0]
        assert (cd["n_a"], cd["n_b"]) == (mw["n_a"], mw["n_b"])
        # delta = 2U/(nm) - 1 recomputed from the doubled-U column
        want = cd["u2_a"] / (cd["n_a"] * cd["n_b"]) - 1.0
        assert cd["cliffs_delta"] == pytest.approx(want, abs=1e-6)
        assert -1.0 <= cd["cliffs_delta"] <= 1.0
        # the mannwhitney qid's u_a is u2_a/2 on the same pair
        assert mw["u_a"] == pytest.approx(cd["u2_a"] / 2, abs=1e-9)


def test_holm_is_no_more_permissive_than_bh(spark):
    for sf in (SF1, SF_DIR):
        holm = {r["event_type"]: r for r in _rows(spark, "j_holm_bonferroni", sf)}
        bh = {r["event_type"]: r for r in _rows(spark, "j_fdr_bh", sf)}
        assert set(holm) == set(bh)
        for et, r in holm.items():
            # identical p-value panel (same t, same A&S tail)
            assert r["p_value"] == bh[et]["p_value"]
            assert r["t_stat"] == bh[et]["t_stat"]
        # FWER control at alpha=0.05 rejects a subset of what FDR
        # control at q=0.1 rejects (monotone cutoffs: a/(m-i+1) <= qi/m
        # here since alpha < q)
        h_rej = {et for et, r in holm.items() if r["rejected"]}
        b_rej = {et for et, r in bh.items() if r["rejected"]}
        assert h_rej <= b_rej
        # step-down contiguity: rejected ranks form a prefix
        ranks = sorted(r["p_rank"] for r in holm.values() if r["rejected"])
        assert ranks == list(range(1, len(ranks) + 1))


def test_cochran_armitage_sufficient_stats_are_coherent(spark):
    for sf in (SF1, SF_DIR):
        r = _rows(spark, "j_cochran_armitage", sf)[0]
        assert r["n_groups"] >= 2
        assert 0 < r["n_success"] < r["n_total"]
        # scores are 0..4: T <= 4X, W1 <= 4N, W2 <= 16N (and W2 >= W1)
        assert r["t_score"] <= 4 * r["n_success"]
        assert r["w1"] <= 4 * r["n_total"]
        assert r["w1"] <= r["w2"] <= 4 * r["w1"]
        assert r["significant"] == (abs(r["z_stat"]) > 1.96)


def test_chao1_never_estimates_below_observed(spark):
    for sf in (SF1, SF_DIR):
        rows = _rows(spark, "j_chao1", sf)
        assert len(rows) == 20
        for r in rows:
            assert r["f1"] + 2 * r["f2"] <= r["n_tokens"]
            assert r["f1"] + r["f2"] <= r["s_obs"] <= r["n_tokens"]
            assert r["chao1"] >= r["s_obs"]  # estimator adds unseen mass
            assert 0.0 <= r["good_coverage"] <= 1.0


def test_ljung_box_q_is_cumulative_and_flagged_per_depth(spark):
    for sf in (SF1, SF_DIR):
        rows = sorted(_rows(spark, "j_ljung_box", sf), key=lambda r: r["lag"])
        assert [r["lag"] for r in rows] == list(range(1, 8))
        crits = (3.841, 5.991, 7.815, 9.488, 11.070, 12.592, 14.067)
        prev = 0.0
        for r, crit in zip(rows, crits):
            assert -1.0 <= r["rho"] <= 1.0
            assert r["q_stat"] >= prev - 1e-9  # Q accumulates over depth
            prev = r["q_stat"]
            assert r["white_noise"] == (r["q_stat"] <= crit)
