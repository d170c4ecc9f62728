"""qid registry wiring SURVEY.md §2 rows to the driver contract.

Every operator registers here via the ``@query`` decorator; the driver's
``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over these
dicts. A qid with ``oracle=None`` gets the driver's weaker rows-only check
(SURVEY.md §2 '◦' rows).
"""

from __future__ import annotations

import functools
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(qid: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if qid in QUERIES:
            raise ValueError(f"duplicate qid {qid!r}")

        # Every registered query must work on the DRIVER's session — a
        # vanilla SparkSession built outside this package, possibly with
        # cwd != repo. tune() pins the correctness confs (UTC, ns-as-long)
        # and ships the package zip to executor python workers, so
        # fixture-backed qids that never call tables.load() (aprs_*,
        # literal-frame parses, pandas-UDF paths) get the same guarantees
        # as table-backed ones. Idempotent and ~free after the first call.
        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            from .session import tune

            tune(spark)
            return fn(spark, sf_dir)

        QUERIES[qid] = wrapped
        if oracle is not None:
            ORACLE[qid] = oracle
        # Return the WRAPPED function: the module-level name and the
        # registry entry must behave identically, or a direct call (tests,
        # cross-query reuse) silently skips tune()'s conf pinning.
        return wrapped

    return deco


def load_all() -> None:
    """Import every query module so decorators run (idempotent)."""
    from .queries import ALL_MODULES  # noqa: F401


# The driver's correctness gate scores exactly the FIRST 50 entries of
# __spark_entry__.queries() in insertion order, then stops (observed:
# every CORRECTNESS_r{N}.json ends at registry position 50). DRIVER_ORDER
# pins which qids occupy that scored window. Round-15 rotation, exactly
# the arithmetic the r14 comment promised and the r14 verdict prescribed:
# (1) ALL 20 never-scored r14 additions from the r14 NEXT_QUEUE, in
# queue order — the I/O-and-join pricing closure, the KMV distinct
# sketch, the classical-statistics closure, the LM-smoothing +
# stylometry wave, the retrieval-pathology / operating-point wave, and
# the governance/estimation closure; (2) the 28 r14 REFRESH_QUEUE qids
# (the remaining 20 of the r7-scored cohort + the first 8 of the
# r8-scored cohort, registration order); (3) the two harness-breakage
# canaries a_scan_parquet / e_win_lastpos. 20 + 28 + 2 = 50. When this
# window lands, every registered qid's driver evidence is r8 or newer,
# and the oldest cohort is the 40 remaining r8-scored qids (the first
# 28 on REFRESH_QUEUE below, first for r16; the last 12 wait one extra
# round, age 16 - 8 = 8 < bound 9 at N >= 385).
# The staleness bound max(4, ceil(N/48)) is derived from registry size
# in tests/test_registry_order.py, so this schedule is checked, not
# promised.
DRIVER_ORDER: list[str] = [
    # canary: a_scan_parquet (trivial scan — breaks only if the harness does)
    "a_scan_parquet",
    # never-scored (r14): the full r14 NEXT_QUEUE in its queue order
    "j_minmax_prune",
    "j_join_card_est",
    "j_ams_f2",
    "j_encoding_audit",
    "j_kmv_distinct",
    "j_levene_test",
    "j_fdr_bh",
    "j_cramers_v",
    "j_spearman_corr",
    "j_jackknife_variance",
    "j_median_test",
    "j_common_neighbors",
    "j_good_turing",
    "j_burrows_delta",
    "j_hubness",
    "j_dim_truncation_curve",
    "j_lift_gains",
    "j_youden_threshold",
    "j_l_diversity",
    "j_capture_recapture",
    # oldest-evidence refresh: the remaining 20 r7-scored qids + the
    # first 8 r8-scored qids, registration order (the full r14
    # REFRESH_QUEUE)
    "j_multimodal_resize",
    "j_multimodal_decode",
    "aprs_lastpos",
    "aprs_msg_ack",
    "aprs_wx",
    "aprs_decode_udf",
    "aprs_malformed",
    "aprs_objects",
    "aprs_telemetry_eng",
    "c_sql_q4",
    "c_sql_q13",
    "c_sql_q14",
    "c_sql_q15",
    "c_sql_q17",
    "c_sql_q19",
    "c_sql_q21",
    "c_sql_q22",
    "a_scan_csv",
    "a_scan_json",
    "a_scan_evolve",
    "c_join_lateral",
    "c_join_asof_tol",
    "c_join_shj",
    "d_agg_bitwise",
    "d_agg_listagg",
    "d_agg_bitmap",
    "h_variant",
    "h_try_arith",
    # canary: e_win_lastpos
    "e_win_lastpos",
]
# qids added AFTER the current round's 50-slot window was frozen. Not
# scoreable this round; everything here must be tri-scale-verified
# locally (sf0.001/0.01/0.1 vs DuckDB, the same compare the driver
# runs) and is FIRST in line for the next rotation.
# test_registry_order.py enforces that a never-scored qid is either in
# the window or on this explicit queue — nothing waits silently.
NEXT_QUEUE: list[str] = [
    # r15 additions land here as they are built (capacity: <= 20, since
    # REFRESH_QUEUE below holds 28 and NEXT + REFRESH must fit one
    # 48-slot window).
    # r15 wave 1: sketch-family closure — the quantile-sketch sizing
    # curve (the KLL hash-coin sampler at 3 geometries vs the exact
    # j_length_deciles truth; the structure a 100 TB percentile
    # dashboard lacked) and KMV set-intersection (the capability
    # j_kmv_distinct's docstring promises over HLL, measured against
    # exact pairwise Jaccard on partially-overlapping part sets)
    "j_quantile_sketch_curve",
    "j_kmv_jaccard",
    # r15 wave 2: tokenizer/text-integrity audits (the r14 verdict's
    # queued candidate) — encoding-level corruption tripwires per
    # source (control bytes / U+FFFD / mojibake digraphs, armed by
    # crafted-dirty-row tests) and the byte-level md5 proof that BPE
    # encode -> decode is lossless over the trained merges
    "j_text_integrity",
    "j_bpe_roundtrip",
    # r15 wave 3: the inference closure around j_levene_test — the
    # equal-means F test Levene guards (with eta-squared effect size),
    # its rank-based twin over the heavy-tied length distributions
    # (tie-corrected Kruskal-Wallis via doubled midranks), and
    # multi-rater agreement of three deterministic quality heuristics
    # (Fleiss' kappa; j_cohen_kappa generalized to r = 3)
    "j_anova_oneway",
    "j_kruskal_wallis",
    "j_fleiss_kappa",
    # r15 wave 4: retrieval-evaluation closure — Rank-Biased Overlap
    # between exact and PQ rankings (non-conjoint lists, dyadic p=1/2
    # top-weighting; the axis j_rank_tau's common-items view misses)
    # and ROUGE recall (the recall twin of j_bleu_precision, same
    # pairing, reference-side denominator)
    "j_rbo_overlap",
    "j_rouge_recall",
    # r15 wave 5: governance closure — t-closeness (the skewness
    # attack l-diversity misses; categorical EMD = total variation,
    # exact-integer numerator with the absent-mass identity)
    "j_t_closeness",
    # r15 wave 6: time-series closure — lead-lag cross-correlation
    # (the lag axis j_rolling_corr's lag-0 trend misses; exact DATE
    # equi-join pairing over gapped calendars)
    "j_ts_crosscorr",
    # r15 wave 7: marginal-homogeneity closure of the rater panel —
    # McNemar's paired test (do two filters keep different AMOUNTS,
    # the question kappa doesn't answer) and Cochran's Q (its k-sample
    # generalization over all three raters)
    "j_mcnemar_test",
    "j_cochran_q",
    # r15 wave 8: numeric forensics — Benford first-digit audit of the
    # money column (string-derived digits, literal log10 expectations,
    # no query-time libm)
    "j_benford_digits",
    # r15 wave 9: retrieval diversity — MMR re-ranking of the exact
    # shortlist (greedy argmax unrolled as CTEs in the oracle, the
    # BPE-round discipline; serve-time dedup beside j_semdedup's
    # corpus-side dedup)
    "j_mmr_diversity",
    # r15 wave 10: distribution-shift + inequality closure — the
    # symmetric bounded drift twin of j_kl_sources (Jensen-Shannon,
    # absent-mass in closed form, per-row ln2 bound asserted) and the
    # decomposable inequality index beside j_gini_tokens (Theil T,
    # between/within split over the length histogram)
    "j_js_divergence",
    "j_theil_index",
    # r15 wave 11: experiment + fairness closure — hypergeometric
    # enrichment of each language in the rater panel's kept set (the
    # curation-fairness tripwire) and the pooled two-proportion z on
    # conversion over the j_ab_ttest split (the binary-outcome A/B
    # member)
    "j_filter_bias",
    "j_two_proportion_z",
    # r15 wave 12: sequence-randomness audit — Wald-Wolfowitz runs
    # test on day-over-day volume delta signs (the ORDER-independence
    # question the distributional shelf never asks). 20 additions
    # total: the queue is at exactly the 20-slot capacity the r16
    # window arithmetic assumes (20 + 28 REFRESH + 2 canaries = 50).
    "j_runs_test",
]

# Already-scored qids whose evidence is the oldest in the registry but
# which did NOT fit this round's 50-slot window: scheduled FIRST for the
# next rotation (after NEXT_QUEUE's never-scored entries). This is the
# executable form of "deferred to r15" — test_registry_order.py accepts
# queue membership as "scheduled", and a sibling test pins that only
# already-scored qids may sit here (never-scored ones belong on
# NEXT_QUEUE, where the tri-scale-verification contract applies).
# r16 plan: NEXT_QUEUE r15 additions (<= 20, never-scored) first, then
# these — the first 28 of the 40 remaining r8-scored qids, in
# registration order (20 + 28 + 2 canaries = 50 exactly if r15 adds
# the full 20). The 12 r8-scored qids left off the queue
# (c_sql_q1/q2/q6/q7/q8/q9/q11/q12/q16/q20, a_scan_orc,
# a_pysrc_replay) are age 16 - 8 = 8 < bound 9 at N >= 385 during the
# r16 build, inside the staleness invariant; they lead the r17 queue.
REFRESH_QUEUE: list[str] = [
    # the first 28 of the 40 remaining r8-scored qids, registration order
    "j_dedup_exact",
    "j_dedup_ngram",
    "j_dedup_near",
    "j_sim_topk",
    "j_sim_pairs",
    "j_dedup_embed",
    "j_sim_pairs_bucketed",
    "j_dedup_embed_bucketed",
    "j_sim_pairs_banded",
    "j_lsh_recall_banded",
    "j_ann_recall",
    "j_hard_negatives",
    "j_class_weights",
    "j_ngram_novelty",
    "j_skew_stats",
    "j_compaction_plan",
    "j_markov_transitions",
    "j_bfs_distance",
    "c_sql_recursive",
    "j_chi2_independence",
    "j_outlier_mad",
    "k_map_in_arrow",
    "j_ts_ewma",
    "j_interval_overlap",
    "j_rolling_corr",
    "j_feature_snapshot",
    "j_cdc_apply",
    "j_dq_checks",
]

def driver_ordered(d: dict) -> dict:
    """Reorder a registry view so DRIVER_ORDER qids come first (in that
    order), followed by the rest in registration order. Unknown names in
    DRIVER_ORDER are skipped, so the list may reference qids that a
    partial import has not registered."""
    head = {q: d[q] for q in DRIVER_ORDER if q in d}
    return head | {q: v for q, v in d.items() if q not in head}
