"""The driver scores exactly the first 50 entries of queries() and stops
(CORRECTNESS_r01/r02 both end at registry position 50). These tests pin
the round-3 rotation: every qid that has never received a driver
CORRECTNESS row must sit inside that scored window, or it can never be
verified by the hard signal.
"""

from __future__ import annotations

import __spark_entry__ as entry_mod
from aprsdb_spark.registry import DRIVER_ORDER

# qids with no driver row in CORRECTNESS_r01.json or CORRECTNESS_r02.json
# (registry positions 51-96 in rounds 1-2) plus the round-3 additions.
NEVER_SCORED = {
    "h_map", "h_json", "h_hash", "h_geo_range", "h_geo_pairs",
    "j_dedup_exact", "j_dedup_ngram", "j_dedup_near", "j_dedup_simhash",
    "j_sim_topk", "j_knn_label", "j_sim_pairs", "j_dedup_embed",
    "j_sim_pairs_bucketed", "j_dedup_embed_bucketed",
    "j_ann_lsh", "j_ann_ivf",
    "j_text_stats", "j_tfidf", "j_lang_quality", "j_lang_id",
    "j_fingerprint", "j_multimodal", "j_multimodal_frames",
    "j_multimodal_resize", "j_multimodal_features", "j_multimodal_sim",
    "j_multimodal_decode", "j_token_count", "j_quality_score",
    "j_embed_centroid", "j_pipeline_curate",
    "h_str_parse_tnc2", "h_str_parse_pos", "h_str_parse_phg",
    "aprs_pipeline", "aprs_lastpos", "aprs_msg_ack", "aprs_wx",
    "aprs_decode_udf", "aprs_malformed", "aprs_objects",
    "aprs_telemetry_eng",
    "k_pandas_scalar", "k_pandas_grouped_agg", "k_apply_in_pandas",
    "k_udtf", "k_sql_udf",
    "j_dedup_cluster", "j_split_train_val",
}


def test_never_scored_qids_fit_the_driver_window():
    first50 = list(entry_mod.queries())[:50]
    missing = NEVER_SCORED - set(first50)
    assert not missing, f"qids outside the driver's scored window: {sorted(missing)}"


def test_driver_order_has_no_unknown_or_duplicate_qids():
    qs = entry_mod.queries()
    unknown = [q for q in DRIVER_ORDER if q not in qs]
    assert not unknown, f"DRIVER_ORDER names unregistered qids: {unknown}"
    assert len(DRIVER_ORDER) == len(set(DRIVER_ORDER)), "duplicates in DRIVER_ORDER"
    assert len(DRIVER_ORDER) <= 50, "DRIVER_ORDER exceeds the scored window"


def test_queries_and_oracle_share_the_rotation():
    """oracle_sql() must follow the same head order as queries() for its
    covered qids — the driver zips positionally over its own iteration."""
    qkeys = [q for q in entry_mod.queries() if q in entry_mod.oracle_sql()]
    okeys = list(entry_mod.oracle_sql())
    assert qkeys == okeys


def test_full_registry_is_preserved():
    qs = entry_mod.queries()
    assert len(qs) >= 96
    assert len(set(qs)) == len(qs)
