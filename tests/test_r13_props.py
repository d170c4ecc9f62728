"""Semantic invariants of the r13 additions, pinned at sf0.001 (the
oracle sweep checks VALUES; these pin the properties a consumer
relies on — monotone curves, peeling shrinkage, probability ranges —
so a refactor that stays value-consistent with a wrong oracle twin
still fails loudly)."""

from __future__ import annotations

from aprsdb_spark.registry import QUERIES, load_all

load_all()

SF = "/root/testdata/sf0.001"


def test_nprobe_recall_is_monotone_and_useful(spark):
    rows = {r.nprobe: r for r in QUERIES["j_ivf_nprobe_curve"](spark, SF).collect()}
    depths = sorted(rows)
    for lo, hi in zip(depths, depths[1:]):
        # more probes can only ADD candidates: recall is non-decreasing
        assert rows[lo].recall <= rows[hi].recall + 1e-9, (lo, hi)
    assert rows[depths[-1]].recall >= 0.6  # the j_ann_recall floor
    assert all(r.n_hits <= r.n_exact for r in rows.values())


def test_bloom_fpr_decreases_with_size(spark):
    rows = sorted(
        QUERIES["j_bloom_fpr_curve"](spark, SF).collect(), key=lambda r: r.m_bits
    )
    for small, big in zip(rows, rows[1:]):
        assert small.fpr >= big.fpr - 1e-9, (small.m_bits, big.m_bits)
    for r in rows:
        assert 0 <= r.n_false_pos <= r.n_probes
        assert r.bits_set <= min(r.m_bits, 3 * r.n_keys)


def test_dedup_yield_survivors_monotone_in_tau(spark):
    rows = sorted(
        QUERIES["j_dedup_yield_curve"](spark, SF).collect(), key=lambda r: r.tau
    )
    for lo, hi in zip(rows, rows[1:]):
        # a HIGHER threshold drops fewer docs
        assert lo.n_survivors <= hi.n_survivors, (lo.tau, hi.tau)
    for r in rows:
        assert r.n_dropped + r.n_survivors == r.n_docs


def test_kcore_peeling_shrinks(spark):
    rows = sorted(
        QUERIES["j_kcore_peel"](spark, SF).collect(), key=lambda r: r.peel_round
    )
    for earlier, later in zip(rows, rows[1:]):
        assert later.n_nodes <= earlier.n_nodes
        assert later.n_edges <= earlier.n_edges


def test_hll_curve_register_hits_bounded(spark):
    for r in QUERIES["j_hll_precision_curve"](spark, SF).collect():
        assert 0 < r.n_registers_hit <= r.m
        assert r.est > 0


def test_markov_stationary_is_a_near_distribution(spark):
    rows = QUERIES["j_markov_stationary"](spark, SF).collect()
    total = sum(r.pi9 for r in rows)
    # floor-division leaks <= 1e-9 per edge per round: the mass is
    # slightly UNDER 1e9, never over
    assert 0 < total <= 1_000_000_000
    assert total >= 990_000_000  # leak stays tiny on the fixture chain
    assert all(r.pi9 >= 0 for r in rows)


def test_permutation_p_value_in_range(spark):
    r = QUERIES["j_permutation_test"](spark, SF).collect()[0]
    assert 0 < r.p_value <= 1
    assert 0 <= r.n_ge <= 199


def test_mannwhitney_u_in_range(spark):
    r = QUERIES["j_mannwhitney"](spark, SF).collect()[0]
    assert 0 <= r.u_a <= r.n_a * r.n_b
    assert r.significant == (abs(r.z) > 1.96)


def test_ivf_balance_shares_sum_to_one(spark):
    rows = QUERIES["j_ivf_balance"](spark, SF).collect()
    assert len(rows) == 16
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-3  # per-cell rounding
    assert sum(r.n_vecs for r in rows) > 0


def test_topk_stability_bounds(spark):
    r = QUERIES["j_topk_stability"](spark, SF).collect()[0]
    assert 0 <= r.n_common <= r.k
    assert 0 <= r.jaccard_at_k <= 1
