"""The bench regression gate must load the NEWEST recorded driver round
and survive both on-disk formats (parsed "queries" dict vs truncated
"tail" string) — a silent empty reference would disable the gate."""

from __future__ import annotations

import importlib.util
import json
import os


def _bench_module():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_reference_loads_newest_recorded_round():
    ref = _bench_module()._reference()
    assert len(ref) > 50, "gate reference empty or truncated — gate silently off"
    assert all(v >= 0 for v in ref.values())
    # a known-stable qid from every round so far
    assert "a_scan_parquet" in ref or "b_filter_pred" in ref


def test_reference_prefers_parsed_queries_dict(tmp_path, monkeypatch):
    b = _bench_module()
    # synthesize r98 (tail format) and r99 (parsed format): r99 must win
    (tmp_path / "BENCH_r98.json").write_text(
        json.dumps({"tail": '"old_qid": 9.9, "sf": 0.1'})
    )
    (tmp_path / "BENCH_r99.json").write_text(
        json.dumps({"n": 1, "parsed": {"queries": {"new_qid": 1.5, "skipped": -1.0}}})
    )
    monkeypatch.setattr(
        b.os.path, "dirname", lambda _: str(tmp_path)
    )
    ref = b._reference()
    assert ref == {"new_qid": 1.5}, ref  # newest round, errors (-1) dropped
