"""Guard on the bench artifact contract (VERDICT r5 #1).

BENCH_r05.json came back "parsed": null because bench.py printed one
fat JSON line that outgrew the driver's bounded stdout-tail capture.
The fix: the final stdout line is essentials-only and size-guarded;
bulky operator micro-benchmarks go to BENCH_DETAIL.json.  These tests
pin that contract (Spark-free) the way test_registry_fits_driver_window
pins the 50-query window.
"""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402


def _fake_result(n_queries: int = 15) -> dict:
    qs = {f"q_{i:02d}_some_operator_name": 1.234 for i in range(n_queries)}
    return {
        "metric": "turns-encoded/sec (parse→CLP-encode→route→chunk→write)",
        "value": 7.021,
        "unit": "sec",
        "queries": qs,
        "sf": 0.1,
        "turns": 1_000_007,
        "turns_per_sec": 142432.1,
        "compute_only_sec": 6.5,
        "turns_per_sec_compute": 153847.2,
        "sink_write_sec": 0.521,
        "msgpack_mb_per_s_core": 13.6,
        "encode_rows_per_s_core": {"unique": 59770.8, "template": 80361.6},
        # deliberately bulky: the r5 artifact died on exactly this key
        "ops": {
            f"op_{i}": {"detail": "x" * 400, "sec": [0.1, 0.2, 0.3] * 20}
            for i in range(20)
        },
        "cpus": 32,
        "queries_spread": {k: 1.23 for k in qs},
        "calibration_sec": [0.121, 0.078, 0.249, 0.229],
        "headline_samples": [7.021, 7.5, 8.1],
        "compute_samples": [6.5, 6.9, 7.2],
        "noisy_queries": [],
        "compute_clamped": False,
        "noisy": False,
    }


def test_compact_line_fits_driver_window(tmp_path):
    res = _fake_result()
    line = bench.emit_result(res, detail_path=str(tmp_path / "detail.json"))
    assert len(line.encode()) <= bench.COMPACT_LINE_MAX_BYTES
    parsed = json.loads(line)
    # essentials survive
    for key in ("metric", "value", "queries", "turns_per_sec", "noisy",
                "queries_spread", "compute_clamped", "sf", "cpus"):
        assert key in parsed
    assert parsed["queries"] == res["queries"]
    # bulk stays out of the line but lands intact in the detail file
    assert "ops" not in parsed
    assert parsed["detail"] == "BENCH_DETAIL.json"
    detail = json.loads((tmp_path / "detail.json").read_text())
    assert detail["ops"] == res["ops"]
    assert detail["queries"] == res["queries"]


def test_compact_line_overflow_fails_loud(tmp_path):
    res = _fake_result()
    # a future edit that re-inlines bulk must trip the guard, not
    # silently truncate the driver artifact again
    res["queries_spread"] = {f"pad_{i}": 1.0 for i in range(400)}
    with pytest.raises(AssertionError, match="DETAIL_ONLY_KEYS"):
        bench.emit_result(res, detail_path=str(tmp_path / "detail.json"))


def test_compact_line_has_headroom_for_registry_growth(tmp_path):
    # the driver registry is capped at 50 queries; even if every one of
    # them were benched (today: 15), the line must still fit
    res = _fake_result(n_queries=50)
    line = bench.emit_result(res, detail_path=str(tmp_path / "detail.json"))
    assert len(line.encode()) <= bench.COMPACT_LINE_MAX_BYTES
