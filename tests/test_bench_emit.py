"""The driver-contract stdout line must fit the recording harness's
2000-char stdout tail buffer — rounds 3 and 4 lost their official bench
artifacts ("parsed": null) because the line outgrew it. _emit guarantees
a parseable line under the cap and routes full evidence to a sidecar."""

from __future__ import annotations

import contextlib
import io
import json
import os

import pytest

import bench
import __spark_entry__ as entry


@pytest.fixture(autouse=True)
def _isolated_sidecar(tmp_path, monkeypatch):
    """_emit writes its sidecar to bench_full.json next to bench.py — the
    REAL recorded artifact. Point it at a temp file so running the test
    suite can never overwrite or delete a committed bench record (the
    first version of this module deleted one)."""
    monkeypatch.setattr(bench, "_SIDECAR", str(tmp_path / "bench_full.json"))


def _fake_result(queries):
    return {
        "metric": "end-to-end seconds (crawl rollup->tiers + contract queries)",
        "unit": "sec",
        "sf": 0.1,
        "queries": queries,
        "minute_tier_rows": 2_062_262,
        "rolled_points_per_sec": 381234.5,
        "rolled_compressed_points_per_sec": 590123.4,
        "bench_events": 3_000_000,
        "gorilla": {"decode_secs": 4.1, "decode_points_per_sec": 505000.1},
        "window_note": {"probe_mops": 14.2, "steal_frac_1s": 0.0, "utc": "x"},
        "query_detail": {k: {"secs": v, "probe_mops": 14.0} for k, v in queries.items()},
        "scaling": {
            "efficiency": 0.915,
            "degraded_window": False,
            "efficiency_steal_clean": 0.912,
            "window_quality": {"fraction_of_ref": 0.877, "quorum_reached": True},
            "retries_after_degraded": 2,
            "points_per_sec": {"2": 1.0, "4": 2.0, "8": 4.0},
            "attempts": [{"efficiency": 0.3}] * 4,
            "note": "x" * 1500,
        },
        "value": 146.3,
    }


def _run_emit(queries):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench._emit(_fake_result(queries))
    return buf.getvalue().strip()


def test_real_contract_line_fits_with_all_queries():
    """The actual registered contract (every queries() name + the four
    crawl workloads) must fit WITHOUT eliding any query."""
    q = {k: 123.456 for k in entry.queries()}
    q.update(
        {
            "crawl_rollup_tiers": 5.3,
            "crawl_rollup_compress": 4.1,
            "crawl_gapfill": 6.8,
            "crawl_impute_512": 6.3,
        }
    )
    line = _run_emit(q)
    assert len(line) <= 1800
    parsed = json.loads(line)
    assert set(parsed["queries"]) == set(q)
    assert "queries_elided" not in parsed
    # the essentials survive shedding
    assert parsed["scaling"]["efficiency"] == 0.915
    assert parsed["scaling"]["degraded_window"] is False
    assert parsed["value"] == 146.3
    assert parsed["rolled_points_per_sec"] == 381234.5


def test_pathological_names_still_produce_parseable_line():
    q = {f"some_extremely_long_query_name_padded_{i:03d}": float(i) for i in range(120)}
    line = _run_emit(q)
    assert len(line) <= 1800
    parsed = json.loads(line)
    # cheap queries elided first: the most expensive survive
    kept = set(parsed["queries"])
    assert max(q, key=q.get) in kept
    assert parsed["queries_elided"] == 120 - len(kept)


def test_sidecar_carries_the_full_record(tmp_path):
    q = {"a": 1.0, "b": 2.0}
    _run_emit(q)
    full = json.load(open(bench._SIDECAR))
    assert full["query_detail"]["a"]["probe_mops"] == 14.0
    assert full["scaling"]["attempts"]
    assert full["scaling"]["note"]


def test_emergency_emit_produces_parseable_partial_line(monkeypatch):
    """A driver SIGTERM mid-run must still leave one parseable contract
    line in the stdout tail (r5: rc 124 left only progress bars)."""
    mid_run = {
        "metric": "end-to-end seconds (crawl rollup->tiers + contract queries)",
        "unit": "sec",
        "sf": 0.1,
        "queries": {"crawl_rollup_tiers": 5.3, "rollup_minute": 1.1},
        "bench_events": 3_000_000,
        "window_note": {"probe_mops": 14.2, "steal_frac_1s": 0.0, "utc": "x"},
        # scaling phase was mid-flight: one attempt already published
        "scaling": {
            "efficiency": 0.91,
            "degraded_window": False,
            "window_quality": {"fraction_of_ref": 0.88, "quorum_reached": True},
            "attempts": [{"efficiency": 0.91}],
        },
    }
    monkeypatch.setattr(bench, "_RESULT", mid_run)
    monkeypatch.setattr(bench, "_EMITTED", False)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench._emergency_body(15)
    line = buf.getvalue().strip()
    assert len(line) <= 1800
    parsed = json.loads(line)
    assert parsed["partial"] is True
    assert parsed["value"] == 6.4
    assert parsed["queries"]["crawl_rollup_tiers"] == 5.3
    assert parsed["scaling"]["efficiency"] == 0.91
    # idempotent: a second signal (e.g. ALRM then TERM) must not print twice
    buf2 = io.StringIO()
    with contextlib.redirect_stdout(buf2):
        bench._emergency_body(14)
    assert buf2.getvalue() == ""


def test_emergency_emit_noop_without_result(monkeypatch):
    monkeypatch.setattr(bench, "_RESULT", None)
    monkeypatch.setattr(bench, "_EMITTED", False)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench._emergency_body(15)
    assert buf.getvalue() == ""


def test_scaling_publish_headline_selection():
    def attempt(eff, degraded, frac):
        return {
            "efficiency": eff,
            "degraded_window": degraded,
            "window_quality": {"fraction_of_ref": frac, "quorum_reached": True},
            "rounds": 3,
            "scaling_wall_secs": 100.0,
        }

    # clean attempt wins over earlier degraded ones
    out = bench._scaling_publish(
        [attempt(0.5, True, 0.4), attempt(0.95, False, 0.9)], 0.0, 150.0
    )
    assert out["efficiency"] == 0.95
    assert out["degraded_window"] is False
    assert out["retries_after_degraded"] == 1
    assert len(out["attempts"]) == 2
    # no clean attempt: best-quality degraded becomes headline, still flagged
    out = bench._scaling_publish(
        [attempt(0.5, True, 0.31), attempt(0.57, True, 0.71)], 0.0, 150.0
    )
    assert out["efficiency"] == 0.57
    assert out["degraded_window"] is True


def test_workload_degraded_flag_survives_compact_line():
    r = _fake_result({"a": 1.0})
    r["workload_window"] = {"degraded": True, "ref_pps": 590000.0, "checks": []}
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench._emit(r)
    parsed = json.loads(buf.getvalue().strip())
    assert parsed["workload_degraded"] is True
