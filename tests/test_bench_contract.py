"""The bench stdout contract: the driver that records BENCH_r{N}.json
keeps only the LAST 2000 BYTES of stdout and parses the final line, so
the emitted line must always fit — round 2's record was lost to a
6 KB line. No Spark needed: these exercise the pure line-builder."""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def _fake_out(n_ops: int, n_q: int = 49) -> dict:
    timings = {f"op_{'x' * 20}_{i}": 0.1234 for i in range(n_ops)}
    timings.update({f"q{i:02d}": 0.5678 for i in range(1, n_q + 1)})
    return {
        "metric": "wall_sec_total",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "pipelines": {f"Pipe-{i}": 1.23 for i in range(6)},
        "sf": 0.1,
        "regressions": {f"op_{'x' * 20}_{i}": 1.5 + i for i in range(20)},
        "vs_prior_round": {
            "prior_round": 2, "n_shared_queries": 195,
            "prior_total_shared": 100.0, "current_total_shared": 80.0,
            "ratio": 0.8, "n_new_queries": 7,
        },
        "env": {
            "master": "local[32]", "default_parallelism": 32,
            "cpus": 32, "sf_dir": "/root/testdata/sf0.1",
        },
    }


def test_compact_line_fits_window_at_current_and_10x_registry():
    for n_ops in (153, 500, 1500):
        text = bench.compact_line(_fake_out(n_ops))
        assert len(text) <= 1950, (n_ops, len(text))
        parsed = json.loads(text)
        assert parsed["metric"] == "wall_sec_total"
        assert parsed["value"] > 0
        assert parsed["n_queries"] == n_ops + 49
        assert len(parsed.get("regressions", {})) <= 5
        # the scaling-leg evidence must survive every shed tier
        assert parsed["env"]["master"] == "local[32]"
        assert parsed["env"]["default_parallelism"] == 32


def test_compact_line_drops_headline_before_overflowing():
    out = _fake_out(10, n_q=400)  # absurd headline count
    text = bench.compact_line(out)
    assert len(text) <= 1950
    parsed = json.loads(text)
    assert "value" in parsed and parsed["detail"] == "BENCH_FULL.json"


def test_compact_line_truncates_pathological_sf_dir():
    """env survives every shed, so its one unbounded string (sf_dir)
    must be truncated rather than push the line past the driver's
    2000-byte stdout window."""
    out = _fake_out(10, n_q=400)
    out["env"]["sf_dir"] = "/ci/" + "deeply/nested/" * 140 + "sf0.1"
    text = bench.compact_line(out)
    assert len(text) <= 1950
    parsed = json.loads(text)
    assert parsed["env"]["master"] == "local[32]"
    assert parsed["env"]["sf_dir"].endswith("sf0.1")


def test_flag_regressions_requires_absolute_and_relative_growth(monkeypatch):
    prior = {"round": "3", "queries": {
        "op_jitter": 0.31,   # +0.55 s — cold-cache jitter, not a plan change
        "op_real": 2.0,      # 2x AND +2 s — a real regression
        "op_small": 0.1,     # big ratio but stays under the 0.5 s floor
    }}
    monkeypatch.setattr(bench, "_prior_recording", lambda sf: prior)
    flags = bench._flag_regressions(
        {"op_jitter": 0.86, "op_real": 4.0, "op_small": 0.4}, 0.1
    )
    assert flags == {"op_real": 2.0}


def test_vs_prior_round_skips_same_round_artifacts(tmp_path, monkeypatch):
    """A BENCH_FULL_r{N}.json committed MID-round N must not become
    round N's own cross-round baseline: vs_prior_round compares
    against the newest round strictly before the in-flight one, while
    the regression gate keeps the newest artifact (incl. same-round)."""
    def _art(rnd: int, q: float) -> None:
        (tmp_path / f"BENCH_FULL_r{rnd:02d}.json").write_text(json.dumps(
            {"sf": 0.1, "queries": {"q01": q}}
        ))

    _art(5, 2.0)
    _art(6, 1.0)  # mid-round-6 commit
    # driver recordings close rounds 1-5 only -> in-flight round is 6
    for r in range(1, 6):
        (tmp_path / f"BENCH_r{r:02d}.json").write_text(json.dumps(
            {"sf": 0.1, "queries": {"q01": 9.9}}
        ))
    monkeypatch.setattr(
        bench.os.path, "abspath", lambda p: str(tmp_path / "bench.py")
    )
    assert bench._current_round() == 6
    comp = bench._comparable_totals({"q01": 3.0}, 0.1)
    assert comp["prior_round"] == 5
    assert comp["prior_total_shared"] == 2.0
    # the regression gate still baselines on the newest artifact (r6)
    newest = bench._prior_recording(0.1)
    assert newest["round"] == "6"


def test_vs_prior_round_asserts_round_continuity(tmp_path, monkeypatch):
    """If the driver ever skips recording a round, the newest prior
    artifact is round N-2 — vs_prior_round must fail loudly instead of
    silently attributing two rounds of drift to one comparison."""
    (tmp_path / "BENCH_FULL_r04.json").write_text(json.dumps(
        {"sf": 0.1, "queries": {"q01": 2.0}}
    ))
    # driver recordings close rounds 1-5 (round 5's lacks queries at
    # this sf -> not usable as a baseline), so in-flight round is 6
    # but the newest usable prior is round 4
    for r in range(1, 6):
        (tmp_path / f"BENCH_r{r:02d}.json").write_text(json.dumps(
            {"sf": 0.1, "queries": {"q01": 9.9}} if r != 5 else {"sf": 0.1}
        ))
    monkeypatch.setattr(
        bench.os.path, "abspath", lambda p: str(tmp_path / "bench.py")
    )
    assert bench._current_round() == 6
    with pytest.raises(RuntimeError, match="continuity"):
        bench._comparable_totals({"q01": 3.0}, 0.1)


def test_committed_round_snapshot_matches_full_schema():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_FULL_r03.json",
    )
    if not os.path.exists(path):
        return
    full = json.load(open(path))
    assert full["metric"] == "wall_sec_total"
    assert len(full["queries"]) >= 195
    line = bench.compact_line(full)
    assert len(line) <= 1950 and json.loads(line)["value"] == full["value"]
