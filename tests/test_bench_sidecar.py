"""bench.py's artifact/sidecar contract (VERDICT r6 #2/#8), pinned
without Spark: the stdout line stays under the driver's tail window
by folding, the sidecar records EVERY entry (fold-immune) with rep
spreads, and the regression baseline backfills folded entries from
the committed sidecar so the round-over-round table covers the full
suite."""

from __future__ import annotations

import json

import bench


def test_encode_line_folds_tail_first_and_counts_noisy():
    timings = {f"q{i:03d}": 0.5 for i in range(200)}
    line = bench.encode_line(timings, 0.1, n_noisy=3)
    assert len(line) <= bench.LINE_BUDGET
    payload = json.loads(line)
    assert payload["noisy"] == 3
    assert payload["value"] == round(sum(timings.values()), 2)
    # folding sacrifices the LAST-registered names, keeps the head
    assert "q000" in payload["queries"]
    assert bench.FOLD_KEY in payload["queries"]
    # the folded bucket carries the evicted entries' total time
    kept = sum(
        v for k, v in payload["queries"].items() if k != bench.FOLD_KEY
    )
    assert abs(kept + payload["queries"][bench.FOLD_KEY] - payload["value"]) < 0.1


def test_baseline_backfills_folded_entries_from_sidecar(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "_REPO_DIR", str(tmp_path))
    monkeypatch.setattr(
        bench, "BASELINE_FILE", str(tmp_path / "bench_baseline.json")
    )
    # driver artifact: two visible entries + a fold
    (tmp_path / "BENCH_r09.json").write_text(json.dumps({
        "parsed": {
            "metric": "suite_total_runtime", "value": 10.0, "unit": "sec",
            "queries": {"a": 1.0, "b": 2.0, bench.FOLD_KEY: 7.0},
            "sf": 0.1,
        }
    }))
    # sidecar: has the folded entry c (and a stale value for a)
    (tmp_path / "bench_detail_sf0.1.json").write_text(json.dumps({
        "sf": 0.1, "total": 10.5,
        "queries": {
            "a": {"best": 5.0, "reps": [5.0], "spread": 1.0},
            "c": {"best": 3.5, "reps": [3.5], "spread": 1.0},
        },
    }))
    base = bench._baseline_queries(0.1)
    assert base["b"] == 2.0
    assert base["c"] == 3.5  # folded in the artifact, recovered here
    assert base["a"] == 1.0  # artifact beats sidecar for visible names
    assert bench.FOLD_KEY not in base


def test_baseline_rejects_cross_sf_artifacts(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "_REPO_DIR", str(tmp_path))
    monkeypatch.setattr(
        bench, "BASELINE_FILE", str(tmp_path / "bench_baseline.json")
    )
    (tmp_path / "BENCH_r02.json").write_text(json.dumps({
        "parsed": {"queries": {"a": 9.9}, "sf": 0.01}
    }))
    assert bench._baseline_queries(0.1) is None
