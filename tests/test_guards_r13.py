"""Round-13 guard lanes (VERDICT r12 #6 + ADVICE r12 + optional #8),
pinned without Spark:

- the still-inflated tail selection uses the SAME two-leg inflation
  definition as the retime trigger (ratio AND absolute excess) — a
  ratio-only leg let sub-second jitter occupy capped tail slots ahead
  of larger-absolute offenders;
- ``_retime_reference`` reads the ratchet file exactly once per call;
- the reseed watch counts runs the ratchet fails to tighten below a
  recorded reseed floor and warns at the threshold, so a floor that
  was itself recorded under load cannot stay an invisible yardstick
  forever;
- the capped retimes tail (``_more`` overflow field) round-trips
  through a driver-artifact-style parse of the stdout line.
"""

from __future__ import annotations

import json

import bench


def _details(names, retimed=2):
    return {
        n: {"reps": [1.0, 0.9, 0.8, 0.7], "retimed": retimed} for n in names
    }


def test_still_inflated_requires_both_trigger_legs():
    """ADVICE r12 #1: an entry satisfying the ratio leg alone (its
    absolute excess shrank below RETIME_ABS_SEC during the retime)
    must NOT occupy a tail slot — the tail uses the same inflation
    definition as the retime trigger itself."""
    # ratio 2.0x but excess only 0.1 s < RETIME_ABS_SEC -> excluded
    # ratio 1.6x with excess 3.0 s -> included
    timings = {"tiny": 0.2, "big": 8.0}
    refs = {"tiny": 0.1, "big": 5.0}
    names = bench.select_still_inflated(
        ["tiny", "big"], timings, refs, _details(["tiny", "big"])
    )
    assert names == ["big"]


def test_still_inflated_ranked_worst_ratio_first_and_gated():
    timings = {"a": 3.0, "b": 4.0, "c": 1.0, "d": 5.0}
    refs = {"a": 1.0, "b": 2.0, "c": 0.9, "d": 4.9}
    details = _details(["a", "b", "d"])
    details["c"] = {"reps": [1.0], "retimed": 0}  # never retimed
    names = bench.select_still_inflated(
        ["a", "b", "c", "d"], timings, refs, details
    )
    # c: no retime reps -> excluded; d: 1.02x ratio -> excluded;
    # a (3.0x) outranks b (2.0x)
    assert names == ["a", "b"]


def test_retime_reference_reads_ratchet_file_once(monkeypatch):
    """VERDICT r12 #6: the ratchet dict is captured ONCE and reused
    for both the min-merge and the reseed override — re-reading the
    file inside the override loop multiplied I/O by the reseed count
    and could observe two different file states in one call."""
    calls = []

    def counting_ref(sf):
        calls.append(sf)
        return {"kmeans_clusters": 1.9, "other": 0.5}

    monkeypatch.setattr(bench, "_reference_queries", counting_ref)
    monkeypatch.setattr(bench, "_sidecar_queries", lambda sf: None)
    monkeypatch.setattr(bench, "_baseline_queries", lambda sf: None)
    refs = bench._retime_reference(0.1)
    assert calls == [0.1]
    # the reseed override still applied from the single capture
    assert refs["kmeans_clusters"] == min(
        1.9, bench.RATCHET_RESEEDED["kmeans_clusters"][0.1]
    )


def _watch(name, n, floor):
    return {name: {"n": n, "floor": floor}}


def test_reseed_watch_counts_warns_and_clears(tmp_path, monkeypatch, capsys):
    monkeypatch.setattr(bench, "_REPO_DIR", str(tmp_path))
    monkeypatch.setattr(
        bench, "RATCHET_RESEEDED", {"wit": {0.1: 5.0}, "nofloor": {0.01: 1.0}}
    )
    monkeypatch.setattr(bench, "RATCHET_RESEED_COMMITS", {"wit": "abc1234"})
    monkeypatch.setattr(bench, "RESEED_FLOOR_VERIFIED", {})
    monkeypatch.setattr(bench, "RESEED_WATCH_RUNS", 3)
    # runs 1-2: live ratchet never beats the recorded floor -> count
    # rises silently; no sf-0.1 floor for "nofloor" -> never tracked
    assert bench.check_reseed_watch(0.1, {"wit": 5.0}) == _watch("wit", 1, 5.0)
    assert bench.check_reseed_watch(0.1, {"wit": 5.2}) == _watch("wit", 2, 5.0)
    assert "reseed floor" not in capsys.readouterr().err
    # run 3: threshold reached -> warn, naming the recorded commit
    assert bench.check_reseed_watch(0.1, {"wit": 5.0}) == _watch("wit", 3, 5.0)
    err = capsys.readouterr().err
    assert "reseed floor for 'wit'" in err and "abc1234" in err
    # state persisted in the committed sidecar, stamped with the
    # floor it counted against
    with open(bench.reseed_watch_path(0.1)) as f:
        assert json.load(f) == _watch("wit", 3, 5.0)
    # a run that BEATS the floor clears the watch: the ratchet now
    # supersedes the record and the min() yardstick self-corrects
    assert bench.check_reseed_watch(0.1, {"wit": 4.8}) == {}
    with open(bench.reseed_watch_path(0.1)) as f:
        assert json.load(f) == {}


def test_reseed_watch_resets_on_justified_refloor(tmp_path, monkeypatch, capsys):
    """A future justified reseed CHANGES the recorded floor; the old
    floor's accumulated failures must not carry over, or the watch
    warns about a floor that is one run old (r13 review finding)."""
    monkeypatch.setattr(bench, "_REPO_DIR", str(tmp_path))
    monkeypatch.setattr(bench, "RATCHET_RESEEDED", {"wit": {0.1: 5.0}})
    monkeypatch.setattr(bench, "RESEED_FLOOR_VERIFIED", {})
    monkeypatch.setattr(bench, "RESEED_WATCH_RUNS", 3)
    assert bench.check_reseed_watch(0.1, {"wit": 5.0}) == _watch("wit", 1, 5.0)
    assert bench.check_reseed_watch(0.1, {"wit": 5.0}) == _watch("wit", 2, 5.0)
    # the justified reseed raises the floor to 7.0 in the same commit
    monkeypatch.setattr(bench, "RATCHET_RESEEDED", {"wit": {0.1: 7.0}})
    # next run counts from 1 against the NEW floor — no spurious warn
    assert bench.check_reseed_watch(0.1, {"wit": 7.0}) == _watch("wit", 1, 7.0)
    assert "reseed floor" not in capsys.readouterr().err


def test_reseed_watch_verified_floor_is_exempt_per_sf(
    tmp_path, monkeypatch, capsys
):
    """A floor re-verified quiet simply IS the entry's cost — warning
    about it every run would train the operator to ignore the watch.
    Verification is PER SF: an sf0.1 adjudication says nothing about
    the sf0.01 floor, which stays under watch (r13 review finding)."""
    monkeypatch.setattr(bench, "_REPO_DIR", str(tmp_path))
    monkeypatch.setattr(
        bench, "RATCHET_RESEEDED", {"wit": {0.1: 5.0, 0.01: 1.0}}
    )
    monkeypatch.setattr(
        bench, "RESEED_FLOOR_VERIFIED", {"wit": {0.1: "perf_ab_r13.md"}}
    )
    monkeypatch.setattr(bench, "RESEED_WATCH_RUNS", 1)
    # verified at sf0.1 -> exempt there
    assert bench.check_reseed_watch(0.1, {"wit": 5.0}) == {}
    assert "reseed floor" not in capsys.readouterr().err
    # NOT verified at sf0.01 -> still watched and warns at threshold
    assert bench.check_reseed_watch(0.01, {"wit": 1.0}) == _watch("wit", 1, 1.0)
    assert "reseed floor for 'wit'" in capsys.readouterr().err


def test_reseed_watch_survives_corrupt_state(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "_REPO_DIR", str(tmp_path))
    monkeypatch.setattr(bench, "RATCHET_RESEEDED", {"wit": {0.1: 5.0}})
    monkeypatch.setattr(bench, "RESEED_FLOOR_VERIFIED", {})
    for corrupt in ("[not, a, dict", '{"wit": 3}'):  # legacy int form too
        with open(bench.reseed_watch_path(0.1), "w") as f:
            f.write(corrupt)
        # corrupt/legacy state resets the count rather than killing
        # the run
        assert bench.check_reseed_watch(0.1, {"wit": 5.0}) == _watch(
            "wit", 1, 5.0
        )


def test_retimes_tail_cap_roundtrips_through_artifact_parse():
    """VERDICT r12 optional #8: a fleet-wide burst leaving more than
    RETIMES_TAIL_MAX entries still inflated must round-trip through
    the driver artifact line as exactly the cap plus an ``_more``
    overflow count — parsed back the way the driver (json.loads on
    the tail line) reads it."""
    timings = {f"q{i:02d}": 2.0 for i in range(40)}
    n_over = bench.RETIMES_TAIL_MAX + 4
    retimes = {
        f"q{i:02d}": {"reps": [2.0, 2.1, 2.0], "ref": 0.5}
        for i in range(bench.RETIMES_TAIL_MAX)
    }
    retimes["_more"] = n_over - bench.RETIMES_TAIL_MAX
    line = bench.encode_line(timings, 0.1, n_noisy=0, retimes=retimes)
    assert len(line) <= bench.LINE_BUDGET
    payload = json.loads(line)
    got = payload["retimes"]
    assert got["_more"] == 4
    named = [k for k in got if k != "_more"]
    assert len(named) == bench.RETIMES_TAIL_MAX
    for k in named:
        assert got[k]["reps"] and got[k]["ref"] > 0
