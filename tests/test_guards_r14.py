"""Round-14 guard lanes (ADVICE r13, all three items), pinned without
Spark:

- the watch-state loader salvages PER ENTRY: one malformed sidecar
  record resets only its own count, not every healthy entry's
  accumulated state (the old single strict dict-comprehension nuked
  the whole watch on one bad row);
- the reseed-floor warning names the scale factor it fired at, so an
  sf0.01 watch escalation cannot be misread as an sf0.1 one (the
  floors and their verification are per-sf);
- ``main()`` wraps ``update_reference`` and ``check_reseed_watch`` in
  SEPARATE try blocks, so a watch failure cannot print the misleading
  "reference update failed" after the reference file was already
  written successfully.
"""

from __future__ import annotations

import ast
import inspect
import json

import bench


def _watch(name, n, floor):
    return {name: {"n": n, "floor": floor}}


def test_reseed_watch_salvages_per_entry(tmp_path, monkeypatch, capsys):
    """ADVICE r13 #3: a single malformed record must not discard the
    accumulated counts of every healthy entry."""
    monkeypatch.setattr(bench, "_REPO_DIR", str(tmp_path))
    monkeypatch.setattr(
        bench, "RATCHET_RESEEDED", {"good": {0.1: 5.0}, "bad": {0.1: 2.0}}
    )
    monkeypatch.setattr(bench, "RESEED_FLOOR_VERIFIED", {})
    monkeypatch.setattr(bench, "RESEED_WATCH_RUNS", 99)
    with open(bench.reseed_watch_path(0.1), "w") as f:
        json.dump(
            {
                "good": {"n": 7, "floor": 5.0},
                "bad": 3,  # legacy int form — malformed per-entry
            },
            f,
        )
    out = bench.check_reseed_watch(0.1, {"good": 5.0, "bad": 2.0})
    # good: count CONTINUES from the salvaged 7; bad: resets to 1
    assert out == {**_watch("good", 8, 5.0), **_watch("bad", 1, 2.0)}
    err = capsys.readouterr().err
    assert "discarding malformed record for 'bad'" in err
    assert "'good'" not in err


def test_reseed_watch_warning_names_the_sf(tmp_path, monkeypatch, capsys):
    """Optional r13 #8 tail: floors are recorded and verified PER SF,
    so the escalation text must say which sf's floor went unbeaten —
    otherwise an sf0.01 warning reads as an sf0.1 regression."""
    monkeypatch.setattr(bench, "_REPO_DIR", str(tmp_path))
    monkeypatch.setattr(
        bench, "RATCHET_RESEEDED", {"wit": {0.1: 5.0, 0.01: 1.5}}
    )
    monkeypatch.setattr(bench, "RESEED_FLOOR_VERIFIED", {})
    monkeypatch.setattr(bench, "RESEED_WATCH_RUNS", 1)
    bench.check_reseed_watch(0.01, {"wit": 1.5})
    err = capsys.readouterr().err
    assert "sf=0.01" in err and "1.5" in err
    bench.check_reseed_watch(0.1, {"wit": 5.0})
    err = capsys.readouterr().err
    assert "sf=0.1" in err and "sf=0.01" not in err


def test_reseed_watch_annotation_matches_persisted_shape():
    """ADVICE r13 #1: the annotation said dict[str, int] while the
    function returns (and persists) {entry: {'n': int, 'floor':
    float}} — the int form is what the loader treats as legacy/
    corrupt."""
    hints = inspect.signature(bench.check_reseed_watch).return_annotation
    assert hints == "dict[str, dict]"


def _try_calls(fn):
    """Map each top-level Try block in ``fn`` to the attribute names
    called anywhere inside it."""
    tree = ast.parse(inspect.getsource(fn))
    out = []
    for node in ast.walk(tree):
        if isinstance(node, ast.Try):
            names = {
                n.func.attr if isinstance(n.func, ast.Attribute)
                else getattr(n.func, "id", None)
                for n in ast.walk(node)
                if isinstance(n, ast.Call)
            }
            out.append(names)
    return out


def test_quiet_sweep_sidecar_suffix_follows_sf_dir(monkeypatch):
    """tools/quiet_sweep.py (the committed measurement protocol) must
    read the SAME per-sf detail sidecar bench.py writes for the run's
    scale factor — reading the sf0.1 host block while sweeping sf0.01
    would accept/reject runs on another run's steal figure."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "quiet_sweep",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tools", "quiet_sweep.py"),
    )
    qs = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(qs)
    monkeypatch.setattr(qs, "SF_DIR", "/root/testdata/sf0.01")
    assert qs.sf_suffix() == "0.01"
    monkeypatch.setattr(qs, "SF_DIR", None)
    monkeypatch.delenv("SPARK_GRAFT_SF_DIR", raising=False)
    assert qs.sf_suffix() == "0.1"
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    assert qs.sf_suffix() == "0.001"


def test_main_isolates_watch_failures_from_reference_failures():
    """ADVICE r13 #2: check_reseed_watch must not share
    update_reference's try block, or a watch failure prints
    'reference update failed' about a reference that was written
    fine."""
    blocks = _try_calls(bench.main)
    ref_blocks = [b for b in blocks if "update_reference" in b]
    watch_blocks = [b for b in blocks if "check_reseed_watch" in b]
    assert ref_blocks and watch_blocks
    for b in ref_blocks:
        assert "check_reseed_watch" not in b, (
            "check_reseed_watch shares update_reference's try block — "
            "their failure diagnostics are conflated again"
        )
