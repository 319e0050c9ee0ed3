#!/usr/bin/env python
"""Run bench.py only on a quiet host window; retry until a quiet run.

This is the measurement protocol behind every committed bench sidecar
since round 12 (previously an untracked /tmp script; promoted into
the repo in round 14 so the protocol is reproducible):

- Between attempts, wait for 3 consecutive 20 s windows of observed
  steal < 0.2 % before launching (a launch gate — it cannot exclude
  bursts that arrive mid-run; the per-run acceptance below catches
  those from the sidecar's own host block).
- A run is ACCEPTED when the sidecar's host window shows
  steal < 0.5 % AND the artifact's noisy count <= 1.
- Every completed run tightens the committed ratchet
  (bench_reference_sf*.json) regardless of acceptance — bursty
  windows still contribute bests on the entries the burst missed —
  so rejected attempts are never wasted.

Usage:
    python tools/quiet_sweep.py [max_attempts] [tag] [sf_dir]

    max_attempts  default 4
    tag           log-file tag under /tmp (default "sweep")
    sf_dir        value for SPARK_GRAFT_SF_DIR (default: bench.py's
                  default, /root/testdata/sf0.1)

Logs land in /tmp/bench_<tag>_a<N>_{stdout,stderr}.log. Exit 0 on an
accepted run, 2 when attempts are exhausted (the last sidecar is
still on disk for adjudication — see perf_ab_r14.md for a day where
no quiet window existed and the per-entry evidence carried the
round).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# defaults; overridden from argv in the __main__ block only (this
# module is importable by tests, whose argv is not ours to parse)
MAX_ATTEMPTS = 4
TAG = "sweep"
SF_DIR: str | None = None

# acceptance thresholds (see module docstring)
ACCEPT_STEAL_PCT = 0.5
ACCEPT_NOISY = 1
# launch gate: consecutive quiet pre-watch windows required
PREWATCH_WINDOWS = 3
PREWATCH_SECONDS = 20
PREWATCH_STEAL_PCT = 0.2


def steal_window(seconds: int = PREWATCH_SECONDS) -> float:
    def snap():
        with open("/proc/stat") as f:
            return list(map(int, f.readline().split()[1:]))

    a = snap()
    time.sleep(seconds)
    b = snap()
    d = [y - x for x, y in zip(a, b)]
    return 100.0 * d[7] / sum(d)


# launch-gate cap (ADVICE r14): never watch more than this many
# windows per attempt — on a persistently loaded host the wrapper
# used to hang before attempt 1 and max_attempts never bounded
# wall-clock. When the cap trips we launch anyway; the per-run
# acceptance still rejects a noisy result, so exit 2 stays reachable.
PREWATCH_MAX_WINDOWS = 30


def wait_quiet() -> None:
    quiet = watched = 0
    while quiet < PREWATCH_WINDOWS:
        if watched >= PREWATCH_MAX_WINDOWS:
            print(
                f"[watch] no quiet window in {watched} windows — "
                "launching anyway (acceptance will judge)",
                flush=True,
            )
            return
        s = steal_window()
        watched += 1
        quiet = quiet + 1 if s < PREWATCH_STEAL_PCT else 0
        print(f"[watch] steal {s:.2f}% quiet_windows={quiet}", flush=True)


def sf_suffix() -> str:
    """The sidecar filename suffix bench.py will write for this run —
    bench.py's EXACT derivation (rsplit('sf', 1) + float-normalize),
    not a basename prefix strip (ADVICE r14: 'sf0.10' or a mid-path
    'sf' made the two disagree and the wrapper read a wrong file)."""
    sf_dir = SF_DIR or os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        return str(float(sf))
    except ValueError:
        return sf


def main() -> int:
    env = dict(os.environ)
    if SF_DIR:
        env["SPARK_GRAFT_SF_DIR"] = SF_DIR
    detail = os.path.join(REPO, f"bench_detail_sf{sf_suffix()}.json")
    for attempt in range(1, MAX_ATTEMPTS + 1):
        wait_quiet()
        print(f"[attempt {attempt}] launching bench.py", flush=True)
        out_path = f"/tmp/bench_{TAG}_a{attempt}_stdout.log"
        err_path = f"/tmp/bench_{TAG}_a{attempt}_stderr.log"
        t_launch = time.time()
        with open(out_path, "w") as out, open(err_path, "w") as err:
            rc = subprocess.call(
                [sys.executable, "bench.py"],
                stdout=out, stderr=err, cwd=REPO, env=env,
            )
        # a crashed/empty/non-JSON run counts as a REJECTED attempt,
        # not a wrapper crash (ADVICE r14): log and move on
        try:
            line = open(out_path).read().strip().splitlines()[-1]
            d = json.loads(line)
        except (IndexError, json.JSONDecodeError, OSError) as e:
            print(
                f"[attempt {attempt}] rc={rc} rejected: no parseable "
                f"JSON line ({e!r}) — see {err_path}",
                flush=True,
            )
            continue
        # trust the detail sidecar's host block only if THIS run wrote
        # it (ADVICE r14: a failed sidecar write or fresh checkout
        # otherwise reads a stale/missing file)
        host = {}
        try:
            if os.path.getmtime(detail) >= t_launch:
                host = json.load(open(detail)).get("host", {})
            else:
                print(
                    f"[attempt {attempt}] detail sidecar is stale "
                    "(predates launch) — treating steal as unknown",
                    flush=True,
                )
        except (OSError, json.JSONDecodeError) as e:
            print(
                f"[attempt {attempt}] detail sidecar unreadable "
                f"({e!r}) — treating steal as unknown",
                flush=True,
            )
        print(
            f"[attempt {attempt}] rc={rc} total={d['value']} "
            f"noisy={d['noisy']} steal={host.get('steal_pct')} "
            f"retimes={len(d.get('retimes', {}))}",
            flush=True,
        )
        if (
            rc == 0
            and d["noisy"] <= ACCEPT_NOISY
            and float(host.get("steal_pct", 9)) < ACCEPT_STEAL_PCT
        ):
            print(f"[accepted] attempt {attempt}", flush=True)
            return 0
    print("[exhausted] no quiet run", flush=True)
    return 2


if __name__ == "__main__":
    if len(sys.argv) > 1:
        MAX_ATTEMPTS = int(sys.argv[1])
    if len(sys.argv) > 2:
        TAG = sys.argv[2]
    if len(sys.argv) > 3:
        SF_DIR = sys.argv[3]
    sys.exit(main())
