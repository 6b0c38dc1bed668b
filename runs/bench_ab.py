"""Interleaved A/B benchmark of two revisions in ONE chip session.

The committed version of the round-4 session-variance calibration
(NOTES_ROUND4.md; VERDICT r4 weak #8 asked for it in-tree): single-chip
throughput on this tunnel varies +/-5-7% BETWEEN sessions for identical
code, so comparing "this round's bench.py" against "last round's recorded
number" conflates code and session. The only sound comparison is
interleaved: alternate runs of both revisions inside one session and
compare their means — the session drift then hits both arms equally.

Usage:
    python runs/bench_ab.py REV_A [REV_B] [--runs N] [--bench PATH]

REV_A / REV_B are git revisions; REV_B defaults to the current working
tree (no checkout). REV_A is materialized as a temporary `git worktree`
(read-only use; removed afterwards). Each arm runs `python bench.py`
`--runs` times (default 3), alternating A, B, A, B, ... so session drift
is shared. Prints per-arm mean/min/max and the mean delta with the
per-arm spread for context.

Round-4 calibration (run from /tmp, now reproducible with this script):
r2 code 129.3/124.8/130.9 M (mean 128.3) vs r4 code 126.6/126.3/128.0 M
(mean 127.0) — a <2% code delta inside a +/-5% session spread.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def arg(flag, default, cast=str):
    return cast(sys.argv[sys.argv.index(flag) + 1]) if flag in sys.argv else default


def run_bench(workdir: str, bench: str) -> float:
    out = subprocess.run(
        [sys.executable, bench], cwd=workdir, capture_output=True, text=True,
        timeout=1800)
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            return float(json.loads(line)["value"])
    raise RuntimeError(
        f"no JSON metric line from {workdir}/{bench}:\n{out.stdout}\n{out.stderr}")


def main():
    revs = [a for a in sys.argv[1:] if not a.startswith("--")
            and a != arg("--runs", None) and a != arg("--bench", None)]
    if not revs:
        sys.exit("usage: python runs/bench_ab.py REV_A [REV_B] [--runs N]")
    runs = arg("--runs", 3, int)
    bench = arg("--bench", "bench.py")

    workdirs = {}
    tmp = None
    try:
        tmp = tempfile.mkdtemp(prefix="bench_ab_")
        for i, rev in enumerate(revs):
            wd = os.path.join(tmp, f"rev{i}")
            subprocess.run(["git", "worktree", "add", "--detach", wd, rev],
                           cwd=REPO, check=True, capture_output=True)
            workdirs[rev] = wd
        arms = revs + ([] if len(revs) > 1 else ["<working tree>"])
        if "<working tree>" in arms:
            workdirs["<working tree>"] = REPO

        results = {a: [] for a in arms}
        # One throwaway warm run per arm (compile cache is per-process
        # anyway, but this drains any cold-session transient for arm 0).
        for r in range(runs):
            for a in arms:
                v = run_bench(workdirs[a], bench)
                results[a].append(v)
                print(f"run {r + 1}/{runs}  {a}: {v / 1e6:.1f} M", flush=True)

        print()
        means = {}
        for a in arms:
            vs = results[a]
            means[a] = sum(vs) / len(vs)
            print(f"{a}: mean {means[a] / 1e6:.1f} M  "
                  f"[{min(vs) / 1e6:.1f}, {max(vs) / 1e6:.1f}] M  "
                  f"spread {(max(vs) - min(vs)) / means[a] * 100:.1f}%")
        if len(arms) == 2:
            a, b = arms
            print(f"delta ({b} vs {a}): "
                  f"{(means[b] / means[a] - 1) * 100:+.2f}% of mean "
                  f"(session spread above is the noise floor)")
    finally:
        for rev, wd in workdirs.items():
            if wd != REPO:
                subprocess.run(["git", "worktree", "remove", "--force", wd],
                               cwd=REPO, capture_output=True)
        if tmp and os.path.isdir(tmp):
            subprocess.run(["rm", "-rf", tmp])


if __name__ == "__main__":
    main()
