"""Strict-interleave A/B for optimization-round changes: baseline tree
(a git worktree of the pre-change commit) vs the current tree, N
alternating fresh-JVM solo runs per side per query, warm second
execution recorded (SPARK_GRAFT_BENCH_REPEAT=2). Same protocol as
scripts/q20_ab.py, generalized to any query list and any baseline
checkout — the only timing methodology that separates code effects from
this host's co-tenant drift (round 11 measured the fixed numpy-GEMM
baseline swinging 0.95s -> 6.3s between runs on the SAME idle box).

Usage:
    git worktree add /tmp/ab_base <baseline-sha>
    python scripts/opt_ab.py --base /tmp/ab_base --n 3 q1,q2 > AB.json
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

import evidence_lock  # noqa: E402


def run_once(side_dir: str, query: str) -> float:
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    env["SPARK_GRAFT_BENCH_ONLY"] = query
    env["SPARK_GRAFT_BENCH_REPEAT"] = "2"
    env["PYTHONPATH"] = side_dir
    proc = subprocess.run(
        [sys.executable, os.path.join(side_dir, "bench.py")],
        capture_output=True, text=True, env=env, cwd=side_dir,
    )
    if proc.returncode != 0:
        # a run that printed JSON and then crashed (or died mid-way) must
        # not record a timing into the A/B medians (ADVICE r11)
        raise RuntimeError(
            f"bench.py in {side_dir} exited {proc.returncode}: {proc.stderr[-800:]}"
        )
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(
            f"bench.py in {side_dir} produced no JSON: {proc.stderr[-800:]}"
        )
    return json.loads(lines[-1])["queries"][query]


def main() -> None:
    evidence_lock.acquire("opt_ab")
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", help="comma-separated registry names")
    ap.add_argument("--base", required=True, help="baseline tree dir")
    ap.add_argument("--n", type=int, default=3)
    args = ap.parse_args()

    out = {}
    for query in args.queries.split(","):
        samples = {"base": [], "cur": []}
        for i in range(args.n):
            for side, d in (("base", args.base), ("cur", REPO)):
                sec = run_once(d, query)
                samples[side].append(round(sec, 4))
                print(f"{query} run {i} {side}: {sec}", file=sys.stderr)
        med = {k: round(statistics.median(v), 4) for k, v in samples.items()}
        out[query] = {
            "samples": samples,
            "median": med,
            "ratio_cur_over_base": round(med["cur"] / med["base"], 3)
            if med["base"]
            else None,
        }
    print(json.dumps({
        "protocol": (
            f"{args.n} alternating fresh-JVM solo runs per side per query, "
            "warm second execution (SPARK_GRAFT_BENCH_REPEAT=2), strict "
            "interleave so host drift hits both sides"
        ),
        "results": out,
    }, indent=1))


if __name__ == "__main__":
    main()
