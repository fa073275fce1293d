"""Interleaved same-session A/B for tpch_q20 (VERDICT r10 "what's wrong"
#5: the one unattributed solo-confirmed mover, 0.98 -> 1.47s solo between
the round-9 and round-10 maps with no change to tpch.py).

Protocol — the same discipline as BENCH_AB_R10, tightened: N alternating
fresh-JVM solo runs per side (r9 checkout in .ab/r9 vs the current tree),
each run records the WARM second execution (SPARK_GRAFT_BENCH_REPEAT=2),
A/B/A/B ordering so co-tenant drift hits both sides equally. Medians +
all samples go to the artifact; a normalized ratio inside [1/1.25, 1.25]
clears the mover as host noise, outside it names a code-level cause to
chase.

Usage: python scripts/q20_ab.py [--n 6] [--query tpch_q20] > Q20_AB_R11.json
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

import evidence_lock  # noqa: E402

SIDES = {
    "r9": os.path.join(REPO, ".ab", "r9"),
    "cur": REPO,
}


def run_once(side_dir: str, query: str) -> float:
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    env["SPARK_GRAFT_BENCH_ONLY"] = query
    env["SPARK_GRAFT_BENCH_REPEAT"] = "2"
    env["PYTHONPATH"] = side_dir
    proc = subprocess.run(
        [sys.executable, os.path.join(side_dir, "bench.py")],
        capture_output=True, text=True, env=env, cwd=side_dir,
    )
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(
            f"bench.py in {side_dir} produced no JSON: {proc.stderr[-800:]}"
        )
    data = json.loads(lines[-1])
    return data["queries"][query]


def main() -> None:
    evidence_lock.acquire("q20_ab")
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=6)
    ap.add_argument("--query", default="tpch_q20")
    args = ap.parse_args()

    samples: dict[str, list[float]] = {k: [] for k in SIDES}
    for i in range(args.n):
        for side, d in SIDES.items():  # strict A/B/A/B interleave
            sec = run_once(d, args.query)
            samples[side].append(sec)
            print(f"run {i} {side}: {sec}", file=sys.stderr)

    med = {k: round(statistics.median(v), 4) for k, v in samples.items()}
    ratio = round(med["cur"] / med["r9"], 3) if med["r9"] else None
    verdict = (
        "cleared: within noise band — the r10 solo elevation does not "
        "reproduce under interleaving"
        if ratio is not None and 0.8 <= ratio <= 1.25
        else "reproduces: cur is a confirmed mover vs r9 — needs a named cause"
    )
    print(json.dumps({
        "query": args.query,
        "protocol": (
            f"{args.n} alternating fresh-JVM solo runs per side, warm "
            "second execution recorded (SPARK_GRAFT_BENCH_REPEAT=2), "
            "strict interleave so host drift hits both sides"
        ),
        "r9_sha": "a5c89fa",
        "samples": {k: [round(x, 4) for x in v] for k, v in samples.items()},
        "median": med,
        "ratio_cur_over_r9": ratio,
        "verdict": verdict,
    }, indent=1))


if __name__ == "__main__":
    main()
