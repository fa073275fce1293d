"""Single-gate evidence freshness (VERDICT r7 item 4): regenerate every
per-round evidence artifact from one entrypoint and REFUSE to finish
green if any artifact's query count differs from the live registry's —
the mechanical fix for three straight rounds of one-artifact-behind lag
(r5: oracle; r6: robustness; r7: the sf0.1 bench map missing the two
newest queries).

Stages (each in a fresh process, same rationale as scale_trend):
  1. ORACLE_CHECK.json         oracle_check.py @ sf0.01
  2. ORACLE_CHECK_SF01.json    oracle_check.py @ sf0.1
  3. ROBUSTNESS.json           robustness_probe.py
  4. BENCH_R{N}_SF01.json      bench_map.py (solo-confirm protocol)
  5. PLAN_AUDIT.md             plan_audit.py
then a freshness audit: every artifact must cover exactly the registry's
query set. Exit 0 only if all stages succeeded AND all counts line up.
tests/test_evidence_freshness.py re-reads the committed artifacts and
fails CI on the same condition, so a stale artifact can't be committed
silently.

Usage:
    python scripts/refresh_evidence.py --bench-out BENCH_R8_SF01.json \
        [--prev BENCH_R7_SF01.json] [--skip oracle_sf01,robustness,...]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

import evidence_lock  # noqa: E402  (scripts/ is sys.path[0] when run as a file)


def registry_names() -> set[str]:
    from epic_pandas_spark.plans.registry import REGISTRY

    return set(REGISTRY)


def artifact_names(path: str) -> set[str] | None:
    """The query-name set an evidence artifact covers, or None if the
    file is missing/unreadable. Handles each artifact's shape."""
    full = os.path.join(REPO, path)
    if not os.path.exists(full):
        return None
    if path.endswith(".md"):  # PLAN_AUDIT.md: one `| name |` row per query
        names = set()
        with open(full) as f:
            for line in f:
                if line.startswith("| ") and not line.startswith("| ---"):
                    cell = line.split("|")[1].strip().strip("`")
                    if cell and cell not in ("query", ""):
                        names.add(cell)
        return names
    with open(full) as f:
        data = json.load(f)
    if "queries" in data and isinstance(data["queries"], dict):
        return set(data["queries"])
    if "results" in data and isinstance(data["results"], dict):
        return set(data["results"])
    if "counts" in data and isinstance(data["counts"], dict):
        return set(data["counts"])
    # flat {name: {...}} map (driver CORRECTNESS shape)
    return {k for k, v in data.items() if isinstance(v, dict)}


def audit(bench_out: str) -> list[str]:
    """Freshness failures: artifact -> missing/extra names vs registry.
    ROBUSTNESS.json carries only a count (no per-query map), so it is
    checked on n_queries; every other artifact is checked name-by-name."""
    reg = registry_names()
    problems = []
    for path in [
        "ORACLE_CHECK.json",
        "ORACLE_CHECK_SF01.json",
        bench_out,
        "PLAN_AUDIT.md",
    ]:
        names = artifact_names(path)
        if names is None:
            problems.append(f"{path}: missing")
            continue
        missing = reg - names
        # bench.py times the self-witnessing twins of the approx sketches as
        # separate `*_witness` rows; they are bench-only, not registry names
        extra = {n for n in names - reg if not n.endswith("_witness")}
        if missing:
            problems.append(f"{path}: missing {sorted(missing)}")
        if extra:
            problems.append(f"{path}: stale extras {sorted(extra)}")
    rob = os.path.join(REPO, "ROBUSTNESS.json")
    if not os.path.exists(rob):
        problems.append("ROBUSTNESS.json: missing")
    else:
        with open(rob) as f:
            data = json.load(f)
        if data.get("n_queries") != len(reg):
            problems.append(
                f"ROBUSTNESS.json: n_queries={data.get('n_queries')} "
                f"!= registry {len(reg)}"
            )
    return problems


def sync_coverage_md() -> None:
    """Rewrite COVERAGE.md's 'full-registry oracle harness' row from the
    freshly generated ORACLE_CHECK.json, so the prose can never go stale
    again (round-9 VERDICT 'what's wrong' item 1);
    tests/test_evidence_freshness.py asserts the numbers agree."""
    oc = os.path.join(REPO, "ORACLE_CHECK.json")
    cov = os.path.join(REPO, "COVERAGE.md")
    if not (os.path.exists(oc) and os.path.exists(cov)):
        return
    with open(oc) as f:
        data = json.load(f)
    row = (
        "| full-registry oracle harness | scripts/oracle_check.py -> "
        "ORACLE_CHECK.json (committed evidence for ALL queries, not the "
        f"driver's sample) | ORACLE_CHECK.json: {len(data['results'])} "
        f"queries — {data['n_match']} oracle hash-match, "
        f"{data['n_rows_only']} rows-only, {data['n_fail']} fail at "
        "sf0.01 (+ ORACLE_CHECK_SF01.json at sf0.1) |"
    )
    with open(cov) as f:
        lines = f.read().splitlines()
    for i, ln in enumerate(lines):
        if "full-registry oracle harness" in ln:
            lines[i] = row
            break
    with open(cov, "w") as f:
        f.write("\n".join(lines) + "\n")


def run(cmd: list[str], label: str) -> None:
    print(f"== {label}: {' '.join(cmd)}", file=sys.stderr, flush=True)
    subprocess.run(cmd, check=True, cwd=REPO)


def main() -> int:
    evidence_lock.acquire("refresh_evidence")
    ap = argparse.ArgumentParser()
    ap.add_argument("--bench-out", required=True, help="e.g. BENCH_R8_SF01.json")
    ap.add_argument("--prev", default=None, help="previous bench map for solo-confirm")
    ap.add_argument("--skip", default="", help="comma list: oracle,oracle_sf01,"
                    "robustness,bench,plan_audit (audit always runs)")
    args = ap.parse_args()
    skip = set(filter(None, args.skip.split(",")))
    py = sys.executable

    if "oracle" not in skip:
        run([py, "scripts/oracle_check.py", "--out", "ORACLE_CHECK.json"], "oracle sf0.01")
    if "oracle_sf01" not in skip:
        run(
            [py, "scripts/oracle_check.py", "--sf-dir", "/root/testdata/sf0.1",
             "--out", "ORACLE_CHECK_SF01.json"],
            "oracle sf0.1",
        )
    if "robustness" not in skip:
        # the probe prints its JSON line to stdout; capture it to the artifact
        print("== robustness: scripts/robustness_probe.py", file=sys.stderr, flush=True)
        with open(os.path.join(REPO, "ROBUSTNESS.json"), "w") as f:
            subprocess.run(
                [py, "scripts/robustness_probe.py"], check=True, cwd=REPO, stdout=f
            )
    if "bench" not in skip:
        cmd = [py, "scripts/bench_map.py", "--out", args.bench_out]
        if args.prev:
            cmd += ["--prev", args.prev]
        run(cmd, "bench map sf0.1")
    if "plan_audit" not in skip:
        run([py, "scripts/plan_audit.py"], "plan audit")

    sync_coverage_md()
    problems = audit(args.bench_out)
    if problems:
        print("FRESHNESS FAIL:", file=sys.stderr)
        for p in problems:
            print(f"  {p}", file=sys.stderr)
        return 1
    n = len(registry_names())
    print(f"FRESHNESS OK: all artifacts cover the full {n}-query registry")
    return 0


if __name__ == "__main__":
    sys.exit(main())
