"""remove_repeated_spans growth trend (VERDICT r8 "what's wrong" item 2):
time the exact-substring rewrite — winnowing prefilter + single-shuffle
window doc-freq, the round-9 shape — at each generated tier, with the
same duplicated-corpus construction as the registry query (every 7th doc
re-appended). The round-8 sf100 row was null (per-char gram sort spilled
past the node's scratch); this measures the tier that failure blocked.

Each tier runs in a fresh JVM. Output aggregates (docs, removed chars,
kept chars) are recorded so every tier's result is also a cross-tier
sanity check against the DuckDB-oracled semantics.

Usage: python scripts/spans_trend.py [--tiers sf1,sf10] > SCALE_TREND_R9_SPANS.json
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

import evidence_lock  # noqa: E402  (scripts/ is sys.path[0] when run as a file)

TIERS = [
    ("sf0.1", os.path.join(REPO, ".scaledata", "sf0.1"), 1),
    ("sf1", os.path.join(REPO, ".scaledata", "sf1"), 10),
    ("sf10", os.path.join(REPO, ".scaledata", "sf10"), 100),
    ("sf100", os.path.join(REPO, ".scaledata", "sf100"), 1000),
]


def run_tier(sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from epic_pandas_spark.extensions.dedup import remove_repeated_spans
    from epic_pandas_spark.session import get_spark

    spark = get_spark(app_name="spans_trend")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    dups = docs.filter(F.col("doc_id") % 7 == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(1000000)
    )
    u = docs.unionByName(dups)
    n_in = u.count()  # warms footers too
    t0 = time.monotonic()
    out = remove_repeated_spans(u, "text", "doc_id", min_len=50, keep_first=True)
    row = out.agg(
        F.sum("n_removed_chars").alias("rm"),
        F.sum(F.length("cleaned")).alias("kept"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    return {
        "n_input_docs": n_in,
        "n_out": row["n"],
        "sum_removed_chars": row["rm"],
        "sum_kept_chars": row["kept"],
        "wall_sec": round(time.monotonic() - t0, 2),
    }


def _last_json(stdout: str) -> dict:
    """Parse the child's result line: the JVM can print warnings to stdout
    (e.g. incubator-module notices under a larger heap), so take the LAST
    line that parses as a JSON object."""
    for line in reversed(stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except ValueError:
                continue
    raise ValueError(f"no JSON line in child stdout: {stdout[-500:]!r}")


def main() -> None:
    evidence_lock.acquire("spans_trend")
    if len(sys.argv) > 2 and sys.argv[1] == "--tier":
        print(json.dumps(run_tier(sys.argv[2])))
        return
    only = None
    if len(sys.argv) > 2 and sys.argv[1] == "--tiers":
        only = set(sys.argv[2].split(","))
    tiers: dict[str, dict] = {}
    for label, sf_dir, mult in TIERS:
        if only is not None and label not in only:
            continue
        if not os.path.isdir(sf_dir):
            print(f"skip {label}: {sf_dir} missing", file=sys.stderr)
            continue
        env = dict(os.environ)
        if label == "sf100":
            # size the heap to the tier (session.py documents the knob);
            # 16g default leaves ~300MB execution memory per task under
            # 32-way concurrency, which this tier's window sort outgrows
            env.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--tier", sf_dir],
            capture_output=True, text=True, check=True, env=env,
        )
        tiers[label] = {"rows_multiplier": mult, **_last_json(proc.stdout)}
        print(f"{label}: {tiers[label]}", file=sys.stderr)
    base_label = next(iter(tiers), None)
    if base_label:
        base = tiers[base_label]
        for label, t in tiers.items():
            if label != base_label:
                t[f"wall_ratio_vs_{base_label}"] = round(
                    t["wall_sec"] / base["wall_sec"], 2
                )
    report = {
        "query": "remove_repeated_spans",
        "tiers": tiers,
        "note": (
            "round-9 shape: lossless winnowing prefilter (narrow numpy "
            "fingerprints -> candidate docs only enter the per-char "
            "stream) + single-shuffle window doc-freq (dense_rank max "
            "replaces the aggregate+join that shuffled the per-char "
            "stream twice). Round 8's sf100 row was null (disk ceiling); "
            "sf100 runs with SPARK_GRAFT_DRIVER_MEM=48g — a probe-level "
            "sizing knob, not an operator change."
        ),
    }
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
