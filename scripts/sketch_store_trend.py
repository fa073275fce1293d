"""Sketch-store growth trend with BUILD vs ESTIMATE split (VERDICT r8
item 6): the KMV set-op matrix and the quantile-anchor rollup claim
corpus-size independence AFTER the store build — estimates run on
|groups| x k persisted summary rows, never raw data. This measures both
phases separately at every generated tier through sf100 so the claim is
evidenced the way the eval family's five decades are: build wall may
grow with the corpus (one scan + one keyed shuffle), estimate wall must
stay flat.

Each tier runs in a fresh JVM (same rationale as scale_trend.py). The
store is materialized (eager localCheckpoint) between the phases so the
estimate timing cannot silently re-run the build.

Usage: python scripts/sketch_store_trend.py [--tiers sf10,sf100] > SCALE_TREND_R9_SKETCH.json
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
    ("sf0.01", os.path.join(REPO, ".scaledata", "sf0.01"), 1),
    ("sf0.1", os.path.join(REPO, ".scaledata", "sf0.1"), 10),
    ("sf1", os.path.join(REPO, ".scaledata", "sf1"), 100),
    ("sf10", os.path.join(REPO, ".scaledata", "sf10"), 1000),
    ("sf100", os.path.join(REPO, ".scaledata", "sf100"), 10000),
]


def run_tier(sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from epic_pandas_spark.operators.sketches import (
        kmv_setops_matrix,
        kmv_sketches,
        quantile_anchor_rollup,
        quantile_anchor_sketches,
    )
    from epic_pandas_spark.session import get_spark, load_table

    spark = get_spark(app_name="sketch_store_trend")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()  # warm footers

    def h60(c):
        return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")

    out: dict = {}

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & F.col("lang").isNotNull()
    )
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    t0 = time.monotonic()
    store = kmv_sketches(docs, ["lang"], norm, k=128, hash_expr=h60).localCheckpoint(
        eager=True  # materialize: the estimate phase must not re-run the scan
    )
    out["kmv_store_rows"] = store.count()
    out["kmv_build_sec"] = round(time.monotonic() - t0, 3)
    t0 = time.monotonic()
    out["kmv_matrix_rows"] = kmv_setops_matrix(store, ["lang"], 128, hash_bits=60).count()
    out["kmv_estimate_sec"] = round(time.monotonic() - t0, 3)

    docs_q = load_table(spark, sf_dir, "documents").filter(
        F.col("n_chars").isNotNull() & F.col("lang").isNotNull()
    )
    t0 = time.monotonic()
    qstore = quantile_anchor_sketches(docs_q, ["lang"], "n_chars", q=64).localCheckpoint(
        eager=True
    )
    out["anchor_store_rows"] = qstore.count()
    out["anchor_build_sec"] = round(time.monotonic() - t0, 3)
    t0 = time.monotonic()
    out["anchor_rollup_rows"] = quantile_anchor_rollup(
        qstore, [], [0.25, 0.5, 0.75, 0.9, 0.99], q=64
    ).count()
    out["anchor_estimate_sec"] = round(time.monotonic() - t0, 3)
    return out


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
    evidence_lock.acquire("sketch_store_trend")
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
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--tier", sf_dir],
            capture_output=True, text=True, check=True,
        )
        tiers[label] = {"rows_multiplier": mult, **_last_json(proc.stdout)}
        print(f"{label}: {tiers[label]}", file=sys.stderr)
    report = {
        "queries": ["kmv_setops_matrix", "quantile_anchor_rollup"],
        "tiers": tiers,
        "note": (
            "build wall scales with the corpus (one scan + one keyed "
            "shuffle of k-bounded per-group state); estimate wall runs on "
            "the materialized |groups| x k store only and must stay flat "
            "across all five decades — that flatness IS the "
            "corpus-size-independence claim, measured."
        ),
    }
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
