"""In-session interleaved A/B of quality_classifier_train's weight-state
transport (VERDICT r11 item 2): literal-array vs broadcast-join, BOTH
forms live in the committed code and are selected by
``_W_LITERAL_MAX_BUCKETS``, so one session can alternate them strictly —
the only protocol that cancels this host's co-tenant drift AND measures
the 32-core in-session regime the driver actually scores (the r11 n=4
fresh-JVM A/B had 2x spread and missed the scored doubling).

Usage:
    SPARK_GRAFT_CPUS=32 python scripts/qct_ab.py --n 8 > QCT_AB_R12.json
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

import evidence_lock  # noqa: E402


def main() -> None:
    evidence_lock.acquire("qct_ab")
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--query", default="quality_classifier_train")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from epic_pandas_spark.extensions import curation
    from epic_pandas_spark.plans.registry import REGISTRY
    from epic_pandas_spark.session import get_spark

    spark = get_spark(app_name="qct_ab")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    fn = REGISTRY[args.query][0]
    default_bound = curation._W_LITERAL_MAX_BUCKETS

    def run_once(mode: str) -> float:
        curation._W_LITERAL_MAX_BUCKETS = default_bound if mode == "literal" else 0
        spark.sparkContext.setJobDescription(f"qct_ab:{mode}")
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        sec = round(time.perf_counter() - t0, 4)
        for rdd in dict(spark.sparkContext._jsc.getPersistentRDDs()).values():
            rdd.unpersist(True)
        return sec

    # warm both paths once (codegen compile, Arrow init) — not recorded
    for mode in ("literal", "broadcast"):
        run_once(mode)
    samples = {"literal": [], "broadcast": []}
    for i in range(args.n):
        for mode in ("literal", "broadcast"):
            sec = run_once(mode)
            samples[mode].append(sec)
            print(f"run {i} {mode}: {sec}", file=sys.stderr)
    curation._W_LITERAL_MAX_BUCKETS = default_bound
    med = {k: round(statistics.median(v), 4) for k, v in samples.items()}
    print(
        json.dumps(
            {
                "protocol": (
                    f"one session, {args.n} strictly alternated runs per side "
                    "after a 1-run warmup per side, noop sink, unpersist "
                    "between runs; literal/broadcast selected via "
                    "_W_LITERAL_MAX_BUCKETS"
                ),
                "cpus": os.environ.get("SPARK_GRAFT_CPUS", "*"),
                "query": args.query,
                "samples": samples,
                "median": med,
                "ratio_literal_over_broadcast": round(
                    med["literal"] / med["broadcast"], 3
                )
                if med["broadcast"]
                else None,
            },
            indent=1,
        )
    )


if __name__ == "__main__":
    main()
