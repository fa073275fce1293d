"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed end-to-end including the action: a write to Spark's
built-in `noop` sink, which materializes EVERY output column without
collecting to the driver. A plain `df.count()` would let Catalyst prune
projection-only queries down to a parquet row count (e.g. the regex/CASE
chains of q_lang_id / q_pii_scrub would never execute); the noop sink
forces the full plan.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from epic_pandas_spark.session import get_spark
    from epic_pandas_spark.plans.registry import REGISTRY

    spark = get_spark(app_name="epic_pandas_spark_bench")

    # warm the JVM + parquet footers once so per-query numbers measure the
    # queries, not session startup
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    timings: dict[str, float] = {}
    failed: list[str] = []
    for name, (fn, _sql) in sorted(REGISTRY.items()):
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            # noop sink: full evaluation of all output columns, zero I/O,
            # nothing collected to the driver; immune to count-pruning
            df.write.format("noop").mode("overwrite").save()
        except Exception as e:  # keep the bench line parseable even on a failure
            print(f"bench: query {name} failed: {e}", file=sys.stderr)
            failed.append(name)
            continue
        timings[name] = round(time.perf_counter() - t0, 4)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "registry_total_runtime",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "failed": failed,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
