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


BOILER = (
    "copyright notice all rights reserved unauthorized reproduction "
    "is strictly prohibited"
)  # ~90 normalized chars -> a handful of >=50-char hot grams


def run_skew_tier(sf_dir: str) -> dict:
    """Adversarial hot-gram regime (VERDICT r9 task 2): plant one
    boilerplate sentence in 40% of docs, so a few k-grams each carry a
    0.4N-doc frequency. The round-9 window doc-freq serialized each hot
    gram's whole position stream through ONE sort task (window
    partitions can't split); the round-10 two-phase salted distinct +
    AQE-skew-join must stay flat. Runs the operator at the default
    doc_freq_salts and at salts=1 (the degenerate single-reducer count)
    and cross-checks identical outputs."""
    from pyspark.sql import functions as F

    from epic_pandas_spark.extensions.dedup import remove_repeated_spans
    from epic_pandas_spark.session import get_spark

    spark = get_spark(app_name="spans_trend_skew")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    tainted = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 < 2, F.concat_ws(" ", "text", F.lit(BOILER))
        ).otherwise(F.col("text")),
    )
    n_in = tainted.count()
    # untimed warmup: first execution pays codegen + scan warmup that
    # would otherwise bias whichever variant runs first
    remove_repeated_spans(
        tainted.limit(500), "text", "doc_id", min_len=50
    ).agg(F.sum("n_removed_chars")).collect()
    res = {}
    # forced threshold: half the planted doc-frequency, so the split
    # machinery actually routes the boiler grams at this tier's scale
    forced_min_df = max(1000, n_in // 5)
    variants = (
        ("window_only", {"hot_gram_sample": 0.0}),
        # defaults: the 1M-doc-frequency threshold is cluster-fatal-sized,
        # so the planted 40% gram (df = 0.4 * |corpus|) stays on the
        # prefiltered window at local tiers — cost is the probe only
        ("hot_split_default", {}),
        ("hot_split_forced", {"hot_gram_min_df": forced_min_df}),
    )
    for label, kw in variants:
        t0 = time.monotonic()
        out = remove_repeated_spans(tainted, "text", "doc_id", min_len=50, **kw)
        row = out.agg(
            F.sum("n_removed_chars").alias("rm"),
            F.sum(F.length("cleaned")).alias("kept"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        res[label] = {
            "wall_sec": round(time.monotonic() - t0, 2),
            "n_out": row["n"],
            "sum_removed_chars": row["rm"],
            "sum_kept_chars": row["kept"],
        }
    for label in ("hot_split_default", "hot_split_forced"):
        assert (
            res[label]["sum_removed_chars"] == res["window_only"]["sum_removed_chars"]
            and res[label]["sum_kept_chars"] == res["window_only"]["sum_kept_chars"]
        ), f"hot-gram routing changed output ({label}): {res}"

    # how many grams the product's sampling probe routes to the hot
    # path on this corpus (same helper + parameters as the operator)
    from epic_pandas_spark.extensions.dedup import (
        _normalized_text_expr,
        _position_stream,
    )

    docs_sampled = tainted.select(
        F.col("doc_id").alias("__id"),
        _normalized_text_expr(F.col("text")).alias("__t"),
    ).withColumn("__len", F.length("__t")).filter(
        F.col("__id").isNotNull() & (F.col("__len") > 0)
    ).sample(fraction=0.01, seed=7)
    # hot grams the FORCED threshold routes; the default 1M-df threshold
    # detects none at local tiers (that is the point of its sizing)
    res["forced_min_df"] = forced_min_df
    res["n_hot_grams_detected_forced"] = (
        _position_stream(docs_sampled, 50)
        .groupBy("__gh")
        .agg(F.count_distinct("__id").alias("__c"))
        .filter(F.col("__c") >= max(8, int(forced_min_df * 0.01)))
        .count()
    )

    # STAGE-LEVEL probe over the identical un-prefiltered position
    # stream: the round-9 doc-freq (gram-keyed window, dense_rank max —
    # unsplittable hot partitions) vs the rejected pure two-phase salted
    # distinct + flag join, measured through the flag decision only.
    # Probe-only reconstruction, not product code; exists so the
    # hot-gram regime is attributed mechanically, not argued.
    from pyspark.sql import Window

    k = 50
    docs_nrm = tainted.select(
        F.col("doc_id").alias("__id"),
        F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ").alias("__t"),
    ).withColumn("__len", F.length("__t"))
    starts = F.sequence(F.lit(1), F.greatest(F.col("__len") - F.lit(k - 1), F.lit(1)))
    pos = docs_nrm.filter(F.col("__id").isNotNull() & (F.col("__len") > 0)).select(
        "__id",
        F.explode(starts).alias("__p"),
        F.xxhash64(F.substring(F.col("__t"), F.col("__p"), k)).alias("__gh"),
    )

    t0 = time.monotonic()
    w_gh = Window.partitionBy("__gh")
    n_win = (
        pos.withColumn("__dr", F.dense_rank().over(w_gh.orderBy("__id")))
        .withColumn("__df", F.max("__dr").over(w_gh))
        .filter(F.col("__df") >= 2)
        .agg(F.count(F.lit(1)).alias("n"), F.sum("__p").alias("sp"))
        .collect()[0]
    )
    res["stage_window_r9"] = {
        "wall_sec": round(time.monotonic() - t0, 2),
        "n_flagged_positions": n_win["n"],
    }

    t0 = time.monotonic()
    gram = (
        pos.groupBy("__gh", F.pmod(F.xxhash64("__id"), F.lit(16)).alias("__salt"))
        .agg(F.count_distinct("__id").alias("__pdf"))
        .groupBy("__gh")
        .agg(F.sum("__pdf").alias("__df"))
        .filter(F.col("__df") >= 2)
        .select("__gh")
    )
    # merge hint: on a duplication-heavy un-prefiltered corpus the flagged
    # gram table runs to millions of rows; AQE's compressed-size estimate
    # can sit under the 64MB broadcast threshold while the actual
    # driver-collected rows blow spark.driver.maxResultSize (hit at
    # sf10-skew, 2 GiB). SMJ is also the honest at-scale shape this
    # probe exists to price.
    n_tp = (
        pos.join(gram.hint("merge"), on="__gh")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("__p").alias("sp"))
        .collect()[0]
    )
    res["stage_twophase_salted"] = {
        "wall_sec": round(time.monotonic() - t0, 2),
        "n_flagged_positions": n_tp["n"],
    }
    assert n_win["n"] == n_tp["n"] and n_win["sp"] == n_tp["sp"], (
        f"stage probes disagree: window={n_win} twophase={n_tp}"
    )
    return {"n_input_docs": n_in, "hot_doc_frac": 0.4, **res}


def _host_baseline() -> dict:
    """Per-tier host micro-baseline (same workloads as bench_map):
    this VM's speed wanders up to 2x within a session under co-tenant
    load (measured round 10: python loop 0.54 -> 0.70 -> 0.93s across
    one day), so every tier's wall time is recorded next to the host
    speed at the moment it ran."""
    import time as _t

    import numpy as np

    a = np.random.default_rng(7).standard_normal((2048, 2048))
    t0 = _t.perf_counter()
    for _ in range(3):
        a = a @ a * 1e-3
    gemm = round(_t.perf_counter() - t0, 4)
    t0 = _t.perf_counter()
    acc = 0
    for i in range(5_000_000):
        acc += i ^ (i >> 3)
    pyloop = round(_t.perf_counter() - t0, 4)
    return {"numpy_gemm_2048_sec": gemm, "python_loop_5m_sec": pyloop}


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
    if len(sys.argv) > 2 and sys.argv[1] == "--skew-tier":
        print(json.dumps(run_skew_tier(sys.argv[2])))
        return
    skew = sys.argv[1:2] == ["--skew"]
    only = None
    if len(sys.argv) > 2 and sys.argv[1] in ("--tiers", "--skew"):
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
            [
                sys.executable,
                os.path.abspath(__file__),
                "--skew-tier" if skew else "--tier",
                sf_dir,
            ],
            capture_output=True, text=True, check=True, env=env,
        )
        tiers[label] = {
            "rows_multiplier": mult,
            **_last_json(proc.stdout),
            "host_baseline": _host_baseline(),
        }
        print(f"{label}: {tiers[label]}", file=sys.stderr)
    base_label = next(iter(tiers), None)
    if base_label and not skew:
        base = tiers[base_label]
        for label, t in tiers.items():
            if label != base_label:
                t[f"wall_ratio_vs_{base_label}"] = round(
                    t["wall_sec"] / base["wall_sec"], 2
                )
    report = {
        "query": "remove_repeated_spans" + ("_hot_gram_skew" if skew else ""),
        "tiers": tiers,
        "note": (
            "round-10 shape: lossless winnowing prefilter (narrow numpy "
            "fingerprints -> candidate docs only enter the per-char "
            "stream) + gram-keyed window doc-freq for the long tail + "
            "HEAVY-HITTER SPLIT: a seeded sample probe routes grams in "
            ">= ~hot_min/sample docs through an exact two-phase salted "
            "distinct + broadcast flag join, so no window sort task "
            "grows with corpus size. sf100 runs with "
            "SPARK_GRAFT_DRIVER_MEM=48g — a probe-level sizing knob, "
            "not an operator change."
            + (
                " Skew mode: one boilerplate sentence planted in 40% of "
                "docs; hot_split_default vs window_only "
                "(hot_gram_sample=0) on identical output; stage_* "
                "probes isolate the doc-freq stage shapes on the same "
                "un-prefiltered position stream."
                if skew
                else ""
            )
        ),
    }
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
