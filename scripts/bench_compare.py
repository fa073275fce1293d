"""Same-host A/B comparison of two bench maps (VERDICT r9 task 1).

Round-to-round map comparisons have been confounded by HOST drift: the
round-9 map measured a uniform ~1.18x median elevation across ~150
untouched queries vs round 8 (different VM day), which is noise about
the host, not the code. This tool makes the comparison mechanical:

  python scripts/bench_compare.py A.json B.json --out BENCH_AB_R10.json

- normalizes every per-query ratio by the maps' host_baseline factor
  (numpy GEMM + python loop micro-workloads recorded in each artifact;
  when both maps ran on the same host the factor is ~1.0 and the
  normalization is a no-op),
- reports the median normalized ratio (the "uniform drift" indicator),
- lists every query whose normalized ratio exceeds the threshold in
  either direction, preferring solo-confirmed seconds when the B map
  carries them,
- echoes a `watchlist` section for queries named with --watch so a
  verdict can read their attribution directly from the artifact.
"""

from __future__ import annotations

import argparse
import json
import statistics


def _host_factor(a: dict, b: dict) -> float:
    """Geometric mean of the per-micro-workload B/A time ratios — >1
    means host B (or day B) is slower; divide B's query times by this
    to compare code, not hosts."""
    ha, hb = a.get("host_baseline"), b.get("host_baseline")
    if not ha or not hb:
        return 1.0
    ratios = [hb[k] / ha[k] for k in ha if k in hb and ha[k] > 0]
    if not ratios:
        return 1.0
    prod = 1.0
    for r in ratios:
        prod *= r
    return prod ** (1.0 / len(ratios))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("map_a", help="previous map (e.g. same-host r9 rerun)")
    ap.add_argument("map_b", help="current map")
    ap.add_argument("--out", required=True)
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument("--watch", default="", help="comma list of query names")
    args = ap.parse_args()

    with open(args.map_a) as f:
        a = json.load(f)
    with open(args.map_b) as f:
        b = json.load(f)
    qa, qb = a["queries"], b["queries"]
    solo_b = {
        q: d.get("solo_sec")
        for q, d in b.get("solo_confirmed", {}).items()
        if d.get("solo_sec")
    }
    hf = _host_factor(a, b)

    shared = sorted(set(qa) & set(qb))
    rows = {}
    for q in shared:
        cur = solo_b.get(q, qb[q])
        if qa[q] <= 0 or cur <= 0:
            continue
        rows[q] = {
            "a_sec": qa[q],
            "b_sec": qb[q],
            **({"b_solo_sec": solo_b[q]} if q in solo_b else {}),
            "ratio_norm": round((cur / qa[q]) / hf, 3),
        }
    ratios = [r["ratio_norm"] for r in rows.values()]
    med = round(statistics.median(ratios), 3) if ratios else None
    movers = {
        q: r
        for q, r in rows.items()
        if r["ratio_norm"] > args.threshold or r["ratio_norm"] < 1 / args.threshold
    }
    watch = {
        q: rows.get(q, "absent")
        for q in filter(None, args.watch.split(","))
    }
    report = {
        "map_a": args.map_a,
        "map_b": args.map_b,
        "host_factor_b_over_a": round(hf, 4),
        "n_shared": len(rows),
        "median_ratio_norm": med,
        "threshold": args.threshold,
        "movers": dict(sorted(movers.items(), key=lambda t: -t[1]["ratio_norm"])),
        "watchlist": watch,
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(json.dumps({"out": args.out, "median_ratio_norm": med,
                      "host_factor": round(hf, 4), "n_movers": len(movers)}))


if __name__ == "__main__":
    main()
