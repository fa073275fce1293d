"""Evidence-freshness gate (VERDICT r7 item 4): the committed per-round
evidence artifacts must cover exactly the live registry's query set —
the pytest half of scripts/refresh_evidence.py, so a grown registry
with a stale artifact fails CI instead of shipping a one-behind lag
(as happened in rounds 5, 6 and 7).

The bench-map artifact name advances each round; the test picks the
highest-numbered BENCH_R*_SF01.json present.
"""

from __future__ import annotations

import glob
import json
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _registry_names() -> set[str]:
    from epic_pandas_spark.plans.registry import REGISTRY

    return set(REGISTRY)


def _latest_bench_map() -> str | None:
    paths = glob.glob(os.path.join(REPO, "BENCH_R*_SF01.json"))
    if not paths:
        return None

    def key(p):
        m = re.search(r"BENCH_R(\d+)_SF01", p)
        return int(m.group(1)) if m else -1

    return max(paths, key=key)


@pytest.mark.parametrize("artifact", ["ORACLE_CHECK.json", "ORACLE_CHECK_SF01.json"])
def test_oracle_artifacts_cover_registry(artifact):
    path = os.path.join(REPO, artifact)
    assert os.path.exists(path), f"{artifact} missing — run scripts/refresh_evidence.py"
    with open(path) as f:
        data = json.load(f)
    names = set(data["results"])
    reg = _registry_names()
    assert names == reg, (
        f"{artifact} stale: missing {sorted(reg - names)}, "
        f"extras {sorted(names - reg)} — run scripts/refresh_evidence.py"
    )
    assert data["n_fail"] == 0, f"{artifact} records failures"


def test_coverage_md_harness_counts_match_artifact():
    """COVERAGE.md's 'full-registry oracle harness' row must carry the
    SAME counts as the committed ORACLE_CHECK.json — the prose went
    stale in round 9 (claimed 161/146/15 while the artifact said
    181/164/17), so the numbers are now asserted, not trusted."""
    with open(os.path.join(REPO, "ORACLE_CHECK.json")) as f:
        data = json.load(f)
    with open(os.path.join(REPO, "COVERAGE.md")) as f:
        row = next(
            (ln for ln in f if "full-registry oracle harness" in ln), None
        )
    assert row, "COVERAGE.md lost its 'full-registry oracle harness' row"
    m = re.search(
        r"(\d+) queries — (\d+) oracle hash-match, (\d+) rows-only, (\d+) fail",
        row,
    )
    assert m, f"harness row not in the parseable format: {row!r}"
    got = tuple(int(x) for x in m.groups())
    want = (
        len(data["results"]),
        data["n_match"],
        data["n_rows_only"],
        data["n_fail"],
    )
    assert got == want, (
        f"COVERAGE.md harness row says {got}, ORACLE_CHECK.json says {want} "
        "— update the row when regenerating evidence"
    )


def test_bench_map_covers_registry():
    path = _latest_bench_map()
    assert path, "no BENCH_R*_SF01.json — run scripts/refresh_evidence.py"
    with open(path) as f:
        data = json.load(f)
    # `*_witness` rows are bench-only timings of the approx sketches'
    # self-witnessing twins, not registry queries
    names = {n for n in data["queries"] if not n.endswith("_witness")}
    reg = _registry_names()
    assert names == reg, (
        f"{os.path.basename(path)} stale: missing {sorted(reg - names)}, "
        f"extras {sorted(names - reg)} — run scripts/refresh_evidence.py"
    )


def test_robustness_covers_registry():
    path = os.path.join(REPO, "ROBUSTNESS.json")
    assert os.path.exists(path), "ROBUSTNESS.json missing"
    with open(path) as f:
        data = json.load(f)
    assert data["n_queries"] == len(_registry_names()), (
        f"ROBUSTNESS.json n_queries={data['n_queries']} != registry "
        f"{len(_registry_names())} — run scripts/refresh_evidence.py"
    )
    assert data["mismatches"] == [] and data["errors"] == []


def test_plan_audit_covers_registry():
    path = os.path.join(REPO, "PLAN_AUDIT.md")
    assert os.path.exists(path), "PLAN_AUDIT.md missing"
    names = set()
    with open(path) as f:
        for line in f:
            if line.startswith("| ") and not line.startswith("| ---"):
                cell = line.split("|")[1].strip().strip("`")
                if cell and cell != "query":
                    names.add(cell)
    reg = _registry_names()
    assert names == reg, (
        f"PLAN_AUDIT.md stale: missing {sorted(reg - names)}, "
        f"extras {sorted(names - reg)} — run scripts/refresh_evidence.py"
    )


def test_bench_sf10_covers_registry():
    """BENCH_SF10.json (the closest committed artifact to the 100-TB
    target scale) must cover the LIVE registry — it sat two rounds
    stale at round 10 (VERDICT r10 "what's wrong" #3); this extends the
    same name-set gate the sf0.1 map already has."""
    path = os.path.join(REPO, "BENCH_SF10.json")
    assert os.path.exists(path), "BENCH_SF10.json missing"
    with open(path) as f:
        data = json.load(f)
    names = {n for n in data["queries"] if not n.endswith("_witness")}
    reg = _registry_names()
    assert names == reg, (
        f"BENCH_SF10.json stale: missing {sorted(reg - names)}, "
        f"extras {sorted(names - reg)} — rerun the sf10 bench"
    )
