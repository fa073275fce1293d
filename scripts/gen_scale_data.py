"""Deterministic large-scale-factor synthetic data generator.

Produces the same star schema as the driver testdata
(``/root/testdata/sf*``: region nation customer supplier part orders
lineitem events documents embeddings) at scale factors the driver does
not ship (sf1 = 6M lineitem rows), so the scale probe can measure a
100x growth trend (sf0.01 -> sf1) instead of arguing about it.

Distributions are matched to the driver data by inspection (seed-42
numpy, uniform keys, 1995-2001 order dates, 30-day event stream,
~9%% near-dup + ~0.2%% exact-dup document structure, 64-dim unit-norm
embeddings over 10 labels) — EXCEPT the document vocabulary, which is
deliberately natural-text-shaped instead of the driver's 30 words: an
sf-scaled Zipf vocabulary (50k words at sf1, exponent 1.05). A tiny
closed vocabulary saturates the shingle space, making per-shingle doc
frequency grow linearly with the corpus and candidate pairs
quadratically — so a trend measured on it reflects the corpus, not the
dedup plans. An open Zipf vocabulary keeps tail-gram doc frequency
~flat as the corpus grows, which is the regime the near-dup tier is
designed for (and the regime real text is in). The generator is NOT
used by tests or the oracle gate - driver parquet stays the source of
truth for correctness; this exists purely for performance trend
evidence.

Usage: python scripts/gen_scale_data.py --sf 1 --out .scaledata/sf1
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SYLLABLES = [
    "ba", "be", "bi", "bo", "bu", "da", "de", "di", "do", "du",
    "ka", "ke", "ki", "ko", "ku", "la", "le", "li", "lo", "lu",
    "ma", "me", "mi", "mo", "mu", "na", "ne", "ni", "no", "nu",
    "ra", "re", "ri", "ro", "ru", "sa", "se", "si", "so", "su",
    "ta", "te", "ti", "to", "tu",
]


def zipf_vocab(n_vocab: int) -> tuple[np.ndarray, np.ndarray]:
    """(words, probs): n_vocab distinct pronounceable words (word i =
    base-45 syllable encoding of i — injective, 2-8 chars) with Zipf
    rank-frequencies p_r ∝ 1/r^1.05. The vocabulary SCALES with sf
    (50k words at sf1) so the shingle space stays open as the corpus
    grows: per-shingle doc frequency stays ~flat like natural text,
    instead of the closed-vocab saturation that made candidate pairs
    grow quadratically in the earlier 30-word corpus."""
    base = len(SYLLABLES)
    words = []
    for i in range(n_vocab):
        j, parts = i, [SYLLABLES[i % base]]
        j //= base
        while j:
            parts.append(SYLLABLES[j % base])
            j //= base
        words.append("".join(parts))
    probs = 1.0 / np.arange(1, n_vocab + 1) ** 1.05
    probs /= probs.sum()
    return np.array(words), probs
MKTSEGMENTS = ["MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "BUILDING", "FURNITURE"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "MEDIUM", "SMALL", "LARGE", "STANDARD", "PROMO"]
EVENT_TYPES = ["signup", "click", "error", "view", "purchase"]
LANGS = ["en", "de", "fr", "zh", "es"]
DAY_US = 86_400_000_000


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
    print(f"{name}: {table.num_rows} rows")


def _ts_col(epoch_us: np.ndarray) -> pa.Array:
    return pa.array(epoch_us, type=pa.timestamp("us"))


def _write_lineitem(
    out_dir: str,
    rng,
    order_day: np.ndarray,
    n_lines_per: np.ndarray,
    n_part: int,
    n_supp: int,
    base_1995: np.int64,
    chunk_orders: int = 5_000_000,
) -> int:
    """Lineitem writer. Tiers up to sf10 (≤20M orders) keep the original
    one-shot arrays and draw sequence, so regenerating an existing tier
    stays bit-identical to every earlier round. Above that (the sf100
    spot tier: 150M orders → ~600M lines ≈ 50 GB of arrays one-shot) the
    table streams out in 5M-order chunks through one ParquetWriter —
    peak memory is per-chunk, the parquet file is a normal multi-row-
    group file. Chunked draws consume the RNG per chunk, so a chunked
    tier is deterministic per (sf, seed) but not byte-equal to a
    hypothetical one-shot run of the same sf — irrelevant for a tier
    that never existed one-shot."""
    n_orders = len(order_day)
    path = os.path.join(out_dir, "lineitem.parquet")

    def chunk_table(a: int, b: int) -> pa.Table:
        per = n_lines_per[a:b]
        l_orderkey = np.repeat(np.arange(a, b, dtype=np.int64), per)
        n = len(l_orderkey)
        linenum = (np.arange(n) - np.repeat(
            np.concatenate(([0], np.cumsum(per)[:-1])), per)) + 1
        ship_delay = rng.integers(1, 121, n)
        return pa.table({
            "l_orderkey": l_orderkey,
            "l_partkey": rng.integers(0, n_part, n),
            "l_suppkey": rng.integers(0, n_supp, n),
            "l_linenumber": pa.array(linenum.astype(np.int32)),
            "l_quantity": rng.integers(1, 51, n).astype(np.float64),
            "l_extendedprice": np.round(rng.uniform(900, 105000, n), 2),
            "l_discount": np.round(rng.integers(0, 11, n) / 100.0, 2),
            "l_tax": np.round(rng.integers(0, 9, n) / 100.0, 2),
            "l_returnflag": pa.array(np.array(["N", "A", "R"])[rng.integers(0, 3, n)]),
            "l_linestatus": pa.array(np.array(["O", "F"])[rng.integers(0, 2, n)]),
            "l_shipdate": _ts_col(
                base_1995 + np.repeat(order_day[a:b], per) * DAY_US
                + ship_delay * DAY_US
            ),
        })

    if n_orders <= 20_000_000:
        tbl = chunk_table(0, n_orders)
        pq.write_table(tbl, path)
        print(f"lineitem: {tbl.num_rows} rows")
        return tbl.num_rows

    writer, total = None, 0
    for a in range(0, n_orders, chunk_orders):
        tbl = chunk_table(a, min(a + chunk_orders, n_orders))
        if writer is None:
            writer = pq.ParquetWriter(path, tbl.schema)
        writer.write_table(tbl)
        total += tbl.num_rows
    writer.close()
    print(f"lineitem: {total} rows (chunked)")
    return total


def gen(sf: float, out_dir: str, seed: int = 42, tables: set | None = None) -> None:
    """``tables``: optional subset to generate (e.g. the sf100 spot tier
    only needs documents/embeddings/lineitem for the headline queries).
    Skipped tables skip their RNG draws, so a subset run's stream
    differs from a full run's — determinism holds per (sf, seed,
    tables), which is all the trend needs. Full runs (tables=None) are
    bit-identical to every earlier round's tiers."""
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)

    def want(name: str) -> bool:
        return tables is None or name in tables

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_orders = int(1_500_000 * sf)
    n_events = int(1_000_000 * sf)
    n_docs = int(50_000 * sf)
    n_emb = int(20_000 * sf)
    n_users = int(15_000 * sf)

    # --- dimensions -------------------------------------------------
    if want("region"):
        _write(out_dir, "region", pa.table({
            "r_regionkey": pa.array(np.arange(5, dtype=np.int32)),
            "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
        }))
    if want("nation"):
        _write(out_dir, "nation", pa.table({
            "n_nationkey": pa.array(np.arange(25, dtype=np.int32)),
            "n_name": [f"NATION_{i}" for i in range(25)],
            "n_regionkey": pa.array(np.arange(25, dtype=np.int32) % 5),
        }))
    if want("customer"):
        _write(out_dir, "customer", pa.table({
            "c_custkey": np.arange(n_cust, dtype=np.int64),
            "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
            "c_nationkey": pa.array(rng.integers(0, 25, n_cust).astype(np.int32)),
            "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
            "c_mktsegment": pa.array(np.array(MKTSEGMENTS)[rng.integers(0, 5, n_cust)]),
        }))
    if want("supplier"):
        _write(out_dir, "supplier", pa.table({
            "s_suppkey": np.arange(n_supp, dtype=np.int64),
            "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
            "s_nationkey": pa.array(rng.integers(0, 25, n_supp).astype(np.int32)),
            "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
        }))
    adjectives = ["large", "hot", "blue", "old", "new", "red", "small", "cold"]
    nouns = ["ring", "bolt", "plate", "screw", "cap", "disk", "tube", "rod"]
    if want("part"):
        _write(out_dir, "part", pa.table({
            "p_partkey": np.arange(n_part, dtype=np.int64),
            "p_name": pa.array([
                f"{adjectives[i % 8]} {nouns[(i // 8) % 8]}" for i in range(n_part)
            ]),
            "p_brand": pa.array([f"Brand#{i}" for i in rng.integers(1, 26, n_part)]),
            "p_type": pa.array(np.array(PTYPES)[rng.integers(0, 6, n_part)]),
            "p_size": pa.array(rng.integers(1, 51, n_part).astype(np.int32)),
            "p_retailprice": np.round(900.0 + (np.arange(n_part) % 1000) / 10.0, 2),
        }))

    # --- orders / lineitem ------------------------------------------
    base_1995 = np.int64(788_918_400) * 1_000_000  # 1995-01-01 UTC in us
    span_days = 2_404  # through 1998 era like the driver (1995..2001-08)
    # order_day / n_lines_per feed lineitem too: computed whenever either
    # table is wanted so the lineitem stream is well-defined standalone
    if want("orders") or want("lineitem"):
        order_day = rng.integers(0, span_days, n_orders)
    if want("orders"):
        _write(out_dir, "orders", pa.table({
            "o_orderkey": np.arange(n_orders, dtype=np.int64),
            "o_custkey": rng.integers(0, n_cust, n_orders),
            "o_orderstatus": pa.array(np.array(["O", "F", "P"])[rng.integers(0, 3, n_orders)]),
            "o_totalprice": np.round(rng.uniform(1000, 500000, n_orders), 2),
            "o_orderdate": _ts_col(base_1995 + order_day * DAY_US),
            "o_orderpriority": pa.array(np.array(PRIORITIES)[rng.integers(0, 5, n_orders)]),
        }))

    # ~4 lines/order, skewed tail like the driver (max ~17 at sf0.1)
    n_li = 0
    if want("lineitem"):
        n_lines_per = np.clip(rng.geometric(0.25, n_orders), 1, 20)
        n_li = _write_lineitem(
            out_dir, rng, order_day, n_lines_per, n_part, n_supp, base_1995
        )

    # --- events (30-day stream, monotone ts) ------------------------
    if want("events"):
        base_2024 = np.int64(1_704_067_200) * 1_000_000  # 2024-01-01 UTC in us
        gaps = rng.exponential(30.0 * DAY_US / max(n_events, 1), n_events)
        ts = base_2024 + np.cumsum(gaps).astype(np.int64)
        _write(out_dir, "events", pa.table({
            "event_id": np.arange(n_events, dtype=np.int64),
            "ts": _ts_col(ts),
            "user_id": rng.integers(0, max(n_users, 1), n_events),
            "event_type": pa.array(np.array(EVENT_TYPES)[rng.integers(0, 5, n_events)]),
            "value": np.round(rng.exponential(60.0, n_events), 2),
            "props": pa.array([f'{{"k": {k}}}' for k in rng.integers(0, 100, n_events)]),
        }))

    # --- documents (near-dup + exact-dup structure) -----------------
    # sf-scaled Zipf vocabulary; floor keeps tiny sfs from degenerating
    # back into a closed vocab
    n_vocab = 0
    if want("documents"):
        vocab, word_p = zipf_vocab(max(2000, int(50_000 * sf)))
        n_vocab = len(vocab)
        n_base = int(n_docs * 0.90)
        lens = rng.integers(8, 105, n_base)  # 8..104 words per doc
        flat = vocab[rng.choice(len(vocab), size=int(lens.sum()), p=word_p)]
        offs = np.concatenate(([0], np.cumsum(lens)))
        texts = [" ".join(flat[offs[i]:offs[i + 1]]) for i in range(n_base)]
        # near-dups: copy a base doc, replace ~3 random words with 'dup'
        n_near = n_docs - n_base - max(n_docs // 600, 1)
        src_idx = rng.integers(0, n_base, n_near)
        for i in src_idx:
            w = texts[i].split(" ")
            for j in rng.integers(0, len(w), min(3, len(w))):
                w[j] = "dup"
            texts.append(" ".join(w))
        # exact dups
        for i in rng.integers(0, n_base, n_docs - len(texts)):
            texts.append(texts[i])
        order = rng.permutation(n_docs)
        texts = [texts[i] for i in order]
        _write(out_dir, "documents", pa.table({
            "doc_id": np.arange(n_docs, dtype=np.int64),
            "text": texts,
            "lang": pa.array(np.array(LANGS)[
                rng.choice(5, n_docs, p=[0.41, 0.1475, 0.1475, 0.1475, 0.1475])
            ]),
            "source": pa.array([f"src{i}" for i in rng.integers(0, 20, n_docs)]),
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }))
        del texts, flat

    # --- embeddings (unit-norm 64-dim, 10 labels) -------------------
    if want("embeddings"):
        V = rng.standard_normal((n_emb, 64)).astype(np.float32)
        V /= np.linalg.norm(V, axis=1, keepdims=True)
        _write(out_dir, "embeddings", pa.table({
            "vec_id": np.arange(n_emb, dtype=np.int64),
            "embedding": pa.array(list(V), type=pa.list_(pa.float32())),
            "label": pa.array(rng.integers(0, 10, n_emb).astype(np.int32)),
        }))

    with open(os.path.join(out_dir, "MANIFEST.json"), "w") as f:
        json.dump(
            {"sf": sf, "seed": seed, "lineitem_rows": int(n_li),
             "doc_vocab": int(n_vocab),
             "tables": sorted(tables) if tables else "all"},
            f,
        )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--tables", default=None,
        help="comma-separated subset (spot tiers); default all tables",
    )
    args = ap.parse_args()
    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scaledata", f"sf{args.sf:g}")
    gen(args.sf, out, tables=set(args.tables.split(",")) if args.tables else None)
