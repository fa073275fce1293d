"""Distributed n-gram language model with Stupid Backoff scoring — the
perplexity-filtering step of a web-corpus curation pipeline (the CCNet
recipe: score every document against a LM trained on a fixed reference
corpus, then keep/bucket by perplexity).

Extension tier: no reference analog (SURVEY.md §7.1 step 9). The scoring
rule is Stupid Backoff (Brants et al. 2007, "Large Language Models in
Machine Translation"): the canonical distributed-LM score — unnormalized,
one count-table lookup per order, designed exactly for this
count-tables-as-distributed-joins shape. With ``order=2``:

    S(v | u) = c(u v) / c(u)            if c(u v) > 0
             = alpha * P1(v)            otherwise (alpha = 0.4)
    P1(v)    = (c(v) + 1) / (N + |V|)   add-one unigram, total score for
                                        the first token and any OOV word

Plan at 100 TB: training is two hash-aggregates over one exploded
(token, prev-token) stream (map-side partials collapse the Zipf head, so
the shuffle carries ~|vocab| rows per partition); the only collects are
two scalars (N, |V|). Scoring joins the token stream against the count
tables on gram keys — broadcast when the model comes from a FIXED
reference corpus (the CCNet shape: the model does not grow with the
scored corpus), shuffle-hash otherwise (corpus-proportional sides must
never auto-broadcast — the remove_repeated_spans lesson). Document text
never shuffles; only tokens and counts move.
"""

from __future__ import annotations

import math
from typing import NamedTuple

from pyspark.sql import Column, DataFrame, functions as F


class NGramLM(NamedTuple):
    """A trained Stupid-Backoff model: count tables + scalar totals.

    ``unigrams`` is ``(v, c_uni)``; ``bigrams`` is ``(u, v, c_bi)`` (None
    when order=1). ``n_tokens``/``vocab_size`` are the UNPRUNED totals, so
    add-one unigram probabilities stay a proper distribution even when the
    stored tables are pruned."""

    unigrams: DataFrame
    bigrams: DataFrame | None
    n_tokens: int
    vocab_size: int
    order: int


def _token_pairs_expr(text: Column) -> Column:
    """array<struct<v,u>> of (token, previous-token) over the normalized
    whitespace tokenization; u is null for the first token. The split
    result is let-bound via a one-element transform (interpreted HOF trees
    do no CSE — see word_ngrams_expr), so the regex runs once per doc."""
    w = F.filter(
        F.split(F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "), " "),
        lambda t: t != "",
    )

    def _body(w0: Column) -> Column:
        # F.get is 0-based and yields null out-of-bounds (incl. -1), so the
        # first token's context is null with no ANSI index error
        return F.transform(w0, lambda t, i: F.struct(t.alias("v"), F.get(w0, i - 1).alias("u")))

    return F.get(F.transform(F.array(w), _body), 0)


def _token_stream(df: DataFrame, text_col: str, id_col: str | None) -> DataFrame:
    cols = [F.col(id_col)] if id_col else []
    return df.select(*cols, F.explode(_token_pairs_expr(F.col(text_col))).alias("__p")).select(
        *([id_col] if id_col else []), F.col("__p.v").alias("v"), F.col("__p.u").alias("u")
    )


def ngram_lm_train(
    df: DataFrame,
    text_col: str,
    order: int = 2,
    min_count: int = 1,
) -> NGramLM:
    """Train the count tables on ``df[text_col]``.

    One exploded (v, u) stream feeds both aggregates (localCheckpoint so
    the corpus is scanned once); totals are a single two-scalar collect.
    ``min_count`` prunes the STORED tables only — totals keep the full
    counts, so pruned/unseen grams fall through to the same add-one
    unigram floor."""
    if order not in (1, 2):
        raise ValueError("order must be 1 or 2")
    if min_count < 1:
        raise ValueError("min_count must be >= 1")

    toks = _token_stream(df, text_col, None).localCheckpoint(eager=False)
    # checkpoint the count tables themselves: scoring joins each table into
    # its own plan subtree, and without a materialized boundary Spark
    # re-runs the aggregation once per join (and the totals collect below
    # pays for the unigram materialization anyway)
    uni = (
        toks.groupBy("v")
        .agg(F.count(F.lit(1)).alias("c_uni"))
        .localCheckpoint(eager=False)
    )
    n_tokens, vocab_size = uni.agg(
        F.sum("c_uni").alias("n"), F.count(F.lit(1)).alias("v")
    ).first()
    bi = None
    if order == 2:
        bi = (
            toks.filter(F.col("u").isNotNull())
            .groupBy("u", "v")
            .agg(F.count(F.lit(1)).alias("c_bi"))
            .localCheckpoint(eager=False)
        )
        if min_count > 1:
            bi = bi.filter(F.col("c_bi") >= min_count)
    if min_count > 1:
        uni = uni.filter(F.col("c_uni") >= min_count)
    return NGramLM(uni, bi, int(n_tokens or 0), int(vocab_size or 0), order)


def ngram_lm_score(
    df: DataFrame,
    text_col: str,
    id_col: str,
    model: NGramLM,
    alpha: float = 0.4,
    strategy: str = "broadcast",
    quantize_scale: int | None = None,
    signals: bool = False,
) -> DataFrame:
    """Per-document Stupid-Backoff score: ``(id_col, n_tokens,
    avg_logprob, perplexity)`` with ``perplexity = exp(-avg_logprob)``
    (an unnormalized pseudo-perplexity, monotone in the backoff score —
    the filtering signal, not a true LM perplexity).

    ``signals=True`` adds two novelty diagnostics from the same pass
    (free: indicator columns folded into the existing aggregate):
    ``oov_frac`` — fraction of tokens absent from the model vocabulary
    (high on foreign-language/garbled text even when perplexity is
    moderate) — and, for order 2, ``backoff_frac`` — fraction of
    in-context tokens scored through the backoff (unseen bigrams:
    high on topically novel but well-formed text).

    Documents with no tokens (null/empty text) produce no output row.
    ``strategy='broadcast'`` for fixed-reference-corpus models (CCNet
    shape); ``'shuffle'`` pins shuffle_hash joins when the model is
    corpus-proportional; ``None`` leaves the choice to Catalyst/AQE.

    ``quantize_scale`` (e.g. 1_000_000) rounds each per-token log-prob
    to integer micro-nats BEFORE the per-doc sum and adds the exact
    integer total as a ``logp_scaled`` column (``avg_logprob`` then
    derives from it). Integer sums are exactly associative, so scores
    are bit-stable under any partitioning, micro-batching, or
    accumulation order — the same discipline as DSIR's ratio table, and
    what makes the streaming twin bit-equal to this batch form."""
    if model.n_tokens <= 0:
        raise ValueError("model has no tokens")
    if strategy not in ("broadcast", "shuffle", None):
        raise ValueError("strategy must be 'broadcast', 'shuffle', or None")

    def _side(d: DataFrame) -> DataFrame:
        if strategy == "broadcast":
            return F.broadcast(d)
        if strategy == "shuffle":
            return d.hint("shuffle_hash")
        return d

    toks = _token_stream(df, text_col, id_col)
    cv = _side(model.unigrams.select("v", F.col("c_uni").alias("__c_v")))
    j = toks.join(cv, "v", "left")
    denom = float(model.n_tokens + model.vocab_size)
    p_uni = (F.coalesce(F.col("__c_v"), F.lit(0)).cast("double") + 1.0) / F.lit(denom)
    if model.order == 2:
        cu = _side(model.unigrams.select(F.col("v").alias("u"), F.col("c_uni").alias("__c_u")))
        bi = _side(model.bigrams.select("u", "v", F.col("c_bi").alias("__c_bi")))
        # left joins on a null u never match — the first token of each doc
        # falls through to the unigram branch, same as the SQL oracle
        j = j.join(cu, "u", "left").join(bi, ["u", "v"], "left")
        logp = (
            F.when(F.col("u").isNull(), F.log(p_uni))
            .when(
                F.col("__c_bi").isNotNull(),
                F.log(F.col("__c_bi").cast("double") / F.col("__c_u")),
            )
            .otherwise(F.lit(math.log(alpha)) + F.log(p_uni))
        )
    else:
        logp = F.log(p_uni)

    sig_aggs, sig_cols = [], []
    if signals:
        sig_aggs.append(
            F.avg(F.when(F.col("__c_v").isNull(), 1.0).otherwise(0.0)).alias("oov_frac")
        )
        sig_cols.append("oov_frac")
        if model.order == 2:
            in_ctx = F.col("u").isNotNull()
            sig_aggs.append(
                (
                    F.sum(F.when(in_ctx & F.col("__c_bi").isNull(), 1).otherwise(0))
                    / F.greatest(F.sum(F.when(in_ctx, 1).otherwise(0)), F.lit(1))
                ).alias("backoff_frac")
            )
            sig_cols.append("backoff_frac")

    keep = [F.col(id_col), F.col("__c_v")] + (
        [F.col("u"), F.col("__c_bi")] if model.order == 2 else []
    )
    if quantize_scale is not None:
        q = F.round(logp * F.lit(float(quantize_scale))).cast("long")
        out = (
            j.select(*keep, q.alias("__q"))
            .groupBy(id_col)
            .agg(
                F.count(F.lit(1)).alias("n_tokens"),
                F.sum("__q").alias("logp_scaled"),
                *sig_aggs,
            )
            .withColumn(
                "avg_logprob",
                F.col("logp_scaled")
                / (F.col("n_tokens") * F.lit(float(quantize_scale))),
            )
        )
        return out.select(
            id_col,
            "n_tokens",
            "logp_scaled",
            "avg_logprob",
            F.exp(-F.col("avg_logprob")).alias("perplexity"),
            *sig_cols,
        )
    out = (
        j.select(*keep, logp.alias("__logp"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.avg("__logp").alias("avg_logprob"),
            *sig_aggs,
        )
    )
    return out.select(
        id_col,
        "n_tokens",
        "avg_logprob",
        F.exp(-F.col("avg_logprob")).alias("perplexity"),
        *sig_cols,
    )


def ngram_lm_save(model: NGramLM, path: str) -> None:
    """Persist a trained model: count tables as parquet plus a 1-row
    meta table carrying the scalar totals — the train-offline /
    score-online handoff (and the only way a STREAMING scorer can see
    the model: stream-static joins need static frames, not lineage back
    to a batch training job)."""
    spark = model.unigrams.sparkSession
    model.unigrams.write.mode("overwrite").parquet(f"{path}/unigrams")
    if model.bigrams is not None:
        model.bigrams.write.mode("overwrite").parquet(f"{path}/bigrams")
    meta = spark.createDataFrame(
        [(model.n_tokens, model.vocab_size, model.order)],
        "n_tokens long, vocab_size long, order int",
    )
    meta.write.mode("overwrite").parquet(f"{path}/meta")


def ngram_lm_load(spark, path: str) -> NGramLM:
    """Load a model persisted by :func:`ngram_lm_save`."""
    meta = spark.read.parquet(f"{path}/meta").first()
    uni = spark.read.parquet(f"{path}/unigrams")
    bi = spark.read.parquet(f"{path}/bigrams") if meta["order"] == 2 else None
    return NGramLM(uni, bi, int(meta["n_tokens"]), int(meta["vocab_size"]), int(meta["order"]))


def ngram_lm_score_stream(
    stream_df: DataFrame,
    text_col: str,
    id_col: str,
    model: NGramLM,
    alpha: float = 0.4,
    quantize_scale: int = 1_000_000,
) -> DataFrame:
    """Streaming perplexity scorer — score documents ARRIVING AS A
    STREAM against a persisted LM (load with :func:`ngram_lm_load`).

    Same pattern as streaming DSIR: the model is a bounded static dim,
    so each micro-batch's (token, prev) stream looks it up via
    stream-static broadcast joins, then one keyed streaming aggregate
    accumulates ``(n_tokens, logp_scaled)`` per document. The per-token
    log-probs are quantized to integer micro-nats, so the streaming sum
    is exactly associative: a document split across micro-batches (e.g.
    append-style row shards) accumulates to the identical integer total
    the batch twin computes, bit for bit. Run with output mode
    ``update``/``complete`` (streaming agg). The plan is IDENTICAL to
    :func:`ngram_lm_score` — Spark's incrementalizer turns the same
    declarative plan into the stateful streaming form; this wrapper
    documents the contract (static model, stream-safe expressions only)
    and anchors the stream==batch equivalence test."""
    return ngram_lm_score(
        stream_df, text_col, id_col, model,
        alpha=alpha, strategy="broadcast", quantize_scale=quantize_scale,
    )


def ngram_lm_score_reference(
    train_texts: list[str],
    score_docs: list[tuple[object, str]],
    order: int = 2,
    min_count: int = 1,
    alpha: float = 0.4,
) -> dict[object, tuple[int, float]]:
    """Pure-Python twin of train+score for parity tests: returns
    ``{id: (n_tokens, avg_logprob)}`` under identical semantics."""
    import re
    from collections import Counter

    def words(t: str) -> list[str]:
        return [w for w in re.sub(r"\s+", " ", t.strip().lower()).split(" ") if w]

    uni: Counter = Counter()
    bi: Counter = Counter()
    for t in train_texts:
        ws = words(t)
        uni.update(ws)
        bi.update(zip(ws, ws[1:]))
    n_tokens = sum(uni.values())
    vocab = len(uni)
    uni_kept = {w: c for w, c in uni.items() if c >= min_count}
    bi_kept = {p: c for p, c in bi.items() if c >= min_count}
    denom = n_tokens + vocab
    out: dict[object, tuple[int, float]] = {}
    for did, t in score_docs:
        ws = words(t)
        if not ws:
            continue
        total = 0.0
        for i, v in enumerate(ws):
            p1 = (uni_kept.get(v, 0) + 1) / denom
            if order == 2 and i > 0:
                u = ws[i - 1]
                c_bi = bi_kept.get((u, v))
                if c_bi is not None:
                    total += math.log(c_bi / uni_kept[u])
                else:
                    total += math.log(alpha) + math.log(p1)
            else:
                total += math.log(p1)
        out[did] = (len(ws), total / len(ws))
    return out
