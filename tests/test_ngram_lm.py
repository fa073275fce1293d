"""Stupid-Backoff n-gram LM: distributed train/score vs the pure-Python
reference twin, pruning semantics, OOV/backoff paths, edge cases."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from epic_pandas_spark.functions.ngram_lm import (
    ngram_lm_score,
    ngram_lm_score_reference,
    ngram_lm_train,
)

TRAIN = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "a cat and a dog",
    "the   CAT  sat ",  # normalization: case + whitespace
]
SCORE = [
    (0, "the cat sat on the mat"),      # all bigrams seen
    (1, "the zebra sat"),               # OOV word -> backoff + add-one
    (2, "cat dog"),                     # seen words, unseen bigram
    (3, "zzz"),                         # single OOV token (unigram path)
    (4, "the"),                         # single seen token
]


def _spark_scores(spark, order=2, min_count=1):
    train = spark.createDataFrame([(t,) for t in TRAIN], "text string")
    docs = spark.createDataFrame(SCORE, "doc_id long, text string")
    model = ngram_lm_train(train, "text", order=order, min_count=min_count)
    out = ngram_lm_score(docs, "text", "doc_id", model)
    return model, {r["doc_id"]: (r["n_tokens"], r["avg_logprob"], r["perplexity"])
                   for r in out.collect()}


@pytest.mark.parametrize(
    "order,min_count",
    [(2, 1), (2, 2), (1, 1), (3, 1), (3, 2), (4, 1), (5, 1)],
)
def test_parity_vs_reference(spark, order, min_count):
    _, got = _spark_scores(spark, order=order, min_count=min_count)
    want = ngram_lm_score_reference(TRAIN, SCORE, order=order, min_count=min_count)
    assert set(got) == set(want)
    for did, (n_ref, lp_ref) in want.items():
        n, lp, ppl = got[did]
        assert n == n_ref
        assert lp == pytest.approx(lp_ref, abs=1e-9)
        assert ppl == pytest.approx(math.exp(-lp_ref), rel=1e-9)


def test_model_totals_and_backoff_ordering(spark):
    model, got = _spark_scores(spark)
    # totals are the full corpus: 6+6+5+3 tokens
    assert model.n_tokens == 20
    assert model.vocab_size == 9
    # an all-seen-bigrams doc scores higher (less negative) than one that
    # backs off, which scores higher than pure OOV
    assert got[0][1] > got[2][1] > got[3][1]


def test_pruning_drops_rare_grams_but_keeps_totals(spark):
    model1, _ = _spark_scores(spark, min_count=1)
    model2, _ = _spark_scores(spark, min_count=2)
    assert model2.n_tokens == model1.n_tokens  # totals unpruned
    assert model2.unigrams.count() < model1.unigrams.count()
    assert model2.bigrams.count() < model1.bigrams.count()
    # pruned bigram ("cat","and") must route through backoff: kept bigram
    # implies kept context (c(u1) >= c(u1,v)), so every stored row's
    # c_ctx denominator exists
    kept = {(r["u1"], r["v"]) for r in model2.bigrams.collect()}
    assert ("cat", "and") not in kept and ("the", "cat") in kept
    assert model2.bigrams.filter(F.col("c_ctx").isNull()).count() == 0


def test_empty_and_null_docs_absent(spark):
    train = spark.createDataFrame([(t,) for t in TRAIN], "text string")
    docs = spark.createDataFrame(
        [(0, "the cat"), (1, ""), (2, "   "), (3, None)], "doc_id long, text string"
    )
    model = ngram_lm_train(train, "text")
    out = ngram_lm_score(docs, "text", "doc_id", model)
    assert [r["doc_id"] for r in out.collect()] == [0]


def test_strategy_validation_and_shuffle_path(spark):
    train = spark.createDataFrame([(t,) for t in TRAIN], "text string")
    docs = spark.createDataFrame(SCORE, "doc_id long, text string")
    model = ngram_lm_train(train, "text")
    with pytest.raises(ValueError):
        ngram_lm_score(docs, "text", "doc_id", model, strategy="bogus")
    b = {r["doc_id"]: r["avg_logprob"]
         for r in ngram_lm_score(docs, "text", "doc_id", model, strategy="broadcast").collect()}
    s = {r["doc_id"]: r["avg_logprob"]
         for r in ngram_lm_score(docs, "text", "doc_id", model, strategy="shuffle").collect()}
    assert b.keys() == s.keys()
    for k in b:
        assert b[k] == pytest.approx(s[k], abs=1e-12)


def test_train_validation(spark):
    train = spark.createDataFrame([(t,) for t in TRAIN], "text string")
    with pytest.raises(ValueError):
        ngram_lm_train(train, "text", order=6)
    with pytest.raises(ValueError):
        ngram_lm_train(train, "text", order=0)
    with pytest.raises(ValueError):
        ngram_lm_train(train, "text", min_count=0)
    empty = spark.createDataFrame([], "text string")
    model = ngram_lm_train(empty, "text")
    with pytest.raises(ValueError):
        ngram_lm_score(train, "text", "text", model)


def test_quantized_scores_track_float_scores(spark):
    """quantize_scale adds an exact-integer total whose derived average
    tracks the float path within quantization error (0.5/scale per
    token)."""
    train = spark.createDataFrame([(t,) for t in TRAIN], "text string")
    docs = spark.createDataFrame(SCORE, "doc_id long, text string")
    model = ngram_lm_train(train, "text")
    f = {r["doc_id"]: r["avg_logprob"]
         for r in ngram_lm_score(docs, "text", "doc_id", model).collect()}
    rows = ngram_lm_score(
        docs, "text", "doc_id", model, quantize_scale=1_000_000
    ).collect()
    for r in rows:
        assert r["avg_logprob"] == pytest.approx(f[r["doc_id"]], abs=5e-7)
        # integer total is consistent with the derived average
        assert r["avg_logprob"] == r["logp_scaled"] / (r["n_tokens"] * 1_000_000)


def test_model_save_load_roundtrip(spark, tmp_path):
    from epic_pandas_spark.functions.ngram_lm import ngram_lm_load, ngram_lm_save

    train = spark.createDataFrame([(t,) for t in TRAIN], "text string")
    docs = spark.createDataFrame(SCORE, "doc_id long, text string")
    model = ngram_lm_train(train, "text")
    ngram_lm_save(model, str(tmp_path / "m"))
    loaded = ngram_lm_load(spark, str(tmp_path / "m"))
    assert (loaded.n_tokens, loaded.vocab_size, loaded.order) == (
        model.n_tokens, model.vocab_size, model.order)
    a = {r["doc_id"]: r["avg_logprob"]
         for r in ngram_lm_score(docs, "text", "doc_id", model).collect()}
    b = {r["doc_id"]: r["avg_logprob"]
         for r in ngram_lm_score(docs, "text", "doc_id", loaded).collect()}
    assert a == b


def test_novelty_signals(spark):
    """signals=True: oov_frac counts vocabulary misses, backoff_frac
    counts unseen bigrams among in-context tokens — hand-computed."""
    train = spark.createDataFrame([(t,) for t in TRAIN], "text string")
    docs = spark.createDataFrame(
        [
            (0, "the cat sat"),        # all tokens known, all bigrams seen
            (1, "the zebra sat"),      # 1/3 OOV; both bigrams unseen
            (2, "cat dog"),            # known words, bigram unseen
        ],
        "doc_id long, text string",
    )
    model = ngram_lm_train(train, "text")
    got = {r["doc_id"]: (r["oov_frac"], r["backoff_frac"])
           for r in ngram_lm_score(docs, "text", "doc_id", model, signals=True).collect()}
    assert got[0] == (pytest.approx(0.0), pytest.approx(0.0))
    assert got[1] == (pytest.approx(1 / 3), pytest.approx(1.0))
    assert got[2] == (pytest.approx(0.0), pytest.approx(1.0))
    # signals compose with quantization
    q = ngram_lm_score(
        docs, "text", "doc_id", model, signals=True, quantize_scale=1_000_000
    ).collect()[0]
    assert "oov_frac" in q.asDict() and "logp_scaled" in q.asDict()


def test_higher_order_backoff_chain_hand_computed(spark):
    """Order-3 fall-through, hand-computed: a token whose trigram is
    unseen but bigram is seen scores alpha^1 * (bigram ratio); available
    order < 3 at the second token starts at order 2 with NO penalty."""
    train = spark.createDataFrame(
        [("a b c",), ("a b d",), ("x b c",)], "text string"
    )
    model = ngram_lm_train(train, "text", order=3)
    # counts: uni a=2,b=3,c=2,d=1,x=1 (N=9, V=5); bi (a,b)=2,(b,c)=2,(b,d)=1,(x,b)=1
    # tri (a,b,c)=1,(a,b,d)=1,(x,b,c)=1
    docs = spark.createDataFrame([(0, "x b d")], "doc_id long, text string")
    got = ngram_lm_score(docs, "text", "doc_id", model).collect()[0]
    # token x: order1 floor = (1+1)/14; token b: m=2, (x,b)=1/c(x)=1 -> ln(1)
    # token d: m=3, tri (x,b,d) unseen -> alpha * bi (b,d)=1 / c(b)=3
    import math as _m
    want = (
        _m.log(2 / 14) + _m.log(1 / 1) + (_m.log(0.4) + _m.log(1 / 3))
    ) / 3
    assert got["avg_logprob"] == pytest.approx(want, abs=1e-12)
    # double fall-through: trigram and bigram both unseen -> alpha^2 * uni
    docs2 = spark.createDataFrame([(0, "a b x")], "doc_id long, text string")
    got2 = ngram_lm_score(docs2, "text", "doc_id", model).collect()[0]
    want2 = (
        _m.log((2 + 1) / 14)                       # a: floor
        + _m.log(2 / 2)                            # (a,b): m=2, seen
        + (2 * _m.log(0.4) + _m.log((1 + 1) / 14)) # x: m=3, tri+bi unseen
    ) / 3
    assert got2["avg_logprob"] == pytest.approx(want2, abs=1e-12)


def test_higher_order_save_load_and_signals(spark, tmp_path):
    from epic_pandas_spark.functions.ngram_lm import ngram_lm_load, ngram_lm_save

    train = spark.createDataFrame([(t,) for t in TRAIN], "text string")
    docs = spark.createDataFrame(SCORE, "doc_id long, text string")
    model = ngram_lm_train(train, "text", order=4)
    assert len(model.grams) == 4
    ngram_lm_save(model, str(tmp_path / "m4"))
    loaded = ngram_lm_load(spark, str(tmp_path / "m4"))
    assert loaded.order == 4 and len(loaded.grams) == 4
    a = {r["doc_id"]: r["avg_logprob"]
         for r in ngram_lm_score(docs, "text", "doc_id", model).collect()}
    b = {r["doc_id"]: r["avg_logprob"]
         for r in ngram_lm_score(docs, "text", "doc_id", loaded).collect()}
    assert a == b
    # backoff_frac at order 3: counts tokens whose LONGEST AVAILABLE gram
    # missed. "the cat sat" all-seen at every order -> 0.0; an unseen
    # continuation backs off -> > 0
    m3 = ngram_lm_train(train, "text", order=3)
    sigs = {r["doc_id"]: r["backoff_frac"] for r in ngram_lm_score(
        spark.createDataFrame([(0, "the cat sat"), (1, "the cat dog")],
                              "doc_id long, text string"),
        "text", "doc_id", m3, signals=True).collect()}
    assert sigs[0] == pytest.approx(0.0)
    assert sigs[1] > 0.0
