"""Distributed BPE trainer/encoder vs the pure-Python reference: the
merge SEQUENCE (not just the vocab) must be identical, which pins the
pair counting, weighting, and tie-break order."""

import pytest
from pyspark.sql import functions as F

from epic_pandas_spark.functions.bpe import (
    bpe_encode,
    bpe_train,
    bpe_train_reference,
    _merge_word,
)
from epic_pandas_spark.session import load_table
from tests.conftest import SF_DIR


def test_merge_word_greedy_nonoverlapping():
    assert _merge_word(list("aaa"), "a", "a") == ["aa", "a"]
    assert _merge_word(list("abab"), "a", "b") == ["ab", "ab"]
    assert _merge_word(["ab", "c"], "ab", "c") == ["abc"]
    assert _merge_word(list("xy"), "a", "b") == ["x", "y"]


def test_bpe_train_matches_reference_on_toy_corpus(spark):
    texts = [
        "low low low low low",
        "lower lower newest newest newest newest newest newest",
        "widest widest widest",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = bpe_train(df, "text", n_merges=10, mode="distributed")
    want = bpe_train_reference(texts, n_merges=10)
    assert bpe_train(df, "text", n_merges=10) == want  # auto (local path) agrees
    assert got == want
    assert len(got) == 10 and got[0][0] and got[0][1]


def test_bpe_train_matches_reference_on_documents(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(120)
    texts = [r["text"] for r in docs.select("text").collect()]
    got = bpe_train(docs, "text", n_merges=12, mode="distributed")
    want = bpe_train_reference(texts, n_merges=12)
    assert got == want


def test_bpe_encode_roundtrip_consistency(spark):
    """Encoding must (a) apply merges exactly as training did — a word
    seen in training encodes to its final training symbols — and (b)
    concatenate back to the original normalized word."""
    texts = ["banana banana banana bandana", "an ban nan"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    merges = bpe_train(df, "text", n_merges=6)
    enc = bpe_encode(df, "text", merges)
    rows = enc.select("text", "tokens").collect()
    for r in rows:
        rebuilt = "".join(r["tokens"])
        assert rebuilt == r["text"].lower().replace(" ", "")
    # empty / null robustness
    edge = spark.createDataFrame([("",), (None,)], "text string")
    got = bpe_encode(edge, "text", merges).select("tokens").collect()
    assert [list(r["tokens"]) for r in got] == [[], []]


def test_bpe_train_early_stop_and_validation(spark):
    df = spark.createDataFrame([("a b c",)], "text string")  # no pair twice
    assert bpe_train(df, "text", n_merges=5) == []
    with pytest.raises(ValueError):
        bpe_train(df, "text", n_merges=0)
    with pytest.raises(ValueError):
        bpe_train(df, "text", n_merges=1, mode="nope")
