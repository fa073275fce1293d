"""Unit tests for the scale-evidence harness (scripts/gen_scale_data.py).

No SparkSession needed: these pin the pure-numpy properties the trend
evidence leans on — vocabulary distinctness, the Zipf shape, and the
sf-scaling that keeps the shingle space open as the corpus grows.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.gen_scale_data import zipf_vocab  # noqa: E402


def test_zipf_vocab_distinct_words_and_normalized_probs():
    words, p = zipf_vocab(5000)
    assert len(words) == 5000
    assert len(set(words)) == 5000  # base-45 encoding is injective
    assert abs(float(p.sum()) - 1.0) < 1e-9
    assert (p > 0).all()


def test_zipf_vocab_rank_frequency_shape():
    """p_r ∝ 1/r^1.05: monotone decreasing, and the measured log-log
    slope between decades is ~ -1.05."""
    _, p = zipf_vocab(10_000)
    assert p[0] > p[9] > p[99] > p[999]
    slope = np.log(p[999] / p[9]) / np.log(1000 / 10)
    assert abs(slope + 1.05) < 0.01


def test_zipf_vocab_scales_open_gram_space():
    """The head mass SHRINKS as the vocabulary grows (more of the draw
    distributes into the tail), which is what keeps per-shingle doc
    frequency ~flat as sf grows — the property the round-5 corpus fix
    exists to provide."""
    _, p_small = zipf_vocab(2_000)
    _, p_large = zipf_vocab(50_000)
    head_small = float(p_small[:100].sum())
    head_large = float(p_large[:100].sum())
    assert head_large < head_small
    # expected distinct trigrams per doc-pair collision stays bounded:
    # the top-gram probability (rough upper bound on trigram df share)
    # drops as the vocab scales
    assert p_large[0] < p_small[0]
