"""Unigram-LM tokenizer (operators/unigram_tok.py): training
behavior, Viterbi parity with an independent reference, round-trip
losslessness, determinism, totality on unknown characters."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from d2d_spark.operators.unigram_tok import (
    UnigramModel,
    _viterbi,
    train_unigram,
    train_unigram_from_frequencies,
    unigram_encode,
)

FREQS = [
    ("internationalization", 40),
    ("international", 60),
    ("nation", 200),
    ("nations", 80),
    ("inter", 50),
    ("the", 500),
    ("therefore", 30),
    ("cat", 120),
    ("cats", 60),
]


def py_viterbi(word, logp, max_len, floor=-30.0):
    """Independent DP with the same documented tie rules (score desc,
    fewer pieces, lexicographically smaller last piece)."""
    import itertools

    n = len(word)
    best = {0: (0.0, 0, [])}
    for i in range(1, n + 1):
        cands = []
        for j in range(max(0, i - max_len), i):
            if j not in best:
                continue
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                if len(piece) > 1:
                    continue
                lp = floor
            sc, np_, seq = best[j]
            cands.append((-(sc + lp), np_ + 1, piece, seq + [piece]))
        if cands:
            best[i] = (lambda t: (-t[0], t[1], t[3]))(min(cands, key=lambda t: t[:3]))
    return best[n][2]


def test_training_shapes_and_determinism():
    m1 = train_unigram_from_frequencies(FREQS, vocab_size=40, n_iters=3)
    m2 = train_unigram_from_frequencies(list(reversed(FREQS)), vocab_size=40, n_iters=3)
    assert m1.logp == m2.logp  # input order must not matter
    chars = {c for w, _ in FREQS for c in w}
    assert chars <= set(m1.logp)  # single chars never pruned
    assert m1.vocab_size <= 40 + len(chars)
    # probabilities normalize
    assert abs(sum(math.exp(p) for p in m1.logp.values()) - 1.0) < 1e-9
    # frequent whole words should survive as pieces
    assert "nation" in m1.logp and "the" in m1.logp


def test_viterbi_matches_reference_and_roundtrips():
    m = train_unigram_from_frequencies(FREQS, vocab_size=40, n_iters=3)
    max_len = max(len(p) for p in m.logp)
    for w, _ in FREQS + [("internationalizations", 1), ("xyzzy", 1)]:
        got = _viterbi(w, m.logp, max_len)
        assert "".join(got) == w  # lossless
        assert got == py_viterbi(w, m.logp, max_len), w


def test_em_improves_viterbi_likelihood():
    """One EM round on the un-pruned seed must not DECREASE the
    corpus Viterbi log-likelihood (hard-EM monotonicity)."""
    from d2d_spark.operators.unigram_tok import train_unigram_from_frequencies as _t

    def ll(model):
        max_len = max(len(p) for p in model.logp)
        return sum(
            c * sum(model.logp.get(p, -30.0) for p in _viterbi(w, model.logp, max_len))
            for w, c in FREQS
        )

    m0 = _t(FREQS, vocab_size=10_000, n_iters=1)   # big vocab: no prune
    m1 = _t(FREQS, vocab_size=10_000, n_iters=2)
    assert ll(m1) >= ll(m0) - 1e-9


def test_encode_distributed(spark):
    m = train_unigram_from_frequencies(FREQS, vocab_size=40, n_iters=3)
    df = spark.createDataFrame(
        [(1, "the nation of cats"), (2, "internationalization!"), (3, None)],
        "id long, text string",
    )
    out = {r["id"]: r["pieces"] for r in unigram_encode(df, "text", m).collect()}
    assert out[3] is None
    assert "".join(out[1]) == "thenationofcats"  # pre-tokens drop spaces
    assert "".join(out[2]) == "internationalization!"
    max_len = max(len(p) for p in m.logp)
    want1 = [p for w in ("the", "nation", "of", "cats") for p in py_viterbi(w, m.logp, max_len)]
    assert out[1] == want1


def test_train_on_fixture_corpus(spark, sf_dir):
    from d2d_spark.session import read_table

    d = read_table(spark, sf_dir, "documents").limit(200)
    m = train_unigram(d, "text", vocab_size=500, top_words=2000, n_iters=2)
    assert 2 <= m.vocab_size
    enc = unigram_encode(d, "text", m)
    row = enc.select(F.size("pieces").alias("n")).agg(F.sum("n")).first()
    assert row[0] > 0
    # pieces reconstruct each doc's pre-token stream
    sample = enc.select("text", "pieces").first()
    import re

    from d2d_spark.operators.bpe import PRETOKEN_RE

    assert "".join(sample["pieces"]) == "".join(re.findall(PRETOKEN_RE, sample["text"]))


def test_validation():
    with pytest.raises(ValueError, match="vocab_size"):
        train_unigram_from_frequencies(FREQS, vocab_size=1)
    with pytest.raises(ValueError, match="empty"):
        train_unigram_from_frequencies([])
