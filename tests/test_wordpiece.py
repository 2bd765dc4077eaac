"""WordPiece tokenizer (operators/wordpiece.py): the likelihood-score
merge rule (NOT BPE's frequency rule), exact-integer tie discipline,
greedy longest-match encoding with whole-word [UNK] fallback,
distributed-encode parity, determinism, vocab round-trip."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from d2d_spark.operators.wordpiece import (
    CONT,
    WordPieceModel,
    _encode_word,
    train_wordpiece,
    train_wordpiece_from_frequencies,
    vocab_from_text,
    vocab_to_text,
    wordpiece_encode,
)


def naive_train(freqs, n_merges, min_pair=2):
    """Recount-from-scratch replay of the documented rule (the
    operator keeps incremental indexes)."""
    words = [[w[0]] + [CONT + ch for ch in w[1:]] for w, _ in freqs if w]
    cnts = [c for w, c in freqs if w]
    vocab = sorted({s for syms in words for s in syms})
    for _ in range(n_merges):
        pc, sc = {}, {}
        for syms, c in zip(words, cnts):
            for s in syms:
                sc[s] = sc.get(s, 0) + c
            for p in zip(syms, syms[1:]):
                pc[p] = pc.get(p, 0) + c
        best, bn, bd = None, 0, 1
        for p in sorted(pc):
            n = pc[p]
            if n < min_pair:
                continue
            d = sc[p[0]] * sc[p[1]]
            if best is None or n * bd > bn * d:
                best, bn, bd = p, n, d
        if best is None:
            break
        a, b = best
        new = a + (b[len(CONT):] if b.startswith(CONT) else b)
        vocab.append(new)
        for i, syms in enumerate(words):
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                    out.append(new)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = out
    return vocab


def test_score_rule_beats_raw_frequency():
    # pair (c, ##d) occurs only twice but its parts NEVER occur apart
    # -> score 2/(2*2) = 0.5; (a, ##b)/(a, ##c)/(a, ##d) are far more
    # frequent but 'a' is promiscuous, so their scores are tiny. BPE
    # would merge an 'a' pair first; WordPiece must pick (c, ##d).
    freqs = [("ab", 10), ("ac", 50), ("ad", 50), ("cd", 2)]
    m = train_wordpiece_from_frequencies(freqs, n_merges=1)
    assert m.vocab[-1] == "cd"


def test_exact_tie_breaks_lexicographic():
    # two pairs with the exact same score ratio: (a,##b) 2/(2*2) and
    # (c,##d) 2/(2*2) -> the lexicographically smaller pair wins
    freqs = [("ab", 2), ("cd", 2)]
    m = train_wordpiece_from_frequencies(freqs, n_merges=1)
    assert m.vocab[-1] == "ab"


def test_training_matches_naive_replay():
    freqs = [
        ("internationalization", 7),
        ("international", 11),
        ("nation", 23),
        ("nations", 9),
        ("the", 55),
        ("there", 13),
        ("cat", 17),
        ("cats", 8),
        ("concat", 3),
    ]
    m = train_wordpiece_from_frequencies(freqs, n_merges=25)
    assert list(m.vocab) == naive_train(freqs, 25)
    # input-order invariance (the table is sorted upstream, but the
    # trainer itself must not depend on row order)
    m2 = train_wordpiece_from_frequencies(list(reversed(freqs)), n_merges=25)
    assert m2.vocab == m.vocab


def test_min_pair_count_stops_early():
    freqs = [("ab", 1), ("cd", 1)]
    m = train_wordpiece_from_frequencies(freqs, n_merges=10)
    # nothing occurs twice -> alphabet only
    assert m.vocab == ("##b", "##d", "a", "c")


def test_encode_longest_match_and_unk():
    vocab = frozenset(["un", "##able", "##b", "##le", "##a", "u", "##n", "b"])
    assert _encode_word("unable", vocab, "[UNK]", 100) == ["un", "##able"]
    # greedy: longest prefix first even when a shorter split also works
    assert _encode_word("unb", vocab, "[UNK]", 100) == ["un", "##b"]
    # any unmatched position -> the WHOLE word is [UNK], never partial
    assert _encode_word("unz", vocab, "[UNK]", 100) == ["[UNK]"]
    # over-long words go straight to [UNK]
    assert _encode_word("unable", vocab, "[UNK]", 3) == ["[UNK]"]
    assert _encode_word("", vocab, "[UNK]", 100) == []


def test_encode_lossless_for_covered_words():
    freqs = [("hello", 10), ("help", 8), ("yellow", 6)]
    m = train_wordpiece_from_frequencies(freqs, n_merges=30)
    vocab = frozenset(m.vocab)
    for w in ("hello", "help", "yellow", "hell", "yell"):
        pieces = _encode_word(w, vocab, m.unk, 100)
        assert "".join(p[len(CONT):] if p.startswith(CONT) else p for p in pieces) == w


def test_distributed_encode_matches_per_word_reference(spark):
    rows = [
        (0, "the cat sat on the mat"),
        (1, "cats and nations, internationalization!"),
        (2, None),
        (3, "zzz@@ unknownglyphés"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    freqs = [
        ("the", 50), ("cat", 20), ("cats", 10), ("nation", 30),
        ("nations", 12), ("internationalization", 4), ("sat", 9),
        ("mat", 9), ("on", 25), ("and", 25),
    ]
    m = train_wordpiece_from_frequencies(freqs, n_merges=40)
    import re

    from d2d_spark.operators.bpe import PRETOKEN_RE

    pat = re.compile(PRETOKEN_RE)
    vocab = frozenset(m.vocab)

    def ref(text):
        if text is None:
            return None
        return [p for w in pat.findall(text) for p in _encode_word(w, vocab, m.unk, 100)]

    for n_parts in (1, 7):
        got = {
            r["doc_id"]: (r["wp_tokens"], r["n_tokens_wp"])
            for r in wordpiece_encode(df.repartition(n_parts), "text", m).collect()
        }
        for i, t in rows:
            exp = ref(t)
            assert got[i][0] == exp
            assert got[i][1] == (len(exp) if exp is not None else None)


def test_train_on_fixture_corpus(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    m = train_wordpiece(d, "text", n_merges=50, top_words=2000)
    assert m.vocab_size > 50
    enc = wordpiece_encode(d.limit(40), "text", m)
    out = enc.select("text", "wp_tokens").collect()
    vocab = set(m.vocab) | {m.unk}
    for r in out:
        assert all(t in vocab for t in r["wp_tokens"])
        # piece count never exceeds character count
        assert len(r["wp_tokens"]) <= len(r["text"])


def test_vocab_text_round_trip():
    m = WordPieceModel(vocab=("a", "##b", "ab", "abc"), unk="[UNK]")
    assert vocab_from_text(vocab_to_text(m)) == m
    with pytest.raises(ValueError):
        vocab_to_text(WordPieceModel(vocab=("a b",)))
    with pytest.raises(ValueError):
        vocab_from_text("")


def test_validation():
    with pytest.raises(ValueError):
        train_wordpiece_from_frequencies([], n_merges=5)
    with pytest.raises(ValueError):
        train_wordpiece_from_frequencies([("ab", 2)], n_merges=-1)
    with pytest.raises(ValueError):
        train_wordpiece_from_frequencies([("ab", 2)], n_merges=1, min_pair_count=0)
    with pytest.raises(ValueError):
        wordpiece_encode(None, "text", WordPieceModel(vocab=("a",)), max_word_chars=0)
