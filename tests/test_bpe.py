"""BPE tokenizer (operators/bpe.py). Training is iterative and not
SQL-expressible, so correctness is pinned here instead of the oracle
window: an independent naive reference implementation (quadratic,
no index) must produce identical merges and encodings, plus the
structural invariants (lossless concat, determinism, count ordering).
"""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import functions as F

from d2d_spark.operators.bpe import (
    PRETOKEN_RE,
    bpe_encode,
    train_bpe,
    train_bpe_from_frequencies,
    word_frequencies,
)


# -- independent reference implementation (deliberately naive) --------
def _ref_train(freqs, n_merges):
    words = {i: [list(w), c] for i, (w, c) in enumerate(freqs)}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for syms, c in words.values():
            for p in zip(syms, syms[1:]):
                pc[p] += c
        cands = [(c, p) for p, c in pc.items() if c >= 2]
        if not cands:
            break
        best_c = max(c for c, _ in cands)
        pair = min(p for c, p in cands if c == best_c)
        merges.append(pair)
        for i, (syms, c) in words.items():
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and (syms[j], syms[j + 1]) == pair:
                    out.append(pair[0] + pair[1])
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = [out, c]
    return merges


def _ref_encode(word, merges):
    syms = list(word)
    for pair in merges:  # apply merges in rank order, exhaustively
        out, j = [], 0
        while j < len(syms):
            if j + 1 < len(syms) and (syms[j], syms[j + 1]) == pair:
                out.append(pair[0] + pair[1])
                j += 2
            else:
                out.append(syms[j])
                j += 1
        syms = out
    return syms


CORPUS = [
    "low lower lowest slow slowly slower",
    "new newer newest fewer fewest",
    "the low new slow the the lower newer",
    "widest wide wider width with within",
]


def test_training_matches_reference(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)], ["i", "text"])
    freqs = word_frequencies(df, "text")
    assert train_bpe_from_frequencies(freqs, 40) == _ref_train(freqs, 40)


def test_encoding_matches_reference(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)], ["i", "text"])
    merges = train_bpe(df, "text", n_merges=30)
    out = bpe_encode(df, "text", merges).collect()
    pat = re.compile(PRETOKEN_RE)
    for r in out:
        expect = [t for w in pat.findall(r.text) for t in _ref_encode(w, merges)]
        assert r.bpe_tokens == expect
        assert r.n_tokens_bpe_exact == len(expect)


def test_encoding_is_lossless_per_word(spark, sf_dir):
    from d2d_spark.session import read_table

    d = read_table(spark, sf_dir, "documents").select("doc_id", "text").limit(50)
    merges = train_bpe(d, "text", n_merges=200)
    pat = re.compile(PRETOKEN_RE)
    for r in bpe_encode(d, "text", merges).collect():
        assert "".join(r.bpe_tokens) == "".join(pat.findall(r.text))


def test_deterministic_across_partitionings(spark, sf_dir):
    from d2d_spark.session import read_table

    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    m1 = train_bpe(d, "text", n_merges=100)
    m2 = train_bpe(d.repartition(13), "text", n_merges=100)
    assert m1 == m2


def test_count_bounds(spark, sf_dir):
    """Every pre-token encodes to >= 1 subword and <= its chars, so
    summed counts sit between the regex pre-token count and the
    non-space char count; more merges can only shrink the total."""
    from d2d_spark.session import read_table
    from d2d_spark.functions.text import token_count_bpe

    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    merges = train_bpe(d, "text", n_merges=300)
    out = bpe_encode(d, "text", merges).withColumn("regex_count", token_count_bpe(F.col("text")))
    row = out.agg(
        F.sum("n_tokens_bpe_exact").alias("bpe"),
        F.sum("regex_count").alias("pre"),
        F.sum(F.length(F.regexp_replace("text", r"\s+", ""))).alias("chars"),
    ).collect()[0]
    assert row["pre"] <= row["bpe"] <= row["chars"]
    few = bpe_encode(d, "text", merges[:50]).agg(
        F.sum("n_tokens_bpe_exact").alias("bpe")
    ).collect()[0]["bpe"]
    assert row["bpe"] <= few

def test_null_and_empty_text(spark):
    df = spark.createDataFrame([(1, None), (2, ""), (3, "ok ok")], ["i", "text"])
    merges = [("o", "k")]
    rows = {r.i: r for r in bpe_encode(df, "text", merges).collect()}
    assert rows[1].bpe_tokens is None and rows[1].n_tokens_bpe_exact is None
    assert rows[2].bpe_tokens == [] and rows[2].n_tokens_bpe_exact == 0
    assert rows[3].bpe_tokens == ["ok", "ok"]


def test_bpe_pack_mix_composition(spark):
    """The registered bpe_pack_mix_pipeline end-to-end, audited by the
    independent naive reference: the pipeline's bin inventory and
    mixture totals must equal what reference-BPE token counts imply —
    the tokenizer genuinely drives the packing and mixing."""
    import math
    import re

    from d2d_spark.operators.bpe import PRETOKEN_RE, train_bpe
    from d2d_spark.plans.registry import load_all

    sf_dir = "/root/testdata/sf0.001"
    out = load_all()["bpe_pack_mix_pipeline"].fn(spark, sf_dir).collect()

    from d2d_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    pat = re.compile(PRETOKEN_RE)
    merges = train_bpe(
        read_table(spark, sf_dir, "documents"), "text", n_merges=100, top_words=10_000
    )
    ref_counts = {
        r["doc_id"]: sum(len(_ref_encode(w, merges)) for w in pat.findall(r["text"] or ""))
        for r in docs
    }
    total = sum(ref_counts.values())
    budget = int(math.ceil(total / 20.0))

    bins = [r for r in out if r["leg"] == "bin"]
    assert sum(r["n"] for r in bins) == len(docs)
    assert sum(r["tok"] for r in bins) == total
    for r in bins:
        # a bin over budget can only be a single over-budget document
        assert r["tok"] <= budget or r["n"] == 1
    assert len(bins) <= 2 * math.ceil(total / budget) + 1

    mix = {r["k"]: (r["n"], r["tok"]) for r in out if r["leg"] == "mix"}
    head_ids = [d for d in ref_counts if d % 3 == 0]
    tail_ids = [d for d in ref_counts if d % 3 != 0]
    assert mix["head#0"] == (len(head_ids), sum(ref_counts[d] for d in head_ids))
    assert mix["tail#0"] == (len(tail_ids), sum(ref_counts[d] for d in tail_ids))
    assert mix["tail#1"] == mix["tail#0"]
    assert set(mix) == {"head#0", "tail#0", "tail#1"}


def test_merges_serialize_roundtrip(spark):
    """Train -> save -> load -> encode must equal encoding with the
    in-memory merges (the tokenizer artifact lifecycle)."""
    from d2d_spark.operators.bpe import (
        bpe_encode,
        merges_from_text,
        merges_to_text,
        train_bpe,
    )

    df = spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string")
    merges = train_bpe(df, "text", n_merges=50)
    assert merges, "fixture corpus must learn some merges"
    loaded = merges_from_text(merges_to_text(merges))
    assert loaded == merges
    a = bpe_encode(df, "text", merges).orderBy("doc_id").collect()
    b = bpe_encode(df, "text", loaded).orderBy("doc_id").collect()
    assert [r["bpe_tokens"] for r in a] == [r["bpe_tokens"] for r in b]


def test_merges_text_rejects_garbage():
    import pytest

    from d2d_spark.operators.bpe import merges_from_text, merges_to_text

    with pytest.raises(ValueError, match="malformed"):
        merges_from_text("a b c\n")
    with pytest.raises(ValueError, match="whitespace"):
        merges_to_text([("a b", "c")])
    assert merges_from_text("#version: x\n\n") == []
