"""Unigram-LM subword tokenizer (Kudo 2018, "Subword Regularization"
— the model behind SentencePiece's unigram mode): the second trained
tokenizer family next to BPE. Where BPE greedily merges pairs, the
unigram model keeps a probabilistic piece vocabulary and segments by
maximum likelihood — a different inductive bias that tends to produce
more linguistically coherent pieces.

Split of labor is identical to operators/bpe.py and for the same
reason (tokenizer training is inherently a bounded sequential job;
encoding is the distributed pass):

  train  — ONE distributed word-frequency aggregate (shared with BPE:
           word_frequencies, same pre-token regex) truncated to
           ``top_words``; everything after runs in pure Python over
           that BOUNDED table: seed vocabulary = most frequent
           substrings, then Viterbi-EM rounds (hard EM: E-step
           re-segments every table word by current piece log-probs,
           M-step re-estimates from the Viterbi counts) interleaved
           with probability pruning down to ``vocab_size``.
  encode — mapInPandas with the piece table in the closure (a few
           hundred KB); per-batch word memoization as in bpe_encode.

Determinism contract (so two trainings/encodings agree bit-for-bit on
any host or partitioning): seed selection orders by (count desc,
piece asc); Viterbi ties break toward FEWER pieces, then the
lexicographically smaller piece at each boundary; pruning keeps the
highest-probability pieces with (logp desc, piece asc) order; single
characters are never pruned (any string stays segmentable). Unknown
characters at encode time segment as themselves with a floor
log-probability (the byte-fallback analog) — encoding is total.
"""

from __future__ import annotations

import math
from collections import defaultdict
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from d2d_spark.operators.bpe import PRETOKEN_RE, word_frequencies

_FLOOR = -30.0  # unknown-char log-prob floor


@dataclass(frozen=True)
class UnigramModel:
    """piece -> natural-log probability (normalized over the vocab)."""

    logp: dict[str, float]

    @property
    def vocab_size(self) -> int:
        return len(self.logp)


def _viterbi(word: str, logp: dict[str, float], max_len: int) -> list[str]:
    """Max-likelihood segmentation with the documented tie rules:
    higher total logp, then fewer pieces, then the lexicographically
    smaller piece ending at each position. Unknown single chars get
    the floor, so every word segments."""
    n = len(word)
    # best[i] = (score, n_pieces, piece ending at i)
    best: list[tuple[float, int, str] | None] = [None] * (n + 1)
    best[0] = (0.0, 0, "")
    for i in range(1, n + 1):
        cand: tuple[float, int, str] | None = None
        for j in range(max(0, i - max_len), i):
            if best[j] is None:
                continue
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                if i - j > 1:
                    continue
                lp = _FLOOR
            score = best[j][0] + lp
            key = (-score, best[j][1] + 1, piece)
            if cand is None or key < (-cand[0], cand[1], cand[2]):
                cand = (score, best[j][1] + 1, piece)
        best[i] = cand
    out: list[str] = []
    i = n
    while i > 0:
        piece = best[i][2]
        out.append(piece)
        i -= len(piece)
    return out[::-1]


def train_unigram_from_frequencies(
    freqs: list[tuple[str, int]],
    vocab_size: int = 4000,
    max_piece_len: int = 12,
    seed_mult: int = 4,
    n_iters: int = 3,
) -> UnigramModel:
    """Pure-Python trainer over a bounded (word, count) table — see
    module docstring for the algorithm and determinism contract."""
    if vocab_size < 2:
        raise ValueError(f"vocab_size must be >= 2, got {vocab_size}")
    if not freqs:
        raise ValueError("train_unigram: empty frequency table")
    chars = {c for w, _ in freqs for c in w}
    # seed: substring occurrence counts, weighted by word frequency
    counts: dict[str, int] = defaultdict(int)
    for w, c in freqs:
        n = len(w)
        for i in range(n):
            for ln in range(1, min(max_piece_len, n - i) + 1):
                counts[w[i : i + ln]] += c
    n_seed = max(vocab_size * seed_mult, len(chars))
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    seed = {p for p, _ in ranked[:n_seed]} | chars
    total = sum(counts[p] for p in seed)
    logp = {p: math.log(counts[p] / total) for p in seed}

    def em_round(lp: dict[str, float]) -> dict[str, float]:
        used: dict[str, int] = defaultdict(int)
        for w, c in freqs:
            for piece in _viterbi(w, lp, max_piece_len):
                used[piece] += c
        kept = {p: n for p, n in used.items() if p in lp}
        for ch in chars:  # single chars always survive
            kept.setdefault(ch, 1)
        tot = sum(kept.values())
        return {p: math.log(n / tot) for p, n in kept.items()}

    for _ in range(n_iters):
        logp = em_round(logp)
        if len(logp) > vocab_size:
            keep = sorted(logp.items(), key=lambda kv: (-kv[1], kv[0]))
            pruned = {p: lp for p, lp in keep[:vocab_size]}
            for ch in chars:
                pruned.setdefault(ch, logp[ch])
            logp = pruned
    # final renormalize after the last prune — summed in SORTED piece
    # order so the float fold is input-order invariant (dict order
    # varies with the caller's table order; last-ulp drift would break
    # the determinism contract)
    z = math.log(sum(math.exp(lp) for _, lp in sorted(logp.items())))
    return UnigramModel(logp={p: lp - z for p, lp in sorted(logp.items())})


def train_unigram(
    df: DataFrame,
    text_col: str,
    vocab_size: int = 4000,
    top_words: int = 50_000,
    max_piece_len: int = 12,
    seed_mult: int = 4,
    n_iters: int = 3,
) -> UnigramModel:
    """Distributed wrapper: one corpus word-frequency aggregate (the
    same bounded table BPE trains from), then the pure-Python EM."""
    return train_unigram_from_frequencies(
        word_frequencies(df, text_col, top_words),
        vocab_size=vocab_size,
        max_piece_len=max_piece_len,
        seed_mult=seed_mult,
        n_iters=n_iters,
    )


def unigram_encode(
    df: DataFrame, text_col: str, model: UnigramModel, out_col: str = "pieces"
) -> DataFrame:
    """Append ``out_col`` = array<string> of unigram pieces (Viterbi
    segmentation of each pre-token, concatenated in order). Arrow-
    batched; the piece table rides the closure; per-batch word
    memoization amortizes repeated words. NULL text -> NULL pieces."""
    import re

    import pandas as pd

    logp = dict(model.logp)
    max_len = max((len(p) for p in logp), default=1)
    pretok = re.compile(PRETOKEN_RE)
    fields = list(df.schema.fields) + [
        T.StructField(out_col, T.ArrayType(T.StringType()))
    ]
    schema = T.StructType(fields)

    def run(batches):
        memo: dict[str, list[str]] = {}

        def enc(text):
            if text is None:
                return None
            out: list[str] = []
            for w in pretok.findall(text):
                got = memo.get(w)
                if got is None:
                    got = _viterbi(w, logp, max_len)
                    memo[w] = got
                out.extend(got)
            return out

        for pdf in batches:
            out = pdf.copy()
            out[out_col] = pd.Series(
                [enc(t) for t in pdf[text_col]], index=pdf.index, dtype="object"
            )
            yield out

    return df.mapInPandas(run, schema)
