"""WordPiece subword tokenizer (Schuster & Nakajima 2012; Wu et al.
2016 — the BERT tokenizer): the third trained tokenizer family next
to BPE (operators/bpe.py) and unigram-LM (operators/unigram_tok.py).
Where BPE merges the most FREQUENT pair and unigram keeps a
probabilistic vocabulary, WordPiece merges the pair with the highest
LIKELIHOOD ratio score count(ab) / (count(a) * count(b)) — it prefers
pairs whose parts rarely occur apart, a different inductive bias that
yields morpheme-like pieces. Encoding is greedy longest-match-first
with ``##`` continuation markers and whole-word [UNK] fallback — the
published BERT rule, NOT BPE's merge replay.

Split of labor is identical to the other two trainers and for the
same reason (tokenizer training is inherently a bounded sequential
job; encoding is the distributed pass):

  train  — ONE distributed word-frequency aggregate (shared with BPE:
           word_frequencies, same pre-token regex) truncated to
           ``top_words``; the merge loop runs in pure Python over that
           BOUNDED table with a pair -> {word ids} index so each merge
           rescans only affected words.
  encode — mapInPandas with the vocabulary set in the closure (a few
           hundred KB); per-batch word memoization as in bpe_encode.

Determinism contract: the winning pair maximizes the score with ties
broken toward the lexicographically smallest (left, right) pair, and
scores are compared as EXACT integer cross-products —
n1*(cA2*cB2) > n2*(cA1*cB1) — never as float ratios, so two trainings
on the same frequency table agree bit-for-bit on any host. Training
stops early when no pair occurs at least ``min_pair_count`` times.

Scale posture: the only corpus-scale work is the word-frequency
aggregate (one explode + one bounded groupBy — the same plan BPE and
unigram train from, so a pipeline training all three tokenizers can
reuse one table via the *_from_frequencies entry points). The merge
loop sees a <= top_words table regardless of corpus size; encode is a
map-only Arrow pass, zero shuffle.
"""

from __future__ import annotations

import re
from collections import defaultdict
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401  (parity with sibling modules)
from pyspark.sql import types as T

from d2d_spark.operators.bpe import PRETOKEN_RE, word_frequencies

#: continuation marker for non-initial pieces (the BERT convention)
CONT = "##"


@dataclass(frozen=True)
class WordPieceModel:
    """Learned vocabulary: every initial-alphabet symbol plus one
    entry per merge, in rank order (alphabet first, sorted). ``unk``
    is the whole-word fallback token."""

    vocab: tuple[str, ...]
    unk: str = "[UNK]"

    @property
    def vocab_size(self) -> int:
        return len(self.vocab)


def _word_symbols(word: str) -> list[str]:
    """'hello' -> ['h', '##e', '##l', '##l', '##o']."""
    return [word[0]] + [CONT + ch for ch in word[1:]]


def _merge_symbols(a: str, b: str) -> str:
    """Join two adjacent symbols; the right side's continuation
    marker disappears (it is no longer word-initial-relative)."""
    return a + (b[len(CONT):] if b.startswith(CONT) else b)


def train_wordpiece_from_frequencies(
    freqs: list[tuple[str, int]],
    n_merges: int = 1000,
    min_pair_count: int = 2,
    unk: str = "[UNK]",
) -> WordPieceModel:
    """The driver-side merge loop, separated for testability (the
    train_bpe_from_frequencies pattern). Vocabulary = initial alphabet
    (sorted) + merged symbols in rank order."""
    if n_merges < 0:
        raise ValueError(f"n_merges must be >= 0, got {n_merges}")
    if min_pair_count < 1:
        raise ValueError(f"min_pair_count must be >= 1, got {min_pair_count}")
    if not freqs:
        raise ValueError("train_wordpiece: empty frequency table")
    words: list[list[str]] = [_word_symbols(w) for w, _ in freqs if w]
    counts: list[int] = [c for w, c in freqs if w]

    sym_counts: dict[str, int] = defaultdict(int)
    pair_counts: dict[tuple[str, str], int] = defaultdict(int)
    pair_words: dict[tuple[str, str], set[int]] = defaultdict(set)
    for i, syms in enumerate(words):
        c = counts[i]
        for s in syms:
            sym_counts[s] += c
        for p in zip(syms, syms[1:]):
            pair_counts[p] += c
            pair_words[p].add(i)

    alphabet = sorted(sym_counts)
    merged_vocab: list[str] = []
    for _ in range(n_merges):
        # winner maximizes count(ab)/(count(a)*count(b)); compared as
        # exact integer cross-products, ties to the smallest pair
        best: tuple[str, str] | None = None
        best_n = 0
        best_d = 1
        for p, n in pair_counts.items():
            if n < min_pair_count:
                continue
            d = sym_counts[p[0]] * sym_counts[p[1]]
            if best is None or n * best_d > best_n * d or (
                n * best_d == best_n * d and p < best
            ):
                best, best_n, best_d = p, n, d
        if best is None:
            break
        new_sym = _merge_symbols(*best)
        merged_vocab.append(new_sym)
        for i in list(pair_words.get(best, ())):
            syms = words[i]
            c = counts[i]
            # retract this word's current contributions
            for s in syms:
                sym_counts[s] -= c
            for p in zip(syms, syms[1:]):
                pair_counts[p] -= c
                if pair_counts[p] <= 0:
                    pair_counts.pop(p, None)
                s = pair_words.get(p)
                if s is not None:
                    s.discard(i)
                    if not s:
                        pair_words.pop(p, None)
            # apply the merge left-to-right
            out: list[str] = []
            j = 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == best[0] and syms[j + 1] == best[1]:
                    out.append(new_sym)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = out
            # re-add the rewritten word's contributions
            for s in out:
                sym_counts[s] += c
            for p in zip(out, out[1:]):
                pair_counts[p] += c
                pair_words[p].add(i)
    return WordPieceModel(vocab=tuple(alphabet) + tuple(merged_vocab), unk=unk)


def train_wordpiece(
    df: DataFrame,
    text_col: str,
    n_merges: int = 1000,
    top_words: int = 50_000,
    min_pair_count: int = 2,
    unk: str = "[UNK]",
) -> WordPieceModel:
    """Distributed wrapper: one corpus word-frequency aggregate (the
    same bounded table BPE and unigram train from), then the
    pure-Python merge loop."""
    return train_wordpiece_from_frequencies(
        word_frequencies(df, text_col, top_words),
        n_merges=n_merges,
        min_pair_count=min_pair_count,
        unk=unk,
    )


def _encode_word(
    word: str, vocab: frozenset, unk: str, max_word_chars: int
) -> list[str]:
    """BERT's WordPieceTokenizer rule: greedy longest-match-first,
    continuation pieces carry ``##``, and a word where ANY position
    fails to match becomes ONE [UNK] token (never a partial mix).
    Words longer than ``max_word_chars`` go straight to [UNK]."""
    if not word:
        return []
    if len(word) > max_word_chars:
        return [unk]
    out: list[str] = []
    start = 0
    n = len(word)
    while start < n:
        end = n
        piece = None
        while end > start:
            cand = word[start:end]
            if start > 0:
                cand = CONT + cand
            if cand in vocab:
                piece = cand
                break
            end -= 1
        if piece is None:
            return [unk]
        out.append(piece)
        start = end
    return out


def wordpiece_encode(
    df: DataFrame,
    text_col: str,
    model: WordPieceModel,
    out_col: str = "wp_tokens",
    count_col: str | None = "n_tokens_wp",
    max_word_chars: int = 100,
) -> DataFrame:
    """Append the WordPiece token array (and optionally its length).
    The vocabulary rides the task closure; encoding is Arrow-batched
    with per-batch word memoization. NULL text -> NULL tokens."""
    import pandas as pd

    if max_word_chars < 1:
        raise ValueError(f"max_word_chars must be >= 1, got {max_word_chars}")
    vocab = frozenset(model.vocab)
    unk = model.unk
    pat = re.compile(PRETOKEN_RE)
    fields = list(df.schema.fields) + [T.StructField(out_col, T.ArrayType(T.StringType()))]
    if count_col:
        fields.append(T.StructField(count_col, T.IntegerType()))
    schema = T.StructType(fields)

    def run(batches):
        memo: dict[str, list[str]] = {}

        def enc(text):
            if text is None:
                return None
            toks: list[str] = []
            for w in pat.findall(text):
                got = memo.get(w)
                if got is None:
                    got = _encode_word(w, vocab, unk, max_word_chars)
                    memo[w] = got
                toks.extend(got)
            return toks

        for pdf in batches:
            out = pdf.copy()
            encoded = [enc(t) for t in pdf[text_col]]
            out[out_col] = pd.Series(encoded, index=pdf.index, dtype="object")
            if count_col:
                out[count_col] = pd.Series(
                    [len(e) if e is not None else None for e in encoded],
                    index=pdf.index,
                    dtype="Int32",
                )
            yield out

    return df.mapInPandas(run, schema=schema)


def vocab_to_text(model: WordPieceModel) -> str:
    """Serialize in the BERT ``vocab.txt`` shape: one piece per line,
    [UNK] first, then the learned vocabulary in rank order. Pieces are
    whitespace-free by the pre-tokenizer contract — asserted so a
    future pre-tokenizer change fails loudly."""
    for p in model.vocab:
        if any(ch.isspace() for ch in p):
            raise ValueError(f"vocab pieces must be whitespace-free, got {p!r}")
    return "\n".join([model.unk, *model.vocab]) + "\n"


def vocab_from_text(text: str) -> WordPieceModel:
    """Parse ``vocab_to_text`` output (first line = unk). Round-trips
    bit-exactly with the writer."""
    lines = [ln for ln in text.splitlines() if ln]
    if not lines:
        raise ValueError("empty wordpiece vocab file")
    return WordPieceModel(vocab=tuple(lines[1:]), unk=lines[0])
