"""Byte-pair-encoding tokenizer (Sennrich et al. 2016, the GPT-2
pre-tokenizer shape) — real subword token counts for token-budget
mixing, packing, and per-token costing, replacing the regex
approximation in functions/text.token_count_bpe when fidelity
matters.

Split of labor mirrors practice: tokenizer TRAINING is a bounded
single-node job (every production tokenizer is trained on a sample —
the merge loop is inherently sequential), while ENCODING is the
distributed pass:

  train — ONE distributed word-frequency aggregate over the corpus
          (pre-tokens from the same regex as token_count_bpe),
          truncated to the ``top_words`` most frequent words
          (deterministic ties) — the driver sees a BOUNDED frequency
          table regardless of corpus size, never rows. The merge loop
          runs in pure Python over that table with a pair->words
          index so each merge touches only affected words.
  encode — mapInPandas with the merge ranks shipped in the closure
          (a few hundred KB); per-batch word memoization makes the
          per-row cost ~O(distinct words), which on natural text is a
          fraction of total words.

The merge loop is deterministic: best pair = (max count, then
lexicographically smallest pair), so two trainings on the same
frequency table produce identical merges on any host.
"""

from __future__ import annotations

import re
from collections import defaultdict

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: pre-tokenizer — identical to functions/text.token_count_bpe so the
#: regex count is exactly "BPE tokens before any merges"
PRETOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def word_frequencies(
    df: DataFrame, text_col: str, top_words: int = 50_000
) -> list[tuple[str, int]]:
    """Distributed word-frequency table, truncated to ``top_words``
    (count desc, word asc — deterministic on any partitioning). The
    single corpus-wide aggregate in the whole training path."""
    rows = (
        df.select(
            F.explode(F.regexp_extract_all(F.col(text_col), F.lit(PRETOKEN_RE), 0)).alias(
                "w"
            )
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "w")
        .limit(top_words)
        .collect()
    )
    return [(r["w"], r["c"]) for r in rows]


def train_bpe(
    df: DataFrame,
    text_col: str,
    n_merges: int = 1000,
    top_words: int = 50_000,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns the
    ordered merge list (rank = position). Stops early when no pair
    occurs twice."""
    freqs = word_frequencies(df, text_col, top_words)
    return train_bpe_from_frequencies(freqs, n_merges)


def train_bpe_from_frequencies(
    freqs: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """The driver-side merge loop, separated for testability. Keeps a
    pair -> {word ids} index so each merge rescans only the words that
    actually contain the winning pair."""
    words: list[list[str]] = [list(w) for w, _ in freqs]
    counts: list[int] = [c for _, c in freqs]
    pair_counts: dict[tuple[str, str], int] = defaultdict(int)
    pair_words: dict[tuple[str, str], set[int]] = defaultdict(set)
    for i, syms in enumerate(words):
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] += counts[i]
            pair_words[(a, b)].add(i)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair: tuple[str, str] | None = None
        best_count = 1
        for p, c in pair_counts.items():
            if c > best_count or (c == best_count and pair is not None and p < pair):
                pair, best_count = p, c
        if pair is None:
            break
        merges.append(pair)
        merged = pair[0] + pair[1]
        for i in list(pair_words.get(pair, ())):
            syms = words[i]
            c = counts[i]
            # remove old pair contributions for this word
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] -= c
                if pair_counts[(a, b)] <= 0:
                    pair_counts.pop((a, b), None)
                s = pair_words.get((a, b))
                if s is not None:
                    s.discard(i)
                    if not s:
                        pair_words.pop((a, b), None)
            # apply the merge left-to-right
            out: list[str] = []
            j = 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == pair[0] and syms[j + 1] == pair[1]:
                    out.append(merged)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = out
            for a, b in zip(out, out[1:]):
                pair_counts[(a, b)] += c
                pair_words[(a, b)].add(i)
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    syms = list(word)
    while len(syms) > 1:
        best_rank = None
        best_j = -1
        for j, p in enumerate(zip(syms, syms[1:])):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_j = r, j
        if best_rank is None:
            break
        # merge EVERY occurrence of the winning pair, left to right —
        # the standard greedy step, one pair per iteration
        pair = (syms[best_j], syms[best_j + 1])
        merged = pair[0] + pair[1]
        out: list[str] = []
        j = 0
        while j < len(syms):
            if j + 1 < len(syms) and syms[j] == pair[0] and syms[j + 1] == pair[1]:
                out.append(merged)
                j += 2
            else:
                out.append(syms[j])
                j += 1
        syms = out
    return syms


def bpe_encode(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]],
    out_col: str = "bpe_tokens",
    count_col: str | None = "n_tokens_bpe_exact",
) -> DataFrame:
    """Append the BPE token array (and optionally its length). The
    merge table rides the task closure; encoding is Arrow-batched with
    per-batch word memoization."""
    import pandas as pd

    ranks = {p: i for i, p in enumerate(merges)}
    pat = re.compile(PRETOKEN_RE)
    fields = list(df.schema.fields) + [T.StructField(out_col, T.ArrayType(T.StringType()))]
    if count_col:
        fields.append(T.StructField(count_col, T.IntegerType()))
    schema = T.StructType(fields)

    def run(batches):
        cache: dict[str, list[str]] = {}

        def enc(text):
            if text is None:
                return None
            toks: list[str] = []
            for w in pat.findall(text):
                got = cache.get(w)
                if got is None:
                    got = _encode_word(w, ranks)
                    cache[w] = got
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


def merges_to_text(merges: list[tuple[str, str]]) -> str:
    """Serialize the learned merge list in the GPT-2 ``merges.txt``
    shape: a version header, then one space-separated pair per line in
    rank order. Unambiguous because pre-tokens (PRETOKEN_RE) never
    contain whitespace, so neither does any merged symbol — asserted
    here so a future pre-tokenizer change fails loudly instead of
    writing an unparseable table."""
    lines = ["#version: d2d-bpe-1"]
    for a, b in merges:
        if any(ch.isspace() for ch in a + b):
            raise ValueError(f"merge symbols must be whitespace-free, got {(a, b)!r}")
        lines.append(f"{a} {b}")
    return "\n".join(lines) + "\n"


def merges_from_text(text: str) -> list[tuple[str, str]]:
    """Parse `merges_to_text` output (header and blank lines ignored);
    rank = line order. Round-trips bit-exactly with the writer."""
    merges: list[tuple[str, str]] = []
    for ln in text.splitlines():
        if not ln.strip() or ln.startswith("#"):
            continue
        parts = ln.split(" ")
        if len(parts) != 2:
            raise ValueError(f"malformed merge line: {ln!r}")
        merges.append((parts[0], parts[1]))
    return merges
