"""Text-analysis functions for large-scale training-data pipelines:
tokenization, language-ID heuristics, quality scoring, fingerprinting.

All pure ``pyspark.sql.functions`` Column expressions — JVM-side,
whole-stage-codegen friendly, no Python in the hot path. These are
capability extensions beyond the reference (BASELINE.json north star),
operating on the `documents` fixture table.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A BPE-ish pre-tokenizer: letter runs, digit runs, single
# non-alphanumeric marks (GPT-2-style pre-split, ASCII approximation).
BPE_SPLIT_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

EN_STOPWORDS = ("the", "a", "an", "and", "of", "to", "in", "is", "for", "on")


def tokens_ws(col: Column) -> Column:
    """Whitespace tokens (collapsing runs)."""
    return F.split(F.trim(col), r"\s+")


def token_count_ws(col: Column) -> Column:
    return F.size(tokens_ws(col))


def token_count_bpe(col: Column) -> Column:
    """Count of BPE-ish pre-tokens — a fast, deterministic proxy for
    LLM token counts."""
    return F.regexp_count(col, F.lit(BPE_SPLIT_PATTERN))


#: sentence boundary: terminal punctuation (optionally closing
#: quote/bracket) followed by whitespace. A pragmatic rule, not a
#: linguistic one — abbreviations like "Dr." split; RAG/chunking
#: pipelines tolerate over-splitting far better than mid-sentence
#: cuts, and the rule stays deterministic and SQL-mirrorable.
SENTENCE_SPLIT_PATTERN = r'(?<=[.!?]["”\')\]]?)\s+'


def split_sentences(col: Column) -> Column:
    """Array of sentences: split after terminal punctuation (with an
    optional closing quote/bracket) + whitespace; runs of whitespace
    collapse. Empty/whitespace text gives an empty array."""
    return F.filter(
        F.split(F.trim(col), SENTENCE_SPLIT_PATTERN), lambda s: s != ""
    )


def sentence_count(col: Column) -> Column:
    return F.size(split_sentences(col))


def stopword_count(col: Column, stopwords=EN_STOPWORDS) -> Column:
    return F.size(F.filter(tokens_ws(F.lower(col)), lambda x: x.isin(list(stopwords))))


def stopword_ratio(col: Column, stopwords=EN_STOPWORDS) -> Column:
    return stopword_count(col, stopwords) / token_count_ws(col)


def punct_ratio(col: Column) -> Column:
    """Fraction of characters that are common punctuation. NULL for
    empty text (nullif guard: a bare /length throws DIVIDE_BY_ZERO
    under ANSI mode, which Spark 4 enables by default)."""
    stripped = F.regexp_replace(col, r"[.,!?;:]", "")
    return (F.length(col) - F.length(stripped)) / F.nullif(F.length(col), F.lit(0))


def ascii_ratio(col: Column) -> Column:
    """Fraction of printable-ASCII characters — a crude script
    detector feeding the language-ID heuristic. NULL for empty text
    (ANSI divide-by-zero guard)."""
    kept = F.regexp_replace(col, "[^ -~]", "")
    return F.length(kept) / F.nullif(F.length(col), F.lit(0))


def mean_word_len(col: Column) -> Column:
    toks = tokens_ws(col)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return total / F.size(toks)


def lang_id(col: Column) -> Column:
    """N-gram/stopword heuristic language ID: English-ish if mostly
    ASCII and carrying English stopwords; 'other' for non-ASCII-heavy
    text; 'unknown' otherwise. Deliberately simple and deterministic —
    the point is the distributed plumbing, swap the heuristic freely."""
    return (
        F.when((ascii_ratio(col) >= 0.9) & (stopword_ratio(col) >= 0.02), F.lit("en"))
        .when(ascii_ratio(col) < 0.5, F.lit("other"))
        .otherwise(F.lit("unknown"))
    )


def quality_score(col: Column) -> Column:
    """Composite document-quality score in [0, ~1]: long enough, low
    punctuation noise, natural stopword density, sane word lengths.
    The exact shape mirrors C4/Gopher-style heuristic filters."""
    len_score = F.least(F.length(col) / F.lit(500.0), F.lit(1.0))
    sw = stopword_ratio(col)
    sw_score = F.least(sw / F.lit(0.05), F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(col) * 5)
    wl = mean_word_len(col)
    wl_score = F.when((wl >= 3) & (wl <= 10), F.lit(1.0)).otherwise(F.lit(0.5))
    return len_score * 0.4 + sw_score * 0.3 + punct_pen * 0.2 + wl_score * 0.1


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of the casefolded,
    whitespace-collapsed text — the exact-dedup key."""
    normalized = F.lower(F.regexp_replace(F.trim(col), r"\s+", " "))
    return F.md5(normalized)


def lines_of(col: Column) -> Column:
    """Non-empty trimmed lines of a document."""
    return F.filter(F.transform(F.split(col, r"\n"), lambda l: F.trim(l)), lambda l: l != "")


def dup_line_fraction(col: Column) -> Column:
    """Fraction of lines that are repeats of an earlier line —
    the Gopher repetition filter's `duplicate_line_fraction` signal
    (Rae et al. 2021, table A1). 0.0 for all-distinct documents,
    NULL for documents with no non-empty lines (ANSI divide guard).
    Pure per-row Column expression: embarrassingly parallel, no
    shuffle, whole-stage codegen."""
    ls = lines_of(col)
    n = F.size(ls)
    return (n - F.size(F.array_distinct(ls))) / F.nullif(n, F.lit(0)).cast("double")


def dup_line_char_fraction(col: Column) -> Column:
    """Fraction of line-characters sitting in duplicated lines
    (every occurrence of a line that appears >1x counts, matching
    Gopher's `duplicate_line_character_fraction`). NULL when there
    are no non-empty lines.

    Per-line occurrence counts come from a higher-order filter —
    O(lines^2) per document, bounded by document size, still a pure
    per-row map with no shuffle."""
    ls = lines_of(col)
    total = F.aggregate(ls, F.lit(0), lambda acc, l: acc + F.length(l))
    dup_chars = F.aggregate(
        ls,
        F.lit(0),
        lambda acc, l: acc
        + F.when(F.size(F.filter(ls, lambda x: x == l)) > 1, F.length(l)).otherwise(0),
    )
    return dup_chars / F.nullif(total, F.lit(0)).cast("double")


def top_ngram_fraction(col: Column, n: int = 2) -> Column:
    """Fraction of n-gram occurrences claimed by the single most
    frequent word n-gram — Gopher's `top_n_gram_fraction` family
    (n=2..4). High values flag boilerplate/spam repetition that
    line-level dedup misses. NULL for documents shorter than n words.

    Counting is a higher-order max over distinct grams —
    O(distinct x total) per document, document-bounded, no shuffle."""
    toks = tokens_ws(col)
    k = F.size(toks)
    grams = F.when(
        k >= n,
        F.transform(
            F.sequence(F.lit(1), k - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    )
    top = F.array_max(
        F.transform(F.array_distinct(grams), lambda g: F.size(F.filter(grams, lambda x: x == g)))
    )
    return top / F.nullif(F.size(grams), F.lit(0)).cast("double")


def repetition_signals(col: Column, prefix: str = "rep_") -> dict[str, Column]:
    """The Gopher repetition-filter bundle as named Columns, ready for
    ``df.withColumns``: duplicate-line fraction, duplicate-line
    character fraction, top 2/3/4-gram occupancy."""
    return {
        f"{prefix}dup_line": dup_line_fraction(col),
        f"{prefix}dup_line_chars": dup_line_char_fraction(col),
        f"{prefix}top_2gram": top_ngram_fraction(col, 2),
        f"{prefix}top_3gram": top_ngram_fraction(col, 3),
        f"{prefix}top_4gram": top_ngram_fraction(col, 4),
    }


def shingles(col: Column, n: int = 3) -> Column:
    """Word n-gram shingles (distinct), the MinHash/Jaccard unit.
    Documents shorter than n tokens yield their full token string."""
    toks = tokens_ws(col)
    k = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(k - (n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.array_distinct(grams)


#: the published Gopher stopword list (Rae et al. 2021, Table A1) —
#: deliberately NOT EN_STOPWORDS, which serves the C4-style density
#: heuristics and has a different composition
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_flags(col: Column, prefix: str = "gq_") -> dict[str, Column]:
    """The Gopher (Rae et al. 2021) document-level quality rules as
    named boolean Columns for ``df.withColumns`` — a document passing
    every flag survives the filter. Complements `repetition_signals`
    (the repetition half of the same paper's rule set); thresholds are
    the published ones:

    - 50 <= word count <= 100,000
    - 3 <= mean word length <= 10
    - symbol-to-word ratio (# or ellipsis) <= 0.1
    - < 90% of lines start with a bullet, < 30% end with an ellipsis
    - >= 80% of words contain at least one alphabetic character
    - >= 2 distinct stopwords from the paper's own 8-word list
      (`GOPHER_STOPWORDS`) present — the "harmful boilerplate" rule
    """
    toks = tokens_ws(col)
    n = F.size(toks)
    nd = F.nullif(n, F.lit(0)).cast("double")
    lines = lines_of(col)
    nlines = F.nullif(F.size(lines), F.lit(0)).cast("double")
    mwl = mean_word_len(col)
    symbols = F.size(F.filter(toks, lambda t: t.contains("#") | t.contains("..."))) + (
        F.length(col) - F.length(F.regexp_replace(col, "…", ""))
    )
    bullet_lines = F.size(
        F.filter(lines, lambda l: F.trim(l).rlike(r"^([-*•]|\d+[.)])"))
    )
    ellipsis_lines = F.size(
        F.filter(lines, lambda l: F.trim(l).rlike(r"(\.\.\.|…)$"))
    )
    alpha_words = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    distinct_stops = F.size(
        F.array_intersect(
            F.transform(toks, lambda t: F.lower(t)),
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
        )
    )
    return {
        f"{prefix}word_count_ok": (n >= 50) & (n <= 100_000),
        f"{prefix}mean_word_len_ok": (mwl >= 3.0) & (mwl <= 10.0),
        f"{prefix}symbol_ratio_ok": (symbols / nd) <= 0.1,
        f"{prefix}bullet_lines_ok": (bullet_lines / nlines) < 0.9,
        f"{prefix}ellipsis_lines_ok": (ellipsis_lines / nlines) < 0.3,
        f"{prefix}alpha_words_ok": (alpha_words / nd) >= 0.8,
        f"{prefix}stopwords_ok": distinct_stops >= 2,
    }


def gopher_pass(col: Column) -> Column:
    """True iff every `gopher_quality_flags` rule passes (NULL-safe:
    an empty/whitespace document fails rather than passing on NULL
    ratios)."""
    flags = gopher_quality_flags(col)
    out = F.lit(True)
    for c in flags.values():
        out = out & F.coalesce(c, F.lit(False))
    return out


#: C4's (Raffel et al. 2020, §2.2) line-level blocklist phrases
_C4_BAD_PHRASES = ("javascript", "lorem ipsum", "terms of use", "privacy policy", "cookie policy", "uses cookies")


def c4_clean_lines(col: Column, min_words: int = 5) -> Column:
    """C4's LINE-level cleaning (Raffel et al. 2020): rebuild each
    document from only the lines that

    - end in a terminal mark: . ! ? optionally followed by a closing
      quote/bracket, or a bare closing quotation mark (the paper
      counts an end quotation mark itself as terminal punctuation),
    - contain at least ``min_words`` words,
    - contain no curly brace (code leakage),
    - and match none of the boilerplate blocklist phrases
      ("javascript", "lorem ipsum", policy/cookie notices).

    Two deliberate demotions from the paper: Raffel et al. apply the
    curly-brace and "lorem ipsum" rules at PAGE level (the whole
    document drops); here they drop only the offending LINE, keeping
    the rest of the page — strictly gentler, and composable with a
    page-level gate built from the same flags when wanted.

    Complements the DOCUMENT-level Gopher rules: C4 repairs pages by
    cutting boilerplate lines, Gopher drops whole documents. Pure
    Column (split → filter → rejoin), rides the scan like the rest of
    this module; documents with no surviving lines come back as the
    empty string for a downstream length filter to drop."""

    def keep(l: Column) -> Column:
        t = F.trim(l)
        low = F.lower(t)
        bad = F.lit(False)
        for p in _C4_BAD_PHRASES:
            bad = bad | low.contains(p)
        return (
            t.rlike("([.!?][\"')\\]]?|[\"”])$")
            & (F.size(F.filter(F.split(t, r"\s+"), lambda w: w != "")) >= min_words)
            & ~t.contains("{")
            & ~t.contains("}")
            & ~bad
        )

    return F.array_join(F.filter(F.split(col, "\n"), keep), "\n")


def compression_stats(col: Column, level: int = 6) -> Column:
    """struct(raw_bytes, comp_bytes, ratio) — the zlib
    compression-ratio quality signal (the classic curation tripwire
    next to the Gopher repetition heuristics: near-random text — hash
    dumps, base64 blobs, minified bundles — compresses badly, ratio
    near 1; boilerplate/templated spam compresses absurdly well,
    ratio near 0; organic prose sits roughly in [0.25, 0.6] at the
    default level). DEFLATE's entropy model catches long-range
    repetition the fixed-n n-gram fractions miss.

    Lengths are over the UTF-8 encoding; ``ratio`` =
    comp_bytes / raw_bytes as one int/int double division (NULL for
    NULL or empty text, so a band filter drops neither explicitly).

    This is the ONE text signal in this module that cannot be a pure
    Column (no DEFLATE in Catalyst): an Arrow-batched pandas UDF,
    ~level-6 zlib throughput is ~100 MB/s/core so at 100 TB it rides
    the same budget as the decode it usually accompanies. Not in the
    predicate-pushdown path — compute it once, persist it as a column
    next to the other quality stats. Determinism: zlib output for a
    given (input, level, zlib build) is fixed; lengths are stable
    across the common zlib builds for text-scale inputs, and the
    pytest twin pins exact equality in-process."""
    if not (0 <= int(level) <= 9):
        raise ValueError(f"compression_stats: level must be in [0, 9], got {level}")
    import pandas as pd
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    lv = int(level)

    @pandas_udf(
        "struct<raw_bytes: bigint, comp_bytes: bigint, ratio: double>",
        PandasUDFType.SCALAR,
    )
    def _cz(s):
        import zlib

        raw, comp, ratio = [], [], []
        for x in s:
            if x is None:
                raw.append(None), comp.append(None), ratio.append(None)
                continue
            b = x.encode("utf-8")
            c = len(zlib.compress(b, lv))
            raw.append(len(b))
            comp.append(c)
            ratio.append(c / len(b) if b else None)
        return pd.DataFrame({"raw_bytes": raw, "comp_bytes": comp, "ratio": ratio})

    return _cz(col)
