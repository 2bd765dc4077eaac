"""Unicode text normalization — the cleanup pass crawl pipelines run
BEFORE tokenization/dedup (the ftfy/"fix-text" tradition, the subset
that matters at corpus frequency). Everything is pure Column
`translate`/`regexp_replace` expressions: JVM codegen, rides the
scan, zero Python.

Why it's here: dedup keys and n-gram models are byte-sensitive — the
same sentence with a curly vs straight apostrophe, an NBSP vs a
space, or a stray zero-width joiner fingerprint as different
documents and fragment token statistics. Normalizing first makes the
downstream operators (fingerprint, minhash shingles, token counts,
BPE pre-tokens) see one canonical form.

Rules (each independently usable, `normalize_text` composes all):

  strip_control_chars   — C0/C1 controls except tab/newline; BOM/ZWSP/
                          ZWNJ/ZWJ/word-joiner; soft hyphen
  normalize_punctuation — curly quotes -> straight, en/em/minus
                          dashes -> '-', ellipsis char -> '...',
                          fullwidth ASCII -> ASCII
  normalize_spaces      — NBSP/thin/ideographic and the other Zs
                          spaces -> ' '

Deliberately NOT here: full NFKC (needs ICU; these rules cover the
high-frequency cases bytes-for-bytes deterministically), language
transliteration, mojibake repair (ftfy's encoding back-tracking is
heuristic and destructive on clean text).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: zero-width / invisible formatting characters that fragment tokens:
#: ZWSP, ZWNJ, ZWJ, word joiner, BOM/ZWNBSP, soft hyphen
_INVISIBLES = "".join(chr(c) for c in (0x200B, 0x200C, 0x200D, 0x2060, 0xFEFF, 0x00AD))

#: C0 controls minus tab(09)/newline(0a) — carriage return maps to
#: newline first so Windows line endings survive as line breaks
_CONTROLS = "".join(
    chr(c) for c in list(range(0x00, 0x09)) + [0x0B, 0x0C] + list(range(0x0E, 0x20))
) + "\x7f"

#: the Unicode space zoo: NBSP, Ogham mark, en quad..hair space
#: (2000-200A), narrow NBSP, math space, ideographic space, plus the
#: line/paragraph separators
_SPACES = "".join(
    chr(c)
    for c in [0x00A0, 0x1680]
    + list(range(0x2000, 0x200B))
    + [0x202F, 0x205F, 0x3000, 0x2028, 0x2029]
)

#: single-char punctuation folds, built pointwise so FROM and TO stay
#: aligned: curly single quotes + primes + acute/backtick -> ', curly
#: double quotes + double prime -> ", the dash family (incl. the
#: minus sign) -> -
_SINGLE_Q = [0x2018, 0x2019, 0x201A, 0x201B, 0x2032, 0x2035, 0x00B4, 0x0060]
_DOUBLE_Q = [0x201C, 0x201D, 0x201E, 0x201F, 0x2033]
_DASHES = [0x2010, 0x2011, 0x2012, 0x2013, 0x2014, 0x2015, 0x2212]
_PUNCT_FROM = "".join(chr(c) for c in _SINGLE_Q + _DOUBLE_Q + _DASHES)
_PUNCT_TO = "'" * len(_SINGLE_Q) + '"' * len(_DOUBLE_Q) + "-" * len(_DASHES)


def strip_control_chars(col: Column) -> Column:
    """Remove C0/C1 controls (keeping tab and newline; CR/CRLF become
    newline), zero-width characters, BOM and soft hyphen."""
    col = F.regexp_replace(col, r"\r\n?", "\n")
    col = F.translate(col, _CONTROLS + _INVISIBLES, "")
    # C1 block (U+0080-U+009F) via regex — translate's literal string
    # would need the raw code points, the class is clearer
    return F.regexp_replace(col, r"[\x80-\x9f]", "")


def normalize_spaces(col: Column) -> Column:
    """Fold the Unicode space zoo (NBSP, thin, ideographic, line and
    paragraph separators, ...) to a plain ASCII space."""
    return F.translate(col, _SPACES, " " * len(_SPACES))


def normalize_punctuation(col: Column) -> Column:
    """Fold typographic punctuation to its ASCII form: curly quotes
    and primes to straight quotes, the dash family (incl. minus sign)
    to '-', the ellipsis character to '...', and fullwidth ASCII
    (U+FF01-U+FF5E) to its ASCII counterpart."""
    col = F.translate(col, _PUNCT_FROM, _PUNCT_TO)
    col = F.replace(col, F.lit("…"), F.lit("..."))
    # fullwidth block is a fixed offset from ASCII: build the
    # translate table once at plan time
    full = "".join(chr(c) for c in range(0xFF01, 0xFF5F)) + "　"
    ascii_ = "".join(chr(c - 0xFEE0) for c in range(0xFF01, 0xFF5F)) + " "
    return F.translate(col, full, ascii_)


def normalize_text(col: Column) -> Column:
    """The full pass: controls/invisibles out, spaces and punctuation
    folded. Idempotent (every rule maps into its own fixed-point set);
    plain ASCII passes through unchanged — both test-pinned."""
    return normalize_punctuation(normalize_spaces(strip_control_chars(col)))
