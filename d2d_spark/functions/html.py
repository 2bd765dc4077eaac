"""HTML → text extraction — the step BEFORE every text-quality
operator when the corpus arrives as crawled markup (WARC/WET-style
pipelines run exactly this before language ID, quality scoring and
dedup).

Everything is pure Column regex/string expressions (JVM codegen, zero
Python, zero shuffle — the extraction rides the scan like the other
`functions.text` signals). This is a pragmatic tag-stripper in the
WET-extraction tradition, not a DOM parser: malformed markup degrades
to extra whitespace, never to an error, and plain text passes through
unchanged (idempotence is test-pinned).

Doc-level `html_link_density` (share of visible text inside anchor
tags) is the classic boilerplate signal (jusText/Gopher lineage):
navigation/footer-heavy pages score high and get filtered, article
pages score low.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: entity set worth decoding without a full HTML5 table — the ones
#: that actually occur at corpus frequency
_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),  # LAST: otherwise "&amp;lt;" would double-decode
]

#: tags whose close (or self-close) ends a visual block — replaced by
#: newlines so paragraph structure survives for paragraph-level dedup
_BLOCK_BREAK = r"(?i)<\s*(?:/\s*(?:p|div|h[1-6]|li|ul|ol|table|tr|blockquote|section|article)|br\s*/?|hr\s*/?)\s*>"


def decode_entities(col: Column) -> Column:
    """Decode the common named/numeric entities. Ampersand decodes
    last so encoded entities ("&amp;lt;") yield their literal text
    ("&lt;") instead of double-decoding into markup."""
    for ent, ch in _ENTITIES:
        col = F.replace(col, F.lit(ent), F.lit(ch))
    return col


def strip_tags(col: Column) -> Column:
    """Remove markup, keeping visible text: script/style/comment
    blocks vanish WITH their contents, block-level tag boundaries
    become newlines, remaining tags become spaces."""
    col = F.regexp_replace(col, r"(?is)<(script|style)\b[^>]*>.*?</\1\s*>", " ")
    col = F.regexp_replace(col, r"(?s)<!--.*?-->", " ")
    col = F.regexp_replace(col, _BLOCK_BREAK, "\n")
    return F.regexp_replace(col, r"(?s)<[^>]*>", " ")


def html_to_text(col: Column) -> Column:
    """Full extraction: strip markup, decode entities, normalize
    whitespace (spaces collapse within lines, blank runs collapse to
    one newline, edges trim).

    ONE-PASS contract: idempotent on already-plain text WITHOUT
    angle brackets, but the output of a pass over entity-encoded
    markup may itself contain literal angle-bracket text (strip
    happens before decode, so "&lt;tags&gt;" correctly becomes the
    visible text "<tags>") — a second accidental pass would strip
    that as markup and silently delete content. Run the extraction
    stage exactly once per document; don't feed its output back in."""
    col = decode_entities(strip_tags(col))
    col = F.regexp_replace(col, r"[ \t\x0b\f\r]+", " ")
    col = F.regexp_replace(col, r" ?\n ?", "\n")
    col = F.regexp_replace(col, r"\n{2,}", "\n")
    # trim ALL whitespace at the edges (F.trim strips only spaces —
    # a trailing "</p>" would otherwise leave a newline behind)
    return F.regexp_replace(col, r"^\s+|\s+$", "")


def html_link_density(col: Column) -> Column:
    """Share of visible text that sits inside <a> tags, in [0, 1] —
    NULL for documents with no visible text at all. High values mark
    navigation/link-farm boilerplate; threshold upstream of the
    quality operators."""
    anchors = F.regexp_extract_all(col, F.lit(r"(?is)<a\b[^>]*>(.*?)</a\s*>"), F.lit(1))
    anchor_chars = F.aggregate(
        F.transform(anchors, lambda a: F.length(html_to_text(a))),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    total_chars = F.length(html_to_text(col))
    return F.when(
        total_chars > 0,
        F.least(anchor_chars.cast("double") / total_chars, F.lit(1.0)),
    )
