"""PII detection and redaction for training-data pipelines.

Regex-heuristic detectors for the PII classes a web-scale corpus scrub
covers first (emails, phone numbers, IP addresses, SSN-style ids,
16-digit card-style numbers), exposed two ways:

- ``pii_counts(col)``   -> struct of per-class match counts (audit /
  filtering signal),
- ``redact_pii(col)``   -> text with each match replaced by a typed
  placeholder like ``<EMAIL>`` (the scrub itself).

All pure ``pyspark.sql.functions`` Column expressions — JVM regex,
whole-stage codegen, no Python in the hot path, no shuffle. Patterns
are deliberately simple and deterministic (the plumbing is the point;
swap in stricter patterns freely). Redaction order is fixed so classes
whose lexemes nest (card numbers contain phone-like digit runs, IPs
contain bare numbers) are consumed by the most specific class first.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Ordered most-specific first; redaction applies in this order.
PII_PATTERNS: dict[str, str] = {
    # local@domain.tld (no spaces, one @)
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # dotted quad, each octet 1-3 digits; \b guards keep it off longer
    # digit runs
    "ip": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    # 16 digits in groups of 4 separated by space/dash (or solid)
    "card": r"\b\d{4}[ -]?\d{4}[ -]?\d{4}[ -]?\d{4}\b",
    # 3-2-4 dashed id (SSN-shaped)
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    # +country / (area) / dashed-dotted local forms, 7+ digits total
    "phone": r"(?:\+\d{1,3}[ .-]?)?(?:\(\d{2,4}\)[ .-]?)?\d{3}[ .-]\d{3,4}[ .-]?\d{0,4}\b",
}


def pii_count(col: Column, kind: str) -> Column:
    """Match count for one PII class (key of ``PII_PATTERNS``)."""
    return F.regexp_count(col, F.lit(PII_PATTERNS[kind]))


def pii_counts(col: Column) -> Column:
    """Struct of per-class match counts, e.g.
    ``{email: 2, ip: 0, card: 0, ssn: 1, phone: 0}``.

    Counts overlap-naive: a card number also matching the phone
    pattern counts under both (redact_pii resolves the overlap by
    order; the counts are an audit signal, not a partition)."""
    return F.struct(*[pii_count(col, k).alias(k) for k in PII_PATTERNS])


def redact_pii(col: Column, kinds: tuple[str, ...] = tuple(PII_PATTERNS)) -> Column:
    """Replace each match with its typed placeholder (``<EMAIL>``,
    ``<IP>``, ...). Classes apply in ``PII_PATTERNS`` order regardless
    of the order given in ``kinds``, so nested lexemes resolve to the
    most specific class deterministically."""
    out = col
    for k in PII_PATTERNS:
        if k in kinds:
            out = F.regexp_replace(out, PII_PATTERNS[k], f"<{k.upper()}>")
    return out


def has_pii(col: Column) -> Column:
    """True if any class matches — the cheap pre-filter: a corpus
    scrub runs the (pure-filter, no-shuffle) detector over everything
    and the rewrite only over the matching minority. ``rlike`` (not
    ``regexp_count``) so each class short-circuits at its first
    match instead of scanning the document to the end."""
    out = F.lit(False)
    for k in PII_PATTERNS:
        out = out | col.rlike(PII_PATTERNS[k])
    return out
