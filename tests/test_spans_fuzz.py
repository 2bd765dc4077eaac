"""Differential fuzz for the span dedup operator: random small
corpora vs an independent brute-force Python implementation of the
same contract (window ownership by min (doc, pos), interval merge,
first-occurrence-survives stitching). Catches tie-break and boundary
drift the fixture corpus can't."""

from __future__ import annotations

import random


def _brute_strip(docs: dict[int, str], k: int) -> dict[int, tuple[str, int]]:
    """Reference implementation: returns {doc_id: (clean_text, dropped)}."""
    occurrences: dict[str, list[tuple[int, int]]] = {}
    for did in sorted(docs):
        t = docs[did]
        for pos in range(max(len(t) - k + 1, 0)):
            occurrences.setdefault(t[pos : pos + k], []).append((did, pos))
    dup_positions: dict[int, set[int]] = {d: set() for d in docs}
    for occ in occurrences.values():
        if len(occ) >= 2:
            owner = min(occ)
            for o in occ:
                if o != owner:
                    dup_positions[o[0]].add(o[1])
    out = {}
    for did, t in docs.items():
        # merge [pos, pos+k) intervals
        drop = [False] * len(t)
        for p in sorted(dup_positions[did]):
            for j in range(p, min(p + k, len(t))):
                drop[j] = True
        clean = "".join(c for c, d in zip(t, drop) if not d)
        out[did] = (clean, len(t) - len(clean))
    return out


def _random_corpus(rng: random.Random, n_docs: int) -> dict[int, str]:
    """Small alphabet + shared phrases force plenty of window
    collisions, including in-document repeats and prefix/suffix
    overlaps."""
    phrases = ["".join(rng.choice("abc ") for _ in range(rng.randint(8, 30))) for _ in range(4)]
    docs = {}
    for i in range(n_docs):
        parts = []
        for _ in range(rng.randint(1, 6)):
            if rng.random() < 0.6:
                parts.append(rng.choice(phrases))
            else:
                parts.append("".join(rng.choice("abcxyz ") for _ in range(rng.randint(0, 25))))
        docs[i] = "".join(parts)
    return docs


def test_strip_matches_bruteforce_on_random_corpora(spark):
    from d2d_spark.operators.spans import duplicate_span_stats, strip_duplicate_spans

    rng = random.Random(20260814)
    for trial in range(6):
        k = rng.choice([5, 8, 12])
        docs = _random_corpus(rng, rng.randint(3, 10))
        expected = _brute_strip(docs, k)
        df = spark.createDataFrame(list(docs.items()), ["doc_id", "text"])
        got = {
            r.doc_id: (r.text, r.n_dropped_chars)
            for r in strip_duplicate_spans(df, "text", "doc_id", k=k).collect()
        }
        assert got == expected, f"trial {trial} k={k} docs={docs}"
        stats = {
            r.doc_id: r.dup_chars
            for r in duplicate_span_stats(df, "text", "doc_id", k=k).collect()
        }
        assert stats == {d: v[1] for d, v in expected.items()}, f"trial {trial} stats"
