"""Incremental end-to-end curation round: a crawl arriving in TWO
WARC batches — parse → url/text normalize → incremental near-dup
dedup against a persistent SignatureStore → quality gate → token
count → pack — must select EXACTLY the documents the one-shot
pipeline over the union selects.

Equivalence scope (documented, not hand-waved): the store path and
the one-shot path share hashing, banding, verification and the
min-id-wins rule, so selection is identical whenever duplicate
groups are CLIQUES under the Jaccard threshold (every member similar
to every member — the usual shape for crawl re-fetches and template
clones) and batch order follows id order. Non-clique chains (A~B,
B~C, A!~C) can legitimately differ: one-shot drops B and C, while an
incremental split {A,B} then {C} keeps C because its only witness B
never entered the store. The gate/token/pack stages are stateless
per doc, so their equality follows from selection equality; packing
BIN IDS are arrival-dependent by design (bins never span batches) —
what is pinned is that every per-batch packing is budget-respecting
and covers each batch's survivors exactly once.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from tests.test_warc import _http, _record

WORDS = [f"tok{i}" for i in range(120)]


def _page(rng: random.Random, n: int = 45) -> str:
    return " ".join(rng.choice(WORDS) for _ in range(n))


def _near_clone(rng: random.Random, text: str, n_edits: int = 2) -> str:
    toks = text.split()
    for _ in range(n_edits):
        toks[rng.randrange(len(toks))] = rng.choice(WORDS)
    return " ".join(toks)


def _build_corpus():
    """(page_no, uri, html_text) rows: quality originals, junk pages,
    an in-batch clone pair, and a CROSS-batch clone (batch 2 re-fetch
    of a batch 1 page — the row only the store can catch)."""
    rng = random.Random(42)
    pages = []  # (no, uri_suffix, body_text)
    texts = {}
    for no in range(8):  # batch 1: 0..7
        t = _page(rng)
        texts[no] = t
        pages.append((no, f"page{no}?utm_source=feed#frag", t))
    pages.append((8, "page8", _near_clone(rng, texts[3])))  # in-batch near dup of 3
    pages.append((9, "page9", "spam spam"))  # fails the quality gate
    for no in range(10, 16):  # batch 2: 10..15
        t = _page(rng)
        texts[no] = t
        pages.append((no, f"page{no}", t))
    pages.append((16, "page16", _near_clone(rng, texts[5])))  # cross-batch dup of 5
    pages.append((17, "page17", _near_clone(rng, texts[12])))  # in-batch dup of 12
    pages.append((18, "page18", "spam spam"))
    batch1 = [p for p in pages if p[0] < 10]
    batch2 = [p for p in pages if p[0] >= 10]
    return batch1, batch2


def _warc_bytes(pages) -> bytes:
    out = _record("warcinfo", "", b"software: test\r\n", rid="<urn:uuid:0>")
    for no, suffix, body in pages:
        html = f"<html><body><p>{body}</p></body></html>"
        out += _record(
            "response",
            f"http://www.example.com/{suffix}",
            _http(html),
            rid=f"<urn:uuid:{no + 1}>",
        )
    return out


def _parse_and_normalize(spark, path: str):
    """WARC → (doc_id, url, text): visible text via html_to_text,
    canonical url via normalize_url (tracking params + fragments
    dropped), doc_id from the page number so ids are batch-ordered."""
    from d2d_spark.functions.urls import normalize_url
    from d2d_spark.sources.warc import warc_html_text

    docs = warc_html_text(spark, path)
    return docs.select(
        F.regexp_extract("target_uri", r"page(\d+)", 1).cast("long").alias("doc_id"),
        normalize_url(F.col("target_uri")).alias("url"),
        "text",
    )


def _gate_count_pack(kept):
    """The stateless tail: quality gate → token count → pack."""
    from d2d_spark.functions.text import quality_score, tokens_ws
    from d2d_spark.operators.sampling import pack_documents

    good = kept.filter(quality_score(F.col("text")) >= 0.5).withColumn(
        "ntok", F.size(tokens_ws(F.col("text")))
    )
    packed = pack_documents(
        good.repartition(1), "ntok", budget=120, sort_col="doc_id"
    )
    return good, packed


def test_incremental_two_batch_equals_one_shot(spark, tmp_path):
    from d2d_spark.operators.dedup import SignatureStore

    batch1, batch2 = _build_corpus()
    for name, pages in (("b1", batch1), ("b2", batch2), ("all", batch1 + batch2)):
        d = tmp_path / name
        d.mkdir()
        (d / "crawl.warc").write_bytes(_warc_bytes(pages))

    def store_at(name):
        return SignatureStore(
            str(tmp_path / f"store_{name}"), num_hashes=32, bands=8,
            shingle_n=3, jaccard_threshold=0.5,
        )

    # --- incremental: batch 1 then batch 2 against the SAME store ---
    inc = store_at("inc")
    b1 = _parse_and_normalize(spark, str(tmp_path / "b1") + "/*")
    b2 = _parse_and_normalize(spark, str(tmp_path / "b2") + "/*")
    s1 = inc.dedup_batch(b1, "text", "doc_id")
    good1, packed1 = _gate_count_pack(s1)
    rows1 = packed1.collect()
    s2 = inc.dedup_batch(b2, "text", "doc_id")
    good2, packed2 = _gate_count_pack(s2)
    rows2 = packed2.collect()

    # --- one-shot: the union through a FRESH store in one call ---
    oneshot = store_at("one")
    u = _parse_and_normalize(spark, str(tmp_path / "all") + "/*")
    su = oneshot.dedup_batch(u, "text", "doc_id")
    goodu, packedu = _gate_count_pack(su)
    rowsu = packedu.collect()

    # selection equality: the incremental survivors ARE the one-shot
    # survivors — in-batch dups (8, 17), the cross-batch re-fetch (16,
    # caught only via the store), junk gated later
    inc_ids = {r["doc_id"] for r in s1.collect()} | {r["doc_id"] for r in s2.collect()}
    one_ids = {r["doc_id"] for r in su.collect()}
    assert inc_ids == one_ids
    for dup in (8, 16, 17):
        assert dup not in one_ids
    assert 3 in one_ids and 5 in one_ids and 12 in one_ids

    # stateless tail equality: same gated docs, same per-doc tokens,
    # same normalized urls (tracking params and fragments gone)
    inc_tok = {(r["doc_id"], r["ntok"]) for df in (good1, good2) for r in df.collect()}
    one_tok = {(r["doc_id"], r["ntok"]) for r in goodu.collect()}
    assert inc_tok == one_tok
    assert 9 not in {i for i, _ in one_tok} and 18 not in {i for i, _ in one_tok}
    urls = {r["url"] for r in goodu.collect()}
    assert all("utm" not in u_ and "#" not in u_ for u_ in urls)

    # packing: every per-batch packing covers its survivors exactly
    # once within budget; the union of incremental packs carries
    # exactly the one-shot docs (bin ids are arrival-dependent)
    for rows in (rows1, rows2, rowsu):
        by_bin: dict[int, int] = {}
        for r in rows:
            by_bin[r["bin_id"]] = by_bin.get(r["bin_id"], 0) + r["ntok"]
        assert all(v <= 120 for v in by_bin.values())
    assert {r["doc_id"] for r in rows1} | {r["doc_id"] for r in rows2} == {
        r["doc_id"] for r in rowsu
    }
    assert len(rows1) + len(rows2) == len(rowsu)

    # replaying batch 2 against the store re-derives the same
    # survivors (crash-between-append-and-commit safety)
    s2_replay = inc.dedup_batch(b2, "text", "doc_id")
    assert {r["doc_id"] for r in s2_replay.collect()} == {
        r["doc_id"] for r in s2.collect()
    }
