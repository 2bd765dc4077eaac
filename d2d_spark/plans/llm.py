"""LLM training-data pipeline queries: text analysis, dedup family,
similarity search, multimodal plumbing (BASELINE.json north star).

Oracle conventions (see relational.py): ratios are single int/int
double divisions (bit-identical across engines); similarity scores are
rounded to 6 decimals on both sides; LSH projections use exact integer
weights so bucketing reproduces anywhere.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from d2d_spark.functions.frames import local_frame

from d2d_spark.functions import text as X
from d2d_spark.operators import dedup as D
from d2d_spark.operators import multimodal as M
from d2d_spark.operators import similarity as S
from d2d_spark.plans.registry import query
from d2d_spark.session import read_table


def _t(spark, sf_dir, name):
    return read_table(spark, sf_dir, name)


# DuckDB equivalents of the text helpers (functions/text.py), kept in
# lockstep with the Spark expressions.
_SQL_TOKS = r"string_split_regex(trim(text), '\s+')"
_SQL_NTOK = f"len({_SQL_TOKS})"
_SQL_STOP = (
    f"len(list_filter(string_split_regex(trim(lower(text)), '\\s+'), "
    "t -> t IN ('the','a','an','and','of','to','in','is','for','on')))"
)
_SQL_ASCII = "length(regexp_replace(text, '[^ -~]', '', 'g'))*1.0 / nullif(length(text), 0)"
_SQL_MWL = f"list_sum(list_transform({_SQL_TOKS}, t -> length(t)))*1.0 / {_SQL_NTOK}"
_SQL_PUNCT = (
    "(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))*1.0"
    " / nullif(length(text), 0)"
)
# word-3-gram shingles, distinct
_SQL_SHINGLES = (
    f"list_distinct(list_transform(range(1, greatest({_SQL_NTOK} - 2, 1) + 1), "
    f"i -> array_to_string(({_SQL_TOKS})[i:i+2], ' ')))"
)
# C4/Gopher-style heuristic quality score (functions/text.py:quality_score)
_SQL_QUALITY = (
    "least(length(text)/500.0, 1.0) * 0.4"
    f" + least(({_SQL_STOP}*1.0/{_SQL_NTOK}) / 0.05, 1.0) * 0.3"
    f" + greatest(0.0, 1.0 - ({_SQL_PUNCT}) * 5) * 0.2"
    f" + (CASE WHEN {_SQL_MWL} >= 3 AND {_SQL_MWL} <= 10 THEN 1.0 ELSE 0.5 END) * 0.1"
)


_TEXT_STATS_SQL = f"""
    SELECT 'stats' AS leg, CAST(doc_id AS VARCHAR) AS k,
           length(text) AS n_chars_measured,
           {_SQL_NTOK} AS n_tokens_ws,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_tokens_bpe,
           {_SQL_STOP} AS n_stopwords,
           {_SQL_MWL} AS mean_word_len,
           CAST(NULL AS BIGINT) AS cnt, CAST(NULL AS DOUBLE) AS sum_quality
    FROM documents
    UNION ALL
    SELECT 'langq' AS leg,
           (CASE WHEN {_SQL_ASCII} >= 0.9 AND {_SQL_STOP}*1.0/{_SQL_NTOK} >= 0.02 THEN 'en'
                 WHEN {_SQL_ASCII} < 0.5 THEN 'other'
                 ELSE 'unknown' END) || '|' || lang AS k,
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE),
           COUNT(*) AS cnt,
           CAST(SUM(CAST({_SQL_QUALITY} AS DECIMAL(18,6))) AS DOUBLE) AS sum_quality
    FROM documents GROUP BY 2
    """


def _text_stats_oracle() -> str:
    """Existing stats/langq SQL + a literal-VALUES 'zratio' block:
    zlib lengths cannot be expressed in DuckDB, so the expectation is
    precomputed in Python (the SAME zlib build the Spark-side Arrow
    kernel calls in this environment) per fixture, gated by the
    corpus-content sftag like the other literal oracles."""
    import zlib

    import pyarrow.parquet as pq

    from d2d_spark.plans.registry import fixture_table_paths

    rows = []
    for path in fixture_table_paths("documents"):
        try:
            tb = pq.read_table(path, columns=["doc_id", "text"])
        except Exception:  # noqa: BLE001 - missing fixture dir is fine
            continue
        ids = tb.column("doc_id").to_pylist()
        texts = tb.column("text").to_pylist()
        tag = sum(len(t) for t in texts if t is not None)
        for i, t in zip(ids, texts):
            if i % 20 != 0:
                continue
            if t is None:
                rows.append((tag, i, "NULL", "NULL", "NULL"))
                continue
            b = t.encode("utf-8")
            c = len(zlib.compress(b, 6))
            ratio = repr(round(c / len(b), 9)) if b else "NULL"
            rows.append((tag, i, len(b), c, ratio))
    if not rows:
        rows = [(-1, -1, "NULL", "NULL", "NULL")]
    values = ",\n     ".join(
        f"({t}, {i}, {rb}, {cb}, {ra})" for t, i, rb, cb, ra in rows
    )
    return (
        _TEXT_STATS_SQL
        + f"""
    UNION ALL
    SELECT 'zratio' AS leg, CAST(k AS VARCHAR) AS k,
           CAST(rawb AS BIGINT) AS n_chars_measured,
           CAST(compb AS BIGINT) AS n_tokens_ws,
           CAST(NULL AS BIGINT) AS n_tokens_bpe,
           CAST(NULL AS BIGINT) AS n_stopwords,
           CAST(ratio AS DOUBLE) AS mean_word_len,
           CAST(NULL AS BIGINT) AS cnt, CAST(NULL AS DOUBLE) AS sum_quality
    FROM (VALUES
     {values}) AS zexp(sftag, k, rawb, compb, ratio)
    WHERE sftag = (SELECT SUM(length(text)) FROM documents)
    """
    )


@query(
    "text_stats_lang_quality",
    oracle=_text_stats_oracle,
    tags=("llm", "text", "lang-id", "quality", "compression-ratio"),
)
def text_stats_lang_quality(spark, sf_dir):
    """Two text-function families in one tagged result (consolidated
    so the driver window covers every family).

    stats leg — per-document token statistics: whitespace tokens,
    BPE-ish pre-tokens, stopword counts, mean word length, all
    columnar.

    langq leg — heuristic language ID (ASCII ratio + stopword
    density) crossed against the labeled lang column, carrying the
    C4/Gopher-style quality score per confusion cell (exact-decimal
    sum so partial aggregation order can't move the double).

    zratio leg (r9) — functions/text.compression_stats: the zlib
    compression-ratio quality signal (Arrow-batched kernel; DEFLATE
    catches the long-range repetition fixed-n n-gram fractions miss)
    over a 1-in-20 doc slice, byte lengths exact and the ratio one
    int/int double division at 9 dp; the oracle is a literal-VALUES
    Python precompute over the same zlib build, sftag-gated."""
    d = _t(spark, sf_dir, "documents")
    t = F.col("text")
    nb = F.lit(None).cast("bigint")
    nd = F.lit(None).cast("double")
    stats = d.select(
        F.lit("stats").alias("leg"),
        F.col("doc_id").cast("string").alias("k"),
        F.length(t).alias("n_chars_measured"),
        X.token_count_ws(t).alias("n_tokens_ws"),
        X.token_count_bpe(t).alias("n_tokens_bpe"),
        X.stopword_count(t).alias("n_stopwords"),
        X.mean_word_len(t).alias("mean_word_len"),
        nb.alias("cnt"),
        nd.alias("sum_quality"),
    )
    langq = (
        d.select(
            X.lang_id(t).alias("lang_pred"),
            F.col("lang").alias("lang_actual"),
            X.quality_score(t).alias("__q"),
        )
        .groupBy(F.concat("lang_pred", F.lit("|"), "lang_actual").alias("k"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("__q").cast("decimal(18,6)")).cast("double").alias("sum_quality"),
        )
        .select(
            F.lit("langq").alias("leg"),
            "k",
            nb.alias("n_chars_measured"),
            nb.alias("n_tokens_ws"),
            nb.alias("n_tokens_bpe"),
            nb.alias("n_stopwords"),
            nd.alias("mean_word_len"),
            "cnt",
            "sum_quality",
        )
    )
    zratio = (
        d.filter(F.col("doc_id") % 20 == 0)
        .select(F.col("doc_id"), X.compression_stats(t).alias("__c"))
        .select(
            F.lit("zratio").alias("leg"),
            F.col("doc_id").cast("string").alias("k"),
            F.col("__c.raw_bytes").alias("n_chars_measured"),
            F.col("__c.comp_bytes").alias("n_tokens_ws"),
            nb.alias("n_tokens_bpe"),
            nb.alias("n_stopwords"),
            F.round("__c.ratio", 9).alias("mean_word_len"),
            nb.alias("cnt"),
            nd.alias("sum_quality"),
        )
    )
    return stats.unionByName(langq).unionByName(zratio)


def _py_md5h(g: str) -> int:
    import hashlib

    return int(hashlib.md5(g.encode("utf-8")).hexdigest()[:8], 16)


def _py_winnow(text: str, k: int, w: int) -> set[tuple[int, int]]:
    """Independent pure-Python winnowing (no code shared with
    operators/winnow.py): k-gram md5-prefix hashes, window of w, min
    with rightmost tie-break, distinct (pos, h) selections."""
    if text is None or len(text) < k:
        return set()
    grams = [(i, _py_md5h(text[i : i + k])) for i in range(len(text) - k + 1)]
    picked = set()
    for s in range(max(len(grams) - w + 1, 1)):
        win = grams[s : s + w]
        m = min(h for _, h in win)
        picked.add((max(p for p, h in win if h == m), m))
    return picked


_WINNOW_K, _WINNOW_W = 8, 4
_WINNOW_THR = 80  # pairs-leg jaccard threshold, percent
_WINNOW_MAXDF = 24  # stop-fingerprint cap: the fixture corpus is
# heavily templated; without it the pairs join (and the Python oracle
# twin) pays sum(df^2) over boilerplate fingerprints — ~25M pair
# increments at sf0.1 for zero near-dup signal


def _fingerprint_suite_oracle() -> str:
    """exact leg in plain SQL; winnow + pairs legs as literal VALUES
    computed at registration by _py_winnow over each fixture (keyed
    per SF by SUM(length(text)) — the pack_and_concat precedent; an
    unknown corpus selects zero literal rows and fails loudly)."""
    import hashlib
    from collections import Counter

    import pyarrow.parquet as pq

    k, w = _WINNOW_K, _WINNOW_W
    rows: list[tuple[int, str, str, int, int]] = []
    from d2d_spark.plans.registry import fixture_table_paths

    for _fixture_path in fixture_table_paths("documents"):
        try:
            t = pq.read_table(
                _fixture_path, columns=["doc_id", "text"]
            )
        except Exception:
            continue
        docs = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
        tag = sum(len(s) for s in docs.values())
        # winnow leg: canonical per-doc fingerprint digest, doc_id % 7
        for i in sorted(docs):
            if i % 7:
                continue
            fps = sorted(_py_winnow(docs[i], k, w))
            if not fps:
                continue
            canon = ",".join(f"{p}:{h}" for p, h in fps)
            rows.append(
                (tag, "winnow", hashlib.md5(canon.encode()).hexdigest(), i, len(fps))
            )
        # pairs leg: doc_id % 5 corpus + clones (id + 1,000,000) of
        # doc_id % 10, distinct-hash-set jaccard >= threshold
        corpus = {i: docs[i] for i in docs if i % 5 == 0}
        corpus.update({i + 1_000_000: docs[i] for i in docs if i % 10 == 0})
        hsets = {i: {h for _, h in _py_winnow(s, k, w)} for i, s in corpus.items()}
        dfc: Counter = Counter(h for hs in hsets.values() for h in hs)
        hsets = {
            i: {h for h in hs if dfc[h] <= _WINNOW_MAXDF} for i, hs in hsets.items()
        }
        hsets = {i: hs for i, hs in hsets.items() if hs}
        shared: Counter = Counter()
        inv: dict[int, list[int]] = {}
        for i, hs in hsets.items():
            for h in hs:
                inv.setdefault(h, []).append(i)
        for ids in inv.values():
            ids.sort()
            for x in range(len(ids)):
                for y in range(x + 1, len(ids)):
                    shared[(ids[x], ids[y])] += 1
        for (a, b), n in sorted(shared.items()):
            if 100 * n >= _WINNOW_THR * (len(hsets[a]) + len(hsets[b]) - n):
                rows.append((tag, "pairs", f"{a}|{b}", b, n))
    if not rows:
        rows = [(-1, "", "", 0, 0)]
    values = ",\n     ".join(
        f"({t}, '{leg}', '{fp}', {d}, {n})" for t, leg, fp, d, n in rows
    )
    return f"""
    SELECT 'exact' AS leg,
           md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp,
           MIN(doc_id) AS doc_id, COUNT(*) AS n
    FROM documents GROUP BY 2
    UNION ALL
    SELECT leg, fp, CAST(doc_id AS BIGINT) AS doc_id, CAST(n AS BIGINT) AS n
    FROM (VALUES
     {values}) AS expected(sftag, leg, fp, doc_id, n)
    WHERE sftag = (SELECT SUM(length(text)) FROM documents)
    """


@query(
    "fingerprint_dedup_documents",
    oracle=_fingerprint_suite_oracle,
    tags=("llm", "dedup", "exact", "winnow"),
)
def fingerprint_dedup_documents(spark, sf_dir):
    """Document fingerprinting suite, three legs on one shared schema
    (leg, fp, doc_id, n):

    exact — normalized-text md5 dedup, one representative (min
    doc_id) per hash: hash-groupBy, uniform shuffle keys.

    winnow — rolling-hash winnowing fingerprints (Schleimer et al.
    2003, operators/winnow.py) over the doc_id % 7 subset with the
    engine-portable md5-prefix hasher; each doc's DISTINCT (pos, h)
    selections are pinned exactly via an md5 over their canonical
    ','-joined 'pos:h' serialization, sorted by (pos, h) — one row
    per doc, fp = digest, n = fingerprint count.

    pairs — winnow_near_pairs on a planted-clone corpus (doc_id % 5
    subset plus byte-identical clones, id + 1,000,000, of the
    doc_id % 10 subset) at 80% fingerprint-set jaccard with integer
    cross-multiplication, under the max_df stop-fingerprint cap
    (the templated fixture makes boilerplate fingerprints hot; both
    engines measure sizes and overlap on the SAME capped sets) —
    fp = 'id_a|id_b', doc_id = id_b, n = shared-fingerprint count.

    The winnow/pairs oracle legs are literal VALUES computed at
    registration by an independent pure-Python winnowing
    implementation (_py_winnow) — a genuine differential test with
    no DuckDB list-function surface (see _pack_and_concat_oracle for
    why that surface is avoided)."""
    from d2d_spark.operators.dsir import md5_prefix_hasher
    from d2d_spark.operators.winnow import winnow_fingerprints, winnow_near_pairs

    d = _t(spark, sf_dir, "documents")
    exact = (
        d.groupBy(X.fingerprint(F.col("text")).alias("fp"))
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n"))
        .select(F.lit("exact").alias("leg"), "fp", "doc_id", "n")
    )
    sub = d.filter(F.col("doc_id") % 7 == 0)
    fps = winnow_fingerprints(
        sub, "text", "doc_id", k=_WINNOW_K, w=_WINNOW_W, hasher=md5_prefix_hasher
    )
    winnow = (
        fps.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "h"))),
                        lambda s: F.concat_ws(
                            ":", s["pos"].cast("string"), s["h"].cast("string")
                        ),
                    ),
                )
            ).alias("fp"),
        )
        .select(F.lit("winnow").alias("leg"), "fp", "doc_id", "n")
    )
    base = d.filter(F.col("doc_id") % 5 == 0).select("doc_id", "text")
    clones = (
        d.filter(F.col("doc_id") % 10 == 0)
        .select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    )
    pairs = winnow_near_pairs(
        base.unionByName(clones),
        "text",
        "doc_id",
        k=_WINNOW_K,
        w=_WINNOW_W,
        threshold_pct=_WINNOW_THR,
        max_df=_WINNOW_MAXDF,
        hasher=md5_prefix_hasher,
    ).select(
        F.lit("pairs").alias("leg"),
        F.concat_ws(
            "|", F.col("id_a").cast("string"), F.col("id_b").cast("string")
        ).alias("fp"),
        F.col("id_b").alias("doc_id"),
        F.col("n_shared").alias("n"),
    )
    return exact.unionByName(winnow).unionByName(pairs)




@query(
    "minhash_simhash_pairs",
    oracle=f"""
    WITH f AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0
               UNION ALL
               SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 2 = 0),
         sh_canon AS (SELECT doc_id,
                             array_to_string(list_sort({_SQL_SHINGLES}), chr(1)) AS fp
                      FROM f),
         tk_canon AS (SELECT doc_id,
                             array_to_string(list_sort(list_distinct(
                                 string_split_regex(trim(lower(text)), '\\s+'))), chr(1)) AS fp
                      FROM f)
    SELECT 'minhash' AS leg, a.doc_id AS id_a, b.doc_id AS id_b
    FROM sh_canon a JOIN sh_canon b ON a.fp = b.fp AND a.doc_id < b.doc_id
    WHERE a.fp <> ''
    UNION ALL
    SELECT 'simhash' AS leg, a.doc_id AS id_a, b.doc_id AS id_b
    FROM tk_canon a JOIN tk_canon b ON a.fp = b.fp AND a.doc_id < b.doc_id
    """,
    tags=("llm", "dedup", "minhash", "simhash"),
)
def minhash_simhash_pairs(spark, sf_dir):
    """Both banded near-dup pipelines on one planted-duplicate fixture
    (half the corpus unioned with an identical clone per document,
    id + 1,000,000), consolidated so the driver window covers every
    family.

    minhash leg: signature -> banded buckets -> candidate join ->
    exact-Jaccard verify at threshold 1.0. Exact-by-construction
    oracle: jaccard == 1 over distinct shingles is precisely
    shingle-SET equality, which SQL expresses as an equi-join on the
    sorted-shingle fingerprint — and identical shingle sets give
    identical signatures, so every band collides and LSH recall on
    these pairs is guaranteed, not probabilistic. Ids only — signature
    internals are engine-specific; sub-1.0-threshold recall vs the
    exact ngram_jaccard ground truth stays pytest-checked.

    simhash leg: pigeonhole-banded candidates at Hamming distance 0,
    then an exact token-set verify (the standard simhash dedup shape:
    cheap banded candidate generation, exact check on candidates).
    Equal token sets => equal simhash => every pigeonhole chunk
    collides, so all planted pairs become candidates; the verify
    keeps exactly the token-set-equal ones — the same set the SQL
    fingerprint join computes. Hamming<=12 behavior on organic
    near-dups stays pytest-checked."""
    from d2d_spark.functions.text import tokens_ws

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 2 == 0)
    base = d.select("doc_id", "text")
    clones = base.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    fixture = base.unionAll(clones)

    # r11 (guide §2.6 "overlap independent jobs"): both operators
    # eagerly fill their own persisted signature stage (one Arrow pass
    # each) before returning, so calling them serially pays two
    # full-latency jobs back to back. Overlapping the builds lets each
    # fill back-fill the cores the other leaves idle; results are
    # untouched (independent operators, composed lazily below).
    from d2d_spark.parallel import run_concurrent

    mh_raw, cand = run_concurrent([
        lambda: D.minhash_lsh_pairs(fixture, "text", "doc_id", jaccard_threshold=1.0),
        lambda: D.simhash_near_pairs(fixture, "text", "doc_id", max_hamming=0),
    ])
    mh = mh_raw.select(F.lit("minhash").alias("leg"), "id_a", "id_b")
    fp = fixture.select(
        F.col("doc_id"),
        F.md5(
            F.concat_ws(
                "\x01", F.array_sort(F.array_distinct(tokens_ws(F.lower(F.col("text")))))
            )
        ).alias("__fp"),
    )
    sh = (
        cand.join(fp.select(F.col("doc_id").alias("id_a"), F.col("__fp").alias("fp_a")), "id_a")
        .join(fp.select(F.col("doc_id").alias("id_b"), F.col("__fp").alias("fp_b")), "id_b")
        .filter(F.col("fp_a") == F.col("fp_b"))
        .select(F.lit("simhash").alias("leg"), "id_a", "id_b")
    )
    return mh.unionByName(sh)


@query(
    "embedding_near_pairs",
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim
    FROM embeddings a, embeddings b
    WHERE a.vec_id < b.vec_id
      AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                 CAST(b.embedding AS DOUBLE[])) >= 0.45
    """,
    tags=("llm", "dedup", "embedding"),
)
def embedding_near_pairs(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs above a threshold."""
    e = _t(spark, sf_dir, "embeddings")
    out = D.embedding_near_pairs(e, "vec_id", "embedding", threshold=0.45)
    return out.select("id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim"))


# Exact cosine top-5 per query vector — shared by ann_bruteforce_topk
# and ann_gemm_topk: both compute the identical exact result, so the
# same SQL oracles both (the GEMM path is a physical strategy, not a
# different query).
_SQL_EXACT_TOPK = """
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id % 100 = 0),
         scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             list_cosine_similarity(CAST(q.qv AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) AS c
      FROM q, embeddings e WHERE q.query_id <> e.vec_id),
         ranked AS (
      SELECT query_id, neighbor_id, c,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rank
      FROM scored)
    SELECT query_id, neighbor_id, round(c, 6) AS cos_sim, rank
    FROM ranked WHERE rank <= 5
    """


# int8-quantized cosine top-5: the same retrieval over vectors that
# round-tripped through functions/vectors.quantize_int8 — the SQL
# replays the quantization arithmetic exactly (scale = float32 of
# absmax/127; q = half-away-from-zero round in double, both engines'
# rule; dequantized element = float32 of q*scale, exact in double
# because the product has <= 31 significant bits).
_SQL_INT8_TOPK = """
    WITH dq AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST((CASE WHEN sc > 0
                 THEN CAST(round(CAST(x AS DOUBLE) / CAST(sc AS DOUBLE)) AS TINYINT)
                 ELSE CAST(0 AS TINYINT) END) * sc AS REAL)) AS dqv
      FROM (SELECT vec_id, embedding,
                   CAST(list_max(list_transform(embedding, x -> abs(x))) / 127.0
                        AS REAL) AS sc
            FROM embeddings)),
     q8 AS (SELECT vec_id AS query_id, dqv AS qv FROM dq WHERE vec_id % 100 = 0),
     scored8 AS (
      SELECT q8.query_id, d.vec_id AS neighbor_id,
             list_cosine_similarity(CAST(q8.qv AS DOUBLE[]), CAST(d.dqv AS DOUBLE[])) AS c
      FROM q8, dq d WHERE q8.query_id <> d.vec_id),
     ranked8 AS (
      SELECT query_id, neighbor_id, c,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rank
      FROM scored8)
    SELECT query_id, neighbor_id, round(c, 6) AS cos_sim, rank
    FROM ranked8 WHERE rank <= 5
    """


_MMR_K, _MMR_LAM = 3, 0.7


def _mmr_literal_rows() -> list[tuple]:
    """(sftag, query_id, doc_id, score6, rank) rows per fixture: a
    numpy twin of the mmr leg — exact cosine top-5 per query (self
    excluded, ties by ascending id), then the greedy MMR loop
    MIRRORING operators/retrieval.mmr_rerank's kernel op-for-op
    (ascending-doc candidate order, matrix-vector max-sim updates,
    argmax first-occurrence = smallest-id tie-break). Zero operator
    imports. Relevance here is numpy cosine while the leg feeds the
    engine's fold cos_sim — the ~1e-16 cross-implementation drift the
    fold leg's own round-6 oracle already tolerates."""
    import numpy as np
    import pyarrow.parquet as pq

    from d2d_spark.plans.registry import fixture_table_paths

    out: list[tuple] = []
    for _fixture_path in fixture_table_paths("embeddings"):
        try:
            t = pq.read_table(
                _fixture_path, columns=["vec_id", "embedding", "label"]
            )
        except Exception:
            continue
        ids = t["vec_id"].to_pylist()
        labs = t["label"].to_pylist()
        X = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        tag = len(ids) * 1_000_000 + sum(
            lb * (i % 97) for i, lb in zip(ids, labs)
        )
        n = np.linalg.norm(X, axis=1)
        idx_of = {v: i for i, v in enumerate(ids)}
        for qid in sorted(v for v in ids if v % 100 == 0):
            qi = idx_of[qid]
            qn = n[qi]
            sims = []
            for j, vid in enumerate(ids):
                if vid == qid:
                    continue
                den = qn * n[j]
                c = float(X[qi] @ X[j] / den) if den > 0 else None
                if c is not None:
                    sims.append((-c, vid))
            sims.sort()
            top = sims[: 5]
            cand_ids = sorted(vid for _, vid in top)
            rel_of = {vid: -negc for negc, vid in top}
            rows = [idx_of[v] for v in cand_ids]
            Xc = X[rows]
            cn = np.linalg.norm(Xc, axis=1)
            Xn = np.divide(Xc, np.maximum(cn, 1e-300)[:, None])
            Xn[cn == 0] = 0.0
            rel = np.array([rel_of[v] for v in cand_ids], dtype=np.float64)
            m = len(cand_ids)
            max_sim = np.zeros(m, dtype=np.float64)
            active = np.ones(m, dtype=bool)
            for r in range(1, min(_MMR_K, m) + 1):
                mmr = _MMR_LAM * rel - (1.0 - _MMR_LAM) * max_sim
                mmr[~active] = -np.inf
                i = int(np.argmax(mmr))
                out.append((tag, qid, cand_ids[i], round(float(mmr[i]), 6), r))
                active[i] = False
                max_sim = np.maximum(max_sim, Xn @ Xn[i])
    return out


def _ndcg_literal_rows() -> list[tuple]:
    """(sftag, query_id, ndcg9) rows per fixture: a pure-Python twin
    of the ndcg leg — exact cosine top-5 per query (the same self
    exclusion and ascending-id tie rules as _mmr_literal_rows), graded
    relevance from the label column (same label -> rel 3, adjacent
    label -> rel 1, else 0, no wraparound), then the operator's own
    fixed-order folds mirrored exactly: DCG adds (2^rel - 1)/log2(r+1)
    in rank order, IDCG adds the truth's top-k gains in descending
    order — math.log2 is bit-equal to Spark's F.log2 on these values
    (pinned by tests/test_retrieval.py). Zero operator imports."""
    import math

    import numpy as np
    import pyarrow.parquet as pq

    from d2d_spark.plans.registry import fixture_table_paths

    out: list[tuple] = []
    for _fixture_path in fixture_table_paths("embeddings"):
        try:
            t = pq.read_table(
                _fixture_path, columns=["vec_id", "embedding", "label"]
            )
        except Exception:
            continue
        ids = t["vec_id"].to_pylist()
        labs = t["label"].to_pylist()
        X = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        tag = len(ids) * 1_000_000 + sum(
            lb * (i % 97) for i, lb in zip(ids, labs)
        )
        n = np.linalg.norm(X, axis=1)
        idx_of = {v: i for i, v in enumerate(ids)}
        lab_of = dict(zip(ids, labs))

        def rel_of(ql: int, dl: int) -> int:
            return 3 if dl == ql else (1 if abs(dl - ql) == 1 else 0)

        for qid in sorted(v for v in ids if v % 100 == 0):
            qi = idx_of[qid]
            ql = lab_of[qid]
            qn = n[qi]
            sims = []
            for j, vid in enumerate(ids):
                if vid == qid:
                    continue
                den = qn * n[j]
                c = float(X[qi] @ X[j] / den) if den > 0 else None
                if c is not None:
                    sims.append((-c, vid))
            sims.sort()
            dcg = 0.0
            for r, (_, vid) in enumerate(sims[:5], 1):
                g = 2.0 ** rel_of(ql, lab_of[vid]) - 1.0
                dcg += g / math.log2(r + 1.0)
            gains = sorted(
                (
                    2.0 ** rel_of(ql, lab_of[vid]) - 1.0
                    for vid in ids
                    if vid != qid and rel_of(ql, lab_of[vid]) > 0
                ),
                reverse=True,
            )[:5]
            if not gains:
                continue  # no positive labels: the operator drops it
            idcg = 0.0
            for r, g in enumerate(gains, 1):
                idcg += g / math.log2(r + 1.0)
            out.append((tag, qid, round(dcg / idcg, 9)))
    return out


def _ann_exact_oracle() -> str:
    mmr_rows = _mmr_literal_rows()
    if not mmr_rows:
        mmr_rows = [(-1, 0, 0, 0.0, 0)]
    mmr_values = ",\n     ".join(
        f"({t}, {q}, {d}, CAST({s!r} AS DOUBLE), {r})" for t, q, d, s, r in mmr_rows
    )
    ndcg_rows = _ndcg_literal_rows()
    if not ndcg_rows:
        ndcg_rows = [(-1, 0, 0.0)]
    ndcg_values = ",\n     ".join(
        f"({t}, {q}, CAST({v!r} AS DOUBLE))" for t, q, v in ndcg_rows
    )
    return f"""
    SELECT 'fold' AS leg, * FROM ({_SQL_EXACT_TOPK})
    UNION ALL
    SELECT 'gemm' AS leg, * FROM ({_SQL_EXACT_TOPK})
    UNION ALL
    SELECT 'int8' AS leg, * FROM ({_SQL_INT8_TOPK})
    UNION ALL
    SELECT 'rrf' AS leg, query_id, neighbor_id, s AS cos_sim, rank FROM (
      SELECT query_id, neighbor_id, s,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY s DESC, neighbor_id) AS rank
      FROM (
        SELECT COALESCE(a.query_id, b.query_id) AS query_id,
               COALESCE(a.neighbor_id, b.neighbor_id) AS neighbor_id,
               COALESCE(1.0 / (60 + a.rank), 0) + COALESCE(1.0 / (60 + b.rank), 0) AS s
        FROM ({_SQL_EXACT_TOPK}) a FULL JOIN ({_SQL_INT8_TOPK}) b
          ON a.query_id = b.query_id AND a.neighbor_id = b.neighbor_id))
    WHERE rank <= 5
    UNION ALL
    SELECT 'mmr' AS leg, query_id, doc_id AS neighbor_id, score AS cos_sim, rank
    FROM (VALUES
     {mmr_values}) AS mmr_exp(sftag, query_id, doc_id, score, rank)
    WHERE sftag = (SELECT COUNT(*) * 1000000 + SUM(label * (vec_id % 97))
                   FROM embeddings)
    UNION ALL
    SELECT 'ndcg' AS leg, query_id, CAST(NULL AS BIGINT) AS neighbor_id,
           v AS cos_sim, CAST(NULL AS INT) AS rank
    FROM (VALUES
     {ndcg_values}) AS ndcg_exp(sftag, query_id, v)
    WHERE sftag = (SELECT COUNT(*) * 1000000 + SUM(label * (vec_id % 97))
                   FROM embeddings)
    """


@query(
    "ann_exact_topk",
    oracle=_ann_exact_oracle,
    tags=("llm", "similarity", "ann", "gemm", "int8", "rrf", "mmr"),
)
def ann_exact_topk(spark, sf_dir):
    """Exact and quantized cosine retrieval plus rank fusion in one
    tagged result (consolidated so the driver window covers every
    family): the fold leg is the Column-fold brute-force baseline
    (the ANN ground truth), the gemm leg the blocked-GEMM BLAS
    throughput path — identical exact results, so one SQL oracles
    both (the GEMM path is a physical strategy, not a different
    query). The int8 leg retrieves over vectors round-tripped through
    functions/vectors.quantize_int8 — the 4x storage/shuffle cut —
    with the quantization arithmetic replayed digit-exact in SQL. The
    rrf leg fuses the exact and quantized rankings with
    operators/retrieval.rrf_fuse (Cormack 2009, c=60): fused scores
    are a fixed-order fold of 1/(60+rank) terms over rankings already
    hash-pinned above, so the whole hybrid list is engine-exact with
    no rounding at all. The mmr leg diversity-reranks the exact top-5
    with operators/retrieval.mmr_rerank (Carbonell 1998, lam=0.7,
    k=3) against a numpy twin mirroring the greedy kernel op-for-op.
    The ndcg leg (r10 rotation) closes the loop with the evaluation
    layer: retrieval.ndcg_at_k of the exact top-5 against graded
    same/adjacent-label relevance, vs a literal-VALUES Python twin of
    both fixed-order folds."""
    from pyspark import StorageLevel

    from d2d_spark import cache as opcache

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0)
    cols = ["query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"), "rank"]
    # fold feeds THREE consumers (its leg select, the rrf fusion and
    # the mmr rerank) and int8 two (leg select + fusion): persist the
    # O(|Q|*k) outputs once, or every consumer recomputes a whole
    # brute-force pass (the minhash shared-stage discipline; release
    # via cache.release("ann_suite"))
    fold = opcache.register(
        "ann_suite",
        S.brute_force_topk(
            e, q, "vec_id", "embedding", "vec_id", "embedding", k=5
        ).persist(StorageLevel.MEMORY_AND_DISK),
    )
    gemm = S.gemm_topk(e, q, "vec_id", "embedding", "vec_id", "embedding", k=5)
    from d2d_spark.functions.vectors import dequantize_int8, quantize_int8
    from d2d_spark.operators.retrieval import rrf_fuse

    deq = e.select(
        "vec_id", dequantize_int8(quantize_int8(F.col("embedding"))).alias("embedding")
    )
    q8 = deq.filter(F.col("vec_id") % 100 == 0)
    int8 = opcache.register(
        "ann_suite",
        S.brute_force_topk(
            deq, q8, "vec_id", "embedding", "vec_id", "embedding", k=5
        ).persist(StorageLevel.MEMORY_AND_DISK),
    )
    # r12 (guide §2.6): the two brute-force passes are independent —
    # fill both caches CONCURRENTLY (each is a ~half-second pass whose
    # tail leaves the cores idle), then overlap the three eager
    # consumer constructions (rrf probe, the mmr greedy kernel, the
    # ndcg chain) over the warm caches.
    from d2d_spark.operators.retrieval import mmr_rerank

    from d2d_spark.parallel import run_concurrent

    run_concurrent([fold.count, int8.count])

    def _rrf_chain():
        return rrf_fuse(
            [fold, int8], query_col="query_id", doc_col="neighbor_id", k=5
        ).select(
            F.lit("rrf").alias("leg"),
            "query_id",
            "neighbor_id",
            F.col("rrf_score").alias("cos_sim"),
            "rank",
        )

    def _mmr_chain():
        # mmr leg: diversity-rerank the exact top-5 (third consumer of
        # the persisted fold) — relevance is the fold's cos_sim,
        # doc-doc similarity recomputed from the corpus vectors
        return mmr_rerank(
            fold, e, k=_MMR_K, lam=_MMR_LAM,
            query_col="query_id", doc_col="neighbor_id", score_col="cos_sim",
            id_col="vec_id", vec_col="embedding",
        ).select(
            F.lit("mmr").alias("leg"),
            "query_id",
            "neighbor_id",
            F.round("mmr_score", 6).alias("cos_sim"),
            "rank",
        )
    # ndcg leg (r10 rotation): operators/retrieval.ndcg_at_k scores the
    # exact top-5 against graded labels derived from the embeddings'
    # label column (same label -> rel 3, adjacent -> rel 1) — the
    # evaluation layer for the retrieval stack, driver-checked against
    # a pure-Python literal twin mirroring both fixed-order folds.
    # The truth frame is three broadcast equi-joins on label keys (no
    # theta join), self pairs excluded like the retrieval itself.
    from d2d_spark.operators.retrieval import ndcg_at_k

    def _ndcg_chain():
        ql_f = q.select(F.col("vec_id").alias("query_id"), F.col("label").alias("__ql"))
        dl_f = e.select(F.col("vec_id").alias("neighbor_id"), F.col("label").alias("__dl"))
        truth = None
        for off, rel in ((0, 3), (-1, 1), (1, 1)):
            part = (
                F.broadcast(ql_f)
                .join(dl_f, ql_f["__ql"] == dl_f["__dl"] + F.lit(off))
                .filter(F.col("query_id") != F.col("neighbor_id"))
                .select("query_id", "neighbor_id", F.lit(rel).alias("rel"))
            )
            truth = part if truth is None else truth.unionByName(part)
        nd = ndcg_at_k(
            fold, truth, "query_id", "neighbor_id", k=5, rel_col="rel"
        )
        return nd.select(
            F.lit("ndcg").alias("leg"),
            "query_id",
            F.lit(None).cast("long").alias("neighbor_id"),
            F.round("ndcg", 9).alias("cos_sim"),
            F.lit(None).cast("int").alias("rank"),
        )

    fused, mmr, ndcg_leg = run_concurrent([_rrf_chain, _mmr_chain, _ndcg_chain])
    return (
        fold.select(F.lit("fold").alias("leg"), *cols)
        .unionByName(gemm.select(F.lit("gemm").alias("leg"), *cols))
        .unionByName(int8.select(F.lit("int8").alias("leg"), *cols))
        .unionByName(fused)
        .unionByName(mmr)
        .unionByName(ndcg_leg)
    )


def _bucket_sql(vec: str, n_bits: int = 8) -> str:
    """DuckDB rendering of functions.vectors.sign_projection_bucket —
    identical integer weights, (i-1) because DuckDB lambdas index
    1-based."""
    bits = []
    for j in range(n_bits):
        proj = (
            f"list_sum(list_transform({vec}, (x, i) -> CAST(x AS DOUBLE) * "
            f"((((i - 1) * CAST(1103515245 AS BIGINT) + {j} * 12345 + 7) % 97) - 48)))"
        )
        bits.append(f"(CASE WHEN {proj} >= 0 THEN 1 ELSE 0 END) * {1 << (n_bits - 1 - j)}")
    return "(" + " + ".join(bits) + ")"


_SQL_LSH_TOPK = f"""
    WITH c AS (SELECT vec_id AS neighbor_id, embedding, {_bucket_sql('embedding', 4)} AS bucket
               FROM embeddings),
         q0 AS (SELECT vec_id AS query_id, embedding AS qv, {_bucket_sql('embedding', 4)} AS bucket
                FROM embeddings WHERE vec_id % 100 = 0),
         probes AS (SELECT query_id, qv,
                           unnest([bucket, xor(bucket, 1), xor(bucket, 2),
                                   xor(bucket, 4), xor(bucket, 8)]) AS bucket
                    FROM q0),
         cand AS (SELECT DISTINCT p.query_id, p.qv, c.neighbor_id, c.embedding
                  FROM probes p JOIN c USING (bucket) WHERE p.query_id <> c.neighbor_id),
         scored AS (SELECT query_id, neighbor_id,
                           list_cosine_similarity(CAST(qv AS DOUBLE[]),
                                                  CAST(embedding AS DOUBLE[])) AS cs
                    FROM cand),
         ranked AS (SELECT query_id, neighbor_id, cs,
                           ROW_NUMBER() OVER (PARTITION BY query_id
                                              ORDER BY cs DESC, neighbor_id) AS rank
                    FROM scored)
    SELECT query_id, neighbor_id, round(cs, 6) AS cos_sim, rank
    FROM ranked WHERE rank <= 5
    """


# --- IVFADC literal oracle: a numpy twin of the WHOLE index pipeline
# (coarse spherical k-means -> residuals -> per-subspace PQ -> ADC
# probe-all scoring), no imports from operators/pq.py or
# operators/similarity.py. The only Spark-specific ingredient is the
# deterministic sample ORDER (orderBy(xxhash64(id))), replayed by a
# pure-Python XXH64-for-one-long twin (verified == F.xxhash64 in
# tests). Distributed pieces the twin does NOT share — Arrow
# batching, the broadcast probe join, per-batch top-k egress, the
# window rank — are exactly what the leg differentially tests. ---

_XXP1 = 0x9E3779B185EBCA87
_XXP2 = 0xC2B2AE3D27D4EB4F
_XXP3 = 0x165667B19E3779F9
_XXP4 = 0x85EBCA77C2B2AE63
_XXP5 = 0x27D4EB2F165667C5
_U64 = (1 << 64) - 1


def _xxh64_long(v: int, seed: int = 42) -> int:
    """Spark F.xxhash64 of ONE bigint column value (XXH64 of the
    8-byte block, Spark's default seed 42), signed-int64 result."""

    def rotl(x: int, r: int) -> int:
        return ((x << r) | (x >> (64 - r))) & _U64

    h = (seed + _XXP5 + 8) & _U64
    h ^= (rotl((v & _U64) * _XXP2 & _U64, 31) * _XXP1) & _U64
    h = (rotl(h, 27) * _XXP1 + _XXP4) & _U64
    h ^= h >> 33
    h = (h * _XXP2) & _U64
    h ^= h >> 29
    h = (h * _XXP3) & _U64
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def _xxh64_bytes(data: bytes, seed: int) -> int:
    """Full XXH64 of a byte string (stripes + tail, XXH spec) —
    unsigned result; what Spark's XxHash64 computes for a STRING
    column's UTF-8 bytes. Parity with F.xxhash64 is test-pinned
    (short, >32-byte, and non-ASCII inputs)."""

    def rotl(x: int, r: int) -> int:
        return ((x << r) | (x >> (64 - r))) & _U64

    def rnd(acc: int, inp: int) -> int:
        acc = (acc + inp * _XXP2) & _U64
        return (rotl(acc, 31) * _XXP1) & _U64

    seed &= _U64
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _XXP1 + _XXP2) & _U64
        v2 = (seed + _XXP2) & _U64
        v3 = seed
        v4 = (seed - _XXP1) & _U64
        while i <= n - 32:
            v1 = rnd(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = rnd(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = rnd(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = rnd(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)) & _U64
        for v in (v1, v2, v3, v4):
            h ^= rnd(0, v)
            h = (h * _XXP1 + _XXP4) & _U64
    else:
        h = (seed + _XXP5) & _U64
    h = (h + n) & _U64
    while i + 8 <= n:
        h ^= rnd(0, int.from_bytes(data[i : i + 8], "little"))
        h = (rotl(h, 27) * _XXP1 + _XXP4) & _U64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _XXP1) & _U64
        h = (rotl(h, 23) * _XXP2 + _XXP3) & _U64
        i += 4
    while i < n:
        h ^= (data[i] * _XXP5) & _U64
        h = (rotl(h, 11) * _XXP1) & _U64
        i += 1
    h ^= h >> 33
    h = (h * _XXP2) & _U64
    h ^= h >> 29
    h = (h * _XXP3) & _U64
    h ^= h >> 32
    return h


def _spark_xxh64_str_long(s: str, v: int) -> int:
    """Spark F.xxhash64(string_col, long_col): seed 42, each column
    folds the running hash in as the next column's seed; signed."""
    h = _xxh64_bytes(s.encode("utf-8"), 42)
    return _xxh64_long(v, h)


_IVFADC_M, _IVFADC_KSUB, _IVFADC_NC = 8, 16, 16


def _ivfadc_literal_rows() -> list[tuple]:
    """(sftag, query_id, neighbor_id, score6, rank) rows per fixture."""
    import numpy as np
    import pyarrow.parquet as pq

    out: list[tuple] = []
    from d2d_spark.plans.registry import fixture_table_paths

    for _fixture_path in fixture_table_paths("embeddings"):
        try:
            t = pq.read_table(
                _fixture_path,
                columns=["vec_id", "embedding", "label"],
            )
        except Exception:
            continue
        ids = t["vec_id"].to_pylist()
        labs = t["label"].to_pylist()
        X = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        tag = len(ids) * 1_000_000 + sum(
            lb * (i % 97) for i, lb in zip(ids, labs)
        )
        # hash-ordered TRAINING SAMPLE — both trainers take
        # orderBy(xxhash64(id)).limit(10_000); the slice keeps the twin
        # faithful the day a fixture exceeds the cap
        order = sorted(range(len(ids)), key=lambda i: _xxh64_long(ids[i]))[:10_000]

        # coarse centroids: spherical k-means, hash-ordered sample,
        # init = first nc rows, 5 Lloyd rounds
        Xs = X[order]
        Xs = Xs / np.maximum(np.linalg.norm(Xs, axis=1, keepdims=True), 1e-12)
        nc = min(_IVFADC_NC, len(Xs))
        C = Xs[:nc].copy()
        for _ in range(5):
            assign = np.argmax(Xs @ C.T, axis=1)
            for j in range(nc):
                members = Xs[assign == j]
                if len(members):
                    c = members.sum(axis=0)
                    C[j] = c / max(np.linalg.norm(c), 1e-12)

        # residuals over the FULL corpus (row-wise, order-free)
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        cells = np.argmax(Xn @ C.T, axis=1)
        R = Xn - C[cells]

        # per-subspace PQ on the residuals: hash-ordered sample, init
        # = first ksub rows, 10 Lloyd rounds, then full-corpus encode
        m = _IVFADC_M
        dsub = X.shape[1] // m
        Rs = R[order]
        k = min(_IVFADC_KSUB, len(Rs))
        books = np.empty((m, k, dsub))
        for j in range(m):
            S = Rs[:, j * dsub : (j + 1) * dsub]
            B = S[:k].copy()
            for _ in range(10):
                d2 = (S * S).sum(axis=1, keepdims=True) - 2.0 * (S @ B.T) + (
                    B * B
                ).sum(axis=1)
                a = np.argmin(d2, axis=1)
                for c in range(k):
                    members = S[a == c]
                    if len(members):
                        B[c] = members.mean(axis=0)
            books[j] = B
        codes = np.empty((len(X), m), dtype=np.int64)
        for j in range(m):
            S = R[:, j * dsub : (j + 1) * dsub]
            codes[:, j] = np.argmin(
                -2.0 * (S @ books[j].T) + (books[j] * books[j]).sum(axis=1), axis=1
            )

        # ADC probe-all scoring: score = q.centroid(cell) + m gathers
        qsel = [i for i in range(len(ids)) if ids[i] % 100 == 0]
        Q = X[qsel]
        Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
        qc = Qn @ C.T
        lut = np.stack(
            [Qn[:, j * dsub : (j + 1) * dsub] @ books[j].T for j in range(m)],
            axis=1,
        )
        nids = np.array(ids, dtype=np.int64)
        for qi, qrow in enumerate(qsel):
            s = qc[qi, cells].copy()
            for j in range(m):
                s += lut[qi, j, codes[:, j]]
            cand = [
                (-s[n], int(nids[n])) for n in range(len(nids))
                if nids[n] != ids[qrow]
            ]
            cand.sort()
            for rank, (neg, nid) in enumerate(cand[:5], start=1):
                out.append((tag, ids[qrow], nid, round(-neg, 6), rank))
    return out


_KMR_NC, _KMR_TRAIN_ITERS, _KMR_REFINE_ITERS = 16, 5, 3


def _kmr_literal_rows() -> list[tuple]:
    """(sftag, cell, pos, val6, rank) rows per fixture: numpy twin of
    train_ivf_centroids (hash-ordered 10k sample, init = first nc
    rows, spherical Lloyd) followed by kmeans_refine's FULL-corpus
    spherical refinement (zero-norm rows excluded, empty cells keep
    their centroid) — the distributed sufficient-statistics shuffle
    may not change the math, so the refined matrix must equal the
    twin's to 6 decimals (exact-equality pinned at 1e-9 in
    test_kmeans_refine_matches_numpy_full_lloyd; the driver leg adds
    the cross-engine hash check). Zero operator imports."""
    import numpy as np
    import pyarrow.parquet as pq

    from d2d_spark.plans.registry import fixture_table_paths

    out: list[tuple] = []
    for _fixture_path in fixture_table_paths("embeddings"):
        try:
            t = pq.read_table(
                _fixture_path, columns=["vec_id", "embedding", "label"]
            )
        except Exception:
            continue
        ids = t["vec_id"].to_pylist()
        labs = t["label"].to_pylist()
        X = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        tag = len(ids) * 1_000_000 + sum(
            lb * (i % 97) for i, lb in zip(ids, labs)
        )
        order = sorted(range(len(ids)), key=lambda i: _xxh64_long(ids[i]))[:10_000]
        Xs = X[order]
        Xs = Xs / np.maximum(np.linalg.norm(Xs, axis=1, keepdims=True), 1e-12)
        nc = min(_KMR_NC, len(Xs))
        C = Xs[:nc].copy()
        for _ in range(_KMR_TRAIN_ITERS):
            assign = np.argmax(Xs @ C.T, axis=1)
            for j in range(nc):
                members = Xs[assign == j]
                if len(members):
                    c = members.sum(axis=0)
                    C[j] = c / max(np.linalg.norm(c), 1e-12)
        # full-corpus refine: unit-normalize, drop zero-norm rows
        n = np.linalg.norm(X, axis=1)
        Xf = X[n > 0] / n[n > 0, None]
        for _ in range(_KMR_REFINE_ITERS):
            assign = np.argmax(Xf @ C.T, axis=1)
            for j in range(nc):
                members = Xf[assign == j]
                if len(members):
                    s = members.sum(axis=0)
                    C[j] = s / max(np.linalg.norm(s), 1e-12)
        for j in range(nc):
            for pos in range(C.shape[1]):
                out.append((tag, j, pos, round(float(C[j, pos]), 6), j + 1))
    return out


_PQRR_M, _PQRR_KSUB, _PQRR_K, _PQRR_OS = 8, 16, 5, 4


def _pqrr_literal_rows() -> list[tuple]:
    """(sftag, query_id, neighbor_id, cos6, rank) per fixture: numpy
    twin of the STANDARD two-stage PQ search (train_pq on the raw
    hash-ordered sample -> full-corpus encode via the -2x·c+|c|²
    argmin -> ADC top k*oversample candidates with (score desc, id)
    ties -> exact-cosine rerank of the candidates ONLY). oversample=4
    keeps the ADC stage genuinely selective (20 of 500..2000
    candidates), so the leg differentially tests candidate generation
    AND the semi-join-sized rerank, not a degenerate exact scan. Zero
    operator imports (the _ivfadc_literal_rows standard)."""
    import numpy as np
    import pyarrow.parquet as pq

    from d2d_spark.plans.registry import fixture_table_paths

    out: list[tuple] = []
    m, ksub, k, oversample = _PQRR_M, _PQRR_KSUB, _PQRR_K, _PQRR_OS
    for _fixture_path in fixture_table_paths("embeddings"):
        try:
            t = pq.read_table(
                _fixture_path, columns=["vec_id", "embedding", "label"]
            )
        except Exception:
            continue
        ids = t["vec_id"].to_pylist()
        labs = t["label"].to_pylist()
        X = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        tag = len(ids) * 1_000_000 + sum(
            lb * (i % 97) for i, lb in zip(ids, labs)
        )
        order = sorted(range(len(ids)), key=lambda i: _xxh64_long(ids[i]))[:10_000]
        Xs = X[order]  # RAW vectors — train_pq does not normalize
        dsub = X.shape[1] // m
        kk = min(ksub, len(Xs))
        books = np.empty((m, kk, dsub))
        for j in range(m):
            S = Xs[:, j * dsub : (j + 1) * dsub]
            C = S[:kk].copy()
            for _ in range(10):
                d2 = (S * S).sum(axis=1, keepdims=True) - 2.0 * (S @ C.T) + (
                    C * C
                ).sum(axis=1)
                a = np.argmin(d2, axis=1)
                for c in range(kk):
                    members = S[a == c]
                    if len(members):
                        C[c] = members.mean(axis=0)
            books[j] = C
        codes = np.empty((len(X), m), dtype=np.int64)
        for j in range(m):
            S = X[:, j * dsub : (j + 1) * dsub]
            # the encoder's exact argmin expression (-2x·c + |c|²)
            codes[:, j] = np.argmin(
                -2.0 * (S @ books[j].T) + (books[j] * books[j]).sum(axis=1), axis=1
            )
        qsel = [i for i in range(len(ids)) if ids[i] % 100 == 0]
        Q = X[qsel]
        lut = np.stack(
            [Q[:, j * dsub : (j + 1) * dsub] @ books[j].T for j in range(m)], axis=1
        )
        nids = np.array(ids, dtype=np.int64)
        for qi, qrow in enumerate(qsel):
            s = np.zeros(len(nids))
            for j in range(m):
                s += lut[qi, j, codes[:, j]]
            cand = sorted(
                (( -s[n], int(nids[n])) for n in range(len(nids)) if nids[n] != ids[qrow])
            )[: k * oversample]
            qv = X[qrow]
            qn = np.linalg.norm(qv)
            rer = []
            for _, nid in cand:
                cv = X[ids.index(nid)]
                denom = qn * np.linalg.norm(cv)
                rer.append((-(float(qv @ cv) / denom), nid))
            rer.sort()
            for rank, (neg, nid) in enumerate(rer[:k], start=1):
                out.append((tag, ids[qrow], nid, round(-neg, 6), rank))
    return out


def _ann_lsh_ivf_oracle() -> str:
    rows = _ivfadc_literal_rows()
    if not rows:
        rows = [(-1, 0, 0, 0.0, 0)]
    values = ",\n     ".join(
        f"({t}, {q}, {n}, CAST({s!r} AS DOUBLE), {r})" for t, q, n, s, r in rows
    )
    kmr_rows = _kmr_literal_rows()
    if not kmr_rows:
        kmr_rows = [(-1, 0, 0, 0.0, 0)]
    kmr_values = ",\n     ".join(
        f"({t}, {c}, {p}, CAST({v!r} AS DOUBLE), {r})" for t, c, p, v, r in kmr_rows
    )
    pqrr_rows = _pqrr_literal_rows()
    if not pqrr_rows:
        pqrr_rows = [(-1, 0, 0, 0.0, 0)]
    pqrr_values = ",\n     ".join(
        f"({t}, {q}, {n}, CAST({s!r} AS DOUBLE), {r})" for t, q, n, s, r in pqrr_rows
    )
    return f"""
    SELECT 'lsh' AS leg, * FROM ({_SQL_LSH_TOPK})
    UNION ALL
    SELECT 'ivf' AS leg, * FROM ({_SQL_EXACT_TOPK})
    UNION ALL
    SELECT 'ivfadc' AS leg, query_id, neighbor_id, score AS cos_sim, rank
    FROM (VALUES
     {values}) AS ivfadc_exp(sftag, query_id, neighbor_id, score, rank)
    WHERE sftag = (SELECT COUNT(*) * 1000000 + SUM(label * (vec_id % 97))
                   FROM embeddings)
    UNION ALL
    SELECT 'kmr' AS leg, cell AS query_id, pos AS neighbor_id,
           val AS cos_sim, rank
    FROM (VALUES
     {kmr_values}) AS kmr_exp(sftag, cell, pos, val, rank)
    WHERE sftag = (SELECT COUNT(*) * 1000000 + SUM(label * (vec_id % 97))
                   FROM embeddings)
    UNION ALL
    SELECT 'pqrr' AS leg, query_id, neighbor_id, score AS cos_sim, rank
    FROM (VALUES
     {pqrr_values}) AS pqrr_exp(sftag, query_id, neighbor_id, score, rank)
    WHERE sftag = (SELECT COUNT(*) * 1000000 + SUM(label * (vec_id % 97))
                   FROM embeddings)
    """


@query(
    "ann_lsh_ivf_topk",
    oracle=_ann_lsh_ivf_oracle,
    tags=("llm", "similarity", "ann", "lsh", "ivf", "ivfadc", "pq"),
)
def ann_lsh_ivf_topk(spark, sf_dir):
    """Both approximate-ANN scale paths in one tagged result
    (consolidated so the driver window covers every family).

    lsh leg: top-k restricted to the query's LSH bucket — bucket
    equi-join instead of full cross join. The bucket function uses
    exact integer weights, so the WHOLE approximate pipeline
    (bucketing, multi-probe, candidate join, rank) is reproduced in
    SQL and hash-checked, not just sampled.

    ivf leg: IVF top-k at probe-all (n_probe = n_centroids) —
    candidates cover every cell, so the result is EXACTLY the
    ground-truth top-k and the exact-top-k SQL oracles the whole IVF
    machinery: driver-side spherical-k-means training, per-batch GEMM
    cell assignment, multi-probe cell equi-join, within-candidate
    rank. Recall at n_probe < n_centroids and LSH recall vs brute
    force are additionally pytest-checked.

    ivfadc leg: the full IVFADC index (operators/pq.py —
    build_ivf_pq_index + ivf_pq_topk at probe-all: residual product
    quantization over coarse cells, ADC lookup-table scoring) against
    a literal-VALUES numpy twin of the whole pipeline built at
    registration — every quantized score of every top-5 row
    hash-checked to 6 decimals, including the xxhash64 sample order
    (replayed by a pure-Python XXH64 twin). Recall vs exact and
    probe-all ≡ exact-candidate coverage stay pytest-pinned.

    kmr leg: `kmeans_refine` — distributed full-corpus spherical
    Lloyd on top of the sample-trained coarse quantizer, every
    refined centroid component hash-checked to 6 decimals against a
    numpy twin of train+refine (the sufficient-statistics shuffle may
    not change the math).

    pqrr leg: the standalone two-stage PQ search (`pq_topk_rerank` —
    ADC generates 20 candidates per query from the 8-byte codes, the
    exact-cosine rerank reads only those 20 vectors) at a genuinely
    SELECTIVE oversample=4, vs a numpy twin of the whole train ->
    encode -> ADC-candidate -> rerank pipeline — scores to 6 decimals,
    candidate and rerank tie orders replayed exactly."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0)
    # 4 bits = 16 buckets: coarse enough for decent recall on the
    # fixture corpus; bits scale with corpus size in production
    lsh = S.lsh_topk(e, q, "vec_id", "embedding", "vec_id", "embedding", k=5, n_bits=4)
    ivf = S.ivf_topk(
        e, q, "vec_id", "embedding", "vec_id", "embedding",
        k=5, n_centroids=16, n_probe=16,
    )
    from d2d_spark.operators.pq import build_ivf_pq_index, ivf_pq_topk

    codes, model = build_ivf_pq_index(
        e, "vec_id", "embedding",
        m=8, ksub=16, n_centroids=16, iters=5, pq_iters=10,
    )
    ivfadc = ivf_pq_topk(
        codes, q, "vec_id", "vec_id", "embedding", model, k=5, n_probe=16
    )
    # kmr leg: distributed full-corpus spherical-Lloyd refinement of
    # the sample-trained coarse centroids — the refined matrix is
    # model-sized by construction (k*d sufficient statistics), so
    # surfacing it as rows is exact, not a sample
    from d2d_spark.operators.similarity import kmeans_refine, train_ivf_centroids

    C0 = train_ivf_centroids(
        e, "vec_id", "embedding", n_centroids=_KMR_NC, iters=_KMR_TRAIN_ITERS
    )
    C = kmeans_refine(e, "embedding", C0, iters=_KMR_REFINE_ITERS)
    kmr = local_frame(spark, 
        [
            (j, pos, float(C[j, pos]), j + 1)
            for j in range(C.shape[0])
            for pos in range(C.shape[1])
        ],
        "query_id long, neighbor_id long, cos_sim double, rank int",
    )
    # pqrr leg: the standalone two-stage search — selective ADC
    # candidates (k*oversample of the corpus), exact rerank on the
    # candidates only
    from d2d_spark.operators.pq import pq_encode, pq_topk_rerank, train_pq

    pqm = train_pq(e, "vec_id", "embedding", m=_PQRR_M, ksub=_PQRR_KSUB, iters=10)
    pcodes = pq_encode(e, "embedding", pqm)
    pqrr = pq_topk_rerank(
        e, pcodes, q, "vec_id", "embedding", "pq_code", "vec_id", "embedding",
        pqm, k=_PQRR_K, oversample=_PQRR_OS,
    )
    cols = ["query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"), "rank"]
    adc_cols = ["query_id", "neighbor_id", F.round("score", 6).alias("cos_sim"), "rank"]
    return (
        lsh.select(F.lit("lsh").alias("leg"), *cols)
        .unionByName(ivf.select(F.lit("ivf").alias("leg"), *cols))
        .unionByName(ivfadc.select(F.lit("ivfadc").alias("leg"), *adc_cols))
        .unionByName(kmr.select(F.lit("kmr").alias("leg"), *cols))
        .unionByName(pqrr.select(F.lit("pqrr").alias("leg"), *cols))
    )


_PHASH_W, _PHASH_H = 24, 16  # synthetic grayscale canvas per doc


def _phash_px(doc_id: int) -> list[int]:
    """Python twin of the pure-Column pixel generator: deterministic
    0..245 grayscale from (doc_id, pixel index) — brightness-shifted
    clones stay within 0..255."""
    return [
        (doc_id * 37 + i * 101 + (i * i) % 251) % 246
        for i in range(_PHASH_W * _PHASH_H)
    ]


def _py_cells(px: list[int], w: int, h: int, gw: int, gh: int):
    out = []
    for ty in range(gh):
        for tx in range(gw):
            x0, x1 = tx * w // gw, (tx + 1) * w // gw
            y0, y1 = ty * h // gh, (ty + 1) * h // gh
            s = sum(px[y * w + x] for y in range(y0, y1) for x in range(x0, x1))
            out.append((s, (x1 - x0) * (y1 - y0)))
    return out


def _wrap64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def _py_dhash(px: list[int], w: int = _PHASH_W, h: int = _PHASH_H) -> int:
    """Python twin of phash._dhash_bits (9x8 grid, integer
    cross-multiplied gradient signs, two's-complement 64-bit)."""
    gw, gh = 9, 8
    cells = _py_cells(px, w, h, gw, gh)
    v = 0
    for ty in range(gh):
        for tx in range(gw - 1):
            (sa, ca), (sb, cb) = cells[ty * gw + tx], cells[ty * gw + tx + 1]
            if sa * cb > sb * ca:
                v += 1 << (ty * (gw - 1) + tx)
    return _wrap64(v)


def _py_ahash(px: list[int], w: int = _PHASH_W, h: int = _PHASH_H) -> int:
    """Python twin of phash._ahash_bits — float ops replayed in the
    same order (left fold of means, one global division)."""
    gw, gh = 8, 8
    cells = _py_cells(px, w, h, gw, gh)
    means = [s / c for s, c in cells]
    acc = 0.0
    for m in means:
        acc += m
    gmean = acc / float(gw * gh)
    v = 0
    for k, m in enumerate(means):
        if m > gmean:
            v += 1 << k
    return _wrap64(v)


def _video_frames(doc_id: int, fidxs, shift: int = 0) -> list[list[int]]:
    """Python twin of the plan's synthetic per-video frame generator —
    pixel p(i) of frame f is ((id*37 + f*997 + i*101 + i*i%251) % 246)
    + shift, the same integer chain the Column generator runs."""
    n = _PHASH_W * _PHASH_H
    return [
        [((doc_id * 37 + f * 997 + i * 101 + (i * i) % 251) % 246) + shift for i in range(n)]
        for f in fidxs
    ]


def _multimodal_suite_oracle() -> str:
    """decode leg in plain SQL; phash + phash_pairs + video_pairs legs
    as literal VALUES from the Python hash twins (keyed per SF by
    SUM(length(text)) — the established literal-oracle pattern). The
    video twin replays the WHOLE video_near_pairs pipeline: per-frame
    dhash, distinct hash set per video, exact integer-cross-multiplied
    Jaccard threshold (100*shared >= pct*union)."""
    import pyarrow.parquet as pq

    rows: list[tuple] = []
    from d2d_spark.plans.registry import fixture_table_paths

    for _fixture_path in fixture_table_paths("documents"):
        try:
            t = pq.read_table(
                _fixture_path, columns=["doc_id", "text"]
            )
        except Exception:
            continue
        docs = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
        tag = sum(len(s) for s in docs.values())
        sub = sorted(i for i in docs if i % 9 == 0)
        hashes = {}
        for i in sub:
            base = _phash_px(i)
            hashes[i] = _py_dhash(base)
            rows.append((tag, "phash", i, hashes[i], str(_py_ahash(base))))
            if i % 18 == 0:  # brightness-shifted clone
                hashes[i + 1_000_000] = _py_dhash([p + 10 for p in base])
        ids = sorted(hashes)
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                hd = bin((hashes[ids[x]] ^ hashes[ids[y]]) & ((1 << 64) - 1)).count("1")
                if hd <= 8:
                    rows.append((tag, "phash_pairs", ids[x], hd, str(ids[y])))
        # video_pairs twin: % 27 base videos of 5 frames; % 54 clones
        # (id + 2M) share 4 brightness-shifted frames + 1 unique — the
        # dhash brightness invariance makes shared frames EXACT set
        # matches, so each planted pair lands at jaccard 4/6 >= 60%
        vids: dict[int, set[int]] = {}
        for i in sorted(d for d in docs if d % 27 == 0):
            vids[i] = {_py_dhash(fr) for fr in _video_frames(i, range(5))}
            if i % 54 == 0:
                cl = _video_frames(i, range(4), shift=10) + _video_frames(i, [99])
                vids[i + 2_000_000] = {_py_dhash(fr) for fr in cl}
        vkeys = sorted(vids)
        for x in range(len(vkeys)):
            for y in range(x + 1, len(vkeys)):
                a, b = vkeys[x], vkeys[y]
                sh = len(vids[a] & vids[b])
                na, nb = len(vids[a]), len(vids[b])
                if sh and 100 * sh >= 60 * (na + nb - sh):
                    rows.append((tag, "video_pairs", a, sh, f"{b}|{na}|{nb}"))
    if not rows:
        rows = [(-1, "", 0, 0, "")]
    values = ",\n     ".join(
        f"({t}, '{leg}', {d}, {n}, '{s}')" for t, leg, d, n, s in rows
    )
    return f"""
    SELECT 'decode' AS leg, doc_id,
           CAST(length(text) AS BIGINT) AS n_bytes,
           CAST((length(text) % 640) + 1 AS INT) AS fake_width,
           CAST((length(text) % 480) + 1 AS INT) AS fake_height,
           array_to_string(list_transform(range(1, length(text) + 1, 16),
                           p -> ascii(substr(text, CAST(p AS INT), 1))), ',') AS frames_csv,
           array_to_string([ascii(substr(text, 1, 1)),
                            ascii(substr(text, length(text), 1)),
                            length(text) % 256,
                            length(text) % 101], ',') AS feature_csv
    FROM documents
    WHERE doc_id % 20 = 0 AND regexp_matches(text, '^[ -~]+$')
    UNION ALL
    SELECT leg, CAST(doc_id AS BIGINT), CAST(n_bytes AS BIGINT),
           CAST(NULL AS INT), CAST(NULL AS INT), frames_csv,
           CAST(NULL AS VARCHAR)
    FROM (VALUES
     {values}) AS expected(sftag, leg, doc_id, n_bytes, frames_csv)
    WHERE sftag = (SELECT SUM(length(text)) FROM documents)
    """


@query(
    "multimodal_pipeline",
    oracle=_multimodal_suite_oracle,
    tags=("llm", "multimodal", "pandas-udf", "phash"),
)
def multimodal_pipeline(spark, sf_dir):
    """Multimodal plumbing end-to-end: opaque binary payload + typed
    metadata, columnar frame sampling, and the Arrow-batched stub
    decode (mapInPandas) joined back on the id — both the metadata
    path and the Pandas-UDF decode path in one hash-checked result.

    Restricted to all-ASCII documents so byte arithmetic equals
    codepoint arithmetic in the oracle (non-ASCII payloads take the
    same code path; only the oracle needs the restriction). Array
    outputs are CSV-joined to scalars: the driver canonicalizer
    sorts result columns with pandas, which cannot hash raw list
    cells — and the frame/feature values are integral, so the string
    forms are engine-exact.

    The phash/phash_pairs legs drive perceptual hashing
    (operators/phash.py) end-to-end against Python twins of the exact
    bit rules (_py_dhash/_py_ahash) inlined as literal VALUES:
    deterministic synthetic 24x16 grayscale canvases per doc_id
    (pure-Column generator, 0..245), dhash + ahash per image over the
    doc_id % 9 subset, then banded-Hamming near pairs over the subset
    plus brightness-shifted (+10) clones of the % 18 slice —
    cross-multiplied gradient signs make the clones EXACT dhash
    matches, so every planted pair surfaces at hamming 0 (zero
    organic sub-8 pairs: generator hashes are effectively uniform
    64-bit)."""
    base_docs = _t(spark, sf_dir, "documents")
    d = base_docs.filter(F.col("doc_id") % 20 == 0).filter(
        F.col("text").rlike("^[ -~]+$")
    )
    d = M.attach_binary_payload(d)
    d = M.sample_frames(d, every=16)
    meta = d.select(
        "doc_id",
        F.array_join(F.transform("frames", lambda x: x.cast("string")), ",").alias(
            "frames_csv"
        ),
    )
    feats = M.decode_features(d)
    decode = feats.join(meta, "doc_id").select(
        F.lit("decode").alias("leg"),
        "doc_id",
        F.col("n_bytes").cast("bigint").alias("n_bytes"),
        "fake_width",
        "fake_height",
        "frames_csv",
        F.array_join(
            F.transform("feature", lambda x: x.cast("bigint").cast("string")), ","
        ).alias("feature_csv"),
    )

    from d2d_spark.operators.phash import phash_near_pairs, with_phash

    n_px = _PHASH_W * _PHASH_H

    def px_gen(shift: int) -> F.Column:
        # brightness shift applied INSIDE the generator so the clone
        # frame is its own flat projection over the scan — deriving
        # clones from the imgs frame nests the generator under a
        # second transform and the optimizer's projection-pushdown
        # walk blows up on the hash trees above it
        return F.transform(
            F.sequence(F.lit(0), F.lit(n_px - 1)),
            lambda i: (
                ((F.col("doc_id") * 37 + i * 101 + F.pmod(i * i, 251)) % 246) + shift
            ).cast("int"),
        )

    imgs = base_docs.filter(F.col("doc_id") % 9 == 0).select(
        "doc_id",
        px_gen(0).alias("px"),
        F.lit(_PHASH_W).alias("w"),
        F.lit(_PHASH_H).alias("h"),
    )
    # pixels FIRST, id alias in a separate projection: in one select,
    # lateral-column-alias resolution binds px_gen's doc_id reference
    # to the +1,000,000 alias, silently hashing the wrong canvas
    clones = (
        base_docs.filter(F.col("doc_id") % 18 == 0)
        .select("doc_id", px_gen(10).alias("px"))
        .select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            "px",
            F.lit(_PHASH_W).alias("w"),
            F.lit(_PHASH_H).alias("h"),
        )
    )
    # The hash stages stack ~150 unrolled cell/bit expressions, so a
    # 1-GB-driver plan can hold at most a couple of them: materialize
    # the (small, id + 384-int-array) canvas as a leaf, compute each
    # hash tree EXACTLY ONCE over it, and materialize the 16-byte
    # (id, hash) results before any join/band stage sees them (the
    # eager-localCheckpoint discipline of the CC leg above, applied
    # at every hash-tree boundary).
    canvas = imgs.unionByName(clones).localCheckpoint(eager=True)
    dh_all = (
        with_phash(canvas, "px", "w", "h", method="dhash", out_col="dhash")
        .select("doc_id", "dhash")
        .localCheckpoint(eager=True)
    )
    ah_imgs = (
        with_phash(
            canvas.filter(F.col("doc_id") < 1_000_000),
            "px", "w", "h", method="ahash", out_col="ahash",
        )
        .select("doc_id", "ahash")
        .localCheckpoint(eager=True)
    )
    phash_leg = (
        dh_all.filter(F.col("doc_id") < 1_000_000)
        .join(ah_imgs, "doc_id")
        .select(
            F.lit("phash").alias("leg"),
            "doc_id",
            F.col("dhash").alias("n_bytes"),
            F.lit(None).cast("int").alias("fake_width"),
            F.lit(None).cast("int").alias("fake_height"),
            F.col("ahash").cast("string").alias("frames_csv"),
            F.lit(None).cast("string").alias("feature_csv"),
        )
    )
    from d2d_spark.operators.dedup import hamming_near_pairs

    pairs = hamming_near_pairs(dh_all, "dhash", "doc_id", max_hamming=8).select(
        F.lit("phash_pairs").alias("leg"),
        F.col("id_a").alias("doc_id"),
        F.col("hamming").cast("bigint").alias("n_bytes"),
        F.lit(None).cast("int").alias("fake_width"),
        F.lit(None).cast("int").alias("fake_height"),
        F.col("id_b").cast("string").alias("frames_csv"),
        F.lit(None).cast("string").alias("feature_csv"),
    )

    # video_pairs leg: video near-dup by frame-fingerprint sets
    # (phash.video_near_pairs) over synthetic 5-frame videos — the
    # % 54 clones share 4 brightness-shifted frames plus one unique
    # frame, so every planted pair surfaces at jaccard 4/6 >= 60% and
    # the exact (n_shared, n_a, n_b) triple is hash-checked against
    # the Python twin's literal rows (jaccard is one division of
    # those longs, checked implicitly)
    from d2d_spark.operators.phash import video_near_pairs

    def frame_expr(f: int, shift: int) -> F.Column:
        # a single-parameter lambda is load-bearing: a two-parameter
        # lambda makes F.transform bind the second arg to the element
        # INDEX column, silently clobbering a `f=f` default capture
        return F.transform(
            F.sequence(F.lit(0), F.lit(n_px - 1)),
            lambda i: (
                (
                    (F.col("doc_id") * 37 + f * 997 + i * 101 + F.pmod(i * i, 251))
                    % 246
                )
                + shift
            ).cast("int"),
        )

    def vid_frames(fidxs, shift: int) -> F.Column:
        return F.array(*[frame_expr(f, shift) for f in fidxs])

    videos = base_docs.filter(F.col("doc_id") % 27 == 0).select(
        "doc_id",
        vid_frames(range(5), 0).alias("frames"),
        F.lit(_PHASH_W).alias("w"),
        F.lit(_PHASH_H).alias("h"),
    )
    # frames FIRST, id alias in a separate projection (the lateral-
    # column-alias trap the image clones above document)
    vclones = (
        base_docs.filter(F.col("doc_id") % 54 == 0)
        .select(
            "doc_id",
            F.concat(vid_frames(range(4), 10), vid_frames([99], 0)).alias("frames"),
        )
        .select(
            (F.col("doc_id") + 2_000_000).alias("doc_id"),
            "frames",
            F.lit(_PHASH_W).alias("w"),
            F.lit(_PHASH_H).alias("h"),
        )
    )
    # materialize the generated canvases as a leaf before the hash
    # tree (the plan-size discipline of the image legs above)
    vcanvas = videos.unionByName(vclones).localCheckpoint(eager=True)
    vp = video_near_pairs(
        vcanvas, "doc_id", "frames", "w", "h", threshold_pct=60
    )
    video_leg = vp.select(
        F.lit("video_pairs").alias("leg"),
        F.col("id_a").alias("doc_id"),
        F.col("n_shared").cast("bigint").alias("n_bytes"),
        F.lit(None).cast("int").alias("fake_width"),
        F.lit(None).cast("int").alias("fake_height"),
        F.concat_ws("|", "id_b", "n_a", "n_b").alias("frames_csv"),
        F.lit(None).cast("string").alias("feature_csv"),
    )
    return (
        decode.unionByName(phash_leg).unionByName(pairs).unionByName(video_leg)
    )


# --- weighted-MinHash twin for the wmh leg: replays the WHOLE
# operator pipeline (dedup.py:weighted_minhash_lsh_pairs) in pure
# Python with ZERO operator imports — tf profiles from the canonical
# lowercase-whitespace tokenizer, discretize-replicate items at
# resolution 1 (integral tf => q = w replicas), Spark-parity
# item hashing via _spark_xxh64_str_long (test-pinned against
# F.xxhash64), the same closed-form permutation coefficients
# (dedup.py:_perm_coeffs' formula, restated here deliberately), band
# bucketing by SLICE EQUALITY (the operator buckets by xxhash64 of
# the slice — identical candidates short of a 2^-64 hash collision,
# which the IVFADC twin precedent accepts), and the exact sum-min
# verify on true weights. The emitted (sm, wa, wb) are exact longs;
# the ratio is computed as one double division IN THE SQL, so both
# engines evaluate the identical IEEE expression. ---

_WMH_K, _WMH_BANDS, _WMH_THR, _WMH_MOD = 32, 16, 60, 25


def _wmh_literal_rows() -> list[tuple]:
    """(sftag, id_a, id_b, sm, wa, wb) per fixture for the wmh leg."""
    from collections import Counter

    import pyarrow.parquet as pq

    from d2d_spark.plans.registry import fixture_table_paths

    K, bands, thr = _WMH_K, _WMH_BANDS, _WMH_THR
    rows_per_band = K // bands
    mers = (1 << 61) - 1
    coeffs = [
        (
            2 * (j * 0x9E3779B9 % (1 << 30)) + 1,
            (j * 0x85EBCA6B + 0xC2B2AE35) % (1 << 31),
        )
        for j in range(K)
    ]
    out: list[tuple] = []
    seen_tags: set[int] = set()
    for path in fixture_table_paths("documents"):
        try:
            t = pq.read_table(path, columns=["doc_id", "text"])
        except Exception:
            continue
        profiles: dict[int, Counter] = {}
        tag = 0
        for i, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            tag += len(s)
            if i % _WMH_MOD:
                continue
            toks = [x for x in s.strip().lower().split() if x]
            if toks:
                profiles[i] = Counter(toks)
        if tag in seen_tags:
            continue
        seen_tags.add(tag)
        # memoized per-ITEM permutation vectors: the fixture vocab is
        # tiny and heavily shared, so distinct (token, replica) items
        # number in the hundreds while item OCCURRENCES number ~10^5
        perm_by_item: dict[tuple[str, int], tuple[int, ...]] = {}

        def perms(tok: str, i: int) -> tuple[int, ...]:
            v = perm_by_item.get((tok, i))
            if v is None:
                h31 = _spark_xxh64_str_long(tok, i) % ((1 << 31) - 1)
                v = tuple((h31 * a + b) % mers for a, b in coeffs)
                perm_by_item[(tok, i)] = v
            return v

        sigs: dict[int, tuple[int, ...]] = {}
        for d, prof in profiles.items():
            mins = [mers + 1] * K
            for tok, tf in prof.items():
                for i in range(1, tf + 1):
                    pv = perms(tok, i)
                    for k in range(K):
                        if pv[k] < mins[k]:
                            mins[k] = pv[k]
            sigs[d] = tuple(mins)
        cands: set[tuple[int, int]] = set()
        for b in range(bands):
            buckets: dict[tuple[int, ...], list[int]] = {}
            for d, s in sigs.items():
                buckets.setdefault(
                    s[b * rows_per_band : (b + 1) * rows_per_band], []
                ).append(d)
            for ds in buckets.values():
                ds.sort()
                for x in range(len(ds)):
                    for y in range(x + 1, len(ds)):
                        cands.add((ds[x], ds[y]))
        for a, b in sorted(cands):
            pa, pb = profiles[a], profiles[b]
            sm = sum(min(pa[tk], pb[tk]) for tk in pa.keys() & pb.keys())
            wa, wb = sum(pa.values()), sum(pb.values())
            if 100 * sm >= thr * (wa + wb - sm):
                out.append((tag, a, b, sm, wa, wb))
    return out


def _jaccard_suite_oracle() -> str:
    wmh_rows = _wmh_literal_rows()
    values = ",".join(f"({t},{a},{b},{sm},{wa},{wb})" for t, a, b, sm, wa, wb in wmh_rows)
    if not values:
        values = "(-1,0,0,1,1,1)"  # no fixture: tag -1 never matches
    return f"""
    WITH RECURSIVE
     sh AS MATERIALIZED (SELECT doc_id, {_SQL_SHINGLES} AS s FROM documents),
     pairs AS MATERIALIZED (
       SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              round(len(list_intersect(a.s, b.s))*1.0
                    / len(list_distinct(a.s || b.s)), 6) AS jaccard
       FROM sh a, sh b
       WHERE a.doc_id < b.doc_id
         AND len(list_intersect(a.s, b.s))*1.0 / len(list_distinct(a.s || b.s)) >= 0.5),
     edges AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM pairs
               UNION SELECT id_b, id_a FROM pairs),
     reach(id, r) AS (
       SELECT src, src FROM edges
       UNION
       SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id),
     comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id),
     ctok AS MATERIALIZED (SELECT doc_id, unnest(s) AS tk FROM sh WHERE len(s) > 0),
     csz AS MATERIALIZED (SELECT doc_id, COUNT(*) AS sa FROM ctok GROUP BY doc_id),
     cov AS MATERIALIZED (
       SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS ov
       FROM ctok a JOIN ctok b ON a.tk = b.tk AND a.doc_id <> b.doc_id
       WHERE a.doc_id % 3 = 0
       GROUP BY 1, 2),
     wtf AS MATERIALIZED (
       SELECT doc_id, tok, COUNT(*) AS w FROM (
         SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
         FROM documents WHERE doc_id % 3 = 0)
       WHERE tok <> '' GROUP BY doc_id, tok),
     wkeep AS MATERIALIZED (SELECT tok FROM wtf GROUP BY tok HAVING COUNT(*) <= 100),
     wflt AS MATERIALIZED (SELECT wtf.* FROM wtf JOIN wkeep USING (tok)),
     wsz AS MATERIALIZED (SELECT doc_id, SUM(w) AS wt FROM wflt GROUP BY doc_id),
     wsh AS MATERIALIZED (
       SELECT a.doc_id AS id_a, b.doc_id AS id_b, SUM(LEAST(a.w, b.w)) AS sm
       FROM wflt a JOIN wflt b USING (tok) WHERE a.doc_id < b.doc_id
       GROUP BY 1, 2),
     wdot AS MATERIALIZED (
       SELECT a.doc_id AS id_a, b.doc_id AS id_b, SUM(a.w * b.w) AS dt
       FROM wflt a JOIN wflt b USING (tok) WHERE a.doc_id < b.doc_id
       GROUP BY 1, 2),
     wnsq AS MATERIALIZED (SELECT doc_id, SUM(w * w) AS nsq FROM wflt GROUP BY doc_id)
    SELECT 'pair' AS leg, id_a AS a, id_b AS b, jaccard FROM pairs
    UNION ALL
    SELECT 'prefix' AS leg, id_a AS a, id_b AS b, jaccard FROM pairs
    UNION ALL
    SELECT 'comp' AS leg, id, component, CAST(NULL AS DOUBLE) FROM comp
    UNION ALL
    SELECT 'contain' AS leg, id_a, id_b, round(ov*1.0/sa, 6)
    FROM cov JOIN csz ON csz.doc_id = cov.id_a WHERE ov >= 0.8 * sa
    UNION ALL
    SELECT 'wjac' AS leg, id_a, id_b,
           round(sm * 1.0 / (sa.wt + sb.wt - sm), 6)
    FROM wsh JOIN wsz sa ON sa.doc_id = wsh.id_a
             JOIN wsz sb ON sb.doc_id = wsh.id_b
    WHERE 100 * sm >= 30 * (sa.wt + sb.wt - sm)
    UNION ALL
    SELECT 'wcos' AS leg, id_a, id_b,
           dt / sqrt(CAST(sa.nsq AS DOUBLE) * sb.nsq)
    FROM wdot JOIN wnsq sa ON sa.doc_id = wdot.id_a
              JOIN wnsq sb ON sb.doc_id = wdot.id_b
    WHERE 10000 * CAST(dt AS HUGEINT) * dt >= 3600 * CAST(sa.nsq AS HUGEINT) * sb.nsq
    UNION ALL
    SELECT 'wmh' AS leg, id_a, id_b,
           CAST(sm AS DOUBLE) / (wa + wb - sm)
    FROM (VALUES {values}) AS wmh_exp(sftag, id_a, id_b, sm, wa, wb)
    WHERE sftag = (SELECT SUM(length(text)) FROM documents)
    """


@query(
    "jaccard_pairs_clusters",
    oracle=_jaccard_suite_oracle,
    tags=("llm", "dedup", "jaccard", "clusters", "weighted-jaccard", "weighted-minhash"),
)
def jaccard_pairs_clusters(spark, sf_dir):
    """Near-dup clustering end-to-end in one tagged result
    (consolidated so the driver window covers every family): the pair
    leg is the exact word-3-gram Jaccard ground truth the LSH paths
    approximate (fixtures plant ~25 true pairs, scores hash-checked to
    6 decimals); the prefix leg recomputes the SAME pairs via the
    prefix-filtering set-similarity join (AllPairs-style equi-join on
    rare-first prefix tokens — the exact algorithm at 100-TB scale,
    no quadratic anywhere) and must hash-match the quadratic truth
    bit-for-bit; the comp leg runs those pairs through distributed
    connected components (iterative min-label propagation with pointer
    doubling) — an iterative Spark algorithm checked exactly against
    SQL recursion.

    The wjac leg runs `weighted_jaccard_pairs` — EXACT weighted
    Jaccard (sum-min over sum-max via the max = a+b-min identity) on
    tf-weighted word profiles of the %3 slice, df-capped at 100 —
    against a plain token-join SQL replay: integer weights make every
    sum and the cross-multiplied threshold engine-exact, and the one
    reported ratio is a single division of exact integers.

    The wcos leg runs `weighted_cosine_pairs` — EXACT sparse cosine,
    the scale-invariant third measure — on the SAME profiles as wjac;
    the integer cross-multiplied threshold and the single
    multiply+sqrt+divide score make the whole leg engine-exact with
    no rounding.

    The wmh leg runs `weighted_minhash_lsh_pairs` — the LSH arm, NO
    df cap — on the %25 slice against a pure-Python twin of the whole
    pipeline (Spark-parity XXH64 item hashing, same permutation
    formula, band bucketing, exact verify), the IVFADC oracle recipe:
    candidate recall is probabilistic by design, so the oracle replays
    the banding rather than the exact join."""
    d = _t(spark, sf_dir, "documents")
    # r11 (guide §2.4): the quadratic ground-truth join feeds BOTH the
    # pair leg and connected components — persist its (tiny,
    # output-sized) result once so the O(n²) verify runs once, not
    # twice; the eager count fills the cache before comp's checkpoint
    # and the union's pair leg both read it.
    from pyspark import StorageLevel as _SL

    from d2d_spark import cache as _oc

    pairs = _oc.register(
        "jaccard_suite",
        D.ngram_jaccard_pairs(d, "text", "doc_id", n=3, threshold=0.5)
        .persist(_SL.MEMORY_AND_DISK),
    )
    pairs.count()
    pair_leg = pairs.select(
        F.lit("pair").alias("leg"),
        F.col("id_a").alias("a"),
        F.col("id_b").alias("b"),
        F.round("jaccard", 6).alias("jaccard"),
    )
    # ONE persisted ordered-shingle stage feeds the prefix AND
    # containment joins (identical (corpus, n, order) inputs)
    shingle_stage = D._ordered_shingle_sets(d, "text", "doc_id", 3, "freq", "jaccard_prefix")
    prefix_leg = D.jaccard_prefix_pairs(
        d, "text", "doc_id", n=3, threshold=0.5, ordered=shingle_stage
    ).select(
        F.lit("prefix").alias("leg"),
        F.col("id_a").alias("a"),
        F.col("id_b").alias("b"),
        F.round("jaccard", 6).alias("jaccard"),
    )
    # pin shuffle width for the iteration loop: a vanilla session's
    # 200 partitions x ~10 stages x rounds is pure overhead on a
    # near-dup graph; restore for the caller
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        comp = D.connected_components(pairs)
        comp = comp.localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    comp_leg = comp.select(
        F.lit("comp").alias("leg"),
        F.col("id").alias("a"),
        F.col("component").alias("b"),
        F.lit(None).cast("double").alias("jaccard"),
    )
    # directed containment (|A∩B|/|A| >= 0.8) via the asymmetric
    # prefix-filter join; contained side restricted to doc_id % 3 = 0
    # to bound the oracle's quadratic replay (the Spark path needs no
    # such bound — it post-filters the equi-join output)
    contain_leg = (
        D.containment_prefix_pairs(
            d, "text", "doc_id", n=3, threshold=0.8, ordered=shingle_stage
        )
        .filter(F.col("id_a") % 3 == 0)
        .select(
            F.lit("contain").alias("leg"),
            F.col("id_a").alias("a"),
            F.col("id_b").alias("b"),
            F.round("containment", 6).alias("jaccard"),
        )
    )
    from pyspark import StorageLevel
    from d2d_spark import cache as opcache
    from d2d_spark.operators.tfidf import _term_counts

    # the canonical lowercase-whitespace tokenizer every text operator
    # shares — the leg must stay comparable with the tfidf/BM25 legs.
    # The df-capped profile is built ONCE and persisted: the wjac AND
    # wcos legs both consume it (tokenize + cap would otherwise run
    # twice), and both skip their probe — _term_counts' groupBy owns
    # the (id, token) key and tf >= 1 by construction, the documented
    # validate=False contract. Eager count per the unfilled-cache-race
    # note in minhash_lsh_pairs; release per corpus via
    # cache.release("wpair_profiles").
    wtf_raw = _term_counts(d.filter(F.col("doc_id") % 3 == 0), "text", "doc_id")
    wtf = opcache.register(
        "wpair_profiles",
        D._df_capped(
            wtf_raw.select(
                F.col("__id"), F.col("tok").alias("__t"), F.col("tf").alias("__w")
            ),
            100,
        )
        .select("__id", F.col("__t").alias("tok"), F.col("__w").alias("tf"))
        .persist(StorageLevel.MEMORY_AND_DISK),
    )
    wtf.count()
    wjac_leg = D.weighted_jaccard_pairs(
        wtf, "__id", "tok", "tf", threshold_pct=30, max_df=None, validate=False
    ).select(
        F.lit("wjac").alias("leg"),
        F.col("id_a").alias("a"),
        F.col("id_b").alias("b"),
        F.round(
            F.col("w_shared") / (F.col("w_a") + F.col("w_b") - F.col("w_shared")), 6
        ).alias("jaccard"),
    )
    # wcos leg: exact sparse-cosine pairs over the SAME df-capped tf
    # profiles as the wjac leg — the integer cross-multiplied
    # threshold (10000·dot² >= 60²·nsq_a·nsq_b, DECIMAL vs HUGEINT)
    # decides the cut exactly in both engines, and the emitted cosine
    # is one multiply+sqrt+divide over exact longs, hash-matched with
    # NO rounding
    wcos_leg = D.weighted_cosine_pairs(
        wtf, "__id", "tok", "tf", threshold_pct=60, max_df=None, validate=False
    ).select(
        F.lit("wcos").alias("leg"),
        F.col("id_a").alias("a"),
        F.col("id_b").alias("b"),
        F.col("cos_sim").alias("jaccard"),
    )
    # wmh leg: the LSH arm over UNCAPPED tf profiles of the %25 slice
    # — candidates from banded weighted minhash, verified exactly;
    # checked against the pure-Python whole-pipeline twin above. The
    # ratio is one double division of exact longs (no rounding), so
    # the hash compare is engine-exact.
    wmh_src = _term_counts(d.filter(F.col("doc_id") % _WMH_MOD == 0), "text", "doc_id")
    wmh_leg = D.weighted_minhash_lsh_pairs(
        wmh_src, "__id", "tok", "tf",
        threshold_pct=_WMH_THR, num_hashes=_WMH_K, bands=_WMH_BANDS,
    ).select(
        F.lit("wmh").alias("leg"),
        F.col("id_a").alias("a"),
        F.col("id_b").alias("b"),
        (
            F.col("w_shared").cast("double")
            / (F.col("w_a") + F.col("w_b") - F.col("w_shared"))
        ).alias("jaccard"),
    )
    return (
        pair_leg.unionByName(prefix_leg)
        .unionByName(comp_leg)
        .unionByName(contain_leg)
        .unionByName(wjac_leg)
        .unionByName(wcos_leg)
        .unionByName(wmh_leg)
    )


@query(
    "token_histogram_documents",
    oracle="""
    WITH toks AS (SELECT doc_id,
                         unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
                  FROM documents),
    tc AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks
           WHERE tok <> '' GROUP BY doc_id, tok),
    dfreq AS (SELECT tok, COUNT(*) AS df FROM tc GROUP BY tok),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n FROM documents),
    dl AS (SELECT doc_id, SUM(tf) AS dl FROM tc GROUP BY doc_id),
    ad AS (SELECT AVG(dl) AS avgdl FROM dl),
    qt AS (SELECT DISTINCT doc_id AS qid, tok FROM toks
           WHERE doc_id % 250 = 0 AND tok <> ''),
    sc AS (SELECT qid, tc.doc_id AS did,
             CAST(SUM(CAST(round(
               ln(CAST(1.0 AS DOUBLE)
                  + (CAST(n AS DOUBLE) - df + CAST(0.5 AS DOUBLE))
                    / (df + CAST(0.5 AS DOUBLE)))
               * tf * CAST(2.2 AS DOUBLE)
               / (tf + CAST(1.2 AS DOUBLE)
                       * (CAST(0.25 AS DOUBLE)
                          + CAST(0.75 AS DOUBLE) * dl / avgdl)), 9)
             AS DECIMAL(28,14))) AS DOUBLE) AS s
           FROM qt JOIN tc USING (tok) JOIN dfreq USING (tok)
                JOIN dl ON dl.doc_id = tc.doc_id, n, ad
           GROUP BY qid, tc.doc_id),
    ranked AS (SELECT qid, did, s,
                      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY s DESC, did) AS r
               FROM sc)
    SELECT 'hist' AS leg, tok, SUM(tf) AS freq,
           CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS DOUBLE) AS tfidf
    FROM tc GROUP BY tok HAVING SUM(tf) >= 50
    UNION ALL
    SELECT 'tfidf', tc.tok, CAST(NULL AS BIGINT), tc.doc_id,
           round(tf * (ln((n + 1.0) / (df + 1.0)) + 1.0), 6)
    FROM tc JOIN dfreq USING (tok), n
    WHERE tc.doc_id % 100 = 0 AND df >= 2
    UNION ALL
    SELECT 'search', CAST(qid AS VARCHAR), r, did, s
    FROM ranked WHERE r <= 10
    """,
    tags=("llm", "text", "explode", "tfidf"),
)
def token_histogram_documents(spark, sf_dir):
    """Two legs of the corpus lexical statistics. 'hist': token
    histogram — explode (lateral unnest) -> hash aggregate -> having,
    the generator pattern behind every vocabulary/BPE-frequency pass;
    partial aggregation absorbs the explosion before the shuffle.
    'tfidf': per-(document, term) TF-IDF weights from operators/tfidf
    on a doc slice (ln-smoothed idf hash-checked to 6 decimals against
    the SQL formula — the ranking/top-k layer on these weights is
    pinned in pytest where tie-breaks can't drift across engines)."""
    from d2d_spark.operators import tfidf as TI

    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("tok")
    )
    hist = (
        toks.filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") >= 50)
        .select(
            F.lit("hist").alias("leg"),
            "tok",
            "freq",
            F.lit(None).cast("bigint").alias("doc_id"),
            F.lit(None).cast("double").alias("tfidf"),
        )
    )
    weights = (
        TI.tf_idf(d, "text", "doc_id", min_df=2)
        .filter(F.col("doc_id") % 100 == 0)
        .select(
            F.lit("tfidf").alias("leg"),
            "tok",
            F.lit(None).cast("bigint").alias("freq"),
            "doc_id",
            F.round("tfidf", 6).alias("tfidf"),
        )
    )
    search = TI.bm25_search(
        d,
        d.filter(F.col("doc_id") % 250 == 0).select("doc_id", "text"),
        "text",
        "doc_id",
        "text",
        "doc_id",
        k=10,
    ).select(
        F.lit("search").alias("leg"),
        F.col("query_id").cast("string").alias("tok"),
        F.col("rank").cast("bigint").alias("freq"),
        "doc_id",
        F.col("score").alias("tfidf"),
    )
    return hist.unionByName(weights).unionByName(search)


@query(
    "semantic_dedup_embeddings",
    oracle="""
    WITH f AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 0
               UNION ALL
               SELECT vec_id + 1000000, embedding FROM embeddings WHERE vec_id % 2 = 0),
         canon AS (SELECT vec_id, array_to_string(embedding, ',') AS fp FROM f)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b
    FROM canon a JOIN canon b ON a.fp = b.fp AND a.vec_id < b.vec_id
    """,
    tags=("llm", "dedup", "semantic", "semdedup"),
)
def semantic_dedup_embeddings(spark, sf_dir):
    """SemDeDup near-pairs on a planted-clone fixture (half the
    embeddings unioned with an identical clone each, id + 1,000,000):
    k-means cells partition the corpus, candidate pairs form only
    within a cell, and cosine >= threshold keeps a pair.

    Exact-by-construction oracle at threshold ~1: identical vectors
    always share a cell (cell assignment is a pure function of the
    vector) and score cosine 1 up to one ulp, so the surviving pair
    set is precisely the bit-identical-vector pairs — which SQL
    expresses as an equi-join on the rendered vector. Sub-1 threshold
    recall/precision stays pytest-checked (planted-clone recall,
    oversized-cell split bound)."""
    from d2d_spark.operators.semantic import semantic_near_pairs

    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 2 == 0)
    base = e.select("vec_id", "embedding")
    clones = base.select((F.col("vec_id") + 1000000).alias("vec_id"), "embedding")
    fixture = base.unionAll(clones)
    out = semantic_near_pairs(
        fixture, "vec_id", "embedding", threshold=0.999999999, n_centroids=16
    )
    return out.select("id_a", "id_b")


@query(
    "paragraph_dedup_documents",
    oracle=r"""
    WITH paras AS (
      SELECT doc_id, i AS pos, p,
             md5(lower(trim(regexp_replace(p, '\s+', ' ', 'g')))) AS fp
      FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS p,
                   generate_subscripts(string_split(text, chr(10)), 1) AS i
            FROM documents)
      WHERE trim(p) <> ''
    ), ranked AS (
      SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id, pos) AS rk,
                count(*) OVER (PARTITION BY fp) AS n
      FROM paras
    ), kept AS (
      SELECT * FROM ranked WHERE n = 1 OR rk = 1
    ), rebuilt AS (
      SELECT doc_id, string_agg(p, chr(10) ORDER BY pos) AS t, count(*) AS k
      FROM kept GROUP BY doc_id
    ), totals AS (
      SELECT doc_id, count(*) AS tot FROM paras GROUP BY doc_id
    )
    SELECT d.doc_id, coalesce(r.t, '') AS text,
           coalesce(tot, 0) - coalesce(r.k, 0) AS n_dropped_paragraphs
    FROM documents d LEFT JOIN rebuilt r USING (doc_id) LEFT JOIN totals USING (doc_id)
    """,
    tags=("llm", "dedup", "paragraph"),
)
def paragraph_dedup_documents(spark, sf_dir):
    """Paragraph-level exact dedup across the whole corpus (the
    CCNet/RefinedWeb pass document-level dedup misses): every repeated
    paragraph keeps its first (doc id, position) occurrence, later
    copies are cut, documents are stitched back in order. Newline
    paragraphs — the fixture text has no blank lines. The oracle
    rebuilds the same corpus with window functions over the exploded
    paragraph table."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = D.paragraph_dedup(d, "text", "doc_id", sep="\n")
    return out.select("doc_id", "text", "n_dropped_paragraphs")


@query(
    "perplexity_filter_documents",
    oracle=r"""
    WITH norm AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t FROM documents
    ),
    doc_grams AS (
      SELECT doc_id, substr(t, i, 3) AS gram
      FROM norm, unnest(generate_series(1, greatest(length(t) - 2, 0))) AS u(i)
      WHERE length(t) >= 3
    ),
    counts AS (SELECT gram, count(*) AS c FROM doc_grams GROUP BY gram),
    prefix AS (SELECT substr(gram, 1, 2) AS p, sum(c) AS pc FROM counts GROUP BY p),
    model AS (
      SELECT gram, ln(c::DOUBLE) - ln(pc::DOUBLE) AS logp
      FROM (SELECT * FROM counts WHERE c >= 2 ORDER BY c DESC, gram LIMIT 5000) k
      JOIN prefix ON substr(k.gram, 1, 2) = prefix.p
    ),
    scored AS (
      SELECT doc_id,
             CAST(SUM(CAST(coalesce(model.logp, -16.0) AS DECIMAL(28,14))) AS DOUBLE)
               / COUNT(*) AS mean_logp
      FROM doc_grams LEFT JOIN model USING (gram)
      GROUP BY doc_id
    )
    SELECT doc_id, round(mean_logp, 6) AS mean_logp6
    FROM scored WHERE exp(-mean_logp) <= 25.0
    """,
    tags=("llm", "quality", "perplexity", "ccnet"),
)
def perplexity_filter_documents(spark, sf_dir):
    """CCNet-style perplexity filter: train the char-3-gram LM on the
    corpus itself, score every document, keep per-char perplexity
    <= 25. The mean log-prob is an exact DECIMAL(28,14) sum divided
    once — bit-identical on any partitioning and in the oracle — and
    is returned rounded so the driver hash pins the score values, not
    just the surviving id set."""
    from d2d_spark.operators.ngram_lm import perplexity_self_score

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    # one shared gram explode feeds both the model counts and the
    # scoring join (separate train/score plans would each pay it)
    scored = perplexity_self_score(
        d, "text", "doc_id", n=3, vocab_size=5000, min_count=2, floor_logp=-16.0
    )
    return scored.filter(F.col("ppl") <= 25.0).select(
        "doc_id", F.round("mean_logp", 6).alias("mean_logp6")
    )


@query(
    "token_budget_mix",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_SQL_NTOK} AS n_toks FROM documents)
    SELECT doc_id, n_toks, CAST(0 AS INT) AS epoch, 'head' AS source
    FROM t WHERE doc_id % 3 = 0
    UNION ALL
    SELECT doc_id, n_toks, CAST(u.e AS INT) AS epoch, 'tail' AS source
    FROM t, unnest([0, 1]) AS u(e) WHERE doc_id % 3 <> 0
    """,
    tags=("llm", "sampling", "mixing"),
)
def token_budget_mix(spark, sf_dir):
    """Token-budget corpus mixing: shares chosen so the 'head' source
    hits exactly 1.0 epochs and 'tail' exactly 2.0 — every row of head
    kept at epoch 0, every row of tail upsampled to epochs {{0, 1}} —
    making the expected-token machinery (single-job tag-union
    inventory, ratio computation, epoch explode, source tagging)
    hash-checkable without reproducing xxhash64 in SQL. The
    fractional hash-sampling paths stay pytest-checked
    (share-scale invariance, epoch caps, determinism)."""
    from d2d_spark.operators.sampling import mix_to_token_budget

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", X.token_count_ws(F.col("text")).alias("n_toks")
    )
    head = d.filter(F.col("doc_id") % 3 == 0)
    tail = d.filter(F.col("doc_id") % 3 != 0)
    have_h = head.agg(F.sum("n_toks")).collect()[0][0]
    have_t = tail.agg(F.sum("n_toks")).collect()[0][0]
    out = mix_to_token_budget(
        {"head": (head, float(have_h)), "tail": (tail, float(2 * have_t))},
        key_col="doc_id",
        token_col="n_toks",
        total_tokens=have_h + 2 * have_t,
    )
    return out.select("doc_id", "n_toks", "epoch", "source")


def _naive_first_fit_bins(docs, budget: int):
    """Independent naive replay of `pack_documents`' contract on a
    single doc_id-ordered stream: first-fit into open bins, a new bin
    when nothing fits, fullest bin closed past 64 open. Pure Python,
    shares no code with the operator — a genuine differential
    implementation."""
    open_bins: list[tuple[int, int]] = []  # (bin id, used tokens)
    next_bin = 0
    assign: dict[int, list[int]] = {}
    for doc_id, n in docs:
        placed = None
        for j, (b, used) in enumerate(open_bins):
            if used + n <= budget:
                open_bins[j] = (b, used + n)
                placed = b
                break
        if placed is None:
            placed = next_bin
            open_bins.append((next_bin, n))
            next_bin += 1
            if len(open_bins) > 64:
                open_bins.pop(
                    max(range(len(open_bins)), key=lambda k: open_bins[k][1])
                )
        assign.setdefault(placed, []).append(doc_id)
    return assign


def _ntok_ascii(text: str) -> int:
    """Python twin of token_count_ws / _SQL_NTOK with JVM-regex
    semantics: trim strips ASCII spaces, \\s is the ASCII class."""
    import re

    return len(re.split(r"[ \t\n\x0b\f\r]+", text.strip(" ")))


def _pack_and_concat_oracle() -> str:
    """Literal-VALUES oracle for pack_and_concat, computed at
    registration by an independent Python packer over each fixture.

    Round 4 (raw text surface) and round 5 (md5+length surface) both
    hash-mismatched at the driver while passing the identical local
    sim — and token_budget_mix, which shares _SQL_NTOK, passes at the
    driver, so per-doc token counts agree there. The remaining suspect
    was the DuckDB recursive-CTE first-fit replay
    (list_filter/list_transform/recursive UNION ALL — the most
    version-sensitive oracle surface in the registry). This oracle
    removes DuckDB recursion entirely: expected rows are inlined as
    literals keyed by SUM(length(text)), which distinguishes every
    fixture SF; an unknown corpus selects zero rows and fails loudly."""
    import hashlib
    import math

    import pyarrow.parquet as pq

    rows = []
    from d2d_spark.plans.registry import fixture_table_paths

    for _fixture_path in fixture_table_paths("documents"):
        try:
            t = pq.read_table(
                _fixture_path, columns=["doc_id", "text"]
            )
        except Exception:
            continue
        docs = sorted(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
        ntok = {i: _ntok_ascii(s) for i, s in docs}
        total = sum(ntok.values())
        budget = int(math.ceil(total / 50.0))
        assign = _naive_first_fit_bins([(i, ntok[i]) for i, _ in docs], budget)
        tag = sum(len(s) for _, s in docs)
        txt = dict(docs)
        for b, ids in assign.items():
            joined = "\n\n".join(txt[i] for i in ids)
            rows.append((
                tag, b,
                hashlib.md5(joined.encode("utf-8")).hexdigest(),
                len(joined),
                ",".join(str(i) for i in ids),
                len(ids),
                sum(ntok[i] for i in ids),
            ))
    if not rows:
        # no fixture readable at registration: a bare "VALUES )" would
        # be a parser error masquerading as an oracle bug — keep the
        # documented loud-zero-row failure shape with a sentinel tag
        # that can never equal a real SUM(length(text)) > 0
        rows = [(-1, 0, "", 0, "", 0, 0)]
    values = ",\n     ".join(
        f"({t}, {b}, '{m}', {ln}, '{csv}', {nd}, {nt})"
        for t, b, m, ln, csv, nd, nt in rows
    )
    return f"""
    WITH expected(sftag, bin_id, text_md5, text_len, doc_ids_csv, n_docs, n_tokens)
      AS (VALUES
     {values})
    SELECT CAST(bin_id AS BIGINT) AS bin_id, text_md5,
           CAST(text_len AS BIGINT) AS text_len, doc_ids_csv,
           CAST(n_docs AS BIGINT) AS n_docs, CAST(n_tokens AS BIGINT) AS n_tokens
    FROM expected
    WHERE sftag = (SELECT SUM(length(text)) FROM documents)
    """


@query(
    "pack_and_concat",
    oracle=_pack_and_concat_oracle,
    tags=("llm", "packing"),
)
def pack_and_concat(spark, sf_dir):
    """Sequence packing + bin materialization end-to-end: first-fit
    pack into ~50 bins (budget = ceil(total_tokens / 50) — both
    engines derive it identically), then concatenate each bin into
    one training sequence with its member ids and token total.

    Packed on ONE partition in doc_id order so the greedy first-fit
    stream — and therefore every bin id — is deterministic and the
    oracle can replay it exactly (a sequential recursive CTE carrying
    the open-bin load list). Production packs per partition with no
    single-partition funnel; per-partition semantics and the 64-bin
    eviction bound are pytest-checked.

    The oracle is a literal-VALUES table computed at registration by
    an independent pure-Python first-fit packer over the fixture
    (keyed per SF by SUM(length(text))) — see _pack_and_concat_oracle
    for why DuckDB recursion was removed. The concatenated payload is
    compared as (md5, length) per bin; the raw text equality stays
    pinned in pytest (tests/test_sampling.py)."""
    import math

    from d2d_spark.operators.sampling import concat_bins, pack_documents

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "text", X.token_count_ws(F.col("text")).alias("n_toks")
    )
    total = d.agg(F.sum("n_toks")).collect()[0][0]
    budget = int(math.ceil(total / 50.0))
    packed = pack_documents(d.repartition(1), "n_toks", budget=budget, sort_col="doc_id")
    out = concat_bins(
        packed, bin_col="bin_id", text_col="text", id_col="doc_id", tokens_col="n_toks"
    )
    return out.select(
        "bin_id",
        F.md5(F.col("text")).alias("text_md5"),
        F.length(F.col("text")).cast("bigint").alias("text_len"),
        F.array_join(F.transform("doc_ids", lambda x: x.cast("string")), ",").alias(
            "doc_ids_csv"
        ),
        "n_docs",
        "n_tokens",
    )


@query(
    "llm_pipeline_end_to_end",
    oracle=f"""
    WITH RECURSIVE
     scored AS MATERIALIZED (
       SELECT doc_id, lang, text,
              least(length(text)/500.0, 1.0) * 0.4
              + least(({_SQL_STOP}*1.0/{_SQL_NTOK}) / 0.05, 1.0) * 0.3
              + greatest(0.0, 1.0 - ({_SQL_PUNCT}) * 5) * 0.2
              + (CASE WHEN {_SQL_MWL} >= 3 AND {_SQL_MWL} <= 10 THEN 1.0 ELSE 0.5 END) * 0.1
                AS quality
       FROM documents),
     kept AS MATERIALIZED (SELECT * FROM scored WHERE quality >= 0.5),
     exact AS MATERIALIZED (
       SELECT k.* FROM kept k
       JOIN (SELECT md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp,
                    MIN(doc_id) AS keep_id
             FROM kept GROUP BY 1) e
       ON k.doc_id = e.keep_id),
     sh AS MATERIALIZED (SELECT doc_id, {_SQL_SHINGLES} AS s FROM exact),
     pairs AS MATERIALIZED (
       SELECT a.doc_id AS id_a, b.doc_id AS id_b
       FROM sh a, sh b
       WHERE a.doc_id < b.doc_id
         AND len(list_intersect(a.s, b.s))*1.0 / len(list_distinct(a.s || b.s)) >= 0.5),
     edges AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM pairs
               UNION SELECT id_b, id_a FROM pairs),
     reach(id, r) AS (
       SELECT src, src FROM edges
       UNION
       SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id),
     comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id),
     losers AS (SELECT id FROM comp WHERE id <> component),
     final AS (SELECT * FROM exact WHERE doc_id NOT IN (SELECT id FROM losers))
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(CAST(quality AS DECIMAL(18,6))) AS DOUBLE) AS sum_quality
    FROM final GROUP BY lang ORDER BY lang
    """,
    tags=("llm", "pipeline", "end-to-end"),
)
def llm_pipeline_end_to_end(spark, sf_dir):
    """The full training-data pipeline in one plan: quality filter ->
    exact dedup (min id per fingerprint) -> near-dup clustering
    (exact-Jaccard pairs + connected components) -> keep one
    representative per cluster -> per-language corpus stats. Every
    stage is an operator verified elsewhere; this query proves they
    COMPOSE, hash-checked end-to-end against the equivalent
    five-stage SQL (including recursive closure)."""
    from d2d_spark.operators.dedup import dedup_representatives, ngram_jaccard_pairs
    from d2d_spark.operators.dedup import exact_dedup

    d = _t(spark, sf_dir, "documents")
    scored = d.withColumn("quality", X.quality_score(F.col("text")))
    kept = scored.filter(F.col("quality") >= 0.5)
    keepers = exact_dedup(kept, "text", "doc_id").select("doc_id")
    exact = kept.join(keepers, "doc_id")
    pairs = ngram_jaccard_pairs(exact, "text", "doc_id", n=3, threshold=0.5)
    final = dedup_representatives(exact, pairs, "doc_id")
    return (
        final.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("quality").cast("decimal(18,6)")).cast("double").alias("sum_quality"),
        )
        .orderBy("lang")
    )


# word tokens shared by the NB classifier oracle: lowercase, split on
# non-alphanumeric runs, drop empties — lockstep with
# operators/classifier.word_tokens
_SQL_WTOKS = (
    r"list_filter(string_split_regex(lower(text), '[^\p{L}\p{N}]+'), x -> x <> '')"
)


@query(
    "nb_langid_documents",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, t.token
      FROM documents, unnest({_SQL_WTOKS}) AS t(token)
    ),
    tl AS (SELECT token, lang AS label, count(*) AS c FROM toks GROUP BY 1, 2),
    vocab AS (SELECT token FROM (SELECT token, sum(c) AS g FROM tl GROUP BY token)
              WHERE g >= 1 ORDER BY g DESC, token LIMIT 5000),
    nv AS (SELECT count(*) AS v FROM vocab),
    kept AS (SELECT tl.* FROM tl JOIN vocab USING (token)),
    tot AS (SELECT label, sum(c) AS tot FROM kept GROUP BY label),
    docs AS (SELECT lang AS label, count(*) AS ndl FROM documents GROUP BY 1),
    ndocs AS (SELECT count(*) AS n FROM documents),
    model AS (SELECT token, label, ln(c + 1.0) - ln(tot + 1.0 * v) AS loglik
              FROM kept JOIN tot USING (label) CROSS JOIN nv),
    meta AS (SELECT label,
                    ln(CAST(ndl AS DOUBLE)) - ln(CAST(n AS DOUBLE)) AS logprior,
                    ln(1.0) - ln(tot + 1.0 * v) AS flr
             FROM tot JOIN docs USING (label) CROSS JOIN nv CROSS JOIN ndocs),
    scored AS (
      SELECT toks.doc_id, meta.label, meta.logprior,
             CAST(SUM(CAST(coalesce(model.loglik, meta.flr) AS DECIMAL(28,14)))
                  AS DOUBLE) AS s
      FROM toks CROSS JOIN meta
           LEFT JOIN model ON model.token = toks.token AND model.label = meta.label
      GROUP BY 1, 2, 3
    ),
    best AS (SELECT doc_id, label AS predicted, logprior + s AS score,
                    ROW_NUMBER() OVER (PARTITION BY doc_id
                                       ORDER BY logprior + s DESC, label) AS rn
             FROM scored),
    fallback AS (SELECT label AS fb_label, logprior AS fb_score
                 FROM meta ORDER BY logprior DESC, label LIMIT 1)
    SELECT d.doc_id, d.lang,
           coalesce(b.predicted, f.fb_label) AS predicted,
           round(coalesce(b.score, f.fb_score), 6) AS logscore6
    FROM documents d
    LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (doc_id)
    CROSS JOIN fallback f
    """,
    tags=("llm", "classifier", "naive-bayes", "lang-id"),
)
def nb_langid_documents(spark, sf_dir):
    """Model-based language ID: train a multinomial Naive Bayes
    classifier (the SQL-expressible stand-in for the fastText models
    CCNet/GPT-3/RefinedWeb use for language/quality filtering) on the
    corpus's own (text, lang) labels and score every document. The
    full fit — vocabulary selection, smoothed likelihoods, priors,
    unseen floors — plus the argmax scoring pass is reproduced in SQL
    and hash-checked, including the exact-decimal score itself.
    Fixture texts are same-vocabulary word soup, so predictions hug
    the priors — the CHECK is that two independent engines fit and
    apply the identical model bit-for-bit. Zero-token documents take
    the majority-prior label on BOTH sides (the oracle's LEFT JOIN +
    fallback mirrors classify_self's coalesce), so a fixture regen
    with empty/punctuation-only texts can't desync the row counts."""
    from d2d_spark.operators.classifier import classify_self

    d = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    out = classify_self(
        d, "text", "lang", "doc_id", vocab_size=5000, min_count=1, alpha=1.0
    )
    return out.select(
        "doc_id", "lang", "predicted", F.round("logscore", 6).alias("logscore6")
    )


@query(
    "duplicate_span_strip_documents",
    oracle="""
    WITH w AS (
      SELECT doc_id, CAST(u.i - 1 AS INT) AS pos, substr(text, CAST(u.i AS INT), 25) AS g
      FROM documents, unnest(generate_series(1, greatest(length(text) - 24, 0))) AS u(i)
    ),
    m AS (SELECT doc_id, pos,
                 count(*) OVER (PARTITION BY g) AS n,
                 row_number() OVER (PARTITION BY g ORDER BY doc_id, pos) AS rn
          FROM w),
    dup AS (SELECT doc_id, pos FROM m WHERE n >= 2 AND rn > 1),
    isl AS (SELECT doc_id, pos,
                   CASE WHEN max(pos + 25) OVER (PARTITION BY doc_id ORDER BY pos
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                          OR pos > max(pos + 25) OVER (PARTITION BY doc_id ORDER BY pos
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                        THEN 1 ELSE 0 END AS ng
            FROM dup),
    grp AS (SELECT doc_id, pos, sum(ng) OVER (PARTITION BY doc_id ORDER BY pos) AS gid
            FROM isl),
    iv AS (SELECT doc_id, gid, min(pos) AS s, max(pos) + 25 AS e FROM grp GROUP BY 1, 2),
    seg AS (SELECT doc_id, s, e,
                   lag(e, 1, 0) OVER (PARTITION BY doc_id ORDER BY s) AS prev_e
            FROM iv),
    kept AS (SELECT d.doc_id, d.text AS orig,
                    coalesce(string_agg(substr(d.text, seg.prev_e + 1, seg.s - seg.prev_e),
                                        '' ORDER BY seg.s), '')
                    || substr(d.text, coalesce(max(seg.e), 0) + 1,
                              length(d.text) - coalesce(max(seg.e), 0)) AS text
             FROM documents d LEFT JOIN seg ON d.doc_id = seg.doc_id
             GROUP BY d.doc_id, d.text)
    SELECT doc_id, text,
           CAST(length(orig) - length(text) AS INT) AS n_dropped_chars
    FROM kept
    """,
    tags=("llm", "dedup", "substring", "exact-span"),
)
def duplicate_span_strip_documents(spark, sf_dir):
    """Substring-level exact dedup (Lee et al. 2022): every 25-char
    window repeated anywhere in the corpus keeps only its canonical
    first (doc, pos) occurrence; later copies are cut and the
    surviving segments stitched back. The oracle rebuilds the IDENTICAL
    cleaned text with substrings + window functions, so the hash pins
    window detection, ownership tie-breaks, interval merging, and the
    stitching itself."""
    from d2d_spark.operators.spans import strip_duplicate_spans

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = strip_duplicate_spans(d, "text", "doc_id", k=25)
    return out.select("doc_id", "text", F.col("n_dropped_chars").cast("int").alias("n_dropped_chars"))


@query(
    "url_normalize_documents",
    oracle=r"""
    WITH raw AS (
      SELECT doc_id, doc_id // 5 AS g, doc_id % 5 AS v, (doc_id // 5) % 7 AS p
      FROM documents),
    u AS (
      SELECT doc_id,
        CASE v
          WHEN 0 THEN 'http://www.data.example.com/docs/' || g || '?utm_source=feed&z=9&a=1&id=' || p
          WHEN 1 THEN 'http://data.example.com:80/docs/' || g || '?id=' || p || '&a=1&utm_campaign=x&z=9'
          WHEN 2 THEN 'HTTP://DATA.Example.COM/docs/' || g || '/?z=9&id=' || p || '&a=1'
          WHEN 3 THEN 'http://data.example.com/docs/' || g || '?a=1&id=' || p || '&z=9&fbclid=abc' || doc_id
          ELSE 'http://data.example.com/docs/' || g || '?id=' || p || '&z=9&a=1#sec-' || doc_id
        END AS url
      FROM raw),
    parts AS (
      SELECT doc_id, url,
        lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$', 1)) AS scheme,
        lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$', 2)) AS host0,
        regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$', 3) AS path0,
        regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$', 4) AS query0
      FROM u),
    q AS (
      SELECT doc_id,
        array_to_string(list_sort(list_filter(string_split(query0, '&'),
          x -> x <> ''
               AND NOT starts_with(lower(split_part(x, '=', 1)), 'utm_')
               AND lower(split_part(x, '=', 1)) NOT IN
                   ('fbclid', 'gclid', 'msclkid', 'mc_cid', 'mc_eid', 'ref'))), '&') AS qq,
        scheme,
        CASE WHEN scheme = 'http' THEN regexp_replace(host0, ':80$', '')
             WHEN scheme = 'https' THEN regexp_replace(host0, ':443$', '')
             ELSE host0 END AS host1,
        regexp_replace(path0, '/+$', '') AS path1
      FROM parts),
    norm AS (
      SELECT doc_id,
             scheme || '://' || regexp_replace(host1, '^www\.', '') || path1 ||
               CASE WHEN qq <> '' THEN '?' || qq ELSE '' END AS url_norm,
             regexp_replace(regexp_replace(lower(host1), '^www\.', ''), ':[0-9]+$', '') AS host
      FROM q)
    SELECT 'norm' AS leg, doc_id, url_norm, host FROM norm
    UNION ALL
    SELECT 'quota' AS leg, doc_id, url_norm, host
    FROM (SELECT *, row_number() OVER (PARTITION BY url_norm ORDER BY doc_id) AS rn
          FROM norm)
    WHERE rn <= 2
    """,
    tags=("llm", "url", "normalize", "crawl", "quota", "cap-per-key"),
)
def url_normalize_documents(spark, sf_dir):
    """URL canonicalization + per-key quota in one tagged result.

    norm leg — five deterministic messy renderings of the same
    logical URL (www prefix, default port, upper-cased host, trailing
    slash, shuffled/tracking query params, fragments) are built from
    doc_id and normalized; the oracle mirrors the construction AND
    the normalization, so the hash pins every rule — scheme/host
    case, port stripping, param filtering and sorting, fragment/slash
    removal. Five variants per group collapse to one canonical URL,
    the dedup key a crawl pipeline groups on.

    quota leg — `cap_per_key` over that canonical URL (at most 2 of
    the 5 variants survive per group, deterministic by doc_id): the
    per-domain/per-page quota of crawl pipelines, a running top-N per
    key that the oracle replays as a window rank."""
    from d2d_spark.functions.urls import normalize_url, url_host
    from d2d_spark.operators.sampling import cap_per_key

    d = _t(spark, sf_dir, "documents").select("doc_id")
    g = F.floor(F.col("doc_id") / 5).cast("bigint").cast("string")
    v = F.pmod("doc_id", F.lit(5))
    p = F.pmod(F.floor(F.col("doc_id") / 5).cast("bigint"), F.lit(7)).cast("string")
    did = F.col("doc_id").cast("string")
    url = (
        F.when(v == 0, F.concat(F.lit("http://www.data.example.com/docs/"), g,
                                F.lit("?utm_source=feed&z=9&a=1&id="), p))
        .when(v == 1, F.concat(F.lit("http://data.example.com:80/docs/"), g,
                               F.lit("?id="), p, F.lit("&a=1&utm_campaign=x&z=9")))
        .when(v == 2, F.concat(F.lit("HTTP://DATA.Example.COM/docs/"), g,
                               F.lit("/?z=9&id="), p, F.lit("&a=1")))
        .when(v == 3, F.concat(F.lit("http://data.example.com/docs/"), g,
                               F.lit("?a=1&id="), p, F.lit("&z=9&fbclid=abc"), did))
        .otherwise(F.concat(F.lit("http://data.example.com/docs/"), g,
                            F.lit("?id="), p, F.lit("&z=9&a=1#sec-"), did))
    )
    norm = d.select(
        "doc_id",
        normalize_url(url).alias("url_norm"),
        url_host(url).alias("host"),
    )
    quota = cap_per_key(norm, "url_norm", max_rows=2, order_col="doc_id")
    return norm.select(F.lit("norm").alias("leg"), "doc_id", "url_norm", "host").unionByName(
        quota.select(F.lit("quota").alias("leg"), "doc_id", "url_norm", "host")
    )
