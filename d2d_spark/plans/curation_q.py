"""Curation-cohort queries: HTML extraction + C4/Gopher cleaning,
count-min frequency estimation, random-projection reduction, Bloom
seen-set dedup, the GPT-3-style quality classifier, and the BPE ->
pack -> mix integration — the round-4 operator families, brought
inside the driver's 50-query correctness window.

Oracle conventions follow plans/llm.py: exact-by-construction
fixtures where an operator's internals are engine-specific (Bloom's
bitmap, the HTML fixture), literal-weight reproductions where the
math is portable (the projection matrix, the polynomial CMS hash
family), DECIMAL accumulation + terminal rounding wherever doubles
aggregate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from d2d_spark.functions.frames import local_frame

from d2d_spark.functions import text as X
from d2d_spark.plans.registry import query
from d2d_spark.session import read_table


def _t(spark, sf_dir, name):
    return read_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# HTML -> text -> C4 -> Gopher -> chunk, one cleaning pipeline
# ---------------------------------------------------------------------------

#: C4 line blocklist, kept in lockstep with functions/text._C4_BAD_PHRASES
_C4_PHRASES = ("javascript", "lorem ipsum", "terms of use", "privacy policy",
               "cookie policy", "uses cookies")

#: Gopher stopword list (functions/text.GOPHER_STOPWORDS)
_GOPHER_STOPS = "['the', 'be', 'to', 'of', 'and', 'that', 'have', 'with']"

# first text line, whitespace-normalized — the visible payload wrapped
# in markup on both sides
_SQL_FL = "trim(regexp_replace(string_split(text, chr(10))[1], ' +', ' ', 'g'))"

# the <p> line after extraction: payload + decoded-entity tail
_SQL_LINE2 = f"{_SQL_FL} || ' extra&more <ok>.'"

# expected html_to_text output of the constructed document
_SQL_EXTRACTED = (
    f"'Doc ' || doc_id || ' Doc ' || doc_id || ' heading' || chr(10) || {_SQL_LINE2}"
    " || chr(10) || 'Home' || chr(10) || 'About us'"
)

_SQL_C4_KEPT = (
    f"CASE WHEN len(list_filter(string_split_regex({_SQL_LINE2}, '\\s+'), w -> w <> '')) >= 5"
    + "".join(f" AND NOT contains(lower({_SQL_LINE2}), '{p}')" for p in _C4_PHRASES)
    + f" THEN {_SQL_LINE2} ELSE '' END"
)

_SQL_GOPHER_BITS = r"""
    (SELECT CAST(
        (CASE WHEN n BETWEEN 50 AND 100000 THEN 1 ELSE 0 END)
      + (CASE WHEN coalesce(mwl >= 3.0 AND mwl <= 10.0, false) THEN 2 ELSE 0 END)
      + (CASE WHEN coalesce(symbols / CAST(nullif(n, 0) AS DOUBLE) <= 0.1, false) THEN 4 ELSE 0 END)
      + (CASE WHEN coalesce(bullets / CAST(nullif(nlines, 0) AS DOUBLE) < 0.9, false) THEN 8 ELSE 0 END)
      + (CASE WHEN coalesce(ells / CAST(nullif(nlines, 0) AS DOUBLE) < 0.3, false) THEN 16 ELSE 0 END)
      + (CASE WHEN coalesce(alphas / CAST(nullif(n, 0) AS DOUBLE) >= 0.8, false) THEN 32 ELSE 0 END)
      + (CASE WHEN stops >= 2 THEN 64 ELSE 0 END)
      + (CASE WHEN n BETWEEN 50 AND 100000
               AND coalesce(mwl >= 3.0 AND mwl <= 10.0, false)
               AND coalesce(symbols / CAST(nullif(n, 0) AS DOUBLE) <= 0.1, false)
               AND coalesce(bullets / CAST(nullif(nlines, 0) AS DOUBLE) < 0.9, false)
               AND coalesce(ells / CAST(nullif(nlines, 0) AS DOUBLE) < 0.3, false)
               AND coalesce(alphas / CAST(nullif(n, 0) AS DOUBLE) >= 0.8, false)
               AND stops >= 2 THEN 128 ELSE 0 END)
      AS BIGINT)
     FROM (SELECT
         len(toks) AS n,
         list_sum(list_transform(toks, t -> length(t))) * 1.0 / len(toks) AS mwl,
         len(list_filter(toks, t -> contains(t, '#') OR contains(t, '...')))
           + (length(text) - length(replace(text, '…', ''))) AS symbols,
         len(lns) AS nlines,
         len(list_filter(lns, l -> regexp_matches(trim(l), '^([-*•]|[0-9]+[.)])'))) AS bullets,
         len(list_filter(lns, l -> regexp_matches(trim(l), '(\.\.\.|…)$'))) AS ells,
         len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]'))) AS alphas,
         len(list_distinct(list_intersect(list_transform(toks, t -> lower(t)),
    """ + _GOPHER_STOPS + r"""))) AS stops
       FROM (SELECT string_split_regex(trim(text), '\s+') AS toks,
                    list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)),
                                l -> l <> '') AS lns)))
"""


@query(
    "html_clean_gopher_chunk",
    oracle=f"""
    WITH slice AS (
      SELECT doc_id, text FROM documents
      WHERE doc_id % 4 = 0 AND regexp_matches(string_split(text, chr(10))[1], '^[a-z ]+$')
    )
    SELECT 'extract' AS leg, doc_id, CAST(NULL AS BIGINT) AS idx,
           {_SQL_EXTRACTED} AS txt, CAST(NULL AS BIGINT) AS num,
           round(least(12.0 / length({_SQL_EXTRACTED}), 1.0), 6) AS val
    FROM slice
    UNION ALL
    SELECT 'c4' AS leg, doc_id, CAST(NULL AS BIGINT), {_SQL_C4_KEPT},
           CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE)
    FROM slice
    UNION ALL
    SELECT 'gopher' AS leg, doc_id, CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
           {_SQL_GOPHER_BITS}, CAST(NULL AS DOUBLE)
    FROM slice
    UNION ALL
    SELECT 'chunk' AS leg, doc_id, CAST(u.s // 120 AS BIGINT) AS idx,
           substr(text, CAST(u.s + 1 AS INT), 150), CAST(NULL AS BIGINT),
           CAST(NULL AS DOUBLE)
    FROM slice, unnest(generate_series(0, greatest(length(text) - 31, 0), 120)) AS u(s)
    """,
    tags=("llm", "html", "extraction", "c4", "gopher", "quality", "chunking"),
)
def html_clean_gopher_chunk(spark, sf_dir):
    """The crawl-side cleaning pipeline end-to-end, hash-checked
    against intent (not merely self-consistency): each document's
    first line is wrapped in deterministic markup — title, a script
    block containing a literal '<', an h1, a paragraph with encoded
    entities, a nav list of anchors, a comment — and driven through
    the real operators; the oracle constructs the EXPECTED result of
    each stage directly, so the hash pins what extraction/cleaning
    must produce.

    extract leg — `html_to_text` (script/comment removal, block-break
    newlines, entity decoding incl. the &amp; ordering rule,
    whitespace normalization) plus `html_link_density` (the two nav
    anchors over the visible text, the jusText/Gopher boilerplate
    signal) rounded to 6.

    c4 leg — `c4_clean_lines` over the extracted text: the heading and
    nav lines drop (no terminal punctuation), the paragraph survives
    iff it clears the word-count/blocklist/brace rules, which the
    oracle re-evaluates on the same constructed line.

    gopher leg — all seven `gopher_quality_flags` rules plus
    `gopher_pass` on the raw document, packed into one bit vector so
    every rule's verdict on every document is hash-pinned.

    chunk leg — `chunk_documents` (150-char windows, 30 overlap) over
    the raw text: start arithmetic, overlap carry, and the cut itself
    replayed as generate_series + substr."""
    from d2d_spark.functions.html import html_link_density, html_to_text
    from d2d_spark.operators.sampling import chunk_documents

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.split(F.col("text"), r"\n")[0].rlike("^[a-z ]+$"))
        .filter(F.col("doc_id") % 4 == 0)
    )
    fl = F.trim(F.regexp_replace(F.split(F.col("text"), r"\n")[0], " +", " "))
    did = F.col("doc_id").cast("string")
    html = F.concat(
        F.lit("<html><head><title>Doc "), did,
        F.lit('</title><script type="text/javascript">var x = 1 < 2;</script>'
              "</head><body><h1>Doc "), did, F.lit(" heading</h1><p>"), fl,
        F.lit(' extra&amp;more &lt;ok&gt;.</p><ul><li><a href="/a">Home</a></li>'
              '<li><a href="/b">About us</a></li></ul><!-- note --></body></html>'),
    )
    nb = F.lit(None).cast("bigint")
    ns = F.lit(None).cast("string")
    nd = F.lit(None).cast("double")

    wrapped = d.select("doc_id", "text", html.alias("__html"))
    extract = wrapped.select(
        F.lit("extract").alias("leg"),
        "doc_id",
        nb.alias("idx"),
        html_to_text(F.col("__html")).alias("txt"),
        nb.alias("num"),
        F.round(html_link_density(F.col("__html")), 6).alias("val"),
    )
    c4 = wrapped.select(
        F.lit("c4").alias("leg"),
        "doc_id",
        nb.alias("idx"),
        X.c4_clean_lines(html_to_text(F.col("__html"))).alias("txt"),
        nb.alias("num"),
        nd.alias("val"),
    )
    flags = X.gopher_quality_flags(F.col("text"))
    bits = F.lit(0)
    for i, flag in enumerate(flags.values()):
        bits = bits + F.when(F.coalesce(flag, F.lit(False)), F.lit(1 << i)).otherwise(0)
    bits = bits + F.when(X.gopher_pass(F.col("text")), F.lit(128)).otherwise(0)
    gopher = d.select(
        F.lit("gopher").alias("leg"),
        "doc_id",
        nb.alias("idx"),
        ns.alias("txt"),
        bits.cast("bigint").alias("num"),
        nd.alias("val"),
    )
    chunks = chunk_documents(d, "text", "doc_id", max_chars=150, overlap=30).select(
        F.lit("chunk").alias("leg"),
        "doc_id",
        F.col("chunk_index").cast("bigint").alias("idx"),
        F.col("text").alias("txt"),
        nb.alias("num"),
        nd.alias("val"),
    )
    return extract.unionByName(c4).unionByName(gopher).unionByName(chunks)


# ---------------------------------------------------------------------------
# count-min sketch with a portable polynomial hash family
# ---------------------------------------------------------------------------

_CMS_DEPTH, _CMS_WIDTH, _CMS_P = 3, 64, 2147483647


def _cms_a(i: int) -> int:
    return 2654435761 + 40503 * i


def _cms_b(i: int) -> int:
    return 97 * i + 13


def _poly_hasher(col, i: int):
    """(k * A_i + B_i) mod P — reproducible in any engine, which is
    the point: the whole sketch (build, merge, lookup) becomes exact
    SQL. xxhash64 stays the production default."""
    return F.pmod(
        col.cast("bigint") * F.lit(_cms_a(i)) + F.lit(_cms_b(i)), F.lit(_CMS_P)
    )


def _sql_bucket(k: str, i: int) -> str:
    return f"(({k} * {_cms_a(i)} + {_cms_b(i)}) % {_CMS_P}) % {_CMS_WIDTH}"


# KMV sketch: row 3 of the same polynomial family, space = P, so the
# whole sketch (every kept hash) and the theta arithmetic reproduce
# exactly in SQL
_KMV_K, _KMV_I = 64, 3


def _kmv_poly(col):
    return F.pmod(
        col.cast("bigint") * F.lit(_cms_a(_KMV_I)) + F.lit(_cms_b(_KMV_I)),
        F.lit(_CMS_P),
    )


def _sql_kmv_h(k: str) -> str:
    return f"(({k}) * {_cms_a(_KMV_I)} + {_cms_b(_KMV_I)}) % {_CMS_P}"


@query(
    "countmin_freq_estimates",
    oracle=f"""
    WITH cnt AS (
      SELECT i AS row, bucket, count(*) AS c
      FROM (SELECT u.i,
                   CASE u.i
                     WHEN 0 THEN {_sql_bucket('o_custkey', 0)}
                     WHEN 1 THEN {_sql_bucket('o_custkey', 1)}
                     ELSE {_sql_bucket('o_custkey', 2)} END AS bucket
            FROM orders, unnest([0, 1, 2]) AS u(i))
      GROUP BY 1, 2
    ),
    probes AS (SELECT DISTINCT c_custkey AS k FROM customer),
    est AS (
      SELECT p.k, min(coalesce(cnt.c, 0)) AS e
      FROM (SELECT k, u.i,
                   CASE u.i
                     WHEN 0 THEN {_sql_bucket('k', 0)}
                     WHEN 1 THEN {_sql_bucket('k', 1)}
                     ELSE {_sql_bucket('k', 2)} END AS bucket
            FROM probes, unnest([0, 1, 2]) AS u(i)) p
      LEFT JOIN cnt ON cnt.row = p.i AND cnt.bucket = p.bucket
      GROUP BY p.k
    ),
    hh AS (
      SELECT o_custkey AS k, count(*) AS c FROM orders GROUP BY 1
      ORDER BY c DESC, k LIMIT 20
    ),
    kmvA AS (SELECT DISTINCT {_sql_kmv_h('o_custkey')} AS h
             FROM orders WHERE o_orderkey % 2 = 0 ORDER BY h LIMIT {_KMV_K}),
    kmvB AS (SELECT DISTINCT {_sql_kmv_h('o_custkey')} AS h
             FROM orders WHERE o_orderkey % 2 <> 0 ORDER BY h LIMIT {_KMV_K}),
    kmvU AS (SELECT DISTINCT {_sql_kmv_h('o_custkey')} AS h
             FROM orders ORDER BY h LIMIT {_KMV_K}),
    thA AS (SELECT CASE WHEN count(*) < {_KMV_K} THEN 1.0
                        ELSE CAST(max(h) AS DOUBLE) / {float(_CMS_P)} END AS th,
                   count(*) AS nk FROM kmvA),
    thB AS (SELECT CASE WHEN count(*) < {_KMV_K} THEN 1.0
                        ELSE CAST(max(h) AS DOUBLE) / {float(_CMS_P)} END AS th,
                   count(*) AS nk FROM kmvB),
    thMin AS (SELECT least(thA.th, thB.th) AS th FROM thA, thB),
    kmvEst AS (
      SELECT 0 AS i, round(CASE WHEN th >= 1.0 THEN CAST(nk AS DOUBLE)
                                ELSE {float(_KMV_K - 1)} / th END, 6) AS e FROM thA
      UNION ALL
      SELECT 1, round(CASE WHEN th >= 1.0 THEN CAST(nk AS DOUBLE)
                           ELSE {float(_KMV_K - 1)} / th END, 6) FROM thB
      UNION ALL
      SELECT 2, round(CAST((SELECT count(*) FROM kmvA
                            WHERE h IN (SELECT h FROM kmvB)
                              AND CAST(h AS DOUBLE) / {float(_CMS_P)} < (SELECT th FROM thMin))
                      AS DOUBLE) / (SELECT th FROM thMin), 6)
      UNION ALL
      SELECT 3, round(CAST((SELECT count(*) FROM kmvA
                            WHERE h NOT IN (SELECT h FROM kmvB)
                              AND CAST(h AS DOUBLE) / {float(_CMS_P)} < (SELECT th FROM thMin))
                      AS DOUBLE) / (SELECT th FROM thMin), 6)
    )
    SELECT 'counter' AS leg, row AS a, bucket AS b, c AS v,
           CAST(NULL AS DOUBLE) AS vd FROM cnt
    UNION ALL
    SELECT 'est' AS leg, k, CAST(NULL AS BIGINT), e, CAST(NULL AS DOUBLE) FROM est
    UNION ALL
    SELECT 'hh' AS leg, k, CAST(NULL AS BIGINT), c, CAST(NULL AS DOUBLE) FROM hh
    UNION ALL
    SELECT 'kmv_u' AS leg, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), h,
           CAST(NULL AS DOUBLE) FROM kmvU
    UNION ALL
    SELECT 'kmv_est' AS leg, i, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), e
    FROM kmvEst
    """,
    tags=("llm", "sketch", "count-min", "kmv", "theta", "heavy-hitters", "frequency"),
)
def countmin_freq_estimates(spark, sf_dir):
    """The frequency-estimation family end-to-end, exact in SQL via a
    pluggable polynomial hash family (the production default stays
    xxhash64; the family swap is itself part of the operator surface).

    counter leg — `cms_build` over each half of orders (split by
    order key parity) then `cms_merge`: counter linearity means the
    merged sketch must equal the combined build, and the oracle
    computes those combined counters directly — every cell of the
    sketch is hash-checked.

    est leg — `cms_lookup` probing every customer key (including
    customers with no orders, exercising the untouched-bucket -> 0
    path): min over the depth rows, never an undercount.

    hh leg — `heavy_hitters`: the EXACT top-20 keys by count with
    deterministic tie-breaks, the companion the sketch approximates
    past shuffle scale.

    kmv legs — the KMV/theta sketch (operators/kmv.py) under the same
    polynomial family: kmv_u hash-checks EVERY value of the lossless
    union of the two half-corpus sketches against the sketch of the
    whole (merge correctness, not just estimates); kmv_est checks the
    four theta-style estimates (|A|, |B|, |A∩B|, |A\\B|) to 6 decimals
    — the set-intersection capability HLL cannot provide."""
    from d2d_spark.operators.freq import cms_build, cms_lookup, cms_merge, heavy_hitters
    from d2d_spark.operators.kmv import (
        kmv_build,
        kmv_difference_estimate,
        kmv_estimate,
        kmv_intersect_estimate,
        kmv_union,
    )

    # r11 (guide §2.3/§5): five sketch builders (two CMS halves, the
    # exact heavy hitters, two KMV halves) scan the same two orders
    # columns — persist the projection once so they all read cache.
    from pyspark import StorageLevel as _SL

    from d2d_spark import cache as _oc

    o = _oc.register(
        "freq_suite",
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey")
        .persist(_SL.MEMORY_AND_DISK),
    )
    sk = cms_merge(
        cms_build(o.filter(F.col("o_orderkey") % 2 == 0), "o_custkey",
                  _CMS_DEPTH, _CMS_WIDTH, hasher=_poly_hasher),
        cms_build(o.filter(F.col("o_orderkey") % 2 != 0), "o_custkey",
                  _CMS_DEPTH, _CMS_WIDTH, hasher=_poly_hasher),
    )
    nb = F.lit(None).cast("bigint")
    nd = F.lit(None).cast("double")
    counter = sk.select(
        F.lit("counter").alias("leg"),
        F.col("row").cast("bigint").alias("a"),
        F.col("bucket").cast("bigint").alias("b"),
        F.col("c").cast("bigint").alias("v"),
        nd.alias("vd"),
    )
    c = _t(spark, sf_dir, "customer")
    est = cms_lookup(sk, c, "c_custkey", _CMS_DEPTH, _CMS_WIDTH, hasher=_poly_hasher).select(
        F.lit("est").alias("leg"),
        F.col("c_custkey").cast("bigint").alias("a"),
        nb.alias("b"),
        F.col("est_count").cast("bigint").alias("v"),
        nd.alias("vd"),
    )
    hh = heavy_hitters(o, "o_custkey", k=20).select(
        F.lit("hh").alias("leg"),
        F.col("o_custkey").cast("bigint").alias("a"),
        nb.alias("b"),
        F.col("cnt").cast("bigint").alias("v"),
        nd.alias("vd"),
    )
    ka = kmv_build(
        o.filter(F.col("o_orderkey") % 2 == 0), "o_custkey",
        k=_KMV_K, hasher=_kmv_poly, space=_CMS_P,
    )
    kb = kmv_build(
        o.filter(F.col("o_orderkey") % 2 != 0), "o_custkey",
        k=_KMV_K, hasher=_kmv_poly, space=_CMS_P,
    )
    kmv_u = kmv_union(ka, kb).select(
        F.lit("kmv_u").alias("leg"), nb.alias("a"), nb.alias("b"),
        F.col("h").cast("bigint").alias("v"), nd.alias("vd"),
    )
    ests = [
        kmv_estimate(ka, "e"), kmv_estimate(kb, "e"),
        kmv_intersect_estimate(ka, kb).withColumnRenamed("estimate", "e"),
        kmv_difference_estimate(ka, kb).withColumnRenamed("estimate", "e"),
    ]
    kmv_est = None
    for i, e in enumerate(ests):
        row = e.select(
            F.lit("kmv_est").alias("leg"), F.lit(i).cast("bigint").alias("a"),
            nb.alias("b"), nb.alias("v"), F.round("e", 6).alias("vd"),
        )
        kmv_est = row if kmv_est is None else kmv_est.unionByName(row)
    return (
        counter.unionByName(est).unionByName(hh)
        .unionByName(kmv_u).unionByName(kmv_est)
    )


# ---------------------------------------------------------------------------
# random-projection reduction with the literal seeded matrix
# ---------------------------------------------------------------------------

_RP_DIM, _RP_K, _RP_SEED = 64, 4, 0


def _rp_oracle() -> str:
    """The seeded Gaussian matrix, inlined as SQL literals: repr()
    round-trips float64 exactly, products are then single identical
    IEEE ops in both engines, and only the summation order differs —
    absorbed by rounding to 4 decimals (error ~1e-12 vs a 5e-5
    boundary)."""
    from d2d_spark.operators.reduce import random_projection_matrix

    W = random_projection_matrix(_RP_DIM, _RP_K, _RP_SEED)
    cols = []
    for j in range(_RP_K):
        lits = ", ".join(repr(float(x)) for x in W[j])
        cols.append(
            f"round(list_sum(list_transform(CAST(embedding AS DOUBLE[]), "
            f"(x, i) -> x * ([{lits}])[i])), 4) AS r{j}"
        )
    return "SELECT vec_id, " + ", ".join(cols) + " FROM embeddings"


@query(
    "embedding_reduce_project",
    oracle=_rp_oracle(),
    tags=("llm", "reduce", "random-projection", "jl", "embedding"),
)
def embedding_reduce_project(spark, sf_dir):
    """Random-projection dimensionality reduction (64 -> 4): the
    seeded Gaussian matrix IS the model, so the oracle inlines the
    same matrix as literals and replays the GEMM per vector — matrix
    generation, the Arrow-batched projection kernel, and column
    passthrough are all hash-checked. PCA shares the identical
    projection kernel and is pytest-checked against numpy exact
    (tests/test_reduce.py); the JL distance bound and determinism are
    pytest-pinned too."""
    from d2d_spark.operators.reduce import random_project

    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    out = random_project(e, "embedding", dim=_RP_DIM, k=_RP_K, seed=_RP_SEED)
    r = F.col("reduced")
    return out.select(
        "vec_id", *[F.round(r[j], 4).alias(f"r{j}") for j in range(_RP_K)]
    )


# ---------------------------------------------------------------------------
# Bloom seen-set dedup
# ---------------------------------------------------------------------------
@query(
    "bloom_seen_filter",
    oracle="""
    SELECT 'new' AS leg, doc_id FROM documents WHERE doc_id % 2 = 1
    UNION ALL
    SELECT 'seen' AS leg, doc_id FROM documents WHERE doc_id % 2 = 0
    """,
    tags=("llm", "dedup", "bloom", "seen-set", "crawl"),
)
def bloom_seen_filter(spark, sf_dir):
    """Bloom seen-set dedup: build the filter over the even-id half of
    the corpus (the 'previous crawl'), probe every document; the new
    leg keeps what a next crawl would ingest, the seen leg the
    maybe-duplicates.

    The oracle is the TRUE seen-set split, which the Bloom result
    equals exactly when no false positive fires: the filter is sized
    at fpp 1e-6 with ~16 hashes over a 2^20-bit map (~1e-23 realized
    per-probe fp rate at this fill), the operator is fully
    deterministic (keyed SipHash pair, no RNG), and the fixtures are
    fixed — verified collision-free at sf0.001/0.01/0.1 via
    crosscheck_sf. No-false-NEGATIVE is structural (a seen key can
    never probe clear), so the 'new' leg can never lose a row; the
    probabilistic side is pytest-pinned (fpp envelope, zero false
    negatives, union/serialize round-trips)."""
    from d2d_spark.operators.bloom import build_bloom, filter_seen

    d = _t(spark, sf_dir, "documents").withColumn("__k", F.col("doc_id").cast("string"))
    prior = build_bloom(
        d.filter(F.col("doc_id") % 2 == 0), "__k", expected_items=20_000, fpp=1e-6
    )
    new = filter_seen(d, prior, "__k", keep_seen=False).select(
        F.lit("new").alias("leg"), "doc_id"
    )
    seen = filter_seen(d, prior, "__k", keep_seen=True).select(
        F.lit("seen").alias("leg"), "doc_id"
    )
    return new.unionByName(seen)


# ---------------------------------------------------------------------------
# GPT-3-style seed-corpus quality scoring
# ---------------------------------------------------------------------------

# word tokens in lockstep with operators/classifier.word_tokens
_SQL_WTOKS = (
    r"list_filter(string_split_regex(lower(text), '[^\p{L}\p{N}]+'), x -> x <> '')"
)

# DSIR features in lockstep with operators/dsir._grams: whitespace
# tokens (functions/text.tokens_ws), not the classifier's word regex
_SQL_WTOKS_RAW = r"string_split_regex(trim(text), '\s+')"

_DSIR_B, _DSIR_N, _DSIR_SEED = 256, 20, 3

# logistic-regression legs (operators/logreg.py): same whitespace
# uni+bigram gram stream as DSIR (the dgrams CTE is shared), hashed
# into a smaller model under the same md5 family
_LR_B, _LR_ROUNDS, _LR_LR, _LR_REG = 64, 6, 0.5, 0.1


def _lr_cte_chain() -> str:
    """Unrolled-CTE replay of fit_logreg_hashed: one (z, g, w) CTE
    trio per full-batch GD round, every sum in exact DECIMAL — the
    PageRank precedent for oracling iterative algorithms. EVERY round
    CTE is AS MATERIALIZED or DuckDB inlines each level into the next
    (exponential blowup)."""
    decay = repr(1.0 - _LR_LR * _LR_REG)
    parts = [f"""
    lrdocy AS (SELECT doc_id, CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
               FROM documents),
    lrfeats AS MATERIALIZED (
      SELECT b.doc_id AS fid, b.bucket, 1.0 AS x, lrdocy.y
      FROM (SELECT DISTINCT doc_id,
                   CAST(('0x' || substr(md5(g), 1, 8)) AS BIGINT) % {_LR_B} AS bucket
            FROM dgrams) b JOIN lrdocy USING (doc_id)
      UNION ALL
      SELECT doc_id, -1, 1.0, y FROM lrdocy
    ),
    lrn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
    lrw0 AS (SELECT u.b AS bucket, 0.0 AS w
             FROM unnest(generate_series(-1, {_LR_B - 1})) AS u(b))"""]
    for t in range(1, _LR_ROUNDS + 1):
        parts.append(f"""
    lrz{t} AS MATERIALIZED (
      SELECT fid, max(y) AS y,
             CAST(SUM(CAST(x * w AS DECIMAL(28,14))) AS DOUBLE) AS z
      FROM lrfeats JOIN lrw{t - 1} USING (bucket) GROUP BY fid
    ),
    lrg{t} AS MATERIALIZED (
      SELECT bucket,
             CAST(SUM(CAST(x * (1.0 / (1.0 + exp(-z.z)) - z.y) AS DECIMAL(28,14)))
                  AS DOUBLE) / (SELECT n FROM lrn) AS g
      FROM lrfeats f JOIN lrz{t} z ON z.fid = f.fid GROUP BY bucket
    ),
    lrw{t} AS MATERIALIZED (
      SELECT w.bucket, w.w * {decay} - {_LR_LR!r} * coalesce(g.g, 0.0) AS w
      FROM lrw{t - 1} w LEFT JOIN lrg{t} g USING (bucket)
    )""")
    parts.append(f"""
    lrpfin AS MATERIALIZED (
      SELECT fid, CAST(SUM(CAST(x * w AS DECIMAL(28,14))) AS DOUBLE) AS z
      FROM lrfeats JOIN lrw{_LR_ROUNDS} USING (bucket) GROUP BY fid
    )""")
    return ",".join(parts)


@query(
    "gpt3_quality_score",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, t.token FROM documents, unnest({_SQL_WTOKS}) AS t(token)
    ),
    pairs AS (
      SELECT 'good' AS label, t.token
      FROM documents, unnest({_SQL_WTOKS}) AS t(token) WHERE lang = 'en'
      UNION ALL
      SELECT 'raw' AS label, token FROM toks
    ),
    tl AS (SELECT token, label, count(*) AS c FROM pairs GROUP BY 1, 2),
    vocab AS (SELECT token FROM (SELECT token, sum(c) AS g FROM tl GROUP BY token)
              WHERE g >= 1 ORDER BY g DESC, token LIMIT 5000),
    nv AS (SELECT count(*) AS v FROM vocab),
    kept AS (SELECT tl.* FROM tl JOIN vocab USING (token)),
    tot AS (SELECT label, sum(c) AS tot FROM kept GROUP BY label),
    mg AS (SELECT token, ln(c + 1.0) - ln(tot + 1.0 * v) AS ll
           FROM kept JOIN tot USING (label) CROSS JOIN nv WHERE label = 'good'),
    mr AS (SELECT token, ln(c + 1.0) - ln(tot + 1.0 * v) AS ll
           FROM kept JOIN tot USING (label) CROSS JOIN nv WHERE label = 'raw'),
    flr AS (SELECT
      (SELECT ln(1.0) - ln(tot + 1.0 * v) FROM tot CROSS JOIN nv WHERE label = 'good') AS fg,
      (SELECT ln(1.0) - ln(tot + 1.0 * v) FROM tot CROSS JOIN nv WHERE label = 'raw') AS fr),
    dcounts AS (SELECT count(*) FILTER (WHERE lang = 'en') AS ng, count(*) AS nr
                FROM documents),
    pri AS (SELECT (ln(CAST(ng AS DOUBLE)) - ln(CAST(ng + nr AS DOUBLE)))
                 - (ln(CAST(nr AS DOUBLE)) - ln(CAST(ng + nr AS DOUBLE))) AS pm
            FROM dcounts),
    marg AS (
      SELECT toks.doc_id,
             CAST(SUM(CAST(coalesce(mg.ll, flr.fg) - coalesce(mr.ll, flr.fr)
                           AS DECIMAL(28,14))) AS DOUBLE) / COUNT(*) AS m
      FROM toks LEFT JOIN mg USING (token) LEFT JOIN mr USING (token) CROSS JOIN flr
      GROUP BY 1
    ),
    dgrams AS MATERIALIZED (
      SELECT doc_id, u.g
      FROM (SELECT doc_id,
                   list_concat(toks, list_transform(range(1, len(toks)),
                                                    i -> toks[i] || ' ' || toks[i+1])) AS gs
            FROM (SELECT doc_id, {_SQL_WTOKS_RAW} AS toks FROM documents)),
           unnest(gs) AS u(g)
    ),
    dbuck AS MATERIALIZED (
      SELECT doc_id, CAST(('0x' || substr(md5(g), 1, 8)) AS BIGINT) % {_DSIR_B} AS b
      FROM dgrams
    ),
    allb AS (SELECT u.b FROM unnest(generate_series(0, {_DSIR_B - 1})) AS u(b)),
    tcnt AS (SELECT b, count(*) AS c FROM dbuck JOIN documents USING (doc_id)
             WHERE lang = 'en' GROUP BY b),
    ttot AS (SELECT coalesce(SUM(c), 0) AS t FROM tcnt),
    tmm AS (SELECT allb.b, ln(coalesce(tcnt.c, 0) + 1.0) - ln(ttot.t + {float(_DSIR_B)}) AS lt
            FROM allb LEFT JOIN tcnt USING (b) CROSS JOIN ttot),
    rcnt AS (SELECT b, count(*) AS c FROM dbuck GROUP BY b),
    rtot AS (SELECT SUM(c) AS t FROM rcnt),
    rmm AS (SELECT allb.b, ln(coalesce(rcnt.c, 0) + 1.0) - ln(rtot.t + {float(_DSIR_B)}) AS lr
            FROM allb LEFT JOIN rcnt USING (b) CROSS JOIN rtot),
    dw AS (
      SELECT doc_id, CAST(SUM(CAST(tmm.lt - rmm.lr AS DECIMAL(28,14))) AS DOUBLE) AS lw
      FROM dbuck JOIN tmm ON tmm.b = dbuck.b JOIN rmm ON rmm.b = dbuck.b
      GROUP BY doc_id
    ),
    gkeys AS (
      SELECT doc_id, lw + (-ln(-ln(
        (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#{_DSIR_SEED}'), 1, 8))
              AS BIGINT) % 1048576 + 0.5) / 1048576.0))) AS k
      FROM dw
    ),
    {_lr_cte_chain()},
    aucd AS (
      SELECT d.doc_id,
             round(1.0 / (1.0 + exp(-(coalesce(marg.m, 0.0) + pri.pm))), 6) AS v,
             CAST(d.lang = 'en' AS BIGINT) AS y
      FROM documents d LEFT JOIN marg USING (doc_id) CROSS JOIN pri
      WHERE d.lang IS NOT NULL),
    aucc AS (SELECT v, SUM(y) AS cp, COUNT(*) - SUM(y) AS cn FROM aucd GROUP BY v),
    aucw AS (SELECT cp, cn, cp + cn AS c,
                    SUM(cp + cn) OVER (ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             FROM aucc),
    auct AS (SELECT SUM(cp) AS np, SUM(cn) AS nn2 FROM aucc),
    aucs AS (SELECT SUM(CAST(cp AS HUGEINT) * (2 * (cum - c) + c + 1)) AS s2
             FROM aucw),
    isod AS (SELECT GREATEST(LEAST(CAST(FLOOR(v * 40.0) AS BIGINT), 39), 0) AS b, y
             FROM aucd),
    isoc AS (SELECT b, COUNT(*) AS w, SUM(y) AS p FROM isod GROUP BY b),
    isopre AS (SELECT b, w, p, SUM(w) OVER (ORDER BY b) AS cw,
                      SUM(p) OVER (ORDER BY b) AS cp3
               FROM isoc),
    isor AS (
      -- every contiguous bin block's positive rate: exact-int sums,
      -- ONE correctly-rounded double division — identical IEEE value
      -- to the operator's pooled p/w
      SELECT a.b AS j, c.b AS k,
             CAST(c.cp3 - (a.cp3 - a.p) AS DOUBLE)
             / CAST(c.cw - (a.cw - a.w) AS DOUBLE) AS r
      FROM isopre a JOIN isopre c ON a.b <= c.b),
    isomn AS (SELECT i.b AS b, r.j, MIN(r.r) AS mn
              FROM isoc i JOIN isor r ON r.j <= i.b AND r.k >= i.b
              GROUP BY i.b, r.j),
    isofit AS (SELECT b, MAX(mn) AS prob FROM isomn GROUP BY b),
    iapp AS (
      -- apply over the SAME corpus the model was fit on: every
      -- score's bin is present, so the floor lookup is its own bin
      SELECT a.doc_id, f.prob
      FROM (SELECT doc_id,
                   GREATEST(LEAST(CAST(FLOOR(v * 40.0) AS BIGINT), 39), 0) AS b
            FROM aucd) a
      JOIN isofit f USING (b))
    SELECT 'gpt3' AS leg, d.doc_id,
           round(1.0 / (1.0 + exp(-(coalesce(marg.m, 0.0) + pri.pm))), 6) AS val
    FROM documents d LEFT JOIN marg USING (doc_id) CROSS JOIN pri
    UNION ALL
    SELECT 'auc', CAST(NULL AS BIGINT),
           round(CAST(s2 - np * (np + 1) AS DOUBLE)
                 / CAST(2 * np * nn2 AS DOUBLE), 9)
    FROM aucs, auct
    UNION ALL
    SELECT 'auc_gini', CAST(NULL AS BIGINT),
           round(CAST(s2 - np * (np + 1) AS DOUBLE)
                 / CAST(2 * np * nn2 AS DOUBLE) * 2 - 1, 9)
    FROM aucs, auct
    UNION ALL
    SELECT 'auc_n', 1, CAST(np AS DOUBLE) FROM auct
    UNION ALL
    SELECT 'auc_n', 0, CAST(nn2 AS DOUBLE) FROM auct
    UNION ALL
    SELECT 'iso' AS leg, b, round(prob, 9) FROM isofit
    UNION ALL
    SELECT 'iso_n' AS leg, b, CAST(w AS DOUBLE) FROM isoc
    UNION ALL
    SELECT 'iso_apply' AS leg, doc_id, round(prob, 9) FROM iapp
    UNION ALL
    SELECT 'dsir_w' AS leg, doc_id, round(lw, 6) FROM dw
    UNION ALL
    SELECT 'dsir_pick' AS leg, doc_id, round(k, 6)
    FROM (SELECT doc_id, k FROM gkeys ORDER BY k DESC, doc_id LIMIT {_DSIR_N})
    UNION ALL
    SELECT 'lr_w' AS leg, bucket AS doc_id, round(w, 6) FROM lrw{_LR_ROUNDS}
    UNION ALL
    SELECT 'lr_p' AS leg, fid AS doc_id, round(1.0 / (1.0 + exp(-z)), 6) FROM lrpfin
    """,
    tags=(
        "llm", "classifier", "quality", "gpt3", "seed-corpus", "dsir",
        "resampling", "logreg",
    ),
)
def gpt3_quality_score(spark, sf_dir):
    """GPT-3-style quality scoring (Brown et al. 2020 §A): train a
    binary classifier to tell a trusted seed corpus (here the
    lang='en' slice) from the raw corpus itself, then score every raw
    document with the probability it looks like the seed. The FULL
    machinery — shared token explode, two-class NB fit with
    vocabulary selection and unseen floors, per-token margin with
    exact DECIMAL accumulation, prior margin, sigmoid squash — is
    reproduced in SQL and hash-checked to 6 decimals.
    contrast_fraction=1.0 makes the negative class the whole corpus,
    so no hash-sampling enters the hashed surface; the Pareto keep
    rule on top (`nb_quality_filter`) is derandomized through
    xxhash64 and stays pytest-checked.

    dsir legs — DSIR importance resampling (Xie et al. 2023) over the
    same target-vs-raw framing: dsir_w hash-checks every document's
    hashed-uni+bigram importance log-weight (two 256-bucket smoothed
    models, exact DECIMAL accumulation); dsir_pick hash-checks the
    Gumbel top-20 weighted sample itself — the md5-derandomized noise
    reproduces in SQL, so the oracle replays the exact selection.

    lr legs — trainable logistic regression over the same hashed
    gram features (`operators/logreg.py`, the fastText-shaped
    discriminative step up from NB): lr_w hash-checks the ENTIRE
    weight vector after the fixed full-batch GD rounds against an
    unrolled one-CTE-chain-per-round SQL replay (the PageRank
    precedent — exact DECIMAL sums make both engines' accumulation
    order-invariant), lr_p hash-checks every document's final sigmoid
    score. Labels are lang='en', the same gold-vs-raw framing.

    auc legs (r10 rotation) — stats.binary_auc scores the gpt3
    classifier itself (exact tie-aware Mann-Whitney AUC + gini + class
    counts) on the 6-dp-rounded probability surface the gpt3 leg
    already pins; the oracle replays the distributed rank-sum identity
    as a window cumsum over per-score class counts.

    iso legs (r11) — calibrate.isotonic_calibrate turns the same
    score surface into calibrated P(en | score): 40 fixed-width bins,
    driver-side PAV over the model-sized collapse; oracle = the
    minimax identity in SQL (max-of-min block rates), equal to PAV by
    the classical theorem and bit-equal here because every block rate
    is one correctly-rounded division of exact integers in both
    engines."""
    from d2d_spark.operators.classifier import nb_quality_score
    from d2d_spark.operators.dsir import (
        dsir_log_ratio,
        dsir_resample,
        fit_hashed_ngram_dist,
        hashed_ngram_features,
        md5_prefix_hasher,
    )
    from d2d_spark.operators.logreg import fit_logreg_hashed, score_logreg_hashed

    d = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    good = d.filter(F.col("lang") == "en").select("text")
    out = nb_quality_score(
        d, good, "text", "doc_id",
        contrast_fraction=1.0, vocab_size=5000, min_count=1, alpha=1.0,
        per_token=True,
    )
    gpt3 = out.select(
        F.lit("gpt3").alias("leg"), "doc_id",
        F.round("quality_prob", 6).alias("val"),
    )
    t_model = fit_hashed_ngram_dist(
        hashed_ngram_features(
            d.filter(F.col("lang") == "en"), "text", "doc_id", _DSIR_B, md5_prefix_hasher
        ),
        _DSIR_B,
    )
    r_model = fit_hashed_ngram_dist(
        hashed_ngram_features(d, "text", "doc_id", _DSIR_B, md5_prefix_hasher), _DSIR_B
    )
    lw = dsir_log_ratio(d, "text", "doc_id", t_model, r_model, _DSIR_B, md5_prefix_hasher)
    dsir_w = lw.select(
        F.lit("dsir_w").alias("leg"), "doc_id", F.round("log_weight", 6).alias("val")
    )
    picked = dsir_resample(lw, "doc_id", _DSIR_N, seed=_DSIR_SEED)
    dsir_pick = picked.select(
        F.lit("dsir_pick").alias("leg"), "doc_id", F.round("gumbel_key", 6).alias("val")
    )
    labeled = d.withColumn(
        "__y", F.when(F.col("lang") == "en", F.lit(1.0)).otherwise(F.lit(0.0))
    )
    wts = fit_logreg_hashed(
        labeled, "text", "__y", "doc_id",
        n_buckets=_LR_B, rounds=_LR_ROUNDS, lr=_LR_LR, reg=_LR_REG,
        hasher=md5_prefix_hasher, feature_partitions=16,
    )
    lr_w = wts.select(
        F.lit("lr_w").alias("leg"), F.col("bucket").alias("doc_id"),
        F.round("w", 6).alias("val"),
    )
    probs = score_logreg_hashed(
        d, "text", "doc_id", wts, n_buckets=_LR_B, hasher=md5_prefix_hasher
    )
    lr_p = probs.select(
        F.lit("lr_p").alias("leg"), "doc_id", F.round("prob", 6).alias("val")
    )
    # auc legs (r10 rotation): stats.binary_auc — the exact tie-aware
    # ROC-AUC of the gpt3 quality score at separating the en seed from
    # the rest, ON THE 6-DP-ROUNDED score: the rounded surface is
    # already proven bit-identical across engines by the gpt3 leg, and
    # rounding induces genuine ties so the Mann-Whitney tie handling is
    # exercised, not just covered. The oracle replays the rank-sum
    # identity on its own score CTE (window cumsum + HUGEINT products +
    # ONE exact-integer division, both operands < 2^53 at any fixture
    # SF so the double division is the correctly-rounded exact ratio
    # on both engines).
    from d2d_spark.operators.stats import binary_auc

    aucdoc = (
        out.select("doc_id", "quality_prob")
        .join(d.select("doc_id", "lang"), "doc_id")
        .filter(F.col("lang").isNotNull())
        .select(
            "doc_id",
            (F.col("lang") == "en").alias("y"),
            F.round("quality_prob", 6).alias("s"),
        )
    )
    aucdf = aucdoc.select("y", "s")
    a = binary_auc(aucdf, "y", "s")
    auc_rows = [
        ("auc", None, round(a["auc"], 9)),
        ("auc_gini", None, round(a["gini"], 9)),
        ("auc_n", 1, float(a["n_pos"])),
        ("auc_n", 0, float(a["n_neg"])),
    ]
    auc_leg = local_frame(spark, auc_rows, "leg string, doc_id long, val double")
    # iso legs (r11, VERDICT r10 #7): calibrate.isotonic_calibrate
    # over the same rounded score surface — 40 fixed-width bins on
    # [0, 1], PAV pooled positive rates (exact-int pools, one double
    # division each). The oracle replays the minimax identity
    # fit(i) = max_{j<=i} min_{k>=i} rate(j..k) in O(bins^3) SQL —
    # a structurally DIFFERENT algorithm whose equality with PAV is
    # the textbook theorem (test_calibrate pins it on exact
    # Fractions); iso_n pins the bin occupancy; iso_apply pins the
    # serving path (apply_isotonic's floor lookup) per doc — on the
    # fit corpus every score's bin is present, so the oracle is one
    # bin equi-join.
    from d2d_spark.operators.calibrate import isotonic_calibrate

    iso_model = isotonic_calibrate(aucdf, "y", "s", num_bins=40, lo=0.0, hi=1.0)
    iso_leg = iso_model.select(
        F.lit("iso").alias("leg"),
        F.col("bin").alias("doc_id"),
        F.round("prob", 9).alias("val"),
    )
    iso_n = iso_model.select(
        F.lit("iso_n").alias("leg"),
        F.col("bin").alias("doc_id"),
        F.col("n").cast("double").alias("val"),
    )
    # iso_apply: calibrate.apply_isotonic over the fit corpus itself
    # (one-row boundary-array broadcast + floor lookup — the map-only
    # serving path), so the apply semantics are driver-pinned too
    from d2d_spark.operators.calibrate import apply_isotonic

    iso_apply = apply_isotonic(aucdoc, "s", iso_model, "calibrated").select(
        F.lit("iso_apply").alias("leg"),
        "doc_id",
        F.round("calibrated", 9).alias("val"),
    )
    return (
        gpt3.unionByName(dsir_w).unionByName(dsir_pick)
        .unionByName(lr_w).unionByName(lr_p).unionByName(auc_leg)
        .unionByName(iso_leg).unionByName(iso_n).unionByName(iso_apply)
    )


# ---------------------------------------------------------------------------
# BPE -> pack -> mix integration. The learned merge table is not
# SQL-expressible, so the oracle is a literal-VALUES table computed at
# registration by an INDEPENDENT naive Python BPE + first-fit replay
# over each fixture (same recipe as pack_and_concat's oracle): a
# genuine differential check — quadratic trainer, rank-order
# exhaustive encoder, no code shared with operators/bpe.py — keyed per
# SF by SUM(length(text)); an unknown corpus selects zero rows.
# ---------------------------------------------------------------------------
def _naive_bpe_merges(freqs, n_merges):
    """Quadratic reference BPE trainer (rescans every word per round;
    ties broken max count then lexicographically smallest pair) —
    mirrors tests/test_bpe.py's reference, independent of the indexed
    trainer in operators/bpe.py."""
    from collections import Counter

    words = [[list(w), c] for w, c in freqs]
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for syms, c in words:
            for p in zip(syms, syms[1:]):
                pc[p] += c
        cands = [(c, p) for p, c in pc.items() if c >= 2]
        if not cands:
            break
        best_c = max(c for c, _ in cands)
        pair = min(p for c, p in cands if c == best_c)
        merges.append(pair)
        for rec in words:
            syms = rec[0]
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and (syms[j], syms[j + 1]) == pair:
                    out.append(pair[0] + pair[1])
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            rec[0] = out
    return merges


def _naive_bpe_token_count(word, merges):
    syms = list(word)
    for pair in merges:  # rank order, each applied exhaustively
        out, j = [], 0
        while j < len(syms):
            if j + 1 < len(syms) and (syms[j], syms[j + 1]) == pair:
                out.append(pair[0] + pair[1])
                j += 2
            else:
                out.append(syms[j])
                j += 1
        syms = out
    return len(syms)


_UNI_VOCAB, _UNI_TOPW, _UNI_ITERS = 300, 5_000, 2
_UNI_MAXLEN, _UNI_SEEDMULT = 12, 4
_UNI_FLOOR = -30.0  # unknown-char log-prob floor (documented contract)


def _naive_uni_viterbi(word, logp, max_len):
    """Independent max-likelihood segmenter implementing the
    documented contract of operators/unigram_tok (module docstring):
    higher total logp, then fewer pieces, then the lexicographically
    smaller piece ending at each position; unknown single chars take
    the floor. No code shared with the operator's _viterbi — a
    length-major candidate scan with an explicit key min(), against
    its j-major loop with incremental compares."""
    n = len(word)
    best = [None] * (n + 1)  # (score, n_pieces, last_piece)
    best[0] = (0.0, 0, "")
    for i in range(1, n + 1):
        keys = []
        for ln in range(1, min(max_len, i) + 1):
            prev = best[i - ln]
            if prev is None:
                continue
            piece = word[i - ln : i]
            lp = logp.get(piece, _UNI_FLOOR if ln == 1 else None)
            if lp is None:
                continue
            keys.append((-(prev[0] + lp), prev[1] + 1, piece))
        if keys:
            negs, cnt, piece = min(keys)
            best[i] = (-negs, cnt, piece)
    pieces = []
    i = n
    while i > 0:
        p = best[i][2]
        pieces.append(p)
        i -= len(p)
    pieces.reverse()
    return pieces


def _naive_uni_train(freqs, vocab_size, max_len=_UNI_MAXLEN, seed_mult=_UNI_SEEDMULT,
                     n_iters=_UNI_ITERS):
    """Independent replay of the unigram trainer's documented contract
    (seed = frequency-weighted substring counts top vocab*mult plus
    every char; hard-EM Viterbi counts; prune to vocab keeping chars;
    final renormalize summed in sorted piece order). Plain dicts, no
    imports from operators/unigram_tok."""
    import math

    chars = set()
    sub_counts = {}
    for w, c in freqs:
        chars.update(w)
        for i in range(len(w)):
            for j in range(i + 1, min(i + max_len, len(w)) + 1):
                s = w[i:j]
                sub_counts[s] = sub_counts.get(s, 0) + c
    n_seed = max(vocab_size * seed_mult, len(chars))
    by_rank = sorted(sub_counts.items(), key=lambda kv: (-kv[1], kv[0]))
    seed = {p for p, _ in by_rank[:n_seed]} | chars
    total = sum(sub_counts[p] for p in seed)
    logp = {p: math.log(sub_counts[p] / total) for p in seed}
    for _ in range(n_iters):
        used = {}
        for w, c in freqs:
            for piece in _naive_uni_viterbi(w, logp, max_len):
                used[piece] = used.get(piece, 0) + c
        kept = {p: n for p, n in used.items() if p in logp}
        for ch in chars:
            kept.setdefault(ch, 1)
        tot = sum(kept.values())
        logp = {p: math.log(n / tot) for p, n in kept.items()}
        if len(logp) > vocab_size:
            ranked = sorted(logp.items(), key=lambda kv: (-kv[1], kv[0]))
            pruned = dict(ranked[:vocab_size])
            for ch in chars:
                pruned.setdefault(ch, logp[ch])
            logp = pruned
    z = math.log(sum(math.exp(lp) for _, lp in sorted(logp.items())))
    return {p: lp - z for p, lp in sorted(logp.items())}


_WP_MERGES, _WP_TOPW = 120, 5_000


def _naive_wp_train(freqs, n_merges, min_pair=2):
    """Independent WordPiece trainer twin for the oracle: recounts
    EVERY pair and symbol from scratch each round (the operator keeps
    an incremental pair->words index — zero shared code, the
    _naive_bpe_merges standard). Winner = max count(ab)/(count(a)*
    count(b)) compared by exact integer cross-products, ties to the
    lexicographically smallest pair; returns the vocab list."""
    words = [[w[0]] + ["##" + ch for ch in w[1:]] for w, _ in freqs if w]
    cnts = [c for w, c in freqs if w]
    vocab = sorted({s for syms in words for s in syms})
    for _ in range(n_merges):
        pc: dict = {}
        sc: dict = {}
        for syms, c in zip(words, cnts):
            for s in syms:
                sc[s] = sc.get(s, 0) + c
            for p in zip(syms, syms[1:]):
                pc[p] = pc.get(p, 0) + c
        best = None
        best_n, best_d = 0, 1
        for p in sorted(pc):
            n = pc[p]
            if n < min_pair:
                continue
            d = sc[p[0]] * sc[p[1]]
            if best is None or n * best_d > best_n * d:
                best, best_n, best_d = p, n, d
        if best is None:
            break
        a, b = best
        new = a + (b[2:] if b.startswith("##") else b)
        vocab.append(new)
        for i, syms in enumerate(words):
            out = []
            j = 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                    out.append(new)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = out
    return vocab


def _naive_wp_encode(word, vocab, unk="[UNK]", max_chars=100):
    """Greedy longest-match-first with ## continuations and whole-word
    [UNK] fallback — a for/else scan, independent of the operator's
    while-walk."""
    if not word:
        return []
    if len(word) > max_chars:
        return [unk]
    out, start = [], 0
    while start < len(word):
        for end in range(len(word), start, -1):
            cand = word[start:end]
            if start:
                cand = "##" + cand
            if cand in vocab:
                out.append(cand)
                start = end
                break
        else:
            return [unk]
    return out


def _bpe_pack_mix_oracle() -> str:
    import math
    import re
    from collections import Counter

    import pyarrow.parquet as pq

    from d2d_spark.operators.bpe import PRETOKEN_RE
    from d2d_spark.plans.llm import _naive_first_fit_bins

    pat = re.compile(PRETOKEN_RE)
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
        pretoks = {i: pat.findall(s) for i, s in docs}
        wf = Counter()
        for toks in pretoks.values():
            wf.update(toks)
        freqs = sorted(wf.items(), key=lambda kv: (-kv[1], kv[0]))[:10_000]
        merges = _naive_bpe_merges(freqs, 100)
        wlen: dict[str, int] = {}
        ntok = {}
        for i, toks in pretoks.items():
            n = 0
            for w in toks:
                got = wlen.get(w)
                if got is None:
                    got = _naive_bpe_token_count(w, merges)
                    wlen[w] = got
                n += got
            ntok[i] = n
        tag = sum(len(s) for _, s in docs)
        total = sum(ntok.values())
        budget = int(math.ceil(total / 20.0))
        assign = _naive_first_fit_bins([(i, ntok[i]) for i, _ in docs], budget)
        for b, ids in assign.items():
            rows.append((tag, "bin", str(b), len(ids), sum(ntok[i] for i in ids)))
        head = [i for i, _ in docs if i % 3 == 0]
        tail = [i for i, _ in docs if i % 3 != 0]
        rows.append((tag, "mix", "head#0", len(head), sum(ntok[i] for i in head)))
        for e in (0, 1):
            rows.append((tag, "mix", f"tail#{e}", len(tail), sum(ntok[i] for i in tail)))
        # unigram leg: INDEPENDENT Python replay of the distributed
        # train+encode — word table via Counter (the word_frequencies
        # contract: count desc, word asc, top N), then the naive
        # trainer/Viterbi twins above (plain dicts, length-major
        # candidate scan — zero code shared with
        # operators/unigram_tok, the _naive_bpe_merges/_py_winnow
        # standard), Viterbi pieces digested per doc
        import hashlib

        ufreqs = sorted(wf.items(), key=lambda kv: (-kv[1], kv[0]))[:_UNI_TOPW]
        ulogp = _naive_uni_train(ufreqs, _UNI_VOCAB)
        umax = max(len(p) for p in ulogp)
        for i, toks in pretoks.items():
            if i % 40:
                continue
            pieces = [p for w in toks for p in _naive_uni_viterbi(w, ulogp, umax)]
            digest = int(
                hashlib.md5("\x01".join(pieces).encode("utf-8")).hexdigest()[:15], 16
            )
            rows.append((tag, "unigram", str(i), len(pieces), digest))
        # wordpiece leg: INDEPENDENT replay of the THIRD tokenizer
        # family — same bounded word table, the naive likelihood-score
        # trainer + greedy longest-match encoder above (recount-from-
        # scratch loop, zero code shared with operators/wordpiece)
        wfreqs = sorted(wf.items(), key=lambda kv: (-kv[1], kv[0]))[:_WP_TOPW]
        wvocab = set(_naive_wp_train(wfreqs, _WP_MERGES))
        for i, toks in pretoks.items():
            if i % 40 != 20:
                continue
            pieces = [p for w in toks for p in _naive_wp_encode(w, wvocab)]
            digest = int(
                hashlib.md5("\x01".join(pieces).encode("utf-8")).hexdigest()[:15], 16
            )
            rows.append((tag, "wordpiece", str(i), len(pieces), digest))
    if not rows:
        # no fixture readable at registration: keep the SQL parseable
        # and the failure shape the documented loud zero-row mismatch
        # (sentinel tag never equals a real SUM(length(text)) > 0)
        rows = [(-1, "", "", 0, 0)]
    values = ",\n     ".join(
        f"({t}, '{leg}', '{k}', {n}, {tok})" for t, leg, k, n, tok in rows
    )
    return f"""
    WITH expected(sftag, leg, k, n, tok) AS (VALUES
     {values})
    SELECT leg, k, CAST(n AS BIGINT) AS n, CAST(tok AS BIGINT) AS tok
    FROM expected
    WHERE sftag = (SELECT SUM(length(text)) FROM documents)
    """


@query(
    "bpe_pack_mix_pipeline",
    oracle=_bpe_pack_mix_oracle,
    tags=("llm", "bpe", "tokenizer", "packing", "mixing", "integration"),
)
def bpe_pack_mix_pipeline(spark, sf_dir):
    """The tokenizer composed with the mixture machinery end-to-end
    over REAL subword counts: train BPE on the corpus (one distributed
    frequency aggregate + the driver merge loop), encode every
    document (Arrow-batched, merge ranks in the closure), then (a)
    first-fit pack documents into ~20 token-budget bins and (b) mix a
    head/tail split to exact 1x/2x epoch targets using the exact BPE
    token counts instead of the whitespace proxy. Output is the bin
    inventory plus per-(source, epoch) token totals — deterministic,
    bounded, and stable across partitionings. The learned merge table
    is not SQL-expressible, so the oracle is literal VALUES computed
    at registration by the independent naive BPE + first-fit replay
    above; train/encode equivalence to the naive reference and the
    packing waste bound are additionally pytest-pinned."""
    import math

    from d2d_spark.operators.bpe import (
        bpe_encode,
        train_bpe_from_frequencies,
        word_frequencies,
    )
    from d2d_spark.operators.sampling import mix_to_token_budget, pack_documents

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    # ONE corpus word-frequency aggregate feeds all THREE tokenizer
    # trainings (the table is (count desc, word asc)-sorted, so the
    # top-N prefix of the top-10k table IS the direct top-N table)
    wf_tbl = word_frequencies(d, "text", top_words=10_000)
    merges = train_bpe_from_frequencies(wf_tbl, 100)
    from pyspark import StorageLevel

    from d2d_spark import cache as opcache

    # r11 (guide §5 caching + §2.4): the Arrow BPE encode of the WHOLE
    # corpus used to recompute for every consumer — the budget sum,
    # the pack stream, the head/tail sums, mix's internal token
    # inventory and the final union action (~8 full encode passes per
    # run). Persist it once; the fused aggregate below is the eager
    # fill. Results are unchanged: same lazy plan, one materialization.
    enc = opcache.register(
        "bpe_suite",
        bpe_encode(d, "text", merges, out_col="bpe", count_col="n_tok")
        .select("doc_id", "text", F.col("n_tok").cast("bigint").alias("n_tok"))
        .persist(StorageLevel.MEMORY_AND_DISK),
    )
    # ONE job for the three scalar sums (total / head / tail): bigint
    # sums of disjoint conditional slices are bit-identical to the
    # three separate aggregates this replaces, and the job doubles as
    # the cache fill
    is_head = F.col("doc_id") % 3 == 0
    sums = enc.agg(
        F.sum("n_tok").alias("tot"),
        F.sum(F.when(is_head, F.col("n_tok"))).alias("h"),
        F.sum(F.when(~is_head, F.col("n_tok"))).alias("t"),
    ).collect()[0]
    total, have_h, have_t = sums["tot"], sums["h"], sums["t"]
    budget = int(math.ceil(total / 20.0))
    packed = pack_documents(enc.repartition(1), "n_tok", budget=budget, sort_col="doc_id")
    bins = packed.groupBy("bin_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_tok").alias("tok")
    ).select(
        F.lit("bin").alias("leg"),
        F.col("bin_id").cast("string").alias("k"),
        "n",
        "tok",
    )
    head = enc.filter(is_head)
    tail = enc.filter(~is_head)
    mixed = mix_to_token_budget(
        {"head": (head, float(have_h)), "tail": (tail, float(2 * have_t))},
        key_col="doc_id",
        token_col="n_tok",
        total_tokens=have_h + 2 * have_t,
    )
    mix_leg = mixed.groupBy("source", "epoch").agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_tok").alias("tok")
    ).select(
        F.lit("mix").alias("leg"),
        F.concat_ws("#", "source", F.col("epoch").cast("string")).alias("k"),
        "n",
        "tok",
    )
    # unigram leg: the SECOND tokenizer family through the same
    # distributed plumbing — Spark word-frequency aggregate feeds the
    # pure-Python Viterbi-EM trainer, Arrow encode segments a doc
    # subset, and the piece streams are pinned per doc by count +
    # md5-prefix digest against the registration-time Python replay
    # (trainer equivalence itself is pytest-pinned; this leg checks
    # the distributed aggregate + encode cross-engine)
    from d2d_spark.operators.unigram_tok import (
        train_unigram_from_frequencies,
        unigram_encode,
    )

    um = train_unigram_from_frequencies(
        wf_tbl[:_UNI_TOPW], vocab_size=_UNI_VOCAB, n_iters=_UNI_ITERS
    )
    uenc = unigram_encode(d.filter(F.col("doc_id") % 40 == 0), "text", um)
    uni_leg = uenc.select(
        F.lit("unigram").alias("leg"),
        F.col("doc_id").cast("string").alias("k"),
        F.size("pieces").cast("bigint").alias("n"),
        F.conv(
            F.substring(F.md5(F.concat_ws("\x01", "pieces")), 1, 15), 16, 10
        )
        .cast("bigint")
        .alias("tok"),
    )
    # wordpiece leg: the THIRD tokenizer family through the same
    # distributed plumbing — likelihood-score merges over the shared
    # word table, greedy longest-match Arrow encode over a disjoint
    # doc subset, pinned per doc by piece count + md5-prefix digest
    # against the registration-time naive replay
    from d2d_spark.operators.wordpiece import (
        train_wordpiece_from_frequencies,
        wordpiece_encode,
    )

    wpm = train_wordpiece_from_frequencies(wf_tbl[:_WP_TOPW], n_merges=_WP_MERGES)
    wenc = wordpiece_encode(
        d.filter(F.col("doc_id") % 40 == 20), "text", wpm, out_col="wp", count_col=None
    )
    wp_leg = wenc.select(
        F.lit("wordpiece").alias("leg"),
        F.col("doc_id").cast("string").alias("k"),
        F.size("wp").cast("bigint").alias("n"),
        F.conv(F.substring(F.md5(F.concat_ws("\x01", "wp")), 1, 15), 16, 10)
        .cast("bigint")
        .alias("tok"),
    )
    return bins.unionByName(mix_leg).unionByName(uni_leg).unionByName(wp_leg)
