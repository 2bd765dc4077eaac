"""TF-IDF / keyword / BM25 (operators/tfidf.py): DuckDB oracle for
the weights, hand-computed BM25, deterministic top-k."""

from __future__ import annotations

import math

import duckdb
import pytest

from d2d_spark.operators.tfidf import bm25_scores, tf_idf, top_keywords
from d2d_spark.session import read_table

from .conftest import SF_SMALL


def test_tf_idf_matches_duckdb_oracle(spark, sf_dir):
    got = {
        (r.doc_id, r.tok, r.tf, r.df, round(r.tfidf, 6))
        for r in tf_idf(
            read_table(spark, sf_dir, "documents"), "text", "doc_id"
        ).collect()
    }
    con = duckdb.connect()
    want = {
        (d, t, tf, df_, round(w, 6))
        for d, t, tf, df_, w in con.execute(
            f"""
            WITH docs AS (SELECT * FROM read_parquet('{SF_SMALL}/documents.parquet')),
            toks AS (SELECT doc_id,
                            unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
                     FROM docs),
            tc AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks
                   WHERE tok <> '' GROUP BY doc_id, tok),
            dfreq AS (SELECT tok, COUNT(*) AS df FROM tc GROUP BY tok),
            n AS (SELECT COUNT(DISTINCT doc_id) AS n FROM docs)
            SELECT tc.doc_id, tc.tok, tf, df,
                   tf * (ln((n + 1.0) / (df + 1.0)) + 1.0) AS tfidf
            FROM tc JOIN dfreq USING (tok), n
            """
        ).fetchall()
    }
    assert got == want and len(got) > 100


def _corpus(spark):
    docs = [
        (1, "apple banana apple cherry"),
        (2, "banana cherry cherry date"),
        (3, "apple apple apple elderberry"),
        (4, "fig grape fig"),
    ]
    return spark.createDataFrame(docs, "doc_id long, text string")


def test_top_keywords_deterministic_and_ranked(spark):
    kw = {r.doc_id: r.keywords for r in top_keywords(_corpus(spark), "text", "doc_id", k=2).collect()}
    # doc 3: 'apple' (tf 3, df 2) beats 'elderberry' (tf 1, df 1)?
    # tfidf(apple)=3*(ln(5/3)+1)=4.532, tfidf(elderberry)=1*(ln(5/2)+1)=1.916
    assert kw[3][0] == "apple" and kw[3][1] == "elderberry"
    # doc 4: fig (tf 2) before grape (tf 1)
    assert kw[4] == ["fig", "grape"]
    # tie-break by term name is deterministic across runs
    again = {r.doc_id: r.keywords for r in top_keywords(_corpus(spark), "text", "doc_id", k=2).collect()}
    assert kw == again


def test_min_df_drops_hapax_terms(spark):
    out = tf_idf(_corpus(spark), "text", "doc_id", min_df=2)
    toks = {r.tok for r in out.collect()}
    assert toks == {"apple", "banana", "cherry"}  # date/elderberry/fig/grape are df=1


def test_bm25_matches_hand_computation(spark):
    got = {r.doc_id: r.score for r in bm25_scores(
        _corpus(spark), "text", "doc_id", ["apple", "date"]
    ).collect()}
    # corpus stats: N=4, doc lengths 4,4,4,3, avgdl=3.75
    n, k1, b, avgdl = 4, 1.2, 0.75, 3.75

    def bm25(tf, df, dl):
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    want = {
        1: bm25(2, 2, 4),            # apple tf=2 in doc 1
        2: bm25(1, 1, 4),            # date tf=1 in doc 2
        3: bm25(3, 2, 4),            # apple tf=3 in doc 3
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12)
    # ranking: doc 3 (3x apple) above doc 1 (2x apple)
    assert got[3] > got[1]


def test_bm25_rejects_empty_query(spark):
    with pytest.raises(ValueError, match="query_terms"):
        bm25_scores(_corpus(spark), "text", "doc_id", [])


def test_bm25_empty_corpus_degrades_to_no_matches(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, None)], "doc_id long, text string"
    )
    out = bm25_scores(df, "text", "doc_id", ["anything"])
    assert out.count() == 0
    assert out.columns == ["doc_id", "score"]


def test_bm25_search_matches_python(spark):
    """Multi-query retrieval vs an independent Python BM25 with the
    same rounding discipline; ranks deterministic."""
    import math
    from collections import Counter

    from d2d_spark.operators.tfidf import bm25_search

    corpus = [
        (1, "the cat sat on the mat"),
        (2, "a dog chased the cat"),
        (3, "dogs and cats living together"),
        (4, "completely unrelated words here"),
        (5, "cat cat cat dog"),
        (6, ""),
    ]
    queries = [(100, "cat dog"), (200, "the mat"), (300, "zzz")]
    cdf = spark.createDataFrame(corpus, "doc_id long, text string")
    qdf = spark.createDataFrame(queries, "qid long, qtext string")
    out = bm25_search(cdf, qdf, "text", "doc_id", "qtext", "qid", k=3)
    got = {
        (r["query_id"], r["rank"]): (r["doc_id"], round(r["score"], 9))
        for r in out.collect()
    }

    k1, b = 1.2, 0.75
    toks = {i: [t for t in s.lower().split() if t] for i, s in corpus}
    tf = {i: Counter(ts) for i, ts in toks.items()}
    dl = {i: len(ts) for i, ts in toks.items() if ts}
    n = len(corpus)
    avgdl = sum(dl.values()) / len(dl)
    dfreq = Counter(t for i in tf for t in tf[i])

    def score(qtext, d):
        s = 0
        for t in set(qtext.lower().split()):
            if t not in tf[d] or d not in dl:
                continue
            idf = math.log(1.0 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            f = tf[d][t]
            c = idf * f * (k1 + 1.0) / (f + k1 * (1.0 - b + b * dl[d] / avgdl))
            s += round(c, 9)
        return round(s, 9)

    for qid, qtext in queries:
        want = sorted(
            ((d, score(qtext, d)) for d, _ in corpus if score(qtext, d) > 0),
            key=lambda x: (-x[1], x[0]),
        )[:3]
        for r, (d, sc) in enumerate(want, start=1):
            assert got[(qid, r)] == (d, sc), (qid, r)
        assert not any(q == qid and r > len(want) for q, r in got)

    import pytest as _pt

    with _pt.raises(ValueError, match="k must be"):
        bm25_search(cdf, qdf, "text", "doc_id", "qtext", "qid", k=0)
