"""TF-IDF term weighting, per-document keyword extraction, and BM25
relevance scoring over the corpus — the classic lexical statistics a
curation pipeline needs next to dedup (boilerplate terms score near
zero, document-distinctive terms float to the top) and the baseline
ranking function for corpus search.

Spark shape (all JVM-side, no Python in the hot path):

  tokenize -> explode -> per-(doc, term) counts  [one shuffle]
           -> term document-frequency agg        [one shuffle, vocab-sized]
           -> join counts to df                  [AQE broadcasts the
                                                  vocab side when small]
  corpus size N is a scalar aggregate (one number to the driver).

At 100 TB: the explode is linear in corpus tokens and partial
aggregation absorbs it map-side before either shuffle; the df table
is vocabulary-sized (zipfian corpora: millions of terms, not
billions of rows), so the counts<-df join broadcasts under AQE. The
top-k stage is a per-document window — WindowGroupLimit pushes the
rank filter below the sort at the shuffle boundary.

Formulas (ln-smoothed, sklearn's convention):
  idf(t)    = ln((N + 1) / (df_t + 1)) + 1
  tfidf     = tf * idf              (raw term count, not normalized —
                                     normalize downstream if needed)
  BM25(d,q) = sum over t in q of
              idf_bm25(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * |d|/avgdl))
  idf_bm25  = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))   (Robertson)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _term_counts(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, tok, tf) — lowercase whitespace tokens (the canonical
    tokenizer every text operator shares), empties dropped."""
    from d2d_spark.functions.text import tokens_ws

    toks = df.select(
        F.col(id_col).alias("__id"),
        F.explode(tokens_ws(F.lower(F.col(text_col)))).alias("tok"),
    ).filter(F.col("tok") != "")
    return toks.groupBy("__id", "tok").agg(F.count(F.lit(1)).alias("tf"))


def tf_idf(
    df: DataFrame, text_col: str, id_col: str, min_df: int = 1
) -> DataFrame:
    """Per-(document, term) weights: (id, tok, tf, df, tfidf). Terms
    appearing in fewer than ``min_df`` documents are dropped (typo
    and hapax noise)."""
    n_docs = df.select(F.col(id_col)).distinct().count()  # scalar agg
    tc = _term_counts(df, text_col, id_col)
    dfreq = tc.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    if min_df > 1:
        dfreq = dfreq.filter(F.col("df") >= min_df)
    idf = F.log((F.lit(float(n_docs + 1))) / (F.col("df") + 1)) + 1.0
    return (
        tc.join(dfreq, "tok")
        .withColumn("tfidf", F.col("tf") * idf)
        .select(F.col("__id").alias(id_col), "tok", "tf", "df", "tfidf")
    )


def top_keywords(
    df: DataFrame, text_col: str, id_col: str, k: int = 5, min_df: int = 1
) -> DataFrame:
    """The ``k`` highest-tfidf terms per document: (id, keywords) with
    keywords an array ordered best-first, ties broken by term so the
    result is deterministic."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("tok"))
    ranked = tf_idf(df, text_col, id_col, min_df=min_df).withColumn(
        "__rk", F.row_number().over(w)
    )
    return (
        ranked.filter(F.col("__rk") <= k)
        .groupBy(id_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__rk", "tok"))),
                lambda x: x["tok"],
            ).alias("keywords")
        )
    )


def bm25_scores(
    df: DataFrame,
    text_col: str,
    id_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 relevance of every document against a bag of query terms:
    (id, score), matching documents only, Robertson idf. The query is
    a literal in the plan (a broadcast of size |q|); everything else
    is the same two aggregates tf_idf uses plus one per-doc sum."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    q = [t.lower() for t in query_terms]
    n_docs = df.select(F.col(id_col)).distinct().count()
    tc = _term_counts(df, text_col, id_col)
    # per-document length and corpus average, from the counts we have
    dlen = tc.groupBy("__id").agg(F.sum("tf").alias("__dl"))
    avg_row = dlen.agg(F.avg("__dl")).first()[0]
    if avg_row is None:
        # every document tokenized to nothing: no matches, by the
        # repo's degrade-don't-crash convention
        return df.sparkSession.createDataFrame(
            [], f"{id_col} {df.schema[id_col].dataType.simpleString()}, score double"
        )
    avgdl = float(avg_row)
    hits = tc.filter(F.col("tok").isin(q))
    dfreq = hits.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        1.0 + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    per_term = (
        hits.join(dfreq, "tok")
        .join(dlen, "__id")
        .withColumn(
            "__s",
            idf
            * F.col("tf")
            * (k1 + 1.0)
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("__dl") / F.lit(avgdl))),
        )
    )
    return per_term.groupBy("__id").agg(F.sum("__s").alias("score")).select(
        F.col("__id").alias(id_col), "score"
    )


def bm25_search(
    corpus: DataFrame,
    queries: DataFrame,
    text_col: str,
    id_col: str,
    query_text_col: str,
    query_id_col: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Multi-query BM25 retrieval: (query_id, doc_id, score, rank) —
    the top-``k`` corpus documents per query, Robertson idf, DISTINCT
    query terms (qtf saturates to 1, the standard short-query form).
    The retrieval layer over bm25_scores' single-bag scoring: one
    postings build serves EVERY query.

    Exactness discipline: each per-term contribution (an irrational
    double both engines compute identically from the same IEEE
    expression) is rounded to 9 decimals and accumulated in
    DECIMAL(28,14), so the per-document sum is partition-order
    invariant and engine-portable — this is what lets the whole
    ranking be driver-oracled instead of pytest-only. Ranks break
    score ties by ascending doc id.

    Shape at scale: term counts + doc lengths + document frequencies
    are the tf_idf aggregates (vocab- and corpus-bounded, map-side
    combined); corpus-level scalars (N, avgdl) fold in through
    one-row broadcast crossJoins — NO driver action anywhere; the
    query side is an exploded distinct (query, term) frame joined on
    term, so work scales with postings of the query terms, not the
    corpus; one final (query, doc) aggregate + WindowGroupLimit
    top-k."""
    from pyspark import StorageLevel
    from pyspark.sql.window import Window

    from d2d_spark import cache as opcache
    from d2d_spark.functions.text import tokens_ws

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    # the corpus term-count explode feeds FOUR consumers (postings
    # join, df agg, doc lengths, avgdl) — persist it once, the shared-
    # explode discipline of classifier/semantic (release tag
    # "bm25_search" per corpus)
    tc = opcache.register(
        "bm25_search",
        _term_counts(corpus, text_col, id_col).persist(StorageLevel.MEMORY_AND_DISK),
    )
    tc.count()  # fill before the consumers race on it
    dlen = tc.groupBy("__id").agg(F.sum("tf").alias("__dl"))
    nd = corpus.agg(F.count_distinct(F.col(id_col)).alias("__n"))
    ad = dlen.agg(F.avg("__dl").alias("__avgdl"))
    dfreq = tc.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    qt = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            # the CANONICAL tokenizer, same as the corpus side — an
            # inline copy would silently drift if tokens_ws changes
            F.explode(tokens_ws(F.lower(F.col(query_text_col)))).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .distinct()
    )
    hits = (
        qt.join(tc, "tok")
        .join(dfreq, "tok")
        .join(dlen, "__id")
        .crossJoin(F.broadcast(nd))
        .crossJoin(F.broadcast(ad))
    )
    idf = F.log(
        1.0 + (F.col("__n").cast("double") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    contrib = (
        idf
        * F.col("tf")
        * (k1 + 1.0)
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("__dl") / F.col("__avgdl")))
    )
    scored = (
        hits.withColumn("__c", F.round(contrib, 9).cast("decimal(28,14)"))
        .groupBy("query_id", "__id")
        .agg(F.sum("__c").cast("double").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("__id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("__id").alias("doc_id"), "score", "rank")
    )
