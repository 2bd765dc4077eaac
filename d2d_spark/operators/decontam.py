"""Benchmark decontamination: flag and drop training documents that
overlap an evaluation/benchmark set.

The standard n-gram decontamination used for LLM training corpora
(GPT-3 appendix C; The Pile; RefinedWeb): a training document is
contaminated if it shares at least one word n-gram (n~13 at
production scale; configurable here because the fixture documents are
~50 words) with any benchmark document.

Scale posture (100 TB corpus, benchmark sets are MBs):

- benchmark side reduces to a DISTINCT set of 64-bit gram hashes —
  thousands-to-millions of longs — and is explicitly ``broadcast()``:
  the corpus NEVER shuffles for the membership probe;
- the corpus side explodes to (id, gram_hash) pairs — fixed-width,
  ~doc_len rows per doc — probes the broadcast hash set, and
  aggregates per id with map-side partial aggregation;
- the only shuffle is the per-id count aggregation, keyed by the
  (uniform) document id;
- ``decontaminate`` joins the flagged-id set back left-anti, again a
  hash join on the id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from d2d_spark.functions.text import shingles


def _gram_hashes(col, n: int):
    """Distinct 64-bit xxhash per word n-gram. Full-width hashes: at
    benchmark-set cardinality (<=millions) the 64-bit collision odds
    are ~1e-7, so hash-set membership stands in for string equality."""
    return F.transform(shingles(col, n=n), lambda g: F.xxhash64(g))


def contamination_scores(
    corpus: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    n: int = 8,
) -> DataFrame:
    """Per-document overlap with the benchmark set.

    Returns (id_col, n_grams, n_contaminated, contamination) — gram
    counts are over DISTINCT grams; ``contamination`` is the fraction
    of a document's distinct n-grams that appear anywhere in the
    benchmark. Documents shorter than ``n`` words compare their whole
    token string (the ``shingles`` short-doc rule), so short exact
    copies still score 1.0; empty docs score 0 contaminated over
    1 gram (the empty string gram).
    """
    bench_text_col = bench_text_col or text_col
    bench_hashes = (
        bench.select(F.explode(_gram_hashes(F.col(bench_text_col), n)).alias("__g")).distinct()
    )
    corpus_grams = corpus.select(
        F.col(id_col), F.explode(_gram_hashes(F.col(text_col), n)).alias("__g")
    )
    hits = corpus_grams.join(
        broadcast(bench_hashes.withColumn("__hit", F.lit(1))), on="__g", how="left"
    )
    return hits.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.count("__hit").alias("n_contaminated"),
        (F.count("__hit") / F.count(F.lit(1))).alias("contamination"),
    )


def decontaminate(
    corpus: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    n: int = 8,
    max_contamination: float = 0.0,
) -> DataFrame:
    """Corpus rows whose benchmark overlap is <= ``max_contamination``
    (default: drop on ANY shared n-gram, the GPT-3 rule). Preserves
    the corpus schema unchanged."""
    flagged = (
        contamination_scores(corpus, bench, text_col, id_col, bench_text_col, n)
        .filter(F.col("contamination") > max_contamination)
        .select(id_col)
    )
    return corpus.join(flagged, on=id_col, how="left_anti")
