"""Tests for the training-data-pipeline extensions: repetition
signals, PII scrub, benchmark decontamination, deterministic
sampling/splitting/mixing."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from d2d_spark.functions.pii import has_pii, pii_counts, redact_pii
from d2d_spark.functions.text import (
    dup_line_char_fraction,
    dup_line_fraction,
    repetition_signals,
    top_ngram_fraction,
)
from d2d_spark.operators.decontam import contamination_scores, decontaminate
from d2d_spark.operators.sampling import (
    hash_sample,
    hash_split,
    mix_corpora,
    stratified_sample,
)
from d2d_spark.session import read_table


# ---------------------------------------------------------------- repetition


def test_repetition_signals_exact_values(spark):
    df = spark.createDataFrame(
        [
            # 4 non-empty lines, "same line" x3 -> dup_line 2/4; chars:
            # 9*3 dup over 9*3+10 = 37 total
            (1, "same line\nsame line\n\nsame line\nother одна"),
            (2, "a b c d"),  # all distinct
            (3, ""),  # no lines -> NULL
            # "x y" bigram occurs 3x of 5 bigrams
            (4, "x y x y x y"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            dup_line_fraction(F.col("text")).alias("dl"),
            dup_line_char_fraction(F.col("text")).alias("dlc"),
            top_ngram_fraction(F.col("text"), 2).alias("t2"),
        ).collect()
    }
    assert rows[1]["dl"] == pytest.approx(0.5)
    assert rows[1]["dlc"] == pytest.approx(27 / 37)
    assert rows[2]["dl"] == 0.0 and rows[2]["dlc"] == 0.0
    assert rows[3]["dl"] is None and rows[3]["dlc"] is None
    assert rows[4]["t2"] == pytest.approx(3 / 5)
    # single-word doc: no bigram -> NULL
    one = spark.createDataFrame([("w",)], "text string")
    assert one.select(top_ngram_fraction(F.col("text"), 2).alias("t")).first()["t"] is None


def test_repetition_signals_bundle_over_fixture(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    out = docs.withColumns(repetition_signals(F.col("text"))).select(
        "doc_id", "rep_dup_line", "rep_top_2gram", "rep_top_3gram", "rep_top_4gram"
    )
    got = out.collect()
    assert len(got) == docs.count()
    for r in got:  # fractions stay in [0, 1] wherever defined
        for c in ("rep_dup_line", "rep_top_2gram", "rep_top_3gram", "rep_top_4gram"):
            assert r[c] is None or 0.0 <= r[c] <= 1.0


# ----------------------------------------------------------------------- pii


def test_pii_counts_and_redaction(spark):
    text = (
        "mail a@b.com or c.d+x@e.org, call 555-123-4567, "
        "server 10.0.0.1, card 4111 1111 1111 1111, ssn 123-45-6789"
    )
    df = spark.createDataFrame([(text,), ("clean text, no pii here",)], "text string")
    counted = df.select(
        pii_counts(F.col("text")).alias("c"),
        redact_pii(F.col("text")).alias("red"),
        has_pii(F.col("text")).alias("any"),
    ).collect()
    dirty, clean = counted
    assert dirty["c"]["email"] == 2
    assert dirty["c"]["ip"] == 1
    assert dirty["c"]["card"] == 1
    assert dirty["c"]["ssn"] == 1
    assert dirty["c"]["phone"] >= 1
    assert dirty["any"] is True
    for tok in ("<EMAIL>", "<IP>", "<CARD>", "<SSN>", "<PHONE>"):
        assert tok in dirty["red"]
    # redaction removed every raw lexeme
    for raw in ("a@b.com", "10.0.0.1", "4111", "123-45-6789", "555-123-4567"):
        assert raw not in dirty["red"]
    assert clean["any"] is False and clean["red"] == "clean text, no pii here"


def test_redaction_is_idempotent_and_count_clean(spark):
    df = spark.createDataFrame([("a@b.com at 10.0.0.1 call 555-123-4567",)], "text string")
    once = df.select(redact_pii(F.col("text")).alias("t"))
    twice = once.select(redact_pii(F.col("t")).alias("t"))
    assert once.first()["t"] == twice.first()["t"]
    c = once.select(pii_counts(F.col("t")).alias("c")).first()["c"]
    assert all(v == 0 for v in c.asDict().values())


# -------------------------------------------------------------- decontam


def test_decontamination_flags_planted_overlap(spark):
    bench = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")],
        "qid long, text string",
    )
    corpus = spark.createDataFrame(
        [
            # contains the full benchmark 9-gram plus padding
            (10, "intro words the quick brown fox jumps over the lazy dog outro words"),
            (11, "completely unrelated content about spark and parquet files here"),
            # shares only a 4-gram -> clean at n=8
            (12, "the quick brown fox went home early to sleep soundly tonight"),
        ],
        "doc_id long, text string",
    )
    scores = {
        r["doc_id"]: r
        for r in contamination_scores(corpus, bench, n=8).collect()
    }
    assert scores[10]["n_contaminated"] > 0
    assert scores[11]["n_contaminated"] == 0
    assert scores[12]["n_contaminated"] == 0
    assert 0 < scores[10]["contamination"] <= 1.0

    kept = decontaminate(corpus, bench, n=8)
    assert sorted(r["doc_id"] for r in kept.collect()) == [11, 12]
    assert kept.columns == corpus.columns


def test_decontamination_self_and_disjoint(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents").limit(50)
    # against itself every doc shares all its grams -> everything drops
    assert decontaminate(docs, docs, n=5).count() == 0
    # against a disjoint benchmark nothing drops
    bench = spark.createDataFrame([("zz qq ww ee rr tt yy uu ii oo",)], "text string")
    assert decontaminate(docs, bench, n=5).count() == docs.count()


def test_contamination_matches_duckdb_oracle(spark, sf_dir):
    """Cross-check the distributed gram-overlap count against a DuckDB
    set computation on the same data (string grams, not hashes — also
    certifies the 64-bit hash stand-in loses nothing here)."""
    import duckdb

    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 30)
    bench = docs.filter(F.col("doc_id") % 3 == 0)
    got = {
        r["doc_id"]: r["n_contaminated"]
        for r in contamination_scores(docs, bench, n=5).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW d AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet') "
        "WHERE doc_id < 30"
    )
    want = dict(
        con.execute(
            r"""
            WITH toks AS (
              SELECT doc_id,
                     string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') t
              FROM d
            ), grams AS (
              SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS g
              FROM (
                SELECT doc_id, t,
                       unnest(generate_series(1, greatest(len(t) - 4, 1))) AS i
                FROM toks
              )
            ), bgrams AS (
              SELECT DISTINCT g FROM grams WHERE doc_id % 3 = 0
            )
            SELECT doc_id, count(b.g)
            FROM grams LEFT JOIN bgrams b USING (g)
            GROUP BY doc_id
            """
        ).fetchall()
    )
    assert got == want


# -------------------------------------------------------------- sampling


def test_hash_sample_deterministic_and_sized(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    n = orders.count()
    s1 = hash_sample(orders, "o_orderkey", 0.3, seed=7)
    s2 = hash_sample(orders, "o_orderkey", 0.3, seed=7)
    k1 = sorted(r["o_orderkey"] for r in s1.select("o_orderkey").collect())
    k2 = sorted(r["o_orderkey"] for r in s2.select("o_orderkey").collect())
    assert k1 == k2  # run-to-run identical
    assert 0.2 * n < len(k1) < 0.4 * n
    # different seed -> different draw
    k3 = sorted(
        r["o_orderkey"] for r in hash_sample(orders, "o_orderkey", 0.3, seed=8).collect()
    )
    assert k1 != k3
    assert hash_sample(orders, "o_orderkey", 0.0).count() == 0
    assert hash_sample(orders, "o_orderkey", 1.0).count() == n
    with pytest.raises(ValueError):
        hash_sample(orders, "o_orderkey", 1.5)


def test_hash_split_disjoint_exhaustive_stable(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    parts = hash_split(orders, "o_orderkey", [0.8, 0.1, 0.1], seed=1)
    keys = [set(r["o_orderkey"] for r in p.select("o_orderkey").collect()) for p in parts]
    all_keys = set(r["o_orderkey"] for r in orders.select("o_orderkey").collect())
    assert keys[0] | keys[1] | keys[2] == all_keys
    assert not (keys[0] & keys[1]) and not (keys[0] & keys[2]) and not (keys[1] & keys[2])
    assert len(keys[0]) > 5 * len(keys[1])
    # growing the input never moves an existing key between parts
    half = orders.filter(F.col("o_orderkey") % 2 == 0)
    half_train = set(
        r["o_orderkey"]
        for r in hash_split(half, "o_orderkey", [0.8, 0.1, 0.1], seed=1)[0].collect()
    )
    assert half_train == {k for k in keys[0] if k % 2 == 0}
    with pytest.raises(ValueError):
        hash_split(orders, "o_orderkey", [])


def test_stratified_sample_per_stratum_fractions(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    by_src = {r["source"]: r["n"] for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    srcs = sorted(by_src)
    fr = {srcs[0]: 1.0, srcs[1]: 0.2}
    out = stratified_sample(docs, "source", fr, key_col="doc_id", seed=3)
    got = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert got[srcs[0]] == by_src[srcs[0]]  # kept whole
    assert 0 < got[srcs[1]] < by_src[srcs[1]]  # downsampled
    for s in srcs[2:]:  # default fraction 0 -> dropped
        assert s not in got
    # default_fraction keeps unlisted strata
    out2 = stratified_sample(docs, "source", fr, key_col="doc_id", seed=3, default_fraction=1.0)
    got2 = {r["source"]: r["n"] for r in out2.groupBy("source").agg(F.count("*").alias("n")).collect()}
    for s in srcs[2:]:
        assert got2[s] == by_src[s]


def test_mix_corpora_tags_and_reproduces(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    orders = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("doc_id"), F.col("o_orderpriority").alias("text")
    )
    mixed = mix_corpora({"docs": (docs, 1.0), "orders": (orders, 0.1)}, key_col="doc_id", seed=5)
    counts = {r["source"]: r["n"] for r in mixed.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts["docs"] == docs.count()
    assert 0 < counts["orders"] < 0.3 * orders.count()
    again = mix_corpora({"docs": (docs, 1.0), "orders": (orders, 0.1)}, key_col="doc_id", seed=5)
    assert again.count() == mixed.count()


# ------------------------------------------------------- paragraph dedup


def test_paragraph_dedup_keeps_first_occurrence(spark):
    from d2d_spark.operators.dedup import paragraph_dedup

    df = spark.createDataFrame(
        [
            (1, "unique one\n\nshared para\n\nunique two"),
            (2, "shared para\n\nonly in two"),   # loses the shared para
            (3, "shared para"),                  # loses everything
            (4, "   \n\nonly whitespace dropped\n\n  "),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in paragraph_dedup(df, "text", "doc_id").collect()}
    assert out[1]["text"] == "unique one\n\nshared para\n\nunique two"
    assert out[1]["n_dropped_paragraphs"] == 0
    assert out[2]["text"] == "only in two" and out[2]["n_dropped_paragraphs"] == 1
    assert out[3]["text"] == "" and out[3]["n_dropped_paragraphs"] == 1
    assert out[4]["text"] == "only whitespace dropped"
    assert set(out) == {1, 2, 3, 4}  # every document survives as a row

    # keep_first=False strips every copy of repeated paragraphs
    strip = {r["doc_id"]: r for r in
             paragraph_dedup(df, "text", "doc_id", keep_first=False).collect()}
    assert strip[1]["text"] == "unique one\n\nunique two"


def test_paragraph_dedup_matches_duckdb(spark, sf_dir):
    import duckdb

    from d2d_spark.operators.dedup import paragraph_dedup

    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    # single-newline paragraphs: the fixture text has no blank lines
    got = {
        r["doc_id"]: (r["text"], r["n_dropped_paragraphs"])
        for r in paragraph_dedup(docs, "text", "doc_id", sep="\n").select(
            "doc_id", "text", "n_dropped_paragraphs"
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW d AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet') "
        "WHERE doc_id < 60"
    )
    want = {
        row[0]: (row[1], row[2])
        for row in con.execute(
            r"""
            WITH paras AS (
              SELECT doc_id, i AS pos, p,
                     md5(lower(trim(regexp_replace(p, '\s+', ' ', 'g')))) fp
              FROM (SELECT doc_id, unnest(string_split(text, chr(10))) p,
                           generate_subscripts(string_split(text, chr(10)), 1) i
                    FROM d)
              WHERE trim(p) <> ''
            ), ranked AS (
              SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id, pos) rk,
                        count(*) OVER (PARTITION BY fp) n
              FROM paras
            ), kept AS (
              SELECT * FROM ranked WHERE n = 1 OR rk = 1
            ), rebuilt AS (
              SELECT doc_id, string_agg(p, chr(10) ORDER BY pos) t, count(*) k
              FROM kept GROUP BY doc_id
            ), totals AS (
              SELECT doc_id, count(*) tot FROM paras GROUP BY doc_id
            )
            SELECT d.doc_id, coalesce(r.t, ''), coalesce(tot, 0) - coalesce(r.k, 0)
            FROM d LEFT JOIN rebuilt r USING (doc_id) LEFT JOIN totals USING (doc_id)
            """
        ).fetchall()
    }
    assert got == want


# ----------------------------------------------------------- packing


def test_pack_documents_respects_budget(spark, sf_dir):
    from d2d_spark.operators.sampling import pack_documents

    docs = read_table(spark, sf_dir, "documents").withColumn(
        "n_tokens", F.size(F.split(F.trim(F.col("text")), r"\s+"))
    )
    packed = pack_documents(docs, "n_tokens", budget=200, sort_col="doc_id")
    rows = packed.select("doc_id", "n_tokens", "bin_id").collect()
    assert len(rows) == docs.count()  # every document assigned
    by_bin: dict[int, list[int]] = {}
    for r in rows:
        by_bin.setdefault(r["bin_id"], []).append(r["n_tokens"])
    for b, toks in by_bin.items():
        assert sum(toks) <= 200 or len(toks) == 1  # over-budget => singleton
    # packing actually packs: fewer bins than documents
    assert len(by_bin) < len(rows)
    # deterministic given the same partitioning + sort
    again = pack_documents(docs, "n_tokens", budget=200, sort_col="doc_id")
    assert {(r["doc_id"], r["bin_id"]) for r in again.collect()} == {
        (r["doc_id"], r["bin_id"]) for r in rows
    }


def test_pack_documents_efficiency_under_skew(spark, sf_dir):
    """The bounded open-bin list (fullest-bin eviction past 64) must
    not blow up padding waste on an adversarial stream: alternating
    near-full and tiny docs, plus some over-budget singletons. Pin
    total bins <= 2x the ideal ceil(total/budget)."""
    import math

    from d2d_spark.operators.sampling import pack_documents

    budget = 1000
    # 600 rows/partition: tiny docs arrive long after the big ones
    # opened bins, so the eviction path actually exercises
    sizes = []
    for i in range(300):
        sizes.append(900)   # near-full: leaves room only for tiny docs
        sizes.append(60)    # tiny: must land in an open bin to avoid waste
    for i in range(10):
        sizes.append(1500)  # over-budget singletons
    rows = [(i, s) for i, s in enumerate(sizes)]
    docs = spark.createDataFrame(rows, "doc_id long, n_tokens long").repartition(2)
    packed = pack_documents(docs, "n_tokens", budget=budget, sort_col="doc_id")
    got = packed.select("doc_id", "n_tokens", "bin_id").collect()
    assert len(got) == len(rows)
    by_bin: dict[int, int] = {}
    for r in got:
        by_bin[r["bin_id"]] = by_bin.get(r["bin_id"], 0) + r["n_tokens"]
    for b, tot in by_bin.items():
        assert tot <= budget or tot in (1500,)  # over-budget => singleton
    ideal = math.ceil(sum(sizes) / budget)
    assert len(by_bin) <= 2 * ideal, (len(by_bin), ideal)


def test_concat_bins_skewed_bin(spark, sf_dir):
    """One over-budget doc among many small ones: the giant lands in a
    singleton bin (pack_documents' budget invariant), so no concat
    group concentrates more than ~budget characters — the collect_list
    payload per bin is bounded by the packing budget, not by the
    worst document mix."""
    from d2d_spark.operators.sampling import concat_bins, pack_documents

    budget = 500
    rows = [(0, "x" * 2000, 2000)] + [(i, f"doc{i} " * 10, 50) for i in range(1, 101)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, n_tokens long")
    packed = pack_documents(docs, "n_tokens", budget=budget, sort_col="doc_id")
    seqs = concat_bins(packed, tokens_col="n_tokens").collect()
    by_tokens = {r["n_tokens"]: r for r in seqs}
    giant = by_tokens[2000]
    assert giant["n_docs"] == 1 and giant["doc_ids"] == [0]  # singleton bin
    for r in seqs:
        assert r["n_tokens"] <= budget or r["n_docs"] == 1
    # every doc appears exactly once across sequences
    all_ids = sorted(i for r in seqs for i in r["doc_ids"])
    assert all_ids == list(range(101))


def test_pack_documents_validates(spark, sf_dir):
    import pytest as _pytest

    from d2d_spark.operators.sampling import pack_documents

    docs = read_table(spark, sf_dir, "documents").withColumn("n", F.lit(1))
    with _pytest.raises(ValueError, match="budget"):
        pack_documents(docs, "n", budget=0)


def test_shuffle_and_shard_deterministic_balanced(spark, sf_dir):
    from d2d_spark.operators.sampling import shuffle_and_shard

    orders = read_table(spark, sf_dir, "orders")
    n = orders.count()
    sharded = shuffle_and_shard(orders, "o_orderkey", n_shards=4, seed=1)
    rows = [(r["o_orderkey"], r["shard"]) for r in sharded.select("o_orderkey", "shard").collect()]
    assert len(rows) == n
    sizes = {}
    for _, s in rows:
        sizes[s] = sizes.get(s, 0) + 1
    assert set(sizes) == {0, 1, 2, 3}
    assert max(sizes.values()) < 2 * min(sizes.values())  # near-equal shards
    # same seed reproduces the assignment exactly; new seed permutes
    again = {(r["o_orderkey"], r["shard"]) for r in
             shuffle_and_shard(orders, "o_orderkey", n_shards=4, seed=1)
             .select("o_orderkey", "shard").collect()}
    assert again == set(rows)
    other = {(r["o_orderkey"], r["shard"]) for r in
             shuffle_and_shard(orders, "o_orderkey", n_shards=4, seed=2)
             .select("o_orderkey", "shard").collect()}
    assert other != set(rows)
    with pytest.raises(ValueError, match="n_shards"):
        shuffle_and_shard(orders, "o_orderkey", 0)


def test_paragraph_dedup_is_idempotent(spark, sf_dir):
    """A second pass over already-deduped text is a fixed point."""
    from d2d_spark.operators.dedup import paragraph_dedup

    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    once = paragraph_dedup(docs, "text", "doc_id", sep="\n").select("doc_id", "text")
    twice = paragraph_dedup(once, "text", "doc_id", sep="\n").select(
        "doc_id", "text", "n_dropped_paragraphs"
    )
    rows = twice.collect()
    assert all(r["n_dropped_paragraphs"] == 0 for r in rows)
    assert {(r["doc_id"], r["text"]) for r in rows} == {
        (r["doc_id"], r["text"]) for r in once.collect()
    }


def test_curation_filters_stream_equals_batch(spark, sf_dir, tmp_path):
    """The curation Columns (quality/repetition/PII) are pure per-row
    expressions, so the SAME code runs unchanged on a stream — pinned
    by comparing an availableNow file-stream pass against batch."""
    from d2d_spark.functions.pii import redact_pii
    from d2d_spark.functions.text import dup_line_fraction
    from d2d_spark.streaming.filestream import file_stream

    src = str(tmp_path / "docs_src")
    docs = read_table(spark, sf_dir, "documents").limit(80)
    docs.write.parquet(src)
    batch_df = spark.read.parquet(src)

    def curate(df):
        return df.select(
            "doc_id",
            redact_pii(F.col("text")).alias("clean_text"),
            dup_line_fraction(F.col("text")).alias("rep"),
        ).filter(F.coalesce(F.col("rep"), F.lit(0.0)) < 0.5)

    expected = {(r["doc_id"], r["clean_text"]) for r in curate(batch_df).collect()}
    stream = file_stream(spark, src, batch_df.schema, max_files_per_trigger=2)
    q = (
        curate(stream)
        .writeStream.format("memory")
        .queryName("curate_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["doc_id"], r["clean_text"])
        for r in spark.sql("select * from curate_stream_test").collect()
    }
    assert got == expected


def test_paragraph_dedup_regex_metachar_separator(spark):
    """Separators are literals, not regexes (review finding: '||' as a
    regex split on every character)."""
    from d2d_spark.operators.dedup import paragraph_dedup

    df = spark.createDataFrame(
        [(1, "a||b||a"), (2, "c.d.c")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in paragraph_dedup(df, "text", "doc_id", sep="||").collect()}
    assert out[1]["text"] == "a||b" and out[1]["n_dropped_paragraphs"] == 1
    assert out[2]["text"] == "c.d.c"  # no '||' -> untouched single paragraph
    dot = {r["doc_id"]: r for r in paragraph_dedup(df, "text", "doc_id", sep=".").collect()}
    assert dot[2]["text"] == "c.d" and dot[2]["n_dropped_paragraphs"] == 1


def test_signature_store_incremental_dedup(spark, sf_dir, tmp_path):
    """Two-batch incremental dedup: in-batch clones collapse to one,
    cross-batch clones drop against the store, and the surviving id
    set matches what one batch-mode LSH run over the union keeps."""
    from d2d_spark.operators.dedup import (
        SignatureStore,
        dedup_representatives,
        minhash_lsh_pairs,
    )

    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    base = docs.select("doc_id", "text")
    # batch 1: docs 0..39 plus an in-batch clone of each doc < 5
    clones1 = base.filter(F.col("doc_id") < 5).select(
        (F.col("doc_id") + 1000).alias("doc_id"), "text"
    )
    batch1 = base.unionAll(clones1)
    # batch 2: clones of docs 10..19 (cross-batch dups) + genuinely new docs
    clones2 = base.filter((F.col("doc_id") >= 10) & (F.col("doc_id") < 20)).select(
        (F.col("doc_id") + 2000).alias("doc_id"), "text"
    )
    fresh = read_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") >= 60) & (F.col("doc_id") < 80)
    ).select((F.col("doc_id") + 3000).alias("doc_id"), "text")
    batch2 = clones2.unionAll(fresh)

    store = SignatureStore(str(tmp_path / "sigs"), jaccard_threshold=1.0)
    kept1 = store.dedup_batch(batch1, "text", "doc_id")
    ids1 = {r["doc_id"] for r in kept1.select("doc_id").collect()}
    assert ids1 == {r["doc_id"] for r in base.select("doc_id").collect()}  # min-id wins

    kept2 = store.dedup_batch(batch2, "text", "doc_id")
    ids2 = {r["doc_id"] for r in kept2.select("doc_id").collect()}
    assert ids2 == {r["doc_id"] for r in fresh.select("doc_id").collect()}

    # equivalence with one batch-mode run over everything (batch-1 ids
    # are smaller, so min-id representatives = incremental survivors)
    union = batch1.unionAll(batch2)
    pairs = minhash_lsh_pairs(union, "text", "doc_id", jaccard_threshold=1.0)
    batch_kept = {
        r["doc_id"]
        for r in dedup_representatives(union, pairs, "doc_id").select("doc_id").collect()
    }
    assert ids1 | ids2 == batch_kept


def test_signature_store_validates_bands(tmp_path):
    from d2d_spark.operators.dedup import SignatureStore

    with pytest.raises(ValueError, match="bands"):
        SignatureStore(str(tmp_path / "x"), num_hashes=32, bands=5)


def test_stream_dedup_sink_end_to_end(spark, sf_dir, tmp_path):
    """Crawl-ingestion shape: two file drops stream through the
    signature store; cross-drop clones never reach the target."""
    from d2d_spark.operators.dedup import SignatureStore
    from d2d_spark.streaming.filestream import file_stream, stream_dedup_sink

    src = str(tmp_path / "incoming")
    target = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    store = SignatureStore(str(tmp_path / "sigs"), jaccard_threshold=1.0)

    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 30)
    base = docs.select("doc_id", "text")
    base.write.parquet(src)  # drop 1
    stream = file_stream(spark, src, base.schema, max_files_per_trigger=2)
    stream_dedup_sink(stream, store, target, ckpt)
    assert spark.read.parquet(target).count() == base.count()

    # drop 2: clones of existing docs + new ones
    clones = base.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 5000).alias("doc_id"), "text"
    )
    fresh = read_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") >= 100) & (F.col("doc_id") < 120)
    ).select("doc_id", "text")
    clones.unionAll(fresh).write.mode("append").parquet(src)
    stream2 = file_stream(spark, src, base.schema, max_files_per_trigger=2)
    stream_dedup_sink(stream2, store, target, ckpt)

    got = {r["doc_id"] for r in spark.read.parquet(target).select("doc_id").collect()}
    want = {r["doc_id"] for r in base.select("doc_id").collect()} | {
        r["doc_id"] for r in fresh.select("doc_id").collect()
    }
    assert got == want  # no clone ids, all fresh ids, drop-1 intact


def test_stream_dedup_sink_refuses_fresh_checkpoint_on_used_target(spark, sf_dir, tmp_path):
    """A rebuilt checkpoint restarts batch ids at 0, which would
    silently overwrite historical batch_id=N partitions — the sink
    must refuse that combination up front."""
    import pytest as _pytest

    from d2d_spark.operators.dedup import SignatureStore
    from d2d_spark.streaming.filestream import file_stream, stream_dedup_sink

    src = str(tmp_path / "incoming")
    target = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    store = SignatureStore(str(tmp_path / "sigs"), jaccard_threshold=1.0)

    base = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 10).select("doc_id", "text")
    base.write.parquet(src)
    stream = file_stream(spark, src, base.schema, max_files_per_trigger=2)
    stream_dedup_sink(stream, store, target, ckpt)

    # same checkpoint resumes fine (no-op: no new files)
    stream_dedup_sink(file_stream(spark, src, base.schema), store, target, ckpt)

    # a FRESH checkpoint against the populated target is refused
    with _pytest.raises(ValueError, match="checkpoint lifetime"):
        stream_dedup_sink(
            file_stream(spark, src, base.schema), store, target, str(tmp_path / "ckpt2")
        )


def test_int8_quantization_roundtrip_and_recall(spark, sf_dir):
    """Quantized cosine stays within ~1% of exact, and exact top-5
    neighbor sets survive quantization with high overlap."""
    from d2d_spark.functions.vectors import cosine, dequantize_int8, quantize_int8

    emb = read_table(spark, sf_dir, "embeddings")
    deq = emb.select(
        "vec_id",
        "embedding",
        dequantize_int8(quantize_int8(F.col("embedding"))).alias("approx"),
    )
    err = deq.select(
        F.abs(cosine(F.col("embedding"), F.col("approx")) - 1.0).alias("e")
    ).agg(F.max("e").alias("worst")).first()["worst"]
    assert err < 0.01  # dequantized vector nearly parallel to original

    # top-5 neighbors of 3 probe vectors: exact vs quantized corpus
    from d2d_spark.operators.similarity import brute_force_topk

    queries = emb.filter(F.col("vec_id") < 3).select("vec_id", "embedding")
    exact = brute_force_topk(emb, queries, "vec_id", "embedding", "vec_id", "embedding", k=5)
    qcorpus = deq.select("vec_id", F.col("approx").alias("embedding"))
    approx = brute_force_topk(qcorpus, queries, "vec_id", "embedding", "vec_id", "embedding", k=5)
    for qid in range(3):
        a = {r["neighbor_id"] for r in exact.filter(F.col("query_id") == qid).collect()}
        b = {r["neighbor_id"] for r in approx.filter(F.col("query_id") == qid).collect()}
        assert len(a & b) >= 4  # >=80% overlap per probe


def test_int8_quantization_zero_vector(spark):
    from d2d_spark.functions.vectors import dequantize_int8, quantize_int8

    df = spark.createDataFrame([([0.0, 0.0, 0.0],)], "embedding array<float>")
    out = df.select(dequantize_int8(quantize_int8(F.col("embedding"))).alias("v")).first()
    assert out["v"] == [0.0, 0.0, 0.0]


def test_quality_weighted_sample_monotone(spark, sf_dir):
    from d2d_spark.operators.sampling import quality_weighted_sample

    docs = read_table(spark, sf_dir, "documents").withColumn(
        "score", (F.col("doc_id") % 100) / 100.0
    )
    cold = {r["doc_id"] for r in quality_weighted_sample(docs, "doc_id", "score", 2.0).collect()}
    warm = {r["doc_id"] for r in quality_weighted_sample(docs, "doc_id", "score", 1.0).collect()}
    assert cold <= warm  # sharper temperature only removes rows
    assert len(cold) < len(warm) < docs.count()
    everything = quality_weighted_sample(docs, "doc_id", "score", 0.0)
    assert everything.count() == docs.count()  # T=0 keeps all (score^0 = 1)
    # keep rate rises with score
    kept_low = len([i for i in warm if i % 100 < 30])
    kept_high = len([i for i in warm if i % 100 >= 70])
    assert kept_high > kept_low
    with pytest.raises(ValueError, match="temperature"):
        quality_weighted_sample(docs, "doc_id", "score", -1)


def test_concat_bins_builds_sequences(spark, sf_dir):
    from d2d_spark.operators.sampling import concat_bins, pack_documents

    docs = read_table(spark, sf_dir, "documents").withColumn(
        "n_tokens", F.size(F.split(F.trim(F.col("text")), r"\s+"))
    ).select("doc_id", "text", "n_tokens")
    packed = pack_documents(docs, "n_tokens", budget=300, sort_col="doc_id")
    seqs = concat_bins(packed, tokens_col="n_tokens")
    rows = seqs.collect()
    assert sum(r["n_docs"] for r in rows) == docs.count()
    for r in rows:
        assert r["n_tokens"] <= 300 or r["n_docs"] == 1
        assert r["doc_ids"] == sorted(r["doc_ids"])
        # concatenation holds every member's text in id order
        assert r["text"].count("\n\n") == r["n_docs"] - 1 or "\n\n" in r["text"]


# ------------------------------------------------- token-budget mixing


def test_mix_to_token_budget_down_and_upsample(spark, sf_dir):
    from d2d_spark.operators.sampling import mix_to_token_budget
    from d2d_spark.functions.text import token_count_ws

    docs = (
        read_table(spark, sf_dir, "documents")
        .select("doc_id", "text", "source")
        .withColumn("n_tokens", token_count_ws(F.col("text")))
    )
    half = docs.filter(F.col("doc_id") % 2 == 0)
    other = docs.filter(F.col("doc_id") % 2 == 1)
    tok_half = half.agg(F.sum("n_tokens")).collect()[0][0]
    tok_other = other.agg(F.sum("n_tokens")).collect()[0][0]

    # budget sized so 'a' must downsample (~50%) and 'b' must upsample
    # (~2.5 epochs): shares 1:5 over a budget of (0.5 + 2.5x) tokens
    budget = int(0.5 * tok_half + 2.5 * tok_other)
    shares = {"a": (half, 0.5 * tok_half / budget), "b": (other, 2.5 * tok_other / budget)}
    mixed = mix_to_token_budget(shares, "doc_id", "n_tokens", budget, seed=3)

    got = {
        r["source"]: r["t"]
        for r in mixed.groupBy("source").agg(F.sum("n_tokens").alias("t")).collect()
    }
    assert abs(got["a"] - 0.5 * tok_half) / (0.5 * tok_half) < 0.2
    assert abs(got["b"] - 2.5 * tok_other) / (2.5 * tok_other) < 0.2

    # upsampled rows repeat 2 or 3 times with distinct epoch indices
    reps = (
        mixed.filter(F.col("source") == "b")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n"), F.countDistinct("epoch").alias("ne"))
        .collect()
    )
    assert all(r["n"] in (2, 3) and r["ne"] == r["n"] for r in reps)

    # deterministic
    again = mix_to_token_budget(shares, "doc_id", "n_tokens", budget, seed=3)
    assert again.count() == mixed.count()


def test_mix_to_token_budget_validates(spark, sf_dir):
    import pytest as _pytest

    from d2d_spark.operators.sampling import mix_to_token_budget
    from d2d_spark.functions.text import token_count_ws

    docs = (
        read_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .withColumn("n_tokens", token_count_ws(F.col("text")))
    )
    total = docs.agg(F.sum("n_tokens")).collect()[0][0]
    with _pytest.raises(ValueError, match="epochs"):
        mix_to_token_budget({"a": (docs, 1.0)}, "doc_id", "n_tokens", int(total * 50))
    with _pytest.raises(ValueError, match="no tokens"):
        mix_to_token_budget(
            {"a": (docs.withColumn("n_tokens", F.lit(0)), 1.0)},
            "doc_id",
            "n_tokens",
            1000,
        )


def test_mix_to_token_budget_share_scale_invariant(spark, sf_dir):
    """Scaling all shares by a constant must not change the mix
    (shares are normalized); seed changes must only re-draw the
    fractional parts."""
    from d2d_spark.operators.sampling import mix_to_token_budget
    from d2d_spark.functions.text import token_count_ws

    docs = (
        read_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .withColumn("n_tokens", token_count_ws(F.col("text")))
    )
    half = docs.filter(F.col("doc_id") % 2 == 0)
    other = docs.filter(F.col("doc_id") % 2 == 1)
    total = docs.agg(F.sum("n_tokens")).collect()[0][0]
    budget = int(total * 0.6)

    def ids(mix):
        return sorted((r["source"], r["doc_id"], r["epoch"]) for r in mix.collect())

    m1 = mix_to_token_budget({"a": (half, 1.0), "b": (other, 2.0)}, "doc_id", "n_tokens", budget, seed=9)
    m2 = mix_to_token_budget({"a": (half, 10.0), "b": (other, 20.0)}, "doc_id", "n_tokens", budget, seed=9)
    assert ids(m1) == ids(m2)


# ------------------------------------------------ perplexity LM filter


def test_char_lm_ranks_in_domain_below_gibberish(spark, sf_dir):
    from d2d_spark.operators.ngram_lm import perplexity_filter, perplexity_score, train_char_lm

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    lm = train_char_lm(docs, "text", n=3, vocab_size=50_000)
    assert lm.count() > 0

    sample_text = docs.orderBy("doc_id").first().text
    probe = spark.createDataFrame(
        [
            Row(doc_id=1, text=sample_text),
            Row(doc_id=2, text="zzqxj wvvkq zzxqj pqzzv xjqkw qqvzx jjxqw"),
            Row(doc_id=3, text="ab"),  # shorter than n: no grams
        ]
    )
    rows = {r.doc_id: r for r in perplexity_score(probe, lm, "text", "doc_id").collect()}
    assert rows[1].ppl < rows[2].ppl, "in-domain text must score below gibberish"
    assert rows[3].ppl is None

    kept = perplexity_filter(probe, lm, "text", "doc_id", max_ppl=rows[1].ppl * 1.5)
    assert [r.doc_id for r in kept.collect()] == [1]
    assert kept.columns == probe.columns


def test_char_lm_deterministic_and_capped(spark, sf_dir):
    from d2d_spark.operators.ngram_lm import train_char_lm

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    a = sorted((r.gram, round(r.logp, 12)) for r in train_char_lm(docs, "text", vocab_size=25).collect())
    b = sorted((r.gram, round(r.logp, 12)) for r in train_char_lm(docs, "text", vocab_size=25).collect())
    assert a == b
    assert len(a) <= 25
    import math

    assert all(lp <= 0 or math.isclose(lp, 0) for _, lp in a), "log-probs must be <= 0"


def test_char_lm_matches_duckdb_oracle(spark, sf_dir):
    """Differential check: the trained (gram, logp) model and a
    document's mean log-prob match an independent DuckDB derivation."""
    import math

    import duckdb

    from d2d_spark.operators.ngram_lm import perplexity_score, train_char_lm

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    got = {
        r.gram: r.logp
        for r in train_char_lm(docs, "text", n=3, vocab_size=50, min_count=2).collect()
    }

    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from read_parquet('{sf_dir}/documents.parquet')"
    )
    want = dict(
        con.execute(
            r"""
WITH norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t FROM documents
),
grams AS (
  SELECT substr(t, i, 3) AS gram
  FROM norm, unnest(generate_series(1, greatest(length(t) - 2, 0))) AS u(i)
  WHERE length(t) >= 3
),
counts AS (SELECT gram, count(*) AS c FROM grams GROUP BY gram),
prefix AS (SELECT substr(gram, 1, 2) AS p, sum(c) AS pc FROM counts GROUP BY p)
SELECT gram, ln(c::double) - ln(pc::double) AS logp
FROM (SELECT * FROM counts WHERE c >= 2 ORDER BY c DESC, gram LIMIT 50) k
JOIN prefix ON substr(k.gram, 1, 2) = prefix.p
"""
        ).fetchall()
    )
    assert set(got) == set(want)
    assert all(math.isclose(got[g], want[g], rel_tol=1e-12) for g in got)

    # score one fixture document against the same 50-gram model
    lm = train_char_lm(docs, "text", n=3, vocab_size=50, min_count=2)
    probe = docs.orderBy("doc_id").limit(1)
    got_mean = perplexity_score(probe, lm, "text", "doc_id", floor_logp=-16.0).collect()[0].mean_logp
    want_mean = con.execute(
        r"""
WITH norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t FROM documents
),
model AS (
  WITH grams AS (
    SELECT substr(t, i, 3) AS gram
    FROM norm, unnest(generate_series(1, greatest(length(t) - 2, 0))) AS u(i)
    WHERE length(t) >= 3
  ),
  counts AS (SELECT gram, count(*) AS c FROM grams GROUP BY gram),
  prefix AS (SELECT substr(gram, 1, 2) AS p, sum(c) AS pc FROM counts GROUP BY p)
  SELECT gram, ln(c::double) - ln(pc::double) AS logp
  FROM (SELECT * FROM counts WHERE c >= 2 ORDER BY c DESC, gram LIMIT 50) k
  JOIN prefix ON substr(k.gram, 1, 2) = prefix.p
),
doc_grams AS (
  SELECT substr(t, i, 3) AS gram
  FROM (SELECT t FROM norm ORDER BY doc_id LIMIT 1) d,
       unnest(generate_series(1, greatest(length(t) - 2, 0))) AS u(i)
  WHERE length(t) >= 3
)
SELECT CAST(SUM(CAST(coalesce(model.logp, -16.0) AS DECIMAL(28,14))) AS DOUBLE) / COUNT(*)
FROM doc_grams LEFT JOIN model USING (gram)
"""
    ).fetchone()[0]
    assert math.isclose(got_mean, want_mean, rel_tol=1e-12)


def test_perplexity_self_score_equals_two_pass(spark, sf_dir):
    """The shared-explode self-scoring path must equal train-then-
    score exactly (same model, same means, bit-for-bit)."""
    from d2d_spark.operators.ngram_lm import (
        perplexity_score,
        perplexity_self_score,
        train_char_lm,
    )

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text").limit(80)
    lm = train_char_lm(docs, "text", n=3, vocab_size=200, min_count=2)
    want = {
        r.doc_id: r.mean_logp
        for r in perplexity_score(docs, lm, "text", "doc_id", floor_logp=-16.0).collect()
    }
    got = {
        r.doc_id: r.mean_logp
        for r in perplexity_self_score(
            docs, "text", "doc_id", n=3, vocab_size=200, min_count=2, floor_logp=-16.0
        ).collect()
    }
    assert got == want  # exact equality: both means are decimal-sum exact


def test_perplexity_filter_stream_equals_batch(spark, sf_dir, tmp_path):
    """Perplexity scores are per-document (one groupBy on the doc id),
    so applying the filter per micro-batch via foreachBatch equals one
    batch pass — the incremental-crawl usage shape."""
    from d2d_spark.operators.ngram_lm import perplexity_filter, train_char_lm
    from d2d_spark.streaming.filestream import file_stream

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text").limit(60)
    lm = train_char_lm(docs, "text", n=3, vocab_size=20_000)
    lm = lm.localCheckpoint(eager=True)  # static side of the per-batch join

    src = str(tmp_path / "ppl_src")
    docs.write.parquet(src)
    batch_df = spark.read.parquet(src)
    # threshold at the batch median so the filter genuinely splits
    import statistics

    from d2d_spark.operators.ngram_lm import perplexity_score

    ppls = [r.ppl for r in perplexity_score(batch_df, lm, "text", "doc_id").collect() if r.ppl]
    cut = statistics.median(ppls)
    expected = {r.doc_id for r in perplexity_filter(batch_df, lm, "text", "doc_id", cut).collect()}
    assert 0 < len(expected) < 60

    got = set()
    stream = file_stream(spark, src, batch_df.schema, max_files_per_trigger=2)
    q = (
        stream.writeStream.foreachBatch(
            lambda bdf, _bid: got.update(
                r.doc_id for r in perplexity_filter(bdf, lm, "text", "doc_id", cut).collect()
            )
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert got == expected


def test_split_sentences_rules(spark):
    from pyspark.sql import functions as F

    from d2d_spark.functions.text import sentence_count, split_sentences

    rows = spark.createDataFrame(
        [
            (1, 'One. Two!  Three? "Quoted." After'),
            (2, "no terminal punctuation at all"),
            (3, "   "),
            (4, None),
        ],
        "id long, text string",
    ).select("id", split_sentences(F.col("text")).alias("s"),
             sentence_count(F.col("text")).alias("n"))
    got = {r.id: (r.s, r.n) for r in rows.collect()}
    assert got[1] == (["One.", "Two!", "Three?", '"Quoted."', "After"], 5)
    assert got[2] == (["no terminal punctuation at all"], 1)
    assert got[3] == ([], 0)
    assert got[4][0] is None


def test_chunk_by_sentences_greedy_fill_and_coverage(spark):
    from d2d_spark.operators.sampling import chunk_by_sentences

    text = "Aaaa bbb. Cc dd! Eeeee? Ff. " + "G" * 50 + ". Hh ii."
    df = spark.createDataFrame([(1, text), (2, ""), (3, None)], "doc_id long, text string")
    out = chunk_by_sentences(df, "text", "doc_id", max_chars=20)
    rows = sorted(
        ((r.doc_id, r.chunk_index, r.text) for r in out.collect())
    )
    by_doc = {}
    for d, i, c in rows:
        by_doc.setdefault(d, []).append((i, c))
    # chunks ordered, sentences intact, every chunk <= 20 chars except
    # the single oversized sentence
    chunks1 = [c for _, c in sorted(by_doc[1])]
    assert all(len(c) <= 20 or c.startswith("G" * 10) for c in chunks1)
    assert " ".join(chunks1).split() == text.split()  # full coverage, order kept
    assert chunks1[0] == "Aaaa bbb. Cc dd!"  # greedy fill packs two sentences
    # empty and NULL text keep one (empty) chunk row
    assert by_doc[2] == [(0, "")]
    assert by_doc[3] == [(0, "")]


def test_chunk_by_sentences_validates(spark):
    import pytest as pt

    from d2d_spark.operators.sampling import chunk_by_sentences

    df = spark.createDataFrame([(1, "x.")], "doc_id long, text string")
    with pt.raises(ValueError, match="max_chars"):
        chunk_by_sentences(df, "text", "doc_id", max_chars=0)


def test_temperature_weights_flatten_mixture(spark):
    import pytest as pt

    from d2d_spark.operators.sampling import mix_corpora, temperature_weights

    sizes = {"web": 1_000_000, "books": 10_000, "code": 100_000}
    # alpha=1: natural proportions -> every keep fraction is 1.0
    assert temperature_weights(sizes, alpha=1.0) == {
        "web": 1.0, "books": 1.0, "code": 1.0
    }
    # alpha=0: equal shares -> the smallest source keeps everything,
    # larger sources keep size_small/size ratios
    w0 = temperature_weights(sizes, alpha=0.0)
    assert w0["books"] == pt.approx(1.0)
    assert w0["code"] == pt.approx(0.1)
    assert w0["web"] == pt.approx(0.01)
    # intermediate alpha: resulting SHARES follow size^alpha exactly
    a = 0.3
    w = temperature_weights(sizes, alpha=a)
    shares = {k: sizes[k] * w[k] for k in sizes}
    target = {k: sizes[k] ** a for k in sizes}
    for k in sizes:
        for j in sizes:
            assert shares[k] / shares[j] == pt.approx(target[k] / target[j])
    # and the fractions drive mix_corpora end-to-end
    dfs = {
        k: (
            spark.range(n // 1000).selectExpr("id AS doc_id"),
            w[k],
        )
        for k, n in sizes.items()
    }
    mixed = mix_corpora(dfs, "doc_id")
    counts = {r["source"]: r["n"] for r in mixed.groupBy("source").count().withColumnRenamed("count", "n").collect()}
    assert counts["books"] == 10  # fraction 1.0 keeps all 10 rows
    with pt.raises(ValueError, match="alpha"):
        temperature_weights(sizes, alpha=-1)
    with pt.raises(ValueError, match="positive"):
        temperature_weights({"x": 0})
