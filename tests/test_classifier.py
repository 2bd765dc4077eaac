"""Naive-Bayes text classifier (operators/classifier.py): the driver
query hash-checks the full fit+score against DuckDB; these tests pin
the semantic contracts the hash can't express — separability on a
signal-bearing corpus, determinism under repartitioning, the
two-step == self-scoring equivalence, and the edge rows (zero-token
documents, model size bound)."""

from __future__ import annotations

from pyspark.sql import functions as F

from d2d_spark.operators.classifier import (
    classify,
    classify_self,
    train_nb_classifier,
)


def _toy(spark):
    rows = []
    for i in range(30):
        rows.append((i, "apple banana cherry fruit salad apple", "fruit"))
    for i in range(30, 60):
        rows.append((i, "bolt wrench gear piston engine bolt", "machine"))
    # held-out-ish rows: same vocabularies, fewer tokens; one per
    # label keeps the class priors EXACTLY tied (31 vs 31) so the
    # zero-token test exercises the lexicographic tie-break for real
    rows.append((100, "apple banana", "fruit"))
    rows.append((101, "gear piston", "machine"))
    return spark.createDataFrame(rows, ["doc_id", "text", "label"])


def test_separable_corpus_classifies_perfectly(spark):
    d = _toy(spark)
    out = classify_self(d, "text", "label", "doc_id")
    wrong = out.filter(F.col("predicted") != F.col("label")).count()
    assert wrong == 0


def test_two_step_equals_self_scoring(spark):
    d = _toy(spark)
    model = train_nb_classifier(d, "text", "label")
    two = classify(d, model, "text", "doc_id")
    one = classify_self(d, "text", "label", "doc_id")
    cols = ["doc_id", "predicted", "logscore"]
    assert two.select(cols).exceptAll(one.select(cols)).count() == 0
    assert one.select(cols).exceptAll(two.select(cols)).count() == 0


def test_deterministic_under_repartitioning(spark):
    d = _toy(spark)
    a = {(r.doc_id, r.predicted, r.logscore) for r in classify_self(d, "text", "label", "doc_id").collect()}
    b = {
        (r.doc_id, r.predicted, r.logscore)
        for r in classify_self(d.repartition(7), "text", "label", "doc_id").collect()
    }
    assert a == b


def test_zero_token_doc_gets_prior_label(spark):
    # add one zero-token doc per label: priors stay tied 32 vs 32, so
    # the prior fallback must break the tie to the lexicographically
    # smallest label for BOTH rows
    d = _toy(spark).union(
        spark.createDataFrame(
            [(200, "???!!!...", "fruit"), (201, "...!!!", "machine")],
            ["doc_id", "text", "label"],
        )
    )
    out = classify_self(d, "text", "label", "doc_id")
    rows = {r.doc_id: r for r in out.filter(F.col("doc_id") >= 200).collect()}
    assert rows[200]["predicted"] == "fruit"
    assert rows[201]["predicted"] == "fruit"
    assert rows[200]["logscore"] is not None


def test_model_size_bounded_by_vocab(spark):
    d = _toy(spark)
    model = train_nb_classifier(d, "text", "label", vocab_size=3)
    n_labels = 2
    # <= vocab_size * n_labels likelihood rows + n_labels meta rows
    assert model.count() <= 3 * n_labels + n_labels
    # scoring still works with the truncated vocabulary
    out = classify(d, model, "text", "doc_id")
    assert out.count() == d.count()


def test_unseen_tokens_score_floor_not_crash(spark):
    train = spark.createDataFrame(
        [(1, "aa bb cc", "x"), (2, "dd ee ff", "y")], ["doc_id", "text", "label"]
    )
    model = train_nb_classifier(train, "text", "label")
    test = spark.createDataFrame([(9, "zz qq ww", "?")], ["doc_id", "text", "label"])
    out = classify(test, model, "text", "doc_id").collect()[0]
    assert out["predicted"] in ("x", "y")
