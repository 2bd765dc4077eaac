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


# -- GPT-3-style quality scoring/filtering ----------------------------
def _quality_corpora(spark):
    good = spark.createDataFrame(
        [(i, "the house stood beside the river and light came through the trees")
         for i in range(40)],
        ["doc_id", "text"],
    )
    raw_rows = [
        (i, "the house stood beside the river and light came through the trees")
        for i in range(20)
    ] + [
        (100 + i, "buy cheap pills now click here winner casino bonus offer deal")
        for i in range(20)
    ]
    raw = spark.createDataFrame(raw_rows, ["doc_id", "text"])
    return good, raw


def test_quality_score_separates_seedlike_from_spam(spark):
    from d2d_spark.operators.classifier import nb_quality_score

    good, raw = _quality_corpora(spark)
    out = {r.doc_id: r.quality_prob for r in
           nb_quality_score(raw, good, "text", "doc_id").collect()}
    seedlike = [out[i] for i in range(20)]
    spam = [out[100 + i] for i in range(20)]
    assert min(seedlike) > max(spam)
    assert all(0.0 < v < 1.0 for v in out.values())


def test_quality_filter_prefers_seedlike_and_is_deterministic(spark):
    from d2d_spark.operators.classifier import nb_quality_filter

    good, raw = _quality_corpora(spark)
    kept1 = {r.doc_id for r in nb_quality_filter(raw, good, "text", "doc_id").collect()}
    kept2 = {r.doc_id for r in nb_quality_filter(raw, good, "text", "doc_id").collect()}
    assert kept1 == kept2
    n_seedlike = sum(1 for i in kept1 if i < 100)
    n_spam = len(kept1) - n_seedlike
    assert n_seedlike > n_spam
    # Pareto tail: spam is suppressed hard but the rule is not a
    # cliff — P(keep) is (2 - score)^-9 >= 2^-9 > 0, so no assertion
    # that spam count is zero


def test_quality_score_zero_token_doc_gets_prior(spark):
    from d2d_spark.operators.classifier import nb_quality_score

    good, raw = _quality_corpora(spark)
    raw2 = raw.union(spark.createDataFrame([(999, "!!!")], ["doc_id", "text"]))
    out = {r.doc_id: r.quality_prob for r in
           nb_quality_score(raw2, good, "text", "doc_id").collect()}
    assert out[999] is not None and 0.0 < out[999] < 1.0
