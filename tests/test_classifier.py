"""operators/classifier: the trainable fasttext-family quality gate
(HashingTF word+bigram features → LogisticRegression, pyspark.ml)."""

from pyspark.sql import functions as F

from mmore_spark.operators.classifier import (
    _tokenize,
    quality_filter,
    score_quality,
    train_quality_classifier,
)


def _labeled(spark, n=80):
    rows = []
    for i in range(n):
        # "good": fluent template with stopwords; "bad": id-gibberish
        rows.append((f"the quick report number {i} describes the results "
                     f"of the study in plain words", 1))
        rows.append((f"x{i}q zz{i * 7}k qqn{i} vvv{i * 3}p mmm{i}z "
                     f"jj{i * 11}w", 0))
    return spark.createDataFrame(rows, "text string, label int")


def test_tokenize_words_and_bigrams(spark):
    df = spark.createDataFrame([("a b c",), ("solo",)], ["text"])
    got = {r["text"]: r["_tokens"] for r in _tokenize(df, "text").collect()}
    assert got["a b c"] == ["a", "b", "c", "a_b", "b_c"]
    assert got["solo"] == ["solo"]


def test_train_score_filter_roundtrip(spark):
    train = _labeled(spark, n=60)
    model = train_quality_classifier(train)
    # held-out set: same generative families, unseen ids
    test_rows = [(f"the detailed report number {i} explains the results "
                  f"in plain words", 1) for i in range(900, 920)]
    test_rows += [(f"k{i}w qq{i}j zzz{i}m vv{i}t", 0) for i in range(900, 920)]
    test = spark.createDataFrame(test_rows, "text string, label int")
    scored = score_quality(model, test)
    acc = scored.filter(F.col("quality_pred") == F.col("label")).count() / 40
    assert acc >= 0.9, acc
    assert {"quality_prob", "quality_pred"} <= set(scored.columns)
    assert "_features" not in scored.columns
    # the FilterFn-shaped gate keeps (mostly) the fluent docs
    kept = quality_filter(model, min_prob=0.5)(test.drop("label"))
    texts = [r["text"] for r in kept.collect()]
    assert all("report" in t for t in texts)
    assert len(texts) >= 18
