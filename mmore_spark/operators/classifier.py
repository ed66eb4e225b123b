"""Trainable quality classifier — the fasttext seam made real with
Spark ML (SURVEY.md §2.4; reference: datatrove's fasttext filter wraps a
pretrained ``model.bin``, filter/datatrove_wrapper.py family).

fasttext's classifier IS a linear model over averaged bag-of-n-gram
embeddings; the Spark-native equivalent with the same feature shape is
``HashingTF`` over word+bigram tokens into ``LogisticRegression`` — all
JVM-side (pyspark.ml), no external model file, trainable on any labeled
sample and applied to the full corpus as a regular DataFrame transform.
A pretrained fasttext ``model.bin`` (absent in this sandbox) would slot
into the same ``FilterFn`` seam as a pandas-UDF predicate; this module is
the in-engine path for when labels exist but the binary does not.

Scale shape: training runs on a labeled SAMPLE (dimension-scale);
inference is one ``model.transform`` — a narrow projection feeding a
broadcast-coefficient dot product, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _tokenize(df: DataFrame, text_col: str) -> DataFrame:
    """words + adjacent-word bigrams — fasttext's default wordNgrams=2
    feature set, built natively.  The word array is materialized ONCE and
    bigrams come from zip_with over two pre-sliced views: an expression
    like ``split(text)`` inside the lambda would re-split the document
    per element (O(words²) per doc — interpreted HOFs do not CSE across
    the lambda boundary)."""
    return (
        df.withColumn("_w", F.split(F.col(text_col), r"\s+"))
        .withColumn("_tokens", F.expr(
            "concat(_w, zip_with("
            "slice(_w, 1, greatest(size(_w) - 1, 0)), "
            "slice(_w, 2, greatest(size(_w) - 1, 0)), "
            "(__x, __y) -> concat(__x, '_', __y)))"
        ))
        .drop("_w")
    )


def train_quality_classifier(labeled: DataFrame, text_col: str = "text",
                             label_col: str = "label",
                             n_features: int = 1 << 18,
                             max_iter: int = 30):
    """labeled(text, label∈{0,1}) → fitted PipelineModel
    (HashingTF → IDF-free LogisticRegression, fasttext's model family)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF

    tf = HashingTF(inputCol="_tokens", outputCol="_features",
                   numFeatures=n_features)
    lr = LogisticRegression(featuresCol="_features", labelCol=label_col,
                            maxIter=max_iter, regParam=1e-4)
    pipe = Pipeline(stages=[tf, lr])
    return pipe.fit(_tokenize(labeled, text_col))


def score_quality(model, df: DataFrame, text_col: str = "text") -> DataFrame:
    """Apply a trained model: adds ``quality_prob`` (P(label=1)) and
    ``quality_pred``; drops the intermediate feature columns."""
    from pyspark.ml.functions import vector_to_array

    out = model.transform(_tokenize(df, text_col))
    prob1 = F.element_at(vector_to_array(F.col("probability")), 2)
    return (
        out.withColumn("quality_prob", prob1)
        .withColumn("quality_pred", F.col("prediction").cast("int"))
        .drop("_tokens", "_features", "rawPrediction", "probability",
              "prediction")
    )


def quality_filter(model, text_col: str = "text", min_prob: float = 0.5):
    """FilterFn-shaped gate backed by the trained classifier — drops in
    next to the heuristic filters in apply_filters via score-then-filter
    (the model transform must run before the column test)."""
    def apply(df: DataFrame) -> DataFrame:
        return score_quality(model, df, text_col).filter(
            F.col("quality_prob") >= min_prob)
    return apply
