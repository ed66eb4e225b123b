"""Filter family + multimodal plumbing tests."""

import os

from pyspark.sql import functions as F

from mmore_spark.operators import filters as FL
from mmore_spark.operators import multimodal as MM


def _docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "en", "web"),
        (2, "xx", "en", "web"),                        # too short → gopher_quality
        (3, "spam spam spam spam spam spam spam", "en", "spamhost"),  # url + repetition
        (4, "une phrase sans stopwords anglais ici present", "fr", "web"),
        (5, "a solid document with the usual words and enough length", "en", "web"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")


def test_apply_filters_and_exclusion_writer(spark, tmp_path):
    df = _docs(spark)
    rejected = str(tmp_path / "rejected")
    kept = FL.apply_filters(
        df,
        {
            "gopher_quality": FL.filter_gopher_quality(min_words=5),
            "url": FL.filter_url(),
            "c4": FL.filter_c4_quality(),
            "lang": FL.filter_language(allowed=("en",)),
        },
        rejected_path=rejected,
    )
    assert {r["doc_id"] for r in kept.collect()} == {1, 5}
    rej = spark.read.parquet(rejected)
    by = {r["doc_id"]: r["_rejected_by"] for r in rej.collect()}
    assert by[2] == "gopher_quality"
    assert by[3] == "url"
    assert by[4] in ("c4", "lang")
    assert os.path.exists(rejected)


def test_sampler_deterministic_and_rate(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    keep = FL.sampler(0.25)
    a = df.filter(keep(df)).count()
    b = df.repartition(7).filter(keep(df)).count()
    assert a == b
    assert abs(a / 2000 - 0.25) < 0.05


def test_repetition_filter(spark):
    df = spark.createDataFrame(
        [(1, "word " * 50), (2, "many different tokens appear here once each time")],
        "doc_id long, text string")
    fn = FL.filter_gopher_repetition(max_top_word_ratio=0.3)
    kept = df.filter(fn(df))
    assert {r["doc_id"] for r in kept.collect()} == {2}


def test_repetition_filter_long_doc_linear(spark):
    """Regression (VERDICT r01 #2): the repetition gate must stay linear-
    ish per document — a 60k-word doc was quadratic (nested scan) before.
    Bounded-time completion + correct verdicts on both sides of the
    threshold."""
    import time

    hot = ("spam " * 20000 + "unique" + " filler" * 40000).strip()   # top ratio ≈ 1/3
    cool = " ".join(f"w{i % 9973}" for i in range(60000))            # ratio ≈ 7/60000
    df = spark.createDataFrame([(1, hot), (2, cool)], "doc_id long, text string")
    fn = FL.filter_gopher_repetition(max_top_word_ratio=0.2)
    t0 = time.time()
    kept = {r["doc_id"] for r in df.filter(fn(df)).collect()}
    assert kept == {2}
    assert time.time() - t0 < 30  # quadratic form needed >minutes at 60k words


def test_unigram_logprob_scores(spark):
    """Corpus-derived unigram model: rare-word docs score lower than
    common-word docs; scores are exact per hand computation."""
    import math

    df = spark.createDataFrame(
        [(1, "common common common"), (2, "common rare")],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in FL.unigram_logprob_scores(df).collect()}
    # corpus: common×4, rare×1, total 5
    p_common, p_rare = 4 / 5, 1 / 5
    assert got[1]["n_words"] == 3
    assert abs(got[1]["avg_logprob"] - math.log10(p_common)) < 1e-9
    expect2 = (math.log10(p_common) + math.log10(p_rare)) / 2
    assert abs(got[2]["avg_logprob"] - expect2) < 1e-9
    assert got[2]["avg_logprob"] < got[1]["avg_logprob"]


def test_media_features_and_gate(spark, small_docs_df):
    feats = MM.extract_media_features(small_docs_df)
    rows = feats.collect()
    assert len(rows) > 0
    # every media span surfaced exactly once
    n_media = small_docs_df.select(
        F.sum(F.size(F.filter("spans", lambda s9: s9["kind"] != F.lit("text"))))
    ).first()[0]
    assert len(rows) == n_media
    # deterministic features (fake decoder keyed on media_ref)
    again = {(r["media_ref"], r["width"], r["variance"]) for r in
             MM.extract_media_features(small_docs_df).collect()}
    assert {(r["media_ref"], r["width"], r["variance"]) for r in rows} == again

    gated = MM.image_quality_gate(feats)
    gr = gated.filter(F.col("kind") == "image").collect()
    for r in gr:
        expected = r["width"] >= 512 and r["height"] >= 512 and r["variance"] >= 100
        assert r["keep"] == expected
    # non-images always pass the image gate
    assert gated.filter((F.col("kind") != "image") & ~F.col("keep")).count() == 0


def test_real_decoder_is_stubbed():
    import pytest

    with pytest.raises(NotImplementedError):
        MM.real_decoder("x.png", None, "image")
