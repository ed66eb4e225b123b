"""Trainable character-n-gram language ID — the langdetect seam made
real natively (SURVEY.md §2.3; reference tagger/lang_detector.py:7-18
wraps the langdetect library, itself a char-n-gram Naive Bayes).

Train: labeled (text, lang) sample → per-language trigram log-probability
profiles (Laplace-smoothed, top-K trigrams per language) — a
DIMENSION-scale DataFrame.  Classify: explode each doc's trigrams, one
broadcast join against the profiles, per-(doc, lang) log-likelihood sum
with a per-language smoothing floor for unseen trigrams, argmax.  Every
step is native (explode / broadcast join / groupBy / max_by) — no Python
in the hot path, and the only shuffle keys are (doc_id) aggregations.

The heuristic ``lang_heuristic`` tagger (oracle row tag_lang_guess) stays
the zero-training default; this operator is for corpora with a labeled
sample.  Exact langdetect parity remains untestable here (library
absent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def char_trigrams(text_col: str) -> F.Column:
    """array of character trigrams of lower-cased text (positions overlap,
    as in langdetect's n-gram extraction).  The text is split into a
    char ARRAY once (let-style outer transform) and trigrams assemble via
    O(1) ``element_at`` — both ``lower(text)`` inside the per-position
    lambda (no CSE across lambda boundaries) and ``substring(__lt, i, 3)``
    (UTF-8 seek from the string start per call) are O(chars²) per doc;
    measured 272 s for ONE 340k-char doc vs 1.3 s with this shape."""
    # sequence(1, 0) is DESCENDING [1, 0] in Spark, not empty — docs under
    # 3 chars must short-circuit to array() or element_at goes out of
    # bounds (throws under ANSI mode)
    return F.expr(
        f"flatten(transform(array(split(lower({text_col}), '')), __ch -> "
        f"if(size(__ch) < 3, array(), "
        f"transform(sequence(1, size(__ch) - 2), "
        f"__ti -> concat(element_at(__ch, __ti), "
        f"element_at(__ch, __ti + 1), element_at(__ch, __ti + 2))))))"
    )


def train_langid(labeled: DataFrame, text_col: str = "text",
                 lang_col: str = "lang", top_k: int = 4000) -> DataFrame:
    """(text, lang) sample → profiles (lang, tri, logp, floor_logp).

    logp = log((c + 1) / (N_lang + V)) over the language's trigram counts
    (Laplace); floor_logp = log(1 / (N_lang + V)) is the same formula at
    c = 0, charged per unseen trigram at classification time so languages
    with small profiles are not rewarded for missing evidence."""
    tri = labeled.select(
        F.col(lang_col).alias("lang"),
        F.explode(char_trigrams(text_col)).alias("tri"),
    )
    counts = tri.groupBy("lang", "tri").agg(F.count("*").alias("c"))
    vocab = counts.select("tri").distinct().count()
    totals = counts.groupBy("lang").agg(F.sum("c").alias("n"))
    w = Window.partitionBy("lang").orderBy(F.desc("c"), F.asc("tri"))
    top = counts.withColumn("_rk", F.row_number().over(w)) \
        .filter(F.col("_rk") <= top_k).drop("_rk")
    return (
        top.join(totals, "lang")
        .select(
            "lang", "tri",
            F.log((F.col("c") + 1) / (F.col("n") + F.lit(vocab))).alias("logp"),
            F.log(F.lit(1.0) / (F.col("n") + F.lit(vocab))).alias("floor_logp"),
        )
        # dimension-scale (≤ top_k × n_langs rows): pin for the broadcast
        .localCheckpoint()
    )


def load_langdetect_profiles(spark, paths: "list[str] | str") -> DataFrame:
    """Load langdetect's OWN profile artifacts (the language-detection
    project's public JSON format: ``{"name": lang, "freq": {ngram:
    count}, "n_words": [n1, n2, n3]}``, one file per language —
    langdetect ships them under ``langdetect/profiles/``) into the
    (lang, tri, logp, floor_logp) frame ``classify_lang`` consumes.

    Only the 3-gram rows are used (this operator is a trigram NB);
    counts are Laplace-smoothed exactly like ``train_langid`` with the
    vocabulary = distinct trigrams across the loaded profiles.  So a
    corpus owner with real langdetect profiles plugs them straight into
    the native classifier — the reference seam's artifact, no library
    needed.  Dimension-scale: profiles parse on the driver (a few MB),
    and the result pins with localCheckpoint for the broadcast join."""
    import glob as globmod
    import json
    import math
    import os

    if isinstance(paths, str):
        paths = sorted(
            globmod.glob(os.path.join(paths, "*"))) if os.path.isdir(paths) \
            else [paths]
    per_lang: dict[str, dict[str, int]] = {}
    totals: dict[str, int] = {}
    for p in paths:
        with open(p, encoding="utf-8") as f:
            prof = json.load(f)
        lang = prof["name"]
        tris = {k.lower(): int(v) for k, v in prof["freq"].items()
                if len(k) == 3}
        if not tris:
            continue
        per_lang[lang] = tris
        n_words = prof.get("n_words") or []
        totals[lang] = int(n_words[2]) if len(n_words) >= 3 \
            else sum(tris.values())
    vocab = len({t for tris in per_lang.values() for t in tris})
    rows = []
    for lang, tris in per_lang.items():
        n = totals[lang]
        floor = math.log(1.0 / (n + vocab))
        for tri, c in tris.items():
            rows.append((lang, tri, math.log((c + 1) / (n + vocab)), floor))
    from ..functions.localrel import local_df
    return local_df(
        spark, rows, "lang string, tri string, logp double, floor_logp double"
    ).localCheckpoint()


def classify_lang(df: DataFrame, profiles: DataFrame,
                  text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, text) → (id, lang_pred, lang_score) via Naive Bayes argmax.

    Every input id appears in the output (ADVICE r04: the inner-join
    shape silently dropped docs whose trigrams hit no profile, e.g. an
    unseen script): no-hit docs are charged the floor for all n trigrams
    — argmax of n·floor over languages is the max-floor language since
    floors are negative — and docs too short to yield a trigram get a
    null prediction."""
    floors = profiles.select("lang", "floor_logp").distinct()
    doc_tri = (
        df.select(id_col, F.explode(char_trigrams(text_col)).alias("tri"))
        .groupBy(id_col, "tri").agg(F.count("*").alias("c"))
    )
    n_tri = doc_tri.groupBy(id_col).agg(F.sum("c").alias("_n"))
    matched = (
        doc_tri.join(F.broadcast(profiles), "tri")
        .groupBy(id_col, "lang")
        .agg(F.sum(F.col("c") * F.col("logp")).alias("_m"),
             F.sum("c").alias("_mc"))
    )
    scored = (
        matched.join(F.broadcast(floors), "lang")
        .join(n_tri, id_col)
        .select(
            id_col, "lang",
            (F.col("_m") + (F.col("_n") - F.col("_mc")) * F.col("floor_logp"))
            .alias("score"),
        )
    )
    preds = scored.groupBy(id_col).agg(
        F.max_by("lang", F.struct(F.col("score"), F.col("lang")))
        .alias("lang_pred"),
        F.max("score").alias("lang_score"),
    )
    best_floor = floors.orderBy(F.desc("floor_logp"), F.asc("lang")).limit(1)
    no_hits = (
        n_tri.join(preds.select(id_col), id_col, "left_anti")
        .crossJoin(F.broadcast(best_floor))
        .select(id_col, F.col("lang").alias("lang_pred"),
                (F.col("_n") * F.col("floor_logp")).alias("lang_score"))
    )
    no_tri = (
        df.select(id_col).distinct()
        .join(n_tri.select(id_col), id_col, "left_anti")
        .select(id_col, F.lit(None).cast("string").alias("lang_pred"),
                F.lit(None).cast("double").alias("lang_score"))
    )
    return preds.unionByName(no_hits).unionByName(no_tri)
