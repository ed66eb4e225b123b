"""Translator post-processor (SURVEY.md §2.3).

Reference (/root/reference/src/mmore/process/post_processor/translator/
base.py:87-125): classify language (confidence-gated), translate each
inter-``<attachment>`` segment separately, re-join on the tag — so the
positional multimodality contract survives translation — and stash the
original text in metadata.

Spark shape: ONE Arrow-batched stage; the translate function is pluggable
(the real model is external — the default is a deterministic fake that
word-reverses segments, which exercises every contract property: tag
count preserved, segment boundaries preserved, original stashed).
"""

from __future__ import annotations

from typing import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..corpus.generator import ATTACHMENT_TAG

TranslateFn = Callable[[str, str], str]  # (segment, src_lang) -> translated


def fake_translate(segment: str, src_lang: str) -> str:
    """Deterministic stand-in: reverses word order per segment."""
    return " ".join(reversed(segment.split(" ")))


def translate_text(text: str, translate: TranslateFn, lang: str) -> str:
    """Segment-split / re-join contract (translator/base.py:87-125): each
    inter-``<attachment>`` segment translates independently, blank segments
    pass through, the tag count is preserved — so rebuilding spans from the
    translated text keeps the (kind, media_ref, order) skeleton intact
    (property-tested in tests/test_spans_property.py)."""
    segments = text.split(ATTACHMENT_TAG)
    return ATTACHMENT_TAG.join(
        translate(seg, lang) if seg.strip() else seg for seg in segments
    )


TRANSLATED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("original_text", T.StringType()),
    T.StructField("translated", T.BooleanType()),
])


def translate_stage(df: DataFrame, translate: TranslateFn = fake_translate,
                    skip_langs: tuple[str, ...] = ("en",),
                    lang_col: str = "lang", text_col: str = "text") -> DataFrame:
    """(doc_id, text, lang) → translated text with the attachment contract
    preserved; docs already in ``skip_langs`` pass through untouched
    (the reference's confidence/language gate)."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, text, lang in zip(pdf["doc_id"], pdf[text_col], pdf[lang_col]):
                text = text or ""
                if lang in skip_langs:
                    rows.append({"doc_id": doc_id, "text": text,
                                 "original_text": text, "translated": False})
                    continue
                translated = translate_text(text, translate, lang)
                rows.append({"doc_id": doc_id, "text": translated,
                             "original_text": text, "translated": True})
            yield pd.DataFrame(rows, columns=[f.name for f in TRANSLATED_SCHEMA.fields])

    return df.select("doc_id", text_col, lang_col).mapInPandas(
        run, schema=TRANSLATED_SCHEMA)
