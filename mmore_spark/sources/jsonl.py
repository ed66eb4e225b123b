"""mmore-format JSONL ingestion (SURVEY.md §2.1 "JSONL reader").

The reference persists ``MultimodalSample`` dicts one-per-line
(/root/reference/src/mmore/type.py:127-137; streaming variant
incremental.py:12-21): ``{text, modalities: [{type, value}], metadata…,
id}`` with ``<attachment>`` placeholders inline in ``text``.

Spark mapping: ``spark.read.json`` with an EXPLICIT schema (no inference
scan at 100 TB), then the native spans_from_text transform converts the
(text, modalities) pair into the engine's ordered-spans form.  Fully
declarative — predicate pushdown and column pruning reach the JSON scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from ..functions.spans import spans_from_text

MMORE_SAMPLE_SCHEMA = T.StructType([
    T.StructField("id", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("modalities", T.ArrayType(T.StructType([
        T.StructField("type", T.StringType()),
        T.StructField("value", T.StringType()),
    ]))),
    T.StructField("metadata", T.StructType([
        T.StructField("file_path", T.StringType()),
        T.StructField("processed_at", T.StringType()),
        T.StructField("processor_type", T.StringType()),
    ])),
])


def read_mmore_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSONL → engine documents table (doc_id, spans, file_path,
    processed_at, processor_type).

    ``doc_id`` uses the sample id when present; the reference's default id
    is Python's SALTED string hash (type.py:88-90 — nondeterministic
    across interpreter runs, SURVEY.md §1.2 quirk #2), so rows without a
    stable id get a deterministic md5 of the text instead.
    """
    raw = spark.read.schema(MMORE_SAMPLE_SCHEMA).json(path)
    mods = F.transform(
        F.coalesce(F.col("modalities"), F.array()),
        lambda jmod: F.struct(
            jmod["type"].alias("kind"), jmod["value"].alias("media_ref")
        ),
    )
    return raw.select(
        F.coalesce(F.col("id"), F.md5(F.col("text"))).alias("doc_id"),
        spans_from_text(F.coalesce(F.col("text"), F.lit("")), mods).alias("spans"),
        F.col("metadata.file_path").alias("file_path"),
        F.col("metadata.processed_at").alias("processed_at"),
        F.col("metadata.processor_type").alias("processor_type"),
    )


def write_mmore_jsonl(df: DataFrame, path: str) -> None:
    """Inverse: engine documents table → mmore-format JSONL (merged-results
    sink compatibility, run_process.py:56-81)."""
    from ..functions.spans import media_refs, render_text

    out = df.select(
        F.col("doc_id").alias("id"),
        render_text("spans").alias("text"),
        F.transform(
            media_refs("spans"),
            lambda wmod: F.struct(
                wmod["kind"].alias("type"), wmod["media_ref"].alias("value")
            ),
        ).alias("modalities"),
    )
    out.write.mode("overwrite").json(path)
