"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship: full KG pipeline (render → extract → link →
                 canonicalize → global merge) over the interleaved corpus
                 derived deterministically from sf0.001 documents.
queries()      — one entry per implemented operator (SURVEY.md §2 +
                 training-data ops); most have DuckDB oracle twins in
                 oracle_sql(), generated from the same SQL builder
                 (mmore_spark/entryqueries.py).
oracle_sql()   — the DuckDB twins; pipeline-level queries (iterative
                 connected components) are rows-only checked.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: global canonical triples."""
    from mmore_spark.corpus.derive import derived_documents
    from mmore_spark.operators.agg import merge_triples_global
    from mmore_spark.plans.pipeline import build_graph

    docs = derived_documents(spark, "/root/testdata/sf0.001")
    _, canonical_triples, _, _ = build_graph(docs)
    return merge_triples_global(canonical_triples)


def _kg_pipeline_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full pipeline → globally merged canonical triples (iterative
    connected-components stage → no SQL oracle; rows-only check)."""
    from mmore_spark.corpus.derive import derived_documents
    from mmore_spark.operators.agg import merge_triples_global
    from mmore_spark.plans.pipeline import build_graph

    docs = derived_documents(spark, sf_dir)
    _, canonical_triples, _, _ = build_graph(docs)
    merged = merge_triples_global(canonical_triples)
    return merged.select(
        "subj", "obj", F.concat_ws(",", "pred").alias("preds"), "weight", "n_docs"
    )


def _kg_pipeline_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical entity table with alias members (rows-only check)."""
    from mmore_spark.corpus.derive import derived_documents
    from mmore_spark.plans.pipeline import build_graph

    docs = derived_documents(spark, sf_dir)
    _, _, entities, _ = build_graph(docs)
    return entities.select(
        "canonical_id",
        "canonical_name",
        "entity_type",
        F.concat_ws(",", "members").alias("members"),
        "n_mentions",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from mmore_spark.entryqueries import QUERIES

    out = dict(QUERIES)
    out["kg_pipeline_triples"] = _kg_pipeline_triples
    out["kg_pipeline_entities"] = _kg_pipeline_entities
    return out


def oracle_sql() -> dict[str, str]:
    from mmore_spark.entryqueries import ORACLE

    return dict(ORACLE)
