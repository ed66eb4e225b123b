"""Streaming ingestion (SURVEY.md §2.9).

The reference is batch-only; its online surface is an in-memory FIFO job
queue with per-GPU workers and file-id dedup
(/root/reference/src/mmore/job_queue.py:67-184, run_index_api.py).  The
Spark-native analog is Structured Streaming over a staging directory:

    readStream (new parquet files under staging/)
      → the SAME extraction stage (mapInPandas works unchanged on
        streaming DataFrames)
      → foreachBatch: per-batch dedup against already-processed doc_ids
        (the queue's file-id dedup) + append to the triples table

``Trigger.AvailableNow`` drains everything currently staged and stops —
an incremental batch with streaming semantics (exactly the reference's
"process what's queued" behavior), checkpointed so a rerun only picks up
NEW files.  On a live cluster the same code runs continuously with a
processing-time trigger.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..corpus.generator import DOCUMENTS_SCHEMA
from ..functions.spans import render_text
from ..operators import extract


def stream_extract_triples(spark: SparkSession, staging_dir: str,
                           output_dir: str, checkpoint_dir: str) -> dict:
    """Drain the staging directory once (Trigger.AvailableNow) and append
    newly-extracted triples to ``output_dir``; returns counters.

    Dedup contract (job_queue.py file-id dedup): a doc_id that already has
    triples in the output never produces rows again, even if re-staged.
    """
    stream = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(staging_dir)
    )
    rendered = stream.select("doc_id", render_text("spans").alias("text"))
    combined = extract.extract_combined(rendered, "text")
    counters = {"batches": 0, "rows_in": 0, "rows_written": 0}

    # Narrow side table of already-ingested doc_ids: the per-batch dedup
    # anti-join reads THIS (one column, tiny) instead of re-scanning the
    # whole triples table every micro-batch — at 10^12-doc scale the
    # output is huge but the id set stays a thin fraction of it.
    # Underscore prefix → ignored by Spark when reading output_dir itself.
    seen_dir = os.path.join(output_dir, "_seen_ids")

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        counters["batches"] += 1
        # in-batch dedup: two staged files carrying the same doc_id in one
        # micro-batch would both pass the anti-join below (ADVICE r01) —
        # the queue's file-id dedup applies within a drain too
        batch_df = batch_df.dropDuplicates(["doc_id"])
        triples = batch_df.select("doc_id", F.explode("triples").alias("t")).select(
            "doc_id",
            F.col("t.subj").alias("subj"),
            F.col("t.obj").alias("obj"),
            F.col("t.pred").alias("pred"),
            F.col("t.weight").alias("weight"),
        )
        counters["rows_in"] += triples.count()
        spark_b = batch_df.sparkSession
        if os.path.isdir(seen_dir) and any(
            f.endswith(".parquet") for f in os.listdir(seen_dir)
        ):
            seen = spark_b.read.parquet(seen_dir).distinct()
            triples = triples.join(seen, "doc_id", "left_anti")
        n = triples.count()
        counters["rows_written"] += n
        if n:
            triples.write.mode("append").parquet(output_dir)
            triples.select("doc_id").distinct().write.mode("append").parquet(seen_dir)
            spark_b.catalog.refreshByPath(seen_dir)

    q = (
        combined.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return counters
