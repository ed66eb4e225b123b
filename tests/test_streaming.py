"""Structured-Streaming ingestion: AvailableNow drain, checkpointed
incremental pickup, doc-id dedup (the reference job-queue contract)."""

import os

from mmore_spark.corpus.generator import generate_documents
from mmore_spark.streaming.ingest import stream_extract_triples


def test_stream_drain_resume_and_dedup(spark, tmp_path):
    staging = str(tmp_path / "staging")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(staging)

    # stage batch 1: docs 0..39
    generate_documents(spark, 40, seed=42).write.mode("append").parquet(staging)
    c1 = stream_extract_triples(spark, staging, out, ckpt)
    assert c1["batches"] >= 1 and c1["rows_written"] > 0
    n1 = spark.read.parquet(out).count()
    assert n1 == c1["rows_written"]

    # drain again with nothing new: checkpoint prevents reprocessing
    c2 = stream_extract_triples(spark, staging, out, ckpt)
    assert c2["rows_written"] == 0
    assert spark.read.parquet(out).count() == n1

    # stage batch 2: 20 NEW docs + re-stage 40 OLD docs (dedup must drop them)
    generate_documents(spark, 60, seed=42).write.mode("append").parquet(staging)
    c3 = stream_extract_triples(spark, staging, out, ckpt)
    assert c3["rows_in"] > c3["rows_written"] > 0  # old doc_ids were dropped
    final = spark.read.parquet(out)
    assert final.count() == n1 + c3["rows_written"]
    # every doc_id appears from exactly one ingestion (no duplicates)
    assert final.select("doc_id", "subj", "obj").distinct().count() == final.count()


def test_stream_dedup_within_batch(spark, tmp_path):
    """Two staged files carrying the SAME doc_ids drained in one micro-batch
    must still write each doc's triples once (ADVICE r01: the anti-join
    only guards against already-written output)."""
    staging = str(tmp_path / "staging2")
    out = str(tmp_path / "out2")
    ckpt = str(tmp_path / "ckpt2")
    os.makedirs(staging)
    docs = generate_documents(spark, 30, seed=7)
    docs.write.mode("append").parquet(staging)
    docs.write.mode("append").parquet(staging)  # duplicate staging files
    c = stream_extract_triples(spark, staging, out, ckpt)
    final = spark.read.parquet(out)
    assert c["rows_written"] == final.count()
    assert final.select("doc_id", "subj", "obj").distinct().count() == final.count()
