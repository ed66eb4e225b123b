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

Exactly-once contract (ADVICE r02): foreachBatch replays a batch whose
sink raised or whose process died, always under the SAME batch_id.  The
sink therefore keeps two tiny marker sets INSIDE the checkpoint directory
(batch ids are only meaningful relative to one checkpoint — storing them
with the output would let a checkpoint reset against an existing output
hit a stale commit marker and silently drop a genuinely new batch):

  * ``<checkpoint>/_ingest_commits/<batch_id>`` — written only after BOTH
    the triples append and the seen-ids append landed.  A replay of a
    committed batch is a no-op.
  * ``<checkpoint>/_ingest_attempts/<batch_id>`` — written before any
    data write.  A replay of an attempted-but-uncommitted batch may have
    half-landed (triples appended, seen-ids not), so ONLY those replays
    pay an extra anti-join against the output table's own doc_ids; the
    normal path never scans the output.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..corpus.generator import DOCUMENTS_SCHEMA
from ..functions.spans import render_text
from ..operators import extract

# Compact the _seen_ids side table once the SMALL tier fragments past this
# many files: every micro-batch's anti-join lists the directory, so
# unbounded appends make drain N pay an N-file listing (VERDICT r02 #2).
SEEN_COMPACT_MAX_FILES = 16

# Files at or above this size are SEALED tiers: compaction never rewrites
# them (VERDICT r03 #7 — the old full-snapshot rewrite re-churned every
# seen id once per 16 drains; at 10^9 ids that is a full-table rewrite).
# Per-compaction I/O is bounded by the small-tier bytes (< 16 batch
# appends + at most one growing fold file), independent of history size.
SEEN_TIER_BYTES = 64 * 1024 * 1024

# Keep at most this many attempt/commit marker files; older batch ids are
# final (the checkpoint never replays a batch once a LATER batch committed),
# so pruning them is safe and keeps the marker dirs O(1) over 10^6 drains.
MARKER_KEEP = 128


def _prune_markers(dir_path: str, keep: int = MARKER_KEEP) -> None:
    if not os.path.isdir(dir_path):
        return
    names = [n for n in os.listdir(dir_path) if n.isdigit()]
    if len(names) <= keep:
        return
    for n in sorted(names, key=int)[:-keep]:
        try:
            os.remove(os.path.join(dir_path, n))
        except FileNotFoundError:
            pass


def _has_parquet(d: str) -> bool:
    return os.path.isdir(d) and any(
        f.endswith(".parquet") for f in os.listdir(d)
    )


def _recover_seen(seen_dir: str) -> None:
    """Heal a crash inside _compact_seen's directory swap: roll forward to
    the complete compacted snapshot (tmp with Spark's _SUCCESS marker) if
    it exists, else restore the old directory.  Without this, a crash
    window would leave no _seen_ids and the next drain's dedup anti-join
    would silently pass everything."""
    tmp = seen_dir.rstrip("/") + ".__compact_tmp"
    old = seen_dir.rstrip("/") + ".__compact_old"
    if os.path.isdir(seen_dir):
        shutil.rmtree(old, ignore_errors=True)
        shutil.rmtree(tmp, ignore_errors=True)  # compaction is sink-serial
        return
    if os.path.isdir(tmp) and os.path.exists(os.path.join(tmp, "_SUCCESS")):
        os.rename(tmp, seen_dir)  # roll forward: keep the finished work
        shutil.rmtree(old, ignore_errors=True)
        return
    if os.path.isdir(old):
        os.rename(old, seen_dir)
    shutil.rmtree(tmp, ignore_errors=True)


def _append_seen(triples: DataFrame, seen_dir: str) -> None:
    """Append this batch's doc_ids to the seen side table.  One file per
    batch (the distinct id set of a single micro-batch is tiny relative to
    the output), so listing cost grows one entry per drain until
    compaction folds them."""
    triples.select("doc_id").distinct().coalesce(1).write.mode("append").parquet(seen_dir)


def _compact_seen(spark: SparkSession, seen_dir: str,
                  max_files: int = SEEN_COMPACT_MAX_FILES,
                  tier_bytes: int = SEEN_TIER_BYTES) -> None:
    """Size-tiered compaction: fold ONLY the small tier (per-batch append
    files + the current fold file) into one new file; sealed tiers — files
    at or above ``tier_bytes`` — are never rewritten, so per-compaction
    I/O stays bounded by ~16 batch appends regardless of how many ids
    history holds (VERDICT r03 #7).

    Crash safety needs no directory swap: _seen_ids has SET semantics
    (every reader applies ``.distinct()``), so the fold lands its output
    file FIRST and retires the source files SECOND — a crash between the
    two leaves a duplicate superset, which is semantically identical,
    never a loss.  (_recover_seen remains to heal swaps from the legacy
    full-snapshot scheme found in pre-existing checkpoints.)"""
    if not os.path.isdir(seen_dir):
        return
    sizes = {f: os.path.getsize(os.path.join(seen_dir, f))
             for f in os.listdir(seen_dir) if f.endswith(".parquet")}
    small = [f for f, sz in sizes.items() if sz < tier_bytes]
    if len(small) <= max_files:
        return
    tmp = seen_dir.rstrip("/") + ".__compact_tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    (spark.read.parquet(*[os.path.join(seen_dir, f) for f in small])
     .distinct().coalesce(1).write.parquet(tmp))
    if not os.path.exists(os.path.join(tmp, "_SUCCESS")):
        shutil.rmtree(tmp, ignore_errors=True)
        return
    # land the folded tier first (Spark part filenames carry a per-job
    # UUID — no collision with existing files), then retire its sources
    for f in os.listdir(tmp):
        if f.endswith(".parquet"):
            os.rename(os.path.join(tmp, f), os.path.join(seen_dir, f))
    for f in small:
        try:
            os.remove(os.path.join(seen_dir, f))
        except FileNotFoundError:
            pass
    shutil.rmtree(tmp, ignore_errors=True)
    spark.catalog.refreshByPath(seen_dir)


def stream_extract_triples(spark: SparkSession, staging_dir: str,
                           output_dir: str, checkpoint_dir: str) -> dict:
    """Drain the staging directory once (Trigger.AvailableNow) and append
    newly-extracted triples to ``output_dir``; returns counters.

    Dedup contract (job_queue.py file-id dedup): a doc_id that already has
    triples in the output never produces rows again, even if re-staged —
    including across crash/replay of a half-committed micro-batch.
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
    # markers live WITH the checkpoint that defines their batch ids — a
    # checkpoint reset must reset them too (content dedup is still covered
    # by the checkpoint-independent _seen_ids anti-join)
    commits_dir = os.path.join(checkpoint_dir, "_ingest_commits")
    attempts_dir = os.path.join(checkpoint_dir, "_ingest_attempts")

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        counters["batches"] += 1
        commit_file = os.path.join(commits_dir, str(batch_id))
        attempt_file = os.path.join(attempts_dir, str(batch_id))
        if os.path.exists(commit_file):
            return  # replay of a fully-committed batch: exactly-once no-op
        _recover_seen(seen_dir)
        # an attempt marker without a commit marker means a prior run died
        # mid-batch — its triples append may have landed without the seen
        # append, so this replay must also anti-join the output itself
        suspect_replay = os.path.exists(attempt_file)
        os.makedirs(attempts_dir, exist_ok=True)
        os.makedirs(commits_dir, exist_ok=True)
        with open(attempt_file, "w") as f:
            f.write("")

        # in-batch dedup: two staged files carrying the same doc_id in one
        # micro-batch would both pass the anti-join below (ADVICE r01) —
        # the queue's file-id dedup applies within a drain too.
        # persist: the sink takes multiple actions (counts + two writes);
        # without it each action replays the Arrow extraction stage
        # (VERDICT r02 #2 — the batch was extracted twice per drain).
        batch_df = batch_df.dropDuplicates(["doc_id"]).persist()
        try:
            triples = batch_df.select(
                "doc_id", F.explode("triples").alias("t")
            ).select(
                "doc_id",
                F.col("t.subj").alias("subj"),
                F.col("t.obj").alias("obj"),
                F.col("t.pred").alias("pred"),
                F.col("t.weight").alias("weight"),
            )
            counters["rows_in"] += triples.count()
            spark_b = batch_df.sparkSession
            if _has_parquet(seen_dir):
                seen = spark_b.read.parquet(seen_dir).distinct()
                triples = triples.join(seen, "doc_id", "left_anti")
            to_write = triples
            if suspect_replay and _has_parquet(output_dir):
                written_ids = spark_b.read.parquet(output_dir).select("doc_id").distinct()
                to_write = triples.join(written_ids, "doc_id", "left_anti")
            n = to_write.count()
            counters["rows_written"] += n
            if n:
                to_write.write.mode("append").parquet(output_dir)
            if n or suspect_replay:
                # mark seen from the POST-seen-anti-join set (`triples`, not
                # `to_write`): on a suspect replay the crashed attempt's ids
                # already landed in the output but never reached _seen_ids —
                # skipping them here would let a later drain duplicate them
                _append_seen(triples, seen_dir)
                spark_b.catalog.refreshByPath(seen_dir)
            _compact_seen(spark_b, seen_dir)
            with open(commit_file, "w") as f:
                json.dump({"batch_id": batch_id, "rows_written": n}, f)
            _prune_markers(commits_dir)
            _prune_markers(attempts_dir)
        finally:
            batch_df.unpersist()

    q = (
        combined.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return counters
