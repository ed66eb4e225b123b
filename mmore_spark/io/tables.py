"""Table writer/reader with per-partition lineage + metrics (north_rule).

Production format is Iceberg (partitioned triple/entity tables, snapshot-
based incremental reads); this sandbox has no Iceberg runtime jar, so the
writer transparently falls back to partitioned parquet with an atomic
``_SUCCESS``-style completion marker.  The jar-free half of the Iceberg
path — catalog session conf, CREATE TABLE DDL with hidden-partition
transforms, MERGE INTO upsert generation, snapshot-range incremental
reads — is real and unit-tested in ``io/iceberg.py``; with the runtime
present those statements drive the production tables.  The interface is format-agnostic:
every write lands
  * the data, partitioned by the declared columns,
  * a ``_lineage`` side table: one row per output partition
    (stage, partition_id, rows, wall_ms, status, finished_at)
and resume = "skip stages whose completion marker + lineage rows exist"
(plans/pipeline.py).  With Iceberg the same writes become
``writeTo(...).overwritePartitions()`` and lineage keys on snapshot ids.

Reference analog: per-processor JSONL append + merged results
(/root/reference/src/mmore/process/dispatcher.py:438-456,
run_process.py:56-81) and the save-every-100 checkpointing
(post_processor/pipeline.py:99-120).
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

ICEBERG_AVAILABLE = False  # flipped when an Iceberg catalog is configured


def _marker(path: str) -> str:
    return os.path.join(path, "_MMORE_COMPLETE")


def _recover_upsert(path: str) -> None:
    """Heal the non-atomic window in upsert_table's two-step rename.

    ``write_table`` into ``.__upsert_tmp`` finishes (marker included)
    BEFORE either rename, so a crash between ``path → .__upsert_old`` and
    ``.__upsert_tmp → path`` always leaves a COMPLETE tmp — roll FORWARD
    (tmp → path), preserving the crashed upsert's updates.  (ADVICE r02:
    rolling back restored a snapshot whose completion marker was intact,
    so the resume rule "skip stages whose marker exists" silently dropped
    the updates.)  Only when tmp is absent or incomplete do we restore the
    old snapshot — and then strip its completion marker so the stage is
    re-run rather than trusted."""
    old = path.rstrip("/") + ".__upsert_old"
    tmp = path.rstrip("/") + ".__upsert_tmp"
    if os.path.exists(path):
        # a crash between `tmp → path` and the final rmtree leaves a stale
        # pre-upsert snapshot doubling storage; drop it.  tmp is NOT
        # removed here — it legitimately coexists with path while a
        # concurrent upsert is mid-write.
        shutil.rmtree(old, ignore_errors=True)
        return
    if not os.path.isdir(old):
        return
    if os.path.isdir(tmp) and os.path.exists(_marker(tmp)):
        os.rename(tmp, path)
        shutil.rmtree(old, ignore_errors=True)
    else:
        shutil.rmtree(tmp, ignore_errors=True)
        os.rename(old, path)
        try:
            os.remove(_marker(path))
        except FileNotFoundError:
            pass


def is_complete(path: str) -> bool:
    _recover_upsert(path)
    return os.path.exists(_marker(path))


def partition_metrics(df: DataFrame) -> DataFrame:
    """Per-partition row counts computed distributed (no collect of data):
    (partition_id, rows)."""
    return df.groupBy(F.spark_partition_id().alias("partition_id")).agg(
        F.count("*").alias("rows")
    )


def write_table(df: DataFrame, path: str, stage: str,
                partition_by: list[str] | None = None,
                mode: str = "overwrite") -> dict:
    """Write a stage output + lineage; returns the lineage summary dict."""
    t0 = time.time()
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    wall_ms = int((time.time() - t0) * 1000)

    spark = df.sparkSession
    # Spark caches file listings per path; an overwrite of a previously-read
    # location must invalidate them or later scans hit deleted files.
    spark.catalog.refreshByPath(path)
    # Explicit schema: an empty result writes no part files, and schema
    # inference on an empty directory fails.
    written = spark.read.schema(df.schema).parquet(path)
    with open(os.path.join(path, "_mmore_schema.json"), "w") as f:
        f.write(df.schema.json())
    metrics = partition_metrics(written).withColumns(
        {
            "stage": F.lit(stage),
            "wall_ms": F.lit(wall_ms),
            "status": F.lit("complete"),
            "finished_at": F.current_timestamp(),
        }
    )
    metrics.write.mode("overwrite").parquet(os.path.join(path, "_lineage"))
    summary = {
        "stage": stage,
        "rows": written.count(),
        "wall_ms": wall_ms,
        "path": path,
    }
    with open(_marker(path), "w") as f:
        json.dump(summary, f)
    return summary


def read_table(spark: SparkSession, path: str) -> DataFrame:
    _recover_upsert(path)
    schema_file = os.path.join(path, "_mmore_schema.json")
    if os.path.exists(schema_file):
        from pyspark.sql.types import StructType

        with open(schema_file) as f:
            schema = StructType.fromJson(json.loads(f.read()))
        return spark.read.schema(schema).parquet(path)
    return spark.read.parquet(path)


def read_lineage(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(os.path.join(path, "_lineage"))


def replace_table(spark: SparkSession, path: str, df: DataFrame,
                  stage: str = "replace") -> dict:
    """Full-replacement write that stays safe when ``df``'s plan READS
    from ``path`` (incremental process: merged output = reused rows from
    the existing table + newly parsed rows): write to an adjacent tmp
    dir first, then swap directories.  Shares upsert_table's two-rename
    pattern and its crash recovery (``_recover_upsert`` heals the
    non-atomic window)."""
    import shutil

    _recover_upsert(path)
    if not os.path.isdir(path) or not os.listdir(path):
        return write_table(df, path, stage=stage)
    tmp = path.rstrip("/") + ".__upsert_tmp"
    old = path.rstrip("/") + ".__upsert_old"
    shutil.rmtree(tmp, ignore_errors=True)
    summary = write_table(df, tmp, stage=stage)
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    try:
        os.rename(tmp, path)
    except FileNotFoundError:
        # a concurrent reader's _recover_upsert can win the race inside
        # the two-rename window — verify the healed table is in place
        if not (os.path.isdir(path) and os.path.exists(_marker(path))):
            raise
    shutil.rmtree(old, ignore_errors=True)
    spark.catalog.refreshByPath(path)
    summary["path"] = path
    return summary


def upsert_table(spark: SparkSession, path: str, updates: DataFrame,
                 key: str = "doc_id", version_col: str | None = None) -> dict:
    """MERGE-style upsert: rows in ``updates`` replace existing rows with
    the same key (latest-wins when ``version_col`` is given, else updates
    always win).  With Iceberg this is ``MERGE INTO``; the parquet
    fallback rewrites via an adjacent temp dir + directory swap.  The
    two-step rename is not atomic as a unit: a crash between the renames
    leaves no table at ``path`` — readers and the next upsert heal it via
    ``_recover_upsert`` (restore ``.__upsert_old``, retry the upsert).

    Reference analog: previous-results reuse keyed by file_path with max
    processed_at (/root/reference/src/mmore/process/incremental.py:24-48).
    """
    _recover_upsert(path)
    if not os.path.isdir(path) or not os.listdir(path):
        summary = write_table(updates, path, stage="upsert-init")
        summary["inserted"] = summary["rows"]
        return summary

    existing = read_table(spark, path)
    if version_col:
        from pyspark.sql import Window

        merged = existing.unionByName(updates, allowMissingColumns=True)
        w = Window.partitionBy(key).orderBy(
            F.col(version_col).desc_nulls_last(), F.monotonically_increasing_id()
        )
        merged = merged.withColumn("_rn", F.row_number().over(w)).filter(
            F.col("_rn") == 1).drop("_rn")
    else:
        keep = existing.join(updates.select(key).distinct(), key, "left_anti")
        merged = keep.unionByName(updates, allowMissingColumns=True)
    # replace_table does the tmp-write + two-rename swap and its recovery
    # (ADVICE r03: the FileNotFoundError branch tolerates a concurrent
    # reader's _recover_upsert winning the race inside the window)
    return replace_table(spark, path, merged, stage="upsert")
