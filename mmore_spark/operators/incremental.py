"""Incremental / change-detection operators (SURVEY.md §2.9).

Reference semantics (/root/reference/src/mmore/process/incremental.py) as
distributed DataFrame programs:

  * latest-wins previous-results index: duplicates per ``file_path`` keep
    the max ``processed_at`` (incremental.py:24-48) — a window dedup, no
    driver-side dict;
  * process-stage reuse: a crawled file reuses its cached sample iff it is
    present in the previous snapshot, has a ``processed_at``, and
    ``mtime <= processed_at`` (incremental.py:61-81) — a broadcast-able
    left join + predicate split;
  * postprocess-stage reuse: reusable iff every cached sample has a
    timestamp and ``input_processed_at <= min(cached processed_at)``
    (incremental.py:84-107) — a min/any-null aggregate + join;
  * merge: reused + new, both restricted to the current file set
    (incremental.py:110-123) — left_semi + unionByName;
  * deleted detection (run_process.py:173): previous − current → left_anti.

At Iceberg-table scale the previous snapshot is itself a table; these are
ordinary joins that AQE can broadcast when the snapshot is dimension-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def latest_wins(previous: DataFrame, key: str = "file_path",
                ts: str = "processed_at") -> DataFrame:
    """One row per key, keeping the greatest timestamp (NULL timestamps
    lose to any non-null, mirroring ``datetime.min`` in the reference)."""
    w = Window.partitionBy(key).orderBy(
        F.col(ts).desc_nulls_last(), F.monotonically_increasing_id()
    )
    return previous.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") == 1).drop("_rn")


def split_reusable_process(crawled: DataFrame, previous: DataFrame,
                           key: str = "file_path") -> tuple[DataFrame, DataFrame]:
    """crawled(file_path, mtime) × previous(file_path, processed_at, …) →
    (reusable crawled rows, to-process crawled rows)."""
    prev = latest_wins(previous, key).select(
        F.col(key), F.col("processed_at").alias("_prev_ts"))
    joined = crawled.join(prev, key, "left")
    reusable_cond = F.col("_prev_ts").isNotNull() & (F.col("mtime") <= F.col("_prev_ts"))
    reusable = joined.filter(reusable_cond).drop("_prev_ts")
    to_process = joined.filter(~reusable_cond | F.col("_prev_ts").isNull()).drop("_prev_ts")
    return reusable, to_process


def split_reusable_postprocess(inputs: DataFrame, previous: DataFrame,
                               key: str = "file_path") -> tuple[DataFrame, DataFrame]:
    """inputs(file_path, processed_at) × previous(file_path, processed_at)
    → (reusable inputs, to-process inputs).  Reusable iff the cache has
    rows, none lacks a timestamp, and input ts <= min(cached ts)."""
    agg = previous.groupBy(key).agg(
        F.min("processed_at").alias("_min_ts"),
        F.max(F.col("processed_at").isNull().cast("int")).alias("_has_null"),
    )
    joined = inputs.join(agg, key, "left")
    ok = (
        F.col("_min_ts").isNotNull()
        & (F.col("_has_null") == 0)
        & (F.col("processed_at") <= F.col("_min_ts"))
    )
    reusable = joined.filter(ok).drop("_min_ts", "_has_null")
    to_process = joined.filter(~F.coalesce(ok, F.lit(False))).drop("_min_ts", "_has_null")
    return reusable, to_process


def merge_results(reused: DataFrame, new: DataFrame, current: DataFrame,
                  key: str = "file_path") -> DataFrame:
    """Union of reused + new rows, both restricted (left_semi) to the
    current file set (incremental.py:110-123)."""
    cur = current.select(key).distinct()
    return (
        reused.join(cur, key, "left_semi")
        .unionByName(new.join(cur, key, "left_semi"))
    )


def deleted_keys(previous: DataFrame, current: DataFrame,
                 key: str = "file_path") -> DataFrame:
    """Keys present in the previous snapshot but gone from the current
    crawl (run_process.py:173)."""
    return (
        previous.select(key).distinct()
        .join(current.select(key).distinct(), key, "left_anti")
    )
