"""Scale-adaptive spreading of narrow scans (guide §2.4: remove shuffles
outright where the data is already partitioned as needed).

The sandbox test tables are single small parquet files, so their scan
yields ONE input partition and every downstream stage (regex extraction,
Arrow signature stages) would serialize on one task; rounds 2-5 answered
that with an unconditional ``repartition(defaultParallelism)``.  Correct
locally — but at production scale that line is a full round-robin shuffle
of the corpus (every payload byte crosses the network once) applied to a
scan that is already thousands of partitions wide.

``spread_small_scan`` keeps the repartition ONLY when the scan is
actually narrow.  The input-file list is driver-side metadata (no job):
every file is at least one scan split, and local files contribute
``ceil(size / maxPartitionBytes)`` splits, so the sum is a lower bound on
the scan's parallelism.  When that bound already reaches the session's
default parallelism, the input flows through unchanged and the shuffle
disappears from the plan.  Inputs with no backing files (in-memory local
relations in unit tests) keep the historical repartition — they are tiny
by construction.

The decision is cached per (session id, cache_key) when the caller can
name the input (e.g. the sf_dir); the probe itself is ~20 ms of driver
metadata either way.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

_DEFAULT_SPLIT_BYTES = 128 * 1024 * 1024

_decision_cache: dict[tuple[int, str], bool] = {}


def _max_partition_bytes(spark) -> int:
    raw = ""
    try:
        raw = spark.conf.get("spark.sql.files.maxPartitionBytes")
    except Exception:
        pass
    digits = "".join(c for c in raw if c.isdigit())
    return int(digits) if digits else _DEFAULT_SPLIT_BYTES


def estimated_scan_partitions(df: DataFrame) -> int | None:
    """Lower bound on the scan parallelism of ``df``'s file sources, from
    driver metadata only.  None = no backing files (pure local input)."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    split = _max_partition_bytes(df.sparkSession)
    total = 0
    for uri in files:
        n = 1
        path = uri[7:] if uri.startswith("file:") and uri[5:7] == "//" else (
            uri[5:] if uri.startswith("file:") else None)
        if path is not None:
            try:
                n = max(1, -(-os.path.getsize(path) // split))
            except OSError:
                n = 1
        total += n
    return total


def spread_small_scan(df: DataFrame, cache_key: str | None = None) -> DataFrame:
    """Repartition ``df`` to the session default parallelism iff its file
    scan is narrower than that; pass wide scans through shuffle-free."""
    spark = df.sparkSession
    parallelism = spark.sparkContext.defaultParallelism
    if cache_key is not None:
        key = (id(spark), cache_key)
        narrow = _decision_cache.get(key)
        if narrow is None:
            est = estimated_scan_partitions(df)
            narrow = est is None or est < parallelism
            _decision_cache[key] = narrow
    else:
        est = estimated_scan_partitions(df)
        narrow = est is None or est < parallelism
    return df.repartition(parallelism) if narrow else df
