"""Arrow-backed local relations for small driver-side row lists.

``spark.createDataFrame(list_of_tuples, ...)`` routes through
``sc.parallelize`` — a pickled PythonRDD whose every *execution* (and every
broadcast build) runs a Python-worker stage: up to ``defaultParallelism``
tasks that serialize on SparkEnv's worker-creation lock the first time
(~0.15 s per spawned worker, measured r6 via jstack — the dimension joins
in ``corpus.derive`` made every extraction query carry one such stage).

``local_df`` feeds the same rows through pandas + Arrow instead: the data
crosses to the JVM ONCE at creation time and becomes a plan-local relation
(under ``spark.sql.execution.arrow.localRelationThreshold`` it is a literal
``LocalRelation`` — broadcastable with no job at all), so query execution
never touches the Python boundary (guide §4).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def _names(schema: str) -> list[str]:
    """Column names from a flat DDL schema string ('a int, b string')."""
    return [field.strip().split()[0] for field in schema.split(",")]


def local_df(spark: SparkSession, rows: Sequence[tuple], schema: str) -> DataFrame:
    """createDataFrame twin for small local row lists, minus the PythonRDD.

    ``schema`` must be a flat DDL string (no nested types) — all call
    sites here are simple dimension/result tables.  Empty input falls back
    to the plain path (already a zero-partition local relation).
    """
    if not rows:
        return spark.createDataFrame([], schema)
    import pandas as pd

    pdf = pd.DataFrame.from_records(list(rows), columns=_names(schema))
    return spark.createDataFrame(pdf, schema=schema)
