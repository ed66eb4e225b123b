"""Skew-stress the salted merge (VERDICT r02 #7): plant one mega-hot
entity carrying ~30% of all mentions and compare the PLAIN single-phase
groupBy against the two-phase salted merge (operators/agg.py) — wall
clock AND the per-task runtime spread of each plan's reducer stage,
pulled from the Spark UI REST API (real task times, not proxies).

The round-1 salted==plain test proves value equality; this measures the
skew benefit itself: the plain plan funnels the hot key's rows into ONE
reducer task (max-task time >> median), the salted plan fans them over
n_salts partials first.

Usage: python scripts/skew_stress.py [rows] [hot_pct]
Prints one JSON line.
"""

import json
import sys
import time
import urllib.request

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from mmore_spark.hashing import h60  # noqa: E402
from mmore_spark.operators.agg import merge_entities_global  # noqa: E402
from mmore_spark.session import get_spark  # noqa: E402


UI_PORT = 4049  # requested port; Spark may bind higher on conflict


def _api_base(sc) -> str:
    """REST base from the ACTUAL bound UI address (spark.port.maxRetries
    silently moves the UI if the requested port is taken)."""
    ui = sc.uiWebUrl  # e.g. http://host:4049
    return f"{ui}/api/v1/applications/{sc.applicationId}/stages"


def _stages(sc, from_stage: int) -> list[dict]:
    """Completed stages since `from_stage` with task-runtime quantiles."""
    base = _api_base(sc)
    stages = json.load(urllib.request.urlopen(base))
    out = []
    for s in stages:
        if s["stageId"] < from_stage or s["status"] != "COMPLETE":
            continue
        url = (f"{base}/{s['stageId']}/{s['attemptId']}/taskSummary"
               f"?quantiles=0.0,0.5,0.95,1.0")
        try:
            q = json.load(urllib.request.urlopen(url))
        except Exception:
            continue
        rt = q["executorRunTime"]  # ms at the four quantiles
        out.append({
            "stage": s["stageId"],
            "tasks": s["numCompleteTasks"],
            "task_ms_median": rt[1],
            "task_ms_p95": rt[2],
            "task_ms_max": rt[3],
        })
    return out


def _reducer_stage(stats: list[dict]) -> dict:
    """The stage with the largest max−median task-time spread = the
    (possibly skewed) reduce stage of the plan just executed.  (Largest
    absolute max would pick the uniform 32-task scan stage.)"""
    if not stats:  # REST lag: don't lose the measurement after the run
        return {"tasks": 0, "task_ms_median": 0.0, "task_ms_p95": 0.0,
                "task_ms_max": 0.0}
    return max(stats, key=lambda s: s["task_ms_max"] - s["task_ms_median"])


def main() -> int:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    hot_pct = int(sys.argv[2]) if len(sys.argv) > 2 else 30

    spark = get_spark("skew-stress", master="local[32]",
                      extra_conf={"spark.sql.shuffle.partitions": "32",
                                  "spark.ui.enabled": "true",
                                  "spark.ui.port": str(UI_PORT),
                                  # AQE's reducer coalescing would merge the
                                  # mostly-empty partitions around the hot
                                  # one and blur the per-task comparison;
                                  # it cannot SPLIT aggregation skew, so
                                  # disabling it only removes noise here
                                  "spark.sql.adaptive.enabled": "false"})
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")

    # synthetic mentions: hot_pct% of rows hit ONE entity, the rest spread
    # over 20k cold entities; descriptions arrays give the reducer real
    # per-row weight (set-union agg), mirroring merge_entities_global's input
    rows = spark.range(n_rows)
    bucket = F.pmod(h60(F.col("id").cast("string")), F.lit(100))
    entity = F.when(bucket < hot_pct, F.lit("MEGA HOT ENTITY")).otherwise(
        F.concat(F.lit("ENT "), F.pmod(h60((F.col("id") + 7).cast("string")),
                                       F.lit(20000)).cast("string")))
    mentions = rows.select(
        (F.col("id") % 100000).cast("string").alias("doc_id"),
        entity.alias("entity_name"),
        F.lit("ORGANIZATION").alias("entity_type"),
        # 100k distinct 64-char descriptions: the hot key's reducer must
        # haul + set-union millions of real-sized strings, like a mega-hot
        # entity's description union at corpus scale
        F.array(F.rpad(F.concat(F.lit("desc "),
                                F.pmod(F.col("id"), F.lit(100000)).cast("string")),
                       64, "x"))
        .alias("descriptions"),
    ).persist()
    mentions.count()  # materialize input once so both plans read the cache

    results = {}
    for label, plan in (
        ("plain", lambda: mentions.groupBy("entity_name").agg(
            F.count("*").alias("n_mentions"),
            F.max("entity_type").alias("entity_type"),
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("descriptions"))))
            .alias("descriptions"))),
        ("salted", lambda: merge_entities_global(mentions, n_salts=16)),
    ):
        from_stage = max((s["stageId"] for s in json.load(
            urllib.request.urlopen(_api_base(sc)))), default=-1) + 1
        t0 = time.time()
        out = plan()
        # noop sink: materializes EVERY column — a bare count() would let
        # Catalyst prune the collect_list aggregates and skip the skewed
        # work entirely
        out.write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        red = _reducer_stage(_stages(sc, from_stage))
        results[label] = {
            "wall_s": round(wall, 2), "groups": out.count(),
            "reducer_tasks": red["tasks"],
            "task_ms_median": red["task_ms_median"],
            "task_ms_p95": red["task_ms_p95"],
            "task_ms_max": red["task_ms_max"],
            "max_over_median": round(
                red["task_ms_max"] / max(red["task_ms_median"], 1.0), 1),
        }

    print(json.dumps({
        "rows": n_rows, "hot_pct": hot_pct,
        "plain": results["plain"], "salted": results["salted"],
        "skew_ratio_improvement": round(
            results["plain"]["max_over_median"]
            / max(results["salted"]["max_over_median"], 0.1), 1),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
