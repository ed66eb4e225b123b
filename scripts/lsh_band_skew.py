"""Skew-stress the LSH band self-join under a duplicated corpus
(VERDICT r03 #3): band keys are md5-uniform for distinct texts, but a
k-member duplicate FAMILY shares every band key — one bucket carries k
rows and the self-join emits k(k-1)/2 pairs inside one task.

Compares the uncapped full-pair join against operators/dedup.
candidate_edges with a bucket cap (star edges for oversized buckets),
reporting join-stage task quantiles from the Spark UI REST API (the
skew_stress.py harness) plus output row counts.

Usage: python scripts/lsh_band_skew.py [n_docs] [family_size] [cap]
Prints one JSON line.
"""

import json
import sys
import time
import urllib.request

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from mmore_spark.operators import dedup  # noqa: E402
from mmore_spark.session import get_spark  # noqa: E402


def _api_base(sc) -> str:
    ui = sc.uiWebUrl
    return f"{ui}/api/v1/applications/{sc.applicationId}/stages"


def _stages(sc, from_stage: int) -> list[dict]:
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
        rt = q["executorRunTime"]
        out.append({"stage": s["stageId"], "tasks": s["numCompleteTasks"],
                    "task_ms_median": rt[1], "task_ms_p95": rt[2],
                    "task_ms_max": rt[3]})
    return out


def _skewest(stats: list[dict]) -> dict:
    if not stats:
        return {"tasks": 0, "task_ms_median": 0.0, "task_ms_p95": 0.0,
                "task_ms_max": 0.0}
    return max(stats, key=lambda s: s["task_ms_max"] - s["task_ms_median"])


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    family = int(sys.argv[2]) if len(sys.argv) > 2 else 8_000
    cap = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    spark = get_spark("lsh-band-skew", master="local[32]", extra_conf={
        "spark.sql.shuffle.partitions": "32",
        "spark.ui.enabled": "true",
        "spark.ui.port": "4049",
        "spark.port.maxRetries": "32",
    })
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")

    # corpus: unique 8-word texts + ONE family of identical boilerplate
    ids = spark.range(n_docs)
    # every word of a unique doc carries the id: no shingle is shared
    # across unique docs, so the ONLY hot buckets are the family's
    text = F.when(
        F.col("id") < family,
        F.lit("standard legal boilerplate disclaimer all rights reserved notice"),
    ).otherwise(F.format_string(
        "a%d b%d c%d d%d e%d f%d g%d h%d",
        F.col("id"), F.col("id"), F.col("id"), F.col("id"),
        F.col("id"), F.col("id"), F.col("id"), F.col("id")))
    docs = ids.select(F.col("id").alias("doc_id"), text.alias("text"))
    sig = dedup.minhash_band_signatures(docs)

    results = {"n_docs": n_docs, "family": family, "cap": cap}
    for mode in ("uncapped", "capped"):
        ss = _stages(sc, 0)
        first = max(s["stage"] for s in ss) + 1 if ss else 0
        t0 = time.time()
        edges = dedup.candidate_edges(
            sig, max_bucket=(1 << 40) if mode == "uncapped" else cap)
        n_edges = edges.count()
        wall = round(time.time() - t0, 1)
        time.sleep(1.0)  # REST lag
        stats = _stages(sc, first)
        join = _skewest(stats)
        med = max(join["task_ms_median"], 1.0)
        results[mode] = {
            "wall_s": wall, "edges": n_edges,
            "join_task_ms_median": join["task_ms_median"],
            "join_task_ms_p95": join["task_ms_p95"],
            "join_task_ms_max": join["task_ms_max"],
            "max_over_median": round(join["task_ms_max"] / med, 1),
        }
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
