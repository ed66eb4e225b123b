"""Benchmark harness.

Default: runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "docs_per_sec": ...}

--scaling: additionally re-runs the KG pipeline at two parallelism levels
(local[N] and local[4N], N = CPUS/4) in fresh subprocesses on the SAME
input and reports throughput at both plus the scaling efficiency
eff = (docs/sec @ 4N) / (4 × docs/sec @ N)   (BASELINE.md protocol —
the sandbox proxy for N vs 4N executor clusters).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _pipeline_docs_per_sec(spark, sf_dir: str) -> tuple[float, int]:
    from mmore_spark.corpus.derive import derived_documents
    from mmore_spark.operators.agg import merge_triples_global
    from mmore_spark.plans.pipeline import build_graph

    docs = derived_documents(spark, sf_dir)
    n_docs = docs.count()  # warms the scan; excluded from the timed section
    t0 = time.time()
    _, canonical_triples, entities, _ = build_graph(docs)
    merged = merge_triples_global(canonical_triples)
    n_triples = merged.count()
    n_entities = entities.count()
    wall = time.time() - t0
    assert n_triples > 0 and n_entities > 0
    return n_docs / wall, n_docs


def run_single(sf_dir: str, cpus: int) -> dict:
    from mmore_spark.entryqueries import QUERIES
    from mmore_spark.session import get_spark

    spark = get_spark("bench", master=f"local[{cpus}]",
                      extra_conf={"spark.sql.shuffle.partitions": str(cpus)})
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    total0 = time.time()

    dps, n_docs = _pipeline_docs_per_sec(spark, sf_dir)
    timings["kg_pipeline"] = round(n_docs / dps, 3)

    bench_queries = [
        "kg_triples", "kg_triples_global", "kg_mentions", "kg_entity_degree",
        "tag_fingerprint", "dedup_minhash_pairs", "dedup_jaccard_pairs",
        "sim_topk_cosine", "rel_latest_wins", "chunk_word64",
    ]
    for name in bench_queries:
        t0 = time.time()
        n = QUERIES[name](spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)
        assert n >= 0

    total = time.time() - total0
    return {
        "metric": "bench_total_wall",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "cpus": cpus,
        "n_docs": n_docs,
        "docs_per_sec": round(dps, 2),
    }


def run_scaling(sf_dir: str, cpus_high: int) -> dict:
    """Same pipeline job at N and 4N cores in fresh subprocesses."""
    cpus_low = max(1, cpus_high // 4)
    results = {}
    for c in (cpus_low, cpus_high):
        out = subprocess.run(
            [sys.executable, __file__, "--pipeline-only", str(c)],
            capture_output=True, text=True,
            env={**os.environ, "SPARK_GRAFT_SF_DIR": sf_dir},
            timeout=1800,
        )
        line = out.stdout.strip().splitlines()[-1]
        results[c] = json.loads(line)
    dps_low = results[cpus_low]["docs_per_sec"]
    dps_high = results[cpus_high]["docs_per_sec"]
    return {
        "cpus_low": cpus_low,
        "cpus_high": cpus_high,
        "docs_per_sec_low": dps_low,
        "docs_per_sec_high": dps_high,
        "scaling_efficiency": round(dps_high / (4 * dps_low), 4),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    if "--pipeline-only" in sys.argv:
        c = int(sys.argv[sys.argv.index("--pipeline-only") + 1])
        from mmore_spark.session import get_spark

        spark = get_spark("bench-scale", master=f"local[{c}]",
                          extra_conf={"spark.sql.shuffle.partitions": str(c)})
        spark.sparkContext.setLogLevel("ERROR")
        dps, n_docs = _pipeline_docs_per_sec(spark, sf_dir)
        print(json.dumps({"docs_per_sec": round(dps, 2), "n_docs": n_docs, "cpus": c}))
        return

    result = run_single(sf_dir, cpus)
    if "--scaling" in sys.argv:
        result["scaling"] = run_scaling(sf_dir, cpus)
    print(json.dumps(result))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
