"""Mega-doc stress for the kg_cooccurrence pair shape (VERDICT r05 nit #3).

Plants one document with K distinct mentions next to N normal docs and
times the ordered-pair generation + count aggregate under:

  * old: one nested transform building ALL k(k-1)/2 pair structs inside a
    single array cell (O(k²) memory in one row);
  * new: posexplode + per-row slice — every materialized array is O(k),
    pairs stream through pipelined generates.

Both produce the identical pair multiset; the point of the new shape is
bounded per-row memory, not wall time.  Usage:

    python scripts/cooc_megadoc.py [K] [N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mmore_spark.session import get_spark  # noqa: E402


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000
    spark = get_spark("cooc-megadoc", master="local[32]",
                      extra_conf={"spark.sql.shuffle.partitions": "32"})
    spark.sparkContext.setLogLevel("ERROR")

    normal = spark.range(n).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("doc_id"),
        F.expr("transform(sequence(0, 2), __i -> concat('E', cast(id % 50 as string), '-', cast(__i as string)))").alias("ns"),
    )
    mega = spark.range(1).select(
        F.lit("mega-doc").alias("doc_id"),
        F.expr(f"transform(sequence(0, {k - 1}), __i -> concat('M', cast(__i as string)))").alias("ns"),
    )
    per_doc = normal.unionByName(mega).localCheckpoint()

    def agg(pairs):
        return pairs.groupBy(
            F.col("p.ent_a").alias("ent_a"), F.col("p.ent_b").alias("ent_b")
        ).agg(F.count("*").cast("long").alias("n_docs"))

    def old_shape():
        pairs = per_doc.select(
            "doc_id",
            F.explode(F.expr(
                "flatten(transform(ns, (__cx, __ci) -> "
                "transform(slice(ns, __ci + 2, size(ns)), __cy -> "
                "struct(__cx AS ent_a, __cy AS ent_b))))")).alias("p"))
        return agg(pairs).count()

    def new_shape():
        lhs = per_doc.select("doc_id", "ns",
                             F.posexplode("ns").alias("__ci", "__cx"))
        pairs = lhs.select(
            "doc_id",
            F.explode(F.expr(
                "transform(slice(ns, __ci + 2, size(ns)), __cy -> "
                "struct(__cx AS ent_a, __cy AS ent_b))")).alias("p"))
        return agg(pairs).count()

    for name, fn in [("new", new_shape), ("old", old_shape)]:
        spark.sparkContext.setJobDescription(f"cooc megadoc {name} shape")
        t0 = time.time()
        rows = fn()
        print(f"{name} shape: {round(time.time() - t0, 2)}s, "
              f"{rows} distinct pairs (expect {k*(k-1)//2} from the mega-doc "
              f"alone)", flush=True)


if __name__ == "__main__":
    main()
