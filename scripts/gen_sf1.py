"""Generate an sf1.0 bench dataset (10× the driver's sf0.1) under /tmp.

The driver's testdata stops at sf0.1; VERDICT r03 #4 asks for a 10× point
to expose any remaining super-linear shadow in the dedup/sim queries.
The driver generator is not available, so this synthesizes the THREE
tables the headline bench actually scans — documents, embeddings,
events — deterministically (hash arithmetic, no RNG state) with the same
schema and distributions as sf0.1:

  documents   50,000 rows; text = 10-100 words uniform over the same
              31-word vocabulary; lang 40/15/15/15/15 en/de/es/fr/zh;
              source = src{doc_id % 20}; n_chars = len(text)
  embeddings  20,000 rows; 64-dim unit-normalized vectors; label 0-9
  events      1,000,000 rows; 15,000 users; 5 event types; ts over
              Jan 2024; value 0-560; props = '{"k": n}'

The remaining TPC-H star tables (unused by the headline set but loaded
as views) are symlinked from sf0.1.

Usage: python scripts/gen_sf1.py [out_dir]        (default /tmp/sf1.0)
"""

import os
import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from mmore_spark.session import get_spark  # noqa: E402

VOCAB = ["a", "agg", "batch", "big", "column", "customer", "data", "dup",
         "fast", "filter", "group", "hash", "join", "key", "line", "merge",
         "order", "part", "query", "row", "scan", "slow", "small", "sort",
         "spark", "stream", "table", "the", "value", "vector", "window"]

N_DOCS = 50_000
N_VECS = 20_000
N_EVENTS = 1_000_000


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1.0"
    os.makedirs(out, exist_ok=True)
    spark = get_spark("gen-sf1", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    vocab_sql = "array(" + ", ".join(f"'{w}'" for w in VOCAB) + ")"
    docs = spark.range(N_DOCS).select(F.col("id").alias("doc_id")).selectExpr(
        "doc_id",
        f"""array_join(transform(
              sequence(1, cast(10 + pmod(xxhash64(doc_id, 7), 91) as int)),
              __w -> element_at({vocab_sql},
                     cast(pmod(xxhash64(doc_id, __w, 13), {len(VOCAB)}) as int) + 1)),
            ' ') AS text""",
        """CASE WHEN pmod(xxhash64(doc_id, 3), 100) < 40 THEN 'en'
                WHEN pmod(xxhash64(doc_id, 3), 100) < 55 THEN 'de'
                WHEN pmod(xxhash64(doc_id, 3), 100) < 70 THEN 'es'
                WHEN pmod(xxhash64(doc_id, 3), 100) < 85 THEN 'fr'
                ELSE 'zh' END AS lang""",
        "concat('src', cast(doc_id % 20 as string)) AS source",
    ).withColumn("n_chars", F.length("text").cast("long"))
    docs.repartition(32).write.mode("overwrite").parquet(f"{out}/documents.parquet")

    vecs = spark.range(N_VECS).select(F.col("id").alias("vec_id")).selectExpr(
        "vec_id",
        """transform(sequence(0, 63), __i ->
             cast(pmod(xxhash64(vec_id, __i, 17), 10007) / 10007.0 - 0.5
                  as float)) AS raw""",
        "cast(pmod(xxhash64(vec_id, 5), 10) as int) AS label",
    ).selectExpr(
        "vec_id",
        """transform(raw, __x -> cast(__x /
             sqrt(aggregate(raw, cast(0.0 as double),
                  (__acc, __v) -> __acc + __v * __v)) as float)) AS embedding""",
        "label",
    ).select("vec_id", "embedding", "label")
    vecs.repartition(8).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")

    events = spark.range(N_EVENTS).select(F.col("id").alias("event_id")).selectExpr(
        "event_id",
        """timestamp '2024-01-01 00:00:00' +
           make_interval(0, 0, 0, 0, 0, 0,
             cast(pmod(xxhash64(event_id, 11), 2592000) as int)) AS ts""",
        "cast(pmod(xxhash64(event_id, 19), 15000) as bigint) AS user_id",
        """element_at(array('click', 'view', 'purchase', 'signup', 'error'),
             cast(pmod(xxhash64(event_id, 23), 5) as int) + 1) AS event_type""",
        # cast: round() on the integer-division expression otherwise yields
        # DECIMAL(24,2) — the driver's events.value is DOUBLE, and the
        # mismatch breaks oracle comparison dtypes at sf1.0
        "cast(round(pmod(xxhash64(event_id, 29), 56021) / 100.0, 2) as double) AS value",
        """concat('{"k": ', cast(pmod(xxhash64(event_id, 31), 100) as string),
                  '}') AS props""",
    )
    events.repartition(32).write.mode("overwrite").parquet(f"{out}/events.parquet")

    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem"]:
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"/root/testdata/sf0.1/{t}.parquet", dst)
    print(f"generated {out}: docs={N_DOCS} vecs={N_VECS} events={N_EVENTS}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
