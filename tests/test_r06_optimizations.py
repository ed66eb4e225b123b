"""Round-6 optimization parity tests.

Every optimization this round must leave query results identical; these
tests pin the two changes that replaced an implementation rather than a
plan shape:

  * ``rule_extract`` (literal-scan finditer emulation) must be
    byte-identical to the combined-regex baseline ``rule_extract_re``;
  * ``linking.canonicalize`` driver path (count-gated LSH+ER+CC+election
    in driver Python) must equal the Spark path row-for-row.
"""

from __future__ import annotations

import random

from mmore_spark.corpus import vocab
from mmore_spark.operators import extract


def _aliases() -> list[str]:
    return [a for clusters in vocab.ALIAS_CLUSTERS.values()
            for cluster in clusters for a in cluster]


def _mids() -> list[str]:
    return [t[0].split("{s}")[1].split("{o}")[0] for t in vocab.RELATION_TEMPLATES]


def test_rule_extract_matches_re_baseline_on_planted_corpus():
    from mmore_spark.corpus.generator import generate_local

    n_nonempty = 0
    for doc in generate_local(200, seed=7):
        text = " ".join(s["text"] for s in doc.spans if s.get("text"))
        out = extract.rule_extract(text)
        assert out == extract.rule_extract_re(text)
        n_nonempty += bool(out)
    assert n_nonempty > 100  # most docs carry planted relations


def test_rule_extract_matches_re_baseline_adversarial():
    """Overlapping aliases, adjacent sentences, truncated aliases, multiple
    relation sentences per doc, mids without aliases — the cases where the
    finditer emulation (ordered alternation, non-overlapping scan) could
    diverge if it were wrong."""
    rng = random.Random(13)
    aliases, mids = _aliases(), _mids()
    for _ in range(1500):
        parts = []
        for _ in range(rng.randint(1, 6)):
            r = rng.random()
            if r < 0.35:
                tmpl = rng.choice(vocab.RELATION_TEMPLATES)[0]
                parts.append(tmpl.format(s=rng.choice(aliases), o=rng.choice(aliases)))
            elif r < 0.6:
                parts.append(rng.choice(aliases) + rng.choice(mids) + rng.choice(aliases))
            elif r < 0.8:
                a = rng.choice(aliases)
                parts.append(a[:rng.randint(1, len(a))] + rng.choice(mids).strip()
                             + rng.choice(aliases))
            else:
                parts.append(rng.choice(vocab.FILLER_SENTENCES))
        text = rng.choice(["", " ", "x"]).join(parts)
        assert extract.rule_extract(text) == extract.rule_extract_re(text), text


def test_rule_extract_empty_and_no_match():
    assert extract.rule_extract("") == extract.rule_extract_re("") == ""
    assert extract.rule_extract("no entities here") == ""


def test_canonicalize_driver_equals_spark_path(spark, small_docs_df):
    import pandas as pd

    from mmore_spark.functions.spans import render_text
    from mmore_spark.operators import linking

    rendered = small_docs_df.select("doc_id", render_text("spans").alias("text"))
    mentions, _ = extract.extract_mentions_triples(rendered, "text")
    mentions = mentions.cache()
    driver = linking.canonicalize(mentions).toPandas()
    spark_side = linking.canonicalize(mentions, driver_max_names=0).toPandas()
    key = ["name"]
    a = driver.sort_values(key).reset_index(drop=True)
    b = spark_side.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0


def test_canonicalize_driver_pair_cap_falls_back_to_spark_path(spark, small_docs_df):
    """When the driver path would enumerate more candidate pairs than its
    budget it must bail (return None) and canonicalize must fall through
    to the Spark path with identical results."""
    import pandas as pd

    from mmore_spark.functions.spans import render_text
    from mmore_spark.operators import linking

    rendered = small_docs_df.select("doc_id", render_text("spans").alias("text"))
    mentions, _ = extract.extract_mentions_triples(rendered, "text")
    mentions = mentions.cache()
    counts = mentions.groupBy("entity_name").count().collect()
    rows = [{"name": r["entity_name"], "n_mentions": r["count"],
             "entity_type": ""} for r in counts]
    assert linking._canonicalize_driver(spark, rows, max_pairs=0) is None
    # and the full operator still produces the driver-path result when the
    # cap is generous
    normal = linking.canonicalize(mentions).toPandas()
    assert len(normal) == len(rows)


def test_iceberg_fallback_ignores_remote_warehouse(spark):
    from mmore_spark.io import iceberg as I

    # no warehouse conf -> per-application tmp dir
    p = I._fallback_path(spark, "kg.t1")
    assert spark.sparkContext.applicationId in p and p.endswith("kg.t1")
    # remote warehouse must NOT be treated as a local path
    key = f"spark.sql.catalog.{I.DEFAULT_CATALOG}.warehouse"
    spark.conf.set(key, "s3://bucket/warehouse")
    try:
        p2 = I._fallback_path(spark, "kg.t2")
        assert not p2.startswith("s3:")
        assert spark.sparkContext.applicationId in p2
        # local file: URI is adopted, scheme stripped
        spark.conf.set(key, "file:///tmp/wh_x")
        p3 = I._fallback_path(spark, "kg.t3")
        assert p3 == "/tmp/wh_x/_parquet_fallback/kg.t3"
        spark.conf.set(key, "/tmp/wh_y")
        assert I._fallback_path(spark, "kg.t4") == \
            "/tmp/wh_y/_parquet_fallback/kg.t4"
    finally:
        spark.conf.unset(key)


def test_minhash_digest_slice_equals_hex_h60():
    """The dedup signature stage's digest-slice arithmetic
    (int.from_bytes(md5(b).digest()[:8]) >> 4) must equal the oracle's
    h60 definition (first 15 hex digits of the md5) for arbitrary bytes."""
    from hashlib import md5

    from mmore_spark.hashing import h60_py

    rng = random.Random(13)
    for _ in range(500):
        s = "".join(chr(rng.randrange(32, 0x2FF)) for _ in range(rng.randrange(0, 40)))
        for seed in ("", "#mh3", "#perm7"):
            b = (s + seed).encode("utf-8")
            assert int.from_bytes(md5(b).digest()[:8], "big") >> 4 == h60_py(s, seed)


def test_minhash_signatures_unchanged(spark):
    """Pin the optimized signature stage to the h60_py reference values."""
    from mmore_spark.operators import dedup
    from mmore_spark.hashing import h60_py

    rows = [(1, "alpha beta gamma delta epsilon"), (2, "one"), (3, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["doc_id"], r["band"]): r["bh"]
           for r in dedup.minhash_band_signatures(df).collect()}
    for doc_id, text in rows:
        words = (text or "").split(" ")
        n = len(words)
        shingles = [
            words[i] + " " + (words[i + 1] if i + 1 < n else "") + " "
            + (words[i + 2] if i + 2 < n else "")
            for i in range(max(n - 2, 1))
        ]
        mins = [min(h60_py(s, f"#mh{p}") for s in shingles)
                for p in range(dedup.N_PERMUTATIONS)]
        for b in range(dedup.N_PERMUTATIONS // dedup.BAND_ROWS):
            expect = h60_py(f"{mins[2 * b]}:{mins[2 * b + 1]}")
            assert got[(doc_id, b)] == expect


def test_spread_small_scan_is_scale_adaptive(spark, tmp_path):
    """guide §2.4: the corpus round-robin spread must fire for narrow
    scans (the sandbox's single-file tables) and vanish for scans that
    are already wide — with identical results either way."""
    from mmore_spark.functions.scanspread import (
        estimated_scan_partitions, spread_small_scan)

    parallelism = spark.sparkContext.defaultParallelism
    n_files = 2 * parallelism  # strictly wider than the session
    rows = [(i, f"word salad doc {i} alpha beta gamma")
            for i in range(4 * n_files)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    single = str(tmp_path / "single.parquet")
    multi = str(tmp_path / "multi.parquet")
    df.coalesce(1).write.parquet(single)
    df.repartition(n_files).write.parquet(multi)

    narrow = spark.read.parquet(single)
    wide = spark.read.parquet(multi)
    assert estimated_scan_partitions(narrow) == 1
    assert estimated_scan_partitions(wide) >= parallelism
    # in-memory frames have no files -> keep the historical spread
    assert estimated_scan_partitions(df) is None

    def plan(frame):
        return frame._jdf.queryExecution().executedPlan().toString()

    spread_n = spread_small_scan(narrow)
    spread_w = spread_small_scan(wide)
    assert "RoundRobinPartitioning" in plan(spread_n)
    assert "RoundRobinPartitioning" not in plan(spread_w)
    assert sorted(map(tuple, spread_n.collect())) == sorted(map(tuple, spread_w.collect()))


def test_minhash_signatures_equal_on_wide_scan(spark, tmp_path):
    """The dedup signature stage must produce identical signatures whether
    the input is a narrow scan (repartition+checkpoint path) or an
    already-wide scan (shuffle-free path)."""
    from mmore_spark.operators import dedup

    n_files = 2 * spark.sparkContext.defaultParallelism
    n_docs = 3 * n_files
    rows = [(i, f"alpha beta gamma doc {i} delta epsilon zeta")
            for i in range(n_docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    single = str(tmp_path / "s.parquet")
    multi = str(tmp_path / "m.parquet")
    df.coalesce(1).write.parquet(single)
    df.repartition(n_files).write.parquet(multi)

    a = sorted(map(tuple, dedup.minhash_band_signatures(
        spark.read.parquet(single)).collect()))
    b = sorted(map(tuple, dedup.minhash_band_signatures(
        spark.read.parquet(multi)).collect()))
    assert a == b and len(a) == n_docs * (dedup.N_PERMUTATIONS // dedup.BAND_ROWS)


def test_scanspread_conf_size_parsing():
    """Human-readable maxPartitionBytes forms ('256m', '1g') must parse as
    real byte counts — digit-stripping '256m' to 256 bytes would inflate
    the split estimate ~10^6x and wrongly classify narrow scans as wide."""
    from mmore_spark.functions.scanspread import _DEFAULT_SPLIT_BYTES, _parse_bytes

    assert _parse_bytes("134217728b") == 134217728
    assert _parse_bytes("134217728") == 134217728
    assert _parse_bytes("256m") == 256 * 1024 * 1024
    assert _parse_bytes("256MB") == 256 * 1024 * 1024
    assert _parse_bytes("1g") == 1024 ** 3
    assert _parse_bytes("2k") == 2048
    assert _parse_bytes("") is None
    assert _parse_bytes("abc") is None
    assert _parse_bytes("12parsecs") is None
    assert _DEFAULT_SPLIT_BYTES == 128 * 1024 * 1024
