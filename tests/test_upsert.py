"""MERGE-style upsert: updates replace by key; latest-wins with version."""

import os

from mmore_spark.io import tables


def test_upsert_replaces_and_inserts(spark, tmp_path):
    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [("a", 1, "2024-01-01"), ("b", 2, "2024-01-01")],
        "doc_id string, v int, ts string")
    tables.upsert_table(spark, path, base)
    upd = spark.createDataFrame(
        [("b", 20, "2024-02-01"), ("c", 3, "2024-02-01")],
        "doc_id string, v int, ts string")
    tables.upsert_table(spark, path, upd)
    got = {r["doc_id"]: r["v"] for r in tables.read_table(spark, path).collect()}
    assert got == {"a": 1, "b": 20, "c": 3}
    assert not os.path.exists(path + ".__upsert_tmp")


def test_upsert_latest_wins_by_version(spark, tmp_path):
    path = str(tmp_path / "t2")
    base = spark.createDataFrame(
        [("a", 1, "2024-03-01")], "doc_id string, v int, ts string")
    tables.upsert_table(spark, path, base)
    stale = spark.createDataFrame(
        [("a", 99, "2024-01-01"), ("d", 4, "2024-01-01")],
        "doc_id string, v int, ts string")
    tables.upsert_table(spark, path, stale, version_col="ts")
    got = {r["doc_id"]: r["v"] for r in tables.read_table(spark, path).collect()}
    # stale update LOSES to the newer existing row; new key inserted
    assert got == {"a": 1, "d": 4}


def test_upsert_crash_window_recovery(spark, tmp_path):
    """A crash between the two renames leaves no table at `path`; readers
    and the next upsert must restore the pre-upsert snapshot (ADVICE r01)."""
    path = str(tmp_path / "t3")
    base = spark.createDataFrame([("a", 1)], "doc_id string, v int")
    tables.upsert_table(spark, path, base)
    # simulate the crash window: path renamed away, tmp not yet swapped in
    os.rename(path, path + ".__upsert_old")
    assert not os.path.exists(path)
    got = {r["doc_id"]: r["v"] for r in tables.read_table(spark, path).collect()}
    assert got == {"a": 1}  # read healed the table
    assert os.path.exists(path) and not os.path.exists(path + ".__upsert_old")
    # the retried upsert then applies cleanly
    upd = spark.createDataFrame([("a", 2)], "doc_id string, v int")
    tables.upsert_table(spark, path, upd)
    got = {r["doc_id"]: r["v"] for r in tables.read_table(spark, path).collect()}
    assert got == {"a": 2}
