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


def test_upsert_crash_rolls_forward_to_completed_tmp(spark, tmp_path):
    """The REAL crash window: write_table(tmp) finished (marker intact),
    `path` renamed to `.__upsert_old`, crash before `tmp → path`.  Recovery
    must roll FORWARD to tmp — the updates are preserved, is_complete stays
    true, and resume never silently drops the upsert (ADVICE r02)."""
    path = str(tmp_path / "t3f")
    base = spark.createDataFrame([("a", 1)], "doc_id string, v int")
    tables.upsert_table(spark, path, base)
    merged = spark.createDataFrame([("a", 2)], "doc_id string, v int")
    tables.write_table(merged, path + ".__upsert_tmp", stage="upsert")
    os.rename(path, path + ".__upsert_old")  # crash point
    assert not os.path.exists(path)
    assert tables.is_complete(path)  # heal happened inside is_complete
    got = {r["doc_id"]: r["v"] for r in tables.read_table(spark, path).collect()}
    assert got == {"a": 2}  # the crashed upsert's updates survived
    assert not os.path.exists(path + ".__upsert_old")
    assert not os.path.exists(path + ".__upsert_tmp")


def test_upsert_stale_old_cleaned_when_table_intact(spark, tmp_path):
    """Crash AFTER the tmp→path swap but before the final rmtree leaves a
    stale pre-upsert snapshot doubling storage; any read heals it."""
    path = str(tmp_path / "t5")
    base = spark.createDataFrame([("a", 2)], "doc_id string, v int")
    tables.upsert_table(spark, path, base)
    stale = spark.createDataFrame([("a", 1)], "doc_id string, v int")
    tables.write_table(stale, path + ".__upsert_old", stage="stale")
    assert tables.is_complete(path)
    assert not os.path.exists(path + ".__upsert_old")  # cleaned
    got = {r["doc_id"]: r["v"] for r in tables.read_table(spark, path).collect()}
    assert got == {"a": 2}  # the intact table untouched


def test_upsert_crash_without_tmp_restores_old_and_surfaces(spark, tmp_path):
    """Fallback (tmp absent/partial): restore the pre-upsert snapshot but
    STRIP its completion marker, so the resume rule re-runs the stage
    instead of trusting data the upsert never reached (ADVICE r02)."""
    path = str(tmp_path / "t3")
    base = spark.createDataFrame([("a", 1)], "doc_id string, v int")
    tables.upsert_table(spark, path, base)
    # simulate the crash window with NO completed tmp
    os.rename(path, path + ".__upsert_old")
    assert not os.path.exists(path)
    got = {r["doc_id"]: r["v"] for r in tables.read_table(spark, path).collect()}
    assert got == {"a": 1}  # read healed the table to the old snapshot
    assert os.path.exists(path) and not os.path.exists(path + ".__upsert_old")
    assert not tables.is_complete(path)  # incompleteness surfaced
    # the retried upsert then applies cleanly
    upd = spark.createDataFrame([("a", 2)], "doc_id string, v int")
    tables.upsert_table(spark, path, upd)
    got = {r["doc_id"]: r["v"] for r in tables.read_table(spark, path).collect()}
    assert got == {"a": 2}
    assert tables.is_complete(path)
