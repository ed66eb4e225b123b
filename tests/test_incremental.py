"""Change-detection semantics: the reference's mtime-vs-processed_at reuse
matrix (tests/test_change_detection_process.py analog)."""

from mmore_spark.operators import incremental as inc


def test_latest_wins(spark):
    prev = spark.createDataFrame(
        [("a", "2024-01-02", 1), ("a", "2024-01-05", 2), ("b", None, 3),
         ("b", "2024-01-01", 4), ("c", None, 5)],
        "file_path string, processed_at string, payload int",
    )
    got = {r["file_path"]: (r["processed_at"], r["payload"])
           for r in inc.latest_wins(prev).collect()}
    assert got["a"] == ("2024-01-05", 2)
    assert got["b"] == ("2024-01-01", 4)  # null loses to non-null
    assert got["c"] == (None, 5)


def test_split_reusable_process_matrix(spark):
    crawled = spark.createDataFrame(
        [("f1", "2024-01-01"),   # unchanged → reuse
         ("f2", "2024-02-01"),   # modified after processing → reprocess
         ("f3", "2024-01-01"),   # never processed → process
         ("f4", "2024-01-01")],  # cached without timestamp → process
        "file_path string, mtime string",
    )
    previous = spark.createDataFrame(
        [("f1", "2024-01-15"), ("f2", "2024-01-15"), ("f4", None)],
        "file_path string, processed_at string",
    )
    reusable, to_process = inc.split_reusable_process(crawled, previous)
    assert {r["file_path"] for r in reusable.collect()} == {"f1"}
    assert {r["file_path"] for r in to_process.collect()} == {"f2", "f3", "f4"}


def test_split_reusable_postprocess(spark):
    inputs = spark.createDataFrame(
        [("f1", "2024-01-01"), ("f2", "2024-01-20"), ("f3", "2024-01-01"),
         ("f4", "2024-01-01")],
        "file_path string, processed_at string",
    )
    previous = spark.createDataFrame(
        [("f1", "2024-01-10"), ("f1", "2024-01-12"),   # min 01-10 >= input → reuse
         ("f2", "2024-01-10"),                          # input newer → reprocess
         ("f4", "2024-01-10"), ("f4", None)],           # null ts → reprocess
        "file_path string, processed_at string",
    )
    reusable, to_process = inc.split_reusable_postprocess(inputs, previous)
    assert {r["file_path"] for r in reusable.collect()} == {"f1"}
    assert {r["file_path"] for r in to_process.collect()} == {"f2", "f3", "f4"}


def test_merge_and_deleted(spark):
    reused = spark.createDataFrame([("f1", "r1")], "file_path string, v string")
    new = spark.createDataFrame([("f2", "n1"), ("gone", "n2")],
                                "file_path string, v string")
    current = spark.createDataFrame([("f1",), ("f2",)], "file_path string")
    merged = inc.merge_results(reused, new, current)
    assert {(r["file_path"], r["v"]) for r in merged.collect()} == {("f1", "r1"), ("f2", "n1")}

    previous = spark.createDataFrame([("f1",), ("f9",)], "file_path string")
    deleted = inc.deleted_keys(previous, current)
    assert {r["file_path"] for r in deleted.collect()} == {"f9"}
