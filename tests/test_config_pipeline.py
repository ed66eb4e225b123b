"""plans/config: the reference's config-file UX driving Spark pipelines.
Loads the reference's OWN production/example YAMLs (read-only) and runs
the pp_modules chains over real data."""

import os

from pyspark.sql import functions as F

from mmore_spark.plans import config as CFG


def _samples(spark):
    rows = [
        ("a.txt", "the quick brown fox jumps over the lazy dog. "
                  "It runs far away.", "en"),
        ("b.txt", "un deux trois quatre cinq six sept huit neuf dix "
                  "onze douze.", "fr"),
    ]
    return spark.createDataFrame(rows, "file_path string, text string, lang string")


def test_reference_example_postprocessor_config_runs(spark):
    """The reference repo's example postprocessor config loads as-is and
    its chunker chain executes (unknown args like table_handling pass
    through harmlessly)."""
    cfg = CFG.load_config(
        "/root/reference/examples/postprocessor/config.yaml")
    assert cfg["pp_modules"][0]["type"] == "chunker"
    out = CFG.apply_pp_modules(_samples(spark).drop("lang"),
                               cfg["pp_modules"])
    rows = out.collect()
    assert len(rows) >= 2
    assert {"chunk_id", "chunk_index", "text"} <= set(out.columns)


def test_reference_production_pp_modules_build(spark):
    """The reference's production postprocessor chain (file_namer →
    chunker → translator → metafuse) builds and runs end-to-end; the
    metafuse template fuses the file_name column per its
    content_template."""
    cfg = CFG.load_config(
        "/root/reference/production-config/postprocessor/config.yaml")
    types = [m["type"] for m in cfg["pp_modules"]]
    assert types == ["file_namer", "chunker", "translator", "metafuse"]
    out = CFG.apply_pp_modules(_samples(spark).drop("lang"),
                               cfg["pp_modules"])
    rows = out.collect()
    assert rows
    for r in rows:
        assert r["text"].startswith("Content from ")
        assert r["file_name"] in r["text"].split("\n", 1)[0]


def test_pp_chain_taggers_filters_and_ner(spark):
    mods = [
        {"type": "lang_detector"},
        {"type": "words_counter"},
        {"type": "filter_language", "args": {"languages": ["en"]}},
        {"type": "filter_gopher-quality", "args": {"min_doc_words": 5}},
        {"type": "ner"},
    ]
    out = CFG.apply_pp_modules(_samples(spark).drop("lang"), mods)
    rows = out.collect()
    # the French gibberish doc fails the en language gate
    assert [r["file_path"] for r in rows] == ["a.txt"]
    assert rows[0]["word_count"] == 13
    assert "entities" in out.columns and "triples" in out.columns


def test_run_process_config(spark, tmp_path):
    d = tmp_path / "data"
    os.makedirs(d)
    (d / "x.txt").write_text("hello config world")
    (d / "y.md").write_text("# Title\n\nbody text")
    outp = str(tmp_path / "out")
    cfg = {"data_path": str(d),
           "dispatcher_config": {"output_path": outp}}
    out = CFG.run_process(spark, cfg)
    got = {r["file_path"].rsplit("/", 1)[-1]: r for r in out.collect()}
    assert got["x.txt"]["text"] == "hello config world"
    assert got["x.txt"]["error"] is None
    assert os.path.exists(os.path.join(outp, "_SUCCESS"))
    # filter_fasttext points at the in-engine trainable path
    import pytest

    with pytest.raises(NotImplementedError):
        CFG.apply_pp_modules(out, [{"type": "filter_fasttext"}])


def test_cli_process_then_postprocess(spark, tmp_path):
    """The reference's CLI verbs end-to-end: process a directory via a
    YAML config, then run a pp chain over the parquet output."""
    import yaml

    from mmore_spark.__main__ import main

    d = tmp_path / "data"
    os.makedirs(d)
    (d / "doc.txt").write_text("the quick brown fox jumps over the dog.")
    outp = str(tmp_path / "processed")
    pcfg = tmp_path / "process.yaml"
    pcfg.write_text(yaml.safe_dump(
        {"data_path": str(d), "dispatcher_config": {"output_path": outp}}))
    assert main(["process", "--config-file", str(pcfg)]) == 0

    merged = str(tmp_path / "merged")
    qcfg = tmp_path / "pp.yaml"
    qcfg.write_text(yaml.safe_dump({
        "pp_modules": [{"type": "file_namer"}, {"type": "words_counter"}],
        "output": {"output_path": merged},
    }))
    assert main(["postprocess", "--config-file", str(qcfg),
                 "--input", outp]) == 0
    got = spark.read.parquet(merged).collect()
    assert got[0]["file_name"] == "doc.txt"
    assert got[0]["word_count"] == 8


def test_filter_unigram_logprob_module(spark):
    mods = [{"type": "filter_unigram-logprob",
             "args": {"logprobs_threshold": -0.2}}]
    df = spark.createDataFrame(
        [("a", "common common common common"), ("b", "common rare")],
        "doc_id string, text string")
    kept = CFG.apply_pp_modules(df, mods).collect()
    # doc a: avg log10 p = log10(5/6) ~ -0.079; doc b ~ -0.429 (rare word)
    assert [r["doc_id"] for r in kept] == ["a"]
