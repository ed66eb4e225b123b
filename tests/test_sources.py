"""Source tests: mmore-JSONL round trip and per-format registry routing."""

import json
import os

from pyspark.sql import functions as F

from mmore_spark.sources import jsonl, registry


def test_mmore_jsonl_roundtrip(spark, tmp_path):
    samples = [
        {"id": "s1", "text": "hello <attachment> world",
         "modalities": [{"type": "image", "value": "m/a.png"}],
         "metadata": {"file_path": "/x/a.pdf", "processed_at": "2024-01-01T00:00:00",
                      "processor_type": "PDFProcessor"}},
        {"id": "s2", "text": "plain only", "modalities": [],
         "metadata": {"file_path": "/x/b.txt", "processed_at": "2024-01-02T00:00:00",
                      "processor_type": "TextProcessor"}},
    ]
    src = tmp_path / "in.jsonl"
    src.write_text("\n".join(json.dumps(s) for s in samples))
    docs = jsonl.read_mmore_jsonl(spark, str(src))
    rows = {r["doc_id"]: r for r in docs.collect()}
    assert rows["s1"]["spans"][1]["kind"] == "image"
    assert rows["s1"]["spans"][0]["text"] == "hello "
    assert rows["s2"]["spans"][0]["text"] == "plain only"

    out = str(tmp_path / "out")
    jsonl.write_mmore_jsonl(docs, out)
    back = {r["id"]: r for r in jsonl.read_mmore_jsonl.__wrapped__(spark, out).collect()} \
        if hasattr(jsonl.read_mmore_jsonl, "__wrapped__") else \
        {r["doc_id"]: r for r in jsonl.read_mmore_jsonl(spark, out).collect()}
    assert back["s1"]["spans"] == rows["s1"]["spans"]


def test_registry_routing_and_parse(spark, tmp_path):
    d = tmp_path / "files"
    os.makedirs(d)
    (d / "a.txt").write_text("simple   text file")
    (d / "b.md").write_text("# T\n\nbefore ![alt](img/x.png) after")
    (d / "c.html").write_text('<p>hi <img src="y.jpg"> there</p>')
    (d / "d.pdf").write_bytes(b"%PDF-fake")
    (d / "e.unknown").write_text("nope")

    parsed = registry.scan_and_parse(spark, str(d))
    rows = {os.path.basename(r["file_path"]): r for r in parsed.collect()}
    assert "e.unknown" not in rows  # unrouted
    assert rows["a.txt"]["text"] == "simple text file" and rows["a.txt"]["error"] is None
    assert registry.ATTACHMENT_TAG in rows["b.md"]["text"]
    assert rows["b.md"]["modalities"][0]["media_ref"] == "img/x.png"
    assert rows["c.html"]["modalities"][0]["media_ref"] == "y.jpg"
    assert "img" not in rows["c.html"]["text"]
    # stubbed format fails per-file, not the job
    assert rows["d.pdf"]["error"] is not None and "NotImplementedError" in rows["d.pdf"]["error"]

    docs = registry.to_documents(parsed)
    got = {r["doc_id"]: r for r in docs.collect()}
    md_doc = got[rows["b.md"]["doc_id"]]
    kinds = [s["kind"] for s in md_doc["spans"]]
    assert "image" in kinds and "text" in kinds
