"""Translator contract: attachment tags preserved positionally, language
gate, original text stashed (translator/base.py:87-125 semantics)."""

from mmore_spark.operators.translator import fake_translate, translate_stage


def test_translator_preserves_attachment_contract(spark):
    rows = [
        ("d1", "hola mundo <attachment> adios amigos <attachment> fin", "es"),
        ("d2", "english stays put <attachment> here", "en"),
        ("d3", "", "de"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string, lang string")
    out = {r["doc_id"]: r for r in translate_stage(df).collect()}

    d1 = out["d1"]
    assert d1["translated"] is True
    assert d1["text"].count("<attachment>") == 2
    assert d1["original_text"] == rows[0][1]
    segs = d1["text"].split("<attachment>")
    assert segs[0].strip() == "mundo hola"
    assert segs[1].strip() == "amigos adios"

    d2 = out["d2"]
    assert d2["translated"] is False and d2["text"] == rows[1][1]

    assert out["d3"]["translated"] is True and out["d3"]["text"] == ""


def test_fake_translate_deterministic():
    assert fake_translate("a b c", "es") == "c b a"
    assert fake_translate("a b c", "es") == fake_translate("a b c", "de")
