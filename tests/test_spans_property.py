"""Property-based span-contract test (hypothesis): arbitrary valid span
sequences round-trip through the mmore (text, modalities) form."""

import pytest

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis unavailable", allow_module_level=True)

from mmore_spark.corpus.generator import render_text_py

_text = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd", "Zs"),
                           whitelist_characters=".,!?"),
    min_size=1, max_size=40,
)


@st.composite
def span_sequences(draw):
    n = draw(st.integers(min_value=1, max_value=8))
    spans = []
    prev_text = False
    for i in range(n):
        is_media = draw(st.booleans()) if not prev_text else draw(st.booleans())
        # canonical form: no adjacent text spans
        if prev_text:
            is_media = True
        if is_media:
            kind = draw(st.sampled_from(["image", "video", "audio"]))
            spans.append({"kind": kind, "text": None,
                          "media_ref": f"m/{i}.bin", "offset": len(spans)})
            prev_text = False
        else:
            t = draw(_text)
            if "<attachment>" in t:
                t = t.replace("<attachment>", "ATT")
            spans.append({"kind": "text", "text": t, "media_ref": None,
                          "offset": len(spans)})
            prev_text = True
    return spans


def _roundtrip_py(spans):
    """Python twin of spans_from_text(render_text, media_refs)."""
    text = render_text_py(spans)
    media = [(s["kind"], s["media_ref"]) for s in spans if s["kind"] != "text"]
    segs = text.split("<attachment>")
    out = []
    for i, seg in enumerate(segs):
        if seg:
            out.append({"kind": "text", "text": seg, "media_ref": None,
                        "offset": len(out)})
        if i < len(media):
            k, r = media[i]
            out.append({"kind": k, "text": None, "media_ref": r, "offset": len(out)})
    return out


@settings(max_examples=200, deadline=None)
@given(span_sequences())
def test_span_roundtrip_property(spans):
    assert _roundtrip_py(spans) == spans


def test_python_twin_matches_spark(spark):
    """The python round-trip twin equals the native Spark expressions on a
    deterministic sample (so the property transfers)."""
    from pyspark.sql import functions as F

    from mmore_spark.corpus.generator import generate_documents
    from mmore_spark.functions import spans as S

    df = generate_documents(spark, 40, seed=7)
    out = df.select(
        "doc_id", "spans",
        S.spans_from_text(S.render_text("spans"), S.media_refs("spans")).alias("rt"),
    ).collect()
    for r in out:
        spans = [s.asDict() for s in r["spans"]]
        rt_spark = [s.asDict() for s in r["rt"]]
        assert rt_spark == _roundtrip_py(spans) == spans
