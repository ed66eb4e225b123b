"""operators/fasttext_bin: the pretrained-model slot of the reference's
filter_fasttext, accepting fasttext's own ``model.bin`` format with no
library.  Fixtures are synthesized files written in the documented
binary layout with hand-chosen vectors, so predictions have closed-form
expected values (and the FNV constants are checked against an
independent in-test implementation, not the module's)."""

import struct

import pytest

from mmore_spark.operators import fasttext_bin as FB


def _write_model(path, words, labels, input_rows, output_rows, dim,
                 bucket=0, minn=0, maxn=0, word_ngrams=1, quant=0, loss=3):
    """Serialize fasttext's saveModel layout (magic, args, dict, quant
    flag + input matrix, qout flag + output matrix).  loss defaults to 3
    (softmax, the supervised default) — loss=1 (hs) is rejected by the
    loader because its output rows are tree nodes, not labels."""
    with open(path, "wb") as f:
        f.write(struct.pack("<ii", FB.FT_MAGIC, 12))
        args = dict(dim=dim, ws=5, epoch=5, minCount=1, neg=5,
                    wordNgrams=word_ngrams, loss=loss, model=3, bucket=bucket,
                    minn=minn, maxn=maxn, lrUpdateRate=100)
        f.write(struct.pack("<" + "i" * 12, *[args[k] for k in FB._ARGS_INT]))
        f.write(struct.pack("<d", 1e-4))
        size = len(words) + len(labels)
        f.write(struct.pack("<iii", size, len(words), len(labels)))
        f.write(struct.pack("<qq", 1000, 0))  # ntokens, pruneidx_size
        for w in words:
            f.write(w.encode() + b"\x00" + struct.pack("<qb", 10, 0))
        for lb in labels:
            f.write(lb.encode() + b"\x00" + struct.pack("<qb", 10, 1))
        f.write(struct.pack("<b", quant))
        m = len(input_rows)
        f.write(struct.pack("<qq", m, dim))
        for row in input_rows:
            f.write(struct.pack(f"<{dim}f", *row))
        f.write(struct.pack("<b", 0))
        f.write(struct.pack("<qq", len(output_rows), dim))
        for row in output_rows:
            f.write(struct.pack(f"<{dim}f", *row))


def test_load_and_predict_word_model(tmp_path):
    """dim-4 supervised model, no subwords/word-ngrams: the sentence
    vector is the mean of known word vectors (+ the zero </s>) and the
    argmax label follows the output rows exactly."""
    p = str(tmp_path / "m.bin")
    words = ["</s>", "good", "bad"]
    labels = ["__label__pos", "__label__neg"]
    inp = [[0, 0, 0, 0], [1.0, 0, 0, 0], [0, 1.0, 0, 0]]
    out = [[4.0, 0, 0, 0], [0, 4.0, 0, 0]]
    _write_model(p, words, labels, inp, out, dim=4)
    m = FB.load_fasttext_model(p)
    assert m.labels == labels and m.args["dim"] == 4
    lab, prob = m.predict("good good stuff")
    assert lab == "__label__pos" and prob > 0.5
    assert m.predict("bad bad bad")[0] == "__label__neg"
    # unknown-only text: no rows beyond </s> (zero vector) → tie → the
    # softmax is uniform and argmax deterministic
    lab_u, prob_u = m.predict("zzz qqq")
    assert abs(prob_u - 0.5) < 1e-6


def test_fnv_hash_matches_independent_implementation():
    """The module's hash must be FNV-1a 32-bit (fasttext's dictionary
    hash) — verified against a from-the-constants reimplementation and
    the published FNV-1a test vector for empty input (2166136261)."""
    def fnv1a(data: bytes) -> int:
        h = 0x811C9DC5
        for b in data:
            h = ((h ^ b) * 0x01000193) & 0xFFFFFFFF
        return h

    assert FB.FastTextModel._hash(b"") == 0x811C9DC5 == fnv1a(b"")
    for s in [b"a", b"abc", b"<go", b"od>", "héllo".encode("utf-8")]:
        assert FB.FastTextModel._hash(s) == fnv1a(s)


def test_subword_and_wordngram_rows(tmp_path):
    """minn=2/maxn=3 + wordNgrams=2: the line rows include the word id,
    its char-ngram buckets (boundary 1-grams excluded, full <word>
    included) and the rolling-hash bigram bucket — all offset by
    nwords."""
    p = str(tmp_path / "m2.bin")
    words = ["</s>", "ab"]
    labels = ["__label__x"]
    bucket, dim = 32, 2
    nrows = len(words) + bucket
    inp = [[0.0, 0.0]] * nrows
    _write_model(p, words, labels, inp, [[1.0, 0.0]], dim=dim,
                 bucket=bucket, minn=2, maxn=3, word_ngrams=2)
    m = FB.load_fasttext_model(p)

    def fnv1a(data: bytes) -> int:
        h = 0x811C9DC5
        for b in data:
            h = ((h ^ b) * 0x01000193) & 0xFFFFFFFF
        return h

    # subwords of "<ab>": 2-grams <a ab b> ; 3-grams <ab ab> ; NOT the
    # lone < or > 1-grams (minn=2 excludes all 1-grams here anyway)
    expect_sub = {2 + fnv1a(g.encode()) % bucket
                  for g in ["<a", "ab", "b>", "<ab", "ab>"]}
    got = m._subwords("ab")
    assert set(got) == expect_sub and len(got) == 5

    rows = m._line_rows(["ab", "ab"])
    h_ab = fnv1a(b"ab")
    # fasttext sign-extends the int32-stored hash into uint64 before the
    # rolling combine (dictionary.cc addWordNgrams)
    se = h_ab - (1 << 32) if h_ab >= (1 << 31) else h_ab
    bigram = 2 + (((se & 0xFFFFFFFFFFFFFFFF) * 116049371 + se)
                  & 0xFFFFFFFFFFFFFFFF) % bucket
    assert rows.count(1) == 2          # the word id, twice
    assert bigram in rows              # the word-bigram bucket


def test_wordngram_hash_sign_extension(tmp_path):
    """A token whose FNV-1a hash has the top bit set must combine as a
    NEGATIVE int32 (sign-extended), exactly as the library's
    ``uint64_t h = hashes[i]`` conversion does — unsigned math produces a
    different bucket row for ~half of all tokens (ADVICE r05)."""
    def fnv1a(data: bytes) -> int:
        h = 0x811C9DC5
        for b in data:
            h = ((h ^ b) * 0x01000193) & 0xFFFFFFFF
        return h

    # find a short token with the sign bit set
    tok = next(t for t in ("a", "b", "c", "d", "e", "f", "g", "x", "y", "z")
               if fnv1a(t.encode()) >= (1 << 31))
    p = str(tmp_path / "se.bin")
    words = ["</s>", tok]
    # fasttext's real default bucket count — deliberately NOT a power of
    # two: with a 2^k bucket the signed/unsigned conventions coincide
    # (their difference is a multiple of 2^32)
    bucket = 2_000_000
    nrows = len(words) + bucket
    import numpy as np  # noqa: F401
    _write_model(p, words, ["__label__x"], [[0.0]] * nrows, [[1.0]],
                 dim=1, bucket=bucket, word_ngrams=2)
    m = FB.load_fasttext_model(p)
    rows = m._line_rows([tok, tok])
    h = fnv1a(tok.encode())
    se = h - (1 << 32)
    expect = 2 + (((se & 0xFFFFFFFFFFFFFFFF) * 116049371 + se)
                  & 0xFFFFFFFFFFFFFFFF) % bucket
    wrong_unsigned = 2 + ((h * 116049371 + h) & 0xFFFFFFFFFFFFFFFF) % bucket
    assert expect in rows
    assert expect != wrong_unsigned  # the two conventions really differ
    assert wrong_unsigned not in rows


def test_hs_loss_model_rejected(tmp_path):
    p = str(tmp_path / "hs.bin")
    _write_model(p, ["</s>"], ["__label__x"], [[0.0]], [[0.0]], dim=1,
                 loss=1)
    with pytest.raises(NotImplementedError, match="hs"):
        FB.load_fasttext_model(p)


def test_ns_ova_losses_score_with_sigmoid(tmp_path):
    """ns/ova models rank by the same logits but the score is the
    label's sigmoid, not a softmax probability."""
    import math

    for loss in (2, 4):
        p = str(tmp_path / f"l{loss}.bin")
        words = ["</s>", "good"]
        inp = [[0.0, 0.0], [1.0, 0.0]]
        out = [[3.0, 0.0], [-1.0, 0.0]]
        _write_model(p, words, ["__label__pos", "__label__neg"], inp, out,
                     dim=2, loss=loss)
        m = FB.load_fasttext_model(p)
        lab, score = m.predict("good")
        assert lab == "__label__pos"
        # sentence vector = mean([good, </s>]) = (0.5, 0); logit = 1.5
        assert abs(score - 1.0 / (1.0 + math.exp(-1.5))) < 1e-6


def test_quantized_model_raises(tmp_path):
    p = str(tmp_path / "q.bin")
    _write_model(p, ["</s>"], ["__label__x"], [[0.0]], [[0.0]], dim=1,
                 quant=1)
    with pytest.raises(NotImplementedError):
        FB.load_fasttext_model(p)


def test_spark_fasttext_classify_stage(spark, tmp_path):
    """The Arrow stage classifies a DataFrame and keeps its columns."""
    p = str(tmp_path / "m3.bin")
    words = ["</s>", "spam", "ham"]
    labels = ["__label__spam", "__label__ham"]
    inp = [[0, 0], [1.0, 0], [0, 1.0]]
    out = [[6.0, 0], [0, 6.0]]
    _write_model(p, words, labels, inp, out, dim=2)
    df = spark.createDataFrame(
        [("a", "spam spam offer"), ("b", "ham breakfast ham")],
        "doc_id string, text string")
    got = {r["doc_id"]: r for r in
           FB.fasttext_classify(df, p).collect()}
    assert got["a"]["ft_label"] == "__label__spam"
    assert got["b"]["ft_label"] == "__label__ham"
    assert 0.5 < got["a"]["ft_prob"] <= 1.0


def test_config_filter_fasttext_with_model_file(spark, tmp_path):
    """The reference's filter_fasttext pp-module runs for real when the
    config points at a model file: rows whose best label is outside
    keep_labels (or under the threshold) drop."""
    from mmore_spark.plans.config import apply_pp_modules

    p = str(tmp_path / "q.bin")
    words = ["</s>", "clean", "junk"]
    labels = ["__label__hq", "__label__lq"]
    _write_model(p, words, labels, [[0, 0], [1.0, 0], [0, 1.0]],
                 [[6.0, 0], [0, 6.0]], dim=2)
    df = spark.createDataFrame(
        [("a", "clean clean prose"), ("b", "junk junk junk")],
        "doc_id string, text string")
    out = apply_pp_modules(df, [{
        "type": "filter_fasttext",
        "args": {"model_path": p, "keep_labels": ["__label__hq"]},
    }])
    rows = out.collect()
    assert [r["doc_id"] for r in rows] == ["a"]
    assert set(out.columns) == {"doc_id", "text"}
