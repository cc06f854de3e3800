"""Property-based tests (hypothesis) for the scalar-function core.

Spark-vs-Python equivalence on *generated* inputs — the tokenizer and
bucket expressions must agree with their pure-Python specifications
on arbitrary text, not just the golden fixtures. Batched: hypothesis
generates corpora driver-side, one Spark job checks the whole batch
(per-example Spark jobs would be minutes per property).
"""

from __future__ import annotations

import pytest

import string

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mapreducewordcount_spark.functions.buckets import bucket_expr
from mapreducewordcount_spark.functions.tokenize import tokenize_expr

# words over a latin-1-ish alphabet incl. punctuation and digits
_word = st.text(
    alphabet=string.ascii_letters + string.digits + string.punctuation + "éàüñøπ",
    min_size=1, max_size=12)
_line = st.lists(_word, min_size=0, max_size=8).map(" ".join)


def _native_reference(line: str) -> list[str]:
    out = []
    for raw in line.split():
        w = raw.strip(string.punctuation).lower()
        if w:
            out.append(w)
    return out


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(lines=st.lists(_line, min_size=1, max_size=40))
@pytest.mark.slow  # heavy sweep: default tier skips (pytest.ini, r14)
def test_native_tokenizer_matches_python_spec(spark, lines):
    df = spark.createDataFrame([(ln,) for ln in lines], "value string")
    got = [r.w for r in df.select(tokenize_expr("value").alias("w")).collect()]
    assert got == [_native_reference(ln) for ln in lines]


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(words=st.lists(_word.filter(lambda w: w.strip()), min_size=1, max_size=60),
       m=st.sampled_from([1, 2, 4, 7, 26]))
@pytest.mark.slow  # heavy sweep: default tier skips (pytest.ini, r14)
def test_bucket_expr_matches_python_ord(spark, words, m):
    df = spark.createDataFrame([(w,) for w in words], "word string")
    got = [r.b for r in df.select(bucket_expr("word", m).alias("b")).collect()]
    assert got == [ord(w[0].lower()) % m for w in words]


# --- media codec properties (round 4): pure-Python, no Spark job ------------

@given(st.binary(min_size=0, max_size=512),
       st.sampled_from([8000, 16000, 44100]))
@settings(max_examples=200, deadline=None)
def test_wav_roundtrip_arbitrary_payloads(samples, rate):
    """encode → decode recovers header fields and sample count for
    ANY byte payload, and the DSP stats stay in their domains."""
    from mapreducewordcount_spark.operators.multimodal import (
        wav_decode,
        wav_encode_pcm,
    )

    got = wav_decode(wav_encode_pcm(samples, sample_rate=rate))
    assert got["sample_rate"] == rate
    assert got["n_channels"] == 1
    assert got["n_samples"] == len(samples)
    assert 0.0 <= got["rms"] <= 1.0
    assert 0.0 <= got["zcr"] <= 1.0
    if not samples:
        assert got["rms"] == 0.0 and got["zcr"] == 0.0


@given(st.integers(1, 12), st.integers(1, 12), st.data())
@settings(max_examples=60, deadline=None)
def test_png_roundtrip_arbitrary_pixels(w, h, data):
    """PNG encode → pixel decode is the identity on arbitrary RGB
    buffers (exercises the filter-0 writer against the full reader)."""
    from mapreducewordcount_spark.operators.multimodal import (
        png_decode_pixels,
        png_encode,
    )

    rgb = bytes(data.draw(st.lists(
        st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3)))
    w2, h2, px = png_decode_pixels(png_encode(w, h, rgb))
    assert (w2, h2) == (w, h)
    assert bytes(px) == rgb


@given(st.integers(1, 10), st.integers(1, 10),
       st.integers(1, 10), st.integers(1, 10), st.data())
@settings(max_examples=60, deadline=None)
def test_resize_preserves_palette_and_dims(sw, sh_, dw, dh, data):
    """Nearest-neighbor resample: output dims are exact and every
    output pixel is SOME input pixel (no interpolation invented)."""
    from mapreducewordcount_spark.operators.multimodal import (
        resize_rgb_nearest,
    )

    rgb = bytes(data.draw(st.lists(
        st.integers(0, 255), min_size=sw * sh_ * 3, max_size=sw * sh_ * 3)))
    out = resize_rgb_nearest(sw, sh_, rgb, dw, dh)
    assert len(out) == dw * dh * 3
    src_px = {rgb[i:i + 3] for i in range(0, len(rgb), 3)}
    for i in range(0, len(out), 3):
        assert out[i:i + 3] in src_px
