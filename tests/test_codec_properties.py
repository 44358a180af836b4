"""Property tests for the from-spec container codecs: encode -> decode
must be the identity for ARBITRARY payloads, not just the doc_id-derived
synthesis family the oracle checks. Pure Python (no Spark session) —
these pin the codec layer itself; the differential oracles pin the
engine plumbing above it.

Failure here means the codec would corrupt real user media, so the
strategies deliberately sweep the layout edge cases: 1-pixel images,
widths crossing the AVI 4-byte stride boundary, extreme sample values,
and odd RIFF chunk lengths.
"""

from __future__ import annotations

import io
import wave

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from geektime_bigdata_spark.operators.multimodal import (
    _decode_avi_rgb,
    _decode_png_rgb,
    _encode_avi_rgb,
    _encode_png_rgb,
)

dims = st.integers(min_value=1, max_value=23)


@settings(max_examples=60, deadline=None)
@given(
    w=dims,
    h=dims,
    data=st.data(),
)
def test_png_roundtrip_identity(w, h, data):
    flat = data.draw(
        st.lists(
            st.integers(0, 255),
            min_size=w * h * 3,
            max_size=w * h * 3,
        )
    )
    rgb = np.array(flat, dtype=np.uint8).reshape(h, w, 3)
    header, back = _decode_png_rgb(_encode_png_rgb(rgb))
    assert header[:4] == (w, h, 8, 2)
    assert (back == rgb).all()


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=5),
    w=dims,
    h=dims,
    seed=st.integers(0, 2**31 - 1),
)
def test_avi_roundtrip_identity(n, w, h, seed):
    # deterministic pseudo-random frames; the stride-padding path is hit
    # whenever w * 3 is not a multiple of 4 (w not divisible by 4)
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)
    (n_out, w_out, h_out), (bits, comp), back = _decode_avi_rgb(
        _encode_avi_rgb(frames)
    )
    assert (n_out, w_out, h_out, bits, comp) == (n, w, h, 24, 0)
    assert back.shape == frames.shape
    assert (back == frames).all()


@settings(max_examples=40, deadline=None)
@given(
    samples=st.lists(
        st.integers(min_value=-(2**15), max_value=2**15 - 1),
        min_size=1,
        max_size=400,
    ),
    rate=st.sampled_from([8000, 16000, 44100]),
)
def test_wav_roundtrip_identity(samples, rate):
    arr = np.array(samples, dtype=np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(arr.tobytes())
    with wave.open(io.BytesIO(buf.getvalue()), "rb") as rf:
        assert rf.getframerate() == rate
        assert rf.getnchannels() == 1
        assert rf.getnframes() == len(arr)
        back = np.frombuffer(rf.readframes(rf.getnframes()), dtype=np.int16)
    assert (back == arr).all()
