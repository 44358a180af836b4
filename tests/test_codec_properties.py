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


# ---------------------------------------------------------------------
# Failure-contract fuzz: for ANY byte blob — random garbage, truncations
# of valid containers, or single-byte corruptions — the decoders either
# succeed or raise the two DOCUMENTED types (ValueError for malformed /
# truncated containers, NotImplementedError for valid-but-out-of-subset
# features). A raw struct.error / IndexError / zlib.error / TypeError /
# MemoryError escaping means a malformed blob in a 100 TB scan would
# kill the executor task with an undiagnosable error instead of the
# contract's refusal (ADVICE r6 flagged exactly this gap for missing
# headers; these properties pin the whole class).
# ---------------------------------------------------------------------

_DOCUMENTED = (ValueError, NotImplementedError)


def _decode_must_refuse_cleanly(decoder, blob: bytes) -> None:
    try:
        decoder(blob)
    except _DOCUMENTED:
        pass  # the contract: refuse loudly with a documented type


@settings(max_examples=120, deadline=None)
@given(blob=st.binary(min_size=0, max_size=300))
def test_png_decoder_never_raises_undocumented(blob):
    _decode_must_refuse_cleanly(_decode_png_rgb, blob)


@settings(max_examples=120, deadline=None)
@given(blob=st.binary(min_size=0, max_size=300))
def test_avi_decoder_never_raises_undocumented(blob):
    _decode_must_refuse_cleanly(_decode_avi_rgb, blob)


@settings(max_examples=120, deadline=None)
@given(
    w=dims,
    h=dims,
    seed=st.integers(0, 2**31 - 1),
    cut=st.floats(min_value=0.0, max_value=1.0),
)
def test_png_decoder_survives_truncation(w, h, seed, cut):
    rng = np.random.default_rng(seed)
    rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    good = _encode_png_rgb(rgb)
    _decode_must_refuse_cleanly(_decode_png_rgb, good[: int(len(good) * cut)])


@settings(max_examples=120, deadline=None)
@given(
    w=dims,
    h=dims,
    seed=st.integers(0, 2**31 - 1),
    cut=st.floats(min_value=0.0, max_value=1.0),
)
def test_avi_decoder_survives_truncation(w, h, seed, cut):
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, size=(2, h, w, 3), dtype=np.uint8)
    good = _encode_avi_rgb(frames)
    _decode_must_refuse_cleanly(_decode_avi_rgb, good[: int(len(good) * cut)])


@settings(max_examples=150, deadline=None)
@given(
    w=dims,
    h=dims,
    seed=st.integers(0, 2**31 - 1),
    pos_frac=st.floats(min_value=0.0, max_value=1.0),
    flip=st.integers(1, 255),
)
def test_png_decoder_survives_single_byte_corruption(
    w, h, seed, pos_frac, flip
):
    """Any single corrupted byte either leaves a decodable PNG (the byte
    landed somewhere the subset ignores), or fails with a documented
    refusal — the CRC check catches chunk-body damage, the bounds
    checks catch frame damage."""
    rng = np.random.default_rng(seed)
    rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    good = bytearray(_encode_png_rgb(rgb))
    pos = min(int(len(good) * pos_frac), len(good) - 1)
    good[pos] ^= flip
    _decode_must_refuse_cleanly(_decode_png_rgb, bytes(good))


@settings(max_examples=150, deadline=None)
@given(
    w=dims,
    h=dims,
    seed=st.integers(0, 2**31 - 1),
    pos_frac=st.floats(min_value=0.0, max_value=1.0),
    flip=st.integers(1, 255),
)
def test_avi_decoder_survives_single_byte_corruption(
    w, h, seed, pos_frac, flip
):
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, size=(2, h, w, 3), dtype=np.uint8)
    good = bytearray(_encode_avi_rgb(frames))
    pos = min(int(len(good) * pos_frac), len(good) - 1)
    good[pos] ^= flip
    _decode_must_refuse_cleanly(_decode_avi_rgb, bytes(good))


# ---------------------------------------------------------------------
# Crafted-input DoS regressions (ADVICE r7 mediums). The small-blob fuzz
# above can't reach these: the bomb needs a high-ratio IDAT and the
# recursion needs thousands of nested LISTs, both far past 300 bytes.
# ---------------------------------------------------------------------


def _chunk_png(tag: bytes, payload: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def test_png_decompression_bomb_refused_without_inflating():
    """A valid-CRC PNG whose tiny IHDR declares 4x4 but whose IDAT
    inflates to 400 MB must fail with the documented ValueError WITHOUT
    materializing the 400 MB — the inflate is bounded to the declared
    geometry plus one probe byte (multimodal.py bounded decompressobj).
    """
    import struct
    import tracemalloc
    import zlib

    import pytest

    comp = zlib.compressobj(9)
    parts = [comp.compress(b"\x00" * (1 << 20)) for _ in range(400)]
    parts.append(comp.flush())
    idat = b"".join(parts)  # ~400 KB compressed, 400 MB inflated
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk_png(b"IHDR", ihdr)
        + _chunk_png(b"IDAT", idat)
        + _chunk_png(b"IEND", b"")
    )
    tracemalloc.start()
    try:
        with pytest.raises(ValueError, match="decompressed size"):
            _decode_png_rgb(blob)
        _, peak = tracemalloc.get_traced_memory()
    finally:
        tracemalloc.stop()
    # the 400 MB plaintext must never exist; generous ceiling for the
    # blob copy + interpreter noise
    assert peak < 16 * (1 << 20), f"inflate not bounded: peak={peak}"


def test_png_underdeclared_idat_still_refused():
    """The bounded inflate must not weaken the size contract in the
    other direction: an IDAT that inflates to LESS than h*stride is
    still the documented ValueError (truncated pixel data)."""
    import struct

    import pytest

    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    import zlib

    short = zlib.compress(b"\x00" * 10)  # expected 4*(1+12) = 52
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk_png(b"IHDR", ihdr)
        + _chunk_png(b"IDAT", short)
        + _chunk_png(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="decompressed size"):
        _decode_png_rgb(blob)


def test_avi_deeply_nested_lists_no_recursion_error():
    """4000 nested LIST chunks (48 KB blob) must walk iteratively and
    fail with the documented ValueError (no avih/strf), never a
    RecursionError from per-LIST recursion."""
    import struct

    import pytest

    body = b""
    for _ in range(4000):
        body = b"LIST" + struct.pack("<I", len(body) + 4) + b"nest" + body
    blob = b"RIFF" + struct.pack("<I", len(body) + 4) + b"AVI " + body
    with pytest.raises(ValueError, match="missing avih/strf"):
        _decode_avi_rgb(blob)
