"""Property-based roundtrips for the stdlib/numpy media codecs: any image
encodes->decodes to identical pixels (padding/flip/swizzle preserved), any
PCM16 stream survives the RIFF walk, and corrupted magic bytes always raise
NotImplementedError rather than returning garbage."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from yupana_spark.datapipe.multimodal import (decode_bmp, decode_image,
                                              decode_png, decode_ppm,
                                              decode_wav, encode_bmp,
                                              encode_png, encode_ppm,
                                              encode_wav)


@st.composite
def images(draw):
    w = draw(st.integers(min_value=1, max_value=23))
    h = draw(st.integers(min_value=1, max_value=17))
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    return np.random.RandomState(seed).randint(
        0, 256, size=(h, w, 3), dtype=np.uint8)


@settings(max_examples=40, deadline=None)
@given(images())
def test_bmp_roundtrip_property(px):
    blob = encode_bmp(px)
    h, w, _ = px.shape
    assert len(blob) == 54 + h * ((w * 3 + 3) // 4 * 4)
    assert np.array_equal(decode_bmp(blob), px)
    assert np.array_equal(decode_image(blob), px)  # dispatcher


@settings(max_examples=40, deadline=None)
@given(images())
def test_ppm_roundtrip_property(px):
    assert np.array_equal(decode_ppm(encode_ppm(px)), px)


@settings(max_examples=40, deadline=None)
@given(st.integers(min_value=0, max_value=2**31 - 1),
       st.integers(min_value=1, max_value=400),
       st.sampled_from([1, 2]),
       st.sampled_from([8000, 16000, 44100]))
def test_wav_roundtrip_property(seed, n_frames, channels, rate):
    s = np.random.RandomState(seed).randint(
        -32768, 32768, size=n_frames * channels).astype(np.int16)
    rate2, ch2, out = decode_wav(encode_wav(s, rate, channels))
    assert (rate2, ch2) == (rate, channels)
    assert np.array_equal(out, s)


@settings(max_examples=40, deadline=None)
@given(images(), st.integers(min_value=0, max_value=4),
       st.sampled_from([1, 3, 4]))
def test_png_roundtrip_property(px, filter_type, channels):
    """Every scanline filter (None/Sub/Up/Average/Paeth) x every supported
    channel layout (gray/RGB/RGBA) reconstructs identical pixels, and all
    filters of the same image agree with each other (cross-filter
    consistency: a broken un-filter cannot hide behind its own encoder)."""
    px = px[:, :, :channels] if channels < 3 else (
        px if channels == 3 else np.concatenate(
            [px, px[:, :, :1] ^ 0xFF], axis=2))
    if channels == 1:
        px = px[:, :, 0]
    blob = encode_png(px, filter_type=filter_type)
    assert np.array_equal(decode_png(blob), px)
    assert np.array_equal(decode_image(blob), px)  # dispatcher
    assert np.array_equal(decode_png(encode_png(px, filter_type=0)),
                          decode_png(blob))


def test_png_handcrafted_spec_stream():
    """Independent of our encoder: a byte-by-byte handcrafted 2x2 RGB PNG
    (filter 0 row then filter 2/Up row, per RFC 2083) must decode to the
    hand-computed pixels — catches a symmetric encode/decode bug that a
    pure roundtrip cannot."""
    import struct
    import zlib

    def chunk(t, d):
        return (struct.pack("!I", len(d)) + t + d
                + struct.pack("!I", zlib.crc32(t + d)))

    lines = bytes([0, 1, 2, 3, 4, 5, 6]) + bytes([2, 6, 6, 6, 6, 6, 6])
    blob = (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack("!IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(lines))
            + chunk(b"IEND", b""))
    exp = np.array([[[1, 2, 3], [4, 5, 6]],
                    [[7, 8, 9], [10, 11, 12]]], dtype=np.uint8)
    assert np.array_equal(decode_png(blob), exp)


def test_png_unsupported_variants_raise():
    import struct
    import zlib

    def chunk(t, d):
        return (struct.pack("!I", len(d)) + t + d
                + struct.pack("!I", zlib.crc32(t + d)))

    def png_with_ihdr(w, h, depth, ctype, interlace=0):
        return (b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", struct.pack("!IIBBBBB", w, h, depth,
                                             ctype, 0, 0, interlace))
                + chunk(b"IDAT", zlib.compress(b"\x00" * 4))
                + chunk(b"IEND", b""))

    for blob in (png_with_ihdr(2, 2, 16, 2),   # 16-bit
                 png_with_ihdr(2, 2, 8, 3),    # palette
                 png_with_ihdr(2, 2, 8, 2, 1)):  # interlaced
        with pytest.raises(NotImplementedError):
            decode_png(blob)


@settings(max_examples=30, deadline=None)
@given(st.binary(min_size=0, max_size=64))
def test_unknown_bytes_always_raise(blob):
    # exclude blobs that legitimately start with a supported magic
    if (blob[:2] in (b"BM", b"P6") or blob[:4] == b"RIFF"
            or blob[:8] == b"\x89PNG\r\n\x1a\n"):
        return
    with pytest.raises(NotImplementedError):
        decode_image(blob)
    with pytest.raises(NotImplementedError):
        decode_wav(blob)
