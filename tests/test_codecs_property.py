"""Property-based roundtrips for the stdlib/numpy media codecs: any image
encodes->decodes to identical pixels (padding/flip/swizzle preserved), any
PCM16 stream survives the RIFF walk, and corrupted magic bytes always raise
NotImplementedError rather than returning garbage."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from yupana_spark.datapipe.multimodal import (decode_bmp, decode_image,
                                              decode_ppm, decode_wav,
                                              encode_bmp, encode_ppm,
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


@settings(max_examples=30, deadline=None)
@given(st.binary(min_size=0, max_size=64))
def test_unknown_bytes_always_raise(blob):
    # exclude blobs that legitimately start with a supported magic
    if blob[:2] in (b"BM", b"P6") or blob[:4] == b"RIFF":
        return
    with pytest.raises(NotImplementedError):
        decode_image(blob)
    with pytest.raises(NotImplementedError):
        decode_wav(blob)
