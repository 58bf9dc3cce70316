"""Property-based roundtrips for the stdlib/numpy media codecs: any image
encodes->decodes to identical pixels (padding/flip/swizzle preserved), any
PCM16 stream survives the RIFF walk, and corrupted magic bytes always raise
NotImplementedError rather than returning garbage."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from yupana_spark.datapipe.multimodal import (decode_bmp, decode_gif,
                                              decode_image, decode_png,
                                              decode_ppm, decode_wav,
                                              encode_bmp, encode_gif,
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
            or blob[:8] == b"\x89PNG\r\n\x1a\n"
            or blob[:6] in (b"GIF87a", b"GIF89a")):
        return
    with pytest.raises(NotImplementedError):
        decode_image(blob)
    with pytest.raises(NotImplementedError):
        decode_wav(blob)


@settings(max_examples=40, deadline=None)
@given(images(), st.booleans(), st.integers(min_value=1, max_value=256))
def test_gif_roundtrip_property(px, interlace, ncol):
    """Palette GIF roundtrip: random palettes up to 256 colors, interlaced
    and sequential row order, through the full variable-width LZW."""
    pal = np.unique(px.reshape(-1, 3), axis=0)[:ncol]
    idx = (px[:, :, 0].astype(np.int64) * 31 + px[:, :, 1]) % len(pal)
    img = pal[idx]
    blob = encode_gif(img, interlace=interlace)
    assert np.array_equal(decode_gif(blob), img)
    assert np.array_equal(decode_image(blob), img)  # dispatcher


def test_gif_cross_codec_consistency():
    """The same pixels through BMP, PNG and GIF must decode identically —
    a container-specific pixel-order/channel bug cannot hide behind its
    own encoder."""
    rng = np.random.RandomState(11)
    pal = rng.randint(0, 256, (200, 3), dtype=np.uint8)
    px = pal[rng.randint(0, 200, (13, 9))]
    a = decode_image(encode_bmp(px))
    b = decode_image(encode_png(px, filter_type=4))
    c = decode_image(encode_gif(px))
    assert np.array_equal(a, px)
    assert np.array_equal(a, b) and np.array_equal(b, c)


def test_gif_handcrafted_spec_stream():
    """Independent of our encoder: a hand-listed LZW code sequence for a
    2x2 two-color image (clear, four literals with the decoder-side width
    bump after the table reaches 2^3, end) packed LSB-first per the GIF
    spec must decode to the hand-computed pixels."""
    import struct

    # mcs=2: clear=4 end=5; pixels 0,1,1,0
    # decoder table: 4 literals + 2 slots = 6; after 2nd code len=7,
    # after 3rd len=8 == 2^3 -> width 3->4 for the remaining codes
    codes = [(4, 3), (0, 3), (1, 3), (1, 3), (0, 4), (5, 4)]
    acc = nbits = 0
    body = bytearray()
    for code, width in codes:
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            body.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        body.append(acc & 0xFF)
    blob = (b"GIF89a" + struct.pack("<HHBBB", 2, 2, 0x80, 0, 0)
            + bytes([10, 20, 30, 200, 210, 220])  # 2-entry color table
            + struct.pack("<BHHHHB", 0x2C, 0, 0, 2, 2, 0)
            + bytes([2, len(body)]) + bytes(body) + b"\x00\x3b")
    exp = np.array([[[10, 20, 30], [200, 210, 220]],
                    [[200, 210, 220], [10, 20, 30]]], dtype=np.uint8)
    assert np.array_equal(decode_gif(blob), exp)


def test_gif_unsupported_variants_raise():
    rng = np.random.RandomState(3)
    too_many = rng.randint(0, 256, (20, 20, 3), dtype=np.uint8)
    while len(np.unique(too_many.reshape(-1, 3), axis=0)) <= 256:
        too_many = rng.randint(0, 256, (30, 30, 3), dtype=np.uint8)
    with pytest.raises(NotImplementedError):
        encode_gif(too_many)
    with pytest.raises(NotImplementedError):
        decode_gif(b"GIF89a" + b"\x00" * 7)  # no color table, no descriptor


# -- baseline JPEG (datapipe/jpeg.py) ----------------------------------------
from yupana_spark.datapipe.jpeg import (ZIGZAG, _dct_blocks,  # noqa: E402
                                        _idct_blocks, decode_jpeg,
                                        encode_jpeg)


def test_jpeg_dct_known_answers():
    """Exact anchors independent of the roundtrip: a constant block is pure
    DC (orthonormal: DC = 8 * value), a single cosine lands on one
    coefficient, and IDCT inverts DCT to float precision."""
    const = np.full((1, 8, 8), 50.0)
    c = _dct_blocks(const)
    assert abs(c[0, 0, 0] - 400.0) < 1e-9  # 8 * 50
    assert np.abs(c[0]).sum() - abs(c[0, 0, 0]) < 1e-9
    rng = np.random.RandomState(0)
    b = rng.uniform(-128, 127, (5, 8, 8))
    assert np.abs(_idct_blocks(_dct_blocks(b)) - b).max() < 1e-9


def test_jpeg_zigzag_is_permutation():
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    # spec anchor: the walk starts (0,0) -> (0,1) -> (1,0) -> (2,0) -> (1,1)
    assert ZIGZAG[:5].tolist() == [0, 1, 8, 16, 9]


@settings(max_examples=25, deadline=None)
@given(st.integers(min_value=0, max_value=2**31 - 1),
       st.integers(min_value=1, max_value=40),
       st.integers(min_value=1, max_value=40))
def test_jpeg_roundtrip_bounded_error(seed, h, w):
    """Lossy but bounded: pure noise at quality 100 (hardest bit-level
    case — large coefficients, ZRL runs, byte stuffing) must come back with
    small mean error and exact shape."""
    px = np.random.RandomState(seed).randint(0, 256, (h, w, 3),
                                             dtype=np.uint8)
    back = decode_jpeg(encode_jpeg(px, quality=100))
    assert back.shape == px.shape
    err = np.abs(back.astype(int) - px.astype(int))
    assert err.mean() < 12.0


def test_jpeg_smooth_image_high_fidelity():
    y, x = np.mgrid[0:40, 0:56]
    px = np.stack([(x * 3) % 256, (y * 2 + 40) % 256,
                   ((x + y) * 2) % 256], axis=2).astype(np.uint8)
    back = decode_jpeg(encode_jpeg(px, quality=95))
    assert np.abs(back.astype(int) - px.astype(int)).max() <= 4
    const = np.full((17, 23, 3), 77, np.uint8)
    cb = decode_jpeg(encode_jpeg(const, quality=50))
    assert np.abs(cb.astype(int) - 77).max() <= 1


def test_jpeg_grayscale_and_dispatch():
    rng = np.random.RandomState(4)
    g = rng.randint(0, 256, (31, 9), dtype=np.uint8)
    back = decode_jpeg(encode_jpeg(g, quality=100))
    assert back.shape == g.shape and back.ndim == 2
    px = rng.randint(0, 256, (9, 9, 3), dtype=np.uint8)
    via_dispatch = decode_image(encode_jpeg(px, quality=100))
    assert via_dispatch.shape == px.shape


def test_jpeg_restart_markers_roundtrip():
    """DRI/RSTn path: restart intervals change the byte stream but must not
    change a single decoded pixel."""
    rng = np.random.RandomState(9)
    px = rng.randint(0, 256, (33, 41, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(px, 100))
    for ri in (1, 3, 7):
        assert np.array_equal(
            decode_jpeg(encode_jpeg(px, 100, restart_interval=ri)), base)


def test_jpeg_unsupported_variants_raise():
    import struct

    blob = bytearray(encode_jpeg(np.zeros((8, 8, 3), np.uint8)))
    # flip SOF0 -> SOF3 (lossless — still unsupported)
    i = bytes(blob).find(b"\xff\xc0")
    lossless = bytes(blob[:i]) + b"\xff\xc3" + bytes(blob[i + 2:])
    with pytest.raises(NotImplementedError):
        decode_jpeg(lossless)
    # SOF2 followed by a BASELINE-shaped scan is malformed progressive
    # (a DC scan must have Se = 0) — honest error, not silent garbage
    prog_bad = bytes(blob[:i]) + b"\xff\xc2" + bytes(blob[i + 2:])
    with pytest.raises(NotImplementedError):
        decode_jpeg(prog_bad)
    # sampling factor 3 in SOF (beyond the 1-2 the MCU loop supports)
    sub = bytearray(blob)
    assert sub[i + 11] == 0x11  # first component sampling byte
    sub[i + 11] = 0x33
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(sub))
    with pytest.raises(NotImplementedError):
        decode_jpeg(b"\x00\x01\x02")


@pytest.mark.parametrize("seed,h,w,sub", [(1, 16, 24, False), (2, 17, 13, False),
                                          (3, 21, 19, True), (4, 12, 9, True),
                                          (5, 1, 1, False), (6, 64, 48, True)])
def test_jpeg_progressive_equals_baseline(seed, h, w, sub):
    """SOF2 exactness oracle: a progressive stream carries the SAME
    quantized coefficients as the baseline stream, only reordered across
    scans — so decode output must be bit-identical, for every shape,
    subsampling layout and quality tried.  This falsifies every Annex-G
    path at once: DC first/refine, AC spectral-selection, EOBRUN,
    refine-ZRL and correction bits."""
    px = np.random.RandomState(seed).randint(0, 256, (h, w, 3),
                                             dtype=np.uint8)
    for q in (95, 60):
        base = decode_jpeg(encode_jpeg(px, quality=q, subsample=sub))
        prog = decode_jpeg(encode_jpeg(px, quality=q, subsample=sub,
                                       progressive=True))
        assert np.array_equal(base, prog)


def test_jpeg_progressive_deep_sa_and_gray():
    """Multi-level successive approximation (al=3 -> 0 chains) and the
    grayscale non-interleaved DC path decode bit-identically too; the
    magic-byte dispatcher routes SOF2 streams transparently."""
    rng = np.random.RandomState(11)
    px = rng.randint(0, 256, (23, 31, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(px, quality=70))
    for lv in (2, 3):
        assert np.array_equal(
            base, decode_jpeg(encode_jpeg(px, quality=70, progressive=lv)))
    g = rng.randint(0, 256, (14, 10), dtype=np.uint8)
    gb = decode_jpeg(encode_jpeg(g, quality=80))
    gp = decode_jpeg(encode_jpeg(g, quality=80, progressive=True))
    assert np.array_equal(gb, gp) and gp.ndim == 2
    # smooth gradient: the EOBRUN-heavy regime (most AC bands empty)
    y, x = np.mgrid[0:55, 0:97]
    sm = np.stack([(x + y) // 2, x % 256, y % 256], axis=2).astype(np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(sm, quality=75, subsample=True)),
        decode_jpeg(encode_jpeg(sm, quality=75, subsample=True,
                                progressive=True)))
    assert decode_image(
        encode_jpeg(px, quality=70, progressive=True)).shape == px.shape


def test_jpeg_420_subsampled_roundtrip():
    """4:2:0 — the dominant real-world layout: smooth images stay close,
    odd dimensions crop exactly, and restart markers leave pixels
    untouched."""
    y, x = np.mgrid[0:45, 0:61]
    px = np.stack([(x * 3) % 256, (y * 2 + 40) % 256,
                   ((x + y) * 2) % 256], axis=2).astype(np.uint8)
    back = decode_jpeg(encode_jpeg(px, quality=95, subsample=True))
    assert back.shape == px.shape
    assert np.abs(back.astype(int) - px.astype(int)).mean() < 3.0
    assert np.array_equal(
        decode_jpeg(encode_jpeg(px, 95, subsample=True,
                                restart_interval=2)), back)
    rng = np.random.RandomState(2)
    for hw in [(1, 1), (7, 9), (9, 17), (17, 15)]:
        p2 = rng.randint(0, 256, (*hw, 3), dtype=np.uint8)
        assert decode_jpeg(encode_jpeg(p2, 95, subsample=True)).shape \
            == p2.shape
    # subsampling must actually shrink the stream on a color image
    assert len(encode_jpeg(px, 85, subsample=True)) \
        < len(encode_jpeg(px, 85))


def test_gif_animated_roundtrip():
    """Multi-frame GIF: every composited frame comes back pixel-exact, the
    dispatcher returns the first frame, and >256 shared colors raise."""
    from yupana_spark.datapipe.multimodal import (decode_gif_frames,
                                                  encode_gif_animated)

    rng = np.random.RandomState(13)
    pal = rng.randint(0, 256, (60, 3), dtype=np.uint8)
    frames = [pal[rng.randint(0, 60, (11, 17))] for _ in range(5)]
    blob = encode_gif_animated(frames, delay_cs=4)
    back = decode_gif_frames(blob)
    assert len(back) == len(frames)
    for a, b in zip(frames, back):
        assert np.array_equal(a, b)
    assert np.array_equal(decode_image(blob), frames[0])


def test_gif_transparency_composites_over_previous_frame():
    """A handcrafted two-frame stream where frame 2 marks index 0
    transparent: those pixels must show frame 1 underneath."""
    import struct

    from yupana_spark.datapipe.multimodal import (_gif_image_block,
                                                  decode_gif_frames)

    pal = np.array([[10, 10, 10], [200, 200, 200]], dtype=np.uint8)
    f1 = pal[np.zeros((4, 4), dtype=int)]          # all dark
    f2 = pal[np.eye(4, dtype=int)]                 # diagonal light
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 4, 4, 0x80, 0, 0)
    table = np.zeros((2, 3), dtype=np.uint8)
    table[:2] = pal
    out += table.tobytes()
    out += _gif_image_block(f1, pal, 1, interlace=False)
    # GCE: transparent flag set, transparent index 0
    out += struct.pack("<BBBBHBB", 0x21, 0xF9, 4, 0x01, 0, 0, 0)
    out += _gif_image_block(f2, pal, 1, interlace=False)
    out += b"\x3b"
    frames = decode_gif_frames(bytes(out))
    assert np.array_equal(frames[0], f1)
    # composited: index-0 (off-diagonal) pixels keep frame 1's dark value
    exp = f1.copy()
    exp[np.eye(4, dtype=bool)] = pal[1]
    assert np.array_equal(frames[1], exp)


# -- AVI / Motion-JPEG container (datapipe/avi.py) ---------------------------
from yupana_spark.datapipe.avi import (decode_avi_frames,  # noqa: E402
                                       encode_avi_mjpeg, parse_avi)


@settings(max_examples=10, deadline=None)
@given(st.integers(min_value=0, max_value=2**31 - 1),
       st.integers(min_value=1, max_value=4),
       st.integers(min_value=8, max_value=24),
       st.integers(min_value=8, max_value=24))
def test_avi_mjpeg_roundtrip(seed, n_frames, h, w):
    """Mux -> demux preserves frame count, dims, timing, and each frame
    decodes through the baseline JPEG codec within its quality-95 bound."""
    rng = np.random.RandomState(seed)
    px = [np.clip(rng.normal(128, 12, (h, w, 3)), 0, 255).astype(np.uint8)
          for _ in range(n_frames)]
    frames = [encode_jpeg(p, quality=95) for p in px]
    avi = encode_avi_mjpeg(frames, width=w, height=h, fps=8)
    meta = parse_avi(avi)
    assert (meta["width"], meta["height"]) == (w, h)
    assert meta["n_frames"] == n_frames
    assert meta["us_per_frame"] == 125_000
    assert meta["frames"] == frames  # payloads survive byte-exact
    dec = decode_avi_frames(avi)
    assert [i for i, _ in dec] == list(range(n_frames))
    for (_, got), want in zip(dec, px):
        assert got.shape == want.shape
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 40


def test_avi_rejects_non_mjpeg():
    with pytest.raises(NotImplementedError):
        parse_avi(b"RIFF\x04\x00\x00\x00WAVE")  # RIFF but not AVI
    # AVI that is not Motion-JPEG anywhere (handler AND biCompression):
    # both fields must be scrubbed — real muxers write MJPEG with odd
    # handlers ('dmb1', zeros) and the authoritative strf biCompression
    good = encode_avi_mjpeg([encode_jpeg(np.zeros((8, 8, 3), np.uint8))],
                            8, 8)
    bad = good.replace(b"MJPG", b"H264")
    with pytest.raises(NotImplementedError):
        parse_avi(bad)
    # handler scrubbed but biCompression intact -> still accepted
    odd_handler = good.replace(b"vidsMJPG", b"vids\x00\x00\x00\x00")
    assert parse_avi(odd_handler)["n_frames"] == 1


def test_avi_frame_sampling_stride():
    frames = [encode_jpeg(np.full((8, 8, 3), v, np.uint8), quality=100)
              for v in (10, 60, 110, 160, 210)]
    avi = encode_avi_mjpeg(frames, 8, 8, fps=5)
    idx = [i for i, _ in decode_avi_frames(avi, every_n=2)]
    assert idx == [0, 2, 4]


# ---------------------------------------------------------------------------
# FLAC (RFC 9639): lossless, so the roundtrip oracle is EXACT equality
# ---------------------------------------------------------------------------
def _flac_cases():
    rng = np.random.RandomState(3)
    t = np.arange(10000)
    tone = (3000 * np.sin(t / 30.0) + 500 * np.sin(t / 7.0)).astype(np.int16)
    st = np.empty(12000, np.int16)
    st[0::2] = tone[:6000]
    st[1::2] = tone[:6000] + rng.randint(-50, 50, 6000).astype(np.int16)
    return [
        ("tone", tone, 44100, 1, False),
        ("noise", rng.randint(-32768, 32768, 5000).astype(np.int16),
         16000, 1, False),                       # escape/verbatim regime
        ("const", np.full(9000, -123, np.int16), 8000, 1, False),
        ("stereo", st, 48000, 2, False),
        ("midside", st, 48000, 2, True),         # channel assignment 10
        ("short", tone[:100], 12345, 1, False),  # partial block, odd rate
        ("oneblock", tone[:4096], 44100, 1, False),
    ]


@pytest.mark.parametrize("name,s,rate,nch,ms",
                         _flac_cases(),
                         ids=[c[0] for c in _flac_cases()])
def test_flac_roundtrip_exact(name, s, rate, nch, ms):
    from yupana_spark.datapipe.flac import decode_flac, encode_flac

    blob = encode_flac(s, rate, nch, mid_side=ms)
    r, c, back = decode_flac(blob)
    assert (r, c) == (rate, nch)
    assert np.array_equal(back, s.astype(np.int64))   # LOSSLESS: exact
    if name in ("tone", "const", "stereo", "midside"):
        assert len(blob) < len(s) * 2                 # actually compresses


def test_flac_crc_and_md5_guard_corruption():
    """A flipped byte anywhere in a frame must raise (CRC-8 header, CRC-16
    frame, or MD5 stream check) — never silently return garbage audio."""
    from yupana_spark.datapipe.flac import decode_flac, encode_flac

    tone = (2000 * np.sin(np.arange(6000) / 20.0)).astype(np.int16)
    blob = bytearray(encode_flac(tone, 44100, 1))
    for at in (len(blob) // 3, len(blob) // 2, len(blob) - 5):
        bad = bytearray(blob)
        bad[at] ^= 0xFF
        with pytest.raises(NotImplementedError):
            decode_flac(bytes(bad))
    with pytest.raises(NotImplementedError):
        decode_flac(b"NOTFLAC")


def test_flac_audio_features_dispatch(spark):
    """audio_features routes FLAC and WAV through the same feature map;
    the decoded features must agree for identical sample content."""
    from yupana_spark.datapipe.flac import encode_flac
    from yupana_spark.datapipe.multimodal import audio_features, encode_wav

    s = (1500 * np.sin(np.arange(7000) / 15.0)).astype(np.int16)
    rows = [(1, encode_wav(s, 22050, 1)), (2, encode_flac(s, 22050, 1))]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r["media_id"]: r for r in audio_features(df).collect()}
    for mid in (1, 2):
        assert got[mid]["sample_rate"] == 22050
        assert got[mid]["n_channels"] == 1
        assert got[mid]["n_samples"] == 7000
        assert got[mid]["max_abs"] == int(np.abs(s.astype(np.int32)).max())
    assert got[1]["duration_s"] == got[2]["duration_s"] == 7000 / 22050


def test_flac_spiky_signal_roundtrip():
    """Rare huge spikes blow up unary Rice quotients — the encoder must
    stay exact whatever path it picks (high Rice parameter here; the
    escaped-partition DECODE path is driven separately by the hand-built
    stream below, since our encoder's verbatim-subframe fallback triggers
    before a whole-residual escape ever could)."""
    from yupana_spark.datapipe.flac import decode_flac, encode_flac

    s = (np.arange(6000) % 400 - 200).astype(np.int16)  # smooth ramps
    s[::97] = 20000                                     # spikes
    blob = encode_flac(s, 44100, 1)
    r, c, back = decode_flac(blob)
    assert np.array_equal(back, s.astype(np.int64))


def test_flac_multipartition_and_lpc_decode():
    """Decode-only paths our encoder never emits, driven by hand-built bit
    streams: (a) a partition-order-2 Rice residual (four partitions with
    different parameters), (b) an LPC subframe whose reconstruction is
    hand-computed — both per RFC 9639."""
    import numpy as np

    from yupana_spark.datapipe.flac import (_BitReader, _BitWriter,
                                            _read_residual,
                                            _decode_subframe, _zigzag)

    # (a) nb=16, order=0, po=2 -> 4 partitions of 4 samples
    res = np.array([0, 1, -1, 2, 30, -31, 29, -28,
                    0, 0, 0, 0, 5, -6, 7, -8], dtype=np.int64)
    bw = _BitWriter()
    bw.write(0, 2)          # rice method 0
    bw.write(2, 4)          # partition order 2
    for part, p in zip(range(4), (1, 5, 0, 3)):
        chunk = res[part * 4:(part + 1) * 4]
        if p == 0:
            bw.write(0x0F, 4)       # escape this partition
            bw.write(7, 5)          # 7 raw bits
            for v in chunk:
                bw.write(int(v) & 0x7F, 7)
        else:
            bw.write(p, 4)
            for u in _zigzag(chunk):
                bw.write_unary(int(u) >> p)
                bw.write(int(u) & ((1 << p) - 1), p)
    bw.align()
    got = _read_residual(_BitReader(bw.bytes()), 16, 0)
    assert np.array_equal(got, res)

    # (b) LPC order 2, coefs [3, -1], shift 1: x[i] = res + ((3*x[i-1]
    #     - x[i-2]) >> 1); warmup [100, 90]
    warm = [100, 90]
    res_l = [4, -2, 3, 0, -5, 1]
    bw = _BitWriter()
    bw.write(0, 1)
    bw.write(32 + 2 - 1, 6)  # LPC, order 2
    bw.write(0, 1)           # no wasted bits
    for v in warm:
        bw.write(v & 0xFFFF, 16)
    bw.write(15 - 1, 4)      # precision 15 bits
    bw.write(1, 5)           # shift 1
    for cfe in (3, -1):
        bw.write(cfe & 0x7FFF, 15)
    bw.write(0, 2)           # rice method 0
    bw.write(0, 4)           # partition order 0
    p = 3
    bw.write(p, 4)
    for u in _zigzag(np.array(res_l, dtype=np.int64)):
        bw.write_unary(int(u) >> p)
        bw.write(int(u) & ((1 << p) - 1), p)
    bw.align()
    x = _decode_subframe(_BitReader(bw.bytes()), 2 + len(res_l), 16)
    exp = list(warm)
    for rv in res_l:
        exp.append(rv + ((3 * exp[-1] - exp[-2]) >> 1))
    assert list(x) == exp


def test_flac_wasted_bits_decode():
    """Wasted-bits flag (samples sharing low zero bits): hand-built
    CONSTANT subframe with 2 wasted bits must scale back up on decode."""
    from yupana_spark.datapipe.flac import _BitReader, _BitWriter, \
        _decode_subframe

    bw = _BitWriter()
    bw.write(0, 1)
    bw.write(0, 6)           # CONSTANT
    bw.write(1, 1)           # wasted-bits flag
    bw.write_unary(1)        # unary 1 -> wasted = 2
    bw.write(25 & 0x3FFF, 14)  # constant in (16-2)-bit domain
    bw.align()
    x = _decode_subframe(_BitReader(bw.bytes()), 5, 16)
    assert list(x) == [100] * 5   # 25 << 2


def test_wav_8_and_24_bit_decode():
    """PCM8 (unsigned, centered on decode) and PCM24 (3-byte LE, sign
    extended) via hand-built RIFF streams — the widths real corpora carry
    beyond PCM16."""
    import struct

    def wav(bits, body, rate=8000, ch=1):
        block = ch * bits // 8
        fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * block, block, bits)
        return (b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
                + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(body)) + body)

    r, c, s = decode_wav(wav(8, bytes([0, 128, 255, 200])))
    assert (r, c) == (8000, 1)
    assert list(s) == [-128, 0, 127, 72]

    vals = [0, 1, -1, (1 << 23) - 1, -(1 << 23), -123456]
    body = b"".join(int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals)
    r, c, s = decode_wav(wav(24, body))
    assert list(s) == vals

    with pytest.raises(NotImplementedError):
        decode_wav(wav(12, b"\x00\x00"))


def test_avi_audio_track_roundtrip():
    """PCM16 audio track muxed/demuxed alongside the MJPEG video stream:
    samples roundtrip exactly (incl. block-align remainders and stereo),
    the video frames still decode, and video-only files stay audio-free."""
    from yupana_spark.datapipe.avi import (decode_avi_audio,
                                           decode_avi_frames,
                                           encode_avi_mjpeg, parse_avi)
    from yupana_spark.datapipe.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.RandomState(1)
    frames = [encode_jpeg(rng.randint(0, 256, (16, 24, 3), np.uint8), 85)
              for _ in range(5)]
    tone = (2000 * np.sin(np.arange(8000) / 20.0)).astype(np.int16)
    blob = encode_avi_mjpeg(frames, 24, 16, fps=5, audio=tone,
                            audio_rate=8000)
    r, c, back = decode_avi_audio(blob)
    assert (r, c) == (8000, 1) and np.array_equal(back, tone)
    # stereo with a non-divisible sample count: the last interleaved
    # block carries the remainder — nothing drops
    st = np.arange(7001 * 2, dtype=np.int16)
    b2 = encode_avi_mjpeg(frames[:3], 24, 16, audio=st, audio_rate=22050,
                          audio_channels=2)
    r2, c2, s2 = decode_avi_audio(b2)
    assert (r2, c2) == (22050, 2) and np.array_equal(s2, st)
    dec = decode_avi_frames(blob, every_n=2)
    assert [i for i, _ in dec] == [0, 2, 4]
    assert np.array_equal(dec[0][1], decode_jpeg(frames[0]))
    v = encode_avi_mjpeg(frames[:2], 24, 16)
    assert "audio_bytes" not in parse_avi(v)
    with pytest.raises(NotImplementedError):
        decode_avi_audio(v)


def test_image_kernels_and_audio_resample():
    """Bilinear resize (constant images stay constant, exact on 2x
    upscale of a linear ramp interior), deterministic crops, and
    linear audio resampling (constant tone invariant, length by rate
    ratio, seeded crop reproducibility)."""
    from yupana_spark.datapipe.multimodal import (bilinear_resize,
                                                  center_crop,
                                                  resample_audio,
                                                  seeded_crop)

    const = np.full((10, 14, 3), 99, np.uint8)
    out = bilinear_resize(const, 7, 5)
    assert out.shape == (5, 7, 3) and (out == 99).all()
    g = np.arange(64, dtype=np.uint8).reshape(8, 8)
    bg = bilinear_resize(g, 4, 4)
    assert bg.shape == (4, 4)          # grayscale stays 2-D

    px = np.arange(9 * 12 * 3, dtype=np.uint8).reshape(9, 12, 3)
    cc = center_crop(px, 6, 5)
    assert cc.shape == (5, 6, 3)
    assert np.array_equal(cc, px[2:7, 3:9])
    small = center_crop(px[:2, :3], 5, 4)      # pads by edge replication
    assert small.shape == (4, 5, 3)
    s1 = seeded_crop(px, 4, 4, seed=7)
    s2 = seeded_crop(px, 4, 4, seed=7)
    s3 = seeded_crop(px, 4, 4, seed=8)
    assert np.array_equal(s1, s2)              # reproducible
    assert s1.shape == s3.shape == (4, 4, 3)

    tone = np.full(8000, 1000, np.int16)
    up = resample_audio(tone, 8000, 16000)
    assert len(up) == 16000 and (up == 1000).all()
    down = resample_audio(tone, 8000, 4000)
    assert len(down) == 4000 and (down == 1000).all()
    st = np.arange(2000, dtype=np.int16)       # stereo interleaved ramp
    r = resample_audio(st, 10000, 5000, n_channels=2)
    assert len(r) == 1000
    assert abs(int(r[0]) - 0) <= 2 and abs(int(r[-1]) - 1999) <= 2


def test_resize_images_bilinear_method():
    """The bilinear method flows through the same decode/re-encode path;
    GIF inputs re-encode as lossless PNG (interpolated colors can leave
    the palette)."""
    from yupana_spark.datapipe.multimodal import (bilinear_resize,
                                                  decode_image, encode_gif,
                                                  encode_png)

    # spark-free check of the per-row behavior via the public kernels
    rng = np.random.RandomState(3)
    px = (rng.randint(0, 4, (12, 9, 3)) * 80).astype(np.uint8)
    want = bilinear_resize(px, 6, 4)
    assert np.array_equal(decode_image(encode_png(want)), want)


def test_resize_images_bilinear_spark(spark):
    from pyspark.sql import functions as F

    from yupana_spark.datapipe.multimodal import (bilinear_resize,
                                                  decode_image, encode_gif,
                                                  encode_png, resize_images)

    rng = np.random.RandomState(3)
    px = (rng.randint(0, 4, (12, 9, 3)) * 80).astype(np.uint8)
    df = spark.createDataFrame(
        [(1, "image", encode_png(px)), (2, "image", encode_gif(px))],
        "media_id long, kind string, content binary")
    out = {r["media_id"]: (bytes(r["content"]), r["meta"]["mime"])
           for r in resize_images(df, 6, 4, method="bilinear").collect()}
    want = bilinear_resize(px, 6, 4)
    assert out[1][1] == "image/png"
    assert np.array_equal(decode_image(out[1][0]), want)
    assert out[2][1] == "image/png"            # GIF -> PNG under bilinear
    assert np.array_equal(decode_image(out[2][0]), want)


def test_codec_input_guards():
    """The honest-error convention on malformed INPUT, not just malformed
    streams: misaligned interleaved PCM (resample + AVI mux) raises a
    clear ValueError instead of a numpy shape error / inconsistent
    container, and a truncated FLAC metadata walk raises the decoder's
    NotImplementedError contract instead of raw IndexError."""
    import pytest

    from yupana_spark.datapipe.avi import encode_avi_mjpeg
    from yupana_spark.datapipe.flac import decode_flac, encode_flac
    from yupana_spark.datapipe.jpeg import encode_jpeg
    from yupana_spark.datapipe.multimodal import resample_audio

    with pytest.raises(ValueError, match="whole number"):
        resample_audio(np.arange(7, dtype=np.int16), 8000, 16000,
                       n_channels=2)
    with pytest.raises(ValueError, match="n_channels"):
        resample_audio(np.arange(8, dtype=np.int16), 8000, 16000,
                       n_channels=0)
    frames = [encode_jpeg(np.zeros((8, 8, 3), np.uint8))]
    with pytest.raises(ValueError, match="block_align"):
        encode_avi_mjpeg(frames, 8, 8, audio=np.arange(7, dtype=np.int16),
                         audio_channels=2)

    good = encode_flac(np.arange(64, dtype=np.int32) % 256 - 128,
                       sample_rate=8000)
    # cut inside the STREAMINFO metadata block: the walk must not read
    # past the buffer
    with pytest.raises(NotImplementedError, match="truncated metadata"):
        decode_flac(good[:10])
    with pytest.raises(NotImplementedError, match="truncated metadata"):
        decode_flac(b"fLaC")


def test_balanced_table_256_symbols():
    """_balanced_table with all 256 RS symbols: counts fit the DHT byte
    layout (each <= 255), codes are prefix-free by canonical
    construction, and the all-ones code stays unassigned."""
    from yupana_spark.datapipe.jpeg import _balanced_table

    bits, vals, codes = _balanced_table(list(range(256)))
    assert len(vals) == 256 and sum(bits) == 256
    assert all(0 <= b <= 255 for b in bits)
    # Kraft strictly < 1 leaves the all-ones code free
    kraft = sum(b / (1 << (i + 1)) for i, b in enumerate(bits))
    assert kraft < 1
    seen = set()
    for sym, (code, ln) in codes.items():
        assert (code, ln) not in seen
        seen.add((code, ln))
        assert code != (1 << ln) - 1           # never all-ones
    # prefix-freedom: no code is a prefix of a longer one
    by_len = sorted(codes.values(), key=lambda cl: cl[1])
    for i, (c1, l1) in enumerate(by_len):
        for c2, l2 in by_len[i + 1:]:
            if l2 > l1:
                assert (c2 >> (l2 - l1)) != c1


def test_flac_pathological_blocks_go_verbatim():
    """The encode-side Rice escape was removed as provably dead: any block
    whose Rice cost could exceed the raw width is caught by the VERBATIM
    guard first (rice_cost >= (n-order)*bits fires before
    rice_cost > n*raw_bits can).  Pin the proof on the most adversarial
    residual shapes — full-scale alternation and seeded max-amplitude
    noise — by asserting the subframes come out VERBATIM (wire type
    0b000001) and the roundtrip stays lossless-exact."""
    from yupana_spark.datapipe.flac import decode_flac, encode_flac

    alt = np.tile(np.array([32767, -32768], np.int32), 2048)
    rng = np.random.RandomState(11)
    noise = rng.randint(-32768, 32768, 4096).astype(np.int32)
    for s in (alt, noise):
        blob = encode_flac(s, sample_rate=8000)
        rate, nch, out = decode_flac(blob)
        assert np.array_equal(out, s)        # lossless-exact, no escape
    # the alternating block's first subframe must literally be VERBATIM:
    # locate the first frame (sync 0xFFF8) and check the subframe header
    blob = encode_flac(alt, sample_rate=8000)
    i = blob.find(b"\xff\xf8", 4)
    assert i > 0
    # frame header: sync(2) + bs/sr byte + chan/ss byte + utf8 frame no
    # (1 byte for frame 0) + crc8 = 6 bytes; subframe header is next
    sub_hdr = blob[i + 6]
    assert sub_hdr >> 1 == 0b000001          # VERBATIM, not FIXED+escape
