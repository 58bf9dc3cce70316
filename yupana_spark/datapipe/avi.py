"""AVI / Motion-JPEG video container on stdlib ``struct`` — the video leg
of the multimodal column support.

The container is plain RIFF (public Microsoft 'AVI RIFF File Reference'):
a `hdrl` LIST carrying the 56-byte `avih` main header, one video
stream's `strh`/`strf` (BITMAPINFOHEADER with 'MJPG' compression) and
optionally a PCM16 'auds' stream (WAVEFORMAT strf), a `movi` LIST of
`00dc` frame chunks with `01wb` audio blocks interleaved one per frame
(the standard A/V lockstep layout), and an `idx1` index.  Frames decode with the repo's own baseline
JPEG codec (datapipe/jpeg.py) — no imaging libraries.  Motion-JPEG is the
one mainstream video codec expressible this way (every frame is an
independent JPEG: no interframe prediction, no entropy context across
frames), which also makes it the format whose frame-sampling semantics
are exactly "slice the chunk list".

Reference contract is just BLOB (yupana-api/.../Blob.scala:21) — like the
image/audio codecs this is an extension beyond the reference, not parity.
Interframe codecs (H.264 etc.) raise NotImplementedError.
"""

from __future__ import annotations

import struct
from typing import List, Optional, Tuple


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def encode_avi_mjpeg(frames: List[bytes], width: int, height: int,
                     fps: int = 10, audio=None, audio_rate: int = 16000,
                     audio_channels: int = 1) -> bytes:
    """Mux pre-encoded JPEG frames into an AVI/MJPEG byte stream.

    ``frames`` are complete JFIF streams (e.g. from ``jpeg.encode_jpeg``);
    all must share ``width`` x ``height``.  Emits avih + one 'vids'/'MJPG'
    stream + movi + idx1 — the layout every mainstream demuxer accepts.

    ``audio`` (optional int16 interleaved sample array) adds a PCM16
    'auds' stream: a WAVEFORMAT strf and '01wb' chunks interleaved one per
    video frame (the standard AVI layout — players read A/V in lockstep).
    """
    if not frames:
        raise ValueError("at least one frame required")
    us_per_frame = 1_000_000 // max(fps, 1)
    max_size = max(len(f) for f in frames)
    n_streams = 2 if audio is not None else 1
    avih = struct.pack(
        "<14I", us_per_frame, max_size * fps, 0, 0x10, len(frames), 0,
        n_streams, max_size, width, height, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG" + struct.pack(
        "<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(frames), max_size,
        0xFFFFFFFF, 0) + struct.pack("<4H", 0, 0, width, height))
    strf = struct.pack("<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
                       width * height * 3, 0, 0, 0, 0)
    strls = _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf))
    blocks: List[bytes] = []
    if audio is not None:
        import numpy as np

        pcm = np.asarray(audio, dtype="<i2").tobytes()
        block_align = 2 * audio_channels
        if len(pcm) % block_align:
            # a partial final frame would ride the last 01wb chunk while
            # strh dwLength counts whole blocks only — an internally
            # inconsistent stream whose tail de-interleaves misaligned
            # (mirrors the FLAC encoder's partial-interframe guard)
            raise ValueError(
                f"encode_avi: {len(pcm)} PCM bytes is not a whole number "
                f"of {audio_channels}-channel frames "
                f"(block_align={block_align})")
        n_blocks = len(pcm) // block_align
        astrh = (b"auds" + b"\x00" * 4 + struct.pack(
            "<IHHIIIIIIII", 0, 0, 0, 0, 1, audio_rate, 0, n_blocks,
            len(pcm), 0xFFFFFFFF, block_align) + struct.pack("<4H", 0, 0,
                                                             0, 0))
        astrf = struct.pack("<HHIIHH", 1, audio_channels, audio_rate,
                            audio_rate * block_align, block_align, 16)
        strls += _list(b"strl", _chunk(b"strh", astrh)
                       + _chunk(b"strf", astrf))
        # one audio block per video frame, block-aligned; the LAST block
        # takes the remainder so no trailing samples are dropped
        per = -(-len(pcm) // len(frames))
        per -= per % block_align
        per = max(per, block_align)
        blocks = [pcm[i * per:(i + 1) * per]
                  for i in range(len(frames) - 1)]
        blocks.append(pcm[(len(frames) - 1) * per:])
    hdrl = _list(b"hdrl", _chunk(b"avih", avih) + strls)
    movi_chunks, idx, off = [], [], 4  # offsets count from 'movi' fourcc
    for i, f in enumerate(frames):
        movi_chunks.append(_chunk(b"00dc", f))
        idx.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(f)))
        off += len(movi_chunks[-1])
        if blocks and blocks[i]:
            movi_chunks.append(_chunk(b"01wb", blocks[i]))
            idx.append(struct.pack("<4sIII", b"01wb", 0, off,
                                   len(blocks[i])))
            off += len(movi_chunks[-1])
    movi = _list(b"movi", b"".join(movi_chunks))
    idx1 = _chunk(b"idx1", b"".join(idx))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk_chunks(buf: bytes, pos: int, end: int):
    while pos + 8 <= end:
        fourcc = buf[pos:pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        yield fourcc, pos + 8, size
        pos += 8 + size + (size & 1)


def parse_avi(content: bytes) -> dict:
    """Container metadata + raw frame payloads (no pixel decode).

    Returns {width, height, us_per_frame, n_frames, frames: [bytes]};
    raises NotImplementedError for non-AVI RIFF or non-MJPEG video (an
    interframe codec cannot be decoded frame-independently).

    Real-world tolerant where the spec allows variation: the video stream
    may be ANY stream index (frame chunks are matched by the video
    stream's own two-digit prefix, not hard-wired '00'), and Motion-JPEG
    is recognized by strf biCompression — the authoritative field — OR by
    the strh fccHandler, since common muxers write handlers like 'dmb1',
    'jpeg' or zeros while setting biCompression='MJPG'."""
    if content[:4] != b"RIFF" or content[8:12] != b"AVI ":
        raise NotImplementedError("not an AVI RIFF stream")
    width = height = us_per_frame = 0
    handler: Optional[bytes] = None
    compression: Optional[bytes] = None
    stream_no = -1
    video_stream: Optional[int] = None
    audio_stream: Optional[int] = None
    audio_fmt = audio_rate = audio_channels = audio_bits = 0
    chunks: List[Tuple[bytes, int, int]] = []

    def walk(pos: int, end: int) -> None:
        nonlocal width, height, us_per_frame, handler, compression
        nonlocal stream_no, video_stream, audio_stream
        nonlocal audio_fmt, audio_rate, audio_channels, audio_bits
        for fourcc, dpos, size in _walk_chunks(content, pos, end):
            if fourcc == b"LIST":
                walk(dpos + 4, dpos + size)
            elif fourcc == b"avih":
                vals = struct.unpack_from("<14I", content, dpos)
                us_per_frame = vals[0]
                width, height = vals[8], vals[9]
            elif fourcc == b"strh":
                stream_no += 1
                if content[dpos:dpos + 4] == b"vids":
                    video_stream = stream_no
                    handler = content[dpos + 4:dpos + 8]
                elif content[dpos:dpos + 4] == b"auds":
                    audio_stream = stream_no
            elif fourcc == b"strf" and stream_no == video_stream \
                    and size >= 20:
                # BITMAPINFOHEADER.biCompression at offset 16
                compression = content[dpos + 16:dpos + 20]
            elif fourcc == b"strf" and stream_no == audio_stream \
                    and size >= 16:
                # WAVEFORMAT(EX): tag, channels, rate, avg, align, bits
                audio_fmt, audio_channels, audio_rate, _, _, audio_bits = \
                    struct.unpack_from("<HHIIHH", content, dpos)
            else:
                chunks.append((fourcc, dpos, size))

    walk(12, len(content))
    if video_stream is None:
        raise NotImplementedError("AVI has no video stream")
    mjpg = {b"MJPG", b"mjpg", b"dmb1", b"jpeg"}
    if compression not in mjpg and handler not in mjpg:
        raise NotImplementedError(
            "only Motion-JPEG AVI is supported, "
            f"handler={handler!r} compression={compression!r}")
    prefix = b"%02d" % video_stream
    frames = [content[dpos:dpos + size] for fourcc, dpos, size in chunks
              if fourcc in (prefix + b"dc", prefix + b"db")]
    out = {"width": width, "height": height,
           "us_per_frame": us_per_frame, "n_frames": len(frames),
           "frames": frames}
    if audio_stream is not None:
        aprefix = b"%02d" % audio_stream
        out["audio_bytes"] = b"".join(
            content[dpos:dpos + size] for fourcc, dpos, size in chunks
            if fourcc == aprefix + b"wb")
        out["audio_fmt"] = audio_fmt
        out["audio_rate"] = audio_rate
        out["audio_channels"] = audio_channels
        out["audio_bits"] = audio_bits
    return out


def decode_avi_audio(content: bytes):
    """(rate, n_channels, int16 sample array) from the AVI's PCM16 audio
    track — the same return contract as ``multimodal.decode_wav``; absent
    or non-PCM16 audio raises NotImplementedError."""
    import numpy as np

    meta = parse_avi(content)
    if "audio_bytes" not in meta:
        raise NotImplementedError("AVI has no audio stream")
    if meta["audio_fmt"] != 1 or meta["audio_bits"] != 16:
        raise NotImplementedError(
            f"AVI audio format={meta['audio_fmt']} "
            f"bits={meta['audio_bits']} unsupported (PCM16 only)")
    samples = np.frombuffer(meta["audio_bytes"], dtype="<i2")
    return meta["audio_rate"], meta["audio_channels"], samples


def decode_avi_frames(content: bytes, every_n: int = 1) -> List[Tuple]:
    """Decode every ``every_n``-th frame to an RGB ndarray via the repo's
    baseline JPEG codec.  Returns [(frame_index, (h, w, 3) uint8)]."""
    from .jpeg import decode_jpeg

    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n}")
    meta = parse_avi(content)
    out = []
    for i, payload in enumerate(meta["frames"]):
        if i % every_n:
            continue
        out.append((i, decode_jpeg(payload)))
    return out
