"""Pure-numpy media codecs: RIFF/WAVE PCM audio, BMP (BI_RGB 24-bit) and
PPM (P6) images.

The container has no PIL/soundfile/ffmpeg, but these container formats
are simple enough to decode with header parsing + ``np.frombuffer`` —
which turns the engine's multimodal stage from a stub into a REAL
decode/feature-extract path for audio and images (video stays stubbed:
mp4/h264 genuinely needs a codec library).  Decoders are strict: a
malformed payload raises ``ValueError`` so the dead-letter path upstream
has something to catch.

Encoders exist so fixtures can synthesize deterministic real payloads
(no external data, per the driver contract).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# WAV (RIFF / PCM)


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Mono 16-bit PCM WAV from float samples in [-1, 1]."""
    pcm = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2")
    data = pcm.tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16
    )
    return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """(mono float32 samples in [-1, 1], sample_rate) from a PCM WAV.

    Walks RIFF chunks (so extra chunks like LIST are skipped), supports
    8/16/32-bit integer PCM and ieee float32, downmixes channels.
    """
    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, n = 12, len(payload)
    fmt = None
    data = None
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, channels, rate, _, _, bits = fmt
    if channels < 1:
        raise ValueError("zero channels")
    if audio_fmt == 1 and bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    elif audio_fmt == 1 and bits == 8:  # unsigned in WAV
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif audio_fmt == 1 and bits == 32:
        x = np.frombuffer(data, dtype="<i4").astype(np.float32) / 2147483648.0
    elif audio_fmt == 3 and bits == 32:
        x = np.frombuffer(data, dtype="<f4").astype(np.float32)
    else:
        raise ValueError(f"unsupported WAV format {audio_fmt}/{bits}-bit")
    frames = len(x) // channels
    x = x[: frames * channels].reshape(frames, channels).mean(axis=1)
    return x.astype(np.float32), int(rate)


# ---------------------------------------------------------------------------
# BMP (BI_RGB, 24-bit)


def encode_bmp(img: np.ndarray) -> bytes:
    """24-bit uncompressed BMP from an (H, W, 3) uint8 RGB array."""
    img = np.asarray(img, dtype=np.uint8)
    h, w, c = img.shape
    assert c == 3
    row = w * 3
    pad = (-row) % 4
    body = bytearray()
    bgr = img[:, :, ::-1]  # BMP stores BGR
    for y in range(h - 1, -1, -1):  # bottom-up
        body += bgr[y].tobytes() + b"\x00" * pad
    pixoff = 14 + 40
    size = pixoff + len(body)
    hdr = b"BM" + struct.pack("<IHHI", size, 0, 0, pixoff)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return hdr + dib + bytes(body)


def decode_bmp(payload: bytes) -> np.ndarray:
    """(H, W, 3) uint8 RGB from a 24-bit BI_RGB BMP (top-down or bottom-up)."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (pixoff,) = struct.unpack_from("<I", payload, 10)
    dib_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bits = struct.unpack_from("<HH", payload, 26)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if bits != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: {bits}-bit compression={compression}")
    bottom_up = h > 0
    h = abs(h)
    row = w * 3
    stride = row + ((-row) % 4)
    px = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=pixoff)
    px = px.reshape(h, stride)[:, :row].reshape(h, w, 3)
    if bottom_up:
        px = px[::-1]
    return px[:, :, ::-1].copy()  # BGR -> RGB


# ---------------------------------------------------------------------------
# PPM (P6)


def encode_ppm(img: np.ndarray) -> bytes:
    img = np.asarray(img, dtype=np.uint8)
    h, w, _ = img.shape
    return f"P6\n{w} {h}\n255\n".encode() + img.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header: magic, width, height, maxval — whitespace/comment separated
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("only maxval=255 PPM supported")
    px = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return px.reshape(h, w, 3).copy()


# ---------------------------------------------------------------------------
# AVI (RIFF, uncompressed 'DIB ' 24-bit frames)
#
# The one video container simple enough to decode with header parsing +
# np.frombuffer: RIFF('AVI ') -> LIST(hdrl){avih, LIST(strl){strh,strf}}
# -> LIST(movi){'00db' raw BGR bottom-up frames, BMP row padding}.
# mp4/h264 stays out of reach (needs an entropy/DCT codec library); this
# closes the video decode path for the uncompressed codec the same way
# BMP/PPM close images.


def encode_avi(frames: np.ndarray, fps: int = 10) -> bytes:
    """Uncompressed AVI from a (T, H, W, 3) uint8 RGB array."""
    frames = np.asarray(frames, dtype=np.uint8)
    t, h, w, c = frames.shape
    assert c == 3 and t >= 1 and fps > 0
    row = w * 3
    pad = (-row) % 4
    frame_size = (row + pad) * h

    def _chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) % 2 else b""
        )

    def _list(kind: bytes, body: bytes) -> bytes:
        return _chunk(b"LIST", kind + body)

    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps, frame_size * fps, 0, 0x10,  # AVIF_HASINDEX unset; 0x10=WASCAPTUREFILE irrelevant, keep simple flags
        t, 0, 1, frame_size, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"DIB " + struct.pack("<IHHIIIIIIiI", 0, 0, 0, 0, 1, fps, 0,
                                        t, frame_size, -1, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size,
                       2835, 2835, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)))
    movi_body = b""
    bgr = frames[:, :, :, ::-1]
    for i in range(t):
        body = bytearray()
        for y in range(h - 1, -1, -1):  # bottom-up, padded rows (DIB)
            body += bgr[i, y].tobytes() + b"\x00" * pad
        movi_body += _chunk(b"00db", bytes(body))
    movi = _list(b"movi", movi_body)
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_avi(payload: bytes) -> tuple[np.ndarray, float]:
    """((T, H, W, 3) uint8 RGB frames, fps) from an uncompressed AVI
    ('DIB '/raw 24-bit '00db'/'00dc' frames).  Compressed streams raise
    ValueError (dead-letter upstream, same contract as the other
    codecs)."""
    if len(payload) < 24 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")

    w = h = None
    us_per_frame = 0
    bits = compression = None
    frames_raw: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        nonlocal w, h, us_per_frame, bits, compression
        while pos + 8 <= end:
            cid = payload[pos : pos + 4]
            (clen,) = struct.unpack_from("<I", payload, pos + 4)
            body_start = pos + 8
            if cid == b"LIST":
                walk(body_start + 4, body_start + clen)
            elif cid == b"avih":
                vals = struct.unpack_from("<IIIIIIIIII", payload, body_start)
                us_per_frame = vals[0]
                w, h = int(vals[8]), int(vals[9])
            elif cid == b"strf":
                _sz, bw, bh, _planes, bits, compression = struct.unpack_from(
                    "<IiiHHI", payload, body_start
                )
            elif cid in (b"00db", b"00dc"):
                frames_raw.append(payload[body_start : body_start + clen])
            pos = body_start + clen + (clen & 1)

    walk(12, len(payload))
    if not frames_raw or not w or not h:
        raise ValueError("missing avih/movi frames")
    if bits != 24 or compression not in (0, None):
        raise ValueError(
            f"unsupported AVI stream: {bits}-bit compression={compression}"
        )
    row = w * 3
    stride = row + ((-row) % 4)
    out = np.empty((len(frames_raw), h, w, 3), dtype=np.uint8)
    for i, raw in enumerate(frames_raw):
        if len(raw) < stride * h:
            raise ValueError("truncated AVI frame")
        px = np.frombuffer(raw, dtype=np.uint8, count=stride * h)
        px = px.reshape(h, stride)[:, :row].reshape(h, w, 3)
        out[i] = px[::-1, :, ::-1]  # bottom-up BGR -> top-down RGB
    fps = 1_000_000 / us_per_frame if us_per_frame else 0.0
    return out, float(fps)


# ---------------------------------------------------------------------------
# Image ops (pure numpy)


def resize_image(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize of an (H, W, C) array — index gather only,
    deterministic, no interpolation library needed."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * (h / out_h)).astype(np.intp)
    xs = (np.arange(out_w) * (w / out_w)).astype(np.intp)
    return img[ys[:, None], xs[None, :]]


def sniff_kind(payload: bytes) -> str:
    """Container sniffing by magic bytes:
    'audio' | 'image' | 'video' | 'unknown'."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "audio"
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        return "video"
    if payload[:2] == b"BM" or payload[:2] == b"P6":
        return "image"
    return "unknown"
