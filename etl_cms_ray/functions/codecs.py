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
# Image ops (pure numpy)


def resize_image(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize of an (H, W, C) array — index gather only,
    deterministic, no interpolation library needed."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * (h / out_h)).astype(np.intp)
    xs = (np.arange(out_w) * (w / out_w)).astype(np.intp)
    return img[ys[:, None], xs[None, :]]


def sniff_kind(payload: bytes) -> str:
    """Container sniffing by magic bytes: 'audio' | 'image' | 'unknown'."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "audio"
    if payload[:2] == b"BM" or payload[:2] == b"P6":
        return "image"
    return "unknown"
