"""Multimodal columns: opaque binary payloads + typed metadata.

Decode is REAL for audio (RIFF/WAVE PCM), images (BMP 24-bit, PPM P6)
and uncompressed video (RIFF/AVI 'DIB ' 24-bit frames) via the
pure-numpy codecs in ``functions/codecs.py`` — ``MediaDecoder`` parses
the actual container bytes and extracts numeric features / thumbnails,
and ``VideoFrameFeatures`` emits real per-frame rows (flat-map shape)
from AVI payloads.  COMPRESSED video (mp4/h264) stays an honest stub —
it genuinely needs a codec library this container does not have:
``MediaDecoder(strict=True)`` raises for it (dead-letter upstream),
strict=False falls back to the deterministic sha-derived vector of
``DecodeStub``.

Design rules for 100 TB media: small ``batch_size`` (payloads dominate
block size), ``batch_format="pyarrow"`` end-to-end (binary columns do not
survive pandas round-trips cheaply), decode in an actor pool
(``map_batches(MediaDecoder, concurrency=N)``) so codec state/init costs
are paid once per actor, not per batch.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.large_binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),  # -1 when unknown/not applicable
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def synth_media_table(n: int = 64, seed: int = 5,
                      video: str = "mp4") -> pa.Table:
    """Deterministic payloads for tests (no external data): REAL BMP
    images and REAL PCM WAVs (the metadata columns match the encoded
    container exactly).  ``video="mp4"`` (default, the historical
    fixture) keeps video payloads opaque random bytes — the compressed-
    codec stub path; ``video="avi"`` encodes REAL uncompressed AVI
    clips (duration_ms consistent with frame count x fps) for the real
    video decode path."""
    from ..functions.codecs import encode_avi, encode_bmp, encode_wav

    rng = np.random.RandomState(seed)
    kinds = ["image", "audio", "video"]
    rows = {name: [] for name in MEDIA_SCHEMA.names}
    for i in range(n):
        kind = kinds[i % 3]
        w = h = -1
        dur = -1
        if kind == "image":
            w, h = int(rng.randint(4, 48)), int(rng.randint(4, 48))
            payload = encode_bmp(rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8))
            mime = "image/bmp"
        elif kind == "audio":
            dur = int(rng.randint(50, 2000))
            nsamp = dur * 8  # 8 kHz
            t = np.arange(nsamp) / 8000.0
            f = float(rng.randint(100, 1200))
            payload = encode_wav(
                (0.5 * np.sin(2 * np.pi * f * t)).astype(np.float32), 8000
            )
            mime = "audio/wav"
        elif video == "avi":
            fps = 10
            nframes = int(rng.randint(2, 9))
            w, h = int(rng.randint(4, 24)), int(rng.randint(4, 24))
            frames = rng.randint(0, 256, size=(nframes, h, w, 3),
                                 dtype=np.uint8)
            payload = encode_avi(frames, fps=fps)
            dur = nframes * 1000 // fps
            mime = "video/avi"
        else:
            dur = int(rng.randint(100, 60000))
            w, h = int(rng.randint(16, 256)), int(rng.randint(16, 256))
            payload = rng.bytes(128 + int(rng.randint(0, 512)))
            mime = "video/mp4"
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["mime"].append(mime)
        rows["width"].append(w)
        rows["height"].append(h)
        rows["duration_ms"].append(dur)
    return pa.table(rows, schema=MEDIA_SCHEMA)


class DecodeStub:
    """Actor-pool decode stage.  Real codecs are unavailable here, so the
    "decoded feature" is a deterministic function of the payload bytes
    (sha256-derived 8-dim vector); the class shape — constructor-time codec
    init, per-batch vectorized loop, Arrow in/out — is the real contract.

    Replace ``_decode_one`` with the PIL/soundfile/ffmpeg call in a real
    deployment; raise NotImplementedError for kinds you don't support.
    """

    SUPPORTED = ("image", "audio", "video")

    def __init__(self, feature_dim: int = 8, strict: bool = False):
        self.feature_dim = feature_dim
        self.strict = strict  # strict=True: unknown kind raises (dead-letter upstream)

    def _decode_one(self, kind: str, payload: bytes) -> np.ndarray:
        if kind not in self.SUPPORTED:
            if self.strict:
                raise NotImplementedError(f"no decoder for kind={kind!r}")
            return np.zeros(self.feature_dim, dtype=np.float32)
        digest = hashlib.sha256(payload).digest()
        raw = np.frombuffer(digest[: self.feature_dim * 4], dtype=np.uint32)
        return (raw.astype(np.float32) / np.float32(2**32)).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch["kind"].to_pylist()
        payloads = batch["payload"].to_pylist()
        feats = np.stack([self._decode_one(k, p) for k, p in zip(kinds, payloads)])
        feat_col = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.reshape(-1), type=pa.float32()), self.feature_dim
        )
        out = batch.drop_columns(["payload"])  # features replace payloads downstream
        return out.append_column("features", feat_col)


class MediaDecoder:
    """Actor-pool decode stage with REAL codecs for audio/images.

    Feature layout (fixed 8-dim float32, one vector per row):
    - image: ``[width, height, mean_r, mean_g, mean_b, luma_std,
      edge_energy, aspect]`` — decoded from the actual BMP/PPM bytes;
    - audio: ``[duration_s, rms, zero_cross_rate, spectral_centroid_hz,
      peak, rate_khz, 0, 0]`` — decoded from the actual WAV bytes;
    - video (uncompressed AVI): ``[n_frames, width, height, fps,
      mean_luma, motion_energy, duration_s, 0]`` — decoded from the
      actual RIFF/AVI bytes (motion_energy = mean |frame delta| of the
      luma plane);
    - compressed video / unknown: ``strict=True`` raises
      NotImplementedError (no mp4/h264 codec in this container —
      dead-letter upstream), else the DecodeStub sha-derived
      deterministic vector.

    ``resize_to=(w, h)`` additionally emits a ``thumb`` binary column
    (raw RGB bytes of the nearest-neighbor resize) for image rows —
    the resize/thumbnail path of a media pipeline.

    Stage shape: constructor-time state (per actor, once), per-batch
    loop over payload memoryviews (decode is irreducibly per-item; the
    numpy work inside each decode is vectorized), Arrow in/out, small
    ``batch_size`` because payloads dominate block bytes.
    """

    def __init__(self, feature_dim: int = 8, strict: bool = False,
                 resize_to: tuple | None = None):
        assert feature_dim >= 8
        self.feature_dim = feature_dim
        self.strict = strict
        self.resize_to = resize_to
        self._stub = DecodeStub(feature_dim=feature_dim, strict=False)

    def _image_features(self, img: np.ndarray) -> np.ndarray:
        h, w, _ = img.shape
        f = np.zeros(self.feature_dim, dtype=np.float32)
        mean = img.reshape(-1, 3).mean(axis=0)
        luma = img.astype(np.float32) @ np.array([0.299, 0.587, 0.114],
                                                 dtype=np.float32)
        gy = np.abs(np.diff(luma, axis=0)).mean() if h > 1 else 0.0
        gx = np.abs(np.diff(luma, axis=1)).mean() if w > 1 else 0.0
        f[:8] = [w, h, mean[0], mean[1], mean[2], float(luma.std()),
                 float(gx + gy), w / h]
        return f

    def _video_features(self, frames: np.ndarray, fps: float) -> np.ndarray:
        t, h, w, _ = frames.shape
        f = np.zeros(self.feature_dim, dtype=np.float32)
        luma = frames.astype(np.float32) @ np.array([0.299, 0.587, 0.114],
                                                    dtype=np.float32)
        motion = (float(np.abs(np.diff(luma, axis=0)).mean())
                  if t > 1 else 0.0)
        f[:8] = [t, w, h, fps, float(luma.mean()), motion,
                 t / fps if fps > 0 else 0.0, 0.0]
        return f

    def _audio_features(self, x: np.ndarray, rate: int) -> np.ndarray:
        f = np.zeros(self.feature_dim, dtype=np.float32)
        n = len(x)
        if n == 0:
            return f
        rms = float(np.sqrt(np.mean(x * x)))
        zcr = float(np.mean(np.abs(np.diff(np.signbit(x))))) if n > 1 else 0.0
        spec = np.abs(np.fft.rfft(x))
        freqs = np.fft.rfftfreq(n, d=1.0 / rate)
        power = float(spec.sum())
        centroid = float((freqs * spec).sum() / power) if power > 0 else 0.0
        f[:8] = [n / rate, rms, zcr, centroid, float(np.abs(x).max()),
                 rate / 1000.0, 0.0, 0.0]
        return f

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.codecs import (decode_avi, decode_bmp, decode_ppm,
                                        decode_wav, resize_image)

        kinds = batch["kind"].to_pylist()
        payloads = batch["payload"].to_pylist()
        feats = np.zeros((len(kinds), self.feature_dim), dtype=np.float32)
        thumbs: list = [None] * len(kinds)
        for i, (k, p) in enumerate(zip(kinds, payloads)):
            try:
                if k == "image":
                    img = decode_ppm(p) if p[:2] == b"P6" else decode_bmp(p)
                    feats[i] = self._image_features(img)
                    if self.resize_to is not None:
                        w, h = self.resize_to
                        thumbs[i] = resize_image(img, w, h).tobytes()
                    continue
                if k == "audio":
                    x, rate = decode_wav(p)
                    feats[i] = self._audio_features(x, rate)
                    continue
                if k == "video" and p[:4] == b"RIFF" and p[8:12] == b"AVI ":
                    frames, fps = decode_avi(p)
                    feats[i] = self._video_features(frames, fps)
                    continue
            except ValueError:
                if self.strict:
                    raise
                feats[i] = self._stub._decode_one(k, p)
                continue
            if self.strict:  # compressed video / unknown kinds
                raise NotImplementedError(
                    f"no codec for kind={k!r} in this environment"
                )
            feats[i] = self._stub._decode_one(k, p)
        feat_col = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.reshape(-1), type=pa.float32()), self.feature_dim
        )
        out = batch.drop_columns(["payload"])
        out = out.append_column("features", feat_col)
        if self.resize_to is not None:
            out = out.append_column(
                "thumb", pa.array(thumbs, type=pa.large_binary())
            )
        return out


class VideoFrameFeatures:
    """REAL per-frame extraction from uncompressed AVI payloads
    (flat-map shape: one video row -> ``ceil(n_frames / stride)`` frame
    rows).  Emits per sampled frame: mean R/G/B, luma std, and motion
    energy vs the PREVIOUS sampled frame (0 for the first) — the
    frame-sample + featurize stage of a video curation pipeline.
    Non-AVI payloads raise in strict mode (dead-letter upstream) and
    are silently skipped otherwise (metadata-only rows keep flowing
    through FrameSampler).

    Stage shape: actor pool (decode state per actor), SMALL batch_size
    (decoded frames dominate heap: batch_size x frames x H x W x 3
    bytes live at once), Arrow in/out."""

    def __init__(self, stride: int = 1, strict: bool = False):
        assert stride >= 1
        self.stride = stride
        self.strict = strict
        self._luma = np.array([0.299, 0.587, 0.114], dtype=np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.codecs import decode_avi

        out = {k: [] for k in ("media_id", "frame_idx", "frame_ts_ms",
                               "mean_r", "mean_g", "mean_b", "luma_std",
                               "motion")}
        for mid, kind, p in zip(
            batch["media_id"].to_pylist(),
            batch["kind"].to_pylist(),
            batch["payload"].to_pylist(),
        ):
            if kind != "video":
                continue
            try:
                frames, fps = decode_avi(p)
            except ValueError:
                if self.strict:
                    raise
                continue
            sampled = frames[:: self.stride].astype(np.float32)
            luma = sampled @ self._luma
            mean_rgb = sampled.mean(axis=(1, 2))  # (t, 3) one sweep
            prev = None
            for j in range(sampled.shape[0]):
                idx = j * self.stride
                out["media_id"].append(mid)
                out["frame_idx"].append(idx)
                out["frame_ts_ms"].append(
                    int(idx * 1000 / fps) if fps > 0 else 0
                )
                out["mean_r"].append(float(mean_rgb[j, 0]))
                out["mean_g"].append(float(mean_rgb[j, 1]))
                out["mean_b"].append(float(mean_rgb[j, 2]))
                out["luma_std"].append(float(luma[j].std()))
                out["motion"].append(
                    0.0 if prev is None
                    else float(np.abs(luma[j] - prev).mean())
                )
                prev = luma[j]
        return pa.table(
            {
                "media_id": pa.array(out["media_id"], type=pa.int64()),
                "frame_idx": pa.array(out["frame_idx"], type=pa.int32()),
                "frame_ts_ms": pa.array(out["frame_ts_ms"], type=pa.int32()),
                "mean_r": pa.array(out["mean_r"], type=pa.float64()),
                "mean_g": pa.array(out["mean_g"], type=pa.float64()),
                "mean_b": pa.array(out["mean_b"], type=pa.float64()),
                "luma_std": pa.array(out["luma_std"], type=pa.float64()),
                "motion": pa.array(out["motion"], type=pa.float64()),
            }
        )


class FrameSampler:
    """Video frame-sample stub: emits ``n_frames`` metadata rows per video
    (flat-map shape: one input row -> many output rows), real timestamp
    arithmetic, stub frame extraction."""

    def __init__(self, fps: float = 1.0):
        self.fps = fps

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_ids, out_ts = [], []
        for mid, kind, dur in zip(
            batch["media_id"].to_pylist(),
            batch["kind"].to_pylist(),
            batch["duration_ms"].to_pylist(),
        ):
            if kind != "video" or dur is None or dur <= 0:
                continue
            step = int(1000 / self.fps)
            for ts in range(0, dur, step):
                out_ids.append(mid)
                out_ts.append(ts)
        return pa.table(
            {
                "media_id": pa.array(out_ids, type=pa.int64()),
                "frame_ts_ms": pa.array(out_ts, type=pa.int32()),
            }
        )
