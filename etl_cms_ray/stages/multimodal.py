"""Multimodal columns: opaque binary payloads + typed metadata.

The decode kernels themselves are STUBBED (no image/audio libs in this
container — see ``DecodeStub``); everything around them — schema, actor
pool signature, batch sizing, output layout — is real and tested, so
swapping in PIL/ffmpeg later is a one-function change.

Design rules for 100 TB media: small ``batch_size`` (payloads dominate
block size), ``batch_format="pyarrow"`` end-to-end (binary columns do not
survive pandas round-trips cheaply), decode in an actor pool so codec
init happens once per actor.
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


def synth_media_table(n: int = 64, seed: int = 5) -> pa.Table:
    """Deterministic fake payloads for plumbing tests (no external data)."""
    rng = np.random.RandomState(seed)
    kinds = ["image", "audio", "video"]
    rows = {name: [] for name in MEDIA_SCHEMA.names}
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.bytes(128 + int(rng.randint(0, 512)))
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["mime"].append({"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind])
        rows["width"].append(int(rng.randint(16, 256)) if kind != "audio" else -1)
        rows["height"].append(int(rng.randint(16, 256)) if kind != "audio" else -1)
        rows["duration_ms"].append(int(rng.randint(100, 60000)) if kind != "image" else -1)
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
