"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are treated as opaque ``binary`` columns with typed
metadata columns, processed by actor-pool ``map_batches`` stages with
SMALL batch sizes (a batch × concurrency of decoded frames must fit the
worker heap — BASELINE/task guidance). The decode kernels themselves are
STUBBED (no image/audio libraries in this container): ``DecodeImageStage``
ships a deterministic fake decoder behind the same signature a real
(PIL/ffmpeg) decoder would have, and raises ``NotImplementedError`` when
asked for a real codec — the Ray-side plumbing (schema, batch sizing,
actor signature, output layout) is real and tested.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # "image" | "audio"
        ("codec", pa.string()),  # "fake" (deterministic stub) | real codecs → NotImplementedError
        ("payload", pa.binary()),
        ("width", pa.int32()),  # image metadata (0 for audio)
        ("height", pa.int32()),
        ("sample_rate", pa.int32()),  # audio metadata (0 for image)
    ]
)


def synth_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media rows: payload bytes are a seeded hash
    stream; metadata matches the fake codec's expectations."""
    rng = np.random.RandomState(seed)
    rows = {k: [] for k in ("media_id", "kind", "codec", "payload", "width", "height", "sample_rate")}
    for i in range(n):
        kind = "image" if i % 2 == 0 else "audio"
        w = int(rng.randint(8, 33)) if kind == "image" else 0
        h = int(rng.randint(8, 33)) if kind == "image" else 0
        sr = 16000 if kind == "audio" else 0
        size = w * h * 3 if kind == "image" else 4096
        payload = hashlib.sha256(f"media{i}".encode()).digest()
        payload = (payload * (size // len(payload) + 1))[:size]
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["codec"].append("fake")
        rows["payload"].append(payload)
        rows["width"].append(w)
        rows["height"].append(h)
        rows["sample_rate"].append(sr)
    return pa.table(rows, schema=MEDIA_SCHEMA)


class DecodeImageStage:
    """Actor-pool decode + feature-extract for image rows.

    Real deployment: ``__init__`` loads the codec/model once;
    ``__call__`` decodes a SMALL batch (large binary payloads → small
    ``batch_size``) and emits fixed-width feature vectors. The fake
    codec interprets the payload as raw RGB bytes — deterministic and
    library-free; any real codec raises NotImplementedError here.
    """

    def __init__(self, feature_dim: int = 16):
        self.feature_dim = feature_dim

    def _decode(self, payload: bytes, codec: str, w: int, h: int) -> np.ndarray:
        if codec != "fake":
            raise NotImplementedError(
                f"codec {codec!r}: real image decoding needs PIL/libjpeg, "
                "not available in this environment"
            )
        arr = np.frombuffer(payload, dtype=np.uint8)[: w * h * 3]
        return arr.reshape(h, w, 3).astype(np.float32) / 255.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, feats, means = [], [], []
        for mid, kind, codec, payload, w, h in zip(
            batch.column("media_id").to_pylist(),
            batch.column("kind").to_pylist(),
            batch.column("codec").to_pylist(),
            batch.column("payload").to_pylist(),
            batch.column("width").to_pylist(),
            batch.column("height").to_pylist(),
        ):
            if kind != "image":
                continue
            img = self._decode(payload, codec, w, h)
            # fake feature extractor: channel-wise histogram, fixed dim
            hist = np.histogram(img, bins=self.feature_dim, range=(0, 1))[0]
            feats.append((hist / max(1, hist.sum())).astype(np.float32).tolist())
            means.append(float(img.mean()))
            ids.append(mid)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "feature": pa.array(feats, pa.list_(pa.float32())),
                "mean_intensity": pa.array(means, pa.float64()),
            }
        )


class ResampleAudioStage:
    """Actor-pool audio frame-sampler (stubbed decode, real plumbing)."""

    def __init__(self, target_rate: int = 8000):
        self.target_rate = target_rate

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, n_samples, rms = [], [], []
        for mid, kind, codec, payload, sr in zip(
            batch.column("media_id").to_pylist(),
            batch.column("kind").to_pylist(),
            batch.column("codec").to_pylist(),
            batch.column("payload").to_pylist(),
            batch.column("sample_rate").to_pylist(),
        ):
            if kind != "audio":
                continue
            if codec != "fake":
                raise NotImplementedError(f"codec {codec!r}: needs ffmpeg")
            wave = np.frombuffer(payload, dtype=np.uint8).astype(np.float32) - 128.0
            step = max(1, sr // self.target_rate)
            out = wave[::step]
            ids.append(mid)
            n_samples.append(len(out))
            rms.append(float(np.sqrt(np.mean(out**2))))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "n_samples": pa.array(n_samples, pa.int64()),
                "rms": pa.array(rms, pa.float64()),
            }
        )


def image_features(media: "rd.Dataset", batch_size: int = 64) -> "rd.Dataset":
    """Small batch_size: payload bytes × batch × concurrency bounds heap."""
    return media.map_batches(
        DecodeImageStage, batch_format="pyarrow", batch_size=batch_size,
        concurrency=(1, 4),
    )


def audio_features(media: "rd.Dataset", batch_size: int = 64) -> "rd.Dataset":
    return media.map_batches(
        ResampleAudioStage, batch_format="pyarrow", batch_size=batch_size,
        concurrency=(1, 4),
    )
