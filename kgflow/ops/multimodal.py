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
        ("kind", pa.string()),  # "image" | "audio" | "video"
        ("codec", pa.string()),  # "fake" (deterministic stub) | real codecs → NotImplementedError
        ("payload", pa.binary()),
        ("width", pa.int32()),  # image/video metadata (0 for audio)
        ("height", pa.int32()),
        ("sample_rate", pa.int32()),  # audio metadata (0 otherwise)
        ("n_frames", pa.int32()),  # video metadata (0 otherwise)
    ]
)


def synth_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media rows: payload bytes are a seeded hash
    stream; metadata matches the fake codec's expectations."""
    rng = np.random.RandomState(seed)
    kinds = ("image", "audio", "video")
    rows = {k: [] for k in MEDIA_SCHEMA.names}
    for i in range(n):
        kind = kinds[i % 3]
        w = int(rng.randint(8, 33)) if kind in ("image", "video") else 0
        h = int(rng.randint(8, 33)) if kind in ("image", "video") else 0
        sr = 16000 if kind == "audio" else 0
        nf = int(rng.randint(4, 17)) if kind == "video" else 0
        if kind == "image":
            size = w * h * 3
        elif kind == "video":
            size = w * h * 3 * nf
        else:
            size = 4096
        payload = hashlib.sha256(f"media{i}".encode()).digest()
        payload = (payload * (size // len(payload) + 1))[:size]
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["codec"].append("fake")
        rows["payload"].append(payload)
        rows["width"].append(w)
        rows["height"].append(h)
        rows["sample_rate"].append(sr)
        rows["n_frames"].append(nf)
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


class SampleFramesStage:
    """Actor-pool video frame-sampler: decode (stubbed) + uniform frame
    sampling + per-sampled-frame features. Video payloads are the
    largest media rows (frames x w x h x 3), so callers use the SMALLEST
    batch_size of the three modalities — the plumbing under test is
    exactly that batch/heap sizing plus the schema contract. A real
    deployment swaps ``_decode_frames`` for ffmpeg/pyav keyframe
    extraction behind the same signature."""

    def __init__(self, every_k: int = 4, feature_dim: int = 16):
        self.every_k = every_k
        self.feature_dim = feature_dim

    def _decode_frames(
        self, payload: bytes, codec: str, w: int, h: int, n_frames: int
    ) -> np.ndarray:
        if codec != "fake":
            raise NotImplementedError(
                f"codec {codec!r}: real video decoding needs ffmpeg/pyav, "
                "not available in this environment"
            )
        arr = np.frombuffer(payload, dtype=np.uint8)[: n_frames * w * h * 3]
        return arr.reshape(n_frames, h, w, 3).astype(np.float32) / 255.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frame_idx, feats, means = [], [], [], []
        for mid, kind, codec, payload, w, h, nf in zip(
            batch.column("media_id").to_pylist(),
            batch.column("kind").to_pylist(),
            batch.column("codec").to_pylist(),
            batch.column("payload").to_pylist(),
            batch.column("width").to_pylist(),
            batch.column("height").to_pylist(),
            batch.column("n_frames").to_pylist(),
        ):
            if kind != "video":
                continue
            frames = self._decode_frames(payload, codec, w, h, nf)
            for fi in range(0, nf, self.every_k):
                img = frames[fi]
                hist = np.histogram(img, bins=self.feature_dim, range=(0, 1))[0]
                ids.append(mid)
                frame_idx.append(fi)
                feats.append((hist / max(1, hist.sum())).astype(np.float32).tolist())
                means.append(float(img.mean()))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(frame_idx, pa.int32()),
                "feature": pa.array(feats, pa.list_(pa.float32())),
                "mean_intensity": pa.array(means, pa.float64()),
            }
        )


def video_frame_features(
    media: "rd.Dataset", batch_size: int = 16, every_k: int = 4
) -> "rd.Dataset":
    """Smallest batch of the three modalities: frames amplify payload
    bytes, and batch x concurrency of DECODED frames must fit the heap."""
    return media.map_batches(
        SampleFramesStage,
        fn_constructor_kwargs={"every_k": every_k},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, 4),
    )
