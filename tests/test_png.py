"""Pure-stdlib PNG codec (round-4 verdict item 3): zlib inflate + full
scanline-filter reconstruction, wired into the image decode/phash
stages behind the same codec dispatch as BMP."""

import struct
import zlib

import numpy as np
import pytest
import ray.data as rd

from kgflow.ops.multimodal import (
    _png_chunk,
    _PNG_SIG,
    decode_png,
    encode_png,
)


def test_roundtrip_every_filter_type():
    # encoder cycles filters per row; >=5 rows exercises all five
    rng = np.random.RandomState(11)
    for shape in [(5, 4), (8, 8), (17, 9), (1, 1), (32, 32)]:
        img = rng.randint(0, 256, (*shape, 3)).astype(np.uint8)
        assert (decode_png(encode_png(img)) == img).all()


def test_roundtrip_smooth_gradient():
    g = np.arange(48 * 32 * 3, dtype=np.uint64).reshape(48, 32, 3)
    img = (g % 251).astype(np.uint8)
    assert (decode_png(encode_png(img)) == img).all()


def test_rgba_alpha_dropped():
    # hand-build a color-type-6 PNG (filter 0 rows) and check the
    # decoder strips alpha
    rng = np.random.RandomState(5)
    h, w = 4, 3
    rgba = rng.randint(0, 256, (h, w, 4)).astype(np.uint8)
    raws = b"".join(b"\x00" + rgba[y].tobytes() for y in range(h))
    payload = (
        _PNG_SIG
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(raws))
        + _png_chunk(b"IEND", b"")
    )
    out = decode_png(payload)
    assert out.shape == (h, w, 3)
    assert (out == rgba[:, :, :3]).all()


def test_crc_mismatch_rejected():
    img = np.zeros((3, 3, 3), np.uint8)
    payload = bytearray(encode_png(img))
    payload[-5] ^= 0xFF  # corrupt IEND CRC
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(payload))


def test_unsupported_shapes_raise_loudly():
    payload = (
        _PNG_SIG
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="depth=16"):
        decode_png(payload)


def test_decode_stage_and_phash_handle_png(ray_session):
    import pyarrow as pa

    from kgflow.ops.dedup import hamming_band_pairs
    from kgflow.ops.multimodal import (
        MEDIA_SCHEMA,
        PHashStage,
        image_features,
    )

    rng = np.random.RandomState(9)
    base = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    near = base.copy()
    near[0, 0, 0] ^= 1  # 1-pixel perturbation -> near-dup pair
    far = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    rows = {k: [] for k in MEDIA_SCHEMA.names}
    for i, img in enumerate([base, near, far]):
        rows["media_id"].append(i)
        rows["kind"].append("image")
        rows["codec"].append("png")
        rows["payload"].append(encode_png(img))
        rows["width"].append(16)
        rows["height"].append(16)
        rows["sample_rate"].append(0)
        rows["n_frames"].append(0)
    media = rd.from_arrow(pa.table(rows, schema=MEDIA_SCHEMA))

    feats = image_features(media).to_pandas()
    assert len(feats) == 3
    assert feats["mean_intensity"].between(0, 1).all()

    hashes = media.map_batches(
        PHashStage, batch_format="pyarrow", concurrency=2
    )
    pairs = hamming_band_pairs(
        hashes, id_col="media_id", hash_col="phash", max_hamming=6
    ).to_pandas()
    got = {tuple(sorted(p)) for p in pairs[["doc_a", "doc_b"]].values.tolist()}
    assert (0, 1) in got  # planted near-dup recovered through PNG path
    assert (0, 2) not in got
