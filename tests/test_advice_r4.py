"""Round-4 regression tests for the advisor's edge-case findings:
empty-batch hash_split, jaccard_pairs id-range guard, asof_join id
precision above 2^53, all-null columns in profile_columns, and empty
rule dicts in rule_violation_counts."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


def test_hash_split_survives_empty_blocks():
    from kgflow.ops.text import hash_split

    docs = pd.DataFrame({"doc_id": [1, 2, 3], "text": ["aa", "bb", "cc"]})
    # a filter that drops everything produces empty downstream blocks —
    # the untyped np.array([]) used to raise UFuncTypeError there
    ds = rd.from_pandas(docs).filter(lambda r: False)
    out = hash_split(ds).to_pandas()
    assert len(out) == 0
    # before the dtype fix this raised UFuncTypeError inside map_batches


def test_jaccard_pairs_rejects_out_of_range_ids():
    from kgflow.ops.dedup import jaccard_pairs

    docs = pd.DataFrame(
        {
            "doc_id": [1 << 32, 1, 2],
            "text": ["a b c d", "a b c d", "a b c e"],
        }
    )
    with pytest.raises(Exception, match="doc_id"):
        jaccard_pairs(rd.from_pandas(docs), threshold=0.1).to_pandas()


def test_asof_join_preserves_ids_above_2_53():
    from kgflow.ops.window import asof_join

    big = (1 << 60) + 12345  # would round under float64
    ts = pd.to_datetime(["2024-01-01 00:00:05", "2024-01-01 00:00:20"]).astype(
        "datetime64[us]"
    )
    left = pd.DataFrame({"user_id": [1], "ts": ts[1:], "event_id": [100]})
    right = pd.DataFrame({"user_id": [1], "ts": ts[:1], "event_id": [big]})
    out = asof_join(
        rd.from_pandas(left), rd.from_pandas(right), num_buckets=2
    ).to_pandas()
    assert out["prior_event_id"].tolist() == [big]


def test_profile_columns_keeps_all_null_column():
    from kgflow.ops.profile import profile_columns

    df = pd.DataFrame(
        {"a": [1.0, 2.0, 3.0], "b": [np.nan, np.nan, np.nan]}
    )
    out = (
        profile_columns(rd.from_pandas(df), ["a", "b"])
        .to_pandas()
        .set_index("column")
    )
    assert set(out.index) == {"a", "b"}
    assert out.loc["b", "n_rows"] == 3
    assert out.loc["b", "n_null"] == 3
    assert out.loc["b", "n_distinct"] == 0
    assert out.loc["a", "n_distinct"] == 3


def test_rule_violation_counts_rejects_empty_rules():
    from kgflow.ops.checks import rule_violation_counts

    ds = rd.from_pandas(pd.DataFrame({"x": [1, 2]}))
    with pytest.raises(ValueError, match="non-empty"):
        rule_violation_counts(ds, {})


def test_real_codecs_roundtrip():
    import numpy as np

    from kgflow.ops.multimodal import (
        decode_bmp,
        decode_kgv1,
        decode_wav,
        encode_bmp,
        encode_kgv1,
        encode_wav,
    )

    rng = np.random.RandomState(0)
    # BMP: odd width exercises the 4-byte row padding
    img = rng.randint(0, 256, (13, 7, 3)).astype(np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)
    # WAV: 16-bit PCM exact roundtrip
    tone = (np.sin(np.arange(500) / 7.0) * 20000).astype(np.int16)
    got, sr = decode_wav(encode_wav(tone, 16000))
    assert sr == 16000
    assert np.array_equal((got * 32768.0).astype(np.int16), tone)
    # KGV1: multi-frame container
    frames = rng.randint(0, 256, (5, 9, 11, 3)).astype(np.uint8)
    assert np.array_equal(decode_kgv1(encode_kgv1(frames)), frames)


def test_media_stages_decode_real_codecs():
    import ray.data as rd

    from kgflow.ops.multimodal import (
        audio_features,
        image_features,
        real_media_table,
        video_frame_features,
    )

    media = rd.from_arrow(real_media_table(30))
    img = image_features(media).to_pandas()
    aud = audio_features(media).to_pandas()
    vid = video_frame_features(media).to_pandas()
    assert len(img) == 10 and img["mean_intensity"].between(0, 1).all()
    assert len(aud) == 10 and (aud["rms"] > 0).all()
    # every video contributes >= 1 sampled frame
    assert vid["media_id"].nunique() == 10
    assert (vid["frame_idx"] % 4 == 0).all()


def test_unknown_codec_still_raises():
    import pyarrow as pa
    import ray.data as rd

    from kgflow.ops.multimodal import image_features, synth_media_table

    t = synth_media_table(3)
    t = t.set_column(
        t.schema.get_field_index("codec"),
        "codec",
        pa.array(["jpeg"] * 3, pa.string()),
    )
    with pytest.raises(Exception, match="NotImplemented|jpeg"):
        image_features(rd.from_arrow(t)).to_pandas()


def test_mention_partials_handles_nulls_and_empty_blocks():
    import pyarrow as pa

    from kgflow.linking.link import mention_partials

    t = pa.table(
        {
            "subj": pa.array(["alice", None, "alice"], pa.string()),
            "obj": pa.array(["osaka", "osaka", None], pa.string()),
        }
    )
    out = mention_partials(rd.from_arrow(t), with_norm=True).to_pandas()
    got = dict(zip(out["mention"], out["n"]))
    assert got == {"alice": 2, "osaka": 2}  # nulls dropped, like pandas
    empty = rd.from_arrow(t).filter(lambda r: False)
    assert len(mention_partials(empty, with_norm=True).to_pandas()) == 0
