"""Multimodal plumbing: schemas, actor-pool featurize, stub behavior."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from record_matching_ray.stages import multimodal


def test_fake_media_schema():
    t = multimodal.make_fake_media(30)
    assert t.schema.equals(multimodal.MEDIA_SCHEMA)
    # deterministic across calls
    t2 = multimodal.make_fake_media(30)
    assert t.equals(t2)


def test_stub_raises_without_fake():
    k = multimodal.DecodeKernel(fake=False)
    with pytest.raises(NotImplementedError):
        k.decode_features(b"\x00\x01", "image")


def test_featurize_media_actor_pool():
    media = rd.from_arrow(multimodal.make_fake_media(48)).repartition(4)
    out = multimodal.featurize_media(media, feature_dim=32, fake=True).take_all()
    assert len(out) == 48
    v = np.array(out[0]["feature"])
    assert v.shape == (32,) and abs(np.linalg.norm(v) - 1.0) < 1e-4
    # content-hash seeding: same payload -> same features on a rerun
    out2 = multimodal.featurize_media(
        rd.from_arrow(multimodal.make_fake_media(48)), feature_dim=32, fake=True
    ).take_all()
    m1 = {r["media_id"]: list(r["feature"]) for r in out}
    m2 = {r["media_id"]: list(r["feature"]) for r in out2}
    assert m1 == m2


def test_media_type_stats():
    media = rd.from_arrow(multimodal.make_fake_media(30)).repartition(3)
    rows = {r["media_type"]: r for r in multimodal.media_type_stats(media).take_all()}
    assert set(rows) == {"image", "audio", "video"}
    assert sum(r["cnt"] for r in rows.values()) == 30
    t = multimodal.make_fake_media(30).to_pylist()
    want_img = sum(r["n_bytes"] for r in t if r["media_type"] == "image")
    assert rows["image"]["total_bytes"] == want_img


def test_resize_media_deterministic():
    from record_matching_ray.stages.multimodal import resize_media

    media = rd.from_arrow(multimodal.make_fake_media(12))
    out = resize_media(media, width=8, height=8, fake=True).take_all()
    assert len(out) == 12
    assert all(len(r["payload"]) == 8 * 8 * 3 for r in out)
    assert all(r["width"] == 8 and r["height"] == 8 for r in out)
    out2 = resize_media(rd.from_arrow(multimodal.make_fake_media(12)),
                        width=8, height=8, fake=True).take_all()
    assert {r["media_id"]: r["payload"] for r in out} == {
        r["media_id"]: r["payload"] for r in out2
    }


def test_sample_frames_explodes_rows():
    from record_matching_ray.stages.multimodal import sample_frames

    media = rd.from_arrow(multimodal.make_fake_media(9))
    out = sample_frames(media, every_n=2, max_frames=3, fake=True).take_all()
    assert len(out) >= 9  # flat_map shape: >= one frame per item
    per = {}
    for r in out:
        per.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert all(len(v) <= 3 for v in per.values())
    assert all(len(r["frame_payload"]) == 256 for r in out)


def test_stub_raises_resize_and_frames():
    from record_matching_ray.stages.multimodal import MediaResizer

    with pytest.raises(NotImplementedError):
        MediaResizer(fake=False)(multimodal.make_fake_media(2))
