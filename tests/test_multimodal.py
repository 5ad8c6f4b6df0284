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


# ---------------------------------------------------------------------------
# real codec paths (functions/media_codecs: stdlib zlib/wave + numpy)


def _checker(h, w, c=3):
    import numpy as np

    y, x = np.mgrid[0:h, 0:w]
    base = ((x + y) % 2 * 255).astype(np.uint8)
    if c == 1:
        return base
    return np.stack([base, 255 - base, (x * 7 % 256).astype(np.uint8)][:c], axis=2)


def test_png_roundtrip_gray_rgb_rgba():
    import numpy as np

    from record_matching_ray.functions.media_codecs import png_decode, png_encode

    for img in [_checker(5, 7, 1), _checker(6, 4, 3), np.dstack([_checker(3, 3, 3), np.full((3, 3), 200, np.uint8)])]:
        out = png_decode(png_encode(img))
        assert out.shape == img.shape
        assert (out == img).all()


def test_png_decode_all_filter_types():
    """Hand-filter rows with each of the 5 PNG filters and check the
    decoder reconstructs the original pixels."""
    import struct
    import zlib

    import numpy as np

    from record_matching_ray.functions.media_codecs import png_decode

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(5, 6, 3)).astype(np.uint8)
    h, w, c = img.shape
    stride = w * c
    flat = img.reshape(h, stride).astype(np.int64)
    raw = bytearray()
    for y, ft in enumerate([0, 1, 2, 3, 4]):
        row = flat[y]
        prev = flat[y - 1] if y > 0 else np.zeros(stride, np.int64)
        filt = np.zeros(stride, np.int64)
        for x in range(stride):
            left = row[x - c] if x >= c else 0
            up = prev[x]
            ul = prev[x - c] if x >= c else 0
            if ft == 0:
                filt[x] = row[x]
            elif ft == 1:
                filt[x] = row[x] - left
            elif ft == 2:
                filt[x] = row[x] - up
            elif ft == 3:
                filt[x] = row[x] - (left + up) // 2
            else:
                p = left + up - ul
                pa_, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa_ <= pb and pa_ <= pc) else (up if pb <= pc else ul)
                filt[x] = row[x] - pred
        raw.append(ft)
        raw.extend((filt & 0xFF).astype(np.uint8).tobytes())

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    assert (png_decode(data) == img).all()


def test_wav_roundtrip_and_sniff():
    import numpy as np

    from record_matching_ray.functions.media_codecs import (
        sniff_media,
        wav_decode,
        wav_encode,
    )

    t = np.arange(1600)
    samples = (np.sin(2 * np.pi * 440 * t / 16000) * 20000).astype(np.int16)
    data = wav_encode(samples, 16000)
    assert sniff_media(data)["kind"] == "wav"
    out, rate = wav_decode(data)
    assert rate == 16000 and out.shape == (1600, 1)
    assert np.allclose(out[:, 0], samples / 32768.0)


def test_sniff_headers():
    import struct

    from record_matching_ray.functions.media_codecs import sniff_media

    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 4
    assert sniff_media(gif) == {"kind": "gif", "width": 320, "height": 200}
    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 100, -50) + b"\x00" * 8
    assert sniff_media(bmp) == {"kind": "bmp", "width": 100, "height": 50}
    jpeg = b"\xff\xd8\xff" + b"\xe0" + struct.pack(">H", 4) + b"\x00\x00" \
        + b"\xff\xc0" + struct.pack(">H", 9) + b"\x08" + struct.pack(">HH", 30, 40) + b"\x03"
    got = sniff_media(jpeg)
    assert got == {"kind": "jpeg", "width": 40, "height": 30}
    assert sniff_media(b"\x00\x01\x02")["kind"] == "unknown"


def _png_wav_media(n):
    import pyarrow as pa

    from record_matching_ray.functions.media_codecs import png_encode, wav_encode
    import numpy as np

    payloads, types = [], []
    for i in range(n):
        if i % 2 == 0:
            payloads.append(png_encode(_checker(4 + i % 3, 5, 3)))
            types.append("image")
        else:
            payloads.append(
                wav_encode((np.arange(400) * (i + 3) % 4000 - 2000).astype(np.int16))
            )
            types.append("audio")
    return pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "url": pa.array([f"media://x/{i}" for i in range(n)], pa.string()),
            "media_type": pa.array(types, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
        }
    )


def test_featurize_media_real_png_wav():
    import numpy as np

    from record_matching_ray.stages.multimodal import featurize_media

    media = rd.from_arrow(_png_wav_media(8))
    out = featurize_media(media, feature_dim=64, fake=False, concurrency=2).take_all()
    assert len(out) == 8
    for r in out:
        v = np.asarray(r["feature"])
        assert v.shape == (64,)
        assert abs(np.linalg.norm(v) - 1.0) < 1e-5
    # deterministic across runs
    out2 = featurize_media(
        rd.from_arrow(_png_wav_media(8)), feature_dim=64, fake=False, concurrency=2
    ).take_all()
    a = {r["media_id"]: list(r["feature"]) for r in out}
    b = {r["media_id"]: list(r["feature"]) for r in out2}
    assert a == b


def test_resize_media_real_png():
    from record_matching_ray.functions.media_codecs import png_decode, png_encode
    from record_matching_ray.stages.multimodal import resize_media

    import numpy as np
    import pyarrow as pa

    imgs = [_checker(10, 12, 3), _checker(7, 5, 3)]
    media = rd.from_arrow(
        pa.table(
            {
                "media_id": pa.array([0, 1], pa.int64()),
                "payload": pa.array([png_encode(i) for i in imgs], pa.binary()),
            }
        )
    )
    out = resize_media(media, width=6, height=4, fake=False).take_all()
    assert len(out) == 2
    for r in out:
        dec = png_decode(r["payload"])
        assert dec.shape == (4, 6, 3)
        src = imgs[r["media_id"]]
        # nearest-neighbor: every output pixel exists in the source
        assert all(
            (src.reshape(-1, 3) == px).all(axis=1).any()
            for px in dec.reshape(-1, 3)
        )


def test_jpeg_codec_roundtrip_properties():
    """Baseline JPEG codec (functions/jpeg.py): constant 8x8 tiles at
    quality 100 round-trip EXACTLY; random/gradient content round-trips
    within the expected lossy bound; color and odd sizes work."""
    import numpy as np

    from record_matching_ray.functions.jpeg import jpeg_decode, jpeg_encode

    rng = np.random.RandomState(7)
    tiles = rng.randint(0, 256, size=(3, 4), dtype=np.uint8)
    img = np.kron(tiles, np.ones((8, 8), dtype=np.uint8))
    assert np.array_equal(jpeg_decode(jpeg_encode(img, quality=100)), img)

    g = rng.randint(0, 256, size=(24, 40), dtype=np.uint8)
    back = jpeg_decode(jpeg_encode(g, quality=95))
    assert back.shape == g.shape
    assert np.abs(back.astype(int) - g.astype(int)).max() <= 16

    xx, yy = np.meshgrid(np.arange(40), np.arange(24))
    smooth = ((xx * 3 + yy * 2) % 256).astype(np.uint8)
    b = jpeg_decode(jpeg_encode(smooth, quality=90))
    assert np.abs(b.astype(int) - smooth.astype(int)).max() <= 4

    rgb = rng.randint(0, 256, size=(17, 23, 3), dtype=np.uint8)
    brgb = jpeg_decode(jpeg_encode(rgb, quality=95))
    assert brgb.shape == (17, 23, 3)
    assert np.abs(brgb.astype(int) - rgb.astype(int)).max() <= 32

    odd = rng.randint(0, 256, size=(9, 13), dtype=np.uint8)
    assert jpeg_decode(jpeg_encode(odd, quality=100)).shape == (9, 13)


def test_jpeg_decoder_guards():
    import numpy as np
    import pytest

    from record_matching_ray.functions.jpeg import jpeg_decode, jpeg_encode

    with pytest.raises(ValueError, match="SOI"):
        jpeg_decode(b"not a jpeg")
    data = bytearray(jpeg_encode(np.zeros((8, 8), np.uint8)))
    # corrupt the SOF marker into progressive (0xC2)
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="SOF"):
        jpeg_decode(bytes(data))


def test_featurizer_decodes_real_jpeg():
    """DecodeKernel routes JPEG payloads through the real decoder: two
    identical images featurize identically, a different one differs."""
    import numpy as np

    from record_matching_ray.functions.jpeg import jpeg_encode
    from record_matching_ray.stages.multimodal import DecodeKernel

    k = DecodeKernel(feature_dim=64, fake=False)
    a = np.kron(
        np.array([[10, 200], [60, 120]], np.uint8), np.ones((8, 8), np.uint8)
    )
    b = np.kron(
        np.array([[250, 5], [90, 30]], np.uint8), np.ones((8, 8), np.uint8)
    )
    fa1 = k.decode_features(jpeg_encode(a, 100), "image")
    fa2 = k.decode_features(jpeg_encode(a, 100), "image")
    fb = k.decode_features(jpeg_encode(b, 100), "image")
    assert np.array_equal(fa1, fa2)
    assert not np.array_equal(fa1, fb)


def test_resize_media_jpeg_payloads():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from record_matching_ray.functions.jpeg import jpeg_decode, jpeg_encode
    from record_matching_ray.stages.multimodal import resize_media

    rng = np.random.RandomState(3)
    payloads = [
        jpeg_encode(rng.randint(0, 256, size=(32, 32), dtype=np.uint8), 95)
        for _ in range(3)
    ]
    media = rd.from_arrow(
        pa.table(
            {
                "media_id": pa.array([0, 1, 2], pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )
    )
    out = resize_media(media, width=16, height=16).to_pandas()
    assert len(out) == 3
    for p in out["payload"]:
        img = jpeg_decode(bytes(p))
        assert img.shape == (16, 16)


def test_avi_mjpeg_roundtrip_and_sniff():
    import numpy as np

    from record_matching_ray.functions.jpeg import jpeg_decode, jpeg_encode
    from record_matching_ray.functions.media_codecs import (
        avi_mjpeg_encode,
        avi_mjpeg_frames,
        sniff_media,
    )

    frames = []
    for f in range(4):
        tiles = ((7 * 37 + f * 29 + np.arange(6) * 17) % 256).astype(np.uint8)
        img = np.kron(tiles.reshape(2, 3), np.ones((8, 8), np.uint8))
        frames.append(jpeg_encode(img, quality=100))
    avi = avi_mjpeg_encode(frames, 24, 16, fps=10)
    s = sniff_media(avi)
    assert s["kind"] == "avi_mjpeg" and s["width"] == 24 and s["height"] == 16
    assert avi_mjpeg_frames(avi) == frames
    # constant 8x8 tiles at q100 round-trip exactly
    px = jpeg_decode(frames[2])
    expect = np.kron(
        (((7 * 37 + 2 * 29 + np.arange(6) * 17) % 256).astype(np.uint8)).reshape(2, 3),
        np.ones((8, 8), np.uint8),
    )
    assert (px == expect).all()


def test_sample_frames_real_avi(ray_session):
    import numpy as np
    import pyarrow as pa

    import ray.data

    from record_matching_ray.functions.jpeg import jpeg_encode
    from record_matching_ray.functions.media_codecs import avi_mjpeg_encode
    from record_matching_ray.stages.multimodal import sample_frames

    payloads = []
    for mid in range(3):
        frames = [
            jpeg_encode(
                np.full((16, 16), (mid * 11 + f) % 256, np.uint8), quality=100
            )
            for f in range(5)
        ]
        payloads.append(avi_mjpeg_encode(frames, 16, 16))
    ds = ray.data.from_arrow(
        pa.table(
            {
                "media_id": pa.array(range(3), pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )
    )
    out = sample_frames(ds, every_n=2, max_frames=2).to_pandas()
    # every_n=2 over 5 frames, capped at 2 -> frames 0 and 2 per video
    assert sorted(out["frame_idx"].unique().tolist()) == [0, 2]
    assert len(out) == 6
    assert all(p[:3] == b"\xff\xd8\xff" for p in out["frame_payload"])


def test_bmp_gif_roundtrip_and_featurize():
    import numpy as np

    from record_matching_ray.functions.media_codecs import (
        bmp_decode,
        bmp_encode,
        gif_decode,
        gif_encode,
    )
    from record_matching_ray.stages.multimodal import DecodeKernel

    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 256, (11, 19, 3)).astype(np.uint8)
    assert (bmp_decode(bmp_encode(rgb)) == rgb).all()
    gray = rng.integers(0, 256, (7, 23)).astype(np.uint8)
    g3 = gif_decode(gif_encode(gray))
    assert (g3[:, :, 0] == gray).all() and (g3[:, :, 2] == gray).all()

    # real (non-fake) decode path accepts BMP and GIF payloads now
    k = DecodeKernel(feature_dim=64, fake=False)
    fb = k.decode_features(bmp_encode(rgb), "image")
    fg = k.decode_features(gif_encode(gray), "image")
    assert fb.shape == (64,) and fg.shape == (64,)
    # features are normalized pooled luma — nonzero and finite
    assert np.isfinite(fb).all() and np.linalg.norm(fb) > 0.99
    assert np.isfinite(fg).all() and np.linalg.norm(fg) > 0.99


def test_sample_frames_pluggable_decoder_protocol(ray_session):
    """VERDICT r3 task 8: a user-registered decoder drives sample_frames
    for a container the built-ins don't cover, without touching the
    stage; unregistered containers still fail loudly naming the hook."""
    import ray.data as rd

    from record_matching_ray.functions.decoder import default_decoders
    from record_matching_ray.stages.multimodal import sample_frames

    # payload with an unknown container signature
    payloads = [b"FAKE" + bytes(range(64)) * 4, b"FAKE" + b"\x07" * 100]
    media = rd.from_arrow(
        pa.table(
            {
                "media_id": pa.array([1, 2], pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )
    )

    class FakeContainerDecoder:
        """Deterministic frames: one per 32 payload bytes."""

        def decode_frames(self, payload: bytes) -> list:
            return [
                payload[i : i + 32] for i in range(0, len(payload), 32)
            ]

    out = sample_frames(
        media,
        every_n=2,
        max_frames=3,
        decoder_factory=lambda: {
            **default_decoders(),
            "unknown": FakeContainerDecoder(),
        },
    ).to_pandas()
    # media 1: 260 bytes -> 9 frames -> sampled idx 0,2,4; media 2:
    # 104 bytes -> 4 frames -> idx 0,2
    got = sorted(zip(out["media_id"], out["frame_idx"]))
    assert got == [(1, 0), (1, 2), (1, 4), (2, 0), (2, 2)]
    row0 = out[(out["media_id"] == 1) & (out["frame_idx"] == 2)]
    assert bytes(row0["frame_payload"].iloc[0]) == payloads[0][64:96]

    # without the registration the same input fails loudly
    with pytest.raises(Exception, match="no registered decoder"):
        sample_frames(media, fake=False).materialize()
