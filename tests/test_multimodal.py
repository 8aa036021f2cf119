"""Multimodal plumbing: fake codec decode/resize over binary columns."""

import pytest

from methanol_web_crawler_ray.pipelines import multimodal as mm


def test_fake_roundtrip():
    p = mm.fake_encode("image", 64, 48, b"abc")
    kind, a, b, body = mm.fake_decode(p)
    assert (kind, a, b, body) == ("image", 64, 48, b"abc")


def test_real_codec_is_stubbed():
    with pytest.raises(NotImplementedError):
        mm.RealCodec().decode_meta(b"x")


def test_media_decode_pipeline(ray_session):
    rows = mm.media_decode().take_all()
    assert len(rows) == 64
    kinds = {r["kind"] for r in rows}
    assert kinds == {"image", "audio", "video"}
    for r in rows:
        if r["kind"] == "image":
            assert r["dim_a"] >= 64 and r["dim_b"] >= 48
        assert r["body_len"] > 0


def test_media_resize_pipeline(ray_session, tmp_path):
    out = mm.media_resize(str(tmp_path / "resized"), w=32, h=32)
    import pyarrow.dataset as pads

    tbl = pads.dataset(out).to_table()
    assert tbl.num_rows > 0
    for payload in tbl.column("payload").to_pylist():
        kind, a, b, _ = mm.fake_decode(payload)
        assert (kind, a, b) == ("image", 32, 32)


def test_media_features_pipeline(ray_session):
    rows = mm.media_features().take_all()
    # 64 media x FEAT_DIM long-form rows
    assert len(rows) == 64 * mm.FEAT_DIM
    # per-media counts sum to the body length
    import collections

    sums = collections.Counter()
    for r in rows:
        sums[int(r["media_id"])] += int(r["cnt"])
    meta = {int(r["media_id"]): int(r["body_len"])
            for r in mm.media_decode().take_all()}
    assert dict(sums) == meta


def test_media_frames_pipeline(ray_session):
    rows = mm.media_frames().take_all()
    assert len(rows) > 0
    metas = {int(r["media_id"]): (r["kind"], int(r["dim_b"]))
             for r in mm.media_decode().take_all()}
    got = {}
    for r in rows:
        got.setdefault(int(r["media_id"]), []).append(int(r["frame_idx"]))
    for mid, idxs in got.items():
        kind, frames = metas[mid]
        assert kind == "video"
        assert sorted(idxs) == list(range(0, frames, mm.FRAME_EVERY))
    # every video sampled
    assert set(got) == {m for m, (k, _f) in metas.items() if k == "video"}
