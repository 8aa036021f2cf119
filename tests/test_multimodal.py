"""Multimodal plumbing: fake codec decode/resize over binary columns."""

import pytest

from methanol_web_crawler_ray.pipelines import multimodal as mm


def test_fake_roundtrip():
    p = mm.fake_encode("image", 64, 48, b"abc")
    kind, a, b, body = mm.fake_decode(p)
    assert (kind, a, b, body) == ("image", 64, 48, b"abc")


def _has_pil() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(_has_pil(), reason="PIL installed: real codec active")
def test_real_codec_stub_without_pil():
    """Without pillow the RealCodec constructor is the documented seam."""
    with pytest.raises(NotImplementedError, match="PIL"):
        mm.RealCodec()


@pytest.mark.skipif(not _has_pil(), reason="pillow not installed")
def test_real_codec_pil_images(ray_session, tmp_path):
    """With pillow present the SAME Ray stages run codec='real' over a
    PNG media table: decode_meta dims, resize round-trip, and the
    decoded-pixel histogram features."""
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq
    from PIL import Image

    ids, kinds, payloads, dims = [], [], [], []
    for i in range(6):
        w, h = 8 + i * 4, 6 + i * 2
        img = Image.new("L", (w, h), color=(i * 37) % 255)
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        ids.append(i)
        kinds.append("image")
        payloads.append(buf.getvalue())
        dims.append((w, h))
    d = str(tmp_path)
    pq.write_table(pa.table(
        {"media_id": ids, "kind": kinds, "payload": payloads},
        schema=mm.MEDIA_SCHEMA), f"{d}/media.parquet")

    meta = {int(r["media_id"]): (r["dim_a"], r["dim_b"])
            for r in mm.media_decode(d, codec="real").take_all()}
    assert meta == {i: (w, h) for i, (w, h) in enumerate(dims)}

    out = str(tmp_path / "resized")
    mm.media_resize(out, d, w=5, h=4, codec="real")
    import pyarrow.dataset as pads

    for p in pads.dataset(out).to_table().column("payload").to_pylist():
        img = Image.open(io.BytesIO(p))
        assert (img.width, img.height) == (5, 4)

    feats = mm.media_features(d, codec="real").take_all()
    per = {}
    for r in feats:
        per.setdefault(int(r["media_id"]), 0)
        per[int(r["media_id"])] += int(r["cnt"])
    # histogram mass == pixel count, per image
    assert per == {i: w * h for i, (w, h) in enumerate(dims)}

    with pytest.raises(Exception):  # ffmpeg seam stays honest
        mm.RealCodec().sample_frames(payloads[0], 4)


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
