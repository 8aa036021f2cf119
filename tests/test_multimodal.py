"""Multimodal plumbing: fake codec decode/resize over binary columns."""

import numpy as np
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


class TestStdlibCodec:
    """StdlibCodec: REAL format decode (BMP/PPM/WAV/PPM-stream) with no
    external libraries — every assertion is against construction-known
    values, never the codec's own output."""

    def test_bmp_roundtrip_and_meta(self):
        import numpy as np

        c = mm.StdlibCodec()
        px = np.arange(6 * 4 * 3, dtype=np.uint8).reshape(4, 6, 3)
        b = c._bmp_encode(px)
        assert b[:2] == b"BM"
        kind, w, h, n = c.decode_meta(b)
        assert (kind, w, h, n) == ("image", 6, 4, 72)
        assert np.array_equal(c._decode_image(b), px)

    def test_ppm_header_grammar(self):
        import numpy as np

        c = mm.StdlibCodec()
        # comments + arbitrary whitespace in the header
        body = bytes(range(2 * 3 * 3))
        raw = b"P6 # cmt\n  2\n# another\n 3\t255\n" + body
        kind, w, h, n = c.decode_meta(raw)
        assert (kind, w, h, n) == ("image", 2, 3, 18)
        assert c._decode_image(raw).shape == (3, 2, 3)
        # P5 grayscale
        g = c._ppm_encode(np.zeros((2, 5), np.uint8))
        assert g[:2] == b"P5" and c.decode_meta(g) == ("image", 5, 2, 10)

    def test_wav_meta_and_features(self):
        import io
        import wave

        import numpy as np

        samples = (np.arange(100, dtype=np.int64) * 31 - 500).astype(np.int16)
        buf = io.BytesIO()
        wf = wave.open(buf, "wb")
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(samples.tobytes())
        wf.close()
        c = mm.StdlibCodec()
        assert c.decode_meta(buf.getvalue()) == ("audio", 8000, 100, 200)
        feat = c.extract_features(buf.getvalue(), 16)
        exp = np.bincount(samples.astype(np.int64) % 16, minlength=16)
        assert np.array_equal(feat, exp) and feat.sum() == 100

    def test_ppm_stream_video(self):
        import numpy as np

        c = mm.StdlibCodec()
        f = [np.full((2, 3, 3), i, np.uint8) for i in range(7)]
        stream = b"".join(c._ppm_encode(x) for x in f)
        assert c.decode_meta(stream) == ("video", 3, 7, 2 * 3 * 3 * 7)
        assert c.sample_frames(stream, 2) == [0, 2, 4, 6]
        # features: histogram over ALL frames' pixels
        feat = c.extract_features(stream, 16)
        assert feat.sum() == 7 * 18
        for i in range(7):
            assert feat[i % 16] >= 18

    def test_resize_preserves_container(self):
        import numpy as np

        c = mm.StdlibCodec()
        px = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
        for enc in (c._bmp_encode, c._ppm_encode):
            out = c.resize_image(enc(px), 4, 2)
            assert out[:2] == enc(px)[:2]  # same container magic
            kind, w, h, _n = c.decode_meta(out)
            assert (kind, w, h) == ("image", 4, 2)
            # nearest-neighbor grid: out[y,x] == px[(y*8)//2? ...] —
            # spot-pin corner pixels against the index formula
            dec = c._decode_image(out)
            assert np.array_equal(dec[0, 0], px[0, 0])
            assert np.array_equal(dec[1, 3], px[(1 * 8) // 2, (3 * 8) // 4])


def test_stdlib_media_pipeline_against_goldens(ray_session):
    """The SAME Ray stages run codec='stdlib' over the real-format media
    table; decode output must equal the construction-derived golden."""
    import pyarrow.parquet as pq

    d = mm.stdlib_media_dir_for()
    got = {int(r["media_id"]): (r["kind"], int(r["dim_a"]),
                                int(r["dim_b"]), int(r["body_len"]))
           for r in mm.media_decode(d, codec="stdlib").take_all()}
    gold = pq.read_table(f"{d}/golden_decode.parquet")
    exp = {int(m): (k, int(a), int(b), int(n))
           for m, k, a, b, n in zip(*[gold.column(c).to_pylist()
                                      for c in ("media_id", "kind", "dim_a",
                                                "dim_b", "body_len")])}
    assert got == exp

    # frame sampling over the video rows: stride grid of the frame count
    frames = {}
    for r in mm.media_frames(d, codec="stdlib", every=2).take_all():
        frames.setdefault(int(r["media_id"]), []).append(int(r["frame_idx"]))
    vids = {m for m, (k, _a, _b, _n) in exp.items() if k == "video"}
    assert set(frames) == vids
    for m, idxs in frames.items():
        assert sorted(idxs) == list(range(0, exp[m][2], 2))

    # features: histogram mass == decoded pixel count (images+video);
    # audio mass == sample count
    import collections

    mass = collections.Counter()
    for r in mm.media_features(d, codec="stdlib").take_all():
        mass[int(r["media_id"])] += int(r["cnt"])
    for m, (k, a, b, n) in exp.items():
        assert mass[m] == (b if k == "audio" else n)


def _has_ffmpeg():
    import shutil

    return bool(shutil.which("ffmpeg") and shutil.which("ffprobe"))


@pytest.mark.skipif(_has_ffmpeg(), reason="ffmpeg installed: codec active")
def test_ffmpeg_codec_honest_seam():
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        mm.FfmpegCodec()


@pytest.mark.skipif(not _has_ffmpeg(), reason="ffmpeg not on PATH")
def test_ffmpeg_codec_agrees_with_stdlib_on_shared_formats():
    """Where ffmpeg exists, the third codec must agree with StdlibCodec
    on the WAV + PPM fixtures it also understands: same meta kinds,
    same integer feature histograms (both decode to the same PCM /
    pixel values), same frame-index sampling."""
    std = mm.StdlibCodec()
    ff = mm.FfmpegCodec()
    rows = mm.gen_stdlib_media_table(12)
    for r in rows:
        payload = r["payload"]
        fmt = payload[:2]
        if fmt == b"BM":        # ffprobe's bmp demuxer is optional
            continue
        kind_s, a_s, b_s, _sz = std.decode_meta(payload)
        kind_f, a_f, b_f, _szf = ff.decode_meta(payload)
        assert kind_f == kind_s
        if kind_s == "audio":
            assert (a_f, b_f) == (a_s, b_s)
            fs = std.extract_features(payload, 64)
            fg = ff.extract_features(payload, 64)
            assert np.array_equal(fs, fg)
        elif kind_s == "video":
            assert b_f == b_s  # frame count
            assert ff.sample_frames(payload, 2) == \
                std.sample_frames(payload, 2)
            assert np.array_equal(std.extract_features(payload, 64),
                                  ff.extract_features(payload, 64))
