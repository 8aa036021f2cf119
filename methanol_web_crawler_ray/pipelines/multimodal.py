"""Multimodal columns — opaque ``binary`` payloads with typed metadata
(prompt requirement: image/audio/video as binary columns; decode /
feature-extract / resize / frame-sample as actor-pool map_batches stages).

Three decode kernels behind one interface:

- ``FakeCodec`` — a deterministic 16-byte-header format we also generate
  (magic, kind, width/height or sample-rate/frames): the oracle-replayable
  default.
- ``StdlibCodec`` — REAL decoding with stdlib + numpy only: BMP and
  PPM/PGM images, WAV PCM audio (``wave``), and concatenated-PPM streams
  (ffmpeg's ``-f image2pipe -vcodec ppm`` output) as video.  Runs — and
  is driver-gated — in this container.
- ``RealCodec`` — PIL-backed images when pillow is installed; the
  ffmpeg audio/video seam stays a documented NotImplementedError.
- ``FfmpegCodec`` — REAL audio/video/image decode through the ffmpeg /
  ffprobe CLIs when they are on PATH (never in this container — the
  pytest is skip-gated; the plumbing is the deployment path).

Everything Ray-side — schema, batch sizing for large binary cells, actor
signature, output layout — is identical across the three.

Scale note: binary payloads can be MBs per row → stages here use SMALL
``batch_size`` and ``large_binary`` columns (SURVEY §7 "very wide rows"),
and payload-preserving stages write partitioned Parquet rather than
returning data to the driver.
"""

from __future__ import annotations

import os
import struct
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

MAGIC = b"MWC0"
KINDS = ("image", "audio", "video")

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),
        ("payload", pa.large_binary()),
    ]
)


def fake_encode(kind: str, a: int, b: int, body: bytes) -> bytes:
    """16-byte header: MAGIC | kind_id u16 | a u32 | b u32 | len u16."""
    kid = KINDS.index(kind)
    return MAGIC + struct.pack("<HIIH", kid, a, b, len(body) & 0xFFFF) + body


def fake_decode(payload: bytes):
    if payload[:4] != MAGIC:
        raise ValueError("bad magic")
    kid, a, b, _ln = struct.unpack("<HIIH", payload[4:16])
    return KINDS[kid], a, b, payload[16:]


FEAT_DIM = 16  # byte-histogram buckets for the feature-extract stage
FRAME_EVERY = 4  # frame-sample stride


def gen_media_table(n: int = 64):
    """Deterministic synthetic media table (index arithmetic, no RNG).
    Returns (media, golden_decode, golden_features, golden_frames): the
    generator KNOWS each payload's metadata, body formula and frame
    grid, so every expected output is emitted by construction (computed
    from the generation arithmetic, never by calling the codec) — each
    stage is then a genuine end-to-end check, not a self-comparison."""
    ids, kinds, payloads = [], [], []
    g_a, g_b, g_len = [], [], []
    f_ids, f_buckets, f_cnts = [], [], []
    fr_ids, fr_idx = [], []
    for i in range(n):
        kind = KINDS[i % 3]
        if kind == "image":
            a, b = 64 + (i % 8) * 32, 48 + (i % 5) * 24  # w, h
            body_vals = [(i + j) % 251 for j in range(a * 2)]
        elif kind == "audio":
            a, b = 16000, 100 + i  # rate, frames
            body_vals = [(i * 3 + j) % 251 for j in range(256)]
        else:
            a, b = 24, 30 + i  # fps, frames
            body_vals = [(i * 7 + j) % 251 for j in range(512)]
        body = bytes(body_vals)
        ids.append(i)
        kinds.append(kind)
        payloads.append(fake_encode(kind, a, b, body))
        g_a.append(a)
        g_b.append(b)
        g_len.append(len(body))
        # feature golden: byte histogram folded to FEAT_DIM buckets,
        # derived from the body FORMULA (independent of the codec)
        hist = [0] * FEAT_DIM
        for v in body_vals:
            hist[v % FEAT_DIM] += 1
        for bk, c in enumerate(hist):
            f_ids.append(i)
            f_buckets.append(bk)
            f_cnts.append(c)
        # frame golden: every FRAME_EVERY-th frame of each video
        if kind == "video":
            for fi in range(0, b, FRAME_EVERY):
                fr_ids.append(i)
                fr_idx.append(fi)
    media = pa.table({"media_id": ids, "kind": kinds, "payload": payloads},
                     schema=MEDIA_SCHEMA)
    golden = pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "kind": pa.array(kinds, pa.string()),
        "dim_a": pa.array(g_a, pa.int64()),
        "dim_b": pa.array(g_b, pa.int64()),
        "body_len": pa.array(g_len, pa.int64()),
    })
    golden_features = pa.table({
        "media_id": pa.array(f_ids, pa.int64()),
        "bucket": pa.array(f_buckets, pa.int64()),
        "cnt": pa.array(f_cnts, pa.int64()),
    })
    golden_frames = pa.table({
        "media_id": pa.array(fr_ids, pa.int64()),
        "frame_idx": pa.array(fr_idx, pa.int64()),
    })
    return media, golden, golden_features, golden_frames


def media_dir_for(base: str = "/tmp/mwc_media", n: int = 64) -> str:
    import pyarrow.parquet as pq

    out = os.path.join(base, f"{n}-v3")
    marker = os.path.join(out, "_DONE")
    if not os.path.exists(marker):
        os.makedirs(out, exist_ok=True)
        media, golden, golden_features, golden_frames = gen_media_table(n)
        pq.write_table(media, os.path.join(out, "media.parquet"))
        pq.write_table(golden, os.path.join(out, "golden_decode.parquet"))
        pq.write_table(golden_features,
                       os.path.join(out, "golden_features.parquet"))
        pq.write_table(golden_frames,
                       os.path.join(out, "golden_frames.parquet"))
        open(marker, "w").write("ok")
    return out


class FakeCodec:
    """Deterministic decode kernel (the fake behind the real plumbing)."""

    def decode_meta(self, payload: bytes):
        kind, a, b, body = fake_decode(payload)
        return kind, a, b, len(body)

    def resize_image(self, payload: bytes, w: int, h: int) -> bytes:
        kind, _a, _b, body = fake_decode(payload)
        if kind != "image":
            raise ValueError("not an image")
        # deterministic fake: re-encode header with new dims, truncate body
        return fake_encode("image", w, h, body[: w * 2])

    def sample_frames(self, payload: bytes, every: int):
        kind, fps, frames, _body = fake_decode(payload)
        if kind != "video":
            raise ValueError("not a video")
        return list(range(0, frames, every))

    def extract_features(self, payload: bytes, dim: int):
        """Byte-histogram pseudo-embedding (integer counts — where a
        real model's forward pass would slot in)."""
        _kind, _a, _b, body = fake_decode(payload)
        return np.bincount(np.frombuffer(body, np.uint8) % dim,
                           minlength=dim).astype(np.int64)


class RealCodec:
    """The real decode kernel.  Images go through PIL when it is
    installed (detected at construction — once per actor, the expensive
    import/codec load); audio/video remain an honest documented seam
    (ffmpeg/torchaudio are not import-detectable cheaply and are never
    present in this container).  Same interface as FakeCodec, so every
    Ray stage takes ``codec="real"`` unchanged."""

    def __init__(self):
        try:
            from PIL import Image  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "RealCodec requires PIL (pillow) — not available in this "
                "environment; use FakeCodec (same interface)"
            ) from e
        from PIL import Image as _Image

        self._Image = _Image

    def _open(self, payload: bytes):
        import io

        try:
            img = self._Image.open(io.BytesIO(payload))
            img.load()
            return img
        except Exception as e:
            raise NotImplementedError(
                "RealCodec decodes images only (PIL); audio/video decode "
                "requires ffmpeg — not available in this environment"
            ) from e

    def decode_meta(self, payload: bytes):
        img = self._open(payload)
        return "image", int(img.width), int(img.height), len(payload)

    def resize_image(self, payload: bytes, w: int, h: int) -> bytes:
        import io

        img = self._open(payload).resize((int(w), int(h)))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    def sample_frames(self, payload: bytes, every: int):
        raise NotImplementedError(
            "video frame sampling requires ffmpeg — not available in "
            "this environment; use FakeCodec (same interface)"
        )

    def extract_features(self, payload: bytes, dim: int):
        """Grayscale pixel-value histogram folded to ``dim`` buckets —
        the deterministic integer analog of FakeCodec's byte histogram,
        over DECODED pixels instead of raw body bytes."""
        img = self._open(payload).convert("L")
        px = np.asarray(img, dtype=np.uint8).ravel()
        return np.bincount(px % dim, minlength=dim).astype(np.int64)


class StdlibCodec:
    """REAL decode with the standard library + numpy only — no PIL, no
    ffmpeg, runnable in this container.  Formats (sniffed per payload by
    magic bytes):

    - BMP: BITMAPINFOHEADER, uncompressed (BI_RGB) 24-bit RGB or 8-bit
      grayscale, top-down or bottom-up (the classic Windows DIB layout).
    - PPM/PGM: binary P6 (RGB) / P5 (gray), maxval <= 255, with the
      full whitespace-and-#-comment header token grammar.
    - WAV: PCM via the stdlib ``wave`` module (rate + frame count +
      16-bit sample access).
    - Video: a CONCATENATED-PPM stream — byte-for-byte the format
      ffmpeg emits with ``-f image2pipe -vcodec ppm`` — parsed frame by
      frame; >1 frame in one payload classifies the payload as video.

    Same interface as FakeCodec/RealCodec: every Ray stage takes
    ``codec="stdlib"`` unchanged.  ``decode_meta`` returns
    (kind, dim_a, dim_b, body_len) with image→(w, h), audio→(rate,
    nframes), video→(w, n_frames); body_len is the decoded payload's
    pixel/sample byte count (not the container size)."""

    # ---- PPM / PGM ----------------------------------------------------
    @staticmethod
    def _ppm_header(buf: bytes, off: int):
        """Parse a P6/P5 header starting at ``off``; returns
        (channels, w, h, data_off).  Implements the real token grammar:
        tokens separated by whitespace, ``#`` comments run to EOL."""
        magic = buf[off:off + 2]
        if magic not in (b"P6", b"P5"):
            raise ValueError("not a binary PPM/PGM")
        ch = 3 if magic == b"P6" else 1
        pos = off + 2
        vals = []
        while len(vals) < 3:
            while pos < len(buf) and buf[pos:pos + 1].isspace():
                pos += 1
            if buf[pos:pos + 1] == b"#":
                while pos < len(buf) and buf[pos] != 0x0A:
                    pos += 1
                continue
            start = pos
            while pos < len(buf) and not buf[pos:pos + 1].isspace():
                pos += 1
            vals.append(int(buf[start:pos]))
        if vals[2] > 255:
            raise ValueError("maxval > 255 unsupported")
        return ch, vals[0], vals[1], pos + 1  # single whitespace after maxval

    @classmethod
    def _ppm_frames(cls, buf: bytes):
        """Split a (possibly concatenated) PPM/PGM stream into frames:
        [(channels, w, h, data_off, data_len), ...]."""
        frames, off = [], 0
        while off < len(buf):
            ch, w, h, doff = cls._ppm_header(buf, off)
            dlen = ch * w * h
            if doff + dlen > len(buf):
                raise ValueError("truncated PPM frame")
            frames.append((ch, w, h, doff, dlen))
            off = doff + dlen
        if not frames:
            raise ValueError("empty PPM stream")
        return frames

    @staticmethod
    def _ppm_encode(px: np.ndarray) -> bytes:
        h, w = px.shape[:2]
        if px.ndim == 3:
            return b"P6 %d %d 255\n" % (w, h) + px.astype(np.uint8).tobytes()
        return b"P5 %d %d 255\n" % (w, h) + px.astype(np.uint8).tobytes()

    # ---- BMP ----------------------------------------------------------
    @staticmethod
    def _bmp_decode(b: bytes) -> np.ndarray:
        if b[:2] != b"BM":
            raise ValueError("not a BMP")
        data_off = struct.unpack_from("<I", b, 10)[0]
        w, h = struct.unpack_from("<ii", b, 18)
        bpp = struct.unpack_from("<H", b, 28)[0]
        comp = struct.unpack_from("<I", b, 30)[0]
        if comp != 0 or bpp not in (8, 24):
            raise ValueError("only uncompressed 8/24-bit BMP supported")
        bottom_up, h = h > 0, abs(h)
        stride = ((w * bpp // 8) + 3) & ~3
        raw = np.frombuffer(b, np.uint8, count=stride * h,
                            offset=data_off).reshape(h, stride)
        if bpp == 24:
            px = raw[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR→RGB
        else:
            px = raw[:, :w]
        return px[::-1].copy() if bottom_up else px.copy()

    @staticmethod
    def _bmp_encode(px: np.ndarray) -> bytes:
        """24-bit bottom-up BI_RGB (grayscale input is expanded)."""
        if px.ndim == 2:
            px = np.repeat(px[:, :, None], 3, axis=2)
        h, w = px.shape[:2]
        stride = ((w * 3) + 3) & ~3
        rows = np.zeros((h, stride), np.uint8)
        rows[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # RGB→BGR
        data = rows.tobytes()
        hdr = (b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
               + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                             len(data), 2835, 2835, 0, 0))
        return hdr + data

    # ---- WAV ----------------------------------------------------------
    @staticmethod
    def _wav_open(b: bytes):
        import io
        import wave

        return wave.open(io.BytesIO(b), "rb")

    # ---- sniff + interface --------------------------------------------
    def _sniff(self, payload: bytes) -> str:
        if payload[:2] == b"BM":
            return "bmp"
        if payload[:2] in (b"P6", b"P5"):
            return "ppm"
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            return "wav"
        raise ValueError("unrecognized payload (BMP/PPM/WAV supported)")

    def decode_meta(self, payload: bytes):
        fmt = self._sniff(payload)
        if fmt == "bmp":
            px = self._bmp_decode(payload)
            return "image", int(px.shape[1]), int(px.shape[0]), int(px.size)
        if fmt == "wav":
            wf = self._wav_open(payload)
            return ("audio", int(wf.getframerate()), int(wf.getnframes()),
                    int(wf.getnframes() * wf.getsampwidth()
                        * wf.getnchannels()))
        frames = self._ppm_frames(payload)
        ch, w, h, _off, dlen = frames[0]
        if len(frames) > 1:  # concatenated stream = video
            return "video", int(w), len(frames), dlen * len(frames)
        return "image", int(w), int(h), int(dlen)

    def _decode_image(self, payload: bytes) -> np.ndarray:
        fmt = self._sniff(payload)
        if fmt == "bmp":
            return self._bmp_decode(payload)
        if fmt == "wav":
            raise ValueError("not an image")
        ch, w, h, off, dlen = self._ppm_frames(payload)[0]
        px = np.frombuffer(payload, np.uint8, count=dlen, offset=off)
        return px.reshape(h, w, ch) if ch == 3 else px.reshape(h, w)

    def resize_image(self, payload: bytes, w: int, h: int) -> bytes:
        """Nearest-neighbor resample (pure numpy index grid), re-encoded
        in the SAME container family (BMP stays BMP, PPM/PGM stays
        PPM/PGM)."""
        fmt = self._sniff(payload)
        px = self._decode_image(payload)
        sh, sw = px.shape[:2]
        yi = (np.arange(h) * sh) // h
        xi = (np.arange(w) * sw) // w
        out = px[yi][:, xi]
        return self._bmp_encode(out) if fmt == "bmp" else self._ppm_encode(out)

    def sample_frames(self, payload: bytes, every: int):
        frames = self._ppm_frames(payload)
        if len(frames) < 2:
            raise ValueError("not a video (single-frame payload)")
        return list(range(0, len(frames), every))

    def extract_features(self, payload: bytes, dim: int):
        """Integer histogram over DECODED content: pixel values for
        images and video (all frames), 16-bit PCM samples mod ``dim``
        for audio — the deterministic stand-in for a model forward."""
        fmt = self._sniff(payload)
        if fmt == "wav":
            wf = self._wav_open(payload)
            raw = wf.readframes(wf.getnframes())
            samples = np.frombuffer(raw, np.int16).astype(np.int64)
            return np.bincount(samples % dim, minlength=dim).astype(np.int64)
        if fmt == "bmp":
            vals = self._bmp_decode(payload).ravel()
        else:
            vals = np.concatenate([
                np.frombuffer(payload, np.uint8, count=dlen, offset=off)
                for _ch, _w, _h, off, dlen in self._ppm_frames(payload)])
        return np.bincount(vals.astype(np.int64) % dim,
                           minlength=dim).astype(np.int64)


class FfmpegCodec:
    """Audio/video/image decode through the ffmpeg + ffprobe CLIs —
    the deployment-grade kernel behind the same 4-method interface
    (decode once per payload, the CLI handles are per-actor state via
    construction-time probing).  Raises NotImplementedError when the
    binaries are absent (this container), exactly like RealCodec
    without PIL; the skip-gated pytest drives it wherever ffmpeg
    exists.  Conventions match StdlibCodec so the two agree on the
    shared WAV / PPM fixtures: features are integer histograms over
    decoded samples/pixels mod ``dim``; resized images re-encode as
    PPM."""

    def __init__(self):
        import shutil as _sh

        self._ffmpeg = _sh.which("ffmpeg")
        self._ffprobe = _sh.which("ffprobe")
        if not (self._ffmpeg and self._ffprobe):
            raise NotImplementedError(
                "FfmpegCodec requires ffmpeg + ffprobe on PATH — not "
                "available in this environment; use StdlibCodec/"
                "FakeCodec (same interface)")

    def _run(self, argv, payload: bytes) -> bytes:
        import subprocess

        r = subprocess.run(argv, input=payload, capture_output=True)
        if r.returncode != 0:
            raise ValueError(
                f"{argv[0]} failed: {r.stderr[-300:].decode('latin-1')}")
        return r.stdout

    def _probe(self, payload: bytes) -> dict:
        import json as _json

        out = self._run([self._ffprobe, "-v", "error", "-show_streams",
                         "-show_format", "-count_frames",
                         "-of", "json", "-i", "pipe:0"], payload)
        return _json.loads(out)

    @staticmethod
    def _stream(info: dict, kind: str) -> Optional[dict]:
        for st in info.get("streams", []):
            if st.get("codec_type") == kind:
                return st
        return None

    def decode_meta(self, payload: bytes):
        info = self._probe(payload)
        v = self._stream(info, "video")
        a = self._stream(info, "audio")
        if v is not None:
            frames = int(v.get("nb_read_frames") or 1)
            w, h = int(v.get("width", 0)), int(v.get("height", 0))
            if frames > 1:
                return "video", w, frames, frames * w * h * 3
            return "image", w, h, w * h * 3
        if a is not None:
            rate = int(a.get("sample_rate", 0))
            frames = int(a.get("nb_read_frames") or 0) or int(
                float(info.get("format", {}).get("duration", 0)) * rate)
            ch = int(a.get("channels", 1))
            return "audio", rate, frames, frames * 2 * ch
        raise ValueError("no decodable stream")

    def resize_image(self, payload: bytes, w: int, h: int) -> bytes:
        return self._run(
            [self._ffmpeg, "-v", "error", "-i", "pipe:0",
             "-vf", f"scale={int(w)}:{int(h)}:flags=neighbor",
             "-frames:v", "1", "-f", "image2", "-vcodec", "ppm",
             "pipe:1"], payload)

    def sample_frames(self, payload: bytes, every: int):
        info = self._probe(payload)
        v = self._stream(info, "video")
        frames = int(v.get("nb_read_frames") or 0) if v else 0
        if frames < 2:
            raise ValueError("not a video (single-frame payload)")
        return list(range(0, frames, every))

    def extract_features(self, payload: bytes, dim: int):
        info = self._probe(payload)
        if self._stream(info, "video") is not None:
            raw = self._run(
                [self._ffmpeg, "-v", "error", "-i", "pipe:0",
                 "-f", "rawvideo", "-pix_fmt", "rgb24", "pipe:1"],
                payload)
            vals = np.frombuffer(raw, np.uint8).astype(np.int64)
        else:
            raw = self._run(
                [self._ffmpeg, "-v", "error", "-i", "pipe:0",
                 "-f", "s16le", "-acodec", "pcm_s16le", "pipe:1"],
                payload)
            vals = np.frombuffer(raw, np.int16).astype(np.int64)
        return np.bincount(vals % dim, minlength=dim).astype(np.int64)


_CODECS = {"fake": FakeCodec, "real": RealCodec, "stdlib": StdlibCodec,
           "ffmpeg": FfmpegCodec}


def make_codec(name: str):
    return _CODECS[name]()


def gen_stdlib_media_table(n: int = 48):
    """Deterministic REAL-format media table: BMP + PPM images, WAV PCM
    audio, concatenated-PPM video streams.  Goldens are computed from
    the generation arithmetic (never by calling the codec), so the
    stdlib decode path is a genuine end-to-end check."""
    import io
    import wave

    codec = StdlibCodec()  # encoders only (pure functions of the array)
    ids, kinds, payloads = [], [], []
    g_a, g_b, g_len = [], [], []
    for i in range(n):
        slot = i % 4
        if slot == 0:  # BMP 24-bit
            w, h = 8 + (i % 5) * 4, 6 + (i % 3) * 4
            px = ((np.arange(h * w * 3, dtype=np.int64) * (i + 7)) % 256
                  ).astype(np.uint8).reshape(h, w, 3)
            payloads.append(codec._bmp_encode(px))
            kinds.append("image")
            g_a.append(w)
            g_b.append(h)
            g_len.append(h * w * 3)
        elif slot == 1:  # P6 PPM
            w, h = 10 + (i % 4) * 3, 5 + (i % 6)
            px = ((np.arange(h * w * 3, dtype=np.int64) * (i + 3) + 11) % 256
                  ).astype(np.uint8).reshape(h, w, 3)
            payloads.append(codec._ppm_encode(px))
            kinds.append("image")
            g_a.append(w)
            g_b.append(h)
            g_len.append(h * w * 3)
        elif slot == 2:  # WAV PCM 16-bit mono
            rate, frames = 8000, 64 + i * 2
            samples = (((np.arange(frames, dtype=np.int64) * (i + 1) * 257)
                        % 20001) - 10000).astype(np.int16)
            buf = io.BytesIO()
            wf = wave.open(buf, "wb")
            wf.setnchannels(1)
            wf.setsampwidth(2)
            wf.setframerate(rate)
            wf.writeframes(samples.tobytes())
            wf.close()
            payloads.append(buf.getvalue())
            kinds.append("audio")
            g_a.append(rate)
            g_b.append(frames)
            g_len.append(frames * 2)
        else:  # concatenated-PPM video stream
            w, h = 6 + (i % 3) * 2, 4 + (i % 2) * 2
            nf = 3 + (i % 5)
            stream = b"".join(
                codec._ppm_encode(
                    ((np.arange(h * w * 3, dtype=np.int64) * (i + fi + 2))
                     % 256).astype(np.uint8).reshape(h, w, 3))
                for fi in range(nf))
            payloads.append(stream)
            kinds.append("video")
            g_a.append(w)
            g_b.append(nf)
            g_len.append(h * w * 3 * nf)
        ids.append(i)
    media = pa.table({"media_id": ids, "kind": kinds, "payload": payloads},
                     schema=MEDIA_SCHEMA)
    golden = pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "kind": pa.array(kinds, pa.string()),
        "dim_a": pa.array(g_a, pa.int64()),
        "dim_b": pa.array(g_b, pa.int64()),
        "body_len": pa.array(g_len, pa.int64()),
    })
    return media, golden


def stdlib_media_dir_for(base: str = "/tmp/mwc_media_stdlib",
                         n: int = 48) -> str:
    import pyarrow.parquet as pq

    out = os.path.join(base, f"{n}-v1")
    marker = os.path.join(out, "_DONE")
    if not os.path.exists(marker):
        os.makedirs(out, exist_ok=True)
        media, golden = gen_stdlib_media_table(n)
        pq.write_table(media, os.path.join(out, "media.parquet"))
        pq.write_table(golden, os.path.join(out, "golden_decode.parquet"))
        open(marker, "w").write("ok")
    return out


class DecodeMeta:
    """Actor-pool stage: codec constructed ONCE per actor (the expensive
    model/codec load in real deployments), per-batch decode after."""

    def __init__(self, codec_name: str = "fake"):
        self.codec = make_codec(codec_name)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        kinds, dim_a, dim_b, body_len = [], [], [], []
        for p in payloads:
            k, a, b, ln = self.codec.decode_meta(p)
            kinds.append(k)
            dim_a.append(a)
            dim_b.append(b)
            body_len.append(ln)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "kind": pa.array(kinds, pa.string()),
                "dim_a": pa.array(dim_a, pa.int64()),
                "dim_b": pa.array(dim_b, pa.int64()),
                "body_len": pa.array(body_len, pa.int64()),
            }
        )


def media_decode(media_dir: Optional[str] = None, codec: str = "fake"):
    """(media_id, kind, dim_a, dim_b, body_len) — the decode/metadata
    stage over the media table.  batch_size is small on purpose (binary
    cells)."""
    import ray.data

    media_dir = media_dir or media_dir_for()
    ds = ray.data.read_parquet(os.path.join(media_dir, "media.parquet"))
    return ds.map_batches(
        DecodeMeta, fn_constructor_args=(codec,), batch_format="pyarrow",
        # autoscaling pool (min, max): codec state is genuinely per-actor
        # (a real PIL/ffmpeg handle), but a pinned size starves at 32 cpus
        batch_size=16, concurrency=(2, 16), num_cpus=1,
    )


class ExtractFeatures:
    """Actor-pool feature-extract stage (the "model inference" slot):
    codec/model loaded once per actor, per-batch batched extraction.
    Output is LONG-FORM (media_id, bucket, cnt) int64 rows — flat
    columns hash cleanly at the driver gate, and at scale a long-form
    feature table feeds the ANN ops directly."""

    def __init__(self, dim: int = FEAT_DIM, codec_name: str = "fake"):
        self.codec = make_codec(codec_name)
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out_ids, out_buckets, out_cnts = [], [], []
        for mid, p in zip(ids, payloads):
            feat = self.codec.extract_features(p, self.dim)
            out_ids.extend([mid] * self.dim)
            out_buckets.extend(range(self.dim))
            out_cnts.extend(int(c) for c in feat)
        return pa.table({
            "media_id": pa.array(out_ids, pa.int64()),
            "bucket": pa.array(out_buckets, pa.int64()),
            "cnt": pa.array(out_cnts, pa.int64()),
        })


def media_features(media_dir: Optional[str] = None, codec: str = "fake",
                   dim: int = FEAT_DIM):
    """(media_id, bucket, cnt) — the feature-extract stage over every
    payload (image/audio/video alike: bytes in, vector out)."""
    import ray.data

    media_dir = media_dir or media_dir_for()
    ds = ray.data.read_parquet(os.path.join(media_dir, "media.parquet"))
    return ds.map_batches(
        ExtractFeatures, fn_constructor_args=(dim, codec),
        batch_format="pyarrow", batch_size=16, concurrency=(2, 16),
        num_cpus=1,
    )


class SampleFrames:
    """Actor-pool frame-sample stage: every ``every``-th frame index of
    each video payload (a real codec would emit the frame bytes; the
    index grid is the part the goldens pin)."""

    def __init__(self, every: int = FRAME_EVERY, codec_name: str = "fake"):
        self.codec = make_codec(codec_name)
        self.every = every

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_ids, out_idx = [], []
        for mid, kind, p in zip(
            batch.column("media_id").to_pylist(),
            batch.column("kind").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            if kind != "video":
                continue
            for fi in self.codec.sample_frames(p, self.every):
                out_ids.append(mid)
                out_idx.append(fi)
        return pa.table({
            "media_id": pa.array(out_ids, pa.int64()),
            "frame_idx": pa.array(out_idx, pa.int64()),
        })


def media_frames(media_dir: Optional[str] = None, codec: str = "fake",
                 every: int = FRAME_EVERY):
    """(media_id, frame_idx) — frame sampling over the video rows."""
    import ray.data

    media_dir = media_dir or media_dir_for()
    ds = ray.data.read_parquet(os.path.join(media_dir, "media.parquet"))
    return ds.map_batches(
        SampleFrames, fn_constructor_args=(every, codec),
        batch_format="pyarrow", batch_size=16, concurrency=(2, 16),
        num_cpus=1,
    )


class ResizeImages:
    def __init__(self, w: int, h: int, codec_name: str = "fake"):
        self.codec = make_codec(codec_name)
        self.w, self.h = w, h

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_ids, out_payloads = [], []
        for mid, kind, payload in zip(
            batch.column("media_id").to_pylist(),
            batch.column("kind").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            if kind != "image":
                continue
            out_ids.append(mid)
            out_payloads.append(self.codec.resize_image(payload, self.w, self.h))
        return pa.table(
            {
                "media_id": pa.array(out_ids, pa.int64()),
                "payload": pa.array(out_payloads, pa.large_binary()),
            }
        )


def media_resize(out_dir: str, media_dir: Optional[str] = None,
                 w: int = 32, h: int = 32, codec: str = "fake"):
    """Payload-rewriting stage → partitioned Parquet sink (payloads never
    return to the driver)."""
    import ray.data

    media_dir = media_dir or media_dir_for()
    ds = ray.data.read_parquet(os.path.join(media_dir, "media.parquet"))
    out = ds.map_batches(
        ResizeImages, fn_constructor_args=(w, h, codec),
        batch_format="pyarrow",
        batch_size=16, concurrency=(2, 16),
    )
    out.write_parquet(out_dir)
    return out_dir
