"""Multimodal columns — opaque ``binary`` payloads with typed metadata
(prompt requirement: image/audio/video as binary columns; decode /
feature-extract / resize / frame-sample as actor-pool map_batches stages).

No image/audio libraries exist in this container, so the DECODE KERNEL is
either a deterministic fake (``FakeCodec``: a 16-byte header we also
generate — magic, kind, width/height or sample-rate/frames) or a
clearly-marked stub raising NotImplementedError (``RealCodec``) where
PIL/ffmpeg would slot in.  Everything Ray-side — schema, batch sizing for
large binary cells, actor signature, output layout — is real and tested.

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


def gen_media_table(n: int = 64):
    """Deterministic synthetic media table (index arithmetic, no RNG).
    Returns (media, golden_decode): the generator KNOWS each payload's
    metadata, so the expected decode output is emitted by construction —
    the decode stage is then a genuine end-to-end check, not a
    self-comparison."""
    ids, kinds, payloads = [], [], []
    g_a, g_b, g_len = [], [], []
    for i in range(n):
        kind = KINDS[i % 3]
        if kind == "image":
            a, b = 64 + (i % 8) * 32, 48 + (i % 5) * 24  # w, h
            body = bytes((i + j) % 251 for j in range(a * 2))
        elif kind == "audio":
            a, b = 16000, 100 + i  # rate, frames
            body = bytes((i * 3 + j) % 251 for j in range(256))
        else:
            a, b = 24, 30 + i  # fps, frames
            body = bytes((i * 7 + j) % 251 for j in range(512))
        ids.append(i)
        kinds.append(kind)
        payloads.append(fake_encode(kind, a, b, body))
        g_a.append(a)
        g_b.append(b)
        g_len.append(len(body))
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


def media_dir_for(base: str = "/tmp/mwc_media", n: int = 64) -> str:
    import pyarrow.parquet as pq

    out = os.path.join(base, f"{n}-v2")
    marker = os.path.join(out, "_DONE")
    if not os.path.exists(marker):
        os.makedirs(out, exist_ok=True)
        media, golden = gen_media_table(n)
        pq.write_table(media, os.path.join(out, "media.parquet"))
        pq.write_table(golden, os.path.join(out, "golden_decode.parquet"))
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


class RealCodec:
    """Where PIL / torchaudio / ffmpeg would plug in (not in container)."""

    def decode_meta(self, payload: bytes):
        raise NotImplementedError(
            "real media decoding requires PIL/ffmpeg — not available in "
            "this environment; use FakeCodec (same interface)"
        )

    resize_image = decode_meta
    sample_frames = decode_meta


class DecodeMeta:
    """Actor-pool stage: codec constructed ONCE per actor (the expensive
    model/codec load in real deployments), per-batch decode after."""

    def __init__(self, codec_name: str = "fake"):
        self.codec = FakeCodec() if codec_name == "fake" else RealCodec()

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


class ResizeImages:
    def __init__(self, w: int, h: int, codec_name: str = "fake"):
        self.codec = FakeCodec() if codec_name == "fake" else RealCodec()
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
                 w: int = 32, h: int = 32):
    """Payload-rewriting stage → partitioned Parquet sink (payloads never
    return to the driver)."""
    import ray.data

    media_dir = media_dir or media_dir_for()
    ds = ray.data.read_parquet(os.path.join(media_dir, "media.parquet"))
    out = ds.map_batches(
        ResizeImages, fn_constructor_args=(w, h), batch_format="pyarrow",
        batch_size=16, concurrency=(2, 16),
    )
    out.write_parquet(out_dir)
    return out_dir
