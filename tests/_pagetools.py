"""Shared helper: write a custom tiny pages table (pages.parquet +
page_meta.parquet in the FIXTURES.md layout) for crawl-semantics tests
that need hand-built page graphs (redirects, ignore_host, epeek...)."""

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

BASE_TS = 1_600_000_000_000_000


def html(body_fragment: str, title: str = "t") -> bytes:
    return (f"<html><head><title>{title}</title></head>"
            f"<body>{body_fragment}</body></html>").encode()


def write_pages(out_dir: str, rows):
    """rows: iterable of dicts url / body(bytes) / status / location /
    content_type (defaults 200, None, text/html).  Recreates out_dir."""
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    urls, bodies, statuses, locs, ctypes = [], [], [], [], []
    for r in rows:
        urls.append(r["url"])
        bodies.append(r.get("body", b""))
        statuses.append(r.get("status", 200))
        locs.append(r.get("location"))
        ctypes.append(r.get("content_type", "text/html"))
    pq.write_table(
        pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(
                [BASE_TS + i * 1_000_000 for i in range(len(urls))],
                pa.timestamp("us")),
            "html": pa.array(bodies, pa.binary()),
            "text": pa.array([""] * len(urls), pa.string()),
            "lang": pa.array(["en"] * len(urls), pa.string()),
        }),
        os.path.join(out_dir, "pages.parquet"),
    )
    pq.write_table(
        pa.table({
            "url": pa.array(urls, pa.string()),
            "status": pa.array(statuses, pa.int16()),
            "location": pa.array(locs, pa.string()),
            "content_type": pa.array(ctypes, pa.string()),
        }),
        os.path.join(out_dir, "page_meta.parquet"),
    )
    return out_dir


def fetch_dict(pages_dir: str):
    from methanol_web_crawler_ray.sources.pagegen import load_fetch_dict

    return load_fetch_dict(pages_dir)
