"""Host-bucketed page store — the offline analog of the network fetch.

The crawl's "GET" (SURVEY §2 S1/J1: lm_io_get, io.c:391-413) becomes a
keyed lookup into the pages table.  An iterative crawl cannot pre-plan its
joins (the URLs a host's DFS needs mid-round depend on links found
mid-round), so the engine rewrites the pages table ONCE into a
hash(host)-bucketed Parquet layout and does **selective reads**:

* bucket files are written per ``hash(host_norm) % num_buckets`` — at
  cluster scale these are directories of row-group-sized files whose
  locality can follow the same host partitioning as the per-host crawl
  stage (groupby("host") co-location, SURVEY §4 shuffle 2/3);
* a host's turn reads only its host's rows (Parquet filter pushdown on
  the ``host`` column inside one bucket — O(host) IO, not O(table));
* the rewrite itself is a Ray Data pipeline: read_parquet →
  map_batches(derive host/bucket, vectorized) → write_parquet partitioned
  by bucket.  It streams; nothing materializes.

This replaces a per-round frontier⋈pages shuffle join: the frontier side
(one host's queue) is tiny and the pages side never moves after the
one-time bucketing — the same reasoning as broadcast-small-side in
SURVEY §2.5 J1, but for an *iterative, data-dependent* probe pattern.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

from ..functions.urlkit import url_set
from ..pipelines.hostloop import PageRow
from ..state.seen import stable_hash64

STORE_COLUMNS = ["url", "host", "bucket", "status", "location",
                 "content_type", "body"]


def derive_host_batch(tbl: pa.Table, num_buckets: int) -> pa.Table:
    """Vectorized-ish host/bucket derivation for one Arrow batch.  URL
    parsing is the pure-Python canonicalizer kernel per distinct row —
    cheap relative to page payloads; everything else stays Arrow."""
    urls = tbl.column("url").to_pylist()
    hosts = []
    for u in urls:
        parsed = url_set(u)
        hosts.append(parsed.host_norm if parsed is not None else "")
    buckets = [stable_hash64(h) % num_buckets for h in hosts]
    return tbl.append_column("host", pa.array(hosts, pa.string())) \
              .append_column("bucket", pa.array(buckets, pa.int32()))


def build_store(pages_dir: str, out_dir: Optional[str] = None,
                num_buckets: int = 32) -> str:
    """One-time rewrite: pages ⨝ page_meta → host-bucketed store.
    Idempotent (marker file).  Runs as a Ray Data streaming pipeline."""
    import ray.data

    from .._fingerprint import store_fp

    out_dir = out_dir or os.path.join(
        pages_dir, f"store-{num_buckets}-{store_fp()}")
    marker = os.path.join(out_dir, "_DONE")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)

    meta_path = os.path.join(pages_dir, "page_meta.parquet")
    pages_path = os.path.join(pages_dir, "pages.parquet")

    # page_meta is the small side → broadcast it (ray.put once, read in
    # every map task — SURVEY §2.5 J1)
    import ray

    meta_tbl = pads.dataset(meta_path).to_table()
    meta_ref = ray.put(meta_tbl)

    def join_and_bucket(batch: pa.Table) -> pa.Table:
        meta = ray.get(meta_ref)
        # hash-join the broadcast side on url (pyarrow join — zero-copy in)
        joined = batch.select(["url", "html"]).join(
            meta, keys="url", join_type="left outer"
        )
        joined = derive_host_batch(joined, num_buckets)
        status = pc.fill_null(joined.column("status"), 200)
        ctype = pc.fill_null(joined.column("content_type"), "text/html")
        return pa.table(
            {
                "url": joined.column("url"),
                "host": joined.column("host"),
                "bucket": joined.column("bucket"),
                # duplicate of the hive partition key kept IN the files so
                # plain readers (ray.data.read_parquet filters) can prune
                # on it without partition-schema plumbing
                "b": joined.column("bucket"),
                "status": status,
                "location": joined.column("location"),
                "content_type": ctype,
                "body": joined.column("html"),
            }
        )

    ds = ray.data.read_parquet(pages_path, columns=["url", "html"])
    ds = ds.map_batches(join_and_bucket, batch_format="pyarrow",
                        batch_size=1024)
    ds.write_parquet(out_dir, partition_cols=["bucket"])
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir


class HostFetcher:
    """Per-worker fetcher over the bucketed store: loads one host's rows
    on first access (Parquet filter pushdown), LRU-caches a few hosts.
    Instantiated once per map_groups actor (stateful-stage pattern)."""

    def __init__(self, store_dir: str, num_buckets: int = 32,
                 cache_hosts: int = 8):
        self.store_dir = store_dir
        self.num_buckets = num_buckets
        self.cache_hosts = cache_hosts
        self._ds = pads.dataset(store_dir, partitioning="hive")
        self._cache: Dict[str, Dict[str, PageRow]] = {}
        self._order: list = []

    def _load_host(self, host: str) -> Dict[str, PageRow]:
        m = self._cache.get(host)
        if m is not None:
            return m
        b = stable_hash64(host) % self.num_buckets
        tbl = self._ds.to_table(
            filter=(pc.field("bucket") == b) & (pc.field("host") == host)
        )
        m = {}
        for r in tbl.to_pylist():
            m[r["url"]] = PageRow(
                url=r["url"], status=r["status"], location=r["location"],
                content_type=r["content_type"], body=r["body"] or b"",
            )
        self._cache[host] = m
        self._order.append(host)
        while len(self._order) > self.cache_hosts:
            old = self._order.pop(0)
            self._cache.pop(old, None)
        return m

    # Fetcher protocol ----------------------------------------------------

    def get(self, url: str) -> Optional[PageRow]:
        u = url_set(url)
        if u is None:
            return None
        return self._load_host(u.host_norm).get(url)

    def head(self, url: str) -> Optional[str]:
        row = self.get(url)
        return row.content_type if row else None
