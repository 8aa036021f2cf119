"""Standalone vectorized parse/convert stages over the pages store —
the map_batches form of the M5-M11 kernels, independent of any crawl
(corpus-processing building blocks; `__ray_entry__` exposes each as a
query).  All read from the host-bucketed store (sources/pagestore) with
column pruning."""

from __future__ import annotations

import pyarrow as pa


def _store_ds(pages_dir: str, columns):
    import ray.data

    from ..sources.pagestore import build_store

    store = build_store(pages_dir)
    return ray.data.read_parquet(store, columns=columns)


def page_text(pages_dir: str, batch_size: int = 256):
    """(url, text): the utf8conv→entityconv chain (M10/M11) over every
    page — the byte-identity surface vs the golden text column."""
    from ..functions.textconv import extract_text

    def ex(batch: pa.Table) -> pa.Table:
        texts = [
            extract_text(b or b"", c).decode("utf-8", "surrogateescape")
            for b, c in zip(batch.column("body").to_pylist(),
                            batch.column("content_type").to_pylist())
        ]
        return pa.table({"url": batch.column("url"),
                         "text": pa.array(texts, pa.string())})

    return _store_ds(pages_dir, ["url", "content_type", "body"]).map_batches(
        ex, batch_format="pyarrow", batch_size=batch_size
    )


def page_links(pages_dir: str, batch_size: int = 256):
    """(url, link_seq, ref_raw): raw refs in document order per page
    (M5/M6/M7 by content type; only 200-status rows parse)."""
    from ..functions.htmlparse import (extract_css_urls, extract_html_links,
                                       extract_text_urls)

    def ex(batch: pa.Table) -> pa.Table:
        out_url, out_seq, out_ref = [], [], []
        for url, body, ctype, status in zip(
            batch.column("url").to_pylist(),
            batch.column("body").to_pylist(),
            batch.column("content_type").to_pylist(),
            batch.column("status").to_pylist(),
        ):
            if status != 200:
                continue
            body = body or b""
            ct = (ctype or "").split(";")[0]
            if ct == "text/html":
                refs = extract_html_links(body)
            elif ct == "text/css":
                refs = extract_css_urls(body)
            elif ct == "text/plain":
                refs = extract_text_urls(body)
            else:
                refs = []
            for i, ref in enumerate(refs):
                out_url.append(url)
                out_seq.append(i)
                out_ref.append(ref.decode("utf-8", "surrogateescape"))
        return pa.table(
            {
                "url": pa.array(out_url, pa.string()),
                "link_seq": pa.array(out_seq, pa.int32()),
                "ref_raw": pa.array(out_ref, pa.string()),
            }
        )

    return _store_ds(
        pages_dir, ["url", "content_type", "status", "body"]
    ).map_batches(ex, batch_format="pyarrow", batch_size=batch_size)


def page_xmlconv(pages_dir: str, batch_size: int = 256):
    """(url, xhtml): the HTML→XML converter (M9) over html pages."""
    from ..functions.xmlconv import xmlconv

    def conv(batch: pa.Table) -> pa.Table:
        urls, outs = [], []
        for url, body, ctype, status in zip(
            batch.column("url").to_pylist(),
            batch.column("body").to_pylist(),
            batch.column("content_type").to_pylist(),
            batch.column("status").to_pylist(),
        ):
            if status == 200 and (ctype or "").startswith("text/html"):
                urls.append(url)
                # hex string, not binary: DuckDB hands BLOBs back as
                # bytearray and the driver gate's pandas sort crashes on
                # them; and unlike page_text (post-utf8conv) the xmlconv
                # output passes raw page bytes through, so it is not
                # valid UTF-8 and can't be an Arrow string directly
                outs.append(xmlconv(body or b"").hex())
        return pa.table({"url": pa.array(urls, pa.string()),
                         "xhtml": pa.array(outs, pa.string())})

    return _store_ds(
        pages_dir, ["url", "content_type", "status", "body"]
    ).map_batches(conv, batch_format="pyarrow", batch_size=batch_size)


def page_canonicalize_links(pages_dir: str, batch_size: int = 256):
    """(url, link_seq, canon): extraction → resolution end-to-end — the
    M5-M7 extractors chained into the M1-M4 canonicalizer (ue_add's
    dispatch: absolute-path, relative and absolute-URL refs, encodecpy's
    '&amp;'→'&' rule).  Oracled against the generator's by-construction
    golden_canon table."""
    from ..functions.urlkit import resolve, url_set

    def canon(batch: pa.Table) -> pa.Table:
        canons = []
        base_cache = {}
        for url, ref in zip(batch.column("url").to_pylist(),
                            batch.column("ref_raw").to_pylist()):
            base = base_cache.get(url)
            if base is None:
                base = url_set(url)
                base_cache[url] = base
            u = resolve(base, ref) if base is not None else None
            canons.append(u.s if u is not None else None)
        return pa.table({"url": batch.column("url"),
                         "link_seq": batch.column("link_seq"),
                         "canon": pa.array(canons, pa.string())})

    return page_links(pages_dir, batch_size=batch_size).map_batches(
        canon, batch_format="pyarrow"
    )


def page_classify(pages_dir: str, cfg=None, crawler=None,
                  batch_size: int = 1024):
    """(url, filetype): the ftindex decision tree (F1-F4) over page URLs."""
    import ray.data

    from ..config import default_config
    from ..functions.matchkit import DISCARD, FTIndex, POSSIBLE_MATCH
    from ..functions.urlkit import url_set

    cfg = cfg or default_config()
    idx = FTIndex(cfg.crawler(crawler), cfg.filetypes)

    def classify(batch: pa.Table) -> pa.Table:
        out = []
        for u in batch.column("url").to_pylist():
            parsed = url_set(u)
            if parsed is None:
                out.append("invalid")
                continue
            m = idx.match_by_url(parsed)
            out.append("discard" if m is DISCARD
                       else "lookup" if m is POSSIBLE_MATCH else m.name)
        return pa.table({"url": batch.column("url"),
                         "filetype": pa.array(out, pa.string())})

    return ray.data.read_parquet(
        f"{pages_dir}/pages.parquet", columns=["url"]
    ).map_batches(classify, batch_format="pyarrow", batch_size=batch_size)


def host_stats(pages_dir: str, batch_size: int = 1024):
    """(host, n_pages, total_html_bytes, total_text_chars): per-host
    corpus statistics over the pages table — the crawl-planning
    aggregate (host directory sizing, per-host fetch budgets; the
    reference's host directory ``urlengine.c:283-338`` holds exactly
    this cardinality).  One vectorized pyarrow pass (host = URL
    authority, html measured in BYTES, text in unicode chars) with
    in-batch partial aggregation, then a groupby-sum over the partial
    rows — hosts-sized shuffle, never pages-sized."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data

    def partial(batch: pa.Table) -> pa.Table:
        # list_slice+binary_join instead of list_element: a schemeless /
        # relative URL has <3 '/'-segments — list_element would CRASH
        # the pipeline where the oracle's split_part returns '' (the
        # join of the ≤1-element slice reproduces '' exactly)
        host = pc.binary_join(pc.list_slice(
            pc.split_pattern(batch.column("url"), "/"), 2, 3), "")
        t = pa.table({
            "host": host,
            "n_pages": pa.array(np.ones(len(batch), dtype=np.int64)),
            "total_html_bytes": pc.cast(
                pc.binary_length(batch.column("html")), pa.int64()),
            "total_text_chars": pc.cast(
                pc.utf8_length(batch.column("text")), pa.int64()),
        })
        return t.group_by(["host"]).aggregate(
            [("n_pages", "sum"), ("total_html_bytes", "sum"),
             ("total_text_chars", "sum")]).rename_columns(
            ["host", "n_pages", "total_html_bytes", "total_text_chars"])

    ds = ray.data.read_parquet(
        f"{pages_dir}/pages.parquet",
        columns=["url", "html", "text"]).map_batches(
        partial, batch_format="pyarrow", batch_size=batch_size)
    agg = ds.groupby("host").sum(
        ["n_pages", "total_html_bytes", "total_text_chars"])
    from ..pipelines._util import rename

    return rename(agg, {"sum(n_pages)": "n_pages",
                        "sum(total_html_bytes)": "total_html_bytes",
                        "sum(total_text_chars)": "total_text_chars"})
