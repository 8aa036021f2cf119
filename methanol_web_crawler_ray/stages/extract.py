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


def snapshot_latest(pages_dir: str, batch_size: int = 2048):
    """(url, ts_us, n_captures, text_chars): LATEST capture per URL over
    the multi-snapshot captures table (sources/captures.py) — the
    Common-Crawl recrawl dedup every downstream corpus job runs first
    (process each URL once, at its freshest snapshot; the reference's
    nol_url upsert-by-url-hash, mn-slaved/client.c:510-557, is the same
    keep-one-row-per-url contract on the live-crawl side).

    Scale shape: column-pruned read (url, warc_ts, text — html never
    leaves storage), per-batch pandas reduction to ONE row per URL seen
    in the batch (latest ts wins, captures counted), then a
    groupby(url).map_groups over the per-batch partials — the shuffle
    moves at most one ~40-byte row per (url, block), never page bodies.
    Timestamps travel as epoch-microsecond int64 end to end (exact,
    hashable by the driver gate)."""
    import pandas as pd
    import ray.data

    from ..sources.captures import captures_path

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "url": df["url"],
            "ts_us": df["warc_ts"].astype("int64"),
            "text_chars": df["text"].str.len().astype("int64"),
            "n_captures": 1,
        }).sort_values(["url", "ts_us"], kind="mergesort")
        agg = g.groupby("url", sort=False).agg(
            ts_us=("ts_us", "last"), text_chars=("text_chars", "last"),
            n_captures=("n_captures", "sum")).reset_index()
        return agg.astype({"ts_us": "int64", "text_chars": "int64",
                           "n_captures": "int64"})

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        win = df.sort_values("ts_us", kind="mergesort").iloc[-1]
        return pd.DataFrame({
            "url": [df["url"].iloc[0]],
            "ts_us": [int(win["ts_us"])],
            "n_captures": [int(df["n_captures"].sum())],
            "text_chars": [int(win["text_chars"])],
        })

    ds = ray.data.read_parquet(
        captures_path(pages_dir),
        columns=["url", "warc_ts", "text"]).map_batches(
        partial, batch_format="pandas", batch_size=batch_size)
    return ds.groupby("url").map_groups(merge, batch_format="pandas")


def host_freshness(pages_dir: str, batch_size: int = 2048):
    """(host, n_urls, n_captures, first_ts_us, last_ts_us): per-host
    recrawl freshness rollup over the captures table — the crawl
    scheduler's staleness input (which hosts have old last-captures and
    deserve budget; the host-directory cardinality of
    urlengine.c:283-338 keyed by recency instead of size).

    Scale shape: two-stage rollup, both stages keys-only.  Stage 1
    reduces captures to one row per (host, url) — per-batch pandas
    partial then groupby(url).map_groups exact merge (n_captures sum,
    ts min/max); stage 2 folds those per-URL rows per host the same
    way.  Host extraction pads schemeless URLs to '' exactly like the
    oracle's split_part (the host_stats guard)."""
    import pandas as pd
    import ray.data

    from ..sources.captures import captures_path

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        sp = df["url"].str.split("/", n=3, expand=True)
        host = sp[2].fillna("") if 2 in sp.columns else ""
        g = pd.DataFrame({
            "host": host,
            "url": df["url"],
            "ts": df["warc_ts"].astype("int64"),
            "c": 1,
        })
        agg = g.groupby(["host", "url"], sort=False).agg(
            n_captures=("c", "sum"), first_ts=("ts", "min"),
            last_ts=("ts", "max")).reset_index()
        return agg.astype({"n_captures": "int64", "first_ts": "int64",
                           "last_ts": "int64"})

    def merge_url(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "host": [df["host"].iloc[0]],
            "url": [df["url"].iloc[0]],
            "n_captures": [int(df["n_captures"].sum())],
            "first_ts": [int(df["first_ts"].min())],
            "last_ts": [int(df["last_ts"].max())],
        })

    def merge_host(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "host": [df["host"].iloc[0]],
            "n_urls": [int(len(df))],
            "n_captures": [int(df["n_captures"].sum())],
            "first_ts_us": [int(df["first_ts"].min())],
            "last_ts_us": [int(df["last_ts"].max())],
        })

    per_url = ray.data.read_parquet(
        captures_path(pages_dir),
        columns=["url", "warc_ts"]).map_batches(
        partial, batch_format="pandas",
        batch_size=batch_size).groupby("url").map_groups(
        merge_url, batch_format="pandas")
    return per_url.groupby("host").map_groups(
        merge_host, batch_format="pandas")


def snapshot_change_rate(pages_dir: str, batch_size: int = 2048):
    """(url, n_captures, n_versions, changed): per-URL content DRIFT
    across the recrawl history — how many captures exist vs how many
    DISTINCT text versions (md5-keyed) they contain.  The recrawl
    scheduler's other input besides freshness (``host_freshness``): a
    URL whose captures are all byte-identical is static — deprioritize
    it; one that changes every crawl deserves budget (the adaptive
    revisit policy of Cho-Garcia-Molina '03, decided here in exact
    integers).

    Scale shape: page text never shuffles — the per-batch partial
    reduces to DISTINCT (url, md5) rows with a capture count, so the
    groupby(url) merge moves at most one ~50-byte row per (url,
    version, block); version cardinality per URL is bounded by its
    capture count (~monthly crawls), never corpus-sized.  ``changed``
    travels as int64 0/1 (the driver gate's hashable form)."""
    import hashlib

    import numpy as np
    import pandas as pd
    import ray.data

    from ..sources.captures import captures_path

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "url": df["url"],
            "k": [hashlib.md5(t.encode()).hexdigest()
                  for t in df["text"]],
            "c": np.int64(1)})
        agg = g.groupby(["url", "k"], sort=False)["c"].sum().reset_index()
        return agg.astype({"c": "int64"})

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        nv = int(df["k"].nunique())
        return pd.DataFrame({
            "url": [df["url"].iloc[0]],
            "n_captures": [int(df["c"].sum())],
            "n_versions": [nv],
            "changed": [np.int64(1 if nv > 1 else 0)]})

    ds = ray.data.read_parquet(
        captures_path(pages_dir),
        columns=["url", "text"]).map_batches(
        partial, batch_format="pandas", batch_size=batch_size)
    return ds.groupby("url").map_groups(merge, batch_format="pandas")


# ---------------------------------------------------------------------------
# URL-level corpus filtering (RefinedWeb §3.1 / UT1-blocklist style):
# domain-behavior blocklist + URL-shape penalties, the pre-fetch filter
# every web corpus applies before spending bandwidth.  No reference
# counterpart (extends the page_* family).

FARM_MIN_PAGES = 500  # hosts contributing >= this many pages: link farms
URL_PENALTIES = ("private", "?", "cgi-bin")  # literal URL substrings


def url_filter(pages_dir: str, farm_min: int = FARM_MIN_PAGES,
               batch_size: int = 2048):
    """(url, host, is_farm, n_penalties, blocked): flag every URL by
    (a) domain behavior — the host appears on the farm blocklist,
    i.e. contributes >= ``farm_min`` pages (the domain-level spam
    signal UT1-style blocklists encode) — and (b) URL shape — count of
    ``URL_PENALTIES`` literal substrings in the lower-cased URL (query
    strings, private trees, CGI paths; RefinedWeb's soft URL scoring).
    ``blocked`` = farm host OR any penalty.  Host extraction is the
    split_part-parity slice used by host_stats (schemeless URLs map to
    host '').

    Scale shape: pass 1 builds the blocklist with in-batch partial
    counts + a hosts-sized groupby-sum and broadcasts the (small) farm
    set once via ``ray.put``; pass 2 is map-only — vectorized substring
    probes plus one hash-set lookup per row's host.  Nothing
    pages-sized leaves the workers."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    import ray
    import ray.data

    def host_partial(batch: pa.Table) -> pa.Table:
        host = pc.binary_join(pc.list_slice(
            pc.split_pattern(batch.column("url"), "/"), 2, 3), "")
        t = pa.table({
            "host": host,
            "n": pa.array(np.ones(len(batch), dtype=np.int64))})
        return t.group_by(["host"]).aggregate([("n", "sum")]) \
            .rename_columns(["host", "n"])

    counts = ray.data.read_parquet(
        f"{pages_dir}/pages.parquet", columns=["url"]).map_batches(
        host_partial, batch_format="pyarrow", batch_size=batch_size) \
        .groupby("host").sum("n")
    import pyarrow.compute as _pc

    def over_bar(t: pa.Table) -> pa.Table:
        # filter WORKER-side so only blocklist members (hosts over the
        # farm bar — rare by construction) reach the driver, never the
        # full host directory
        return t.filter(_pc.greater_equal(t.column("sum(n)"),
                                          int(farm_min)))

    farm_df = counts.map_batches(
        over_bar, batch_format="pyarrow").to_pandas()
    # an all-filtered dataset can surface as a column-less empty frame
    farm_ref = ray.put(frozenset(
        farm_df["host"]) if "host" in farm_df.columns else frozenset())

    def flag(df: pd.DataFrame, _r=farm_ref) -> pd.DataFrame:
        farm = ray.get(_r)
        parts = df["url"].str.split("/")
        host = parts.map(lambda p: p[2] if len(p) > 2 else "")
        low = df["url"].str.lower()
        npen = sum(low.str.contains(p, regex=False).astype("int64")
                   for p in URL_PENALTIES)
        is_farm = host.isin(farm).astype("int64")
        return pd.DataFrame({
            "url": df["url"], "host": host,
            "is_farm": is_farm, "n_penalties": npen,
            "blocked": ((is_farm > 0) | (npen > 0)).astype("int64")})

    return ray.data.read_parquet(
        f"{pages_dir}/pages.parquet", columns=["url"]).map_batches(
        flag, batch_format="pandas", batch_size=batch_size)


def url_depth_dist(pages_dir: str):
    """(depth, n_pages): histogram of URL path depth (path segments
    after the authority: http://h/a/b.html → 2) over the pages table —
    the crawl-shape audit that picks the depth cutoff O2 enforces
    (deep-tree spider traps show up as a fat tail here).  Schemeless /
    short URLs clamp to 0, matching the oracle's greatest(len-3, 0).

    Scale shape: one vectorized pyarrow pass (split + list length) with
    in-batch partial counts, then a grouped sum over the tiny depth
    domain."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data

    def partial(batch: pa.Table) -> pa.Table:
        nseg = pc.list_value_length(
            pc.split_pattern(batch.column("url"), "/"))
        depth = pc.max_element_wise(
            pc.subtract(pc.cast(nseg, pa.int64()), 3),
            pa.scalar(0, pa.int64()))
        t = pa.table({
            "depth": depth,
            "n_pages": pa.array(np.ones(len(batch), dtype=np.int64))})
        return t.group_by(["depth"]).aggregate(
            [("n_pages", "sum")]).rename_columns(["depth", "n_pages"])

    from ..pipelines._util import rename

    agg = ray.data.read_parquet(
        f"{pages_dir}/pages.parquet", columns=["url"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("depth").sum("n_pages")
    return rename(agg, {"sum(n_pages)": "n_pages"})


def page_anchors(pages_dir: str, batch_size: int = 256):
    """(url, anchor_seq, href_raw, anchor): ``<a>``-tag href + anchor
    text in document order per 200-status html page — the extension
    kernel (htmlparse.extract_anchor_texts; libmetha extracts refs only,
    html.c:334-337).  Oracled against the generator's by-construction
    golden_anchors table."""
    from ..functions.htmlparse import extract_anchor_texts

    def ex(batch: pa.Table) -> pa.Table:
        out_url, out_seq, out_ref, out_txt = [], [], [], []
        for url, body, ctype, status in zip(
            batch.column("url").to_pylist(),
            batch.column("body").to_pylist(),
            batch.column("content_type").to_pylist(),
            batch.column("status").to_pylist(),
        ):
            if status != 200 or (ctype or "").split(";")[0] != "text/html":
                continue
            for i, (href, txt) in enumerate(extract_anchor_texts(body or b"")):
                out_url.append(url)
                out_seq.append(i)
                out_ref.append(href.decode("utf-8", "surrogateescape"))
                out_txt.append(txt.decode("utf-8", "surrogateescape"))
        return pa.table(
            {
                "url": pa.array(out_url, pa.string()),
                "anchor_seq": pa.array(out_seq, pa.int32()),
                "href_raw": pa.array(out_ref, pa.string()),
                "anchor": pa.array(out_txt, pa.string()),
            }
        )

    return _store_ds(
        pages_dir, ["url", "content_type", "status", "body"]
    ).map_batches(ex, batch_format="pyarrow", batch_size=batch_size)


def anchor_text_agg(pages_dir: str, batch_size: int = 256):
    """(target, n_anchors, n_sources, top_anchor): inlink anchor-text
    aggregation per canonical target URL — the classic web-corpus signal
    (anchor text as a target-page description, a training-data staple
    the crawler's link table enables).

    Scale shape: extraction → per-page resolve (M1-M4 kernel) → TWO
    builtin-aggregate groupbys, (target, url) then (target).  Both use
    Sum/Count/Min so Ray Data pre-aggregates per block before the
    shuffle — a hot target (every page links "/") never materializes as
    one giant Python group, unlike a map_groups formulation."""
    from ray.data.aggregate import Count, Min, Sum

    from ..functions.urlkit import resolve, url_set

    def canon(batch: pa.Table) -> pa.Table:
        targets = []
        base_cache = {}
        for url, ref in zip(batch.column("url").to_pylist(),
                            batch.column("href_raw").to_pylist()):
            base = base_cache.get(url)
            if base is None:
                base = url_set(url)
                base_cache[url] = base
            u = resolve(base, ref) if base is not None else None
            targets.append(u.s if u is not None else None)
        t = pa.table({"target": pa.array(targets, pa.string()),
                      "url": batch.column("url"),
                      "anchor": batch.column("anchor")})
        # unresolvable refs drop here (cheaper than a filter stage)
        import pyarrow.compute as pc

        return t.filter(pc.is_valid(t.column("target")))

    ds = page_anchors(pages_dir, batch_size=batch_size).map_batches(
        canon, batch_format="pyarrow"
    )
    per_src = ds.groupby(["target", "url"]).aggregate(
        Count(), Min("anchor"))
    agg = per_src.groupby("target").aggregate(
        Sum("count()"), Count(), Min("min(anchor)"))

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({
            "target": batch.column("target"),
            "n_anchors": batch.column("sum(count())").cast(pa.int64()),
            "n_sources": batch.column("count()").cast(pa.int64()),
            "top_anchor": batch.column("min(min(anchor))"),
        })

    return agg.map_batches(rename, batch_format="pyarrow")


def page_titles(pages_dir: str, batch_size: int = 256):
    """(url, title): the stock ``title`` parser (M15, the scripts/misc.js
    / conf/title.conf analog — first ``<title>…</title>`` content as a
    declared attribute) run distributed through the real parse-chain
    runtime (parsechain.run_chain with an AttrList, worker.c:842-911
    semantics) over every 200-status html page.  Pages without a title
    emit no row.  Oracled against the generator's by-construction
    golden_titles table."""
    from ..functions.parsechain import AttrList, run_chain
    from ..functions.urlkit import url_set

    def ex(batch: pa.Table) -> pa.Table:
        out_url, out_title = [], []
        for url, body, ctype, status in zip(
            batch.column("url").to_pylist(),
            batch.column("body").to_pylist(),
            batch.column("content_type").to_pylist(),
            batch.column("status").to_pylist(),
        ):
            if status != 200 or (ctype or "").split(";")[0] != "text/html":
                continue
            attrs = AttrList(declared=("title",))
            run_chain(("title",), body or b"", url_set(url), ctype,
                      status, attrs, lambda _u: None)
            t = attrs.values.get("title")
            if t is not None:
                out_url.append(url)
                out_title.append(t.decode("utf-8", "surrogateescape"))
        return pa.table({"url": pa.array(out_url, pa.string()),
                         "title": pa.array(out_title, pa.string())})

    return _store_ds(
        pages_dir, ["url", "content_type", "status", "body"]
    ).map_batches(ex, batch_format="pyarrow", batch_size=batch_size)


REDIR_CAP = 20             # abandon on the REDIR_CAP-th redirect
REDIR_DOUBLE_GATE = 200_000  # redirect rows; above → pointer doubling


def redirect_resolve(pages_dir: str, gate: int = REDIR_DOUBLE_GATE,
                     batch_size: int = 4096):
    """(url, final_url, hops): terminal resolution of every redirect row
    (3xx status with a Location) through the redirect map, under the
    reference's 20-redirects-per-chain cap (worker.c:809 increments
    then breaks at ``redirects >= 20``, i.e. a chain is abandoned ON
    its 20th redirect — at most REDIR_CAP - 1 = 19 edges are ever
    followed; applied to the whole stored chain at once instead of per
    fetch).  ``hops`` = number of redirect edges followed to the first
    non-redirect URL; chains needing REDIR_CAP or more edges — and
    loops, which never terminate — emit ``final_url=''`` / ``hops=-1``.

    Scale shape: redirect rows are a small fraction of the corpus
    (~2 % of a Common-Crawl-ish frontier), and resolution touches ONLY
    that subset.  Above the gate it runs POINTER DOUBLING (Wyllie
    list-ranking): ceil(log2(cap)) + 1 = 5 bounded rounds, each one
    co-partitioned exchange of the redirect table keyed by the chased
    pointer — after round r every still-chasing row has advanced
    ≥ 2^r hops, so 5 rounds either terminate a chain or prove it over
    the 20-cap.  Never a per-hop sequential walk, nothing corpus-sized
    on the driver.  Below the gate the same semantics collapse to an
    exact driver chase over the (tiny by construction) edge dict;
    parity between the two paths is pinned by test.
    """
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc
    import ray.data

    def edges(batch: pa.Table) -> pa.Table:
        st = batch.column("status").cast(pa.int32())
        m = pc.and_(
            pc.and_(pc.greater_equal(st, 300), pc.less_equal(st, 399)),
            pc.is_valid(batch.column("location")))
        t = batch.filter(m)
        return pa.table({"u": t.column("url").cast(pa.string()),
                         "cur": t.column("location").cast(pa.string())})

    E = _store_ds(pages_dir, ["url", "status", "location"]).map_batches(
        edges, batch_format="pyarrow", batch_size=batch_size)
    n = E.count()

    if n <= gate:
        df = E.to_pandas()
        nxt = dict(zip(df["u"], df["cur"]))
        finals, hops = [], []
        for u in df["u"]:
            cur, h = nxt[u], 1
            while cur in nxt and h < REDIR_CAP:
                cur, h = nxt[cur], h + 1
            if cur not in nxt and h < REDIR_CAP:
                finals.append(cur)
                hops.append(h)
            else:
                finals.append("")
                hops.append(-1)
        return ray.data.from_arrow(pa.table({
            "url": pa.array(list(df["u"]), pa.string()),
            "final_url": pa.array(finals, pa.string()),
            "hops": pa.array(hops, pa.int64())}))

    # ---- pointer-doubling path ------------------------------------
    # state: u, cur (chased pointer), h (edges accounted), st
    # (0 chasing / 1 resolved / 2 over-cap)
    S = E.map_batches(
        lambda df: pd.DataFrame({
            "u": df["u"], "cur": df["cur"],
            "h": np.int64(1), "st": np.int8(0)}),
        batch_format="pandas", batch_size=batch_size)

    def step(g: pd.DataFrame) -> pd.DataFrame:
        tgt = g[g["role"] == 1]
        out = []
        for p in g[g["role"] == 0].itertuples(index=False):
            if p.st != 0:
                out.append((p.u, p.cur, p.h, p.st))
                continue
            if len(tgt) == 0:           # cur is terminal (not a source)
                out.append((p.u, p.cur, p.h,
                            1 if p.h < REDIR_CAP else 2))
                continue
            t = tgt.iloc[0]
            if t["st"] == 2:            # tail already proven over-cap
                out.append((p.u, p.cur, p.h, 2))
                continue
            h2 = int(p.h) + int(t["h"])
            if h2 >= REDIR_CAP:
                out.append((p.u, t["cur"], h2, 2))
            else:                       # inherit tail state (0 or 1)
                out.append((p.u, t["cur"], h2, int(t["st"])))
        return pd.DataFrame(out, columns=["u", "cur", "h", "st"]) \
            .astype({"h": "int64", "st": "int8"})

    rounds = 1
    while (1 << rounds) <= REDIR_CAP:
        rounds += 1                     # ceil(log2(cap)) + 1
    for _ in range(rounds):
        probes = S.map_batches(
            lambda df: df.assign(
                key=np.where(df["st"] == 0, df["cur"], df["u"]),
                role=np.int8(0)),
            batch_format="pandas", batch_size=batch_size)
        targets = S.map_batches(
            lambda df: df.assign(key=df["u"], role=np.int8(1)),
            batch_format="pandas", batch_size=batch_size)
        S = probes.union(targets).groupby("key").map_groups(
            step, batch_format="pandas")

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        res = df["st"] == 1             # st==0 after rounds ⇒ h ≥ 2^5 > cap
        return pd.DataFrame({
            "url": df["u"],
            "final_url": df["cur"].where(res, ""),
            "hops": df["h"].where(res, -1).astype("int64")})

    return S.map_batches(fin, batch_format="pandas",
                         batch_size=batch_size)


def url_templates(pages_dir: str, batch_size: int = 4096):
    """(host, template, n_urls): per-host URL path templates with digit
    runs collapsed to 'N' — the classic crawler-trap / URL-pattern
    audit (a template whose n_urls explodes relative to its host is a
    calendar/session-id trap; the scheduler caps or drops it).

    Scale shape: map-only vectorized regex (RE2 via Arrow) + in-batch
    partial count, then one (host, template)-keyed groupby-sum whose
    cardinality is the number of distinct TEMPLATES (tiny vs URL
    count) — the same pre-aggregate-then-shuffle shape as ft counters.
    """
    import numpy as np
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        url = batch.column("url")
        host = pc.binary_join(
            pc.list_slice(pc.split_pattern(url, "/"), 2, 3), "")
        path = pc.replace_substring_regex(url, r"^[a-z]+://[^/]*", "")
        path = pc.if_else(pc.equal(path, ""), "/", path)
        tmpl = pc.replace_substring_regex(path, r"[0-9]+", "N")
        t = pa.table({
            "host": host, "template": tmpl,
            "n_urls": pa.array(np.ones(len(batch), dtype=np.int64))})
        return t.group_by(["host", "template"]).aggregate(
            [("n_urls", "sum")]).rename_columns(
            ["host", "template", "n_urls"])

    agg = (_store_ds(pages_dir, ["url"])
           .map_batches(partial, batch_format="pyarrow",
                        batch_size=batch_size)
           .groupby(["host", "template"]).sum("n_urls"))

    def fin(t: pa.Table) -> pa.Table:
        return pa.table({
            "host": t.column("host"),
            "template": t.column("template"),
            "n_urls": pc.cast(t.column("sum(n_urls)"), pa.int64())})

    return agg.map_batches(fin, batch_format="pyarrow")


def page_mirrors(pages_dir: str, batch_size: int = 2048):
    """(text_md5, n_urls, n_hosts, canonical_url): cross-host MIRROR
    detection — page texts that appear verbatim on ≥2 distinct hosts
    (mirror sites / CDNs / boilerplate robots files).  The crawler's
    dedup-by-content audit: a mirror family fetches once, not per host.

    Scale shape: text comes from the live utf8conv→entityconv chain
    (page_text — independently gate-proven byte-identical to golden);
    the shuffle key is md5(text) — 16 bytes per page move, never the
    text; in-batch partial aggregation collapses to one row per
    (digest, host) per batch before the digest-keyed groupby."""
    import hashlib

    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    def keyed(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.not_equal(batch.column("text"), ""))
        url = t.column("url")
        host = pc.binary_join(
            pc.list_slice(pc.split_pattern(url, "/"), 2, 3), "")
        dg = [hashlib.md5(x.encode("utf-8", "surrogateescape")).hexdigest()
              for x in t.column("text").to_pylist()]
        part = pa.table({"dg": pa.array(dg, pa.string()), "host": host,
                         "url": url})
        # collapse to one row per (dg, host) carrying in-batch counts/min
        return part.group_by(["dg", "host"]).aggregate(
            [("url", "count"), ("url", "min")]).rename_columns(
            ["dg", "host", "n_urls", "min_url"])

    def per_digest(g: pd.DataFrame) -> pd.DataFrame:
        nh = g["host"].nunique()
        if nh < 2:
            return pd.DataFrame({
                "text_md5": pd.Series([], dtype=object),
                "n_urls": pd.Series([], dtype="int64"),
                "n_hosts": pd.Series([], dtype="int64"),
                "canonical_url": pd.Series([], dtype=object)})
        return pd.DataFrame({
            "text_md5": [g["dg"].iloc[0]],
            "n_urls": np.array([g["n_urls"].sum()], dtype=np.int64),
            "n_hosts": np.array([nh], dtype=np.int64),
            "canonical_url": [g["min_url"].min()]})

    return (page_text(pages_dir)
            .map_batches(keyed, batch_format="pyarrow",
                         batch_size=batch_size)
            .groupby("dg").map_groups(per_digest, batch_format="pandas"))


REVISIT_DEFAULT_US = 30 * 86_400 * 1_000_000  # never-observed-change cold gap


def revisit_schedule(pages_dir: str, batch_size: int = 2048):
    """(url, n_captures, n_versions, last_ts_us, next_fetch_us): the
    adaptive revisit SCHEDULE the recrawl planner feeds from — the
    integer-exact Cho–Garcia-Molina '03 policy over the captures table:

      changed URLs (>1 distinct text version) refetch after the mean
      observed change interval (span // (n_versions-1));
      multi-capture static URLs back off to 2× the observed span;
      single-capture URLs get the cold default (30 days).

    Scale shape: identical exchange to snapshot_change_rate — per-batch
    partial collapses captures to DISTINCT (url, md5) rows carrying a
    count and a ts min/max, so the groupby(url) merge moves a bounded
    handful of ~60-byte rows per URL, never text."""
    import hashlib

    import numpy as np
    import pandas as pd
    import ray.data

    from ..sources.captures import captures_path

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "url": df["url"],
            "k": [hashlib.md5(t.encode()).hexdigest()
                  for t in df["text"]],
            "ts": df["ts_us"].astype("int64"),
            "c": np.int64(1)})
        agg = g.groupby(["url", "k"], sort=False).agg(
            c=("c", "sum"), lo=("ts", "min"), hi=("ts", "max"))
        return agg.reset_index().astype(
            {"c": "int64", "lo": "int64", "hi": "int64"})

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        nv = int(df["k"].nunique())
        nc = int(df["c"].sum())
        first, last = int(df["lo"].min()), int(df["hi"].max())
        span = last - first
        if nv > 1:
            gap = span // (nv - 1)
        elif nc > 1:
            gap = 2 * span
        else:
            gap = REVISIT_DEFAULT_US
        return pd.DataFrame({
            "url": [df["url"].iloc[0]],
            "n_captures": [np.int64(nc)],
            "n_versions": [np.int64(nv)],
            "last_ts_us": [np.int64(last)],
            "next_fetch_us": [np.int64(last + gap)]})

    def to_us(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            "url": t.column("url"),
            "text": t.column("text"),
            "ts_us": pc.cast(t.column("warc_ts"), pa.int64())})

    ds = ray.data.read_parquet(
        captures_path(pages_dir), columns=["url", "warc_ts", "text"]) \
        .map_batches(to_us, batch_format="pyarrow",
                     batch_size=batch_size) \
        .map_batches(partial, batch_format="pandas",
                     batch_size=batch_size)
    return ds.groupby("url").map_groups(merge, batch_format="pandas")


def snapshot_diff(pages_dir: str, batch_size: int = 1024):
    """(url, ts_us, n_added, n_removed): per-URL LINE-LEVEL deltas
    between consecutive captures — the incremental-indexing signal (an
    updater reprocesses only changed lines, a near-dup pipeline skips
    unchanged spans).  Line identity is md5-per-line on BOTH sides, so
    the DuckDB replay shares collision behavior exactly.

    Scale shape: the map side collapses every capture to its DISTINCT
    line-hash set (≈33 bytes/line, never the text), so the groupby(url)
    exchange moves one bounded hash-set row per capture (per-URL capture
    count ~ crawl cadence, single digits); the per-group diff is a few
    set operations."""
    import hashlib

    import numpy as np
    import pandas as pd
    import ray.data

    from ..sources.captures import captures_path

    def to_sets(df: pd.DataFrame) -> pd.DataFrame:
        # the hash set travels as one comma-joined string column so the
        # shuffle block stays Arrow-encodable
        sets = [
            ",".join(sorted({hashlib.md5(ln.encode()).hexdigest()
                             for ln in t.split("\n")}))
            for t in df["text"]]
        return pd.DataFrame({
            "url": df["url"],
            "ts_us": df["warc_ts"].astype("int64"),
            "ls": sets})

    def diff(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts_us")
        urls, tss, add, rem = [], [], [], []
        prev = None
        for r in g.itertuples(index=False):
            cur = set(r.ls.split(","))
            if prev is not None:
                urls.append(r.url)
                tss.append(int(r.ts_us))
                add.append(len(cur - prev))
                rem.append(len(prev - cur))
            prev = cur
        return pd.DataFrame({
            "url": pd.Series(urls, dtype=object),
            "ts_us": pd.Series(tss, dtype="int64"),
            "n_added": pd.Series(add, dtype="int64"),
            "n_removed": pd.Series(rem, dtype="int64")})

    ds = ray.data.read_parquet(
        captures_path(pages_dir), columns=["url", "warc_ts", "text"]) \
        .map_batches(to_sets, batch_format="pandas",
                     batch_size=batch_size)
    return ds.groupby("url").map_groups(diff, batch_format="pandas")


def cdx_index(pages_dir: str, batch_size: int = 2048):
    """(surt, ts_us, url, digest): CDX-style index records over the
    captures history — the Common-Crawl/IA index format: urlkey is the
    SURT (Sort-friendly URI Reordering Transform — host components
    reversed and comma-joined, then ')' + path) so one host's pages and
    subdomains of one domain sort adjacently; timestamp + content
    digest complete the record.  Downstream consumers range-scan the
    surt order; this op emits the records, the reader sorts/merges
    (emitting pre-sorted runs per block would pin a global sort here —
    that is the consumer's merge, not the builder's).

    Scale shape: map-only — two vectorized regex/split passes plus a
    per-row host-reverse (bounded label count) and an md5 per capture;
    no shuffle at all."""
    import hashlib

    import pandas as pd
    import ray.data

    from ..sources.captures import captures_path

    import re

    scheme_re = re.compile(r"^[a-z]+://[^/]*")

    def rec(df: pd.DataFrame) -> pd.DataFrame:
        surts = []
        digests = []
        for u, t in zip(df["url"], df["text"]):
            parts = u.split("/")
            host = parts[2] if len(parts) > 2 else ""
            path = scheme_re.sub("", u) or "/"
            surts.append(
                ",".join(reversed(host.split("."))) + ")" + path)
            digests.append(hashlib.md5(t.encode()).hexdigest())
        return pd.DataFrame({
            "surt": pd.Series(surts, dtype=object),
            "ts_us": df["warc_ts"].astype("int64"),
            "url": df["url"],
            "digest": pd.Series(digests, dtype=object)})

    return ray.data.read_parquet(
        captures_path(pages_dir),
        columns=["url", "warc_ts", "text"]).map_batches(
        rec, batch_format="pandas", batch_size=batch_size)


FRIENDLY_GET_DELAY_S = 10  # friendly-mode GET spacing (metha.c:71-79)


def host_budget(pages_dir: str, batch_size: int = 2048):
    """(host, n_pages, crawl_delay_s, budget_s): the politeness BUDGET
    planner — per host, how long a single polite worker needs to fetch
    everything: page count × effective inter-GET delay, where the
    delay is the host's robots.txt Crawl-delay floored by the friendly
    mode's 10 s spacing (metha.c:71-79).  The scheduler's input for
    sizing worker counts and spotting makespan-dominating hosts (the
    long-pole host IS the crawl's wall clock under politeness).

    Scale shape: in-batch partial (count + robots-delay extract) →
    hosts-sized groupby merge; nothing page-sized shuffles.

    The delay comes from the REAL robots kernel (``parse_robots``, the
    same path ``robots_audit`` uses) — case-insensitive, per-UA-section
    aware — not a literal regex; the DuckDB oracle replays the
    fixture's canonical ``Crawl-delay: N`` spelling, which the kernel
    parses identically."""
    import numpy as np
    import pandas as pd
    import ray.data

    from ..functions.robots import parse_robots

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        hosts = [u.split("/")[2] if len(u.split("/")) > 2 else ""
                 for u in df["url"]]
        delays = []
        for u, t in zip(df["url"], df["text"]):
            if u.endswith("/robots.txt"):
                delays.append(int(parse_robots(t).crawl_delay or 0))
            else:
                delays.append(0)
        g = pd.DataFrame({"host": hosts, "n": np.int64(1),
                          "delay": pd.Series(delays, dtype="int64")})
        return g.groupby("host", sort=False).agg(
            n=("n", "sum"), delay=("delay", "max")).reset_index()

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        n = int(g["n"].sum())
        d = int(g["delay"].max())
        eff = max(d, FRIENDLY_GET_DELAY_S)
        return pd.DataFrame({
            "host": [g["host"].iloc[0]],
            "n_pages": pd.Series([n], dtype="int64"),
            "crawl_delay_s": pd.Series([d], dtype="int64"),
            "budget_s": pd.Series([n * eff], dtype="int64")})

    return ray.data.read_parquet(
        f"{pages_dir}/pages.parquet", columns=["url", "text"]) \
        .map_batches(partial, batch_format="pandas",
                     batch_size=batch_size) \
        .groupby("host").map_groups(merge, batch_format="pandas")


def boilerplate_stats(pages_dir: str, batch_size: int = 1024):
    """(host, n_pages, n_lines, n_boilerplate): per-host TEMPLATE
    detection — distinct text lines that appear on at least half of the
    host's pages are boilerplate (nav/footer/doctype chrome); the
    content-extraction step strips them before the corpus sees them
    (the host-template counterpart of C4's corpus-wide line dedup).

    Scale shape: lines collapse to md5 keys in the map pass (a page's
    text lives in exactly one row, so in-batch (host,line,url) dedup is
    globally exact); the (host,line)-keyed groupby moves one 16-byte
    key row per distinct line per page.  The ≥50 % threshold needs the
    host's page count — a HOSTS-sized dict broadcast once via ray.put
    (the host-directory precedent), never joined per line at this
    cardinality."""
    import hashlib

    import numpy as np
    import pandas as pd
    import ray
    import ray.data

    def lines(df: pd.DataFrame) -> pd.DataFrame:
        hs, ks = [], []
        for u, t in zip(df["url"], df["text"]):
            if t == "":
                continue
            h = u.split("/")[2] if len(u.split("/")) > 2 else ""
            for ln in set(t.split("\n")):
                hs.append(h)
                ks.append(hashlib.md5(ln.encode()).hexdigest())
        g = pd.DataFrame({"host": pd.Series(hs, dtype=object),
                          "k": pd.Series(ks, dtype=object),
                          "c": np.ones(len(hs), dtype=np.int64)})
        # in-batch partial: pages in one batch share template lines
        return g.groupby(["host", "k"], sort=False)["c"].sum() \
            .reset_index()

    src = ray.data.read_parquet(f"{pages_dir}/pages.parquet",
                                columns=["url", "text"])

    def hostcount(df: pd.DataFrame) -> pd.DataFrame:
        hs = [u.split("/")[2] if len(u.split("/")) > 2 else ""
              for u, t in zip(df["url"], df["text"]) if t != ""]
        g = pd.Series(hs).value_counts()
        return pd.DataFrame({"host": g.index, "n": g.values})

    hp = src.map_batches(hostcount, batch_format="pandas",
                         batch_size=batch_size).to_pandas() \
        .groupby("host")["n"].sum().to_dict()  # hosts-sized
    ref = ray.put(hp)

    lc = src.map_batches(lines, batch_format="pandas",
                         batch_size=batch_size) \
        .groupby(["host", "k"]).sum("c")

    def per_host_partial(df: pd.DataFrame, _r=ref) -> pd.DataFrame:
        npg = ray.get(_r)
        need = df["host"].map(npg).astype("int64")
        boiler = (2 * df["sum(c)"].astype("int64") >= need)
        g = pd.DataFrame({"host": df["host"],
                          "n_lines": np.int64(1),
                          "n_boilerplate": boiler.astype("int64")})
        return g.groupby("host", sort=False).sum().reset_index()

    def fin(g: pd.DataFrame, _r=ref) -> pd.DataFrame:
        npg = ray.get(_r)
        h = g["host"].iloc[0]
        return pd.DataFrame({
            "host": [h],
            "n_pages": pd.Series([int(npg[h])], dtype="int64"),
            "n_lines": pd.Series([int(g["n_lines"].sum())],
                                 dtype="int64"),
            "n_boilerplate": pd.Series(
                [int(g["n_boilerplate"].sum())], dtype="int64")})

    return lc.map_batches(per_host_partial, batch_format="pandas") \
        .groupby("host").map_groups(fin, batch_format="pandas")


CANON_RULES = ("absolute_url", "absolute_path", "relative", "fragment",
               "entity_amp", "dynamic", "dropped")


def canon_rules_audit(pages_dir: str, batch_size: int = 2048):
    """(rule, n_refs): canonicalization-rule audit over every extracted
    ref — how often each M1-M4 rewrite family fires (absolute / 
    absolute-path / relative dispatch, '#fragment' handling, encodecpy's
    '&amp;' decode, '?' dynamic URLs, unresolvable refs).  The
    regression dashboard for the canonicalizer: a rule whose count
    moves between crawler versions flags a behavior change before any
    diff of per-URL output does.

    Scale shape: map-only vectorized classification over the live
    extract→resolve chain, seven-row output via in-batch partials +
    one tiny groupby."""

    def classify(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ref = batch.column("ref_raw")
        is_abs = pc.match_substring_regex(
            ref, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://")
        is_path = pc.and_(pc.invert(is_abs), pc.starts_with(ref, "/"))
        counts = {
            "absolute_url": pc.sum(is_abs).as_py() or 0,
            "absolute_path": pc.sum(is_path).as_py() or 0,
            "relative": batch.num_rows
            - (pc.sum(pc.or_(is_abs, is_path)).as_py() or 0),
            "fragment": pc.sum(pc.match_substring(ref, "#")).as_py() or 0,
            "entity_amp":
                pc.sum(pc.match_substring(ref, "&amp;")).as_py() or 0,
            "dynamic": pc.sum(pc.match_substring(ref, "?")).as_py() or 0,
            "dropped": batch.column("canon").null_count,
        }
        return pa.table({
            "rule": pa.array(list(CANON_RULES), pa.string()),
            "n_refs": pa.array([counts[r] for r in CANON_RULES],
                               pa.int64())})

    # page_canonicalize_links drops ref_raw, so run the same resolve
    # chain here keeping it (identical per-ref results by construction)
    from ..functions.urlkit import resolve, url_set

    def with_raw(batch: pa.Table) -> pa.Table:
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
        return pa.table({"ref_raw": batch.column("ref_raw"),
                         "canon": pa.array(canons, pa.string())})

    return page_links(pages_dir, batch_size=batch_size) \
        .map_batches(with_raw, batch_format="pyarrow") \
        .map_batches(classify, batch_format="pyarrow",
                     batch_size=batch_size) \
        .groupby("rule").sum("n_refs") \
        .map_batches(lambda t: pa.table({
            "rule": t.column("rule"),
            "n_refs": t.column("sum(n_refs)").cast(pa.int64())}),
                     batch_format="pyarrow")


AUDIT_DRIVER_GATE = 200_000  # robots rows; above → keyed co-shuffle


def robots_audit(pages_dir: str, batch_size: int = 2048,
                 gate: int = AUDIT_DRIVER_GATE):
    """(host, n_pages, n_allowed, n_denied): robots COVERAGE audit —
    per host, how much of its corpus the reference's allow-first filter
    (M13: lm_filter_eval_url, src/libmetha/filter.c:34-54, over rules
    parsed per src/libmetha/worker.c:989-1071) lets a compliant crawler
    fetch.  The pre-crawl capacity report: a host whose denied share
    jumps between snapshots changed its robots policy.

    Per-URL verdicts call the REAL kernel (parse_robots +
    Filter.eval_url) — not a reimplementation — so every preserved
    reference quirk (allow-rule hoisting, empty-Disallow deny-all,
    substring User-agent match) is in scope.

    Scale shape: the robots side is hosts-sized — one column-pruned
    suffix-filter scan.  Below ``gate`` robots rows it is parsed once
    on the driver and broadcast via ray.put (fetched once per task,
    never re-shipped per batch); the page side is a map-only in-batch
    partial → hosts-sized groupby merge.  ABOVE the gate nothing
    hosts-sized lands on the driver either: page (host, url) keys and
    robots rows co-shuffle into one groupby(host).map_groups that
    parses each host's robots once and evaluates its URLs in place
    (the crawl engines' co-sharded pattern; parity pinned by test).
    Page text never travels on either path."""
    import pandas as pd
    import pyarrow.compute as pc
    import ray
    import ray.data

    from ..functions.robots import parse_robots
    from ..functions.urlkit import url_set

    def robots_rows(t: pa.Table) -> pa.Table:
        return t.filter(pc.ends_with(t.column("url"), "/robots.txt"))

    robots = ray.data.read_parquet(
        f"{pages_dir}/pages.parquet", columns=["url", "text"]) \
        .map_batches(robots_rows, batch_format="pyarrow").materialize()
    if robots.count() > gate:
        return _robots_audit_large(pages_dir, robots, batch_size)

    per_host = {}
    texts = {}
    for row in robots.take_all():
        parts = row["url"].split("/")
        if len(parts) > 2:
            h = parts[2]
            # duplicate robots rows for one host: parse the
            # lexicographically smallest text — deterministic
            # regardless of row order (the large path agrees)
            if h not in texts or row["text"] < texts[h]:
                texts[h] = row["text"]
    per_host = {h: parse_robots(t) for h, t in texts.items()}
    ref = ray.put(per_host)

    def partial(df: pd.DataFrame, _r=ref) -> pd.DataFrame:
        infos = ray.get(_r)
        counts = {}  # host -> [n, n_allowed]
        for u in df["url"]:
            if u.endswith("/robots.txt"):
                continue
            parts = u.split("/")
            host = parts[2] if len(parts) > 2 else ""
            info = infos.get(host)
            if info is None:
                ok = True
            else:
                parsed = url_set(u)
                ok = parsed is None or info.filter.eval_url(parsed)
            c = counts.setdefault(host, [0, 0])
            c[0] += 1
            c[1] += ok
        return pd.DataFrame({
            "host": list(counts),
            "n": pd.Series([c[0] for c in counts.values()],
                           dtype="int64"),
            "n_ok": pd.Series([c[1] for c in counts.values()],
                              dtype="int64")})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        n = int(g["n"].sum())
        ok = int(g["n_ok"].sum())
        return pd.DataFrame({
            "host": [g["host"].iloc[0]],
            "n_pages": pd.Series([n], dtype="int64"),
            "n_allowed": pd.Series([ok], dtype="int64"),
            "n_denied": pd.Series([n - ok], dtype="int64")})

    return ray.data.read_parquet(
        f"{pages_dir}/pages.parquet", columns=["url"]) \
        .map_batches(partial, batch_format="pandas",
                     batch_size=batch_size) \
        .groupby("host").map_groups(merge, batch_format="pandas")


def _robots_audit_large(pages_dir: str, robots, batch_size: int):
    """>gate robots rows: page (host, url) keys and robots (host, text)
    rows co-shuffle by host; each group parses its robots once and
    evaluates its URLs with the same kernel.  No driver host dict."""
    import pandas as pd
    import ray.data

    from ..functions.robots import parse_robots
    from ..functions.urlkit import url_set

    def rob_tag(t: pa.Table) -> pa.Table:
        hosts, texts = [], []
        for u, txt in zip(t.column("url").to_pylist(),
                          t.column("text").to_pylist()):
            parts = u.split("/")
            if len(parts) > 2:
                hosts.append(parts[2])
                texts.append(txt)
        n = len(hosts)
        return pa.table({
            "host": pa.array(hosts, pa.string()),
            "url": pa.array([""] * n, pa.string()),
            "role": pa.array([1] * n, pa.int8()),
            "rtext": pa.array(texts, pa.string())})

    def page_tag(t: pa.Table) -> pa.Table:
        hosts, urls = [], []
        for u in t.column("url").to_pylist():
            if u.endswith("/robots.txt"):
                continue
            parts = u.split("/")
            hosts.append(parts[2] if len(parts) > 2 else "")
            urls.append(u)
        n = len(urls)
        return pa.table({
            "host": pa.array(hosts, pa.string()),
            "url": pa.array(urls, pa.string()),
            "role": pa.array([0] * n, pa.int8()),
            "rtext": pa.array([""] * n, pa.string())})

    def audit(g: pd.DataFrame) -> pd.DataFrame:
        rb = g.loc[g["role"] == 1, "rtext"]
        info = parse_robots(rb.min()) if len(rb) else None
        urls = g.loc[g["role"] == 0, "url"]
        n = len(urls)
        if n == 0:
            return pd.DataFrame({
                "host": pd.Series([], dtype="object"),
                "n_pages": pd.Series([], dtype="int64"),
                "n_allowed": pd.Series([], dtype="int64"),
                "n_denied": pd.Series([], dtype="int64")})
        if info is None:
            ok = n
        else:
            ok = 0
            for u in urls:
                parsed = url_set(u)
                ok += parsed is None or info.filter.eval_url(parsed)
        return pd.DataFrame({
            "host": [g["host"].iloc[0]],
            "n_pages": pd.Series([n], dtype="int64"),
            "n_allowed": pd.Series([ok], dtype="int64"),
            "n_denied": pd.Series([n - ok], dtype="int64")})

    pages = ray.data.read_parquet(
        f"{pages_dir}/pages.parquet", columns=["url"]) \
        .map_batches(page_tag, batch_format="pyarrow",
                     batch_size=batch_size)
    rob = robots.map_batches(rob_tag, batch_format="pyarrow")
    return pages.union(rob).groupby("host").map_groups(
        audit, batch_format="pandas")


def outlink_stats(pages_dir: str, batch_size: int = 2048):
    """(url, n_refs, n_resolved, n_external, n_dynamic): per-page
    outlink audit over the live extract→resolve chain — how many refs
    each page yields, how many resolve, how many leave the host under
    the reference's host equivalence (M4: lm_url_hostcmp's
    case-insensitive ``www.X ≡ X``, url.c:96-114), and how many are
    '?'-dynamic.  The per-page form of the crawl's external/jail
    decision surface; pages with zero extracted refs yield no row.

    Scale shape: map-only resolve + in-batch per-url partials, then
    one groupby-sum over (url, 4 ints) rows — link rows never shuffle,
    page text never leaves the extract stage."""
    from ..functions.urlkit import hostcmp, resolve, url_set

    def flags(batch: pa.Table) -> pa.Table:
        per_url = {}
        base_cache = {}
        for url, ref in zip(batch.column("url").to_pylist(),
                            batch.column("ref_raw").to_pylist()):
            base = base_cache.get(url)
            if base is None:
                base = url_set(url)
                base_cache[url] = base
            u = resolve(base, ref) if base is not None else None
            c = per_url.setdefault(url, [0, 0, 0, 0])
            c[0] += 1
            if u is not None:
                c[1] += 1
                c[2] += not hostcmp(base, u)
                c[3] += "?" in u.s
        return pa.table({
            "url": pa.array(list(per_url), pa.string()),
            "n_refs": pa.array([c[0] for c in per_url.values()],
                               pa.int64()),
            "n_resolved": pa.array([c[1] for c in per_url.values()],
                                   pa.int64()),
            "n_external": pa.array([c[2] for c in per_url.values()],
                                   pa.int64()),
            "n_dynamic": pa.array([c[3] for c in per_url.values()],
                                  pa.int64())})

    cols = ["n_refs", "n_resolved", "n_external", "n_dynamic"]

    def unwrap(t: pa.Table) -> pa.Table:
        return pa.table(
            {"url": t.column("url"),
             **{c: t.column(f"sum({c})").cast(pa.int64())
                for c in cols}})

    return page_links(pages_dir, batch_size=batch_size) \
        .map_batches(flags, batch_format="pyarrow",
                     batch_size=batch_size) \
        .groupby("url").sum(cols) \
        .map_batches(unwrap, batch_format="pyarrow")


def recrawl_plan(pages_dir: str, batch_size: int = 2048,
                 gate: int = AUDIT_DRIVER_GATE):
    """(url, host, fetch_seq, next_fetch_us, scheduled_us): the
    politeness-aware RECRAWL PLAN — the product of the captures
    family.  Each host's URLs are ordered by their adaptive revisit
    due-time (:func:`revisit_schedule`, Cho–Garcia-Molina integers)
    and scheduled against the host's effective inter-GET delay (robots
    Crawl-delay floored by friendly-mode 10 s, as in
    :func:`host_budget`): a fetch never starts before its due-time
    NOR within the delay of the previous fetch —
    ``sched_i = max(due_i, sched_{i-1} + delay)``.  The recurrence is
    computed in closed form, ``delay·i + runmax(due_j − delay·j)``,
    so both sides are one vectorized running max, integer-exact.

    Scale shape: due-times come from the revisit pipeline (its own
    bounded exchange); delays are hosts-sized — broadcast once via
    ray.put below ``gate`` robots rows, co-shuffled into the plan's
    own groupby(host) as tagged rows above it (no driver host dict;
    parity pinned by test); the plan itself is one groupby(host) with
    an O(n log n) in-group sort — the same per-host partitioning the
    crawl's politeness state already relies on (salt mega-hosts
    upstream)."""
    import numpy as np
    import pandas as pd
    import ray
    import ray.data

    from ..functions.robots import parse_robots

    def robots_rows(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.filter(pc.ends_with(t.column("url"), "/robots.txt"))

    robots = ray.data.read_parquet(
        f"{pages_dir}/pages.parquet", columns=["url", "text"]) \
        .map_batches(robots_rows, batch_format="pyarrow").materialize()
    default_us = FRIENDLY_GET_DELAY_S * 1_000_000
    if robots.count() > gate:
        return _recrawl_plan_large(pages_dir, robots, batch_size,
                                   default_us)

    delays = {}
    for row in robots.take_all():
        parts = row["url"].split("/")
        if len(parts) <= 2:        # hostless URL: nothing to key on
            continue
        # the real robots kernel (see host_budget), not a literal regex
        d = int(parse_robots(row["text"]).crawl_delay or 0)
        v = max(d, FRIENDLY_GET_DELAY_S) * 1_000_000
        prev = delays.get(parts[2])
        # duplicate robots rows for one host: keep the MIN delay —
        # deterministic regardless of row order (the large path agrees)
        delays[parts[2]] = v if prev is None else min(prev, v)
    ref = ray.put(delays)

    def with_host(df: pd.DataFrame, _r=ref) -> pd.DataFrame:
        d = ray.get(_r)
        hosts = [u.split("/")[2] for u in df["url"]]
        return pd.DataFrame({
            "url": df["url"], "host": hosts,
            "next_fetch_us": df["next_fetch_us"].astype("int64"),
            "delay_us": pd.Series(
                [d.get(h, default_us) for h in hosts], dtype="int64")})

    def plan(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["next_fetch_us", "url"],
                          kind="mergesort").reset_index(drop=True)
        n = len(g)
        rn = np.arange(1, n + 1, dtype=np.int64)
        delay = g["delay_us"].to_numpy()
        due = g["next_fetch_us"].to_numpy()
        sched = delay * rn + np.maximum.accumulate(due - delay * rn)
        return pd.DataFrame({
            "url": g["url"], "host": g["host"],
            "fetch_seq": pd.Series(rn, dtype="int64"),
            "next_fetch_us": pd.Series(due, dtype="int64"),
            "scheduled_us": pd.Series(sched, dtype="int64")})

    return revisit_schedule(pages_dir, batch_size=batch_size) \
        .map_batches(with_host, batch_format="pandas",
                     batch_size=batch_size) \
        .groupby("host").map_groups(plan, batch_format="pandas")


def _recrawl_plan_large(pages_dir: str, robots, batch_size: int,
                        default_us: int):
    """>gate robots rows: the per-host delay rides INTO the plan's own
    groupby(host) as a tagged row instead of a driver dict — one extra
    hosts-sized input to the exchange the plan already pays for."""
    import numpy as np
    import pandas as pd

    from ..functions.robots import parse_robots

    def delay_rows(t: pa.Table) -> pd.DataFrame:
        # pandas out like due_rows: the groupby's sort sampler asserts
        # a single block type across the union
        hosts, ds = [], []
        for u, txt in zip(t.column("url").to_pylist(),
                          t.column("text").to_pylist()):
            parts = u.split("/")
            if len(parts) > 2:
                hosts.append(parts[2])
                d = int(parse_robots(txt).crawl_delay or 0)
                ds.append(max(d, default_us // 1_000_000) * 1_000_000)
        return pd.DataFrame({
            "host": pd.Series(hosts, dtype="object"),
            "url": pd.Series([""] * len(hosts), dtype="object"),
            "next_fetch_us": pd.Series([0] * len(hosts), dtype="int64"),
            "delay_us": pd.Series(ds, dtype="int64"),
            "role": pd.Series([1] * len(hosts), dtype="int8")})

    def due_rows(df: pd.DataFrame) -> pd.DataFrame:
        hosts = [u.split("/")[2] for u in df["url"]]
        return pd.DataFrame({
            "host": hosts, "url": df["url"],
            "next_fetch_us": df["next_fetch_us"].astype("int64"),
            "delay_us": pd.Series(np.int64(0), index=df.index),
            "role": pd.Series(np.int8(0), index=df.index)})

    def plan(g: pd.DataFrame) -> pd.DataFrame:
        dl = g.loc[g["role"] == 1, "delay_us"]
        delay_us = int(dl.min()) if len(dl) else default_us
        g = g[g["role"] == 0]
        g = g.sort_values(["next_fetch_us", "url"],
                          kind="mergesort").reset_index(drop=True)
        n = len(g)
        if n == 0:
            return pd.DataFrame({
                "url": pd.Series([], dtype="object"),
                "host": pd.Series([], dtype="object"),
                "fetch_seq": pd.Series([], dtype="int64"),
                "next_fetch_us": pd.Series([], dtype="int64"),
                "scheduled_us": pd.Series([], dtype="int64")})
        rn = np.arange(1, n + 1, dtype=np.int64)
        delay = np.full(n, delay_us, dtype=np.int64)
        due = g["next_fetch_us"].to_numpy()
        sched = delay * rn + np.maximum.accumulate(due - delay * rn)
        return pd.DataFrame({
            "url": g["url"], "host": g["host"],
            "fetch_seq": pd.Series(rn, dtype="int64"),
            "next_fetch_us": pd.Series(due, dtype="int64"),
            "scheduled_us": pd.Series(sched, dtype="int64")})

    import ray.data  # noqa: F401  (revisit_schedule returns a Dataset)

    due = revisit_schedule(pages_dir, batch_size=batch_size) \
        .map_batches(due_rows, batch_format="pandas",
                     batch_size=batch_size)
    dls = robots.map_batches(delay_rows, batch_format="pyarrow")
    return due.union(dls).groupby("host").map_groups(
        plan, batch_format="pandas")


def dup_titles(pages_dir: str, batch_size: int = 2048):
    """(title, n_pages, n_hosts): per-title page and distinct-host
    counts — the duplicate-title audit reads its n_pages ≥ 2 slice
    (cross-host hits are mirror/template candidates next to
    ``mirror_pages``; same-host hits are boilerplate titles), and the
    full rollup doubles as the title-frequency profile.  Titles come
    from the REAL parse-chain ``title`` parser (:func:`page_titles` —
    M15), so quirk coverage is identical.

    Scale shape: in-batch (title, host) dedup partials → one
    title-keyed groupby counting pages and distinct hosts — title keys
    only shuffle, page text never leaves the extract stage."""
    import pandas as pd

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        hosts = [u.split("/")[2] if len(u.split("/")) > 2 else ""
                 for u in df["url"]]
        out = pd.DataFrame({"title": df["title"], "host": hosts,
                            "n": 1})
        return out.groupby(["title", "host"], as_index=False).agg(
            n=("n", "sum"))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        n = int(g["n"].sum())
        return pd.DataFrame({
            "title": [g["title"].iloc[0]],
            "n_pages": pd.Series([n], dtype="int64"),
            "n_hosts": pd.Series([g["host"].nunique()], dtype="int64")})

    return page_titles(pages_dir, batch_size=batch_size) \
        .map_batches(tag, batch_format="pandas") \
        .groupby("title").map_groups(merge, batch_format="pandas")
