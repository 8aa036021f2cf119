"""Order-free bulk crawl (BFS) — the throughput path.

The rounds engine (crawl.py) reproduces the reference's per-host DFS
ordering and politeness exactly; when a pipeline only needs the crawl's
OUTPUTS (visited set, extracted links/text/targets) — e.g. corpus
refresh / training-data harvesting over a frozen pages table — ordering
inside a host is irrelevant and the whole crawl collapses into the
classic Ray Data shape (SURVEY.md §3.5):

  frontier_d ⋈ pages                 # J1: hash join (Dataset.join) or a
                                     #     selective bucketed-store read
  → map_batches(ParseExtract)        # M1-M11 + F1-F4 in one vectorized
                                     #   pass over Arrow batches
  → seen anti-join (sharded actor pool, batched per block)  # T1/J2
  → robots filter (per-host compiled rules, broadcast via ray.put)  # M13/J3
  → frontier_{d+1}; targets/texts stream to Parquet sinks   # S8-S10

Differences from the ordered engine, by design:
  * no politeness budgets or per-host sequencing — all hosts in parallel,
    every depth level is one wave (pure BFS);
  * seen-set winners under concurrency are nondeterministic, but the
    visited SET equals the ordered engine's set whenever the link graph
    is crawled to the same depth with no budget truncation (tested);
  * per-filetype counters count unique bound URLs (duplicates are
    anti-joined away before classification re-runs).

This is the benchmark headline: pages parsed/s and frontier URLs/s.
"""

from __future__ import annotations

import pickle
import time
from typing import Dict, List, Optional, Sequence

import pyarrow as pa
import pyarrow.compute as pc

from ..config import EngineConfig
from ..functions.matchkit import DISCARD, FTIndex, POSSIBLE_MATCH
from ..functions.parsechain import AttrList, parse_chain_spec, run_chain
from ..functions.robots import parse_robots
from ..functions.urlkit import URL, resolve, url_set
from ..state.seen import shard_of
from .hostloop import url_hash
from .simulator import plan_seed_hosts

LINK_SCHEMA = pa.schema(
    [
        ("url", pa.string()),          # canonical child URL
        ("host", pa.string()),         # normalized host
        ("seen_key", pa.string()),
        ("depth", pa.int32()),
        ("filetype", pa.string()),
        ("is_external", pa.bool_()),
    ]
)

PAGE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("depth", pa.int32()),
        ("filetype", pa.string()),
        ("text", pa.large_binary()),
        ("title", pa.large_binary()),
        ("url_hash", pa.string()),
        ("n_links", pa.int32()),
    ]
)


class ParseExtract:
    """Stateful map_batches stage: ftindex + parser chains compiled once
    per actor (__init__), then vectorized batch work (__call__).

    One pass per page: canonicalize (M1/M2), run the filetype's parser
    chain (M5-M11) collecting raw refs, resolve + classify every ref
    (F1-F4), emit a link table and a page table."""

    def __init__(self, cfg_blob: bytes, crawler: Optional[str], depth: int):
        self.cfg: EngineConfig = pickle.loads(cfg_blob)
        cr = self.cfg.crawlers[crawler or self.cfg.default_crawler]
        self.crawler = cr
        self.idx = FTIndex(cr, self.cfg.filetypes)
        self.depth = depth

    def classify(self, u: URL):
        ft = self.idx.match_by_url(u)
        if ft is POSSIBLE_MATCH:
            return None  # MIME lookup deferred — bulk mode drops (F2 note)
        return ft

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        bodies = batch.column("body").to_pylist()
        ctypes = batch.column("content_type").to_pylist()
        statuses = batch.column("status").to_pylist()

        link_rows: Dict[str, list] = {f.name: [] for f in LINK_SCHEMA}
        page_rows: Dict[str, list] = {f.name: [] for f in PAGE_SCHEMA}

        for url, body, ctype, status in zip(urls, bodies, ctypes, statuses):
            base = url_set(url)
            if base is None:
                continue
            ft = self.classify(base)
            if ft in (DISCARD, None) or not ft.has_parser:
                continue
            if status is not None and 300 <= status < 400:
                continue  # redirects handled by the ordered engine
            refs: List[bytes] = []
            attrs = AttrList(ft.attributes)
            chain = parse_chain_spec(ft.parser)
            buf = run_chain(chain, body or b"", base, ctype, status or 200,
                            attrs, refs.append)

            n_links = 0
            local = set()
            for ref in refs:
                u = resolve(base, ref)
                if u is None:
                    continue
                cft = self.classify(u)
                if cft in (DISCARD, None):
                    continue
                key = u.seen_key
                if key in local:
                    continue  # in-page dedup (ue_add first-wins)
                local.add(key)
                link_rows["url"].append(u.s)
                link_rows["host"].append(u.host_norm)
                link_rows["seen_key"].append(key)
                link_rows["depth"].append(self.depth + 1)
                link_rows["filetype"].append(cft.name)
                link_rows["is_external"].append(bool(u.is_external))
                n_links += 1

            page_rows["url"].append(url)
            page_rows["host"].append(base.host_norm)
            page_rows["depth"].append(self.depth)
            page_rows["filetype"].append(ft.name)
            page_rows["text"].append(buf)
            page_rows["title"].append(attrs.values.get("title"))
            page_rows["url_hash"].append(url_hash(url))
            page_rows["n_links"].append(n_links)

        links = pa.table(link_rows, schema=LINK_SCHEMA)
        pages = pa.table(page_rows, schema=PAGE_SCHEMA)
        # one output stream: links carry null text; pages carry null seen_key
        return pa.table(
            {
                "kind": pa.array(
                    ["link"] * links.num_rows + ["page"] * pages.num_rows
                ),
                "url": pa.concat_arrays(
                    [links.column("url").combine_chunks(),
                     pages.column("url").combine_chunks()]
                ),
                "host": pa.concat_arrays(
                    [links.column("host").combine_chunks(),
                     pages.column("host").combine_chunks()]
                ),
                "depth": pa.concat_arrays(
                    [links.column("depth").combine_chunks(),
                     pages.column("depth").combine_chunks()]
                ),
                "seen_key": pa.concat_arrays(
                    [links.column("seen_key").combine_chunks(),
                     pa.nulls(pages.num_rows, pa.string())]
                ),
                "filetype": pa.concat_arrays(
                    [links.column("filetype").combine_chunks(),
                     pages.column("filetype").combine_chunks()]
                ),
                "is_external": pa.concat_arrays(
                    [links.column("is_external").combine_chunks(),
                     pa.nulls(pages.num_rows, pa.bool_())]
                ),
                "text": pa.concat_arrays(
                    [pa.nulls(links.num_rows, pa.large_binary()),
                     pages.column("text").combine_chunks()]
                ),
                "title": pa.concat_arrays(
                    [pa.nulls(links.num_rows, pa.large_binary()),
                     pages.column("title").combine_chunks()]
                ),
                "url_hash": pa.concat_arrays(
                    [pa.nulls(links.num_rows, pa.string()),
                     pages.column("url_hash").combine_chunks()]
                ),
            }
        )


class SeenFilter:
    """Batched anti-join against the sharded seen pool (T1/J2): one RPC
    per touched shard per block."""

    def __init__(self, actors):
        self.actors = actors
        self.n = len(actors)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        hosts = batch.column("host").to_pylist()
        keys = batch.column("seen_key").to_pylist()
        by_shard: Dict[int, List[int]] = {}
        for i, h in enumerate(hosts):
            by_shard.setdefault(shard_of(h, self.n), []).append(i)
        futs = {
            s: self.actors[s].try_add_ordered.remote([keys[i] for i in idxs])
            for s, idxs in by_shard.items()
        }
        mask = [False] * batch.num_rows
        for s, idxs in by_shard.items():
            for i, ok in zip(idxs, ray.get(futs[s])):
                mask[i] = ok
        return batch.filter(pa.array(mask))


class RobotsFilter:
    """Per-host robots rules, compiled once from the broadcast robots map
    (M13/J3: broadcast-small-side instead of a shuffle join)."""

    def __init__(self, robots_ref, user_agent: str):
        import ray

        raw: Dict[str, str] = ray.get(robots_ref)
        self.filters = {
            h: parse_robots(body, user_agent).filter for h, body in raw.items()
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        hosts = batch.column("host").to_pylist()
        mask = []
        for url, host in zip(urls, hosts):
            f = self.filters.get(host)
            if f is None:
                mask.append(True)
                continue
            u = url_set(url)
            mask.append(bool(u) and f.eval_url(u))
        return batch.filter(pa.array(mask))


def load_robots_map(store_dir: str) -> Dict[str, str]:
    """All /robots.txt rows → {host: body} (fetched once per host, S6)."""
    import pyarrow.dataset as pads

    d = pads.dataset(store_dir, partitioning="hive")
    tbl = d.to_table(
        filter=pc.match_substring(pc.field("url"), "/robots.txt"),
        columns=["url", "host", "body"],
    )
    out = {}
    for r in tbl.to_pylist():
        if r["url"] == f"http://{r['host']}/robots.txt":
            out[r["host"]] = (r["body"] or b"").decode("utf-8", "surrogateescape")
    return out


def crawl_bfs(
    cfg: EngineConfig,
    pages_dir: str,
    seeds: Sequence[str],
    crawler: Optional[str] = None,
    *,
    out_dir: str,
    depth_limit: Optional[int] = None,
    num_shards: int = 8,
    seen_mode: str = "exact",
    num_buckets: int = 32,
    concurrency: Optional[int] = None,
    batch_size: int = 256,
    use_robots: bool = True,
) -> Dict[str, float]:
    """Run the BFS bulk crawl; writes pages/links Parquet per depth under
    out_dir and returns throughput stats."""
    import os

    import ray
    import ray.data

    from ..sources.pagestore import build_store
    from ..state.seen import make_seen_pool

    t0 = time.time()
    store_dir = build_store(pages_dir, num_buckets=num_buckets)
    cfg_blob = pickle.dumps(cfg)
    cr = cfg.crawlers[crawler or cfg.default_crawler]
    depth_limit = depth_limit if depth_limit is not None else cr.depth_limit
    pool = make_seen_pool(num_shards=num_shards, mode=seen_mode)

    robots_ref = None
    if use_robots and cr.robotstxt:
        robots_ref = ray.put(load_robots_map(store_dir))

    # seed frontier (registered in the seen set like ue_add_initial)
    seed_urls = []
    for h, urls in plan_seed_hosts(cfg, seeds, crawler).items():
        for u in urls:
            parsed = url_set(u if "://" in u else "http://" + u)
            if parsed is not None:
                seed_urls.append((parsed.s, parsed.host_norm, parsed.seen_key))
    for s, h, k in seed_urls:
        pool.try_add_batch(h, [k])

    frontier = pa.table(
        {
            "url": [s for s, _h, _k in seed_urls],
            "host": [h for _s, h, _k in seed_urls],
            "depth": pa.array([0] * len(seed_urls), pa.int32()),
        }
    )

    stats = {"pages_parsed": 0, "links_extracted": 0, "frontier_urls": len(seed_urls)}
    store_ds_path = store_dir

    depth = 0
    while frontier.num_rows and depth < depth_limit:
        # J1: frontier ⋈ pages — selective bucketed read with filter
        # pushdown (urls of this wave only leave storage)
        import pyarrow.dataset as pads

        buckets = sorted(
            {shard_of(h, num_buckets) for h in
             frontier.column("host").to_pylist()}
        )
        url_set_filter = pc.field("url").isin(frontier.column("url"))
        fetched = ray.data.read_parquet(
            store_ds_path,
            filter=(pc.field("b").isin(buckets)) & url_set_filter,
            columns=["url", "status", "content_type", "body"],
        )

        parsed = fetched.map_batches(
            ParseExtract,
            fn_constructor_args=(cfg_blob, crawler, depth),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
            num_cpus=1,
        )
        parsed = parsed.materialize()

        pages_out = parsed.filter(lambda r: r["kind"] == "page")
        pages_out.select_columns(
            ["url", "host", "depth", "filetype", "text", "title", "url_hash"]
        ).write_parquet(os.path.join(out_dir, f"pages/depth={depth}"))
        n_pages = pages_out.count()

        links = parsed.filter(lambda r: r["kind"] == "link")
        if not cr.external:
            links = links.filter(lambda r: not r["is_external"])
        n_links = links.count()

        fresh = links.map_batches(
            SeenFilter, fn_constructor_args=(pool.actors,),
            batch_format="pyarrow", concurrency=min(4, num_shards),
            num_cpus=0.5,
        )
        if robots_ref is not None:
            fresh = fresh.map_batches(
                RobotsFilter, fn_constructor_args=(robots_ref, cfg.user_agent),
                batch_format="pyarrow", concurrency=2, num_cpus=0.5,
            )
        frontier_tbl = fresh.select_columns(["url", "host", "depth"]) \
                            .to_arrow_refs()
        import ray as _ray

        parts = [t for t in _ray.get(frontier_tbl) if t.num_rows]
        frontier = (pa.concat_tables(parts) if parts
                    else pa.table({"url": pa.array([], pa.string()),
                                   "host": pa.array([], pa.string()),
                                   "depth": pa.array([], pa.int32())}))

        stats["pages_parsed"] += n_pages
        stats["links_extracted"] += n_links
        stats["frontier_urls"] += frontier.num_rows
        depth += 1

    stats["elapsed_sec"] = time.time() - t0
    stats["pages_per_sec"] = stats["pages_parsed"] / max(stats["elapsed_sec"], 1e-9)
    stats["frontier_urls_per_sec"] = (
        stats["frontier_urls"] / max(stats["elapsed_sec"], 1e-9)
    )
    stats["seen_size"] = pool.size()
    pool.shutdown()
    return stats
