"""Order-free bulk crawl (BFS) — the throughput path.

The rounds engine (crawl.py) reproduces the reference's per-host DFS
ordering and politeness exactly; when a pipeline only needs the crawl's
OUTPUTS (visited set, extracted links/text/targets) — e.g. corpus
refresh / training-data harvesting over a frozen pages table — ordering
inside a host is irrelevant and the whole crawl collapses into the
classic Ray Data shape (SURVEY.md §3.5):

  frontier_d ⋈ pages                  # J1 — the frontier is broadcast
                                      #   (ray.put once per wave) and each
                                      #   store block filters itself with a
                                      #   vectorized Arrow is_in; the pages
                                      #   side never moves
  → parse/extract/classify            # M1-M11 + F1-F4, one fused pass
  → seen anti-join (sharded actors)   # T1/J2, batched per block
  → robots filter (broadcast rules)   # M13/J3
  → frontier_{d+1}; pages stream to Parquet sinks          # S8-S10

Performance notes (measured against the first implementation):
  * ONE fused map_batches per wave (filter+parse+classify+seen+robots)
    instead of four chained stages — one execution, one materialize;
  * plain TASK UDFs with process-level caches (ftindex, robots filters,
    frontier set) instead of actor pools — Ray reuses worker processes, so
    the cache is warm and there is no per-wave actor startup;
  * the store is read from Parquet once and kept materialized in the
    object store across waves (zero-copy blocks, spillable).

Differences from the ordered engine, by design: no politeness budgets or
per-host sequencing (all hosts in parallel, one wave per depth); seen-set
winners under concurrency are nondeterministic but the visited SET equals
the ordered engine's set when crawled to the same depth with no budget
truncation (tested); redirects and fetch-misses are skipped, not visited.
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

OUT_SCHEMA = pa.schema(
    [
        ("kind", pa.string()),  # 'link' (frontier candidate) | 'page'
        ("url", pa.string()),
        ("host", pa.string()),
        ("depth", pa.int32()),
        ("seen_key", pa.string()),
        ("filetype", pa.string()),
        ("is_external", pa.bool_()),
        ("text", pa.large_binary()),
        ("title", pa.large_binary()),
        ("url_hash", pa.string()),
    ]
)

# process-level caches: Ray reuses worker processes across tasks, so
# these survive waves without actor pools
_CTX_CACHE: Dict = {}


def _get_ctx(cfg_blob: bytes, crawler: Optional[str]):
    key = (cfg_blob, crawler)
    ctx = _CTX_CACHE.get(key)
    if ctx is None:
        cfg: EngineConfig = pickle.loads(cfg_blob)
        cr = cfg.crawlers[crawler or cfg.default_crawler]
        ctx = (cfg, cr, FTIndex(cr, cfg.filetypes))
        _CTX_CACHE[key] = ctx
    return ctx


_REF_CACHE: Dict = {}


def _get_ref(ref):
    import ray

    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    v = _REF_CACHE.get(key)
    if v is None:
        v = ray.get(ref)
        _REF_CACHE[key] = v
        if len(_REF_CACHE) > 8:
            _REF_CACHE.pop(next(iter(_REF_CACHE)))
    return v


_ROBOTS_CACHE: Dict = {}


def _get_robots(robots_ref, user_agent: str):
    if robots_ref is None:
        return {}
    key = robots_ref.hex()
    v = _ROBOTS_CACHE.get(key)
    if v is None:
        raw = _get_ref(robots_ref)
        v = {h: parse_robots(body, user_agent).filter
             for h, body in raw.items()}
        _ROBOTS_CACHE[key] = v
    return v


def make_wave_fn(cfg_blob: bytes, crawler: Optional[str], depth: int,
                 frontier_ref, robots_ref, seen_actors, keep_external: bool,
                 emit_text: bool = True):
    """The fused per-wave UDF (plain task function; all state cached at
    process level or broadcast via object refs)."""

    num_shards = len(seen_actors)

    def wave(batch: pa.Table) -> pa.Table:
        import ray

        cfg, cr, idx = _get_ctx(cfg_blob, crawler)
        frontier: set = _get_ref(frontier_ref)
        robots = _get_robots(robots_ref, cfg.user_agent)

        # --- J1: filter this store block down to frontier rows (vectorized)
        mask = pc.is_in(batch.column("url"),
                        value_set=pa.array(list(frontier), pa.string())) \
            if len(frontier) < 100_000 else None
        if mask is not None:
            batch = batch.filter(mask)
        else:  # very large frontier: python-set membership is faster to ship
            sel = [u in frontier for u in batch.column("url").to_pylist()]
            batch = batch.filter(pa.array(sel))
        if batch.num_rows == 0:
            return pa.table({f.name: [] for f in OUT_SCHEMA},
                            schema=OUT_SCHEMA)

        # --- parse + extract + classify
        out: Dict[str, list] = {f.name: [] for f in OUT_SCHEMA}
        link_hosts: List[str] = []
        link_keys: List[str] = []
        link_idx: List[int] = []

        for url, body, ctype, status in zip(
            batch.column("url").to_pylist(),
            batch.column("body").to_pylist(),
            batch.column("content_type").to_pylist(),
            batch.column("status").to_pylist(),
        ):
            base = url_set(url)
            if base is None:
                continue
            ft = idx.match_by_url(base)
            if ft in (DISCARD, POSSIBLE_MATCH) or not ft.has_parser:
                continue
            if status is not None and 300 <= status < 400:
                continue  # redirects handled by the ordered engine
            refs: List[bytes] = []
            attrs = AttrList(ft.attributes)
            buf = run_chain(parse_chain_spec(ft.parser), body or b"", base,
                            ctype, status or 200, attrs, refs.append)

            local = set()
            for ref in refs:
                u = resolve(base, ref)
                if u is None:
                    continue
                cft = idx.match_by_url(u)
                if cft in (DISCARD, POSSIBLE_MATCH):
                    continue
                key = u.seen_key
                if key in local:
                    continue  # in-page dedup (ue_add first-wins)
                local.add(key)
                if not cft.has_parser:
                    # target-only filetype (bind_url worker.c:712-713):
                    # reported immediately, never fetched; still deduped
                    # through the seen pool like every extracted URL
                    link_idx.append(len(out["url"]))
                    out["kind"].append("target")
                    out["url"].append(u.s)
                    out["host"].append(u.host_norm)
                    out["depth"].append(depth + 1)
                    out["seen_key"].append(key)
                    out["filetype"].append(cft.name)
                    out["is_external"].append(bool(u.is_external))
                    out["text"].append(None)
                    out["title"].append(None)
                    out["url_hash"].append(url_hash(u.s))
                    link_hosts.append(u.host_norm)
                    link_keys.append(key)
                    continue
                if u.is_external and not keep_external:
                    continue
                # robots (M13): evaluated before the URL enters the frontier
                f = robots.get(u.host_norm)
                if f is not None and not f.eval_url(u):
                    continue
                link_idx.append(len(out["url"]))
                out["kind"].append("link")
                out["url"].append(u.s)
                out["host"].append(u.host_norm)
                out["depth"].append(depth + 1)
                out["seen_key"].append(key)
                out["filetype"].append(cft.name)
                out["is_external"].append(bool(u.is_external))
                out["text"].append(None)
                out["title"].append(None)
                out["url_hash"].append(None)
                link_hosts.append(u.host_norm)
                link_keys.append(key)

            out["kind"].append("page")
            out["url"].append(url)
            out["host"].append(base.host_norm)
            out["depth"].append(depth)
            out["seen_key"].append(None)
            out["filetype"].append(ft.name)
            out["is_external"].append(None)
            # emit_text=False: metadata-only output (url_hash certifies the
            # bytes) for IO-free throughput measurement
            out["text"].append(buf if emit_text else None)
            out["title"].append(attrs.values.get("title"))
            out["url_hash"].append(url_hash(url))

        # --- T1/J2: batched seen anti-join, one RPC per touched shard
        if link_keys:
            by_shard: Dict[int, List[int]] = {}
            for i, h in enumerate(link_hosts):
                by_shard.setdefault(shard_of(h, num_shards), []).append(i)
            futs = {
                s: seen_actors[s].try_add_ordered.remote(
                    [link_keys[i] for i in idxs])
                for s, idxs in by_shard.items()
            }
            drop = set()
            for s, idxs in by_shard.items():
                for i, ok in zip(idxs, ray.get(futs[s])):
                    if not ok:
                        drop.add(link_idx[i])
            if drop:
                keep = [i for i in range(len(out["url"])) if i not in drop]
                out = {k: [v[i] for i in keep] for k, v in out.items()}

        return pa.table(out, schema=OUT_SCHEMA)

    return wave


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
    batch_size: int = 512,
    use_robots: bool = True,
    emit_text: bool = True,
) -> Dict[str, float]:
    """Run the BFS bulk crawl; writes pages Parquet per depth under
    out_dir and returns throughput stats."""
    import os

    import ray
    import ray.data

    from ..sources.pagestore import build_store
    from ..state.seen import make_seen_pool
    from .simulator import plan_seed_hosts

    t0 = time.time()
    store_dir = build_store(pages_dir, num_buckets=num_buckets)
    cfg_blob = pickle.dumps(cfg)
    cr = cfg.crawlers[crawler or cfg.default_crawler]
    depth_limit = depth_limit if depth_limit is not None else cr.depth_limit
    pool = make_seen_pool(num_shards=num_shards, mode=seen_mode)

    robots_ref = None
    if use_robots and cr.robotstxt:
        robots_ref = ray.put(load_robots_map(store_dir))

    # the store stays resident (and spillable) across waves, split into
    # enough blocks that every wave can use the whole CPU pool even when
    # frontier rows cluster in few host buckets (the mega-host skew)
    n_blocks = max(64, int(ray.cluster_resources().get("CPU", 8)) * 8)
    store_ds = ray.data.read_parquet(
        store_dir, columns=["url", "status", "content_type", "body"],
        override_num_blocks=n_blocks,
    ).materialize()

    seed_urls = []
    for h, urls in plan_seed_hosts(cfg, seeds, crawler).items():
        for u in urls:
            parsed = url_set(u if "://" in u else "http://" + u)
            if parsed is not None:
                seed_urls.append((parsed.s, parsed.host_norm, parsed.seen_key))
    grouped: Dict[str, List[str]] = {}
    for _s, h, k in seed_urls:
        grouped.setdefault(h, []).append(k)
    pool.try_add_grouped(grouped)

    frontier: List[str] = [s for s, _h, _k in seed_urls]
    stats = {"pages_parsed": 0, "links_extracted": 0,
             "frontier_urls": len(frontier)}
    stats["setup_sec"] = time.time() - t0  # store load/bucketing, pool, robots
    t_loop = time.time()

    import pyarrow.dataset as pads

    wave_times = []
    depth = 0
    while frontier and depth < depth_limit:
        t_wave = time.time()
        frontier_ref = ray.put(set(frontier))
        wave = make_wave_fn(cfg_blob, crawler, depth, frontier_ref,
                            robots_ref, pool.actors, cr.external, emit_text)
        # ONE streamed execution per wave: map → write (pages, links and
        # targets all land in the wave dir; no mid-pipeline materialize)
        wave_dir = os.path.join(out_dir, f"wave={depth}")
        store_ds.map_batches(
            wave, batch_format="pyarrow", batch_size=batch_size,
            num_cpus=1,
        ).write_parquet(wave_dir)

        # next frontier + counts come from a plain local Arrow read of the
        # just-written wave (kind/url columns only).  A wave whose frontier
        # was all misses writes nothing (no dir).
        import os as _os

        if _os.path.isdir(wave_dir):
            wd = pads.dataset(wave_dir)
            link_tbl = wd.to_table(filter=pc.field("kind") == "link",
                                   columns=["url"])
            n_pages = wd.count_rows(filter=pc.field("kind") == "page")
            frontier = link_tbl.column("url").to_pylist()
        else:
            n_pages = 0
            frontier = []

        stats["pages_parsed"] += n_pages
        stats["links_extracted"] += len(frontier)
        stats["frontier_urls"] += len(frontier)
        wave_times.append(
            (depth, round(time.time() - t_wave, 2), n_pages, len(frontier)))
        depth += 1

    stats["crawl_sec"] = time.time() - t_loop  # the scaling-relevant part
    stats["elapsed_sec"] = time.time() - t0
    stats["pages_per_sec"] = stats["pages_parsed"] / max(stats["elapsed_sec"], 1e-9)
    stats["frontier_urls_per_sec"] = (
        stats["frontier_urls"] / max(stats["elapsed_sec"], 1e-9)
    )
    stats["seen_size"] = pool.size()
    stats["wave_times"] = wave_times
    pool.shutdown()
    return stats
