"""Order-free bulk crawl (BFS) — the throughput path.

The rounds engine (crawl.py) reproduces the reference's per-host DFS
ordering and politeness exactly; when a pipeline only needs the crawl's
OUTPUTS (visited set, extracted links/text/targets) — e.g. corpus
refresh / training-data harvesting over a frozen pages table — ordering
inside a host is irrelevant and the whole crawl collapses into the
classic Ray Data shape (SURVEY.md §3.5):

  frontier_w (PARQUET, distributed)      # never a driver list
    → map_batches(BucketWave)            # NO shuffle: each batch probes
                                         #   its rows' store buckets as
                                         #   zero-copy shared-memory Arrow
                                         #   tables (vectorized is_in)
    → parse/extract/classify             # M1-M11 + F1-F4, one fused pass
    → seen anti-join (sharded actors)    # T1/J2, batched per shard
    → robots filter (broadcast rules)    # M13/J3
    → wave parquet, hive-partitioned by (kind, bucket)
  frontier_{w+1} = wave=w/kind=link      # read back directly — the
                                         #   directory is the filter, and
                                         #   bucket=N subdirs make next-wave
                                         #   batches bucket-pure (each task
                                         #   probes ONE bucket table)

Every wave checkpoints (frontier parquet + seen-shard snapshots +
_COMPLETE marker), so a killed bulk crawl resumes from the last complete
wave — the same per-partition lineage contract as the rounds engine.

Scale notes:
  * the driver holds only counters; frontier and outputs live in Parquet
    (a 10^10-URL frontier is fine — it is partitioned by host bucket).
  * each store bucket is loaded ONCE into the object store as an Arrow
    table; wave tasks probe it zero-copy from shared memory (one
    resident, spillable copy per node — no per-process page dicts).
  * skew: there is no per-bucket task granularity at all — frontier
    batches split by size, so a mega-host's rows fan out over many
    batches that all probe the same shared bucket table.

Differences from the ordered engine, by design: no politeness budgets or
per-host sequencing; seen-set winners under concurrency are
nondeterministic but the PAGE SET equals the ordered engine's (tested,
external=False and external=True with both clear_external_on_activate
settings); redirects and fetch-misses are skipped, not visited.
External semantics mirror the kernel faithfully: an external link enters
the frontier at depth 0 flagged `ext`; with
``clear_external_on_activate=False`` the activated page's extracted
children inherit LM_URL_EXTERNAL (url.c:297) and are seen-added but
never followed (the reference's one-level quirk); with the flag True
they crawl normally with fresh depth accounting.
"""

from __future__ import annotations

import os
import pickle
import time
from typing import Dict, List, Optional, Sequence

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from ..config import EngineConfig
from ..functions.matchkit import DISCARD, FTIndex, POSSIBLE_MATCH
from ..functions.parsechain import AttrList, parse_chain_spec, run_chain
from ..functions.robots import parse_robots
from ..functions.urlkit import URL, resolve, url_set
from ..state.seen import shard_of, stable_hash64
from .hostloop import url_hash
from dataclasses import replace as dc_replace

OUT_SCHEMA = pa.schema(
    [
        ("kind", pa.string()),  # 'link' (frontier candidate) | 'page' | 'target'
        ("bucket", pa.int32()),  # the row's host's store bucket
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

FRONTIER_SCHEMA = pa.schema(
    [
        ("bucket", pa.int32()),
        ("url", pa.string()),
        ("depth", pa.int32()),
        ("is_external", pa.bool_()),  # activated-external row (kernel flag)
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
        if len(_REF_CACHE) > 64:
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


_LOAD_BUCKET_REMOTE = None


def _load_bucket_remote():
    global _LOAD_BUCKET_REMOTE
    if _LOAD_BUCKET_REMOTE is None:
        import ray

        # num_cpus=0: the load is an IO-bound parquet scan, and a wave's
        # map tasks occupy every CPU slot — a CPU-requesting load task
        # would starve behind them while they block on ray.get of the
        # very bucket it is loading (measured: 232 s vs 35 s on the
        # heavy corpus)
        @ray.remote(num_cpus=0)
        def _load(store_dir: str, b: int) -> pa.Table:
            d = pads.dataset(store_dir, partitioning="hive")
            return d.to_table(
                filter=pc.field("bucket") == b,
                columns=["url", "status", "content_type", "body"],
            )

        _LOAD_BUCKET_REMOTE = _load
    return _LOAD_BUCKET_REMOTE


class BucketDirectory:
    """Zero-CPU actor memoizing ONE plasma ObjectRef per store bucket,
    created on FIRST REFERENCE by a wave task.  (The round-2 path
    ray.get()-ed every bucket before wave 0 — at 100 TB that is a
    whole-corpus object-store ingest blocking the crawl; now only the
    buckets the frontier actually touches are loaded, overlapped with
    wave compute.)  The actor owns the refs, so loaded tables stay alive
    and spillable for the whole crawl; if an object is evicted or lost,
    ray.get on its ref re-runs the deterministic load task via lineage
    reconstruction.  Wave tasks resolve a bucket ONCE per process (the
    _get_bucket_table cache) — the actor RPC is not per-batch."""

    def __init__(self, store_dir: str):
        self.store_dir = store_dir
        self.refs: Dict[int, object] = {}

    def get_ref(self, b: int):
        r = self.refs.get(b)
        if r is None:
            r = _load_bucket_remote().remote(self.store_dir, b)
            self.refs[b] = r
        return r

    def get_refs(self, bs: List[int]):
        """Batched form: one RPC resolves (and starts loading) every
        bucket a wave batch touches, so the loads run in PARALLEL while
        the caller blocks once."""
        return [self.get_ref(b) for b in bs]


def make_bucket_directory(store_dir: str):
    import ray

    return ray.remote(num_cpus=0)(BucketDirectory).remote(store_dir)


_BUCKET_REF_CACHE: Dict = {}


def _get_bucket_tables(bucket_dir, bs: Sequence[int]) -> Dict[int, pa.Table]:
    """Batched per-process bucket resolution: ONE directory RPC for all
    uncached buckets (their load tasks then run in parallel) and ONE
    ray.get over every not-yet-local table — a wave-0 batch touching 30
    buckets pays one parallel wait, not 30 sequential load round-trips.
    Tables come back zero-copy from plasma via the _REF_CACHE."""
    import ray

    aid = bucket_dir._actor_id.hex()
    missing = [b for b in bs if (aid, b) not in _BUCKET_REF_CACHE]
    if missing:
        refs = ray.get(bucket_dir.get_refs.remote(missing))
        for b, r in zip(missing, refs):
            _BUCKET_REF_CACHE[(aid, b)] = r
            if len(_BUCKET_REF_CACHE) > 4096:
                _BUCKET_REF_CACHE.pop(next(iter(_BUCKET_REF_CACHE)))
    out: Dict[int, pa.Table] = {}
    fetch_b, fetch_r = [], []
    for b in bs:
        ref = _BUCKET_REF_CACHE[(aid, b)]
        key = ref.hex()
        tbl = _REF_CACHE.get(key)
        if tbl is None:
            fetch_b.append(b)
            fetch_r.append(ref)
        else:
            out[b] = tbl
    if fetch_r:
        for b, ref, tbl in zip(fetch_b, fetch_r, ray.get(fetch_r)):
            key = ref.hex()
            _REF_CACHE[key] = tbl
            if len(_REF_CACHE) > 64:
                _REF_CACHE.pop(next(iter(_REF_CACHE)))
            out[b] = tbl
    return out


def make_bucket_wave_fn(cfg_blob: bytes, crawler: Optional[str],
                        bucket_dir, robots_ref, seen_actors,
                        keep_external: bool, depth_limit: int,
                        num_buckets: int,
                        emit_text: bool = True):
    """map_groups UDF over ONE frontier group (bucket·salt slice): probe
    the bucket's shared-memory Arrow table for the group's frontier rows
    (vectorized is_in filter, zero-copy), parse, extract, classify,
    seen-anti-join — the fused per-wave kernel."""

    num_shards = len(seen_actors)

    def wave(batch: pa.Table) -> pa.Table:
        import ray

        cfg, cr, idx = _get_ctx(cfg_blob, crawler)
        robots = _get_robots(robots_ref, cfg.user_agent)
        # batches may mix buckets (no shuffle anywhere): resolve every
        # DISTINCT bucket in ONE batched call (loads run in parallel),
        # then probe each shared-memory table once, vectorized
        pages = {}
        # hive partition inference may hand the key back as a string
        distinct = [int(b) for b in
                    pc.unique(batch.column("bucket")).to_pylist()]
        tables = _get_bucket_tables(bucket_dir, distinct)
        for bucket in distinct:
            tbl = tables[bucket]  # zero-copy plasma table
            sub = tbl.filter(pc.is_in(tbl.column("url"),
                                      value_set=batch.column("url")))
            for u, st, c, b in zip(sub.column("url").to_pylist(),
                                   sub.column("status").to_pylist(),
                                   sub.column("content_type").to_pylist(),
                                   sub.column("body").to_pylist()):
                pages[u] = (st, c, b)
        clear_ext = cfg.clear_external_on_activate

        out: Dict[str, list] = {f.name: [] for f in OUT_SCHEMA}
        link_hosts: List[str] = []
        link_keys: List[str] = []
        link_idx: List[Optional[int]] = []  # None: seen-add only, no row

        for url, depth, ext in zip(
            batch.column("url").to_pylist(),
            batch.column("depth").to_pylist(),
            batch.column("is_external").to_pylist(),
        ):
            row = pages.get(url)
            if row is None:
                continue  # fetch miss (M_FAILED): no parse
            status, ctype, body = row
            base = url_set(url)
            if base is None:
                continue
            # activated-external page: children combine from an EXTERNAL
            # base (url.c:297 flag inheritance) unless the daemon-mode
            # clear flag is on
            inherited = bool(ext) and not clear_ext
            if inherited:
                base = dc_replace(base, is_external=True)
            ft = idx.match_by_url(base)
            # NB: == not `is` — the wave closure's captured POSSIBLE_MATCH
            # constant is re-created by value when cloudpickle ships it
            if ft == POSSIBLE_MATCH:
                # S2/J4 analog (ftindex.c:141-238 "lookup" class +
                # lm_ftindex_match_by_mime ftindex.c:240-247): the HEAD
                # MIME peek is a content_type lookup on the page row —
                # extension-less / dynamic URLs bind here, not at
                # extraction
                ft = idx.match_by_mime((ctype or "").split(";")[0])
                if ft is not None and not ft.has_parser:
                    # MIME-bound target-only filetype (worker.c:712-713):
                    # reported as a target, never parsed; already
                    # seen-added when it entered the frontier
                    out["kind"].append("target")
                    out["bucket"].append(
                        stable_hash64(base.host_norm) % num_buckets)
                    out["url"].append(url)
                    out["host"].append(base.host_norm)
                    out["depth"].append(depth)
                    out["seen_key"].append(None)
                    out["filetype"].append(ft.name)
                    out["is_external"].append(bool(ext))
                    out["text"].append(None)
                    out["title"].append(None)
                    out["url_hash"].append(url_hash(url))
                    continue
            if ft is DISCARD or not ft.has_parser:
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
                if cft is DISCARD:
                    continue
                # POSSIBLE_MATCH ("lookup" class) children ENTER the
                # frontier; the next wave binds them via the store's
                # content_type (the HEAD analog above) instead of
                # dropping extension-less/dynamic URLs outright
                key = u.seen_key
                if key in local:
                    continue  # in-page dedup (ue_add first-wins)
                local.add(key)
                if cft != POSSIBLE_MATCH and not cft.has_parser:
                    # target-only filetype (bind_url worker.c:712-713):
                    # reported immediately, never fetched; still deduped
                    # through the seen pool like every extracted URL
                    link_idx.append(len(out["url"]))
                    out["kind"].append("target")
                    out["bucket"].append(
                        stable_hash64(u.host_norm) % num_buckets)
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
                    continue  # no candidate machinery at all
                if u.is_external and inherited:
                    # one-level quirk: children of an activated-external
                    # page re-park onto their own already-active host and
                    # are lost — but the reference DOES seen-add them
                    # (merge pass 1), so do the add without emitting a row
                    link_hosts.append(u.host_norm)
                    link_keys.append(key)
                    link_idx.append(None)
                    continue
                if u.is_external:
                    next_depth = 0  # fresh host activates at depth 0
                else:
                    next_depth = depth + 1
                    if next_depth >= depth_limit:
                        # beyond the limit: seen-added at extraction time
                        # (urlengine.c adds before the depth check) but
                        # never crawled
                        link_hosts.append(u.host_norm)
                        link_keys.append(key)
                        link_idx.append(None)
                        continue
                # robots (M13): evaluated before the URL enters the frontier
                f = robots.get(u.host_norm)
                if f is not None and not f.eval_url(u):
                    continue
                link_idx.append(len(out["url"]))
                out["kind"].append("link")
                out["bucket"].append(stable_hash64(u.host_norm) % num_buckets)
                out["url"].append(u.s)
                out["host"].append(u.host_norm)
                out["depth"].append(next_depth)
                out["seen_key"].append(key)
                out["filetype"].append(
                    POSSIBLE_MATCH if cft == POSSIBLE_MATCH else cft.name)
                out["is_external"].append(bool(u.is_external))
                out["text"].append(None)
                out["title"].append(None)
                out["url_hash"].append(None)
                link_hosts.append(u.host_norm)
                link_keys.append(key)

            out["kind"].append("page")
            out["bucket"].append(stable_hash64(base.host_norm) % num_buckets)
            out["url"].append(url)
            out["host"].append(base.host_norm)
            out["depth"].append(depth)
            out["seen_key"].append(None)
            out["filetype"].append(ft.name)
            out["is_external"].append(bool(ext))
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
                    if not ok and link_idx[i] is not None:
                        drop.add(link_idx[i])
            if drop:
                keep = [i for i in range(len(out["url"])) if i not in drop]
                out = {k: [v[i] for i in keep] for k, v in out.items()}

        return pa.table(out, schema=OUT_SCHEMA)

    wave.__name__ = "BucketWave"
    return wave


def load_robots_map(store_dir: str) -> Dict[str, str]:
    """All /robots.txt rows → {host: body} (fetched once per host, S6)."""
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


def waves_path(out_dir: str) -> str:
    """The hive-partitioned pages/links/targets output (read this)."""
    return os.path.join(out_dir, "waves")


def _frontier_dir(out_dir: str, w: int) -> str:
    return os.path.join(out_dir, "frontiers", f"frontier_{w:04d}")


def _wave_dir(out_dir: str, w: int) -> str:
    return os.path.join(waves_path(out_dir), f"wave={w}")


def _ckpt_dir(out_dir: str, w: int) -> str:
    return os.path.join(out_dir, "ckpt", f"wave_{w:04d}")


def _count_rows(path: str, flt=None) -> int:
    if not os.path.isdir(path):
        return 0
    try:
        d = pads.dataset(path)
    except Exception:
        return 0
    return d.count_rows(filter=flt) if flt is not None else d.count_rows()


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
    max_waves: int = 10000,
    resume: bool = False,
    direct_wave_gate: int = 200_000,
    prewarm_buckets: bool = False,
    start_gate=None,
) -> Dict[str, float]:
    """Run the BFS bulk crawl; writes wave Parquet + frontier Parquet +
    seen snapshots per wave under out_dir (resumable) and returns
    throughput stats.  Waves with ≤ ``direct_wave_gate`` frontier rows
    run as plain Ray tasks over the frontier fragments (identical
    output layout); larger waves use the streaming Dataset path."""
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

    def frontier_table(rows) -> pa.Table:
        # rows: (url, host, depth, ext)
        bk, urls, depths, exts = [], [], [], []
        for u, h, d, e in rows:
            bk.append(stable_hash64(h) % num_buckets)
            urls.append(u)
            depths.append(d)
            exts.append(e)
        return pa.table({
            "bucket": pa.array(bk, pa.int32()),
            "url": pa.array(urls, pa.string()),
            "depth": pa.array(depths, pa.int32()),
            "is_external": pa.array(exts, pa.bool_()),
        }, schema=FRONTIER_SCHEMA)

    start_wave = 0
    ckpt_root = os.path.join(out_dir, "ckpt")
    if resume and os.path.isdir(ckpt_root):
        done = sorted(
            int(d.split("_")[1]) for d in os.listdir(ckpt_root)
            if d.startswith("wave_")
            and os.path.exists(os.path.join(ckpt_root, d, "_COMPLETE"))
        )
        if done:
            last = done[-1]
            # shards read their own snapshot files in parallel
            pool.restore_from_dir(_ckpt_dir(out_dir, last))
            start_wave = last + 1

    if start_wave == 0:
        os.makedirs(out_dir, exist_ok=True)
        seed_rows = []
        grouped: Dict[str, List[str]] = {}
        for h, urls in plan_seed_hosts(cfg, seeds, crawler).items():
            for u in urls:
                parsed = url_set(u if "://" in u else "http://" + u)
                if parsed is not None:
                    seed_rows.append((parsed.s, parsed.host_norm, 0, False))
                    grouped.setdefault(parsed.host_norm, []).append(
                        parsed.seen_key)
        pool.try_add_grouped(grouped)
        fd0 = _frontier_dir(out_dir, 0)
        os.makedirs(fd0, exist_ok=True)
        pq.write_table(frontier_table(seed_rows),
                       os.path.join(fd0, "part-0.parquet"))

    stats = {"pages_parsed": 0, "links_extracted": 0, "frontier_urls": 0}
    # fold stats from waves completed before a resume
    for w in range(0, start_wave):
        wd = _wave_dir(out_dir, w)
        stats["pages_parsed"] += _count_rows(os.path.join(wd, "kind=page"))
        stats["links_extracted"] += _count_rows(os.path.join(wd, "kind=link"))
    stats["frontier_urls"] = stats["links_extracted"] + \
        _count_rows(_frontier_dir(out_dir, 0))
    # store ingest is LAZY: a bucket enters plasma the first time a
    # wave's frontier references it (BucketDirectory), overlapped with
    # wave compute — never a whole-corpus ingest before wave 0.
    # prewarm_buckets is a BENCHMARK opt-in (scaling runs): it moves the
    # whole-store ingest into setup_sec, because on a real cluster every
    # node loads its buckets from distributed storage in parallel while
    # on one box it is a fixed memcpy/disk cost that corrupts the
    # CPU-scaling signal.  Never the default — at 100 TB the lazy path
    # is the only sane one.
    bucket_dir = make_bucket_directory(store_dir)
    if prewarm_buckets:
        import ray as _ray

        _ray.get(_ray.get(
            bucket_dir.get_refs.remote(list(range(num_buckets)))))
    stats["setup_sec"] = time.time() - t0
    if start_gate is not None:
        # benchmark rendezvous: concurrent sessions block here until all
        # have finished setup, so timed loops only ever overlap timed
        # loops (a real cluster's job start after per-node setup)
        start_gate()
    t_loop = time.time()

    wave_fn = make_bucket_wave_fn(cfg_blob, crawler, bucket_dir,
                                  robots_ref, pool.actors, cr.external,
                                  depth_limit, num_buckets, emit_text)

    # frontier blocks sized so every wave can use the whole CPU pool:
    # Ray derives map-task granularity from BLOCKS, and its default
    # coalescing would cap a heavy wave at a handful of tasks
    n_blocks = max(64, int(ray.cluster_resources().get("CPU", 8)) * 4)

    def _frontier_src(w: int):
        """Wave w's frontier source dir: the seed parquet at w=0, else
        the PREVIOUS wave's kind=link hive partition read straight from
        its parquet (the wave fn already emitted bucket) — no separate
        frontier write, no filter scan (the directory IS the filter)."""
        if w == 0:
            return _frontier_dir(out_dir, 0)
        return os.path.join(_wave_dir(out_dir, w - 1), "kind=link")

    def _frontier_files(w: int):
        """(path, bucket-or-None) parquet fragments of wave w's frontier
        (bucket=None at w=0: the seed file carries a real column)."""
        src = _frontier_src(w)
        if w == 0:
            return [(os.path.join(src, f), None)
                    for f in sorted(os.listdir(src))
                    if f.endswith(".parquet")]
        files = []
        for sub in sorted(os.listdir(src)):
            if not sub.startswith("bucket="):
                continue
            b = int(sub.split("=", 1)[1])
            d = os.path.join(src, sub)
            files.extend((os.path.join(d, f), b) for f in sorted(
                os.listdir(d)) if f.endswith(".parquet"))
        return files

    # direct-task wave kernel (size-gated, same precedent as
    # crawl_rounds): below the gate a wave is a handful of plain Ray
    # tasks over the frontier fragments — skipping Ray Data's fixed
    # per-execution planning/scheduling floor (~0.5 s/wave, which
    # dominates a 12-wave crawl at sandbox scale).  Output layout is
    # IDENTICAL to the Dataset path's hive write (tested), so resume and
    # downstream readers cannot tell which path ran.  Above the gate the
    # streaming Dataset path takes over — the 10^10-frontier shape.
    @ray.remote(num_cpus=1, max_retries=0)
    def _direct_wave(pieces, wdir, task_idx, wfn, bsz):
        # pieces: (path, bucket-or-None, row_offset, row_count) — row
        # slicing lets one big fragment (e.g. the single wave-0 seed
        # file) fan out over the whole CPU pool; frontier fragments are
        # URL lists, so re-reading a shared file per slice is cheap
        t_busy0 = time.time()
        outs = []
        tbl_cache: Dict[str, pa.Table] = {}
        for path, b, off, cnt in pieces:
            t = tbl_cache.get(path)
            if t is None:
                t = pq.read_table(
                    path, columns=None if b is None else
                    ["url", "depth", "is_external"])
                if b is not None:
                    t = t.append_column(
                        "bucket", pa.array([b] * t.num_rows, pa.int32()))
                tbl_cache[path] = t
            t = t.slice(off, cnt)
            for o in range(0, t.num_rows, bsz):
                outs.append(wfn(t.slice(o, bsz)))
        outs = [o for o in outs if o.num_rows]
        if not outs:
            return {"links": 0, "pages": 0, "files": [],
                    "busy": time.time() - t_busy0}
        res = pa.concat_tables(outs)
        # manifest of written link fragments (path, bucket, rows): the
        # next wave plans its task groups from this instead of
        # listdir + per-file read_metadata over thousands of fragments
        written = []

        def visitor(f):
            parts = f.path.split(os.sep)
            kind = next((p[5:] for p in parts if p.startswith("kind=")), "")
            if kind == "link":
                b = next(int(p[7:]) for p in parts
                         if p.startswith("bucket="))
                written.append((f.path, b, f.metadata.num_rows))

        pads.write_dataset(
            res, wdir, format="parquet",
            partitioning=pads.partitioning(
                pa.schema([("kind", pa.string()), ("bucket", pa.int32())]),
                flavor="hive"),
            basename_template=f"part-{task_idx}-{{i}}.parquet",
            existing_data_behavior="overwrite_or_ignore",
            file_visitor=visitor)
        kinds = res.column("kind")
        n_links = pc.sum(pc.equal(kinds, "link")).as_py() or 0
        n_pages = pc.sum(pc.equal(kinds, "page")).as_py() or 0
        return {"links": n_links, "pages": n_pages, "files": written,
                "busy": time.time() - t_busy0}

    wave_fn_ref = ray.put(wave_fn)

    def _plan_pieces(frags, n_front: int):
        """~n_blocks row-balanced task groups regardless of fragment
        layout: a single big file splits into row slices, thousands of
        tiny hive fragments pack together.  frags: (path, bucket, rows)
        with rows=None meaning 'read the footer'."""
        import math

        target = max(batch_size, math.ceil(n_front / n_blocks))
        groups, cur, cur_rows = [], [], 0
        for path, b, n in frags:
            if n is None:
                n = pq.read_metadata(path).num_rows
            pos = 0
            while pos < n:
                take = min(target - cur_rows, n - pos)
                cur.append((path, b, pos, take))
                cur_rows += take
                pos += take
                if cur_rows >= target:
                    groups.append(cur)
                    cur, cur_rows = [], 0
        if cur:
            groups.append(cur)
        return groups

    def _run_wave_direct(w: int, wdir: str, n_front: int, manifest):
        frags = (manifest if manifest is not None else
                 [(p, b, None) for p, b in _frontier_files(w)])
        groups = _plan_pieces(frags, n_front)
        results = ray.get([
            _direct_wave.remote(g, wdir, i, wave_fn_ref, batch_size)
            for i, g in enumerate(groups)])
        return {
            "links": sum(r["links"] for r in results),
            "pages": sum(r["pages"] for r in results),
            "files": [f for r in results for f in r["files"]],
            "busy": sum(r["busy"] for r in results),
        }

    wave_times = []
    w = start_wave
    import shutil as _sh

    # (manifest, n_front) carried wave-to-wave: the direct path's write
    # manifest (per-fragment row counts) replaces listdir +
    # read_metadata scans over thousands of link fragments
    manifest = None
    n_front = _count_rows(_frontier_src(start_wave))

    while w < max_waves:
        if n_front == 0:
            break
        t_wave = time.time()
        wdir = _wave_dir(out_dir, w)
        _sh.rmtree(wdir, ignore_errors=True)
        if n_front <= direct_wave_gate:
            res = _run_wave_direct(w, wdir, n_front, manifest)
            n_links, n_pages = res["links"], res["pages"]
            manifest = res["files"]
            # in-task wall seconds (direct-path waves only): a
            # scheduling-noise-immune utilization signal — busy/(wall×
            # cpus) is how much of the pool did engine work
            stats["task_busy_sec"] = (
                stats.get("task_busy_sec", 0.0) + res["busy"])
        else:
            # ONE map-only execution per wave (NO shuffle: batches may
            # mix buckets, the wave fn probes each bucket table
            # zero-copy; the hive write partitions outputs by kind).
            # max_retries=0: seen adds are not idempotent; a failed wave
            # resumes from the last complete wave's snapshots.
            src = _frontier_src(w)
            frontier = ray.data.read_parquet(
                src, override_num_blocks=n_blocks,
                **({} if w == 0 else
                   {"columns": ["bucket", "url", "depth", "is_external"]}))
            frontier.map_batches(
                wave_fn, batch_format="pyarrow", batch_size=batch_size,
                num_cpus=1, max_retries=0,
            ).write_parquet(wdir, partition_cols=["kind", "bucket"])
            n_links = _count_rows(os.path.join(wdir, "kind=link"))
            n_pages = _count_rows(os.path.join(wdir, "kind=page"))
            manifest = None  # next direct wave falls back to listing

        # checkpoint: seen snapshots + completion marker (resume lineage)
        cdir = _ckpt_dir(out_dir, w)
        _sh.rmtree(cdir, ignore_errors=True)
        os.makedirs(cdir, exist_ok=True)
        # each shard pickles + writes its own file, all in parallel —
        # the blobs never ship through the driver (a serial floor that
        # grows with the seen set and penalizes exactly the weak-scaling
        # numerator; on a cluster cdir is shared storage)
        pool.snapshot_to_dir(cdir)
        with open(os.path.join(cdir, "_COMPLETE"), "w") as f:
            f.write("ok")

        n_front = n_links
        stats["pages_parsed"] += n_pages
        stats["links_extracted"] += n_links
        stats["frontier_urls"] += n_links
        wave_times.append((w, round(time.time() - t_wave, 2),
                           n_pages, n_links))
        w += 1

    stats["crawl_sec"] = time.time() - t_loop  # the scaling-relevant part
    stats["elapsed_sec"] = time.time() - t0
    # throughput off the crawl loop; setup (store build, seed planning)
    # is reported separately in setup_sec
    stats["pages_per_sec"] = stats["pages_parsed"] / max(stats["crawl_sec"], 1e-9)
    stats["frontier_urls_per_sec"] = (
        stats["frontier_urls"] / max(stats["crawl_sec"], 1e-9)
    )
    stats["seen_size"] = pool.size()
    stats["wave_times"] = wave_times
    pool.shutdown()
    return stats


def crawl_bfs_pipelined(
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
    batch_size: int = 512,
    use_robots: bool = True,
    emit_text: bool = True,
    max_inflight: Optional[int] = None,
    prewarm_buckets: bool = False,
    start_gate=None,
    buf_cap_rows: Optional[int] = None,
    ckpt_every_tasks: Optional[int] = None,
    resume: bool = False,
    _fail_after_tasks: Optional[int] = None,
) -> Dict[str, float]:
    """Barrier-free frontier-queue crawl — the wave engine minus the
    per-wave ``ray.get`` barrier.

    The wave engine idles the pool behind each wave's stragglers
    (measured: cpu_busy_frac 0.63 at 32 cpus vs 0.89 at 8 on the same
    corpus — the barrier tax grows with width).  Bulk mode is
    order-free, so BFS synchronization is not semantically required:
    here every finished task's extracted links are immediately cut into
    new tasks (classic work-queue crawl), and the pool never drains
    until the frontier is globally exhausted.

    Mechanics: a task takes ~``batch_size`` frontier rows (Arrow slices
    straight from plasma — the frontier NEVER touches parquet or the
    driver's heap beyond slice bookkeeping), runs the same fused
    BucketWave kernel, writes page/target rows hive-partitioned under
    ``out_dir``, and RETURNS its kind=link rows as an Arrow table.  The
    driver buffers link tables and cuts row-balanced tasks, force-
    flushing partial tasks whenever the pool runs under-committed so
    the tail never serializes.  Depth limits, seen anti-join, robots,
    external gating and MIME binding are all inside the shared kernel —
    pipelined vs wave outputs are set-equal (pinned by test).

    Driver memory is BOUNDED structurally: the driver never holds link
    TABLES, only ``(ObjectRef, offset, rows)`` bookkeeping — each
    task's link table stays in the object store (returned as its own
    object via ``num_returns=2``; the driver ``ray.get``s only the
    few-int stats tuple) and the next task dereferences the ref
    worker-side, so frontier bytes flow plasma→plasma and Ray's object
    store spills to disk under pressure instead of the driver heap
    growing.  ``buf_cap_rows`` additionally opts into DURABLE overflow:
    above the cap the oldest buffered tables are written as
    frontier-schema Parquet under ``out_dir/frontier_spill`` (the wave
    engine's durable-frontier convention; at cluster scale you would
    partition the spill by host bucket for locality) and stream back
    FIFO as the buffer drains.  Default is no cap: hot-path frontier
    I/O is zero-disk and Parquet is written only at checkpoints
    (measured: the old always-on Parquet overflow cost 2.4× crawl
    wall-time at sf0.1/batch=128).

    Resumability: with ``ckpt_every_tasks=N`` the drain loop QUIESCES
    every N completed tasks (stops cutting, drains in-flight tasks),
    flushes the whole buffer to the spill dir, snapshots the seen
    shards, and atomically writes a manifest (task seq, live spill
    files, counters) under ``out_dir/ckpt``.  ``resume=True`` restores
    seen + frontier + counters from the manifest and deletes output
    fragments written by post-checkpoint tasks (basenames carry the
    task seq), so an interrupted run continues to the exact outcome an
    uninterrupted run produces (pinned by test).  Checkpoints off
    (default) = the benchmark configuration; max_retries=0 either way:
    seen adds are not idempotent, the recovery unit is the checkpoint.

    Semantics note: when ``depth_limit`` actually BINDS (a URL first
    reached via a path at/over the limit is seen-added but never
    crawled), the visited SET can differ from wave-BFS order — the
    wave engine's seen-first-wins is breadth-ordered, this engine's is
    completion-ordered (the same class of nondeterminism the wave
    engine already documents for within-wave external races).  With a
    non-binding depth limit both engines visit exactly the reachable
    set and their page/target outputs are set-equal (pinned by test)."""
    import ray

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

    os.makedirs(out_dir, exist_ok=True)
    import json as _json
    import shutil as _sh

    ckpt_dir = os.path.join(out_dir, "ckpt")
    spill_dir = os.path.join(out_dir, "frontier_spill")
    manifest_path = os.path.join(ckpt_dir, "manifest.json")
    manifest = None
    if resume:
        with open(manifest_path) as f:
            manifest = _json.load(f)
        pool.restore_from_dir(ckpt_dir)
        # discard fragments written by post-checkpoint tasks — their
        # seen adds were rolled back with the snapshot restore, so the
        # resumed run regenerates that work (basenames carry task seq)
        for sub in os.listdir(out_dir):
            if not sub.startswith("kind="):
                continue
            for root, _dirs, files in os.walk(os.path.join(out_dir, sub)):
                for fn in files:
                    try:
                        tidx = int(fn.split("-")[1])
                    except (IndexError, ValueError):
                        continue
                    if tidx >= manifest["seq"]:
                        os.remove(os.path.join(root, fn))
    else:
        # a previous run's task-indexed fragments would otherwise mix
        # with this run's (basenames carry the task seq, not a run id)
        for sub in os.listdir(out_dir):
            if sub.startswith("kind="):
                _sh.rmtree(os.path.join(out_dir, sub), ignore_errors=True)
        _sh.rmtree(ckpt_dir, ignore_errors=True)
        _sh.rmtree(spill_dir, ignore_errors=True)
    bucket_dir = make_bucket_directory(store_dir)
    wave_fn = make_bucket_wave_fn(cfg_blob, crawler, bucket_dir,
                                  robots_ref, pool.actors, cr.external,
                                  depth_limit, num_buckets, emit_text)
    wave_fn_ref = ray.put(wave_fn)

    # seed frontier (seen-added exactly like the wave engine); a resumed
    # run's frontier comes from the checkpoint spill files instead
    seed_tbl = None
    seed_rows = []
    if manifest is None:
        grouped: Dict[str, List[str]] = {}
        for h, urls in plan_seed_hosts(cfg, seeds, crawler).items():
            for u in urls:
                parsed = url_set(u if "://" in u else "http://" + u)
                if parsed is not None:
                    seed_rows.append(parsed)
                    grouped.setdefault(parsed.host_norm, []).append(
                        parsed.seen_key)
        pool.try_add_grouped(grouped)
        seed_tbl = pa.table({
            "bucket": pa.array(
                [stable_hash64(p.host_norm) % num_buckets
                 for p in seed_rows],
                pa.int32()),
            "url": pa.array([p.s for p in seed_rows], pa.string()),
            "depth": pa.array([0] * len(seed_rows), pa.int32()),
            "is_external": pa.array([False] * len(seed_rows), pa.bool_()),
        }, schema=FRONTIER_SCHEMA)

    cpus = int(ray.cluster_resources().get("CPU", 8))
    max_inflight = max_inflight or cpus * 3

    @ray.remote(num_cpus=1, max_retries=0, num_returns=2)
    def _stream_task(specs, odir, task_idx, wfn, bsz):
        # specs: [(ObjectRef[frontier table], offset, rows), ...] —
        # dereferenced HERE (plasma→worker, zero driver copy); the
        # first return (the link table) likewise never visits the
        # driver: the next task that consumes it gets the raw ref
        t_busy0 = time.time()
        parts = [ray.get(r).slice(o, n) for r, o, n in specs]
        tbl = parts[0] if len(parts) == 1 else pa.concat_tables(parts)
        outs = []
        for o in range(0, tbl.num_rows, bsz):
            outs.append(wfn(tbl.slice(o, bsz)))
        outs = [o for o in outs if o.num_rows]
        if not outs:
            return None, (0, 0, time.time() - t_busy0)
        res = pa.concat_tables(outs)
        is_link = pc.equal(res.column("kind"), "link")
        links = res.filter(is_link).select(
            ["bucket", "url", "depth", "is_external"])
        persist = res.filter(pc.invert(is_link))
        if persist.num_rows:
            pads.write_dataset(
                persist, odir, format="parquet",
                partitioning=pads.partitioning(
                    pa.schema([("kind", pa.string()),
                               ("bucket", pa.int32())]), flavor="hive"),
                basename_template=f"part-{task_idx}-{{i}}.parquet",
                existing_data_behavior="overwrite_or_ignore")
        n_pages = pc.sum(pc.equal(res.column("kind"), "page")).as_py() or 0
        links = links.combine_chunks()
        return (links if links.num_rows else None,
                (n_pages, links.num_rows, time.time() - t_busy0))

    if prewarm_buckets:
        # benchmark opt-in, same rationale as the wave engine's
        ray.get(ray.get(
            bucket_dir.get_refs.remote(list(range(num_buckets)))))

    if manifest is not None:
        stats = dict(manifest["counters"])
    else:
        stats = {"pages_parsed": 0, "links_extracted": 0,
                 "frontier_urls": len(seed_rows), "task_busy_sec": 0.0,
                 "n_tasks": 0}
    stats["setup_sec"] = time.time() - t0
    if start_gate is not None:
        # benchmark rendezvous: see crawl_bfs
        start_gate()
    t_loop = time.time()

    pending: Dict = {}  # meta ObjectRef -> link-table ObjectRef
    buf: List[List] = []  # [link-table ObjectRef, offset, rows-left]
    buf_rows = 0
    seq = manifest["seq"] if manifest is not None else 0
    spill_seq = manifest["spill_seq"] if manifest is not None else 0
    spill_q: List[str] = (
        [os.path.join(spill_dir, f) for f in manifest["files"]]
        if manifest is not None else [])
    consumed_spill: List[str] = []
    buf_cap = buf_cap_rows  # None = object store is the bound
    last_ckpt_tasks = stats["n_tasks"]

    def _entry_table(e) -> pa.Table:
        # only the durable paths (cap overflow, checkpoint) materialize
        # an entry on the driver; the hot path ships refs
        return ray.get(e[0]).slice(e[1], e[2])

    def cut(force: bool) -> None:
        nonlocal buf, buf_rows, seq
        while ((buf_rows >= batch_size or (force and buf_rows > 0))
               and len(pending) < max_inflight):
            need = min(batch_size, buf_rows)
            specs: List[tuple] = []
            taken = 0
            while taken < need:
                e = buf[0]
                room = need - taken
                if e[2] <= room:
                    specs.append((e[0], e[1], e[2]))
                    taken += e[2]
                    buf.pop(0)
                else:
                    specs.append((e[0], e[1], room))
                    e[1] += room
                    e[2] -= room
                    taken += room
            buf_rows -= taken
            links_ref, meta_ref = _stream_task.remote(
                specs, out_dir, seq, wave_fn_ref, batch_size)
            pending[meta_ref] = links_ref
            seq += 1

    def _absorb(meta_ref, links_ref) -> None:
        nonlocal buf_rows
        n_pages, n_links, busy = ray.get(meta_ref)
        stats["pages_parsed"] += n_pages
        stats["links_extracted"] += n_links
        stats["frontier_urls"] += n_links
        stats["task_busy_sec"] += busy
        stats["n_tasks"] += 1
        if n_links:
            buf.append([links_ref, 0, n_links])
            buf_rows += n_links

    def spill_overflow() -> None:
        # opt-in durable overflow: oldest link tables leave the object
        # store for Parquet (FIFO — order-free semantics, FIFO keeps
        # progress fair)
        nonlocal buf_rows, spill_seq
        if buf_cap is None:
            return
        while buf_rows > buf_cap and len(buf) > 1:
            e = buf.pop(0)
            buf_rows -= e[2]
            os.makedirs(spill_dir, exist_ok=True)
            p = os.path.join(spill_dir, f"spill-{spill_seq:06d}.parquet")
            pq.write_table(_entry_table(e), p)
            spill_q.append(p)
            spill_seq += 1

    def refill() -> None:
        # spilled files are only DELETED at the next checkpoint (they
        # may belong to the last durable manifest); consumed ones are
        # remembered so a new manifest never lists them again
        nonlocal buf_rows
        while spill_q and buf_rows < batch_size * 2:
            p = spill_q.pop(0)
            t = pq.read_table(p)
            buf.append([ray.put(t), 0, t.num_rows])
            buf_rows += t.num_rows
            consumed_spill.append(p)

    def checkpoint() -> None:
        # QUIESCE: no new cuts, absorb every in-flight task, flush the
        # whole buffer to the spill dir (the spill files ARE the durable
        # frontier), snapshot seen shards, then atomically publish the
        # manifest — the recovery point
        nonlocal buf_rows, spill_seq, last_ckpt_tasks
        while pending:
            done, _ = ray.wait(list(pending), num_returns=1)
            for ref in done:
                _absorb(ref, pending.pop(ref))
        os.makedirs(spill_dir, exist_ok=True)
        while buf:
            e = buf.pop(0)
            p = os.path.join(spill_dir, f"spill-{spill_seq:06d}.parquet")
            pq.write_table(_entry_table(e), p)
            spill_q.append(p)
            spill_seq += 1
        buf_rows = 0
        os.makedirs(ckpt_dir, exist_ok=True)
        pool.snapshot_to_dir(ckpt_dir)
        m = {"seq": seq, "spill_seq": spill_seq,
             "files": [os.path.basename(p) for p in spill_q],
             "counters": {k: stats[k] for k in (
                 "pages_parsed", "links_extracted", "frontier_urls",
                 "task_busy_sec", "n_tasks")}}
        tmp = manifest_path + ".tmp"
        with open(tmp, "w") as f:
            _json.dump(m, f)
        os.replace(tmp, manifest_path)
        for p in consumed_spill:  # superseded by the new manifest
            if os.path.exists(p):
                os.remove(p)
        consumed_spill.clear()
        last_ckpt_tasks = stats["n_tasks"]

    if seed_tbl is not None and seed_tbl.num_rows:
        buf.append([ray.put(seed_tbl), 0, seed_tbl.num_rows])
        buf_rows = seed_tbl.num_rows
    try:
        refill()
        cut(force=True)
        while pending or buf_rows or spill_q:
            if not pending:
                refill()
                cut(force=True)
                if not pending:
                    break
            done, _ = ray.wait(list(pending), num_returns=1)
            for ref in done:
                _absorb(ref, pending.pop(ref))
            spill_overflow()
            if (ckpt_every_tasks
                    and stats["n_tasks"] - last_ckpt_tasks
                    >= ckpt_every_tasks):
                checkpoint()
            if (_fail_after_tasks is not None
                    and stats["n_tasks"] >= _fail_after_tasks):
                # kill in-flight tasks so the "crash" leaves no write
                # racing the subsequent resume (test determinism)
                for ref in pending:
                    ray.cancel(ref, force=True)
                if pending:
                    ray.wait(list(pending), num_returns=len(pending),
                             timeout=30)
                raise RuntimeError("injected failure (test hook)")
            refill()
            # keep the pool committed: full tasks first, then force
            # partial tasks whenever fewer tasks than cores remain
            cut(force=False)
            if buf_rows and len(pending) < cpus:
                cut(force=True)
    except BaseException:
        pool.shutdown()
        raise

    stats["crawl_sec"] = time.time() - t_loop
    stats["elapsed_sec"] = time.time() - t0
    stats["pages_per_sec"] = stats["pages_parsed"] / max(
        stats["crawl_sec"], 1e-9)
    stats["frontier_urls_per_sec"] = stats["frontier_urls"] / max(
        stats["crawl_sec"], 1e-9)
    stats["cpu_busy_frac"] = stats["task_busy_sec"] / max(
        stats["crawl_sec"] * cpus, 1e-9)
    stats["seen_size"] = pool.size()
    pool.shutdown()
    # a completed run needs no recovery point; stale manifests must not
    # offer resume into a finished crawl
    _sh.rmtree(ckpt_dir, ignore_errors=True)
    _sh.rmtree(spill_dir, ignore_errors=True)
    return stats
