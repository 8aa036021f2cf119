"""The distributed crawl — libmetha's fetch→parse→extract→schedule loop as
iterative Ray Data rounds (SURVEY.md §3.5, BASELINE.json north_rule).

Per round r:

  work_r  : Dataset[host, kind, ...]  (kind ∈ state | seed | arrival)
  results = work_r.groupby("host").map_groups(HostTurnStep, concurrency=C)
            — parallel across hosts, sequential within a host (the
            reference's one-worker-per-host-at-a-time, urlengine.c:566-645);
            each group runs the transcribed worker loop (hostloop.py) with
            its politeness budget, reading its pages via the host-bucketed
            store (selective Parquet IO) and seen-checking against the
            sharded actor pool (one RPC per parsed page)
  results → write_parquet(ckpt/round_r/result)    # THE checkpoint: visits,
            targets, texts, counters, new states, external candidates —
            per-partition lineage, resumable
  cands   = read back kind=cand → groupby(shard) → map_groups(merge):
            deterministic (src_host, emit_seq)-ordered seen+registry adds
            (simulator.merge_externals — same code) → arrival rows
  work_{r+1} = active states ∪ arrivals

Termination: no active states and no arrivals.  The whole loop is
restartable from the last complete round (``resume=True``): seen shards
snapshot to the round dir, states/arrivals are Parquet.

Scale notes (SURVEY §4):
  * the only per-round shuffles are groupby(host) over per-host STATE rows
    (small blobs) and groupby(shard) over candidate rows — page payloads
    never shuffle; they are read selectively per host from the bucketed
    store and reduced to links/targets/text inside the group task.
  * skew: a mega-host serializes its own turn (politeness semantics — the
    reference does the same); its per-round work is bounded by the
    politeness budget, so wall-clock per round is bounded; the order-free
    throughput path for bulk processing is ``crawl_bfs`` (bulk.py).
  * seen shards are tiny actors (num_cpus≈0.25); S ≈ cores/4.

Equivalence gate: per-host visit sequences (with round numbers), the
final URL-seen set, targets and per-URL text bytes must equal
``simulator.simulate_rounds`` exactly — tests/test_ray_crawl.py.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional, Sequence, Tuple

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..config import EngineConfig
from ..state.seen import make_seen_pool, shard_of
from .simulator import (CrawlResult, merge_externals,
                        plan_seed_hosts, register_seed_hosts, run_host_round)

# result-row schema (mixed kinds; unused fields null)
RESULT_FIELDS = ["kind", "host", "url", "depth", "seq", "name", "n",
                 "src_host", "src_seq", "payload"]
RESULT_SCHEMA = pa.schema(
    [
        ("kind", pa.string()),
        ("host", pa.string()),
        ("url", pa.string()),
        ("depth", pa.int32()),
        ("seq", pa.int64()),
        ("name", pa.string()),
        ("n", pa.int64()),
        ("src_host", pa.string()),
        ("src_seq", pa.int64()),
        ("payload", pa.large_binary()),
    ]
)


def _rows_table(rows: List[dict]) -> pa.Table:
    cols = {f: [r.get(f) for r in rows] for f in RESULT_FIELDS}
    return pa.table(cols, schema=RESULT_SCHEMA)


class _PoolFacade:
    """try_add_batch / try_add_seq over shard actor handles, usable inside
    map_groups workers (handles serialize with the closure).

    ``claimant`` (the crawling host, set by HostTurnStep) tags every
    turn-time add so shards can log same-round claims per key — the
    raw material for the driver's deterministic conflict replay (see
    SeenShardActor docstring).  Merge/registry paths leave it None."""

    def __init__(self, actors, claimant: Optional[str] = None):
        self.actors = actors
        self.num_shards = len(actors)
        self.claimant = claimant

    def try_add_batch(self, host_norm: str, keys):
        import ray

        a = self.actors[shard_of(host_norm, self.num_shards)]
        return ray.get(a.try_add_batch.remote(list(keys), self.claimant))

    def try_add_runs(self, runs):
        """[(host_norm, keys), ...] → [verdicts, ...]: submit every run's
        shard RPC first (per-actor submission order = add order, so the
        ordered-adds invariant holds), then block ONCE for all — a page
        touching k keyspaces costs one round-trip instead of k."""
        import ray

        futs = [
            self.actors[shard_of(h, self.num_shards)]
            .try_add_batch.remote(list(keys), self.claimant)
            for h, keys in runs
        ]
        return ray.get(futs)

    def try_add_seq(self, pairs):
        import ray

        by_shard: Dict[int, List[int]] = {}
        for i, (h, _k) in enumerate(pairs):
            by_shard.setdefault(shard_of(h, self.num_shards), []).append(i)
        futs = {
            s: self.actors[s].try_add_ordered.remote([pairs[i][1] for i in idxs])
            for s, idxs in by_shard.items()
        }
        out = [False] * len(pairs)
        for s, idxs in by_shard.items():
            import ray

            for i, ok in zip(idxs, ray.get(futs[s])):
                out[i] = ok
        return out


# process-level caches: Ray reuses worker processes across tasks, so the
# parsed config and the page-store handle stay warm with plain task UDFs —
# no per-round actor-pool startup (measured: ~1-2 s/round saved)
_TURN_CACHE: Dict = {}


def _turn_ctx(cfg_blob: bytes, store_dir: str, num_buckets: int):
    key = (cfg_blob, store_dir, num_buckets)
    ctx = _TURN_CACHE.get(key)
    if ctx is None:
        from ..sources.pagestore import HostFetcher

        ctx = (pickle.loads(cfg_blob), HostFetcher(store_dir, num_buckets))
        _TURN_CACHE[key] = ctx
    return ctx


class HostTurnStep:
    """map_groups UDF: one host's politeness turn.  A plain callable whose
    heavy state (config, page-store handle) is cached per worker process;
    constructed per round on the driver (cheap), shipped by value."""

    __name__ = "HostTurnStep"  # ray's map_groups wraps plain callables

    def __init__(self, cfg_blob: bytes, store_dir: str, num_buckets: int,
                 actors, round_num: int, crawler: Optional[str]):
        self.cfg_blob = cfg_blob
        self.store_dir = store_dir
        self.num_buckets = num_buckets
        self.actors = actors
        self.round_num = round_num
        self.crawler = crawler

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        host = df["host"].iloc[0]
        # deferred fast path — NO unpickle, no fetcher: a state row whose
        # due-round (column n, from the politeness clock) is beyond this
        # round re-emits unchanged; its turn would be an exact no-op
        # (run_turn returns before popping anything).  Routing deferred
        # hosts through the same groupby replaces the old separate
        # due/deferred filter executions per round.
        if len(df) == 1 and df["kind"].iloc[0] == "state":
            n_due = df["n"].iloc[0]
            if n_due is not None and not pd.isna(n_due) \
                    and int(n_due) > self.round_num:
                row = {f: df[f].iloc[0] for f in RESULT_FIELDS}
                for f in ("depth", "seq", "n", "src_seq"):
                    row[f] = None if pd.isna(row[f]) else int(row[f])
                for f in ("url", "src_host", "name"):
                    if row[f] is not None and pd.isna(row[f]):
                        row[f] = None
                return _rows_table([row])
        self.cfg, self.fetch = _turn_ctx(self.cfg_blob, self.store_dir,
                                         self.num_buckets)
        self.pool = _PoolFacade(self.actors, claimant=host)
        state = None
        seeds: Optional[List[str]] = None
        arrivals: Optional[List[Tuple]] = None
        seq_base = 0
        for kind_df, kind in ((df[df["kind"] == k], k)
                              for k in ("state", "seed", "arrival")):
            if kind_df.empty:
                continue
            if kind == "state":
                blob = pickle.loads(kind_df["payload"].iloc[0])
                state, seq_base = blob["state"], blob["visit_seq"]
            elif kind == "seed":
                s = kind_df.sort_values("seq")
                seeds = [r for r in s["url"]]
            else:
                s = kind_df.sort_values(["src_host", "src_seq"])
                arrivals = [pickle.loads(b) for b in s["payload"]]
        if state is not None:
            seeds = arrivals = None  # state wins; late arrivals dropped

        new_state, log, status = run_host_round(
            self.cfg, self.fetch, self.pool, state, seeds, arrivals,
            self.crawler, self.round_num,
        )

        rows: List[dict] = []

        def add(kind: str, **kw) -> None:
            r = {f: None for f in RESULT_FIELDS}
            r.update(kind=kind, host=host, **kw)
            rows.append(r)

        for i, (url, _h, depth) in enumerate(log.visits):
            add("visit", url=url, depth=depth, seq=seq_base + i,
                n=self.round_num)
        for t in log.targets:
            # n = round number → the ft_* sink's ``date`` column (the
            # master's received-date; first-round-wins dedup in sinks)
            add("target", url=t["url"], name=t["filetype"],
                n=self.round_num,
                payload=pickle.dumps({"url_hash": t["url_hash"],
                                      "attrs": t["attrs"]}))
        for url, buf in log.texts:
            add("text", url=url, payload=buf)
        for name, n in log.ft_counts.items():
            add("count", name=name, n=n)
        for i, c in enumerate(log.ext_candidates):
            add("cand", src_host=host, src_seq=i,
                seq=shard_of(c.url.host_norm, self.pool.num_shards),
                payload=pickle.dumps(c))
        # n = the first round in which this host's politeness clock allows
        # another transfer — the driver DEFERS the host until then (its
        # turn would be an exact no-op: run_turn returns before popping
        # anything when the clock is past the window)
        due_round = int(new_state.get("clock", 0.0) // self.cfg.round_seconds)
        add("state", name=status, n=due_round,
            payload=pickle.dumps({"state": new_state,
                                  "visit_seq": seq_base + len(log.visits)}))
        return _rows_table(rows)


class MergeStep:
    """map_groups UDF over one SHARD's external candidates: the
    deterministic round barrier (simulator.merge_externals — same code,
    same order) producing arrival rows.  Plain callable (task UDF)."""

    __name__ = "MergeStep"  # ray's map_groups wraps plain callables

    def __init__(self, cfg_blob: bytes, actors):
        self.cfg_blob = cfg_blob
        self.actors = actors

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        self.cfg = pickle.loads(self.cfg_blob)
        self.pool = _PoolFacade(self.actors)
        cands = [
            (r.src_host, int(r.src_seq), pickle.loads(r.payload))
            for r in df.itertuples()
        ]
        arrivals = merge_externals(self.pool, cands, self.cfg)
        rows: List[dict] = []
        for host, items in arrivals.items():
            for i, (u, bind, crawler) in enumerate(items):
                r = {f: None for f in RESULT_FIELDS}
                # src ordering is already applied; keep arrival order via seq
                r.update(kind="arrival", host=host, src_host="", src_seq=i,
                         payload=pickle.dumps((u, bind, crawler)))
                rows.append(r)
        return _rows_table(rows)


def _write_round(ds, round_dir: str) -> None:
    ds.write_parquet(os.path.join(round_dir, "result"))


_TURN_TASK = None


def _get_turn_task():
    """Lazy ray.remote wrapper so importing this module never needs Ray."""
    global _TURN_TASK
    if _TURN_TASK is None:
        import ray

        @ray.remote(num_cpus=1)
        def turn_task(step: HostTurnStep, df: pd.DataFrame):
            return step(df)

        _TURN_TASK = turn_task
    return _TURN_TASK


# Below this many work rows the round runs on the DIRECT-TASK path: the
# driver reads the (local, small) state/arrival parquet, fans out one Ray
# task per host, concatenates, and writes the identical checkpoint layout
# — zero Dataset executions, saving the fixed per-execution sort/schedule
# machinery (~1 s/round) that dominates small crawls.  Above it, the
# Dataset-native path streams Parquet → groupby(host) → Parquet and the
# driver holds only counters (the 10^8-host shape).  Same kernel, same
# deterministic merge, same lineage either way.
SMALL_WORK_ROWS = 20_000

# Same-round seen-claim replay cap; realistic conflicts converge in 2
# iterations (1 optimistic + 1 forced) — the cap guards pathological
# claim-set oscillation, after which the small path serializes.
MAX_ROUND_REPLAYS = 8


def _reconcile_claims(claims_by_shard, forced_used):
    """Fold per-shard round-claim logs into the next forced-verdict maps.

    For every contested round-local key the deterministic winner is the
    lexicographically smallest claimant host (the sequential model's
    sorted-host turn order, simulator.py:284).  Returns
    ``(new_forced_by_shard, converged)``: converged means every contested
    key's forced winner already equals the min claimant of THIS run (a
    fixpoint — the run's outcome equals the sequential execution)."""
    converged = True
    new_forced = []
    for shard_claims, used in zip(claims_by_shard, forced_used):
        nf = {}
        for k, claimants in shard_claims.items():
            if not claimants:
                continue  # stale forced key nobody claimed — drop it
            win = min(claimants)
            if len(claimants) >= 2 or k in used:
                nf[k] = win
                if used.get(k) != win:
                    converged = False
        new_forced.append(nf)
    return new_forced, converged


def _work_table_local(round_dir: str) -> pa.Table:
    """The next round's work rows read LOCALLY (small-mode only)."""
    import glob

    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    parts = []
    files = _result_files(round_dir)
    if files:
        t = pads.dataset(files).to_table(
            filter=(pc.field("kind") == "state")
            & (pc.field("name") != "exhausted"),
            columns=RESULT_FIELDS)
        if t.num_rows:
            parts.append(t)
    for sub in ("arrivals", "deferred"):
        d = os.path.join(round_dir, sub)
        fs = sorted(glob.glob(os.path.join(d, "*.parquet")))
        if fs:
            t = pads.dataset(fs).to_table(columns=RESULT_FIELDS)
            if t.num_rows:
                parts.append(t)
    if not parts:
        return _rows_table([])
    return pa.concat_tables([p.cast(RESULT_SCHEMA) for p in parts])


def _read_kind(round_dir: str, kind: str, columns=None):
    import pyarrow.dataset as pads

    path = os.path.join(round_dir, "result")
    d = pads.dataset(path)
    import pyarrow.compute as pc

    return d.to_table(filter=pc.field("kind") == kind, columns=columns)


def crawl_rounds(
    cfg: EngineConfig,
    pages_dir: str,
    seeds: Sequence[str],
    crawler: Optional[str] = None,
    *,
    ckpt_dir: str,
    resume: bool = False,
    num_shards: int = 8,
    seen_mode: str = "exact",
    num_buckets: int = 32,
    concurrency: int = 8,  # accepted for API compat; turns are task-based
    max_rounds: int = 1000,
    prune_snapshots: bool = False,
) -> str:
    """Run the crawl; returns ckpt_dir (read the outputs as Datasets via
    visits_ds/targets_ds/texts_ds/ft_counts_ds, or fold with
    collect_result at test scale).  Ray must already be initialized by
    the caller (driver contract)."""
    import ray.data

    from ..sources.pagestore import build_store

    store_dir = build_store(pages_dir, num_buckets=num_buckets)
    cfg_blob = pickle.dumps(cfg)
    pool = make_seen_pool(num_shards=num_shards, mode=seen_mode)

    os.makedirs(ckpt_dir, exist_ok=True)
    start_round = 0
    work = None  # ray Dataset of RESULT_SCHEMA rows (state/seed/arrival)

    if resume:
        done_rounds = sorted(
            d for d in os.listdir(ckpt_dir)
            if d.startswith("round_")
            and os.path.exists(os.path.join(ckpt_dir, d, "_COMPLETE"))
        )
        # resume from the latest complete round that still has its seen
        # snapshots (older rounds may have been pruned)
        while done_rounds:
            last = os.path.join(ckpt_dir, done_rounds[-1])
            if os.path.exists(os.path.join(last, "seen_0.bin")):
                break
            done_rounds.pop()
        if done_rounds:
            last = os.path.join(ckpt_dir, done_rounds[-1])
            start_round = int(done_rounds[-1].split("_")[1]) + 1
            pool.restore_from_dir(last)
            work = _work_ds(last)

    if work is None and start_round == 0:
        by_host = plan_seed_hosts(cfg, seeds, crawler)
        register_seed_hosts(pool, list(by_host))
        rows = []
        for host, urls in by_host.items():
            for i, u in enumerate(urls):
                row = {f: None for f in RESULT_FIELDS}
                row.update(kind="seed", host=host, url=u, seq=i)
                rows.append(row)
        work_local_tbl = _rows_table(rows)
        n_seed_rows = len(rows)
        work = ray.data.from_arrow(work_local_tbl)

    # The work flow is DATASET-NATIVE end to end: host states stream
    # Parquet → groupby(host) shuffle → Parquet.  The driver holds only a
    # handful of per-round scalars (active states, earliest due round,
    # candidate count) folded from one cheap pass over the round's
    # materialized result blocks — at 10^8-host scale the state table
    # never materializes in driver memory.
    #
    # Per-round Ray executions (the old loop ran 4-6): ONE heavy
    # groupby(host) turn pass (deferred hosts route through it on a
    # no-unpickle fast path), one summary fold, and — only in rounds that
    # produced external candidates — one shard-groupby merge.
    import pyarrow.compute as pc

    def _summarize(t: pa.Table) -> pa.Table:
        is_state = pc.equal(t.column("kind"), "state")
        active = pc.and_kleene(
            is_state, pc.invert(pc.equal(t.column("name"), "exhausted")))
        act_n = t.filter(pc.fill_null(active, False)).column("n")
        n_cand = pc.sum(
            pc.cast(pc.equal(t.column("kind"), "cand"), pa.int64())
        ).as_py() or 0
        n_active = len(act_n)
        min_due = pc.min(act_n).as_py() if n_active else None
        return pa.table({
            "n_active": pa.array([n_active], pa.int64()),
            "min_due": pa.array([min_due], pa.int64()),
            "n_cand": pa.array([n_cand], pa.int64()),
        })

    import ray

    ext_on = cfg.crawlers[crawler or cfg.default_crawler].external
    r = start_round
    first = True
    n_work: Optional[int] = None  # rows of work (from last round's summary)
    prev_round_dir: Optional[str] = None
    try:
        n_work = n_seed_rows  # round 0: work rows were built on the driver
    except NameError:
        work_local_tbl = None  # resume: first round decides via count()

    while r < max_rounds and work is not None:
        small = n_work is not None and n_work <= SMALL_WORK_ROWS
        if first and not small:
            # entry/resume: one count to know whether there is work at all
            work = work.materialize()
            n0 = work.count()
            if n0 == 0:
                break
            small = n0 <= SMALL_WORK_ROWS
        first = False

        round_dir = os.path.join(ckpt_dir, f"round_{r:04d}")

        # ROUND-LEVEL ATOMICITY (SURVEY §7 "seen-set consistency under
        # retries"): seen try_add is not idempotent, so turn tasks must
        # not retry individually (max_retries=0); instead a failed round
        # restores every shard from the round-START snapshot and re-runs
        # whole — the deterministic merge order makes the replay
        # byte-identical.
        #
        # The same restore/replay machinery also resolves SAME-ROUND
        # cross-host seen races deterministically: the synchronous
        # ignore_host / epeek verdicts (hostloop.py "keep-in-place")
        # are RPC-arrival-ordered under concurrency, but the sequential
        # model processes hosts in sorted order (simulator.py:284), so
        # the deterministic winner of a contested round-local key is the
        # lexicographically SMALLEST claimant host.  Shards log claims
        # per round; if any key got ≥2 distinct claimants, the round is
        # replayed with a forced-verdict table (winner = min claimant),
        # iterated to fixpoint — any fixpoint equals the sequential
        # outcome (the smallest host's run depends on nothing, induction
        # up the order).  Conflict-free rounds (the common case: a
        # conflict needs two hosts reaching the SAME in-place-crawled
        # URL in the SAME round) cost one extra RPC per shard.  If the
        # fixpoint iteration hits its cap, the small path falls back to
        # running turns one-at-a-time in sorted order (trivially the
        # sequential semantics).
        pre_round_seen = pool.snapshots()
        forced = [dict() for _ in range(num_shards)]
        err_tries = 0
        replays = 0
        serialize = False
        while True:
            try:
                import shutil as _sh

                pool.begin_round(forced)
                _sh.rmtree(round_dir, ignore_errors=True)
                os.makedirs(round_dir, exist_ok=True)

                if small:
                    # ---- DIRECT-TASK round: local work table → one Ray
                    # task per host → local concat/summary/merge; writes
                    # the identical checkpoint layout
                    if prev_round_dir is not None:
                        wdf = _work_table_local(prev_round_dir).to_pandas()
                    elif work_local_tbl is not None:
                        wdf = work_local_tbl.to_pandas()
                    else:
                        # resume entry: work was just materialized/counted
                        wdf = work.to_pandas()
                    if wdf.empty:
                        n_active, n_cand, min_due = 0, 0, None
                        n_arr = 0
                        arrivals_scheduled = False
                        os.makedirs(os.path.join(round_dir, "result"),
                                    exist_ok=True)
                        pq.write_table(_rows_table([]), os.path.join(
                            round_dir, "result", "part-0.parquet"))
                        break
                    step = HostTurnStep(cfg_blob, store_dir, num_buckets,
                                        pool.actors, r, crawler)
                    task = _get_turn_task()
                    groups = wdf.groupby("host", sort=True)
                    if serialize:
                        tables = [ray.get(task.remote(step, g))
                                  for _h, g in groups]
                    else:
                        futs = [task.remote(step, g) for _h, g in groups]
                        tables = ray.get(futs)
                    results_tbl = pa.concat_tables(tables)
                    os.makedirs(os.path.join(round_dir, "result"),
                                exist_ok=True)
                    pq.write_table(results_tbl, os.path.join(
                        round_dir, "result", "part-0.parquet"))

                    s = _summarize(results_tbl).to_pylist()[0]
                    n_active, n_cand = s["n_active"], s["n_cand"]
                    min_due = s["min_due"]

                    arrivals_scheduled = False
                    n_arr = 0
                    if n_cand:
                        mask = pc.equal(results_tbl.column("kind"), "cand")
                        ct = results_tbl.filter(mask)
                        cands = [
                            (h, int(q), pickle.loads(p)) for h, q, p in zip(
                                ct.column("src_host").to_pylist(),
                                ct.column("src_seq").to_pylist(),
                                ct.column("payload").to_pylist())
                        ]
                        arr_map = merge_externals(_PoolFacade(pool.actors),
                                                  cands, cfg)
                        rows = []
                        for host, items in sorted(arr_map.items()):
                            for i, item in enumerate(items):
                                row = {f: None for f in RESULT_FIELDS}
                                row.update(kind="arrival", host=host,
                                           src_host="", src_seq=i,
                                           payload=pickle.dumps(item))
                                rows.append(row)
                        sub = ("arrivals" if ext_on
                               else "arrivals_unscheduled")
                        os.makedirs(os.path.join(round_dir, sub),
                                    exist_ok=True)
                        pq.write_table(_rows_table(rows), os.path.join(
                            round_dir, sub, "part-0.parquet"))
                        n_arr = len(rows)
                        arrivals_scheduled = ext_on and n_arr > 0
                else:
                    # ---- DATASET-NATIVE round (the 10^8-host shape)
                    results = work.groupby("host").map_groups(
                        HostTurnStep(cfg_blob, store_dir, num_buckets,
                                     pool.actors, r, crawler),
                        batch_format="pandas",
                        num_cpus=1,
                        max_retries=0,
                    ).materialize()
                    _write_round(results, round_dir)

                    # one summary fold over the materialized result blocks
                    # — replaces the old count()/min() probe executions
                    summ = results.map_batches(
                        _summarize, batch_format="pyarrow").take_all()
                    n_active = sum(s["n_active"] for s in summ)
                    n_cand = sum(s["n_cand"] for s in summ)
                    dues = [s["min_due"] for s in summ
                            if s["min_due"] is not None]
                    min_due = min(dues) if dues else None

                    arrivals_scheduled = False
                    n_arr = 0
                    if n_cand:
                        # round barrier: merge external candidates per
                        # shard (kind=cand rows carry shard id in `seq`);
                        # candidates stream result-blocks → shard-groupby
                        # → Parquet, never through the driver
                        cand_ds = _read_kind_ds(round_dir, "cand")
                        arrivals = cand_ds.groupby("seq").map_groups(
                            MergeStep(cfg_blob, pool.actors),
                            batch_format="pandas",
                            num_cpus=0.5,
                            max_retries=0,
                        )
                        # Arrival rows only SCHEDULE when the active
                        # crawler has external=True — simulate_rounds
                        # gates new_hosts the same way, and the reference
                        # pops pending hosts only under LM_CRFLAG_EXTERNAL
                        # (worker.c:255).  The merge itself always runs:
                        # its ordered seen/registry adds are part of the
                        # seen-set semantics.
                        sub = ("arrivals" if ext_on
                               else "arrivals_unscheduled")
                        arrivals = arrivals.materialize()
                        arrivals.write_parquet(os.path.join(round_dir, sub))
                        n_arr = arrivals.count()
                        arrivals_scheduled = ext_on and n_arr > 0
            except Exception:
                err_tries += 1
                if err_tries >= 3:
                    pool.shutdown()
                    raise
                pool.restore(pre_round_seen)
                continue

            if serialize:
                break  # sorted one-at-a-time execution IS the sim order
            forced, converged = _reconcile_claims(pool.round_claims(), forced)
            if converged:
                break
            replays += 1
            pool.restore(pre_round_seen)
            if replays >= MAX_ROUND_REPLAYS:
                if not small:
                    pool.shutdown()
                    raise RuntimeError(
                        "same-round seen-claim replay did not converge")
                serialize = True
                forced = [dict() for _ in range(num_shards)]

        # snapshot seen shards (resume lineage) — shard-parallel writes
        pool.snapshot_to_dir(round_dir)
        with open(os.path.join(round_dir, "_COMPLETE"), "w") as f:
            f.write("ok")
        if prune_snapshots:
            # drop older seen snapshots (the heavy part of the checkpoint;
            # resume reads the latest round that still has them) — keep 2
            complete = sorted(
                d for d in os.listdir(ckpt_dir)
                if d.startswith("round_")
                and os.path.exists(os.path.join(ckpt_dir, d, "_COMPLETE"))
            )
            for old in complete[:-2]:
                for i in range(num_shards):
                    sp = os.path.join(ckpt_dir, old, f"seen_{i}.bin")
                    if os.path.exists(sp):
                        os.remove(sp)

        if n_active == 0 and not arrivals_scheduled:
            break
        prev_round_dir = round_dir
        n_work = n_active + (n_arr if arrivals_scheduled else 0)
        work = _work_ds(round_dir)
        # politeness fast-forward: with no freshly-scheduled arrivals
        # (those are due immediately), the next round anything happens in
        # is the earliest state due-round — skipped rounds are empty in
        # the sequential model too, so visit rounds/seqs are unaffected
        if arrivals_scheduled or min_due is None:
            r += 1
        else:
            r = max(r + 1, int(min_due))

    pool.shutdown()
    return ckpt_dir


def _result_files(round_dir: str) -> List[str]:
    import glob

    return sorted(glob.glob(os.path.join(round_dir, "result", "*.parquet")))


def _read_kind_ds(round_dir: str, kind: str, extra_filter=None):
    """Lazy Dataset over one kind of result row (Parquet filter pushdown)."""
    import pyarrow.compute as pc
    import ray.data

    files = _result_files(round_dir)
    if not files:
        return None
    flt = pc.field("kind") == kind
    if extra_filter is not None:
        flt = flt & extra_filter
    return ray.data.read_parquet(files, filter=flt, columns=RESULT_FIELDS)


def _work_ds(round_dir: str):
    """Next round's work as a LAZY dataset: ACTIVE states (status !=
    exhausted) ∪ arrivals ∪ deferred states."""
    import glob

    import pyarrow.compute as pc
    import ray.data

    parts = []
    st = _read_kind_ds(round_dir, "state",
                       extra_filter=(pc.field("name") != "exhausted"))
    if st is not None:
        parts.append(st)
    for sub in ("arrivals", "deferred"):
        d = os.path.join(round_dir, sub)
        if os.path.isdir(d):
            files = sorted(glob.glob(os.path.join(d, "*.parquet")))
            if files:
                parts.append(ray.data.read_parquet(files,
                                                   columns=RESULT_FIELDS))
    if not parts:
        return None
    ds = parts[0]
    for p2 in parts[1:]:
        ds = ds.union(p2)
    return ds


def _complete_round_files(ckpt_dir: str) -> List[str]:
    import glob

    rounds = sorted(
        d for d in os.listdir(ckpt_dir)
        if d.startswith("round_")
        and os.path.exists(os.path.join(ckpt_dir, d, "_COMPLETE"))
    )
    return [
        f for d in rounds
        for f in sorted(glob.glob(os.path.join(ckpt_dir, d, "result",
                                               "*.parquet")))
    ]


def _kind_ds(ckpt_dir: str, kind: str):
    import pyarrow.compute as pc
    import ray.data

    files = _complete_round_files(ckpt_dir)
    return ray.data.read_parquet(files, filter=pc.field("kind") == kind,
                                 columns=RESULT_FIELDS)


def visits_ds(ckpt_dir: str):
    """(url, host, depth, round_num, seq) as a lazy Dataset over the
    checkpoint Parquet — the query path at scale; nothing folds through
    the driver (VERDICT r1: collect_result is test-scale only)."""
    import pyarrow.compute as pc

    def conv(t: pa.Table) -> pa.Table:
        return pa.table({
            "url": t.column("url"),
            "host": t.column("host"),
            "depth": pc.cast(t.column("depth"), pa.int64()),
            "round_num": pc.cast(t.column("n"), pa.int64()),
            "seq": pc.cast(t.column("seq"), pa.int64()),
        })

    return _kind_ds(ckpt_dir, "visit").map_batches(
        conv, batch_format="pyarrow")


def targets_ds(ckpt_dir: str):
    """(url, url_hash, filetype) Dataset (payload unpickled in tasks)."""
    def conv(t: pa.Table) -> pa.Table:
        hashes = [pickle.loads(p)["url_hash"]
                  for p in t.column("payload").to_pylist()]
        return pa.table({
            "url": t.column("url"),
            "url_hash": pa.array(hashes, pa.string()),
            "filetype": t.column("name"),
        })

    return _kind_ds(ckpt_dir, "target").map_batches(
        conv, batch_format="pyarrow")


def texts_ds(ckpt_dir: str):
    """(url, text) Dataset — text bytes decoded surrogateescape."""
    def conv(t: pa.Table) -> pa.Table:
        texts = [(p or b"").decode("utf-8", "surrogateescape")
                 for p in t.column("payload").to_pylist()]
        return pa.table({
            "url": t.column("url"),
            "text": pa.array(texts, pa.string()),
        })

    return _kind_ds(ckpt_dir, "text").map_batches(conv, batch_format="pyarrow")


def ft_counts_ds(ckpt_dir: str):
    """(filetype, n) Dataset — distributed sum over per-turn counters."""
    from ._util import rename as _rename

    ds = _kind_ds(ckpt_dir, "count").groupby("name").sum("n")
    out = _rename(ds, {"name": "filetype", "sum(n)": "n"})
    return out.select_columns(["filetype", "n"])


def collect_result(ckpt_dir: str) -> CrawlResult:
    """Fold all round dirs into a CrawlResult (driver-side, test scale)."""
    res = CrawlResult()
    rounds = sorted(
        d for d in os.listdir(ckpt_dir)
        if d.startswith("round_")
        and os.path.exists(os.path.join(ckpt_dir, d, "_COMPLETE"))
    )
    for rd in rounds:
        round_dir = os.path.join(ckpt_dir, rd)
        rn = int(rd.split("_")[1])
        vis = _read_kind(round_dir, "visit").to_pylist()
        for v in sorted(vis, key=lambda x: (x["host"], x["seq"])):
            res.visits.append((v["url"], v["host"], v["depth"],
                               int(v["n"]), int(v["seq"])))
        for t in _read_kind(round_dir, "target").to_pylist():
            p = pickle.loads(t["payload"])
            res.targets.append({"url": t["url"], "url_hash": p["url_hash"],
                                "filetype": t["name"], "attrs": p["attrs"]})
        for t in _read_kind(round_dir, "text").to_pylist():
            res.texts[t["url"]] = t["payload"]
        for c in _read_kind(round_dir, "count").to_pylist():
            res.ft_counts[c["name"]] = res.ft_counts.get(c["name"], 0) + int(c["n"])
        res.rounds = rn + 1
    return res
