"""Pure-Python reference simulators (no Ray) — the golden oracles.

``simulate_single_worker`` is the direct, sequential transcription of the
reference's one-thread crawl (lm_worker_main, worker.c:214-407, plus the
global pending-host LIFO stack urlengine.c:566-645): the behavior SURVEY.md
§3.2 calls "fully deterministic" — this produces golden visit order / seen
set / targets / extracted text for unit tests.

``simulate_rounds`` is the sequential model of the DISTRIBUTED engine
(pipelines/crawl.py): politeness rounds with per-host transfer budgets and
deterministic round-barrier merging of external links.  The Ray pipeline
must match it EXACTLY (per-host visit sequences incl. round numbers, seen
set, targets, text bytes) — that parity is the correctness gate for the
distributed orchestration.

Both share the kernel in ``hostloop.py``; the semantics difference between
the two modes is documented in hostloop's module docstring.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field, replace as dc_replace
from typing import Dict, List, Optional, Sequence, Tuple

from ..config import EngineConfig
from ..state.seen import LocalSeenPool
from .hostloop import (CrawlKernel, ExtCandidate, TurnLog, UrlRow,
                       budget_for)  # noqa: F401 (re-export)


@dataclass
class CrawlResult:
    # (url, host, depth, round, seq) — seq is per-host visit index; in
    # single-worker mode round is always 0 and seq is the GLOBAL order.
    visits: List[Tuple[str, str, int, int, int]] = field(default_factory=list)
    targets: List[dict] = field(default_factory=list)
    texts: Dict[str, bytes] = field(default_factory=dict)
    ft_counts: Dict[str, int] = field(default_factory=dict)
    seen_size: int = 0
    rounds: int = 0

    def visits_by_host(self) -> Dict[str, List[str]]:
        out: Dict[str, List[str]] = {}
        for url, host, _d, _r, _s in self.visits:
            out.setdefault(host, []).append(url)
        return out


@dataclass
class _HostEnt:
    """struct host_ent for the single-worker simulator."""

    host: str
    parked: List[Tuple] = field(default_factory=list)  # (URL, bind)
    rfetched: bool = False
    robots_obj: object = None


def _merge_log(result: CrawlResult, log: TurnLog, round_num: int,
               seq_base: Dict[str, int]) -> None:
    for url, host, depth in log.visits:
        seq = seq_base.get(host, 0)
        seq_base[host] = seq + 1
        result.visits.append((url, host, depth, round_num, seq))
    result.targets.extend(log.targets)
    for url, buf in log.texts:
        result.texts[url] = buf
    for k, v in log.ft_counts.items():
        result.ft_counts[k] = result.ft_counts.get(k, 0) + v


# ---------------------------------------------------------------------------
# single-worker reference mode


def simulate_single_worker(cfg: EngineConfig, fetcher, seeds: Sequence[str],
                           crawler: Optional[str] = None) -> CrawlResult:
    seen = LocalSeenPool(num_shards=1, mode="exact")
    host_ents: Dict[str, _HostEnt] = {}
    pending: List[str] = []  # LIFO of host names (ue_push/pop_pending)
    result = CrawlResult()
    seq_base: Dict[str, int] = {}

    def ent_of(host: str, add_pending: bool) -> _HostEnt:
        ent = host_ents.get(host)
        if ent is None:
            ent = _HostEnt(host=host)
            host_ents[host] = ent
            if add_pending:
                pending.append(host)
        return ent

    def park(u, bind, _seen_added) -> None:
        # ue_move_to_secondary (urlengine.c:476-502): ue_get_hostent with
        # add_pending=1 — but the ent almost always exists already (created
        # at ue_add's cache-check), so this is a pure list append;
        # creation-push only for seen_check-free parks (redirect targets).
        ent_of(u.host_norm, add_pending=True).parked.append((u, bind))

    def ext_note(host: str) -> None:
        # ue_add external branch: create ent + push pending at ADD time
        # for every external link (urlengine.c:219-232), even links later
        # discarded in sort — pending ORDER follows first-extraction order.
        ent_of(host, add_pending=True)

    k = CrawlKernel(cfg, fetcher, seen, mode="inline", crawler=crawler,
                    inline_park=park, inline_ext_note=ext_note)

    for s in seeds:
        k.ue_add_initial(s)
    # the seed host's ent exists but is NOT pending (it's being crawled)
    ent_of(k.host, add_pending=False)
    k.sort_initial()

    while True:
        k.run_turn(budget=None)
        # save the current host's robots state back to its ent
        cur = ent_of(k.host, add_pending=False)
        cur.rfetched, cur.robots_obj = k.rfetched, k.robots
        if k.crawler.external and pending:
            # ue_pop_pending + ue_set_hostent (worker.c:253-261)
            host = pending.pop()
            ent = host_ents[host]
            k.utable.append([
                UrlRow(
                    dc_replace(u, is_external=False)
                    if cfg.clear_external_on_activate else u,
                    b,
                )
                for (u, b) in ent.parked
            ])
            k.list_priv.append(None)
            ent.parked = []
            k.depth_counter = 0
            k.host = host
            k.rfetched, k.robots = ent.rfetched, ent.robots_obj
            continue
        break

    _merge_log(result, k.log, 0, seq_base)
    result.seen_size = seen.size()
    result.rounds = 1
    return result


# ---------------------------------------------------------------------------
# politeness-rounds mode (sequential model of the Ray engine)


def plan_seed_hosts(cfg: EngineConfig, seeds: Sequence[str],
                    crawler: Optional[str] = None) -> Dict[str, List[str]]:
    """Group seed strings by normalized host, preserving order."""
    from ..functions.urlkit import strtourl, url_set

    by_host: Dict[str, List[str]] = {}
    for s in seeds:
        u = url_set(strtourl(s))
        if u is None:
            continue
        by_host.setdefault(u.host_norm, []).append(s)
    return by_host


def run_host_round(cfg: EngineConfig, fetcher, seen_pool, state: Optional[dict],
                   seeds: Optional[List[str]], arrivals: Optional[List[Tuple]],
                   crawler: Optional[str],
                   round_num: int = 0) -> Tuple[dict, TurnLog, str]:
    """One host's turn in one round — THE shared step function: the
    sequential simulator calls it directly; the Ray pipeline calls it
    inside the per-host map_groups stage.  ``seen_pool`` exposes
    ``try_add_batch(host, keys)`` (LocalSeenPool or the Ray actor-pool
    facade).  Returns (new_state, log, status)."""
    k = CrawlKernel(cfg, fetcher, seen_pool, mode="rounds", crawler=crawler)
    if state is not None:
        k.load_state(state)
    elif seeds is not None:
        for s in seeds:
            k.ue_add_initial(s)
        k.sort_initial()
        k.activated = True
    else:
        # host created by external arrivals: parked list becomes the root
        # list (ue_set_hostent, urlengine.c:348-368)
        k.utable = [[
            UrlRow(
                dc_replace(u, is_external=False)
                if cfg.clear_external_on_activate else u,
                b,
            )
            for (u, b, _cr) in arrivals
        ]]
        k.list_priv = [arrivals[0][2] if arrivals else None]
        k.host = arrivals[0][0].host_norm if arrivals else ""
        k.depth_counter = 0
        k.activated = True
        if arrivals and arrivals[0][2]:
            k.crawler_name = arrivals[0][2]
            k.depth_limit = k.crawler.depth_limit
    rs = float(cfg.round_seconds)
    k.window = (round_num * rs, (round_num + 1) * rs)
    status = k.run_turn(budget="auto")
    return k.state_dict(), k.log, status


def merge_externals(seen_pool, cands: List[Tuple[str, int, ExtCandidate]],
                    cfg: EngineConfig) -> Dict[str, List[Tuple]]:
    """Round barrier: process external candidates in deterministic
    (src_host, emit_seq) order.

    Two ordered passes over disjoint keyspaces (so two pool calls total,
    one RPC per touched shard in the Ray pool):
      1. URL seen-adds for every candidate with ``seen_check`` (ue_add's
         external-branch mtrie_tryadd, urlengine.c:219-232) — losers are
         already crawled/queued and drop out;
      2. host-registry adds for parked winners (ue_get_hostent's
         create→push-pending, urlengine.c:283-338,504-560): a host
         activates at most ONCE; candidates parked to an
         already-activated host are dropped (the reference's
         late-arrival quirk — its pending stack only ever holds
         newly-created hosts).

    Returns {target_host: [(URL, bind, crawler)]} of parked winners for
    NEWLY activated hosts, in candidate order."""
    cands = sorted(cands, key=lambda t: (t[0], t[1]))
    # pass 1: URL keys, ordered
    url_idx = [i for i, (_s, _q, c) in enumerate(cands) if c.seen_check]
    verdicts = seen_pool.try_add_seq(
        [(cands[i][2].url.host_norm, cands[i][2].url.seen_key) for i in url_idx]
    ) if url_idx else []
    url_ok = dict(zip(url_idx, verdicts))
    # pass 2: registry keys for surviving parked candidates, ordered
    from ..state.seen import reg_key

    park_idx = [
        i for i, (_s, _q, c) in enumerate(cands)
        if c.park and (not c.seen_check or url_ok.get(i, False))
    ]
    reg_hosts = [cands[i][2].url.host_norm for i in park_idx]
    reg_new = seen_pool.try_add_seq(
        [(h, reg_key(h)) for h in reg_hosts]
    ) if park_idx else []
    activated_this_round: set = set()
    arrivals: Dict[str, List[Tuple]] = {}
    for i, host, fresh in zip(park_idx, reg_hosts, reg_new):
        if fresh:
            activated_this_round.add(host)
        elif host not in activated_this_round:
            continue  # late arrival to an already-activated host: dropped
        c = cands[i][2]
        arrivals.setdefault(host, []).append((c.url, c.bind, c.crawler))
    return arrivals


def register_seed_hosts(seen_pool, hosts: List[str]) -> None:
    """Seed hosts activate at round 0 (ue_add_initial → ue_set_host)."""
    from ..state.seen import reg_key

    seen_pool.try_add_seq([(h, reg_key(h)) for h in hosts])


def simulate_rounds(cfg: EngineConfig, fetcher, seeds: Sequence[str],
                    crawler: Optional[str] = None, max_rounds: int = 1000,
                    seen_mode: str = "exact", num_shards: int = 8) -> CrawlResult:
    seen = LocalSeenPool(num_shards=num_shards, mode=seen_mode)

    result = CrawlResult()
    seq_base: Dict[str, int] = {}
    states: Dict[str, dict] = {}
    done: set = set()

    by_host = plan_seed_hosts(cfg, seeds, crawler)
    register_seed_hosts(seen, list(by_host))
    new_hosts: Dict[str, dict] = {
        h: {"seeds": urls} for h, urls in by_host.items()
    }

    round_num = 0
    while round_num < max_rounds:
        active = sorted(set(states) - done) + sorted(set(new_hosts) - set(states) - done)
        if not active:
            break
        all_cands: List[Tuple[str, int, ExtCandidate]] = []
        for host in sorted(set(active)):
            init = new_hosts.pop(host, None)
            st = states.get(host)
            new_state, log, status = run_host_round(
                cfg, fetcher, seen, st,
                (init or {}).get("seeds"), (init or {}).get("arrivals"),
                crawler, round_num,
            )
            states[host] = new_state
            _merge_log(result, log, round_num, seq_base)
            for i, c in enumerate(log.ext_candidates):
                all_cands.append((host, i, c))
            if status == "exhausted":
                done.add(host)
        arrivals = merge_externals(seen, all_cands, cfg)
        if cfg.crawlers[crawler or cfg.default_crawler].external:
            for host, rows in sorted(arrivals.items()):
                new_hosts[host] = {"arrivals": rows}
        round_num += 1

    result.seen_size = seen.size()
    result.rounds = round_num
    return result
