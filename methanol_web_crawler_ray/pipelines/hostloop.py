"""The crawl kernel — a faithful transcription of libmetha's worker loop,
parameterized so the SAME semantics drive both execution modes:

* ``inline``  — the single-worker reference simulator
  (``simulator.simulate_single_worker``): one utable spanning hosts, a
  global LIFO pending-host stack, seen-set adds at extraction time —
  byte-for-byte the behavior of ``lm_worker_main`` with one thread.
* ``rounds``  — the distributed politeness-rounds engine: one kernel per
  HOST, a per-round transfer budget, and external links emitted as
  *candidates* that the round driver dedups against the sharded seen pool
  in deterministic ``(round, src_host, emit_seq)`` order (see
  ``pipelines/crawl.py``).  Parallel across hosts, sequential within a
  host — the reference's own one-worker-per-host-at-a-time reality
  (urlengine.c:566-645).

Transcribed functions (reference cites):
  - ue_next / depth handling  ← src/libmetha/urlengine.c:379-435 +
    utable LIFO pop utable.c:142-156 (depth-bounded DFS, siblings in
    reverse extraction order — SURVEY.md §3.2)
  - ue_add                    ← urlengine.c:170-250 (canonicalize →
    seen-check at ADD time; external URLs checked against their own
    host's cache)
  - ue_add_initial            ← urlengine.c:121-150
  - ue_revert (redirects)     ← urlengine.c:158-165
  - ue_move_to_secondary      ← urlengine.c:476-502 (park external URL on
    its host's list; host enters the pending stack only when first
    CREATED — later arrivals to an already-activated host are dropped,
    a faithful reference quirk; ``cfg_late_arrivals='merge'`` relaxes it)
  - main loop                 ← worker.c:214-407 (robots fetch + jail
    capture when primary.sz==2; crawler switching via per-list state_info)
  - lm_worker_perform         ← worker.c:719-920 (jail check → robots
    filter → GET → 20-redirect cap → parser chain → target on
    attrs.changed)
  - lm_worker_sort / bind_url ← worker.c:537-649,665-714 (match → bind,
    swap-with-top compaction — order-sensitive, transcribed exactly)

Documented divergences of ``rounds`` mode from ``inline`` (both rounds
implementations — pure-Python and Ray — agree exactly with each other):
  * external-URL seen-adds are deferred to the round barrier, so a
    duplicate external link stays in the sort list a little longer; the
    swap-with-top compaction can therefore visit same-depth siblings in a
    different order than the single-worker run when cross-host duplicate
    links occur in one round.  Final seen/target SETS are identical.
  * per-filetype counters count duplicate external matches the
    single-worker run would have dropped at add time.
  * the redirect chain counter is per host, not per worker.
  * inline mode faithfully reproduces the reference's pending-stack
    stranding quirk (a host popped with an empty parked list never
    re-enters the stack, so URLs parked onto it later are lost —
    ue_hostent_create pushes only on creation, ue_remove_pending is
    commented out); rounds mode admits a host whenever its FIRST
    candidate merges at the barrier, so it crawls such URLs.  Visit
    SETS can therefore differ between the modes in that interleaving
    (tests/test_simulator.py::test_popped_empty_host_strands_later_park).

"Fetching" is an abstract :class:`Fetcher` — the offline analog of
lm_io_get is a lookup into the Common-Crawl-style pages table (SURVEY §2
J1); a miss models a network failure (M_FAILED → no parse, no visit
output beyond the attempt).
"""

from __future__ import annotations

import hashlib
from collections import Counter
from dataclasses import dataclass, field, replace as dc_replace
from typing import Callable, Dict, List, Optional, Tuple

from ..config import EngineConfig
from ..functions.matchkit import DISCARD, FTIndex, Filetype, POSSIBLE_MATCH
from ..functions.parsechain import AttrList, parse_chain_spec, run_chain
from ..functions.robots import RobotsInfo, parse_robots
from ..functions.urlkit import URL, hostcmp, strtourl, url_combine, url_set

# ---------------------------------------------------------------------------
# fetch abstraction (J1: URL → page row)


@dataclass
class PageRow:
    """One row of the pages table + HTTP metadata (io.h:51-63 analog)."""

    url: str
    status: int = 200
    location: Optional[str] = None
    content_type: Optional[str] = "text/html"
    body: bytes = b""


class DictFetcher:
    """Test/simulator fetcher over an in-memory {canonical_url: PageRow}."""

    def __init__(self, pages: Dict[str, PageRow]):
        self.pages = pages

    def get(self, url: str) -> Optional[PageRow]:
        return self.pages.get(url)

    def head(self, url: str) -> Optional[str]:
        row = self.pages.get(url)
        return row.content_type if row else None


# ---------------------------------------------------------------------------
# URL rows and output log


class UrlRow:
    """url_t in a ulist: canonical URL + filetype binding (url.h:57-76)."""

    __slots__ = ("u", "bind", "ext_cand", "pend")

    def __init__(self, u: URL, bind: int = 0, ext_cand: int = -1):
        self.u = u
        self.bind = bind
        self.ext_cand = ext_cand  # rounds mode: index into TurnLog.ext_candidates
        self.pend = None  # (owning_list, key_host, key) awaiting seen verdict

    def __repr__(self):
        return f"UrlRow({self.u.s!r}, bind={self.bind})"


@dataclass
class ExtCandidate:
    """Rounds mode: an external URL extracted this turn.  The round driver
    seen-checks candidates in (round, src_host, emit_seq) order; ``park``
    is True when bind_url would have parked it (crawler.external and the
    filetype has a parser)."""

    url: URL
    bind: int = 0
    park: bool = False
    seen_check: bool = True  # False for redirect targets (no seen-add, ever)
    crawler: Optional[str] = None


@dataclass
class TurnLog:
    """Everything one kernel run emits (the reference's callbacks)."""

    visits: List[Tuple[str, str, int]] = field(default_factory=list)  # url, host, depth
    targets: List[dict] = field(default_factory=list)
    texts: List[Tuple[str, bytes]] = field(default_factory=list)  # url, final buffer
    ft_counts: Counter = field(default_factory=Counter)
    ext_candidates: List[ExtCandidate] = field(default_factory=list)
    transfers: int = 0


def url_hash(url: str) -> str:
    """SHA1(url) — the nol_url / ft_* key (mn-slaved/client.c:94,626)."""
    return hashlib.sha1(url.encode("utf-8", "surrogateescape")).hexdigest()


def budget_for(cfg: EngineConfig, crawl_delay: Optional[float]) -> Optional[int]:
    """Per-round transfer budget for a host (SURVEY §2 T3 offline model of
    the politeness timer, metha.c:71-79 + robots Crawl-delay extension):
    floor(round_seconds / delay), min 1; None (unbounded) when the
    effective delay is 0 (aggressive mode, no Crawl-delay)."""
    import math

    delay = max(crawl_delay or 0.0, cfg.base_delay)
    if delay <= 0:
        return None
    return max(1, math.floor(cfg.round_seconds / delay))


# ---------------------------------------------------------------------------
# the kernel


class CrawlKernel:
    """One uehandle_t + worker_t worth of state.

    inline mode: spans hosts (host_ents/pending live in the owning
    simulator, passed as callbacks).  rounds mode: pinned to one host;
    externals go to ``log.ext_candidates``.
    """

    def __init__(
        self,
        cfg: EngineConfig,
        fetch,
        seen,
        mode: str,
        crawler: Optional[str] = None,
        # inline-mode hooks (simulator wires these):
        inline_park: Optional[Callable[[URL, int, bool], None]] = None,
        inline_ext_note: Optional[Callable[[str], None]] = None,
    ):
        self.cfg = cfg
        self.fetch = fetch
        # seen pool: .try_add_batch(host_norm, keys) -> List[bool].  The
        # kernel BUFFERS seen-checks and resolves one batch per parsed page
        # (one RPC per page against the host's shard actor, never one per
        # link — the scale-critical batching; verdict order == add order,
        # which preserves the reference's first-occurrence-wins dedup).
        self.seen = seen
        self.mode = mode
        self._pending: List[UrlRow] = []
        self.inline_park = inline_park
        self.inline_ext_note = inline_ext_note
        self.crawler_name = crawler or cfg.default_crawler
        self._ftindex_cache: Dict[str, FTIndex] = {}

        # uehandle_t state
        self.utable: List[List[UrlRow]] = [[]]
        self.list_priv: List[Optional[str]] = [None]  # per-list crawler name
        self.depth_counter = 0
        self.depth_limit = self.crawler.depth_limit
        self.state_info: Optional[str] = None
        self.current: Optional[UrlRow] = None
        self.host: str = ""  # normalized current host (host_ent key)

        # host_ent-ish state (rounds mode: exactly one host's worth)
        self.rfetched = False
        self.robots: Optional[RobotsInfo] = None
        self.activated = False

        # worker_t state
        self.redirects = 0
        self.jail_url: Optional[URL] = None
        # epeek backup state (urlengine.h) — both modes; rounds
        # persists is_peeking/_bk in the host state blob
        self.is_peeking = False
        self._bk: Optional[tuple] = None
        self._peek_list_idx: Optional[int] = None

        # politeness virtual clock (SURVEY §2 T3 / north-star min-heap on
        # next-fetch-time): ``clock`` is this host's next allowed transfer
        # time in virtual seconds; a rounds turn runs inside ``window``
        # [round*round_seconds, (round+1)*round_seconds) and each transfer
        # advances the clock by the effective delay (robots Crawl-delay or
        # the politeness mode's base delay).  Crawl-delay larger than the
        # round window simply defers the host whole rounds.
        self.clock: float = 0.0
        self.window = None  # (start, end) for the current rounds turn

        # rounds-mode extraction dedup memo (see module docstring)
        self.ext_emitted: set = set()

        self.log = TurnLog()

    # -- config helpers ----------------------------------------------------

    @property
    def crawler(self):
        return self.cfg.crawlers[self.crawler_name]

    def ftindex(self) -> FTIndex:
        idx = self._ftindex_cache.get(self.crawler_name)
        if idx is None:
            idx = FTIndex(self.crawler, self.cfg.filetypes)
            self._ftindex_cache[self.crawler_name] = idx
        return idx

    def ft_by_id(self, bind: int) -> Optional[Filetype]:
        idx = self.ftindex()
        if 1 <= bind <= len(idx.ft_list):
            return idx.ft_list[bind - 1]
        return None

    def set_crawler(self, name: str) -> None:
        # lm_worker_set_crawler (worker.c:481-497)
        if name == self.crawler_name:
            return
        self.crawler_name = name
        self.depth_limit = self.crawler.depth_limit

    # -- persistence (rounds mode) ----------------------------------------

    def state_dict(self) -> dict:
        return {
            "utable": [[(r.u, r.bind) for r in lst] for lst in self.utable],
            "list_priv": list(self.list_priv),
            "depth_counter": self.depth_counter,
            "depth_limit": self.depth_limit,
            "crawler": self.crawler_name,
            "host": self.host,
            "rfetched": self.rfetched,
            "robots": self.robots,
            "activated": self.activated,
            "redirects": self.redirects,
            "jail_url": self.jail_url,
            "ext_emitted": self.ext_emitted,
            "clock": self.clock,
            # epeek can span turns: the backup restores when the peek
            # list drains, possibly rounds later (urlengine.c:405-417)
            "is_peeking": self.is_peeking,
            "peek_bk": self._bk,
        }

    def load_state(self, d: dict) -> None:
        self.utable = [[UrlRow(u, b) for (u, b) in lst] for lst in d["utable"]]
        self.list_priv = list(d["list_priv"])
        self.depth_counter = d["depth_counter"]
        self.depth_limit = d["depth_limit"]
        self.crawler_name = d["crawler"]
        self.host = d["host"]
        self.rfetched = d["rfetched"]
        self.robots = d["robots"]
        self.activated = d["activated"]
        self.redirects = d["redirects"]
        self.jail_url = d["jail_url"]
        self.ext_emitted = d["ext_emitted"]
        self.clock = d.get("clock", 0.0)
        self.is_peeking = d.get("is_peeking", False)
        self._bk = d.get("peek_bk")

    # -- ue_* transcriptions ----------------------------------------------

    def _resolve_pending(self) -> None:
        """Resolve buffered seen-checks in add order (batched per page).
        Consecutive same-keyspace runs collapse into one pool call, and a
        pool exposing ``try_add_runs`` (the Ray facade) fires ALL runs'
        shard RPCs before blocking once — per-actor submission order
        preserves the ordered-adds invariant, so a page whose links hit k
        keyspaces costs one round-trip, not k."""
        if not self._pending:
            return
        pend = self._pending
        self._pending = []
        runs: List[List[UrlRow]] = []
        i = 0
        n = len(pend)
        while i < n:
            host = pend[i].pend[1]
            j = i
            while j < n and pend[j].pend[1] == host:
                j += 1
            runs.append(pend[i:j])
            i = j
        batched = getattr(self.seen, "try_add_runs", None)
        if batched is not None:
            all_verdicts = batched(
                [(run[0].pend[1], [r.pend[2] for r in run]) for run in runs])
        else:
            all_verdicts = [
                self.seen.try_add_batch(run[0].pend[1],
                                        [r.pend[2] for r in run])
                for run in runs
            ]
        for run, verdicts in zip(runs, all_verdicts):
            for row, ok in zip(run, verdicts):
                lst = row.pend[0]
                row.pend = None
                if not ok:
                    # already crawled/queued → remove (ue_add's list->sz--)
                    try:
                        lst.remove(row)
                    except ValueError:
                        pass

    def _pend(self, row: UrlRow, lst: List[UrlRow], host: str, key: str) -> None:
        row.pend = (lst, host, key)
        self._pending.append(row)

    def ue_add_initial(self, raw: str) -> bool:
        """urlengine.c:121-150 (seed path, after lm_strtourl guessing)."""
        u = url_set(strtourl(raw))
        if u is None:
            return False
        if not self.utable:
            self.utable.append([])
            self.list_priv.append(None)
        self.host = u.host_norm
        row = UrlRow(u)
        self.utable[-1].append(row)
        self._pend(row, self.utable[-1], u.host_norm, u.seen_key)
        return True

    def ue_add(self, raw: bytes) -> bool:
        """urlengine.c:170-250."""
        if not self.utable or self.current is None:
            return False
        top = self.utable[-1]
        base = self.current.u

        rs = raw.decode("utf-8", "surrogateescape") if isinstance(raw, bytes) else raw
        if not rs:
            return False
        u: Optional[URL]
        if rs[0] == "/":
            u = url_combine(base, rs)
        else:
            u = None
            dispatched = False
            for c in rs:
                if not (c.isascii() and c.isalnum()):
                    if c == ":":
                        u = url_set(rs)
                        if u is None:
                            return False
                        if u.protocol != base.protocol or not hostcmp(u, base):
                            u = dc_replace(u, is_external=True)
                        dispatched = True
                    break
            if not dispatched:
                u = url_combine(base, rs)
        if u is None:
            return False

        row = UrlRow(u)
        top.append(row)
        if u.is_external:
            if self.mode == "inline":
                # ue_add's external cache-check creates the target host's
                # ent and pushes it pending BEFORE the seen-add
                # (urlengine.c:219-232 → ue_get_hostent(..., add_pending=1)
                # → ue_hostent_create pushes on creation) — for EVERY
                # external link, even ones later discarded in sort.
                if self.inline_ext_note is not None:
                    self.inline_ext_note(u.host_norm)
                self._pend(row, top, u.host_norm, u.seen_key)
            else:
                # rounds: defer the seen-add to the round barrier; drop
                # only what THIS host already emitted (deterministic memo)
                if u.seen_key in self.ext_emitted:
                    top.pop()
                    return False
                self.ext_emitted.add(u.seen_key)
                row.ext_cand = len(self.log.ext_candidates)
                self.log.ext_candidates.append(ExtCandidate(url=u))
        else:
            self._pend(row, top, self.host, u.seen_key)
        return True

    def ue_next(self) -> Optional[UrlRow]:
        """urlengine.c:379-435."""
        if self.depth_limit:
            while self.depth_counter >= self.depth_limit:
                if not self.utable:
                    break
                self.utable.pop()
                self.list_priv.pop()
                self.depth_counter -= 1
        if not self.utable:
            return None
        top = self.utable[-1]
        while not top:
            self.utable.pop()
            self.list_priv.pop()
            if not self.utable:
                return None
            if self.depth_counter:
                self.depth_counter -= 1
            if not self.depth_counter and self.is_peeking:
                # epeek restore (urlengine.c:405-417)
                (self.depth_counter, self.depth_limit, host_bk) = self._bk
                self.is_peeking = False
                self.host = host_bk
                if self.depth_counter >= self.depth_limit:
                    self.utable.pop()
                    self.list_priv.pop()
                    if not self.utable:
                        return None
            top = self.utable[-1]
        row = top.pop()  # LIFO
        self.state_info = self.list_priv[-1]
        self.utable.append([])
        self.list_priv.append(None)
        self.depth_counter += 1
        self.current = row
        return row

    def ue_revert(self, canon: str) -> bool:
        """urlengine.c:158-165: same-depth re-add for same-host redirects."""
        if self.utable:
            self.utable.pop()
            self.list_priv.pop()
        self.depth_counter -= 1
        return self.ue_add(canon)

    def _transfer(self, head: bool = False) -> None:
        """Account one network transfer: the politeness timer sleeps
        between transfers (lm_iothr_wait, io.c:566-578); here the virtual
        clock advances by the effective per-host delay.  HEAD lookups use
        the multipeek timer (timer_wait_mp, metha.c:70-78 — 2 s friendly
        / 5 s coward, robots Crawl-delay not applied); GET and robots
        fetches use the main timer extended by robots Crawl-delay."""
        self.log.transfers += 1
        if head:
            delay = self.cfg.head_delay
        else:
            delay = max(
                (self.robots.crawl_delay if self.robots else None) or 0.0,
                self.cfg.base_delay,
            )
        start = self.window[0] if self.window else 0.0
        self.clock = max(self.clock, start) + delay

    # -- robots / jail -----------------------------------------------------

    def fetch_robots(self) -> None:
        """lm_worker_get_robotstxt (worker.c:989-1071)."""
        self.rfetched = True
        robots_url = f"http://{self.host}/robots.txt"
        self._transfer()
        row = self.fetch.get(robots_url)
        if row is None:
            # connection-level failure (M_FAILED) → empty filter
            self.robots = RobotsInfo()
            return
        # the reference parses whatever body lm_io_get returned, regardless
        # of HTTP status (worker.c:1012: `if (lm_io_get(...) == M_OK)`)
        body = row.body.decode("utf-8", "surrogateescape")
        self.robots = parse_robots(body, self.cfg.user_agent)

    def _jail_blocked(self, u: URL) -> bool:
        # worker.c:727-737
        j = self.jail_url
        if j is None:
            return False
        jd = j.file_o - j.host_o - j.host_l  # jail dir-path length
        ud = u.file_o - u.host_o - u.host_l
        if ud < jd:
            return True
        jp = j.s[j.host_o + j.host_l : j.file_o]
        up = u.s[u.host_o + u.host_l : u.host_o + u.host_l + jd]
        return up.lower() != jp.lower()

    # -- perform / sort ----------------------------------------------------

    def perform(self) -> None:
        """lm_worker_perform (worker.c:719-920)."""
        row = self.current
        ft = self.ft_by_id(row.bind)
        if ft is None:
            # bind==0 happens for redirect-parked URLs (the reference reads
            # filetypes[-1], undefined behavior — worker.c:725); we re-match
            # instead (documented deviation)
            m = self.ftindex().match_by_url(row.u)
            if m is DISCARD or m is POSSIBLE_MATCH:
                return
            ft = m
            row.bind = ft.ft_id

        if self.crawler.jail and self._jail_blocked(row.u):
            return
        if self.robots is not None and not self.robots.filter.eval_url(row.u):
            return

        # status_cb (worker.c:744)
        self.log.visits.append((row.u.s, self.host, self.depth_counter - 1))

        if ft.switch_to:
            self.set_crawler(ft.switch_to)

        attrs = AttrList(ft.attributes)

        # handler: default lm_io_get == pages-table lookup (S1/J1)
        self._transfer()
        page = self.fetch.get(row.u.s)
        if page is None:
            return  # M_FAILED: no parse

        if 300 <= page.status < 400 and page.location:
            self.redirects += 1
            if self.redirects >= 20:
                self.redirects = 0
                return
            tmp = url_set(page.location)
            if tmp is not None:
                if hostcmp(tmp, row.u):
                    self.ue_revert(tmp.s)
                else:
                    self.move_to_secondary(tmp)
            return
        self.redirects = 0

        chain = parse_chain_spec(ft.parser)
        buf = run_chain(
            chain, page.body, row.u, page.content_type, page.status,
            attrs, self.ue_add,
        )
        self.log.texts.append((row.u.s, buf))
        if attrs.changed:
            self.log.targets.append(
                {
                    "url": row.u.s,
                    "url_hash": url_hash(row.u.s),
                    "filetype": ft.name,
                    "attrs": dict(attrs.values),
                }
            )

    def move_to_secondary(self, u: URL, bind: int = 0) -> None:
        """ue_move_to_secondary (urlengine.c:476-502) — NO seen-add."""
        if self.mode == "inline":
            if self.inline_park is not None:
                self.inline_park(u, bind, False)
        else:
            self.log.ext_candidates.append(
                ExtCandidate(url=u, bind=bind, park=True, seen_check=False,
                             crawler=self.crawler_name)
            )

    def sort(self) -> None:
        """lm_worker_sort, synchronous path (worker.c:537-649)."""
        self._resolve_pending()  # ue_add dedup verdicts land before sorting
        if not self.utable:
            return
        lst = self.utable[-1]
        cr = self.crawler
        idx = self.ftindex()
        # peek_list is a per-sort local in the reference (worker.c:545);
        # a NEW peek list may start in a later sort of the same turn once
        # the previous peek restored
        self._peek_list_idx = None
        epeek = cr.external_peek and not self.is_peeking
        x = 0
        while x < len(lst):
            row = lst[x]
            match = False
            ft = idx.match_by_url(row.u)
            if ft is POSSIBLE_MATCH:
                self._transfer(head=True)  # HEAD (S2, multipeek timer)
                mime = self.fetch.head(row.u.s)
                if mime:
                    mime = mime.split(";", 1)[0]
                    ft2 = idx.match_by_mime(mime)
                    if ft2 is not None and self.bind_url(row, ft2, epeek) == 0:
                        match = True
            elif ft is not DISCARD:
                if self.bind_url(row, ft, epeek) == 0:
                    match = True
            if not match:
                # swap-with-top compaction (worker.c:590-596)
                lst[x] = lst[-1]
                lst.pop()
            else:
                x += 1

    def bind_url(self, row: UrlRow, ft: Filetype, epeek: bool) -> int:
        """lm_worker_bind_url (worker.c:665-714).  0 = keep in list."""
        self.log.ft_counts[ft.name] += 1
        if ft.has_parser:
            row.bind = ft.ft_id
            if row.u.is_external and not ft.ignore_host:
                if epeek:
                    if self.mode == "rounds" and row.ext_cand >= 0:
                        # peeked URLs crawl THIS turn → resolve the
                        # cross-host seen verdict synchronously (same
                        # reasoning as the ignore_host path below) and
                        # turn the barrier candidate into a no-op
                        cand = self.log.ext_candidates[row.ext_cand]
                        cand.seen_check = False
                        cand.park = False
                        ok = self.seen.try_add_batch(row.u.host_norm,
                                                     [row.u.seen_key])[0]
                        if not ok:
                            return 1
                    self._epeek_start(row)
                    return 1
                if self.crawler.external:
                    if self.mode == "inline":
                        if self.inline_park is not None:
                            self.inline_park(row.u, row.bind, True)
                    elif row.ext_cand >= 0:
                        cand = self.log.ext_candidates[row.ext_cand]
                        cand.park = True
                        cand.bind = row.bind
                        cand.crawler = self.crawler_name
                return 1
            if row.u.is_external and self.mode == "rounds" \
                    and row.ext_cand >= 0:
                # ignore_host keep-in-place (worker.c:678): the row will be
                # popped and crawled THIS turn, so the deferred barrier
                # seen-add would arrive too late — resolve the cross-host
                # verdict synchronously (inline pends at ue_add and
                # resolves before sort) and turn the barrier candidate
                # into a no-op.  A URL already crawled/queued by another
                # host is dropped here like inline's dedup removal.
                # (Two hosts reaching the same ignore_host URL in the SAME
                # round race for this add; the winner must be the
                # sequential model's sorted-smallest host.  Under Ray the
                # natural winner is actor-arrival order, so the rounds
                # driver logs per-round claims on the shards and REPLAYS
                # conflicted rounds with the deterministic winner forced —
                # crawl.py "same-round seen-claim reconciliation".)
                cand = self.log.ext_candidates[row.ext_cand]
                cand.seen_check = False
                cand.park = False
                ok = self.seen.try_add_batch(row.u.host_norm,
                                             [row.u.seen_key])[0]
                if not ok:
                    return 1
            return 0
        # no parser/handler → report as target immediately (worker.c:712-713)
        self.log.targets.append(
            {
                "url": row.u.s,
                "url_hash": url_hash(row.u.s),
                "filetype": ft.name,
                "attrs": {},
            }
        )
        return 1

    def _epeek_start(self, row: UrlRow) -> None:
        # worker.c:679-707: first epeek URL of this sort creates the
        # peek list and backs up depth state
        if not self.is_peeking and self._peek_list_idx is None:
            self.utable.append([])
            self.list_priv.append(None)
            self._peek_list_idx = len(self.utable) - 1
            self._bk = (self.depth_counter, self.depth_limit, self.host)
            self.depth_counter = 0
            self.depth_limit = self.crawler.peek_limit
            self.is_peeking = True
        self.utable[self._peek_list_idx].append(UrlRow(row.u, row.bind))

    # -- the main loop (worker.c:214-407), one "turn" ----------------------

    def run_turn(self, budget: Optional[int] = "auto") -> str:
        """Run until frontier exhaustion ('exhausted') or the politeness
        window closes ('budget').  ``budget='auto'`` uses the virtual
        next-fetch clock against ``self.window`` (set by run_host_round) —
        a robots Crawl-delay parsed mid-turn throttles immediately, and a
        delay longer than the window defers the host whole rounds.  A
        numeric budget caps raw transfer count (tests); None is unbounded
        (the single-worker reference mode).  In inline mode the caller
        handles pending-host switching on 'exhausted'."""
        self._peek_list_idx = None
        while True:
            if budget == "auto":
                if self.window is not None and self.clock >= self.window[1]:
                    return "budget"
            elif budget is not None and self.log.transfers >= budget:
                return "budget"
            row = self.ue_next()
            if row is None:
                return "exhausted"

            if len(self.utable) == 2:
                # entering a host at depth 0 (worker.c:268-289)
                if self.crawler.robotstxt and not self.rfetched:
                    self.fetch_robots()
                if self.crawler.jail:
                    self.jail_url = row.u

            # crawler switching via list state_info (worker.c:289-293)
            new = self.state_info
            if new and new != self.crawler_name:
                self.set_crawler(new)
            else:
                self.list_priv[-1] = self.crawler_name

            self.perform()
            self.sort()

    # -- initial sort (worker.c:238-246) -----------------------------------

    def sort_initial(self) -> None:
        self._resolve_pending()
        cr = self.crawler
        if cr.initial_filetype:
            ftid = None
            idx = self.ftindex()
            for i, ft in enumerate(idx.ft_list):
                if ft.name == cr.initial_filetype:
                    ftid = i + 1
            for row in self.utable[-1]:
                if ftid:
                    row.bind = ftid
        else:
            # lm_worker_sort over the root list; current=None is fine
            # because sort only reads rows
            self.sort()
        self.list_priv[-1] = self.crawler_name
