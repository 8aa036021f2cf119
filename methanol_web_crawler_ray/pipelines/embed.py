"""Library-embedding entry points (SURVEY §3.4): single-URL and
provided-buffer execution.

  - ``exec_once``      ← lmetha_exec_once (metha.c:591-612) +
    lm_worker_run_once (worker.c:71-91): crawl exactly one URL, return
    its outputs and the frontier it would have scheduled.
  - ``exec_provided``  ← lmetha_exec_provided (metha.c:614-637) / the
    CLI stdin mode (methabot/main.c:380-406, S5): crawl a caller-supplied
    in-memory buffer as if it had been downloaded from ``base_url``.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from ..config import EngineConfig
from ..functions.urlkit import strtourl, url_set
from ..state.seen import LocalSeenPool
from .hostloop import CrawlKernel, DictFetcher, PageRow, TurnLog


def _run_single(cfg: EngineConfig, fetcher, url: str,
                crawler: Optional[str]) -> Tuple[TurnLog, List[str]]:
    seen = LocalSeenPool(num_shards=1)
    k = CrawlKernel(cfg, fetcher, seen, mode="inline", crawler=crawler)
    k.ue_add_initial(url)
    k.sort_initial()
    row = k.ue_next()
    if row is None:
        return k.log, []
    if len(k.utable) == 2 and k.crawler.robotstxt and not k.rfetched:
        k.fetch_robots()
    k.list_priv[-1] = k.crawler_name
    k.perform()
    k.sort()
    frontier = [r.u.s for lst in k.utable for r in lst]
    return k.log, frontier


def exec_once(cfg: EngineConfig, url: str, fetcher,
              crawler: Optional[str] = None) -> Tuple[TurnLog, List[str]]:
    """Crawl one URL against any Fetcher; returns (log, frontier)."""
    return _run_single(cfg, fetcher, strtourl(url), crawler)


def exec_provided(cfg: EngineConfig, base_url: str, buffer: bytes,
                  content_type: str = "text/html",
                  crawler: Optional[str] = None) -> Tuple[TurnLog, List[str]]:
    """Crawl a provided in-memory buffer as if downloaded from base_url
    (stdin mode)."""
    u = url_set(strtourl(base_url))
    if u is None:
        raise ValueError(f"unparseable base url {base_url!r}")
    fetcher = DictFetcher({
        u.s: PageRow(url=u.s, status=200, content_type=content_type,
                     body=buffer)
    })
    return _run_single(cfg, fetcher, base_url, crawler)
