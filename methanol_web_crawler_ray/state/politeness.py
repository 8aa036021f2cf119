"""Politeness scheduling — the min-heap-on-next-fetch-time view of host
clocks (BASELINE.json north_star: "a per-host politeness priority queue
(min-heap on next-fetch-time honoring robots.txt crawl-delay) driving
batch scheduling"; reference analog: the politeness timer metha.c:71-79 +
lm_iothr_wait io.c:566-578, which the reference applies process-wide with
one worker — here it is per host and sharded).

Two layers:

* the per-host VIRTUAL CLOCK lives in ``CrawlKernel.clock``
  (pipelines/hostloop.py): each transfer advances the host's
  next-fetch-time by max(robots Crawl-delay, politeness-mode delay), and
  a rounds turn only transfers inside its round window — this is what
  makes the distributed engine's schedule deterministic and byte-equal to
  the sequential model.
* this module is the SCHEDULER view over many hosts: a heap keyed on
  next_fetch_time answering "which hosts are due in window W" /
  "when is the next host due".  The rounds driver uses the same predicate
  vectorized (a host whose clock is past the window end no-ops its turn);
  a continuous/streaming driver would pop this heap directly.
"""

from __future__ import annotations

import heapq
from typing import Dict, Iterable, List, Optional, Tuple


class PolitenessQueue:
    """Min-heap of (next_fetch_time, host) with lazy invalidation."""

    def __init__(self):
        self._heap: List[Tuple[float, str]] = []
        self._current: Dict[str, float] = {}

    def update(self, host: str, next_fetch_time: float) -> None:
        self._current[host] = next_fetch_time
        heapq.heappush(self._heap, (next_fetch_time, host))

    def remove(self, host: str) -> None:
        self._current.pop(host, None)  # lazily dropped on pop

    def __len__(self) -> int:
        return len(self._current)

    def _prune(self) -> None:
        h = self._heap
        while h and self._current.get(h[0][1]) != h[0][0]:
            heapq.heappop(h)

    def peek_next(self) -> Optional[Tuple[float, str]]:
        """Earliest (next_fetch_time, host), or None."""
        self._prune()
        return self._heap[0] if self._heap else None

    def pop_due(self, now: float) -> Optional[str]:
        """Pop the earliest host due at or before `now`."""
        self._prune()
        if self._heap and self._heap[0][0] <= now:
            t, host = heapq.heappop(self._heap)
            del self._current[host]
            return host
        return None

    def due_in_window(self, window_end: float) -> List[str]:
        """All hosts whose next fetch falls before `window_end`, earliest
        first (the per-round schedule)."""
        out = []
        snapshot = sorted(
            (t, h) for h, t in self._current.items() if t < window_end
        )
        for _t, h in snapshot:
            out.append(h)
        return out


def effective_delay(base_delay: float, crawl_delay: Optional[float]) -> float:
    """The per-host delay: robots Crawl-delay wins over the politeness
    mode's base delay when larger."""
    return max(crawl_delay or 0.0, base_delay)
