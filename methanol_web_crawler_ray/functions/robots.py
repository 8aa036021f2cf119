"""robots.txt parsing and URL filters — libmetha-equivalent semantics.

  - Filter rule ordering / evaluation ← src/libmetha/filter.c:34-54
    (lm_filter_eval_url: first matching rule wins, default ALLOW) and
    filter.c:60-97 (lm_filter_add_rule: an ALLOW rule is swapped into the
    slot of the first DENY rule, pushing that DENY to the end — net effect:
    allow-rules are evaluated before deny-rules).
  - robots.txt parser ← src/libmetha/worker.c:989-1071
    (lm_worker_get_robotstxt): line-oriented ``Opt: value`` scan, ``#``
    comments, ``User-agent`` enables a block when the value is ``*`` or a
    substring of our agent string; ``Disallow``/``Allow`` values become
    PATH-prefix rules via umex_explicit_strstart (umex.c:232-258).

Preserved quirks:
  * an EMPTY ``Disallow:`` value compiles to a zero-length prefix rule,
    which matches (and therefore denies) every path — unlike the robots
    RFC, faithful to the reference.
  * rule values run to the raw end of line ('\n'), untrimmed on the right.
  * rules appearing before any ``User-agent`` line are active (enable
    starts true, worker.c:995).

Extension beyond the reference (required by the engine's politeness
scheduler): ``Crawl-delay`` is parsed into ``RobotsInfo.crawl_delay``.  The
reference ignores this directive entirely.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

from . import umex
from .urlkit import URL

DEFAULT_USER_AGENT = "Methabot"

ALLOW = True
DENY = False


@dataclass
class Filter:
    """Ordered allow/deny rules over URLs (filter_t, src/libmetha/filter.h)."""

    rules: List[Tuple[bool, list]] = field(default_factory=list)

    def add_rule(self, allow: bool, ops: list) -> None:
        # lm_filter_add_rule (filter.c:60-97)
        if allow:
            x = len(self.rules)
            for i, (a, _) in enumerate(self.rules):
                if a is DENY:
                    x = i
                    break
            if x < len(self.rules):
                self.rules.append(self.rules[x])
                self.rules[x] = (allow, ops)
            else:
                self.rules.append((allow, ops))
        else:
            self.rules.append((allow, ops))

    def eval_url(self, u: URL) -> bool:
        # lm_filter_eval_url (filter.c:34-54): first match wins, default allow
        for allow, ops in self.rules:
            if umex.match(u, ops):
                return allow
        return ALLOW


@dataclass
class RobotsInfo:
    filter: Filter = field(default_factory=Filter)
    crawl_delay: Optional[float] = None  # extension; reference ignores it


def parse_robots(body: str, user_agent: str = DEFAULT_USER_AGENT) -> RobotsInfo:
    """lm_worker_get_robotstxt's parse loop (worker.c:1012-1066)."""
    info = RobotsInfo()
    s = 0
    n = len(body)
    enable = True
    while s < n:
        while s < n and body[s].isspace():
            s += 1
        if s < n and body[s] == "#":
            while s < n and body[s] != "\n":
                s += 1
            continue
        opt_s = s
        opt_e = body.find(":", s)
        if opt_e < 0:
            break
        s = opt_e + 1
        # reference skips ALL isspace after the ':', including newlines
        # (worker.c:1026-1028) — an empty value swallows the next line's start
        while s < n and body[s].isspace():
            s += 1
        val_s = s
        val_e = body.find("\n", s)
        if val_e < 0:
            val_e = n
        opt = body[opt_s:opt_e]
        val = body[val_s:val_e]
        if opt == "User-agent":
            enable = val == "*" or (val in user_agent)
        elif enable:
            if opt == "Disallow":
                info.filter.add_rule(DENY, umex.strstart(val))
            elif opt == "Allow":
                info.filter.add_rule(ALLOW, umex.strstart(val))
            elif opt.lower() == "crawl-delay":  # extension (see module doc)
                try:
                    info.crawl_delay = float(val.strip())
                except ValueError:
                    pass
        s = val_e
    return info
