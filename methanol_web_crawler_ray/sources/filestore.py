"""file:// reader (SURVEY §2 S4) — the Fetcher protocol over the local
filesystem.

The reference gets file:// support for free from curl (lm_io_get hands
any scheme to curl; lm_strtourl guesses ``file://`` for '/'- or
'./'-prefixed seeds, str.c:35-66).  Here the fetch abstraction reads the
path directly: a hit returns the file bytes with status 200 and NO
content type (curl's file:// transfers carry no Content-Type header —
filetype decisions fall to the URL decision tree / extension table,
exactly like the reference); a miss is M_FAILED (None).

``DispatchFetcher`` routes by scheme so one crawl can mix a pages-table
fetcher for http with the filesystem for file:// seeds.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

from ..pipelines.hostloop import PageRow


def file_url_path(url: str) -> Optional[str]:
    if not url.startswith("file://"):
        return None
    return url[len("file://"):]


class FileFetcher:
    """Fetcher over local files.  ``root`` (optional) confines reads to a
    directory tree — paths escaping it are treated as fetch misses."""

    def __init__(self, root: Optional[str] = None):
        self.root = os.path.realpath(root) if root else None

    def _resolve(self, url: str) -> Optional[str]:
        p = file_url_path(url)
        if p is None:
            return None
        p = os.path.realpath(p)
        if self.root is not None and not (
                p == self.root or p.startswith(self.root + os.sep)):
            return None
        return p

    def get(self, url: str) -> Optional[PageRow]:
        p = self._resolve(url)
        if p is None or not os.path.isfile(p):
            return None
        try:
            with open(p, "rb") as f:
                body = f.read()
        except OSError:
            return None
        return PageRow(url=url, status=200, location=None,
                       content_type=None, body=body)

    def head(self, url: str) -> Optional[str]:
        p = self._resolve(url)
        return None if p is None or not os.path.isfile(p) else ""


class DispatchFetcher:
    """Route fetches by URL scheme: {'http': pages_fetcher, 'file':
    FileFetcher(...), ...}.  Unknown schemes are fetch misses."""

    def __init__(self, by_scheme: Dict[str, object]):
        self.by_scheme = by_scheme

    def _pick(self, url: str):
        scheme = url.split("://", 1)[0] if "://" in url else ""
        return self.by_scheme.get(scheme)

    def get(self, url: str):
        f = self._pick(url)
        return f.get(url) if f is not None else None

    def head(self, url: str):
        f = self._pick(url)
        return f.head(url) if f is not None else None
