"""Filetype / crawler config + the ftindex URL→filetype classifier.

  - ``Filetype`` / ``Crawler``    ← src/libmetha/filetype.h:61-103,
    crawler.h:47-70 and the config classes wired in metha.c:132-185 (S12);
    ``extend``/``override`` become dict merges in ``config.py``.
  - extension index             ← src/libmetha/ftindex.c:60-98 (build),
    ftindex.c:105-133 (lm_ftindex_match_by_ext).
  - URL decision tree           ← src/libmetha/ftindex.c:141-238
    (lm_ftindex_match_by_url), flag semantics ftindex.h:52-84, and the
    ``@filetype`` / ``lookup`` / ``discard`` binding resolution in
    metha.c:1118-1170: ``@ft`` short-circuits to that filetype; ``lookup``
    (or unset) yields POSSIBLE_MATCH → resolve via MIME (a HEAD request in
    the reference; the pages-table ``content_type`` column here);
    ``discard`` falls through the UMEX scan and then drops the URL.
  - MIME match                  ← src/libmetha/ftindex.c:240-247 +
    src/libmetha/mime.c:54-111 (here a plain case-insensitive dict — the
    reference's category+hash table is an exact-lookup optimization).

Preserved quirks:
  * the extension compare is strncasecmp over the URL-extension's LENGTH
    (ftindex.c:122) — a URL ext that is a PREFIX of a filetype ext matches
    when their 4-bit hashes collide; reproduced exactly.
  * in the extension-less non-dynamic path ALL filetypes with a UMEX are
    scanned; in the has-extension paths only filetypes WITHOUT extensions
    are scanned (ftindex.c:173-178 vs 204-209,221-226).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

from . import umex
from .urlkit import URL

# classifier outcomes (besides a concrete Filetype)
DISCARD = None  # lm_ftindex_match_by_url returns NULL → URL dropped
POSSIBLE_MATCH = "__lookup__"  # LM_FTINDEX_POSSIBLE_MATCH → MIME lookup

# binding states for dir_url / extless_url / dynamic_url / unknown_url
_B_BOUND, _B_LOOKUP, _B_DISCARD = 0, 1, 2


@dataclass
class Filetype:
    """filetype_t (src/libmetha/filetype.h:61-103)."""

    name: str
    extensions: Sequence[str] = ()
    mimetypes: Sequence[str] = ()
    attributes: Sequence[str] = ()
    parser: Optional[str] = None  # parser chain, e.g. "html" or "xmlconv,..."
    handler: Optional[str] = None
    expr: Optional[str] = None  # UMEX
    switch_to: Optional[str] = None  # crawler switch
    # FT_FLAG_IGNORE_HOST (filetype.h:33, option metha.c:151): matching
    # external URLs are crawled in place instead of parked/dropped
    ignore_host: bool = False
    ft_id: int = 0

    def __post_init__(self) -> None:
        self._ops = umex.compile(self.expr) if self.expr else None

    @property
    def has_parser(self) -> bool:
        return bool(self.parser) or bool(self.handler)

    def umex_ok(self, u: URL) -> bool:
        return self._ops is None or umex.match(u, self._ops)


@dataclass
class Crawler:
    """crawler_t (src/libmetha/crawler.h:47-70)."""

    name: str
    filetypes: Sequence[str] = ()
    depth_limit: int = 1
    peek_limit: int = 1
    external: bool = False
    external_peek: bool = False
    jail: bool = False
    robotstxt: bool = True
    spread_workers: bool = False
    initial_filetype: Optional[str] = None
    # "@<filetype>", "lookup" (default) or "discard" (metha.c:1118-1170)
    dir_url: Optional[str] = None
    extless_url: Optional[str] = None
    dynamic_url: Optional[str] = None
    unknown_url: Optional[str] = None
    ftp_dir_url: Optional[str] = None
    default_handler: Optional[str] = None
    # seed-generator script name ("file.js/function", metha.c init
    # option); resolved by functions.siteparsers.seeds_from_init
    init: Optional[str] = None


def _ext_hash(ext: str) -> int:
    # ftindex.c:70-76 — tolower rolling hash, 4-bit bucket
    if not ext:
        return 0
    h = ord(ext[0].lower())
    for c in ext[1:]:
        h = (h + ((h << 1) ^ ord(c.lower()))) & 0xFFFFFFFF
    return h & 0x0F


class FTIndex:
    """Per-crawler filetype index (ftindex_t, ftindex.c:60-98)."""

    def __init__(self, crawler: Crawler, filetypes: Dict[str, Filetype]):
        self.crawler = crawler
        self.ft_list: List[Filetype] = [filetypes[n] for n in crawler.filetypes]
        for i, ft in enumerate(self.ft_list):
            ft.ft_id = i + 1  # url->bind is 1-based, 0 = unbound (url.h:76)
        self.e_index: Dict[int, List[tuple]] = {}
        self.m_index: Dict[str, Filetype] = {}
        for ft in self.ft_list:
            for mt in ft.mimetypes:
                self.m_index.setdefault(mt.lower(), ft)
            for ext in ft.extensions:
                self.e_index.setdefault(_ext_hash(ext), []).append((ext, ft))

        def bind(spec: Optional[str]):
            if spec is None or spec == "lookup":
                return _B_LOOKUP, None
            if spec == "discard":
                return _B_DISCARD, None
            if spec.startswith("@"):
                return _B_BOUND, filetypes[spec[1:]]
            raise ValueError(f"unrecognized binding {spec!r}")

        self._dir = bind(crawler.dir_url)
        self._extless = bind(crawler.extless_url)
        self._dynamic = bind(crawler.dynamic_url)
        self._unknown = bind(crawler.unknown_url)
        self._ftp_dir = bind(crawler.ftp_dir_url)

    # -- matchers ---------------------------------------------------------

    def match_by_ext(self, u: URL) -> Optional[Filetype]:
        # lm_ftindex_match_by_ext (ftindex.c:105-133)
        ext = u.ext
        bucket = self.e_index.get(_ext_hash(ext))
        if not bucket:
            return None
        el = ext.lower()
        for ft_ext, ft in bucket:
            # strncasecmp over the URL-ext length → prefix compare, faithful
            if ft_ext.lower()[: len(el)] == el:
                if ft.umex_ok(u):
                    return ft
        return None

    def match_by_mime(self, mime: Optional[str]) -> Optional[Filetype]:
        if not mime:
            return None
        mime = mime.split(";", 1)[0].strip()  # worker.c:578-580 strips ';...'
        return self.m_index.get(mime.lower())

    def _umex_scan(self, u: URL, extless_only: bool) -> Optional[Filetype]:
        for ft in self.ft_list:
            if extless_only and ft.extensions:
                continue
            if ft._ops is not None and umex.match(u, ft._ops):
                return ft
        return None

    def match_by_url(self, u: URL):
        """lm_ftindex_match_by_url (ftindex.c:141-238).
        Returns a Filetype, POSSIBLE_MATCH, or DISCARD (None)."""
        if u.protocol in ("ftp", "ftps"):
            if u.is_dir:
                state, ft = self._ftp_dir
                return ft if state == _B_BOUND else DISCARD
            return self.match_by_ext(u)

        if not u.ext_o:  # no file extension (ftindex.c:157-195)
            if u.is_dynamic:
                state, ft = self._dynamic
                if state == _B_BOUND:
                    return ft
                if state == _B_LOOKUP:
                    return POSSIBLE_MATCH
                return self._umex_scan(u, extless_only=False) or DISCARD
            hit = self._umex_scan(u, extless_only=False)
            if hit:
                return hit
            if u.is_dir:
                state, ft = self._dir
                if state == _B_BOUND:
                    return ft
                if state == _B_LOOKUP:
                    return POSSIBLE_MATCH
                return DISCARD
            state, ft = self._extless
            if state == _B_BOUND:
                return ft
            if state == _B_LOOKUP:
                return POSSIBLE_MATCH
            return DISCARD

        # has a file extension (ftindex.c:196-237)
        if u.is_dynamic:
            state, ft = self._dynamic
            if state == _B_BOUND:
                return ft
            if state == _B_LOOKUP:
                return POSSIBLE_MATCH
            hit = self.match_by_ext(u)
            if hit:
                return hit
            return self._umex_scan(u, extless_only=True) or DISCARD
        hit = self.match_by_ext(u)
        if hit:
            return hit
        hit = self._umex_scan(u, extless_only=True)
        if hit:
            return hit
        state, ft = self._unknown
        if state == _B_BOUND:
            return ft
        if state == _B_LOOKUP:
            return POSSIBLE_MATCH
        return DISCARD
