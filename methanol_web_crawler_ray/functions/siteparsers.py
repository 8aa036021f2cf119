"""Python analogs of the reference's stock site scripts
(scripts/wikipedia.js, scripts/google.js) plus the ``init``
seed-generator surface — the pieces conf/wikipedia.conf and
conf/google.conf wire together.

The JS contract per the reference: an ``init`` function receives the
command-line queries and returns the seed URL list
(wikipedia.js:1-9, google.js:7-15); a ``parser`` function receives the
transfer body, may ``println()`` result lines (captured here as a
declared attribute, same convention as the misc.js 'meta' analog) and
may return an array of URLs to ``ue_add`` (google.js:17-30).

Stock conf fixtures live in ``methanol_web_crawler_ray/conf/``; load
one with :func:`load_site_config`.
"""

from __future__ import annotations

import os
import re
from typing import Callable, Dict, List, Optional

_CONF_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "conf")


def conf_path(name: str) -> str:
    """Absolute path of a stock config fixture ('wikipedia.conf', ...)."""
    return os.path.join(_CONF_DIR, name)


def load_site_config(name: str):
    """Parse a stock config through the config language (S12), with the
    site-script parser analogs registered."""
    from ..config_lang import load_config_file

    register_stock_site_parsers()
    return load_config_file(conf_path(name))


# ---------------------------------------------------------------------------
# init scripts (seed generators)

def wikipedia_search_init(queries) -> List[str]:
    """wikipedia.js:1-9: one fulltext-search URL per query."""
    return [
        "http://en.wikipedia.org/w/index.php?search=" + q
        + "&fulltext=Advanced+search"
        for q in queries
    ]


def google_search_init(queries) -> List[str]:
    """google.js:7-15: one search URL per query, start=0."""
    return ["http://www.google.com/search?q=" + q + "&start=0"
            for q in queries]


INITS: Dict[str, Callable] = {
    "wikipedia.js/wikipedia_search_init": wikipedia_search_init,
    "google.js/google_search_init": google_search_init,
}


def seeds_from_init(cfg, queries, crawler: Optional[str] = None) -> List[str]:
    """Resolve the crawler's ``init`` script (metha.c init option) and
    run it over the queries — the seed-job analog of the reference's
    command-line-arguments-to-URLs step."""
    cr = cfg.crawlers[crawler or cfg.default_crawler]
    init = getattr(cr, "init", None)
    if not init:
        return list(queries)
    fn = INITS.get(init)
    if fn is None:
        raise KeyError(f"unknown init script {init!r}")
    return fn(queries)


# ---------------------------------------------------------------------------
# parser scripts

# wikipedia.js parser: E4X scans <ul class="mw-search-results"> and
# println()s "<title>: http://en.wikipedia.org<href>" per result <li>.
_WIKI_UL_RE = re.compile(
    rb"<ul\s+[^>]*class\s*=\s*['\"]?mw-search-results['\"]?[^>]*>(.*?)</ul>",
    re.I | re.S)
_WIKI_A_RE = re.compile(
    rb"<a\s+[^>]*>", re.I)
_ATTR_HREF_RE = re.compile(
    rb"""href\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))""", re.I)
_ATTR_TITLE_RE = re.compile(
    rb"""title\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))""", re.I)
_ATTR_CLASS_RE = re.compile(
    rb"""class\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))""", re.I)


def _attr_val(m) -> bytes:
    return next(g for g in m.groups()[1:] if g is not None)


def wikipedia_parser(buf: bytes, url: str, content_type, status):
    """scripts/wikipedia.js:11-24 analog: the println lines become the
    'results' attribute (one '<title>: <abs-url>' line per hit, document
    order); returns no URLs — the chain has no link extractor, so the
    crawl stays on the search pages."""
    lines = []
    for ul in _WIKI_UL_RE.finditer(buf):
        for a in _WIKI_A_RE.finditer(ul.group(1)):
            tag = a.group(0)
            href = _ATTR_HREF_RE.search(tag)
            title = _ATTR_TITLE_RE.search(tag)
            if href is None:
                continue
            lines.append(
                (_attr_val(title) if title is not None else b"")
                + b": http://en.wikipedia.org" + _attr_val(href))
    attrs = {"results": b"\n".join(lines)} if lines else {}
    return [], attrs


def google_parser(buf: bytes, url: str, content_type, status):
    """scripts/google.js:17-30 analog: hrefs of <a class="l"> tags, in
    document order, returned for ue_add — UMEX's FULL<*> "result"
    filetype then reports them as targets without fetching."""
    urls = []
    for a in _WIKI_A_RE.finditer(buf):
        tag = a.group(0)
        cls = _ATTR_CLASS_RE.search(tag)
        if cls is None or _attr_val(cls) != b"l":
            continue
        href = _ATTR_HREF_RE.search(tag)
        if href is not None:
            urls.append(_attr_val(href))
    return urls, {}


_REGISTERED = False


def register_stock_site_parsers() -> None:
    """Register the script analogs under their conf-referenced names
    ('wikipedia.js/parser', 'google.js/parser') in the user-extension
    registry (M15)."""
    global _REGISTERED
    if _REGISTERED:
        return
    from .parsechain import register_parser

    register_parser("wikipedia.js/parser", wikipedia_parser)
    register_parser("google.js/parser", google_parser)
    _REGISTERED = True
