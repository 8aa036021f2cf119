"""Parser chains + per-URL attribute lists.

Reference semantics:
  - attribute lists    ← src/libmetha/attr.c:35-108 (lm_attrlist_prepare /
    lm_attribute_set): a filetype declares attribute NAMES; parsers may set
    only declared names; any successful set flips ``changed`` which marks
    the URL a *target* (worker.c:871-911,916-918).
  - parser chains      ← chain resolution metha.c:1271-1325
    (lm_str_to_wfunction) and execution worker.c:842-911: each parser gets
    the (possibly rewritten) buffer from the previous one.
  - builtin parsers    ← ``html`` (html.c:101-187), ``css``
    (builtin.c:49-54,139-164), ``text`` (builtin.c:169-201), ``xmlconv``
    (html.c:401-742), ``utf8conv`` (utf8conv.c:35-116), ``entityconv``
    (entityconv.c:400-450), ``ftp`` (builtin.c:207-244 — stub here, no FTP
    rows in the pages table, SURVEY §2 S3/M8).
  - ``title``          ← the JS-side idiom ``scripts/misc.js`` /
    conf/title.conf (E4X ``xml..title``): extract the first
    ``<title>…</title>`` content as attribute "title".  Re-expressed
    natively because there is no JS runtime here (SURVEY §2 M15).

User extension surface (M15): ``register_parser(name, fn)`` where ``fn``
follows the JS-parser contract ``(data, url, content_type, status) ->
(urls, attrs)`` — returned URLs are fed to ``ue_add`` in order, attrs are
applied via ``AttrList.set``.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Tuple

from .htmlparse import extract_css_urls, extract_html_links, extract_text_urls
from .textconv import entityconv, utf8conv
from .urlkit import URL
from .xmlconv import xmlconv


class AttrList:
    """attr_list_t (attr.c:35-108): declared-names-only k→bytes map."""

    __slots__ = ("declared", "values", "changed")

    def __init__(self, declared=()):
        self.declared = tuple(declared)
        self.values: Dict[str, bytes] = {}
        self.changed = False

    def set(self, name: str, value: bytes) -> bool:
        """lm_attribute_set: no-op unless `name` was declared."""
        if name not in self.declared:
            return False
        self.values[name] = value
        self.changed = True
        return True


class ParseCtx:
    """What a parser sees (the C signature (worker, iobuf, ue_h, url, attrs)
    plus the transfer metadata the JS surface exposes)."""

    __slots__ = ("buf", "url", "content_type", "status", "attrs", "add_url")

    def __init__(self, buf: bytes, url: URL, content_type: Optional[str],
                 status: int, attrs: AttrList,
                 add_url: Callable[[bytes], None]):
        self.buf = buf
        self.url = url
        self.content_type = content_type
        self.status = status
        self.attrs = attrs
        self.add_url = add_url


def _p_html(ctx: ParseCtx) -> None:
    # lm_parser_html: emit refs in document order, then set attr 'html'
    for ref in extract_html_links(ctx.buf):
        ctx.add_url(ref)
    ctx.attrs.set("html", ctx.buf)


def _p_css(ctx: ParseCtx) -> None:
    for ref in extract_css_urls(ctx.buf):
        ctx.add_url(ref)


def _p_text(ctx: ParseCtx) -> None:
    for ref in extract_text_urls(ctx.buf):
        ctx.add_url(ref)


def _p_xmlconv(ctx: ParseCtx) -> None:
    ctx.buf = xmlconv(ctx.buf)


def _p_utf8conv(ctx: ParseCtx) -> None:
    ctx.buf = utf8conv(ctx.buf, ctx.content_type)


def _p_entityconv(ctx: ParseCtx) -> None:
    ctx.buf = entityconv(ctx.buf)


def _p_title(ctx: ParseCtx) -> None:
    # first <title ...>content</title>, raw bytes (misc.js analog)
    low = ctx.buf.lower()
    i = low.find(b"<title")
    if i < 0:
        return
    j = low.find(b">", i)
    if j < 0:
        return
    k = low.find(b"</title", j + 1)
    if k < 0:
        return
    ctx.attrs.set("title", ctx.buf[j + 1 : k])


_META_TAG_RE = None


def _p_meta(ctx: ParseCtx) -> None:
    # scripts/misc.js meta(): print each <meta> tag's name/content pair
    # (and keep crawling the hrefs — in a chain, the 'html' parser owns
    # link emission).  The printed lines become the 'meta' attribute:
    # b"<name>: <content>\n" in document order.
    global _META_TAG_RE
    import re as _re

    if _META_TAG_RE is None:
        _META_TAG_RE = (
            _re.compile(rb"<meta\s+[^>]*>", _re.I),
            _re.compile(rb"""name\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))""",
                        _re.I),
            _re.compile(rb"""content\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))""",
                        _re.I),
        )
    tag_re, name_re, content_re = _META_TAG_RE

    def val(m):
        return next(g for g in m.groups()[1:] if g is not None)

    out = bytearray()
    for tag in tag_re.finditer(ctx.buf):
        nm = name_re.search(tag.group(0))
        ct = content_re.search(tag.group(0))
        if nm is not None:
            out += val(nm) + b": " + (val(ct) if ct is not None else b"") \
                + b"\n"
    if out:
        ctx.attrs.set("meta", bytes(out))


def _p_source(ctx: ParseCtx) -> None:
    # scripts/misc.js source(): emit the transfer body as-is (the JS
    # prints to the console; the sink model stores it as an attribute)
    ctx.attrs.set("source", ctx.buf)


def _p_ftp(ctx: ParseCtx) -> None:
    # S3/M8: FTP LIST parser (lm_parser_ftp, builtin.c:207-244): each
    # parseable line's name becomes a ue_add ref, directories with a
    # trailing '/'.  Dialect handling in functions/ftpparse.py.
    from .ftpparse import listing_refs

    for ref in listing_refs(ctx.buf):
        ctx.add_url(ref)


PARSERS: Dict[str, Callable[[ParseCtx], None]] = {
    "html": _p_html,
    "css": _p_css,
    "text": _p_text,
    "xmlconv": _p_xmlconv,
    "utf8conv": _p_utf8conv,
    "entityconv": _p_entityconv,
    "title": _p_title,
    "meta": _p_meta,
    "source": _p_source,
    "ftp": _p_ftp,
}


def register_parser(name: str,
                    fn: Callable[[bytes, str, Optional[str], int],
                                 Tuple[List[bytes], Dict[str, bytes]]]) -> None:
    """User-extension surface (M15): JS-parser-contract callables."""

    def adapter(ctx: ParseCtx) -> None:
        urls, attrs = fn(ctx.buf, ctx.url.s, ctx.content_type, ctx.status)
        for u in urls or ():
            ctx.add_url(u if isinstance(u, bytes) else u.encode())
        for k, v in (attrs or {}).items():
            ctx.attrs.set(k, v if isinstance(v, bytes) else str(v).encode())

    PARSERS[name] = adapter


def parse_chain_spec(spec: Optional[str]) -> Tuple[str, ...]:
    """'utf8conv, xmlconv, title' → ('utf8conv','xmlconv','title')
    (lm_str_to_wfunction splits on ','; metha.c:1209-1236)."""
    if not spec:
        return ()
    return tuple(s.strip() for s in spec.split(",") if s.strip())


def run_chain(chain: Tuple[str, ...], buf: bytes, url: URL,
              content_type: Optional[str], status: int, attrs: AttrList,
              add_url: Callable[[bytes], None]) -> bytes:
    """Execute the chain (worker.c:842-911); returns the final buffer —
    the per-URL extracted text when the chain ends in utf8conv/entityconv."""
    ctx = ParseCtx(buf, url, content_type, status, attrs, add_url)
    for name in chain:
        PARSERS[name](ctx)
    return ctx.buf
