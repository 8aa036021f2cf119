"""Charset + entity conversion — the "extracted text" chain.

  - ``entityconv`` ← src/libmetha/entityconv.c:400-450
    (lm_parser_entityconv) + entityconv.c:377-394 (unicode_to_utf8).
  - ``utf8conv``   ← src/libmetha/utf8conv.c:35-116 (lm_parser_utf8conv).

``extract_text(html, content_type)`` = utf8conv → entityconv, which is the
reference's default text-production chain; its output bytes are the
per-URL byte-identical invariant (BASELINE.md correctness gate).

Preserved quirks:
  * numeric entities (``&#228;``) are left UNTOUCHED (entityconv.c:419-421).
  * entity names match case-SENSITIVELY against the table; ``&lt;``/``&gt;``
    are absent from it (entityconv.c:56-57).
  * an entity is only converted when its alnum run ends in ``;``.
  * utf8conv looks for ``charset=`` first in the Content-Type header, then
    in a ``<meta ... charset=...>`` tag; charset names are ``[A-Za-z0-9-]``
    runs in the meta path (utf8conv.c:76-83).  If the source charset is
    UTF-8 (header, case-insensitive first 5 chars) or none is found, the
    buffer is left unchanged (conversion "fails" — M_FAILED keeps the old
    buffer in the chain).
  * the reference's iconv output buffer is 2× the input size; overflowing
    conversions are truncated at a character boundary (utf8conv.c:96-116).
"""

from __future__ import annotations

from typing import Optional

from .entities import ENTITIES

_WS = frozenset(b" \t\n\r\v\f")
_ALNUM = frozenset(
    b"abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
)


def _unicode_to_utf8(v: int) -> bytes:
    # entityconv.c:377-394: 16-bit code points, 1-3 bytes
    if v < 0x80:
        return bytes((v,))
    if v < 0x800:
        return bytes((0xC0 | (v >> 6), 0x80 | (v & 0x3F)))
    return bytes(
        (0xE0 | (v >> 12), 0x80 | ((v >> 6) & 0x3F), 0x80 | (v & 0x3F))
    )


def entityconv(buf: bytes) -> bytes:
    """Replace named SGML entities with UTF-8 (entityconv.c:400-450)."""
    out = bytearray()
    e = len(buf)
    last = 0
    n = buf.find(b"&")
    while n >= 0:
        n += 1
        s = n
        if s < e and buf[s] == 0x23:  # '#': numeric — untouched
            n += 1
        else:
            while n < e and buf[n] in _ALNUM:
                n += 1
            if n < e and buf[n] == 0x3B:  # ';'
                name = buf[s:n].decode("ascii", "replace")
                v = ENTITIES.get(name)
                if v is not None:
                    out += buf[last : s - 1]
                    out += _unicode_to_utf8(v)
                    last = n + 1
        n = buf.find(b"&", n)
    out += buf[last:]
    return bytes(out)


def _find_charset(html: bytes, content_type: Optional[str]) -> Optional[str]:
    """utf8conv.c:48-84: Content-Type header first, then <meta ...charset=>."""
    if content_type:
        idx = content_type.find("charset=")
        if idx >= 0:
            cs = content_type[idx + 8 :]
            if cs[:5].upper() == "UTF-8":
                return None  # already UTF-8 → no conversion
            # the reference passes the raw header remainder to iconv_open;
            # trim at ';' / whitespace for the python codec lookup
            for stop in (";", " ", "\t"):
                j = cs.find(stop)
                if j >= 0:
                    cs = cs[:j]
            return cs or None
    # find()-based rewrite of the C bytewise scan (hot path: runs for every
    # page without a header charset); semantics identical — only '<' bytes
    # trigger any work in the original loop
    e = len(html)
    s = html.find(b"<")
    while 0 <= s < e:
        s += 1
        while s < e and html[s] in _WS:
            s += 1
        if html[s : s + 4].lower() != b"meta":
            s = html.find(b"<", s)
            continue
        s += 4
        p = html.find(b">", s)
        if p < 0:
            break
        idx = html.find(b"charset=", s, p)
        if idx < 0:
            s = html.find(b"<", s)
            continue
        p2 = idx + 8
        cs_s = p2
        while p2 < e and (html[p2] in _ALNUM or html[p2] == 0x2D):
            p2 += 1
        return html[cs_s:p2].decode("ascii", "replace")
    return None


def utf8conv(buf: bytes, content_type: Optional[str] = None) -> bytes:
    """Convert `buf` to UTF-8 per utf8conv.c:35-116.  Returns the buffer
    unchanged when no (non-UTF-8) charset is found or the codec is unknown
    (the reference's M_FAILED leaves the old buffer in the chain)."""
    cs = _find_charset(buf, content_type)
    if not cs:
        return buf
    if cs.upper().replace("_", "-") in ("UTF-8", "UTF8"):
        return buf
    try:
        text = buf.decode(cs)
    except (LookupError, UnicodeDecodeError):
        return buf
    out = text.encode("utf-8")
    cap = len(buf) * 2
    if len(out) > cap:
        # emulate iconv E2BIG truncation at a character boundary
        cut = cap
        while cut > 0 and (out[cut] & 0xC0) == 0x80:
            cut -= 1
        out = out[:cut]
    return out


def extract_text(html: bytes, content_type: Optional[str] = None) -> bytes:
    """The reference's default text chain: utf8conv then entityconv — the
    byte-identical extracted text per URL (SURVEY.md §2 M10/M11)."""
    return entityconv(utf8conv(html, content_type))
