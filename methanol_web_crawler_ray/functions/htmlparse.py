"""HTML / CSS / plaintext link extractors — libmetha-equivalent scanners.

  - ``extract_html_links``  ← src/libmetha/html.c:101-187 (lm_parser_html),
    html.c:277-342 (parse_tag), html.c:219-271 (tag_next_attr), tag table
    html.c:71-75 (script / style / textarea containers).
  - ``extract_css_urls``    ← src/libmetha/builtin.c:139-164.
  - ``extract_text_urls``   ← src/libmetha/builtin.c:175-201.

The scanners work on ``bytes`` and return raw references in DOCUMENT ORDER
(the order the reference calls ue_add), which downstream canonicalization
must preserve.

Preserved reference quirks:
  * only the FIRST ``href``/``src`` per tag is extracted (html.c:335-337).
  * refs starting with ``#`` are skipped (html.c:334).
  * container-tag detection is a PREFIX match — ``<styleX>`` matches
    ``style`` (html.c:288-291 checks name_len < taglen only).
  * ``<style>`` content goes to the CSS extractor; ``<script>`` and
    ``<textarea>`` content produce nothing (html.c:72-75,190-210).
  * a closing container tag needs >= 8 bytes remaining, else scanning
    aborts to end-of-buffer (html.c:160-163).
  * CURIE refs ``[prefix:rest]`` expand via ``xmlns:prefix`` attributes
    collected from the ``<html>`` tag (html.c:297-341).
  * quoted attr values: the '=' fast-skip in the outer tag scan is a no-op
    for quoted values (html.c:128-131: memchr starts ON the quote), so a
    ``>`` inside a quoted value terminates the tag — faithful.

Documented deviation:
  * the reference's plaintext extractor compares ``p - e >= protocol_len``
    (builtin.c:182) which is negative for every in-buffer position, so it
    never extracts anything — a sign bug.  ``extract_text_urls`` implements
    the evident intent (``p - start >= protocol_len``) and keeps the rest of
    the scan (chars ``[A-Za-z0-9%?=&/.]`` after ``://``) byte-faithful.
"""

from __future__ import annotations

from typing import List, Tuple

_WS = frozenset(b" \t\n\r\v\f")
_TAGS = (b"script", b"style", b"textarea")  # html.c:71-75 order
_ALNUM = frozenset(
    b"abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
)


def _isspace(b: int) -> bool:
    return b in _WS


def _tag_next_attr(buf: bytes, p: int, e: int):
    """tag_next_attr (html.c:219-271).  Returns (new_p, attr, val) or None.
    Out-of-range reads behave as NUL (the C buffers are NUL-backed)."""

    def ch(i: int) -> int:
        return buf[i] if i < e else 0

    while p < e:
        while p < e and _isspace(buf[p]):
            p += 1
        attr_s = p
        attr_e = None
        while p < e:
            if _isspace(buf[p]):
                attr_e = p
                p += 1
                while p < e and _isspace(buf[p]):
                    p += 1
                if ch(p) != 0x3D:  # not '='
                    continue  # C: continue inner loop, attr_s NOT reset
                break
            if buf[p] == 0x3D:  # '='
                attr_e = p
                break
            p += 1
        # skip '=' and following spaces (C: do p++; while isspace)
        p += 1
        while p < e and _isspace(buf[p]):
            p += 1
        if p >= e:
            break
        s = p
        q = ch(p)
        if q == 0x27 or q == 0x22:  # quote
            p += 1
            s += 1
            while s < e and buf[s] != q:
                s += 1
            val = buf[p:s]
            new_p = s + 1
        else:
            s += 1
            while s < e and not _isspace(buf[s]) and buf[s] != 0x3E:
                s += 1
            val = buf[p:s]
            new_p = s
        attr = buf[attr_s:attr_e] if attr_e is not None else buf[attr_s:p]
        return new_p, attr, val
    return None


def _parse_tag(
    buf: bytes, tb: int, te: int, n: int, curies: List[Tuple[bytes, bytes]], out: List[bytes]
) -> int:
    """parse_tag (html.c:277-342).  tb = '<' index, te = '>' index (may be
    stale/smaller — then the span is clamped to the buffer end, see module
    doc).  Returns the container-tag index or -1."""
    length = te - tb
    if length <= 0:
        length = n - tb  # stale te: C's size_t underflow scans onward
    p = tb + 1
    e = min(tb + length, n)
    for x, name in enumerate(_TAGS):
        if len(name) < length and buf[p : p + len(name)].lower() == name:
            return x
    if buf[p : p + 4].lower() == b"html":
        p += 4
        while True:
            r = _tag_next_attr(buf, p, e)
            if r is None:
                break
            p, attr, val = r
            if len(attr) > 6 and attr[:6].lower() == b"xmlns:":
                curies.append((attr[6:], val))
    else:
        while p < e and not _isspace(buf[p]):
            p += 1
        while True:
            r = _tag_next_attr(buf, p, e)
            if r is None:
                break
            p, attr, val = r
            al = attr.lower()
            if al == b"href" or al == b"src":
                if val[:1] == b"[" and curies:
                    for prefix, curl in curies:
                        plen = len(prefix)
                        if len(val) > plen + 3:
                            if (
                                val[1 : 1 + plen].lower() == prefix.lower()
                                and val[1 + plen : 2 + plen] == b":"
                            ):
                                out.append(curl + val[2 + plen : len(val) - 1])
                                break
                elif val[:1] != b"#":
                    out.append(val)
                return -1  # first href/src only (html.c:335-337)
    return -1


def extract_css_urls(buf: bytes) -> List[bytes]:
    """lm_extract_css_urls (builtin.c:139-164): scan for url(...) tokens."""
    out: List[bytes] = []
    e = len(buf)

    def ch(i: int) -> int:
        return buf[i] if i < e else 0

    p = buf.find(b"url")
    while p >= 0:
        p += 3
        while _isspace(ch(p)):
            p += 1
        if ch(p) == 0x28:  # '('
            p += 1
            while _isspace(ch(p)):
                p += 1
            c = ch(p)
            t = b'")' if c == 0x22 else (b"')" if c == 0x27 else b")")
            if t[0:1] != b")":
                p += 1
        else:
            c = ch(p)
            t = b'"' if c == 0x22 else (b"'" if c == 0x27 else b";")
        s = buf.find(t, p)
        if s < 0:
            nxt = buf.find(b"url", p)
            p = nxt
            continue
        out.append(buf[p:s])
        p = buf.find(b"url", s)
    return out


def extract_text_urls(buf: bytes) -> List[bytes]:
    """lm_extract_text_urls (builtin.c:175-201) with the sign bug fixed
    (see module doc): find http:// and ftp:// URLs in plain text."""
    out: List[bytes] = []
    e = len(buf)
    protos = (b"http", b"ftp")
    p = buf.find(b"://")
    while p >= 0 and p < e:
        for name in protos:
            ln = len(name)
            if p >= ln and buf[p - ln : p] == name:
                s = p + 3
                while s < e:
                    b = buf[s]
                    if not (
                        b in _ALNUM
                        or b in b"%?=&/."
                    ):
                        out.append(buf[p - ln : s])
                        break
                    s += 1
                p = s
                break
        nxt = buf.find(b"://", p + 1)
        p = nxt
    return out


def extract_html_links(buf: bytes) -> List[bytes]:
    """lm_parser_html (html.c:101-187): single-pass tag scan emitting raw
    href/src refs (and ``<style>``-content CSS refs) in document order."""
    out: List[bytes] = []
    curies: List[Tuple[bytes, bytes]] = []
    e = len(buf)
    p = 0
    te = 0  # persists across iterations like the C local (may go stale)
    while p < e:
        # The C do-while steps p bytewise, re-running the tag scan at every
        # '<' until one is its own tag-begin fixpoint (scan sets tb == scan
        # start).  Non-'<' bytes are no-ops, so this fast-forwards with
        # find() over them and visits the '<' positions IN ORDER — the
        # observable (tb, te) sequence is byte-identical (hot-path rewrite;
        # goldens in tests/test_parse.py gate it).
        tb = e
        f = buf.find(b"<", p, e)
        while f >= 0:
            tb = f
            s = f + 1
            while s < e:
                if buf[s] == 0x3D:  # '='
                    s += 1
                    q = buf[s] if s < e else 0
                    if q == 0x22 or q == 0x27:
                        # memchr starts ON the quote → no-op (html.c:128-131)
                        pass
                    else:
                        s += 1  # C do-while: first value char untested
                        while s < e and buf[s] != 0x3E and not _isspace(buf[s]):
                            s += 1
                        if s < e and buf[s] == 0x3E:
                            te = s
                            break
                        if s >= e:
                            break
                if s >= e:
                    break
                if buf[s] == 0x3C:
                    tb = s
                elif buf[s] == 0x3E:
                    te = s
                    break
                s += 1
            if tb == f:
                break
            f = buf.find(b"<", f + 1, e)
        if f < 0:
            tb = e
        p = tb + 1
        if tb >= e:
            break
        ttype = _parse_tag(buf, tb, te, e, curies, out)
        if ttype != -1:
            # scan for the closing </name> (html.c:155-177)
            name = _TAGS[ttype]
            while True:
                p = buf.find(b"<", p)
                if p < 0:
                    p = e
                    break
                if p + 1 < e and buf[p + 1] == 0x2F:  # '/'
                    if e - p < 8:
                        p = e
                        break
                    if buf[p + 2 : p + 2 + len(name)].lower() == name:
                        if ttype == 1 and te + 1 < p:  # style → CSS extractor
                            out.extend(extract_css_urls(buf[te + 1 : p]))
                        p += 2 + len(name) + 1
                        break
                    p += 1
                else:
                    p += 1
        p += 1  # outer for-loop increment (html.c:117)
    return out


def _strip_tags_collapse(b: bytes) -> bytes:
    """Remove ``<...>`` spans and collapse whitespace runs to single
    spaces (trimmed) — the anchor-TEXT normalization rule."""
    parts: List[bytes] = []
    p, e = 0, len(b)
    while p < e:
        lt = b.find(b"<", p)
        if lt < 0:
            parts.append(b[p:])
            break
        parts.append(b[p:lt])
        gt = b.find(b">", lt)
        if gt < 0:
            break
        p = gt + 1
    return b" ".join(b"".join(parts).split())


def extract_anchor_texts(buf: bytes) -> List[Tuple[bytes, bytes]]:
    """[(href_raw, anchor_text)] for ``<a>`` tags in document order —
    an EXTENSION operator (libmetha extracts refs only, html.c:334-337;
    anchor text is the classic web-corpus signal the reference never
    needed).  Grammar decisions, kept consistent with the transcribed
    extractor where they overlap:

    * first ``href`` per tag via the same ``_tag_next_attr`` scanner
      (quoted/unquoted/case-insensitive attributes);
    * ``#``-refs and hrefless ``<a>`` tags are skipped (html.c:334);
    * ``<script>`` / ``<style>`` / ``<textarea>`` content is never
      scanned (container semantics of html.c:72-75);
    * anchor text = bytes between the tag end and the next ``</a``
      (case-insensitive), nested tags stripped, whitespace collapsed.
    """
    out: List[Tuple[bytes, bytes]] = []
    e = len(buf)
    lower = buf.lower()
    p = 0
    while p < e:
        tb = lower.find(b"<", p)
        if tb < 0:
            break
        skipped = False
        for name in _TAGS:
            if lower[tb + 1 : tb + 1 + len(name)] == name:
                close = lower.find(b"</" + name, tb + 1)
                p = e if close < 0 else close + 2 + len(name)
                skipped = True
                break
        if skipped:
            continue
        nxt = buf[tb + 2 : tb + 3]
        if lower[tb + 1 : tb + 2] == b"a" and (
            tb + 2 >= e or nxt in (b" ", b"\t", b"\n", b"\r", b"\v",
                                   b"\f", b">", b"/")
        ):
            te = buf.find(b">", tb)
            if te < 0:
                break
            href = None
            q = tb + 2
            while True:
                r = _tag_next_attr(buf, q, te)
                if r is None:
                    break
                q, attr, val = r
                if attr.lower() == b"href":
                    href = val
                    break
            if href and href[:1] != b"#":
                ce = lower.find(b"</a", te + 1)
                inner = buf[te + 1 : ce if ce >= 0 else e]
                out.append((href, _strip_tags_collapse(inner)))
            p = te + 1
        else:
            p = tb + 1
    return out
