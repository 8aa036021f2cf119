"""HTML → XML converter (``xmlconv``) — libmetha-equivalent rewrite.

  ← src/libmetha/html.c:401-742 (lm_parser_xmlconv), void-element table
    html.c:357-362, encoded-content table html.c:371-374,
    memcpy_tolower html.c:82-96.

Transforms, byte-faithful to the reference:
  * drop ``<!DOCTYPE ...>``, ``<!-- ... -->`` comments and ``<? ... ?>``.
  * text before the first element is DROPPED (html.c:424-436: text is only
    copied while the element stack is non-empty).
  * ``&`` in text and attribute values → ``&amp;``.
  * tag and attribute names lowercased; attribute values re-quoted with the
    source quote (``"`` when unquoted); valueless attributes dropped;
    ``xmlns*`` attributes dropped (html.c:557-559).
  * void elements (br hr img link meta base basefont area input) self-close
    (``<br ... />``); their table match is exact-length, case-insensitive.
  * ``script``/``style``/``textarea`` content is entity-encoded: ``&`` →
    ``&amp;``, ``<`` (other than the matching close tag) → ``&lt;``; the
    final chunk before the close tag is copied through memcpy_tolower —
    i.e. LOWERCASED (html.c:664-672), faithful.
  * a missing ``<html>`` root is synthesized (html.c:484-493).
  * mismatched ``</close>`` tags: the stack unwinds to the matching open
    element, emitting closes for everything above it; a close that matches
    nothing is dropped; the bottom stack slot can only match when it is the
    top (html.c:692-703: the scan aborts at x<=0), faithful.
  * leftover open elements are closed at end-of-buffer in their ORIGINAL
    case (html.c:726-734 uses memcpy, not memcpy_tolower), faithful.
"""

from __future__ import annotations

from typing import List, Tuple

_WS = frozenset(b" \t\n\r\v\f")
_ALNUM = frozenset(
    b"abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
)
NO_CONTENT = (b"br", b"hr", b"img", b"link", b"meta", b"base", b"basefont", b"area", b"input")
ENC_CONTENT = (b"textarea", b"script", b"style")


def xmlconv(buf: bytes) -> bytes:
    e = len(buf)
    out = bytearray()
    est: List[Tuple[bytes, bool]] = []  # (name-as-in-source, synthetic_root)

    def ch(i: int) -> int:
        return buf[i] if 0 <= i < e else 0

    p = 0
    while p < e:
        if buf[p] != 0x3C:  # not '<'
            if est:
                s = p
                while True:
                    if s < e and buf[s] == 0x26:  # '&'
                        out += buf[p:s]
                        p = s + 1
                        out += b"&amp;"
                        s += 1
                        continue
                    if s >= e or buf[s] == 0x3C:
                        out += buf[p:s]
                        break
                    s += 1
                p = s
            else:
                p += 1  # text before the first element is dropped
            continue
        # '<'
        if ch(p + 1) == 0x21 and buf[p + 2 : p + 9].upper() == b"DOCTYPE":
            idx = buf.find(b">", p)
            if idx < 0:
                return bytes(out)  # reference M_ERRORs; emit what we have
            p = idx + 1
            continue
        p += 1
        if ch(p) != 0x2F:  # open tag
            trailing = False  # noco/normal tags skip to the source '>' after
            while True:  # 'restart' loop (html.c:462)
                if buf[p : p + 3] == b"!--":
                    idx = buf.find(b"-->", p + 3)
                    p = e if idx < 0 else idx + 3
                    break
                if ch(p) == 0x3F:  # '?'
                    idx = buf.find(b">", p + 1)
                    p = e if idx < 0 else idx + 1
                    break
                s = p
                while s < e and buf[s] not in (0x2F, 0x3E) and buf[s] not in _WS:
                    s += 1
                ln = s - p
                name = buf[p:s]
                if not est and name.lower() != b"html":
                    est.append((b"html", True))
                    out += b"<html>"
                out += b"<" + name.lower()
                lname = name.lower()
                noco = any(len(t) == ln and lname == t for t in NO_CONTENT)
                enc_name = None
                if not noco:
                    for t in ENC_CONTENT:
                        if len(t) == ln and lname == t:
                            enc_name = t
                            break
                    if enc_name is None:
                        est.append((name, False))
                # attribute loop (html.c:520-617)
                restart = False
                while s < e:
                    while s < e and buf[s] in _WS:
                        s += 1
                    as_ = s
                    while s < e and (buf[s] in _ALNUM or buf[s] == 0x3A):
                        s += 1
                    ae = s
                    while s < e and buf[s] in _WS:
                        s += 1
                    if ch(s) == 0x3D:  # '='
                        s += 1
                        while s < e and buf[s] in _WS:
                            s += 1
                        q = ch(s)
                        if q == 0x22 or q == 0x27:
                            s += 1
                            vs = s
                            while s < e and buf[s] != q:
                                s += 1
                            ve = s + 1
                        else:
                            q = 0x22
                            vs = s
                            s += 1  # C do-while: first char untested
                            while s < e and buf[s] != 0x3E and buf[s] not in _WS:
                                s += 1
                            ve = s
                        if buf[as_ : as_ + 5].lower() != b"xmlns":
                            val = buf[vs:s].replace(b"&", b"&amp;")
                            out += (
                                b" "
                                + buf[as_:ae].lower()
                                + b"="
                                + bytes((q,))
                                + val
                                + bytes((q,))
                            )
                        s = ve
                        continue
                    elif ch(s) == 0x3C:  # '<' inside tag: fault tolerance
                        if est:
                            est.pop()
                        p = s + 1
                        restart = True
                        break
                    elif ch(s) == 0x3E:  # '>'
                        break
                    s += 1
                if restart:
                    continue
                p = s
                if noco:
                    out += b"/>"
                    trailing = True
                elif enc_name is not None:
                    out += b">"
                    p += 1
                    s = p
                    closed = False
                    while s < e:
                        b2 = buf[s]
                        if b2 == 0x26:  # '&'
                            out += buf[p:s]
                            p = s + 1
                            out += b"&amp;"
                        elif b2 == 0x3C:  # '<'
                            if ch(s + 1) == 0x2F and buf[
                                s + 2 : s + 2 + len(enc_name)
                            ].lower() == enc_name:
                                s += 2 + len(enc_name)
                                # final chunk + '</name' LOWERCASED (html.c:666)
                                out += buf[p:s].lower()
                                while s < e and buf[s] != 0x3E:
                                    s += 1
                                closed = True
                                break
                            out += buf[p:s] + b"&lt;"
                            p = s + 1
                        s += 1
                    p = s + 1
                    out += b">"
                    break  # continue outer loop
                else:
                    out += b">"
                    trailing = True
                break
            if trailing:
                # shared trailing skip (html.c:713-720)
                while p < e and buf[p] != 0x3E:
                    p += 1
                p += 1
            continue
        # closing tag '</...'
        p += 1
        s = p
        while s < e and buf[s] != 0x3E and buf[s] not in _WS:
            s += 1
        ln = s - p
        cname = buf[p:s].lower()
        if not est:
            x = -1
        else:
            # html.c:692-699: scan top-down; the bottom slot is only ever
            # tested when it IS the top (the scan aborts at x<=0), faithful
            x = len(est) - 1
            while not (len(est[x][0]) == ln and est[x][0].lower() == cname):
                x -= 1
                if x <= 0:
                    x = -1
                    break
        if x != -1:
            while len(est) > x:
                nm, _syn = est.pop()
                out += b"</" + nm.lower() + b">"
        while p < e and buf[p] != 0x3E:
            p += 1
        p += 1
    while est:
        nm, _syn = est.pop()
        out += b"</" + nm + b">"  # original case (html.c:731), faithful
    return bytes(out)
