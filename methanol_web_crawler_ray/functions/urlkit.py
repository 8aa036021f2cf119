"""URL canonicalization — byte-faithful re-expression of libmetha's URL model.

Semantics derived from the reference (nicholaides/Methanol-Web-Crawler):
  - ``url_set``       ← src/libmetha/url.c:172-260  (lm_url_set)
  - ``url_combine``   ← src/libmetha/url.c:278-300  (lm_url_combine)
  - ``_encodecpy``    ← src/libmetha/url.c:317-421  (lm_url_encodecpy)
  - ``strtourl``      ← src/libmetha/str.c:35-66    (lm_strtourl)
  - ``hostcmp``       ← src/libmetha/url.c:96-114   (lm_url_hostcmp)
  - ``resolve``       ← src/libmetha/urlengine.c:170-215 (ue_add URL dispatch)
  - seen-set key      ← src/libmetha/mtrie.c:22-44,216-232 (host+path,
    protocol excluded, case-insensitive 6-bit trie → lowercased key)

Deliberately-preserved reference quirks (transcribed, not "fixed"):
  * bytes <= 0x20 are %-encoded with UPPERCASE hex; bytes >= 0x80 are
    "%-encoded" through C signed-char arithmetic (url.c:341-344): the high
    nibble of a *negative* char shifts arithmetically, producing characters
    in ``(``..``/`` instead of hex — e.g. 0xE4 → ``%.4``.
  * after ``?``: space→``+``, ``&amp;``→``&``, stop at ``#``; NO %-encoding
    of high bytes inside the query (url.c:349-366).
  * ``//`` collapses; ``/.`` and ``/..`` resolve with the reference's exact
    backtrack rules, including ``/x/.`` → ``/x.`` (url.c:371-404).
  * the protocol's FIRST character is compared case-SENSITIVELY
    (url.c:186: ``*str == *protocols[x].str``), the rest case-insensitively.
  * hosts may only contain ``[A-Za-z0-9.:-]`` (url.c:238-244); anything else
    rejects the URL.  ``www.`` flag only when host length > 4 (url.c:222,249).

These functions are pure Python on purpose: they are the per-row kernel that
``stages/canonicalize.py`` wraps in vectorized ``map_batches`` UDFs.
"""

from __future__ import annotations

from dataclasses import dataclass, replace as dc_replace

PROTOCOLS = {
    # name -> id ; first char matched case-sensitively, rest case-insensitively
    "http": 1,
    "ftp": 2,
    "file": 3,
    "https": 4,
    "ftps": 5,
}

MAX_URL_SZ = 0xFFFF  # url_t sizes are uint16_t (url.h:59)

_ALNUM = frozenset(
    b"abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
)
_HOST_EXTRA = frozenset(b".-:")


@dataclass(frozen=True, slots=True)
class URL:
    """Canonical URL + parsed offsets (url_t, src/libmetha/url.h:57-64)."""

    s: str  # canonical URL string
    host_o: int  # host offset
    host_l: int  # host length
    file_o: int  # offset of the last '/' in the path
    ext_o: int  # offset of the '.' starting the file extension, 0 = none
    protocol: str  # 'http' | 'ftp' | 'file' | 'https' | 'ftps'
    is_dynamic: bool = False  # LM_URL_DYNAMIC: has '?'
    is_external: bool = False  # LM_URL_EXTERNAL: host differs from base
    www_prefix: bool = False  # LM_URL_WWW_PREFIX

    @property
    def host(self) -> str:
        return self.s[self.host_o : self.host_o + self.host_l]

    @property
    def path(self) -> str:
        return self.s[self.host_o + self.host_l :]

    @property
    def file(self) -> str:
        """Last path segment (umex FILE part: str+file_o+1, umex.c:111-113)."""
        return self.s[self.file_o + 1 :]

    @property
    def ext(self) -> str:
        """File extension: from ext_o+1 up to NUL or '?' (ftindex.c:113-116)."""
        if not self.ext_o:
            return ""
        out = []
        for ch in self.s[self.ext_o + 1 :]:
            if ch == "?":
                break
            out.append(ch)
        return "".join(out)

    @property
    def seen_key(self) -> str:
        """URL-seen set key: host+path, protocol excluded, case-insensitive
        (mtrie_tryadd keys on url->str+host_o through a case-insensitive
        6-bit trie — mtrie.c:216-232,22-44)."""
        return self.s[self.host_o :].lower()

    @property
    def host_norm(self) -> str:
        """Host with the ``www.`` prefix stripped, lowercased — the host_ent
        directory key (urlengine.c:219-224)."""
        h = self.s[self.host_o : self.host_o + self.host_l].lower()
        if self.www_prefix:
            return h[4:]
        return h

    @property
    def is_dir(self) -> bool:
        """URL names a directory: file_o is the last char (ftindex.c:148,181)."""
        return self.file_o == len(self.s) - 1


def _enc_byte(b: int) -> bytes:
    """%-encode one byte the way lm_url_encodecpy does (url.c:341-344),
    including the C signed-char arithmetic for bytes >= 0x80."""
    sb = b - 256 if b >= 0x80 else b  # C signed char
    c = sb >> 4  # arithmetic shift (negative for high bytes)
    hi = c + 0x37 if c > 0x09 else c + 0x30  # '7'+c : '0'+c
    c = sb & 0x0F  # bitwise AND promotes to int — always the true low nibble
    lo = c + 0x37 if c > 0x09 else c + 0x30
    return bytes((0x25, hi & 0xFF, lo & 0xFF))


def _encodecpy(
    prefix: bytes, tail: bytes, host_o: int, host_l: int
) -> tuple[bytes, bool, int, int]:
    """lm_url_encodecpy (url.c:317-421): copy `prefix` raw, then copy `tail`
    applying %-encoding, query rules, fragment cut and dot-segment
    resolution.  Returns (out, is_dyn, file_o, ext_o) with file_o/ext_o == 0
    meaning "not updated" (caller keeps its previous value)."""
    prefix_sz = len(prefix)
    host_end = host_o + host_l
    n = len(tail)

    def ch(i: int) -> int:
        # C reads past the buffer end into NUL-terminated storage
        return tail[i] if 0 <= i < n else 0

    out = bytearray(prefix)
    t = prefix_sz

    def put(b: int) -> None:
        nonlocal t
        if t < len(out):
            out[t] = b
        else:
            out.append(b)
        t += 1

    is_dyn = False
    file_o = 0
    ext_o = 0

    s = 0
    while s < n:
        b = tail[s]
        if b <= 0x20 or b >= 0x80:
            for eb in _enc_byte(b):
                put(eb)
            s += 1
            continue
        if b == 0x3F:  # '?'
            is_dyn = True
            while s < n:  # query loop: url.c:349-366
                b = tail[s]
                if b == 0x20:
                    put(0x2B)  # ' ' -> '+'
                elif (
                    b == 0x26
                    and ch(s + 1) == 0x61
                    and ch(s + 2) == 0x6D
                    and ch(s + 3) == 0x70
                    and ch(s + 4) == 0x3B
                ):
                    put(0x26)  # '&amp;' -> '&'
                    s += 4
                elif b == 0x23:  # '#'
                    break
                else:
                    put(b)
                s += 1
            break
        if b == 0x23:  # '#': cut
            break
        if b == 0x2F:  # '/'
            while ch(s + 1) == 0x2F:  # collapse '//'
                s += 1
            if ch(s + 1) == 0x2E:  # '/.'
                nx = ch(s + 2)
                if nx == 0x2E and (ch(s + 3) == 0x2F or ch(s + 3) == 0):
                    # '/..' → backtrack one path segment (url.c:375-388 pback)
                    if t > host_end + 1:
                        t -= 1
                        while not (
                            t <= host_end
                            or (out[t] == 0x2F and t != prefix_sz - 1)
                        ):
                            t -= 1
                    # C: *t = *(s+3) without t++ — overwritten or past-end; skip.
                    s += 3  # s+=2 then loop s++
                    continue
                elif nx == 0x2F:
                    s += 2  # '/./' → '/'
                elif nx == 0:
                    s += 1  # trailing '/.': writes '.', drops the '/'
            file_o = t
            ext_o = 0
            put(tail[s])
            s += 1
            continue
        if b == 0x2E:  # '.'
            if s == 0 and ch(1) == 0x2E and ch(2) == 0x2F:
                # leading '../' in a relative ref (url.c:399-401): backtrack
                if t > host_end + 1:
                    t -= 1
                    while not (
                        t <= host_end or (out[t] == 0x2F and t != prefix_sz - 1)
                    ):
                        t -= 1
                s += 2  # C: s-- ; goto pback (s+=2) ; loop s++  → net +2
                continue
            if ch(s + 1) == 0x2F:
                s += 1  # './' → skip the '.'
                continue
            ext_o = t
            put(b)
            s += 1
            continue
        put(b)
        s += 1

    return bytes(out[:t]), is_dyn, file_o, ext_o


def url_set(raw: str | bytes) -> URL | None:
    """lm_url_set (url.c:172-260): parse + canonicalize an absolute URL.
    Returns None where the reference returns M_FAILED."""
    sb = raw.encode("utf-8", "surrogateescape") if isinstance(raw, str) else raw
    if not sb or len(sb) > MAX_URL_SZ:
        return None
    n = len(sb)
    i = 0
    while i < n and sb[i] in _ALNUM:
        i += 1
    if i >= n or sb[i] != 0x3A:  # ':' required
        return None
    proto_raw = sb[:i]
    protocol = None
    for name, _pid in PROTOCOLS.items():
        nb = name.encode()
        # first char case-SENSITIVE, rest case-insensitive (url.c:184-189)
        if (
            len(nb) == i
            and sb[0] == nb[0]
            and proto_raw[1:].lower() == nb[1:]
        ):
            protocol = name
            break
    if protocol is None:
        return None
    # find start of host: skip ':' then any '/'s (url.c:204-208)
    i += 1
    while i < n and sb[i] == 0x2F:
        i += 1
    if i >= n:
        return None  # "http://" only
    host_o = i
    # scan host (first char unvalidated — url.c:212-246)
    i += 1
    while True:
        if i >= n:
            # no path: host runs to the end; canonical form appends '/'
            host_l = i - host_o
            www = host_l > 4 and sb[host_o : host_o + 4].lower() == b"www."
            out, is_dyn, file_o, ext_o = _encodecpy(sb, b"/", host_o, host_l)
            return URL(
                s=out.decode("utf-8", "surrogateescape"),
                host_o=host_o,
                host_l=host_l,
                file_o=file_o if file_o else i,
                ext_o=ext_o,
                protocol=protocol,
                is_dynamic=is_dyn,
                www_prefix=www,
            )
        b = sb[i]
        if b not in _ALNUM:
            if b == 0x2F:
                break
            if b not in _HOST_EXTRA:
                return None  # weird character in host
        i += 1
    host_l = i - host_o
    www = host_l > 4 and sb[host_o : host_o + 4].lower() == b"www."
    out, is_dyn, file_o, ext_o = _encodecpy(sb[:i], sb[i:], host_o, host_l)
    return URL(
        s=out.decode("utf-8", "surrogateescape"),
        host_o=host_o,
        host_l=host_l,
        file_o=file_o if file_o else i,
        ext_o=ext_o,
        protocol=protocol,
        is_dynamic=is_dyn,
        www_prefix=www,
    )


def url_combine(source: URL, ref: str | bytes) -> URL | None:
    """lm_url_combine (url.c:278-300): join a relative reference against
    `source`.  '/'-leading refs resolve from the host root, others append
    after the last '/' of source.  Clears DYNAMIC, keeps WWW flag."""
    rb = ref.encode("utf-8", "surrogateescape") if isinstance(ref, str) else ref
    if not rb:
        return None
    src = source.s.encode("utf-8", "surrogateescape")
    if rb[0] == 0x2F:
        offs = source.host_o + source.host_l
        base_file_o = offs
    else:
        offs = source.file_o + 1
        base_file_o = source.file_o
    if offs + len(rb) > MAX_URL_SZ:
        return None
    out, is_dyn, file_o, ext_o = _encodecpy(
        src[:offs], rb, source.host_o, source.host_l
    )
    return URL(
        s=out.decode("utf-8", "surrogateescape"),
        host_o=source.host_o,
        host_l=source.host_l,
        file_o=file_o if file_o else base_file_o,
        ext_o=ext_o,
        protocol=source.protocol,
        is_dynamic=is_dyn,
        is_external=source.is_external,
        www_prefix=source.www_prefix,
    )


def strtourl(raw: str) -> str:
    """lm_strtourl (str.c:35-66): guess a protocol for a bare string."""
    i = 0
    n = len(raw)
    while i < n and raw[i].isascii() and raw[i].isalnum():
        i += 1
    if i < n and raw[i] == ":":
        return raw
    if raw.startswith("/") or raw.startswith("./"):
        return "file://" + raw
    if raw[:4].lower() == "ftp.":
        return "ftp://" + raw
    return "http://" + raw


def hostcmp(u1: URL, u2: URL) -> bool:
    """lm_url_hostcmp (url.c:96-114): case-insensitive host equality with
    ``www.X`` ≡ ``X``.  Returns True when hosts match."""
    h1, h2 = u1.host.lower(), u2.host.lower()
    if len(h1) == len(h2):
        return h1 == h2
    lng, sht = (h1, h2) if len(h1) > len(h2) else (h2, h1)
    if len(lng) - len(sht) == 4 and lng.startswith("www."):
        return lng[4:] == sht
    return False


def resolve(base: URL, ref: str | bytes) -> URL | None:
    """ue_add's URL dispatch (urlengine.c:184-215): '/'-leading → combine
    from host root; a ':' before any non-alnum char → absolute url_set with
    the EXTERNAL flag computed vs `base`; otherwise → combine."""
    rs = ref if isinstance(ref, str) else ref.decode("utf-8", "surrogateescape")
    if not rs:
        return None
    if rs[0] == "/":
        return url_combine(base, rs)
    for c in rs:
        if not (c.isascii() and c.isalnum()):
            if c == ":":
                u = url_set(rs)
                if u is None:
                    return None
                if u.protocol != base.protocol or not hostcmp(u, base):
                    u = dc_replace(u, is_external=True)
                return u
            break
    return url_combine(base, rs)
