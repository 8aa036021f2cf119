"""FTP LIST response parser (M8/S3) — a from-scratch Python
reimplementation of the DECISIONS of the reference's ftpparse
(src/libmetha/ftpparse.c:1-449, D. J. Bernstein's public format notes at
cr.yp.to/ftpparse.html), covering the same dialect families:

  EPLF; UNIX ls (with/without gid, Microsoft FTP for Windows, WFTPD,
  NetWare, NetPresenz); VMS/MultiNet; MSDOS / Microsoft FTP Service /
  Windows NT FTP Server.

Deviations (documented):
  * mtime is returned STRUCTURED (kind + calendar fields) instead of TAI
    seconds — the reference's totai()/guesstai() conversion depends on
    the wall clock (year guessing for recent UNIX dates), which would
    make pipeline output nondeterministic; a UNIX date with no year
    carries ``year=None``.
  * numeric fields are parsed with the same lenient digit fold the C
    uses (``u = u*10 + (c - '0')``), so malformed-but-accepted lines
    produce the same values.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

_MONTHS = ("jan", "feb", "mar", "apr", "may", "jun",
           "jul", "aug", "sep", "oct", "nov", "dec")


@dataclass
class FtpEntry:
    name: str
    try_cwd: bool = False   # directory-ish: CWD should work
    try_retr: bool = False  # file-ish: RETR should work
    size: Optional[int] = None
    # ('local', epoch) | ('remote-minute', y|None, mo, d, hh, mm)
    # | ('remote-day', y, mo, d)
    mtime: Optional[Tuple] = None
    id: Optional[str] = None


def _getlong(s: str) -> int:
    """The C's getlong: fold every char as a digit (lenient)."""
    u = 0
    for c in s:
        u = u * 10 + (ord(c) - 48)
    return u


def _getmonth(s: str) -> int:
    if len(s) == 3 and s.lower() in _MONTHS:
        return _MONTHS.index(s.lower())
    return -1


def ftpparse(line: str) -> Optional[FtpEntry]:
    """Parse ONE line of a LIST response; None for unparseable/info lines
    (matching the reference's return 0)."""
    buf = line
    ln = len(buf)
    if ln < 2:
        return None

    c0 = buf[0]

    # ---- EPLF: "+i8388621.29609,m824255902,/,\tdev"
    if c0 == "+":
        e = FtpEntry(name="")
        i = 1
        for j in range(1, ln):
            if buf[j] == "\t":
                e.name = buf[j + 1:]
                return e
            if buf[j] == ",":
                f = buf[i]
                if f == "/":
                    e.try_cwd = True
                elif f == "r":
                    e.try_retr = True
                elif f == "s":
                    e.size = _getlong(buf[i + 1:j])
                elif f == "m":
                    e.mtime = ("local", _getlong(buf[i + 1:j]))
                elif f == "i":
                    e.id = buf[i + 1:j]
                i = j + 1
        return None

    # ---- UNIX ls family (also NetWare / NetPresenz / MS unix-style)
    if c0 in "bcdlps-":
        e = FtpEntry(name="")
        if c0 == "d":
            e.try_cwd = True
        if c0 == "-":
            e.try_retr = True
        if c0 == "l":
            e.try_cwd = e.try_retr = True

        state = 1
        size = 0
        month = -1
        mday = 0
        i = 0
        j = 1
        while j < ln:
            if buf[j] == " " and buf[j - 1] != " ":
                tok = buf[i:j]
                if state == 1:      # skipping perm
                    state = 2
                elif state == 2:    # skipping nlink
                    state = 3
                    if len(tok) == 6 and tok[0] == "f":  # NetPresenz
                        state = 4
                elif state == 3:    # skipping uid
                    state = 4
                elif state == 4:    # tentative size
                    size = _getlong(tok)
                    state = 5
                elif state == 5:    # month, else re-tentative size
                    month = _getmonth(tok)
                    if month >= 0:
                        state = 6
                    else:
                        size = _getlong(tok)
                elif state == 6:    # mday
                    mday = _getlong(tok)
                    state = 7
                elif state == 7:    # HH:MM / H:MM / year
                    if len(tok) == 4 and tok[1] == ":":
                        e.mtime = ("remote-minute", None, month, mday,
                                   _getlong(tok[0]), _getlong(tok[2:4]))
                    elif len(tok) == 5 and tok[2] == ":":
                        e.mtime = ("remote-minute", None, month, mday,
                                   _getlong(tok[0:2]), _getlong(tok[3:5]))
                    elif len(tok) >= 4:
                        e.mtime = ("remote-day", _getlong(tok), month, mday)
                    else:
                        return None
                    e.name = buf[j + 1:]
                    state = 8
                # state 8: twiddling thumbs
                i = j + 1
                while i < ln and buf[i] == " ":
                    i += 1
            j += 1
        if state != 8:
            return None
        e.size = size

        if c0 == "l":  # "bin -> usr/bin": name stops before the arrow
            k = e.name.find(" -> ")
            if k >= 0:
                e.name = e.name[:k]
        # NetWare's extra spaces before the name; the C strips only when
        # namelen > 3 (ftpparse.c), so a name of exactly three spaces is
        # emitted as-is
        if len(buf) > 1 and buf[1] in " [" and len(e.name) > 3 \
                and e.name.startswith("   "):
            e.name = e.name[3:]
        return e

    # ---- VMS / MultiNet: "00README.TXT;1  2 30-DEC-1996 17:44 [SYSTEM] ..."
    semi = buf.find(";")
    if semi >= 0:
        e = FtpEntry(name=buf[:semi])
        if semi > 4 and buf[semi - 4:semi] == ".DIR":
            e.name = buf[:semi - 4]
            e.try_cwd = True
        if not e.try_cwd:
            e.try_retr = True
        try:
            i = semi
            while buf[i] != " ":
                i += 1
            while buf[i] == " ":
                i += 1
            while buf[i] != " ":
                i += 1
            while buf[i] == " ":
                i += 1
            j = i
            while buf[j] != "-":
                j += 1
            mday = _getlong(buf[i:j])
            while buf[j] == "-":
                j += 1
            i = j
            while buf[j] != "-":
                j += 1
            month = _getmonth(buf[i:j])
            if month < 0:
                return None
            while buf[j] == "-":
                j += 1
            i = j
            while buf[j] != " ":
                j += 1
            year = _getlong(buf[i:j])
            while buf[j] == " ":
                j += 1
            i = j
            while buf[j] != ":":
                j += 1
            hour = _getlong(buf[i:j])
            while buf[j] == ":":
                j += 1
            i = j
            while buf[j] != ":" and buf[j] != " ":
                j += 1
            minute = _getlong(buf[i:j])
        except IndexError:
            return None  # the C bails with return 0 at end-of-line
        e.mtime = ("remote-minute", year, month, mday, hour, minute)
        return e

    # ---- MSDOS: "04-27-00  09:09PM  <DIR>  licensed"
    if c0.isdigit():
        e = FtpEntry(name="")
        try:
            i = 0
            j = 0
            while buf[j] != "-":
                j += 1
            month = _getlong(buf[i:j]) - 1
            while buf[j] == "-":
                j += 1
            i = j
            while buf[j] != "-":
                j += 1
            mday = _getlong(buf[i:j])
            while buf[j] == "-":
                j += 1
            i = j
            while buf[j] != " ":
                j += 1
            year = _getlong(buf[i:j])
            if year < 50:
                year += 2000
            if year < 1000:
                year += 1900
            while buf[j] == " ":
                j += 1
            i = j
            while buf[j] != ":":
                j += 1
            hour = _getlong(buf[i:j])
            while buf[j] == ":":
                j += 1
            i = j
            while buf[j] != "A" and buf[j] != "P":
                j += 1
            minute = _getlong(buf[i:j])
            if hour == 12:
                hour = 0
            if buf[j] == "A":
                j += 1
                if j == ln:
                    return None
            if buf[j] == "P":
                hour += 12
                j += 1
                if j == ln:
                    return None
            if buf[j] == "M":
                j += 1
                if j == ln:
                    return None
            while buf[j] == " ":
                j += 1
            if buf[j] == "<":
                e.try_cwd = True
                while buf[j] != " ":
                    j += 1
            else:
                i = j
                while buf[j] != " ":
                    j += 1
                e.size = _getlong(buf[i:j])
                e.try_retr = True
            while buf[j] == " ":
                j += 1
        except IndexError:
            return None
        e.name = buf[j:]
        e.mtime = ("remote-minute", year, month, mday, hour, minute)
        return e

    # info lines ("total 14786", VMS directory headers, ...) — ignored
    return None


def parse_listing(body: bytes) -> List[FtpEntry]:
    """All parseable entries of a LIST response, in order.  Matches the
    reference exactly (builtin.c:207-244): only '\\n'-TERMINATED lines
    are parsed — a trailing unterminated fragment is dropped — and '\\r'
    is NOT stripped, so CRLF listings keep the '\\r' in names just as
    the C does."""
    out = []
    lines = body.decode("utf-8", "surrogateescape").split("\n")[:-1]
    for raw in lines:
        if not raw:
            continue
        e = ftpparse(raw)
        if e is not None and e.name:
            out.append(e)
    return out


def listing_refs(body: bytes) -> List[bytes]:
    """The ftp parser's ue_add refs: directory entries get a trailing
    '/' (lm_parser_ftp, builtin.c:220-236); over-long names are skipped
    (the reference's 126-char guard)."""
    refs = []
    for e in parse_listing(body):
        if len(e.name) >= 126:
            continue
        ref = e.name + "/" if e.try_cwd else e.name
        refs.append(ref.encode("utf-8", "surrogateescape"))
    return refs
