"""UMEX — libmetha's URL-matching expression language, compiled to Python.

Re-expression of the reference's byte-code compiler/VM as a compile-once
list of ops executed by a small matcher:
  - compile   ← src/libmetha/umex.c:285-402 (umex_compile),
                umex.c:447-546 (u_compile_str), umex.c:420-445
                (u_compile_bracket)
  - match     ← src/libmetha/umex.c:93-224 (umex_match)
  - strstart  ← src/libmetha/umex.c:232-258 (umex_explicit_strstart) — the
                robots.txt helper: PATH<str*>

Pattern grammar (as in conf/*.conf): ``PART<pattern>`` where PART is one of
``FULL HOST PATH FILE`` (default FILE when omitted); pattern supports
``x`` exact, ``x*`` prefix, ``*x`` suffix, ``*x*`` find, ``*`` always,
``[?]`` any-char.  Multiple parts concatenate (all must match).

Preserved reference quirks:
  * STRMATCH requires the literal to consume the part EXACTLY to its end
    (umex.c:148-152).
  * STREND returns success immediately, ignoring any later ops in the same
    part (umex.c:162-170).
  * a backslash escapes ``*``/``[`` but is NOT removed from the literal
    (u_compile_str copies it verbatim).
  * the reference's UMEX_NOT op never advances nor is its flag consulted
    (umex.c:135-137) — an infinite loop in C; here ``!`` compiles to a
    harmless no-op, documented deviation.
"""

from __future__ import annotations

from typing import Callable, List, Tuple

from .urlkit import URL

# op kinds
SEARCH, ANYCHAR, NOT, STRMATCH, STREND, STRBEGIN, STRFIND, ALWAYS = range(8)

_PARTS = ("PATH", "HOST", "FILE", "FULL")

Op = Tuple[int, object]


def _compile_bracket(ops: List[Op], inner: str) -> None:
    # u_compile_bracket (umex.c:420-445): only '!' and '?' are meaningful
    for c in inner:
        if ord(c) <= 0x20:
            continue
        if c == "!":
            ops.append((NOT, None))
        elif c == "?":
            ops.append((ANYCHAR, None))


def _compile_str(ops: List[Op], pat: str) -> bool:
    # u_compile_str (umex.c:447-546)
    if pat == "*":
        ops.append((ALWAYS, None))
        return True
    n = len(pat)
    bs = 0
    wild_prev = False
    cs = 0
    while True:
        if cs == n:
            lit = pat[bs:cs]
            if lit:
                ops.append((STREND if wild_prev else STRMATCH, lit))
            break
        c = pat[cs]
        if (c == "*" or c == "[") and not (cs > 0 and pat[cs - 1] == "\\"):
            lit = pat[bs:cs]
            if not lit:
                wild_prev = True
            else:
                ops.append((STRFIND if wild_prev else STRBEGIN, lit))
                wild_prev = True
            if c == "[":
                depth = 1
                t = cs + 1
                while True:
                    if t >= n:
                        return False  # unterminated '['
                    if pat[t] == "]":
                        depth -= 1
                        if not depth:
                            break
                    elif pat[t] == "[":
                        depth += 1
                    t += 1
                _compile_bracket(ops, pat[cs + 1 : t])
                wild_prev = False
                cs = t
            bs = cs + 1
        cs += 1
    return True


def compile(expr: str) -> List[Op] | None:
    """umex_compile (umex.c:285-402) → op list, or None on error."""
    ops: List[Op] = []
    s = 0
    n = len(expr)
    while s < n:
        if ord(expr[s]) <= 0x20:
            s += 1
            continue
        part = None
        for p in _PARTS:
            if expr.startswith(p, s):
                part = p
                s += len(p)
                break
        if part is None:
            # no part identifier → default FILE over the whole remainder
            ops.append((SEARCH, "FILE"))
            if not _compile_str(ops, expr[s:]):
                return None
            break
        ops.append((SEARCH, part))
        if s >= n:
            break
        c = expr[s]
        endc = {"(": ")", "<": ">", "{": "}", "[": "]"}.get(c, c)
        s += 1
        e = s
        while True:
            if e >= n:
                return None  # unterminated separator
            if expr[e] == endc and (e == s or expr[e - 1] != "\\"):
                # reference checks *(ns-1) != '\\' even at e==s; a separator
                # right after the opener is found the same way
                if e > 0 and expr[e - 1] == "\\":
                    e += 1
                    continue
                break
            e += 1
        if not _compile_str(ops, expr[s:e]):
            return None
        s = e + 1
    return ops


def _part_span(u: URL, part: str) -> Tuple[str, int, int]:
    s = u.s
    if part == "HOST":
        return s, u.host_o, u.host_o + u.host_l
    if part == "FILE":
        return s, u.file_o + 1, len(s)
    if part == "FULL":
        return s, 0, len(s)
    # PATH (umex.c:119-122): from host end to end of URL
    return s, u.host_o + u.host_l, len(s)


def match(u: URL, ops: List[Op]) -> bool:
    """umex_match (umex.c:93-224) over a parsed URL."""
    s = None
    lo = hi = 0
    for kind, arg in ops:
        if kind == SEARCH:
            s, lo, hi = _part_span(u, arg)
        elif kind == ANYCHAR:
            lo += 1
        elif kind == NOT:
            pass  # reference bug: flag never consulted (umex.c:135-137)
        elif kind == STRMATCH:
            if lo + len(arg) != hi:
                return False
            if s[lo:hi] != arg:
                return False
            lo = hi
        elif kind == STREND:
            if len(arg) > hi - lo:
                return False
            return s[hi - len(arg) : hi] == arg
        elif kind == STRBEGIN:
            if s[lo : lo + len(arg)] != arg:
                return False
            lo += len(arg)
        elif kind == STRFIND:
            if len(arg) > hi - lo:
                return False
            idx = s.find(arg, lo, hi)
            if idx < 0:
                return False
            lo = idx + len(arg)
        elif kind == ALWAYS:
            return True
    return True


def strstart(prefix: str) -> List[Op]:
    """umex_explicit_strstart (umex.c:232-258): PATH<prefix*> — used for
    robots.txt Allow/Disallow rules."""
    return [(SEARCH, "PATH"), (STRBEGIN, prefix)]


def compile_matcher(expr: str) -> Callable[[URL], bool] | None:
    ops = compile(expr)
    if ops is None:
        return None
    return lambda u: match(u, ops)
