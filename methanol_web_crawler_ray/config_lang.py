"""The reference's configuration LANGUAGE (S12) — a parser for the
``.conf`` syntax of libmethaconfig (src/libmethaconfig/conf.c, ~800 LoC C;
classes wired in src/libmetha/metha.c:132-185), producing
:class:`EngineConfig` dataclasses.

Grammar (as used by conf/*.conf):

    include "file"                       # loaded once per name
                                         # (metha.c:1449-1457 dedup)
    crawler ["name"]  { opt = value; … } # declare (or replace) a class
    filetype ["name"] { … }
    extend:  crawler["name"] { … }       # merge options into existing
    override: filetype["name"] { … }     # replace the existing object
    # comments run to end of line (conf.c:304)

Values: "string", {"a", "b", …} arrays, unsigned integers, and flags
(``true`` / nonzero integers — conf.c:679,698).  Unknown option names
error, like the reference's option tables.

JS-valued options (``init``, ``file.js/function`` parser chain members)
are accepted syntactically; the parser-chain resolver maps registered
Python parser names and leaves unknown ``*.js/*`` entries to the
user-extension registry (functions/parsechain.register_parser).
"""

from __future__ import annotations

import os
import re
from dataclasses import replace as dc_replace
from typing import Callable, Dict, List, Optional, Tuple, Union

from .config import EngineConfig
from .functions.matchkit import Crawler, Filetype

Value = Union[str, int, bool, Tuple[str, ...]]

# option name → (field, kind) per class; kind: s=string, i=int, f=flag,
# a=array.  Mirrors the LMC_OPT_* tables the reference declares in
# metha.c:132-185 / crawler.h / filetype.h.
_FT_OPTS = {
    "extensions": ("extensions", "a"),
    "mimetypes": ("mimetypes", "a"),
    "attributes": ("attributes", "a"),
    "parser": ("parser", "s"),
    "handler": ("handler", "s"),
    "expr": ("expr", "s"),
    "switch_to": ("switch_to", "s"),
    "ignore_host": ("ignore_host", "f"),
}
_CR_OPTS = {
    "filetypes": ("filetypes", "a"),
    "depth_limit": ("depth_limit", "i"),
    "peek_limit": ("peek_limit", "i"),
    "external": ("external", "f"),
    "external_peek": ("external_peek", "f"),
    "jail": ("jail", "f"),
    "robotstxt": ("robotstxt", "f"),
    "spread_workers": ("spread_workers", "f"),
    "initial_filetype": ("initial_filetype", "s"),
    "dir_url": ("dir_url", "s"),
    "extless_url": ("extless_url", "s"),
    "dynamic_url": ("dynamic_url", "s"),
    "unknown_url": ("unknown_url", "s"),
    "ftp_dir_url": ("ftp_dir_url", "s"),
    "default_handler": ("default_handler", "s"),
    # JS init function name: stored; resolved against the Python analog
    # registry (functions/siteparsers.py) by seeds_from_init
    "init": ("init", "s"),
}


class ConfError(ValueError):
    pass


class _Lexer:
    _TOKEN = re.compile(
        r'\s+|#[^\n]*'                      # whitespace / comments
        r'|(?P<str>"(?:[^"\\]|\\.)*")'
        r'|(?P<num>\d+)'
        r'|(?P<name>[A-Za-z_][A-Za-z0-9_.-]*)'
        r'|(?P<punc>[\[\]{}=;:,])'
    )

    def __init__(self, text: str, fname: str):
        self.text = text
        self.fname = fname
        self.pos = 0
        self.line = 1

    def next(self) -> Optional[Tuple[str, str]]:
        while self.pos < len(self.text):
            m = self._TOKEN.match(self.text, self.pos)
            if m is None:
                raise ConfError(
                    f"<{self.fname}:{self.line}>: unexpected character "
                    f"{self.text[self.pos]!r}")
            self.line += self.text.count("\n", self.pos, m.end())
            self.pos = m.end()
            kind = m.lastgroup
            if kind is None:
                continue  # whitespace/comment
            return kind, m.group(kind)
        return None

    def expect(self, kind: str, value: Optional[str] = None) -> str:
        t = self.next()
        if t is None or t[0] != kind or (value is not None and t[1] != value):
            got = t[1] if t else "<eof>"
            raise ConfError(
                f"<{self.fname}:{self.line}>: expected "
                f"{value or kind}, got {got!r}")
        return t[1]


def _unquote(s: str) -> str:
    return re.sub(r"\\(.)", r"\1", s[1:-1])


def _parse_value(lx: _Lexer) -> Value:
    t = lx.next()
    if t is None:
        raise ConfError(f"<{lx.fname}:{lx.line}>: expected a value")
    kind, tok = t
    if kind == "str":
        return _unquote(tok)
    if kind == "num":
        return int(tok)
    if kind == "name":
        if tok == "true":
            return True
        if tok == "false":
            return False
        return tok
    if kind == "punc" and tok == "{":
        items: List[str] = []
        while True:
            t2 = lx.next()
            if t2 is None:
                raise ConfError(f"<{lx.fname}:{lx.line}>: unterminated array")
            if t2[0] == "punc" and t2[1] == "}":
                break
            if t2[0] == "punc" and t2[1] == ",":
                continue
            items.append(_unquote(t2[1]) if t2[0] == "str" else t2[1])
        return tuple(items)
    raise ConfError(f"<{lx.fname}:{lx.line}>: bad value {tok!r}")


def _coerce(opt: str, spec, val: Value, lx: _Lexer) -> Dict[str, object]:
    field, kind = spec
    if field is None:
        return {}
    if kind == "a":
        if not isinstance(val, tuple):
            val = (str(val),)
        return {field: val}
    if kind == "i":
        if not isinstance(val, int) or isinstance(val, bool):
            raise ConfError(f"<{lx.fname}:{lx.line}>: {opt} expects an integer")
        return {field: val}
    if kind == "f":
        if isinstance(val, bool):
            return {field: val}
        if isinstance(val, int):
            return {field: bool(val)}  # conf.c:679 atoi-truthiness
        if isinstance(val, str) and val.lower() == "true":
            return {field: True}
        return {field: False}
    return {field: str(val)}


def parse_config(
    text: str,
    cfg: Optional[EngineConfig] = None,
    fname: str = "<string>",
    include_resolver: Optional[Callable[[str], str]] = None,
    _seen_includes: Optional[set] = None,
) -> EngineConfig:
    """Parse ``.conf`` text into/onto an EngineConfig."""
    cfg = cfg if cfg is not None else EngineConfig()
    seen = _seen_includes if _seen_includes is not None else set()
    lx = _Lexer(text, fname)

    mode = 0  # 0 = declare, 1 = extend, 2 = override
    while True:
        t = lx.next()
        if t is None:
            break
        kind, tok = t
        if kind != "name":
            raise ConfError(f"<{lx.fname}:{lx.line}>: expected a keyword, "
                            f"got {tok!r}")
        if tok == "include":
            path = _unquote(lx.expect("str"))
            if path in seen:  # metha.c:1449-1457: load once per name
                continue
            seen.add(path)
            if include_resolver is None:
                raise ConfError(
                    f"<{lx.fname}:{lx.line}>: include {path!r} needs an "
                    "include_resolver")
            parse_config(include_resolver(path), cfg, path,
                         include_resolver, seen)
            continue
        if tok in ("extend", "override"):
            lx.expect("punc", ":")
            mode = 1 if tok == "extend" else 2
            t = lx.next()
            if t is None or t[0] != "name":
                raise ConfError(f"<{lx.fname}:{lx.line}>: expected a class "
                                f"after {tok}:")
            tok = t[1]
        if tok not in ("crawler", "filetype"):
            raise ConfError(f"<{lx.fname}:{lx.line}>: unknown class {tok!r}")

        lx.expect("punc", "[")
        name = _unquote(lx.expect("str"))
        lx.expect("punc", "]")
        lx.expect("punc", "{")

        opts: Dict[str, object] = {}
        table = _CR_OPTS if tok == "crawler" else _FT_OPTS
        while True:
            t2 = lx.next()
            if t2 is None:
                raise ConfError(f"<{lx.fname}:{lx.line}>: unterminated block")
            if t2[0] == "punc" and t2[1] == "}":
                break
            if t2[0] != "name":
                raise ConfError(f"<{lx.fname}:{lx.line}>: expected an option "
                                f"name, got {t2[1]!r}")
            opt = t2[1]
            if opt not in table:
                raise ConfError(f"<{lx.fname}:{lx.line}>: unknown {tok} "
                                f"option {opt!r}")
            lx.expect("punc", "=")
            val = _parse_value(lx)
            lx.expect("punc", ";")
            opts.update(_coerce(opt, table[opt], val, lx))

        store = cfg.crawlers if tok == "crawler" else cfg.filetypes
        if mode == 1:  # extend: merge into existing
            if name not in store:
                raise ConfError(f"<{lx.fname}:{lx.line}>: extend of unknown "
                                f"{tok} {name!r}")
            store[name] = dc_replace(store[name], **opts)
        else:  # declare or override: fresh object
            cls = Crawler if tok == "crawler" else Filetype
            store[name] = cls(name=name, **opts)
        mode = 0
    return cfg


def load_config_file(path: str, cfg: Optional[EngineConfig] = None,
                     search_dirs: Optional[List[str]] = None) -> EngineConfig:
    """lmetha_load_config analog: parse a file, resolving includes
    relative to the file's directory plus ``search_dirs``."""
    dirs = [os.path.dirname(os.path.abspath(path))] + list(search_dirs or [])

    def resolver(name: str) -> str:
        for d in dirs:
            p = os.path.join(d, name)
            if os.path.exists(p):
                with open(p) as f:
                    return f.read()
        raise ConfError(f"include {name!r} not found in {dirs}")

    with open(path) as f:
        text = f.read()
    return parse_config(text, cfg, os.path.basename(path), resolver)
