"""Source fingerprints for /tmp cache invalidation.

Generated fixtures (pages tables), derived stores and simulator goldens
are cached under /tmp across runs; if the generator / kernel / simulator
semantics change between engine versions, stale caches would silently
poison correctness gates.  Cache directory names therefore embed a hash
of the source files whose behavior they depend on.
"""

from __future__ import annotations

import hashlib
import os

_PKG = os.path.dirname(os.path.abspath(__file__))


def _hash_files(paths) -> str:
    h = hashlib.blake2b(digest_size=6)
    for p in sorted(paths):
        try:
            with open(p, "rb") as f:
                h.update(f.read())
        except OSError:
            h.update(p.encode())
    return h.hexdigest()


def _pkg_files(*relpaths) -> list:
    return [os.path.join(_PKG, r) for r in relpaths]


def pagegen_fp() -> str:
    """Changes when the fixture generator changes → new pages dirs."""
    return _hash_files(_pkg_files("sources/pagegen.py"))


def store_fp() -> str:
    """Changes when the store layout/derivation changes → rebuild."""
    return _hash_files(_pkg_files("sources/pagestore.py",
                                  "functions/urlkit.py"))


def golden_fp() -> str:
    """Changes when anything affecting simulator outputs changes."""
    return _hash_files(_pkg_files(
        "pipelines/hostloop.py", "pipelines/simulator.py",
        "functions/urlkit.py", "functions/htmlparse.py",
        "functions/textconv.py", "functions/entities.py",
        "functions/robots.py", "functions/umex.py",
        "functions/matchkit.py", "functions/parsechain.py",
        "functions/xmlconv.py", "config.py", "state/seen.py",
        "sources/pagegen.py",
    ))
