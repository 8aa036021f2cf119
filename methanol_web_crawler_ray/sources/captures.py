"""The multi-snapshot captures table — Common-Crawl-style RECRAWL
history derived deterministically from the pages fixture.

The input-shape contract (BASELINE.json input_hint) carries a
``warc_ts`` column precisely because a real Common-Crawl-style corpus
has MANY captures of the same URL across crawls; the snapshot-dedup
("keep the latest capture per URL before any downstream processing")
and per-host freshness rollups in ``stages/extract.py`` operate on that
history.  The pages fixture itself is one-capture-per-URL (it is the
crawl target, where URL uniqueness is part of the golden contract), so
this module derives the history table FROM it instead of changing the
generator: every page contributes its original capture, every third URL
(by the generator's stable hash) gains a +30-day recrawl with drifted
body/text, and every ninth a further +60-day recrawl — deterministic,
so the DuckDB oracle replays over the very same Parquet.

Derived, not generated: ``pagegen.py``'s fingerprint (and with it the
cached goldens and the heavy scaling corpus) is untouched.  The cache
dir embeds THIS file's hash, so semantics changes regenerate cleanly.

At deployment scale the captures table is the real WARC index (one row
per fetch, ~monthly crawls x 10^10 URLs); everything downstream reads
it via ``read_parquet`` with column pruning, so the derivation here is
strictly a fixture concern.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

# recrawl cadence constants (microseconds)
_DAY_US = 86_400 * 1_000_000
RECRAWL1_US = 30 * _DAY_US
RECRAWL2_US = 60 * _DAY_US


def _capture_rounds(url: str) -> int:
    """0, 1 or 2 extra snapshots for ``url`` — stable across runs."""
    from .pagegen import hash_stable

    h = hash_stable(url)
    if h % 9 == 0:
        return 2
    if h % 3 == 0:
        return 1
    return 0


def build_captures(pages_path: str) -> pa.Table:
    """Derive the captures table from a pages.parquet file.

    Output schema matches the input_hint pages shape exactly
    (url, warc_ts, html, text, lang) — a capture IS a page row; the
    recrawl snapshots append a drift marker to text and an HTML comment
    to the body so downstream latest-capture selection is observable in
    every column."""
    import pyarrow.compute as pc

    src = pq.read_table(pages_path)
    urls = src.column("url").to_pylist()
    # timestamp[us] -> exact epoch-microsecond ints (no tz-dependent
    # datetime round trip)
    ts = pc.cast(src.column("warc_ts"), pa.int64()).to_pylist()
    htmls = src.column("html").to_pylist()
    texts = src.column("text").to_pylist()
    langs = src.column("lang").to_pylist()

    out_url, out_ts, out_html, out_text, out_lang = [], [], [], [], []
    for u, base_us, h, x, lg in zip(urls, ts, htmls, texts, langs):
        out_url.append(u)
        out_ts.append(base_us)
        out_html.append(h)
        out_text.append(x)
        out_lang.append(lg)
        for r in range(_capture_rounds(u)):
            out_url.append(u)
            out_ts.append(base_us + (RECRAWL1_US if r == 0
                                     else RECRAWL2_US))
            out_html.append((h or b"") + b"<!-- recrawl r%d -->" % (r + 1))
            out_text.append(x + "\nrecrawl r%d" % (r + 1))
            out_lang.append(lg)
    return pa.table({
        "url": pa.array(out_url, pa.string()),
        "warc_ts": pa.array(out_ts, pa.timestamp("us")),
        "html": pa.array(out_html, pa.binary()),
        "text": pa.array(out_text, pa.string()),
        "lang": pa.array(out_lang, pa.string()),
    })


def captures_path(pages_dir: str, base: str = "/tmp/mwc_captures") -> str:
    """Path of the (cached) captures.parquet derived from
    ``pages_dir/pages.parquet``; built on first use."""
    from .._fingerprint import _hash_files, _pkg_files

    fp = _hash_files(_pkg_files("sources/captures.py"))
    name = os.path.basename(os.path.normpath(pages_dir))
    out_dir = os.path.join(base, f"{name}-{fp}")
    out = os.path.join(out_dir, "captures.parquet")
    marker = os.path.join(out_dir, "_DONE")
    if not os.path.exists(marker):
        os.makedirs(out_dir, exist_ok=True)
        pq.write_table(build_captures(
            os.path.join(pages_dir, "pages.parquet")), out)
        with open(marker, "w") as f:
            f.write(out)
    return out
