"""Deterministic synthetic Common-Crawl-style pages table (FIXTURES.md §1).

Schema is exactly BASELINE.json's ``input_hint``:
``pages(url: string, warc_ts: timestamp[us], html: binary, text: string,
lang: string)`` plus the HTTP-metadata side table
``page_meta(url, status, location, content_type)`` (FIXTURES.md §2), a
``seeds`` table, and a ``golden_links`` table.

Everything is **predicted by construction**, not by running our parsers:

* ``text``  — each page is assembled from a unicode template; the expected
  extracted text (the utf8conv→entityconv chain output, SURVEY §2 M10/M11)
  is computed by re-encoding the template and substituting the exact
  entities the generator itself inserted.  Byte-identity of the engine's
  output against this column is therefore a genuine end-to-end check, not
  a self-comparison.
* ``golden_links`` — the raw href/src refs in document order as the
  generator wrote them into the markup (including the style-block
  ``url()`` refs at their document position, unquoted/uppercase attrs,
  and the *absence* of ``#fragment`` and ``<script>`` refs).

Scale knobs: everything is pure index arithmetic on (host, page index) —
no RNG — so any subset of pages can be regenerated independently (the
property that lets a 100 TB variant be generated shard-parallel).

Host-size skew is deliberate (FIXTURES: one mega host with ~30% of pages)
to exercise politeness budgeting and skew handling.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import pyarrow as pa
import pyarrow.parquet as pq

# named entities the generator may insert: name -> replacement char
_ENTS = {"auml": "ä", "ouml": "ö", "eacute": "é", "amp": "&"}

_WORDS = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
    "tempor incididunt ut labore et dolore magna aliqua".split()
)

BASE_TS = 1_600_000_000_000_000  # microseconds


def host_plan(n_pages: int) -> List[Tuple[str, int]]:
    """[(host, page_count)]: one mega host (~30%), the rest 1/i-decaying."""
    n_hosts = max(4, n_pages // 40)
    mega = max(6, int(n_pages * 0.30))
    rest = n_pages - mega
    weights = [1.0 / (i + 1) for i in range(n_hosts - 1)]
    wsum = sum(weights)
    plan = [("host-0000.example", mega)]
    used = 0
    for i, w in enumerate(weights):
        k = max(3, int(rest * w / wsum))
        if used + k > rest:
            k = max(0, rest - used)
        plan.append((f"host-{i + 1:04d}.example", k))
        used += k
        if used >= rest:
            break
    return [(h, k) for (h, k) in plan if k > 0]


def _page_path(j: int) -> str:
    if j == 0:
        return "/"
    if j % 9 == 5:
        return f"/private/s{j}.html"
    if j % 9 == 7:
        return f"/private/open/o{j}.html"
    if j % 17 == 11:
        return f"/d{j}/"
    if j % 23 == 15:
        return f"/t{j}.txt"
    if j % 29 == 21:
        return f"/c{j}.css"
    if j % 5 == 2:
        return f"/p/q{j}.html?a=1&b=2"
    return f"/p/{j}.html"


def _url_of(host: str, j: int) -> str:
    return f"http://{host}{_page_path(j)}"


def _kind(j: int) -> str:
    p = _page_path(j)
    if p.endswith(".txt"):
        return "text"
    if p.endswith(".css"):
        return "css"
    return "html"


def _charset_latin1(host: str, j: int) -> bool:
    return _kind(j) == "html" and j % 11 == 4


def _has_entities(j: int) -> bool:
    return _kind(j) == "html" and j % 7 == 3


def _redirect_target(host: str, j: int, k: int) -> Optional[str]:
    """301 rows: every 41st page (kind html, not root) redirects."""
    if j != 0 and _kind(j) == "html" and j % 41 == 40:
        return _url_of(host, (j + 1) % k)
    return None


def _xesc(s: str) -> str:
    """xmlconv's text/attribute-value escape: '&' → '&amp;' (the ONLY
    substitution xmlconv makes in text; html.c:424-436, 557-575)."""
    return s.replace("&", "&amp;")


def _base_dir(path: str) -> str:
    """Directory prefix relative references resolve against (url_combine:
    after the last '/' of the PATH part — query string excluded)."""
    p = path.split("?")[0]
    return p[: p.rfind("/") + 1]


def _build_html_page(host: str, j: int, k: int, hosts: List[str],
                     heavy: bool = False):
    """Returns (html_bytes, expected_text_str, raw_links_in_order, lang,
    expected_canon_links, expected_xml_bytes, expected_anchors) — all
    predictions are by construction from the known template shapes, not
    by running parsers.  expected_anchors = [(href_raw, anchor_text,
    canon)] for every ``<a href>`` whose ref is extracted (``#``-refs
    excluded), in document order."""
    lang = ("en", "sv", "de")[j % 3]
    title = f"Page {j} of {host}"
    links: List[str] = []  # predicted extraction output, document order
    canons: List[str] = []  # predicted canonical absolute URL per link
    anchors: List[Tuple[str, str, str]] = []  # (href_raw, text, canon)
    bdir = _base_dir(_page_path(j))

    def canon_of(ref: str) -> str:
        # encodecpy's '&amp;'→'&' rule (url.c:354-361); absolute-path vs
        # relative vs absolute-URL resolution per ue_add's dispatch
        r = ref.replace("&amp;", "&")
        if r.startswith("http://"):
            return r
        if r.startswith("/"):
            return f"http://{host}{r}"
        return f"http://{host}{bdir}{r}"

    parts: List[str] = []      # markup, joined by '\n'
    xml_parts: List[str] = []  # expected xmlconv output per part

    def add(markup: str, xml: str) -> None:
        parts.append(markup)
        xml_parts.append(xml)

    def a(href: str, extracted: bool = True) -> str:
        if extracted:
            links.append(href)
            canons.append(canon_of(href))
        # anchor-text golden: the template writes the href as the inner
        # text, so text == href as written (raw, pre-entity-decode)
        anchors.append((href, href, canon_of(href)))
        xml_parts.append(f'<a href="{_xesc(href)}">{_xesc(href)}</a>')
        return f'<a href="{href}">{href}</a>'

    # DOCTYPE + comment: dropped by xmlconv, and so are the '\n'
    # separators around them (text before the first element is dropped)
    parts.append("<!DOCTYPE html>")
    parts.append("<!-- synthetic fixture page -->")
    add(f"<html><head><title>{title}</title>",
        f"<html><head><title>{title}</title>")
    if _charset_latin1(host, j):
        # 'http' scans as a valueless attribute (the '-' stops the name
        # scanner) and is dropped; 'equiv' keeps the value; meta is a
        # void element → self-closes
        add('<meta http-equiv="Content-Type" '
            'content="text/html; charset=ISO-8859-1">',
            '<meta equiv="Content-Type" '
            'content="text/html; charset=ISO-8859-1"/>')
    add("</head><body>", "</head><body>")
    add(f"<h1>{title}</h1>", f"<h1>{title}</h1>")

    # filler prose (deterministic)
    n_words = 1400 if heavy else 14  # heavy ≈ real-page text volume
    prose = " ".join(_WORDS[(j + i) % len(_WORDS)] for i in range(n_words))
    if _has_entities(j):
        prose += " caf&eacute; m&auml;rk&ouml;"  # named entities
    if _kind(j) == "html" and j % 13 == 6:
        prose += " numeric&#228;stays"  # numeric entity: must NOT convert
    if _charset_latin1(host, j):
        prose += " naïve"  # non-ASCII that iso-8859-1 can encode
    add(f"<p>{prose}</p>", f"<p>{_xesc(prose)}</p>")

    # tree children (absolute-path refs — predictable resolution); query
    # paths are written ``&amp;``-escaped to exercise encodecpy's
    # ``&amp;``→``&`` rule (url.c:354-361)
    for c in (3 * j + 1, 3 * j + 2, 3 * j + 3):
        if c < k:
            parts.append(a(_page_path(c).replace("&", "&amp;")))

    # sibling relative ref from /p/ pages
    if _page_path(j).startswith("/p/") and j + 1 < k and \
            _page_path(j + 1).startswith("/p/"):
        parts.append(a(_page_path(j + 1)[3:]))  # e.g. "17.html"

    if j % 4 == 1:
        add('<a href="#frag">skipped anchor</a>',  # NOT extracted
            '<a href="#frag">skipped anchor</a>')
    if j % 12 == 6 and 3 * j + 1 < k:
        parts.append(a(_page_path(3 * j + 1)))  # duplicate link
    if j % 6 == 3:
        other = hosts[(j + 1 + (hash_stable(host) % len(hosts))) % len(hosts)]
        if other != host:
            parts.append(a(f"http://{other}/"))
    if j % 10 == 4:
        parts.append(a(f"/p/missing{j}.html"))  # 404 (no row)
    if j % 15 == 8:
        parts.append(a(f"/img/i{j}.png"))  # image filetype: target, no row
    if j % 8 == 5 and k > 1:
        # unquoted value re-quoted with '"'; names+tags lowercased; the
        # close emitted lowercase at the matching </A>
        add(f"<A HREF={_page_path(1)}>uppercase-unquoted</A>",
            f'<a href="{_page_path(1)}">uppercase-unquoted</a>')
        links.append(_page_path(1))
        canons.append(canon_of(_page_path(1)))
        anchors.append((_page_path(1), "uppercase-unquoted",
                        canon_of(_page_path(1))))
    if j % 21 == 9:
        # encoded-content element: inner '<' → '&lt;' (the close tag scan
        # lowercases the final chunk — already lowercase here)
        add("<script>var x = '<a href=\"fake.html\">';</script>",
            "<script>var x = '&lt;a href=\"fake.html\">';</script>")
    if j % 16 == 10:
        css_ref = "bg.css"  # 404 css ref
        add("<style>body { background: url(" + css_ref + "); }</style>",
            "<style>body { background: url(" + css_ref + "); }</style>")
        links.append(css_ref)  # style URLs surface at their doc position
        canons.append(canon_of(css_ref))

    if heavy:
        # denser link graph + padding paragraphs (Common-Crawl-ish body
        # size); targets are existing same-host pages, fully predictable
        for i in range(1, 9):
            c = (j * 7 + i * 131) % k
            if c != j:
                parts.append(a(_page_path(c).replace("&", "&amp;")))
        for pblk in range(6):
            pad = " ".join(
                _WORDS[(j * 3 + pblk + i) % len(_WORDS)] for i in range(220)
            )
            add(f"<p>{pad}</p>", f"<p>{pad}</p>")

    add("</body></html>", "</body></html>")
    html_text = "\n".join(parts)
    # xml: the two leading dropped parts contribute nothing, including
    # their '\n' separators (text outside the element stack is dropped);
    # every later separator is in-stack text and copied verbatim
    xml_text = "\n".join(xml_parts)

    # ---- expected extracted text (utf8conv → entityconv), by construction
    if _charset_latin1(host, j):
        html_bytes = html_text.encode("iso-8859-1")
        xml_bytes = xml_text.encode("iso-8859-1")
        converted = html_text  # utf8conv decodes latin-1 → same unicode
    else:
        html_bytes = html_text.encode("utf-8")
        xml_bytes = xml_text.encode("utf-8")
        converted = html_text
    expected = converted
    for name, ch in _ENTS.items():
        expected = expected.replace(f"&{name};", ch)
    return html_bytes, expected, links, lang, canons, xml_bytes, anchors


def _build_text_page(host: str, j: int) -> Tuple[bytes, str, List[str]]:
    # no "://" token: the plaintext extractor's allowed-char set
    # (builtin.c:177-201) excludes '-', which every fixture host name
    # contains — URL-bearing text bodies are covered by unit tests instead
    body = f"plain text {j} no links here end"
    return body.encode(), body, []


def _build_css_page(host: str, j: int) -> Tuple[bytes, str, List[str]]:
    ref = f"i{j}.png"
    body = f"body {{ background: url({ref}); color: #000; }}"
    return body.encode(), body, [ref]


def _expected_filetype(path: str) -> str:
    """Predicted ftindex decision for a fixture URL path, from the
    reference decision tree (ftindex.c:141-238) applied to the default
    config (dir_url/extless_url/dynamic_url=@html, ext tables): a query
    string binds dynamic_url; a trailing '/' binds dir_url; else the
    extension table decides.  Only shapes the generator emits."""
    if "?" in path:
        return "html"   # dynamic_url=@html (BIND_DYNAMIC_URL wins)
    if path.endswith("/"):
        return "html"   # dir_url=@html
    if path.endswith(".txt"):
        return "text"
    if path.endswith(".css"):
        return "css"
    assert path.endswith(".html"), path
    return "html"


def hash_stable(s: str) -> int:
    h = 5381
    for c in s.encode():
        h = ((h * 33) ^ c) & 0xFFFFFFFF
    return h


def _robots_body(host: str, hi: int) -> Optional[str]:
    """Every host except hi%3==2 has robots.txt; variants exercise
    rule ordering, agent matching and Crawl-delay."""
    if hi % 3 == 2:
        return None
    lines = ["# robots fixture", "User-agent: *"]
    lines.append("Disallow: /private/")
    lines.append("Allow: /private/open/")
    if hi % 4 == 1:
        lines.append("Crawl-delay: 4")
    if hi % 5 == 3:
        lines += ["User-agent: OtherBot", "Disallow: /p/"]  # must not apply
    if hi % 7 == 6:
        lines += ["User-agent: Metha", "Disallow: /d"]  # substring: applies
    return "\n".join(lines) + "\n"


def generate(n_pages: int, heavy: bool = False) -> Dict[str, pa.Table]:
    plan = host_plan(n_pages)
    hosts = [h for h, _ in plan]

    urls: List[str] = []
    ts: List[int] = []
    htmls: List[bytes] = []
    texts: List[str] = []
    langs: List[str] = []
    meta_rows: List[Tuple[str, int, Optional[str], str]] = []
    link_urls: List[str] = []
    link_seqs: List[int] = []
    link_refs: List[str] = []
    link_canons: List[Optional[str]] = []
    xml_urls: List[str] = []
    xml_bodies: List[str] = []
    anch_urls: List[str] = []
    anch_seqs: List[int] = []
    anch_refs: List[str] = []
    anch_texts: List[str] = []
    anch_canons: List[str] = []
    title_urls: List[str] = []
    title_vals: List[str] = []

    idx = 0

    def emit(url: str, html: bytes, text: str, lang: str, status: int,
             location: Optional[str], ctype: str,
             links: Optional[List[str]] = None,
             canons: Optional[List[str]] = None,
             xml: Optional[bytes] = None,
             anchors=None) -> None:
        nonlocal idx
        urls.append(url)
        ts.append(BASE_TS + idx * 1_000_000)
        htmls.append(html)
        texts.append(text)
        langs.append(lang)
        meta_rows.append((url, status, location, ctype))
        for i, r in enumerate(links or ()):
            link_urls.append(url)
            link_seqs.append(i)
            link_refs.append(r)
            link_canons.append(canons[i] if canons else None)
        for i, (ref, txt, cn) in enumerate(anchors or ()):
            anch_urls.append(url)
            anch_seqs.append(i)
            anch_refs.append(ref)
            anch_texts.append(txt)
            anch_canons.append(cn)
        if xml is not None:
            xml_urls.append(url)
            # hex string, matching page_xmlconv: binary golden columns
            # crash the driver gate's pandas sort, and the raw bytes are
            # not valid UTF-8 (xmlconv does no charset conversion)
            xml_bodies.append(xml.hex())
        idx += 1

    for hi, (host, k) in enumerate(plan):
        rb = _robots_body(host, hi)
        if rb is not None:
            emit(f"http://{host}/robots.txt", rb.encode(), rb, "en",
                 200, None, "text/plain", [])
        # redirect chain on the mega host: 21 hops → exercises the 20-cap
        chain_base = None
        if hi == 0 and k > 60:
            chain_base = k - 23
        for j in range(k):
            if chain_base is not None and j >= chain_base:
                c = j - chain_base
                target = (_url_of(host, chain_base + c + 1)
                          if c < 21 else _url_of(host, 1))
                if c < 21:
                    emit(_url_of(host, j), b"", "", "en", 301, target,
                         "text/html", [])
                    continue
            loc = _redirect_target(host, j, k)
            if loc is not None:
                emit(_url_of(host, j), b"", "", "en", 301, loc,
                     "text/html", [])
                continue
            kind = _kind(j)
            if kind == "text":
                body, text, links = _build_text_page(host, j)
                emit(_url_of(host, j), body, text, "en", 200, None,
                     "text/plain", links)
            elif kind == "css":
                body, text, links = _build_css_page(host, j)
                emit(_url_of(host, j), body, text, "en", 200, None,
                     "text/css", links,
                     canons=[f"http://{host}/i{j}.png"])
            else:
                (html, text, links, lang, canons, xml,
                 anchors) = _build_html_page(host, j, k, hosts, heavy)
                ctype = ("text/html; charset=ISO-8859-1"
                         if _charset_latin1(host, j) else "text/html")
                emit(_url_of(host, j), html, text, lang, 200, None,
                     ctype, links, canons=canons, xml=xml, anchors=anchors)
                # title golden: the template's <title> content verbatim
                title_urls.append(_url_of(host, j))
                title_vals.append(f"Page {j} of {host}")

    pages = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )
    page_meta = pa.table(
        {
            "url": pa.array([m[0] for m in meta_rows], pa.string()),
            "status": pa.array([m[1] for m in meta_rows], pa.int16()),
            "location": pa.array([m[2] for m in meta_rows], pa.string()),
            "content_type": pa.array([m[3] for m in meta_rows], pa.string()),
        }
    )
    seed_urls = [f"http://{hosts[0]}/"]
    for h in hosts[1:4]:
        seed_urls.append(f"http://{h}/")
    if len(hosts) > 4:
        seed_urls.append(hosts[4])  # bare string → protocol guesser (M3)
    seeds = pa.table(
        {
            "url": pa.array(seed_urls, pa.string()),
            "crawler": pa.array(["default"] * len(seed_urls), pa.string()),
            "seq": pa.array(list(range(len(seed_urls))), pa.int32()),
        }
    )
    golden_links = pa.table(
        {
            "url": pa.array(link_urls, pa.string()),
            "link_seq": pa.array(link_seqs, pa.int32()),
            "ref_raw": pa.array(link_refs, pa.string()),
        }
    )
    # by-construction golden outputs for the standalone kernels:
    # canonical resolution per link (M1-M4), ftindex classification per
    # page URL (F1-F4), xmlconv output per 200-status html page (M9)
    golden_canon = pa.table(
        {
            "url": pa.array(link_urls, pa.string()),
            "link_seq": pa.array(link_seqs, pa.int32()),
            "canon": pa.array(link_canons, pa.string()),
        }
    )
    def _path_of(u: str) -> str:
        ps = u.split("/", 3)
        return "/" + ps[3] if len(ps) > 3 else "/"

    golden_classify = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "filetype": pa.array([_expected_filetype(_path_of(u))
                                  for u in urls], pa.string()),
        }
    )
    golden_xml = pa.table(
        {
            "url": pa.array(xml_urls, pa.string()),
            "xhtml": pa.array(xml_bodies, pa.string()),
        }
    )
    golden_anchors = pa.table(
        {
            "url": pa.array(anch_urls, pa.string()),
            "anchor_seq": pa.array(anch_seqs, pa.int32()),
            "href_raw": pa.array(anch_refs, pa.string()),
            "anchor": pa.array(anch_texts, pa.string()),
            "canon": pa.array(anch_canons, pa.string()),
        }
    )
    golden_titles = pa.table(
        {
            "url": pa.array(title_urls, pa.string()),
            "title": pa.array(title_vals, pa.string()),
        }
    )
    return {"pages": pages, "page_meta": page_meta, "seeds": seeds,
            "golden_links": golden_links, "golden_canon": golden_canon,
            "golden_classify": golden_classify, "golden_xml": golden_xml,
            "golden_anchors": golden_anchors,
            "golden_titles": golden_titles}


# table sizes per driver sf tier (FIXTURES.md: tiny/small/bench)
SF_SIZES = {"sf0.001": 200, "sf0.01": 2000, "sf0.1": 50000}


def pages_dir_for(sf_dir: str, base: str = "/tmp/mwc_pages") -> str:
    """Map a testdata sf dir to the deterministic pages-table dir,
    generating it on first use.  (The driver's testdata has no pages
    table; BASELINE.json's input shape is synthesized per FIXTURES.md.)"""
    name = os.path.basename(os.path.normpath(sf_dir))
    n = SF_SIZES.get(name, 2000)
    return pages_dir_custom(n, heavy=False, tag=name, base=base)


def pages_dir_custom(n: int, heavy: bool = False, tag: str = "custom",
                     base: str = "/tmp/mwc_pages") -> str:
    """Generate (once) an arbitrary-size pages table; ``heavy`` builds
    Common-Crawl-ish page bodies (~10 KB, dense link graph) — the scaling
    benchmark's compute-bound corpus."""
    from .._fingerprint import pagegen_fp

    suffix = "-heavy" if heavy else ""
    out = os.path.join(base, f"{tag}-{n}{suffix}-{pagegen_fp()}")
    marker = os.path.join(out, "_DONE")
    if not os.path.exists(marker):
        os.makedirs(out, exist_ok=True)
        tables = generate(n, heavy=heavy)
        for tname, tbl in tables.items():
            pq.write_table(tbl, os.path.join(out, f"{tname}.parquet"))
        with open(marker, "w") as f:
            f.write(str(n))
    return out


def load_fetch_dict(pages_dir: str):
    """Build the {canonical_url: PageRow} dict the simulators use."""
    from ..pipelines.hostloop import PageRow

    pages = pq.read_table(os.path.join(pages_dir, "pages.parquet"))
    meta = pq.read_table(os.path.join(pages_dir, "page_meta.parquet"))
    mm = {m["url"]: m for m in meta.to_pylist()}
    out = {}
    for r in pages.to_pylist():
        m = mm[r["url"]]
        out[r["url"]] = PageRow(
            url=r["url"], status=m["status"], location=m["location"],
            content_type=m["content_type"], body=r["html"],
        )
    return out
