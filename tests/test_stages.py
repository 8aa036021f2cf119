"""Stage-wrapper layer (stages/): vectorized canonicalize + extract."""

import pyarrow as pa

from methanol_web_crawler_ray.sources import pagegen
from methanol_web_crawler_ray.stages.canonicalize import canonicalize_batch
from methanol_web_crawler_ray.stages import extract


def test_canonicalize_batch():
    t = pa.table({"url": [
        "http://A.x/a/../b.html?x=1&amp;y=2",
        "http://www.h.x/p/",
        "not a url",
    ]})
    out = canonicalize_batch(t)
    rows = out.to_pylist()
    assert rows[0]["url_canon"] == "http://A.x/b.html?x=1&y=2"
    assert rows[0]["is_dynamic"] is True
    assert rows[1]["host"] == "h.x"  # www stripped in host_norm
    assert rows[2]["valid"] is False


def test_page_text_stage_matches_golden(ray_session):
    d = pagegen.pages_dir_for("/root/testdata/sf0.001")
    import pyarrow.parquet as pq

    golden = {r["url"]: r["text"] for r in
              pq.read_table(f"{d}/pages.parquet").to_pylist()}
    out = extract.page_text(d).take_all()
    assert len(out) == len(golden)
    for r in out:
        assert r["text"] == golden[r["url"]], r["url"]


def test_page_classify_stage(ray_session):
    d = pagegen.pages_dir_for("/root/testdata/sf0.001")
    rows = extract.page_classify(d).take_all()
    kinds = {r["filetype"] for r in rows}
    assert {"html", "text", "css"} <= kinds


def test_goldens_match_kernels(ray_session):
    """The generator's by-construction golden tables (xmlconv output,
    classification, canonical links) byte-match the transcribed kernels —
    the unit-level form of the driver's page_* oracle gates."""
    import pyarrow.parquet as pq

    d = pagegen.pages_dir_for("/root/testdata/sf0.001")

    gx = {r["url"]: r["xhtml"]
          for r in pq.read_table(f"{d}/golden_xml.parquet").to_pylist()}
    got = extract.page_xmlconv(d).take_all()
    assert len(got) == len(gx) > 0
    for r in got:
        assert r["xhtml"] == gx[r["url"]], r["url"]

    gc = {r["url"]: r["filetype"]
          for r in pq.read_table(f"{d}/golden_classify.parquet").to_pylist()}
    got = extract.page_classify(d).take_all()
    assert len(got) == len(gc)
    for r in got:
        assert r["filetype"] == gc[r["url"]], r["url"]

    gk = {(r["url"], r["link_seq"]): r["canon"]
          for r in pq.read_table(f"{d}/golden_canon.parquet").to_pylist()}
    got = extract.page_canonicalize_links(d).take_all()
    assert len(got) == len(gk) > 0
    for r in got:
        assert r["canon"] == gk[(r["url"], r["link_seq"])], r["url"]


def test_host_stats(ray_session, sf_dir):
    import pyarrow.parquet as pq

    from methanol_web_crawler_ray.sources import pagegen
    from methanol_web_crawler_ray.stages.extract import host_stats

    pdir = pagegen.pages_dir_for(sf_dir)
    rows = {r["host"]: r for r in host_stats(pdir).take_all()}
    tbl = pq.read_table(f"{pdir}/pages.parquet",
                        columns=["url", "html", "text"])
    import collections
    exp = collections.defaultdict(lambda: [0, 0, 0])
    for u, h, t in zip(tbl.column("url").to_pylist(),
                       tbl.column("html").to_pylist(),
                       tbl.column("text").to_pylist()):
        host = u.split("/")[2]
        exp[host][0] += 1
        exp[host][1] += len(h)
        exp[host][2] += len(t)
    assert len(rows) == len(exp)
    for h, (np_, hb, tc) in exp.items():
        r = rows[h]
        assert (r["n_pages"], r["total_html_bytes"],
                r["total_text_chars"]) == (np_, hb, tc)


def test_captures_table_shape(sf_dir):
    """captures.parquet: input_hint schema, >=1 row per page URL, extra
    snapshots strictly later with drifted text (deterministic)."""
    import collections

    import pyarrow.parquet as pq

    from methanol_web_crawler_ray.sources.captures import captures_path

    pdir = pagegen.pages_dir_for(sf_dir)
    cap = pq.read_table(captures_path(pdir))
    assert cap.schema.names == ["url", "warc_ts", "html", "text", "lang"]
    pages = pq.read_table(f"{pdir}/pages.parquet", columns=["url"])
    per_url = collections.Counter(cap.column("url").to_pylist())
    assert set(per_url) == set(pages.column("url").to_pylist())
    assert max(per_url.values()) >= 2  # some URL actually recrawled
    # recrawls are later and drifted
    rows = collections.defaultdict(list)
    for r in cap.to_pylist():
        rows[r["url"]].append(r)
    multi = {u: rs for u, rs in rows.items() if len(rs) > 1}
    assert multi
    for u, rs in multi.items():
        rs.sort(key=lambda r: r["warc_ts"])
        assert rs[-1]["warc_ts"] > rs[0]["warc_ts"]
        assert rs[-1]["text"] != rs[0]["text"]


def test_snapshot_latest(ray_session, sf_dir):
    """Latest-capture-per-URL vs a brute-force pass over captures."""
    import pyarrow.parquet as pq

    from methanol_web_crawler_ray.sources.captures import captures_path
    from methanol_web_crawler_ray.stages.extract import snapshot_latest

    pdir = pagegen.pages_dir_for(sf_dir)
    cap = pq.read_table(captures_path(pdir),
                        columns=["url", "warc_ts", "text"])
    exp = {}
    cnt = {}
    import pyarrow.compute as pc
    ts64 = pc.cast(cap.column("warc_ts"), pa.int64()).to_pylist()
    for u, t, x in zip(cap.column("url").to_pylist(), ts64,
                       cap.column("text").to_pylist()):
        cnt[u] = cnt.get(u, 0) + 1
        if u not in exp or t > exp[u][0]:
            exp[u] = (t, len(x))
    rows = {r["url"]: r for r in snapshot_latest(pdir).take_all()}
    assert len(rows) == len(exp)
    for u, (t, tc) in exp.items():
        r = rows[u]
        assert (r["ts_us"], r["n_captures"], r["text_chars"]) == \
            (t, cnt[u], tc), u


def test_snapshot_change_rate(ray_session, sf_dir):
    """Captures-vs-distinct-text-versions drift vs a brute-force pass."""
    import collections
    import hashlib

    import pyarrow.parquet as pq

    from methanol_web_crawler_ray.sources.captures import captures_path
    from methanol_web_crawler_ray.stages.extract import snapshot_change_rate

    pdir = pagegen.pages_dir_for(sf_dir)
    cap = pq.read_table(captures_path(pdir), columns=["url", "text"])
    n = collections.Counter()
    vers = collections.defaultdict(set)
    for u, x in zip(cap.column("url").to_pylist(),
                    cap.column("text").to_pylist()):
        n[u] += 1
        vers[u].add(hashlib.md5(x.encode()).hexdigest())
    rows = {r["url"]: r for r in snapshot_change_rate(pdir).take_all()}
    assert len(rows) == len(n)
    for u in n:
        r = rows[u]
        assert (r["n_captures"], r["n_versions"], r["changed"]) == \
            (n[u], len(vers[u]), int(len(vers[u]) > 1)), u
    # the fixture's recrawls drift, so some URL must register as changed
    assert any(r["changed"] == 1 for r in rows.values())
    # and single-capture URLs must not
    assert all(rows[u]["changed"] == 0 for u in n if n[u] == 1)


def test_host_freshness(ray_session, sf_dir):
    """Per-host freshness rollup vs a brute-force pass."""
    import collections

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from methanol_web_crawler_ray.sources.captures import captures_path
    from methanol_web_crawler_ray.stages.extract import host_freshness

    pdir = pagegen.pages_dir_for(sf_dir)
    cap = pq.read_table(captures_path(pdir), columns=["url", "warc_ts"])
    ts64 = pc.cast(cap.column("warc_ts"), pa.int64()).to_pylist()
    urls_per_host = collections.defaultdict(set)
    agg = collections.defaultdict(lambda: [0, None, None])
    for u, t in zip(cap.column("url").to_pylist(), ts64):
        parts = u.split("/")
        host = parts[2] if len(parts) > 2 else ""
        urls_per_host[host].add(u)
        a = agg[host]
        a[0] += 1
        a[1] = t if a[1] is None else min(a[1], t)
        a[2] = t if a[2] is None else max(a[2], t)
    rows = {r["host"]: r for r in host_freshness(pdir).take_all()}
    assert len(rows) == len(agg)
    for h, (n, f, l) in agg.items():
        r = rows[h]
        assert (r["n_urls"], r["n_captures"],
                r["first_ts_us"], r["last_ts_us"]) == \
            (len(urls_per_host[h]), n, f, l), h


def test_url_filter(ray_session, sf_dir):
    """Farm blocklist + penalty substrings vs a sequential replay."""
    from collections import Counter

    import pyarrow.parquet as _pq

    from methanol_web_crawler_ray.sources import pagegen
    from methanol_web_crawler_ray.stages.extract import (
        FARM_MIN_PAGES, URL_PENALTIES, url_filter)

    pdir = pagegen.pages_dir_for(sf_dir)
    urls = _pq.read_table(f"{pdir}/pages.parquet",
                          columns=["url"]).column("url").to_pylist()

    def hostof(u):
        p = u.split("/")
        return p[2] if len(p) > 2 else ""

    cnt = Counter(hostof(u) for u in urls)
    farm = {h for h, c in cnt.items() if c >= FARM_MIN_PAGES}
    rows = {r["url"]: r for r in url_filter(pdir).take_all()}
    assert len(rows) == len(set(urls))
    for u in urls:
        r = rows[u]
        npen = sum(1 for w in URL_PENALTIES if w in u.lower())
        assert r["host"] == hostof(u)
        assert r["is_farm"] == int(hostof(u) in farm)
        assert r["n_penalties"] == npen
        assert r["blocked"] == int(hostof(u) in farm or npen > 0)
    assert any(r["blocked"] for r in rows.values())


def test_url_filter_crafted_farm(ray_session, tmp_path):
    """A host over the farm bar is blocked even with a clean URL."""
    import pyarrow as pa
    import pyarrow.parquet as _pq

    from methanol_web_crawler_ray.stages.extract import url_filter

    urls = ([f"http://farm.ex/p{i}.html" for i in range(3)]
            + ["http://tiny.ex/ok.html", "relative/path.html"])
    _pq.write_table(pa.table({"url": pa.array(urls)}),
                    str(tmp_path / "pages.parquet"))
    rows = {r["url"]: r for r in url_filter(str(tmp_path),
                                            farm_min=3).take_all()}
    assert all(rows[u]["is_farm"] == 1 and rows[u]["blocked"] == 1
               for u in urls[:3])
    assert rows["http://tiny.ex/ok.html"]["blocked"] == 0
    # schemeless URL -> host '' (split_part parity), never crashes
    assert rows["relative/path.html"]["host"] == ""


def test_url_depth_dist_vs_bruteforce(ray_session, sf_dir):
    """Depth histogram matches a per-URL split replay."""
    from collections import Counter

    import pyarrow.parquet as pq

    from methanol_web_crawler_ray.stages.extract import url_depth_dist

    sf_dir_pages = pagegen.pages_dir_for(sf_dir)
    urls = pq.read_table(f"{sf_dir_pages}/pages.parquet",
                         columns=["url"]).column("url").to_pylist()
    exp = Counter(max(len(u.split("/")) - 3, 0) for u in urls)
    got = {r["depth"]: r["n_pages"]
           for r in url_depth_dist(sf_dir_pages).take_all()}
    assert got == dict(exp)
    assert sum(got.values()) == len(urls)


def test_anchor_kernel_grammar():
    """extract_anchor_texts: href grammar, container skip, text strip."""
    from methanol_web_crawler_ray.functions.htmlparse import (
        extract_anchor_texts)

    html = (b"<html><body>"
            b"<a href=\"/x/y.html\">Link <b>one</b>  here</a>"
            b"<a href=\"#frag\">skip</a>"
            b"<A HREF=rel.html>UPPER</A>"
            b"<script>var x = '<a href=\"fake.html\">no</a>';</script>"
            b"<a name=anchor>no href</a>"
            b"<a href=\"http://other/\"><img src=i.png></a>"
            b"</body></html>")
    assert extract_anchor_texts(html) == [
        (b"/x/y.html", b"Link one here"),
        (b"rel.html", b"UPPER"),
        (b"http://other/", b""),
    ]


def test_page_anchors_vs_golden(ray_session):
    """Distributed anchor extraction == the by-construction golden."""
    import pyarrow.parquet as pq

    d = pagegen.pages_dir_for("/root/testdata/sf0.001")
    got = sorted(
        (r["url"], r["anchor_seq"], r["href_raw"], r["anchor"])
        for r in extract.page_anchors(d).take_all())
    exp = sorted(
        (r["url"], r["anchor_seq"], r["href_raw"], r["anchor"])
        for r in pq.read_table(f"{d}/golden_anchors.parquet")
        .drop_columns("canon").to_pylist())
    assert got == exp and len(got) > 0


def test_anchor_text_agg_vs_bruteforce(ray_session):
    """Per-target aggregation matches a sequential replay over the
    golden (counts, distinct sources, lexicographic min anchor)."""
    import pyarrow.parquet as pq

    d = pagegen.pages_dir_for("/root/testdata/sf0.001")
    exp = {}
    for r in pq.read_table(f"{d}/golden_anchors.parquet").to_pylist():
        e = exp.setdefault(r["canon"], [0, set(), None])
        e[0] += 1
        e[1].add(r["url"])
        e[2] = r["anchor"] if e[2] is None else min(e[2], r["anchor"])
    got = {r["target"]: (r["n_anchors"], r["n_sources"], r["top_anchor"])
           for r in extract.anchor_text_agg(d).take_all()}
    assert got == {t: (n, len(s), m) for t, (n, s, m) in exp.items()}


def test_page_titles_vs_golden(ray_session):
    """M15 stock 'title' parser through the real chain runtime == the
    generator's by-construction golden_titles table."""
    import pyarrow.parquet as pq

    d = pagegen.pages_dir_for("/root/testdata/sf0.001")
    got = sorted((r["url"], r["title"])
                 for r in extract.page_titles(d).take_all())
    exp = sorted((r["url"], r["title"])
                 for r in pq.read_table(f"{d}/golden_titles.parquet")
                 .to_pylist())
    assert got == exp and len(got) > 0


def test_redirect_resolve_paths_and_cap(ray_session):
    """Pointer-doubling path == driver-chase path; 20-cap, loop, and
    ghost-target semantics on a hand-built chain fixture."""
    from _pagetools import html, write_pages

    rows = [{"url": "http://t.x/", "body": html("root")}]
    for i in range(21):   # 21-hop chain: head is over-cap
        rows.append({"url": f"http://t.x/c{i}.html", "status": 301,
                     "location": (f"http://t.x/c{i+1}.html" if i < 20
                                  else "http://t.x/term.html")})
    rows.append({"url": "http://t.x/term.html", "body": html("term")})
    rows.append({"url": "http://t.x/l0.html", "status": 301,
                 "location": "http://t.x/l1.html"})
    rows.append({"url": "http://t.x/l1.html", "status": 301,
                 "location": "http://t.x/l0.html"})
    rows.append({"url": "http://t.x/r.html", "status": 302,
                 "location": "http://t.x/ghost.html"})
    d = write_pages("/tmp/mwc_test_redir", rows)

    a = sorted((r["url"], r["final_url"], r["hops"])
               for r in extract.redirect_resolve(d).take_all())
    b = sorted((r["url"], r["final_url"], r["hops"])
               for r in extract.redirect_resolve(d, gate=0).take_all())
    assert a == b
    m = {u: (f, h) for u, f, h in a}
    assert m["http://t.x/c0.html"] == ("", -1)        # 21 hops > cap
    assert m["http://t.x/c1.html"] == ("", -1)        # 20th redirect
    assert m["http://t.x/c2.html"] == ("http://t.x/term.html", 19)
    assert m["http://t.x/c20.html"] == ("http://t.x/term.html", 1)
    assert m["http://t.x/l0.html"] == ("", -1)        # loop
    assert m["http://t.x/r.html"] == ("http://t.x/ghost.html", 1)


def test_url_templates_bruteforce(ray_session):
    """Template collapse + counts == a sequential replay over the
    store's url column."""
    import re

    from methanol_web_crawler_ray.sources.pagestore import build_store
    import pyarrow.dataset as pads

    d = pagegen.pages_dir_for("/root/testdata/sf0.001")
    urls = pads.dataset(build_store(d), partitioning="hive") \
        .to_table(columns=["url"]).column("url").to_pylist()
    exp = {}
    for u in urls:
        host = u.split("/")[2] if len(u.split("/")) > 2 else ""
        path = re.sub(r"^[a-z]+://[^/]*", "", u) or "/"
        tmpl = re.sub(r"[0-9]+", "N", path)
        exp[(host, tmpl)] = exp.get((host, tmpl), 0) + 1
    got = {(r["host"], r["template"]): r["n_urls"]
           for r in extract.url_templates(d).take_all()}
    assert got == exp
    # the fixture's /p/NN.html family collapses into one hot template
    assert max(exp.values()) > 10


def test_page_mirrors_bruteforce(ray_session):
    """Mirror families == a sequential replay over the golden text
    column (>=2 distinct hosts, counts and canonical url)."""
    import hashlib

    import pyarrow.parquet as pq

    d = pagegen.pages_dir_for("/root/testdata/sf0.001")
    fam = {}
    for r in pq.read_table(f"{d}/pages.parquet",
                           columns=["url", "text"]).to_pylist():
        if r["text"] == "":
            continue
        dg = hashlib.md5(r["text"].encode()).hexdigest()
        e = fam.setdefault(dg, [0, set(), None])
        e[0] += 1
        e[1].add(r["url"].split("/")[2])
        e[2] = r["url"] if e[2] is None else min(e[2], r["url"])
    exp = {dg: (n, len(h), u) for dg, (n, h, u) in fam.items()
           if len(h) >= 2}
    got = {r["text_md5"]: (r["n_urls"], r["n_hosts"], r["canonical_url"])
           for r in extract.page_mirrors(d).take_all()}
    assert got == exp and len(exp) > 0


def test_revisit_schedule_bruteforce(ray_session):
    """Schedule == sequential Cho-Garcia-Molina replay over captures."""
    import hashlib

    import pyarrow.parquet as pq

    from methanol_web_crawler_ray.sources.captures import captures_path

    d = pagegen.pages_dir_for("/root/testdata/sf0.001")
    hist = {}
    for r in pq.read_table(captures_path(d)).to_pylist():
        ts = int(r["warc_ts"].timestamp() * 1_000_000)
        hist.setdefault(r["url"], []).append(
            (ts, hashlib.md5(r["text"].encode()).hexdigest()))
    exp = {}
    for u, rows in hist.items():
        nc = len(rows)
        nv = len({k for _, k in rows})
        lo = min(t for t, _ in rows)
        hi = max(t for t, _ in rows)
        if nv > 1:
            gap = (hi - lo) // (nv - 1)
        elif nc > 1:
            gap = 2 * (hi - lo)
        else:
            gap = extract.REVISIT_DEFAULT_US
        exp[u] = (nc, nv, hi, hi + gap)
    got = {r["url"]: (r["n_captures"], r["n_versions"],
                      r["last_ts_us"], r["next_fetch_us"])
           for r in extract.revisit_schedule(d).take_all()}
    assert got == exp
    # the fixture has changed, static-multi and single-capture URLs
    ncs = {v[0] for v in exp.values()}
    assert 1 in ncs and len(ncs) > 1


def test_snapshot_diff_bruteforce(ray_session):
    """Consecutive-capture line-set deltas == sequential replay."""
    import pyarrow.parquet as pq

    from methanol_web_crawler_ray.sources.captures import captures_path

    d = pagegen.pages_dir_for("/root/testdata/sf0.001")
    hist = {}
    for r in pq.read_table(captures_path(d)).to_pylist():
        ts = int(r["warc_ts"].timestamp() * 1_000_000)
        hist.setdefault(r["url"], []).append(
            (ts, set(r["text"].split("\n"))))
    exp = {}
    for u, rows in hist.items():
        rows.sort()
        for (pt, pl), (ct, cl) in zip(rows, rows[1:]):
            exp[(u, ct)] = (len(cl - pl), len(pl - cl))
    got = {(r["url"], r["ts_us"]): (r["n_added"], r["n_removed"])
           for r in extract.snapshot_diff(d).take_all()}
    assert got == exp and len(exp) > 0
    # drifted recrawls produce nonzero deltas
    assert any(a or r for a, r in exp.values())


def test_cdx_index_bruteforce(ray_session):
    """CDX records == sequential SURT replay over captures."""
    import hashlib
    import re

    import pyarrow.parquet as pq

    from methanol_web_crawler_ray.sources.captures import captures_path

    d = pagegen.pages_dir_for("/root/testdata/sf0.001")
    sch = re.compile(r"^[a-z]+://[^/]*")
    exp = set()
    for r in pq.read_table(captures_path(d)).to_pylist():
        host = r["url"].split("/")[2]
        path = sch.sub("", r["url"]) or "/"
        surt = ",".join(reversed(host.split("."))) + ")" + path
        exp.add((surt, int(r["warc_ts"].timestamp() * 1_000_000),
                 r["url"], hashlib.md5(r["text"].encode()).hexdigest()))
    got = {(r["surt"], r["ts_us"], r["url"], r["digest"])
           for r in extract.cdx_index(d).take_all()}
    assert got == exp and len(exp) > 0
    # SURT groups a host's pages under one prefix
    assert any(s.startswith("example,host-0000)") for s, *_ in exp)


def test_host_budget_bruteforce(ray_session):
    """Budget == sequential replay (count, delay extract, 10s floor)."""
    import re

    import pyarrow.parquet as pq

    d = pagegen.pages_dir_for("/root/testdata/sf0.001")
    cnt, dly = {}, {}
    for r in pq.read_table(f"{d}/pages.parquet",
                           columns=["url", "text"]).to_pylist():
        h = r["url"].split("/")[2]
        cnt[h] = cnt.get(h, 0) + 1
        if r["url"].endswith("/robots.txt"):
            m = re.search(r"Crawl-delay: ([0-9]+)", r["text"])
            if m:
                dly[h] = int(m.group(1))
    exp = {h: (n, dly.get(h, 0), n * max(dly.get(h, 0), 10))
           for h, n in cnt.items()}
    got = {r["host"]: (r["n_pages"], r["crawl_delay_s"], r["budget_s"])
           for r in extract.host_budget(d).take_all()}
    assert got == exp
    # fixture has both delayed and default hosts
    assert any(v[1] > 0 for v in exp.values())
    assert any(v[1] == 0 for v in exp.values())


def test_boilerplate_bruteforce(ray_session):
    """Boilerplate counts == sequential >=50%-of-pages line replay."""
    import pyarrow.parquet as pq

    d = pagegen.pages_dir_for("/root/testdata/sf0.001")
    per_host = {}
    for r in pq.read_table(f"{d}/pages.parquet",
                           columns=["url", "text"]).to_pylist():
        if r["text"] == "":
            continue
        h = r["url"].split("/")[2]
        per_host.setdefault(h, []).append(set(r["text"].split("\n")))
    exp = {}
    for h, pages in per_host.items():
        cnt = {}
        for ls in pages:
            for ln in ls:
                cnt[ln] = cnt.get(ln, 0) + 1
        boiler = sum(1 for c in cnt.values() if 2 * c >= len(pages))
        exp[h] = (len(pages), len(cnt), boiler)
    got = {r["host"]: (r["n_pages"], r["n_lines"], r["n_boilerplate"])
           for r in extract.boilerplate_stats(d).take_all()}
    assert got == exp
    # template chrome (doctype/comment lines) is detected as boilerplate
    assert any(v[2] > 0 for v in exp.values())


def test_canon_rules_bruteforce(ray_session):
    """Rule-firing counts == sequential replay of the same predicates
    over the by-construction golden link/canon tables."""
    import re

    import pyarrow.parquet as pq

    d = pagegen.pages_dir_for("/root/testdata/sf0.001")
    links = pq.read_table(f"{d}/golden_links.parquet").to_pylist()
    canon = {(r["url"], r["link_seq"]): r["canon"]
             for r in pq.read_table(f"{d}/golden_canon.parquet").to_pylist()}
    absu = re.compile(r"^[a-z][a-z0-9+.-]*://", re.IGNORECASE)
    exp = dict.fromkeys(extract.CANON_RULES, 0)
    for r in links:
        ref = r["ref_raw"]
        if absu.match(ref):
            exp["absolute_url"] += 1
        elif ref.startswith("/"):
            exp["absolute_path"] += 1
        else:
            exp["relative"] += 1
        if "#" in ref:
            exp["fragment"] += 1
        if "&amp;" in ref:
            exp["entity_amp"] += 1
        if "?" in ref:
            exp["dynamic"] += 1
        if canon[(r["url"], r["link_seq"])] is None:
            exp["dropped"] += 1
    got = {r["rule"]: r["n_refs"]
           for r in extract.canon_rules_audit(d).take_all()}
    assert got == exp
    # the generator sprinkles these ref families even at tiny scale
    # (FIXTURES.md §1); fragment/dropped are regression tripwires that
    # stay 0 while extraction keeps skipping '#refs' / resolving all
    assert exp["relative"] > 0 and exp["dynamic"] > 0
    assert exp["entity_amp"] > 0
    assert exp["fragment"] == 0 and exp["dropped"] == 0


def test_robots_audit_bruteforce(ray_session):
    """Per-host allow/deny coverage == sequential replay with the real
    parse_robots + Filter.eval_url kernel over every page URL."""
    import pyarrow.parquet as pq

    from methanol_web_crawler_ray.functions.robots import parse_robots
    from methanol_web_crawler_ray.functions.urlkit import url_set

    d = pagegen.pages_dir_for("/root/testdata/sf0.001")
    rows = pq.read_table(f"{d}/pages.parquet",
                         columns=["url", "text"]).to_pylist()
    infos = {r["url"].split("/")[2]: parse_robots(r["text"])
             for r in rows if r["url"].endswith("/robots.txt")}
    exp = {}
    for r in rows:
        u = r["url"]
        if u.endswith("/robots.txt"):
            continue
        h = u.split("/")[2]
        info = infos.get(h)
        ok = True if info is None else info.filter.eval_url(url_set(u))
        n, a = exp.get(h, (0, 0))
        exp[h] = (n + 1, a + ok)
    exp = {h: (n, a, n - a) for h, (n, a) in exp.items()}
    got = {r["host"]: (r["n_pages"], r["n_allowed"], r["n_denied"])
           for r in extract.robots_audit(d).take_all()}
    assert got == exp
    # the fixture's /private/ rules actually deny something somewhere
    assert sum(v[2] for v in exp.values()) > 0


def test_outlink_stats_bruteforce(ray_session):
    """Per-page outlink counters == sequential replay with the real
    resolve + hostcmp kernels over the golden links."""
    import pyarrow.parquet as pq

    from methanol_web_crawler_ray.functions.urlkit import (hostcmp,
                                                           resolve,
                                                           url_set)

    d = pagegen.pages_dir_for("/root/testdata/sf0.001")
    links = pq.read_table(f"{d}/golden_links.parquet").to_pylist()
    exp = {}
    bases = {}
    for r in links:
        url, ref = r["url"], r["ref_raw"]
        base = bases.get(url)
        if base is None:
            base = url_set(url)
            bases[url] = base
        u = resolve(base, ref) if base is not None else None
        c = exp.setdefault(url, [0, 0, 0, 0])
        c[0] += 1
        if u is not None:
            c[1] += 1
            c[2] += not hostcmp(base, u)
            c[3] += "?" in u.s
    got = {r["url"]: [r["n_refs"], r["n_resolved"], r["n_external"],
                      r["n_dynamic"]]
           for r in extract.outlink_stats(d).take_all()}
    assert got == exp
    # the fixture embeds cross-host and dynamic links (FIXTURES.md §1)
    assert any(c[2] > 0 for c in exp.values())
    assert any(c[3] > 0 for c in exp.values())


def test_recrawl_plan_bruteforce(ray_session):
    """Schedule == sequential replay of sched_i = max(due_i,
    sched_{i-1} + delay) per host, and both politeness invariants
    hold (never before due, never within delay of the predecessor)."""
    import re
    from collections import defaultdict

    import pyarrow.parquet as pq

    d = pagegen.pages_dir_for("/root/testdata/sf0.001")
    due = {r["url"]: r["next_fetch_us"]
           for r in extract.revisit_schedule(d).take_all()}
    delays = {}
    for r in pq.read_table(f"{d}/pages.parquet",
                           columns=["url", "text"]).to_pylist():
        if r["url"].endswith("/robots.txt"):
            m = re.search(r"Crawl-delay: ([0-9]+)", r["text"])
            delays[r["url"].split("/")[2]] = max(
                int(m.group(1)) if m else 0,
                extract.FRIENDLY_GET_DELAY_S) * 1_000_000
    per_host = defaultdict(list)
    for u, nf in due.items():
        per_host[u.split("/")[2]].append((nf, u))
    exp = {}
    for h, items in per_host.items():
        delay = delays.get(h, extract.FRIENDLY_GET_DELAY_S * 1_000_000)
        items.sort()
        sched = None
        for i, (nf, u) in enumerate(items, start=1):
            sched = nf if sched is None else max(nf, sched + delay)
            exp[u] = (h, i, nf, sched)
    got = {r["url"]: (r["host"], r["fetch_seq"], r["next_fetch_us"],
                      r["scheduled_us"])
           for r in extract.recrawl_plan(d).take_all()}
    assert got == exp
    # invariants: never early, never impolite
    for h, items in per_host.items():
        delay = delays.get(h, extract.FRIENDLY_GET_DELAY_S * 1_000_000)
        plan = sorted((exp[u][1], exp[u][2], exp[u][3])
                      for _, u in items)
        for (_, nf, s), (_, _, s2) in zip(plan, plan[1:]):
            assert s >= nf and s2 - s >= delay
    # some host is actually delay-bound (schedule pushed past due)
    assert any(exp[u][3] > exp[u][2] for u in due)


def test_robots_audit_large_path_parity(ray_session):
    """gate=0 forces the co-shuffled groupby(host) path; it must match
    the broadcast-dict path row for row."""
    d = pagegen.pages_dir_for("/root/testdata/sf0.001")
    small = sorted((r["host"], r["n_pages"], r["n_allowed"], r["n_denied"])
                   for r in extract.robots_audit(d).take_all())
    large = sorted((r["host"], r["n_pages"], r["n_allowed"], r["n_denied"])
                   for r in extract.robots_audit(d, gate=0).take_all())
    assert small == large and len(small) > 0


def test_recrawl_plan_large_path_parity(ray_session):
    d = pagegen.pages_dir_for("/root/testdata/sf0.001")
    small = sorted((r["url"], r["host"], r["fetch_seq"],
                    r["next_fetch_us"], r["scheduled_us"])
                   for r in extract.recrawl_plan(d).take_all())
    large = sorted((r["url"], r["host"], r["fetch_seq"],
                    r["next_fetch_us"], r["scheduled_us"])
                   for r in extract.recrawl_plan(d, gate=0).take_all())
    assert small == large and len(small) > 0


def test_dup_titles_vs_goldens(ray_session):
    """Per-title rollup == a replay over the generator's golden_titles
    table (same source page_titles is gated against)."""
    import pyarrow.parquet as pq

    d = pagegen.pages_dir_for("/root/testdata/sf0.001")
    gold = pq.read_table(f"{d}/golden_titles.parquet").to_pylist()
    exp = {}
    for r in gold:
        host = r["url"].split("/")[2]
        e = exp.setdefault(r["title"], [0, set()])
        e[0] += 1
        e[1].add(host)
    got = {r["title"]: (r["n_pages"], r["n_hosts"])
           for r in extract.dup_titles(d).take_all()}
    assert got == {t: (n, len(h)) for t, (n, h) in exp.items()}
    assert len(got) > 0
