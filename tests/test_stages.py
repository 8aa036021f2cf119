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
