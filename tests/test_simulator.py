"""Crawl-kernel + simulator semantics (SURVEY.md §3.2 ordering contract)."""

import pytest

from methanol_web_crawler_ray.config import default_config
from methanol_web_crawler_ray.pipelines import simulator as sim
from methanol_web_crawler_ray.pipelines.hostloop import DictFetcher, PageRow
from methanol_web_crawler_ray.sources import pagegen


def _web(pages):
    return DictFetcher({u: PageRow(url=u, **kw) for u, kw in pages.items()})


@pytest.fixture(scope="module")
def fixture_fetch():
    d = pagegen.pages_dir_for("/root/testdata/sf0.001")
    return DictFetcher(pagegen.load_fetch_dict(d))


def test_dfs_lifo_order():
    """Siblings visited in REVERSE extraction order, depth-first
    (utable.c:142-156 LIFO pop + urlengine.c:379-435)."""
    f = _web({
        "http://a.x/": dict(body=b'<a href="1.html">1</a><a href="2.html">2</a>'),
        "http://a.x/1.html": dict(body=b'<a href="11.html">d</a>'),
        "http://a.x/2.html": dict(body=b'<a href="21.html">d</a>'),
        "http://a.x/11.html": dict(body=b''),
        "http://a.x/21.html": dict(body=b''),
    })
    cfg = default_config(robotstxt=False, depth_limit=5)
    r = sim.simulate_single_worker(cfg, f, ["http://a.x/"])
    assert [v[0] for v in r.visits] == [
        "http://a.x/",
        "http://a.x/2.html",   # LIFO: last-extracted first
        "http://a.x/21.html",  # depth-first descent
        "http://a.x/1.html",
        "http://a.x/11.html",
    ]


def test_depth_limit_discards_deeper():
    """depth_limit=2: children beyond depth 1 discarded wholesale
    (urlengine.c:385-390)."""
    f = _web({
        "http://a.x/": dict(body=b'<a href="1.html">1</a>'),
        "http://a.x/1.html": dict(body=b'<a href="2.html">2</a>'),
        "http://a.x/2.html": dict(body=b'<a href="3.html">3</a>'),
    })
    cfg = default_config(robotstxt=False, depth_limit=2)
    r = sim.simulate_single_worker(cfg, f, ["http://a.x/"])
    assert [v[0] for v in r.visits] == ["http://a.x/", "http://a.x/1.html"]
    # ... but the depth-2 URL was still seen-added at extraction time
    assert r.seen_size == 3


def test_dedup_first_occurrence_wins():
    f = _web({
        "http://a.x/": dict(body=b'<a href="1.html">1</a><a href="1.html">1</a>'),
        "http://a.x/1.html": dict(body=b''),
    })
    cfg = default_config(robotstxt=False, depth_limit=5)
    r = sim.simulate_single_worker(cfg, f, ["http://a.x/"])
    assert [v[0] for v in r.visits] == ["http://a.x/", "http://a.x/1.html"]


def test_redirect_same_host_recrawls_same_depth():
    f = _web({
        "http://a.x/": dict(body=b'<a href="r.html">r</a>'),
        "http://a.x/r.html": dict(status=301, location="http://a.x/real.html",
                                  body=b''),
        "http://a.x/real.html": dict(body=b'ok'),
    })
    cfg = default_config(robotstxt=False, depth_limit=2)
    r = sim.simulate_single_worker(cfg, f, ["http://a.x/"])
    # real.html crawled at the same depth as r.html (ue_revert)
    assert ("http://a.x/real.html", "a.x", 1, 0, 2) in r.visits


def test_redirect_loop_capped_at_20():
    pages = {"http://a.x/": dict(body=b'<a href="l0.html">l</a>')}
    for i in range(30):
        pages[f"http://a.x/l{i}.html"] = dict(
            status=302, location=f"http://a.x/l{i + 1}.html", body=b'')
    f = _web(pages)
    cfg = default_config(robotstxt=False, depth_limit=3)
    r = sim.simulate_single_worker(cfg, f, ["http://a.x/"])
    # visits: the root + the redirect hops up to the cap; no crash
    hops = [v for v in r.visits if "/l" in v[0]]
    assert len(hops) <= 21


def test_pending_pushed_at_ue_add_not_park():
    """The pending-host LIFO is populated at ue_add's external cache-check
    (urlengine.c:219-232 → ue_get_hostent(..., add_pending=1)) — i.e. at
    link EXTRACTION time, for every external link even ones that never
    park — not at park time.  Here b.x enters pending via an image link
    (target, never parked) BEFORE c.x (parsed+parked), so LIFO pops c.x
    first even though c.x's park happened first."""
    f = _web({
        "http://a.x/": dict(body=b'<a href="http://b.x/i.png">t</a>'
                                 b'<a href="http://c.x/p.html">c</a>'
                                 b'<a href="/d.html">d</a>'),
        "http://a.x/d.html": dict(body=b''),
        "http://b.x/q.html": dict(body=b''),
        "http://c.x/p.html": dict(body=b'<a href="http://b.x/q.html">b</a>'),
    })
    cfg = default_config(robotstxt=False, depth_limit=4, external=True)
    r = sim.simulate_single_worker(cfg, f, ["http://a.x/"])
    assert [v[0] for v in r.visits] == [
        "http://a.x/",
        "http://a.x/d.html",
        "http://c.x/p.html",   # pending [b, c] → LIFO pops c first
        "http://b.x/q.html",   # b parked during c's crawl, still pending
    ]


def test_popped_empty_host_strands_later_park():
    """Reference quirk: a host pushed pending at extraction time can be
    popped with an EMPTY parked list; a URL parked onto it afterwards is
    stranded (the pending stack never re-admits an existing ent —
    ue_hostent_create pushes only on creation; ue_remove_pending is
    commented out in the reference).  Rounds mode does NOT strand (the
    barrier registry admits a host once, whenever its first candidate
    merges) — a documented inline/rounds divergence."""
    f = _web({
        # c.x extracted (and parked) BEFORE b.x → pending [c, b]; b.x is
        # popped empty, then c.x's crawl parks b.x/q.html → stranded
        "http://a.x/": dict(body=b'<a href="http://c.x/p.html">c</a>'
                                 b'<a href="http://b.x/i.png">t</a>'),
        "http://b.x/q.html": dict(body=b''),
        "http://c.x/p.html": dict(body=b'<a href="http://b.x/q.html">b</a>'),
    })
    cfg = default_config(robotstxt=False, depth_limit=4, external=True)
    r = sim.simulate_single_worker(cfg, f, ["http://a.x/"])
    urls = [v[0] for v in r.visits]
    assert "http://c.x/p.html" in urls
    assert "http://b.x/q.html" not in urls  # stranded, faithfully
    # ... while rounds mode crawls it (barrier-merged arrival)
    r2 = sim.simulate_rounds(cfg, f, ["http://a.x/"])
    assert "http://b.x/q.html" in [v[0] for v in r2.visits]


def test_robots_disallow_and_allow_ordering(fixture_fetch):
    """Disallow /private/ + Allow /private/open/ → allow wins (allow rules
    sort before deny, filter.c:75-84)."""
    cfg = default_config(depth_limit=8)
    r = sim.simulate_rounds(cfg, fixture_fetch, ["http://host-0001.example/"])
    urls = [v[0] for v in r.visits]
    assert not any("/private/s" in u for u in urls)
    assert any("/private/open/" in u for u in urls)


def test_single_vs_rounds_parity_fixture(fixture_fetch):
    """The distributed-rounds semantics must match the single-worker
    reference loop exactly on single-seed crawls (per-host sequences,
    seen set, texts, targets)."""
    for external in (False, True):
        cfg = default_config(depth_limit=6, external=external)
        seeds = ["http://host-0000.example/"]
        r1 = sim.simulate_single_worker(cfg, fixture_fetch, seeds)
        r2 = sim.simulate_rounds(cfg, fixture_fetch, seeds)
        h1, h2 = r1.visits_by_host(), r2.visits_by_host()
        assert set(h1) == set(h2)
        for h in h1:
            assert h1[h] == h2[h], f"host {h} sequence diverged"
        assert r1.seen_size == r2.seen_size
        assert r1.texts == r2.texts
        assert sorted(t["url_hash"] for t in r1.targets) == \
            sorted(t["url_hash"] for t in r2.targets)


def test_budgeted_rounds_same_outcome(fixture_fetch):
    """Politeness budgets change the schedule, never the outcome."""
    cfg_a = default_config(depth_limit=6, external=True)
    cfg_f = default_config(depth_limit=6, external=True)
    cfg_f.mode = "friendly"
    cfg_f.round_seconds = 40
    seeds = ["http://host-0000.example/"]
    ra = sim.simulate_rounds(cfg_a, fixture_fetch, seeds)
    rf = sim.simulate_rounds(cfg_f, fixture_fetch, seeds)
    assert rf.rounds > ra.rounds
    assert sorted(v[0] for v in ra.visits) == sorted(v[0] for v in rf.visits)
    assert ra.texts == rf.texts
    # per-host visit ORDER is also preserved across pause/resume
    ha, hf = ra.visits_by_host(), rf.visits_by_host()
    assert ha == hf


def test_crawl_delay_budget(fixture_fetch):
    """host-0001 (hi%4==1) declares Crawl-delay: 4 → ≤ round_seconds/4
    transfers per round."""
    cfg = default_config(depth_limit=6)
    cfg.round_seconds = 8  # → budget 2/round for crawl-delay 4
    r = sim.simulate_rounds(cfg, fixture_fetch, ["http://host-0001.example/"])
    per_round = {}
    for _u, _h, _d, rnd, _s in r.visits:
        per_round[rnd] = per_round.get(rnd, 0) + 1
    assert max(per_round.values()) <= 2
    assert r.rounds > 2


def test_text_byte_identity(fixture_fetch):
    """North-rule invariant: extracted text per URL is byte-identical to
    the pages table's golden text column."""
    import os

    import pyarrow.parquet as pq

    d = pagegen.pages_dir_for("/root/testdata/sf0.001")
    golden = {
        r["url"]: r["text"].encode()
        for r in pq.read_table(os.path.join(d, "pages.parquet")).to_pylist()
    }
    cfg = default_config(depth_limit=8, external=True)
    r = sim.simulate_rounds(cfg, fixture_fetch, ["http://host-0000.example/"])
    assert len(r.texts) > 20
    for url, text in r.texts.items():
        assert text == golden[url], f"text diverged for {url}"


def test_jail_filter():
    f = _web({
        "http://a.x/sub/": dict(body=b'<a href="/sub/in.html">i</a>'
                                     b'<a href="/out.html">o</a>'),
        "http://a.x/sub/in.html": dict(body=b''),
        "http://a.x/out.html": dict(body=b''),
    })
    cfg = default_config(robotstxt=False, depth_limit=4, jail=True)
    r = sim.simulate_single_worker(cfg, f, ["http://a.x/sub/"])
    urls = [v[0] for v in r.visits]
    assert "http://a.x/sub/in.html" in urls
    assert "http://a.x/out.html" not in urls


def test_filetype_targets_and_counts(fixture_fetch):
    cfg = default_config(depth_limit=6)
    r = sim.simulate_rounds(cfg, fixture_fetch, ["http://host-0000.example/"])
    assert r.ft_counts.get("html", 0) > 0
    # image filetype has no parser → reported as target without crawling
    img_targets = [t for t in r.targets if t["filetype"] == "image"]
    assert img_targets
    assert all(t["attrs"] == {} for t in img_targets)
    # html targets carry the html attribute (declared in config)
    html_targets = [t for t in r.targets if t["filetype"] == "html"]
    assert html_targets and all("html" in t["attrs"] for t in html_targets)
