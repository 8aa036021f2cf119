"""Kernel features beyond the default config: external_peek, switch_to,
initial_filetype, UMEX-bound filetypes in the crawl."""

from methanol_web_crawler_ray.config import EngineConfig, default_config
from methanol_web_crawler_ray.functions.matchkit import Crawler, Filetype
from methanol_web_crawler_ray.pipelines import simulator as sim
from methanol_web_crawler_ray.pipelines.hostloop import DictFetcher, PageRow


def _web(pages):
    return DictFetcher({u: PageRow(url=u, **kw) for u, kw in pages.items()})


def test_external_peek():
    """epeek (worker.c:679-707): external matches crawl up to peek_limit
    depths under saved/restored depth state, single-worker mode."""
    f = _web({
        "http://a.x/": dict(body=b'<a href="http://b.x/p1.html">b</a>'
                                 b'<a href="in.html">i</a>'),
        "http://a.x/in.html": dict(body=b''),
        "http://b.x/p1.html": dict(body=b'<a href="p2.html">2</a>'),
        "http://b.x/p2.html": dict(body=b'<a href="p3.html">3</a>'),
        "http://b.x/p3.html": dict(body=b''),
    })
    cfg = default_config(robotstxt=False, depth_limit=4,
                         external=False, external_peek=True, peek_limit=2)
    r = sim.simulate_single_worker(cfg, f, ["http://a.x/"])
    urls = [v[0] for v in r.visits]
    # the peek visits the parked external match itself...
    assert "http://b.x/p1.html" in urls
    # ...but NOT deeper: the peeked page's children inherit LM_URL_EXTERNAL
    # (url.c:297 flag copy), and during a peek bind_url drops externals
    # (epeek is off while is_peeking, worker.c:548-549 + 676-707) — the
    # same faithful quirk that makes external crawling one level deep.
    assert "http://b.x/p2.html" not in urls
    assert "http://b.x/p3.html" not in urls
    # and the home host's crawl continues after the peek (depth restored)
    assert "http://a.x/in.html" in urls
    # without epeek the external match is dropped entirely
    cfg2 = default_config(robotstxt=False, depth_limit=4, external=False)
    r2 = sim.simulate_single_worker(cfg2, f, ["http://a.x/"])
    assert "http://b.x/p1.html" not in [v[0] for v in r2.visits]


def test_external_peek_rounds_parity():
    """epeek now works in ROUNDS mode too: the peeked URL takes a
    synchronous cross-host seen verdict and the peek backup state
    (is_peeking, depth bk) survives budget interruptions via the host
    state blob.  Visit sequences match single-worker mode."""
    f = _web({
        "http://a.x/": dict(body=b'<a href="http://b.x/p1.html">b</a>'
                                 b'<a href="in.html">i</a>'),
        "http://a.x/in.html": dict(body=b''),
        "http://b.x/p1.html": dict(body=b'<a href="p2.html">2</a>'),
        "http://b.x/p2.html": dict(body=b''),
    })
    cfg = default_config(robotstxt=False, depth_limit=4,
                         external=False, external_peek=True, peek_limit=2)
    r1 = sim.simulate_single_worker(cfg, f, ["http://a.x/"])
    r2 = sim.simulate_rounds(cfg, f, ["http://a.x/"])
    assert [v[0] for v in r1.visits] == [v[0] for v in r2.visits]
    assert "http://b.x/p1.html" in [v[0] for v in r2.visits]
    assert r1.texts == r2.texts

    # budget interruption mid-peek: 2 transfers/round → the peek state
    # crosses a round boundary and restores correctly
    cfg_b = default_config(robotstxt=False, depth_limit=4,
                           external=False, external_peek=True, peek_limit=2)
    cfg_b.mode = "friendly"
    cfg_b.round_seconds = 20
    r3 = sim.simulate_rounds(cfg_b, f, ["http://a.x/"])
    assert sorted(v[0] for v in r3.visits) == sorted(v[0] for v in r2.visits)
    assert r3.rounds > 1
    assert r3.texts == r2.texts


def test_external_peek_seen_dedup_rounds():
    """A URL already crawled by another host is NOT re-peeked (the
    synchronous verdict drops it) — rounds mode."""
    f = _web({
        # budgeted so a.x peeks b.x/p.html in round 0; c.x reaches its
        # link in round 1 → deterministic winner
        "http://a.x/": dict(body=b'<a href="http://b.x/p.html">b</a>'),
        "http://c.x/": dict(body=b'<a href="c1.html">c</a>'),
        "http://c.x/c1.html": dict(body=b'<a href="http://b.x/p.html">b</a>'),
        "http://b.x/p.html": dict(body=b'x'),
    })
    cfg = default_config(robotstxt=False, depth_limit=4,
                         external=False, external_peek=True, peek_limit=2)
    cfg.mode = "friendly"
    cfg.round_seconds = 20
    r = sim.simulate_rounds(cfg, f, ["http://a.x/", "http://c.x/"])
    b_visits = [v for v in r.visits if v[0] == "http://b.x/p.html"]
    assert len(b_visits) == 1
    assert b_visits[0][1] == "a.x"


def test_head_uses_multipeek_timer():
    """friendly mode: HEAD lookups advance the politeness clock by the
    multipeek timer (2 s), GETs by the main timer (10 s) — metha.c:70-78
    timer_vals + lm_iothr_wait(mp)."""
    filetypes = {
        "html": Filetype(name="html", extensions=("html",),
                         mimetypes=("text/html",), parser="html"),
    }
    crawlers = {
        "default": Crawler(name="default", filetypes=("html",),
                           depth_limit=3, robotstxt=False, external=False,
                           dir_url="@html", extless_url=None,  # → lookup
                           dynamic_url="@html", unknown_url="discard"),
    }
    cfg = EngineConfig(crawlers=crawlers, filetypes=filetypes)
    cfg.mode = "friendly"
    cfg.round_seconds = 1000
    f = _web({
        # two extensionless links → two HEAD lookups, both text/html
        "http://a.x/": dict(body=b'<a href="alpha">1</a><a href="beta">2</a>'),
        "http://a.x/alpha": dict(body=b''),
        "http://a.x/beta": dict(body=b''),
    })
    r = sim.simulate_rounds(cfg, f, ["http://a.x/"])
    assert sorted(v[0] for v in r.visits) == \
        ["http://a.x/", "http://a.x/alpha", "http://a.x/beta"]
    # clock: 3 GETs × 10 s + 2 HEADs × 2 s = 34 s — all inside round 0;
    # with the old uniform 10 s timer the total would be 50 s (still one
    # round), so pin the ACCOUNTING via a tight window instead:
    cfg2 = EngineConfig(crawlers=crawlers, filetypes=filetypes)
    cfg2.mode = "friendly"
    # clock trace: root GET → 10, two HEADs → 14, first child GET starts
    # at 14 (< 20) → 24, second child deferred to round 1.  With the old
    # uniform 10 s HEAD cost the clock would be 30 after sorting and
    # round 0 would hold only the root visit.
    cfg2.round_seconds = 20
    r2 = sim.simulate_rounds(cfg2, f, ["http://a.x/"])
    per_round = {}
    for _u, _h, _d, rnd, _s in r2.visits:
        per_round.setdefault(rnd, []).append(_u)
    assert len(per_round.get(0, [])) == 2
    assert sorted(v[0] for v in r2.visits) == \
        sorted(v[0] for v in r.visits)


def test_switch_to_crawler():
    """filetype.switch_to (perform, worker.c:747-748): crawling a matching
    URL switches the active crawler (different depth_limit here)."""
    filetypes = {
        "html": Filetype(name="html",
                         extensions=("html",),
                         mimetypes=("text/html",), parser="html"),
        "deep": Filetype(name="deep", extensions=("php",),
                         mimetypes=("text/html",), parser="html",
                         switch_to="deepcrawler"),
    }
    crawlers = {
        "default": Crawler(name="default", filetypes=("html", "deep"),
                           depth_limit=2, robotstxt=False,
                           dir_url="@html", extless_url="@html",
                           dynamic_url="@html", unknown_url="discard"),
        "deepcrawler": Crawler(name="deepcrawler", filetypes=("html", "deep"),
                               depth_limit=6, robotstxt=False,
                               dir_url="@html", extless_url="@html",
                               dynamic_url="@html", unknown_url="discard"),
    }
    cfg = EngineConfig(crawlers=crawlers, filetypes=filetypes)
    f = _web({
        "http://a.x/": dict(body=b'<a href="go.php">go</a>'),
        "http://a.x/go.php": dict(body=b'<a href="d1.php">1</a>'),
        "http://a.x/d1.php": dict(body=b'<a href="d2.php">2</a>'),
        "http://a.x/d2.php": dict(body=b'<a href="d3.php">3</a>'),
        "http://a.x/d3.php": dict(body=b''),
        "http://a.x/stop.html": dict(body=b''),
    })
    r = sim.simulate_single_worker(cfg, f, ["http://a.x/"])
    urls = [v[0] for v in r.visits]
    # depth_limit=2 alone would stop after go.php; each .php page
    # re-triggers switch_to (perform, worker.c:747-748), and the per-list
    # state_info mechanism (worker.c:289-293) switches back on html lists
    # — so the .php chain descends under deepcrawler's limit 6
    assert "http://a.x/d2.php" in urls and "http://a.x/d3.php" in urls


def test_initial_filetype_binding():
    """crawler.initial_filetype (worker.c:239-244): seeds bound directly,
    skipping the initial sort."""
    cfg = default_config(robotstxt=False, initial_filetype="html",
                         depth_limit=2)
    f = _web({
        # extension-less dynamic seed that unknown_url=discard would drop
        "http://a.x/": dict(body=b'<a href="x.html">x</a>'),
        "http://a.x/x.html": dict(body=b''),
    })
    r = sim.simulate_single_worker(cfg, f, ["http://a.x/"])
    assert [v[0] for v in r.visits] == ["http://a.x/", "http://a.x/x.html"]


def test_umex_filetype_in_crawl():
    """A filetype bound by UMEX expr only (F4): PATH</search?*q=*>."""
    filetypes = {
        "html": Filetype(name="html", extensions=("html",),
                         mimetypes=("text/html",), parser="html"),
        "search": Filetype(name="search", expr="PATH</search?*q=*>",
                           mimetypes=(), parser="html"),
    }
    crawlers = {
        # dynamic_url=discard: the UMEX scan only runs when the dynamic
        # binding falls through (ftindex.c:160-166) — with "lookup" the
        # URL would resolve via MIME instead and bind as html
        "default": Crawler(name="default", filetypes=("html", "search"),
                           depth_limit=3, robotstxt=False,
                           dir_url="@html", unknown_url="discard",
                           extless_url="discard", dynamic_url="discard"),
    }
    cfg = EngineConfig(crawlers=crawlers, filetypes=filetypes)
    f = _web({
        "http://a.x/": dict(body=b'<a href="/search?q=abc&start=0">s</a>'),
        "http://a.x/search?q=abc&start=0": dict(body=b'<a href="hit.html">h</a>'),
        "http://a.x/hit.html": dict(body=b''),
    })
    r = sim.simulate_single_worker(cfg, f, ["http://a.x/"])
    urls = [v[0] for v in r.visits]
    assert "http://a.x/search?q=abc&start=0" in urls
    assert "http://a.x/hit.html" in urls
    assert r.ft_counts.get("search", 0) >= 1


def test_ignore_host_flag():
    """FT_FLAG_IGNORE_HOST (filetype.h:33, bind_url worker.c:678): a
    matching EXTERNAL URL stays in the local crawl list instead of being
    parked/dropped."""
    filetypes = {
        "html": Filetype(name="html", extensions=("html",),
                         mimetypes=("text/html",), parser="html",
                         ignore_host=True),
    }
    crawlers = {
        "default": Crawler(name="default", filetypes=("html",),
                           depth_limit=3, robotstxt=False, external=False,
                           dir_url="@html", extless_url="@html",
                           dynamic_url="@html", unknown_url="discard"),
    }
    cfg = EngineConfig(crawlers=crawlers, filetypes=filetypes)
    f = _web({
        "http://a.x/": dict(body=b'<a href="http://b.x/p.html">b</a>'),
        "http://b.x/p.html": dict(body=b'done'),
    })
    r = sim.simulate_single_worker(cfg, f, ["http://a.x/"])
    assert "http://b.x/p.html" in [v[0] for v in r.visits]
