"""Stock site-config fixtures end-to-end (conf/wikipedia.conf,
conf/google.conf analogs): the config language (S12) + UMEX expr
matching (F4) + user parser-script analogs (M15) + init seed
generators, driven through the ordered kernel."""

from methanol_web_crawler_ray.config_lang import ConfError  # noqa: F401
from methanol_web_crawler_ray.functions import siteparsers
from methanol_web_crawler_ray.functions.matchkit import FTIndex
from methanol_web_crawler_ray.functions.urlkit import url_set
from methanol_web_crawler_ray.pipelines import simulator as sim
from methanol_web_crawler_ray.pipelines.hostloop import DictFetcher, PageRow


def _pages(d):
    return {url_set(u).s: PageRow(url=url_set(u).s, status=200,
                                  content_type="text/html", body=b)
            for u, b in d.items()}


WIKI_SEARCH_BODY = b"""<html><head><title>Search results</title></head>
<body><p>intro</p>
<ul class="mw-search-results">
<li><a href="/wiki/Foo" title="Foo">Foo</a></li>
<li><a href="/wiki/Foo_(film)" title="Foo (film)">Foo (film)</a></li>
</ul>
<ul class="other"><li><a href="/wiki/Nope" title="Nope">n</a></li></ul>
</body></html>"""


def test_wikipedia_config_end_to_end():
    cfg = siteparsers.load_site_config("wikipedia.conf")
    # config-language surface: include + extend landed
    assert set(cfg.crawlers["default"].filetypes) == {"html", "result"}
    assert cfg.filetypes["html"].expr == "PATH</w/index.php?search*>"

    seeds = siteparsers.seeds_from_init(cfg, ["foo"])
    assert seeds == ["http://en.wikipedia.org/w/index.php?search=foo"
                     "&fulltext=Advanced+search"]

    fetch = DictFetcher(_pages({seeds[0]: WIKI_SEARCH_BODY}))
    r = sim.simulate_rounds(cfg, fetch, seeds)

    # only the search page is visited (the chain has no link extractor)
    assert [v[0] for v in r.visits] == [url_set(seeds[0]).s]
    # println lines captured as the declared 'results' attribute, in
    # document order, absolute-ized per wikipedia.js:18
    tg = [t for t in r.targets if "results" in t["attrs"]]
    assert len(tg) == 1
    assert tg[0]["attrs"]["results"] == (
        b"Foo: http://en.wikipedia.org/wiki/Foo\n"
        b"Foo (film): http://en.wikipedia.org/wiki/Foo_(film)")


def test_wikipedia_umex_result_classification():
    """UMEX actually decides: FULL<*> binds any leftover URL to the
    target-only 'result' filetype, while the search PATH expr documents
    the html binding (dynamic_url=@html short-circuits it, as in the
    reference's ftindex)."""
    cfg = siteparsers.load_site_config("wikipedia.conf")
    idx = FTIndex(cfg.crawlers["default"], cfg.filetypes)
    ft = idx.match_by_url(url_set("http://en.wikipedia.org/wiki/Foo"))
    assert ft is not None and ft.name == "result" and not ft.has_parser
    ft = idx.match_by_url(url_set(
        "http://en.wikipedia.org/w/index.php?search=x&fulltext=y"))
    assert ft is not None and ft.name == "html"


GOOGLE_P1 = b"""<html><body>
<a class="l" href="http://result-a.example/page">A</a>
<a class="x" href="http://ignored.example/">X</a>
<a class="l" href="http://result-b.example/doc">B</a>
<a class="l" href="/search?q=foo&start=10">Next</a>
</body></html>"""

GOOGLE_P2 = b"""<html><body>
<a class="l" href="http://result-c.example/deep">C</a>
</body></html>"""


def test_google_config_end_to_end():
    cfg = siteparsers.load_site_config("google.conf")
    cfg.extend_crawler("default", depth_limit=3)

    seeds = siteparsers.seeds_from_init(cfg, ["foo"])
    assert seeds == ["http://www.google.com/search?q=foo&start=0"]
    p2 = "http://www.google.com/search?q=foo&start=10"

    fetch = DictFetcher(_pages({seeds[0]: GOOGLE_P1, p2: GOOGLE_P2}))
    r = sim.simulate_rounds(cfg, fetch, seeds)

    # the script-returned pagination link (dynamic → @html) is crawled;
    # its '&amp;' from xmlconv's requoting canonicalizes back to '&'
    # (encodecpy's M1 quirk)
    assert [v[0] for v in r.visits] == [url_set(seeds[0]).s, url_set(p2).s]

    # every <a class="l"> result (and nothing else) reported as a
    # 'result' target via UMEX FULL<*>, including externals — targets
    # are bound pre-fetch (worker.c:712-713)
    result_urls = {t["url"] for t in r.targets
                   if t["filetype"] == "result"}
    assert result_urls == {
        "http://result-a.example/page",
        "http://result-b.example/doc",
        "http://result-c.example/deep",
    }
    assert not any("ignored.example" in u for u in result_urls)
