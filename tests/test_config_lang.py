"""The .conf configuration-language parser (SURVEY §2 S12)."""

import pytest

from methanol_web_crawler_ray.config_lang import (ConfError, load_config_file,
                                                  parse_config)

DEFAULT_CONF = """
# mirrors conf/default.conf
crawler ["default"]
{
    dir_url     = "@html";
    extless_url = "@html";
    dynamic_url = "@html";
    unknown_url = "discard";
}

filetype ["html"]
{
    extensions = {"htm", "html", "php",
                  "asp", "aspx", "jsp"};
    mimetypes = {"text/html",
                 "text/xml",
                 "application/xhtml+xml",
                 "application/xml"};
    parser = "html";
}

filetype ["text"]
{
    extensions = {"txt"};
    mimetypes = {"text/plain"};
    parser = "text";
}
"""

SITE_CONF = """
include "default.conf"

extend: crawler["default"]
{
    filetypes = {"html", "result"};
    depth_limit = 4;
    external = true;
    robotstxt = 1;
}

extend: filetype["html"]
{
    expr = "PATH</search?*q=*start=*>";
    parser = "xmlconv, title";
}

filetype["result"]
{
    expr = "FULL<*>";
}
"""


def _resolver(name):
    assert name == "default.conf"
    return DEFAULT_CONF


def test_parse_default():
    cfg = parse_config(DEFAULT_CONF)
    assert set(cfg.filetypes) == {"html", "text"}
    assert cfg.filetypes["html"].extensions == (
        "htm", "html", "php", "asp", "aspx", "jsp")
    assert cfg.crawlers["default"].dir_url == "@html"
    assert cfg.crawlers["default"].unknown_url == "discard"


def test_include_and_extend():
    cfg = parse_config(SITE_CONF, include_resolver=_resolver)
    cr = cfg.crawlers["default"]
    assert cr.depth_limit == 4
    assert cr.external is True
    assert cr.robotstxt is True  # numeric flag (conf.c:679)
    assert cr.filetypes == ("html", "result")
    ft = cfg.filetypes["html"]
    assert ft.expr == "PATH</search?*q=*start=*>"
    assert ft.parser == "xmlconv, title"
    # extensions survived the extend (merge, not replace)
    assert "php" in ft.extensions
    assert cfg.filetypes["result"].expr == "FULL<*>"


def test_override_replaces():
    text = DEFAULT_CONF + """
override: filetype["html"] { extensions = {"html"}; parser = "html"; }
"""
    cfg = parse_config(text)
    assert cfg.filetypes["html"].extensions == ("html",)
    assert cfg.filetypes["html"].mimetypes == ()  # replaced, not merged


def test_include_loaded_once():
    text = 'include "default.conf"\ninclude "default.conf"\n'
    cfg = parse_config(text, include_resolver=_resolver)
    assert "html" in cfg.filetypes


def test_errors():
    with pytest.raises(ConfError):
        parse_config('crawler ["x"] { bogus_option = 1; }')
    with pytest.raises(ConfError):
        parse_config('extend: crawler["missing"] { depth_limit = 1; }')
    with pytest.raises(ConfError):
        parse_config('widget ["x"] { }')


def test_parsed_config_crawls():
    """A parsed config drives a real crawl end-to-end."""
    from methanol_web_crawler_ray.pipelines import simulator as sim
    from methanol_web_crawler_ray.pipelines.hostloop import (DictFetcher,
                                                             PageRow)

    cfg = parse_config(DEFAULT_CONF)
    cfg.crawlers["default"] = __import__("dataclasses").replace(
        cfg.crawlers["default"],
        filetypes=("html", "text"), depth_limit=3, robotstxt=False)
    f = DictFetcher({
        "http://a.x/": PageRow(url="http://a.x/",
                               body=b'<a href="n.html">n</a>'),
        "http://a.x/n.html": PageRow(url="http://a.x/n.html", body=b'done'),
    })
    r = sim.simulate_single_worker(cfg, f, ["http://a.x/"])
    assert [v[0] for v in r.visits] == ["http://a.x/", "http://a.x/n.html"]
