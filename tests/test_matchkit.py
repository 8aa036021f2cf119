"""ftindex decision-tree + extension/MIME matching (SURVEY.md §2 F1-F3)."""

import pytest

from methanol_web_crawler_ray.config import default_config
from methanol_web_crawler_ray.functions import urlkit
from methanol_web_crawler_ray.functions.matchkit import (
    DISCARD,
    POSSIBLE_MATCH,
    Crawler,
    FTIndex,
    Filetype,
)


@pytest.fixture()
def idx():
    cfg = default_config()
    return FTIndex(cfg.crawler(), cfg.filetypes)


def u(s):
    return urlkit.url_set(s)


def test_ext_match(idx):
    assert idx.match_by_url(u("http://h.ex/a.html")).name == "html"
    assert idx.match_by_url(u("http://h.ex/a.php")).name == "html"
    assert idx.match_by_url(u("http://h.ex/a.txt")).name == "text"
    assert idx.match_by_url(u("http://h.ex/a.css")).name == "css"
    assert idx.match_by_url(u("http://h.ex/a.png")).name == "image"


def test_ext_case_insensitive(idx):
    assert idx.match_by_url(u("http://h.ex/a.HTML")).name == "html"


def test_dir_url_binding(idx):
    # default.conf: dir_url = "@html"
    assert idx.match_by_url(u("http://h.ex/dir/")).name == "html"
    assert idx.match_by_url(u("http://h.ex/")).name == "html"


def test_extless_binding(idx):
    assert idx.match_by_url(u("http://h.ex/noext")).name == "html"


def test_dynamic_binding(idx):
    assert idx.match_by_url(u("http://h.ex/s?q=1")).name == "html"
    assert idx.match_by_url(u("http://h.ex/s.php?q=1")).name == "html"


def test_unknown_ext_discard(idx):
    # default.conf: unknown_url = "discard"
    assert idx.match_by_url(u("http://h.ex/a.zzz")) is DISCARD


def test_mime_match(idx):
    assert idx.match_by_mime("text/html").name == "html"
    assert idx.match_by_mime("text/html; charset=utf-8").name == "html"
    assert idx.match_by_mime("text/plain").name == "text"
    assert idx.match_by_mime("application/octet-stream") is None


def test_lookup_yields_possible_match():
    cfg = default_config(extless_url="lookup")
    idx = FTIndex(cfg.crawler(), cfg.filetypes)
    assert idx.match_by_url(u("http://h.ex/noext")) == POSSIBLE_MATCH


def test_umex_filetype_wins_for_extless():
    fts = {
        "html": Filetype(name="html", extensions=("html",), parser="html"),
        "search": Filetype(
            name="search", expr="PATH</search?*q=*>", parser="html"
        ),
    }
    cr = Crawler(
        name="c",
        filetypes=("html", "search"),
        dynamic_url="discard",
    )
    idx = FTIndex(cr, fts)
    # dynamic_url=discard → falls through to the UMEX scan (metha.c:1157-1159)
    assert idx.match_by_url(u("http://h.ex/search?q=x")).name == "search"
    assert idx.match_by_url(u("http://h.ex/other?q=x")) is DISCARD


def test_umex_gate_on_extension_match():
    # a filetype with both extensions and a UMEX must pass both (ftindex.c:123-127)
    fts = {
        "ht": Filetype(
            name="ht", extensions=("html",), expr="HOST<good.ex>", parser="html"
        ),
    }
    cr = Crawler(name="c", filetypes=("ht",), unknown_url="discard")
    idx = FTIndex(cr, fts)
    assert idx.match_by_url(u("http://good.ex/a.html")).name == "ht"
    assert idx.match_by_url(u("http://bad.ex/a.html")) is DISCARD


def test_image_filetype_has_no_parser(idx):
    ft = idx.match_by_url(u("http://h.ex/pic.jpg"))
    assert ft.name == "image" and not ft.has_parser
