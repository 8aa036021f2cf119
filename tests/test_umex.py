"""UMEX compile/match table (SURVEY.md §2 F4; umex.c:93-224,285-402)."""

from methanol_web_crawler_ray.functions import umex, urlkit


def m(expr, url):
    ops = umex.compile(expr)
    assert ops is not None, expr
    return umex.match(urlkit.url_set(url), ops)


def test_full_exact():
    assert m("FULL<http://h.ex/a>", "http://h.ex/a")
    assert not m("FULL<http://h.ex/a>", "http://h.ex/ab")


def test_exact_requires_whole_part():
    # STRMATCH requires consuming the part exactly (umex.c:148-152)
    assert m("PATH</a>", "http://h.ex/a")
    assert not m("PATH</a>", "http://h.ex/a/b")


def test_prefix():
    assert m("PATH</search*>", "http://h.ex/search?q=x")
    assert not m("PATH</search*>", "http://h.ex/other")


def test_suffix():
    assert m("PATH<*.html>", "http://h.ex/a/b.html")
    assert not m("PATH<*.html>", "http://h.ex/a/b.htm")


def test_find():
    assert m("PATH<*q=*>", "http://h.ex/s?a=1&q=2")
    assert not m("PATH<*q=*>", "http://h.ex/s?a=1")


def test_always():
    assert m("FULL<*>", "http://anything.ex/x")
    assert m("*", "http://anything.ex/x")  # default part FILE


def test_default_part_is_file():
    assert m("index.html", "http://h.ex/a/index.html")
    assert not m("index.html", "http://h.ex/index.html/sub")


def test_host_part():
    assert m("HOST<h.ex>", "http://h.ex/any")
    assert not m("HOST<h.ex>", "http://x.ex/any")
    assert m("HOST<*.ex>", "http://sub.h.ex/x")


def test_multi_part_all_must_match():
    assert m("HOST<h.ex>PATH</a*>", "http://h.ex/a/b")
    assert not m("HOST<h.ex>PATH</a*>", "http://h.ex/b")
    assert not m("HOST<x.ex>PATH</a*>", "http://h.ex/a/b")


def test_ordered_find_chain():
    e = "PATH</search?*q=*start=*>"  # SURVEY F4 example
    assert m(e, "http://h.ex/search?a=1&q=foo&start=10")
    assert not m(e, "http://h.ex/search?start=10&q=foo")  # order matters


def test_anychar_bracket():
    assert m("PATH</[?]b>", "http://h.ex/ab")
    assert not m("PATH</[?]b>", "http://h.ex/ab/c")


def test_case_sensitive_literal():
    assert not m("PATH</A>", "http://h.ex/a")


def test_separator_variants():
    assert m('PATH"/a"', "http://h.ex/a")
    assert m("PATH(/a)", "http://h.ex/a")
    assert m("PATH{/a}", "http://h.ex/a")


def test_strstart_robots_helper():
    ops = umex.strstart("/private/")
    assert umex.match(urlkit.url_set("http://h.ex/private/x"), ops)
    assert not umex.match(urlkit.url_set("http://h.ex/public/x"), ops)
    # empty Disallow prefix matches everything (module-doc quirk)
    assert umex.match(urlkit.url_set("http://h.ex/anything"), umex.strstart(""))


def test_unterminated_is_error():
    assert umex.compile("PATH</a") is None
