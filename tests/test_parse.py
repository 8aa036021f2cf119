"""HTML/CSS/text extractor semantics (SURVEY.md §2 M5/M6/M7)."""

from methanol_web_crawler_ray.functions.htmlparse import (
    extract_css_urls,
    extract_html_links,
    extract_text_urls,
)


def links(html: str):
    return [r.decode() for r in extract_html_links(html.encode())]


def test_basic_hrefs_in_order():
    h = '<a href="a.html">x</a><a href="b.html">y</a>'
    assert links(h) == ["a.html", "b.html"]


def test_src_extracted():
    assert links('<img src="pic.png">') == ["pic.png"]


def test_unquoted_and_single_quoted():
    assert links("<a href=a.html>x</a>") == ["a.html"]
    assert links("<a href='a.html'>x</a>") == ["a.html"]


def test_anchor_refs_skipped():
    assert links('<a href="#top">x</a><a href="b.html">y</a>') == ["b.html"]


def test_first_href_per_tag_only():
    # html.c:335-337: returns after the first href/src in a tag
    assert links('<a href="a.html" src="b.png">') == ["a.html"]


def test_uppercase_tags_and_attrs():
    assert links('<A HREF="a.html">') == ["a.html"]


def test_script_content_not_extracted():
    h = '<script>var s = \'<a href="fake.html">\';</script> <a href="real.html">'
    assert links(h) == ["real.html"]


def test_tag_adjacent_to_container_close_skipped_quirk():
    # html.c:117+165: the outer loop increments past the char right after
    # '</script>', so an IMMEDIATELY adjacent '<' is missed — faithful
    h = '<script>x</script><a href="missed.html"> <a href="seen.html">'
    assert links(h) == ["seen.html"]


def test_textarea_content_not_extracted():
    h = '<textarea><a href="fake.html"></textarea> <a href="real.html">'
    assert links(h) == ["real.html"]


def test_style_content_goes_to_css():
    h = "<style>body { background: url(bg.png); }</style> <a href=\"a.html\">"
    assert links(h) == ["bg.png", "a.html"]


def test_attrs_without_quotes_mixed():
    assert links("<a class=x href=go.html id=y>") == ["go.html"]


def test_curie_expansion():
    h = (
        '<html xmlns:wiki="http://wiki.ex/w/">'
        '<a href="[wiki:Page]">x</a>'
    )
    assert links(h) == ["http://wiki.ex/w/Page"]


def test_other_attr_equals_values_skipped():
    assert links('<a title="no link here" href="yes.html">') == ["yes.html"]


def test_css_url_forms():
    css = (
        "a { background: url(plain.png); }\n"
        'b { background: url("dq.png"); }\n'
        "c { background: url('sq.png'); }\n"
    )
    assert [r.decode() for r in extract_css_urls(css.encode())] == [
        "plain.png",
        "dq.png",
        "sq.png",
    ]


def test_css_import_string_form():
    css = '@import url("x.css");'
    assert [r.decode() for r in extract_css_urls(css.encode())] == ["x.css"]


def test_text_urls():
    t = b"see http://h.ex/a/b. and ftp://f.ex/x, also nothing"
    out = [r.decode() for r in extract_text_urls(t)]
    assert out == ["http://h.ex/a/b.", "ftp://f.ex/x"]


def test_text_urls_charset():
    # chars allowed after '://': [A-Za-z0-9%?=&/.] (builtin.c:185-189)
    t = b"x http://h.ex/a?q=1&b=2%20 y"
    assert [r.decode() for r in extract_text_urls(t)] == ["http://h.ex/a?q=1&b=2%20"]


def test_malformed_unclosed_tag_tolerated():
    # fault tolerance: '<' inside a tag restarts the tag (html.c:140-141)
    h = '<a <b href="x.html">'
    assert links(h) == ["x.html"]


def test_meta_and_source_parsers():
    """scripts/misc.js analogs: meta() name/content pairs in document
    order; source() passes the body through as an attribute."""
    from methanol_web_crawler_ray.functions.parsechain import (
        AttrList, parse_chain_spec, run_chain)
    from methanol_web_crawler_ray.functions.urlkit import url_set

    body = (b'<html><head>'
            b'<meta name="description" content="a test page">'
            b"<META NAME='keywords' content=one,two>"
            b'<meta charset="utf-8">'
            b'</head><body><a href="x.html">x</a></body></html>')
    attrs = AttrList(("meta", "html"))
    refs = []
    run_chain(parse_chain_spec("html, meta"), body,
              url_set("http://m.x/"), "text/html", 200, attrs, refs.append)
    assert refs == [b"x.html"]  # link emission stays with the html parser
    assert attrs.values["meta"] == (b"description: a test page\n"
                                    b"keywords: one,two\n")

    attrs2 = AttrList(("source",))
    run_chain(parse_chain_spec("source"), body, url_set("http://m.x/"),
              "text/html", 200, attrs2, lambda r: None)
    assert attrs2.values["source"] == body
