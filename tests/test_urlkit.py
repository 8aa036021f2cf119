"""Canonicalizer golden pairs (SURVEY.md §5.1: M1/M2/M3/M4 vectors)."""

from methanol_web_crawler_ray.functions import urlkit


def canon(raw):
    u = urlkit.url_set(raw)
    return None if u is None else u.s


def test_basic_set():
    assert canon("http://example.com/a/b.html") == "http://example.com/a/b.html"


def test_bare_host_gets_slash():
    assert canon("http://example.com") == "http://example.com/"
    u = urlkit.url_set("http://example.com")
    assert u.is_dir


def test_no_protocol_rejected():
    assert canon("example.com/x") is None
    assert canon("//example.com/x") is None


def test_unknown_protocol_rejected():
    assert canon("mailto:someone@example.com") is None
    assert canon("javascript:void(0)") is None


def test_protocol_first_char_case_sensitive():
    # url.c:186: first char compared case-SENSITIVELY
    assert canon("Http://example.com/") is None
    assert canon("hTTP://example.com/") == "hTTP://example.com/"


def test_bad_host_chars_rejected():
    assert canon("http://exa mple.com/") is None
    assert canon("http://exam_ple.com/") is None


def test_host_allows_port_and_dash():
    assert canon("http://my-host.example:8080/x") == "http://my-host.example:8080/x"


def test_fragment_cut():
    assert canon("http://h.ex/a#frag") == "http://h.ex/a"
    assert canon("http://h.ex/a?q=1#frag") == "http://h.ex/a?q=1"


def test_query_rules():
    # space→'+', '&amp;'→'&', high bytes pass through (url.c:349-366)
    assert canon("http://h.ex/s?a=1&amp;b=2") == "http://h.ex/s?a=1&b=2"
    assert canon("http://h.ex/s?q=a b") == "http://h.ex/s?q=a+b"
    u = urlkit.url_set("http://h.ex/s?q=1")
    assert u.is_dynamic


def test_percent_encoding_low_bytes():
    assert canon("http://h.ex/a b") == "http://h.ex/a%20b"
    assert canon("http://h.ex/a\tb") == "http://h.ex/a%09b"


def test_percent_encoding_high_bytes_signed_quirk():
    # url.c:341-344 signed-char arithmetic: 0xC3 0xA4 → "%,3%*4"
    assert canon("http://h.ex/ä") == "http://h.ex/%,3%*4"


def test_slash_collapse():
    assert canon("http://h.ex//a///b") == "http://h.ex/a/b"


def test_dot_segments():
    assert canon("http://h.ex/a/./b") == "http://h.ex/a/b"
    assert canon("http://h.ex/a/b/../c") == "http://h.ex/a/c"
    assert canon("http://h.ex/a/b/..") == "http://h.ex/a"
    # trailing '/.' quirk (url.c:392-395): '/a/.' → '/a.'
    assert canon("http://h.ex/a/.") == "http://h.ex/a."


def test_dotdot_cannot_escape_host():
    assert canon("http://h.ex/../../x") == "http://h.ex/x"


def test_www_flag():
    assert urlkit.url_set("http://www.h.ex/").www_prefix
    assert not urlkit.url_set("http://h.ex/").www_prefix
    assert not urlkit.url_set("http://www./").www_prefix  # host_l==4, not >4


def test_offsets_and_ext():
    u = urlkit.url_set("http://h.ex/dir/file.tar.gz")
    assert u.host == "h.ex"
    assert u.file == "file.tar.gz"
    assert u.ext == "gz"
    assert u.path == "/dir/file.tar.gz"
    u2 = urlkit.url_set("http://h.ex/dir/")
    assert u2.is_dir and u2.ext == ""


def test_ext_stops_at_query():
    u = urlkit.url_set("http://h.ex/x.php?a=b.c")
    assert u.ext == "php"


def test_seen_key_case_insensitive_protocol_excluded():
    u = urlkit.url_set("https://WWW.Ex.COM/Path/X")
    assert u.seen_key == "www.ex.com/path/x"
    assert u.host_norm == "ex.com"


def test_combine_relative():
    base = urlkit.url_set("http://g.ex/abc/")
    assert urlkit.url_combine(base, "xyz.htm").s == "http://g.ex/abc/xyz.htm"
    assert urlkit.url_combine(base, "/xyz.htm").s == "http://g.ex/xyz.htm"


def test_combine_clears_dynamic():
    base = urlkit.url_set("http://g.ex/a?x=1")
    out = urlkit.url_combine(base, "next.html")
    assert not out.is_dynamic
    out2 = urlkit.url_combine(base, "next.php?y=2")
    assert out2.is_dynamic


def test_combine_dotdot():
    base = urlkit.url_set("http://g.ex/a/b/c.html")
    assert urlkit.url_combine(base, "../up.html").s == "http://g.ex/a/up.html"


def test_resolve_dispatch():
    base = urlkit.url_set("http://h.ex/a/")
    assert urlkit.resolve(base, "x.html").s == "http://h.ex/a/x.html"
    assert urlkit.resolve(base, "/x.html").s == "http://h.ex/x.html"
    ext = urlkit.resolve(base, "http://other.ex/y")
    assert ext.is_external
    same = urlkit.resolve(base, "http://h.ex/y")
    assert not same.is_external
    www = urlkit.resolve(base, "http://www.h.ex/y")
    assert not www.is_external  # www.X ≡ X (url.c:96-114)
    assert urlkit.resolve(base, "mailto:x@y.z") is None


def test_resolve_protocol_mismatch_is_external():
    base = urlkit.url_set("http://h.ex/a/")
    assert urlkit.resolve(base, "https://h.ex/y").is_external


def test_strtourl():
    assert urlkit.strtourl("www.g.com/x") == "http://www.g.com/x"
    assert urlkit.strtourl("ftp.g.com") == "ftp://ftp.g.com"
    assert urlkit.strtourl("/tmp/x") == "file:///tmp/x"
    assert urlkit.strtourl("./x") == "file://./x"
    assert urlkit.strtourl("http://x.com/") == "http://x.com/"


def test_idempotence():
    # canon(canon(x)) == canon(x) for canonical outputs without quirky bytes
    for raw in [
        "http://h.ex/a/b/../c/./d.html?x=1&amp;y=2#f",
        "http://h.ex//x///y/",
        "http://www.h.ex",
        "http://h.ex/a b/c",
    ]:
        once = canon(raw)
        assert canon(once) == once


def test_max_len():
    assert urlkit.url_set("http://h.ex/" + "a" * 70000) is None
