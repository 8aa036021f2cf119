"""entityconv / utf8conv / xmlconv semantics (SURVEY.md §2 M9/M10/M11)."""

from methanol_web_crawler_ray.functions.textconv import (
    entityconv,
    extract_text,
    utf8conv,
)
from methanol_web_crawler_ray.functions.xmlconv import xmlconv


def test_entity_named():
    assert entityconv(b"a&auml;b") == "aäb".encode()
    assert entityconv(b"&Aacute;") == "Á".encode()


def test_entity_numeric_untouched():
    # entityconv.c:419-421: numeric entities left as-is
    assert entityconv(b"a&#228;b") == b"a&#228;b"


def test_entity_lt_gt_not_in_table():
    assert entityconv(b"a&lt;b&gt;c") == b"a&lt;b&gt;c"


def test_entity_amp_converted():
    assert entityconv(b"x&amp;y") == b"x&y"


def test_entity_needs_semicolon():
    assert entityconv(b"a&auml b") == b"a&auml b"


def test_entity_case_sensitive():
    assert entityconv(b"&AUML;") == b"&AUML;"


def test_entity_multibyte():
    assert entityconv(b"&alefsym;") == "ℵ".encode()


def test_utf8conv_header_charset():
    body = "höj".encode("iso-8859-1")
    assert utf8conv(body, "text/html; charset=ISO-8859-1") == "höj".encode()


def test_utf8conv_meta_charset():
    # the http-equiv form: charset= found inside the content attr value
    body = (
        '<meta http-equiv="Content-Type" content="text/html; '
        'charset=ISO-8859-1">fåre'
    ).encode("iso-8859-1")
    out = utf8conv(body, "text/html")
    assert "fåre".encode() in out


def test_utf8conv_meta_quoted_charset_quirk():
    # utf8conv.c:76-83: charset= followed by a quote scans an EMPTY name →
    # no conversion; faithful to the reference
    body = '<meta charset="ISO-8859-1">fåre'.encode("iso-8859-1")
    assert utf8conv(body, "text/html") == body


def test_utf8conv_already_utf8_unchanged():
    body = "naïve".encode()
    assert utf8conv(body, "text/html; charset=UTF-8") == body
    assert utf8conv(b"plain ascii", None) == b"plain ascii"


def test_utf8conv_unknown_codec_unchanged():
    assert utf8conv(b"x", "text/html; charset=NO-SUCH-CS") == b"x"


def test_extract_text_chain():
    body = "pre &auml; <b>x</b> &#65;".encode("iso-8859-1")
    out = extract_text(body, "text/html; charset=ISO-8859-1")
    assert out == "pre ä <b>x</b> &#65;".encode()


def x(html: str) -> str:
    return xmlconv(html.encode()).decode()


def test_xmlconv_lowercase_and_close():
    assert x("<HTML><Body>hi</Body></HTML>") == "<html><body>hi</body></html>"


def test_xmlconv_void_elements_selfclose():
    assert x("<html><br><hr></html>") == "<html><br/><hr/></html>"


def test_xmlconv_missing_html_root():
    assert x("<body>t</body>") == "<html><body>t</body></html>"


def test_xmlconv_doctype_dropped():
    assert x("<!DOCTYPE html><html>x</html>") == "<html>x</html>"


def test_xmlconv_comment_dropped():
    assert x("<html><!-- c --->x</html>") == "<html>x</html>"


def test_xmlconv_pi_dropped():
    assert x("<html><?php echo 1 ?>x</html>") == "<html>x</html>"


def test_xmlconv_amp_in_text():
    assert x("<html>a&b</html>") == "<html>a&amp;b</html>"


def test_xmlconv_attrs_requoted_lowered():
    assert (
        x('<html><A HREF=x.html Title="a&b">t</A></html>')
        == '<html><a href="x.html" title="a&amp;b">t</a></html>'
    )


def test_xmlconv_valueless_attr_dropped():
    assert x("<html><input disabled></html>") == "<html><input/></html>"


def test_xmlconv_xmlns_dropped():
    assert (
        x('<html xmlns="http://www.w3.org/1999/xhtml">x</html>')
        == "<html>x</html>"
    )


def test_xmlconv_script_encoded():
    out = x("<html><script>if (a<b && c>d) e();</script></html>")
    assert "&lt;" in out and "&amp;&amp;" in out
    assert out.startswith("<html><script>")
    assert out.endswith("</script></html>")


def test_xmlconv_mismatched_close_unwinds():
    assert x("<html><b><i>t</b></html>") == "<html><b><i>t</i></b></html>"


def test_xmlconv_unopened_close_dropped():
    assert x("<html><b>t</i></b></html>") == "<html><b>t</b></html>"


def test_xmlconv_unclosed_flushed_at_end():
    assert x("<html><div><p>t") == "<html><div><p>t</p></div></html>"


def test_xmlconv_leading_text_dropped():
    # html.c:424-436: text before the first element is dropped
    assert x("leading<html>x</html>") == "<html>x</html>"
