"""mb-client ↔ mn-slaved session protocol over the nolp machine
(pipelines/session.py): AUTH gate + denial, CONFIG push and parse,
START → STATUS 1 → URL/TARGET/COUNT → STATUS 0 lifecycle against the
job board, nol_url / ft_<name> / nol_session_rel sink semantics, the
5 s poll-timer analog, and mid-session disconnect → interrupted."""

from _pagetools import html, write_pages

from methanol_web_crawler_ray.pipelines.hostloop import DictFetcher, url_hash
from methanol_web_crawler_ray.pipelines.session import (ClientEndpoint,
                                                        SlaveEndpoint,
                                                        filter_name, pump)
from methanol_web_crawler_ray.sources import pagegen
from methanol_web_crawler_ray.state.jobs import LEASE_INTERVAL, LocalJobBoard

CONF = """
crawler ["default"]
{
    dir_url     = "@html";
    extless_url = "@html";
    dynamic_url = "@html";
    unknown_url = "discard";
    filetypes   = {"html", "img"};
    robotstxt   = false;
    external    = false;
    depth_limit = 4;
}

filetype ["html"]
{
    extensions  = {"html"};
    mimetypes   = {"text/html"};
    parser      = "html, meta";
    attributes  = {"meta"};
}

filetype ["img"]
{
    extensions  = {"png"};
    mimetypes   = {"image/png"};
}
"""

def _fixture_pages():
    return write_pages("/tmp/mwc_test_session_pages", [
        {"url": "http://a.x/", "body": html(
            '<meta name="description" content="site a">'
            '<a href="/p1.html">p</a> <a href="/pic.png">i</a>')},
        {"url": "http://a.x/p1.html", "body": html("leaf a")},
        {"url": "http://a.x/pic.png", "body": b"PNG",
         "content_type": "image/png"},
        {"url": "http://b.x/", "body": html(
            '<a href="/q.html">q</a>')},
        {"url": "http://b.x/q.html", "body": html("leaf b")},
    ])


def _endpoints(board, token="T" * 40):
    d = _fixture_pages()
    fetch = DictFetcher(pagegen.load_fetch_dict(d))
    slave = SlaveEndpoint(board, CONF.encode(), tokens={token}, now=1000)
    client = ClientEndpoint(token, fetch)
    return client, slave


def test_full_session_lifecycle():
    """Two leased jobs crawled end-to-end through the wire protocol:
    sessions go done, nol_url records every visit, ft_ tables hold the
    deduped targets with attribute columns, session_rel links them."""
    board = LocalJobBoard([(1, "default", "http://a.x/", 0),
                           (2, "default", "http://b.x/", 0)])
    client, slave = _endpoints(board)
    pump(client, slave)

    # handshake happened: login + config parsed client-side
    assert client.state == "stopped"
    assert client.cfg is not None and "html" in client.cfg.filetypes
    # both jobs ran (STATUS 0 chains straight into the next START)
    assert [s[1] for s in client.sessions_run] == \
        ["http://a.x/", "http://b.x/"]
    sess = board.sessions_table()
    assert [s["state"] for s in sess] == ["done", "done"]
    # COUNT landed as count_<ft> session statistics columns
    assert sess[0]["count_html"] >= 2 and sess[0]["count_img"] == 1
    assert sess[1]["count_html"] >= 1 and sess[1]["count_img"] == 0
    # the board is drained: the slave is on its poll timer
    assert slave.waiting and slave.session_id is None

    # nol_url: every crawled URL, keyed by SHA1(url)
    urls = {r["url"] for r in slave.nol_url.values()}
    assert urls == {"http://a.x/", "http://a.x/p1.html",
                    "http://b.x/", "http://b.x/q.html"}
    # ft_img: the parserless target, empty attrs
    assert set(slave.ft_tables["img"]) == {url_hash("http://a.x/pic.png")}
    # ft_html: the meta-bearing page with its attribute column
    hrow = slave.ft_tables["html"][url_hash("http://a.x/")]
    assert hrow["meta"] == "description: site a\n"
    # session_rel links targets to the session that reported them
    assert (1, "img", url_hash("http://a.x/pic.png")) in slave.session_rel
    assert (1, "html", url_hash("http://a.x/")) in slave.session_rel


def test_denied_token():
    board = LocalJobBoard([(1, "default", "http://a.x/", 0)])
    d = _fixture_pages()
    fetch = DictFetcher(pagegen.load_fetch_dict(d))
    slave = SlaveEndpoint(board, CONF.encode(), tokens={"G" * 40}, now=0)
    client = ClientEndpoint("B" * 40, fetch)  # wrong token
    pump(client, slave)
    assert slave.closed and client.closed
    assert board.sessions_table() == []


def test_poll_timer_releases_future_job():
    """No eligible job at connect time → the slave waits (the 5 s timer
    analog); once the virtual clock passes the job's date, poll() sends
    the START and the session completes."""
    board = LocalJobBoard([(1, "default", "http://a.x/", 5000)])
    client, slave = _endpoints(board)
    pump(client, slave)
    assert slave.waiting and client.sessions_run == []

    slave.now = 5001
    assert slave.poll()  # timer_reached → get_and_send_url → START
    pump(client, slave)
    assert [s[1] for s in client.sessions_run] == ["http://a.x/"]
    assert board.sessions_table()[0]["state"] == "done"


def test_disconnect_marks_interrupted_and_releases():
    """A crash mid-session: interrupted state, and the job re-leases
    only after the 28-day lease expires (the reference's crude
    resume)."""
    board = LocalJobBoard([(1, "default", "http://a.x/", 0)])
    client, slave = _endpoints(board)
    # hand-shuttle: AUTH → (100 OK + CONFIG) → STATUS 0, then CRASH the
    # link before the START's crawl report can ever come back
    slave.feed(bytes(client.out))
    client.out.clear()
    client.feed(bytes(slave.out))  # login + config → STATUS 0 queued
    slave.out.clear()
    assert slave.session_id is None
    slave.feed(bytes(client.out))  # STATUS 0 → lease + START queued
    client.out.clear()
    assert slave.session_id is not None  # session opened by the lease
    slave.close()  # disconnect (client.c:192-201)
    assert board.sessions_table()[0]["state"] == "interrupted"
    # still leased: not eligible now, eligible after the lease expires
    assert board.lease("other", 1000) is None
    assert board.lease("other", 1000 + LEASE_INTERVAL).job_id == 1


def test_filter_name():
    assert filter_name("text/html") == "text_html"
    assert filter_name("ok_Name9") == "ok_Name9"
