"""mn-masterd user/admin API (pipelines/master.py, user-conn.c:52-73):
AUTH gate + levels, ADD → job board → full client↔slave session →
SESSION-INFO / LIST-SESSIONS / LIST-INPUT read-back, USERADD/USERDEL/
PASSWD lifecycle, slave roster commands, KILL-ALL relay, SYSTEM-INFO."""

import re

from _pagetools import html, write_pages

from methanol_web_crawler_ray.pipelines.hostloop import DictFetcher
from methanol_web_crawler_ray.pipelines.master import (
    MSG100, MSG200, MSG202, MSG203, NOL_LEVEL_ADMIN, NOL_LEVEL_MANAGER,
    NOL_LEVEL_READ, NOL_LEVEL_WRITE, MasterUserEndpoint, SlaveInfo,
    UserTable, md5_pass)
from methanol_web_crawler_ray.pipelines.session import (ClientEndpoint,
                                                        SlaveEndpoint,
                                                        pump)
from methanol_web_crawler_ray.sources import pagegen
from methanol_web_crawler_ray.state.jobs import LocalJobBoard

CONF = """
crawler ["default"]
{
    dir_url     = "@html";
    extless_url = "@html";
    dynamic_url = "@html";
    unknown_url = "discard";
    filetypes   = {"html"};
    robotstxt   = false;
    external    = false;
    depth_limit = 4;
}

filetype ["html"]
{
    extensions  = {"html"};
    mimetypes   = {"text/html"};
    parser      = "html";
}
"""


def _users():
    return UserTable([
        ("root", "hunter2", "Root", NOL_LEVEL_ADMIN | NOL_LEVEL_MANAGER
         | NOL_LEVEL_WRITE | NOL_LEVEL_READ, "x"),
        ("alice", "pw", "Alice A", NOL_LEVEL_WRITE | NOL_LEVEL_READ, ""),
        ("bob", "pw", "Bob B", NOL_LEVEL_READ, ""),
    ])


def _login(users, board, name, pwd, **kw):
    ep = MasterUserEndpoint(users, board, **kw)
    ep.feed(f"AUTH user {name} {pwd}\n".encode())
    assert bytes(ep.out) == MSG100 and not ep.closed
    ep.out.clear()
    return ep


def _drain_xml(ep):
    """Parse one '100 <n>\\n<payload>' frame off the out buffer."""
    out = bytes(ep.out)
    m = re.match(rb"100 (\d+)\n", out)
    assert m, out
    n = int(m.group(1))
    payload = out[m.end():m.end() + n]
    assert len(payload) == n
    del ep.out[:m.end() + n]
    return payload.decode()


def test_auth_gate():
    users, board = _users(), LocalJobBoard([])
    ep = MasterUserEndpoint(users, board)
    ep.feed(b"AUTH user root wrong\n")
    assert bytes(ep.out) == MSG200 and ep.closed
    ep = MasterUserEndpoint(users, board)
    ep.feed(b"AUTH slave s1 pw\n")  # valid type, not served here
    assert bytes(ep.out) == MSG202 and ep.closed
    ep = MasterUserEndpoint(users, board)
    ep.feed(b"AUTH wizard a b\n")  # unknown type
    assert bytes(ep.out) == MSG200 and ep.closed
    # split delivery: the AUTH line may arrive byte-by-byte
    ep = MasterUserEndpoint(users, board)
    for b in b"AUTH user bob pw\nHELLO 0\n":
        ep.feed(bytes([b]))
    assert bytes(ep.out).startswith(MSG100)
    del ep.out[:len(MSG100)]
    assert f"<user-level>{NOL_LEVEL_READ}</user-level>" in _drain_xml(ep)


def test_add_lease_complete_roundtrip():
    """The verdict's headline flow: seed added through the USER API,
    crawled by the real client↔slave session protocol, observed back
    through SESSION-INFO / LIST-SESSIONS / LIST-INPUT."""
    users = _users()
    board = LocalJobBoard([])  # EMPTY: every job arrives via ADD
    alice = _login(users, board, "alice", "pw", now=500)

    alice.feed(b"LOG whatever\n")      # reference no-op: no reply
    assert not alice.out
    alice.feed(b"ADD default http://a.x/\n")
    assert bytes(alice.out) == MSG100
    alice.out.clear()
    assert board.added_table(2) == [(1, "default", "http://a.x/",
                                     500, 2)]

    # read-denied: bob (READ) can't ADD
    bob = _login(users, board, "bob", "pw")
    bob.feed(b"ADD default http://evil.x/\n")
    assert bytes(bob.out) == MSG200 and len(board.jobs) == 1

    # now the session protocol picks the job up and runs it
    d = write_pages("/tmp/mwc_test_master_pages", [
        {"url": "http://a.x/", "body": html('<a href="/p.html">p</a>')},
        {"url": "http://a.x/p.html", "body": html("leaf")},
    ])
    fetch = DictFetcher(pagegen.load_fetch_dict(d))
    slave = SlaveEndpoint(board, CONF.encode(), tokens={"T" * 40},
                          now=1000)
    client = ClientEndpoint("T" * 40, fetch)
    pump(client, slave)
    sess = board.sessions_table()
    assert len(sess) == 1 and sess[0]["state"] == "done"

    # SESSION-INFO reflects the crawl (count_html as num-html)
    alice.feed(b"SESSION-INFO 1\n")
    xml = _drain_xml(alice)
    assert '<session-info for="1">' in xml
    assert "<num-html>2</num-html>" in xml
    assert "<crawler>default</crawler>" in xml
    assert "<input>http://a.x/</input>" in xml
    assert "<state>done</state>" in xml
    alice.feed(b"SESSION-INFO 99\n")
    assert bytes(alice.out) == MSG203
    alice.out.clear()

    # SESSION-REPORT: 203 until a report lands, then the blob
    alice.feed(b"SESSION-REPORT 1\n")
    assert bytes(alice.out) == MSG203
    alice.out.clear()
    board.set_report(1, "2 pages")
    alice.feed(b"SESSION-REPORT 1\n")
    assert bytes(alice.out) == b"100 7\n2 pages"
    alice.out.clear()

    alice.feed(b"LIST-SESSIONS 0 10\n")
    xml = _drain_xml(alice)
    assert '<session id="1">' in xml and "<client>" in xml

    # LIST-INPUT is scoped to the calling user
    alice.feed(b"LIST-INPUT\n")
    xml = _drain_xml(alice)
    assert '<input id="1">' in xml
    assert "<latest-session>1</latest-session>" in xml
    bob.out.clear()
    bob.feed(b"LIST-INPUT\n")
    assert "<input-list></input-list>" in _drain_xml(bob)


def test_user_lifecycle():
    users, board = _users(), LocalJobBoard([])
    root = _login(users, board, "root", "hunter2")

    # USERADD: manager-gated sized buffer
    payload = b"carol\nsecret\nCarol C\n2\nnotes here"
    root.feed(b"USERADD %d\n" % len(payload) + payload)
    assert bytes(root.out) == MSG100
    root.out.clear()
    assert users.check_login("carol", "secret") == 4
    assert users.rows[3]["pass"] == md5_pass("secret")
    assert users.rows[3]["level"] == NOL_LEVEL_WRITE

    # the new user can log in and ADD
    carol = _login(users, board, "carol", "secret")
    carol.feed(b"ADD default http://c.x/\n")
    assert bytes(carol.out) == MSG100

    # non-manager USERADD answers 200 (and expects NO buffer, like the C)
    alice = _login(users, board, "alice", "pw")
    alice.feed(b"USERADD 5\n")
    assert bytes(alice.out) == MSG200

    # PASSWD own / PASSWD-ID / USERDEL
    carol.out.clear()
    carol.feed(b"PASSWD newpw\n")
    assert bytes(carol.out) == MSG100
    assert users.check_login("carol", "newpw") == 4
    carol.out.clear()
    carol.feed(b"PASSWD newpw\n")  # unchanged → affected_rows 0 → 203
    assert bytes(carol.out) == MSG203
    root.feed(b"PASSWD-ID 4 rootset\n")
    assert bytes(root.out) == MSG100
    root.out.clear()
    assert users.check_login("carol", "rootset") == 4
    root.feed(b"USERDEL 4\n")
    assert bytes(root.out) == MSG100
    root.out.clear()
    root.feed(b"USERDEL 4\n")  # already deleted → 203
    assert bytes(root.out) == MSG203
    root.out.clear()

    # LIST-USERS: manager view, id DESC, deleted hidden
    root.feed(b"LIST-USERS 0 100\n")
    xml = _drain_xml(root)
    assert "carol" not in xml
    assert xml.index('id="3"') < xml.index('id="1"')
    # HELLO shows the composite level
    root.feed(b"HELLO 0\n")
    lvl = NOL_LEVEL_ADMIN | NOL_LEVEL_MANAGER | NOL_LEVEL_WRITE | \
        NOL_LEVEL_READ
    assert f"<user-level>{lvl}</user-level>" in _drain_xml(root)


def test_slave_roster_and_system_info():
    users, board = _users(), LocalJobBoard([])
    s1 = SlaveInfo(7, "s-alpha", "10.0.0.7", 5508)
    s1.add_client("C" * 40, user="alice", status=1, addr="10.0.0.99",
                  session_id=3)
    s2 = SlaveInfo(9, "s-beta", ready=False)
    root = _login(users, board, "root", "hunter2",
                  slaves=[s1, s2], now=360, start_time=60,
                  address="127.0.0.1:5505", config_bytes=b"cfg=1\n")

    root.feed(b"LIST-SLAVES 0\n")
    xml = _drain_xml(root)
    assert ('<slave id="7"><user>s-alpha</user>'
            "<num-clients>1</num-clients>"
            "<address>10.0.0.7:5508</address></slave>") in xml
    assert "<address>0:0</address>" in xml  # not-ready slave

    root.feed(b"SLAVE-INFO 7\n")
    assert '<slave-info for="s-alpha-7">' in _drain_xml(root)
    root.feed(b"SLAVE-INFO 8\n")
    assert bytes(root.out) == MSG203
    root.out.clear()

    root.feed(b"LIST-CLIENTS 7\n")
    xml = _drain_xml(root)
    assert f'<client id="{"C" * 40}">' in xml

    root.feed(b"CLIENT-INFO " + b"C" * 40 + b"\n")
    xml = _drain_xml(root)
    assert "<slave>s-alpha-7</slave>" in xml
    assert "<session>3</session>" in xml
    root.feed(b"CLIENT-INFO " + b"X" * 40 + b"\n")
    assert bytes(root.out) == MSG203
    root.out.clear()

    root.feed(b"SHOW-CONFIG 0\n")
    assert bytes(root.out) == b"100 6\ncfg=1\n"
    root.out.clear()
    alice = _login(users, board, "alice", "pw", slaves=[s1])
    alice.feed(b"SHOW-CONFIG 0\n")
    assert bytes(alice.out) == MSG200  # admin-gated

    root.feed(b"KILL-ALL 7\n")
    assert bytes(s1.out) == b"KILL-ALL\n" and not root.out
    root.feed(b"KILL-ALL 8\n")
    assert bytes(root.out) == MSG203
    root.out.clear()

    root.feed(b"SYSTEM-INFO 0\n")
    xml = _drain_xml(root)
    assert "<uptime>300</uptime>" in xml
    assert "<num-slaves>2</num-slaves>" in xml
    assert "<num-users>3</num-users>" in xml


def test_endpoint_random_bytes_never_hang_or_corrupt():
    """Fuzz: arbitrary byte soup into an authed endpoint either parses
    or raises NolpError (the C drops the peer) — never a different
    exception, never an unbounded buffer."""
    import random

    from methanol_web_crawler_ray.functions.nolp import NolpError

    rng = random.Random(1234)
    for trial in range(200):
        users, board = _users(), LocalJobBoard([])
        ep = _login(users, board, "root", "hunter2")
        n = rng.randrange(1, 60)
        blob = bytes(rng.randrange(256) for _ in range(n))
        try:
            ep.feed(blob)
        except NolpError:
            pass
        assert len(ep.no.buf) <= len(blob)


def test_endpoint_command_split_across_feeds():
    """A command line delivered one byte at a time behaves exactly like
    one feed (the nolp machine's whole job)."""
    users, board = _users(), LocalJobBoard([])
    ep = _login(users, board, "alice", "pw")
    for b in b"ADD default http://x.y/a b c\n":
        ep.feed(bytes([b]))
    assert bytes(ep.out) == MSG100
    assert board.added_table(2)[0][2] == "http://x.y/a b c"


def test_quote_credentials_lockout_quirk():
    """Pin the preserved C quirk: strrmsq runs on the LOGIN input only
    (the INSERT stores quotes verbatim), so quote-containing
    credentials can never authenticate — same as the reference."""
    users = UserTable([("o'brien", "pa'ss", "O B", NOL_LEVEL_READ, "")])
    assert users.check_login("o'brien", "pa'ss") == -1
    assert users.check_login("o_brien", "pa_ss") == -1  # md5 of pa_ss
    # a quote-free user is untouched by the guard
    users.add("plain", "pw", "P", NOL_LEVEL_READ, "")
    assert users.check_login("plain", "pw") == 2
