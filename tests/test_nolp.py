"""nolp line-protocol machine (src/libmethaconfig/nolp.c parity):
command dispatch, the CONFIG <size> + raw-payload pattern the daemons
use (mn-slaved/master.c:85-95), expect_line, fragmentation across
feeds, mid-buffer state-switch reruns, and the unknown-command error."""

import pytest

from methanol_web_crawler_ray.functions.nolp import Nolp, NolpError


def _machine(log):
    def on_kill_all(no, args):
        log.append(("kill-all", args))

    def on_config(no, args):
        # CONFIG <size>\n<payload> (master.c:85-95)
        no.expect(int(args), lambda no2, payload:
                  log.append(("config", payload)))

    def on_status(no, args):
        no.expect_line(lambda no2, line: log.append(("status-line", line)))

    return Nolp({"KILL-ALL": on_kill_all, "CONFIG": on_config,
                 "STATUS": on_status})


def test_command_dispatch_and_args():
    log = []
    m = _machine(log)
    m.feed(b"KILL-ALL now please\n")
    assert log == [("kill-all", b"now please")]
    # no-argument command: the C's s=p quirk → empty args here
    m.feed(b"KILL-ALL\n")
    assert log[-1] == ("kill-all", b"")


def test_expect_payload_spanning_feeds():
    log = []
    m = _machine(log)
    m.feed(b"CONFIG 11\nhello")
    assert log == []  # payload incomplete: commands suspended
    m.feed(b" world")
    assert log == [("config", b"hello world")]
    # machine is back in CMD state
    m.feed(b"KILL-ALL\n")
    assert log[-1] == ("kill-all", b"")


def test_expect_surplus_reruns_as_commands():
    """nolp.c:106-112: bytes after the expected payload re-run through
    the CMD machine in the same feed."""
    log = []
    m = _machine(log)
    m.feed(b"CONFIG 3\nabcKILL-ALL\nCONFIG 2\nxy")
    assert log == [("config", b"abc"), ("kill-all", b""),
                   ("config", b"xy")]


def test_expect_line():
    log = []
    m = _machine(log)
    m.feed(b"STATUS\n42 idle\nKILL-ALL\n")
    assert log == [("status-line", b"42 idle"), ("kill-all", b"")]


def test_fragmented_command_line():
    log = []
    m = _machine(log)
    for chunk in (b"KILL", b"-ALL no", b"w\n"):
        m.feed(chunk)
    assert log == [("kill-all", b"now")]


def test_unknown_command_errors():
    m = _machine([])
    with pytest.raises(NolpError):
        m.feed(b"NOPE\n")


def test_binary_payload_with_newlines():
    log = []
    m = _machine(log)
    m.feed(b"CONFIG 6\na\nb\x00c\nKILL-ALL\n")
    assert log == [("config", b"a\nb\x00c\n"), ("kill-all", b"")]
