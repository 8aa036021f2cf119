"""nolp — the reference's line-oriented control-protocol parser
(src/libmethaconfig/nolp.c, 193 LoC; the mn-masterd / mn-slaved
daemons speak it).  The last named libmethaconfig component.

A nolp machine has three states (nolp.h:27-31):

  CMD    — newline-terminated commands ``NAME [args]\\n``; the first
           word selects a callback from the registered table
           (nolp.c:124-143); an unregistered command is a protocol
           error (nolp.c:133-135).
  EXPECT — a callback asked for exactly N raw bytes
           (``nolp_expect``, nolp.c:176-193): no commands dispatch
           until the payload is complete, then ``complete_cb`` runs
           and the machine returns to CMD; surplus bytes are kept and
           re-processed (nolp.c:95-119 rerun).
  LINE   — the next full line goes raw to the callback
           (``nolp_expect_line``, nolp.c:55-62), then back to CMD.

This port keeps the exact buffering/dispatch semantics but is
transport-free: callers ``feed()`` bytes from wherever (a socket, a
file, a test) instead of the C's ``recv`` loop.  Callbacks receive
``(machine, payload: bytes)`` and may switch state by calling
``expect`` / ``expect_line`` — mid-buffer switches re-run on the
remaining bytes exactly like the C.

Deviation, documented: when a command has no argument word the C
passes the callback a size of -1 and a pointer past the newline
(nolp.c:129-131 ``s = p`` quirk); callbacks there never read the
buffer in that case, so this port passes ``b""``.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

CMD, EXPECT, LINE = 0, 1, 2  # nolp.h:27-31


class NolpError(ValueError):
    """Protocol error — the C returns -1 and the daemon drops the peer."""


class Nolp:
    def __init__(self, commands: Dict[str, Callable]):
        self.commands = dict(commands)
        self.buf = b""
        self.state = CMD
        self.expect_size = 0
        self.next_cb: Optional[Callable] = None

    # -- state switches, callable from inside callbacks -----------------

    def expect(self, size: int, complete_cb: Callable) -> None:
        """nolp_expect (nolp.c:176-193): the next `size` raw bytes go to
        complete_cb, commands suspended until then."""
        self.next_cb = complete_cb
        self.expect_size = size
        self.state = EXPECT

    def expect_line(self, cb: Callable) -> None:
        """nolp_expect_line (nolp.c:55-62)."""
        self.next_cb = cb
        self.state = LINE

    # -- input -----------------------------------------------------------

    def feed(self, data: bytes) -> None:
        """nolp_recv's parse loop (nolp.c:72-166) over caller-supplied
        bytes.  Raises NolpError on an unknown command."""
        self.buf += data
        while True:
            if self.state == EXPECT:
                if len(self.buf) < self.expect_size:
                    return
                payload = self.buf[:self.expect_size]
                self.buf = self.buf[self.expect_size:]
                cb = self.next_cb
                self.state = CMD
                self.next_cb = None
                cb(self, payload)
                # leftover re-runs (nolp.c:106-112 rerun)
                if not self.buf:
                    return
                continue

            nl = self.buf.find(b"\n")
            if nl < 0:
                return
            line = self.buf[:nl]
            self.buf = self.buf[nl + 1:]
            if self.state == LINE:
                self.state = CMD
                cb = self.next_cb
                self.next_cb = None
                cb(self, line)
            else:
                sp = line.find(b" ")
                if sp < 0:
                    name, args = line, b""  # the C's s=p / size -1 quirk
                else:
                    name, args = line[:sp], line[sp + 1:]
                cb = self.commands.get(name.decode("latin-1"))
                if cb is None:
                    # command not found (nolp.c:133-135)
                    raise NolpError(
                        f"unknown command {name.decode('latin-1')!r}")
                cb(self, args)
            # a callback may have entered EXPECT/LINE; loop re-examines
            # the remaining buffer under the new state (nolp.c:155-159)
