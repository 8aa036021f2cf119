"""mn-masterd's USER connection surface — the admin/user API every
deployment drives the master with (user-conn.c:52-73's command table),
re-expressed transport-free over the same nolp machine as the
client↔slave session protocol (``pipelines/session.py``).

Protocol, verbatim from the reference:

  pre-auth  ``AUTH user <name> <password>\\n`` (auth.c:160-222) →
            ``100 OK\\n`` | ``200 Denied\\n`` (bad login drops the
            conn); non-``user`` types on this endpoint answer
            ``202 Login type unavailable\\n``
  then the nolp command table (user-conn.c:52-73):
    HELLO            → ``100 <sz>\\n<hello>…`` (num-messages, user-level)
    LOG              → no reply at all (user_log_command:270-273 is
                       an empty body in the reference — preserved)
    ADD <crawler> <input>       (level ≥ WRITE, else 200) → nol_added
                       insert, date=NOW() → ``100 OK\\n``
    USERADD <bufsz>\\n<user>\\n<pass>\\n<fullname>\\n<level>\\n<extra>
                       (level ≥ MANAGER) → nol_user insert, MD5 pass
    USERDEL <id>     (MANAGER) → soft delete (deleted=1) → 100|203
    PASSWD <new>     → own password → 100|203
    PASSWD-ID <id> <new> (MANAGER) → 100|203|201
    SESSION-INFO <id>    → ``<session-info for="id">`` with num-<ft>
                       fields from the session's count_* columns
    SESSION-REPORT <id>  → the session's report blob | 203
    LIST-SESSIONS <start> <count> → ``<session-list>``, latest DESC,
                       count capped at 100
    LIST-USERS <start> <count> (MANAGER) → ``<user-list>``, id DESC
    LIST-INPUT       → the calling user's nol_added rows ⟕ sessions
    LIST-SLAVES 0    → ``<slave-list>`` (slave-conn.c:100-135 XML)
    LIST-CLIENTS <slave-id> → the slave's client-list XML | 203
    SLAVE-INFO <id>  → ``<slave-info for="name-id">`` | 203
    CLIENT-INFO <token40> (level ≥ READ else 203; size≠40 drops) →
                       ``<client id="…">`` | 203
    SHOW-CONFIG      (level ≥ ADMIN else 200) → master config bytes
    KILL-ALL <slave-id>  → relays ``KILL-ALL\\n`` to that slave
    SYSTEM-INFO      → uptime/address/num-slaves/num-sessions/num-users

MySQL becomes the in-memory :class:`UserTable` + the job board
(``state/jobs.LocalJobBoard`` = nol_added/nol_session, exactly as the
session protocol already uses it); reply codes and XML shapes follow
user-conn.c byte-for-byte.  Deviations, documented: SESSION-INFO emits
its num-* fields in sorted-key order (the C's order is the nol_session
DDL column order, which MySQL owns, not the code), and timestamps are
the board's integer virtual-clock seconds rather than DATETIME
strings.
"""

from __future__ import annotations

import hashlib
from typing import Dict, List, Optional, Tuple

from ..functions.nolp import Nolp, NolpError

# conn.h:29-36
NOL_LEVEL_NONE = 0
NOL_LEVEL_READ = 1
NOL_LEVEL_WRITE = 2
NOL_LEVEL_MANAGER = 1024
NOL_LEVEL_SIGNALS = 2048
NOL_LEVEL_ADMIN = 8192

MSG100 = b"100 OK\n"
MSG200 = b"200 Denied\n"
MSG201 = b"201 Bad Request\n"
MSG202 = b"202 Login type unavailable\n"
MSG203 = b"203 Not found\n"
MSG300 = b"300 Internal Error\n"

AUTH_TYPES = ("client", "slave", "user")  # auth.c:37-41


def strrmsq(s: str) -> str:
    """auth.c:379-386: every single-quote becomes '_' (the masterd's
    SQL-injection guard; preserved so stored values match)."""
    return s.replace("'", "_")


def md5_pass(pwd: str) -> str:
    """nol_user.pass = MD5('<pwd>') (auth.c:259, user-conn.c:380)."""
    return hashlib.md5(pwd.encode("utf-8", "surrogateescape")).hexdigest()


class UserTable:
    """nol_user: (id, user, pass=MD5, fullname, level, extra,
    deleted).  Soft delete only (user-conn.c USERDEL sets deleted=1)."""

    def __init__(self, rows: Optional[List[Tuple[str, str, str, int,
                                                 str]]] = None):
        """rows: (user, password-plaintext, fullname, level, extra)."""
        self.rows: List[Dict] = []
        for r in rows or []:
            self.add(*r)

    def add(self, user: str, password: str, fullname: str, level: int,
            extra: str) -> int:
        uid = len(self.rows) + 1
        self.rows.append({
            "id": uid, "user": user, "pass": md5_pass(password),
            "fullname": fullname, "level": int(level), "extra": extra,
            "deleted": 0,
        })
        return uid

    def _by_id(self, uid: int) -> Optional[Dict]:
        return self.rows[uid - 1] if 1 <= uid <= len(self.rows) else None

    def check_login(self, user: str, pwd: str) -> int:
        """auth.c:248-273 check_user_login: id on success else -1.  Two
        reference quirks preserved: (1) the login query does NOT filter
        deleted=1 — a deleted user can still log in; (2) strrmsq runs
        on the LOGIN input only, while USERADD's escaped INSERT stores
        quotes verbatim — so a quote-containing username or password
        can never authenticate in the C either (the escaped query
        literal o_brien never equals the stored o'brien); pinned by
        test."""
        user, pwd = strrmsq(user), strrmsq(pwd)
        for r in self.rows:
            if r["user"] == user and r["pass"] == md5_pass(pwd):
                return r["id"]
        return -1

    def level_of(self, uid: int) -> int:
        r = self._by_id(uid)
        return r["level"] if r else NOL_LEVEL_NONE

    def delete(self, uid: int) -> bool:
        """UPDATE ... SET deleted=1: True iff a row changed (the C
        checks mysql_affected_rows — deleting twice is 203)."""
        r = self._by_id(uid)
        if r is None or r["deleted"]:
            return False
        r["deleted"] = 1
        return True

    def passwd(self, uid: int, new: str) -> bool:
        """UPDATE pass=MD5(new): True iff the row exists AND the value
        changed (MySQL affected_rows counts CHANGED rows — setting the
        same password twice answers 203; quirk preserved)."""
        r = self._by_id(uid)
        if r is None:
            return False
        h = md5_pass(new)
        if r["pass"] == h:
            return False
        r["pass"] = h
        return True

    def listing(self, start: int, limit: int) -> List[Dict]:
        """LIST-USERS rows: deleted=0, id DESC, LIMIT start,limit."""
        live = [r for r in sorted(self.rows, key=lambda r: -r["id"])
                if not r["deleted"]]
        return live[start:start + limit]


class SlaveInfo:
    """One connected mn-slaved as the master sees it (slave_conn_t):
    id, name, listen address, client roster, and an ``out`` buffer
    standing in for its socket (KILL-ALL relays land there)."""

    def __init__(self, sid: int, name: str, addr: str = "0", port: int = 0,
                 ready: bool = True):
        self.id = int(sid)
        self.name = name
        self.addr = addr
        self.port = int(port)
        self.ready = bool(ready)
        self.clients: List[Dict] = []  # token/user/status/addr/session_id
        self.out = bytearray()

    def add_client(self, token: str, user: str = "", status: int = 0,
                   addr: str = "0.0.0.0", session_id: int = 0) -> None:
        self.clients.append({"token": token, "user": user,
                             "status": int(status), "addr": addr,
                             "session_id": int(session_id)})

    def clients_xml(self) -> str:
        """The per-slave client list XML the master caches
        (sl->xml.clients; shape from CLIENT-INFO's fields)."""
        return "".join(
            f"<client id=\"{c['token']}\">"
            f"<user>{c['user']}</user>"
            f"<status>{c['status'] & 1}</status>"
            f"<address>{c['addr']}</address>"
            f"<session>{c['session_id']}</session>"
            "</client>"
            for c in self.clients)


class MasterUserEndpoint:
    """One masterd user connection: AUTH gate then the user command
    table, bound to a :class:`UserTable`, a job board
    (``state/jobs.LocalJobBoard`` duck type) and a slave roster.

    Transport-free like the session endpoints: ``feed(bytes)`` in, an
    ``out`` buffer to drain."""

    def __init__(self, users: UserTable, board, slaves:
                 Optional[List[SlaveInfo]] = None, now: int = 0,
                 address: str = "127.0.0.1:5505",
                 config_bytes: bytes = b"", start_time: int = 0):
        self.users = users
        self.board = board
        self.slaves = list(slaves or [])
        self.now = int(now)
        self.address = address
        self.config = config_bytes
        self.start_time = int(start_time)
        self.out = bytearray()
        self.closed = False
        self.authenticated = False
        self.user_id = -1
        self.level = NOL_LEVEL_NONE
        self.no = Nolp({
            "LIST-SLAVES": self._on_list_slaves,
            "LIST-CLIENTS": self._on_list_clients,
            "LIST-USERS": self._on_list_users,
            "SLAVE-INFO": self._on_slave_info,
            "CLIENT-INFO": self._on_client_info,
            "SHOW-CONFIG": self._on_show_config,
            "LOG": self._on_log,
            "ADD": self._on_add,
            "USERADD": self._on_useradd,
            "USERDEL": self._on_userdel,
            "PASSWD": self._on_passwd,
            "PASSWD-ID": self._on_passwd_id,
            "SESSION-INFO": self._on_session_info,
            "SESSION-REPORT": self._on_session_report,
            "LIST-SESSIONS": self._on_list_sessions,
            "LIST-INPUT": self._on_list_input,
            "KILL-ALL": self._on_kill_all,
            "SYSTEM-INFO": self._on_system_info,
            "HELLO": self._on_hello,
        })
        self._authbuf = b""

    # -- plumbing -----------------------------------------------------

    def send(self, data: bytes) -> None:
        self.out += data

    def feed(self, data: bytes) -> None:
        if self.closed:
            return
        if not self.authenticated:
            self._authbuf += data
            nl = self._authbuf.find(b"\n")
            if nl < 0:
                return
            line, rest = self._authbuf[:nl], self._authbuf[nl + 1:]
            self._authbuf = b""
            self._do_auth(line.decode("latin-1").rstrip("\r"))
            if self.closed:
                return
            data = rest
        if data:
            self.no.feed(data)

    def _do_auth(self, line: str) -> None:
        """auth.c:160-222: 'AUTH <type> <user> <pwd>'."""
        parts = line.split(" ")
        if len(parts) < 4 or parts[0] != "AUTH":
            self.send(MSG200)
            self.closed = True
            return
        typ, user, pwd = parts[1], parts[2], " ".join(parts[3:])
        if typ not in AUTH_TYPES:
            self.send(MSG200)
            self.closed = True
            return
        if typ != "user":
            # the real master upgrades these to slave/client handlers;
            # this endpoint only speaks the user table
            self.send(MSG202)
            self.closed = True
            return
        uid = self.users.check_login(user, pwd)
        if uid < 0:
            self.send(MSG200)
            self.closed = True
            return
        self.user_id = uid
        self.level = self.users.level_of(uid)  # upgrade_conn:464-...
        self.authenticated = True
        self.send(MSG100)

    def _xml(self, body: str) -> None:
        """'100 <sz>\\n' + payload (the buffered-reply convention every
        XML-returning command uses)."""
        raw = body.encode("utf-8", "surrogateescape")
        self.send(b"100 %d\n" % len(raw))
        self.send(raw)

    # -- commands -----------------------------------------------------

    def _on_hello(self, no, args: bytes) -> None:
        self._xml(f"<hello><num-messages>0</num-messages>"
                  f"<user-level>{self.level}</user-level></hello>")

    def _on_log(self, no, args: bytes) -> None:
        """user_log_command (user-conn.c:270-273) is an EMPTY body in
        the reference — accepted, no reply.  Preserved exactly."""

    def _on_add(self, no, args: bytes) -> None:
        if self.level < NOL_LEVEL_WRITE:
            self.send(MSG200)
            return
        s = args.decode("utf-8", "surrogateescape")
        parts = s.split(None, 1)
        if not parts:
            raise NolpError("ADD without a crawler")  # sscanf len 0
        crawler = strrmsq(parts[0][:64])
        inp = strrmsq(parts[1] if len(parts) > 1 else "")
        self.board.add(crawler, inp, self.now, user_id=self.user_id)
        self.send(MSG100)

    def _on_useradd(self, no, args: bytes) -> None:
        if self.level < NOL_LEVEL_MANAGER:
            # the C sends 200 and RETURNS WITHOUT nolp_expect — the
            # payload bytes that follow are parsed as commands (and
            # typically drop the conn).  Faithful.
            self.send(MSG200)
            return
        try:
            sz = int(args.split()[0])
        except (ValueError, IndexError):
            sz = 0
        if sz <= 0:
            raise NolpError("USERADD without a buffer size")
        no.expect(sz, self._on_useradd_recv)

    def _on_useradd_recv(self, no, buf: bytes) -> None:
        """<username>\\n<password>\\n<full-name>\\n<level>\\n<extra>"""
        parts = buf.split(b"\n", 4)
        if len(parts) != 5:
            self.send(MSG201)
            raise NolpError("incorrect USERADD buffer syntax")
        user, pwd, fullname, level_b, extra = parts
        try:
            level = int(level_b.strip() or b"0")
        except ValueError:
            level = 0  # atoi
        self.users.add(user.decode("utf-8", "surrogateescape"),
                       pwd.decode("utf-8", "surrogateescape"),
                       fullname.decode("utf-8", "surrogateescape"),
                       level,
                       extra.decode("utf-8", "surrogateescape"))
        self.send(MSG100)

    def _on_userdel(self, no, args: bytes) -> None:
        if self.level < NOL_LEVEL_MANAGER:
            self.send(MSG200)
            return
        uid = _atoi(args)
        self.send(MSG100 if self.users.delete(uid) else MSG203)

    def _on_passwd(self, no, args: bytes) -> None:
        new = args.decode("utf-8", "surrogateescape")
        self.send(MSG100 if self.users.passwd(self.user_id, new)
                  else MSG203)

    def _on_passwd_id(self, no, args: bytes) -> None:
        if self.level < NOL_LEVEL_MANAGER:
            self.send(MSG200)
            return
        s = args.decode("utf-8", "surrogateescape")
        sp = s.rfind(" ")
        if sp < 0:
            self.send(MSG201)
            raise NolpError("PASSWD-ID without a password")
        uid = _atoi(s[:sp].encode())
        new = s[sp + 1:].strip()
        self.send(MSG100 if self.users.passwd(uid, new) else MSG203)

    # -- sessions / input ---------------------------------------------

    def _jobs_by_id(self) -> Dict[int, Tuple]:
        return {r[0]: r for r in self.board.added_table()}

    def _on_session_info(self, no, args: bytes) -> None:
        sid = _atoi(args)
        rows = [s for s in self.board.sessions_table()
                if s["session_id"] == sid]
        if not rows:
            self.send(MSG203)
            return
        s = rows[0]
        job = self._jobs_by_id().get(s.get("added_id"))
        counts = "".join(
            f"<num-{k[6:]}>{s[k]}</num-{k[6:]}>"
            for k in sorted(s) if k.startswith("count_"))
        self._xml(
            f"<session-info for=\"{sid}\">{counts}"
            f"<client>{s.get('client_id', '')}</client>"
            f"<crawler>{job[1] if job else ''}</crawler>"
            f"<input>{job[2] if job else ''}</input>"
            f"<started>{s.get('date', '')}</started>"
            f"<updated>{s.get('latest', '')}</updated>"
            f"<state>{s.get('state', '')}</state>"
            "</session-info>")

    def _on_session_report(self, no, args: bytes) -> None:
        sid = _atoi(args)
        rows = [s for s in self.board.sessions_table()
                if s["session_id"] == sid and "report" in s]
        if not rows:
            self.send(MSG203)
            return
        raw = rows[0]["report"].encode("utf-8", "surrogateescape")
        self.send(b"100 %d\n" % len(raw))
        self.send(raw)

    def _on_list_sessions(self, no, args: bytes) -> None:
        parts = args.split()
        if len(parts) != 2:
            self.send(MSG201)
            raise NolpError("LIST-SESSIONS needs <start> <count>")
        start, limit = _atoi(parts[0]), min(_atoi(parts[1]), 100)
        jobs = self._jobs_by_id()
        rows = sorted(self.board.sessions_table(),
                      key=lambda s: (-int(s.get("latest", 0)),
                                     -s["session_id"]))
        body = ""
        for s in rows[start:start + limit]:
            job = jobs.get(s.get("added_id"))
            body += (
                f"<session id=\"{s['session_id']}\">"
                f"<latest>{s.get('latest', '')}</latest>"
                f"<state>{s.get('state', '')}</state>"
                f"<crawler>{job[1] if job else ''}</crawler>"
                f"<input>{job[2] if job else ''}</input>"
                f"<client>{s.get('client_id', '')}</client>"
                "</session>")
        self._xml(f"<session-list>{body}</session-list>")

    def _on_list_users(self, no, args: bytes) -> None:
        if self.level < NOL_LEVEL_MANAGER:
            self.send(MSG200)
            return
        parts = args.split()
        if len(parts) != 2:
            self.send(MSG201)
            raise NolpError("LIST-USERS needs <start> <count>")
        start, limit = _atoi(parts[0]), min(_atoi(parts[1]), 100)
        body = "".join(
            f"<user id=\"{r['id']}\">"
            f"<username>{r['user']}</username>"
            f"<fullname>{r['fullname']}</fullname>"
            f"<extra>{r['extra']}</extra>"
            f"<level>{r['level']}</level>"
            "</user>"
            for r in self.users.listing(start, limit))
        self._xml(f"<user-list>{body}</user-list>")

    def _on_list_input(self, no, args: bytes) -> None:
        """The calling user's nol_added rows ⟕ their sessions (one XML
        <input> per join row, LIMIT 1000, id DESC — user-conn.c's
        LIST-INPUT query shape)."""
        sessions_by_job: Dict[int, List[Dict]] = {}
        for s in self.board.sessions_table():
            sessions_by_job.setdefault(s.get("added_id"), []).append(s)
        body = ""
        n = 0
        for (jid, crawler, inp, _date, _uid) in sorted(
                self.board.added_table(self.user_id),
                key=lambda r: -r[0]):
            if n >= 1000:
                break
            joined = sessions_by_job.get(jid) or [None]
            for s in joined:
                if n >= 1000:
                    break
                body += (
                    f"<input id=\"{jid}\">"
                    f"<crawler>{crawler}</crawler>"
                    f"<value>{inp}</value>"
                    f"<latest-session>"
                    f"{s['session_id'] if s else ''}</latest-session>"
                    f"<latest-session-date>"
                    f"{s['latest'] if s else ''}</latest-session-date>"
                    "</input>")
                n += 1
        self._xml(f"<input-list>{body}</input-list>")

    # -- slaves -------------------------------------------------------

    def _slave_by_id(self, sid: int) -> Optional[SlaveInfo]:
        for sl in self.slaves:
            if sl.id == sid:
                return sl
        return None

    def _on_list_slaves(self, no, args: bytes) -> None:
        body = "".join(
            f"<slave id=\"{sl.id}\">"
            f"<user>{sl.name[:64]}</user>"
            f"<num-clients>{len(sl.clients)}</num-clients>"
            f"<address>{sl.addr if sl.ready else '0'}:"
            f"{sl.port if sl.ready else 0}</address>"
            "</slave>"
            for sl in self.slaves)
        self._xml(f"<slave-list>{body}</slave-list>")

    def _on_list_clients(self, no, args: bytes) -> None:
        sl = self._slave_by_id(_atoi(args))
        if sl is None:
            self.send(MSG203)
            return
        self._xml(sl.clients_xml())

    def _on_slave_info(self, no, args: bytes) -> None:
        sl = self._slave_by_id(_atoi(args))
        if sl is None:
            self.send(MSG203)
            return
        self._xml(
            f"<slave-info for=\"{sl.name}-{sl.id}\">"
            f"<address>{sl.addr if sl.ready else '0'}:"
            f"{sl.port if sl.ready else 0}</address>"
            "</slave-info>")

    def _on_client_info(self, no, args: bytes) -> None:
        if self.level < NOL_LEVEL_READ:
            self.send(MSG203)  # the C answers 203 here, not 200
            return
        if len(args) != 40:
            raise NolpError("CLIENT-INFO token must be 40 bytes")
        tok = args.decode("latin-1")
        for sl in self.slaves:
            for c in sl.clients:
                if c["token"] == tok:
                    self._xml(
                        f"<client id=\"{c['token'][:40]}\">"
                        f"<user>{c['user'][:64]}</user>"
                        f"<slave>{sl.name[:64]}-{sl.id}</slave>"
                        f"<status>{c['status'] & 1}</status>"
                        f"<address>{c['addr'][:15]}</address>"
                        f"<session>{c['session_id']}</session>"
                        "</client>")
                    return
        self.send(MSG203)

    def _on_show_config(self, no, args: bytes) -> None:
        if self.level < NOL_LEVEL_ADMIN:
            self.send(MSG200)
            return
        self.send(b"100 %d\n" % len(self.config))
        self.send(self.config)

    def _on_kill_all(self, no, args: bytes) -> None:
        """Relays KILL-ALL to the slave's connection.  The reference
        dereferences a NULL slave on an unknown id (user-conn.c:1025
        sends MSG203 through sl->conn->sock after failing to find sl —
        a crash); here the unknown-id reply goes to the USER conn,
        documented as the one intentional divergence."""
        sl = self._slave_by_id(_atoi(args))
        if sl is None:
            self.send(MSG203)
            return
        sl.out += b"KILL-ALL\n"

    def _on_system_info(self, no, args: bytes) -> None:
        sessions = self.board.sessions_table()
        self._xml(
            "<system-info>"
            f"<uptime>{self.now - self.start_time}</uptime>"
            f"<address>{self.address}</address>"
            f"<num-slaves>{len(self.slaves)}</num-slaves>"
            f"<num-sessions>{len(sessions)}</num-sessions>"
            f"<num-users>{len(self.users.rows)}</num-users>"
            "</system-info>")


def _atoi(b) -> int:
    """C atoi over the leading integer (0 on garbage)."""
    if isinstance(b, bytes):
        b = b.decode("latin-1")
    s = b.strip()
    out = ""
    for i, ch in enumerate(s):
        if ch.isdigit() or (i == 0 and ch in "+-"):
            out += ch
        else:
            break
    try:
        return int(out)
    except ValueError:
        return 0
