"""Seed-job lease board (SURVEY §2 S11 / J5) — offline analog of the
Methanol slave's MySQL ``nol_added`` / ``nol_session`` tables.

Reference semantics (``src/mn-slaved/client.c``):

* a job row is ``(id, crawler, input, date)``; leasable when
  ``date <= now`` (client.c:351-352, ``Q_GET_NEW_URL`` —
  ``WHERE date <= NOW() ORDER BY date DESC LIMIT 1``);
* leasing happens under a table WRITE lock (client.c:374) and sets
  ``date = now + 28 days`` (client.c:396-400).  Completion does NOT
  clear the date, so every job recurs on a 28-day cycle, and a crashed
  client's job re-leases automatically once the lease expires — the
  reference's crude resume (client.c:192-201, SURVEY §3 checkpoint row);
* a session row ``(added_id, client_id, date, latest)`` tracks each
  lease (client.c:419-424); its state goes running → ``hook`` →
  ``done`` when the client reports STATUS 0 (client.c:478-486), or
  ``interrupted`` when the client disconnects mid-session
  (client.c:192-201).

Deviations (documented):

* ties on ``date`` break by LOWEST job id — MySQL's ``LIMIT 1`` without
  a secondary sort key is unspecified, and the engine must be
  deterministic;
* time is an explicit virtual clock (integer seconds), the same policy
  as the politeness clock: the engine never reads the wall clock.

The Ray variant is a single shared-mutable-index actor — the one shape
the Dataset API genuinely cannot express (a lease is an atomic
read-modify-write on global state; the reference serializes it with a
table lock, we serialize it with the actor's mailbox).  The board holds
one row per JOB (site/seed), not per URL — at 10^10 URLs this stays a
tiny control-plane table, exactly as in the reference deployment.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

LEASE_INTERVAL = 28 * 86400  # client.c:398 "INTERVAL 28 DAY"


@dataclass
class Lease:
    """What ``lease()`` hands a client — the reference's ``START
    <crawler> <input>`` line (client.c:409) plus the session id."""

    session_id: int
    job_id: int
    crawler: str
    input: str


class LocalJobBoard:
    """In-process board: the unit-test backend and the serializable
    state behind the Ray actor."""

    def __init__(self, jobs: List[Tuple[int, str, str, int]]):
        """jobs: (id, crawler, input, date) rows; date = first moment
        the job is eligible (0 = immediately)."""
        self.jobs: Dict[int, List] = {
            j[0]: [j[0], j[1], j[2], int(j[3])] for j in jobs
        }
        if len(self.jobs) != len(jobs):
            raise ValueError("duplicate job ids")
        self.sessions: List[Dict] = []
        self.added_by: Dict[int, int] = {}  # job id -> user id (ADD)

    # -- nol_added ----------------------------------------------------
    def add(self, crawler: str, input: str, now: int,
            user_id: int = 0) -> int:
        """The master user API's ADD (user-conn.c:280-317): INSERT INTO
        nol_added (user_id, crawler, input, date=NOW()) — the new job is
        eligible immediately and carries the submitting user for
        LIST-INPUT.  Returns the new job id."""
        jid = max(self.jobs, default=0) + 1
        self.jobs[jid] = [jid, crawler, input, int(now)]
        self.added_by[jid] = int(user_id)
        return jid

    def lease(self, client_id: str, now: int) -> Optional[Lease]:
        """Atomically pick the eligible job with the LATEST date (ties →
        lowest id), push its date 28 days out, open a session.  None when
        no job is eligible (the reference then polls on a 5 s timer —
        client.c:500-502; polling cadence is the caller's concern)."""
        now = int(now)
        eligible = [j for j in self.jobs.values() if j[3] <= now]
        if not eligible:
            return None
        j = min(eligible, key=lambda r: (-r[3], r[0]))
        j[3] = now + LEASE_INTERVAL
        sid = len(self.sessions) + 1
        self.sessions.append({
            "session_id": sid, "added_id": j[0], "client_id": client_id,
            "date": now, "latest": now, "state": "running",
        })
        return Lease(sid, j[0], j[1], j[2])

    # -- nol_session --------------------------------------------------
    def _session(self, session_id: int) -> Dict:
        return self.sessions[session_id - 1]

    def heartbeat(self, session_id: int, now: int) -> None:
        self._session(session_id)["latest"] = int(now)

    def complete(self, session_id: int, now: int) -> None:
        """STATUS 0: running → hook (session-complete hook point) →
        done (client.c:478-486).  The job's date is left at lease+28d —
        the recurring-recrawl cycle."""
        s = self._session(session_id)
        s["state"] = "hook"
        s["state"] = "done"
        s["latest"] = int(now)

    def interrupt(self, session_id: int, now: int) -> None:
        """Client disconnected mid-session (client.c:192-201): the
        session is marked interrupted but the job stays leased until the
        28 days pass — then it re-leases to anyone."""
        s = self._session(session_id)
        if s["state"] == "running":
            s["state"] = "interrupted"
            s["latest"] = int(now)

    def set_count(self, session_id: int, name: str, count: int) -> None:
        """COUNT <filetype> <n>: the session's per-filetype statistics
        column (``UPDATE nol_session SET count_<ft>``, mn-slaved/
        client.c:752-791)."""
        self._session(session_id)[f"count_{name}"] = int(count)

    def set_report(self, session_id: int, report: str) -> None:
        """nol_session.report blob (read back by the user API's
        SESSION-REPORT, user-conn.c:700-733)."""
        self._session(session_id)["report"] = str(report)

    # -- introspection / persistence ---------------------------------
    def jobs_table(self) -> List[Tuple[int, str, str, int]]:
        return sorted((j[0], j[1], j[2], j[3]) for j in self.jobs.values())

    def sessions_table(self) -> List[Dict]:
        return [dict(s) for s in self.sessions]

    def added_table(self, user_id: Optional[int] = None):
        """(id, crawler, input, date, user_id) rows, optionally filtered
        to one submitting user (LIST-INPUT's WHERE user_id=...)."""
        rows = [(j[0], j[1], j[2], j[3], self.added_by.get(j[0], 0))
                for j in self.jobs.values()]
        if user_id is not None:
            rows = [r for r in rows if r[4] == int(user_id)]
        return sorted(rows)

    def snapshot(self) -> bytes:
        import pickle

        return pickle.dumps((self.jobs_table(), self.sessions,
                             dict(self.added_by)))

    @classmethod
    def restore(cls, blob: bytes) -> "LocalJobBoard":
        import pickle

        parts = pickle.loads(blob)
        jobs, sessions = parts[0], parts[1]
        b = cls(jobs)
        b.sessions = sessions
        if len(parts) > 2:          # r5 snapshots carry attribution
            b.added_by = dict(parts[2])
        return b


def drain(board, client_id: str, now: int, run_fn) -> List[Lease]:
    """One client's idle loop: lease → run → STATUS 0 → lease … until
    the board has nothing eligible.  ``run_fn(lease) -> int`` performs
    the crawl session and returns the (virtual) seconds it took; an
    exception marks the session interrupted (disconnect analog) and
    re-raises.  Returns the leases processed."""
    out = []
    t = int(now)
    while True:
        ls = board.lease(client_id, t)
        if ls is None:
            return out
        try:
            dt = run_fn(ls)
        except Exception:
            board.interrupt(ls.session_id, t)
            raise
        t += max(int(dt), 0)
        board.complete(ls.session_id, t)
        out.append(ls)


def make_job_board(jobs: List[Tuple[int, str, str, int]]):
    """Ray-actor variant: ONE board actor serializes all lease RPCs (the
    reference's table write lock).  The facade mirrors LocalJobBoard and
    its handle serializes into tasks, like the seen pools."""
    import ray

    @ray.remote(num_cpus=0)
    class JobBoardActor:
        def __init__(self, jobs):
            self.b = LocalJobBoard(jobs)

        def lease(self, client_id, now):
            return self.b.lease(client_id, now)

        def add(self, crawler, input, now, user_id=0):
            return self.b.add(crawler, input, now, user_id)

        def set_report(self, session_id, report):
            self.b.set_report(session_id, report)

        def added_table(self, user_id=None):
            return self.b.added_table(user_id)

        def heartbeat(self, session_id, now):
            self.b.heartbeat(session_id, now)

        def complete(self, session_id, now):
            self.b.complete(session_id, now)

        def interrupt(self, session_id, now):
            self.b.interrupt(session_id, now)

        def set_count(self, session_id, name, count):
            self.b.set_count(session_id, name, count)

        def jobs_table(self):
            return self.b.jobs_table()

        def sessions_table(self):
            return self.b.sessions_table()

        def snapshot(self):
            return self.b.snapshot()

    class RayJobBoard:
        def __init__(self):
            self.actor = JobBoardActor.remote(jobs)

        def lease(self, client_id, now):
            return ray.get(self.actor.lease.remote(client_id, now))

        def add(self, crawler, input, now, user_id=0):
            return ray.get(self.actor.add.remote(crawler, input, now,
                                                 user_id))

        def set_report(self, session_id, report):
            ray.get(self.actor.set_report.remote(session_id, report))

        def added_table(self, user_id=None):
            return ray.get(self.actor.added_table.remote(user_id))

        def heartbeat(self, session_id, now):
            ray.get(self.actor.heartbeat.remote(session_id, now))

        def complete(self, session_id, now):
            ray.get(self.actor.complete.remote(session_id, now))

        def interrupt(self, session_id, now):
            ray.get(self.actor.interrupt.remote(session_id, now))

        def set_count(self, session_id, name, count):
            ray.get(self.actor.set_count.remote(session_id, name, count))

        def jobs_table(self):
            return ray.get(self.actor.jobs_table.remote())

        def sessions_table(self):
            return ray.get(self.actor.sessions_table.remote())

        def snapshot(self):
            return ray.get(self.actor.snapshot.remote())

        def shutdown(self):
            ray.kill(self.actor)
            self.actor = None

    return RayJobBoard()
