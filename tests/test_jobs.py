"""Seed-job lease board (S11): reference nol_added/nol_session
semantics — eligibility, date-DESC pick order, 28-day re-lease,
interrupted sessions, and an e2e leased bulk crawl."""

import pytest

from methanol_web_crawler_ray.state.jobs import (LEASE_INTERVAL, Lease,
                                                 LocalJobBoard, drain,
                                                 make_job_board)


def test_lease_order_date_desc_then_id():
    """client.c Q_GET_NEW_URL: WHERE date <= NOW() ORDER BY date DESC
    LIMIT 1; ties break by lowest id (documented deviation)."""
    b = LocalJobBoard([(1, "default", "http://a.ex/", 50),
                       (2, "default", "http://b.ex/", 100),
                       (3, "default", "http://c.ex/", 100),
                       (4, "default", "http://d.ex/", 999)])
    # at t=200: eligible 1,2,3; latest date wins (100), tie → id 2
    assert b.lease("c1", 200).job_id == 2
    assert b.lease("c1", 200).job_id == 3
    assert b.lease("c1", 200).job_id == 1
    assert b.lease("c1", 200) is None  # 4 not eligible until 999
    assert b.lease("c1", 999).job_id == 4


def test_lease_pushes_date_28_days():
    b = LocalJobBoard([(1, "default", "http://a.ex/", 0)])
    ls = b.lease("c1", 1000)
    assert (1, "default", "http://a.ex/", 1000 + LEASE_INTERVAL) \
        in b.jobs_table()
    b.complete(ls.session_id, 2000)
    # done does NOT clear the lease: recurring 28-day cycle
    assert b.lease("c1", 2000) is None
    nxt = b.lease("c1", 1000 + LEASE_INTERVAL)
    assert nxt is not None and nxt.job_id == 1


def test_interrupted_session_releases_after_expiry():
    """A crashed client's job stays leased until the 28 days pass —
    the reference's crude resume (client.c:192-201, 396-399)."""
    b = LocalJobBoard([(1, "default", "http://a.ex/", 0)])
    ls = b.lease("crashy", 0)
    b.interrupt(ls.session_id, 10)
    assert b.sessions_table()[0]["state"] == "interrupted"
    assert b.lease("healthy", LEASE_INTERVAL - 1) is None
    again = b.lease("healthy", LEASE_INTERVAL)
    assert again is not None and again.job_id == 1
    states = [s["state"] for s in b.sessions_table()]
    assert states == ["interrupted", "running"]


def test_session_lifecycle_and_snapshot_roundtrip():
    b = LocalJobBoard([(1, "default", "http://a.ex/", 0),
                       (2, "wiki", "http://b.ex/", 0)])
    ls = b.lease("c1", 5)
    b.heartbeat(ls.session_id, 7)
    b.complete(ls.session_id, 9)
    s = b.sessions_table()[0]
    assert (s["state"], s["date"], s["latest"]) == ("done", 5, 9)
    r = LocalJobBoard.restore(b.snapshot())
    assert r.jobs_table() == b.jobs_table()
    assert r.sessions_table() == b.sessions_table()
    # restored board continues where the original stopped
    assert r.lease("c2", 5).job_id == 2


def test_drain_runs_all_eligible():
    b = LocalJobBoard([(i, "default", f"http://h{i}.ex/", 0)
                       for i in range(1, 4)])
    ran = []
    leases = drain(b, "c1", 100, lambda ls: ran.append(ls.input) or 60)
    assert len(leases) == 3 and len(ran) == 3
    assert all(s["state"] == "done" for s in b.sessions_table())
    # virtual clock advanced 60 s per session
    assert [s["date"] for s in b.sessions_table()] == [100, 160, 220]


def test_ray_board_serialized_leases(ray_session):
    """The actor mailbox is the reference's table write lock: concurrent
    clients never double-lease a job."""
    import ray

    board = make_job_board([(i, "default", f"http://h{i}.ex/", 0)
                            for i in range(1, 9)])

    @ray.remote
    def client(actor, cid):
        got = []
        while True:
            ls = ray.get(actor.lease.remote(cid, 0))
            if ls is None:
                return got
            ray.get(actor.complete.remote(ls.session_id, 1))
            got.append(ls.job_id)

    results = ray.get([client.remote(board.actor, f"c{i}")
                       for i in range(4)])
    all_ids = sorted(j for r in results for j in r)
    assert all_ids == list(range(1, 9))  # each job leased exactly once
    board.shutdown()


def test_leased_bulk_crawl_e2e(ray_session, tmp_path):
    """S11 end-to-end: jobs feed the bulk BFS engine one session per
    lease; every job's crawl output lands under its own session dir."""
    from tests._pagetools import html, write_pages
    from methanol_web_crawler_ray.config import default_config
    from methanol_web_crawler_ray.pipelines import bulk

    hosts = ["a.example", "b.example"]
    rows = []
    for h in hosts:
        rows += [
            {"url": f"http://{h}/", "body": html('<a href="p1.html">x</a>')},
            {"url": f"http://{h}/p1.html", "body": html("leaf")},
        ]
    store_dir = write_pages(str(tmp_path / "web"), rows)
    jobs = [(i + 1, "default", f"http://{h}/", 0)
            for i, h in enumerate(hosts)]
    board = make_job_board(jobs)
    cfg = default_config(depth_limit=3, external=False)

    def run(ls: Lease) -> int:
        out = tmp_path / f"session_{ls.session_id}"
        stats = bulk.crawl_bfs(cfg, store_dir, [ls.input],
                               out_dir=str(out), num_shards=2)
        assert stats["pages_parsed"] > 0
        return 60

    leases = drain(board, "client-1", 0, run)
    assert [ls.job_id for ls in leases] == [1, 2]
    assert all(s["state"] == "done" for s in board.sessions_table())
    for ls in leases:
        assert (tmp_path / f"session_{ls.session_id}" / "ckpt").is_dir()
    board.shutdown()
