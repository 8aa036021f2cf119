"""Distributed crawl (pipelines/crawl.py) vs the sequential rounds model —
the orchestration-equivalence gate, plus checkpoint/resume."""

import os
import shutil

import pytest

from methanol_web_crawler_ray.config import default_config
from methanol_web_crawler_ray.pipelines import crawl, simulator as sim
from methanol_web_crawler_ray.pipelines.hostloop import DictFetcher
from methanol_web_crawler_ray.sources import pagegen

SEEDS = ["http://host-0000.example/", "http://host-0001.example/"]


@pytest.fixture(scope="module")
def crawl_ckpt(ray_session):
    d = pagegen.pages_dir_for("/root/testdata/sf0.001")
    cfg = default_config(depth_limit=6, external=True)
    ck = "/tmp/mwc_test_ray_crawl"
    shutil.rmtree(ck, ignore_errors=True)
    crawl.crawl_rounds(cfg, d, SEEDS, ckpt_dir=ck, concurrency=2)
    return d, cfg, ck


def test_ray_matches_rounds_simulator(crawl_ckpt):
    d, cfg, ck = crawl_ckpt
    fetch = DictFetcher(pagegen.load_fetch_dict(d))
    r_sim = sim.simulate_rounds(cfg, fetch, SEEDS)
    r_ray = crawl.collect_result(ck)

    assert len(r_ray.visits) == len(r_sim.visits) > 0
    # exact per-host visit sequences including round numbers
    assert sorted((v[0], v[3], v[4]) for v in r_ray.visits) == \
        sorted((v[0], v[3], v[4]) for v in r_sim.visits)
    h1, h2 = r_sim.visits_by_host(), r_ray.visits_by_host()
    assert h1 == h2
    # byte-identical extracted text per URL
    assert r_sim.texts == r_ray.texts
    assert sorted(t["url_hash"] for t in r_sim.targets) == \
        sorted(t["url_hash"] for t in r_ray.targets)
    assert r_sim.ft_counts == r_ray.ft_counts


def test_resume_from_checkpoint(crawl_ckpt, ray_session):
    """Kill-after-round-0 → resume → byte-equal final outcome
    (north rule: per-partition lineage, resumable mid-crawl)."""
    d, cfg, ck = crawl_ckpt
    full = crawl.collect_result(ck)
    assert full.rounds >= 2, "fixture crawl should take multiple rounds"

    ck2 = ck + "_resume"
    shutil.rmtree(ck2, ignore_errors=True)
    os.makedirs(ck2)
    shutil.copytree(os.path.join(ck, "round_0000"),
                    os.path.join(ck2, "round_0000"))
    crawl.crawl_rounds(cfg, d, SEEDS, ckpt_dir=ck2, resume=True,
                       concurrency=2)
    resumed = crawl.collect_result(ck2)
    assert sorted(resumed.visits) == sorted(full.visits)
    assert resumed.texts == full.texts
    assert sorted(t["url_hash"] for t in resumed.targets) == \
        sorted(t["url_hash"] for t in full.targets)


def test_throttled_parity_and_deferral(ray_session):
    """Politeness-throttled crawl (friendly mode + robots Crawl-delay):
    the Ray engine defers not-due hosts and fast-forwards empty rounds,
    and must still match the sequential model EXACTLY — per-host visit
    sequences WITH round numbers."""
    d = pagegen.pages_dir_for("/root/testdata/sf0.001")
    cfg = default_config(depth_limit=5, external=True)
    cfg.mode = "friendly"      # 10 s between transfers
    cfg.round_seconds = 30     # → ~3 transfers per host per round
    seeds = ["http://host-0000.example/", "http://host-0001.example/"]

    fetch = DictFetcher(pagegen.load_fetch_dict(d))
    r_sim = sim.simulate_rounds(cfg, fetch, seeds)
    assert r_sim.rounds > 5  # genuinely multi-round

    ck = "/tmp/mwc_test_throttled"
    shutil.rmtree(ck, ignore_errors=True)
    crawl.crawl_rounds(cfg, d, seeds, ckpt_dir=ck, concurrency=2)
    r_ray = crawl.collect_result(ck)

    assert sorted((v[0], v[3], v[4]) for v in r_ray.visits) == \
        sorted((v[0], v[3], v[4]) for v in r_sim.visits)
    assert r_sim.texts == r_ray.texts


def test_external_false_redirect_not_scheduled(ray_session):
    """external=False + a cross-host redirect: the redirect target parks
    (move_to_secondary always emits park=True) and the round barrier
    registers its host, but the host must NOT activate — the reference
    pops pending hosts only under LM_CRFLAG_EXTERNAL (worker.c:255) and
    simulate_rounds gates arrivals the same way.  Regression test for the
    Ray engine scheduling merged arrivals unconditionally."""
    from _pagetools import html, write_pages

    d = write_pages("/tmp/mwc_test_extfalse_pages", [
        {"url": "http://a.x/", "body": html(
            '<a href="/r.html">r</a> <a href="/p2.html">p2</a>')},
        {"url": "http://a.x/r.html", "status": 301,
         "location": "http://b.x/p.html"},
        {"url": "http://a.x/p2.html", "body": html("leaf")},
        {"url": "http://b.x/p.html", "body": html("foreign")},
    ])
    cfg = default_config(depth_limit=3, external=False)
    fetch = DictFetcher(pagegen.load_fetch_dict(d))
    r_sim = sim.simulate_rounds(cfg, fetch, ["http://a.x/"])
    assert all(v[0].startswith("http://a.x/") for v in r_sim.visits)

    ck = "/tmp/mwc_test_extfalse"
    shutil.rmtree(ck, ignore_errors=True)
    crawl.crawl_rounds(cfg, d, ["http://a.x/"], ckpt_dir=ck, concurrency=2,
                       num_shards=2)
    r_ray = crawl.collect_result(ck)
    assert sorted((v[0], v[3], v[4]) for v in r_ray.visits) == \
        sorted((v[0], v[3], v[4]) for v in r_sim.visits)
    assert r_sim.texts == r_ray.texts


def test_ignore_host_rounds_parity(ray_session):
    """FT_FLAG_IGNORE_HOST in ROUNDS mode: a cross-host URL crawled
    in-place must take a synchronous seen verdict — a URL already crawled
    by another host (in an earlier round) is dropped, not re-visited.
    Regression: the deferred barrier add used to let it re-crawl."""
    from _pagetools import html, write_pages

    from methanol_web_crawler_ray.config import EngineConfig
    from methanol_web_crawler_ray.functions.matchkit import Crawler, Filetype

    filetypes = {
        "html": Filetype(name="html", extensions=("html",),
                         mimetypes=("text/html",),
                         parser="html, utf8conv, entityconv",
                         ignore_host=True),
    }
    crawlers = {
        "default": Crawler(name="default", filetypes=("html",),
                           depth_limit=4, robotstxt=False, external=False,
                           dir_url="@html", extless_url="@html",
                           dynamic_url="@html", unknown_url="discard"),
    }
    cfg = EngineConfig(crawlers=crawlers, filetypes=filetypes)
    # budget 2 transfers/round.  NOTE: both hosts issue their synchronous
    # seen VERDICT for b.x/p.html in round 0 (a.x at its transfer-1 parse,
    # c.x at its transfer-2 parse of c1.html) even though c.x would only
    # CRAWL it in round 1 — so this IS a same-round cross-host claim race,
    # resolved deterministically by the engine's claim-replay machinery
    # (winner = sorted-host order, matching simulate_rounds).  This test
    # flaked before round 4 precisely because the verdict was
    # RPC-arrival-ordered.
    cfg.mode = "friendly"
    cfg.round_seconds = 20

    d = write_pages("/tmp/mwc_test_ignhost_pages", [
        {"url": "http://a.x/", "body": html('<a href="http://b.x/p.html">b</a>')},
        {"url": "http://c.x/", "body": html('<a href="/c1.html">c1</a>')},
        {"url": "http://c.x/c1.html",
         "body": html('<a href="http://b.x/p.html">b</a>')},
        {"url": "http://b.x/p.html", "body": html("shared")},
    ])
    seeds = ["http://a.x/", "http://c.x/"]
    fetch = DictFetcher(pagegen.load_fetch_dict(d))
    r_sim = sim.simulate_rounds(cfg, fetch, seeds)
    b_visits = [v for v in r_sim.visits if v[0] == "http://b.x/p.html"]
    assert len(b_visits) == 1, "cross-host ignore_host URL crawled once"
    assert b_visits[0][1] == "a.x"  # a.x won (earlier round)

    ck = "/tmp/mwc_test_ignhost"
    shutil.rmtree(ck, ignore_errors=True)
    crawl.crawl_rounds(cfg, d, seeds, ckpt_dir=ck, concurrency=2,
                       num_shards=2)
    r_ray = crawl.collect_result(ck)
    assert sorted((v[0], v[1], v[3], v[4]) for v in r_ray.visits) == \
        sorted((v[0], v[1], v[3], v[4]) for v in r_sim.visits)
    assert r_sim.texts == r_ray.texts


def test_external_peek_ray_parity(ray_session):
    """epeek in the distributed engine: peeked external URLs crawl
    inline with a synchronous seen verdict; peek state survives the
    per-round state blob.  Exact parity vs the sequential model."""
    from _pagetools import html, write_pages

    d = write_pages("/tmp/mwc_test_epeek_pages", [
        {"url": "http://a.x/", "body": html(
            '<a href="http://b.x/p1.html">b</a> <a href="/in.html">i</a>')},
        {"url": "http://a.x/in.html", "body": html("leaf")},
        {"url": "http://b.x/p1.html", "body": html('<a href="p2.html">2</a>')},
        {"url": "http://b.x/p2.html", "body": html("deep")},
    ])
    cfg = default_config(robotstxt=False, depth_limit=4, external=False,
                         external_peek=True, peek_limit=2)
    cfg.mode = "friendly"   # 2 transfers/round: peek spans rounds
    cfg.round_seconds = 20
    fetch = DictFetcher(pagegen.load_fetch_dict(d))
    r_sim = sim.simulate_rounds(cfg, fetch, ["http://a.x/"])
    assert "http://b.x/p1.html" in [v[0] for v in r_sim.visits]
    assert r_sim.rounds > 1

    ck = "/tmp/mwc_test_epeek"
    shutil.rmtree(ck, ignore_errors=True)
    crawl.crawl_rounds(cfg, d, ["http://a.x/"], ckpt_dir=ck, concurrency=2,
                       num_shards=2)
    r_ray = crawl.collect_result(ck)
    assert sorted((v[0], v[3], v[4]) for v in r_ray.visits) == \
        sorted((v[0], v[3], v[4]) for v in r_sim.visits)
    assert r_sim.texts == r_ray.texts


def test_same_round_claim_race_deterministic(ray_session):
    """Stress the same-round cross-host sync-claim race: 8 hosts all link
    the SAME 4 ignore_host URLs in round 0 (aggressive mode → everything
    happens in one round, maximum contention).  The racy pre-round-4
    engine gave the shared URLs to whichever host's shard RPC landed
    first; the claim-replay machinery must award every contested URL to
    the sorted-smallest claimant — exactly simulate_rounds — on every
    run.  3 repeats to catch scheduling-order dependence."""
    from _pagetools import html, write_pages

    from methanol_web_crawler_ray.config import EngineConfig
    from methanol_web_crawler_ray.functions.matchkit import Crawler, Filetype

    filetypes = {
        "html": Filetype(name="html", extensions=("html",),
                         mimetypes=("text/html",),
                         parser="html, utf8conv, entityconv",
                         ignore_host=True),
    }
    crawlers = {
        "default": Crawler(name="default", filetypes=("html",),
                           depth_limit=4, robotstxt=False, external=False,
                           dir_url="@html", extless_url="@html",
                           dynamic_url="@html", unknown_url="discard"),
    }
    cfg = EngineConfig(crawlers=crawlers, filetypes=filetypes)
    cfg.mode = "aggressive"  # unbounded budget: one round, all races live

    shared = [f"http://shared.x/s{i}.html" for i in range(4)]
    pages = []
    hosts = [f"h{i:02d}.x" for i in range(8)]
    for h in hosts:
        links = " ".join(f'<a href="{u}">s</a>' for u in shared)
        pages.append({"url": f"http://{h}/",
                      "body": html(links + ' <a href="/own.html">o</a>')})
        pages.append({"url": f"http://{h}/own.html", "body": html("leaf")})
    for i, u in enumerate(shared):
        # shared pages chain onward to a second tier of contested URLs
        pages.append({"url": u, "body": html(
            f'<a href="http://shared.x/t{i}.html">t</a>')})
        pages.append({"url": f"http://shared.x/t{i}.html",
                      "body": html("deep")})

    d = write_pages("/tmp/mwc_test_claimrace_pages", pages)
    seeds = [f"http://{h}/" for h in hosts]
    fetch = DictFetcher(pagegen.load_fetch_dict(d))
    r_sim = sim.simulate_rounds(cfg, fetch, seeds)
    winner_visits = [v for v in r_sim.visits if v[0] in shared]
    assert len(winner_visits) == len(shared)
    assert all(v[1] == "h00.x" for v in winner_visits), \
        "sequential model awards every contested URL to the smallest host"

    for rep in range(3):
        ck = f"/tmp/mwc_test_claimrace_{rep}"
        shutil.rmtree(ck, ignore_errors=True)
        crawl.crawl_rounds(cfg, d, seeds, ckpt_dir=ck, concurrency=4,
                           num_shards=2)
        r_ray = crawl.collect_result(ck)
        assert sorted((v[0], v[1], v[3], v[4]) for v in r_ray.visits) == \
            sorted((v[0], v[1], v[3], v[4]) for v in r_sim.visits), \
            f"run {rep} diverged from the sequential model"
        assert r_sim.texts == r_ray.texts


def test_reconcile_claims_fixpoint():
    """Unit: _reconcile_claims awards min-claimant, detects non-fixpoint
    runs, and drops stale forced keys."""
    from methanol_web_crawler_ray.pipelines.crawl import _reconcile_claims

    # fresh conflict: two claimants, no forced map yet → replay needed
    nf, conv = _reconcile_claims([{"k1": ["c.x", "a.x"]}], [{}])
    assert not conv and nf == [{"k1": "a.x"}]
    # fixpoint: forced winner equals min claimant of this run → accept
    nf2, conv2 = _reconcile_claims([{"k1": ["c.x", "a.x"]}], nf)
    assert conv2 and nf2 == [{"k1": "a.x"}]
    # claim set changed: a smaller host now claims the forced key
    nf3, conv3 = _reconcile_claims([{"k1": ["c.x", "a.x", "0.x"]}], nf)
    assert not conv3 and nf3 == [{"k1": "0.x"}]
    # stale forced key nobody claims anymore → dropped, still converged
    nf4, conv4 = _reconcile_claims([{"k1": []}], nf)
    assert conv4 and nf4 == [{}]
    # forced key with a single (different) claimant: the denied host is
    # now the rightful winner → replay
    nf5, conv5 = _reconcile_claims([{"k1": ["b.x"]}], [{"k1": "a.x"}])
    assert not conv5 and nf5 == [{"k1": "b.x"}]


def test_cuckoo_mode_smoke(ray_session):
    """Cuckoo seen-set mode: same crawl outcome at fixture scale (false
    positives are ~2^-14/URL; none expected on 200 URLs)."""
    d = pagegen.pages_dir_for("/root/testdata/sf0.001")
    cfg = default_config(depth_limit=4)
    ck = "/tmp/mwc_test_cuckoo"
    shutil.rmtree(ck, ignore_errors=True)
    crawl.crawl_rounds(cfg, d, ["http://host-0001.example/"], ckpt_dir=ck,
                       seen_mode="cuckoo", concurrency=2)
    r_c = crawl.collect_result(ck)
    fetch = DictFetcher(pagegen.load_fetch_dict(d))
    r_sim = sim.simulate_rounds(cfg, fetch, ["http://host-0001.example/"])
    assert sorted(v[0] for v in r_c.visits) == sorted(v[0] for v in r_sim.visits)
