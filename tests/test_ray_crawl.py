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
    # budget 2 transfers/round: a.x reaches b.x/p.html in round 0, c.x only
    # in round 1 — no same-round race, outcome fully deterministic
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
