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
