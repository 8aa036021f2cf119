"""Bulk BFS crawl vs the ordered engine: visited-set equivalence where
the semantics promise it, external one-level/clear-flag parity, and
mid-crawl resume."""

import os
import shutil

import pyarrow.compute as pc
import pyarrow.dataset as pads
import pytest

from methanol_web_crawler_ray.config import default_config
from methanol_web_crawler_ray.pipelines import bulk, simulator as sim
from methanol_web_crawler_ray.pipelines.hostloop import DictFetcher
from methanol_web_crawler_ray.sources import pagegen


def _bulk_pages(out):
    return pads.dataset(bulk.waves_path(out), partitioning="hive").to_table(
        filter=pc.field("kind") == "page", columns=["url", "text"])


def test_bulk_matches_ordered_visited_set(ray_session):
    d = pagegen.pages_dir_for("/root/testdata/sf0.001")
    cfg = default_config(depth_limit=6, external=False)
    seeds = ["http://host-0001.example/"]

    out = "/tmp/mwc_test_bulk"
    shutil.rmtree(out, ignore_errors=True)
    stats = bulk.crawl_bfs(cfg, d, seeds, out_dir=out, num_shards=4)
    assert stats["pages_parsed"] > 0

    pages = _bulk_pages(out)
    bulk_urls = set(pages.column("url").to_pylist())

    fetch = DictFetcher(pagegen.load_fetch_dict(d))
    r = sim.simulate_rounds(cfg, fetch, seeds)
    # ordered engine's parsed pages = texts keys (misses/redirects excluded)
    assert bulk_urls == set(r.texts)

    # and the extracted text bytes agree per url
    sim_texts = {u: t for u, t in r.texts.items()}
    for u, t in zip(pages.column("url").to_pylist(),
                    pages.column("text").to_pylist()):
        assert t == sim_texts[u]


def test_bulk_direct_and_dataset_wave_paths_agree(ray_session):
    """The size-gated direct-task wave kernel and the streaming Dataset
    path must produce identical outputs (same hive layout, same page
    set, byte-identical text) — downstream readers and resume cannot
    tell which ran."""
    d = pagegen.pages_dir_for("/root/testdata/sf0.001")
    cfg = default_config(depth_limit=6, external=False)
    seeds = ["http://host-0001.example/"]

    outs = {}
    for name, gate in (("direct", 200_000), ("dataset", 0)):
        out = f"/tmp/mwc_test_bulk_path_{name}"
        shutil.rmtree(out, ignore_errors=True)
        bulk.crawl_bfs(cfg, d, seeds, out_dir=out, num_shards=4,
                       direct_wave_gate=gate)
        pages = _bulk_pages(out)
        outs[name] = dict(zip(pages.column("url").to_pylist(),
                              pages.column("text").to_pylist()))
    assert outs["direct"] == outs["dataset"]
    assert len(outs["direct"]) > 0


def test_bulk_lookup_mime_binding_matches_ordered(ray_session):
    """S2/J4 in the BULK engine: with dir/extless/dynamic URLs bound via
    "lookup" (POSSIBLE_MATCH → MIME), extension-less URLs must enter the
    frontier and bind through the page row's content_type — the HEAD
    analog — exactly as the ordered kernel's sort-time HEAD peek does
    (ftindex.c:141-238 lookup class, match_by_mime ftindex.c:240-247).
    Round 2 dropped these URLs entirely in the bulk path."""
    d = pagegen.pages_dir_for("/root/testdata/sf0.001")
    cfg = default_config(depth_limit=6, external=False,
                         dir_url="lookup", extless_url="lookup",
                         dynamic_url="lookup")
    seeds = ["http://host-0001.example/"]

    out = "/tmp/mwc_test_bulk_lookup"
    shutil.rmtree(out, ignore_errors=True)
    stats = bulk.crawl_bfs(cfg, d, seeds, out_dir=out, num_shards=4)
    assert stats["pages_parsed"] > 0

    pages = _bulk_pages(out)
    bulk_urls = set(pages.column("url").to_pylist())
    # the lookup class actually fired: some parsed page is extension-less
    assert any(u.rstrip("/").rsplit("/", 1)[-1].count(".") == 0
               or u.endswith("/") for u in bulk_urls)

    fetch = DictFetcher(pagegen.load_fetch_dict(d))
    r = sim.simulate_rounds(cfg, fetch, seeds)
    assert bulk_urls == set(r.texts)
    for u, t in zip(pages.column("url").to_pylist(),
                    pages.column("text").to_pylist()):
        assert t == r.texts[u]


@pytest.mark.parametrize("clear_flag", [False, True])
def test_bulk_external_matches_ordered(ray_session, clear_flag):
    """keep_external=True: per-row depth resets to 0 on host activation
    and children of activated-external pages follow the kernel's
    LM_URL_EXTERNAL inheritance (lost when clear_external_on_activate is
    False, crawled normally when True) — page set equals the ordered
    engine's under both flag values."""
    d = pagegen.pages_dir_for("/root/testdata/sf0.001")
    cfg = default_config(depth_limit=6, external=True)
    cfg.clear_external_on_activate = clear_flag
    seeds = ["http://host-0001.example/"]

    out = f"/tmp/mwc_test_bulk_ext_{int(clear_flag)}"
    shutil.rmtree(out, ignore_errors=True)
    bulk.crawl_bfs(cfg, d, seeds, out_dir=out, num_shards=4)
    bulk_urls = set(_bulk_pages(out).column("url").to_pylist())

    fetch = DictFetcher(pagegen.load_fetch_dict(d))
    r = sim.simulate_rounds(cfg, fetch, seeds)
    assert bulk_urls == set(r.texts)
    # external crawl reaches beyond the seed host
    assert any(not u.startswith("http://host-0001.example/")
               for u in bulk_urls)


def test_bulk_robots_respected(ray_session):
    d = pagegen.pages_dir_for("/root/testdata/sf0.001")
    cfg = default_config(depth_limit=6)
    out = "/tmp/mwc_test_bulk_robots"
    shutil.rmtree(out, ignore_errors=True)
    bulk.crawl_bfs(cfg, d, ["http://host-0001.example/"], out_dir=out,
                   num_shards=4)
    urls = _bulk_pages(out).column("url").to_pylist()
    assert not any("/private/s" in u for u in urls)
    assert any("/private/open/" in u for u in urls)


def test_bulk_resume(ray_session):
    """Kill after wave 1 → resume → same page set as an uninterrupted
    run (per-wave frontier parquet + seen snapshots = the lineage)."""
    d = pagegen.pages_dir_for("/root/testdata/sf0.001")
    cfg = default_config(depth_limit=6, external=False)
    seeds = ["http://host-0001.example/"]

    full = "/tmp/mwc_test_bulk_full"
    shutil.rmtree(full, ignore_errors=True)
    bulk.crawl_bfs(cfg, d, seeds, out_dir=full, num_shards=4)
    full_urls = set(_bulk_pages(full).column("url").to_pylist())

    part = "/tmp/mwc_test_bulk_part"
    shutil.rmtree(part, ignore_errors=True)
    stats = bulk.crawl_bfs(cfg, d, seeds, out_dir=part, num_shards=4,
                           max_waves=2)  # "crash" after wave 1
    assert stats["pages_parsed"] > 0
    # simulate losing everything after the last complete checkpoint
    resumed = bulk.crawl_bfs(cfg, d, seeds, out_dir=part, num_shards=4,
                             resume=True)
    part_urls = set(_bulk_pages(part).column("url").to_pylist())
    assert part_urls == full_urls
    assert resumed["pages_parsed"] == len(full_urls)


def test_pipelined_matches_wave_engine_sets(ray_session):
    """The barrier-free frontier-queue engine and the wave engine visit
    exactly the same pages with identical extracted text and targets
    when the depth limit does not bind."""
    d = pagegen.pages_dir_for("/root/testdata/sf0.001")
    cfg = default_config(depth_limit=30, external=True)
    seeds = ["http://host-0001.example/", "http://host-0002.example/"]

    out_w = "/tmp/mwc_test_pipe_wave"
    out_p = "/tmp/mwc_test_pipe_queue"
    shutil.rmtree(out_w, ignore_errors=True)
    shutil.rmtree(out_p, ignore_errors=True)
    sw = bulk.crawl_bfs(cfg, d, seeds, out_dir=out_w, num_shards=4)
    sp = bulk.crawl_bfs_pipelined(cfg, d, seeds, out_dir=out_p,
                                  num_shards=4, batch_size=64)
    assert sp["pages_parsed"] == sw["pages_parsed"] > 0
    assert sp["seen_size"] == sw["seen_size"]

    def rows(root, kind, cols):
        tbl = pads.dataset(root, partitioning="hive").to_table(
            filter=pc.field("kind") == kind, columns=cols)
        return set(map(tuple, zip(*[tbl.column(c).to_pylist()
                                    for c in cols])))

    wave_pages = rows(bulk.waves_path(out_w), "page",
                      ["url", "url_hash", "filetype", "text"])
    pipe_pages = rows(out_p, "page", ["url", "url_hash", "filetype", "text"])
    assert wave_pages == pipe_pages

    wave_targets = rows(bulk.waves_path(out_w), "target",
                        ["url", "url_hash", "filetype"])
    pipe_targets = rows(out_p, "target", ["url", "url_hash", "filetype"])
    assert wave_targets == pipe_targets


def test_pipelined_kill_and_resume(ray_session):
    """Quiesce-checkpoint every 2 tasks, inject a crash after 5, resume
    → identical final page/target sets, texts and seen size as an
    uninterrupted run (north rule: per-partition lineage, resumable)."""
    d = pagegen.pages_dir_for("/root/testdata/sf0.001")
    cfg = default_config(depth_limit=30, external=True)
    seeds = ["http://host-0001.example/", "http://host-0002.example/"]

    out_a = "/tmp/mwc_test_pipe_uninterrupted"
    out_b = "/tmp/mwc_test_pipe_killed"
    shutil.rmtree(out_a, ignore_errors=True)
    shutil.rmtree(out_b, ignore_errors=True)
    sa = bulk.crawl_bfs_pipelined(cfg, d, seeds, out_dir=out_a,
                                  num_shards=4, batch_size=64)

    with pytest.raises(RuntimeError, match="injected failure"):
        bulk.crawl_bfs_pipelined(cfg, d, seeds, out_dir=out_b,
                                 num_shards=4, batch_size=64,
                                 ckpt_every_tasks=2, _fail_after_tasks=5)
    assert os.path.exists(os.path.join(out_b, "ckpt", "manifest.json"))
    sb = bulk.crawl_bfs_pipelined(cfg, d, seeds, out_dir=out_b,
                                  num_shards=4, batch_size=64,
                                  ckpt_every_tasks=2, resume=True)

    def rows(root, kind, cols):
        tbl = pads.dataset(root, partitioning="hive").to_table(
            filter=pc.field("kind") == kind, columns=cols)
        return sorted(zip(*[tbl.column(c).to_pylist() for c in cols]))

    cols = ["url", "url_hash", "filetype", "text"]
    assert rows(out_b, "page", cols) == rows(out_a, "page", cols)
    assert rows(out_b, "target", ["url", "url_hash", "filetype"]) == \
        rows(out_a, "target", ["url", "url_hash", "filetype"])
    assert sb["pages_parsed"] == sa["pages_parsed"]
    assert sb["seen_size"] == sa["seen_size"]
    # a completed run leaves no stale recovery point behind
    assert not os.path.exists(os.path.join(out_b, "ckpt"))
    assert not os.path.exists(os.path.join(out_b, "frontier_spill"))


def test_pipelined_spill_bounds_driver_buffer(ray_session):
    """A tiny buf_cap forces the overflow→spill→refill path; outputs
    must match an unconstrained run exactly."""
    d = pagegen.pages_dir_for("/root/testdata/sf0.001")
    cfg = default_config(depth_limit=30, external=True)
    seeds = ["http://host-0001.example/", "http://host-0002.example/"]

    out_a = "/tmp/mwc_test_pipe_nospill"
    out_b = "/tmp/mwc_test_pipe_spill"
    shutil.rmtree(out_a, ignore_errors=True)
    shutil.rmtree(out_b, ignore_errors=True)
    sa = bulk.crawl_bfs_pipelined(cfg, d, seeds, out_dir=out_a,
                                  num_shards=4, batch_size=64)
    sb = bulk.crawl_bfs_pipelined(cfg, d, seeds, out_dir=out_b,
                                  num_shards=4, batch_size=64,
                                  buf_cap_rows=64)

    def rows(root, kind, cols):
        tbl = pads.dataset(root, partitioning="hive").to_table(
            filter=pc.field("kind") == kind, columns=cols)
        return sorted(zip(*[tbl.column(c).to_pylist() for c in cols]))

    cols = ["url", "url_hash", "filetype", "text"]
    assert rows(out_b, "page", cols) == rows(out_a, "page", cols)
    assert sb["seen_size"] == sa["seen_size"]
