"""Bulk BFS crawl vs the ordered engine: visited-set equivalence where
the semantics promise it (no external machinery, no budget truncation)."""

import shutil

import pyarrow.compute as pc
import pyarrow.dataset as pads
import pytest

from methanol_web_crawler_ray.config import default_config
from methanol_web_crawler_ray.pipelines import bulk, simulator as sim
from methanol_web_crawler_ray.pipelines.hostloop import DictFetcher
from methanol_web_crawler_ray.sources import pagegen


def test_bulk_matches_ordered_visited_set(ray_session):
    d = pagegen.pages_dir_for("/root/testdata/sf0.001")
    cfg = default_config(depth_limit=6, external=False)
    seeds = ["http://host-0001.example/"]

    out = "/tmp/mwc_test_bulk"
    shutil.rmtree(out, ignore_errors=True)
    stats = bulk.crawl_bfs(cfg, d, seeds, out_dir=out, num_shards=4)
    assert stats["pages_parsed"] > 0

    wd = pads.dataset(out)
    pages = wd.to_table(filter=pc.field("kind") == "page",
                        columns=["url", "text"])
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


def test_bulk_robots_respected(ray_session):
    d = pagegen.pages_dir_for("/root/testdata/sf0.001")
    cfg = default_config(depth_limit=6)
    out = "/tmp/mwc_test_bulk_robots"
    shutil.rmtree(out, ignore_errors=True)
    bulk.crawl_bfs(cfg, d, ["http://host-0001.example/"], out_dir=out,
                   num_shards=4)
    urls = pads.dataset(out).to_table(
        filter=pc.field("kind") == "page", columns=["url"]
    ).column("url").to_pylist()
    assert not any("/private/s" in u for u in urls)
    assert any("/private/open/" in u for u in urls)
