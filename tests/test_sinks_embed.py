"""Target/log sinks, politeness queue, and embedding entry points."""

import os
import shutil

import pickle
import pytest

from methanol_web_crawler_ray.config import default_config
from methanol_web_crawler_ray.pipelines import crawl, embed, sinks
from methanol_web_crawler_ray.state.politeness import (PolitenessQueue,
                                                       effective_delay)
from methanol_web_crawler_ray.sources import pagegen


def test_politeness_queue():
    q = PolitenessQueue()
    q.update("a", 10.0)
    q.update("b", 5.0)
    q.update("c", 20.0)
    assert q.peek_next() == (5.0, "b")
    assert q.due_in_window(15.0) == ["b", "a"]
    assert q.pop_due(6.0) == "b"
    assert q.pop_due(6.0) is None
    q.update("a", 30.0)  # re-key
    assert q.peek_next() == (20.0, "c")
    assert len(q) == 2
    assert effective_delay(10.0, 4.0) == 10.0
    assert effective_delay(0.0, 4.0) == 4.0


def test_exec_provided():
    cfg = default_config(robotstxt=False)
    log, frontier = embed.exec_provided(
        cfg, "http://x.example/",
        b'<html><a href="a.html">a</a><a href="b.html">b</a></html>',
    )
    assert [v[0] for v in log.visits] == ["http://x.example/"]
    assert frontier == ["http://x.example/a.html", "http://x.example/b.html"]
    assert log.texts[0][1].startswith(b"<html>")


def test_exec_once_fixture():
    from methanol_web_crawler_ray.pipelines.hostloop import DictFetcher

    d = pagegen.pages_dir_for("/root/testdata/sf0.001")
    fetch = DictFetcher(pagegen.load_fetch_dict(d))
    cfg = default_config()
    log, frontier = embed.exec_once(cfg, "host-0001.example", fetch)
    assert log.visits and frontier


@pytest.fixture(scope="module")
def sink_ckpt(ray_session):
    d = pagegen.pages_dir_for("/root/testdata/sf0.001")
    cfg = default_config(depth_limit=4)
    ck = "/tmp/mwc_test_sinks_ck"
    shutil.rmtree(ck, ignore_errors=True)
    crawl.crawl_rounds(cfg, d, ["http://host-0001.example/"], ckpt_dir=ck,
                       concurrency=2)
    return ck


def test_write_targets_dedup(ray_session, sink_ckpt):
    out = "/tmp/mwc_test_sinks_targets"
    shutil.rmtree(out, ignore_errors=True)
    counts = sinks.write_targets(sink_ckpt, out,
                                 default_config(depth_limit=4))
    assert counts.get("html", 0) > 0
    import glob

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    tbl = pads.dataset(os.path.join(out, "ft_html")).to_table()
    hashes = tbl.column("url_hash").to_pylist()
    assert len(hashes) == len(set(hashes))  # UNIQUE url_hash (S9/D2)
    assert "attr_html" in tbl.column_names
    # every file in one ft_<name> dir carries the SAME declared-attribute
    # schema (the master's fixed CREATE TABLE), regardless of which attrs
    # each row happened to set
    schemas = {
        tuple(pq.read_schema(f).names)
        for f in glob.glob(os.path.join(out, "ft_html", "*.parquet"))
    }
    assert len(schemas) == 1
    assert set(next(iter(schemas))) == {"url", "url_hash", "date",
                                        "attr_html", "attr_title"}
    # date = first round the target was reported in (not always 0)
    dates = tbl.column("date").to_pylist()
    assert max(dates) > 0


def test_crawl_log_roundtrip(ray_session, sink_ckpt):
    out = "/tmp/mwc_test_sinks_log"
    shutil.rmtree(out, ignore_errors=True)
    n = sinks.write_crawl_log(sink_ckpt, out)
    assert n > 0
    log = sinks.read_crawl_log(out).take_all()
    hashes = [r["url_hash"] for r in log]
    assert len(hashes) == len(set(hashes))
    assert 0 < len(hashes) <= n


def test_export_corpus_resumable(ray_session):
    """Partitioned export skips finished buckets on re-run, rebuilds
    partials, and the completed corpus equals the store's pages."""
    import glob
    import os
    import shutil

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from methanol_web_crawler_ray.pipelines.sinks import export_corpus
    from methanol_web_crawler_ray.sources import pagegen

    d = pagegen.pages_dir_for("/root/testdata/sf0.001")
    out = "/tmp/mwc_test_export"
    shutil.rmtree(out, ignore_errors=True)

    r1 = export_corpus(d, out)
    assert r1["skipped"] == 0 and r1["written"] > 1
    total = pads.dataset(out, partitioning="hive").count_rows()
    n_pages = pq.read_metadata(f"{d}/pages.parquet").num_rows
    assert total == n_pages

    # simulate a crashed run: one bucket unfinished (marker gone,
    # partial files present), the rest done
    done = sorted(int(m.rsplit(".", 1)[1])
                  for m in glob.glob(os.path.join(out, "_DONE.*")))
    victim = done[-1]
    os.remove(os.path.join(out, f"_DONE.{victim}"))
    part = glob.glob(os.path.join(out, f"bucket={victim}", "*"))[0]
    with open(part, "wb") as f:
        f.write(b"garbage partial")
    keepf = glob.glob(os.path.join(out, f"bucket={done[0]}", "*"))[0]
    keep_bytes = open(keepf, "rb").read()  # finished bucket: untouched

    r2 = export_corpus(d, out)
    assert r2["written"] == 1 and r2["skipped"] == r1["written"] - 1
    assert open(keepf, "rb").read() == keep_bytes  # bucket skipped
    assert pads.dataset(out, partitioning="hive").count_rows() == total

    # texts byte-equal the golden column for every exported row
    exp = {r["url"]: r["text"]
           for r in pq.read_table(f"{d}/pages.parquet",
                                  columns=["url", "text"]).to_pylist()}
    got = pads.dataset(out, partitioning="hive") \
        .to_table(columns=["url", "text"]).to_pylist()
    assert all(exp[r["url"]] == r["text"] for r in got)

    r3 = export_corpus(d, out)               # idempotent when complete
    assert r3 == {"written": 0, "skipped": r1["written"]}
