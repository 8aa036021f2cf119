"""file:// reader (S4): local-filesystem crawl through the same kernel."""

import os
import shutil

from methanol_web_crawler_ray.config import default_config
from methanol_web_crawler_ray.pipelines import simulator as sim
from methanol_web_crawler_ray.sources.filestore import (DispatchFetcher,
                                                        FileFetcher)


def _mk(root):
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(os.path.join(root, "sub"))
    with open(os.path.join(root, "index.html"), "w") as f:
        f.write('<html><a href="a.html">a</a>'
                '<a href="sub/b.html">b</a></html>')
    with open(os.path.join(root, "a.html"), "w") as f:
        f.write("<html>leaf a</html>")
    with open(os.path.join(root, "sub", "b.html"), "w") as f:
        f.write('<html><a href="../a.html">up</a></html>')
    with open(os.path.join(root, "secret.html"), "w") as f:
        f.write("<html>outside jail</html>")
    return root


def test_file_crawl_inline():
    root = _mk("/tmp/mwc_test_files")
    cfg = default_config(robotstxt=False, depth_limit=4)
    f = FileFetcher()
    # bare '/'-prefixed seed → strtourl guesses file:// (str.c:35-66)
    r = sim.simulate_single_worker(cfg, f, [os.path.join(root, "index.html")])
    urls = [v[0] for v in r.visits]
    assert f"file://{root}/index.html" in urls
    assert f"file://{root}/a.html" in urls
    assert f"file://{root}/sub/b.html" in urls
    # file bodies come back verbatim
    assert r.texts[f"file://{root}/a.html"] == b"<html>leaf a</html>"


def test_file_fetcher_root_confinement():
    root = _mk("/tmp/mwc_test_files2")
    jail = FileFetcher(root=os.path.join(root, "sub"))
    assert jail.get(f"file://{root}/sub/b.html") is not None
    assert jail.get(f"file://{root}/a.html") is None  # escapes the root
    assert jail.get(f"file://{root}/sub/../secret.html") is None


def test_dispatch_fetcher():
    from methanol_web_crawler_ray.pipelines.hostloop import (DictFetcher,
                                                            PageRow)

    root = _mk("/tmp/mwc_test_files3")
    d = DispatchFetcher({
        "file": FileFetcher(),
        "http": DictFetcher({"http://h.x/": PageRow(url="http://h.x/",
                                                    body=b"web")}),
    })
    assert d.get(f"file://{root}/a.html").body == b"<html>leaf a</html>"
    assert d.get("http://h.x/").body == b"web"
    assert d.get("ftp://nope/") is None
