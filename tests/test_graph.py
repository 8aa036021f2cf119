"""Fixed-point PageRank vs an in-process brute-force replay."""

from methanol_web_crawler_ray.pipelines import graph


def test_pagerank_vs_bruteforce(ray_session, sf_dir):
    out = {r["url"]: r["score"]
           for r in graph.link_pagerank(sf_dir).take_all()}

    edges = [(r["src"], r["dst"])
             for r in graph._edges_ds(sf_dir).take_all()]
    assert len(edges) == len(set(edges))  # distinct
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    nodes = {s for s, _ in edges} | {d for _, d in edges}
    scores = {n: graph.PR_SCALE for n in nodes}
    for _ in range(graph.PR_ITERS):
        inc = {n: 0 for n in nodes}
        for s, d in edges:
            inc[d] += scores[s] // deg[s]
        scores = {n: graph.PR_BASE
                  + (graph.PR_DAMP_NUM * inc[n]) // graph.PR_DAMP_DEN
                  for n in nodes}

    assert out == scores
    # sanity: some node gained rank above the no-inlink floor
    assert max(out.values()) > graph.PR_BASE


def test_pagerank_deterministic(ray_session, sf_dir):
    a = sorted(graph.link_pagerank(sf_dir).take_all(),
               key=lambda r: r["url"])
    b = sorted(graph.link_pagerank(sf_dir).take_all(),
               key=lambda r: r["url"])
    assert a == b


def test_large_path_parity_no_driver_state(ray_session, sf_dir, monkeypatch):
    """>GRAPH_DRIVER_GATE smoke: with the gate forced to 0 the engine
    must take the Dataset-native path everywhere — closed-graph
    left_semi join (no corpus-URL broadcast), co-partitioned score/label
    joins (no _fold_agg driver dict) — and produce EXACTLY the small
    path's fixed-point results."""
    small_pr = sorted(graph.link_pagerank(sf_dir).take_all(),
                      key=lambda r: r["url"])
    small_cc = sorted(graph.link_components(sf_dir).take_all(),
                      key=lambda r: r["url"])

    def no_fold(*a, **k):
        raise AssertionError("large path must not fold node state "
                             "onto the driver")

    monkeypatch.setattr(graph, "GRAPH_DRIVER_GATE", 0)
    monkeypatch.setattr(graph, "_fold_agg", no_fold)

    large_pr = sorted(graph.link_pagerank(sf_dir).take_all(),
                      key=lambda r: r["url"])
    assert large_pr == small_pr
    large_cc = sorted(graph.link_components(sf_dir).take_all(),
                      key=lambda r: r["url"])
    assert large_cc == small_cc


def test_components_vs_bruteforce(ray_session, sf_dir):
    out = {r["url"]: r["comp"]
           for r in graph.link_components(sf_dir).take_all()}
    edges = [(r["src"], r["dst"])
             for r in graph._edges_ds(sf_dir).take_all()]
    nbrs = {}
    for s, d in edges:
        nbrs.setdefault(s, set()).add(d)
        nbrs.setdefault(d, set()).add(s)
    labels = {n: n for n in nbrs}
    for _ in range(graph.CC_ITERS):
        labels = {n: min([labels[n]] + [labels[m] for m in nbrs[n]])
                  for n in nbrs}
    assert out == labels
    # the fixture's graph is multi-host: more than one component
    assert len(set(out.values())) > 1


def test_degrees_vs_bruteforce(ray_session, sf_dir):
    """(url, out_deg, in_deg) matches a direct count over the same
    distinct closed edge set; totals each equal the edge count."""
    out = {r["url"]: (r["out_deg"], r["in_deg"])
           for r in graph.link_degrees(sf_dir).take_all()}
    edges = [(r["src"], r["dst"])
             for r in graph._edges_ds(sf_dir).take_all()]
    exp = {}
    for s, d in edges:
        exp.setdefault(s, [0, 0])[0] += 1
        exp.setdefault(d, [0, 0])[1] += 1
    assert out == {u: (o, i) for u, (o, i) in exp.items()} and out
    assert sum(o for o, _ in out.values()) == len(edges)
    assert sum(i for _, i in out.values()) == len(edges)


def test_host_graph_vs_bruteforce(ray_session, sf_dir):
    """Host-pair counts equal a direct tally over the same closed
    distinct edge set; the grand total equals the edge count."""
    out = {(r["src_host"], r["dst_host"]): r["n_links"]
           for r in graph.link_host_graph(sf_dir).take_all()}
    edges = [(r["src"], r["dst"])
             for r in graph._edges_ds(sf_dir).take_all()]

    def host(u):
        p = u.split("/")
        return p[2] if len(p) > 2 else ""

    exp = {}
    for s, d in edges:
        k = (host(s), host(d))
        exp[k] = exp.get(k, 0) + 1
    assert out == exp and out
    assert sum(out.values()) == len(edges)


def test_reciprocal_vs_bruteforce(ray_session, sf_dir):
    out = {(r["url_a"], r["url_b"])
           for r in graph.link_reciprocal(sf_dir).take_all()}
    edges = {(r["src"], r["dst"])
             for r in graph._edges_ds(sf_dir).take_all()}
    exp = {(s, d) for s, d in edges
           if s < d and (d, s) in edges}
    assert out == exp and out


def test_triangles_vs_bruteforce(ray_session, sf_dir):
    got = int(graph.link_triangles(sf_dir)["n_triangles"].iloc[0])
    edges = {(r["src"], r["dst"])
             for r in graph._edges_ds(sf_dir).take_all()}
    und = {(min(s, d), max(s, d)) for s, d in edges if s != d}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    n = 0
    for a, b in und:
        n += len({x for x in adj[a] & adj[b] if x > b})
    assert got == n and got > 0


def test_hits_vs_bruteforce(ray_session, sf_dir):
    """Unnormalized integer HITS matches a direct replay over the same
    closed distinct edge set, on both size-gated paths."""
    out = {r["url"]: (r["hub"], r["auth"])
           for r in graph.link_hits(sf_dir).take_all()}
    edges = [(r["src"], r["dst"])
             for r in graph._edges_ds(sf_dir).take_all()]
    nodes = {s for s, _ in edges} | {d for _, d in edges}
    hub = {n: 1 for n in nodes}
    auth = {n: 0 for n in nodes}
    for _ in range(graph.HITS_ITERS):
        auth = {n: 0 for n in nodes}
        for s, d in edges:
            auth[d] += hub[s]
        hub = {n: 0 for n in nodes}
        for s, d in edges:
            hub[s] += auth[d]
    assert out == {n: (hub[n], auth[n]) for n in nodes}
    # mutual reinforcement concentrated mass: some hub outranks the rest
    assert max(h for h, _ in out.values()) > min(
        h for h, _ in out.values())


def test_hits_large_path_parity(ray_session, sf_dir, monkeypatch):
    """Gate forced to 0: the Dataset-native join path must produce the
    identical integer fixed point with no driver fold."""
    small = sorted(graph.link_hits(sf_dir).take_all(),
                   key=lambda r: r["url"])

    def no_fold(*a, **k):
        raise AssertionError("large path must not fold node state "
                             "onto the driver")

    monkeypatch.setattr(graph, "GRAPH_DRIVER_GATE", 0)
    monkeypatch.setattr(graph, "_fold_agg", no_fold)
    large = sorted(graph.link_hits(sf_dir).take_all(),
                   key=lambda r: r["url"])
    assert large == small


def test_degree_dist_vs_degrees(ray_session, sf_dir):
    """The histogram is exactly the value-grouped degrees table and
    conserves both node and edge mass."""
    from collections import Counter

    deg = graph.link_degrees(sf_dir).take_all()
    exp = Counter()
    for r in deg:
        exp[("in", r["in_deg"])] += 1
        exp[("out", r["out_deg"])] += 1
    out = {(r["direction"], r["degree"]): r["n_nodes"]
           for r in graph.degree_dist(sf_dir).take_all()}
    assert out == dict(exp)
    n_edges = graph._edges_ds(sf_dir).count()
    for dirn in ("in", "out"):
        assert sum(d * n for (dd, d), n in out.items()
                   if dd == dirn) == n_edges
        assert sum(n for (dd, _), n in out.items()
                   if dd == dirn) == len(deg)


def test_2hop_vs_bruteforce(ray_session, sf_dir):
    """Reachability counts match a BFS-2 set replay."""
    edges = [(r["src"], r["dst"])
             for r in graph._edges_ds(sf_dir).take_all()]
    adj: dict = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    exp = {}
    for s, nbrs in adj.items():
        reach = set(nbrs)
        for d in nbrs:
            reach |= adj.get(d, set())
        reach.discard(s)
        if reach:
            exp[s] = len(reach)
    got = {r["url"]: r["n_reach"]
           for r in graph.link_2hop(sf_dir).take_all()}
    assert got == exp
    # 2-hop dominates out-degree wherever both are defined
    assert all(got[s] >= len(adj[s] - {s}) for s in got)


def test_assortativity_vs_bruteforce(ray_session, sf_dir):
    """The six moments equal a direct replay over edges × degrees."""
    edges = [(r["src"], r["dst"])
             for r in graph._edges_ds(sf_dir).take_all()]
    out_d: dict = {}
    in_d: dict = {}
    for s, d in edges:
        out_d[s] = out_d.get(s, 0) + 1
        in_d[d] = in_d.get(d, 0) + 1
    xs = [out_d[s] for s, _ in edges]
    ys = [in_d[d] for _, d in edges]
    exp = (len(edges), sum(xs), sum(ys), sum(x * x for x in xs),
           sum(y * y for y in ys),
           sum(x * y for x, y in zip(xs, ys)))
    row = graph.link_assortativity(sf_dir).iloc[0]
    assert (row["n_edges"], row["sum_x"], row["sum_y"], row["sum_xx"],
            row["sum_yy"], row["sum_xy"]) == exp


def test_neighbor_jaccard_vs_bruteforce(ray_session, sf_dir):
    """Per-edge Jaccard equals a set-based sequential replay."""
    edges = [(r["src"], r["dst"])
             for r in graph._edges_ds(sf_dir).take_all()]
    und = {(min(s, d), max(s, d)) for s, d in edges if s != d}
    adj: dict = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    exp = {}
    for a, b in und:
        inter = len(adj[a] & adj[b])
        union = len(adj[a]) + len(adj[b]) - inter
        exp[(a, b)] = (inter, (1000 * inter) // union)
    got = {(r["url_a"], r["url_b"]): (r["n_common"], r["jaccard_permille"])
           for r in graph.link_neighbor_jaccard(sf_dir).take_all()}
    assert got == exp and len(got) == len(und) > 0
    # zero-common edges must be present, not dropped
    assert any(c == 0 for c, _ in got.values())


def test_trustrank_vs_bruteforce(ray_session, sf_dir):
    out = {r["url"]: r["score"]
           for r in graph.link_trustrank(sf_dir).take_all()}

    edges = [(r["src"], r["dst"])
             for r in graph._edges_ds(sf_dir).take_all()]
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    nodes = {s for s, _ in edges} | {d for _, d in edges}
    pfx = graph._trust_prefixes(graph.TRUST_HOSTS)
    tr = {n: n.startswith(pfx) for n in nodes}
    scores = {n: (graph.PR_SCALE if tr[n] else 0) for n in nodes}
    for _ in range(graph.PR_ITERS):
        inc = {n: 0 for n in nodes}
        for s, d in edges:
            inc[d] += scores[s] // deg[s]
        scores = {n: (graph.PR_BASE if tr[n] else 0)
                  + (graph.PR_DAMP_NUM * inc[n]) // graph.PR_DAMP_DEN
                  for n in nodes}

    assert out == scores
    # trust decays with distance: untrusted-host pages linked from the
    # seed hosts carry rank, unreachable ones carry none
    untr = [v for n, v in out.items() if not tr[n]]
    assert any(v > 0 for v in untr) and any(v == 0 for v in untr)


def test_trustrank_large_path_parity(ray_session, sf_dir, monkeypatch):
    small = sorted(graph.link_trustrank(sf_dir).take_all(),
                   key=lambda r: r["url"])

    def no_fold(*a, **k):
        raise AssertionError("large path must not fold node state "
                             "onto the driver")

    monkeypatch.setattr(graph, "GRAPH_DRIVER_GATE", 0)
    monkeypatch.setattr(graph, "_fold_agg", no_fold)
    large = sorted(graph.link_trustrank(sf_dir).take_all(),
                   key=lambda r: r["url"])
    assert large == small


def test_frontier_candidates_bruteforce(ray_session, sf_dir):
    """Open-side candidates == sequential replay over the live canon
    chain minus the pages set."""
    import pyarrow.parquet as pq

    from methanol_web_crawler_ray.sources import pagegen
    from methanol_web_crawler_ray.stages.extract import (
        page_canonicalize_links)

    pdir = pagegen.pages_dir_for(sf_dir)
    pages = set(pq.read_table(f"{pdir}/pages.parquet", columns=["url"])
                .column("url").to_pylist())
    pairs = {(r["url"], r["canon"])
             for r in page_canonicalize_links(pdir).take_all()
             if r["canon"] is not None and r["canon"] not in pages}
    exp = {}
    for src, dst in pairs:
        e = exp.setdefault(dst, [0, set(), None])
        e[0] += 1
        e[1].add(src.split("/")[2])
        e[2] = src if e[2] is None else min(e[2], src)
    got = {r["url"]: (r["n_inlinks"], r["n_src_hosts"], r["first_src"])
           for r in graph.frontier_candidates(sf_dir).take_all()}
    assert got == {d: (n, len(h), m) for d, (n, h, m) in exp.items()}
    assert len(got) > 0


def test_kcore_bruteforce(ray_session, sf_dir):
    """Bounded peeling == sequential replay; the KCORE_ITERS contract
    (NOT the fixpoint core) is pinned explicitly."""
    from collections import Counter

    edges = {(r["src"], r["dst"])
             for r in graph._edges_ds(sf_dir).take_all()}
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes0 = {n for e in und for n in e}
    cur = set(und)
    keep = set()
    for _ in range(graph.KCORE_ITERS):
        deg = Counter()
        for a, b in cur:
            deg[a] += 1
            deg[b] += 1
        keep = {n for n, c in deg.items() if c >= graph.KCORE_K}
        cur = {(a, b) for a, b in cur if a in keep and b in keep}
    exp = {n: int(n in keep) for n in nodes0}
    got = {r["url"]: r["in_core"]
           for r in graph.link_kcore(sf_dir).take_all()}
    assert got == exp
    # the peel actually removes something and keeps something
    assert 0 < sum(exp.values()) < len(exp)


def test_kcore_large_path_parity(ray_session, sf_dir, monkeypatch):
    """gate=0 forces the left_semi-join restriction path; output must
    equal the broadcast small path bit-for-bit."""
    small = sorted(graph.link_kcore(sf_dir).take_all(),
                   key=lambda r: r["url"])
    monkeypatch.setattr(graph, "GRAPH_DRIVER_GATE", 0)
    large = sorted(graph.link_kcore(sf_dir).take_all(),
                   key=lambda r: r["url"])
    assert large == small


def test_lpa_vs_bruteforce_and_large_parity(ray_session, sf_dir,
                                            monkeypatch):
    """Bounded sync LPA == a pure-python replay (neighbour-vote mode
    with (count desc, label asc) tie-break from label_0 = own url over
    the distinct undirected closed graph), and the >gate Dataset path
    matches the small path exactly."""
    small = sorted((r["url"], r["community"])
                   for r in graph.link_lpa(sf_dir).take_all())

    # brute-force replay from the closed edge set
    edges = {(r["src"], r["dst"])
             for r in graph._edges_ds(sf_dir).take_all()}
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    nbr = {}
    for a, b in und:
        nbr.setdefault(a, set()).add(b)
        nbr.setdefault(b, set()).add(a)
    labels = {n: n for n in nbr}
    for _ in range(graph.LPA_ITERS):
        nxt = {}
        for n, ns in nbr.items():
            votes = {}
            for m in ns:
                votes[labels[m]] = votes.get(labels[m], 0) + 1
            nxt[n] = min(votes, key=lambda L: (-votes[L], L))
        labels = nxt
    assert small == sorted(labels.items()) and len(small) > 0
    # communities actually coarsen: fewer distinct labels than nodes
    assert len({c for _u, c in small}) < len(small)

    monkeypatch.setattr(graph, "GRAPH_DRIVER_GATE", 0)
    large = sorted((r["url"], r["community"])
                   for r in graph.link_lpa(sf_dir).take_all())
    assert large == small


def test_host_pagerank_vs_bruteforce(ray_session, sf_dir, monkeypatch):
    """Host PageRank == a pure-python replay of the integer fixed point
    over the distinct host edge set; large path matches."""
    edges = {(r["src"], r["dst"])
             for r in graph._edges_ds(sf_dir).take_all()}
    hedges = {(a.split("/")[2], b.split("/")[2]) for a, b in edges}
    hedges = {(a, b) for a, b in hedges if a != b}
    deg = {}
    for a, _b in hedges:
        deg[a] = deg.get(a, 0) + 1
    nodes = sorted({a for a, _ in hedges} | {b for _, b in hedges})
    sc = {n: graph.PR_SCALE for n in nodes}
    for _ in range(graph.PR_ITERS):
        inflow = {n: 0 for n in nodes}
        for a, b in hedges:
            inflow[b] += sc[a] // deg[a]
        sc = {n: graph.PR_BASE
              + (graph.PR_DAMP_NUM * inflow[n]) // graph.PR_DAMP_DEN
              for n in nodes}
    small = sorted((r["host"], r["score"])
                   for r in graph.host_pagerank(sf_dir).take_all())
    assert small == sorted(sc.items()) and len(small) > 0

    monkeypatch.setattr(graph, "GRAPH_DRIVER_GATE", 0)
    large = sorted((r["host"], r["score"])
                   for r in graph.host_pagerank(sf_dir).take_all())
    assert large == small
