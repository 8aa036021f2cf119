"""Link-graph analytics over the crawled pages — PageRank as the
iterative-algorithm exemplar (power iteration with damping over the
extract→canonicalize edge list).

Everything is decided in FIXED-POINT INTEGERS (scores scaled by
``PR_SCALE``; per-edge contribution ``score // out_degree``; damping
``base + (85 * inflow) // 100``) so integer associativity makes the
result independent of summation order and the DuckDB oracle replays
every iteration bit-for-bit — no float-reduction ambiguity.

Scale shape: the EDGE table is the big side and never leaves the
cluster — one ``map_batches`` (per-edge contributions from a broadcast
score/degree map) + one ``groupby(dst).sum`` per iteration; edges are
materialized once into the object store and re-streamed per iteration
(spillable).  The node-sized score vector is the small side (|V| ≪ |E|
on the web); at 10^10 nodes the driver fold/broadcast becomes a
co-partitioned join on src — the same documented small-side gate as
``relops.segment_revenue``.  Dangling nodes (no outlinks) receive rank
but emit none (their mass is dropped, the simple-PageRank convention,
identical on both sides).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

PR_SCALE = 1_000_000
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100  # damping 0.85, exact in integers
PR_ITERS = 3
PR_BASE = (PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM)) // PR_DAMP_DEN

# below this many edge rows the per-iteration fold runs map-side
# partials + a driver pandas combine instead of Ray's sort-based
# string-key groupby (measured ~25 s/iteration on 600 k string-keyed
# rows vs <1 s for the fold — the same gate precedent as
# textops.hot_keys); above it the distributed groupby takes over (the
# 10^10-edge shape, where partial rows no longer fit one driver)
GRAPH_DRIVER_GATE = 5_000_000


def _fold_agg(ds, key: str, col: str, how: str, n_rows: int) -> dict:
    """key → aggregate(col) over ``ds``: in-batch partial aggregation
    always; combine on the driver below GRAPH_DRIVER_GATE (partial rows
    are ≤ touched-nodes × batches), distributed groupby above it.
    ``how`` is 'sum' or 'min' — both associative, so partial+combine is
    exact."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({key: df[key] if key in df
                                 else pd.Series([], dtype="string"),
                                 col: pd.Series([], dtype=df[col].dtype
                                                if col in df else "int64")})
        g = df.groupby(key, sort=False)[col].agg(how)
        return pd.DataFrame({key: g.index, col: g.values})

    pre = ds.map_batches(partial, batch_format="pandas")
    if n_rows <= GRAPH_DRIVER_GATE:
        parts = pre.to_pandas()
        g = parts.groupby(key, sort=False)[col].agg(how)
        return dict(zip(g.index, g.values))
    agg = pre.groupby(key).sum(col) if how == "sum" \
        else pre.groupby(key).min(col)
    df = agg.to_pandas()
    return dict(zip(df[key], df[f"{how}({col})"]))


def _edges_ds(sf_dir: str):
    """Distinct (src, dst) edges: the live extract→canonicalize chain
    (M5-M7 + M1-M4, independently oracled as page_canonicalize),
    restricted to dst pages that exist in the store (a closed graph)."""
    import pyarrow.parquet as pq
    import ray

    from ..sources import pagegen
    from ..stages.extract import page_canonicalize_links

    pdir = pagegen.pages_dir_for(sf_dir)
    page_urls = frozenset(
        pq.read_table(f"{pdir}/pages.parquet", columns=["url"])
        .column("url").to_pylist())
    pset_ref = ray.put(page_urls)

    def edges_fn(batch: pa.Table, _r=pset_ref) -> pa.Table:
        ps = ray.get(_r)
        pairs = sorted({
            (s, d) for s, d in zip(batch.column("url").to_pylist(),
                                   batch.column("canon").to_pylist())
            if d is not None and d in ps})
        return pa.table({
            "src": pa.array([p[0] for p in pairs], pa.string()),
            "dst": pa.array([p[1] for p in pairs], pa.string()),
        })

    # global distinct via one two-key groupby (the in-batch dedup above
    # keeps the shuffle rows minimal)
    return (page_canonicalize_links(pdir)
            .map_batches(edges_fn, batch_format="pyarrow")
            .groupby(["src", "dst"]).count()
            .select_columns(["src", "dst"]))


def link_pagerank(sf_dir: str, iters: int = PR_ITERS):
    """(url, score): fixed-point PageRank after ``iters`` power
    iterations over the page link graph.  score_0 = PR_SCALE for every
    node; score_{t+1}(n) = PR_BASE + (85 · Σ_{src→n} score_t(src) //
    deg(src)) // 100."""
    import ray
    import ray.data

    edges = _edges_ds(sf_dir).materialize()
    n_edges = edges.count()  # metadata on a materialized dataset

    def ones(col):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({col: df[col],
                                 "c": np.ones(len(df), dtype=np.int64)})
        return f

    deg = {k: int(v) for k, v in _fold_agg(
        edges.map_batches(ones("src"), batch_format="pandas"),
        "src", "c", "sum", n_edges).items()}
    indeg = _fold_agg(
        edges.map_batches(ones("dst"), batch_format="pandas"),
        "dst", "c", "sum", n_edges)
    nodes = sorted(set(deg) | set(indeg))
    scores = {n: PR_SCALE for n in nodes}

    for _ in range(iters):
        ref = ray.put((scores, deg))

        def contrib(df: pd.DataFrame, _r=ref) -> pd.DataFrame:
            sc, dg = ray.get(_r)
            c = (df["src"].map(sc).astype("int64")
                 // df["src"].map(dg).astype("int64"))
            return pd.DataFrame({"dst": df["dst"],
                                 "c": c.astype("int64")})

        inc = _fold_agg(
            edges.map_batches(contrib, batch_format="pandas"),
            "dst", "c", "sum", n_edges)
        scores = {n: PR_BASE
                  + (PR_DAMP_NUM * int(inc.get(n, 0))) // PR_DAMP_DEN
                  for n in nodes}

    return ray.data.from_arrow(pa.table({
        "url": pa.array(nodes, pa.string()),
        "score": pa.array([scores[n] for n in nodes], pa.int64()),
    }))


def pagerank_oracle_sql(pdir: str, iters: int = PR_ITERS) -> str:
    """The DuckDB replay: edges derived from the golden canon table
    (value-equal to the live chain per the page_canonicalize gate),
    then the same fixed-point iterations unrolled as CTE stages."""
    cte = [
        f"pl AS (SELECT url AS src, canon AS dst FROM "
        f"read_parquet('{pdir}/golden_canon.parquet') "
        "WHERE canon IS NOT NULL), ",
        f"pu AS (SELECT DISTINCT url FROM "
        f"read_parquet('{pdir}/pages.parquet')), ",
        "e AS (SELECT DISTINCT pl.src, pl.dst FROM pl "
        "JOIN pu ON pu.url = pl.dst), ",
        "deg AS (SELECT src, count(*)::BIGINT AS d FROM e GROUP BY src), ",
        "nodes AS (SELECT DISTINCT u FROM "
        "(SELECT src AS u FROM e UNION ALL SELECT dst AS u FROM e)), ",
        f"s0 AS (SELECT u, {PR_SCALE}::BIGINT AS sc FROM nodes), ",
    ]
    for i in range(1, iters + 1):
        cte.append(
            f"s{i} AS (SELECT n.u, {PR_BASE} + ({PR_DAMP_NUM} * "
            f"COALESCE(SUM(s.sc // d.d), 0)) // {PR_DAMP_DEN} AS sc "
            "FROM nodes n LEFT JOIN e ON e.dst = n.u "
            f"LEFT JOIN s{i - 1} s ON s.u = e.src "
            "LEFT JOIN deg d ON d.src = e.src GROUP BY n.u), ")
    return ("WITH " + "".join(cte)[:-2] + " "
            f"SELECT u AS url, sc::BIGINT AS score FROM s{iters}")


CC_ITERS = 5


def link_components(sf_dir: str, iters: int = CC_ITERS):
    """(url, comp): connected components of the UNDIRECTED link graph by
    min-label propagation — comp is the lexicographically smallest URL
    reachable within ``iters`` hops (label_0 = own url; label_{t+1} =
    min(label_t, min over neighbours' label_t)).  A fixed iteration
    count keeps the op exactly oracle-replayable; full convergence needs
    diameter rounds (at production scale you iterate with a
    changed-label counter as the stop condition — same per-round shape).
    Per round: one map over edges (emitting both directions) + one
    groupby-min — the standard BSP components step."""
    import ray
    import ray.data

    edges = _edges_ds(sf_dir).materialize()
    n_edges = edges.count()

    def ones(col):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({col: df[col],
                                 "c": np.ones(len(df), dtype=np.int64)})
        return f

    srcs = _fold_agg(
        edges.map_batches(ones("src"), batch_format="pandas"),
        "src", "c", "sum", n_edges)
    dsts = _fold_agg(
        edges.map_batches(ones("dst"), batch_format="pandas"),
        "dst", "c", "sum", n_edges)
    nodes = sorted(set(srcs) | set(dsts))
    labels = {n: n for n in nodes}

    for _ in range(iters):
        ref = ray.put(labels)

        def prop(df: pd.DataFrame, _r=ref) -> pd.DataFrame:
            lb = ray.get(_r)
            return pd.DataFrame({
                "n": pd.concat([df["dst"], df["src"]], ignore_index=True),
                "l": pd.concat([df["src"].map(lb), df["dst"].map(lb)],
                               ignore_index=True),
            })

        inflow = _fold_agg(
            edges.map_batches(prop, batch_format="pandas"),
            "n", "l", "min", 2 * n_edges)
        labels = {n: min(labels[n], inflow.get(n, labels[n]))
                  for n in nodes}

    return ray.data.from_arrow(pa.table({
        "url": pa.array(nodes, pa.string()),
        "comp": pa.array([labels[n] for n in nodes], pa.string()),
    }))


def components_oracle_sql(pdir: str, iters: int = CC_ITERS) -> str:
    """DuckDB replay of the same K min-label rounds over the undirected
    edge set derived from the golden canon table."""
    cte = [
        f"pl AS (SELECT url AS src, canon AS dst FROM "
        f"read_parquet('{pdir}/golden_canon.parquet') "
        "WHERE canon IS NOT NULL), ",
        f"pu AS (SELECT DISTINCT url FROM "
        f"read_parquet('{pdir}/pages.parquet')), ",
        "e AS (SELECT DISTINCT pl.src, pl.dst FROM pl "
        "JOIN pu ON pu.url = pl.dst), ",
        "ue AS (SELECT src AS a, dst AS b FROM e "
        "UNION SELECT dst, src FROM e), ",
        "nodes AS (SELECT DISTINCT u FROM "
        "(SELECT src AS u FROM e UNION ALL SELECT dst AS u FROM e)), ",
        "l0 AS (SELECT u, u AS lb FROM nodes), ",
    ]
    for i in range(1, iters + 1):
        cte.append(
            f"l{i} AS (SELECT p.u, LEAST(p.lb, "
            "COALESCE(MIN(q.lb), p.lb)) AS lb "
            f"FROM l{i - 1} p LEFT JOIN ue ON ue.a = p.u "
            f"LEFT JOIN l{i - 1} q ON q.u = ue.b "
            "GROUP BY p.u, p.lb), ")
    return ("WITH " + "".join(cte)[:-2] + " "
            f"SELECT u AS url, lb AS comp FROM l{iters}")
