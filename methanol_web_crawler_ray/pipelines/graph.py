"""Link-graph analytics over the crawled pages — PageRank as the
iterative-algorithm exemplar (power iteration with damping over the
extract→canonicalize edge list).

Everything is decided in FIXED-POINT INTEGERS (scores scaled by
``PR_SCALE``; per-edge contribution ``score // out_degree``; damping
``base + (85 * inflow) // 100``) so integer associativity makes the
result independent of summation order and the DuckDB oracle replays
every iteration bit-for-bit — no float-reduction ambiguity.

Scale shape — TWO paths gated on edge count, same integer semantics:

* **small** (≤ ``GRAPH_DRIVER_GATE`` edges): per-iteration map-side
  partials folded into a driver dict and re-broadcast.  This is the
  latency path — Ray's sort-based string-key groupby costs ~25 s per
  iteration on 600 k rows where the fold costs <1 s (the same gate
  precedent as textops.hot_keys).  The driver holds one node-sized
  dict, fine below the gate by definition.
* **large** (> gate, the 10^10-node shape): NOTHING node- or
  edge-sized ever lives on the driver.  Scores/labels are themselves
  Datasets; each power iteration is ``edges ⋈ scores`` on src (hash
  join, co-partitioned) → per-edge contribution map → ``groupby(dst)
  .sum`` → ``nodes ⟕ inflow`` — three all-to-all exchanges per
  iteration, the standard BSP shape.  The static ``edges ⋈ deg`` side
  is materialized once and re-streamed per iteration (spillable).
  The closed-graph restriction (dst must exist in the page store) is
  a distributed ``left_semi`` join against the pages table above the
  gate, a broadcast ``pc.is_in`` filter below it.

Dangling nodes (no outlinks) receive rank but emit none (their mass
is dropped, the simple-PageRank convention, identical on both sides).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

PR_SCALE = 1_000_000
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100  # damping 0.85, exact in integers
PR_ITERS = 3
PR_BASE = (PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM)) // PR_DAMP_DEN

# driver-fold / broadcast gate (rows): below it the per-iteration fold
# runs map-side partials + a driver pandas combine and the closed-graph
# filter broadcasts the page-URL set; above it everything stays
# Dataset-shaped (hash joins + distributed groupby) and the driver
# holds only scalars
GRAPH_DRIVER_GATE = 5_000_000


EDGE_SCHEMA = pa.schema([("src", pa.string()), ("dst", pa.string())])


def _num_partitions(n_rows: int) -> int:
    """Hash-join partition count: enough that one partition's build side
    fits a worker heap at scale, bounded for small inputs.  Tiny inputs
    (e.g. the host graph at sandbox scale) get ONE partition: with more
    partitions than distinct keys, a hash partition can receive no left
    rows at all and Ray materializes it as a schema-less empty table
    that pyarrow's join rejects ("No match for key field reference")."""
    if n_rows < 4096:
        return 1
    return int(max(8, min(256, n_rows // 2_000_000 + 8)))


def _fold_agg(ds, key: str, col: str, how: str, n_rows: int) -> dict:
    """key → aggregate(col) over ``ds`` as a DRIVER DICT: in-batch
    partial aggregation, then combine on the driver.  ``how`` is 'sum'
    or 'min' — both associative, so partial+combine is exact.

    SMALL-PATH ONLY: callers must be behind a ≤GRAPH_DRIVER_GATE (or
    equivalent) size gate — the result is node-sized driver state by
    construction.  The >gate pipelines (_pagerank_large /
    _components_large) never call this; they keep aggregates as
    Datasets."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({key: df[key] if key in df
                                 else pd.Series([], dtype="string"),
                                 col: pd.Series([], dtype=df[col].dtype
                                                if col in df else "int64")})
        g = df.groupby(key, sort=False)[col].agg(how)
        return pd.DataFrame({key: g.index, col: g.values})

    pre = ds.map_batches(partial, batch_format="pandas")
    parts = pre.to_pandas()
    g = parts.groupby(key, sort=False)[col].agg(how)
    return dict(zip(g.index, g.values))


def _edges_ds(sf_dir: str):
    """Distinct (src, dst) edges: the live extract→canonicalize chain
    (M5-M7 + M1-M4, independently oracled as page_canonicalize),
    restricted to dst pages that exist in the store (a closed graph).

    The closed-graph membership test is size-gated: ≤gate pages →
    broadcast the URL column once (``ray.put``) and filter batches with
    ``pc.is_in`` (zero shuffle); >gate → distributed ``left_semi`` hash
    join against the pages table (never driver-resident)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray
    import ray.data

    from ..sources import pagegen
    from ..stages.extract import page_canonicalize_links

    pdir = pagegen.pages_dir_for(sf_dir)
    pages_path = f"{pdir}/pages.parquet"
    n_pages = pq.ParquetFile(pages_path).metadata.num_rows

    def pair_fn(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_valid(batch.column("canon")))
        t = pa.table({"src": t.column("src" if "src" in t.column_names
                                      else "url"),
                      "dst": t.column("canon")})
        # in-batch dedup keeps the shuffle rows minimal
        return t.group_by(["src", "dst"]).aggregate([])

    pairs = page_canonicalize_links(pdir).map_batches(
        pair_fn, batch_format="pyarrow")

    if n_pages <= GRAPH_DRIVER_GATE:
        urls = pq.read_table(pages_path, columns=["url"]) \
            .column("url").combine_chunks()
        ref = ray.put(urls)

        def closed_fn(batch: pa.Table, _r=ref) -> pa.Table:
            return batch.filter(
                pc.is_in(batch.column("dst"), value_set=ray.get(_r)))

        closed = pairs.map_batches(closed_fn, batch_format="pyarrow")
    else:
        pages = ray.data.read_parquet(pages_path, columns=["url"])
        closed = pairs.join(pages, "left_semi", _num_partitions(n_pages),
                            on=("dst",), right_on=("url",))

    # global distinct via one two-key groupby (cheap after in-batch
    # dedup); ensure_schema pins empty aggregate blocks so downstream
    # hash joins always see the key columns
    from ._util import ensure_schema

    return ensure_schema(
        closed.groupby(["src", "dst"]).count().select_columns(
            ["src", "dst"]),
        pa.schema([("src", pa.string()), ("dst", pa.string())]))


def _nodes_ds(edges):
    """Distinct node URLs (src ∪ dst) as a Dataset."""
    from ._util import ensure_schema, rename

    s = rename(edges.select_columns(["src"]), {"src": "url"})
    d = rename(edges.select_columns(["dst"]), {"dst": "url"})
    return ensure_schema(
        s.union(d).groupby("url").count().select_columns(["url"]),
        pa.schema([("url", pa.string())]))


def link_pagerank(sf_dir: str, iters: int = PR_ITERS):
    """(url, score): fixed-point PageRank after ``iters`` power
    iterations over the page link graph.  score_0 = PR_SCALE for every
    node; score_{t+1}(n) = PR_BASE + (85 · Σ_{src→n} score_t(src) //
    deg(src)) // 100."""
    from ._util import materialize_clean

    edges = materialize_clean(_edges_ds(sf_dir), EDGE_SCHEMA)
    n_edges = edges.count()  # metadata on a materialized dataset
    if n_edges <= GRAPH_DRIVER_GATE:
        return _pagerank_small(edges, n_edges, iters)
    return _pagerank_large(edges, n_edges, iters)


# TrustRank teleport whitelist: the crawl's seed hosts (the operator is
# personalized PageRank — Gyöngyi et al. 2004 — with the teleport mass
# restricted to a vetted seed set, the classic spam-demotion signal a
# frontier scheduler feeds on)
TRUST_HOSTS = ("host-0000.example", "host-0001.example",
               "host-0002.example")


def _trust_prefixes(hosts) -> tuple:
    return tuple(f"http://{h}/" for h in hosts)


def link_trustrank(sf_dir: str, iters: int = PR_ITERS,
                   hosts: tuple = TRUST_HOSTS):
    """(url, score): TrustRank — the same integer fixed point as
    link_pagerank but with BOTH the initial mass and the per-iteration
    teleport base restricted to pages on the trusted seed hosts:
    score_0 = PR_SCALE·[trusted]; score_{t+1}(n) = PR_BASE·[trusted(n)]
    + (85 · Σ_{src→n} score_t(src) // deg(src)) // 100.  Identical
    exchange shape (and size gate) to PageRank — the trusted flag is a
    vectorized per-node prefix test, never a broadcast set."""
    from ._util import materialize_clean

    edges = materialize_clean(_edges_ds(sf_dir), EDGE_SCHEMA)
    n_edges = edges.count()
    pfx = _trust_prefixes(hosts)
    if n_edges <= GRAPH_DRIVER_GATE:
        return _pagerank_small(edges, n_edges, iters, trusted=pfx)
    return _pagerank_large(edges, n_edges, iters, trusted=pfx)


def _pagerank_small(edges, n_edges: int, iters: int, trusted=None):
    """≤gate: driver-folded score/degree dicts re-broadcast per
    iteration (one ray.put per iteration, freed by replacing the ref —
    one live copy)."""
    import ray
    import ray.data

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
    if trusted is None:
        base = {n: PR_BASE for n in nodes}
        scores = {n: PR_SCALE for n in nodes}
    else:
        tr = {n: n.startswith(trusted) for n in nodes}
        base = {n: (PR_BASE if tr[n] else 0) for n in nodes}
        scores = {n: (PR_SCALE if tr[n] else 0) for n in nodes}

    ref = None
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
        scores = {n: base[n]
                  + (PR_DAMP_NUM * int(inc.get(n, 0))) // PR_DAMP_DEN
                  for n in nodes}
        del ref  # single live broadcast copy across iterations

    return ray.data.from_arrow(pa.table({
        "url": pa.array(nodes, pa.string()),
        "score": pa.array([scores[n] for n in nodes], pa.int64()),
    }))


def _pagerank_large(edges, n_edges: int, iters: int, trusted=None):
    """>gate: scores stay a DATASET; each iteration is
    edges⋈deg⋈scores (hash join on src) → contribution map →
    groupby(dst).sum → nodes⟕inflow.  No node-sized driver structure,
    no whole-graph broadcast."""
    import pyarrow.compute as pc

    from ._util import ensure_schema, materialize_clean, rename

    npart = _num_partitions(n_edges)
    deg_schema = pa.schema([("src", pa.string()), ("deg", pa.int64())])
    deg = materialize_clean(
        ensure_schema(
            rename(edges.groupby("src").count(), {"count()": "deg"}),
            deg_schema),
        deg_schema)
    # static per-edge (src, dst, deg) side, materialized once and
    # re-streamed every iteration (materialize_clean: hash join/agg
    # outputs can carry schema-less empty blocks that poison the next
    # join — see _util.materialize_clean)
    ed_schema = pa.schema([("src", pa.string()), ("dst", pa.string()),
                           ("deg", pa.int64())])
    edges_deg = materialize_clean(
        edges.join(deg, "inner", npart, on=("src",)), ed_schema)
    nodes = materialize_clean(_nodes_ds(edges),
                              pa.schema([("url", pa.string())]))

    def _tmask(urls):
        """Per-node trusted flag as an int64 0/1 vector (no broadcast
        set — a handful of prefix scans)."""
        m = pa.array([False] * len(urls), pa.bool_())
        for p in trusted:
            m = pc.or_(m, pc.starts_with(urls, p))
        return pc.cast(m, pa.int64())

    def init_fn(t: pa.Table) -> pa.Table:
        if trusted is None:
            sc = pa.array([PR_SCALE] * len(t), pa.int64())
        else:
            sc = pc.multiply(_tmask(t.column("url")), PR_SCALE)
        return pa.table({
            "url": t.column("url"),
            "score": pc.cast(sc, pa.int64()),
        })

    score_schema = pa.schema([("url", pa.string()),
                              ("score", pa.int64())])
    scores = materialize_clean(
        nodes.map_batches(init_fn, batch_format="pyarrow"), score_schema)

    def contrib_fn(t: pa.Table) -> pa.Table:
        # ints are non-negative → arrow trunc-division == python floor
        return pa.table({
            "dst": t.column("dst"),
            "c": pc.divide(t.column("score"), t.column("deg")),
        })

    def newscore_fn(t: pa.Table) -> pa.Table:
        inc = pc.fill_null(t.column("sum(c)"), 0)
        if trusted is None:
            b = PR_BASE
        else:
            b = pc.multiply(_tmask(t.column("url")), PR_BASE)
        sc = pc.add(b,
                    pc.divide(pc.multiply(inc, PR_DAMP_NUM), PR_DAMP_DEN))
        return pa.table({"url": t.column("url"),
                         "score": pc.cast(sc, pa.int64())})

    inflow_schema = pa.schema([("dst", pa.string()),
                               ("sum(c)", pa.int64())])
    for _ in range(iters):
        # materialize_clean between the join and the aggregate: when
        # the graph is small relative to npart (e.g. the host graph)
        # empty join partitions emit schema-less blocks the hash
        # aggregator chokes on (see _util.materialize_clean)
        contrib_schema = pa.schema([("dst", pa.string()),
                                    ("c", pa.int64())])
        contrib = materialize_clean(
            edges_deg
            .join(scores, "inner", npart,
                  on=("src",), right_on=("url",))
            .map_batches(contrib_fn, batch_format="pyarrow"),
            contrib_schema)
        inflow = materialize_clean(
            ensure_schema(contrib.groupby("dst").sum("c"), inflow_schema),
            inflow_schema)
        scores = materialize_clean(
            nodes.join(inflow, "left_outer", npart,
                       on=("url",), right_on=("dst",))
            .map_batches(newscore_fn, batch_format="pyarrow"),
            score_schema)
    return scores


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


def trustrank_oracle_sql(pdir: str, iters: int = PR_ITERS,
                         hosts: tuple = TRUST_HOSTS) -> str:
    """pagerank_oracle_sql with init mass and teleport base CASE-gated
    on the trusted-host prefix — the exact link_trustrank fixed point."""
    tr = " OR ".join(
        f"starts_with(u, '{p}')" for p in _trust_prefixes(hosts))
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
        f"s0 AS (SELECT u, (CASE WHEN {tr} THEN {PR_SCALE} ELSE 0 END)"
        "::BIGINT AS sc FROM nodes), ",
    ]
    for i in range(1, iters + 1):
        cte.append(
            f"s{i} AS (SELECT n.u, "
            f"(CASE WHEN {tr.replace('(u,', '(n.u,')} "
            f"THEN {PR_BASE} ELSE 0 END) + ({PR_DAMP_NUM} * "
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
    from ._util import materialize_clean

    edges = materialize_clean(_edges_ds(sf_dir), EDGE_SCHEMA)
    n_edges = edges.count()
    if n_edges <= GRAPH_DRIVER_GATE:
        return _components_small(edges, n_edges, iters)
    return _components_large(edges, n_edges, iters)


def _components_small(edges, n_edges: int, iters: int):
    """≤gate: driver-folded label dict re-broadcast per iteration."""
    import ray
    import ray.data

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

    ref = None
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
        del ref  # single live broadcast copy across iterations

    return ray.data.from_arrow(pa.table({
        "url": pa.array(nodes, pa.string()),
        "comp": pa.array([labels[n] for n in nodes], pa.string()),
    }))


def _components_large(edges, n_edges: int, iters: int):
    """>gate: labels stay a DATASET; each iteration joins the
    undirected edge list with labels on the message source, then takes
    groupby(url).min over messages ∪ self-labels."""
    from ._util import ensure_schema, materialize_clean, rename

    npart = _num_partitions(2 * n_edges)
    ue = (rename(edges, {"src": "a", "dst": "b"}).select_columns(["a", "b"])
          .union(rename(edges, {"src": "b", "dst": "a"})
                 .select_columns(["a", "b"]))
          ).materialize()

    def init_fn(t: pa.Table) -> pa.Table:
        return pa.table({"url": t.column("url"), "lab": t.column("url")})

    lab_schema = pa.schema([("url", pa.string()), ("lab", pa.string())])
    labels = materialize_clean(
        _nodes_ds(edges).map_batches(init_fn, batch_format="pyarrow"),
        lab_schema)

    def msg_fn(t: pa.Table) -> pa.Table:
        return pa.table({"url": t.column("b"), "lab": t.column("lab")})

    for _ in range(iters):
        msgs = (ue.join(labels, "inner", npart,
                        on=("a",), right_on=("url",))
                .map_batches(msg_fn, batch_format="pyarrow"))
        labels = materialize_clean(
            ensure_schema(
                rename(labels.union(msgs).groupby("url").min("lab"),
                       {"min(lab)": "lab"}).select_columns(["url", "lab"]),
                lab_schema),
            lab_schema)
    return rename(labels, {"lab": "comp"}).select_columns(["url", "comp"])


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


def link_degrees(sf_dir: str):
    """(url, out_deg, in_deg): per-node degree counts of the closed link
    graph — the raw hub/authority signal an inbound-link quality filter
    consumes (WebText kept pages with enough inbound karma; CommonCrawl
    curation weights by in-degree).  Reference parity: the graph is the
    same distinct closed edge set the pagerank/components family uses
    (extract→canonicalize chain, M1-M7).

    Scale shape: one map over edges emitting (url, o, i) half-rows for
    both endpoints, then a single groupby-sum — one shuffle keyed the
    same way as every other node-keyed stage, nothing driver-resident
    at any size (no gate needed: the fold IS the groupby)."""
    from ._util import ensure_schema, materialize_clean, rename

    edges = materialize_clean(_edges_ds(sf_dir), EDGE_SCHEMA)

    def halves(t: pa.Table) -> pa.Table:
        n = t.num_rows
        ones = pa.array(np.ones(n, dtype=np.int64))
        zeros = pa.array(np.zeros(n, dtype=np.int64))
        return pa.concat_tables([
            pa.table({"url": t.column("src"), "o": ones, "i": zeros}),
            pa.table({"url": t.column("dst"), "o": zeros, "i": ones}),
        ])

    deg = edges.map_batches(halves, batch_format="pyarrow") \
        .groupby("url").sum(["o", "i"])
    return ensure_schema(
        rename(deg, {"sum(o)": "out_deg", "sum(i)": "in_deg"}),
        pa.schema([("url", pa.string()), ("out_deg", pa.int64()),
                   ("in_deg", pa.int64())]))


def degrees_oracle_sql(pdir: str) -> str:
    """DuckDB replay over the same golden-canon-derived closed edges."""
    return (
        f"WITH pl AS (SELECT url AS src, canon AS dst FROM "
        f"read_parquet('{pdir}/golden_canon.parquet') "
        "WHERE canon IS NOT NULL), "
        f"pu AS (SELECT DISTINCT url FROM "
        f"read_parquet('{pdir}/pages.parquet')), "
        "e AS (SELECT DISTINCT pl.src, pl.dst FROM pl "
        "JOIN pu ON pu.url = pl.dst), "
        "b AS (SELECT src AS url, 1::BIGINT AS o, 0::BIGINT AS i FROM e "
        "UNION ALL SELECT dst, 0::BIGINT, 1::BIGINT FROM e) "
        "SELECT url, sum(o)::BIGINT AS out_deg, sum(i)::BIGINT AS in_deg "
        "FROM b GROUP BY url")


# ---------------------------------------------------------------------------
# host-level link graph

_EDGE_CTE = (
    "WITH pl AS (SELECT url AS src, canon AS dst FROM "
    "read_parquet('{pdir}/golden_canon.parquet') "
    "WHERE canon IS NOT NULL), "
    "pu AS (SELECT DISTINCT url FROM "
    "read_parquet('{pdir}/pages.parquet')), "
    "e AS (SELECT DISTINCT pl.src, pl.dst FROM pl "
    "JOIN pu ON pu.url = pl.dst)")


def link_host_graph(sf_dir: str):
    """(src_host, dst_host, n_links): host-level aggregation of the
    closed distinct link graph — the crawl scheduler's view of the web
    (the reference keys ALL crawl state by host, ``urlengine.c:283-338``;
    cross-host citation counts are what frontier prioritizers and
    host-reputation filters consume).  Host = URL authority, extracted
    with the same guarded list_slice the oracle's split_part implies
    (schemeless URLs → '').

    Scale shape: map-side host extraction + in-batch partial count over
    the edge stream, then ONE groupby keyed (src_host, dst_host) —
    host-pair cardinality (quadratically smaller than edges) is all
    that shuffles; nothing driver-resident at any size."""
    import pyarrow.compute as pc

    from ._util import ensure_schema, rename

    def hostpair(t: pa.Table) -> pa.Table:
        sh = pc.binary_join(pc.list_slice(
            pc.split_pattern(t.column("src"), "/"), 2, 3), "")
        dh = pc.binary_join(pc.list_slice(
            pc.split_pattern(t.column("dst"), "/"), 2, 3), "")
        out = pa.table({
            "src_host": sh, "dst_host": dh,
            "n_links": pa.array(np.ones(t.num_rows, dtype=np.int64))})
        return out.group_by(["src_host", "dst_host"]).aggregate(
            [("n_links", "sum")]).rename_columns(
            ["src_host", "dst_host", "n_links"])

    agg = _edges_ds(sf_dir).map_batches(
        hostpair, batch_format="pyarrow") \
        .groupby(["src_host", "dst_host"]).sum("n_links")
    return ensure_schema(
        rename(agg, {"sum(n_links)": "n_links"}),
        pa.schema([("src_host", pa.string()), ("dst_host", pa.string()),
                   ("n_links", pa.int64())]))


def host_graph_oracle_sql(pdir: str) -> str:
    """DuckDB replay: same closed edge set, split_part host."""
    return (_EDGE_CTE.format(pdir=pdir) +
            " SELECT split_part(src, '/', 3) AS src_host, "
            "split_part(dst, '/', 3) AS dst_host, "
            "count(*)::BIGINT AS n_links FROM e GROUP BY 1, 2")


def link_reciprocal(sf_dir: str):
    """(url_a, url_b): unordered page pairs that link each other BOTH
    ways in the closed distinct edge set (a<b, self-loops excluded) —
    the mutual-citation signal link-spam detectors and site-boundary
    inference use (reciprocal-link density separates organic linking
    from link farms).

    Scale shape: one map normalizing each directed edge to its
    unordered key plus a direction flag (1 = a→b, 2 = b→a), then ONE
    groupby(a, b) summing flags — a pair kept iff the sum is exactly 3
    (edges are distinct, so each direction contributes at most once).
    No joins, no broadcast, nothing driver-resident."""
    import pyarrow.compute as pc

    from ._util import ensure_schema

    def norm(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t.column("src"), t.column("dst")))
        src, dst = t.column("src"), t.column("dst")
        fwd = pc.less(src, dst)
        return pa.table({
            "url_a": pc.if_else(fwd, src, dst),
            "url_b": pc.if_else(fwd, dst, src),
            "d": pc.if_else(fwd, pa.scalar(1, pa.int64()),
                            pa.scalar(2, pa.int64()))})

    def keep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("sum(d)"), 3))
        return t.select(["url_a", "url_b"])

    pairs = _edges_ds(sf_dir).map_batches(norm, batch_format="pyarrow") \
        .groupby(["url_a", "url_b"]).sum("d") \
        .map_batches(keep, batch_format="pyarrow")
    return ensure_schema(
        pairs, pa.schema([("url_a", pa.string()),
                          ("url_b", pa.string())]))


def reciprocal_oracle_sql(pdir: str) -> str:
    """DuckDB replay: self-join on the closed edges, a<b."""
    return (_EDGE_CTE.format(pdir=pdir) +
            " SELECT e1.src AS url_a, e1.dst AS url_b FROM e e1 "
            "JOIN e e2 ON e1.src = e2.dst AND e1.dst = e2.src "
            "WHERE e1.src < e1.dst")


def link_triangles(sf_dir: str):
    """Single row (n_triangles): global triangle count of the
    UNDIRECTED closed link graph — the clustering/community-density
    scalar (triangle density separates organic site neighborhoods from
    sprawling spam link structures; Watts-Strogatz clustering's
    numerator).

    Scale shape — the classic 2-round exchange (Cohen's MR triangle
    algorithm), every stage a map or a groupby:
      1. undirect + distinct: (lo, hi) with lo<hi, one groupby;
      2. wedges: groupby(lo).map_groups emits each neighbor pair
         (hi_i, hi_j) — every triangle is generated exactly once,
         centered at its lexicographically-smallest vertex;
      3. close: wedge rows (w=1) unioned with edge rows (e=1),
         groupby(pair).sum — Σ w·e is the triangle count.
    Nothing driver-resident but the final scalar.  Production note:
    step 2's fan-out is Σ deg_hi(v)²; at web scale the centering order
    should be BY DEGREE (smallest-degree vertex), which caps the wedge
    count at O(m^1.5) — the URL order used here keeps the oracle
    replayable and is fine below hub-dominated densities."""
    import pyarrow.compute as pc

    from ._util import materialize_clean

    def undirect(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t.column("src"), t.column("dst")))
        src, dst = t.column("src"), t.column("dst")
        fwd = pc.less(src, dst)
        out = pa.table({"a": pc.if_else(fwd, src, dst),
                        "b": pc.if_else(fwd, dst, src)})
        return out.group_by(["a", "b"]).aggregate([])

    und = materialize_clean(
        _edges_ds(sf_dir).map_batches(undirect, batch_format="pyarrow")
        .groupby(["a", "b"]).count().select_columns(["a", "b"]),
        pa.schema([("a", pa.string()), ("b", pa.string())]))

    def wedges(df: pd.DataFrame) -> pa.Table:
        bs = np.sort(df["b"].to_numpy())
        i, j = np.triu_indices(len(bs), k=1)
        # arrow output so the union with edge_marks is block-homogeneous
        return pa.table({
            "a": pa.array(bs[i], pa.string()),
            "b": pa.array(bs[j], pa.string()),
            "w": pa.array(np.ones(len(i), dtype=np.int64)),
            "e": pa.array(np.zeros(len(i), dtype=np.int64))})

    def edge_marks(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({"a": t.column("a"), "b": t.column("b"),
                         "w": pa.array(np.zeros(n, dtype=np.int64)),
                         "e": pa.array(np.ones(n, dtype=np.int64))})

    w = und.groupby("a").map_groups(wedges, batch_format="pandas")
    e = und.map_batches(edge_marks, batch_format="pyarrow")
    closed = w.union(e).groupby(["a", "b"]).sum(["w", "e"])

    def prod(t: pa.Table) -> pa.Table:
        p = pc.multiply(t.column("sum(w)"), t.column("sum(e)"))
        return pa.table({"t": pa.array(
            [pc.sum(p).as_py() or 0], pa.int64())})

    n_tri = closed.map_batches(prod, batch_format="pyarrow").sum("t")
    return pd.DataFrame({"n_triangles": pd.Series([int(n_tri or 0)],
                                                  dtype="int64")})


def triangles_oracle_sql(pdir: str) -> str:
    """DuckDB replay: undirected distinct edges, ordered 3-way join."""
    return (_EDGE_CTE.format(pdir=pdir) +
            ", u AS (SELECT least(src, dst) AS a, greatest(src, dst) "
            "AS b FROM e WHERE src <> dst GROUP BY 1, 2) "
            "SELECT count(*)::BIGINT AS n_triangles FROM u e1 "
            "JOIN u e2 ON e2.a = e1.a AND e2.b > e1.b "
            "JOIN u e3 ON e3.a = e1.b AND e3.b = e2.b")


# ---------------------------------------------------------------------------
# HITS hubs/authorities (Kleinberg '99) — the directory/resource-page
# signal: a good HUB links to many good authorities, a good AUTHORITY is
# linked from many good hubs.  Web curation uses the authority side as a
# seed-quality score and the hub side to find link directories/spam.

HITS_ITERS = 2


def link_hits(sf_dir: str, iters: int = HITS_ITERS):
    """(url, hub, auth): ``iters`` mutual-reinforcement rounds over the
    closed distinct link graph, UNNORMALIZED in exact integers so the
    DuckDB oracle replays bit-for-bit (hub_0 = 1 for every node;
    auth_t(n) = Σ_{src→n} hub_{t-1}(src); hub_t(n) = Σ_{n→dst}
    auth_t(dst)).  Unnormalized values grow like (mean degree)^{2t} —
    bounded in int64 for small fixed ``iters``; at production scale you
    renormalize per round by a power-of-two shift (one scalar fold),
    which keeps the integer-exactness story intact.

    Scale shape — the same dual-path contract as PageRank: ≤gate the
    per-round inflow folds to a driver dict; >gate hub/auth stay
    DATASETS and each half-round is one co-partitioned edges⋈values
    hash join + one groupby-sum (two BSP exchanges per round), nothing
    node-sized on the driver."""
    from ._util import materialize_clean

    edges = materialize_clean(_edges_ds(sf_dir), EDGE_SCHEMA)
    n_edges = edges.count()
    if n_edges <= GRAPH_DRIVER_GATE:
        return _hits_small(edges, n_edges, iters)
    return _hits_large(edges, n_edges, iters)


def _hits_small(edges, n_edges: int, iters: int):
    """≤gate: driver-folded hub/auth dicts re-broadcast per half-round
    (single live ray.put copy, same discipline as _pagerank_small)."""
    import ray
    import ray.data

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
    hub = {n: 1 for n in nodes}
    auth = {n: 0 for n in nodes}

    def sweep(vals: dict, from_col: str, to_col: str) -> dict:
        ref = ray.put(vals)

        def contrib(df: pd.DataFrame, _r=ref) -> pd.DataFrame:
            v = ray.get(_r)
            return pd.DataFrame({
                "n": df[to_col],
                "c": df[from_col].map(v).astype("int64")})

        inc = _fold_agg(
            edges.map_batches(contrib, batch_format="pandas"),
            "n", "c", "sum", n_edges)
        del ref  # single live broadcast copy
        return {n: int(inc.get(n, 0)) for n in nodes}

    for _ in range(iters):
        auth = sweep(hub, "src", "dst")
        hub = sweep(auth, "dst", "src")

    return ray.data.from_arrow(pa.table({
        "url": pa.array(nodes, pa.string()),
        "hub": pa.array([hub[n] for n in nodes], pa.int64()),
        "auth": pa.array([auth[n] for n in nodes], pa.int64()),
    }))


def _hits_large(edges, n_edges: int, iters: int):
    """>gate: hub/auth stay Datasets; each half-round is
    edges⋈values (hash join on the contributing endpoint) →
    groupby(other endpoint).sum → nodes⟕inflow (missing → 0)."""
    import pyarrow.compute as pc

    from ._util import ensure_schema, materialize_clean, rename

    npart = _num_partitions(n_edges)
    nodes = materialize_clean(_nodes_ds(edges),
                              pa.schema([("url", pa.string())]))
    val_schema = pa.schema([("url", pa.string()), ("v", pa.int64())])

    def init_fn(t: pa.Table) -> pa.Table:
        return pa.table({"url": t.column("url"),
                         "v": pa.array([1] * len(t), pa.int64())})

    hub = materialize_clean(
        nodes.map_batches(init_fn, batch_format="pyarrow"), val_schema)
    auth = hub

    def sweep(vals, from_col: str, to_col: str):
        def emit_fn(t: pa.Table) -> pa.Table:
            return pa.table({"n": t.column(to_col), "c": t.column("v")})

        def fill_fn(t: pa.Table) -> pa.Table:
            return pa.table({
                "url": t.column("url"),
                "v": pc.cast(pc.fill_null(t.column("sum(c)"), 0),
                             pa.int64())})

        inflow_schema = pa.schema([("n", pa.string()),
                                   ("sum(c)", pa.int64())])
        inflow = materialize_clean(
            ensure_schema(
                edges.join(vals, "inner", npart,
                           on=(from_col,), right_on=("url",))
                .map_batches(emit_fn, batch_format="pyarrow")
                .groupby("n").sum("c"),
                inflow_schema),
            inflow_schema)
        return materialize_clean(
            nodes.join(inflow, "left_outer", npart,
                       on=("url",), right_on=("n",))
            .map_batches(fill_fn, batch_format="pyarrow"),
            val_schema)

    for _ in range(iters):
        auth = sweep(hub, "src", "dst")
        hub = sweep(auth, "dst", "src")

    out = rename(hub, {"v": "hub"}).join(
        rename(auth, {"v": "auth"}), "inner", npart, on=("url",))
    return ensure_schema(
        out.select_columns(["url", "hub", "auth"]),
        pa.schema([("url", pa.string()), ("hub", pa.int64()),
                   ("auth", pa.int64())]))


def hits_oracle_sql(pdir: str, iters: int = HITS_ITERS) -> str:
    """DuckDB replay: same closed edges, the two half-round aggregations
    unrolled as CTE stages."""
    cte = [_EDGE_CTE.format(pdir=pdir) + ", ",
           "nodes AS (SELECT DISTINCT u FROM "
           "(SELECT src AS u FROM e UNION ALL SELECT dst AS u FROM e)), ",
           "h0 AS (SELECT u, 1::BIGINT AS v FROM nodes), "]
    for i in range(1, iters + 1):
        cte.append(
            f"a{i} AS (SELECT n.u, COALESCE(SUM(h.v), 0)::BIGINT AS v "
            "FROM nodes n LEFT JOIN e ON e.dst = n.u "
            f"LEFT JOIN h{i - 1} h ON h.u = e.src GROUP BY n.u), ")
        cte.append(
            f"h{i} AS (SELECT n.u, COALESCE(SUM(a.v), 0)::BIGINT AS v "
            "FROM nodes n LEFT JOIN e ON e.src = n.u "
            f"LEFT JOIN a{i} a ON a.u = e.dst GROUP BY n.u), ")
    return ("".join(cte)[:-2] + " "
            f"SELECT h.u AS url, h.v AS hub, a.v AS auth "
            f"FROM h{iters} h JOIN a{iters} a ON a.u = h.u")


# ---------------------------------------------------------------------------
# degree distribution — the power-law histogram (Broder et al. '00 §3
# measured the web's in-degree exponent from exactly this table); the
# curation use is picking in-degree thresholds from the actual curve.


def degree_dist(sf_dir: str):
    """(direction, degree, n_nodes): histogram of in- and out-degrees
    over the closed distinct link graph ('in' rows count nodes by
    in-degree incl. 0, same for 'out').

    Scale shape: the ``link_degrees`` node-keyed groupby-sum, then a
    SECOND grouped count keyed by the degree VALUE — bounded by the
    number of distinct degrees (power-law: tiny), so the wide node table
    never folds anywhere."""
    from ._util import ensure_schema

    deg = link_degrees(sf_dir)

    def halves(t: pa.Table) -> pa.Table:
        n = t.num_rows
        ones = pa.array(np.ones(n, dtype=np.int64))
        return pa.concat_tables([
            pa.table({"direction": pa.array(["in"] * n, pa.string()),
                      "degree": t.column("in_deg"), "c": ones}),
            pa.table({"direction": pa.array(["out"] * n, pa.string()),
                      "degree": t.column("out_deg"), "c": ones}),
        ])

    def fin(t: pa.Table) -> pa.Table:
        return pa.table({
            "direction": t.column("direction"),
            "degree": t.column("degree"),
            "n_nodes": t.column("sum(c)").cast(pa.int64())})

    return ensure_schema(
        deg.map_batches(halves, batch_format="pyarrow")
        .groupby(["direction", "degree"]).sum("c")
        .map_batches(fin, batch_format="pyarrow"),
        pa.schema([("direction", pa.string()), ("degree", pa.int64()),
                   ("n_nodes", pa.int64())]))


def degree_dist_oracle_sql(pdir: str) -> str:
    """DuckDB replay: the degrees aggregation re-grouped by value."""
    return (
        _EDGE_CTE.format(pdir=pdir) + ", "
        "b AS (SELECT src AS url, 1::BIGINT AS o, 0::BIGINT AS i FROM e "
        "UNION ALL SELECT dst, 0::BIGINT, 1::BIGINT FROM e), "
        "d AS (SELECT url, sum(o)::BIGINT AS out_deg, "
        "sum(i)::BIGINT AS in_deg FROM b GROUP BY url), "
        "h AS (SELECT 'in' AS direction, in_deg AS degree FROM d "
        "UNION ALL SELECT 'out', out_deg FROM d) "
        "SELECT direction, degree, count(*)::BIGINT AS n_nodes "
        "FROM h GROUP BY 1, 2")


# ---------------------------------------------------------------------------
# 2-hop neighborhood size — the friends-of-friends / crawl-frontier
# fanout estimate (how much NEW surface each node opens within two
# clicks; frontier scheduling ranks seeds by exactly this).


def link_2hop(sf_dir: str):
    """(url, n_reach): per source node, the number of DISTINCT nodes
    reachable in one or two hops, excluding the node itself.

    Scale shape: the edge⋈edge join IS the op (wedge generation, same
    exchange as triangles) keyed on the middle vertex; the blow-up is
    bounded immediately by a (src, nbr)-keyed distinct BEFORE the
    per-src count, so what reaches the second exchange is the distinct
    reachability set, not the wedge multiset.  No driver state."""
    import pyarrow.compute as pc

    from ._util import ensure_schema, materialize_clean, rename

    edges = materialize_clean(_edges_ds(sf_dir), EDGE_SCHEMA)
    n_edges = edges.count()
    npart = _num_partitions(n_edges)

    mid = rename(edges, {"src": "mid_src", "dst": "nbr"})
    two = edges.join(mid, "inner", npart,
                     on=("dst",), right_on=("mid_src",)) \
        .map_batches(lambda t: pa.table({"src": t.column("src"),
                                         "nbr": t.column("nbr")}),
                     batch_format="pyarrow")
    one = edges.map_batches(
        lambda t: pa.table({"src": t.column("src"),
                            "nbr": t.column("dst")}),
        batch_format="pyarrow")

    def drop_self(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(pc.equal(t.column("src"),
                                           t.column("nbr"))))

    def ones(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": t.column("src"),
            "c": pa.array(np.ones(t.num_rows, dtype=np.int64))})

    def fin(t: pa.Table) -> pa.Table:
        return pa.table({"url": t.column("src"),
                         "n_reach": t.column("sum(c)").cast(pa.int64())})

    reach = one.union(two) \
        .map_batches(drop_self, batch_format="pyarrow") \
        .groupby(["src", "nbr"]).count() \
        .map_batches(ones, batch_format="pyarrow") \
        .groupby("src").sum("c") \
        .map_batches(fin, batch_format="pyarrow")
    return ensure_schema(
        reach, pa.schema([("url", pa.string()), ("n_reach", pa.int64())]))


def twohop_oracle_sql(pdir: str) -> str:
    """DuckDB replay: wedge join ∪ direct edges, distinct, self-free."""
    return (
        _EDGE_CTE.format(pdir=pdir) + ", "
        "h2 AS (SELECT e1.src, e2.dst AS nbr FROM e e1 "
        "JOIN e e2 ON e2.src = e1.dst), "
        "u AS (SELECT src, dst AS nbr FROM e "
        "UNION SELECT src, nbr FROM h2) "
        "SELECT src AS url, count(*)::BIGINT AS n_reach FROM u "
        "WHERE nbr != src GROUP BY src")


# ---------------------------------------------------------------------------
# degree-assortativity sufficient statistics — "do hubs link to hubs?"
# (Newman '02).  The Pearson r over per-edge (out_deg(src), in_deg(dst))
# is a pure function of these integer moments; the engine ships the
# moments (exact, fold-safe) and leaves the one float division to the
# consumer, keeping the oracle bit-exact.


def link_assortativity(sf_dir: str):
    """One row: (n_edges, sum_x, sum_y, sum_xx, sum_yy, sum_xy) with
    x = out-degree of the edge's source, y = in-degree of its target,
    over the closed distinct link graph.

    Scale shape: the degrees table (node-keyed, from ``link_degrees``'s
    single groupby) hash-joins onto edges TWICE (src side then dst
    side — each a co-partitioned exchange), then per-batch integer
    moment partials fold through one global sum; only six integers
    reach the driver."""
    from ._util import materialize_clean, rename

    edges = materialize_clean(_edges_ds(sf_dir), EDGE_SCHEMA)
    n_edges = edges.count()
    npart = _num_partitions(n_edges)
    deg_schema = pa.schema([("url", pa.string()), ("out_deg", pa.int64()),
                            ("in_deg", pa.int64())])
    deg = materialize_clean(link_degrees(sf_dir), deg_schema)

    sd = edges.join(rename(deg.select_columns(["url", "out_deg"]),
                           {"out_deg": "x"}),
                    "inner", npart, on=("src",), right_on=("url",)) \
        .join(rename(deg.select_columns(["url", "in_deg"]),
                     {"in_deg": "y"}),
              "inner", npart, on=("dst",), right_on=("url",))

    def moments(t: pa.Table) -> pa.Table:
        x = t.column("x").to_numpy().astype(np.int64)
        y = t.column("y").to_numpy().astype(np.int64)
        return pa.table({
            "n_edges": pa.array([np.int64(x.shape[0])]),
            "sum_x": pa.array([x.sum()]), "sum_y": pa.array([y.sum()]),
            "sum_xx": pa.array([(x * x).sum()]),
            "sum_yy": pa.array([(y * y).sum()]),
            "sum_xy": pa.array([(x * y).sum()])})

    cols = ["n_edges", "sum_x", "sum_y", "sum_xx", "sum_yy", "sum_xy"]
    tot = sd.map_batches(moments, batch_format="pyarrow").sum(cols)
    return pd.DataFrame({c: pd.Series([int(tot[f"sum({c})"])],
                                      dtype="int64") for c in cols})


def assortativity_oracle_sql(pdir: str) -> str:
    return (
        _EDGE_CTE.format(pdir=pdir) + ", "
        "b AS (SELECT src AS url, 1::BIGINT AS o, 0::BIGINT AS i FROM e "
        "UNION ALL SELECT dst, 0::BIGINT, 1::BIGINT FROM e), "
        "d AS (SELECT url, sum(o)::BIGINT AS out_deg, "
        "sum(i)::BIGINT AS in_deg FROM b GROUP BY url), "
        "xy AS (SELECT ds.out_deg AS x, dd.in_deg AS y FROM e "
        "JOIN d ds ON ds.url = e.src JOIN d dd ON dd.url = e.dst) "
        "SELECT count(*)::BIGINT AS n_edges, sum(x)::BIGINT AS sum_x, "
        "sum(y)::BIGINT AS sum_y, sum(x*x)::BIGINT AS sum_xx, "
        "sum(y*y)::BIGINT AS sum_yy, sum(x*y)::BIGINT AS sum_xy FROM xy")


# ---------------------------------------------------------------------------
# per-edge neighborhood Jaccard — link-spam / community-boundary signal
# (edge "embeddedness": how much two linked pages share a neighborhood;
# low-Jaccard edges are bridges, high-Jaccard edges are intra-community)


def link_neighbor_jaccard(sf_dir: str):
    """(url_a, url_b, n_common, jaccard_permille) per undirected distinct
    closed edge (a<b): Jaccard of the two endpoints' UNDIRECTED neighbor
    sets, in exact integer permille — ``(1000·|N(a)∩N(b)|) //
    (deg(a)+deg(b)−|N(a)∩N(b)|)`` — so the DuckDB oracle replays
    bit-for-bit.

    Scale shape — all maps, groupbys and hash joins, nothing
    driver-resident:
      1. undirect+distinct (one groupby), full adjacency = both
         directions;
      2. common-neighbor counts by the Cohen wedge exchange (the
         link_triangles shape): groupby(center).map_groups emits each
         neighbor pair once per shared center, union with edge-marker
         rows, groupby(pair).sum — edges with ZERO common neighbors
         survive via the marker rows.  Fan-out is Σ deg(v)²; at web
         scale center by degree (see link_triangles note);
      3. degrees attach via two hash joins on a then b (node-sized
         build sides, partitioned)."""
    import pyarrow.compute as pc

    from ._util import ensure_schema, materialize_clean

    def undirect(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t.column("src"), t.column("dst")))
        src, dst = t.column("src"), t.column("dst")
        fwd = pc.less(src, dst)
        out = pa.table({"a": pc.if_else(fwd, src, dst),
                        "b": pc.if_else(fwd, dst, src)})
        return out.group_by(["a", "b"]).aggregate([])

    und = materialize_clean(
        _edges_ds(sf_dir).map_batches(undirect, batch_format="pyarrow")
        .groupby(["a", "b"]).count().select_columns(["a", "b"]),
        pa.schema([("a", pa.string()), ("b", pa.string())]))

    def both_dirs(t: pa.Table) -> pa.Table:
        return pa.concat_tables([
            pa.table({"v": t.column("a"), "n": t.column("b")}),
            pa.table({"v": t.column("b"), "n": t.column("a")})])

    full = und.map_batches(both_dirs, batch_format="pyarrow")

    deg = full.groupby("v").count()  # (v, count())

    def wedges(df: pd.DataFrame) -> pa.Table:
        ns = np.sort(df["n"].to_numpy())
        i, j = np.triu_indices(len(ns), k=1)
        return pa.table({
            "a": pa.array(ns[i], pa.string()),
            "b": pa.array(ns[j], pa.string()),
            "w": pa.array(np.ones(len(i), dtype=np.int64)),
            "e": pa.array(np.zeros(len(i), dtype=np.int64))})

    def edge_marks(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({"a": t.column("a"), "b": t.column("b"),
                         "w": pa.array(np.zeros(n, dtype=np.int64)),
                         "e": pa.array(np.ones(n, dtype=np.int64))})

    w = full.groupby("v").map_groups(wedges, batch_format="pandas")
    e = und.map_batches(edge_marks, batch_format="pyarrow")
    closed = w.union(e).groupby(["a", "b"]).sum(["w", "e"])

    def keep_edges(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t.column("sum(e)"), 0))
        return pa.table({"a": t.column("a"), "b": t.column("b"),
                         "n_common": t.column("sum(w)").cast(pa.int64())})

    pairs = closed.map_batches(keep_edges, batch_format="pyarrow")

    from ._util import rename

    deg_a = rename(deg, {"v": "a", "count()": "deg_a"})
    deg_b = rename(deg, {"v": "b", "count()": "deg_b"})
    n_edges = und.count()
    nparts = _num_partitions(n_edges)
    joined = pairs.join(deg_a, join_type="inner", on=("a",),
                        num_partitions=nparts) \
        .join(deg_b, join_type="inner", on=("b",), num_partitions=nparts)

    def fin(t: pa.Table) -> pa.Table:
        c = t.column("n_common").cast(pa.int64())
        da = t.column("deg_a").cast(pa.int64())
        db = t.column("deg_b").cast(pa.int64())
        union = pc.subtract(pc.add(da, db), c)
        jac = pc.divide(pc.multiply(c, 1000), union)  # integer floor-div
        return pa.table({"url_a": t.column("a"), "url_b": t.column("b"),
                         "n_common": c,
                         "jaccard_permille": jac.cast(pa.int64())})

    return ensure_schema(
        joined.map_batches(fin, batch_format="pyarrow"),
        pa.schema([("url_a", pa.string()), ("url_b", pa.string()),
                   ("n_common", pa.int64()),
                   ("jaccard_permille", pa.int64())]))


def neighbor_jaccard_oracle_sql(pdir: str) -> str:
    """DuckDB replay: same undirected edges, wedge-free 3-way join for
    the intersection, integer floor-div permille."""
    return (
        _EDGE_CTE.format(pdir=pdir) +
        ", u AS (SELECT least(src, dst) AS a, greatest(src, dst) AS b "
        "FROM e WHERE src <> dst GROUP BY 1, 2), "
        "f AS (SELECT a AS v, b AS n FROM u "
        "UNION ALL SELECT b, a FROM u), "
        "deg AS (SELECT v, count(*)::BIGINT AS d FROM f GROUP BY v), "
        "inter AS (SELECT u.a, u.b, count(*)::BIGINT AS c FROM u "
        "JOIN f fa ON fa.v = u.a JOIN f fb ON fb.v = u.b "
        "AND fb.n = fa.n GROUP BY 1, 2) "
        "SELECT u.a AS url_a, u.b AS url_b, "
        "COALESCE(i.c, 0)::BIGINT AS n_common, "
        "((1000 * COALESCE(i.c, 0)) // "
        "(da.d + db.d - COALESCE(i.c, 0)))::BIGINT AS jaccard_permille "
        "FROM u JOIN deg da ON da.v = u.a JOIN deg db ON db.v = u.b "
        "LEFT JOIN inter i ON i.a = u.a AND i.b = u.b")


def frontier_candidates(sf_dir: str):
    """(url, n_inlinks, n_src_hosts, first_src): the OPEN side of the
    link graph — canonicalized outlinks with NO page row, ranked by
    how many distinct crawled pages (and hosts) point at them.  This is
    frontier EXPANSION: the scheduler's next-wave priority signal
    (OPIC-style in-degree, host-diversity bonus) for URLs the crawl has
    discovered but not fetched.

    Scale shape: the same size-gated membership test as the closed
    graph (_edges_ds) with the polarity flipped — ≤gate broadcasts the
    page-URL column once and keeps dst NOT is_in; >gate is a
    distributed left_anti hash join.  In-batch (src,dst) dedup bounds
    the exchange; the final groupby moves one row per distinct
    (candidate, src) pair."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray
    import ray.data

    from ..sources import pagegen
    from ..stages.extract import page_canonicalize_links
    from ._util import ensure_schema

    pdir = pagegen.pages_dir_for(sf_dir)
    pages_path = f"{pdir}/pages.parquet"
    n_pages = pq.ParquetFile(pages_path).metadata.num_rows

    def pair_fn(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_valid(batch.column("canon")))
        t = pa.table({"src": t.column("url"), "dst": t.column("canon")})
        return t.group_by(["src", "dst"]).aggregate([])

    pairs = page_canonicalize_links(pdir).map_batches(
        pair_fn, batch_format="pyarrow")

    if n_pages <= GRAPH_DRIVER_GATE:
        urls = pq.read_table(pages_path, columns=["url"]) \
            .column("url").combine_chunks()
        ref = ray.put(urls)

        def open_fn(batch: pa.Table, _r=ref) -> pa.Table:
            return batch.filter(pc.invert(
                pc.is_in(batch.column("dst"), value_set=ray.get(_r))))

        cand = pairs.map_batches(open_fn, batch_format="pyarrow")
    else:
        pages = ray.data.read_parquet(pages_path, columns=["url"])
        cand = pairs.join(pages, "left_anti", _num_partitions(n_pages),
                          on=("dst",), right_on=("url",))

    dist = ensure_schema(
        cand.groupby(["src", "dst"]).count().select_columns(
            ["src", "dst"]),
        EDGE_SCHEMA)

    def shape(t: pa.Table) -> pa.Table:
        host = pc.binary_join(
            pc.list_slice(pc.split_pattern(t.column("src"), "/"), 2, 3),
            "")
        return pa.table({"dst": t.column("dst"), "src": t.column("src"),
                         "src_host": host})

    def per_cand(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "url": [g["dst"].iloc[0]],
            "n_inlinks": np.array([len(g)], dtype=np.int64),
            "n_src_hosts": np.array([g["src_host"].nunique()],
                                    dtype=np.int64),
            "first_src": [g["src"].min()]})

    return dist.map_batches(shape, batch_format="pyarrow") \
        .groupby("dst").map_groups(per_cand, batch_format="pandas")


# ---------------------------------------------------------------------------
# bounded k-core peeling

KCORE_K = 2
KCORE_ITERS = 3


def link_kcore(sf_dir: str, k: int = KCORE_K, iters: int = KCORE_ITERS):
    """(url, in_core): bounded k-core membership over the UNDIRECTED
    simple closed link graph — ``iters`` rounds of "drop nodes whose
    remaining degree < k, and their edges" (Seidman '83 peeling; the
    spam/fringe trim link-curation pipelines run before centrality).
    CONTRACT: in_core = survived KCORE_ITERS peel rounds, NOT the
    fixpoint k-core — a chain that needs more than ``iters`` peels to
    unravel keeps its tail (same bounded-rounds contract as
    dup_clusters' DUP_CC_ITERS, pinned by test and oracle alike; real
    web graphs peel >99 % of the 2-core fringe in 3 rounds).

    Scale shape: per round one node-keyed degree groupby + a keep-set
    restriction — size-gated like every graph op: ≤GRAPH_DRIVER_GATE
    edges broadcasts the keep set via ray.put + pc.is_in (zero
    shuffle); above it two left_semi hash joins per round, nothing
    node- or edge-sized on the driver."""
    import pyarrow.compute as pc
    import ray
    import ray.data

    from ._util import ensure_schema, materialize_clean, rename

    edges = materialize_clean(_edges_ds(sf_dir), EDGE_SCHEMA)

    def undirect(t: pa.Table) -> pa.Table:
        keep = pc.invert(pc.equal(t.column("src"), t.column("dst")))
        t = t.filter(keep)
        lo = pc.min_element_wise(t.column("src"), t.column("dst"))
        hi = pc.max_element_wise(t.column("src"), t.column("dst"))
        return pa.table({"lo": lo, "hi": hi}).group_by(
            ["lo", "hi"]).aggregate([])

    und_schema = pa.schema([("lo", pa.string()), ("hi", pa.string())])
    cur = materialize_clean(
        edges.map_batches(undirect, batch_format="pyarrow")
        .groupby(["lo", "hi"]).count().select_columns(["lo", "hi"]),
        und_schema)
    n_e = cur.count()

    def halves(t: pa.Table) -> pa.Table:
        ones = pa.array(np.ones(t.num_rows, dtype=np.int64))
        return pa.concat_tables([
            pa.table({"n": t.column("lo"), "c": ones}),
            pa.table({"n": t.column("hi"), "c": ones})])

    node_schema = pa.schema([("n", pa.string())])
    nodes0 = materialize_clean(
        cur.map_batches(
            lambda t: pa.table({"n": pa.concat_arrays(
                [c.combine_chunks() for c in
                 (t.column("lo"), t.column("hi"))])}),
            batch_format="pyarrow")
        .groupby("n").count().select_columns(["n"]), node_schema)

    keep = None
    for _ in range(max(iters, 1)):
        deg = cur.map_batches(halves, batch_format="pyarrow") \
            .groupby("n").sum("c")
        keep = materialize_clean(
            deg.map_batches(
                lambda t: t.filter(
                    pc.greater_equal(t.column("sum(c)"),
                                     pa.scalar(k))).select(["n"]),
                batch_format="pyarrow"),
            node_schema)
        if n_e <= GRAPH_DRIVER_GATE:
            ks = keep.to_pandas()["n"]
            ref = ray.put(pa.array(ks, pa.string()))

            def restrict(t: pa.Table, _r=ref) -> pa.Table:
                v = ray.get(_r)
                return t.filter(pc.and_(
                    pc.is_in(t.column("lo"), value_set=v),
                    pc.is_in(t.column("hi"), value_set=v)))

            cur = materialize_clean(
                cur.map_batches(restrict, batch_format="pyarrow"),
                und_schema)
        else:
            parts = _num_partitions(n_e)
            cur = materialize_clean(
                cur.join(keep, "left_semi", parts,
                         on=("lo",), right_on=("n",))
                .join(keep, "left_semi", parts,
                      on=("hi",), right_on=("n",)),
                und_schema)

    flagged = rename(keep, {"n": "url"}).map_batches(
        lambda t: pa.table({
            "url": t.column("url"),
            "in_core": pa.array(np.ones(t.num_rows, dtype=np.int64))}),
        batch_format="pyarrow")
    base = rename(nodes0, {"n": "url"}).map_batches(
        lambda t: pa.table({
            "url": t.column("url"),
            "in_core": pa.array(np.zeros(t.num_rows, dtype=np.int64))}),
        batch_format="pyarrow")
    out = base.union(flagged).groupby("url").max("in_core")
    return ensure_schema(
        rename(out, {"max(in_core)": "in_core"}),
        pa.schema([("url", pa.string()), ("in_core", pa.int64())]))


def kcore_oracle_sql(pdir: str, k: int = KCORE_K,
                     iters: int = KCORE_ITERS) -> str:
    """Unrolled peel rounds over the shared closed-edge CTE."""
    sql = _EDGE_CTE.format(pdir=pdir) + (
        ", u0 AS (SELECT DISTINCT least(src, dst) AS lo, "
        "greatest(src, dst) AS hi FROM e WHERE src <> dst)")
    prev = "u0"
    for i in range(1, max(iters, 1) + 1):
        sql += (
            f", d{i} AS (SELECT n, count(*)::BIGINT AS c FROM "
            f"(SELECT lo AS n FROM {prev} UNION ALL "
            f"SELECT hi FROM {prev}) GROUP BY n)"
            f", k{i} AS (SELECT n FROM d{i} WHERE c >= {k})"
            f", u{i} AS (SELECT u.lo, u.hi FROM {prev} u "
            f"JOIN k{i} a ON a.n = u.lo JOIN k{i} b ON b.n = u.hi)")
        prev = f"u{i}"
    last_k = f"k{max(iters, 1)}"
    sql += (
        ", n0 AS (SELECT DISTINCT n FROM (SELECT lo AS n FROM u0 "
        "UNION ALL SELECT hi FROM u0)) "
        "SELECT n0.n AS url, CASE WHEN kk.n IS NOT NULL THEN 1 "
        f"ELSE 0 END::BIGINT AS in_core FROM n0 LEFT JOIN {last_k} kk "
        "ON kk.n = n0.n")
    return sql


# ---------------------------------------------------------------------------
# label-propagation communities (Raghavan et al. 2007) — bounded sync LPA

LPA_ITERS = 2


def link_lpa(sf_dir: str, iters: int = LPA_ITERS):
    """(url, community): synchronous label propagation over the
    UNDIRECTED simple closed link graph — ``iters`` rounds of "adopt
    the most frequent neighbour label, ties → lexicographically
    smallest" from label_0 = own url (Raghavan et al. '07; the
    cheap community detector link-curation runs to find site clusters
    and link farms between the components and PageRank passes).
    CONTRACT: fixed ``iters`` rounds, NOT the fixpoint — the bounded-
    rounds convention every iterative graph op here shares (components
    / kcore / dup_clusters), which keeps the op exactly
    oracle-replayable (sync LPA does not converge on bipartite
    structures anyway — label oscillation is inherent to the sync
    variant, a fixed horizon sidesteps it deterministically).

    Scale shape: each neighbour votes once per round (the undirected
    edge set is DISTINCT pairs); ≤GRAPH_DRIVER_GATE edges fold
    per-round (node, label) vote partials on the driver and
    re-broadcast one labels dict (freed per round); above the gate
    labels stay a DATASET — one hash join (votes) + one
    (n, lab)-grouped count + one n-grouped argmax per round, nothing
    node-sized on the driver.  Parity between the paths is pinned by
    test."""
    import pyarrow.compute as pc

    from ._util import materialize_clean

    edges = materialize_clean(_edges_ds(sf_dir), EDGE_SCHEMA)

    def undirect(t: pa.Table) -> pa.Table:
        keep = pc.invert(pc.equal(t.column("src"), t.column("dst")))
        t = t.filter(keep)
        lo = pc.min_element_wise(t.column("src"), t.column("dst"))
        hi = pc.max_element_wise(t.column("src"), t.column("dst"))
        return pa.table({"lo": lo, "hi": hi}).group_by(
            ["lo", "hi"]).aggregate([])

    und_schema = pa.schema([("lo", pa.string()), ("hi", pa.string())])
    ue = materialize_clean(
        edges.map_batches(undirect, batch_format="pyarrow")
        .groupby(["lo", "hi"]).count().select_columns(["lo", "hi"]),
        und_schema)
    n_e = ue.count()
    if n_e == 0:
        import ray.data

        return ray.data.from_arrow(pa.table({
            "url": pa.array([], pa.string()),
            "community": pa.array([], pa.string())}))
    if n_e <= GRAPH_DRIVER_GATE:
        return _lpa_small(ue, n_e, iters)
    return _lpa_large(ue, n_e, iters)


def _lpa_small(ue, n_e: int, iters: int):
    """≤gate: per-round driver vote fold + one labels broadcast."""
    import ray
    import ray.data

    from .textops import collect_df

    nodes = sorted(set(
        collect_df(ue.map_batches(
            lambda df: pd.DataFrame(
                {"n": pd.concat([df["lo"], df["hi"]],
                                ignore_index=True)}),
            batch_format="pandas"))["n"]))
    labels = {n: n for n in nodes}

    for _ in range(max(iters, 1)):
        ref = ray.put(labels)

        def votes(df: pd.DataFrame, _r=ref) -> pd.DataFrame:
            lb = ray.get(_r)
            out = pd.DataFrame({
                "n": pd.concat([df["hi"], df["lo"]], ignore_index=True),
                "lab": pd.concat([df["lo"].map(lb), df["hi"].map(lb)],
                                 ignore_index=True)})
            out["c"] = np.int64(1)
            return out.groupby(["n", "lab"], as_index=False).agg(
                c=("c", "sum"))

        cnt = collect_df(ue.map_batches(votes, batch_format="pandas")) \
            .groupby(["n", "lab"], as_index=False)["c"].sum()
        cnt = cnt.sort_values(["n", "c", "lab"],
                              ascending=[True, False, True])
        first = cnt.drop_duplicates("n")
        labels = dict(zip(first["n"], first["lab"]))
        del ref  # single live broadcast copy across rounds

    return ray.data.from_arrow(pa.table({
        "url": pa.array(nodes, pa.string()),
        "community": pa.array([labels[n] for n in nodes], pa.string()),
    }))


def _lpa_large(ue, n_e: int, iters: int):
    """>gate: labels stay a Dataset; per round join + grouped count +
    per-node argmax."""
    import ray.data

    from ._util import ensure_schema, materialize_clean, rename

    npart = _num_partitions(2 * n_e)
    lab_schema = pa.schema([("n", pa.string()), ("lab", pa.string())])
    ub = ue.map_batches(
        lambda t: pa.table({
            "a": pa.concat_arrays([c.combine_chunks() for c in
                                   (t.column("lo"), t.column("hi"))]),
            "b": pa.concat_arrays([c.combine_chunks() for c in
                                   (t.column("hi"), t.column("lo"))])}),
        batch_format="pyarrow").materialize()

    nodes = ensure_schema(
        rename(ub.select_columns(["a"]), {"a": "n"})
        .groupby("n").count().select_columns(["n"]),
        pa.schema([("n", pa.string())]))
    labels = materialize_clean(
        nodes.map_batches(
            lambda t: pa.table({"n": t.column("n"),
                                "lab": t.column("n")}),
            batch_format="pyarrow"), lab_schema)

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["c", "lab"], ascending=[False, True])
        return pd.DataFrame({"n": [g["n"].iloc[0]],
                             "lab": [g["lab"].iloc[0]]})

    for _ in range(max(iters, 1)):
        msgs = (ub.join(labels, "inner", npart, on=("a",),
                        right_on=("n",))
                .map_batches(lambda t: pa.table(
                    {"n": t.column("b"), "lab": t.column("lab")}),
                    batch_format="pyarrow"))
        cnt = rename(msgs.groupby(["n", "lab"]).count(),
                     {"count()": "c"})
        labels = materialize_clean(
            ensure_schema(
                cnt.groupby("n").map_groups(pick, batch_format="pandas"),
                lab_schema),
            lab_schema)

    def fin(t: pa.Table) -> pa.Table:
        return pa.table({"url": t.column("n"),
                         "community": t.column("lab")})

    return labels.map_batches(fin, batch_format="pyarrow")


def lpa_oracle_sql(pdir: str, iters: int = LPA_ITERS) -> str:
    """Unrolled sync-LPA rounds over the shared closed-edge CTE."""
    sql = _EDGE_CTE.format(pdir=pdir) + (
        ", u0 AS (SELECT DISTINCT least(src, dst) AS lo, "
        "greatest(src, dst) AS hi FROM e WHERE src <> dst)"
        ", ub AS (SELECT lo AS a, hi AS b FROM u0 "
        "UNION ALL SELECT hi, lo FROM u0)"
        ", l0 AS (SELECT DISTINCT a AS n, a AS lab FROM ub)")
    for r in range(1, max(iters, 1) + 1):
        p = r - 1
        sql += (
            f", m{r} AS (SELECT ub.b AS n, l{p}.lab FROM ub "
            f"JOIN l{p} ON l{p}.n = ub.a)"
            f", c{r} AS (SELECT n, lab, count(*)::BIGINT AS c "
            f"FROM m{r} GROUP BY n, lab)"
            f", l{r} AS (SELECT n, lab FROM (SELECT n, lab, "
            f"row_number() OVER (PARTITION BY n ORDER BY c DESC, lab) "
            f"AS rn FROM c{r}) WHERE rn = 1)")
    sql += (f" SELECT n AS url, lab AS community FROM l{max(iters, 1)}")
    return sql


def host_pagerank(sf_dir: str, iters: int = PR_ITERS):
    """(host, score): the same integer PageRank fixed point as
    :func:`link_pagerank`, run over the DISTINCT host→host edge set
    (self-host edges excluded) — the host-reputation ranking a crawl
    scheduler actually consumes (the reference keys all crawl state by
    host, ``urlengine.c:283-338``; per-host priority is what a frontier
    prioritizer feeds on, not per-URL scores).

    Scale shape: one map-side host extraction + in-batch distinct over
    the edge stream, ONE (src,dst)-keyed groupby down to host-pair
    cardinality, then the PageRank machinery — which size-gates itself
    on the (much smaller) host edge count exactly like the URL
    variant."""
    import pyarrow.compute as pc

    from ._util import ensure_schema, materialize_clean

    def hostedge(t: pa.Table) -> pa.Table:
        sh = pc.binary_join(pc.list_slice(
            pc.split_pattern(t.column("src"), "/"), 2, 3), "")
        dh = pc.binary_join(pc.list_slice(
            pc.split_pattern(t.column("dst"), "/"), 2, 3), "")
        out = pa.table({"src": sh, "dst": dh})
        out = out.filter(pc.invert(pc.equal(out.column("src"),
                                            out.column("dst"))))
        return out.group_by(["src", "dst"]).aggregate([])

    # materialize_clean FIRST: above the gate _edges_ds ends in a hash
    # join whose schema-less empty blocks poison the next aggregate
    # (the module-wide convention — see _util.materialize_clean)
    edges = materialize_clean(_edges_ds(sf_dir), EDGE_SCHEMA)
    hedges = materialize_clean(
        ensure_schema(
            edges.map_batches(hostedge, batch_format="pyarrow")
            .groupby(["src", "dst"]).count()
            .select_columns(["src", "dst"]),
            EDGE_SCHEMA),
        EDGE_SCHEMA)
    n_e = hedges.count()
    if n_e == 0:
        import ray.data

        return ray.data.from_arrow(pa.table({
            "host": pa.array([], pa.string()),
            "score": pa.array([], pa.int64())}))
    if n_e <= GRAPH_DRIVER_GATE:
        out = _pagerank_small(hedges, n_e, iters)
    else:
        out = _pagerank_large(hedges, n_e, iters)
    from ._util import rename

    return rename(out, {"url": "host"})


def host_pagerank_oracle_sql(pdir: str, iters: int = PR_ITERS) -> str:
    """pagerank_oracle_sql over the distinct host edge set."""
    cte = [
        f"pl AS (SELECT url AS src, canon AS dst FROM "
        f"read_parquet('{pdir}/golden_canon.parquet') "
        "WHERE canon IS NOT NULL), ",
        f"pu AS (SELECT DISTINCT url FROM "
        f"read_parquet('{pdir}/pages.parquet')), ",
        "e0 AS (SELECT DISTINCT pl.src, pl.dst FROM pl "
        "JOIN pu ON pu.url = pl.dst), ",
        "e AS (SELECT DISTINCT split_part(src, '/', 3) AS src, "
        "split_part(dst, '/', 3) AS dst FROM e0 "
        "WHERE split_part(src, '/', 3) <> split_part(dst, '/', 3)), ",
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
            f"SELECT u AS host, sc::BIGINT AS score FROM s{iters}")
