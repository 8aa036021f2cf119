"""Relational pipelines over the TPC-H-ish test tables — the engine's
generic wide-operation surface (grouped aggregation A1-analog, broadcast
join J1-analog, sort/limit O1-analog) with exact DuckDB oracles.

Money columns aggregate as integer CENTS (floor(x*100+0.5) per row) so
the Ray and SQL sides are bit-identical — float sums are order-dependent
and would flake the value-hash gate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ._util import rename as _rename, task_udf


def _read(sf_dir: str, table: str, columns=None):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def lineitem_agg(sf_dir: str):
    """TPC-H Q1 shape: grouped sums over lineitem with partial
    pre-aggregation inside each batch (combiner before the shuffle)."""
    def pre(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(
            qty=df["l_quantity"].astype("int64"),
            base_cents=np.floor(df["l_extendedprice"] * 100 + 0.5).astype("int64"),
            one=1,
        )
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("qty", "sum"),
            sum_base_cents=("base_cents", "sum"),
            count_order=("one", "sum"),
        )
        return g

    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice"])
    partial = ds.map_batches(pre, batch_format="pandas")
    import ray.data

    agg = partial.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        ray.data.aggregate.Sum("sum_qty"),
        ray.data.aggregate.Sum("sum_base_cents"),
        ray.data.aggregate.Sum("count_order"),
    )
    return _rename(
        agg,
        {
            "sum(sum_qty)": "sum_qty",
            "sum(sum_base_cents)": "sum_base_cents",
            "sum(count_order)": "count_order",
        },
    )


# broadcast-join small-side ceiling: a {custkey: segment} dict at 5M
# rows is ~0.5 GB in plasma — comfortably one ray.put on a 128 GB node,
# clearly NOT at 10× that.  Above the gate the hash join engages.
BROADCAST_ROW_GATE = 5_000_000


def segment_revenue(sf_dir: str, broadcast_gate: int = BROADCAST_ROW_GATE):
    """orders ⋈ customer → revenue per market segment.  When customer is
    genuinely small (footer row count ≤ ``broadcast_gate``) it is
    broadcast: ray.put once, dict-lookup in every batch — no shuffle.
    Above the gate (real TPC-H scale) the sides hash-join on o_custkey
    instead; both paths feed the same partial-agg → groupby tail and are
    pinned equal by a parity test."""
    import ray

    try:
        import pyarrow.parquet as _pq

        n_cust = _pq.read_metadata(f"{sf_dir}/customer.parquet").num_rows
    except Exception:
        n_cust = None

    def tail(partial):
        import ray.data

        agg = partial.groupby("c_mktsegment").aggregate(
            ray.data.aggregate.Sum("revenue_cents"),
            ray.data.aggregate.Sum("n_orders"),
        )
        return _rename(
            agg, {"sum(revenue_cents)": "revenue_cents",
                  "sum(n_orders)": "n_orders"}
        )

    if n_cust is not None and n_cust > broadcast_gate:
        cust_ds = _rename(
            _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]),
            {"c_custkey": "o_custkey"})
        joined = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]) \
            .join(cust_ds, join_type="inner", num_partitions=8,
                  on=("o_custkey",))

        def pre(df: pd.DataFrame) -> pd.DataFrame:
            cents = np.floor(df["o_totalprice"] * 100 + 0.5).astype("int64")
            out = pd.DataFrame({"c_mktsegment": df["c_mktsegment"],
                                "cents": cents, "one": 1})
            return out.groupby("c_mktsegment", as_index=False).agg(
                revenue_cents=("cents", "sum"), n_orders=("one", "sum"))

        return tail(joined.map_batches(pre, batch_format="pandas"))

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    seg_map_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_mktsegment"])))

    class Join:
        def __init__(self, ref):
            self.seg = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            seg = df["o_custkey"].map(self.seg)
            cents = np.floor(df["o_totalprice"] * 100 + 0.5).astype("int64")
            out = pd.DataFrame({"c_mktsegment": seg, "cents": cents, "one": 1})
            return out.groupby("c_mktsegment", as_index=False).agg(
                revenue_cents=("cents", "sum"), n_orders=("one", "sum"))

    ds = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    return tail(ds.map_batches(task_udf(Join, seg_map_ref),
                               batch_format="pandas"))


def top_parts(sf_dir: str, k: int = 10):
    """sort + limit (top-k): deterministic tie-break on p_partkey."""
    def pre(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "p_partkey": df["p_partkey"],
                "price_cents": np.floor(df["p_retailprice"] * 100 + 0.5)
                .astype("int64"),
            }
        )

    ds = _read(sf_dir, "part", ["p_partkey", "p_retailprice"]).map_batches(
        pre, batch_format="pandas"
    )
    out = ds.sort(["price_cents", "p_partkey"], descending=[True, False]) \
            .limit(k)
    return out


def events_by_type(sf_dir: str):
    """events stream rollup: count + value cents per event_type."""
    def pre(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(df["value"] * 100 + 0.5).astype("int64")
        out = pd.DataFrame({"event_type": df["event_type"], "cents": cents,
                            "one": 1})
        return out.groupby("event_type", as_index=False).agg(
            value_cents=("cents", "sum"), n=("one", "sum"))

    ds = _read(sf_dir, "events", ["event_type", "value"]).map_batches(
        pre, batch_format="pandas"
    )
    import ray.data

    agg = ds.groupby("event_type").aggregate(
        ray.data.aggregate.Sum("value_cents"), ray.data.aggregate.Sum("n")
    )
    return _rename(agg, {"sum(value_cents)": "value_cents",
                               "sum(n)": "n"})


def events_window(sf_dir: str, window_minutes: int = 60):
    """Tumbling-window aggregate (the streaming-window op the Dataset API
    lacks natively, via the (a) pattern: window key derived per row in
    map_batches, then a grouped aggregate with in-batch combiners):
    (event_type, window_start, n, value_cents) per
    ``window_minutes``-tumbling window.  window_start is epoch seconds —
    integer, hash-stable."""
    w = window_minutes * 60

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        # unit-safe epoch seconds (the column is timestamp[us]; a raw
        # int64 view would be microseconds)
        epoch = pd.Series(
            df["ts"].values.astype("datetime64[s]").astype("int64"),
            index=df.index)
        out = pd.DataFrame({
            "event_type": df["event_type"],
            "window_start": (epoch // w * w).astype("int64"),
            "cents": np.floor(df["value"] * 100 + 0.5).astype("int64"),
            "one": 1,
        })
        return out.groupby(["event_type", "window_start"],
                           as_index=False).agg(
            value_cents=("cents", "sum"), n=("one", "sum"))

    ds = _read(sf_dir, "events", ["event_type", "ts", "value"]).map_batches(
        pre, batch_format="pandas"
    )
    import ray.data

    agg = ds.groupby(["event_type", "window_start"]).aggregate(
        ray.data.aggregate.Sum("value_cents"), ray.data.aggregate.Sum("n")
    )
    return _rename(agg, {"sum(value_cents)": "value_cents", "sum(n)": "n"})


def events_range_join(sf_dir: str, lookback_seconds: int = 600):
    """Keyed temporal RANGE JOIN (the prompt's custom-operator example,
    via the (a) pattern — co-partition by the equi-key, vectorized
    binary-search range probe per group): for every 'click' event, the
    number of same-user 'view' events with ts in
    ``[click.ts - lookback, click.ts)`` (exclusive of the click's own
    instant).  Returns (event_id, n_prior_views).

    Partitioning assumption: groups are per-user, so the range probe is
    O(C log V) inside each group after one O(V log V) sort — a hot user
    bounds a single group's work but never triggers an all-pairs
    product.  At 100 TB the only shuffle is the groupby(user_id) hash
    exchange; timestamps never leave their partition."""
    lb_us = int(lookback_seconds) * 1_000_000

    def rj(df: pd.DataFrame) -> pd.DataFrame:
        is_view = (df["event_type"] == "view").to_numpy()
        is_click = (df["event_type"] == "click").to_numpy()
        ts = df["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
        vts = np.sort(ts[is_view])
        cts = ts[is_click]
        lo = np.searchsorted(vts, cts - lb_us, side="left")
        hi = np.searchsorted(vts, cts, side="left")
        return pd.DataFrame({
            "event_id": pd.Series(
                df["event_id"].to_numpy(dtype="int64")[is_click],
                dtype="int64"),
            "n_prior_views": pd.Series((hi - lo), dtype="int64"),
        })

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["event_type"].isin(["click", "view"])]

    return ds.map_batches(pre, batch_format="pandas") \
        .groupby("user_id").map_groups(rj, batch_format="pandas")


# Non-uniform price bands (cents, [lo, hi)): a genuinely interval-keyed
# small side — not expressible as modulo binning — covering the
# generator's 900.00-999.90 part price range.  Parts outside every band
# drop (inner-join semantics).
PRICE_BANDS = ((0, 90_000, 92_000), (1, 92_000, 95_000),
               (2, 95_000, 99_000), (3, 99_000, 100_500))


def price_band_join(sf_dir: str):
    """Broadcast INTERVAL-TABLE join (the range-join scale pattern for a
    small build side): part rows land in non-uniform price bands via one
    ``np.searchsorted`` against the broadcast sorted edge array — no
    shuffle of the probe side at all; the only exchange is the final
    tiny per-band groupby.  At 100 TB the interval table rides the task
    closure (equivalently one ``ray.put``) while the probe side streams.
    Returns (band_id, lo_cents, n_parts, sum_price_cents)."""
    edges = np.array([b[1] for b in PRICE_BANDS] + [PRICE_BANDS[-1][2]],
                     dtype="int64")
    los = np.array([b[1] for b in PRICE_BANDS], dtype="int64")

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(df["p_retailprice"] * 100 + 0.5).astype("int64")
        idx = np.searchsorted(edges, cents.to_numpy(), side="right") - 1
        ok = (idx >= 0) & (idx < len(PRICE_BANDS))
        out = pd.DataFrame({"band_id": idx[ok].astype("int64"),
                            "cents": cents[ok], "one": 1})
        return out.groupby("band_id", as_index=False).agg(
            n_parts=("one", "sum"), sum_price_cents=("cents", "sum"))

    ds = _read(sf_dir, "part", ["p_retailprice"]).map_batches(
        pre, batch_format="pandas")
    import ray.data

    agg = ds.groupby("band_id").aggregate(
        ray.data.aggregate.Sum("n_parts"),
        ray.data.aggregate.Sum("sum_price_cents"))
    agg = _rename(agg, {"sum(n_parts)": "n_parts",
                        "sum(sum_price_cents)": "sum_price_cents"})

    def attach_lo(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(lo_cents=los[df["band_id"].to_numpy()])
        return df[["band_id", "lo_cents", "n_parts", "sum_price_cents"]]

    return agg.map_batches(attach_lo, batch_format="pandas")


def events_sliding_window(sf_dir: str, window_seconds: int = 3600,
                          hop_seconds: int = 900):
    """Sliding (hopping) window aggregate — the overlap generalization of
    :func:`events_window`: each event belongs to exactly
    ``window_seconds / hop_seconds`` hop-aligned windows, expanded
    vectorized (np.repeat/tile) inside map_batches, then partial-agg →
    one grouped aggregate.  The expansion factor (4 here) is a constant,
    so the shuffle stays linear in the input.  window_start is epoch
    seconds.  Returns (event_type, window_start, value_cents, n)."""
    assert window_seconds % hop_seconds == 0
    k = window_seconds // hop_seconds

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        epoch = df["ts"].to_numpy(dtype="datetime64[s]").astype("int64")
        base = epoch // hop_seconds * hop_seconds
        starts = (np.repeat(base, k)
                  - np.tile(np.arange(k, dtype="int64") * hop_seconds,
                            len(base)))
        cents = np.floor(df["value"] * 100 + 0.5).astype("int64").to_numpy()
        out = pd.DataFrame({
            "event_type": np.repeat(df["event_type"].to_numpy(), k),
            "window_start": starts,
            "cents": np.repeat(cents, k),
            "one": 1,
        })
        return out.groupby(["event_type", "window_start"],
                           as_index=False).agg(
            value_cents=("cents", "sum"), n=("one", "sum"))

    ds = _read(sf_dir, "events", ["event_type", "ts", "value"]).map_batches(
        pre, batch_format="pandas")
    import ray.data

    agg = ds.groupby(["event_type", "window_start"]).aggregate(
        ray.data.aggregate.Sum("value_cents"), ray.data.aggregate.Sum("n"))
    return _rename(agg, {"sum(value_cents)": "value_cents", "sum(n)": "n"})


def events_asof(sf_dir: str):
    """As-of join (the prompt's custom-operator example, via the (a)
    pattern: co-partition by key, ordered scan per group): for every
    'click' event, the user's latest 'view' event at ts ≤ click.ts.
    Ordering is fully deterministic — rows scan in (ts, is_view-first,
    event_id) order, so a view sharing the click's exact timestamp
    qualifies and equal-ts views resolve to the highest event_id.
    Clicks with no prior view report -1 (a sentinel keeps the gate's
    value-hash free of nullable-int NA quirks).
    Returns (event_id, prev_view_id)."""
    def asof(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(is_click=(df["event_type"] == "click"))
        # views before clicks at equal ts (allow_exact_matches)
        df = df.sort_values(["ts", "is_click", "event_id"])
        eids = df["event_id"].to_numpy(dtype="int64")
        is_view = (df["event_type"] == "view").to_numpy()
        is_click = df["is_click"].to_numpy()
        # vectorized last-view-before-each-row: running max of view
        # positions, then gather (no per-row Python scan)
        pos = np.arange(eids.shape[0])
        last_view_pos = np.maximum.accumulate(np.where(is_view, pos, -1))
        prev = np.where(last_view_pos >= 0,
                        eids[np.maximum(last_view_pos, 0)], -1)
        return pd.DataFrame({
            "event_id": pd.Series(eids[is_click], dtype="int64"),
            "prev_view_id": pd.Series(prev[is_click], dtype="int64"),
        })

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["event_type"].isin(["click", "view"])]

    return ds.map_batches(pre, batch_format="pandas") \
        .groupby("user_id").map_groups(asof, batch_format="pandas")


def events_sessionize(sf_dir: str, gap_minutes: int = 30):
    """Per-user sessionization (windowed stateful op the Dataset API lacks
    natively): groupby(user) → map_groups ordered scan — the (b) pattern
    from the prompt's custom-operator ladder.  Returns (user_id,
    n_sessions, n_events)."""
    def sess(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("ts")
        gaps = df["ts"].diff().dt.total_seconds().fillna(1e18)
        n_sessions = int((gaps > gap_minutes * 60).sum())
        return pd.DataFrame(
            {
                "user_id": [df["user_id"].iloc[0]],
                "n_sessions": [n_sessions],
                "n_events": [len(df)],
            }
        )

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    return ds.groupby("user_id").map_groups(sess, batch_format="pandas")


FUNNEL_STAGES = ("view", "click", "purchase")


def events_funnel(sf_dir: str):
    """(user_id, funnel_stage): deepest ordered-funnel stage each user
    reaches — stage 1 = any ``view``; stage 2 = a ``click`` at or after
    the user's FIRST view; stage 3 = a ``purchase`` at or after that
    first qualifying click (the earliest-qualifying-event semantics
    product analytics funnels use).  Users with no view are absent.

    Scale shape: the read filters to the three stage types (column +
    row pruning), then ONE user-keyed shuffle
    (``groupby(user_id).map_groups``) with a vectorized per-group scan
    — the same custom-windowed-operator ladder rung (b) as
    events_sessionize; output is user-sized, nothing driver-resident."""
    def prefilter(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["event_type"].isin(FUNNEL_STAGES)]

    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts"]) \
        .map_batches(prefilter, batch_format="pandas")

    s1, s2, s3 = FUNNEL_STAGES

    def deepest(df: pd.DataFrame) -> pd.DataFrame:
        ts, et = df["ts"], df["event_type"]
        v = ts[et == s1]
        if v.empty:
            return pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                                 "funnel_stage":
                                     pd.Series([], dtype="int64")})
        t1 = v.min()
        stage = 1
        c = ts[(et == s2) & (ts >= t1)]
        if not c.empty:
            stage = 2
            p = ts[(et == s3) & (ts >= c.min())]
            if not p.empty:
                stage = 3
        return pd.DataFrame({
            "user_id": pd.Series([df["user_id"].iloc[0]], dtype="int64"),
            "funnel_stage": pd.Series([stage], dtype="int64")})

    return ds.groupby("user_id").map_groups(deepest, batch_format="pandas")


def funnel_oracle_sql() -> str:
    """DuckDB replay: chained min-ts stage CTEs, same >= semantics."""
    s1, s2, s3 = FUNNEL_STAGES
    return (
        f"WITH a AS (SELECT user_id, min(ts) AS t1 FROM events "
        f"WHERE event_type = '{s1}' GROUP BY user_id), "
        f"b AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e "
        f"JOIN a USING (user_id) WHERE e.event_type = '{s2}' "
        "AND e.ts >= a.t1 GROUP BY e.user_id), "
        f"c AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e "
        f"JOIN b USING (user_id) WHERE e.event_type = '{s3}' "
        "AND e.ts >= b.t2 GROUP BY e.user_id) "
        "SELECT a.user_id, (CASE WHEN c.user_id IS NOT NULL THEN 3 "
        "WHEN b.user_id IS NOT NULL THEN 2 ELSE 1 END)::BIGINT "
        "AS funnel_stage FROM a "
        "LEFT JOIN b USING (user_id) LEFT JOIN c USING (user_id)")


def events_retention(sf_dir: str):
    """(cohort_day, offset_days, n_users): the cohort retention matrix —
    users grouped by their first-activity day (epoch days, integer),
    counted once per (cohort, days-since-first) cell.  The standard
    product-analytics D1/D7/D30 retention aggregation.

    Scale shape: ONE user-keyed shuffle (``groupby(user_id).map_groups``
    emitting each user's distinct (cohort_day, offset_days) cells,
    vectorized) then a cell-keyed groupby-count — cells are bounded by
    days², never user- or event-sized on the driver."""
    def cells(df: pd.DataFrame) -> pd.DataFrame:
        days = df["ts"].to_numpy("datetime64[D]").astype(np.int64)
        cohort = days.min()
        offs = np.unique(days - cohort)
        return pd.DataFrame({
            "cohort_day": np.full(offs.shape[0], cohort, dtype=np.int64),
            "offset_days": offs,
            "one": np.ones(offs.shape[0], dtype=np.int64)})

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    agg = ds.groupby("user_id").map_groups(cells, batch_format="pandas") \
        .groupby(["cohort_day", "offset_days"]).sum("one")

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "cohort_day": df["cohort_day"].astype("int64"),
            "offset_days": df["offset_days"].astype("int64"),
            "n_users": df["sum(one)"].astype("int64")})

    return agg.map_batches(fin, batch_format="pandas")


def retention_oracle_sql() -> str:
    """DuckDB replay: first day per user, distinct day offsets, epoch
    days as integers."""
    return (
        "WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS c0 "
        "FROM events GROUP BY user_id), "
        "e AS (SELECT DISTINCT ev.user_id, "
        "(f.c0 - DATE '1970-01-01')::BIGINT AS cohort_day, "
        "(CAST(ev.ts AS DATE) - f.c0)::BIGINT AS offset_days "
        "FROM events ev JOIN f USING (user_id)) "
        "SELECT cohort_day, offset_days, count(*)::BIGINT AS n_users "
        "FROM e GROUP BY cohort_day, offset_days")


# ---------------------------------------------------------------------------
# TPC-H Q3 shape — the canonical BIG⋈BIG shuffle hash join: per-order
# lineitem revenue joined to date-filtered orders, top-k by revenue.

Q3_CUTOFF = "1998-01-01"
Q3_K = 10


def order_revenue_topk(sf_dir: str, k: int = Q3_K):
    """(o_orderkey, o_orderdate, o_orderpriority, revenue_cents): the
    k highest-revenue orders among those PLACED before Q3_CUTOFF with
    line items SHIPPED after it (the classic Q3 'urgent backlog' slice).
    revenue_cents = Σ floor(l_extendedprice·(1−l_discount)·100 + 0.5)
    per line item — the repo's integer money discipline, replayed
    expression-for-expression by the oracle.

    Scale shape: both sides are corpus-sized, so this is the one
    deliberately NON-broadcast join in the relational family — lineitem
    is date-filtered AT THE BATCH and pre-aggregated per l_orderkey
    inside each batch (combiner) so only (orderkey, cents) partials
    enter the orderkey-keyed exchange; orders is column-pruned and
    date-filtered before the hash join on the SAME key; the top-k tail
    is a sort+limit over the already-order-grained join output."""
    cutoff = np.datetime64(Q3_CUTOFF)

    def li_pre(df: pd.DataFrame) -> pd.DataFrame:
        m = df["l_shipdate"].to_numpy() > cutoff
        df = df[m]
        cents = np.floor(df["l_extendedprice"].to_numpy()
                         * (1.0 - df["l_discount"].to_numpy())
                         * 100 + 0.5).astype("int64")
        part = pd.DataFrame({"o_orderkey": df["l_orderkey"],
                             "cents": cents})
        return part.groupby("o_orderkey", as_index=False).agg(
            cents=("cents", "sum"))

    def ord_pre(df: pd.DataFrame) -> pd.DataFrame:
        m = df["o_orderdate"].to_numpy() < cutoff
        return df[m]

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount",
                "l_shipdate"]) \
        .map_batches(li_pre, batch_format="pandas") \
        .groupby("o_orderkey").sum("cents")
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderdate", "o_orderpriority"]) \
        .map_batches(ord_pre, batch_format="pandas")

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_orderkey": df["o_orderkey"].astype("int64"),
            "o_orderdate": df["o_orderdate"],
            "o_orderpriority": df["o_orderpriority"],
            "revenue_cents": df["sum(cents)"].astype("int64")})

    return orders.join(li, join_type="inner", num_partitions=8,
                       on=("o_orderkey",)) \
        .map_batches(fin, batch_format="pandas") \
        .sort(["revenue_cents", "o_orderkey"], descending=[True, False]) \
        .limit(k)


def order_revenue_oracle_sql(k: int = Q3_K) -> str:
    return (
        "WITH li AS (SELECT l_orderkey AS o_orderkey, "
        "SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) "
        "AS BIGINT))::BIGINT AS revenue_cents FROM lineitem "
        f"WHERE l_shipdate > TIMESTAMP '{Q3_CUTOFF}' GROUP BY 1) "
        "SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority, "
        "li.revenue_cents FROM orders o JOIN li USING (o_orderkey) "
        f"WHERE o.o_orderdate < TIMESTAMP '{Q3_CUTOFF}' "
        f"ORDER BY li.revenue_cents DESC, o.o_orderkey LIMIT {k}")


# ---------------------------------------------------------------------------
# event-type co-occurrence (market-basket / A-Priori pair-support pass)


def events_cooccur(sf_dir: str):
    """(type_a, type_b, n_users) with type_a < type_b: for every
    unordered event-type pair, how many distinct users performed BOTH —
    the A-Priori candidate-pair support table (Agrawal & Srikant '94's
    L2 pass), the standard co-engagement signal.

    Scale shape: distinct (user, type) first — ONE user-keyed
    exchange that also bounds the blow-up (a user with a million
    events still yields ≤ |type-domain| rows); pairs are generated
    inside ``map_groups`` per user (quadratic only in the BOUNDED
    per-user distinct-type count, never in events); the pair-keyed
    count is over a type² bounded domain."""
    from itertools import combinations

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        ts = sorted(set(df["event_type"]))
        ab = list(combinations(ts, 2))
        return pd.DataFrame({
            "type_a": pd.Series([a for a, _ in ab], dtype="object"),
            "type_b": pd.Series([b for _, b in ab], dtype="object"),
            "one": pd.Series([1] * len(ab), dtype="int64")})

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "type_a": df["type_a"], "type_b": df["type_b"],
            "n_users": df["sum(one)"].astype("int64")})

    return _read(sf_dir, "events", ["user_id", "event_type"]) \
        .map_batches(dedup, batch_format="pandas") \
        .groupby("user_id").map_groups(pairs, batch_format="pandas") \
        .groupby(["type_a", "type_b"]).sum("one") \
        .map_batches(fin, batch_format="pandas")


def events_cooccur_oracle_sql() -> str:
    return (
        "WITH ut AS (SELECT DISTINCT user_id, event_type FROM events) "
        "SELECT a.event_type AS type_a, b.event_type AS type_b, "
        "count(*)::BIGINT AS n_users FROM ut a "
        "JOIN ut b ON b.user_id = a.user_id "
        "AND b.event_type > a.event_type GROUP BY 1, 2")


# ---------------------------------------------------------------------------
# top-N per key — the OTHER top-k (top_parts is global; this is the
# per-group variant every session/feed pipeline needs).

TPU_N = 2


def top_events_per_user(sf_dir: str, n: int = TPU_N):
    """(user_id, event_id, event_type, value_cents, rnk): each user's
    ``n`` highest-value events, ranked with a deterministic
    (value desc, event_id asc) tie-break.

    Scale shape: ONE user-keyed exchange; the per-group sort inside
    ``map_groups`` touches only that user's rows (bounded by per-user
    activity, never corpus-sized), and only n·users rows leave."""
    def cents(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df["user_id"].astype("int64"),
            "event_id": df["event_id"].astype("int64"),
            "event_type": df["event_type"],
            "value_cents": np.floor(df["value"] * 100 + 0.5)
            .astype("int64")})

    def top(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["value_cents", "event_id"],
                          ascending=[False, True]).head(n)
        g = g.reset_index(drop=True)
        g["rnk"] = pd.Series(range(1, len(g) + 1), dtype="int64")
        return g

    return _read(sf_dir, "events",
                 ["user_id", "event_id", "event_type", "value"]) \
        .map_batches(cents, batch_format="pandas") \
        .groupby("user_id").map_groups(top, batch_format="pandas")


def top_events_oracle_sql(n: int = TPU_N) -> str:
    return (
        "WITH c AS (SELECT user_id, event_id, event_type, "
        "CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_cents "
        "FROM events), "
        "r AS (SELECT *, row_number() OVER (PARTITION BY user_id "
        "ORDER BY value_cents DESC, event_id) AS rnk FROM c) "
        "SELECT user_id, event_id, event_type, value_cents, "
        f"rnk::BIGINT AS rnk FROM r WHERE rnk <= {n}")


# ---------------------------------------------------------------------------
# grouped exact quantiles — per-key percentile_disc without sorting the
# data (the two-level histogram of textops.length_quantiles, PARTITIONED
# by the group key).

VQ_PERMILLE = (250, 500, 750, 900)


def value_quantiles(sf_dir: str, permille=VQ_PERMILLE):
    """(event_type, q_permille, value_cents): exact per-type quantiles
    of the integer event value — for each q the smallest cents whose
    within-type cumulative count × 1000 ≥ q × type total
    (percentile_disc semantics, decided in integers).

    Scale shape: in-batch (type, cents) value-count partials → one
    grouped sum bounded by type × distinct-value domain (never
    events-sized) → a driver fold of that bounded histogram; no sort,
    no event-width shuffle."""
    import ray.data

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "event_type": df["event_type"],
            "v": np.floor(df["value"] * 100 + 0.5).astype("int64"),
            "c": np.ones(len(df), dtype=np.int64)})
        return out.groupby(["event_type", "v"], as_index=False).agg(
            c=("c", "sum"))

    hist = _read(sf_dir, "events", ["event_type", "value"]) \
        .map_batches(partial, batch_format="pandas") \
        .groupby(["event_type", "v"]).sum("c").to_pandas() \
        .rename(columns={"sum(c)": "c"})

    types, qs, vals = [], [], []
    for et, g in hist.groupby("event_type"):
        g = g.sort_values("v").reset_index(drop=True)
        cum1000 = g["c"].cumsum().to_numpy(dtype=np.int64) * 1000
        total = int(g["c"].sum())
        v = g["v"].to_numpy(dtype=np.int64)
        idx = np.searchsorted(
            cum1000, np.asarray(permille, dtype=np.int64) * total,
            side="left")
        types.extend([et] * len(permille))
        qs.extend(int(q) for q in permille)
        vals.extend(int(x) for x in v[idx])
    return ray.data.from_arrow(pa.table({
        "event_type": pa.array(types, pa.string()),
        "q_permille": pa.array(qs, pa.int64()),
        "value_cents": pa.array(vals, pa.int64())}))


def value_quantiles_oracle_sql(permille=VQ_PERMILLE) -> str:
    qlist = ", ".join(str(q) for q in permille)
    return (
        "WITH c AS (SELECT event_type, "
        "CAST(floor(value * 100 + 0.5) AS BIGINT) AS v FROM events), "
        "h AS (SELECT event_type, v, count(*)::BIGINT AS c "
        "FROM c GROUP BY 1, 2), "
        "t AS (SELECT event_type, sum(c)::BIGINT AS tot "
        "FROM h GROUP BY 1), "
        "w AS (SELECT event_type, v, (sum(c) OVER (PARTITION BY "
        "event_type ORDER BY v))::BIGINT * 1000 AS cum1000 FROM h), "
        f"q AS (SELECT event_type, unnest([{qlist}])::BIGINT AS qp "
        "FROM t) "
        "SELECT q.event_type, q.qp AS q_permille, "
        "min(w.v)::BIGINT AS value_cents FROM q "
        "JOIN t ON t.event_type = q.event_type "
        "JOIN w ON w.event_type = q.event_type "
        "AND w.cum1000 >= q.qp * t.tot GROUP BY 1, 2")


US_PER_DAY = 86_400_000_000


def events_anomaly(sf_dir: str):
    """(event_type, day, n, permille_of_mean): daily volume per event
    type scored against that type's mean daily volume — the ops
    anomaly dashboard (a day at 3000‰ of mean is an incident; 0‰ days
    are outages).  permille_of_mean = n · n_days · 1000 // total is
    integer-exact (no float mean), so the oracle replays it.

    Scale shape: in-batch (type, day) partials → grouped sum (keys =
    types × days, far below event count); the per-type totals are
    types-sized — collected once and broadcast via ray.put, never a
    second pass over events."""
    import ray
    import ray.data

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        # explicit µs unit (the relops convention, see events_window):
        # .astype('int64') would silently yield ns on pandas/pyarrow
        # combos that materialize datetime64[ns] blocks
        days = pd.Series(
            df["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
            // US_PER_DAY, index=df.index, dtype="int64")
        out = pd.DataFrame({"event_type": df["event_type"], "day": days,
                            "one": 1})
        return out.groupby(["event_type", "day"], as_index=False).agg(
            n=("one", "sum"))

    daily = _rename(
        _read(sf_dir, "events", ["event_type", "ts"])
        .map_batches(pre, batch_format="pandas")
        .groupby(["event_type", "day"])
        .aggregate(ray.data.aggregate.Sum("n")),
        {"sum(n)": "n"})

    totals = {r["event_type"]: (int(r["total"]), int(r["n_days"]))
              for r in _rename(
                  daily.groupby("event_type").aggregate(
                      ray.data.aggregate.Sum("n"),
                      ray.data.aggregate.Count()),
                  {"sum(n)": "total", "count()": "n_days"}).take_all()}
    ref = ray.put(totals)

    def score(df: pd.DataFrame, _r=ref) -> pd.DataFrame:
        t = ray.get(_r)
        tot = df["event_type"].map(lambda k: t[k][0]).astype("int64")
        nd = df["event_type"].map(lambda k: t[k][1]).astype("int64")
        return pd.DataFrame({
            "event_type": df["event_type"],
            "day": df["day"].astype("int64"),
            "n": df["n"].astype("int64"),
            "permille_of_mean":
                (df["n"].astype("int64") * nd * 1000 // tot)})

    return daily.map_batches(score, batch_format="pandas")


def events_anomaly_oracle_sql() -> str:
    """Two grouped CTEs + integer permille vs per-type daily mean."""
    return (
        "WITH e AS (SELECT event_type, "
        f"epoch_us(ts) // {US_PER_DAY} AS day FROM events), "
        "d AS (SELECT event_type, day, count(*)::BIGINT AS n FROM e "
        "GROUP BY event_type, day), "
        "t AS (SELECT event_type, sum(n)::BIGINT AS total, "
        "count(*)::BIGINT AS n_days FROM d GROUP BY event_type) "
        "SELECT d.event_type, d.day::BIGINT AS day, d.n, "
        "(d.n * t.n_days * 1000 // t.total)::BIGINT "
        "AS permille_of_mean FROM d JOIN t USING (event_type)")


def events_markov(sf_dir: str):
    """(prev_type, next_type, n): per-user event-type transition counts
    — the first-order Markov matrix behind "what do users do next"
    product analytics (and the sequence prior a session-generation
    model trains on).  Each user's events are ordered by (ts, event_id)
    (the deterministic total order every windowed event op here uses);
    adjacent pairs count once; the matrix sums over users.

    Scale shape: ONE user-keyed shuffle (groupby(user_id).map_groups)
    emits in-group transition PARTIALS (pairs ≪ events), then a
    (prev, next)-keyed grouped sum over type²-sized rows — the
    combiner-before-exchange convention; nothing event-sized reaches
    the driver."""
    import ray.data

    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts",
                                  "event_id"])

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        et = g["event_type"].to_numpy()
        if len(et) < 2:
            return pd.DataFrame({
                "prev_type": pd.Series([], dtype="object"),
                "next_type": pd.Series([], dtype="object"),
                "n": pd.Series([], dtype="int64")})
        p = pd.DataFrame({"prev_type": et[:-1], "next_type": et[1:],
                          "n": np.int64(1)})
        return p.groupby(["prev_type", "next_type"],
                         as_index=False).agg(n=("n", "sum"))

    partial = ds.groupby("user_id").map_groups(
        pairs, batch_format="pandas")
    agg = partial.groupby(["prev_type", "next_type"]).aggregate(
        ray.data.aggregate.Sum("n"))
    return _rename(agg, {"sum(n)": "n"})


def markov_oracle_sql() -> str:
    return (
        "WITH o AS (SELECT user_id, event_type, "
        "lead(event_type) OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id) AS nxt FROM events) "
        "SELECT event_type AS prev_type, nxt AS next_type, "
        "count(*)::BIGINT AS n FROM o WHERE nxt IS NOT NULL "
        "GROUP BY 1, 2")


Q5_REGION = "ASIA"


def local_supplier_volume(sf_dir: str, region: str = Q5_REGION):
    """(n_name, revenue_cents): TPC-H Q5 shape — revenue from line
    items where the SUPPLIER sits in the same nation as the ordering
    CUSTOMER, rolled up per nation within one region: the engine's
    widest join pipeline (6 tables).

    Scale shape: the four dimension sides (customer keys→nation,
    supplier keys→nation, nation, region) are broadcast dicts —
    nation/region are O(10) rows forever; supplier and customer key
    maps are ray.put once (the segment_revenue gate note applies at
    10× TPC-H scale: swap the customer map for a hash join, same
    tail).  The big-big lineitem ⋈ orders join pre-aggregates
    lineitem per (orderkey, supplier-nation) inside each batch
    (combiner) so only those partials enter the orderkey-keyed
    exchange; the local-supplier filter (c_nat == s_nat) and the
    nations-sized rollup run on the join output."""
    import ray
    import ray.data

    nat = _read(sf_dir, "nation",
                ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    rkeys = set(reg.loc[reg["r_name"] == region, "r_regionkey"])
    nat_in = nat[nat["n_regionkey"].isin(rkeys)]
    nat_name = dict(zip(nat_in["n_nationkey"], nat_in["n_name"]))
    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey"]).to_pandas()
    supp = _read(sf_dir, "supplier",
                 ["s_suppkey", "s_nationkey"]).to_pandas()
    cref = ray.put(dict(zip(cust["c_custkey"], cust["c_nationkey"])))
    sref = ray.put(dict(zip(supp["s_suppkey"], supp["s_nationkey"])))

    def li_pre(df: pd.DataFrame, _s=sref) -> pd.DataFrame:
        smap = ray.get(_s)
        cents = np.floor(df["l_extendedprice"].to_numpy()
                         * (1.0 - df["l_discount"].to_numpy())
                         * 100 + 0.5).astype("int64")
        part = pd.DataFrame({
            "o_orderkey": df["l_orderkey"].astype("int64"),
            "s_nat": df["l_suppkey"].map(smap).astype("int64"),
            "cents": cents})
        return part.groupby(["o_orderkey", "s_nat"],
                            as_index=False).agg(cents=("cents", "sum"))

    def ord_pre(df: pd.DataFrame, _c=cref) -> pd.DataFrame:
        cmap = ray.get(_c)
        return pd.DataFrame({
            "o_orderkey": df["o_orderkey"].astype("int64"),
            "c_nat": df["o_custkey"].map(cmap).astype("int64")})

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice",
                "l_discount"]) \
        .map_batches(li_pre, batch_format="pandas")
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]) \
        .map_batches(ord_pre, batch_format="pandas")

    nref = ray.put(nat_name)

    def local_roll(df: pd.DataFrame, _n=nref) -> pd.DataFrame:
        names = ray.get(_n)
        m = (df["s_nat"] == df["c_nat"]) & df["s_nat"].isin(names)
        df = df[m]
        out = pd.DataFrame({
            "n_name": df["s_nat"].map(names),
            "cents": df["cents"].astype("int64")})
        return out.groupby("n_name", as_index=False).agg(
            cents=("cents", "sum"))

    joined = li.join(orders, join_type="inner", num_partitions=8,
                     on=("o_orderkey",)) \
        .map_batches(local_roll, batch_format="pandas")
    agg = joined.groupby("n_name").aggregate(
        ray.data.aggregate.Sum("cents"))
    return _rename(agg, {"sum(cents)": "revenue_cents"})


def q5_oracle_sql(region: str = Q5_REGION) -> str:
    return (
        "SELECT n.n_name, "
        "SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 "
        "+ 0.5) AS BIGINT))::BIGINT AS revenue_cents "
        "FROM customer c, orders o, lineitem l, supplier s, "
        "nation n, region r "
        "WHERE c.c_custkey = o.o_custkey "
        "AND l.l_orderkey = o.o_orderkey "
        "AND l.l_suppkey = s.s_suppkey "
        "AND c.c_nationkey = s.s_nationkey "
        "AND s.s_nationkey = n.n_nationkey "
        "AND n.n_regionkey = r.r_regionkey "
        f"AND r.r_name = '{region}' "
        "GROUP BY n.n_name")
