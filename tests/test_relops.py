"""Relational wide-op paths whose branches aren't separately covered by
the DuckDB oracle gate (which only exercises the default branch)."""

from methanol_web_crawler_ray.pipelines import relops


def _rows(ds):
    return sorted(
        (r["c_mktsegment"], int(r["revenue_cents"]), int(r["n_orders"]))
        for r in ds.take_all())


def test_segment_revenue_join_vs_broadcast_parity(ray_session):
    """The above-gate hash-join path and the broadcast path produce
    identical integer aggregates."""
    sf = "/root/testdata/sf0.001"
    broadcast = _rows(relops.segment_revenue(sf))
    joined = _rows(relops.segment_revenue(sf, broadcast_gate=-1))
    assert broadcast == joined and len(broadcast) > 0
