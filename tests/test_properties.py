"""Property tests (SURVEY.md §5.5): canonicalizer idempotence, seen-set
closure under permutation, cuckoo-filter membership soundness."""

import string

from hypothesis import given, settings, strategies as st

from methanol_web_crawler_ray.functions.urlkit import url_set
from methanol_web_crawler_ray.state.seen import (CuckooFilter, LocalSeenPool,
                                                 SeenShardState)

_url_chars = st.text(
    alphabet=string.ascii_letters + string.digits + "/.-_%?&=#+~",
    min_size=0, max_size=60,
)
_host_chars = st.text(
    alphabet=string.ascii_lowercase + string.digits + ".-",
    min_size=1, max_size=24,
)


@settings(max_examples=300, deadline=None)
@given(host=_host_chars, path=_url_chars)
def test_canonicalizer_reaches_fixpoint(host, path):
    """Re-canonicalizing stabilizes within one extra application.  Exact
    idempotence does NOT hold — faithful to the reference: a trailing
    ``/.`` canonicalizes to a bare ``.`` (url.c:402-404), which re-parses
    as a bare-host URL and grows a ``/`` — so the property is
    canon²(x) == canon³(x), with flags stable at the fixpoint."""
    raw = f"http://{host}/{path}"
    u = url_set(raw)
    if u is None:
        return
    # each application can peel one '/.'-layer, so convergence depth is
    # input-dependent but bounded; require a fixpoint within 6 steps
    prev = u
    for _ in range(6):
        nxt = url_set(prev.s)
        assert nxt is not None, f"canonical form failed to re-parse: {prev.s!r}"
        if nxt.s == prev.s:
            assert (nxt.host_o, nxt.host_l, nxt.protocol) == (
                prev.host_o, prev.host_l, prev.protocol)
            assert nxt.is_dynamic == prev.is_dynamic
            return
        prev = nxt
    raise AssertionError(f"no fixpoint within 6 steps for {raw!r}")


@settings(max_examples=100, deadline=None)
@given(keys=st.lists(st.text(min_size=1, max_size=30), max_size=50),
       seed=st.integers(0, 2**16))
def test_seen_set_closure_under_permutation(keys, seed):
    """The final seen SET is order-independent (only winners differ)."""
    import random

    a = SeenShardState("exact")
    a.try_add_batch(keys)
    shuffled = list(keys)
    random.Random(seed).shuffle(shuffled)
    b = SeenShardState("exact")
    b.try_add_batch(shuffled)
    assert a.exact == b.exact
    # exactly one True per distinct key
    c = SeenShardState("exact")
    verdicts = c.try_add_batch(keys)
    assert sum(verdicts) == len(set(keys))


@settings(max_examples=30, deadline=None)
@given(keys=st.lists(st.text(min_size=1, max_size=20), min_size=1,
                     max_size=200, unique=True))
def test_cuckoo_no_false_negatives(keys):
    """A cuckoo filter may false-positive but never false-negative."""
    f = CuckooFilter(1 << 10)
    inserted = [k for k in keys if f.try_add(k) or k in f]
    for k in inserted:
        assert k in f


@settings(max_examples=50, deadline=None)
@given(pairs=st.lists(
    st.tuples(st.sampled_from(["a.x", "b.y", "c.z"]),
              st.text(min_size=1, max_size=16)),
    max_size=60,
))
def test_pool_sharding_consistent(pairs):
    """Shard routing never splits one host's keyspace: re-adding through
    the pool equals a single global set."""
    pool = LocalSeenPool(num_shards=4)
    out = []
    for h, k in pairs:
        out.append(pool.try_add_batch(h, [h + "/" + k])[0])
    assert sum(out) == len({(h, k) for h, k in pairs})


def test_snapshot_dir_roundtrip(tmp_path):
    """snapshot_to_dir / restore_from_dir ≡ snapshots() / restore():
    same file names and bytes as the old driver-side writer, state
    fully recovered, membership preserved."""
    pool = LocalSeenPool(num_shards=4)
    for h, k in [("a.x", "/1"), ("a.x", "/2"), ("b.y", "/1"), ("c.z", "/q")]:
        pool.try_add_batch(h, [h + k])
    blobs = pool.snapshots()
    d = tmp_path / "ckpt"
    d.mkdir()
    pool.snapshot_to_dir(str(d))
    for i, blob in enumerate(blobs):
        assert (d / f"seen_{i}.bin").read_bytes() == blob
    fresh = LocalSeenPool(num_shards=4)
    fresh.restore_from_dir(str(d))
    assert fresh.size() == pool.size()
    # every key already present → no re-adds anywhere
    for h, k in [("a.x", "/1"), ("a.x", "/2"), ("b.y", "/1"), ("c.z", "/q")]:
        assert fresh.try_add_batch(h, [h + k]) == [False]


def test_ray_pool_snapshot_dir_roundtrip(tmp_path, ray_session):
    from methanol_web_crawler_ray.state.seen import make_seen_pool

    pool = make_seen_pool(num_shards=2)
    pool.try_add_batch("a.x", ["a.x/1", "a.x/2"])
    d = tmp_path / "ckpt"
    d.mkdir()
    pool.snapshot_to_dir(str(d))
    fresh = make_seen_pool(num_shards=2)
    fresh.restore_from_dir(str(d))
    assert fresh.try_add_batch("a.x", ["a.x/1", "a.x/3"]) == [False, True]
    pool.shutdown()
    fresh.shutdown()
