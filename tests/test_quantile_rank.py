"""length_quantiles / global_rank vs brute-force in-process oracles."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from methanol_web_crawler_ray.pipelines import textops


@pytest.fixture(scope="module")
def docs(sf_dir):
    return pq.read_table(f"{sf_dir}/documents.parquet").to_pylist()


def _brute_quantiles(lengths, permille):
    """Smallest value with cum_count*1000 >= q*total (percentile_disc)."""
    s = sorted(lengths)
    n = len(s)
    out = {}
    for q in permille:
        for i, v in enumerate(s, start=1):
            if i * 1000 >= q * n:
                out[q] = v
                break
    return out


def test_length_quantiles(ray_session, sf_dir, docs):
    lengths = [len(d["text"]) for d in docs]
    want = _brute_quantiles(lengths, textops.QUANTILE_PERMILLE)
    got = {r["q_permille"]: r["n_chars"]
           for r in textops.length_quantiles(sf_dir).take_all()}
    assert got == want


def test_length_quantiles_gate_parity(ray_session, sf_dir):
    """Driver-fold and distributed-groupby merge paths agree."""
    a = sorted(map(tuple, (r.values() for r in
                           textops.length_quantiles(sf_dir).take_all())))
    b = sorted(map(tuple, (r.values() for r in textops.length_quantiles(
        sf_dir, hist_gate=-1).take_all())))
    assert a == b


def test_length_quantiles_degenerate_single_value(ray_session, tmp_path):
    """All-equal-length corpus: every quantile is that one length."""
    import pyarrow as pa

    t = pa.table({"doc_id": pa.array(range(100), pa.int64()),
                  "text": pa.array(["x" * 7] * 100)})
    pq.write_table(t, tmp_path / "documents.parquet")
    rows = textops.length_quantiles(str(tmp_path)).take_all()
    assert {r["n_chars"] for r in rows} == {7}
    assert sorted(r["q_permille"] for r in rows) == \
        sorted(textops.QUANTILE_PERMILLE)


def test_global_rank(ray_session, sf_dir, docs):
    order = sorted((len(d["text"]), d["doc_id"]) for d in docs)
    want = {doc_id: i for i, (_, doc_id) in enumerate(order, start=1)}
    got = {r["doc_id"]: r["rank"]
           for r in textops.global_rank(sf_dir).take_all()}
    assert got == want


def test_global_rank_is_a_permutation(ray_session, sf_dir, docs):
    ranks = [r["rank"] for r in textops.global_rank(sf_dir).take_all()]
    assert sorted(ranks) == list(range(1, len(docs) + 1))


def test_pack_shards(ray_session, sf_dir, docs):
    order = sorted((len(d["text"]), d["doc_id"]) for d in docs)
    off, want = 0, {}
    for ln, doc_id in order:
        want[doc_id] = (off, off // textops.SHARD_BYTES)
        off += ln
    got = {r["doc_id"]: (r["offset_bytes"], r["shard_id"])
           for r in textops.pack_shards(sf_dir).take_all()}
    assert got == want


def test_pack_shards_boundaries(ray_session, sf_dir):
    """Shards are dense 0..max and no doc's offset jumps a shard."""
    rows = sorted(textops.pack_shards(sf_dir).take_all(),
                  key=lambda r: r["offset_bytes"])
    shards = [r["shard_id"] for r in rows]
    assert shards[0] == 0
    for a, b in zip(shards, shards[1:]):
        assert b - a in (0, 1)


def _brute_lm(docs, min_count):
    from collections import Counter

    per_doc = {d["doc_id"]: textops._bigram_keys(d["text"]) for d in docs}
    counts = Counter()
    for xs in per_doc.values():
        counts.update(xs.tolist())
    model = {x for x, c in counts.items() if c >= min_count}
    out = {}
    for doc_id, xs in per_doc.items():
        nb = len(xs)
        nk = sum(1 for x in xs.tolist() if x in model)
        out[doc_id] = (nb, nk, (nk * 1000) // nb if nb else 0)
    return out


def test_lm_coverage(ray_session, sf_dir, docs):
    want = _brute_lm(docs, textops.LM_MIN_COUNT)
    got = {r["doc_id"]: (r["n_bigrams"], r["n_known"],
                         r["coverage_permille"])
           for r in textops.lm_coverage(sf_dir).take_all()}
    assert got == want


def test_lm_buckets(ray_session, sf_dir, docs):
    """CCNet head/middle/tail split vs brute-force descending-
    percentile thresholds computed from the lm_coverage scores."""
    cov = {r["doc_id"]: r["coverage_permille"]
           for r in textops.lm_coverage(sf_dir).take_all()}
    s = sorted(cov.values(), reverse=True)
    n = len(s)

    def thresh(q):
        for i, v in enumerate(s, start=1):
            if i * 1000 >= q * n:
                return v
        return s[-1]

    t_head, t_mid = (thresh(q) for q in textops.LM_BUCKET_Q)
    want = {d: (c, "head" if c >= t_head
                else "middle" if c >= t_mid else "tail")
            for d, c in cov.items()}
    got = {r["doc_id"]: (r["coverage_permille"], r["bucket"])
           for r in textops.lm_buckets(sf_dir).take_all()}
    assert got == want
    # head is never empty and holds the best scores (>= every other
    # bucket's max) — the saturated-distribution direction is pinned
    heads = [c for c, b in got.values() if b == "head"]
    rest = [c for c, b in got.values() if b != "head"]
    assert heads
    assert not rest or min(heads) >= max(rest)


def test_lm_buckets_gate_parity(ray_session, sf_dir):
    """Driver-fold and distributed-groupby histogram merges agree."""
    a = sorted(map(tuple, (r.values() for r in
                           textops.lm_buckets(sf_dir).take_all())))
    b = sorted(map(tuple, (r.values() for r in textops.lm_buckets(
        sf_dir, hist_gate=-1).take_all())))
    assert a == b


def test_lm_coverage_gate_parity(ray_session, sf_dir):
    """Driver-fold and distributed-groupby model merges agree."""
    a = sorted(map(tuple, (r.values() for r in
                           textops.lm_coverage(sf_dir).take_all())))
    b = sorted(map(tuple, (r.values() for r in textops.lm_coverage(
        sf_dir, driver_limit=-1).take_all())))
    assert a == b


def test_pack_shards_non_ascii_bytes(ray_session, tmp_path):
    """Offsets are ENCODED UTF-8 BYTES, not unicode chars — a non-ASCII
    corpus must pack by real byte length (ADVICE r3: char-counted
    'byte' offsets were wrong for any non-ASCII text)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = ["héllo wörld", "plain ascii", "日本語のテキスト", "x"]
    d = str(tmp_path)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }), f"{d}/documents.parquet")

    order = sorted((len(t.encode()), i) for i, t in enumerate(texts))
    off, want = 0, {}
    for nb, doc_id in order:
        want[doc_id] = (off, off // textops.SHARD_BYTES)
        off += nb
    got = {r["doc_id"]: (r["offset_bytes"], r["shard_id"])
           for r in textops.pack_shards(d).take_all()}
    assert got == want
    assert max(o for o, _ in got.values()) > max(
        (len(t), i) for i, t in enumerate(texts))[0] - 1  # bytes > chars


def test_lm_coverage_top_v_cap(ray_session, sf_dir, docs):
    """A binding top-V cap keeps only the V most frequent bigrams
    (ties: key ascending), exactly as the brute-force replay."""
    from collections import Counter

    per_doc = {d["doc_id"]: textops._bigram_keys(d["text"]) for d in docs}
    counts = Counter()
    for xs in per_doc.values():
        counts.update(xs.tolist())
    eligible = [(c, x) for x, c in counts.items()
                if c >= textops.LM_MIN_COUNT]
    top_v = max(1, len(eligible) // 2)  # force the cap to bind
    model = {x for c, x in sorted(eligible,
                                  key=lambda t: (-t[0], t[1]))[:top_v]}
    assert len(eligible) > top_v  # the cap actually binds here
    want = {}
    for doc_id, xs in per_doc.items():
        nb = len(xs)
        nk = sum(1 for x in xs.tolist() if x in model)
        want[doc_id] = (nb, nk, (nk * 1000) // nb if nb else 0)
    got = {r["doc_id"]: (r["n_bigrams"], r["n_known"],
                         r["coverage_permille"])
           for r in textops.lm_coverage(sf_dir, top_v=top_v).take_all()}
    assert got == want


def test_pack_sequences_vs_bruteforce(ray_session, sf_dir, docs):
    """Span rows equal a sequential concat-and-chunk replay; spans tile
    each document exactly and each sequence holds exactly SEQ_LEN tokens
    (except the last)."""
    import re

    L = textops.SEQ_LEN
    toks = {d["doc_id"]: len(re.findall(r"\S+", d["text"])) for d in docs}
    order = sorted((n, did) for did, n in toks.items())
    off, want = 0, []
    for n, did in order:
        if n == 0:
            continue
        for s in range(off // L, (off + n - 1) // L + 1):
            a = max(off, s * L)
            b = min(off + n, (s + 1) * L)
            want.append((did, s, a - off, b - a))
        off += n
    got = sorted((r["doc_id"], r["seq_id"], r["tok_start"], r["tok_len"])
                 for r in textops.pack_sequences(sf_dir).take_all())
    assert got == sorted(want)
    # per-doc spans tile the doc; per-seq token mass == SEQ_LEN
    per_doc, per_seq = {}, {}
    for did, s, ts, tl in got:
        per_doc[did] = per_doc.get(did, 0) + tl
        per_seq[s] = per_seq.get(s, 0) + tl
    assert per_doc == {d: n for d, n in toks.items() if n > 0}
    total = sum(n for n in toks.values())
    for s, mass in per_seq.items():
        assert mass == (L if s < total // L else total % L)
