"""Text-analysis / dedup operators vs brute-force in-process oracles."""

import itertools

import numpy as np
import pyarrow.parquet as pq
import pytest

from methanol_web_crawler_ray.pipelines import textops


@pytest.fixture(scope="module")
def docs(sf_dir):
    return pq.read_table(f"{sf_dir}/documents.parquet").to_pylist()


def test_token_stats(ray_session, sf_dir, docs):
    out = {r["doc_id"]: r for r in textops.token_stats(sf_dir).take_all()}
    assert len(out) == len(docs)
    for d in docs[:50]:
        r = out[d["doc_id"]]
        assert r["n_tokens"] == len(d["text"].split())
        assert r["n_chars"] == len(d["text"])


def test_exact_dedup(ray_session, sf_dir, docs):
    keep = sorted(r["doc_id"] for r in textops.exact_dedup(sf_dir).take_all())
    by_text = {}
    for d in docs:
        by_text.setdefault(d["text"], []).append(d["doc_id"])
    expected = sorted(min(v) for v in by_text.values())
    assert keep == expected


def test_exact_dedup_direct_vs_dataset_parity(ray_session, sf_dir):
    direct = sorted(r["doc_id"]
                    for r in textops.exact_dedup(sf_dir).take_all())
    dataset = sorted(
        r["doc_id"]
        for r in textops.exact_dedup(sf_dir, direct_gate=-1).take_all())
    assert direct == dataset


def test_minhash_dedup_vs_bruteforce(ray_session, sf_dir, docs):
    """LSH-found verified dups must agree with brute-force Jaccard ≥ 0.8
    pairs on recall of genuinely-high-similarity pairs."""
    n = min(len(docs), 200)
    sub = docs[:n]
    shingles = {d["doc_id"]: textops.shingle_hashes(d["text"]) for d in sub}
    brute = set()
    for a, b in itertools.combinations(sorted(shingles), 2):
        if textops.jaccard(shingles[a], shingles[b]) >= 0.8:
            brute.add((a, b))
    found = {(int(r["dup_of"]), int(r["doc_id"]))
             for r in textops.minhash_dedup(sf_dir).take_all()}
    # every brute-force pair where the dup maps to its minimum partner
    # must be found (banding at t≈(1/8)^(1/8)≈0.77 < 0.8 → high recall);
    # found pairs must all be genuine
    for a, b in found:
        assert textops.jaccard(
            textops.shingle_hashes(next(d["text"] for d in docs
                                        if d["doc_id"] == a)),
            textops.shingle_hashes(next(d["text"] for d in docs
                                        if d["doc_id"] == b)),
        ) >= 0.8
    missed = {p for p in brute if p[1] not in {f[1] for f in found}}
    assert not missed, f"LSH missed high-sim pairs: {missed}"


def test_minhash_direct_vs_dataset_parity(ray_session, sf_dir):
    """The size-gated direct-task path and the sharded Dataset path make
    bit-identical decisions (same bands, bucket rule, integer Jaccard)."""
    direct = sorted((int(r["doc_id"]), int(r["dup_of"]))
                    for r in textops.minhash_dedup(sf_dir).take_all())
    dataset = sorted(
        (int(r["doc_id"]), int(r["dup_of"]))
        for r in textops.minhash_dedup(sf_dir, direct_gate=-1).take_all())
    assert direct == dataset


def test_simhash_pairs_genuine(ray_session, sf_dir, docs):
    pairs = textops.simhash_pairs(sf_dir).take_all()
    texts = {d["doc_id"]: d["text"] for d in docs}
    for r in pairs:
        a = textops.simhash64(texts[int(r["dup_of"])])
        b = textops.simhash64(texts[int(r["doc_id"])])
        assert bin(a ^ b).count("1") <= 3


def test_simhash_degenerate_bucket_capped(ray_session, tmp_path,
                                          monkeypatch):
    """A degenerate corpus (1 000 empty docs → all fingerprint 0, plus
    identical-text clones) must not trigger an n² pairgen blow-up: the
    oversized bucket is dropped by SH_BUCKET_CAP on both the pipeline
    and oracle sides, while normal near-dup pairs still come through."""
    import pyarrow as pa

    monkeypatch.setattr(textops, "SH_BUCKET_CAP", 50)
    n_empty, n_clone = 1000, 200
    texts = [""] * n_empty                       # fingerprint 0 bucket
    texts += ["identical clone text " * 5] * n_clone  # one hot fp bucket
    texts += [f"unique document number {i} with distinct words alpha"
              f" beta{i} gamma{i}" for i in range(20)]
    # md5-deterministic near-dup: these two differ by hamming 3
    texts += ["the quick brown fox jumps over the lazy dog one",
              "the quick brown fox jumps over the lazy dog one zz"]
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    pairs = textops.simhash_pairs(str(tmp_path)).take_all()
    got = {(int(r["dup_of"]), int(r["doc_id"])) for r in pairs}
    # capped buckets (empty docs, clones) contribute nothing…
    assert not any(a < n_empty + n_clone for a, _ in got)
    # …but small-bucket near-dups are still found
    na = n_empty + n_clone + 20
    assert (na, na + 1) in got


def test_langid_runs_deterministic(ray_session, sf_dir):
    a = sorted((r["doc_id"], r["lang_pred"])
               for r in textops.langid(sf_dir).take_all())
    b = sorted((r["doc_id"], r["lang_pred"])
               for r in textops.langid(sf_dir).take_all())
    assert a == b and len(a) > 0
    # sanity: the classifier separates the built-in samples themselves
    l = textops.LangId()
    for lang, sample in textops._LANG_SAMPLES.items():
        assert l.predict(sample) == lang


def test_fingerprints_winnowing(ray_session, sf_dir, docs):
    rows = textops.fingerprints(sf_dir).take_all()
    fps = {}
    for r in rows:
        fps.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))
    assert len(fps) == len(docs)
    # same text ⇒ same fingerprint set; and winnowing guarantees every
    # window of FP_W consecutive grams contributes a selection, so gaps
    # between selected positions are < FP_W
    by_text = {}
    for d in docs:
        by_text.setdefault(d["text"], []).append(frozenset(fps[d["doc_id"]]))
    for v in by_text.values():
        assert len(set(v)) == 1
    some = sorted(p for p, _h in next(iter(fps.values())))
    assert all(b - a <= textops.FP_W for a, b in zip(some, some[1:]))
    # matches the pure-python reference on a few docs
    for d in docs[:10]:
        assert fps[d["doc_id"]] == set(textops.winnow(d["text"]))


def test_corpus_clean_vs_bruteforce(ray_session, sf_dir, docs):
    """The composed pipeline equals the stage-by-stage in-process
    reference: quality gate -> lang filter -> min-doc_id dedup ->
    stats."""
    import re

    stop_re = re.compile(textops._STOP_PAT)
    survivors = {}
    for d in docs:
        t = d["text"]
        if (d["lang"] == "en" and 50 <= len(t) <= 5000
                and len(stop_re.findall(t)) >= 1):
            if t not in survivors or d["doc_id"] < survivors[t]:
                survivors[t] = d["doc_id"]
    want = {did: (len(t.split()), len(t)) for t, did in survivors.items()}
    got = {int(r["doc_id"]): (int(r["n_tokens"]), int(r["n_chars"]))
           for r in textops.corpus_clean(sf_dir).take_all()}
    assert got == want and len(got) > 0


def test_top_tokens_mg_compression_exact(ray_session, tmp_path):
    """With a vocabulary far larger than the sketch capacity the
    Misra-Gries path must compress per batch yet still return the exact
    top-k (heavy tokens clear the N/(capacity+1) floor)."""
    import collections

    import pyarrow as pa

    rng = np.random.default_rng(7)
    texts = []
    # 3000 docs, each with 20 rare singleton-ish tokens + heavy tokens
    for i in range(3000):
        toks = [f"rare{i}_{j}" for j in range(20)]
        if i % 2 == 0:
            toks += ["heavy_alpha"] * 3
        if i % 3 == 0:
            toks += ["heavy_beta"] * 2
        if i % 5 == 0:
            toks.append("heavy_gamma")
        rng.shuffle(toks)
        texts.append(" ".join(toks))
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))

    exact = collections.Counter()
    for t in texts:
        exact.update(t.split())
    want = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:3]

    got = textops.top_tokens(str(tmp_path), k=3, capacity=64,
                                 direct_gate=-1).take_all()
    got_rows = [(r["token"], int(r["cnt"])) for r in
                sorted(got, key=lambda r: int(r["rank"]))]
    assert got_rows == want
    assert [int(r["rank"]) for r in got] == [1, 2, 3]


def test_top_tokens_flat_corpus_fallback(ray_session, tmp_path):
    """A perfectly flat corpus fails the sketch guarantee; the exact
    distributed fallback must still return the true top-k."""
    import pyarrow as pa

    # 600 tokens, each appearing exactly twice -> kth count (2) is
    # below N/(capacity+1) for capacity=16? N=1200, floor=70 -> 2 <= 70
    texts = [" ".join(f"tok{i:04d}" for i in range(j, j + 60))
             for j in range(0, 600, 60)] * 2
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    got = textops.top_tokens(str(tmp_path), k=5, capacity=16,
                                 direct_gate=-1).take_all()
    rows = [(r["token"], int(r["cnt"])) for r in
            sorted(got, key=lambda r: int(r["rank"]))]
    # all counts equal 2; tie-break is lexicographic
    assert rows == [(f"tok{i:04d}", 2) for i in range(5)]


def test_top_tokens_distributed_merge_parity(ray_session, tmp_path):
    """driver_gate=0 forces the distributed sketch merge + bounded
    candidate threshold; result must equal the driver-merge path."""
    import pyarrow as pa

    rng = np.random.default_rng(11)
    texts = []
    for i in range(1000):
        toks = [f"tail{i}_{j}" for j in range(10)]
        if i % 2 == 0:
            toks += ["big_one"] * 4
        if i % 4 == 0:
            toks += ["big_two"] * 3
        rng.shuffle(toks)
        texts.append(" ".join(toks))
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))

    a = [(r["token"], int(r["cnt"]), int(r["rank"])) for r in sorted(
        textops.top_tokens(str(tmp_path), k=2, capacity=64,
                           direct_gate=-1).take_all(),
        key=lambda r: int(r["rank"]))]
    b = [(r["token"], int(r["cnt"]), int(r["rank"])) for r in sorted(
        textops.top_tokens(str(tmp_path), k=2, capacity=64,
                           driver_gate=0, direct_gate=-1).take_all(),
        key=lambda r: int(r["rank"]))]
    assert a == b
    assert a[0][0] == "big_one" and a[0][1] == 2000
    assert a[1][0] == "big_two" and a[1][1] == 750


def test_decontaminate_vs_bruteforce(ray_session, sf_dir, docs):
    out = {r["doc_id"]: r
           for r in textops.decontaminate(sf_dir).take_all()}
    bench = set()
    for d in docs:
        if d["doc_id"] % textops.BENCH_MOD == 0:
            bench.update(textops.shingle_hashes(d["text"]).tolist())
    n_checked = 0
    for d in docs:
        if d["doc_id"] % textops.BENCH_MOD == 0:
            assert d["doc_id"] not in out  # benchmark members excluded
            continue
        xs = textops.shingle_hashes(d["text"])
        r = out[d["doc_id"]]
        hits = sum(1 for x in xs.tolist() if x in bench)
        assert r["n_shingles"] == xs.shape[0]
        assert r["n_hits"] == hits
        assert r["contaminated"] == int(hits > 0)
        n_checked += 1
    assert n_checked == len(out)
    # the planted-overlap property: word-soup from a tiny vocabulary
    # guarantees at least some contaminated docs at this sf
    assert any(r["contaminated"] for r in out.values())


def test_sample_stratified_selector(ray_session, sf_dir, docs):
    import hashlib

    kept = {r["doc_id"]: r
            for r in textops.sample_stratified(sf_dir).take_all()}
    for d in docs:
        h = int.from_bytes(
            hashlib.md5(str(d["doc_id"]).encode()).digest()[8:],
            "little") % 1000
        rate = textops.SAMPLE_PERMILLE.get(
            d["lang"], textops.SAMPLE_DEFAULT_PERMILLE)
        assert (d["doc_id"] in kept) == (h < rate)
    # deterministic: a second run selects the identical set
    again = sorted(r["doc_id"]
                   for r in textops.sample_stratified(sf_dir).take_all())
    assert again == sorted(kept)


def test_repetition_vs_bruteforce(ray_session, sf_dir, docs):
    out = {r["doc_id"]: r for r in textops.repetition(sf_dir).take_all()}
    assert len(out) == len(docs)
    for d in docs:
        toks = d["text"].lower().split()
        grams = [toks[i] + " " + toks[i + 1] for i in range(len(toks) - 1)]
        nb, nd = len(grams), len(grams) - len(set(grams))
        r = out[d["doc_id"]]
        assert (r["n_bigrams"], r["n_dup"]) == (nb, nd)
        assert r["rep_ok"] == int(
            nd * textops.REP_DEN <= nb * textops.REP_NUM)


def test_pii_scrub_planted(ray_session, sf_dir):
    import hashlib
    import re

    import pyarrow.parquet as _pq

    out = {r["doc_id"]: r for r in textops.pii_scrub(sf_dir).take_all()}
    fixture = _pq.read_table(
        textops.pii_documents_path(sf_dir)).to_pylist()
    assert len(out) == len(fixture)
    e_re = re.compile(textops.PII_EMAIL)
    i_re = re.compile(textops.PII_IPV4)
    p_re = re.compile(textops.PII_PHONE)
    for d in fixture:
        r = out[d["doc_id"]]
        planted = d["doc_id"] % textops.PII_PLANT_MOD == 0
        assert (r["n_emails"], r["n_ips"], r["n_phones"]) == (
            len(e_re.findall(d["text"])), len(i_re.findall(d["text"])),
            len(p_re.findall(d["text"])))
        if planted:
            assert r["n_emails"] >= 1 and r["n_ips"] >= 1 \
                and r["n_phones"] >= 1
        clean = p_re.sub("<PHONE>",
                         i_re.sub("<IP>", e_re.sub("<EMAIL>", d["text"])))
        assert r["clean_md5"] == hashlib.md5(clean.encode()).hexdigest()
        # redaction is complete: no pattern survives in the clean text
        assert not (e_re.search(clean) or i_re.search(clean)
                    or p_re.search(clean))


def test_bpe_token_stats(ray_session, sf_dir, docs):
    import re

    pat = re.compile(textops.BPE_PAT)
    out = {r["doc_id"]: r
           for r in textops.bpe_token_stats(sf_dir).take_all()}
    assert len(out) == len(docs)
    for d in docs[:50]:
        r = out[d["doc_id"]]
        assert r["n_bpe_tokens"] == len(pat.findall(d["text"]))
        assert r["n_ws_tokens"] == len(d["text"].split())


def test_distinct_kmv_exact_branch(ray_session, sf_dir, docs):
    row = textops.distinct_tokens_kmv(sf_dir).take_all()[0]
    vocab = set()
    for d in docs:
        vocab.update(d["text"].split())
    if len(vocab) < textops.KMV_K:
        assert row["n_kept"] == len(vocab)
        assert row["est_distinct"] == len(vocab)  # exact below k
    else:
        assert row["n_kept"] == textops.KMV_K


def test_distinct_kmv_estimate_branch(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    # 8 000 distinct tokens spread over 200 docs → the sketch must
    # estimate: k=1024 ⇒ expected relative error ≈ 3%, assert 15%
    n_tok, per_doc = 8000, 40
    rows = {"doc_id": [], "text": []}
    for i in range(n_tok // per_doc):
        rows["doc_id"].append(i)
        rows["text"].append(" ".join(
            f"tok{j}" for j in range(i * per_doc, (i + 1) * per_doc)))
    d = tmp_path / "kmv"
    d.mkdir()
    pq.write_table(pa.table(rows), str(d / "documents.parquet"))
    row = textops.distinct_tokens_kmv(str(d)).take_all()[0]
    assert row["n_kept"] == textops.KMV_K
    assert abs(row["est_distinct"] - n_tok) / n_tok < 0.15
    # determinism: identical sketch on a second run
    again = textops.distinct_tokens_kmv(str(d)).take_all()[0]
    assert again == row


def test_dup_clusters_transitive(ray_session, tmp_path):
    """a~b and b~c near-dups (but a!~c directly below the band/verify
    radar? here all three collide) must land in ONE cluster keyed by the
    smallest doc_id; unrelated docs stay singletons."""
    import pyarrow as pa

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon " * 4).split()
    a = " ".join(base)
    b = " ".join(base[:-1] + ["CHANGED1"])
    c = " ".join(base[:-2] + ["CHANGED1", "CHANGED2"])
    texts = [a, b, c, "a completely different tiny document here",
             "another unrelated document with its own words entirely"]
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["t"] * len(texts), pa.string()),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = {r["doc_id"]: r["cluster"]
           for r in textops.dup_clusters(str(tmp_path)).take_all()}
    assert len(out) == 5
    # pair graph is transitive within `iters` hops: 0-1, 1-2 verified
    assert out[0] == 0 and out[1] == 0 and out[2] == 0
    assert out[3] == 3 and out[4] == 4


def test_dup_clusters_no_pairs_identity(ray_session, tmp_path):
    import pyarrow as pa

    texts = ["first unique document text", "second unique document text",
             "third entirely different words"]
    tbl = pa.table({
        "doc_id": pa.array(range(3), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * 3, pa.string()),
        "source": pa.array(["t"] * 3, pa.string()),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = {r["doc_id"]: r["cluster"]
           for r in textops.dup_clusters(str(tmp_path)).take_all()}
    assert out == {0: 0, 1: 1, 2: 2}


def test_tfidf_broadcast_vs_join_parity(ray_session, sf_dir):
    """The join path (vocab_gate=-1: tf ⋈ df + groupby top-k) must equal
    the broadcast path row-for-row."""
    bc = sorted(
        (r["doc_id"], r["rank"], r["term"], r["score"])
        for r in textops.tfidf_top_terms(sf_dir).take_all())
    jn = sorted(
        (r["doc_id"], r["rank"], r["term"], r["score"])
        for r in textops.tfidf_top_terms(sf_dir, vocab_gate=-1).take_all())
    assert bc == jn and len(bc) > 0


def test_tfidf_vs_bruteforce(ray_session, sf_dir, docs):
    """Integer tf-idf scores and top-k selection vs a direct in-process
    computation."""
    import collections

    n = len(docs)
    df = collections.Counter()
    tfs = {}
    for d in docs:
        toks = textops._TOKEN_RE.findall(d["text"].lower())
        tf = collections.Counter(toks)
        tfs[d["doc_id"]] = tf
        df.update(set(toks))
    expected = {}
    for did, tf in tfs.items():
        scored = sorted(
            ((t, c * ((textops.TFIDF_SCALE * n) // df[t]))
             for t, c in tf.items()),
            key=lambda x: (-x[1], x[0]))[:textops.TFIDF_TOPK]
        for rank, (t, s) in enumerate(scored, 1):
            expected[(did, rank)] = (t, s)
    got = {(r["doc_id"], r["rank"]): (r["term"], r["score"])
           for r in textops.tfidf_top_terms(sf_dir).take_all()}
    assert got == expected


def test_minhash_permutations_independent():
    """Regression: without the mod-p reduction, a*x+b is monotone in x,
    every hash argmins at the doc's MINIMUM shingle, and a near-dup
    whose one extra shingle becomes the new minimum misses ALL bands
    (recall J instead of the banded s-curve).  With proper universal
    hashing the two signatures must agree on nearly every hash."""
    a, b = textops._hash_params()
    assert (a % int(textops._MH_PRIME) == 0).sum() == 0
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon " * 4).split()
    t1 = " ".join(base)
    t2 = " ".join(base[:-1] + ["CHANGED1"])
    s1 = textops.shingle_hashes(t1)
    s2 = textops.shingle_hashes(t2)
    # the planted extra shingle IS the new global minimum — the exact
    # case the degenerate construction missed
    assert np.setdiff1d(s2, s1).min() < s1.min()
    sig1 = textops.minhash_signature(s1, a, b)
    sig2 = textops.minhash_signature(s2, a, b)
    n_same_bands = sum(
        (sig1[i * 4:(i + 1) * 4] == sig2[i * 4:(i + 1) * 4]).all()
        for i in range(textops.N_BANDS))
    assert (sig1 != sig2).sum() <= 8  # E[diff] = 64/21 ≈ 3
    assert n_same_bands >= 12


def test_substring_overlap_planted(ray_session, tmp_path):
    """Two docs sharing a verbatim paragraph (otherwise different) are
    reported; unrelated docs are not."""
    import pyarrow as pa

    shared = ("the quick brown fox jumps over the lazy dog while the "
              "band plays an entirely memorable tune in the background")
    texts = [
        "first document preamble text. " + shared + " first epilogue.",
        "completely different opening words here! " + shared + " done.",
        "this third document has no overlap with anything at all",
        "and the fourth one is also entirely on its own topic",
    ]
    tbl = pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * 4, pa.string()),
        "source": pa.array(["t"] * 4, pa.string()),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    rows = textops.substring_overlap(str(tmp_path)).take_all()
    pairs = {(r["id_a"], r["id_b"]): r["n_windows"] for r in rows}
    assert (0, 1) in pairs and pairs[(0, 1)] >= textops.SS_MIN_SHARED
    assert all(p == (0, 1) for p in pairs)


def test_substring_overlap_vs_bruteforce(ray_session, sf_dir, docs):
    got = {(r["id_a"], r["id_b"]): r["n_windows"]
           for r in textops.substring_overlap(sf_dir).take_all()}
    # brute force: winnowed fp sets per doc (overlap grain), hot-capped,
    # pair counts
    from collections import Counter

    sets = {d["doc_id"]: {h for _p, h in textops.winnow(
        d["text"], textops.SS_K, textops.SS_W)} for d in docs}
    fp_count = Counter()
    for s in sets.values():
        fp_count.update(s)
    hot = {f for f, c in fp_count.items()
           if 2 <= c <= textops.SS_BUCKET_CAP}
    ids = sorted(sets)
    exp = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            nw = len(sets[a] & sets[b] & hot)
            if nw >= textops.SS_MIN_SHARED:
                exp[(a, b)] = nw
    assert got == exp


def test_substring_overlap_driver_vs_distributed(ray_session, tmp_path):
    import pyarrow as pa

    shared = ("a long enough shared sentence that the winnowing pass at "
              "the forty-eight character overlap grain must certainly "
              "select from, well beyond the guarantee length ")
    texts = [f"doc {i} says: " + shared + f"and ends uniquely {i}"
             for i in range(6)]
    tbl = pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * 6, pa.string()),
        "source": pa.array(["t"] * 6, pa.string()),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    a = sorted((r["id_a"], r["id_b"], r["n_windows"]) for r in
               textops.substring_overlap(str(tmp_path)).take_all())
    b = sorted((r["id_a"], r["id_b"], r["n_windows"]) for r in
               textops.substring_overlap(str(tmp_path),
                                         pair_gate=-1).take_all())
    assert a == b and len(a) > 0


def test_top_tokens_direct_vs_sketch_parity(ray_session, sf_dir):
    a = [(r["token"], r["cnt"], r["rank"])
         for r in sorted(textops.top_tokens(sf_dir).take_all(),
                         key=lambda r: r["rank"])]
    b = [(r["token"], r["cnt"], r["rank"])
         for r in sorted(textops.top_tokens(sf_dir,
                                            direct_gate=-1).take_all(),
                         key=lambda r: r["rank"])]
    assert a == b and len(a) > 0


def test_corpus_clean_direct_vs_dataset_parity(ray_session, sf_dir):
    a = sorted((r["doc_id"], r["n_tokens"], r["n_chars"])
               for r in textops.corpus_clean(sf_dir).take_all())
    b = sorted((r["doc_id"], r["n_tokens"], r["n_chars"])
               for r in textops.corpus_clean(sf_dir,
                                             direct_gate=-1).take_all())
    assert a == b and len(a) > 0


def test_postings_vs_bruteforce(ray_session, sf_dir, docs):
    import hashlib as _hl

    got = {r["token"]: (r["df"], r["postings_md5"])
           for r in textops.postings(sf_dir).take_all()}
    idx = {}
    for d in docs:
        for t in set(textops._TOKEN_RE.findall(d["text"].lower())):
            idx.setdefault(t, []).append(d["doc_id"])
    exp = {t: (len(v), _hl.md5(
        ",".join(str(i) for i in sorted(v)).encode()).hexdigest())
        for t, v in idx.items()}
    assert got == exp and len(got) > 0


def test_postings_direct_vs_dataset(ray_session, sf_dir):
    a = sorted((r["token"], r["df"], r["postings_md5"])
               for r in textops.postings(sf_dir).take_all())
    b = sorted((r["token"], r["df"], r["postings_md5"])
               for r in textops.postings(sf_dir, direct_gate=-1).take_all())
    assert a == b


def test_dup_clusters_chain_beyond_iters_hops(ray_session, tmp_path):
    """Pin the documented K-hop contract: cluster = min doc_id within
    DUP_CC_ITERS hops, NOT a full connected-component partition.  A
    6-node pair CHAIN 0-1-2-3-4-5 (consecutive docs J>=0.8, skip pairs
    below the verify threshold) leaves nodes >3 hops from the minimum
    with a different label — exactly min-label propagation unrolled
    DUP_CC_ITERS times."""
    import pyarrow as pa

    base = [f"tok{i:03d}" for i in range(100)]
    docs = [list(base)]
    for step in range(5):
        nxt = list(docs[-1])
        lo = 10 + 15 * step
        for j in range(lo, lo + 5):  # replace a distinct 5-token block
            nxt[j] = f"new{step}{j}"
        docs.append(nxt)
    texts = [" ".join(d) for d in docs]
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["t"] * len(texts), pa.string()),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))

    pairs = sorted(
        (min(r["id_a"], r["id_b"]), max(r["id_a"], r["id_b"]))
        for r in textops.minhash_dedup(
            str(tmp_path), return_pairs=True).take_all())
    assert pairs == [(i, i + 1) for i in range(5)], \
        "construction must yield exactly the consecutive-pair chain"

    # brute min-label propagation, DUP_CC_ITERS rounds
    labels = {i: i for i in range(6)}
    nbrs = {i: set() for i in range(6)}
    for a, b in pairs:
        nbrs[a].add(b)
        nbrs[b].add(a)
    for _ in range(textops.DUP_CC_ITERS):
        labels = {n: min([labels[n]] + [labels[m] for m in nbrs[n]])
                  for n in labels}
    out = {r["doc_id"]: r["cluster"]
           for r in textops.dup_clusters(str(tmp_path)).take_all()}
    assert out == labels
    # and the contract really is NOT a full partition on this chain:
    assert len(set(out.values())) > 1
    assert out[0] == 0 and out[5] != 0


def test_dup_clusters_large_path_parity(ray_session, tmp_path, monkeypatch):
    """>GRAPH_DRIVER_GATE pairs: the labels-as-Dataset join path must
    produce exactly the driver-fold path's clusters, with no driver
    label fold."""
    import pyarrow as pa

    from methanol_web_crawler_ray.pipelines import graph

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon " * 4).split()
    a = " ".join(base)
    b = " ".join(base[:-1] + ["CHANGED1"])
    c = " ".join(base[:-2] + ["CHANGED1", "CHANGED2"])
    texts = [a, b, c, "a completely different tiny document here",
             "another unrelated document with its own words entirely"]
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["t"] * len(texts), pa.string()),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))

    small = sorted((r["doc_id"], r["cluster"]) for r in
                   textops.dup_clusters(str(tmp_path)).take_all())

    def no_fold(*a, **k):
        raise AssertionError("large path must not fold labels on driver")

    monkeypatch.setattr(graph, "GRAPH_DRIVER_GATE", 0)
    monkeypatch.setattr(graph, "_fold_agg", no_fold)
    large = sorted((r["doc_id"], r["cluster"]) for r in
                   textops.dup_clusters(str(tmp_path)).take_all())
    assert large == small
    assert small[0] == (0, 0) and small[1] == (1, 0) and small[2] == (2, 0)


def test_ngram_jaccard_exact_vs_bruteforce(ray_session, sf_dir, docs):
    """Prefix filtering is EXACT (recall 1.0, precision 1.0): the found
    pair set must EQUAL brute-force integer Jaccard >= 4/5 over the full
    corpus (no bucket cap triggers at this scale)."""
    shingles = {d["doc_id"]: textops.shingle_hashes(d["text"])
                for d in docs}
    brute = {}
    ids = sorted(shingles)
    for a, b in itertools.combinations(ids, 2):
        sa, sb = shingles[a], shingles[b]
        inter = np.intersect1d(sa, sb, assume_unique=True).size
        un = sa.size + sb.size - inter
        if un > 0 and inter * textops.THRESH_DEN >= un * textops.THRESH_NUM:
            brute[(a, b)] = (inter, un)
    found = {(int(r["id_a"]), int(r["id_b"])): (int(r["inter"]),
                                                int(r["un"]))
             for r in textops.ngram_jaccard_pairs(sf_dir).take_all()}
    assert found == brute


def test_ngram_jaccard_paths_parity(ray_session, sf_dir):
    """The driver-small and fully-sharded (join) verification paths make
    identical decisions."""
    small = sorted((int(r["id_a"]), int(r["id_b"]), int(r["inter"]),
                    int(r["un"]))
                   for r in textops.ngram_jaccard_pairs(sf_dir).take_all())
    large = sorted((int(r["id_a"]), int(r["id_b"]), int(r["inter"]),
                    int(r["un"]))
                   for r in textops.ngram_jaccard_pairs(
                       sf_dir, members_gate=-1, pairs_gate=-1).take_all())
    assert small == large


def test_ngram_jaccard_bucket_cap(ray_session, tmp_path):
    """Prefix buckets above the cap are dropped on both sides: with
    cap < bucket size a planted near-dup group yields no pairs; with the
    default cap every pair of the group is found, and an empty doc never
    pairs (Jaccard undefined)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon " * 3).split()
    texts = [" ".join(base),
             " ".join(base[:-1] + ["CHANGEDX"]),
             " ".join(base[:-1] + ["CHANGEDY"]),
             "", "   "]
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["t"] * len(texts), pa.string()),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))

    full = sorted((int(r["id_a"]), int(r["id_b"])) for r in
                  textops.ngram_jaccard_pairs(str(tmp_path)).take_all())
    assert full == [(0, 1), (0, 2), (1, 2)]
    # cap=2 drops every bucket shared by all three docs; a pair survives
    # only via a bucket of exactly 2 members (the cap NEVER adds pairs —
    # the capped result is a strict subset).  Deterministically that is
    # (0, 1): doc 2's CHANGEDY gram hashes LOW (263705538), enters its
    # prefix and displaces the shared shingle 750985224, which therefore
    # sits in docs 0+1's prefixes only — a 2-member bucket.
    capped = sorted(
        (int(r["id_a"]), int(r["id_b"])) for r in
        textops.ngram_jaccard_pairs(str(tmp_path), bucket_cap=2).take_all())
    assert set(capped) < set(full)
    assert capped == [(0, 1)]


def test_line_dedup(ray_session, sf_dir, docs):
    """Corpus-wide first-occurrence line dedup vs a sequential oracle."""
    out = {r["doc_id"]: (r["n_lines"], r["n_dup"])
           for r in textops.line_dedup(sf_dir).take_all()}
    seen = set()
    exp = {}
    for d in sorted(docs, key=lambda d: d["doc_id"]):
        n_lines = n_dup = 0
        for line in d["text"].split("\n"):
            s = line.strip(" \t\r")
            if not s:
                continue
            n_lines += 1
            if s in seen:
                n_dup += 1
            else:
                seen.add(s)
        if n_lines:
            exp[d["doc_id"]] = (n_lines, n_dup)
    assert out == exp


def test_line_dedup_crafted(ray_session, tmp_path):
    """Within-doc repeats, \\r-stripping, blank-only docs."""
    import pyarrow as pa
    import pyarrow.parquet as _pq

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            "alpha\nbeta\nalpha\n  \n",   # 2nd alpha = within-doc dup
            "beta\r\ngamma",              # beta dups doc 1 after \r strip
            "\t\n \n",                    # blank-only doc -> no output row
        ])})
    _pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = {r["doc_id"]: (r["n_lines"], r["n_dup"])
           for r in textops.line_dedup(str(tmp_path)).take_all()}
    assert out == {1: (3, 1), 2: (2, 1)}


def _gopher_expected(text):
    import re as _re
    words = _re.findall(r"\S+", text)
    n_words = len(words)
    nw_chars = sum(len(w) for w in words)
    lines = text.split("\n")
    n_lines = len(lines)
    n_hash = text.count("#")
    n_ell = text.count("...")
    n_bullet = sum(1 for l in lines
                   if l.lstrip(" \t")[:1] in ("-", "*", "•"))
    n_ell_ln = sum(1 for l in lines
                   if l.rstrip(" \t\r").endswith(("...", "…")))
    n_alpha = sum(1 for w in words if _re.search(r"[A-Za-z]", w))
    n_stopw = len(set(_re.findall(r"\S+", text.lower()))
                  & set(textops.GOPHER_STOPWORDS))
    f = {
        "n_words": n_words, "n_lines": n_lines,
        "ok_nwords": int(textops.GOPHER_MIN_WORDS <= n_words
                         <= textops.GOPHER_MAX_WORDS),
        "ok_meanlen": int(3 * n_words <= nw_chars <= 10 * n_words),
        "ok_symbol": int(10 * (n_hash + n_ell) <= n_words),
        "ok_bullet": int(10 * n_bullet <= 9 * n_lines),
        "ok_ellipsis": int(10 * n_ell_ln <= 3 * n_lines),
        "ok_alpha": int(5 * n_alpha >= 4 * n_words),
        "ok_stop": int(n_stopw >= 2),
    }
    f["gopher_ok"] = int(all(f[k] for k in f if k.startswith("ok_")))
    return f


def test_gopher_rules(ray_session, sf_dir, docs):
    out = {r["doc_id"]: r for r in textops.gopher_rules(sf_dir).take_all()}
    assert len(out) == len(docs)
    for d in docs[:80]:
        exp = _gopher_expected(d["text"])
        got = {k: int(out[d["doc_id"]][k]) for k in exp}
        assert got == exp, d["doc_id"]


def test_gopher_rules_crafted(ray_session, tmp_path):
    """Each rule tripped by a targeted document."""
    import pyarrow as pa
    import pyarrow.parquet as _pq

    texts = [
        "• a\n• b\n• c\n• d",        # 1: all-bullet -> ok_bullet 0
        "a...\nb… \nc",              # 2: 2/3 ellipsis-ended -> ok_ellipsis 0
        ("w " * 20) + "###",         # 3: 3 hashes vs 21 words -> ok_symbol 0
        "1 2 3 4 a",                 # 4: 1/5 alpha words -> ok_alpha 0
        "the of " * 30,              # 5: mean word length 2.5 -> ok_meanlen 0
        "the the the",               # 6: one distinct stopword -> ok_stop 0
    ]
    _pq.write_table(pa.table({
        "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
        "text": pa.array(texts)}), str(tmp_path / "documents.parquet"))
    out = {r["doc_id"]: r
           for r in textops.gopher_rules(str(tmp_path)).take_all()}
    assert out[1]["ok_bullet"] == 0 and out[2]["ok_bullet"] == 1
    assert out[2]["ok_ellipsis"] == 0 and out[1]["ok_ellipsis"] == 1
    assert out[3]["ok_symbol"] == 0 and out[4]["ok_symbol"] == 1
    assert out[4]["ok_alpha"] == 0 and out[3]["ok_alpha"] == 1
    assert out[5]["ok_meanlen"] == 0
    assert out[6]["ok_stop"] == 0 and out[5]["ok_stop"] == 1
    for i, t in enumerate(texts, 1):
        exp = _gopher_expected(t)
        got = {k: int(out[i][k]) for k in exp}
        assert got == exp, i


def test_span_dedup(ray_session, sf_dir, docs):
    """Non-overlapping window keeper dedup vs a sequential oracle."""
    import re as _re

    out = {r["doc_id"]: (r["n_windows"], r["n_dup"])
           for r in textops.span_dedup(sf_dir).take_all()}
    w = textops.SPAN_W
    seen = set()
    exp = {}
    for d in sorted(docs, key=lambda d: d["doc_id"]):
        toks = _re.findall(r"\S+", d["text"].lower())
        nw = len(toks) // w
        nd = 0
        for i in range(nw):
            key = " ".join(toks[i * w:(i + 1) * w])
            if key in seen:
                nd += 1
            else:
                seen.add(key)
        if nw:
            exp[d["doc_id"]] = (nw, nd)
    assert out == exp


def test_span_dedup_crafted(ray_session, tmp_path):
    """Cross-doc dup, within-doc dup, case folding, sub-window docs."""
    import pyarrow as pa
    import pyarrow.parquet as _pq

    w = textops.SPAN_W
    blk = " ".join(f"t{i}" for i in range(w))
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            blk,                        # window A — corpus keeper
            blk + " tail tail",         # A again (dup); 2-token tail dropped
            blk.upper() + " " + blk,    # lower-cased -> A twice, both dup
            "too short",                # < w tokens -> no output row
        ])})
    _pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = {r["doc_id"]: (r["n_windows"], r["n_dup"])
           for r in textops.span_dedup(str(tmp_path)).take_all()}
    assert out == {1: (1, 0), 2: (1, 1), 3: (2, 2)}


def test_dsir_weights(ray_session, sf_dir, docs):
    """Hashed-bigram target/source sums vs a sequential fold."""
    out = {r["doc_id"]: r for r in textops.dsir_weights(sf_dir).take_all()}
    B = textops.DSIR_BUCKETS
    tc, sc, per = {}, {}, {}
    for d in sorted(docs, key=lambda d: d["doc_id"]):
        xs = (textops._bigram_keys(d["text"]) % B).tolist()
        per[d["doc_id"]] = xs
        tab = tc if d["lang"] == textops.DSIR_TARGET_LANG else sc
        for bk in xs:
            tab[bk] = tab.get(bk, 0) + 1
    assert set(out) == {d["doc_id"] for d in docs}
    for d in docs:
        xs = per[d["doc_id"]]
        st = sum(tc.get(bk, 0) for bk in xs)
        ss = sum(sc.get(bk, 0) for bk in xs)
        r = out[d["doc_id"]]
        assert (r["n_grams"], r["sum_t"], r["sum_s"]) == (len(xs), st, ss)
        assert r["w_permille"] == ((st * 1000) // (st + ss)
                                   if st + ss else 0)
    # the signal separates: target-language docs weigh higher on average
    tgt = [out[d["doc_id"]]["w_permille"] for d in docs
           if d["lang"] == textops.DSIR_TARGET_LANG]
    rest = [out[d["doc_id"]]["w_permille"] for d in docs
            if d["lang"] != textops.DSIR_TARGET_LANG]
    if tgt and rest:
        assert sum(tgt) / len(tgt) > sum(rest) / len(rest)


def test_bm25_topk(ray_session, sf_dir, docs):
    """Integer BM25 ranking vs a sequential replay of the formula."""
    import re as _re

    res = textops.bm25_topk(sf_dir)
    n = len(docs)
    k1, b = textops.BM25_K1M, textops.BM25_BM
    toks = {d["doc_id"]: _re.findall(r"\S+", d["text"].lower())
            for d in docs}
    tt = max(sum(len(t) for t in toks.values()), 1)
    scores = {}
    for term in textops.BM25_TERMS:
        df = sum(1 for t in toks.values() if term in t)
        if df == 0:
            continue
        idf = (1000 * n) // df
        for did, t in toks.items():
            tf = t.count(term)
            if not tf:
                continue
            dl = len(t)
            norm = 1000 - b + (b * dl * n) // tt
            sat = (1000 * tf * (k1 + 1000)) \
                // (1000 * tf + (k1 * norm) // 1000)
            scores[did] = scores.get(did, 0) + (idf * sat) // 1000
    exp = sorted(((s, did) for did, s in scores.items() if s > 0),
                 key=lambda x: (-x[0], x[1]))[:textops.BM25_TOPK]
    got = [(int(s), int(d)) for s, d in zip(res["score"], res["doc_id"])]
    assert got == exp
    assert list(res["rank"]) == list(range(1, len(exp) + 1))
    assert 0 < len(res) <= textops.BM25_TOPK


def test_top_bigrams_exact(ray_session, sf_dir, tmp_path):
    """top_bigrams equals a brute-force corpus bigram count on the sf
    documents table, and the MG-compressed path stays exact on a
    crafted heavy-bigram corpus."""
    import collections

    import pyarrow as pa

    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["text"]).column("text").to_pylist()
    exact = collections.Counter()
    for t in docs:
        toks = t.split()
        exact.update(" ".join(toks[i:i + 2])
                     for i in range(len(toks) - 1))
    want = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    got = [(r["token"], int(r["cnt"])) for r in sorted(
        textops.top_bigrams(sf_dir).take_all(),
        key=lambda r: int(r["rank"]))]
    assert got == want and got

    # crafted: vocabulary >> capacity, heavy bigram must survive MG
    texts = [" ".join([f"u{i}_{j}" for j in range(15)]
                      + ["the quick"] * (3 if i % 2 == 0 else 1))
             for i in range(2000)]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }), str(tmp_path / "documents.parquet"))
    brute = collections.Counter()
    for t in texts:
        toks = t.split()
        brute.update(" ".join(toks[i:i + 2])
                     for i in range(len(toks) - 1))
    want2 = sorted(brute.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
    got2 = [(r["token"], int(r["cnt"])) for r in sorted(
        textops.top_tokens(str(tmp_path), k=2, capacity=64,
                           direct_gate=-1, gram=2).take_all(),
        key=lambda r: int(r["rank"]))]
    assert got2 == want2


def test_dup_weights_bruteforce(ray_session, sf_dir):
    """Every document appears once; cluster sizes partition the corpus;
    weight is the exact integer inverse of the md5-cluster size."""
    import collections
    import hashlib as _hl

    tbl = pq.read_table(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "text"])
    sizes = collections.Counter(
        _hl.md5(t.encode()).hexdigest()
        for t in tbl.column("text").to_pylist())
    exp = {}
    for i, t in zip(tbl.column("doc_id").to_pylist(),
                    tbl.column("text").to_pylist()):
        n = sizes[_hl.md5(t.encode()).hexdigest()]
        exp[int(i)] = (n, 1000 // n)
    got = {int(r["doc_id"]): (int(r["cluster_size"]),
                              int(r["weight_permille"]))
           for r in textops.dup_weights(sf_dir).take_all()}
    assert got == exp and got


def test_dup_weights_planted(ray_session, tmp_path):
    """Crafted duplicates get 1000//n weights; uniques keep 1000."""
    import pyarrow as pa

    texts = ["same text"] * 3 + ["other text"] * 2 + ["unique one"]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }), str(tmp_path / "documents.parquet"))
    got = {int(r["doc_id"]): (int(r["cluster_size"]),
                              int(r["weight_permille"]))
           for r in textops.dup_weights(str(tmp_path)).take_all()}
    assert got == {0: (3, 333), 1: (3, 333), 2: (3, 333),
                   3: (2, 500), 4: (2, 500), 5: (1, 1000)}


def test_search_topk_vs_bruteforce(ray_session):
    """AND-match + total-tf ranking equals a direct token count."""
    import re as _re

    sf = "/root/testdata/sf0.001"
    got = [(int(r["doc_id"]), int(r["tf"]))
           for r in textops.search_topk(sf).take_all()]

    t = pq.read_table(f"{sf}/documents.parquet",
                      columns=["doc_id", "text"])
    rows = []
    for doc_id, text in zip(t.column("doc_id").to_pylist(),
                            t.column("text").to_pylist()):
        toks = _re.findall(r"\S+", text.lower())
        tfs = [sum(1 for x in toks if x == q)
               for q in textops.SEARCH_TERMS]
        if all(c > 0 for c in tfs):
            rows.append((int(doc_id), sum(tfs)))
    rows.sort(key=lambda r: (-r[1], r[0]))
    assert got == rows[:textops.SEARCH_K] and got
    # ranking is actually exercised: not all tfs equal
    assert len({tf for _, tf in got}) > 1


def test_vocab_growth_vs_bruteforce(ray_session):
    import re as _re

    sf = "/root/testdata/sf0.001"
    out = textops.vocab_growth(sf)
    got = list(zip(out["bucket"], out["new_tokens"], out["vocab_size"]))

    t = pq.read_table(f"{sf}/documents.parquet",
                      columns=["doc_id", "text"])
    first = {}
    max_id = 0
    for doc_id, text in zip(t.column("doc_id").to_pylist(),
                            t.column("text").to_pylist()):
        max_id = max(max_id, int(doc_id))
        for tok in _re.findall(r"\S+", text.lower()):
            if tok not in first or doc_id < first[tok]:
                first[tok] = int(doc_id)
    hist = {}
    for fd in first.values():
        b = (fd * textops.VG_BUCKETS) // (max_id + 1)
        hist[b] = hist.get(b, 0) + 1
    exp, cum = [], 0
    for b in sorted(hist):
        cum += hist[b]
        exp.append((b, hist[b], cum))
    assert got == exp and got
    assert got[-1][2] == len(first)  # total vocabulary


def test_dup_ngrams_vs_bruteforce(ray_session):
    """Per-doc duplicated-bigram tallies equal a direct df count."""
    sf = "/root/testdata/sf0.001"
    out = textops.dup_ngrams(sf).to_pandas().set_index("doc_id")

    t = pq.read_table(f"{sf}/documents.parquet",
                      columns=["doc_id", "text"])
    per_doc = {}
    df_count = {}
    for doc_id, text in zip(t.column("doc_id").to_pylist(),
                            t.column("text").to_pylist()):
        keys = set(np.unique(textops._bigram_keys(text)).tolist())
        per_doc[int(doc_id)] = keys
        for k in keys:
            df_count[k] = df_count.get(k, 0) + 1
    for doc_id, keys in per_doc.items():
        if not keys:
            assert doc_id not in out.index
            continue
        nd = sum(1 for k in keys if df_count[k] >= 2)
        row = out.loc[doc_id]
        assert int(row["n_ngrams"]) == len(keys)
        assert int(row["n_dup"]) == nd
        assert int(row["dup_permille"]) == (nd * 1000) // len(keys)
    assert out["n_dup"].sum() > 0  # corpus has shared bigrams


def test_lang_weights_sum_and_monotonic(ray_session, sf_dir):
    """Temperature weights: permille shares near-normalized, sqrt
    smoothing keeps the ordering of counts but compresses the ratios."""
    import math

    out = textops.lang_weights(sf_dir).set_index("lang")
    assert 990 <= out["weight_permille"].sum() <= 1000
    # exact integer contract: weight = 1000*isqrt(n*1e6) // sum(isqrt)
    s = {l: math.isqrt(int(n) * textops.LW_T_SQ_SCALE)
         for l, n in out["n_docs"].items()}
    tot = sum(s.values())
    for l in out.index:
        assert out.loc[l, "weight_permille"] == (1000 * s[l]) // tot
    # smoothing: the max/min weight ratio is below the raw count ratio
    n_hi, n_lo = out["n_docs"].max(), out["n_docs"].min()
    w_hi, w_lo = (out["weight_permille"].max(),
                  out["weight_permille"].min())
    assert w_hi / w_lo < n_hi / n_lo


def test_bpe_merges_vs_bruteforce(ray_session, sf_dir):
    """The learned merge table matches a direct in-process BPE replay
    (word-frequency table, best-pair by (count desc, lhs, rhs),
    left-to-right non-overlapping application)."""
    from collections import Counter

    import pyarrow.parquet as pq

    texts = pq.read_table(f"{sf_dir}/documents.parquet",
                          columns=["text"]).column("text").to_pylist()
    wf = Counter()
    for t in texts:
        wf.update(textops._TOKEN_RE.findall(t.lower()))
    toks = {w: list(w) for w in wf}
    exp = []
    for idx in range(1, textops.BPE_MERGES + 1):
        c = Counter()
        for w, t in toks.items():
            for a, b in zip(t, t[1:]):
                c[(a, b)] += wf[w]
        if not c:
            break
        (x, y), n = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
        exp.append((idx, x, y, n))
        toks = {w: textops._bpe_apply(t, x, y) for w, t in toks.items()}

    got = [tuple(r) for r in
           textops.bpe_merges(sf_dir).itertuples(index=False)]
    assert got == exp and len(got) == textops.BPE_MERGES


def test_bpe_merges_distributed_path_parity(ray_session, sf_dir):
    """vocab_gate=0 forces the Dataset-resident loop; identical rules."""
    a = textops.bpe_merges(sf_dir)
    b = textops.bpe_merges(sf_dir, vocab_gate=0)
    assert a.equals(b)


def test_bpe_apply_overlap_semantics():
    """Consecutive repeats merge left-to-right non-overlapping — the
    exact semantics the bracketed replace (and DuckDB replace) gives."""
    assert textops._bpe_apply(list("aaa"), "a", "a") == ["aa", "a"]
    assert textops._bpe_apply(list("aaaa"), "a", "a") == ["aa", "aa"]
    seq = "".join("\x01" + c + "\x02" for c in "aaa")
    assert seq.replace("\x01a\x02\x01a\x02", "\x01aa\x02") \
        == "\x01aa\x02\x01a\x02"


def test_bpe_tokenize_vs_bruteforce(ray_session, sf_dir):
    """Per-doc token counts match an in-process replay: learn the merge
    table once, apply the chain per word, sum per occurrence."""
    from collections import Counter

    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "text"])
    merges = textops.bpe_merges(sf_dir)
    mlist = list(zip(merges["lhs"], merges["rhs"]))

    def ntok(w):
        t = list(w)
        for x, y in mlist:
            t = textops._bpe_apply(t, x, y)
        return len(t)

    out = textops.collect_df(
        textops.bpe_tokenize(sf_dir)).set_index("doc_id")
    n_rows = 0
    for doc_id, text in zip(tbl.column("doc_id").to_pylist(),
                            tbl.column("text").to_pylist()):
        c = Counter(textops._TOKEN_RE.findall(text.lower()))
        if not c:
            assert doc_id not in out.index
            continue
        n_rows += 1
        row = out.loc[doc_id]
        nw = sum(c.values())
        nc = sum(len(w) * k for w, k in c.items())
        nt = sum(ntok(w) * k for w, k in c.items())
        assert (row["n_words"], row["n_chars"], row["n_tokens"]) \
            == (nw, nc, nt)
        assert row["tokens_per_kchar"] == (nt * 1000) // max(nc, 1)
    assert len(out) == n_rows and n_rows > 0
    # merges actually compress: tokens strictly below chars overall
    assert out["n_tokens"].sum() < out["n_chars"].sum()


def test_lang_confusion_vs_bruteforce(ray_session, sf_dir):
    """The confusion matrix equals a per-doc LangId replay grouped by
    (declared, predicted); diagonal mass dominates on the fixture."""
    from collections import Counter

    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{sf_dir}/documents.parquet",
                        columns=["lang", "text"])
    lid = textops.LangId()
    exp = Counter(zip(tbl.column("lang").to_pylist(),
                      (lid.predict(t)
                       for t in tbl.column("text").to_pylist())))
    out = textops.collect_df(textops.lang_confusion(sf_dir))
    got = {(r.lang_meta, r.lang_pred): int(r.n_docs)
           for r in out.itertuples(index=False)}
    assert got == dict(exp)
    # mass conservation: every document lands in exactly one cell, and
    # the synthetic fixture has both agreeing and disagreeing labels
    assert sum(got.values()) == tbl.num_rows
    assert any(m == p for m, p in got)
    assert any(m != p for m, p in got)


def test_word_cooccur_vs_bruteforce(ray_session, sf_dir):
    """Window co-occurrence counts match a positional replay with the
    same min-count vocab and unordered keys."""
    from collections import Counter

    import pyarrow.parquet as pq

    texts = pq.read_table(f"{sf_dir}/documents.parquet",
                          columns=["text"]).column("text").to_pylist()
    tc = Counter()
    seqs = []
    for t in texts:
        toks = textops._TOKEN_RE.findall(t.lower())
        seqs.append(toks)
        tc.update(toks)
    vocab = {t for t, n in tc.items() if n >= textops.WC_MIN_COUNT}
    exp = Counter()
    for toks in seqs:
        for i, a in enumerate(toks):
            for d in range(1, textops.WC_WINDOW + 1):
                if i + d >= len(toks):
                    break
                b = toks[i + d]
                if a in vocab and b in vocab:
                    exp[(min(a, b), max(a, b))] += 1
    got = {(r["tok_a"], r["tok_b"]): r["n_cooc"]
           for r in textops.word_cooccur(sf_dir).take_all()}
    assert got == dict(exp)
    assert all(a <= b for a, b in got) and len(got) > 0


def test_source_overlap_vs_bruteforce(ray_session, sf_dir):
    """Pair overlap equals a set replay; diagonal dominates any
    off-diagonal cell (shared ⊆ own keys)."""
    from collections import Counter
    from itertools import combinations_with_replacement

    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{sf_dir}/documents.parquet",
                        columns=["source", "text"])
    per_src: dict = {}
    for s, t in zip(tbl.column("source").to_pylist(),
                    tbl.column("text").to_pylist()):
        per_src.setdefault(s, set()).update(
            textops._bigram_keys(t).tolist())
    exp = Counter()
    for a, b in combinations_with_replacement(sorted(per_src), 2):
        n = len(per_src[a] & per_src[b])
        if n:
            exp[(a, b)] = n
    got = {(r["source_a"], r["source_b"]): r["n_shared"]
           for r in textops.source_overlap(sf_dir).take_all()}
    assert got == dict(exp)
    for (a, b), n in got.items():
        assert n <= got[(a, a)] and n <= got[(b, b)]


def test_oov_rate_bruteforce(ray_session, sf_dir):
    """Per-doc OOV counts == sequential replay: top-k vocab by
    (count desc, token asc), then token membership per doc."""
    import re
    from collections import Counter

    import pyarrow.parquet as pq

    rows = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"]).to_pylist()
    c = Counter()
    for r in rows:
        c.update(re.findall(r"\S+", r["text"]))
    vocab = {t for t, _ in sorted(c.items(),
                                  key=lambda kv: (-kv[1], kv[0]))
             [:textops.OOV_VOCAB_K]}
    exp = {}
    for r in rows:
        toks = re.findall(r"\S+", r["text"])
        n = len(toks)
        oov = sum(1 for x in toks if x not in vocab)
        exp[r["doc_id"]] = (n, oov, (oov * 1000) // n if n else 0)
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_oov"], r["oov_permille"])
        for _, r in textops.collect_df(textops.oov_rate(sf_dir))
        .iterrows()}
    assert got == exp
    # the synthetic corpus has >k distinct tokens, so OOV must fire
    assert any(v[1] > 0 for v in exp.values())


def test_doc_chunks_bruteforce(ray_session, sf_dir):
    """Sliding-window chunks == sequential replay (offsets, lengths,
    digests); overlap and short-tail semantics pinned."""
    import hashlib

    import pyarrow.parquet as pq

    rows = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"]).to_pylist()
    exp = {}
    for r in rows:
        text = r["text"]
        for s in range(0, len(text), textops.CHUNK_STRIDE):
            ck = text[s:s + textops.CHUNK_CHARS]
            exp[(r["doc_id"], s // textops.CHUNK_STRIDE)] = (
                len(ck), hashlib.md5(ck.encode("utf-8")).hexdigest())
    got = {
        (r["doc_id"], r["chunk_seq"]): (r["n_chars"], r["chunk_md5"])
        for _, r in textops.collect_df(textops.doc_chunks(sf_dir))
        .iterrows()}
    assert got == exp
    # consecutive chunks of a multi-chunk doc overlap by size-stride
    multi = [r for r in rows
             if len(r["text"]) > textops.CHUNK_STRIDE]
    assert multi
    r = multi[0]
    a = r["text"][:textops.CHUNK_CHARS]
    b = r["text"][textops.CHUNK_STRIDE:
                  textops.CHUNK_STRIDE + textops.CHUNK_CHARS]
    assert a[textops.CHUNK_STRIDE:] == b[:textops.CHUNK_CHARS -
                                         textops.CHUNK_STRIDE]


def test_dedup_recall_consistency(ray_session, sf_dir):
    """Summary counters == replay from the two constituent pipelines;
    precision is structurally perfect (flagged docs are verified at
    the same threshold over the same shingles)."""
    ex = {r["id_b"] for _, r in textops.collect_df(
        textops.ngram_jaccard_pairs(sf_dir)).iterrows()}
    mh = {r["doc_id"] for _, r in textops.collect_df(
        textops.minhash_dedup(sf_dir)).iterrows()}
    row = textops.collect_df(textops.dedup_recall(sf_dir)).iloc[0]
    assert row["n_true"] == len(ex)
    assert row["n_flagged"] == len(mh)
    assert row["n_hit"] == len(ex & mh)
    assert row["recall_permille"] == (
        len(ex & mh) * 1000 // len(ex) if ex else 0)
    assert row["precision_permille"] == 1000 or row["n_flagged"] == 0


def test_chunk_dedup_stats_bruteforce(ray_session, sf_dir):
    """Corpus chunk-dup scalars == replay from the chunk table."""
    from collections import Counter

    chunks = textops.collect_df(textops.doc_chunks(sf_dir))
    c = Counter(chunks["chunk_md5"])
    n_chunks = sum(c.values())
    n_dup = sum(v for v in c.values() if v >= 2)
    row = textops.collect_df(textops.chunk_dedup_stats(sf_dir)).iloc[0]
    assert row["n_chunks"] == n_chunks
    assert row["n_distinct"] == len(c)
    assert row["n_dup_instances"] == n_dup
    assert row["dup_permille"] == (n_dup * 1000 // n_chunks
                                   if n_chunks else 0)
    # the synthetic corpus contains exact-dup docs, so chunk dups exist
    assert n_dup > 0


def test_doc_novelty_bruteforce(ray_session, sf_dir):
    """Per-doc novelty == sequential replay (first = min doc_id)."""
    from collections import defaultdict

    import pyarrow.parquet as pq

    rows = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"]).to_pylist()
    first = {}
    grams_of = {}
    for r in sorted(rows, key=lambda r: r["doc_id"]):
        sh = textops.shingle_hashes(r["text"])
        grams_of[r["doc_id"]] = sh
        for g in sh.tolist():
            first.setdefault(g, r["doc_id"])
    exp = {}
    for did, sh in grams_of.items():
        n = sh.shape[0]
        if n == 0:
            continue
        nov = sum(1 for g in sh.tolist() if first[g] == did)
        exp[did] = (n, nov, nov * 1000 // n)
    got = {r["doc_id"]: (r["n_grams"], r["n_novel"],
                         r["novelty_permille"])
           for _, r in textops.collect_df(textops.doc_novelty(sf_dir))
           .iterrows()}
    assert got == exp
    # exact-dup docs contribute zero novelty; originals contribute all
    assert any(v[2] == 0 for v in exp.values())
    assert any(v[2] == 1000 for v in exp.values())


def test_source_lang_purity_bruteforce(ray_session, sf_dir):
    """Per-source purity == sequential replay with the same LangId
    kernel and (count desc, lang asc) tie-break."""
    from collections import Counter, defaultdict

    import pyarrow.parquet as pq

    rows = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["source", "text"]).to_pylist()
    lid = textops.LangId()
    per = defaultdict(Counter)
    for r in rows:
        per[r["source"]][lid.predict(r["text"])] += 1
    exp = {}
    for src, c in per.items():
        lang, n = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        tot = sum(c.values())
        exp[src] = (tot, lang, n * 1000 // tot, len(c))
    got = {r["source"]: (r["n_docs"], r["top_lang"],
                         r["top_permille"], r["n_langs"])
           for r in textops.source_lang_purity(sf_dir).take_all()}
    assert got == exp
    assert len(exp) > 1


def test_pmi_bigrams_vs_bruteforce(ray_session, sf_dir):
    """PMI rows == a pure-python replay over the raw corpus: top-50
    bigrams by (count desc, bigram), exact unigram counts, the same
    integer formula."""
    import re

    import pyarrow.parquet as pq

    texts = pq.read_table(f"{sf_dir}/documents.parquet",
                          columns=["text"]).column("text").to_pylist()
    toks_per = [re.findall(r"\S+", t) for t in texts]
    uni, big = {}, {}
    total = 0
    for toks in toks_per:
        total += len(toks)
        for w in toks:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(toks, toks[1:]):
            key = f"{a} {b}"
            big[key] = big.get(key, 0) + 1
    top = sorted(big.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    exp = {}
    for t, n_xy in top:
        w1, w2 = t.split(" ", 1)
        exp[t] = (n_xy, uni[w1], uni[w2],
                  (1_000_000 * n_xy * total) // (uni[w1] * uni[w2]))
    got = {r["bigram"]: (r["n_xy"], r["n_x"], r["n_y"], r["pmi_scaled"])
           for r in textops.pmi_bigrams(sf_dir).take_all()}
    assert got == exp and len(got) == 50
