"""Text-analysis + deduplication operators over the ``documents`` table —
the training-data-pipeline layer (prompt: dedup / quality / token counting /
language-ID / fingerprinting as first-class engine components).

All stages are Ray-Data-native: ``read_parquet(columns=...)`` →
``map_batches`` (pandas/pyarrow vectorized kernels, stateful classes for
anything with setup cost) → ``groupby``/aggregate only where a shuffle is
semantically required, with pre-aggregation inside batches wherever
possible.  Exact SQL-equivalent ops also appear in ``__ray_entry__``'s
``oracle_sql`` for the DuckDB value-hash gate.

Scale notes:
  * exact dedup groups on a 128-bit content hash, not the text bytes —
    the shuffle moves 16-byte keys, not documents;
  * MinHash-LSH emits (band, band_hash, doc_id) triples — the shuffle is
    k_bands rows/doc of fixed width; candidate verification joins back to
    shingle sets only for candidate pairs;
  * SimHash buckets by 16-bit sub-fingerprints (4 tables) — standard
    Charikar/Manku-Jain-Sarma construction (public papers).
"""

from __future__ import annotations

import hashlib
import re
from ._util import rename as _rename, task_udf
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

STOPWORDS = ("the", "a", "of", "and", "to")

_TOKEN_RE = re.compile(r"\S+")


def _read_docs(sf_dir: str, columns=None):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=columns)


def collect_df(ds) -> pd.DataFrame:
    """Small-result collection.  NEVER ``take_all()``/``iter_rows()`` on
    a multi-thousand-row dataset: per-row conversion over pandas blocks
    is pathological (measured 164 s vs 0.03 s for ``to_pandas`` on the
    same 168k-row materialized dataset)."""
    return ds.to_pandas()


def hot_keys(ds, key_cols, min_count: int = 2, max_count=None,
             driver_limit: int = 2_000_000):
    """Bucket-collision detection: keys whose row count is in
    [min_count, max_count].  Map-side PARTIAL counts folded on the
    driver — no shuffle, no sort (Ray's sort-aggregate measured ~17 s on
    80k string keys); beyond ``driver_limit`` input rows it falls back
    to the distributed groupby aggregate.  Pass a MATERIALIZED dataset:
    the branch-picking ``ds.count()`` is then a metadata lookup, not an
    execution (every current caller does)."""
    import pyarrow as _pa

    cols = list(key_cols)
    if ds.count() > driver_limit:
        agg = ds.groupby(cols).count()
        df = collect_df(agg)
        sel = df["count()"] >= min_count
        if max_count is not None:
            sel &= df["count()"] <= max_count
        df = df[sel]
    else:
        def partial(t: _pa.Table) -> _pa.Table:
            return t.select(cols).group_by(cols).aggregate([([], "count_all")])

        parts = collect_df(ds.map_batches(partial, batch_format="pyarrow"))
        df = parts.groupby(cols, as_index=False)["count_all"].sum()
        sel = df["count_all"] >= min_count
        if max_count is not None:
            sel &= df["count_all"] <= max_count
        df = df[sel]
    if len(cols) == 1:
        return set(df[cols[0]])
    return set(map(tuple, df[cols].itertuples(index=False, name=None)))


# ---------------------------------------------------------------------------
# token / quality stats (SQL-oracled)


def token_stats(sf_dir: str):
    """(doc_id, n_tokens, n_chars) — whitespace tokens, unicode chars."""
    def stats(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_tokens": df["text"].str.count(r"\S+").astype("int64"),
                "n_chars": df["text"].str.len().astype("int64"),
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        stats, batch_format="pandas"
    )


def quality(sf_dir: str):
    """(doc_id, n_chars, n_stop, quality_ok) — length bounds + stopword
    presence, the classic web-corpus quality gate."""
    # one vectorized count: a stopword token is a whole \S+ run equal to
    # a stopword (the lookarounds pin both edges; alternation backtracks,
    # so 'a' never shadows 'and')
    stop_pat = (r"(?<!\S)(?:"
                + "|".join(re.escape(w) for w in STOPWORDS) + r")(?!\S)")

    def q(df: pd.DataFrame) -> pd.DataFrame:
        n_chars = df["text"].str.len().astype("int64")
        n_stop = df["text"].str.count(stop_pat).astype("int64")
        ok = ((n_chars >= 50) & (n_chars <= 5000) & (n_stop >= 1)).astype("int64")
        return pd.DataFrame({"doc_id": df["doc_id"], "n_chars": n_chars,
                             "n_stop": n_stop, "quality_ok": ok})

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        q, batch_format="pandas"
    )


def lang_counts(sf_dir: str):
    """(lang, n_docs) — grouped count (partial+final handled by Ray)."""
    ds = _read_docs(sf_dir, ["lang"]).groupby("lang").count()
    return _rename(ds, {"count()": "n_docs"})


def source_stats(sf_dir: str):
    """(source, n_docs, total_chars) — grouped agg over two columns."""
    def pre(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"source": df["source"],
                             "n_chars": df["text"].str.len().astype("int64")})

    ds = _read_docs(sf_dir, ["source", "text"]).map_batches(
        pre, batch_format="pandas"
    )
    agg = ds.groupby("source").aggregate(
        __import__("ray").data.aggregate.Count(),
        __import__("ray").data.aggregate.Sum("n_chars"),
    )
    return _rename(agg, {"count()": "n_docs", "sum(n_chars)": "total_chars"})


# ---------------------------------------------------------------------------
# exact dedup (SQL-oracled)


def _docs_direct_ranges(sf_dir: str, gate: int):
    """(path, [(offset, count), ...]) row slices of the documents table
    for a direct-task fan-out, or None when the table exceeds ``gate``
    rows (callers then use their sharded Dataset path).  The row count
    comes from Parquet footer metadata — no Ray execution."""
    import math

    import ray
    import pyarrow.parquet as _pq

    path = f"{sf_dir}/documents.parquet"
    try:
        n = _pq.read_metadata(path).num_rows
    except Exception:
        return None
    if n > gate:
        return None
    cpus = int(ray.cluster_resources().get("CPU", 8))
    n_tasks = max(1, min(cpus * 2, math.ceil(n / 64)))
    step = math.ceil(n / max(n_tasks, 1)) if n else 1
    return path, [(off, min(step, n - off)) for off in range(0, n, step)]


def exact_dedup(sf_dir: str, direct_gate: int = 1_000_000):
    """Exact content dedup: keep min(doc_id) per distinct text
    (hash-partition + per-group first — SURVEY §2.8 D2 pattern).  The
    shuffle key is md5(text), not the text itself.  Below ``direct_gate``
    rows the groupby collapses to task-side partial dicts {md5: min_id}
    folded on the driver (16-byte keys — driver-small far beyond the
    gate); above it the Dataset groupby shuffle engages."""
    import ray
    import ray.data

    direct = _docs_direct_ranges(sf_dir, direct_gate)
    if direct is not None:
        path, ranges = direct

        @ray.remote(num_cpus=1)
        def partial_min(off: int, cnt: int) -> Dict[bytes, int]:
            import pyarrow.parquet as _pq

            t = _pq.read_table(path, columns=["doc_id", "text"]) \
                .slice(off, cnt)
            out: Dict[bytes, int] = {}
            for i, tx in zip(t.column("doc_id").to_pylist(),
                             t.column("text").to_pylist()):
                k = hashlib.md5(tx.encode()).digest()
                if k not in out or i < out[k]:
                    out[k] = i
            return out

        merged: Dict[bytes, int] = {}
        for d in ray.get([partial_min.remote(o, c) for o, c in ranges]):
            for k, i in d.items():
                if k not in merged or i < merged[k]:
                    merged[k] = i
        return ray.data.from_arrow(pa.table(
            {"doc_id": pa.array(sorted(merged.values()), pa.int64())}))

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "text_md5": [hashlib.md5(t.encode()).hexdigest()
                             for t in df["text"]],
            }
        )

    ds = _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        keyed, batch_format="pandas"
    )
    out = ds.groupby("text_md5").min("doc_id")
    return _rename(out, {"min(doc_id)": "doc_id"}).select_columns(["doc_id"])


def dup_weights(sf_dir: str):
    """(doc_id, cluster_size, weight_permille): SoftDeDup-style
    duplication reweighting (He et al. 2024, arXiv:2407.06654) — instead
    of DROPPING exact duplicates, every document keeps a sampling weight
    inversely proportional to its exact-content cluster size
    (weight_permille = 1000 // n, integer-exact): the paper's
    "commonness" downweight at the cluster grain, composable with the
    stratified sampler.

    Scale shape: the shuffle moves (md5-key, doc_id) rows only — text
    never leaves the map stage; cluster size and the member emit happen
    inside one ``groupby(key).map_groups``; nothing corpus-sized touches
    the driver at any scale."""
    from ._util import ensure_schema

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "k": [hashlib.md5(t.encode()).hexdigest() for t in df["text"]],
            "doc_id": df["doc_id"].astype("int64")})

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "cluster_size": np.full(n, n, dtype="int64"),
            "weight_permille": np.full(n, 1000 // n, dtype="int64")})

    ds = _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        keyed, batch_format="pandas")
    return ensure_schema(
        ds.groupby("k").map_groups(expand, batch_format="pandas"),
        pa.schema([("doc_id", pa.int64()), ("cluster_size", pa.int64()),
                   ("weight_permille", pa.int64())]))


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup (rows-only oracle; pytest brute-force check)

K_HASHES = 64
N_BANDS = 16  # 16 bands × 4 rows: s-curve threshold (1/16)^(1/4)≈0.5,
# recall at jaccard 0.8 is 1-(1-0.8^4)^16 ≈ 0.9998 — a dedup pass must not
# miss true dups; precision is restored by exact verification
THRESH_NUM, THRESH_DEN = 4, 5  # default jaccard threshold 4/5, compared
# in INTEGERS (inter*DEN >= union*NUM) so Ray and DuckDB decide identically
_SIG_EMPTY = np.iinfo(np.int64).max  # signature of a shingle-less doc
_MH_PRIME = np.uint64(2147483647)  # 2^31-1 (Mersenne); > any shingle key


def _hash_params(k: int = K_HASHES) -> Tuple[np.ndarray, np.ndarray]:
    # 31-bit multipliers over 31-bit shingle keys: a*x+b < 2^62 is EXACT
    # in uint64 numpy AND in DuckDB BIGINT, and (a*x+b) mod 2^31-1 makes
    # the k functions independent universal hashes — the signatures are
    # bit-identical across both implementations (none of the drawn a are
    # ≡ 0 mod p, asserted in tests)
    rng = np.random.default_rng(1234)  # fixed: signatures are deterministic
    a = rng.integers(1, 1 << 31, size=k, dtype=np.uint64)
    b = rng.integers(0, 1 << 31, size=k, dtype=np.uint64)
    return a, b


def shingle_hashes(text: str, w: int = 3) -> np.ndarray:
    """DISTINCT word-w-gram keys: md5 lower-8-bytes (DuckDB
    md5_number_lower) masked to 31 bits, sorted int64."""
    toks = _TOKEN_RE.findall(text.lower())
    if len(toks) < w:
        grams = [" ".join(toks)] if toks else []
    else:
        grams = [" ".join(toks[i:i + w]) for i in range(len(toks) - w + 1)]
    if not grams:
        return np.array([], dtype=np.int64)
    return np.unique(np.array(
        [int.from_bytes(hashlib.md5(g.encode()).digest()[8:], "little")
         & 0x7FFFFFFF for g in grams],
        dtype=np.int64,
    ))


def minhash_signature(sh: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if sh.size == 0:
        return np.full(a.shape[0], _SIG_EMPTY, dtype=np.int64)
    x = sh.astype(np.uint64)
    # (a*x + b) mod p, p = 2^31-1: a proper Carter-Wegman universal hash.
    # The product is < 2^62 (exact in uint64 AND in DuckDB BIGINT) and the
    # mod is what makes the k functions INDEPENDENT permutations — without
    # it a*x+b is monotone in x, every h_i argmins at the same (minimum)
    # shingle, and the whole signature degenerates to a function of one
    # shingle (recall drops from the banded s-curve to plain J).
    vals = (x[None, :] * a[:, None] + b[:, None]) % _MH_PRIME
    return vals.min(axis=1).view(np.int64)


_MH_PARAMS: List = []


def minhash_bands(df: pd.DataFrame) -> pd.DataFrame:
    """map_batches task UDF: text → N_BANDS (band, band_hash, bk, doc_id)
    rows.  Plain task (full task-pool parallelism — an actor pool with
    small concurrency starves this stage); hash params cached per worker
    process."""
    if not _MH_PARAMS:
        _MH_PARAMS.append(_hash_params())
    a, b = _MH_PARAMS[0]
    rows_band, rows_hash, rows_doc = [], [], []
    rpb = K_HASHES // N_BANDS
    for doc_id, text in zip(df["doc_id"], df["text"]):
        sig = minhash_signature(shingle_hashes(text), a, b)
        for band in range(N_BANDS):
            seg = sig[band * rpb:(band + 1) * rpb]
            h = hashlib.blake2b(seg.tobytes(), digest_size=8).hexdigest()
            rows_band.append(band)
            rows_hash.append(h)
            rows_doc.append(doc_id)
    return pd.DataFrame({"band": rows_band, "band_hash": rows_hash,
                         "bk": [f"{b_}:{h}" for b_, h in
                                zip(rows_band, rows_hash)],
                         "doc_id": rows_doc})


def _jaccard_ge(sa_b: bytes, sb_b: bytes, num: int, den: int) -> bool:
    """Integer-exact ``jaccard(sa, sb) >= num/den`` over packed int64
    shingle sets.  union==0 (two shingle-less docs — empty/whitespace-only
    text, which always collide via the all-_SIG_EMPTY signature) is NOT a
    near-dup: Jaccard is undefined there, and marking every empty doc a
    dup of the first would be wrong.  Mirrored in the oracle SQL
    (``AND un > 0``).  Shared by the Dataset and direct-task paths so the
    decision is bit-identical."""
    sa = set(np.frombuffer(sa_b, dtype="<i8"))
    sb = set(np.frombuffer(sb_b, dtype="<i8"))
    inter = len(sa & sb)
    union = len(sa) + len(sb) - inter
    return union > 0 and inter * den >= union * num


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    if a.size == 0 and b.size == 0:
        return 1.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    return inter / union if union else 0.0


# below this many documents the whole LSH pipeline runs as two rounds of
# plain Ray tasks (the crawl_rounds / bulk-wave precedent): at sandbox
# scale the Dataset path's ~6 executions cost ~0.5-1 s of fixed
# planning/scheduling floor EACH, dominating the actual minhash compute.
# Above the gate the fully-sharded Dataset path engages unchanged.
MH_DIRECT_GATE = 100_000


def _minhash_dedup_direct(sf_dir: str, thresh_num: int, thresh_den: int,
                          return_pairs: bool = False):
    """Direct-task minhash-LSH for driver-small corpora: round A computes
    band keys (tasks over row slices), the driver finds hot buckets and
    generates candidate pairs (band rows are 16/doc — driver-small under
    the gate), round B packs shingle sets for CANDIDATE docs only, and
    verification is integer-exact `_jaccard_ge` — the same functions,
    bucket rule and decision as the Dataset path, tested equal."""
    import math

    import ray
    import ray.data
    import pyarrow.parquet as _pq

    path = f"{sf_dir}/documents.parquet"
    n = _pq.read_metadata(path).num_rows
    empty = _mh_empty(return_pairs)
    if n == 0:
        return empty
    cpus = int(ray.cluster_resources().get("CPU", 8))
    n_tasks = max(1, min(cpus * 2, math.ceil(n / 64)))
    step = math.ceil(n / n_tasks)
    ranges = [(off, min(step, n - off)) for off in range(0, n, step)]

    @ray.remote(num_cpus=1)
    def bands_task(off: int, cnt: int) -> pd.DataFrame:
        t = _pq.read_table(path, columns=["doc_id", "text"]).slice(off, cnt)
        return minhash_bands(t.to_pandas())[["bk", "doc_id"]]

    bands = pd.concat(
        ray.get([bands_task.remote(o, c) for o, c in ranges]),
        ignore_index=True)
    hot = bands[bands.groupby("bk")["doc_id"].transform("size") >= 2]
    if hot.empty:
        return empty
    pair_set = set()
    for _bk, g in hot.groupby("bk"):
        ids = np.sort(g["doc_id"].to_numpy())
        iu, ju = np.triu_indices(ids.shape[0], k=1)
        pair_set.update(zip(ids[iu].tolist(), ids[ju].tolist()))
    if not pair_set:
        return empty
    plist = sorted(pair_set)
    cand_ref = ray.put({i for p in plist for i in p})

    @ray.remote(num_cpus=1)
    def shingle_task(off: int, cnt: int, cand) -> Dict[int, bytes]:
        t = _pq.read_table(path, columns=["doc_id", "text"]).slice(off, cnt)
        df = t.to_pandas()
        df = df[df["doc_id"].isin(cand)]
        return {int(i): shingle_hashes(tx).astype("<i8").tobytes()
                for i, tx in zip(df["doc_id"], df["text"])}

    sh: Dict[int, bytes] = {}
    for d in ray.get([shingle_task.remote(o, c, cand_ref)
                      for o, c in ranges]):
        sh.update(d)
    verified = [(a, b) for a, b in plist
                if _jaccard_ge(sh[a], sh[b], thresh_num, thresh_den)]
    if return_pairs:
        return ray.data.from_arrow(pa.table(
            {"id_a": pa.array([p[0] for p in verified], pa.int64()),
             "id_b": pa.array([p[1] for p in verified], pa.int64())}))
    best: Dict[int, int] = {}
    for a, b in verified:
        if b not in best or a < best[b]:
            best[b] = a
    if not best:
        return empty
    out = sorted(best.items())
    return ray.data.from_arrow(pa.table(
        {"doc_id": pa.array([k for k, _ in out], pa.int64()),
         "dup_of": pa.array([v for _, v in out], pa.int64())}))


def _mh_empty(return_pairs: bool):
    import ray.data

    if return_pairs:
        return ray.data.from_arrow(pa.table(
            {"id_a": pa.array([], pa.int64()),
             "id_b": pa.array([], pa.int64())}))
    return ray.data.from_arrow(pa.table(
        {"doc_id": pa.array([], pa.int64()),
         "dup_of": pa.array([], pa.int64())}))


def minhash_dedup(sf_dir: str, thresh_num: int = THRESH_NUM,
                  thresh_den: int = THRESH_DEN, num_partitions: int = 8,
                  direct_gate: int = MH_DIRECT_GATE,
                  return_pairs: bool = False):
    """(doc_id, dup_of): docs whose verified shingle-Jaccard with an
    earlier doc ≥ thresh_num/thresh_den, dup_of = smallest such partner.

    Every stage is distributed — nothing corpus-sized touches the driver:
      shingle→minhash→band (map_batches, stateful)
      → bucket collision detection (aggregate-then-probe: groupby count,
        never a task per singleton bucket)
      → pair generation inside map_groups over HOT buckets only
      → pair dedup (groupby)
      → semi-join candidate ids back to the docs table (hash join) and
        compute shingle sets for CANDIDATE docs only
      → pairs ⋈ shingles ⋈ shingles (hash joins) → vectorized integer
        Jaccard verification → groupby min.
    The decision inter*den ≥ union*num is integer-exact, so the DuckDB
    oracle reproduces the result bit-for-bit."""
    import ray
    import ray.data

    try:
        import pyarrow.parquet as _pq

        n_docs = _pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    except Exception:
        n_docs = None
    if n_docs is not None and n_docs <= direct_gate:
        return _minhash_dedup_direct(sf_dir, thresh_num, thresh_den,
                                     return_pairs=return_pairs)

    docs = _read_docs(sf_dir, ["doc_id", "text"])
    bands = docs.map_batches(minhash_bands, batch_format="pandas",
                             batch_size=256).materialize()
    hot = hot_keys(bands, ["bk"])  # collision KEYS only
    empty = _mh_empty(return_pairs)
    if not hot:
        return empty
    hot_arr = pa.array(sorted(hot), pa.string())
    members = bands.map_batches(
        lambda t: t.filter(pc.is_in(t.column("bk"), value_set=hot_arr)),
        batch_format="pyarrow",
    )

    def pairgen(df: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(df["doc_id"].to_numpy())
        iu, ju = np.triu_indices(ids.shape[0], k=1)
        return pd.DataFrame({"id_a": ids[iu].astype(np.int64),
                             "id_b": ids[ju].astype(np.int64)})

    n_members = members.count()
    if n_members <= 500_000:
        # hot-member rows are driver-small: generate pairs locally (a Ray
        # sort-groupby costs ~5 s of fixed machinery at this size)
        mdf = collect_df(members.select_columns(["bk", "doc_id"]))
        frames = [pairgen(g) for _k, g in mdf.groupby("bk")] or \
            [pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                           "id_b": pd.Series([], dtype="int64")})]
        pairs = ray.data.from_pandas(pd.concat(frames, ignore_index=True))
    else:
        pairs = members.groupby("bk").map_groups(
            pairgen, batch_format="pandas").materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        return empty

    def to_shingles(df: pd.DataFrame) -> pd.DataFrame:
        # packed int64 bytes: Arrow hash joins reject list-typed payload
        # columns, binary passes through
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "sh": [shingle_hashes(t).astype("<i8").tobytes()
                   for t in df["text"]],
        })

    def jge(sa_b: bytes, sb_b: bytes) -> bool:
        return _jaccard_ge(sa_b, sb_b, thresh_num, thresh_den)

    if n_pairs <= 200_000:
        # SMALL-CANDIDATE fast path: the pair set (hence the candidate id
        # set) is driver-sized.  Broadcast the ids, compute packed
        # shingles for candidate docs DISTRIBUTED (the corpus itself never
        # leaves the cluster), broadcast those, verify in one map_batches
        # — skips three hash-join actor-pool startups that dominate at
        # bench scale.
        pdf = collect_df(pairs).drop_duplicates()
        plist = sorted(zip(pdf["id_a"].astype(int), pdf["id_b"].astype(int)))
        cand = {i for p in plist for i in p}
        cand_ref = ray.put(cand)
        sh_df = collect_df(docs.map_batches(
            lambda df, ref=cand_ref: to_shingles(
                df[df["doc_id"].isin(ray.get(ref))]),
            batch_format="pandas",
        ))  # candidate-bounded, not corpus-bounded
        sh_ref = ray.put({int(r.doc_id): r.sh
                          for r in sh_df.itertuples(index=False)})
        pair_ds = ray.data.from_arrow(pa.table({
            "id_a": pa.array([p[0] for p in plist], pa.int64()),
            "id_b": pa.array([p[1] for p in plist], pa.int64()),
        }))

        def verify_bc(df: pd.DataFrame, ref=sh_ref) -> pd.DataFrame:
            sh = ray.get(ref)
            keep_a, keep_b = [], []
            for a_id, b_id in zip(df["id_a"], df["id_b"]):
                if jge(sh[int(a_id)], sh[int(b_id)]):
                    keep_a.append(int(a_id))
                    keep_b.append(int(b_id))
            return pd.DataFrame(
                {"dup_of": pd.Series(keep_a, dtype="int64"),
                 "doc_id": pd.Series(keep_b, dtype="int64")})

        vdf = collect_df(pair_ds.map_batches(verify_bc,
                                             batch_format="pandas"))
        if vdf.empty:
            return empty
        if return_pairs:
            pout = vdf.rename(columns={"dup_of": "id_a", "doc_id": "id_b"})
            return ray.data.from_pandas(
                pout[["id_a", "id_b"]].reset_index(drop=True))
        out_pd = vdf.groupby("doc_id", as_index=False)["dup_of"].min()
        return ray.data.from_pandas(out_pd[["doc_id", "dup_of"]])
    else:
        # LARGE path — everything stays sharded:
        # pair dedup (16-byte/row shuffle) → candidate ids semi-join the
        # docs table (ships candidate TEXT rows only) → pairs ⋈ shingles
        # ⋈ shingles → vectorized verification.
        pairs = pairs.groupby(["id_a", "id_b"]).count() \
            .drop_columns(["count()"]).materialize()
        cand_ids = pairs.select_columns(["id_a"]).union(
            _rename(pairs.select_columns(["id_b"]), {"id_b": "id_a"})
        ).groupby("id_a").count().drop_columns(["count()"])
        cand_docs = docs.join(_rename(cand_ids, {"id_a": "doc_id"}),
                              join_type="inner",
                              num_partitions=num_partitions, on=("doc_id",))
        shingles = cand_docs.map_batches(
            to_shingles, batch_format="pandas").materialize()
        both = pairs.join(
            _rename(shingles, {"doc_id": "id_a", "sh": "sh_a"}),
            join_type="inner", num_partitions=num_partitions, on=("id_a",),
        ).join(
            _rename(shingles, {"doc_id": "id_b", "sh": "sh_b"}),
            join_type="inner", num_partitions=num_partitions, on=("id_b",),
        )

        def verify(df: pd.DataFrame) -> pd.DataFrame:
            keep_a, keep_b = [], []
            for a_id, b_id, sa, sb in zip(df["id_a"], df["id_b"],
                                          df["sh_a"], df["sh_b"]):
                if jge(sa, sb):
                    keep_a.append(int(a_id))
                    keep_b.append(int(b_id))
            return pd.DataFrame(
                {"dup_of": pd.Series(keep_a, dtype="int64"),
                 "doc_id": pd.Series(keep_b, dtype="int64")})

        verified = pairs_empty_guard(
            both.map_batches(verify, batch_format="pandas").materialize())
    if verified is None:
        return empty
    if return_pairs:
        return _rename(verified, {"dup_of": "id_a", "doc_id": "id_b"})
    out = verified.groupby("doc_id").min("dup_of")
    return _rename(out, {"min(dup_of)": "dup_of"})


def pairs_empty_guard(ds):
    """None when the dataset is empty (count is cheap on a mapped set)."""
    return ds if ds.count() else None


def write_minhash_params(path: str) -> str:
    """Materialize the (i, a, b) minhash permutation constants as Parquet
    for the DuckDB oracle (the same _hash_params the Ray stage uses)."""
    import pyarrow.parquet as pq

    a, b = _hash_params()
    pq.write_table(
        pa.table({
            "i": pa.array(range(K_HASHES), pa.int32()),
            "a": pa.array(a.astype(np.int64), pa.int64()),
            "b": pa.array(b.astype(np.int64), pa.int64()),
        }),
        path,
    )
    return path


# ---------------------------------------------------------------------------
# SimHash near-dup (Charikar '02 / Manku et al. '07)


_TOK_HASH_CACHE: Dict[str, int] = {}


def _tok_hash64_batch(toks: List[str]) -> np.ndarray:
    """md5 lower-8-bytes little-endian per token — DuckDB's
    ``md5_number_lower`` exactly.  Token hashes are memoized per worker
    process (natural-language vocab is Zipfian: the cache absorbs most
    of the md5 cost across documents)."""
    c = _TOK_HASH_CACHE
    out = np.empty(len(toks), dtype=np.uint64)
    for i, t in enumerate(toks):
        h = c.get(t)
        if h is None:
            h = int.from_bytes(hashlib.md5(t.encode()).digest()[8:],
                               "little")
            if len(c) < 2_000_000:
                c[t] = h
        out[i] = h
    return out


def simhash64(text: str) -> int:
    """Charikar SimHash over DISTINCT whitespace tokens, md5-keyed.
    Vectorized: one unpackbits over the token-hash matrix, one column
    sum — no per-token Python bit loop."""
    toks = sorted(set(_TOKEN_RE.findall(text.lower())))
    if not toks:
        return 0
    hs = _tok_hash64_batch(toks)
    bits = np.unpackbits(hs.view(np.uint8).reshape(-1, 8), axis=1,
                         bitorder="little")  # (n_tok, 64)
    v = bits.astype(np.int32).sum(axis=0) * 2 - len(toks)
    b = (v > 0).astype(np.uint64)
    return int((b << np.arange(64, dtype=np.uint64)).sum())


SH_BUCKET_CAP = 2000  # skip degenerate buckets (replicated in the oracle)


def simhash_pairs(sf_dir: str, max_hamming: int = 3):
    """(doc_id, dup_of): for each doc with at least one EARLIER doc at
    SimHash hamming distance ≤ max_hamming, the smallest such partner.

    COMPLETE by construction for max_hamming ≤ 3 — any pair differing in
    ≤3 of 64 bits agrees on ≥1 of the 4 16-bit chunks (pigeonhole —
    Manku-Jain-Sarma '07 block-permutation scheme), so chunk buckets are
    a guaranteed candidate superset — EXCEPT buckets larger than
    SH_BUCKET_CAP, which are dropped on both sides: pairgen allocates an
    n×n xor matrix per bucket, and at corpus scale a degenerate value
    (e.g. every empty doc fingerprints to 0) would otherwise go
    quadratic.  The DuckDB oracle replays the same banded+capped scheme
    bit-for-bit (HAVING count(*) <= cap), so the completeness caveat is
    shared, documented and gated.  Collision detection is
    aggregate-then-probe (no task per singleton bucket); pair generation
    runs DISTRIBUTED in map_groups over the hot buckets only."""
    import ray.data

    docs = _read_docs(sf_dir, ["doc_id", "text"])

    def sig(df: pd.DataFrame) -> pd.DataFrame:
        out = {"doc_id": [], "chunk": [], "chunk_val": [], "sim": []}
        for doc_id, text in zip(df["doc_id"], df["text"]):
            s = simhash64(text)
            for c in range(4):
                out["doc_id"].append(doc_id)
                out["chunk"].append(c)
                out["chunk_val"].append((s >> (16 * c)) & 0xFFFF)
                out["sim"].append(np.int64(s - (1 << 63)))  # store signed
        return pd.DataFrame(out)

    # aggregate-then-probe: never a Ray task per (mostly singleton) bucket
    sigs = docs.map_batches(sig, batch_format="pandas").materialize()
    hotset = hot_keys(sigs, ["chunk", "chunk_val"], max_count=SH_BUCKET_CAP)
    if not hotset:
        return ray.data.from_arrow(pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "dup_of": pa.array([], pa.int64())}))
    members = sigs.map_batches(
        lambda t, hs=hotset: t.filter(pa.array(
            [(c, v) in hs for c, v in zip(t.column("chunk").to_pylist(),
                                          t.column("chunk_val").to_pylist())]
        )),
        batch_format="pyarrow",
    )

    def pairgen(df: pd.DataFrame) -> pd.DataFrame:
        """All qualifying pairs within ONE hot bucket (vectorized xor +
        popcount over the bucket's fingerprint vector)."""
        ids = df["doc_id"].to_numpy()
        sims = df["sim"].to_numpy().astype(np.int64).view(np.uint64)
        order = np.argsort(ids)
        ids, sims = ids[order], sims[order]
        n = ids.shape[0]
        x = sims[None, :] ^ sims[:, None]
        ham = np.unpackbits(x.view(np.uint8).reshape(n * n, 8),
                            axis=1).sum(axis=1).reshape(n, n)
        iu, ju = np.where(np.triu(ham <= max_hamming, k=1))
        return pd.DataFrame({"dup_of": ids[iu].astype(np.int64),
                             "doc_id": ids[ju].astype(np.int64)})

    if members.count() <= 500_000:
        # driver-small hot members: local per-bucket pairgen + final min
        # (same size-gated pattern as minhash_dedup; each Ray
        # sort-groupby is fixed seconds of machinery at this size)
        mdf = collect_df(members)
        frames = [pairgen(g) for _k, g in mdf.groupby(["chunk", "chunk_val"])]
        if frames:
            pdf = pd.concat(frames, ignore_index=True)
        else:
            pdf = pd.DataFrame({"dup_of": pd.Series([], dtype="int64"),
                                "doc_id": pd.Series([], dtype="int64")})
        if pdf.empty:
            return ray.data.from_arrow(pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "dup_of": pa.array([], pa.int64())}))
        out_pd = pdf.groupby("doc_id", as_index=False)["dup_of"].min()
        return ray.data.from_pandas(out_pd[["doc_id", "dup_of"]])
    pairs = members.groupby(["chunk", "chunk_val"]).map_groups(
        pairgen, batch_format="pandas"
    ).materialize()
    if pairs.count() == 0:
        return ray.data.from_arrow(pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "dup_of": pa.array([], pa.int64())}))
    out = pairs.groupby("doc_id").min("dup_of")
    return _rename(out, {"min(dup_of)": "dup_of"})


# ---------------------------------------------------------------------------
# exact n-gram Jaccard similarity join (prefix filtering)

NJ_BUCKET_CAP = 1000  # degenerate-shingle guard, replicated in the oracle


def _nj_prefix_len(n: int, num: int, den: int) -> int:
    """Prefix-filter length for threshold num/den over an n-element
    sorted set: n - ceil(num*n/den) + 1 (Chaudhuri-Ganti-Kaushik
    SSJoin'06 prefix principle — two sets with overlap >= ceil(tau*n)
    must collide within these prefixes under any shared total order)."""
    return n - (num * n + den - 1) // den + 1


def ngram_jaccard_pairs(sf_dir: str, thresh_num: int = THRESH_NUM,
                        thresh_den: int = THRESH_DEN,
                        bucket_cap: int = NJ_BUCKET_CAP,
                        num_partitions: int = 8,
                        members_gate: int = 500_000,
                        pairs_gate: int = 200_000):
    """(id_a, id_b, inter, un): every UNORDERED doc pair whose exact
    word-3-gram-set Jaccard >= thresh_num/thresh_den, with the integer
    intersection/union sizes.  Unlike minhash_dedup (probabilistic
    banding, recall < 1) this join is EXACT: candidate generation is
    prefix filtering over the value-sorted distinct shingle sets — a
    pair at Jaccard >= tau MUST share a shingle within both docs'
    (1-tau)-fraction prefixes — so recall is 1.0 by construction, except
    prefix-shingle buckets over ``bucket_cap`` members, which are
    dropped on both sides (degenerate corpora: one boilerplate gram in
    every doc would otherwise go quadratic; the oracle replays the same
    cap).  Empty/shingle-less docs never pair (Jaccard undefined;
    ``un > 0`` on both sides).

    Scale shape: one map pass emits only PREFIX shingles (~(1-tau)
    of each doc's grams, 12 bytes/row), collision detection is
    aggregate-then-probe via ``hot_keys`` (map-side partials, no
    shuffle under the driver limit), pair generation runs in
    ``map_groups`` over hot buckets only, and verification ships packed
    shingle sets for CANDIDATE docs only (broadcast under the small
    gate, two hash joins above it) — the corpus never leaves the
    cluster and nothing corpus-sized lands on the driver."""
    import ray
    import ray.data

    docs = _read_docs(sf_dir, ["doc_id", "text"])
    empty = ray.data.from_arrow(pa.table(
        {"id_a": pa.array([], pa.int64()),
         "id_b": pa.array([], pa.int64()),
         "inter": pa.array([], pa.int64()),
         "un": pa.array([], pa.int64())}))

    def prefix_fn(df: pd.DataFrame) -> pd.DataFrame:
        xs, ids = [], []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            sh = shingle_hashes(text)  # distinct, value-sorted
            if sh.size == 0:
                continue
            p = _nj_prefix_len(sh.size, thresh_num, thresh_den)
            xs.append(sh[:p])
            ids.append(np.full(p, int(doc_id), dtype=np.int64))
        if not xs:
            return pd.DataFrame({"x": pd.Series([], dtype="int64"),
                                 "doc_id": pd.Series([], dtype="int64")})
        return pd.DataFrame({"x": np.concatenate(xs),
                             "doc_id": np.concatenate(ids)})

    pre = docs.map_batches(prefix_fn, batch_format="pandas").materialize()
    hotset = hot_keys(pre, ["x"], max_count=bucket_cap)
    if not hotset:
        return empty
    hot_arr = pa.array(sorted(int(x) for x in hotset), pa.int64())
    members = pre.map_batches(
        lambda t: t.filter(pc.is_in(t.column("x"), value_set=hot_arr)),
        batch_format="pyarrow",
    )

    def pairgen(df: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(df["doc_id"].to_numpy())
        iu, ju = np.triu_indices(ids.shape[0], k=1)
        return pd.DataFrame({"id_a": ids[iu].astype(np.int64),
                             "id_b": ids[ju].astype(np.int64)})

    if members.count() <= members_gate:
        # driver-small hot members: local per-bucket pairgen (the same
        # size-gated pattern as minhash_dedup/simhash_pairs)
        mdf = collect_df(members)
        frames = [pairgen(g) for _k, g in mdf.groupby("x")]
        pdf = (pd.concat(frames, ignore_index=True).drop_duplicates()
               if frames else
               pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                             "id_b": pd.Series([], dtype="int64")}))
        if pdf.empty:
            return empty
        pairs = ray.data.from_pandas(pdf.reset_index(drop=True))
        n_pairs = len(pdf)
    else:
        pairs = members.groupby("x").map_groups(
            pairgen, batch_format="pandas").materialize()
        pairs = pairs.groupby(["id_a", "id_b"]).count() \
            .drop_columns(["count()"]).materialize()
        n_pairs = pairs.count()
    if n_pairs == 0:
        return empty

    def to_shingles(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "sh": [shingle_hashes(t).astype("<i8").tobytes()
                   for t in df["text"]],
        })

    def jstats(sa_b: bytes, sb_b: bytes):
        sa = np.frombuffer(sa_b, dtype="<i8")
        sb = np.frombuffer(sb_b, dtype="<i8")
        inter = np.intersect1d(sa, sb, assume_unique=True).size
        return inter, sa.size + sb.size - inter

    if n_pairs <= pairs_gate:
        # small-candidate path: broadcast candidate ids, compute packed
        # shingles for candidate docs DISTRIBUTED, broadcast, verify
        pdf = collect_df(pairs)
        plist = sorted(zip(pdf["id_a"].astype(int), pdf["id_b"].astype(int)))
        cand_ref = ray.put({i for p in plist for i in p})
        sh_df = collect_df(docs.map_batches(
            lambda df, ref=cand_ref: to_shingles(
                df[df["doc_id"].isin(ray.get(ref))]),
            batch_format="pandas",
        ))  # candidate-bounded, not corpus-bounded
        sh_ref = ray.put({int(r.doc_id): r.sh
                          for r in sh_df.itertuples(index=False)})
        pair_ds = ray.data.from_arrow(pa.table({
            "id_a": pa.array([p[0] for p in plist], pa.int64()),
            "id_b": pa.array([p[1] for p in plist], pa.int64())}))

        def verify_bc(df: pd.DataFrame, ref=sh_ref) -> pd.DataFrame:
            sh = ray.get(ref)
            out = {"id_a": [], "id_b": [], "inter": [], "un": []}
            for a_id, b_id in zip(df["id_a"], df["id_b"]):
                inter, un = jstats(sh[int(a_id)], sh[int(b_id)])
                if un > 0 and inter * thresh_den >= un * thresh_num:
                    out["id_a"].append(int(a_id))
                    out["id_b"].append(int(b_id))
                    out["inter"].append(inter)
                    out["un"].append(un)
            return pd.DataFrame({k: pd.Series(v, dtype="int64")
                                 for k, v in out.items()})

        vdf = collect_df(pair_ds.map_batches(verify_bc,
                                             batch_format="pandas"))
        if vdf.empty:
            return empty
        return ray.data.from_pandas(vdf.reset_index(drop=True))

    # large path: candidate ids semi-join the docs table, then
    # pairs |><| shingles |><| shingles, vectorized verification
    cand_ids = pairs.select_columns(["id_a"]).union(
        _rename(pairs.select_columns(["id_b"]), {"id_b": "id_a"})
    ).groupby("id_a").count().drop_columns(["count()"])
    cand_docs = docs.join(_rename(cand_ids, {"id_a": "doc_id"}),
                          join_type="inner",
                          num_partitions=num_partitions, on=("doc_id",))
    shingles = cand_docs.map_batches(
        to_shingles, batch_format="pandas").materialize()
    both = pairs.join(
        _rename(shingles, {"doc_id": "id_a", "sh": "sh_a"}),
        join_type="inner", num_partitions=num_partitions, on=("id_a",),
    ).join(
        _rename(shingles, {"doc_id": "id_b", "sh": "sh_b"}),
        join_type="inner", num_partitions=num_partitions, on=("id_b",),
    )

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        out = {"id_a": [], "id_b": [], "inter": [], "un": []}
        for a_id, b_id, sa, sb in zip(df["id_a"], df["id_b"],
                                      df["sh_a"], df["sh_b"]):
            inter, un = jstats(sa, sb)
            if un > 0 and inter * thresh_den >= un * thresh_num:
                out["id_a"].append(int(a_id))
                out["id_b"].append(int(b_id))
                out["inter"].append(inter)
                out["un"].append(un)
        return pd.DataFrame({k: pd.Series(v, dtype="int64")
                             for k, v in out.items()})

    verified = pairs_empty_guard(
        both.map_batches(verify, batch_format="pandas").materialize())
    return verified if verified is not None else empty


def ngram_jaccard_oracle_sql(thresh_num: int = THRESH_NUM,
                             thresh_den: int = THRESH_DEN,
                             bucket_cap: int = NJ_BUCKET_CAP) -> str:
    """DuckDB replay of the prefix-filter join: the same gram/shingle
    definition as the minhash CTEs, value-sorted, prefix length
    n - ceil(num*n/den) + 1, the same bucket cap, and the identical
    integer verify inter*den >= un*num AND un > 0."""
    num, den = thresh_num, thresh_den
    return (
        "WITH t AS (SELECT doc_id, "
        "regexp_extract_all(lower(text), '\\S+') AS toks FROM documents), "
        "sh0 AS (SELECT doc_id, CASE WHEN len(toks) >= 3 THEN "
        "list_transform(range(1, len(toks) - 1), i -> "
        "toks[CAST(i AS INT)] || ' ' || toks[CAST(i AS INT) + 1] || ' ' "
        "|| toks[CAST(i AS INT) + 2]) "
        "WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')] "
        "ELSE [] END AS grams FROM t), "
        "sh AS (SELECT doc_id, list_sort(list_distinct(list_transform("
        "grams, g -> CAST(md5_number_lower(g) & 2147483647::UBIGINT "
        "AS BIGINT)))) AS xs FROM sh0), "
        f"pre AS (SELECT doc_id, unnest(list_slice(xs, 1, "
        f"len(xs) - (({num} * len(xs) + {den} - 1) // {den}) + 1)) AS x "
        "FROM sh WHERE len(xs) > 0), "
        "hot AS (SELECT x FROM pre GROUP BY x "
        f"HAVING count(*) >= 2 AND count(*) <= {bucket_cap}), "
        "cand AS (SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb "
        "FROM pre a JOIN hot h ON a.x = h.x "
        "JOIN pre b ON b.x = a.x AND a.doc_id < b.doc_id), "
        "j AS (SELECT c.ida, c.idb, "
        "len(list_intersect(sa.xs, sb.xs)) AS inter, "
        "len(sa.xs) + len(sb.xs) - len(list_intersect(sa.xs, sb.xs)) "
        "AS un FROM cand c JOIN sh sa ON sa.doc_id = c.ida "
        "JOIN sh sb ON sb.doc_id = c.idb) "
        "SELECT ida AS id_a, idb AS id_b, inter::BIGINT AS inter, "
        "un::BIGINT AS un FROM j "
        f"WHERE un > 0 AND inter * {den} >= un * {num}"
    )


# ---------------------------------------------------------------------------
# language ID (n-gram heuristic; rows-only oracle)

_LANG_SAMPLES = {
    "en": "the quick brown fox jumps over the lazy dog and this is a test "
          "of the english language with many common words",
    "de": "der schnelle braune fuchs springt über den faulen hund und das "
          "ist ein test der deutschen sprache mit vielen wörtern",
    "fr": "le renard brun rapide saute par dessus le chien paresseux et "
          "ceci est un test de la langue française avec des mots",
    "es": "el rápido zorro marrón salta sobre el perro perezoso y esto es "
          "una prueba del idioma español con muchas palabras",
    "sv": "den snabba bruna räven hoppar över den lata hunden och detta är "
          "ett test av det svenska språket med många ord",
    "zh": "敏捷的棕色狐狸跳过懒狗这是中文语言测试包含许多常用词",
}


def _profile(text: str, n: int = 2) -> Dict[str, int]:
    t = " " + re.sub(r"\s+", " ", text.lower()) + " "
    out: Dict[str, int] = {}
    for i in range(len(t) - n + 1):
        g = t[i:i + n]
        out[g] = out.get(g, 0) + 1
    return out


LANG_ORDER = ("en", "de", "fr", "es", "sv", "zh")  # tie-break priority


class LangId:
    """Character-bigram cosine against fixed per-language profiles
    (built once per actor — the stateful-stage pattern).

    The argmax is INTEGER-EXACT: cosine(p, q_i) ordering over a fixed
    document profile p reduces to ordering dot_i² / |q_i|² (the document
    norm is a common factor), compared by cross-multiplication in
    integers — no float in the decision, so the DuckDB oracle replicates
    the prediction bit-for-bit.  Ties keep the earlier language in
    LANG_ORDER."""

    def __init__(self):
        self.profiles = []
        for lang in LANG_ORDER:
            q = _profile(_LANG_SAMPLES[lang])
            n2 = sum(v * v for v in q.values())  # |q|² (int)
            self.profiles.append((lang, q, n2))

    def predict(self, text: str) -> str:
        p = _profile(text[:1000])
        best, bd2, bn2 = None, 0, 1
        for lang, q, n2 in self.profiles:
            dot = sum(v * q.get(g, 0) for g, v in p.items())
            d2 = dot * dot
            if best is None or d2 * bn2 > bd2 * n2:  # dot²/n2 strictly wins
                best, bd2, bn2 = lang, d2, n2
        return best

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "lang_pred": [self.predict(t) for t in df["text"]],
            }
        )


def langid(sf_dir: str):
    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        task_udf(LangId), batch_format="pandas"
    )


def write_langid_profiles(path: str) -> str:
    """Materialize the per-language bigram profiles as Parquet (lang,
    prio, gram, cnt, n2) for the DuckDB oracle."""
    import pyarrow.parquet as pq

    rows = {"lang": [], "prio": [], "gram": [], "cnt": [], "n2": []}
    for prio, lang in enumerate(LANG_ORDER):
        q = _profile(_LANG_SAMPLES[lang])
        n2 = sum(v * v for v in q.values())
        for g, c in q.items():
            rows["lang"].append(lang)
            rows["prio"].append(prio)
            rows["gram"].append(g)
            rows["cnt"].append(c)
            rows["n2"].append(n2)
    tbl = pa.table({
        "lang": pa.array(rows["lang"], pa.string()),
        "prio": pa.array(rows["prio"], pa.int32()),
        "gram": pa.array(rows["gram"], pa.string()),
        "cnt": pa.array(rows["cnt"], pa.int64()),
        "n2": pa.array(rows["n2"], pa.int64()),
    })
    pq.write_table(tbl, path)
    return path


# ---------------------------------------------------------------------------
# document fingerprint (rolling hash; rows-only oracle)


_WS_RE = re.compile(r"\s+")

FP_K = 8  # k-gram length (chars, over normalized text)
FP_W = 4  # winnowing window (grams)


def winnow(text: str, k: int = FP_K, w: int = FP_W):
    """Schleimer-Schwamberger-Wilkerson-Aiken winnowing (SIGMOD '03,
    Fig. 5): hash every char k-gram of the normalized text, slide a
    w-gram window, select the MIN hash per window (rightmost occurrence
    on ties), dedupe (pos, hash).  Hash = lower-8-bytes-hex of md5 so
    string MIN order is identical in the DuckDB oracle.  Returns sorted
    [(pos_1based, fp_hex16)]."""
    s = _WS_RE.sub(" ", text.lower())
    n = len(s)
    if n == 0:
        return []
    if n >= k:
        hs = [hashlib.md5(s[i:i + k].encode()).hexdigest()[16:32]
              for i in range(n - k + 1)]
    else:
        hs = [hashlib.md5(s.encode()).hexdigest()[16:32]]
    m = len(hs)
    sel = set()
    if m < w:
        mn = min(hs)
        pos = max(i for i, h in enumerate(hs) if h == mn)
        sel.add((pos + 1, mn))
    else:
        for end in range(w - 1, m):
            lo = end - w + 1
            mn = min(hs[lo:end + 1])
            pos = max(i for i in range(lo, end + 1) if hs[i] == mn)
            sel.add((pos + 1, mn))
    return sorted(sel)


def fingerprints(sf_dir: str):
    """(doc_id, pos, fp): the winnowed fingerprint set per document —
    the plagiarism/overlap-detection primitive.  Density ≈ 2/(w+1) of
    the k-grams; SQL-oracled exactly (window-min + rightmost-tie join)."""
    def fp(df: pd.DataFrame) -> pd.DataFrame:
        ids, poss, fps = [], [], []
        for doc_id, t in zip(df["doc_id"], df["text"]):
            for pos, h in winnow(t):
                ids.append(doc_id)
                poss.append(pos)
                fps.append(h)
        return pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                             "pos": pd.Series(poss, dtype="int64"),
                             "fp": pd.Series(fps, dtype="string")})

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        fp, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# composed training-data cleaning pipeline (SQL-oracled)


_STOP_PAT = (r"(?<!\S)(?:"
             + "|".join(re.escape(w) for w in STOPWORDS) + r")(?!\S)")


def corpus_clean(sf_dir: str, lang: str = "en",
                 direct_gate: int = 1_000_000):
    """The flagship composed document flow — quality gate (length
    bounds + stopword presence) → language filter → exact dedup (keep
    the smallest doc_id per distinct text) → per-doc token stats, in
    ONE streaming pass.  Returns (doc_id, n_tokens, n_chars) for
    surviving documents.

    Scale shape: text never crosses a stage boundary.  The quality
    gate, the md5 key and the token stats are all computed inside the
    same map_batches; the only exchange is the dedup groupby over
    (md5, doc_id, stats) rows, pre-combined in-batch, and duplicate
    groups carry equal stats so the grouped aggregate is three Min()s.
    Below ``direct_gate`` rows the groupby collapses to task-side
    partials folded on the driver (the exact_dedup precedent — the
    Dataset groupby costs ~1.5 s of fixed machinery at bench scale);
    the SAME ``pre`` kernel runs in both paths.
    """
    def pre(df: pd.DataFrame) -> pd.DataFrame:
        n_chars = df["text"].str.len().astype("int64")
        n_stop = df["text"].str.count(_STOP_PAT).astype("int64")
        keep = ((df["lang"] == lang) & (n_chars >= 50) & (n_chars <= 5000)
                & (n_stop >= 1))
        df = df[keep]
        out = pd.DataFrame({
            "h": [hashlib.md5(t.encode()).hexdigest() for t in df["text"]],
            "doc_id": df["doc_id"].astype("int64"),
            "n_tokens": df["text"].str.count(r"\S+").astype("int64"),
            "n_chars": n_chars[keep],
        })
        # in-batch combiner: one row per distinct text before the shuffle
        return out.groupby("h", as_index=False).min()

    import ray
    import ray.data

    direct = _docs_direct_ranges(sf_dir, direct_gate)
    if direct is not None:
        path, ranges = direct

        @ray.remote(num_cpus=1)
        def pre_task(off: int, cnt: int) -> pd.DataFrame:
            import pyarrow.parquet as _pq

            t = _pq.read_table(path, columns=["doc_id", "text", "lang"]) \
                .slice(off, cnt)
            return pre(t.to_pandas())

        parts = ray.get([pre_task.remote(o, c) for o, c in ranges])
        merged = pd.concat(parts, ignore_index=True) if parts else \
            pd.DataFrame({"h": [], "doc_id": [], "n_tokens": [],
                          "n_chars": []})
        if merged.empty:
            return ray.data.from_arrow(pa.table({
                "doc_id": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "n_chars": pa.array([], pa.int64())}))
        out = merged.groupby("h", as_index=False).min() \
            .sort_values("doc_id").reset_index(drop=True)
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array(out["doc_id"].astype("int64"), pa.int64()),
            "n_tokens": pa.array(out["n_tokens"].astype("int64"),
                                 pa.int64()),
            "n_chars": pa.array(out["n_chars"].astype("int64"),
                                pa.int64())}))

    ds = _read_docs(sf_dir, ["doc_id", "text", "lang"]).map_batches(
        pre, batch_format="pandas")
    agg = ds.groupby("h").aggregate(
        ray.data.aggregate.Min("doc_id"),
        ray.data.aggregate.Min("n_tokens"),
        ray.data.aggregate.Min("n_chars"))

    def project(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["min(doc_id)"].astype("int64"),
            "n_tokens": df["min(n_tokens)"].astype("int64"),
            "n_chars": df["min(n_chars)"].astype("int64"),
        })

    return agg.map_batches(project, batch_format="pandas")


# ---------------------------------------------------------------------------
# heavy hitters: Misra-Gries sketch + exact verify (SQL-oracled)


MG_CAPACITY = 512  # per-block sketch size; guarantee floor is N/(cap+1)


def _gram_findall(text: str, gram: int) -> list:
    """Whitespace-token n-gram stream: gram=1 → tokens; gram≥2 →
    space-joined consecutive n-grams (the WIMBD corpus-count unit)."""
    toks = _TOKEN_RE.findall(text)
    if gram == 1:
        return toks
    return [" ".join(toks[i:i + gram])
            for i in range(len(toks) - gram + 1)]


def top_tokens(sf_dir: str, k: int = 50, capacity: int = MG_CAPACITY,
               driver_gate: int = 2_000_000,
               direct_gate: int = 200_000, gram: int = 1):
    """The k most frequent whitespace tokens corpus-wide, EXACT, without
    shuffling the full token stream — the vocabulary/heavy-hitter op a
    100 TB corpus needs (a naive groupby over every token is an
    all-to-all exchange of the tokenized corpus itself).

    Two passes (Misra-Gries '82 summary + exact verify):
      1. each batch computes exact in-batch counts, then MG-compresses
         to ``capacity`` entries (subtract the (capacity+1)-th largest
         count, drop non-positive).  Summed across batches, any token
         whose true corpus count exceeds N/(capacity+1) is GUARANTEED a
         surviving key (per-batch undercount is ≤ N_b/(capacity+1) and
         absent tokens' counts telescope).
      2. exact counts for the surviving key set only (broadcast set,
         in-batch partials, tiny driver fold) → top-k by (count desc,
         token asc).
    Sketch merging is size-gated: ≤ ``driver_gate`` sketch rows fold on
    the driver; above it (the 100 TB shape — sketch rows grow as
    blocks × capacity) the merge is a distributed groupby-sum over
    SKETCH rows only, and the broadcast candidate set is bounded by the
    threshold w_k − floor (w_k = k-th largest merged weight): every
    true top-k token has weight ≥ true − floor ≥ true_kth − floor ≥
    w_k − floor, so the filter provably keeps the answer while
    excluding the long tail.
    The result is provably exact iff no batch compressed, or the k-th
    exact count clears the N/(capacity+1) floor; a corpus too flat for
    that falls back to the exact distributed groupby (correct either
    way — the sketch is purely a shuffle-avoidance fast path).
    Below ``direct_gate`` documents a direct-task path computes exact
    per-slice counts and folds them on the driver (same output — the
    sketch is only ever a shuffle-avoidance mechanism, and at sandbox
    scale the Dataset executions' fixed floors dominate it).
    Returns (token, cnt, rank), rank 1-based.
    """
    import ray
    import ray.data

    def to_out(top: pd.DataFrame):
        top = top.reset_index(drop=True)
        return ray.data.from_arrow(pa.table({
            "token": pa.array(top["token"], pa.string()),
            "cnt": pa.array(top["cnt"].astype("int64"), pa.int64()),
            "rank": pa.array(np.arange(1, len(top) + 1, dtype="int64"),
                             pa.int64())}))

    direct = _docs_direct_ranges(sf_dir, direct_gate)
    if direct is not None:
        path, ranges = direct

        @ray.remote(num_cpus=1)
        def cnt_task(off: int, cnt: int) -> pd.DataFrame:
            import pyarrow.parquet as _pq

            t = _pq.read_table(path, columns=["text"]).slice(off, cnt)
            toks = np.concatenate(
                [_gram_findall(x, gram) for x in
                 t.column("text").to_pylist()] or [[]])
            if toks.shape[0] == 0:
                return pd.DataFrame({"token": pd.Series([], dtype="str"),
                                     "cnt": pd.Series([], dtype="int64")})
            uniq, c = np.unique(toks, return_counts=True)
            return pd.DataFrame({"token": uniq, "cnt": c.astype("int64")})

        parts = ray.get([cnt_task.remote(o, c) for o, c in ranges])
        merged_df = pd.concat(parts, ignore_index=True) if parts else \
            pd.DataFrame({"token": [], "cnt": []})
        if merged_df.empty:
            return to_out(pd.DataFrame({"token": pd.Series([], dtype="str"),
                                        "cnt": pd.Series([], dtype="int64")}))
        counts = merged_df.groupby("token")["cnt"].sum().reset_index()
        return to_out(counts.sort_values(
            ["cnt", "token"], ascending=[False, True]).head(k))

    docs = _read_docs(sf_dir, ["text"])

    def sketch(df: pd.DataFrame) -> pd.DataFrame:
        toks = np.concatenate(
            [_gram_findall(t, gram) for t in df["text"]] or [[]])
        total = toks.shape[0]
        if total == 0:
            return pd.DataFrame({"token": pd.Series([], dtype="string"),
                                 "wt": pd.Series([], dtype="int64"),
                                 "batch_total": pd.Series([], dtype="int64"),
                                 "is_total": pd.Series([], dtype="bool")})
        uniq, cnt = np.unique(toks, return_counts=True)
        compressed = uniq.shape[0] > capacity
        if compressed:
            # MG compress: subtract the (capacity+1)-th largest count
            kth = np.partition(cnt, -capacity - 1)[-capacity - 1]
            keep = cnt > kth
            uniq, cnt = uniq[keep], cnt[keep] - kth
        out = pd.DataFrame({"token": uniq, "wt": cnt.astype("int64")})
        out["batch_total"] = np.int64(0)
        out["is_total"] = False
        # one marker row carries the batch's token total for N; its wt
        # records whether this batch actually compressed (the fast
        # path's exactness proof only needs the floor check when some
        # batch dropped tokens)
        out.loc[len(out)] = {"token": "", "wt": int(compressed),
                             "batch_total": np.int64(total),
                             "is_total": True}
        return out

    sk = docs.map_batches(sketch, batch_format="pandas").materialize()

    if sk.count() <= driver_gate:
        parts = collect_df(sk)
        markers = parts.loc[parts["is_total"]]
        n_total = int(markers["batch_total"].sum())
        n_compressed = int(markers["wt"].sum())
        merged = parts.loc[~parts["is_total"]].groupby("token")["wt"].sum()
    else:
        # distributed merge: markers fold on the driver (one tiny row
        # per batch); sketch entries groupby-sum WITHOUT leaving the
        # cluster, then only the threshold survivors come back
        markers = collect_df(sk.map_batches(
            lambda df: df.loc[df["is_total"], ["wt", "batch_total"]],
            batch_format="pandas"))
        n_total = int(markers["batch_total"].sum())
        n_compressed = int(markers["wt"].sum())
        entries = sk.map_batches(
            lambda df: df.loc[~df["is_total"], ["token", "wt"]],
            batch_format="pandas")
        magg = _rename(
            entries.groupby("token").aggregate(ray.data.aggregate.Sum("wt")),
            {"sum(wt)": "wt"})
        topw = collect_df(magg.sort("wt", descending=True).limit(k))
        floor0 = n_total // (capacity + 1)
        thresh = (int(topw["wt"].min()) if len(topw) == k else 0) - floor0
        if len(topw) == k and thresh <= 0:
            # flat corpus: candidate set unbounded, sketch proves
            # nothing — merged stays empty so the fallback below runs
            merged = pd.Series([], dtype="int64")
        else:
            cand = collect_df(magg.filter(
                lambda r, t=thresh: r["wt"] >= t))
            merged = cand.set_index("token")["wt"]
    floor = n_total // (capacity + 1)

    if n_total == 0:
        return ray.data.from_arrow(pa.table({
            "token": pa.array([], pa.string()),
            "cnt": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64())}))

    def exact_fallback() -> pd.DataFrame:
        # flat corpus (sketch guarantee failed): plain distributed
        # groupby — correct always, just pays the full-token exchange
        def cnt_all(df: pd.DataFrame) -> pd.DataFrame:
            toks = np.concatenate(
                [_gram_findall(t, gram) for t in df["text"]] or [[]])
            uniq, cnt = np.unique(toks, return_counts=True)
            return pd.DataFrame({"token": uniq, "cnt": cnt.astype("int64")})

        agg = docs.map_batches(cnt_all, batch_format="pandas") \
            .groupby("token").aggregate(ray.data.aggregate.Sum("cnt"))
        full = collect_df(_rename(agg, {"sum(cnt)": "cnt"}))
        return full.sort_values(["cnt", "token"],
                                ascending=[False, True]).head(k)

    if merged.empty:
        # every batch compressed away every key — nothing clears the
        # floor, so the sketch proves nothing
        top = exact_fallback()
    else:
        cand_arr = np.sort(merged.index.to_numpy(dtype="str"))

        def exact(df: pd.DataFrame, ca=cand_arr) -> pd.DataFrame:
            toks = np.concatenate(
                [_gram_findall(t, gram) for t in df["text"]] or [[]])
            if toks.shape[0] == 0:
                return pd.DataFrame(
                    {"token": pd.Series([], dtype="string"),
                     "cnt": pd.Series([], dtype="int64")})
            hits = toks[np.isin(toks, ca)]
            uniq, cnt = np.unique(hits, return_counts=True)
            return pd.DataFrame({"token": uniq, "cnt": cnt.astype("int64")})

        ex = collect_df(docs.map_batches(exact, batch_format="pandas"))
        counts = ex.groupby("token")["cnt"].sum()
        top = counts.reset_index().sort_values(
            ["cnt", "token"], ascending=[False, True]).head(k)
        # provably exact iff no batch dropped tokens, or the k-th exact
        # count clears the merged-sketch undercount floor
        exact_ok = (n_compressed == 0 or
                    (len(top) == k and int(top["cnt"].iloc[-1]) > floor))
        if not exact_ok:
            top = exact_fallback()

    return to_out(top)


def top_bigrams(sf_dir: str, k: int = 50):
    """The k most frequent whitespace-token 2-grams corpus-wide, EXACT —
    WIMBD-style corpus n-gram counting (Elazar et al. 2023,
    arXiv:2310.20707) via the same Misra-Gries sketch + exact-verify
    machinery as ``top_tokens`` over the bigram stream (the MG guarantee
    is stream-agnostic: any item whose true count exceeds N/(capacity+1)
    survives the merged sketch, N now the bigram count)."""
    return top_tokens(sf_dir, k=k, gram=2)


# ---------------------------------------------------------------------------
# benchmark decontamination, stratified sampling, repetition filter,
# PII scrubbing — the remaining first-class training-data ops


BENCH_MOD = 37  # doc_id % BENCH_MOD == 0 → benchmark-suite member


def decontaminate(sf_dir: str, bench_mod: int = BENCH_MOD):
    """(doc_id, n_shingles, n_hits, contaminated) for every NON-benchmark
    document — eval-benchmark decontamination (the GPT-3 appendix-C /
    The-Pile overlap filter): the benchmark set (here the doc_id %
    ``bench_mod`` members, standing in for held-out eval suites)
    contributes its DISTINCT word-3-gram keys (md5-31-bit — the same
    shingle key the minhash family uses); every other document reports
    how many of its own distinct shingles hit that set;
    contaminated = any hit.

    Scale shape: eval benchmarks are MBs against a 100 TB corpus, so the
    key set is built once (one map pass + small driver fold), broadcast
    via ``ray.put`` as a sorted int64 array, and probed per batch with a
    vectorized ``np.isin`` — the corpus side is one map-only pass, no
    shuffle anywhere."""
    import ray

    def bench_keys(df: pd.DataFrame) -> pd.DataFrame:
        sub = df[df["doc_id"] % bench_mod == 0]
        xs = [shingle_hashes(t) for t in sub["text"]]
        vals = np.unique(np.concatenate(xs)) if xs else np.array(
            [], dtype=np.int64)
        return pd.DataFrame({"x": pd.Series(vals, dtype="int64")})

    bench = np.unique(collect_df(
        _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
            bench_keys, batch_format="pandas"))["x"].to_numpy(np.int64))
    bref = ray.put(bench)

    def probe(df: pd.DataFrame, _r=bref) -> pd.DataFrame:
        b = ray.get(_r)
        sub = df[df["doc_id"] % bench_mod != 0]
        n_sh = np.zeros(len(sub), dtype=np.int64)
        n_hit = np.zeros(len(sub), dtype=np.int64)
        for i, t in enumerate(sub["text"]):
            xs = shingle_hashes(t)
            n_sh[i] = xs.shape[0]
            if xs.shape[0] and b.shape[0]:
                n_hit[i] = int(np.isin(xs, b, assume_unique=True).sum())
        return pd.DataFrame({
            "doc_id": sub["doc_id"].to_numpy(np.int64),
            "n_shingles": n_sh,
            "n_hits": n_hit,
            "contaminated": (n_hit > 0).astype(np.int64),
        })

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        probe, batch_format="pandas")


SAMPLE_PERMILLE = {"en": 200, "de": 350}  # per-stratum keep rates ‰
SAMPLE_DEFAULT_PERMILLE = 500


def sample_stratified(sf_dir: str, permille=None,
                      default: int = SAMPLE_DEFAULT_PERMILLE):
    """Deterministic per-stratum subsampling — the corpus-mixing op
    (downweight over-represented languages/sources when composing a
    training mix).  Selector: md5-lower-8-LE of ``str(doc_id)`` mod 1000
    < permille[lang] — a pure function of the row, so the sample is
    reproducible, order-independent, resumable, and needs no RNG state;
    the whole op is one map-only filter pass (no shuffle, no sampling
    actor).  Returns the kept (doc_id, lang, source) rows."""
    rates = dict(SAMPLE_PERMILLE if permille is None else permille)

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        h = np.fromiter(
            (int.from_bytes(
                hashlib.md5(str(int(d)).encode()).digest()[8:],
                "little") % 1000 for d in df["doc_id"]),
            dtype=np.int64, count=len(df))
        r = df["lang"].map(lambda l: rates.get(l, default)).to_numpy(
            dtype=np.int64)
        out = df[h < r]
        return pd.DataFrame({
            "doc_id": out["doc_id"].astype("int64"),
            "lang": out["lang"].astype("string"),
            "source": out["source"].astype("string"),
        })

    return _read_docs(sf_dir, ["doc_id", "lang", "source"]).map_batches(
        pick, batch_format="pandas")


REP_NUM, REP_DEN = 1, 5  # pass iff dup-bigram fraction ≤ 1/5


def repetition(sf_dir: str, num: int = REP_NUM, den: int = REP_DEN):
    """(doc_id, n_bigrams, n_dup, rep_ok) — within-document repetition
    signal (the Gopher/MassiveText rep filters' word-n-gram member):
    fraction of duplicate word-2-grams, decided integer-exact as
    ``n_dup * den <= n_bigrams * num`` (docs with no bigrams pass).
    Per-doc work only — one map pass, no shuffle."""
    def rep(df: pd.DataFrame) -> pd.DataFrame:
        nb = np.zeros(len(df), dtype=np.int64)
        nd = np.zeros(len(df), dtype=np.int64)
        for i, t in enumerate(df["text"]):
            toks = _TOKEN_RE.findall(t.lower())
            if len(toks) >= 2:
                grams = [toks[j] + " " + toks[j + 1]
                         for j in range(len(toks) - 1)]
                nb[i] = len(grams)
                nd[i] = len(grams) - len(set(grams))
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "n_bigrams": nb,
            "n_dup": nd,
            "rep_ok": (nd * den <= nb * num).astype(np.int64),
        })

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        rep, batch_format="pandas")


# PII patterns: RE2-safe (no backrefs/lookaround) so Python re and the
# DuckDB oracle's regexp_* evaluate them identically
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\b555-\d{4}\b"
PII_PLANT_MOD = 11


def pii_documents_path(sf_dir: str) -> str:
    """Deterministic PII-augmented documents fixture.  The synthetic
    corpus is word-soup with no organic PII, so the scrubber is
    exercised on planted spans (the ``embedding_neardup`` planted-
    fixture pattern): every doc_id % 11 == 0 document gains an email,
    an IPv4 and a phone number, all pure functions of doc_id.  Both the
    Ray pipeline and the DuckDB oracle read THIS table.

    r5: built DISTRIBUTEDLY — map_batches read→augment→write_parquet
    (the r4 builder read the whole corpus on the driver).  The planted
    span is a pure function of doc_id, so the rewrite is byte-identical
    per row regardless of block order; a legacy single-file fixture at
    the same cache path stays valid (SQL sites go through
    ``ann.pq_sql_ref``)."""
    import os
    import pyarrow.parquet as pq
    import ray.data

    src = f"{sf_dir}/documents.parquet"
    n = pq.ParquetFile(src).metadata.num_rows
    base = (f"/tmp/mwc_docs_pii-"
            f"{os.path.basename(os.path.normpath(sf_dir))}-{n}")
    legacy = base + ".parquet"   # r4 single-file fixture: same bytes
    if os.path.exists(legacy):
        return legacy
    out = base + "-r5dist"       # directory (Dataset.write_parquet)
    if os.path.exists(out):
        return out

    def plant(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy().astype(np.int64)
        texts = df["text"].tolist()
        for i in np.flatnonzero(ids % PII_PLANT_MOD == 0):
            d = int(ids[i])
            texts[i] = (f"{texts[i]} contact u{d}@ex{d % 7}.com from "
                        f"10.{d % 200}.{(d * 3) % 251}.{(d * 7) % 249} "
                        f"call 555-{1000 + d % 9000}")
        return pd.DataFrame({
            "doc_id": pd.Series(ids, dtype="int64"),
            "text": pd.Series(texts, dtype="string")})

    tmp = out + ".tmp"
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)  # crashed-build leftovers
    ray.data.read_parquet(src, columns=["doc_id", "text"]).map_batches(
        plant, batch_format="pandas").write_parquet(tmp)
    os.replace(tmp, out)
    return out


def pii_scrub(sf_dir: str):
    """(doc_id, n_emails, n_ips, n_phones, clean_md5) over the planted
    fixture — PII detection + redaction (emails → <EMAIL>, IPv4 →
    <IP>, phones → <PHONE>), the compliance pass every released corpus
    needs.  Counts come from the original text; ``clean_md5`` is the
    md5-hex of the redacted text so the oracle verifies the actual
    rewritten bytes, not just the counts.  Vectorized pandas
    ``str.count``/``str.replace`` (compiled RE2-safe patterns); one
    map-only pass."""
    import ray.data

    path = pii_documents_path(sf_dir)

    def scrub(df: pd.DataFrame) -> pd.DataFrame:
        t = df["text"]
        clean = (t.str.replace(PII_EMAIL, "<EMAIL>", regex=True)
                  .str.replace(PII_IPV4, "<IP>", regex=True)
                  .str.replace(PII_PHONE, "<PHONE>", regex=True))
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "n_emails": t.str.count(PII_EMAIL).astype("int64"),
            "n_ips": t.str.count(PII_IPV4).astype("int64"),
            "n_phones": t.str.count(PII_PHONE).astype("int64"),
            "clean_md5": pd.Series(
                [hashlib.md5(s.encode()).hexdigest() for s in clean],
                dtype="string", index=df.index),
        })

    return ray.data.read_parquet(path).map_batches(
        scrub, batch_format="pandas")


# GPT-2-style pre-tokenizer, RE2-safe (the real one's \s+(?!\S) lookahead
# is dropped — RE2/DuckDB has no lookahead — so interior space runs fold
# into one whitespace token instead of splitting before the next word;
# ASCII classes because the oracle's RE2 \s is ASCII while Python's is
# unicode — identical on this corpus, documented for wider ones)
BPE_PAT = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"


def bpe_token_stats(sf_dir: str):
    """(doc_id, n_bpe_tokens, n_ws_tokens) — token counting with a
    BPE-ish pre-tokenizer regex next to the plain whitespace count (the
    prompt's token-counting pair; a corpus-size estimate in
    tokenizer-sized units without shipping a tokenizer).  One vectorized
    ``str.count`` per batch, map-only."""
    def stats(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "n_bpe_tokens": df["text"].str.count(BPE_PAT).astype("int64"),
            "n_ws_tokens": df["text"].str.count(r"\S+").astype("int64"),
        })

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        stats, batch_format="pandas")


KMV_K = 1024  # sketch size; relative error ≈ 1/sqrt(k) ≈ 3%


def distinct_tokens_kmv(sf_dir: str, k: int = KMV_K):
    """One-row (n_kept, kth_hash, est_distinct): corpus-wide distinct-
    token cardinality via the k-minimum-values sketch (Bar-Yossef et
    al. '02) — the 100 TB cardinality shape (an EXACT distinct is a
    full shuffle of the tokenized corpus; the sketch is a map-only pass
    plus a ≤ k·n_batches-row driver fold).  Deterministic: hashes are
    md5-lower-8 (DuckDB ``md5_number_lower``), so the oracle replays
    the sketch bit-for-bit — no RNG, no approximation ambiguity.

    Estimate: fewer than k distinct hashes seen → that count is EXACT;
    otherwise (k-1) · 2^64 // kth_smallest_hash (integer division on
    both sides), clamped to int64."""
    import ray.data

    def kmins(df: pd.DataFrame) -> pd.DataFrame:
        toks = np.unique(np.concatenate(
            [_TOKEN_RE.findall(t) for t in df["text"]] or [[]]))
        if toks.shape[0] == 0:
            return pd.DataFrame({"h": pd.Series([], dtype="uint64")})
        hs = np.unique(_tok_hash64_batch(list(toks)))
        if hs.shape[0] > k:
            hs = np.partition(hs, k)[:k]
        return pd.DataFrame({"h": pd.Series(hs, dtype="uint64")})

    folded = np.unique(collect_df(
        _read_docs(sf_dir, ["text"]).map_batches(
            kmins, batch_format="pandas"))["h"].to_numpy(np.uint64))
    if folded.shape[0] > k:
        folded = np.partition(folded, k)[:k]
    n_kept = int(folded.shape[0])
    kth = int(folded.max()) if n_kept else 0
    if n_kept < k:
        est = n_kept
    else:
        est = min((k - 1) * (1 << 64) // kth, (1 << 63) - 1)
    return ray.data.from_arrow(pa.table({
        "n_kept": pa.array([n_kept], pa.int64()),
        "kth_hash": pa.array([kth], pa.uint64()),
        "est_distinct": pa.array([est], pa.int64()),
    }))


# ---------------------------------------------------------------------------
# near-dup clusters: connected components over verified minhash pairs


DUP_CC_ITERS = 3


def dup_clusters(sf_dir: str, iters: int = DUP_CC_ITERS):
    """(doc_id, cluster): near-duplicate CLUSTERS — ``iters`` rounds of
    min-label propagation over the verified minhash near-dup pair graph
    (the grouping step a dedup job runs after pair verification: keep
    one representative per cluster, so transitive dups a~b~c collapse
    together instead of surviving as two independent pairs).

    OUTPUT CONTRACT: cluster = smallest doc_id reachable within
    ``iters`` hops — NOT necessarily a full connected-component
    partition: members of one component more than ``iters`` hops from
    its minimum get a different (still deterministic) label.  Real
    near-dup clusters are dense (diameter ~2: most members pair with
    the representative directly), so DUP_CC_ITERS=3 converges there;
    a pathological long chain does not (pinned by test).  The fixed
    iteration count keeps the op exactly oracle-replayable (the
    graph.link_components convention; at production scale you loop on
    a changed-label counter — same per-round shape).

    Scale shape: the pair set is the output of the fully-sharded
    minhash pipeline (verified dup pairs ≪ corpus); per round one
    both-direction edge map + a min fold: a DRIVER fold below
    graph.GRAPH_DRIVER_GATE pair rows (labels dict broadcast per round),
    the graph family's labels-as-Dataset co-partitioned join iteration
    above it (nothing node-sized on the driver — parity pinned by
    test).  The final labelling joins/probes the documents table
    against pair-PARTICIPATING nodes only (≪ corpus by construction in
    the small path; a hash join in the large path)."""
    import ray
    import ray.data

    from .graph import GRAPH_DRIVER_GATE, _fold_agg

    pairs = minhash_dedup(sf_dir, return_pairs=True).materialize()
    n_pairs = pairs.count()
    docs = _read_docs(sf_dir, ["doc_id"])

    def identity(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": df["doc_id"].astype("int64"),
                             "cluster": df["doc_id"].astype("int64")})

    if n_pairs == 0:
        return docs.map_batches(identity, batch_format="pandas")
    if n_pairs > GRAPH_DRIVER_GATE:
        return _dup_clusters_large(pairs, docs, n_pairs, iters)

    def nodes_fn(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "n": pd.concat([df["id_a"], df["id_b"]],
                           ignore_index=True).astype("int64"),
            "c": np.int64(1)})

    node_counts = _fold_agg(
        pairs.map_batches(nodes_fn, batch_format="pandas"),
        "n", "c", "sum", 2 * n_pairs)
    labels = {int(n): int(n) for n in node_counts}

    for _ in range(iters):
        ref = ray.put(labels)

        def prop(df: pd.DataFrame, _r=ref) -> pd.DataFrame:
            lb = ray.get(_r)
            return pd.DataFrame({
                "n": pd.concat([df["id_b"], df["id_a"]],
                               ignore_index=True).astype("int64"),
                "l": pd.concat([df["id_a"].map(lb), df["id_b"].map(lb)],
                               ignore_index=True).astype("int64"),
            })

        inflow = _fold_agg(
            pairs.map_batches(prop, batch_format="pandas"),
            "n", "l", "min", 2 * n_pairs)
        labels = {n: min(labels[n], int(inflow.get(n, labels[n])))
                  for n in labels}
        del ref  # single live broadcast copy across rounds

    lref = ray.put(labels)  # outlives the function: the lazy assign
    # dataset below captures it; earlier per-round refs are already free

    def assign(df: pd.DataFrame, _r=lref) -> pd.DataFrame:
        lb = ray.get(_r)
        ids = df["doc_id"].astype("int64")
        return pd.DataFrame({
            "doc_id": ids,
            "cluster": ids.map(lambda i, _l=lb: _l.get(int(i), int(i)))
            .astype("int64")})

    return docs.map_batches(assign, batch_format="pandas")


def _dup_clusters_large(pairs, docs, n_pairs: int, iters: int):
    """>GRAPH_DRIVER_GATE pair rows: labels stay a DATASET (the
    graph._components_large shape on int64 doc ids).  Per round one
    hash join of the undirected pair edges with the label table + one
    groupby-min; the final labelling is docs ⟕ labels with
    coalesce(label, doc_id).  No node-sized driver structure."""
    import pyarrow.compute as pc

    from ._util import ensure_schema, materialize_clean, rename
    from .graph import _num_partitions

    lab_schema = pa.schema([("n", pa.int64()), ("lab", pa.int64())])
    npart = _num_partitions(2 * n_pairs)
    ue = (rename(pairs, {"id_a": "a", "id_b": "b"})
          .select_columns(["a", "b"])
          .union(rename(pairs, {"id_b": "a", "id_a": "b"})
                 .select_columns(["a", "b"]))).materialize()

    nodes = ensure_schema(
        rename(ue.select_columns(["a"]), {"a": "n"})
        .groupby("n").count().select_columns(["n"]),
        pa.schema([("n", pa.int64())]))

    def init_fn(t: pa.Table) -> pa.Table:
        return pa.table({"n": t.column("n").cast(pa.int64()),
                         "lab": t.column("n").cast(pa.int64())})

    labels = materialize_clean(
        nodes.map_batches(init_fn, batch_format="pyarrow"), lab_schema)

    def msg_fn(t: pa.Table) -> pa.Table:
        return pa.table({"n": t.column("b").cast(pa.int64()),
                         "lab": t.column("lab").cast(pa.int64())})

    for _ in range(iters):
        msgs = (ue.join(labels, "inner", npart, on=("a",), right_on=("n",))
                .map_batches(msg_fn, batch_format="pyarrow"))
        # ensure_schema casts; materialize_clean drops the hash
        # aggregate/join's schema-less empty blocks, which would break
        # the next round's join (see _util.materialize_clean)
        labels = materialize_clean(
            ensure_schema(
                rename(labels.union(msgs).groupby("n").min("lab"),
                       {"min(lab)": "lab"}).select_columns(["n", "lab"]),
                lab_schema),
            lab_schema)

    def final_fn(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").cast(pa.int64())
        lab = pc.coalesce(t.column("lab").cast(pa.int64()), ids)
        return pa.table({"doc_id": ids, "cluster": lab})

    return (docs.join(labels, "left_outer", npart,
                      on=("doc_id",), right_on=("n",))
            .map_batches(final_fn, batch_format="pyarrow"))


def minhash_cte_prefix(mhparams_path: str) -> str:
    """The shared DuckDB CTE chain replaying shingles → signatures →
    bands → candidate pairs → integer-Jaccard stats (``j``): used by the
    doc_minhash_dedup oracle and extended by doc_dup_clusters."""
    return (
        "WITH t AS (SELECT doc_id, "
        "regexp_extract_all(lower(text), '\\S+') AS toks FROM documents), "
        "sh0 AS (SELECT doc_id, CASE WHEN len(toks) >= 3 THEN "
        "list_transform(range(1, len(toks) - 1), i -> "
        "toks[CAST(i AS INT)] || ' ' || toks[CAST(i AS INT) + 1] || ' ' "
        "|| toks[CAST(i AS INT) + 2]) "
        "WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')] "
        "ELSE [] END AS grams FROM t), "
        "sh AS (SELECT doc_id, list_distinct(list_transform(grams, "
        "g -> CAST(md5_number_lower(g) & 2147483647::UBIGINT AS BIGINT)"
        ")) AS xs FROM sh0), "
        f"params AS (SELECT * FROM read_parquet('{mhparams_path}')), "
        "mins AS (SELECT s.doc_id, p.i, "
        "MIN((p.a * u.x + p.b) % 2147483647) AS v "
        "FROM sh s, UNNEST(s.xs) AS u(x), params p "
        "GROUP BY s.doc_id, p.i), "
        "sigs AS (SELECT d.doc_id, p.i, "
        "COALESCE(m.v, 9223372036854775807) AS v "
        "FROM (SELECT doc_id FROM t) d CROSS JOIN params p "
        "LEFT JOIN mins m ON m.doc_id = d.doc_id AND m.i = p.i), "
        "bandv AS (SELECT doc_id, i // 4 AS band, "
        "string_agg(CAST(v AS VARCHAR), ',' ORDER BY i) AS bv "
        "FROM sigs GROUP BY doc_id, i // 4), "
        "cand AS (SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb "
        "FROM bandv a JOIN bandv b ON a.band = b.band AND a.bv = b.bv "
        "AND a.doc_id < b.doc_id), "
        "j AS (SELECT c.ida, c.idb, "
        "len(list_intersect(sa.xs, sb.xs)) AS inter, "
        "len(sa.xs) + len(sb.xs) - len(list_intersect(sa.xs, sb.xs)) "
        "AS un FROM cand c JOIN sh sa ON sa.doc_id = c.ida "
        "JOIN sh sb ON sb.doc_id = c.idb)"
    )


def dup_clusters_oracle_sql(mhparams_path: str,
                            iters: int = DUP_CC_ITERS) -> str:
    """DuckDB replay: verified pairs from the shared minhash CTEs, then
    the same ``iters`` min-label rounds over the undirected pair graph,
    non-participating docs joining back as singletons."""
    parts = [
        minhash_cte_prefix(mhparams_path), ", ",
        f"p AS (SELECT ida, idb FROM j WHERE un > 0 "
        f"AND inter * {THRESH_DEN} >= un * {THRESH_NUM}), ",
        "ue AS (SELECT ida AS a, idb AS b FROM p "
        "UNION SELECT idb, ida FROM p), ",
        "pn AS (SELECT DISTINCT a AS u FROM ue), ",
        "l0 AS (SELECT u, u AS lb FROM pn), ",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"l{i} AS (SELECT q.u, LEAST(q.lb, "
            "COALESCE(MIN(r.lb), q.lb)) AS lb "
            f"FROM l{i - 1} q LEFT JOIN ue ON ue.a = q.u "
            f"LEFT JOIN l{i - 1} r ON r.u = ue.b "
            "GROUP BY q.u, q.lb), ")
    body = "".join(parts)[:-2]
    return (body + " SELECT d.doc_id, "
            f"COALESCE(l{iters}.lb, d.doc_id)::BIGINT AS cluster "
            f"FROM documents d LEFT JOIN l{iters} ON l{iters}.u = d.doc_id")


# ---------------------------------------------------------------------------
# TF-IDF top terms per document (SQL-oracled)


TFIDF_SCALE = 1_000_000
TFIDF_TOPK = 3
# above this many distinct-vocabulary partial rows the broadcast-df path
# gives way to the join path (tf rows ⋈ df on token → per-doc top-k)
TFIDF_VOCAB_GATE = 2_000_000


def _doc_tf(df: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, token, tf) rows — lowercased whitespace tokens; a doc's
    rows are emitted contiguously within its batch."""
    rows_id: List[int] = []
    rows_tok: List[str] = []
    rows_tf: List[int] = []
    for doc_id, text in zip(df["doc_id"], df["text"]):
        toks = _TOKEN_RE.findall(text.lower())
        if not toks:
            continue
        uniq, cnt = np.unique(toks, return_counts=True)
        rows_id.extend([int(doc_id)] * uniq.shape[0])
        rows_tok.extend(uniq.tolist())
        rows_tf.extend(int(c) for c in cnt)
    return pd.DataFrame({"doc_id": pd.Series(rows_id, dtype="int64"),
                         "token": pd.Series(rows_tok, dtype="object"),
                         "tf": pd.Series(rows_tf, dtype="int64")})


def _tfidf_rank(df: pd.DataFrame, k: int) -> pd.DataFrame:
    """Top-k rows of one document's (doc_id, token, score) frame,
    ranked by (score desc, token asc) — the shared in-group kernel of
    both tfidf paths."""
    df = df.sort_values(["score", "token"],
                        ascending=[False, True]).head(k)
    out = df.reset_index(drop=True)
    return pd.DataFrame({
        "doc_id": out["doc_id"].astype("int64"),
        "term": out["token"].astype("object"),
        "score": out["score"].astype("int64"),
        "rank": pd.Series(np.arange(1, len(out) + 1), dtype="int64"),
    })


def tfidf_top_terms(sf_dir: str, k: int = TFIDF_TOPK,
                    vocab_gate: int = TFIDF_VOCAB_GATE):
    """(doc_id, term, score, rank): each document's top-k terms by an
    INTEGER tf-idf — score = tf · ((SCALE·N) // df), ties broken by
    term; exact on both sides, so DuckDB replays it bit-for-bit (a
    float idf = ln(N/df) would differ in the last ulp between numpy
    and DuckDB).

    Broadcast path (vocab ≤ ``vocab_gate`` partial rows): pass 1 folds
    per-batch (token, n_docs) partials into the document-frequency map
    (each doc contributes once per distinct token); pass 2 re-tokenizes
    each doc and emits its top-k in-batch against the broadcast idf map
    — a doc's rows never cross a batch boundary, so per-doc ranking
    needs no shuffle.  Join path (web-scale vocab, where the df map is
    NOT broadcastable): tf rows ⋈ df on token (hash join), then
    groupby(doc_id) top-k — two honest shuffles."""
    import pyarrow.parquet as _pq

    import ray
    import ray.data

    n_docs = _pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    docs = _read_docs(sf_dir, ["doc_id", "text"])
    if n_docs == 0:
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "term": pa.array([], pa.string()),
            "score": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64())}))

    def df_partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = np.concatenate(
            [np.unique(_TOKEN_RE.findall(t.lower())) for t in df["text"]]
            or [np.array([], dtype=object)])
        if toks.shape[0] == 0:
            return pd.DataFrame({"token": pd.Series([], dtype="object"),
                                 "nd": pd.Series([], dtype="int64")})
        uniq, cnt = np.unique(toks, return_counts=True)
        return pd.DataFrame({"token": uniq,
                             "nd": cnt.astype("int64")})

    partials = docs.map_batches(df_partial,
                                batch_format="pandas").materialize()
    if partials.count() <= vocab_gate:
        parts = collect_df(partials)
        dfmap = parts.groupby("token")["nd"].sum()
        idf = {t: (TFIDF_SCALE * n_docs) // int(d)
               for t, d in dfmap.items()}
        ref = ray.put(idf)

        def topk_bc(df: pd.DataFrame, _r=ref) -> pd.DataFrame:
            iv = ray.get(_r)
            tf = _doc_tf(df)
            if tf.empty:
                return _tfidf_rank(tf.assign(score=pd.Series(
                    [], dtype="int64")), k)
            tf["score"] = (tf["tf"]
                           * tf["token"].map(iv).astype("int64"))
            return pd.concat(
                [_tfidf_rank(g, k)
                 for _i, g in tf.groupby("doc_id", sort=True)],
                ignore_index=True)

        return docs.map_batches(topk_bc, batch_format="pandas")

    # join path: vocab-scale df — tf rows ⋈ df(token), per-doc top-k
    tf_rows = docs.map_batches(_doc_tf,
                               batch_format="pandas").materialize()
    dfr = _rename(tf_rows.select_columns(["token"])
                  .groupby("token").count(), {"count()": "nd"})
    joined = tf_rows.join(dfr, join_type="inner", num_partitions=8,
                          on=("token",))

    def score_fn(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "token": df["token"],
            "score": (df["tf"].astype("int64")
                      * ((TFIDF_SCALE * n_docs)
                         // df["nd"].astype("int64"))).astype("int64")})

    scored = joined.map_batches(score_fn, batch_format="pandas")
    return scored.groupby("doc_id").map_groups(
        lambda g: _tfidf_rank(g, k), batch_format="pandas")


# ---------------------------------------------------------------------------
# exact substring overlap (winnowing-selected shared windows)


SS_K = 48  # overlap window: 48 identical normalized chars (a verbatim
# span, Lee et al.-scale) — deliberately much longer than FP_K's
# 8-char plagiarism-grain fingerprints
SS_W = 16  # winnowing window for the overlap pass (density 2/(w+1))
SS_MIN_SHARED = 2     # shared selected windows to report a pair
SS_BUCKET_CAP = 1000  # degenerate-fingerprint guard (boilerplate windows)
SS_PAIR_GATE = 500_000  # hot-member rows beyond which pairgen distributes


def fingerprints_cte_prefix(k: int = FP_K, w: int = FP_W) -> str:
    """Shared DuckDB CTE chain replaying the winnowing selection
    (normalize → k-gram md5-hex → window-min, rightmost tie) ending in
    ``sel(doc_id, wend, wmin, pos)`` — used by the doc_fingerprints
    oracle (FP_K/FP_W) and by doc_substring_overlap (SS_K/SS_W)."""
    return (
        "WITH t AS (SELECT doc_id, "
        "regexp_replace(lower(text), '\\s+', ' ', 'g') AS s "
        "FROM documents), "
        f"b AS (SELECT doc_id, s, CASE WHEN length(s) >= {k} "
        f"THEN length(s) - {k - 1} "
        "WHEN length(s) > 0 THEN 1 ELSE 0 END AS m FROM t), "
        "g AS (SELECT doc_id, CAST(i AS INT) AS pos, m, "
        f"substring(md5(CASE WHEN length(s) >= {k} THEN "
        f"substring(s, CAST(i AS INT), {k}) ELSE s END), "
        "17, 16) AS h "
        "FROM b, UNNEST(range(1, m + 1)) AS u(i)), "
        "we AS (SELECT doc_id, pos AS wend, m, min(h) OVER "
        "(PARTITION BY doc_id ORDER BY pos ROWS BETWEEN "
        f"{w - 1} PRECEDING AND CURRENT ROW) AS wmin FROM g), "
        f"q AS (SELECT * FROM we WHERE wend >= {w} "
        "OR wend = m), "
        "sel AS (SELECT q.doc_id, q.wend, q.wmin, max(g.pos) AS pos "
        "FROM q JOIN g ON g.doc_id = q.doc_id AND g.pos BETWEEN "
        f"q.wend - {w - 1} AND q.wend AND g.h = q.wmin "
        "GROUP BY q.doc_id, q.wend, q.wmin)"
    )


def substring_overlap_oracle_sql(min_shared: int = SS_MIN_SHARED,
                                 cap: int = SS_BUCKET_CAP) -> str:
    return (
        fingerprints_cte_prefix(SS_K, SS_W) + ", "
        "fps AS (SELECT DISTINCT doc_id, wmin AS fp FROM sel), "
        "hot AS (SELECT fp FROM fps GROUP BY fp "
        f"HAVING count(*) BETWEEN 2 AND {cap}), "
        "pp AS (SELECT a.doc_id AS ida, b.doc_id AS idb, "
        "count(*)::BIGINT AS nw "
        "FROM fps a JOIN hot h ON h.fp = a.fp "
        "JOIN fps b ON b.fp = a.fp AND a.doc_id < b.doc_id "
        "GROUP BY a.doc_id, b.doc_id) "
        "SELECT ida AS id_a, idb AS id_b, nw AS n_windows FROM pp "
        f"WHERE nw >= {min_shared}"
    )


def substring_overlap(sf_dir: str, min_shared: int = SS_MIN_SHARED,
                      cap: int = SS_BUCKET_CAP,
                      pair_gate: int = SS_PAIR_GATE):
    """(id_a, id_b, n_windows): document pairs sharing ≥ ``min_shared``
    distinct winnowing-selected exact text windows — the EXACT-substring
    overlap detector (Lee et al. '22 "Deduplicating Training Data"
    family: near-dup catches reworded copies, this catches verbatim
    shared passages — boilerplate, quotations, templated spans — that
    token-level Jaccard dilutes away on long documents).  A shared
    selected window means an identical SS_K-char (48) normalized
    substring (md5-64bit fingerprint equality; collision odds ~2^-64,
    and the winnowing guarantee makes any shared run of ≥ SS_W+SS_K-1 =
    63 chars produce at least one shared SELECTED window on both
    sides).
    Fingerprints appearing in more than ``cap`` documents are skipped as
    corpus boilerplate (replicated in the oracle's HAVING).

    Scale shape: the fingerprint table is the sharded primitive
    (map-only, ~2/(w+1) density); hot-fingerprint detection is
    aggregate-then-probe (``hot_keys``); pair generation folds on the
    driver below ``pair_gate`` hot-member rows and runs as
    groupby(fp).map_groups + a (id_a, id_b) groupby-count above it —
    the minhash large-path shape."""
    import ray
    import ray.data

    def fp_batch(df: pd.DataFrame) -> pd.DataFrame:
        # winnow at the SS_K/SS_W overlap grain; a doc's rows never
        # split across batches → in-batch distinct (doc_id, fp) is
        # globally exact
        ids, fps_ = [], []
        for doc_id, t in zip(df["doc_id"], df["text"]):
            for h in {h for _p, h in winnow(t, SS_K, SS_W)}:
                ids.append(int(doc_id))
                fps_.append(h)
        return pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                             "fp": pd.Series(fps_, dtype="string")})

    dfp = _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        fp_batch, batch_format="pandas").materialize()
    hot = hot_keys(dfp, ["fp"], min_count=2, max_count=cap)
    empty = ray.data.from_arrow(pa.table({
        "id_a": pa.array([], pa.int64()),
        "id_b": pa.array([], pa.int64()),
        "n_windows": pa.array([], pa.int64())}))
    if not hot:
        return empty
    hot_arr = pa.array(sorted(hot), pa.string())
    members = dfp.map_batches(
        lambda t: t.filter(pc.is_in(t.column("fp"), value_set=hot_arr)),
        batch_format="pyarrow").materialize()

    def pairgen(df: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(df["doc_id"].to_numpy())
        iu, ju = np.triu_indices(ids.shape[0], k=1)
        return pd.DataFrame({"id_a": ids[iu].astype(np.int64),
                             "id_b": ids[ju].astype(np.int64)})

    if members.count() <= pair_gate:
        mdf = collect_df(members)
        from collections import Counter

        cnt: Counter = Counter()
        for _fp, g in mdf.groupby("fp"):
            ids = np.sort(g["doc_id"].to_numpy())
            iu, ju = np.triu_indices(ids.shape[0], k=1)
            cnt.update(zip(ids[iu].tolist(), ids[ju].tolist()))
        rows = sorted((a, b, n) for (a, b), n in cnt.items()
                      if n >= min_shared)
        return ray.data.from_arrow(pa.table({
            "id_a": pa.array([r[0] for r in rows], pa.int64()),
            "id_b": pa.array([r[1] for r in rows], pa.int64()),
            "n_windows": pa.array([r[2] for r in rows], pa.int64())}))

    counted = _rename(
        members.groupby("fp").map_groups(pairgen, batch_format="pandas")
        .groupby(["id_a", "id_b"]).count(), {"count()": "n_windows"})
    return counted.filter(
        lambda r, m=min_shared: r["n_windows"] >= m)


# ---------------------------------------------------------------------------
# inverted index build (SQL-oracled)


def postings(sf_dir: str, direct_gate: int = 200_000):
    """(token, df, postings_md5): the inverted-index build — every
    document contributes its distinct lowercased tokens, and each
    token's posting list (ascending doc_ids) is folded to its length
    and an md5 of the comma-joined ids (the gate-friendly digest of a
    list column; the list itself would be the real sink payload).

    Scale shape: THE canonical index-build shuffle — (token, doc_id)
    rows (in-batch distinct) → groupby(token).map_groups building each
    posting list where it lands; nothing token-keyed ever folds through
    the driver above the gate.  Below ``direct_gate`` documents the
    task-partial + driver-fold path runs instead (same digest)."""
    import ray
    import ray.data

    def pairs_batch(df: pd.DataFrame) -> pd.DataFrame:
        ids, toks = [], []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            for t in np.unique(_TOKEN_RE.findall(text.lower())):
                ids.append(int(doc_id))
                toks.append(t)
        return pd.DataFrame({"token": pd.Series(toks, dtype="object"),
                             "doc_id": pd.Series(ids, dtype="int64")})

    def digest(ids) -> str:
        s = ",".join(str(i) for i in sorted(int(x) for x in ids))
        return hashlib.md5(s.encode()).hexdigest()

    direct = _docs_direct_ranges(sf_dir, direct_gate)
    if direct is not None:
        path, ranges = direct

        @ray.remote(num_cpus=1)
        def pairs_task(off: int, cnt: int) -> pd.DataFrame:
            import pyarrow.parquet as _pq

            t = _pq.read_table(path, columns=["doc_id", "text"]) \
                .slice(off, cnt)
            return pairs_batch(t.to_pandas())

        parts = ray.get([pairs_task.remote(o, c) for o, c in ranges])
        allp = pd.concat(parts, ignore_index=True) if parts else \
            pd.DataFrame({"token": [], "doc_id": []})
        if allp.empty:
            return ray.data.from_arrow(pa.table({
                "token": pa.array([], pa.string()),
                "df": pa.array([], pa.int64()),
                "postings_md5": pa.array([], pa.string())}))
        rows = [(t, len(g), digest(g))
                for t, g in allp.groupby("token")["doc_id"]]
        rows.sort()
        return ray.data.from_arrow(pa.table({
            "token": pa.array([r[0] for r in rows], pa.string()),
            "df": pa.array([r[1] for r in rows], pa.int64()),
            "postings_md5": pa.array([r[2] for r in rows], pa.string())}))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "token": [g["token"].iloc[0]],
            "df": pd.Series([len(g)], dtype="int64"),
            "postings_md5": [digest(g["doc_id"])]})

    return _read_docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(pairs_batch, batch_format="pandas") \
        .groupby("token").map_groups(fold, batch_format="pandas")


# ---------------------------------------------------------------------------
# exact distributed quantiles + global total-order rank (SQL-oracled)

QUANTILE_PERMILLE = (10, 50, 250, 500, 750, 950, 990)


def _length_hist(sf_dir: str, hist_gate: int):
    """Merged (n_chars, c) histogram of document lengths, ascending.

    Per-batch ``value_counts`` partials collapse each block to at most
    distinct-lengths-in-block rows — the only thing that leaves a task;
    above ``hist_gate`` partial rows the merge runs as a distributed
    groupby-sum first, below it the driver folds directly (same
    integers either way)."""
    def partial(t: pa.Table) -> pa.Table:
        vc = pc.value_counts(pc.utf8_length(t.column("text")))
        return pa.table({"n_chars": vc.field("values").cast(pa.int64()),
                         "c": vc.field("counts").cast(pa.int64())})

    parts = _read_docs(sf_dir, ["text"]).map_batches(
        partial, batch_format="pyarrow").materialize()
    if parts.count() > hist_gate:
        hist = collect_df(parts.groupby("n_chars").sum("c")) \
            .rename(columns={"sum(c)": "c"})
    else:
        hist = collect_df(parts).groupby(
            "n_chars", as_index=False)["c"].sum()
    return hist.sort_values("n_chars").reset_index(drop=True)


def length_quantiles(sf_dir: str, permille=QUANTILE_PERMILLE,
                     hist_gate: int = 2_000_000):
    """(q_permille, n_chars): exact corpus quantiles of document length
    — for each q the smallest n_chars whose cumulative count x 1000 >=
    q_permille x total (percentile_disc semantics, decided in integers;
    the oracle replays the same rule with window cumsums).

    Scale shape: the classic two-level histogram quantile — no sort of
    the data, no shuffle of text; the merged histogram is bounded by
    the distinct-length domain (<= max doc length), so the final fold
    is tiny at any corpus size.  Exact (not a sample sketch) while the
    value domain stays bounded; an unbounded real-valued domain would
    swap in a t-digest and lose exactness."""
    import ray.data

    hist = _length_hist(sf_dir, hist_gate)
    total = int(hist["c"].sum())
    if total == 0:
        return ray.data.from_arrow(pa.table({
            "q_permille": pa.array([], pa.int64()),
            "n_chars": pa.array([], pa.int64())}))
    cum1000 = hist["c"].cumsum().to_numpy(dtype=np.int64) * 1000
    vals = hist["n_chars"].to_numpy(dtype=np.int64)
    idx = np.searchsorted(cum1000, np.asarray(permille, dtype=np.int64)
                          * total, side="left")
    return ray.data.from_arrow(pa.table({
        "q_permille": pa.array([int(q) for q in permille], pa.int64()),
        "n_chars": pa.array(vals[idx], pa.int64())}))


def global_rank(sf_dir: str, hist_gate: int = 2_000_000):
    """(doc_id, rank): the corpus in total order — rank 1..N by
    (n_chars, doc_id), the row_number() Ray Data does not ship.

    Distributed construction (no global sort): (1) the length histogram
    (shared with ``length_quantiles``) gives every distinct n_chars its
    exclusive cumulative offset, broadcast once via ``ray.put``; (2)
    (doc_id, n_chars) rows — never text — shuffle ONCE keyed by n_chars
    and each group sorts locally by doc_id, so local position + offset
    is the global rank.  Skew note: a degenerate corpus where most docs
    share one length makes that group hot; production would salt the
    key and add a second offset level — documented trade, the length
    domain of real web text is dispersed."""
    import ray
    import ray.data

    def keyed(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t.column("doc_id").cast(pa.int64()),
            "n_chars": pc.utf8_length(t.column("text")).cast(pa.int64())})

    pre = _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        keyed, batch_format="pyarrow").materialize()

    def partial(t: pa.Table) -> pa.Table:
        vc = pc.value_counts(t.column("n_chars"))
        return pa.table({"n_chars": vc.field("values").cast(pa.int64()),
                         "c": vc.field("counts").cast(pa.int64())})

    parts = pre.map_batches(partial, batch_format="pyarrow").materialize()
    if parts.count() > hist_gate:
        hist = collect_df(parts.groupby("n_chars").sum("c")) \
            .rename(columns={"sum(c)": "c"})
    else:
        hist = collect_df(parts).groupby(
            "n_chars", as_index=False)["c"].sum()
    hist = hist.sort_values("n_chars").reset_index(drop=True)
    cum = hist["c"].cumsum().to_numpy(dtype=np.int64)
    offsets = {int(v): int(o) for v, o in
               zip(hist["n_chars"], np.concatenate(([0], cum[:-1])))}
    oref = ray.put(offsets)

    def rank_group(g: pd.DataFrame) -> pd.DataFrame:
        base = ray.get(oref)[int(g["n_chars"].iloc[0])]
        ids = np.sort(g["doc_id"].to_numpy(dtype=np.int64))
        return pd.DataFrame({
            "doc_id": ids,
            "rank": np.arange(base + 1, base + 1 + len(ids),
                              dtype=np.int64)})

    return pre.groupby("n_chars").map_groups(
        rank_group, batch_format="pandas")


SHARD_BYTES = 64_000


def pack_shards(sf_dir: str, shard_bytes: int = SHARD_BYTES,
                hist_gate: int = 2_000_000):
    """(doc_id, offset_bytes, shard_id): deterministic training-shard
    packing — docs in (n_bytes, doc_id) total order, each assigned its
    exclusive global byte offset and the fixed-size output shard that
    offset falls in (offset // shard_bytes).  The assignment a 100 TB
    tokenize-and-pack job needs: stable under reruns, resumable per
    shard, no coordinator.

    Lengths are ENCODED UTF-8 BYTES (``pc.binary_length``; the oracle's
    ``strlen``), not unicode chars — offsets are real file offsets on
    any corpus, ASCII or not.

    Distributed construction (no global sort, same histogram machinery
    as ``global_rank``): the length histogram gives every distinct
    n_bytes its exclusive cumulative byte offset (lengths below it x
    their counts); within a group all docs share one length, so a doc's
    global offset is group_offset + local_index * n_bytes after the
    group's local doc_id sort.  Only (doc_id, n_bytes) rows shuffle,
    keyed by n_bytes."""
    import ray
    import ray.data

    def keyed(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t.column("doc_id").cast(pa.int64()),
            "n_bytes": pc.binary_length(t.column("text")).cast(pa.int64())})

    pre = _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        keyed, batch_format="pyarrow").materialize()

    def partial(t: pa.Table) -> pa.Table:
        vc = pc.value_counts(t.column("n_bytes"))
        return pa.table({"n_bytes": vc.field("values").cast(pa.int64()),
                         "c": vc.field("counts").cast(pa.int64())})

    parts = pre.map_batches(partial, batch_format="pyarrow").materialize()
    if parts.count() > hist_gate:
        hist = collect_df(parts.groupby("n_bytes").sum("c")) \
            .rename(columns={"sum(c)": "c"})
    else:
        hist = collect_df(parts).groupby(
            "n_bytes", as_index=False)["c"].sum()
    hist = hist.sort_values("n_bytes").reset_index(drop=True)
    nbytes = (hist["n_bytes"] * hist["c"]).to_numpy(dtype=np.int64)
    cumb = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
    byte_off = {int(v): int(o) for v, o in zip(hist["n_bytes"], cumb)}
    oref = ray.put(byte_off)

    def pack_group(g: pd.DataFrame) -> pd.DataFrame:
        ln = int(g["n_bytes"].iloc[0])
        base = ray.get(oref)[ln]
        ids = np.sort(g["doc_id"].to_numpy(dtype=np.int64))
        offs = base + np.arange(len(ids), dtype=np.int64) * ln
        return pd.DataFrame({"doc_id": ids, "offset_bytes": offs,
                             "shard_id": offs // shard_bytes})

    return pre.groupby("n_bytes").map_groups(
        pack_group, batch_format="pandas")


# ---------------------------------------------------------------------------
# corpus n-gram LM coverage (SQL-oracled)

LM_MIN_COUNT = 3  # a bigram is "in the model" iff corpus count >= this


_BIGRAM_HASH_CACHE: Dict[str, int] = {}


def _bigram_keys(text: str) -> np.ndarray:
    """POSITIONAL word-bigram keys (md5-31-bit, the shingle key family)
    — unlike ``shingle_hashes`` this keeps duplicates: coverage counts
    positions, not types.  Short-doc rule matches the shingle family
    (one whole-text gram below w tokens).  Bigram hashes are memoized
    per worker process (the ``_tok_hash64_batch`` pattern: web-text
    bigrams are Zipfian, so the cache absorbs most of the md5 cost —
    lm_coverage hashes every doc twice, model pass + score pass)."""
    toks = _TOKEN_RE.findall(text.lower())
    if len(toks) < 2:
        grams = [" ".join(toks)] if toks else []
    else:
        grams = [f"{toks[i]} {toks[i + 1]}" for i in range(len(toks) - 1)]
    if not grams:
        return np.array([], dtype=np.int64)
    c = _BIGRAM_HASH_CACHE
    out = np.empty(len(grams), dtype=np.int64)
    for i, g in enumerate(grams):
        h = c.get(g)
        if h is None:
            h = int.from_bytes(hashlib.md5(g.encode()).digest()[8:],
                               "little") & 0x7FFFFFFF
            if len(c) < 4_000_000:
                c[g] = h
        out[i] = h
    return out


LM_TOP_V = 2_000_000  # model vocabulary cap (most-frequent bigrams)


def lm_coverage(sf_dir: str, min_count: int = LM_MIN_COUNT,
                top_v: int = LM_TOP_V,
                driver_limit: int = 2_000_000):
    """(doc_id, n_bigrams, n_known, coverage_permille): score every
    document against a bigram model TRAINED ON THE CORPUS ITSELF — the
    integer-exact stand-in for LM-perplexity quality filtering (CCNet /
    Gopher style): a document whose word-bigrams are mostly corpus-rare
    (coverage low) is boilerplate, gibberish or OCR noise.

    Two passes.  Pass 1 (model build) is the one shuffle: per-batch
    positional-bigram count partials — (key, c) rows, never text —
    merged by a size-gated fold (driver below ``driver_limit`` partial
    rows, distributed groupby-sum above); keys with total count >=
    ``min_count`` form the model, capped at the ``top_v`` MOST FREQUENT
    bigrams (ties broken by key ascending — deterministic, replicated
    in the oracle), so the broadcast model is bounded regardless of
    corpus size.  Pass 2 is map-only: the model ships once via
    ``ray.put`` as a sorted int64 array and every batch probes it with
    vectorized ``np.isin``.  Keys are the md5-31-bit shingle family
    shared with the minhash/decontaminate oracles, so the DuckDB
    replay is exact (hash collisions conflate bigrams identically on
    both sides)."""
    import ray

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        allx = [_bigram_keys(t) for t in df["text"]]
        xs = np.concatenate(allx) if allx else np.array([], dtype=np.int64)
        if xs.shape[0] == 0:
            return pd.DataFrame({"x": pd.Series([], dtype="int64"),
                                 "c": pd.Series([], dtype="int64")})
        uniq, cnt = np.unique(xs, return_counts=True)
        return pd.DataFrame({"x": uniq.astype("int64"),
                             "c": cnt.astype("int64")})

    parts = _read_docs(sf_dir, ["text"]).map_batches(
        partial, batch_format="pandas").materialize()
    if parts.count() > driver_limit:
        agg = collect_df(parts.groupby("x").sum("c")) \
            .rename(columns={"sum(c)": "c"})
    else:
        agg = collect_df(parts).groupby("x", as_index=False)["c"].sum()
    agg = agg.loc[agg["c"] >= min_count]
    if len(agg) > top_v:
        agg = agg.sort_values(["c", "x"],
                              ascending=[False, True]).head(top_v)
    model = np.sort(agg["x"].to_numpy(np.int64))
    mref = ray.put(model)

    def score(df: pd.DataFrame, _r=mref) -> pd.DataFrame:
        m = ray.get(_r)
        nb = np.zeros(len(df), dtype=np.int64)
        nk = np.zeros(len(df), dtype=np.int64)
        for i, t in enumerate(df["text"]):
            xs = _bigram_keys(t)
            nb[i] = xs.shape[0]
            if xs.shape[0] and m.shape[0]:
                nk[i] = int(np.isin(xs, m).sum())
        cov = np.where(nb > 0, (nk * 1000) // np.maximum(nb, 1), 0)
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "n_bigrams": nb, "n_known": nk,
            "coverage_permille": cov.astype(np.int64)})

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        score, batch_format="pandas")


LM_BUCKET_Q = (333, 667)  # tercile thresholds, permille


def lm_buckets(sf_dir: str, hist_gate: int = 2_000_000):
    """(doc_id, coverage_permille, bucket): the CCNet head/middle/tail
    corpus split — every document assigned to a quality tercile by its
    ``lm_coverage`` score (CCNet trains downstream on the "head" third;
    Wenzek et al. '20 §4.3).  Bucket boundaries are VALUE thresholds,
    not rank thirds: t_q = the LARGEST score v such that at least q
    permille of the corpus scores >= v (percentile_disc on the
    DESCENDING score order, q in ``LM_BUCKET_Q``); head = score >=
    t_333, middle = score >= t_667, else tail.  Equal scores always
    land in the same bucket, a tie group straddling a boundary lands
    whole in the BETTER bucket, and a saturated distribution (every
    doc at the max score) collapses to head — everything really is
    top-tercile — not tail.  Deterministic + oracle-replayable; tied
    scores make the thirds approximate (the corpus-correct behavior
    for a value rule).

    Scale shape: coverage scores come from the already-scale-shaped
    ``lm_coverage`` (one bounded shuffle + map-only probe); the tercile
    thresholds need only a histogram of the PERMILLE DOMAIN (<= 1001
    distinct values — per-batch ``value_counts`` partials, size-gated
    merge like ``global_rank``), two ints broadcast by closure; the
    assignment pass is map-only."""
    import ray.data

    scored = lm_coverage(sf_dir).materialize()

    def partial(t: pa.Table) -> pa.Table:
        vc = pc.value_counts(t.column("coverage_permille"))
        return pa.table({"v": vc.field("values").cast(pa.int64()),
                         "c": vc.field("counts").cast(pa.int64())})

    parts = scored.map_batches(partial, batch_format="pyarrow") \
        .materialize()
    if parts.count() > hist_gate:
        hist = collect_df(parts.groupby("v").sum("c")) \
            .rename(columns={"sum(c)": "c"})
    else:
        hist = collect_df(parts).groupby("v", as_index=False)["c"].sum()
    hist = hist.sort_values("v").reset_index(drop=True)
    total = int(hist["c"].sum())
    if total == 0:
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "coverage_permille": pa.array([], pa.int64()),
            "bucket": pa.array([], pa.string())}))
    # descending-percentile thresholds: walk values high→low, take the
    # first (largest) v where the from-the-top cumulative count reaches
    # q permille of the corpus
    vals_desc = hist["v"].to_numpy(dtype=np.int64)[::-1]
    rcum1000 = hist["c"].to_numpy(dtype=np.int64)[::-1].cumsum() * 1000
    idx = np.searchsorted(rcum1000, np.asarray(LM_BUCKET_Q, np.int64)
                          * total, side="left")
    t_head, t_mid = int(vals_desc[idx[0]]), int(vals_desc[idx[1]])

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        cov = df["coverage_permille"].to_numpy(np.int64)
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "coverage_permille": cov,
            "bucket": np.where(cov >= t_head, "head",
                               np.where(cov >= t_mid, "middle", "tail"))})

    return scored.map_batches(assign, batch_format="pandas")


# ---------------------------------------------------------------------------
# C4/RefinedWeb-style line-level exact dedup, reported per document.
#
# The classic web-corpus cleaning pass (C4, Raffel et al. 2020 §2.2;
# RefinedWeb, Penedo et al. 2023 §3.4) removes every repeated LINE
# across the whole corpus, keeping only its first occurrence in
# (doc_id, line-position) order.  This operator reports the per-document
# outcome of that pass: how many candidate lines the document has and
# how many of them the dedup would drop.  No reference counterpart —
# libmetha has no corpus analytics; this extends the dedup family
# (SURVEY §2.8) down to line granularity.

LINE_STRIP = " \t\r"
# composite order key (doc_id << 32 | 1-based line index): total order by
# (doc_id, idx) as ONE int64 so the keeper per line-hash is a plain
# min() aggregate.  Assumes doc_id < 2^31 and < 2^32 lines per doc
# (true of the synthetic corpus by construction); at production scale
# swap in a two-column min or a 128-bit decimal key.
_LD_SHIFT = np.int64(32)


def line_dedup(sf_dir: str):
    """Per-doc line-level exact-dedup stats: ``doc_id``, ``n_lines``
    (lines whose ``strip(' \\t\\r')`` is non-empty), ``n_dup`` (candidate
    lines that are NOT the corpus-wide first occurrence of their text).

    Scale shape: one map pass explodes docs into (md5(line), doc_id)
    pre-aggregates (in-batch repeats collapse), ONE corpus-wide shuffle
    on the 32-hex-char line hash finds each hash's keeper, and the
    per-doc combine is a thin union + doc_id groupby — no join, nothing
    corpus-sized on the driver.  The materialize() pins only the thin
    pre-aggregate, i.e. exactly the shuffle input the groupby would
    buffer anyway."""
    import ray.data  # noqa: F401  (Dataset ops on the _read_docs result)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "k": pd.Series([], dtype=object),
            "doc_id": pd.Series([], dtype="int64"),
            "mo": pd.Series([], dtype="int64"),
            "cnt": pd.Series([], dtype="int64")})
        if not len(df):
            return empty
        parts = df["text"].str.split("\n")
        n = parts.str.len().to_numpy(np.int64)
        doc = np.repeat(df["doc_id"].to_numpy(np.int64), n)
        total = int(n.sum())
        # 1-based position of each line within its doc, fully vectorized
        idx = np.arange(total, dtype=np.int64) \
            - np.repeat(np.cumsum(n) - n, n) + 1
        lines = pd.Series(parts.explode().to_numpy(), dtype=object) \
            .str.strip(LINE_STRIP)
        mask = (lines != "").to_numpy()
        if not mask.any():
            return empty
        stripped = lines.to_numpy()[mask]
        keys = [hashlib.md5(t.encode()).hexdigest() for t in stripped]
        order = (doc[mask] << _LD_SHIFT) | idx[mask]
        g = pd.DataFrame({"k": keys, "doc_id": doc[mask], "mo": order}) \
            .groupby(["k", "doc_id"], as_index=False, sort=False) \
            .agg(mo=("mo", "min"), cnt=("mo", "size"))
        g["cnt"] = g["cnt"].astype("int64")
        return g

    pre = _read_docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(explode, batch_format="pandas").materialize()

    def kept_rows(df: pd.DataFrame) -> pd.DataFrame:
        mo = df["min(mo)"].to_numpy(np.int64)
        return pd.DataFrame({
            "doc_id": mo >> _LD_SHIFT,
            "n_lines": np.zeros(len(mo), np.int64),
            "n_kept": np.ones(len(mo), np.int64)})

    keeper = pre.groupby("k").min("mo") \
        .map_batches(kept_rows, batch_format="pandas")

    def tot_rows(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("doc_id", as_index=False).agg(
            n_lines=("cnt", "sum"))
        return pd.DataFrame({
            "doc_id": g["doc_id"].astype("int64"),
            "n_lines": g["n_lines"].astype("int64"),
            "n_kept": np.zeros(len(g), np.int64)})

    totals = pre.map_batches(tot_rows, batch_format="pandas")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        nl = df["sum(n_lines)"].astype("int64")
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "n_lines": nl,
            "n_dup": (nl - df["sum(n_kept)"]).astype("int64")})

    return totals.union(keeper).groupby("doc_id") \
        .sum(["n_lines", "n_kept"]) \
        .map_batches(finish, batch_format="pandas").sort("doc_id")


# ---------------------------------------------------------------------------
# Gopher quality rules (Rae et al. 2021, appendix A) — the published
# web-corpus document filter, reported as per-doc integer flags so the
# verdict is exactly replayable in SQL.  Thresholds are compared in
# INTEGERS (e.g. 10*(n_hash+n_ell) <= n_words for "symbol ratio <=
# 0.1") so Ray and DuckDB decide identically.  No reference
# counterpart — extends the quality family (doc_quality) with the
# line- and word-shape rules.

GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_MIN_WORDS, GOPHER_MAX_WORDS = 50, 100_000


def gopher_rules(sf_dir: str):
    """Per-doc Gopher rule flags: word count in [50, 100k]; mean word
    length in [3, 10]; '#'/'...' symbol-to-word ratio <= 0.1; <= 90 %
    of lines bullet-started; <= 30 % of lines ellipsis-ended; >= 80 %
    of words contain an ASCII letter; >= 2 distinct Gopher stopwords.
    Map-only (one vectorized regex pass per batch), no shuffle."""
    stop_pats = [rf"(?<!\S){re.escape(w)}(?!\S)" for w in GOPHER_STOPWORDS]

    def rules(df: pd.DataFrame) -> pd.DataFrame:
        t = df["text"]
        n_words = t.str.count(r"\S+").astype("int64")
        nw_chars = t.str.count(r"\S").astype("int64")
        n_lines = (t.str.count(r"\n") + 1).astype("int64")
        n_hash = t.str.count(r"#").astype("int64")
        n_ell = t.str.count(r"\.\.\.").astype("int64")
        n_bullet = t.str.count(r"(?m)^[ \t]*[-*•]").astype("int64")
        n_ell_ln = t.str.count(r"(?m)(?:\.\.\.|…)[ \t\r]*$") \
            .astype("int64")
        # words WITHOUT any ASCII letter, subtracted from the total —
        # one anchored pattern instead of a per-word python loop
        n_alpha = (n_words
                   - t.str.count(r"(?<!\S)[^\sA-Za-z]+(?!\S)")).astype("int64")
        tl = t.str.lower()
        n_stopw = sum(tl.str.contains(p).astype("int64")
                      for p in stop_pats)
        ok_nwords = ((n_words >= GOPHER_MIN_WORDS)
                     & (n_words <= GOPHER_MAX_WORDS)).astype("int64")
        ok_meanlen = ((3 * n_words <= nw_chars)
                      & (nw_chars <= 10 * n_words)).astype("int64")
        ok_symbol = (10 * (n_hash + n_ell) <= n_words).astype("int64")
        ok_bullet = (10 * n_bullet <= 9 * n_lines).astype("int64")
        ok_ellipsis = (10 * n_ell_ln <= 3 * n_lines).astype("int64")
        ok_alpha = (5 * n_alpha >= 4 * n_words).astype("int64")
        ok_stop = (n_stopw >= 2).astype("int64")
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "n_words": n_words, "n_lines": n_lines,
            "ok_nwords": ok_nwords, "ok_meanlen": ok_meanlen,
            "ok_symbol": ok_symbol, "ok_bullet": ok_bullet,
            "ok_ellipsis": ok_ellipsis, "ok_alpha": ok_alpha,
            "ok_stop": ok_stop,
            "gopher_ok": (ok_nwords & ok_meanlen & ok_symbol & ok_bullet
                          & ok_ellipsis & ok_alpha & ok_stop)})

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        rules, batch_format="pandas")


# ---------------------------------------------------------------------------
# Exact-substring span dedup (Lee et al. 2022, "Deduplicating Training
# Data Makes Language Models Better") at fixed window granularity: the
# suffix-array dedup's practical hashed-window proxy.  No reference
# counterpart — extends the dedup family (doc_line_dedup's keeper rule
# at token-window granularity instead of line granularity).

SPAN_W = 15  # tokens per non-overlapping dedup window


def span_dedup(sf_dir: str, w: int = SPAN_W):
    """Per-doc repeated-span stats ``(doc_id, n_windows, n_dup)``:
    documents are cut into NON-OVERLAPPING ``w``-token windows ('\\S+'
    tokens, lower-cased — the doc_token_stats family; the tail < w
    tokens is dropped) and a window is dup iff it is NOT the
    corpus-wide first occurrence of its md5 key (first = min
    ``(doc_id, window_idx)``, the line_dedup keeper rule).  Docs with
    zero whole windows do not appear.

    Non-overlapping windows keep the exploded volume at n_tokens / w
    rows instead of the suffix array's n_tokens — the shape that still
    streams at 100 TB.  Scale shape is line_dedup's: one map pass
    explodes docs into thin (md5(window), doc_id) pre-aggregates
    (in-doc repeats collapse in-batch), ONE corpus-wide shuffle on the
    32-hex key picks keepers, and a union + doc_id groupby combines —
    no join, nothing corpus-sized on the driver."""
    import ray.data  # noqa: F401

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        ks: List[str] = []
        docs: List[int] = []
        mos: List[int] = []
        for did, t in zip(df["doc_id"].to_numpy(np.int64), df["text"]):
            toks = _TOKEN_RE.findall(t.lower())
            nw = len(toks) // w
            for i in range(nw):
                ks.append(hashlib.md5(
                    " ".join(toks[i * w:(i + 1) * w]).encode()).hexdigest())
                docs.append(int(did))
                mos.append((int(did) << 32) | (i + 1))
        if not ks:
            return pd.DataFrame({
                "k": pd.Series([], dtype=object),
                "doc_id": pd.Series([], dtype="int64"),
                "mo": pd.Series([], dtype="int64"),
                "cnt": pd.Series([], dtype="int64")})
        g = pd.DataFrame({"k": ks, "doc_id": docs, "mo": mos}) \
            .groupby(["k", "doc_id"], as_index=False, sort=False) \
            .agg(mo=("mo", "min"), cnt=("mo", "size"))
        return g.astype({"doc_id": "int64", "mo": "int64", "cnt": "int64"})

    pre = _read_docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(explode, batch_format="pandas").materialize()

    def kept_rows(df: pd.DataFrame) -> pd.DataFrame:
        mo = df["min(mo)"].to_numpy(np.int64)
        return pd.DataFrame({
            "doc_id": mo >> _LD_SHIFT,
            "n_windows": np.zeros(len(mo), np.int64),
            "n_kept": np.ones(len(mo), np.int64)})

    keeper = pre.groupby("k").min("mo") \
        .map_batches(kept_rows, batch_format="pandas")

    def tot_rows(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("doc_id", as_index=False).agg(
            n_windows=("cnt", "sum"))
        return pd.DataFrame({
            "doc_id": g["doc_id"].astype("int64"),
            "n_windows": g["n_windows"].astype("int64"),
            "n_kept": np.zeros(len(g), np.int64)})

    totals = pre.map_batches(tot_rows, batch_format="pandas")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        nw = df["sum(n_windows)"].astype("int64")
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "n_windows": nw,
            "n_dup": (nw - df["sum(n_kept)"]).astype("int64")})

    return totals.union(keeper).groupby("doc_id") \
        .sum(["n_windows", "n_kept"]) \
        .map_batches(finish, batch_format="pandas").sort("doc_id")


# ---------------------------------------------------------------------------
# DSIR importance scoring (Xie et al. 2023, "Data Selection for
# Language Models via Importance Resampling"): hashed-n-gram bucket
# counts from a target domain vs the rest, probed per document.  The
# published log-likelihood-ratio weight is replaced by the integer
# permille ratio 1000*sum_t // (sum_t + sum_s) so DuckDB replays it
# bit-for-bit (a float log weight would differ in the last ulp) — the
# ordering the weight induces is what matters for selection.

DSIR_BUCKETS = 4096        # hashed bigram feature buckets
DSIR_TARGET_LANG = "zh"    # stand-in "target domain" (wiki analog)


def dsir_weights(sf_dir: str, buckets: int = DSIR_BUCKETS,
                 target_lang: str = DSIR_TARGET_LANG,
                 driver_limit: int = 2_000_000):
    """(doc_id, n_grams, sum_t, sum_s, w_permille): score every
    document's affinity to the target domain (docs with lang =
    ``target_lang``) by hashed-bigram bucket statistics — the DSIR
    selection signal.  Features are the md5-31-bit positional bigram
    keys shared with lm_coverage, folded into ``buckets`` buckets; the
    model counts every gram occurrence (target corpus vs the rest,
    self-inclusive).  ``sum_t`` / ``sum_s`` are the per-doc sums of its
    grams' target / source bucket counts; ``w_permille`` =
    1000*sum_t // (sum_t + sum_s) (0 when the doc has no grams).

    Two passes, lm_coverage's shape.  Pass 1 (model build) folds
    per-batch (bucket, t, s) partials — at most ``buckets`` rows per
    batch, never text — with the size-gated fold (driver below
    ``driver_limit`` partial rows, distributed groupby-sum above); the
    model is two int64 arrays of length ``buckets`` (~64 KiB), bounded
    regardless of corpus size.  Pass 2 is map-only: the model ships
    once via ``ray.put`` and every batch probes it with vectorized
    fancy indexing."""
    import ray

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        tc = np.zeros(buckets, dtype=np.int64)
        sc = np.zeros(buckets, dtype=np.int64)
        for lang, t in zip(df["lang"], df["text"]):
            xs = _bigram_keys(t) % buckets
            if xs.shape[0]:
                np.add.at(tc if lang == target_lang else sc, xs, 1)
        nz = np.flatnonzero(tc | sc)
        return pd.DataFrame({"b": nz.astype("int64"),
                             "t": tc[nz], "s": sc[nz]})

    parts = _read_docs(sf_dir, ["lang", "text"]).map_batches(
        partial, batch_format="pandas").materialize()
    if parts.count() > driver_limit:
        agg = collect_df(parts.groupby("b").sum(["t", "s"])) \
            .rename(columns={"sum(t)": "t", "sum(s)": "s"})
    else:
        agg = collect_df(parts).groupby("b", as_index=False)[["t", "s"]] \
            .sum()
    tarr = np.zeros(buckets, dtype=np.int64)
    sarr = np.zeros(buckets, dtype=np.int64)
    if len(agg):
        tarr[agg["b"].to_numpy(np.int64)] = agg["t"].to_numpy(np.int64)
        sarr[agg["b"].to_numpy(np.int64)] = agg["s"].to_numpy(np.int64)
    mref = ray.put((tarr, sarr))

    def score(df: pd.DataFrame, _r=mref) -> pd.DataFrame:
        tm, sm = ray.get(_r)
        ng = np.zeros(len(df), dtype=np.int64)
        st = np.zeros(len(df), dtype=np.int64)
        ss = np.zeros(len(df), dtype=np.int64)
        for i, t in enumerate(df["text"]):
            xs = _bigram_keys(t) % buckets
            ng[i] = xs.shape[0]
            if xs.shape[0]:
                st[i] = int(tm[xs].sum())
                ss[i] = int(sm[xs].sum())
        den = st + ss
        w = np.where(den > 0, (st * 1000) // np.maximum(den, 1), 0)
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "n_grams": ng, "sum_t": st, "sum_s": ss,
            "w_permille": w.astype(np.int64)})

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        score, batch_format="pandas")


# ---------------------------------------------------------------------------
# BM25 keyword search (Robertson & Zaragoza 2009) over the corpus — the
# retrieval twin of the ANN family for the text side.  Every factor is
# INTEGER-exact (the doc_tfidf rule: a float idf/saturation would
# differ in the last ulp between numpy and DuckDB): idf = (1000*N)//df,
# length norm and tf saturation in permille with // division chains
# written identically on both sides.

BM25_TERMS = ("spark", "merge", "window")  # the fixed query
BM25_K1M = 1200   # k1 = 1.2, permille
BM25_BM = 750     # b = 0.75, permille
BM25_TOPK = 20


def bm25_topk(sf_dir: str, terms: Tuple[str, ...] = BM25_TERMS,
              k: int = BM25_TOPK):
    """(doc_id, score, rank): top-k documents for the fixed query
    ``terms`` under integer BM25.  tf = whitespace-token equality
    count ('\\S+', lower-cased), dl = token count; per matching term:

        idf    = (1000 * N) // df
        norm   = 1000 - b + (b * dl * N) // TT        (TT = corpus tokens)
        sat    = (1000 * tf * (k1 + 1000)) // (1000*tf + (k1*norm)//1000)
        score += (idf * sat) // 1000

    ranked by (score DESC, doc_id ASC), score > 0 only.

    Scale shape: pass 1 folds one tiny partial row per batch (N, TT,
    df per term — a handful of int64s) on the driver; pass 2 is
    map-only scoring with PER-BATCH TOP-K truncation (each batch emits
    at most k rows), so the final sort+limit sees n_batches*k rows,
    never the corpus."""
    stats_cols = ["nd", "tt"] + [f"df{i}" for i in range(len(terms))]
    pats = [rf"(?<!\S){re.escape(t)}(?!\S)" for t in terms]

    def stat_partial(df: pd.DataFrame) -> pd.DataFrame:
        tl = df["text"].str.lower()
        dl = tl.str.count(r"\S+").astype("int64")
        row = {"nd": [np.int64(len(df))], "tt": [dl.sum()]}
        for i, p in enumerate(pats):
            row[f"df{i}"] = [np.int64(
                (tl.str.count(p) > 0).sum())]
        return pd.DataFrame(row)

    parts = collect_df(_read_docs(sf_dir, ["text"]).map_batches(
        stat_partial, batch_format="pandas"))
    n = int(parts["nd"].sum())
    tt = int(parts["tt"].sum())
    dfs = [int(parts[f"df{i}"].sum()) for i in range(len(terms))]
    k1, b = BM25_K1M, BM25_BM

    def score_batch(df: pd.DataFrame) -> pd.DataFrame:
        tl = df["text"].str.lower()
        dl = tl.str.count(r"\S+").to_numpy(np.int64)
        norm = 1000 - b + (b * dl * n) // max(tt, 1)
        score = np.zeros(len(df), dtype=np.int64)
        for i, p in enumerate(pats):
            if dfs[i] == 0:
                continue
            tf = tl.str.count(p).to_numpy(np.int64)
            idf = (1000 * n) // dfs[i]
            sat = np.where(
                tf > 0,
                (1000 * tf * (k1 + 1000))
                // np.maximum(1000 * tf + (k1 * norm) // 1000, 1),
                0)
            score += np.where(tf > 0, (idf * sat) // 1000, 0)
        out = pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "score": score})
        out = out.loc[out["score"] > 0] \
            .sort_values(["score", "doc_id"], ascending=[False, True]) \
            .head(k)
        return out.reset_index(drop=True)

    top = collect_df(_read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        score_batch, batch_format="pandas")) \
        .sort_values(["score", "doc_id"], ascending=[False, True]) \
        .head(k).reset_index(drop=True)
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    return top.astype({"doc_id": "int64", "score": "int64",
                       "rank": "int64"})


# ---------------------------------------------------------------------------
# boolean search (WIMBD-style "what's in my big data" corpus lookup)

SEARCH_TERMS: Tuple[str, ...] = ("hash", "join")
SEARCH_K = 100


def search_topk(sf_dir: str):
    """(doc_id, tf): WIMBD-style boolean AND search — documents whose
    token stream (the shared `\\S+`-on-lowercased tokenizer) contains
    EVERY query term, ranked by total query-term frequency (ties by
    doc_id), top ``SEARCH_K``.  The corpus-search primitive WIMBD
    (Elazar et al. 2024) backs with Elasticsearch; here it is a
    map-only scan + a tf-keyed top-k.

    Scale shape: one vectorized `str.count` pass per term inside
    ``map_batches`` (compiled-regex C loop, no Python per-row work),
    the AND filter prunes before anything shuffles, and only the
    matching (doc_id, tf) pairs — a tiny fraction of the corpus —
    enter the sort+limit.  Nothing driver-resident."""
    docs = _read_docs(sf_dir, columns=["doc_id", "text"])
    pats = [r"(?<!\S)" + re.escape(t) + r"(?!\S)" for t in SEARCH_TERMS]

    def score(df: pd.DataFrame) -> pd.DataFrame:
        low = df["text"].str.lower()
        tfs = [low.str.count(p).astype(np.int64) for p in pats]
        hit = tfs[0] > 0
        for t in tfs[1:]:
            hit &= t > 0
        total = tfs[0].copy()
        for t in tfs[1:]:
            total += t
        out = pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64")[hit],
            "tf": total[hit]})
        return out

    return docs.map_batches(score, batch_format="pandas") \
        .sort(["tf", "doc_id"], descending=[True, False]) \
        .limit(SEARCH_K)


def search_oracle_sql() -> str:
    """DuckDB replay: list_filter token counts, same AND + ranking."""
    tf_cols = ", ".join(
        "len(list_filter(toks, x -> x = '" + t.replace("'", "''")
        + f"'))::BIGINT AS tf{i}"
        for i, t in enumerate(SEARCH_TERMS))
    total = " + ".join(f"tf{i}" for i in range(len(SEARCH_TERMS)))
    conds = " AND ".join(
        f"tf{i} > 0" for i in range(len(SEARCH_TERMS)))
    return (
        "WITH t AS (SELECT doc_id, "
        "regexp_extract_all(lower(text), '\\S+') AS toks "
        "FROM documents), "
        f"s AS (SELECT doc_id, {tf_cols} FROM t) "
        f"SELECT doc_id, ({total})::BIGINT AS tf FROM s "
        f"WHERE {conds} ORDER BY tf DESC, doc_id LIMIT {SEARCH_K}")


# ---------------------------------------------------------------------------
# Heaps-law vocabulary growth

VG_BUCKETS = 10


def vocab_growth(sf_dir: str):
    """(bucket, new_tokens, vocab_size): the Heaps-law vocabulary growth
    curve — distinct lowercased tokens binned by the doc_id range
    (``VG_BUCKETS`` equal-width bins over [0, max_doc_id]) where each
    token FIRST occurs, with the running cumulative vocabulary size.
    The corpus-composition diagnostic (WIMBD-class analysis; a flat
    tail means the corpus stopped contributing new vocabulary —
    saturated/duplicated content).

    Scale shape: (token, doc_id) pairs distinct-in-batch →
    ``groupby(token).min(doc_id)`` (THE vocabulary-sized shuffle,
    fixed-width rows) → map-side bucket partials → a VG_BUCKETS-row
    fold.  Only the bucket histogram (≤ VG_BUCKETS rows) ever reaches
    the driver, where the cumulative sum is a trivial scan."""
    import ray.data

    docs = _read_docs(sf_dir, columns=["doc_id", "text"])
    max_id = int(docs.max("doc_id") or 0)
    den = max_id + 1

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        ids, toks = [], []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            for t in np.unique(_TOKEN_RE.findall(text.lower())):
                ids.append(int(doc_id))
                toks.append(t)
        return pd.DataFrame({"token": pd.Series(toks, dtype="object"),
                             "doc_id": pd.Series(ids, dtype="int64")})

    first = docs.map_batches(pairs, batch_format="pandas") \
        .groupby("token").min("doc_id")

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        b = (df["min(doc_id)"].to_numpy(np.int64) * VG_BUCKETS) // den
        g = pd.Series(np.ones(len(b), dtype=np.int64)).groupby(b).sum()
        return pd.DataFrame({"bucket": g.index.astype(np.int64),
                             "new_tokens": g.values})

    hist = first.map_batches(bucketize, batch_format="pandas") \
        .groupby("bucket").sum("new_tokens").to_pandas()
    hist = hist.rename(columns={"sum(new_tokens)": "new_tokens"}) \
        .sort_values("bucket").reset_index(drop=True)
    hist["vocab_size"] = hist["new_tokens"].cumsum()
    return hist.astype({"bucket": "int64", "new_tokens": "int64",
                        "vocab_size": "int64"})


def vocab_growth_oracle_sql() -> str:
    """DuckDB replay: min(doc_id) per token, integer-division buckets,
    window cumulative."""
    return (
        "WITH mx AS (SELECT max(doc_id) + 1 AS den FROM documents), "
        "p AS (SELECT doc_id, unnest(list_distinct("
        "regexp_extract_all(lower(text), '\\S+'))) AS token "
        "FROM documents), "
        "f AS (SELECT token, min(doc_id) AS fd FROM p GROUP BY token), "
        f"h AS (SELECT (fd * {VG_BUCKETS}) // (SELECT den FROM mx) "
        "AS bucket, count(*)::BIGINT AS new_tokens FROM f GROUP BY 1) "
        "SELECT bucket::BIGINT AS bucket, new_tokens, "
        "(sum(new_tokens) OVER (ORDER BY bucket))::BIGINT "
        "AS vocab_size FROM h")


# ---------------------------------------------------------------------------
# duplicated-n-gram fraction (RefinedWeb / MassiveText quality signal)


def dup_ngrams(sf_dir: str):
    """(doc_id, n_ngrams, n_dup, dup_permille): for every document, how
    many of its DISTINCT word-bigrams also occur in at least one OTHER
    document — the "fraction of duplicated n-grams" repetition/boiler-
    plate signal MassiveText (Rae et al. '21) and RefinedWeb (Penedo
    et al. '23) filter on.  Keys are the shared md5-31-bit positional
    bigram family (collisions conflate identically on both sides).

    Scale shape — fully distributed, UNLIKE lm_coverage's capped
    broadcast model (df>=2 keys are corpus-sized, so no broadcast is
    possible): (key, doc_id) distinct pairs → ``groupby(key)`` emits
    each member back with its group's dup flag → ``groupby(doc_id)``
    sums.  Two key-width shuffles, nothing driver-resident."""
    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        ids, xs = [], []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            u = np.unique(_bigram_keys(text))
            if u.shape[0]:
                xs.append(u)
                ids.append(np.full(u.shape[0], int(doc_id),
                                   dtype=np.int64))
        if not ids:
            return pd.DataFrame({"x": pd.Series([], dtype="int64"),
                                 "doc_id": pd.Series([], dtype="int64")})
        return pd.DataFrame({"x": np.concatenate(xs),
                             "doc_id": np.concatenate(ids)})

    p = _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        pairs, batch_format="pandas")

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        dup = np.int64(1 if len(g) >= 2 else 0)
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(np.int64),
            "nd": np.full(len(g), dup, dtype=np.int64),
            "n1": np.ones(len(g), dtype=np.int64)})

    agg = p.groupby("x").map_groups(per_key, batch_format="pandas") \
        .groupby("doc_id").sum(["nd", "n1"])

    def fin(t: pa.Table) -> pa.Table:
        nd, n1 = t.column("sum(nd)"), t.column("sum(n1)")
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_ngrams": n1, "n_dup": nd,
            # int64/int64 divide truncates; values non-negative so it
            # equals the oracle's floor //
            "dup_permille": pc.divide(pc.multiply(nd, 1000), n1)})

    return agg.map_batches(fin, batch_format="pyarrow")


def dup_ngrams_oracle_sql() -> str:
    """DuckDB replay: shared bigram-key CTE, distinct (doc, key) pairs,
    df over distinct docs, per-doc dup tally."""
    return (
        "WITH t AS (SELECT doc_id, "
        "regexp_extract_all(lower(text), '\\S+') AS toks "
        "FROM documents), "
        "g0 AS (SELECT doc_id, CASE WHEN len(toks) >= 2 THEN "
        "list_transform(range(1, len(toks)), i -> "
        "toks[CAST(i AS INT)] || ' ' || toks[CAST(i AS INT) + 1]) "
        "WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')] "
        "ELSE [] END AS grams FROM t), "
        "gx AS (SELECT doc_id, CAST(md5_number_lower(g) & "
        "2147483647::UBIGINT AS BIGINT) AS x "
        "FROM g0, UNNEST(grams) AS u(g)), "
        "p AS (SELECT DISTINCT doc_id, x FROM gx), "
        "dfq AS (SELECT x, count(*)::BIGINT AS df FROM p GROUP BY x), "
        "per AS (SELECT p.doc_id, count(*)::BIGINT AS n_ngrams, "
        "(count(*) FILTER (WHERE dfq.df >= 2))::BIGINT AS n_dup "
        "FROM p JOIN dfq USING (x) GROUP BY p.doc_id) "
        "SELECT doc_id, n_ngrams, n_dup, "
        "((n_dup * 1000) // n_ngrams)::BIGINT AS dup_permille FROM per")


# ---------------------------------------------------------------------------
# temperature-resampled language mixing weights (multilingual balancing)

LW_T_SQ_SCALE = 1_000_000  # n · 10^6 under the isqrt → 1000·sqrt(n) floored


def lang_weights(sf_dir: str):
    """(lang, n_docs, weight_permille, n_sampled): temperature-resampled
    language mixing weights at T = 2 — the standard multilingual
    balancing step (mBERT / XLM-R exponent-smoothed sampling, Conneau &
    Lample '19 §3.1; UniMax is the budget-capped cousin): sampling
    weight ∝ n_l^(1/T), which up-weights tail languages relative to raw
    frequency.  Everything is decided in exact integers so the DuckDB
    oracle replays bit-for-bit: s_l = isqrt(n_l · 10^6) (= ⌊1000·√n_l⌋
    exactly), weight_permille = (1000 · s_l) // Σ s_l, and the resampled
    per-language document budget n_sampled = (N · weight_permille) //
    1000 for a same-size corpus.

    Scale shape: ONE grouped count keyed by lang (bounded domain — the
    language cardinality, not the corpus) and a langs-sized driver
    fold; map-only otherwise.  The downstream resample itself is
    textops.sample_stratified's deterministic hash-permille selector
    fed with these weights."""
    import math

    cnt = collect_df(lang_counts(sf_dir)).sort_values("lang") \
        .reset_index(drop=True)
    n_total = int(cnt["n_docs"].sum())
    s = np.array([math.isqrt(int(n) * LW_T_SQ_SCALE)
                  for n in cnt["n_docs"]], dtype=np.int64)
    s_sum = int(s.sum())
    w = (1000 * s) // max(s_sum, 1)
    return pd.DataFrame({
        "lang": cnt["lang"].astype("object"),
        "n_docs": cnt["n_docs"].astype("int64"),
        "weight_permille": pd.Series(w, dtype="int64"),
        "n_sampled": pd.Series((n_total * w) // 1000, dtype="int64"),
    })


def lang_weights_oracle_sql() -> str:
    """DuckDB replay: grouped count + exact integer sqrt (float sqrt
    floored, then ±1-corrected against the integer square — exact for
    arguments < 2^52, and n_l · 10^6 stays far below that)."""
    return (
        "WITH t AS (SELECT lang, count(*)::BIGINT AS n FROM documents "
        "GROUP BY lang), "
        f"r AS (SELECT lang, n, n * {LW_T_SQ_SCALE} AS x, "
        f"CAST(floor(sqrt((n * {LW_T_SQ_SCALE})::DOUBLE)) AS BIGINT) "
        "AS s0 FROM t), "
        "s AS (SELECT lang, n, s0 "
        "+ (CASE WHEN (s0 + 1) * (s0 + 1) <= x THEN 1 ELSE 0 END) "
        "- (CASE WHEN s0 * s0 > x THEN 1 ELSE 0 END) AS s FROM r), "
        "w AS (SELECT lang, n, (1000 * s) // "
        "greatest((SELECT sum(s) FROM s), 1) AS w FROM s) "
        "SELECT lang, n AS n_docs, w::BIGINT AS weight_permille, "
        "(((SELECT sum(n) FROM t) * w) // 1000)::BIGINT AS n_sampled "
        "FROM w")


# ---------------------------------------------------------------------------
# BPE tokenizer merge learning (Sennrich et al. '16) — training the
# tokenizer ON the corpus is itself a corpus-scale pipeline stage.

BPE_MERGES = 6
BPE_VOCAB_GATE = 2_000_000  # distinct words; below: driver merge loop
_BPE_L, _BPE_R = "\x01", "\x02"  # token brackets (unambiguous replace)


def _bpe_toks(seq: str) -> list:
    """Bracketed seq → token list ('\\x01tok\\x02' segments)."""
    return [s[:-1] for s in seq.split(_BPE_L)[1:]]


def bpe_merges(sf_dir: str, n_merges: int = BPE_MERGES,
               vocab_gate: int = BPE_VOCAB_GATE):
    """(merge_idx, lhs, rhs, pair_count): the first ``n_merges`` BPE
    merge rules learned from the corpus — per round, the adjacent
    symbol pair with the highest frequency-weighted occurrence count
    (ties → lexicographically smallest (lhs, rhs)), then applied
    left-to-right non-overlapping to every word before the next round
    (Sennrich et al. '16 §3.2).  Words start as character sequences;
    counts weight each word by its corpus frequency.

    Every sequence is stored BRACKETED (each symbol wrapped in
    \\x01…\\x02) so merge application is a plain non-overlapping string
    replace with identical semantics in Python and DuckDB — bracket
    pairing makes spurious cross-symbol matches impossible, and words
    containing the bracket bytes are excluded on both sides.

    Scale shape — the Sennrich word-frequency compression: ONE
    corpus-wide (word, freq) shuffle builds the working vocabulary and
    the corpus is never re-read; all rounds run over the vocab table
    (sub-linear in corpus size by Heaps' law).  ≤``vocab_gate`` words
    the merge loop folds the vocab once onto the driver (what
    SentencePiece/HF trainers do on a word-count table); above it the
    vocab stays a DATASET — per round one in-batch pair-count partial +
    ``groupby(x, y).sum`` + per-block top-1 (the driver sees only
    n_blocks candidate rows) and a map-only re-bracketing replace.
    Stops early if no adjacent pairs remain (the oracle's empty-best
    CTE cascades identically)."""
    from collections import Counter

    docs = _read_docs(sf_dir, columns=["text"])

    def wf_partial(df: pd.DataFrame) -> pd.DataFrame:
        c: Counter = Counter()
        for text in df["text"]:
            c.update(_TOKEN_RE.findall(text.lower()))
        words = [w for w in c
                 if _BPE_L not in w and _BPE_R not in w]
        return pd.DataFrame({
            "word": pd.Series(words, dtype="object"),
            "freq": pd.Series([c[w] for w in words], dtype="int64")})

    vocab = docs.map_batches(wf_partial, batch_format="pandas") \
        .groupby("word").sum("freq")
    n_vocab = vocab.count()

    if n_vocab <= vocab_gate:
        vdf = collect_df(vocab)
        return _bpe_driver_loop(
            [ "".join(_BPE_L + ch + _BPE_R for ch in w)
              for w in vdf["word"] ],
            vdf["sum(freq)"].astype("int64").tolist(), n_merges)
    return _bpe_distributed_loop(vocab, n_merges)


def _bpe_driver_loop(seqs: list, freqs: list, n_merges: int):
    from collections import Counter

    toks = [_bpe_toks(s) for s in seqs]
    rows = []
    for idx in range(1, n_merges + 1):
        c: Counter = Counter()
        for t, f in zip(toks, freqs):
            for a, b in zip(t, t[1:]):
                c[(a, b)] += f
        if not c:
            break
        (x, y), n = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
        rows.append((idx, x, y, n))
        toks = [_bpe_apply(t, x, y) for t in toks]
    return _bpe_rows_df(rows)


def _bpe_apply(t: list, x: str, y: str) -> list:
    """One merge, left-to-right non-overlapping (== bracketed replace)."""
    out, i, n = [], 0, len(t)
    while i < n:
        if i + 1 < n and t[i] == x and t[i + 1] == y:
            out.append(x + y)
            i += 2
        else:
            out.append(t[i])
            i += 1
    return out


def _bpe_rows_df(rows: list) -> pd.DataFrame:
    return pd.DataFrame({
        "merge_idx": pd.Series([r[0] for r in rows], dtype="int64"),
        "lhs": pd.Series([r[1] for r in rows], dtype="object"),
        "rhs": pd.Series([r[2] for r in rows], dtype="object"),
        "pair_count": pd.Series([r[3] for r in rows], dtype="int64"),
    })


def _bpe_distributed_loop(vocab, n_merges: int):
    """>gate: vocab stays a Dataset of (seq, freq); per round one
    pair-count shuffle + per-block exact top-1 (global groupby first, so
    block top-1s are true candidates), driver picks among n_blocks."""
    from collections import Counter

    def to_seq(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "seq": pd.Series(
                ["".join(_BPE_L + ch + _BPE_R for ch in w)
                 for w in df["word"]], dtype="object"),
            "freq": df["sum(freq)"].astype("int64")})

    cur = vocab.map_batches(to_seq, batch_format="pandas").materialize()

    pair_schema = pa.schema([("x", pa.string()), ("y", pa.string()),
                             ("c", pa.int64())])

    def pair_partial(df: pd.DataFrame) -> pa.Table:
        c: Counter = Counter()
        for seq, f in zip(df["seq"], df["freq"]):
            t = _bpe_toks(seq)
            for a, b in zip(t, t[1:]):
                c[(a, b)] += int(f)
        ks = list(c)
        return pa.table({"x": pa.array([k[0] for k in ks], pa.string()),
                         "y": pa.array([k[1] for k in ks], pa.string()),
                         "c": pa.array([c[k] for k in ks], pa.int64())},
                        schema=pair_schema)

    def top1(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(
            by=["c", "x", "y"], ascending=[False, True, True]).head(1)
        return pa.table({"x": pa.array(df["x"], pa.string()),
                         "y": pa.array(df["y"], pa.string()),
                         "c": pa.array(df["c"], pa.int64())},
                        schema=pair_schema)

    rows = []
    for idx in range(1, n_merges + 1):
        agg = cur.map_batches(pair_partial, batch_format="pandas") \
            .groupby(["x", "y"]).sum("c")
        cand = collect_df(
            agg.map_batches(
                lambda df: top1(df.rename(columns={"sum(c)": "c"})),
                batch_format="pandas"))
        if not len(cand):
            break
        best = cand.sort_values(
            by=["c", "x", "y"], ascending=[False, True, True]).iloc[0]
        x, y, n = str(best["x"]), str(best["y"]), int(best["c"])
        rows.append((idx, x, y, n))
        pat = _BPE_L + x + _BPE_R + _BPE_L + y + _BPE_R
        rep = _BPE_L + x + y + _BPE_R

        def apply_fn(df: pd.DataFrame, _p=pat, _r=rep) -> pd.DataFrame:
            return pd.DataFrame({
                "seq": df["seq"].str.replace(_p, _r, regex=False),
                "freq": df["freq"]})

        cur = cur.map_batches(apply_fn, batch_format="pandas") \
            .materialize()
    return _bpe_rows_df(rows)


def bpe_merges_oracle_sql(n_merges: int = BPE_MERGES) -> str:
    """DuckDB replay: word frequencies → bracketed char sequences, each
    round's best pair as an ORDER BY … LIMIT 1 CTE and the merge applied
    with the same non-overlapping replace().  An empty round cascades to
    empty subsequent rounds exactly like the engine's early stop."""
    tokpat = "chr(1) || '([^' || chr(2) || ']*)' || chr(2)"
    cte = [
        "WITH wf AS (SELECT w AS word, count(*)::BIGINT AS freq FROM "
        "(SELECT unnest(regexp_extract_all(lower(text), '\\S+')) AS w "
        "FROM documents) WHERE w NOT LIKE '%' || chr(1) || '%' "
        "AND w NOT LIKE '%' || chr(2) || '%' GROUP BY w), ",
        "s0 AS (SELECT word, freq, array_to_string("
        "[chr(1) || c || chr(2) for c in regexp_extract_all(word, '.')],"
        " '') AS seq FROM wf), ",
    ]
    for i in range(1, n_merges + 1):
        cte.append(
            f"t{i} AS (SELECT freq, "
            f"regexp_extract_all(seq, {tokpat}, 1) AS toks "
            f"FROM s{i - 1}), ")
        cte.append(
            f"b{i} AS (SELECT toks[j] AS x, toks[j + 1] AS y, "
            "SUM(freq)::BIGINT AS c "
            f"FROM t{i}, UNNEST(generate_series(1, len(toks) - 1)) "
            "AS u(j) GROUP BY 1, 2 ORDER BY c DESC, x, y LIMIT 1), ")
        cte.append(
            f"s{i} AS (SELECT word, freq, replace(seq, "
            "chr(1) || b.x || chr(2) || chr(1) || b.y || chr(2), "
            "chr(1) || b.x || b.y || chr(2)) AS seq "
            f"FROM s{i - 1}, b{i} b), ")
    unions = " UNION ALL ".join(
        f"SELECT {i}::BIGINT AS merge_idx, x AS lhs, y AS rhs, "
        f"c AS pair_count FROM b{i}" for i in range(1, n_merges + 1))
    return ("".join(cte)[:-2] +
            f" SELECT * FROM ({unions}) ORDER BY merge_idx")


# ---------------------------------------------------------------------------
# BPE tokenizer APPLICATION — the learned merge table driven back over
# the corpus for per-document token accounting (the second half of the
# train-tokenizer → tokenize-corpus pipeline).

_BPE_TOKC: dict = {}  # per-process (merges-fingerprint, word) -> n_tokens


def bpe_tokenize(sf_dir: str, n_merges: int = BPE_MERGES):
    """(doc_id, n_words, n_chars, n_tokens, tokens_per_kchar): tokenize
    every document with the merge table ``bpe_merges`` learns from the
    SAME corpus — per word, apply the merges in learned order
    (left-to-right non-overlapping, exactly the training semantics) and
    count resulting tokens; per doc, sum over word occurrences.  Words
    containing the bracket bytes (excluded from training) fall back to
    character count.  ``tokens_per_kchar`` = (n_tokens·1000)//n_chars is
    the integer-exact compression ratio quality signal (a doc the
    tokenizer compresses poorly is out-of-distribution for the corpus).

    Scale shape: the merge table is O(n_merges) — broadcast by closure —
    so the tokenize pass is MAP-ONLY; per batch the work is one merge
    chain per UNIQUE word (memoized per process across batches, the
    Heaps'-law working set), never per occurrence."""
    from collections import Counter

    merges = bpe_merges(sf_dir, n_merges)
    mlist = tuple(zip(merges["lhs"], merges["rhs"]))
    docs = _read_docs(sf_dir, columns=["doc_id", "text"])

    def ntok(w: str, _m=mlist) -> int:
        key = (_m, w)
        n = _BPE_TOKC.get(key)
        if n is None:
            if _BPE_L in w or _BPE_R in w:
                n = len(w)
            else:
                t = list(w)
                for x, y in _m:
                    t = _bpe_apply(t, x, y)
                n = len(t)
            _BPE_TOKC[key] = n
        return n

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        ids, nw, nc, nt = [], [], [], []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            c: Counter = Counter(_TOKEN_RE.findall(text.lower()))
            if not c:
                continue  # wordless doc: oracle's unnest emits no row
            ids.append(int(doc_id))
            nw.append(sum(c.values()))
            nc.append(sum(len(w) * k for w, k in c.items()))
            nt.append(sum(ntok(w) * k for w, k in c.items()))
        nt_a = np.asarray(nt, dtype=np.int64)
        nc_a = np.asarray(nc, dtype=np.int64)
        return pd.DataFrame({
            "doc_id": pd.Series(ids, dtype="int64"),
            "n_words": pd.Series(nw, dtype="int64"),
            "n_chars": pd.Series(nc_a, dtype="int64"),
            "n_tokens": pd.Series(nt_a, dtype="int64"),
            "tokens_per_kchar": pd.Series(
                (nt_a * 1000) // np.maximum(nc_a, 1), dtype="int64"),
        })

    return docs.map_batches(fn, batch_format="pandas")


def bpe_tokenize_oracle_sql(n_merges: int = BPE_MERGES) -> str:
    """DuckDB replay: the ``bpe_merges`` CTE cascade to the final
    per-word seq, token count per word by re-extracting the brackets,
    then docs→words unnest + LEFT JOIN (bracket-byte words fall back to
    length(w)) + per-doc sums."""
    tokpat = "chr(1) || '([^' || chr(2) || ']*)' || chr(2)"
    learn = bpe_merges_oracle_sql(n_merges)
    cte = learn[:learn.index(" SELECT * FROM (")]
    return (
        cte + ", "
        f"wtok AS (SELECT word, len(regexp_extract_all(seq, {tokpat})) "
        f"AS nt FROM s{n_merges}), "
        "dw AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), "
        "'\\S+')) AS w FROM documents), "
        "per AS (SELECT doc_id, count(*)::BIGINT AS n_words, "
        "SUM(length(w))::BIGINT AS n_chars, "
        "SUM(COALESCE(wtok.nt, length(w)))::BIGINT AS n_tokens "
        "FROM dw LEFT JOIN wtok ON wtok.word = dw.w GROUP BY doc_id) "
        "SELECT doc_id, n_words, n_chars, n_tokens, "
        "((n_tokens * 1000) // greatest(n_chars, 1))::BIGINT "
        "AS tokens_per_kchar FROM per")


# ---------------------------------------------------------------------------
# language metadata audit — declared lang vs detected lang confusion
# matrix (the standard corpus-QA step before trusting upstream labels:
# off-diagonal mass = mislabeled or code-switched documents).


class LangConfusion(LangId):
    """Per-batch PARTIAL of the confusion matrix: predict with the
    inherited integer-exact bigram argmax, count (declared, predicted)
    pairs — only the bounded lang×lang matrix leaves the task."""

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        c: Counter = Counter(
            zip(df["lang"], (self.predict(t) for t in df["text"])))
        ks = list(c)
        return pd.DataFrame({
            "lang_meta": pd.Series([k[0] for k in ks], dtype="object"),
            "lang_pred": pd.Series([k[1] for k in ks], dtype="object"),
            "n": pd.Series([c[k] for k in ks], dtype="int64")})


def lang_confusion(sf_dir: str):
    """(lang_meta, lang_pred, n_docs): declared-vs-detected language
    confusion matrix.  Scale shape: ONE streaming pass (prediction and
    pairing fused in the same batch — no doc_id shuffle join between a
    langid table and the metadata) emitting per-batch partial counts,
    then a grouped sum over the lang² bounded domain."""

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "lang_meta": df["lang_meta"],
            "lang_pred": df["lang_pred"],
            "n_docs": df["sum(n)"].astype("int64")})

    return _read_docs(sf_dir, ["lang", "text"]) \
        .map_batches(task_udf(LangConfusion), batch_format="pandas") \
        .groupby(["lang_meta", "lang_pred"]).sum("n") \
        .map_batches(fin, batch_format="pandas")


def lang_confusion_oracle_sql(langid_sql: str) -> str:
    """DuckDB replay: the full doc_langid decision SQL as a CTE, joined
    back to the declared label and group-counted."""
    return (f"WITH pred AS ({langid_sql}) "
            "SELECT d.lang AS lang_meta, p.lang_pred, "
            "count(*)::BIGINT AS n_docs "
            "FROM documents d JOIN pred p ON p.doc_id = d.doc_id "
            "GROUP BY 1, 2")


# ---------------------------------------------------------------------------
# word co-occurrence matrix (GloVe / word2vec training prep) — counting
# window co-occurrences over the corpus IS the embedding-training input
# build (Pennington et al. '14 §3 does exactly this pass before the fit).

WC_MIN_COUNT = 50  # vocab = tokens with corpus count ≥ this (word2vec min_count)
WC_WINDOW = 2      # symmetric context window (positions, not chars)


def word_cooccur(sf_dir: str, min_count: int = WC_MIN_COUNT,
                 window: int = WC_WINDOW):
    """(tok_a, tok_b, n_cooc) with tok_a ≤ tok_b: unordered window
    co-occurrence counts over vocabulary tokens (corpus frequency ≥
    ``min_count``) — every position pair (i, i+d), 1 ≤ d ≤ ``window``,
    within a document, both endpoints in-vocab.

    Scale shape: pass 1 is the token-count groupby with in-batch
    Counter partials; the vocab (min-count thresholded — the knob that
    BOUNDS it regardless of corpus size) folds to the driver and
    broadcasts once via ray.put.  Pass 2 is map-only: per batch a
    vectorized np.isin mask over the shifted token arrays, in-batch
    pair-count partials, then one grouped sum over the ≤vocab² bounded
    pair domain."""
    import ray

    from collections import Counter

    docs = _read_docs(sf_dir, columns=["text"])

    def tok_partial(df: pd.DataFrame) -> pd.DataFrame:
        c: Counter = Counter()
        for text in df["text"]:
            c.update(_TOKEN_RE.findall(text.lower()))
        ks = list(c)
        return pd.DataFrame({
            "tok": pd.Series(ks, dtype="object"),
            "n": pd.Series([c[k] for k in ks], dtype="int64")})

    vc = collect_df(
        docs.map_batches(tok_partial, batch_format="pandas")
        .groupby("tok").sum("n"))
    vocab = frozenset(vc.loc[vc["sum(n)"] >= min_count, "tok"])
    vref = ray.put(vocab)

    def pair_partial(df: pd.DataFrame, _w=window) -> pd.DataFrame:
        v = ray.get(vref)
        c: Counter = Counter()
        for text in df["text"]:
            toks = np.asarray(_TOKEN_RE.findall(text.lower()),
                              dtype=object)
            if toks.shape[0] < 2:
                continue
            inv = np.asarray([t in v for t in toks], dtype=bool)
            for d in range(1, _w + 1):
                if toks.shape[0] <= d:
                    break
                a, b = toks[:-d], toks[d:]
                m = inv[:-d] & inv[d:]
                c.update(zip(np.minimum(a[m], b[m]),
                             np.maximum(a[m], b[m])))
        ks = list(c)
        return pd.DataFrame({
            "tok_a": pd.Series([k[0] for k in ks], dtype="object"),
            "tok_b": pd.Series([k[1] for k in ks], dtype="object"),
            "n": pd.Series([c[k] for k in ks], dtype="int64")})

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "tok_a": df["tok_a"], "tok_b": df["tok_b"],
            "n_cooc": df["sum(n)"].astype("int64")})

    return docs.map_batches(pair_partial, batch_format="pandas") \
        .groupby(["tok_a", "tok_b"]).sum("n") \
        .map_batches(fin, batch_format="pandas")


def word_cooccur_oracle_sql(min_count: int = WC_MIN_COUNT,
                            window: int = WC_WINDOW) -> str:
    return (
        "WITH t AS (SELECT regexp_extract_all(lower(text), '\\S+') "
        "AS toks FROM documents), "
        "v AS (SELECT tok FROM (SELECT unnest(toks) AS tok FROM t) "
        f"GROUP BY tok HAVING count(*) >= {min_count}), "
        "p AS (SELECT toks[j] AS a, toks[j + d] AS b FROM t, "
        "UNNEST(generate_series(1, len(toks) - 1)) AS u(j), "
        f"UNNEST(generate_series(1, {window})) AS w(d) "
        "WHERE j + d <= len(toks)), "
        "f AS (SELECT least(p.a, p.b) AS tok_a, "
        "greatest(p.a, p.b) AS tok_b FROM p "
        "JOIN v va ON va.tok = p.a JOIN v vb ON vb.tok = p.b) "
        "SELECT tok_a, tok_b, count(*)::BIGINT AS n_cooc FROM f "
        "GROUP BY 1, 2")


# ---------------------------------------------------------------------------
# cross-source n-gram overlap (WIMBD corpus-pair contamination audit —
# Elazar et al. '23 measure exactly this between C4/Pile/etc. splits)


def source_overlap(sf_dir: str):
    """(source_a, source_b, n_shared) with source_a ≤ source_b: for
    every unordered pair of corpus sources, the number of DISTINCT
    bigram keys (the shared md5-31-bit family) occurring in both;
    diagonal rows (a = b) carry each source's own distinct-key count,
    so Jaccard/containment are one division downstream.

    Scale shape: distinct (key, source) pairs — ONE bigram-key-wide
    exchange (the dedup bound: at most #sources rows per key survive) —
    then per-key pair emission inside ``map_groups`` (quadratic only in
    the BOUNDED per-key source count) and a grouped sum over the
    sources² domain.  Nothing driver-resident."""
    from itertools import combinations_with_replacement

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        srcs, xs = [], []
        for source, text in zip(df["source"], df["text"]):
            u = np.unique(_bigram_keys(text))
            if u.shape[0]:
                xs.append(u)
                srcs.extend([source] * u.shape[0])
        if not xs:
            return pd.DataFrame({"x": pd.Series([], dtype="int64"),
                                 "source": pd.Series([], dtype="object")})
        # in-batch dedup before the shuffle (combiner)
        return pd.DataFrame({"x": np.concatenate(xs),
                             "source": pd.Series(srcs, dtype="object")}) \
            .drop_duplicates()

    p = _read_docs(sf_dir, ["source", "text"]) \
        .map_batches(pairs, batch_format="pandas") \
        .groupby(["x", "source"]).count()

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        ss = sorted(set(g["source"]))
        ab = list(combinations_with_replacement(ss, 2))
        return pd.DataFrame({
            "source_a": pd.Series([a for a, _ in ab], dtype="object"),
            "source_b": pd.Series([b for _, b in ab], dtype="object"),
            "one": pd.Series([1] * len(ab), dtype="int64")})

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "source_a": df["source_a"], "source_b": df["source_b"],
            "n_shared": df["sum(one)"].astype("int64")})

    return p.groupby("x").map_groups(per_key, batch_format="pandas") \
        .groupby(["source_a", "source_b"]).sum("one") \
        .map_batches(fin, batch_format="pandas")


def source_overlap_oracle_sql() -> str:
    """DuckDB replay: the dup_ngrams bigram-key CTE keyed by source,
    distinct pairs, self-join with b ≥ a (diagonal = own key count)."""
    return (
        "WITH t AS (SELECT source, "
        "regexp_extract_all(lower(text), '\\S+') AS toks "
        "FROM documents), "
        "g0 AS (SELECT source, CASE WHEN len(toks) >= 2 THEN "
        "list_transform(range(1, len(toks)), i -> "
        "toks[CAST(i AS INT)] || ' ' || toks[CAST(i AS INT) + 1]) "
        "WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')] "
        "ELSE [] END AS grams FROM t), "
        "gx AS (SELECT source, CAST(md5_number_lower(g) & "
        "2147483647::UBIGINT AS BIGINT) AS x "
        "FROM g0, UNNEST(grams) AS u(g)), "
        "p AS (SELECT DISTINCT source, x FROM gx) "
        "SELECT a.source AS source_a, b.source AS source_b, "
        "count(*)::BIGINT AS n_shared FROM p a "
        "JOIN p b ON b.x = a.x AND b.source >= a.source GROUP BY 1, 2")


# ---------------------------------------------------------------------------
# training-sequence packing (concat-and-chunk)

SEQ_LEN = 512  # tokens per packed training sequence


def pack_sequences(sf_dir: str, seq_len: int = SEQ_LEN,
                   hist_gate: int = 2_000_000):
    """(doc_id, seq_id, tok_start, tok_len): concat-and-chunk sequence
    packing — the corpus laid out in (n_tokens, doc_id) total order and
    cut into fixed ``seq_len``-token training sequences; each row is one
    document∩sequence intersection span (GPT-style pretraining batching:
    a document crossing a boundary is split, a sequence holds several
    short documents).  tok_start is 0-based within the document.

    Distributed construction: the ``global_rank``/``pack_shards``
    histogram machinery on the TOKEN-count domain — the n_tokens
    histogram gives every distinct count its exclusive cumulative token
    offset (broadcast once); (doc_id, n_tokens) rows — never text —
    shuffle ONCE keyed by n_tokens, each group computes offsets by
    local doc_id sort and emits its span rows vectorized.  Zero-token
    documents occupy no span and emit no rows (both sides)."""
    import ray
    import ray.data

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "n": pd.Series([len(_TOKEN_RE.findall(t)) for t in df["text"]],
                           dtype="int64")})

    pre = _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        keyed, batch_format="pandas").materialize()

    def partial(t: pa.Table) -> pa.Table:
        vc = pc.value_counts(t.column("n"))
        return pa.table({"n": vc.field("values").cast(pa.int64()),
                         "c": vc.field("counts").cast(pa.int64())})

    parts = pre.map_batches(partial, batch_format="pyarrow").materialize()
    if parts.count() > hist_gate:
        hist = collect_df(parts.groupby("n").sum("c")) \
            .rename(columns={"sum(c)": "c"})
    else:
        hist = collect_df(parts).groupby("n", as_index=False)["c"].sum()
    hist = hist.sort_values("n").reset_index(drop=True)
    tok = (hist["n"] * hist["c"]).to_numpy(dtype=np.int64)
    cumt = np.concatenate(([0], np.cumsum(tok)[:-1]))
    tok_off = {int(v): int(o) for v, o in zip(hist["n"], cumt)}
    oref = ray.put(tok_off)

    def spans_group(g: pd.DataFrame) -> pd.DataFrame:
        n = int(g["n"].iloc[0])
        empty = pd.DataFrame({
            "doc_id": pd.Series([], dtype="int64"),
            "seq_id": pd.Series([], dtype="int64"),
            "tok_start": pd.Series([], dtype="int64"),
            "tok_len": pd.Series([], dtype="int64")})
        if n == 0:
            return empty
        base = ray.get(oref)[n]
        ids = np.sort(g["doc_id"].to_numpy(dtype=np.int64))
        offs = base + np.arange(len(ids), dtype=np.int64) * n
        s0 = offs // seq_len
        s1 = (offs + n - 1) // seq_len
        cnt = (s1 - s0 + 1).astype(np.int64)
        rep_ids = np.repeat(ids, cnt)
        rep_off = np.repeat(offs, cnt)
        # per-doc consecutive seq indices, fully vectorized
        seqs = (np.arange(cnt.sum(), dtype=np.int64)
                - np.repeat(np.concatenate(([0], np.cumsum(cnt)[:-1])), cnt)
                + np.repeat(s0, cnt))
        start_g = np.maximum(rep_off, seqs * seq_len)
        end_g = np.minimum(rep_off + n, (seqs + 1) * seq_len)
        return pd.DataFrame({"doc_id": rep_ids, "seq_id": seqs,
                             "tok_start": start_g - rep_off,
                             "tok_len": end_g - start_g})

    return pre.groupby("n").map_groups(spans_group, batch_format="pandas")


def pack_sequences_oracle_sql(seq_len: int = SEQ_LEN) -> str:
    """DuckDB replay: cumulative token offsets by (n, doc_id) window
    order, one UNNEST row per crossed sequence."""
    return (
        "WITH t AS (SELECT doc_id, "
        "len(regexp_extract_all(text, '\\S+'))::BIGINT AS n "
        "FROM documents), "
        "o AS (SELECT doc_id, n, COALESCE(sum(n) OVER ("
        "ORDER BY n, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND "
        "1 PRECEDING), 0)::BIGINT AS o FROM t), "
        "x AS (SELECT doc_id, n, o FROM o WHERE n > 0) "
        "SELECT doc_id, CAST(s AS BIGINT) AS seq_id, "
        f"(GREATEST(o, s * {seq_len}) - o)::BIGINT AS tok_start, "
        f"(LEAST(o + n, (s + 1) * {seq_len}) "
        f"- GREATEST(o, s * {seq_len}))::BIGINT AS tok_len "
        f"FROM x, UNNEST(range(o // {seq_len}, "
        f"(o + n - 1) // {seq_len} + 1)) AS u(s)")


# ---------------------------------------------------------------------------
# vocabulary coverage / OOV rate

OOV_VOCAB_K = 16


def oov_rate(sf_dir: str, k: int = OOV_VOCAB_K):
    """(doc_id, n_tokens, n_oov, oov_permille): per-document OUT-OF-
    VOCABULARY rate against the corpus top-``k`` token vocabulary — the
    tokenizer-fit / coverage audit run before committing a vocab (a doc
    whose OOV share is high will fragment into byte-fallback pieces;
    corpus-level OOV drift between snapshots flags domain shift).

    oov_permille is INTEGER (n_oov * 1000 // n_tokens, 0 for empty
    docs), so the DuckDB oracle replays the exact value.

    Scale shape: the vocabulary comes from :func:`top_tokens` (Misra-
    Gries sketch partials at scale — no token-stream shuffle), is
    k-sized, and is broadcast once via ray.put; the per-doc pass is
    map-only vectorized membership (np.isin over the token array).
    Nothing doc-sized shuffles."""
    import ray

    vocab_rows = collect_df(top_tokens(sf_dir, k=k))
    vocab = np.sort(np.asarray(vocab_rows["token"], dtype=object)
                    .astype(str)) if len(vocab_rows) else \
        np.asarray([], dtype=str)
    ref = ray.put(vocab)

    def per_doc(df: pd.DataFrame, _r=ref) -> pd.DataFrame:
        v = ray.get(_r)
        n_tok = np.empty(len(df), dtype=np.int64)
        n_oov = np.empty(len(df), dtype=np.int64)
        for i, text in enumerate(df["text"]):
            toks = np.asarray(_TOKEN_RE.findall(text), dtype=str)
            n_tok[i] = toks.shape[0]
            n_oov[i] = n_tok[i] - int(np.isin(toks, v).sum()) \
                if n_tok[i] else 0
        pm = np.where(n_tok > 0, n_oov * 1000 // np.maximum(n_tok, 1), 0)
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "n_tokens": n_tok, "n_oov": n_oov,
            "oov_permille": pm.astype("int64")})

    return _read_docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(per_doc, batch_format="pandas")


def oov_rate_oracle_sql(k: int = OOV_VOCAB_K) -> str:
    """Vocab = top-k by (count DESC, token ASC); per-doc LEFT JOIN
    membership counts; identical integer permille."""
    return (
        "WITH t AS (SELECT unnest(regexp_extract_all(text, '\\S+')) "
        "AS token FROM documents), "
        "tc AS (SELECT token, count(*)::BIGINT AS c FROM t "
        "GROUP BY token), "
        f"v AS (SELECT token FROM tc ORDER BY c DESC, token LIMIT {k}), "
        "u AS (SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) "
        "AS tok FROM documents), "
        "o AS (SELECT u.doc_id, count(*)::BIGINT AS n, "
        "sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)::BIGINT "
        "AS oov FROM u LEFT JOIN v ON v.token = u.tok "
        "GROUP BY u.doc_id) "
        "SELECT d.doc_id, coalesce(o.n, 0)::BIGINT AS n_tokens, "
        "coalesce(o.oov, 0)::BIGINT AS n_oov, "
        "CASE WHEN coalesce(o.n, 0) > 0 THEN "
        "(o.oov * 1000) // o.n ELSE 0 END::BIGINT AS oov_permille "
        "FROM documents d LEFT JOIN o ON o.doc_id = d.doc_id")


# ---------------------------------------------------------------------------
# RAG-style per-document sliding-window chunking

CHUNK_CHARS = 512
CHUNK_STRIDE = 384  # 128-char overlap between consecutive chunks


def doc_chunks(sf_dir: str, size: int = CHUNK_CHARS,
               stride: int = CHUNK_STRIDE):
    """(doc_id, chunk_seq, n_chars, chunk_md5): overlapping fixed-size
    character chunks per document — the retrieval-index build step (a
    RAG embedder consumes bounded windows, and the overlap keeps
    answers that straddle a boundary findable).  The md5 digest is the
    chunk's content key for downstream chunk-level dedup.

    Empty documents produce no chunks; every other document's chunks
    start at offsets 0, stride, 2·stride, … < len(text), so the last
    chunk may be short but is never empty.

    Scale shape: map-only explode (each doc's chunks derive from its
    own row — no shuffle); output rows carry a 16-byte digest + two
    ints, never the chunk text."""
    import hashlib

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        ids, seqs, lens, digs = [], [], [], []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            n = len(text)
            for s in range(0, n, stride):
                ck = text[s:s + size]
                ids.append(int(doc_id))
                seqs.append(s // stride)
                lens.append(len(ck))
                digs.append(hashlib.md5(ck.encode("utf-8")).hexdigest())
        return pd.DataFrame({
            "doc_id": pd.Series(ids, dtype="int64"),
            "chunk_seq": pd.Series(seqs, dtype="int64"),
            "n_chars": pd.Series(lens, dtype="int64"),
            "chunk_md5": pd.Series(digs, dtype=object)})

    return _read_docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(explode, batch_format="pandas")


def doc_chunks_oracle_sql(size: int = CHUNK_CHARS,
                          stride: int = CHUNK_STRIDE) -> str:
    """Chunk starts via UNNEST(range(...)), char-based substr, md5 —
    the same offsets and digests."""
    return (
        "WITH x AS (SELECT doc_id, text, length(text) AS n "
        "FROM documents), "
        "c AS (SELECT doc_id, u.s AS chunk_seq, "
        f"substr(text, u.s * {stride} + 1, {size}) AS ck "
        "FROM x, UNNEST(range(0, CASE WHEN n = 0 THEN 0 ELSE "
        f"(n - 1) // {stride} + 1 END)) AS u(s)) "
        "SELECT doc_id, chunk_seq::BIGINT AS chunk_seq, "
        "length(ck)::BIGINT AS n_chars, md5(ck) AS chunk_md5 FROM c")


# ---------------------------------------------------------------------------
# MinHash-banding recall evaluation (the dedup analog of ann_recall)


def dedup_recall(sf_dir: str):
    """(n_true, n_flagged, n_hit, recall_permille, precision_permille):
    evaluation of the MinHash+LSH dedup path against exact ground
    truth — the banding-recall number a 100 TB deployment watches when
    trading band/row shape against shuffle volume.

    Ground truth: a doc is a TRUE dup iff it pairs with a smaller
    doc_id at word-3-gram Jaccard ≥ τ in :func:`ngram_jaccard_pairs`
    (prefix filtering, recall 1.0 by construction).  Flagged: the doc
    appears in :func:`minhash_dedup` output (banding candidates,
    exactly verified at the same τ over the same shingle unit — so
    precision is structurally 1000 and the interesting number is
    recall, the pairs the s-curve missed).

    Scale shape: both inputs are the existing pipelines (their own
    scale stories apply); the comparison moves only dup-doc-sized id
    rows through one union + groupby, and only five scalars reach the
    driver."""
    import ray.data

    ex = ngram_jaccard_pairs(sf_dir)
    mh = minhash_dedup(sf_dir)

    def truth(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc": df["id_b"].astype("int64"),
            "is_true": np.ones(len(df), dtype="int64"),
            "is_flag": np.zeros(len(df), dtype="int64")})

    def flagged(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc": df["doc_id"].astype("int64"),
            "is_true": np.zeros(len(df), dtype="int64"),
            "is_flag": np.ones(len(df), dtype="int64")})

    def per_doc(g: pd.DataFrame) -> pd.DataFrame:
        t = int(g["is_true"].max())
        f = int(g["is_flag"].max())
        return pd.DataFrame({"t": pd.Series([t], dtype="int64"),
                             "f": pd.Series([f], dtype="int64"),
                             "h": pd.Series([t & f], dtype="int64")})

    u = ex.map_batches(truth, batch_format="pandas").union(
        mh.map_batches(flagged, batch_format="pandas"))
    sums = u.groupby("doc").map_groups(per_doc, batch_format="pandas") \
        .sum(on=["t", "f", "h"])
    n_t = int(sums["sum(t)"]) if sums else 0
    n_f = int(sums["sum(f)"]) if sums else 0
    n_h = int(sums["sum(h)"]) if sums else 0
    return ray.data.from_arrow(pa.table({
        "n_true": pa.array([n_t], pa.int64()),
        "n_flagged": pa.array([n_f], pa.int64()),
        "n_hit": pa.array([n_h], pa.int64()),
        "recall_permille": pa.array(
            [n_h * 1000 // n_t if n_t else 0], pa.int64()),
        "precision_permille": pa.array(
            [n_h * 1000 // n_f if n_f else 0], pa.int64())}))


def chunk_dedup_stats(sf_dir: str, size: int = CHUNK_CHARS,
                      stride: int = CHUNK_STRIDE):
    """(n_chunks, n_distinct, n_dup_instances, dup_permille): corpus
    chunk-duplication profile — how much of the chunked corpus is
    verbatim-repeated content at chunk granularity (the Lee et al.
    '21 dedup signal at the RAG/window unit instead of whole docs).
    A chunk INSTANCE is duplicated when its digest occurs ≥ 2 times
    corpus-wide; dup_permille = 1000 · n_dup_instances // n_chunks.

    Scale shape: one digest-keyed groupby-count (16-byte keys + a
    count travel, never chunk text), then in-batch partials over the
    counts table fold four scalars — no join, nothing corpus-sized on
    the driver."""
    import ray.data

    counts = doc_chunks(sf_dir, size=size, stride=stride) \
        .groupby("chunk_md5").count()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = df["count()"].to_numpy()
        return pd.DataFrame({
            "n_chunks": pd.Series([int(c.sum())], dtype="int64"),
            "n_distinct": pd.Series([len(c)], dtype="int64"),
            "n_dup": pd.Series([int(c[c >= 2].sum())], dtype="int64")})

    sums = counts.map_batches(partial, batch_format="pandas") \
        .sum(on=["n_chunks", "n_distinct", "n_dup"])
    nc = int(sums["sum(n_chunks)"]) if sums else 0
    nd = int(sums["sum(n_distinct)"]) if sums else 0
    du = int(sums["sum(n_dup)"]) if sums else 0
    return ray.data.from_arrow(pa.table({
        "n_chunks": pa.array([nc], pa.int64()),
        "n_distinct": pa.array([nd], pa.int64()),
        "n_dup_instances": pa.array([du], pa.int64()),
        "dup_permille": pa.array([du * 1000 // nc if nc else 0],
                                 pa.int64())}))


def chunk_dedup_oracle_sql(size: int = CHUNK_CHARS,
                           stride: int = CHUNK_STRIDE) -> str:
    """Digest-count CTE over the chunking oracle, scalar rollup."""
    return (
        f"WITH c AS ({doc_chunks_oracle_sql(size, stride)}), "
        "g AS (SELECT chunk_md5, count(*)::BIGINT AS c FROM c "
        "GROUP BY chunk_md5), "
        "s AS (SELECT coalesce(sum(c), 0)::BIGINT AS n_chunks, "
        "count(*)::BIGINT AS n_distinct, "
        "coalesce(sum(CASE WHEN c >= 2 THEN c ELSE 0 END), 0)::BIGINT "
        "AS n_dup FROM g) "
        "SELECT n_chunks, n_distinct, n_dup AS n_dup_instances, "
        "CASE WHEN n_chunks > 0 THEN n_dup * 1000 // n_chunks "
        "ELSE 0 END::BIGINT AS dup_permille FROM s")


def doc_novelty(sf_dir: str):
    """(doc_id, n_grams, n_novel, novelty_permille): per-document
    NOVELTY — of the doc's distinct word-3-gram keys, how many first
    occur in THIS doc (first = smallest doc_id containing the gram).
    The marginal-contribution curve behind data-mixing decisions: a
    doc whose novelty is near zero adds nothing the earlier corpus
    does not already contain (the per-doc form of the Heaps saturation
    signal :func:`vocab_growth` reports corpus-wide).

    Scale shape: ALL native aggregates, no per-gram map_groups and no
    join — n_grams is exact map-side (a doc's text lives in one row);
    novel counts come from ``groupby(gram).min(doc_id)`` (THE
    vocabulary-sized shuffle of fixed-width int rows, the
    :func:`vocab_growth` exchange) re-aggregated as a count per
    first_doc; the two doc-keyed partials merge in one grouped sum."""
    import ray
    import ray.data

    docs = _read_docs(sf_dir, ["doc_id", "text"])

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        ids, grams = [], []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            sh = shingle_hashes(text)
            ids.extend([int(doc_id)] * sh.shape[0])
            grams.extend(sh.tolist())
        return pd.DataFrame({"gram": pd.Series(grams, dtype="int64"),
                             "doc_id": pd.Series(ids, dtype="int64")})

    gram_pairs = docs.map_batches(pairs, batch_format="pandas")

    def totals(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("doc_id", as_index=False).agg(n=("gram", "size"))
        g["novel"] = np.int64(0)
        return g.astype({"doc_id": "int64", "n": "int64"})

    def novels(df: pd.DataFrame) -> pd.DataFrame:
        # same block type as `totals` (union requires homogeneity)
        return pd.DataFrame({
            "doc_id": df["min(doc_id)"].astype("int64"),
            "n": np.zeros(len(df), dtype=np.int64),
            "novel": np.ones(len(df), dtype=np.int64)})

    novel_part = gram_pairs.groupby("gram").min("doc_id") \
        .map_batches(novels, batch_format="pandas")
    per_doc = gram_pairs.map_batches(totals, batch_format="pandas") \
        .union(novel_part) \
        .groupby("doc_id").aggregate(
            ray.data.aggregate.Sum("n"), ray.data.aggregate.Sum("novel"))

    def fin(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        n = t.column("sum(n)").cast(pa.int64())
        nv = t.column("sum(novel)").cast(pa.int64())
        pm = pc.if_else(pc.greater(n, 0),
                        pc.divide(pc.multiply(nv, 1000), n),
                        pa.scalar(0, pa.int64()))
        return pa.table({"doc_id": t.column("doc_id"),
                         "n_grams": n, "n_novel": nv,
                         "novelty_permille": pm.cast(pa.int64())})

    return per_doc.map_batches(fin, batch_format="pyarrow")


def doc_novelty_oracle_sql() -> str:
    """min(doc_id) per gram key, per-doc novel counts, integer
    permille; docs with no shingles are absent, same as the Ray
    side.  Shingle keys = the md5-31-bit word-3-gram ints every
    dedup oracle shares (ngram_jaccard_oracle_sql's sh CTE)."""
    return (
        "WITH t AS (SELECT doc_id, "
        "regexp_extract_all(lower(text), '\\S+') AS toks "
        "FROM documents), "
        "sh0 AS (SELECT doc_id, CASE WHEN len(toks) >= 3 THEN "
        "list_transform(range(1, len(toks) - 1), i -> "
        "toks[CAST(i AS INT)] || ' ' || toks[CAST(i AS INT) + 1] || "
        "' ' || toks[CAST(i AS INT) + 2]) "
        "WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')] "
        "ELSE [] END AS grams FROM t), "
        "g AS (SELECT doc_id, unnest(list_distinct(list_transform("
        "grams, x -> CAST(md5_number_lower(x) & 2147483647::UBIGINT "
        "AS BIGINT)))) AS gram FROM sh0), "
        "f AS (SELECT gram, min(doc_id) AS first_doc FROM g "
        "GROUP BY gram), "
        "p AS (SELECT g.doc_id, count(*)::BIGINT AS n_grams, "
        "sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)"
        "::BIGINT AS n_novel FROM g JOIN f USING (gram) "
        "GROUP BY g.doc_id) "
        "SELECT doc_id, n_grams, n_novel, "
        "(n_novel * 1000 // n_grams)::BIGINT AS novelty_permille "
        "FROM p")


class SourceLangId(LangId):
    """LangId carrying the source column through — setup (profiles)
    inherited, built once per worker like every stateful stage."""

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "source": df["source"],
            "lang_pred": [self.predict(t) for t in df["text"]],
            "n": np.int64(1)})
        return g.groupby(["source", "lang_pred"], as_index=False).agg(
            n=("n", "sum")).astype({"n": "int64"})


def source_lang_purity(sf_dir: str):
    """(source, n_docs, top_lang, top_permille, n_langs): language
    PURITY per source — the mixing-table sanity check (a 'web-en'
    source whose top language drops below ~900‰ has an ingestion or
    lang-ID drift problem; per-source purity is tracked per snapshot
    in production corpus reports).  top = (count desc, lang asc)
    deterministic; permille integer.

    Scale shape: the same stateful LangId actor stage with in-batch
    (source, lang) partials, one sources×langs-sized grouped sum, and
    a sources-sized top pick — nothing doc-sized shuffles."""
    import ray
    import ray.data

    from ._util import task_udf

    counts = _read_docs(sf_dir, ["doc_id", "source", "text"]) \
        .map_batches(task_udf(SourceLangId), batch_format="pandas") \
        .groupby(["source", "lang_pred"]).sum("n")

    def top(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sum(n)", "lang_pred"],
                          ascending=[False, True], kind="mergesort")
        tot = int(g["sum(n)"].sum())
        best = int(g["sum(n)"].iloc[0])
        return pd.DataFrame({
            "source": [g["source"].iloc[0]],
            "n_docs": pd.Series([tot], dtype="int64"),
            "top_lang": [g["lang_pred"].iloc[0]],
            "top_permille": pd.Series([best * 1000 // tot],
                                      dtype="int64"),
            "n_langs": pd.Series([len(g)], dtype="int64")})

    return counts.groupby("source").map_groups(
        top, batch_format="pandas")


def source_lang_purity_oracle_sql(langid_sql: str) -> str:
    """Composes the full doc_langid decision SQL, joins source, window
    top pick with the same tie-break."""
    return (
        f"WITH l AS ({langid_sql}), "
        "j AS (SELECT d.source, l.lang_pred FROM l "
        "JOIN documents d ON d.doc_id = l.doc_id), "
        "c AS (SELECT source, lang_pred, count(*)::BIGINT AS n FROM j "
        "GROUP BY source, lang_pred), "
        "r AS (SELECT source, lang_pred, n, "
        "row_number() OVER (PARTITION BY source "
        "ORDER BY n DESC, lang_pred) AS rk, "
        "sum(n) OVER (PARTITION BY source) AS tot, "
        "count(*) OVER (PARTITION BY source) AS nl FROM c) "
        "SELECT source, tot::BIGINT AS n_docs, lang_pred AS top_lang, "
        "(n * 1000 // tot)::BIGINT AS top_permille, "
        "nl::BIGINT AS n_langs FROM r WHERE rk = 1")


def pmi_bigrams(sf_dir: str, k: int = 50):
    """(bigram, n_xy, n_x, n_y, pmi_scaled): pointwise mutual
    information for the corpus's top-k bigrams — WIMBD-style
    collocation mining (the signal tokenizer-vocab and phrase-table
    builders read: a high-PMI bigram is a unit, a low-PMI frequent
    bigram is just two frequent words).  pmi_scaled is the integer
    ``(10^6 · n_xy · N) // (n_x · n_y)`` — 10^6 × the probability
    ratio e^PMI, exact in arbitrary-precision ints on the k-row
    driver-side tail (the oracle multiplies through HUGEINT).

    Scale shape: bigram selection is :func:`top_bigrams` (Misra-Gries
    + exact verify — no token-stream shuffle); the ≤ 2k member words
    broadcast once and ONE map-only pass counts them (vectorized
    np.isin) plus the token total; everything after is k-row driver
    arithmetic."""
    import ray
    import ray.data

    tb = collect_df(top_bigrams(sf_dir, k=k))
    if tb.empty:
        return ray.data.from_arrow(pa.table({
            "bigram": pa.array([], pa.string()),
            "n_xy": pa.array([], pa.int64()),
            "n_x": pa.array([], pa.int64()),
            "n_y": pa.array([], pa.int64()),
            "pmi_scaled": pa.array([], pa.int64())}))
    words = np.unique(np.concatenate(
        [tb["token"].str.split(" ").str[0].to_numpy(dtype=object),
         tb["token"].str.split(" ").str[1].to_numpy(dtype=object)]
    ).astype(str))
    wref = ray.put(words)  # sorted (np.unique) member-word array

    def count_words(df: pd.DataFrame, _r=wref) -> pd.DataFrame:
        w = ray.get(_r)
        toks = np.concatenate(
            [_gram_findall(t, 1) for t in df["text"]] or [[]])
        total = toks.shape[0]
        if total == 0:
            hit_u, hit_c = np.array([], dtype=object), \
                np.array([], dtype=np.int64)
        else:
            m = np.isin(toks, w)
            hit_u, hit_c = np.unique(toks[m], return_counts=True)
        out = pd.DataFrame({"w": pd.Series(hit_u, dtype="object"),
                            "c": pd.Series(hit_c, dtype="int64"),
                            "is_total": False})
        out.loc[len(out)] = {"w": "", "c": np.int64(total),
                             "is_total": True}
        return out

    parts = collect_df(_read_docs(sf_dir, ["text"]).map_batches(
        count_words, batch_format="pandas"))
    n_total = int(parts.loc[parts["is_total"], "c"].sum())
    uc = parts.loc[~parts["is_total"]].groupby("w")["c"].sum().to_dict()

    rows = {"bigram": [], "n_xy": [], "n_x": [], "n_y": [],
            "pmi_scaled": []}
    for t, n_xy in zip(tb["token"], tb["cnt"]):
        w1, w2 = t.split(" ", 1)
        n_x, n_y = int(uc.get(w1, 0)), int(uc.get(w2, 0))
        rows["bigram"].append(t)
        rows["n_xy"].append(int(n_xy))
        rows["n_x"].append(n_x)
        rows["n_y"].append(n_y)
        rows["pmi_scaled"].append(
            (1_000_000 * int(n_xy) * n_total) // (n_x * n_y)
            if n_x and n_y else 0)
    return ray.data.from_arrow(pa.table({
        "bigram": pa.array(rows["bigram"], pa.string()),
        "n_xy": pa.array(rows["n_xy"], pa.int64()),
        "n_x": pa.array(rows["n_x"], pa.int64()),
        "n_y": pa.array(rows["n_y"], pa.int64()),
        "pmi_scaled": pa.array(rows["pmi_scaled"], pa.int64())}))


def pmi_oracle_sql(k: int = 50) -> str:
    """DuckDB replay: the top_bigrams CTE chain + unigram counts +
    the same integer formula through HUGEINT intermediates."""
    return (
        "WITH t AS (SELECT regexp_extract_all(text, '\\S+') AS toks "
        "FROM documents), "
        "tok AS (SELECT unnest(toks) AS w FROM t), "
        "n AS (SELECT count(*)::BIGINT AS total FROM tok), "
        "uc AS (SELECT w, count(*)::BIGINT AS c FROM tok GROUP BY w), "
        "bg AS (SELECT toks[CAST(i AS INT)] || ' ' || "
        "toks[CAST(i + 1 AS INT)] AS token "
        "FROM t, UNNEST(range(1, len(toks))) AS u(i)), "
        "c AS (SELECT token, count(*)::BIGINT AS cnt FROM bg "
        "GROUP BY token), "
        "r AS (SELECT token, cnt, row_number() OVER "
        "(ORDER BY cnt DESC, token) AS rank FROM c), "
        f"top AS (SELECT token, cnt FROM r WHERE rank <= {k}), "
        "s AS (SELECT token, cnt, split_part(token, ' ', 1) AS w1, "
        "split_part(token, ' ', 2) AS w2 FROM top) "
        "SELECT s.token AS bigram, s.cnt AS n_xy, "
        "u1.c AS n_x, u2.c AS n_y, "
        "((1000000::HUGEINT * s.cnt * n.total) // "
        "(u1.c::HUGEINT * u2.c))::BIGINT AS pmi_scaled "
        "FROM s, n "
        "JOIN uc u1 ON u1.w = s.w1 JOIN uc u2 ON u2.w = s.w2")
