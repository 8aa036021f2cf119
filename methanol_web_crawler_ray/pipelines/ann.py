"""Similarity search over the ``embeddings`` table (vec_id,
embedding: list<float>, label).

* ``ann_topk`` — brute-force cosine top-k: the query matrix is broadcast
  ONCE via ``ray.put``; every batch does one numpy matmul against it and
  emits its local top-k; a final small sort merges.  At 100 TB this is
  the exact broadcast-small-side pattern (queries ≪ corpus) — per-batch
  work is O(batch × q × d) dense math, shuffle is only the per-batch
  top-k rows.
* ``ann_topk_lsh`` — the scale path: random-hyperplane LSH (Charikar '02
  SimHash for cosine) buckets the corpus; queries probe only their
  bucket (+ multiprobe neighbors), trading recall for a corpus-sized
  scan.  Bucketing is a one-time map_batches; probing touches only
  matching buckets.
* ``embedding_neardup`` — cosine ≥ threshold near-duplicate pairs via
  the same LSH buckets.
"""

from __future__ import annotations

from ._util import rename as _rename
from typing import Dict, List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa


def _read_emb(sf_dir: str):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")


def _to_matrix(col) -> np.ndarray:
    return np.asarray([np.asarray(v, dtype=np.float64) for v in col])


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def load_queries(sf_dir: str, n_queries: int = 5) -> Dict[int, np.ndarray]:
    """The benchmark query set: the first n vec_ids (deterministic)."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet")
    out = {}
    for r in tbl.slice(0, n_queries).to_pylist():
        out[r["vec_id"]] = np.asarray(r["embedding"], dtype=np.float64)
    return out


class BruteForceScore:
    """map_batches stage: one matmul per batch against the broadcast
    query matrix; emits each batch's local top-k per query."""

    def __init__(self, queries_ref, k: int):
        import ray

        q: Dict[int, np.ndarray] = ray.get(queries_ref)
        self.qids = sorted(q)
        self.Q = _normalize(np.stack([q[i] for i in self.qids]))  # (nq, d)
        self.k = k

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        M = _normalize(_to_matrix(df["embedding"]))  # (n, d)
        sims = M @ self.Q.T  # (n, nq)
        vec_ids = df["vec_id"].to_numpy()
        out = {"query_id": [], "vec_id": [], "sim": []}
        for qi, qid in enumerate(self.qids):
            col = sims[:, qi]
            k = min(self.k + 1, col.shape[0])  # +1: self may be in batch
            idx = np.argpartition(-col, k - 1)[:k]
            for i in idx:
                if int(vec_ids[i]) == qid:
                    continue  # exclude the query itself
                out["query_id"].append(qid)
                out["vec_id"].append(int(vec_ids[i]))
                out["sim"].append(float(col[i]))
        return pd.DataFrame(out)


def ann_topk(sf_dir: str, k: int = 10, n_queries: int = 5):
    """(query_id, neighbor_id, rank): exact cosine top-k per query.
    Ties broken by vec_id ascending (deterministic)."""
    import ray

    queries_ref = ray.put(load_queries(sf_dir, n_queries))
    partial = _read_emb(sf_dir).map_batches(
        BruteForceScore, fn_constructor_args=(queries_ref, k),
        batch_format="pandas", concurrency=2,
    )
    # final merge: the partial top-k set is tiny → driver-side rank
    df = partial.to_pandas()
    df = df.sort_values(["query_id", "sim", "vec_id"],
                        ascending=[True, False, True])
    df["rank"] = df.groupby("query_id").cumcount() + 1
    df = df[df["rank"] <= k]
    out = df[["query_id", "vec_id", "rank"]].rename(
        columns={"vec_id": "neighbor_id"}
    ).reset_index(drop=True)
    import ray.data

    return ray.data.from_pandas(out)


# ---------------------------------------------------------------------------
# LSH (random hyperplanes)

N_PLANES = 6  # few planes + radius-2 multiprobe: random-data neighbors
# are weakly correlated, so recall needs generous probing


def _planes(dim: int, n_planes: int = N_PLANES) -> np.ndarray:
    rng = np.random.default_rng(4242)
    return rng.standard_normal((n_planes, dim))


def _bucket_of(M: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (M @ planes.T) > 0  # (n, p)
    return (bits * (1 << np.arange(planes.shape[0]))).sum(axis=1)


def ann_topk_lsh(sf_dir: str, k: int = 10, n_queries: int = 5,
                 multiprobe: int = 2):
    """Approximate top-k: probe the query's hyperplane bucket (plus
    single-bit-flip neighbors).  Recall measured in tests vs ann_topk."""
    import ray
    import ray.data

    queries = load_queries(sf_dir, n_queries)
    dim = len(next(iter(queries.values())))
    planes = _planes(dim)

    # probe set per query
    probe: Dict[int, set] = {}
    for qid, v in queries.items():
        b = int(_bucket_of(v[None, :], planes)[0])
        s = {b}
        if multiprobe >= 1:
            for bit in range(N_PLANES):
                s.add(b ^ (1 << bit))
        if multiprobe >= 2:
            for i in range(N_PLANES):
                for j in range(i + 1, N_PLANES):
                    s.add(b ^ (1 << i) ^ (1 << j))
        probe[qid] = s
    all_buckets = set().union(*probe.values())
    queries_ref = ray.put((queries, planes, probe))

    class Probe:
        def __init__(self, ref, k):
            self.queries, self.planes, self.probe = ray.get(ref)
            self.qids = sorted(self.queries)
            self.Q = _normalize(np.stack([self.queries[i] for i in self.qids]))
            self.k = k
            self.buckets = set().union(*self.probe.values())

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            M = _to_matrix(df["embedding"])
            bk = _bucket_of(M, self.planes)
            mask = np.isin(bk, list(self.buckets))
            out = {"query_id": [], "vec_id": [], "sim": []}
            if not mask.any():
                return pd.DataFrame(out)
            Mn = _normalize(M[mask])
            ids = df["vec_id"].to_numpy()[mask]
            bks = bk[mask]
            sims = Mn @ self.Q.T
            for qi, qid in enumerate(self.qids):
                pb = self.probe[qid]
                for i in range(ids.shape[0]):
                    if int(bks[i]) in pb and int(ids[i]) != qid:
                        out["query_id"].append(qid)
                        out["vec_id"].append(int(ids[i]))
                        out["sim"].append(float(sims[i, qi]))
            return pd.DataFrame(out)

    partial = _read_emb(sf_dir).map_batches(
        Probe, fn_constructor_args=(queries_ref, k),
        batch_format="pandas", concurrency=2,
    )
    df = partial.to_pandas()
    if df.empty:
        return ray.data.from_arrow(pa.table(
            {"query_id": pa.array([], pa.int64()),
             "neighbor_id": pa.array([], pa.int64()),
             "rank": pa.array([], pa.int64())}))
    df = df.sort_values(["query_id", "sim", "vec_id"],
                        ascending=[True, False, True])
    df["rank"] = df.groupby("query_id").cumcount() + 1
    df = df[df["rank"] <= k]
    return ray.data.from_pandas(
        df[["query_id", "vec_id", "rank"]]
        .rename(columns={"vec_id": "neighbor_id"}).reset_index(drop=True)
    )


def embedding_neardup(sf_dir: str, threshold: float = 0.98):
    """(vec_id, dup_of): cosine ≥ threshold pairs via LSH buckets —
    shingle-free near-dup for embedded corpora."""
    import ray.data

    ds = _read_emb(sf_dir)

    # bucket stage (vectorized)
    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        M = _to_matrix(df["embedding"])
        planes = _planes(M.shape[1], 8)  # coarser: 8 planes → 256 buckets
        return pd.DataFrame(
            {
                "vec_id": df["vec_id"],
                "bucket": _bucket_of(M, planes).astype("int64"),
                "embedding": df["embedding"],
            }
        )

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        M = _normalize(_to_matrix(df["embedding"]))
        ids = df["vec_id"].to_numpy()
        order = np.argsort(ids)
        M, ids = M[order], ids[order]
        sims = M @ M.T
        a, b = [], []
        n = ids.shape[0]
        for i in range(n):
            for j in range(i + 1, n):
                if sims[i, j] >= threshold:
                    a.append(int(ids[i]))
                    b.append(int(ids[j]))
        return pd.DataFrame({"dup_of": a, "vec_id": b})

    out = ds.map_batches(bucket, batch_format="pandas") \
            .groupby("bucket").map_groups(pairs, batch_format="pandas")
    if out.count() == 0:
        import ray.data

        return ray.data.from_arrow(pa.table(
            {"vec_id": pa.array([], pa.int64()),
             "dup_of": pa.array([], pa.int64())}))
    res = out.groupby("vec_id").min("dup_of")
    return _rename(res, {"min(dup_of)": "dup_of"})
