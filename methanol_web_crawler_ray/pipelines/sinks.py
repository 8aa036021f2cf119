"""Output sinks — the Methanol master's MySQL tables as Parquet.

  - target sink (S8/S9): the master's per-filetype ``ft_<name>`` tables
    (mn-masterd/main.c:490-621: one row per unique SHA1(url), one column
    per declared attribute) become one Parquet directory per filetype with
    columns (url, url_hash, date, <attr>...), exact-deduped on url_hash
    via groupby().map_groups(first) — SURVEY §2 A4/D2.
  - crawl-log sink (S10): ``nol_url`` (hash PRIMARY KEY, url, date;
    mn-masterd/main.c:341-348, upsert mn-slaved/client.c:510-557) becomes
    an append-only Parquet log partitioned by round, deduped at read with
    the same groupby-first.
  - writefile handler analog (S7, lm_handler_writefile builtin.c:63-133):
    payload columns stream to Parquet keyed by url_hash — key-unique by
    construction instead of the reference's ``name-1.ext`` probing.

All sinks are streaming ``write_parquet`` consumers; nothing funnels
through the driver.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional

import pyarrow as pa


def _first_by_hash(tbl: pa.Table) -> pa.Table:
    """Per-group first (deterministic: lowest date, then url) — the SQL
    UNIQUE-key upsert's keep-first semantics."""
    import pyarrow.compute as pc

    idx = pc.sort_indices(
        tbl, sort_keys=[("url_hash", "ascending"), ("date", "ascending"),
                        ("url", "ascending")]
    )
    tbl = tbl.take(idx)
    mask = [True] * tbl.num_rows
    hashes = tbl.column("url_hash").to_pylist()
    for i in range(1, len(hashes)):
        if hashes[i] == hashes[i - 1]:
            mask[i] = False
    return tbl.filter(pa.array(mask))


def write_targets(ckpt_dir: str, out_dir: str, cfg=None) -> Dict[str, int]:
    """Fold a crawl checkpoint's target rows into per-filetype Parquet
    dirs (ft_<name>/...), exact-deduped on url_hash.

    The shuffle key is url_hash (groupby) and runs as a Ray Data pipeline;
    attribute values become one column per declared attribute.  The
    column set per filetype comes from the config's DECLARED attributes
    (``cfg.filetypes[ft].attributes`` — the master's CREATE TABLE,
    mn-masterd/main.c:490-621) so every batch writes the same schema;
    without a cfg the attribute-key union is computed once per filetype
    up front (still one stable schema per dir).  ``date`` is the crawl
    round the target was first reported in.
    """
    import pyarrow.compute as pc
    import pyarrow.dataset as pads
    import ray.data

    rounds = sorted(
        d for d in os.listdir(ckpt_dir)
        if d.startswith("round_")
        and os.path.exists(os.path.join(ckpt_dir, d, "_COMPLETE"))
    )
    if not rounds:
        return {}
    import glob as _glob

    paths = [
        f for d in rounds
        for f in sorted(_glob.glob(os.path.join(ckpt_dir, d, "result", "*.parquet")))
    ]
    ds = ray.data.read_parquet(paths)
    targets = ds.filter(lambda r: r["kind"] == "target")

    def explode(tbl: pa.Table) -> pa.Table:
        urls, hashes, fts, dates, attrs_json = [], [], [], [], []
        for url, name, n, payload in zip(
            tbl.column("url").to_pylist(),
            tbl.column("name").to_pylist(),
            tbl.column("n").to_pylist(),
            tbl.column("payload").to_pylist(),
        ):
            p = pickle.loads(payload)
            urls.append(url)
            hashes.append(p["url_hash"])
            fts.append(name)
            dates.append(int(n or 0))
            attrs_json.append(pickle.dumps(p["attrs"]))
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "url_hash": pa.array(hashes, pa.string()),
                "filetype": pa.array(fts, pa.string()),
                "date": pa.array(dates, pa.int64()),
                "attrs": pa.array(attrs_json, pa.large_binary()),
            }
        )

    flat = targets.map_batches(explode, batch_format="pyarrow")

    def dedup_group(tbl: pa.Table) -> pa.Table:
        return _first_by_hash(tbl)

    deduped = flat.groupby("url_hash").map_groups(
        dedup_group, batch_format="pyarrow"
    ).materialize()

    counts: Dict[str, int] = {}
    for ft in set(deduped.unique("filetype")):
        sub = deduped.filter(lambda r, ft=ft: r["filetype"] == ft)
        # one FIXED column set per filetype dir — declared attributes
        # when a config is given, else the observed union (computed once,
        # up front; key-name rows only, not payloads)
        if cfg is not None and ft in cfg.filetypes:
            attr_names = sorted(cfg.filetypes[ft].attributes)
        else:
            def keys_only(tbl: pa.Table) -> pa.Table:
                ks = sorted({k for b in tbl.column("attrs").to_pylist()
                             for k in pickle.loads(b)})
                return pa.table({"k": pa.array(ks, pa.string())})

            attr_names = sorted(
                sub.map_batches(keys_only, batch_format="pyarrow")
                .unique("k")
            )

        def widen(tbl: pa.Table, attr_names=tuple(attr_names)) -> pa.Table:
            rows = tbl.to_pylist()
            cols = {
                "url": pa.array([r["url"] for r in rows], pa.string()),
                "url_hash": pa.array([r["url_hash"] for r in rows],
                                     pa.string()),
                "date": pa.array([r["date"] for r in rows], pa.int64()),
            }
            for a in attr_names:
                # attr values are bytes (attr.c k→bytes map)
                cols[f"attr_{a}"] = pa.array(
                    [pickle.loads(r["attrs"]).get(a) for r in rows],
                    pa.large_binary(),
                )
            return pa.table(cols)

        sub.map_batches(widen, batch_format="pyarrow").write_parquet(
            os.path.join(out_dir, f"ft_{ft}")
        )
        counts[ft] = sub.count()
    return counts


def write_crawl_log(ckpt_dir: str, out_dir: str) -> int:
    """nol_url analog: (url_hash, url, round) appended per round,
    partitioned by round — dedup happens at read (read_crawl_log)."""
    import ray.data

    from .hostloop import url_hash

    rounds = sorted(
        d for d in os.listdir(ckpt_dir)
        if d.startswith("round_")
        and os.path.exists(os.path.join(ckpt_dir, d, "_COMPLETE"))
    )
    total = 0
    for d in rounds:
        src = os.path.join(ckpt_dir, d, "result")
        ds = ray.data.read_parquet(src).filter(lambda r: r["kind"] == "visit")

        def log_rows(tbl: pa.Table) -> pa.Table:
            urls = tbl.column("url").to_pylist()
            rounds_col = tbl.column("n").to_pylist()
            return pa.table(
                {
                    "url_hash": pa.array([url_hash(u) for u in urls]),
                    "url": pa.array(urls, pa.string()),
                    "round": pa.array(
                        [int(r or 0) for r in rounds_col], pa.int64()),
                }
            )

        out = ds.map_batches(log_rows, batch_format="pyarrow")
        n = out.count()
        if n:
            out.write_parquet(os.path.join(out_dir, d))
        total += n
    return total


def read_crawl_log(out_dir: str):
    """Read the log deduped on url_hash (first round wins)."""
    import ray.data

    ds = ray.data.read_parquet(out_dir)

    def first(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        idx = pc.sort_indices(tbl, sort_keys=[("round", "ascending"),
                                              ("url", "ascending")])
        return tbl.take(idx).slice(0, 1)

    return ds.groupby("url_hash").map_groups(first, batch_format="pyarrow")


def export_corpus(pages_dir: str, out_dir: str) -> Dict[str, int]:
    """RESUMABLE corpus export: stream (url, text) to Parquet
    partitioned by the store's host bucket, with a per-bucket
    completion marker — a re-run after a mid-export failure skips every
    finished bucket, removes partials of unfinished ones, and writes
    only what's missing (never one giant file, never start-over).

    Returns {"written": n_buckets_written, "skipped": n_skipped}.

    Scale shape: one streaming write per run covering ALL missing
    buckets at once (filter-pruned read → write_parquet with
    partition_cols, full pipeline parallelism inside); resume
    granularity is the bucket, the same unit the store is partitioned
    by, so a 256-node run that dies 80 % through redoes ≤ the open
    buckets."""
    import shutil

    import pyarrow.compute as pc
    import pyarrow.dataset as pads
    import ray.data

    from ..sources.pagestore import build_store

    store = build_store(pages_dir)
    buckets = sorted(
        int(b) for b in pads.dataset(store, partitioning="hive")
        .to_table(columns=["b"]).column("b").unique().to_pylist())
    os.makedirs(out_dir, exist_ok=True)

    def marker(b: int) -> str:
        return os.path.join(out_dir, f"_DONE.{b}")

    missing = [b for b in buckets if not os.path.exists(marker(b))]
    skipped = len(buckets) - len(missing)
    if not missing:
        return {"written": 0, "skipped": skipped}
    for b in missing:  # partials from a crashed previous run
        shutil.rmtree(os.path.join(out_dir, f"bucket={b}"),
                      ignore_errors=True)

    ds = ray.data.read_parquet(store, columns=["url", "body", "b",
                                               "content_type"])

    def keep(batch: pa.Table) -> pa.Table:
        from ..functions.textconv import extract_text

        t = batch.filter(pc.is_in(batch.column("b"),
                                  pa.array(missing, pa.int64())))
        texts = [
            extract_text(bd or b"", c).decode("utf-8", "surrogateescape")
            for bd, c in zip(t.column("body").to_pylist(),
                             t.column("content_type").to_pylist())]
        return pa.table({"url": t.column("url"),
                         "text": pa.array(texts, pa.string()),
                         "bucket": t.column("b")})

    ds.map_batches(keep, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["bucket"])
    for b in missing:
        open(marker(b), "w").close()
    return {"written": len(missing), "skipped": skipped}
