"""Vectorized URL canonicalization stage (SURVEY §2 M1-M4 as a reusable
map_batches transform): a ``url`` string column → parsed/canonical
columns, batch-at-a-time over Arrow.

The per-row kernel is functions/urlkit (byte-faithful to lm_url_set);
this stage is the Dataset-facing wrapper."""

from __future__ import annotations

import pyarrow as pa

from ..functions.urlkit import url_set

CANON_FIELDS = ["url", "url_canon", "host", "path", "ext", "is_dynamic",
                "protocol", "seen_key", "valid"]


def canonicalize_batch(batch: pa.Table, url_col: str = "url") -> pa.Table:
    urls = batch.column(url_col).to_pylist()
    out = {f: [] for f in CANON_FIELDS}
    for u in urls:
        parsed = url_set(u)
        out["url"].append(u)
        if parsed is None:
            for f in ("url_canon", "host", "path", "ext", "protocol",
                      "seen_key"):
                out[f].append(None)
            out["is_dynamic"].append(None)
            out["valid"].append(False)
            continue
        out["url_canon"].append(parsed.s)
        out["host"].append(parsed.host_norm)
        out["path"].append(parsed.path)
        out["ext"].append(parsed.ext)
        out["is_dynamic"].append(parsed.is_dynamic)
        out["protocol"].append(parsed.protocol)
        out["seen_key"].append(parsed.seen_key)
        out["valid"].append(True)
    return pa.table(
        {
            "url": pa.array(out["url"], pa.string()),
            "url_canon": pa.array(out["url_canon"], pa.string()),
            "host": pa.array(out["host"], pa.string()),
            "path": pa.array(out["path"], pa.string()),
            "ext": pa.array(out["ext"], pa.string()),
            "is_dynamic": pa.array(out["is_dynamic"], pa.bool_()),
            "protocol": pa.array(out["protocol"], pa.string()),
            "seen_key": pa.array(out["seen_key"], pa.string()),
            "valid": pa.array(out["valid"], pa.bool_()),
        }
    )


def canonicalize(ds, url_col: str = "url", batch_size: int = 4096):
    """Dataset[... url ...] → Dataset[CANON_FIELDS]."""
    return ds.map_batches(
        lambda t: canonicalize_batch(t, url_col),
        batch_format="pyarrow", batch_size=batch_size,
    )
