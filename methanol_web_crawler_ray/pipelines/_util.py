"""Small shared helpers for the pipeline modules."""

from __future__ import annotations

from typing import Dict

# process-level stage-instance cache: Ray reuses worker processes across
# tasks, so a stateful-but-cheap stage (state = a ray.put ref + a few
# scalars) can run as a plain TASK UDF — scheduled on every free CPU —
# instead of a pinned-concurrency actor pool that starves at 32 cpus
# (round-2 VERDICT item 2: ann_topk 1.56 s → 3.65 s on 2 actors).
_UDF_CACHE: Dict = {}


def task_udf(cls, *args):
    """Wrap a callable stage class as a per-process-memoized plain
    function for map_batches.  `cls(*args)` runs once per worker process
    (first task that lands there), then every subsequent task reuses the
    instance — the `bulk.py` _CTX_CACHE pattern generalized.  Use for
    stages whose state is an ObjectRef (zero-copy from plasma) or cheap
    to build; keep real actor pools for expensive per-actor state."""

    def _key_part(a):
        return a.hex() if hasattr(a, "hex") and not isinstance(a, bytes) \
            else a

    key = (cls.__module__, cls.__qualname__,
           tuple(_key_part(a) for a in args))

    def fn(batch):
        inst = _UDF_CACHE.get(key)
        if inst is None:
            inst = cls(*args)
            _UDF_CACHE[key] = inst
            if len(_UDF_CACHE) > 32:
                _UDF_CACHE.pop(next(iter(_UDF_CACHE)))
        return inst(batch)

    return fn


_NONEMPTY_TASK = None


def materialize_clean(ds, schema):
    """``materialize()`` that DROPS schema-less empty blocks.

    Ray's hash aggregate and hash join emit one block per partition;
    empty partitions yield 0-column blocks that ``map_batches`` SKIPS
    (so ensure_schema cannot rewrite them) and that later hash joins
    choke on ("No match for key field reference ... on right side").
    Emptiness is checked by a colocated zero-copy task per block —
    surviving blocks keep their original object refs (no copy)."""
    import ray
    import ray.data

    global _NONEMPTY_TASK
    if _NONEMPTY_TASK is None:
        @ray.remote(num_cpus=0)
        def _nonempty(t) -> bool:
            return t.num_columns > 0

        _NONEMPTY_TASK = _nonempty

    mat = ds.materialize()
    refs = mat.to_arrow_refs()
    if not refs:
        return ray.data.from_arrow(schema.empty_table())
    keep = ray.get([_NONEMPTY_TASK.remote(r) for r in refs])
    if all(keep):
        return mat
    kept = [r for r, ok in zip(refs, keep) if ok]
    if not kept:
        return ray.data.from_arrow(schema.empty_table())
    return ray.data.from_arrow_refs(kept)


def ensure_schema(ds, schema):
    """Pin every block to ``schema`` (a pyarrow.Schema).  Ray's hash
    aggregate can emit EMPTY blocks with an EMPTY schema; a downstream
    hash join then fails with "No match for key field reference" when
    such a block reaches its build side.  Non-empty blocks are cast
    column-by-column, empty ones synthesized from the schema."""
    import pyarrow as pa

    def _f(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return schema.empty_table()
        return pa.table({f.name: t.column(f.name).cast(f.type)
                         for f in schema})

    return ds.map_batches(_f, batch_format="pyarrow")


def rename(ds, mapping: Dict[str, str]):
    """Dataset.rename_columns chokes on pandas-formatted blocks coming out
    of groupby().aggregate() (ray 2.49); renaming via an Arrow map_batches
    is robust and stays zero-copy."""
    def _r(tbl):
        names = [mapping.get(n, n) for n in tbl.column_names]
        return tbl.rename_columns(names)

    return ds.map_batches(_r, batch_format="pyarrow")
