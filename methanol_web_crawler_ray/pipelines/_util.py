"""Small shared helpers for the pipeline modules."""

from __future__ import annotations

from typing import Dict


def rename(ds, mapping: Dict[str, str]):
    """Dataset.rename_columns chokes on pandas-formatted blocks coming out
    of groupby().aggregate() (ray 2.49); renaming via an Arrow map_batches
    is robust and stays zero-copy."""
    def _r(tbl):
        names = [mapping.get(n, n) for n in tbl.column_names]
        return tbl.rename_columns(names)

    return ds.map_batches(_r, batch_format="pyarrow")
