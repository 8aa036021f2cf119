"""Local emulation of the driver's correctness gate: run each queries()
entry AND its oracle_sql() on the same sf dir, compare row count, schema
(column names) and a value hash (columns sorted by name, rows sorted).

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_df(res):
    import pandas as pd
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def canon(v):
    if isinstance(v, (bytes, bytearray)):
        # The DRIVER's gate sorts raw columns with pandas sort_values and
        # crashes on bytearray (unhashable) — round-2's page_xmlconv red
        # row.  Fail loudly here so a binary column never reaches the
        # driver again: queries() must emit strings (surrogateescape).
        raise TypeError(
            "binary value in gated query output — driver gate would "
            "crash; emit a string (decode utf-8/surrogateescape)")
    if isinstance(v, float):
        return f"f:{v:.10g}"
    if v is None or v != v:
        return "~"
    return str(v)


def value_hash(df):
    cols = sorted(df.columns)
    rows = sorted(
        tuple(canon(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    )
    h = hashlib.blake2b(digest_size=12)
    for r in rows:
        h.update("\x1f".join(r).encode("utf-8", "surrogateescape"))
        h.update(b"\x1e")
    return h.hexdigest()


def main():
    args = [a for a in sys.argv[1:]]
    sf = args.pop(0) if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"

    import duckdb
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import __ray_entry__ as E

    qs, osql = E.queries(), E.oracle_sql()
    names = args or sorted(set(qs) & set(osql))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    fails = 0
    for name in names:
        if name not in osql:
            print(f"{name:24s} NO_ORACLE")
            continue
        try:
            rdf = to_df(qs[name](sf))
            odf = con.sql(osql[name]).df()
            rn, on = len(rdf), len(odf)
            rs, os_ = sorted(rdf.columns), sorted(odf.columns)
            rh, oh = value_hash(rdf), value_hash(odf)
            ok = rn == on and rs == os_ and rh == oh
            print(f"{name:24s} rows={rn}/{on} schema={'OK' if rs == os_ else (rs, os_)} "
                  f"hash={'OK' if rh == oh else f'{rh}!={oh}'} "
                  f"{'PASS' if ok else 'FAIL'}")
            if not ok:
                fails += 1
                if rs == os_ and rn and on:
                    cols = sorted(rdf.columns)
                    a = {tuple(canon(v) for v in row)
                         for row in rdf[cols].itertuples(index=False, name=None)}
                    b = {tuple(canon(v) for v in row)
                         for row in odf[cols].itertuples(index=False, name=None)}
                    for r in list(a - b)[:3]:
                        print("   only-ray:   ", str(r)[:200])
                    for r in list(b - a)[:3]:
                        print("   only-oracle:", str(r)[:200])
        except Exception as e:
            fails += 1
            print(f"{name:24s} ERROR {type(e).__name__}: {str(e)[:200]}")
    ray.shutdown()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
