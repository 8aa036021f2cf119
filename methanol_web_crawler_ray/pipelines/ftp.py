"""FTP listing pipeline (SURVEY §2 S3/M8): synthetic multi-dialect LIST
responses → distributed parse → (listing_id, seq, name, is_dir, size).

The generator formats KNOWN entries into each dialect's layout, so the
golden table is by construction (the golden-links trick): the parser is
genuinely cross-checked, not self-compared.  Dialect families covered
(ftpparse.c:1-449): EPLF; UNIX ls with and without gid; UNIX symlinks;
NetWare; NetPresenz; Microsoft unix-style; MSDOS/NT; VMS/MultiNet; info
lines that must be ignored.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import pyarrow as pa
import pyarrow.parquet as pq

_M = ("Jan", "Feb", "Mar", "Apr", "May", "Jun",
      "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")


def _entries_for(i: int) -> List[Tuple[str, bool, int]]:
    """(name, is_dir, size) rows for listing i — pure index arithmetic."""
    out = [("readme%d.txt" % i, False, 100 + i),
           ("data%d.bin" % i, False, 4096 * (i + 1)),
           ("sub%d" % i, True, 512)]
    if i % 2:
        out.append(("extra%d.log" % i, False, 7 * i + 3))
    return out


def _format(dialect: str, name: str, is_dir: bool, size: int,
            i: int) -> List[str]:
    day = 1 + (i % 27)
    mon = i % 12
    if dialect == "eplf":
        facts = "/" if is_dir else f"r,s{size}"
        return [f"+i8388621.{4000 + i},m8242559{i % 10:02d},{facts},\t{name}"]
    if dialect == "unix":
        t = "d" if is_dir else "-"
        return [f"{t}rw-r--r--   1 owner    group  {size:>10} "
                f"{_M[mon]} {day:>2} 03:2{i % 10 % 6} {name}"]
    if dialect == "unix_nogid":
        t = "d" if is_dir else "-"
        return [f"{t}r-xr-xr-x   2 root  {size:>10} {_M[mon]} {day:>2}  1994 {name}"]
    if dialect == "unix_ms":
        t = "d" if is_dir else "-"
        return [f"{t}---------   1 owner    group  {size:>12} "
                f"{_M[mon]} {day:>2} 10:18 {name}"]
    if dialect == "symlink":
        if is_dir:
            return [f"drwxr-xr-x   2 root     other  {size:>8} "
                    f"{_M[mon]} {day:>2} 00:17 {name}"]
        return [f"lrwxrwxrwx   1 root     other  {size:>8} "
                f"{_M[mon]} {day:>2} 00:17 {name} -> usr/{name}"]
    if dialect == "netware":
        t = "d" if is_dir else "-"
        return [f"{t} [R----F--] supervisor  {size:>10}  "
                f"{_M[mon]} {day:>2} 18:53    {name}"]
    if dialect == "netpresenz":
        if is_dir:
            return [f"drwxrwxr-x               folder   {size:>6} "
                    f"{_M[mon]} {day:>2}  1996 {name}"]
        return [f"-------r--         326  139197  {size:>7} "
                f"{_M[mon]} {day:>2}  1995 {name}"]
    if dialect == "msdos":
        stamp = f"{mon + 1:02d}-{day:02d}-00  09:0{i % 10}PM"
        if is_dir:
            return [f"{stamp}       <DIR>          {name}"]
        return [f"{stamp}  {size:>15} {name}"]
    if dialect == "vms":
        nm = (name.upper().replace(".", "_") + ".DIR" if is_dir
              else name.upper())
        return [f"{nm};1      2 {day}-{_M[mon].upper()}-1996 17:4{i % 10 % 6}"
                f" [SYSTEM] (RWED,RWED,RE,RE)"]
    raise ValueError(dialect)


DIALECTS = ("eplf", "unix", "unix_nogid", "unix_ms", "symlink",
            "netware", "netpresenz", "msdos", "vms")

_INFO_LINES = ["total 14786", "Total of 11 Files, 10966 Blocks.",
               "Directory DISK$PCSA:[ANONYM]"]


def gen_listings(n: int = 45):
    """(listings, golden): n listings cycling through the dialects, with
    ignorable info lines interleaved; golden rows carry the expected
    parse (name with trailing '/' for dirs, exactly the ref the crawl
    parser would ue_add)."""
    l_ids, l_dialects, l_bodies = [], [], []
    g_ids, g_seqs, g_names, g_dirs, g_sizes = [], [], [], [], []
    for i in range(n):
        dialect = DIALECTS[i % len(DIALECTS)]
        lines: List[str] = [_INFO_LINES[i % len(_INFO_LINES)]]
        for seq, (name, is_dir, size) in enumerate(_entries_for(i)):
            lines.extend(_format(dialect, name, is_dir, size, i))
            if dialect == "vms":
                exp_name = (name.upper().replace(".", "_") if is_dir
                            else name.upper())
            else:
                exp_name = name
            # expected flags/size per the reference's dialect semantics:
            # 'l' entries get flagtrycwd too (a symlink may be a dir), so
            # the crawl ref carries the trailing '/'; EPLF dirs and
            # MSDOS <DIR> rows have no size fact; VMS never parses one
            exp_dir = is_dir or (dialect == "symlink" and not is_dir)
            if dialect == "vms":
                exp_size = None
            elif is_dir and dialect in ("eplf", "msdos"):
                exp_size = None
            else:
                exp_size = size
            g_ids.append(i)
            g_seqs.append(seq)
            g_names.append(exp_name + "/" if exp_dir else exp_name)
            g_dirs.append(exp_dir)
            g_sizes.append(exp_size)
        l_ids.append(i)
        l_dialects.append(dialect)
        l_bodies.append(("\n".join(lines) + "\n").encode())
    listings = pa.table({
        "listing_id": pa.array(l_ids, pa.int64()),
        "dialect": pa.array(l_dialects, pa.string()),
        "body": pa.array(l_bodies, pa.large_binary()),
    })
    golden = pa.table({
        "listing_id": pa.array(g_ids, pa.int64()),
        "seq": pa.array(g_seqs, pa.int64()),
        "name": pa.array(g_names, pa.string()),
        "is_dir": pa.array(g_dirs, pa.bool_()),
        "size": pa.array(g_sizes, pa.int64()),
    })
    return listings, golden


def ftp_dir_for(base: str = "/tmp/mwc_ftp", n: int = 45) -> str:
    out = os.path.join(base, f"{n}-v1")
    marker = os.path.join(out, "_DONE")
    if not os.path.exists(marker):
        os.makedirs(out, exist_ok=True)
        listings, golden = gen_listings(n)
        pq.write_table(listings, os.path.join(out, "listings.parquet"))
        pq.write_table(golden, os.path.join(out, "golden_entries.parquet"))
        open(marker, "w").write("ok")
    return out


def ftp_entries(ftp_dir: Optional[str] = None):
    """(listing_id, seq, name, is_dir, size): the LIST parser as a
    map_batches stage over the listings table."""
    import ray.data

    from ..functions.ftpparse import parse_listing

    ftp_dir = ftp_dir or ftp_dir_for()

    def parse(batch: pa.Table) -> pa.Table:
        ids, seqs, names, dirs, sizes = [], [], [], [], []
        for lid, body in zip(batch.column("listing_id").to_pylist(),
                             batch.column("body").to_pylist()):
            for seq, e in enumerate(parse_listing(body)):
                ids.append(lid)
                seqs.append(seq)
                names.append(e.name + "/" if e.try_cwd else e.name)
                dirs.append(e.try_cwd)
                sizes.append(e.size)
        return pa.table({
            "listing_id": pa.array(ids, pa.int64()),
            "seq": pa.array(seqs, pa.int64()),
            "name": pa.array(names, pa.string()),
            "is_dir": pa.array(dirs, pa.bool_()),
            "size": pa.array(sizes, pa.int64()),
        })

    return ray.data.read_parquet(
        os.path.join(ftp_dir, "listings.parquet"),
        columns=["listing_id", "body"],
    ).map_batches(parse, batch_format="pyarrow")
