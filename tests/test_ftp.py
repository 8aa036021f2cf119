"""ftpparse (S3/M8): per-dialect unit goldens + the distributed listings
pipeline + the crawl parse-chain integration."""

from methanol_web_crawler_ray.functions.ftpparse import (ftpparse,
                                                         parse_listing)
from methanol_web_crawler_ray.pipelines import ftp


def test_dialect_table():
    """One hand-checked line per dialect family (format examples are the
    publicly documented ones from the ftpparse notes)."""
    cases = [
        # EPLF
        ("+i8388621.29609,m824255902,/,\tdev",
         ("dev", True, False, None)),
        ("+i8388621.44468,m839956783,r,s10376,\tRFCEPLF",
         ("RFCEPLF", False, True, 10376)),
        # UNIX ls
        ("-rw-r--r--   1 root     other        531 Jan 29 03:26 README",
         ("README", False, True, 531)),
        ("dr-xr-xr-x   2 root     other        512 Apr  8  1994 etc",
         ("etc", True, False, 512)),
        # without gid
        ("dr-xr-xr-x   2 root     512 Apr  8  1994 etc",
         ("etc", True, False, 512)),
        # symlink: name stops at the arrow; CWD and RETR both plausible
        ("lrwxrwxrwx   1 root     other          7 Jan 25 00:17 bin -> usr/bin",
         ("bin", True, True, 7)),
        # Microsoft unix-style
        ("----------   1 owner    group         1803128 Jul 10 10:18 ls-lR.Z",
         ("ls-lR.Z", False, True, 1803128)),
        # NetWare
        ("d [R----F--] supervisor            512       Jan 16 18:53    login",
         ("login", True, False, 512)),
        # NetPresenz (Mac)
        ("drwxrwxr-x               folder        2 May 10  1996 network",
         ("network", True, False, 2)),
        # MSDOS / NT
        ("04-27-00  09:09PM       <DIR>          licensed",
         ("licensed", True, False, None)),
        ("04-14-00  03:47PM                  589 readme.htm",
         ("readme.htm", False, True, 589)),
        # VMS / MultiNet
        ("00README.TXT;1      2 30-DEC-1996 17:44 [SYSTEM] (RWED,RWED,RE,RE)",
         ("00README.TXT", False, True, None)),
        ("CORE.DIR;1          1  8-SEP-1996 16:09 [SYSTEM] (RWE,RWE,RE,RE)",
         ("CORE", True, False, None)),
    ]
    for line, (name, cwd, retr, size) in cases:
        e = ftpparse(line)
        assert e is not None, line
        assert e.name == name, (line, e)
        assert e.try_cwd == cwd, (line, e)
        assert e.try_retr == retr, (line, e)
        assert e.size == size, (line, e)
    # info lines are ignored
    for junk in ("total 14786", "Total of 11 Files, 10966 Blocks.",
                 "Directory DISK$PCSA:[ANONYM]", "x"):
        assert ftpparse(junk) is None or not ftpparse(junk).name


def test_listing_line_termination_parity():
    """builtin.c:217-244 parity: only '\\n'-terminated lines parse (a
    trailing unterminated fragment is dropped) and '\\r' stays in names
    on CRLF listings — the C never strips it."""
    line = "-rw-r--r--   1 root     other        531 Jan 29 03:26 README"
    # unterminated tail dropped
    assert [e.name for e in parse_listing(f"{line}\n{line}".encode())] == \
        ["README"]
    assert [e.name for e in parse_listing(f"{line}\n".encode())] == ["README"]
    # CRLF keeps the '\r'
    assert [e.name for e in parse_listing(f"{line}\r\n".encode())] == \
        ["README\r"]


def test_netware_three_space_name_kept():
    """ftpparse.c NetWare quirk: the three-leading-space strip only
    applies when namelen > 3, so a name of exactly '   ' survives."""
    e = ftpparse("d [R----F--] supervisor            512       Jan 16"
                 " 18:53       ")
    assert e is not None and e.name == "   "
    e = ftpparse("d [R----F--] supervisor            512       Jan 16"
                 " 18:53    login")
    assert e is not None and e.name == "login"


def test_mtime_fields():
    e = ftpparse("-rw-r--r--   1 root     other        531 Jan 29 03:26 README")
    assert e.mtime == ("remote-minute", None, 0, 29, 3, 26)
    e = ftpparse("dr-xr-xr-x   2 root     other        512 Apr  8  1994 etc")
    assert e.mtime == ("remote-day", 1994, 3, 8)
    e = ftpparse("04-14-00  03:47PM                  589 readme.htm")
    assert e.mtime == ("remote-minute", 2000, 3, 14, 15, 47)
    e = ftpparse("+i8388621.29609,m824255902,/,\tdev")
    assert e.mtime == ("local", 824255902)


def test_listing_pipeline_matches_golden(ray_session):
    import pyarrow.parquet as pq

    d = ftp.ftp_dir_for()
    gold = {(r["listing_id"], r["seq"]): (r["name"], r["is_dir"], r["size"])
            for r in pq.read_table(f"{d}/golden_entries.parquet").to_pylist()}
    got = ftp.ftp_entries(d).take_all()
    assert len(got) == len(gold) > 0
    for r in got:
        assert gold[(r["listing_id"], r["seq"])] == \
            (r["name"], r["is_dir"], r["size"])


def test_ftp_parse_chain():
    """The 'ftp' parser in a chain emits refs in order (dirs with '/')."""
    from methanol_web_crawler_ray.functions.parsechain import (
        AttrList, parse_chain_spec, run_chain)
    from methanol_web_crawler_ray.functions.urlkit import url_set

    body = (b"+i1.2,m3,/,\tpub\n"
            b"-rw-r--r--   1 root  other  531 Jan 29 03:26 README\n"
            b"total 2\n")
    refs = []
    run_chain(parse_chain_spec("ftp"), body,
              url_set("http://f.x/dir/"), "text/plain", 200,
              AttrList(()), refs.append)
    assert refs == [b"pub/", b"README"]
