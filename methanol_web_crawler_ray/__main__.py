"""CLI — the ``mb`` one-shot crawler analog (src/methabot/main.c).

    python -m methanol_web_crawler_ray crawl  --pages DIR SEED [SEED...]
    python -m methanol_web_crawler_ray bulk   --pages DIR SEED [SEED...]
    python -m methanol_web_crawler_ray sim    --pages DIR SEED [SEED...]
    python -m methanol_web_crawler_ray provided --base-url URL  < page.html

``crawl`` runs the ordered politeness-rounds engine (checkpointed,
resumable), ``bulk`` the order-free BFS throughput engine, ``sim`` the
pure-Python single-worker reference simulator, ``provided`` the stdin
mode (S5).  ``--config file.conf`` loads the reference's configuration
language; CLI flags override it the way mb's getopt flags mutate the
loaded config (methabot/main.c:431-527).
"""

from __future__ import annotations

import argparse
import json
import sys


def _build_cfg(args):
    from .config import default_config
    from .config_lang import load_config_file

    if args.config:
        cfg = load_config_file(args.config)
        if "default" not in cfg.crawlers and cfg.crawlers:
            cfg.default_crawler = next(iter(cfg.crawlers))
    else:
        cfg = default_config()
    cr = cfg.crawler(args.crawler)
    overrides = {}
    if args.depth is not None:
        overrides["depth_limit"] = args.depth
    if args.external:
        overrides["external"] = True
    if args.no_robots:
        overrides["robotstxt"] = False
    if args.jail:
        overrides["jail"] = True
    if overrides:
        cfg.extend_crawler(cr.name, **overrides)
    cfg.mode = args.mode
    return cfg


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="methanol_web_crawler_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("seeds", nargs="*", help="seed URLs")
        sp.add_argument("--pages", required=True,
                        help="pages-table dir (pages.parquet [+ page_meta])")
        sp.add_argument("--config", help=".conf config file (S12 language)")
        sp.add_argument("--crawler", default=None)
        sp.add_argument("-D", "--depth", type=int, default=None,
                        help="depth limit (mb -D)")
        sp.add_argument("-e", "--external", action="store_true",
                        help="follow external hosts (mb -e)")
        sp.add_argument("--jail", action="store_true", help="mb -j")
        sp.add_argument("--no-robots", action="store_true")
        sp.add_argument("--mode", default="aggressive",
                        choices=["aggressive", "friendly", "coward"],
                        help="politeness mode (mb --mode)")

    sp = sub.add_parser("crawl", help="ordered politeness-rounds crawl")
    common(sp)
    sp.add_argument("--ckpt", required=True, help="checkpoint dir")
    sp.add_argument("--resume", action="store_true")
    sp.add_argument("--write-targets", metavar="DIR",
                    help="export per-filetype ft_* parquet after the crawl")
    sp.add_argument("--write-log", metavar="DIR",
                    help="export the nol_url-style crawl log")
    sp.add_argument("--shards", type=int, default=8)
    sp.add_argument("--seen", default="exact", choices=["exact", "cuckoo"])

    sp = sub.add_parser("bulk", help="order-free BFS bulk crawl")
    common(sp)
    sp.add_argument("--out", required=True)
    sp.add_argument("--shards", type=int, default=8)
    sp.add_argument("--pipelined", action="store_true",
                    help="barrier-free frontier-queue engine (fastest; "
                         "not resumable)")

    sp = sub.add_parser("sim", help="single-worker reference simulator")
    common(sp)

    sp = sub.add_parser("provided",
                        help="crawl a buffer from stdin (mb stdin mode, S5)")
    sp.add_argument("--base-url", required=True)
    sp.add_argument("--config", default=None)
    sp.add_argument("--crawler", default=None)
    sp.add_argument("--content-type", default="text/html")
    for a in ("depth", "external", "jail", "no_robots"):
        pass
    sp.set_defaults(depth=None, external=False, jail=False, no_robots=True,
                    mode="aggressive", seeds=[])

    args = p.parse_args(argv)
    cfg = _build_cfg(args)

    if args.cmd == "provided":
        from .pipelines.embed import exec_provided

        buf = sys.stdin.buffer.read()
        log, frontier = exec_provided(cfg, args.base_url, buf,
                                      args.content_type)
        print(json.dumps({
            "visited": [v[0] for v in log.visits],
            "frontier": frontier,
            "targets": [t["url"] for t in log.targets],
        }))
        return 0

    if args.cmd == "sim":
        from .pipelines.hostloop import DictFetcher
        from .pipelines.simulator import simulate_single_worker
        from .sources.pagegen import load_fetch_dict

        fetch = DictFetcher(load_fetch_dict(args.pages))
        r = simulate_single_worker(cfg, fetch, args.seeds, args.crawler)
        print(json.dumps({
            "visits": len(r.visits), "seen": r.seen_size,
            "targets": len(r.targets), "ft_counts": r.ft_counts,
        }))
        return 0

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")

    if args.cmd == "bulk":
        from .pipelines.bulk import crawl_bfs, crawl_bfs_pipelined

        engine = crawl_bfs_pipelined if args.pipelined else crawl_bfs
        stats = engine(cfg, args.pages, args.seeds, args.crawler,
                       out_dir=args.out, num_shards=args.shards)
        stats.pop("wave_times", None)
        print(json.dumps({k: round(v, 2) if isinstance(v, float) else v
                          for k, v in stats.items()}))
    else:
        from .pipelines.crawl import collect_result, crawl_rounds
        from .pipelines.sinks import write_crawl_log, write_targets

        crawl_rounds(cfg, args.pages, args.seeds, args.crawler,
                     ckpt_dir=args.ckpt, resume=args.resume,
                     num_shards=args.shards, seen_mode=args.seen)
        res = collect_result(args.ckpt)
        out = {"visits": len(res.visits), "targets": len(res.targets),
               "rounds": res.rounds, "ft_counts": res.ft_counts}
        if args.write_targets:
            out["target_counts"] = write_targets(args.ckpt,
                                                 args.write_targets, cfg)
        if args.write_log:
            out["log_rows"] = write_crawl_log(args.ckpt, args.write_log)
        print(json.dumps(out))

    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
