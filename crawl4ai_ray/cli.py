"""CLI driver — `python -m crawl4ai_ray.cli crawl --seeds ... --strategy bfs`.

The reference ships a `crwl` CLI (/root/reference/crawl4ai/cli.py) over its
crawler; this is the engine-side equivalent, and the `ray job submit`
entrypoint for cluster runs (submit this module as the job script). Owns
its Ray session (guarded init) per the repo convention that only CLI entry
points, bench.py and the test fixture call ray.init.
"""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = dict(address="local", include_dashboard=False,
                      logging_level="ERROR")
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False


def cmd_crawl(args) -> int:
    from .pipelines.crawl import CrawlConfig, CrawlEngine
    from .sources.synthetic_web import SiteConfig

    _init_ray(args.num_cpus)
    cfg = CrawlConfig(
        strategy=args.strategy,
        max_depth=args.max_depth,
        max_pages=args.max_pages if args.max_pages > 0 else float("inf"),
        out_dir=args.out,
        checkpoint_dir=args.checkpoint_dir,
        politeness=args.politeness,
        cache_dir=args.cache_dir,
        cache_mode=args.cache_mode,
        n_seen_shards=args.seen_shards,
        fetch_concurrency=args.fetch_concurrency,
    )
    fetcher_kwargs = {}
    if args.synthetic_hosts:
        fetcher_kwargs["site_cfg"] = SiteConfig(
            n_hosts=args.synthetic_hosts).__dict__
        seeds = args.seeds or [
            f"http://h{k:04d}.test/" for k in range(args.synthetic_hosts)
        ]
        eng = CrawlEngine(cfg, fetcher_kwargs=fetcher_kwargs)
    else:
        from .stages.fetch import HttpFetcher

        seeds = args.seeds
        if not seeds:
            print("error: --seeds required without --synthetic-hosts",
                  file=sys.stderr)
            return 2
        eng = CrawlEngine(cfg, fetcher_cls=HttpFetcher)
    res = eng.run(seeds, resume=args.resume)
    print(json.dumps({
        "pages_crawled": res.pages_crawled,
        "urls_fetched": res.urls_fetched,
        "supersteps": res.supersteps,
        "seen_size": res.seen_size,
        "docs_dir": res.docs_dir,
        "wall_sec": round(res.wall_sec, 2),
        "urls_per_sec": round(res.urls_fetched / max(res.wall_sec, 1e-9), 1),
    }))
    import ray

    ray.shutdown()
    return 0


def cmd_seed(args) -> int:
    from .sources.seeder import seed_from_sitemaps
    from .sources.synthetic_web import SiteConfig

    _init_ray(args.num_cpus)
    site_cfg = SiteConfig(n_hosts=args.synthetic_hosts or 8).__dict__
    ds = seed_from_sitemaps(args.domains, site_cfg, pattern=args.pattern,
                            max_urls=args.max_urls)
    if args.out:
        ds.write_parquet(args.out)
        print(json.dumps({"out": args.out}))
    else:
        # stream rows instead of materializing the seed set on the driver
        for row in ds.iter_rows():
            print(row["url"])
    import ray

    ray.shutdown()
    return 0


def cmd_serve(args) -> int:
    """S11: run the loopback REST facade (reference deploy/docker API
    subset; port 11235 is the reference server's default)."""
    from .serve import EngineHTTPServer
    from .sources.synthetic_web import SiteConfig

    _init_ray(args.num_cpus)
    site_cfg = (SiteConfig(n_hosts=args.synthetic_hosts).__dict__
                if args.synthetic_hosts else None)
    srv = EngineHTTPServer(site_cfg=site_cfg, host=args.host,
                           port=args.port)
    print(json.dumps({"serving": f"http://{args.host}:{srv.port}"}))
    try:
        srv._srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.stop()
        import ray

        ray.shutdown()
    return 0


def cmd_compact(args) -> int:
    """Table maintenance: rewrite a small-file parquet tree (e.g. a
    long crawl's superstep sink output) into evenly-sized files."""
    from .pipelines.compact import compact_parquet

    _init_ray(args.num_cpus)
    st = compact_parquet(args.in_dir, args.out_dir,
                         rows_per_file=args.rows_per_file)
    print(json.dumps({k: st.column(k)[0].as_py()
                      for k in st.column_names}))
    import ray

    ray.shutdown()
    return 0


def cmd_browser(args) -> int:
    """Builtin-browser ops surface (reference cli.py:640-927
    status/start/stop/restart; the process is a real Playwright browser
    when the package exists, else a labeled placeholder)."""
    from .state.browser_manager import BuiltinBrowserManager

    mgr = BuiltinBrowserManager(home=args.home)
    if args.action == "status":
        print(json.dumps(mgr.status()))
        return 0
    if args.action == "start":
        if mgr.status()["running"]:
            print(json.dumps({"error": "already running",
                              "cdp_url": mgr.status()["cdp_url"]}))
            return 1           # reference: start refuses, use restart
        cdp = mgr.launch(args.browser_type or "chromium",
                         args.port or 9222, not args.no_headless)
        print(json.dumps({"cdp_url": cdp}))
        return 0 if cdp else 1
    if args.action == "stop":
        ok = mgr.kill()
        print(json.dumps({"stopped": ok}))
        return 0 if ok else 1
    if args.action == "restart":
        cdp = mgr.restart(args.browser_type, args.port,
                          False if args.no_headless else None)
        print(json.dumps({"cdp_url": cdp}))
        return 0 if cdp else 1
    return 2


def cmd_cdp(args) -> int:
    """Standalone CDP browser, not registered as builtin (reference
    cli.py:929-1003)."""
    from .state.browser_manager import BuiltinBrowserManager

    mgr = BuiltinBrowserManager(home=args.home)
    cdp, pid = mgr.launch_cdp(args.user_data_dir, args.port,
                              args.browser_type, args.headless)
    print(json.dumps({"cdp_url": cdp, "pid": pid}))
    return 0


def cmd_profiles(args) -> int:
    """Profile store (reference browser_profiler profile manager, the
    interactive TUI reduced to flags)."""
    from .state.browser_manager import ProfileManager

    pm = ProfileManager(home=args.home)
    if args.action == "list":
        print(json.dumps(pm.list()))
        return 0
    if args.action == "create":
        print(json.dumps({"path": pm.create(args.name)}))
        return 0
    if args.action == "delete":
        ok = pm.delete(args.name)
        print(json.dumps({"deleted": ok}))
        return 0 if ok else 1
    return 2


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="crawl4ai_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("crawl", help="run a crawl")
    c.add_argument("--seeds", nargs="*", default=None)
    c.add_argument("--strategy", choices=["bfs", "best_first", "dfs"],
                   default="bfs")
    c.add_argument("--max-depth", type=int, default=3)
    c.add_argument("--max-pages", type=int, default=0)
    c.add_argument("--out", default="/tmp/crawl4ai_ray_out")
    c.add_argument("--checkpoint-dir", default=None)
    c.add_argument("--resume", action="store_true")
    c.add_argument("--politeness", action="store_true")
    c.add_argument("--cache-dir", default=None)
    c.add_argument("--cache-mode", default="bypass",
                   choices=["enabled", "disabled", "read_only",
                            "write_only", "bypass"])
    c.add_argument("--seen-shards", type=int, default=4)
    c.add_argument("--fetch-concurrency", type=int, default=8)
    c.add_argument("--num-cpus", type=int, default=None)
    c.add_argument("--synthetic-hosts", type=int, default=0,
                   help="crawl the deterministic synthetic web instead of "
                        "live HTTP (no network in this sandbox)")
    c.set_defaults(fn=cmd_crawl)

    s = sub.add_parser("seed", help="discover URLs from sitemaps")
    s.add_argument("domains", nargs="+")
    s.add_argument("--pattern", default="*")
    s.add_argument("--max-urls", type=int, default=None)
    s.add_argument("--out", default=None)
    s.add_argument("--num-cpus", type=int, default=None)
    s.add_argument("--synthetic-hosts", type=int, default=8)
    s.set_defaults(fn=cmd_seed)

    v = sub.add_parser("serve", help="REST API (S11 serving layer)")
    v.add_argument("--host", default="127.0.0.1")
    v.add_argument("--port", type=int, default=11235)
    v.add_argument("--num-cpus", type=int, default=None)
    v.add_argument("--synthetic-hosts", type=int, default=0)
    v.set_defaults(fn=cmd_serve)

    k = sub.add_parser("compact", help="compact a small-file parquet tree")
    k.add_argument("in_dir")
    k.add_argument("out_dir")
    k.add_argument("--rows-per-file", type=int, default=100_000)
    k.add_argument("--num-cpus", type=int, default=None)
    k.set_defaults(fn=cmd_compact)

    b = sub.add_parser("browser", help="builtin-browser lifecycle ops")
    b.add_argument("action",
                   choices=["status", "start", "stop", "restart"])
    # defaults resolve inside cmd_browser: start falls back to
    # chromium/9222, restart inherits the previous browser's values
    b.add_argument("--browser-type", choices=["chromium", "firefox"],
                   default=None)
    b.add_argument("--port", type=int, default=None)
    b.add_argument("--no-headless", action="store_true")
    b.add_argument("--home", default=None)
    b.set_defaults(fn=cmd_browser)

    d = sub.add_parser("cdp", help="standalone CDP browser (unregistered)")
    d.add_argument("--user-data-dir", default=None)
    d.add_argument("--port", type=int, default=9222)
    d.add_argument("--browser-type", choices=["chromium", "firefox"],
                   default="chromium")
    d.add_argument("--headless", action="store_true")
    d.add_argument("--home", default=None)
    d.set_defaults(fn=cmd_cdp)

    pr = sub.add_parser("profiles", help="browser profile store")
    pr.add_argument("action", choices=["list", "create", "delete"])
    pr.add_argument("name", nargs="?", default=None)
    pr.add_argument("--home", default=None)
    pr.set_defaults(fn=cmd_profiles)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
