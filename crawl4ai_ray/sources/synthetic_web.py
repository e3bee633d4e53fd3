"""Deterministic synthetic web — the page store fetch actors serve in tests.

Modeled on the reference's generated dummy site
(/root/reference/tests/general/generate_dummy_site.py:9-13 — category →
subcategory → product, bounded depth) and stress-site generator
(tests/memory/test_stress_sdk.py:51-98), extended per FIXTURES.md §2 with:
cross-host links, duplicate link variants (utm params / fragments / trailing
slashes — exercising canonicalization), a Zipf-ish host-size distribution
with hot hosts (exercising salted splits), deterministic 404/429/503
sprinkling, and per-host robots.txt.

Crucially the site is a PURE FUNCTION of (config, url): ``page(url)``
computes html/status/latency on demand, so fetch actors need only the small
config object (broadcast once) — no materialized page corpus — and the same
site definition works at any scale, including bench scale.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from ..functions.urlkit import hash64

_VOCAB = (
    "data stream engine crawl frontier batch arrow shard actor table span "
    "media index graph node edge page host link robot polite token bucket "
    "schedule fetch parse extract markdown citation image video audio "
    "quality score depth level queue filter pattern domain fresh path"
).split()


def _words(h: int, n: int) -> str:
    out = []
    x = h & 0xFFFFFFFFFFFFFFFF
    for _ in range(n):
        x = (x * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
        out.append(_VOCAB[(x >> 33) % len(_VOCAB)])
    return " ".join(out)


@dataclass(frozen=True)
class SiteConfig:
    seed: int = 42
    n_hosts: int = 8
    base_cats: int = 3          # categories on the hottest host
    n_subs: int = 2             # subcategories per category
    base_products: int = 5      # products per subcategory on the hottest host
    hot_hosts: int = 1          # first k hosts get full size; rest shrink Zipf-ish
    error_rate_mod: int = 23    # product pages with h%mod==0 → 404
    slow_rate_mod: int = 29     # product pages with h%mod==0 → 503
    robots_disallow_mod: int = 5  # every k-th host disallows /cat0/sub1
    text_scale: int = 1           # multiplies paragraph word counts (bench knob)

    def host(self, k: int) -> str:
        return f"h{k:04d}.test"

    def n_cats(self, k: int) -> int:
        if k < self.hot_hosts:
            return self.base_cats
        return max(1, int(self.base_cats / (1 + 0.7 * (k - self.hot_hosts + 1))))

    def n_products(self, k: int) -> int:
        if k < self.hot_hosts:
            return self.base_products
        return max(1, int(self.base_products / (1 + 0.5 * (k - self.hot_hosts + 1))))


class SyntheticWeb:
    """site.page(url) -> dict(html, status, latency_ms); site.seed_urls()."""

    def __init__(self, cfg: SiteConfig | None = None):
        self.cfg = cfg or SiteConfig()

    # -- public API ---------------------------------------------------------

    def seed_urls(self) -> list[str]:
        return [f"http://{self.cfg.host(k)}/" for k in range(self.cfg.n_hosts)]

    def all_urls(self) -> list[str]:
        """Every crawlable page (for fixture/bench accounting)."""
        urls = []
        for k in range(self.cfg.n_hosts):
            h = f"http://{self.cfg.host(k)}"
            urls.append(h + "/")
            for c in range(self.cfg.n_cats(k)):
                urls.append(f"{h}/cat{c}")
                for s in range(self.cfg.n_subs):
                    urls.append(f"{h}/cat{c}/sub{s}")
                    for p in range(self.cfg.n_products(k)):
                        urls.append(f"{h}/cat{c}/sub{s}/p{p}.html")
        return urls

    def robots_txt(self, host: str) -> str:
        k = int(host[1:5])
        sitemap = f"Sitemap: http://{host}/sitemap.xml\n"
        if k % self.cfg.robots_disallow_mod == 0:
            return "User-agent: *\nDisallow: /cat0/sub1\n" + sitemap
        return "User-agent: *\nDisallow:\n" + sitemap

    def sitemap_xml(self, host: str) -> str:
        """Sitemap INDEX: one child sitemap per category (exercises the
        reference's recursive sitemap-index iteration,
        async_url_seeder.py:830-958)."""
        k = int(host[1:5])
        entries = "".join(
            f"<sitemap><loc>http://{host}/sitemap-cat{c}.xml</loc></sitemap>"
            for c in range(self.cfg.n_cats(k))
        )
        return ('<?xml version="1.0" encoding="UTF-8"?>'
                '<sitemapindex xmlns="http://www.sitemaps.org/schemas/'
                f'sitemap/0.9">{entries}</sitemapindex>')

    def sitemap_cat_xml(self, host: str, c: int) -> str:
        k = int(host[1:5])
        urls = [f"http://{host}/cat{c}"]
        for s in range(self.cfg.n_subs):
            urls.append(f"http://{host}/cat{c}/sub{s}")
            for p in range(self.cfg.n_products(k)):
                urls.append(f"http://{host}/cat{c}/sub{s}/p{p}.html")
        entries = "".join(f"<url><loc>{u}</loc></url>" for u in urls)
        return ('<?xml version="1.0" encoding="UTF-8"?>'
                '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
                f"{entries}</urlset>")

    def page(self, url: str) -> dict:
        """Resolve a (canonical or raw) URL to a page. Unknown → 404."""
        cfg = self.cfg
        u = url.split("#")[0].split("?")[0]
        if u.startswith("http://"):
            u = u[7:]
        elif u.startswith("https://"):
            u = u[8:]
        host, _, path = u.partition("/")
        path = "/" + path.rstrip("/")
        if not host.startswith("h") or not host.endswith(".test"):
            return self._err(404)
        try:
            k = int(host[1:5])
        except ValueError:
            return self._err(404)
        if k >= cfg.n_hosts:
            return self._err(404)
        h = hash64(f"{cfg.seed}:{host}{path}")
        latency = 5 + int(h % 20)
        if path == "/robots.txt":
            return {"html": self.robots_txt(host), "status": 200,
                    "latency_ms": latency}
        if path == "/sitemap.xml":
            return {"html": self.sitemap_xml(host), "status": 200,
                    "latency_ms": latency}
        if path.startswith("/sitemap-cat") and path.endswith(".xml"):
            try:
                c = int(path[len("/sitemap-cat"):-4])
            except ValueError:
                return self._err(404, latency)
            if c >= cfg.n_cats(k):
                return self._err(404, latency)
            return {"html": self.sitemap_cat_xml(host, c), "status": 200,
                    "latency_ms": latency}
        parts = [p for p in path.split("/") if p]
        base = f"http://{host}"
        if not parts:
            return self._root(k, base, h, latency)
        if len(parts) == 1 and parts[0].startswith("cat"):
            c = _idx(parts[0], "cat")
            if c is None or c >= cfg.n_cats(k):
                return self._err(404, latency)
            return self._cat(k, base, c, h, latency)
        if len(parts) == 2 and parts[1].startswith("sub"):
            c, s = _idx(parts[0], "cat"), _idx(parts[1], "sub")
            if c is None or s is None or c >= cfg.n_cats(k) or s >= cfg.n_subs:
                return self._err(404, latency)
            return self._sub(k, base, c, s, h, latency)
        if len(parts) == 3 and parts[2].startswith("p") and parts[2].endswith(".html"):
            c, s = _idx(parts[0], "cat"), _idx(parts[1], "sub")
            p = _idx(parts[2][:-5], "p")
            if (c is None or s is None or p is None or c >= cfg.n_cats(k)
                    or s >= cfg.n_subs or p >= cfg.n_products(k)):
                return self._err(404, latency)
            if h % cfg.error_rate_mod == 0:
                return self._err(404, latency)
            if h % cfg.slow_rate_mod == 0:
                return self._err(503, latency * 4)
            return self._product(k, base, c, s, p, h, latency)
        return self._err(404, latency)

    # -- page builders ------------------------------------------------------

    def _err(self, status: int, latency: int = 5) -> dict:
        return {"html": f"<html><body><h1>{status}</h1></body></html>",
                "status": status, "latency_ms": latency}

    def _shell(self, title: str, host_k: int, body: str) -> str:
        nav = "".join(
            f'<a href="/cat{c}">Category {c}</a> '
            for c in range(self.cfg.n_cats(host_k))
        )
        return (
            "<html><head>"
            f"<title>{title}</title>"
            f'<meta name="description" content="{title} — synthetic fixture page">'
            f'<meta property="og:title" content="{title}">'
            "<script>var tracking=1;</script>"
            "<style>.x{color:red}</style>"
            "</head><body>"
            f"<header><nav>{nav}</nav></header>"
            f"<main>{body}</main>"
            '<footer><p>footer boilerplate — <a href="/about?utm_source=footer">about</a></p></footer>'
            "</body></html>"
        )

    def _root(self, k: int, base: str, h: int, latency: int) -> dict:
        cfg = self.cfg
        paras = "".join(
            f"<p>{_words(h + i, 18 * self.cfg.text_scale)}</p>" for i in range(2)
        )
        cats = "".join(
            f'<li><a href="/cat{c}" title="cat {c}">Browse category {c}</a></li>'
            for c in range(cfg.n_cats(k))
        )
        # duplicate variants: tracking params + trailing slash (canonicalize to same)
        dup = f'<p>Also see <a href="/cat0/?utm_source=home&utm_campaign=x">category zero</a>.</p>'
        img = (f'<img src="/static/hero{k}.png" alt="hero image host {k}" '
               'width="640" height="320">')
        body = (f"<h1>Host {k} home</h1>{paras}{img}<ul>{cats}</ul>{dup}")
        return {"html": self._shell(f"Host {k} home", k, body),
                "status": 200, "latency_ms": latency}

    def _cat(self, k: int, base: str, c: int, h: int, latency: int) -> dict:
        cfg = self.cfg
        subs = "".join(
            f'<li><a href="/cat{c}/sub{s}">Subcategory {c}.{s}</a></li>'
            for s in range(cfg.n_subs)
        )
        body = (
            f"<h1>Category {c}</h1><p>{_words(h, 25 * self.cfg.text_scale)}</p>"
            f"<ul>{subs}</ul>"
            f'<p><a href="/">home</a> · <a href="/cat{c}#top">self</a></p>'
        )
        return {"html": self._shell(f"Category {c}", k, body),
                "status": 200, "latency_ms": latency}

    def _sub(self, k: int, base: str, c: int, s: int, h: int, latency: int) -> dict:
        cfg = self.cfg
        prods = "".join(
            f'<li><a href="/cat{c}/sub{s}/p{p}.html">Product {c}.{s}.{p}</a></li>'
            for p in range(cfg.n_products(k))
        )
        table = ""
        if h % 2 == 0:
            rows = "".join(
                f"<tr><td>p{p}</td><td>{(h + p) % 97}</td><td>{_words(h + p, 2)}</td></tr>"
                for p in range(min(4, cfg.n_products(k)))
            )
            table = (
                "<table><caption>products</caption>"
                "<thead><tr><th>sku</th><th>stock</th><th>tags</th></tr></thead>"
                f"<tbody>{rows}</tbody></table>"
            )
        body = (
            f"<h1>Sub {c}.{s}</h1><p>{_words(h, 20 * self.cfg.text_scale)}</p>{table}<ul>{prods}</ul>"
            f'<p><a href="/cat{c}">up</a></p>'
        )
        return {"html": self._shell(f"Sub {c}.{s}", k, body),
                "status": 200, "latency_ms": latency}

    def _product(self, k: int, base: str, c: int, s: int, p: int, h: int,
                 latency: int) -> dict:
        cfg = self.cfg
        img = (f'<img src="/static/p{c}{s}{p}.jpg" alt="product {c}.{s}.{p} photo" '
               f'width="300" height="300" srcset="/static/p{c}{s}{p}@2x.jpg 2x">')
        icon = '<img src="/static/icon16.png" width="16" height="16">'
        sib = (p + 1) % cfg.n_products(k)
        cross = ""
        if h % 7 == 0:
            other = (k + 1 + int(h % max(1, cfg.n_hosts - 1))) % cfg.n_hosts
            cross = (f'<p>Partner: <a href="http://{cfg.host(other)}/">'
                     f"host {other}</a></p>")
        media = ""
        if h % 11 == 0:
            media = f'<video src="/static/v{p}.mp4" title="demo video {p}"></video>'
        body = (
            f"<h1>Product {c}.{s}.{p}</h1>"
            f"<p><strong>{_words(h, 4)}</strong> — {_words(h + 1, 30 * self.cfg.text_scale)}</p>"
            f"{img}{icon}{media}"
            f"<p>{_words(h + 2, 22 * self.cfg.text_scale)}</p>"
            f'<p><a href="/cat{c}/sub{s}/p{sib}.html?ref=sibling">next product</a> · '
            f'<a href="/cat{c}/sub{s}/">back</a></p>{cross}'
        )
        return {"html": self._shell(f"Product {c}.{s}.{p}", k, body),
                "status": 200, "latency_ms": latency}


def _idx(part: str, prefix: str) -> int | None:
    try:
        return int(part[len(prefix):])
    except (ValueError, IndexError):
        return None


def site_config_json(cfg: SiteConfig) -> str:
    return json.dumps(cfg.__dict__, sort_keys=True)
