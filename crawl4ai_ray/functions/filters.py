"""URL filters — pure predicates, vectorizable inside ``map_batches``.

Behavior-parity reimplementations of the reference deep-crawl filters
(/root/reference/crawl4ai/deep_crawling/filters.py): URLPatternFilter
(:119-255), ContentTypeFilter (:258-421), DomainFilter (:424-498),
FilterChain (:69-116). Network-touching filters (ContentRelevanceFilter
:501-573, SEOFilter :576-686) belong to the head-peek actor stage, not this
pure module; see stages.headpeek.

All filters implement ``apply(url) -> bool`` and ``apply_batch(urls) ->
np.ndarray[bool]``; a filter instance is cheap to pickle into a map_batches
closure (patterns recompiled lazily per process).
"""

from __future__ import annotations

import fnmatch
import re
from functools import lru_cache

import numpy as np


class BaseFilter:
    def apply(self, url: str) -> bool:  # pragma: no cover - interface
        raise NotImplementedError

    def apply_batch(self, urls) -> np.ndarray:
        return np.fromiter((self.apply(u) for u in urls), dtype=bool,
                           count=len(urls))

    def __call__(self, url: str) -> bool:
        return self.apply(url)


class URLPatternFilter(BaseFilter):
    """Glob/regex pattern filter with the reference's pattern buckets:
    suffix (``*.html``), prefix (``/foo/*`` with path-boundary check),
    domain (``*.example.com``), regex (``^``/``$``/``\\d``), generic glob
    (``**``, ``{a,b}`` alternation)."""

    def __init__(self, patterns, reverse: bool = False):
        if isinstance(patterns, (str, re.Pattern)):
            patterns = [patterns]
        self._reverse = reverse
        self._suffixes: set[str] = set()
        self._prefixes: set[str] = set()
        self._domain_patterns: list[re.Pattern] = []
        self._path_patterns: list[re.Pattern] = []
        for p in patterns:
            self._add(p)

    def _add(self, pattern):
        if isinstance(pattern, re.Pattern):
            self._path_patterns.append(pattern)
            return
        if pattern.startswith("^") or pattern.endswith("$") or "\\d" in pattern:
            self._path_patterns.append(re.compile(pattern))
            return
        if pattern.count("*") == 1:
            if pattern.startswith("*."):
                if "://" in pattern:
                    self._domain_patterns.append(
                        re.compile(pattern.replace("*.", r"[^/]+\."))
                    )
                else:
                    self._suffixes.add(pattern[2:])
                return
            if pattern.endswith("/*"):
                self._prefixes.add(pattern[:-2])
                return
        if "**" in pattern:
            pattern = pattern.replace("**", ".*")
        if "{" in pattern:
            pattern = re.sub(
                r"\{([^}]+)\}",
                lambda m: "(" + "|".join(m.group(1).split(",")) + ")",
                pattern,
            )
        self._path_patterns.append(re.compile(fnmatch.translate(pattern)))

    def apply(self, url: str) -> bool:
        result = self._match(url)
        return (not result) if self._reverse else result

    def _match(self, url: str) -> bool:
        if self._suffixes:
            path = url.split("?")[0]
            if path.split("/")[-1].split(".")[-1] in self._suffixes:
                return True
        for dp in self._domain_patterns:
            if dp.match(url):
                return True
        if self._prefixes:
            path = url.split("?")[0]
            for prefix in self._prefixes:
                if path.startswith(prefix) and (
                    len(path) == len(prefix) or path[len(prefix)] in "/?#"
                ):
                    return True
        for pp in self._path_patterns:
            if pp.search(url):
                return True
        return False


# Extension → MIME map mirroring the reference's table (filters.py:264-360).
_MIME_MAP = {
    "txt": "text/plain", "html": "text/html", "htm": "text/html",
    "xhtml": "application/xhtml+xml", "css": "text/css", "csv": "text/csv",
    "ics": "text/calendar", "js": "application/javascript",
    "bmp": "image/bmp", "gif": "image/gif", "jpeg": "image/jpeg",
    "jpg": "image/jpeg", "png": "image/png", "svg": "image/svg+xml",
    "tiff": "image/tiff", "ico": "image/x-icon", "webp": "image/webp",
    "mp3": "audio/mpeg", "wav": "audio/wav", "ogg": "audio/ogg",
    "m4a": "audio/mp4", "aac": "audio/aac",
    "mp4": "video/mp4", "mpeg": "video/mpeg", "webm": "video/webm",
    "avi": "video/x-msvideo", "mov": "video/quicktime", "flv": "video/x-flv",
    "wmv": "video/x-ms-wmv", "mkv": "video/x-matroska",
    "json": "application/json", "xml": "application/xml",
    "pdf": "application/pdf", "doc": "application/msword",
    "docx": ("application/vnd.openxmlformats-officedocument"
             ".wordprocessingml.document"),
    "xls": "application/vnd.ms-excel",
    "xlsx": ("application/vnd.openxmlformats-officedocument"
             ".spreadsheetml.sheet"),
    "ppt": "application/vnd.ms-powerpoint",
    "zip": "application/zip", "rar": "application/vnd.rar",
    "7z": "application/x-7z-compressed", "tar": "application/x-tar",
    "gz": "application/gzip", "bz2": "application/x-bzip2",
    "rtf": "application/rtf", "epub": "application/epub+zip",
    "jar": "application/java-archive", "bin": "application/octet-stream",
    "php": "application/x-httpd-php",
    # completing reference parity (code-review r2: the table claimed to
    # mirror filters.py:264-360 but omitted ~30 entries)
    "exe": "application/vnd.microsoft.portable-executable",
    "msi": "application/x-msdownload",
    "woff": "font/woff", "woff2": "font/woff2",
    "ttf": "font/ttf", "otf": "font/otf",
    "dot": "application/msword",
    "pptx": ("application/vnd.openxmlformats-officedocument"
             ".presentationml.presentation"),
    "odt": "application/vnd.oasis.opendocument.text",
    "ods": "application/vnd.oasis.opendocument.spreadsheet",
    "odp": "application/vnd.oasis.opendocument.presentation",
    "tar.gz": "application/gzip", "tgz": "application/gzip",
    "apk": "application/vnd.android.package-archive",
    "swf": "application/x-shockwave-flash",
    "midi": "audio/midi", "mid": "audio/midi",
    "ps": "application/postscript", "ai": "application/postscript",
    "eps": "application/postscript",
    "dmg": "application/x-apple-diskimage",
    "iso": "application/x-iso9660-image",
    "deb": "application/x-debian-package", "rpm": "application/x-rpm",
    "sqlite": "application/vnd.sqlite3",
    "unknown": "application/octet-stream",
    "php3": "application/x-httpd-php", "php4": "application/x-httpd-php",
    "php5": "application/x-httpd-php", "php7": "application/x-httpd-php",
    "phtml": "application/x-httpd-php",
    "phps": "application/x-httpd-php-source",
}


class ContentTypeFilter(BaseFilter):
    """Keep URLs whose file extension maps to an allowed MIME family;
    extension-less URLs pass (reference filters.py:407-417)."""

    def __init__(self, allowed_types, check_extension: bool = True):
        if isinstance(allowed_types, str):
            allowed_types = [allowed_types]
        self.allowed_types = frozenset(t.lower() for t in allowed_types)
        self._check_extension = check_extension
        self._ext_ok = frozenset(
            ext for ext, mime in _MIME_MAP.items()
            if any(a in mime for a in self.allowed_types)
        )

    @staticmethod
    @lru_cache(maxsize=10_000)
    def _extension(url: str) -> str:
        if "://" in url:
            url = url.split("://", 1)[-1]
        slash = url.find("/")
        path = url[slash:] if slash != -1 else ""
        filename = path.rsplit("/", 1)[-1] if "/" in path else ""
        filename = filename.split("?")[0].split("#")[0]
        if "." not in filename:
            return ""
        return filename.rpartition(".")[-1].lower()

    def apply(self, url: str) -> bool:
        if not self._check_extension:
            return True
        ext = self._extension(url)
        if not ext:
            return True
        return ext in self._ext_ok


class DomainFilter(BaseFilter):
    """Allow/block by domain with subdomain matching (filters.py:424-498):
    blocked wins; with no allow-list all non-blocked pass."""

    # the reference's extraction regex keeps the :port (and any ?#
    # oddities up to the first slash) — ports therefore DON'T match their
    # portless domain entries, faithfully
    _DOMAIN_RE = re.compile(r"://([^/]+)")

    def __init__(self, allowed_domains=None, blocked_domains=None):
        def norm(ds):
            if ds is None:
                return None
            if isinstance(ds, str):
                ds = [ds]
            return frozenset(d.lower() for d in ds)

        # reference law (filters.py:424-446): an EMPTY allow-list means
        # "no allow restriction" (None), not "allow nothing"
        self._allowed = norm(allowed_domains) if allowed_domains else None
        self._blocked = (norm(blocked_domains) or frozenset()) \
            if blocked_domains else frozenset()

    @staticmethod
    def _is_subdomain(domain: str, parent: str) -> bool:
        return domain == parent or domain.endswith("." + parent)

    def _domain(self, url: str) -> str:
        m = self._DOMAIN_RE.search(url)
        return m.group(1).lower() if m else ""

    def apply(self, url: str) -> bool:
        if not self._blocked and self._allowed is None:
            return True
        domain = self._domain(url)
        for b in self._blocked:
            if self._is_subdomain(domain, b):
                return False
        if self._allowed is None:
            return True
        return any(self._is_subdomain(domain, a) for a in self._allowed)


class FilterChain(BaseFilter):
    """AND of filters with early exit (filters.py:69-116). Stats counters
    (passed/rejected) are kept per chain for the metrics table."""

    def __init__(self, filters):
        self.filters = list(filters)
        self.passed = 0
        self.rejected = 0

    def apply(self, url: str) -> bool:
        for f in self.filters:
            if not f.apply(url):
                self.rejected += 1
                return False
        self.passed += 1
        return True

    def apply_batch(self, urls) -> np.ndarray:
        mask = np.ones(len(urls), dtype=bool)
        for f in self.filters:
            if not mask.any():
                break
            idx = np.nonzero(mask)[0]
            sub = f.apply_batch([urls[i] for i in idx])
            mask[idx] &= sub
        self.passed += int(mask.sum())
        self.rejected += int((~mask).sum())
        return mask
