"""Fetch-profile config: proxy rotation + user-agent generation.

Behavioral port of the reference's fetch-identity layer
(proxy_strategy.py:10-158, user_agent_generator.py:143-414) — the laws a
fetch actor applies when it owns an HTTP session:

- ``ProxyConfig``: server/username/password/ip record; ``from_string``
  accepts ``ip:port:user:pass`` (4 parts) or ``ip:port`` (2 parts) and
  prefixes ``http://``; the ip falls back to the host part of the server
  URL; ``from_env`` splits a comma-separated env var.
- ``RoundRobinProxyStrategy``: plain cycle over the pool. The reference
  re-creates the cycle on every ``add_proxies`` call, which RESTARTS
  rotation from the first proxy (proxy_strategy.py:149-152) — replicated.
- ``UserAgentGenerator``: composes ``Mozilla/5.0 <platform> <engine>
  (KHTML, like Gecko) <browser stack>`` from the reference's platform /
  version tables (user_agent_generator.py:175-259); ``parse_user_agent``
  extracts major versions; ``generate_client_hints`` builds the
  ``Sec-CH-UA`` value (Chromium + Not_A Brand + Edge-or-Chrome; Firefox
  returns ``'""'``).

Ray-side notes: the generator takes an explicit ``seed`` so every fetch
actor derives its identity deterministically from its shard id (the
reference uses the global ``random`` module — unseedable per-worker).
``ValidUAGenerator``/``OnlineUAGenerator`` (fake_useragent / live HTTP
scrape, user_agent_generator.py:68-139) are out of sandbox scope; this
generator is the offline path the reference itself falls back to.
"""

from __future__ import annotations

import os
import random
import re
from itertools import cycle


class ProxyConfig:
    """One proxy endpoint (proxy_strategy.py:10-118)."""

    def __init__(self, server: str, username: str | None = None,
                 password: str | None = None, ip: str | None = None):
        self.server = server
        self.username = username
        self.password = password
        self.ip = ip or self._extract_ip_from_server()

    def _extract_ip_from_server(self) -> str | None:
        try:
            if "://" in self.server:
                return self.server.split("://")[1].split(":")[0]
            return self.server.split(":")[0]
        except Exception:
            return None

    @staticmethod
    def from_string(proxy_str: str) -> "ProxyConfig":
        parts = proxy_str.split(":")
        if len(parts) == 4:          # ip:port:username:password
            ip, port, username, password = parts
            return ProxyConfig(server=f"http://{ip}:{port}",
                               username=username, password=password, ip=ip)
        if len(parts) == 2:          # ip:port
            ip, port = parts
            return ProxyConfig(server=f"http://{ip}:{port}", ip=ip)
        raise ValueError(f"Invalid proxy string format: {proxy_str}")

    @staticmethod
    def from_dict(proxy_dict: dict) -> "ProxyConfig":
        return ProxyConfig(server=proxy_dict.get("server"),
                           username=proxy_dict.get("username"),
                           password=proxy_dict.get("password"),
                           ip=proxy_dict.get("ip"))

    @staticmethod
    def from_env(env_var: str = "PROXIES") -> list["ProxyConfig"]:
        proxies = []
        for proxy in os.getenv(env_var, "").split(","):
            if proxy:
                proxies.append(ProxyConfig.from_string(proxy))
        return proxies

    def to_dict(self) -> dict:
        return {"server": self.server, "username": self.username,
                "password": self.password, "ip": self.ip}

    def clone(self, **kwargs) -> "ProxyConfig":
        d = self.to_dict()
        d.update(kwargs)
        return ProxyConfig.from_dict(d)

    def dump(self) -> dict:
        from .configkit import dump_config

        return dump_config(self)

    @staticmethod
    def load(data: dict) -> "ProxyConfig":
        from .configkit import load_config

        return load_config(ProxyConfig, data)


from .configkit import register_config as _register_config  # noqa: E402

_register_config(ProxyConfig)


class RoundRobinProxyStrategy:
    """Round-robin over the proxy pool (proxy_strategy.py:134-158).
    Synchronous — a fetch actor calls ``get_next_proxy()`` per request.
    Reference quirk kept: ``add_proxies`` rebuilds the cycle, restarting
    rotation from the first proxy."""

    def __init__(self, proxies: list[ProxyConfig] | None = None):
        self._proxies: list[ProxyConfig] = []
        self._proxy_cycle = None
        if proxies:
            self.add_proxies(proxies)

    def add_proxies(self, proxies: list[ProxyConfig]) -> None:
        self._proxies.extend(proxies)
        self._proxy_cycle = cycle(self._proxies)

    def get_next_proxy(self) -> ProxyConfig | None:
        if not self._proxy_cycle:
            return None
        return next(self._proxy_cycle)


_UA_BROWSER_PATTERNS = {
    "chrome": r"Chrome/(\d+)",
    "edge": r"Edg/(\d+)",
    "safari": r"Version/(\d+)",
    "firefox": r"Firefox/(\d+)",
}


class UserAgentGenerator:
    """Constraint-driven UA composer (user_agent_generator.py:143-414),
    deterministic under ``seed`` (one per fetch actor)."""

    def __init__(self, seed: int | None = None):
        self._rng = random.Random(seed)
        self.desktop_platforms = {
            "windows": {
                "10_64": "(Windows NT 10.0; Win64; x64)",
                "10_32": "(Windows NT 10.0; WOW64)",
            },
            "macos": {
                "intel": "(Macintosh; Intel Mac OS X 10_15_7)",
                "newer": "(Macintosh; Intel Mac OS X 10.15; rv:109.0)",
            },
            "linux": {
                "generic": "(X11; Linux x86_64)",
                "ubuntu": "(X11; Ubuntu; Linux x86_64)",
                "chrome_os": "(X11; CrOS x86_64 14541.0.0)",
            },
        }
        self.mobile_platforms = {
            "android": {
                "samsung": "(Linux; Android 13; SM-S901B)",
                "pixel": "(Linux; Android 12; Pixel 6)",
                "oneplus": "(Linux; Android 13; OnePlus 9 Pro)",
                "xiaomi": "(Linux; Android 12; M2102J20SG)",
            },
            "ios": {
                "iphone": "(iPhone; CPU iPhone OS 16_5 like Mac OS X)",
                "ipad": "(iPad; CPU OS 16_5 like Mac OS X)",
            },
        }
        # valid browser-token combinations by stack size
        # (user_agent_generator.py:205-209)
        self.browser_combinations = {
            1: [["chrome"], ["firefox"], ["safari"], ["edge"]],
            2: [["gecko", "firefox"], ["chrome", "safari"],
                ["webkit", "safari"]],
            3: [["chrome", "safari", "edge"],
                ["webkit", "chrome", "safari"]],
        }
        self.rendering_engines = {
            "chrome_webkit": "AppleWebKit/537.36",
            "safari_webkit": "AppleWebKit/605.1.15",
            "gecko": ["Gecko/20100101", "Gecko/20100101", "Gecko/2010010"],
        }
        self.chrome_versions = [
            "Chrome/119.0.6045.199", "Chrome/118.0.5993.117",
            "Chrome/117.0.5938.149", "Chrome/116.0.5845.187",
            "Chrome/115.0.5790.171",
        ]
        self.edge_versions = [
            "Edg/119.0.2151.97", "Edg/118.0.2088.76", "Edg/117.0.2045.47",
            "Edg/116.0.1938.81", "Edg/115.0.1901.203",
        ]
        self.safari_versions = [
            "Safari/537.36", "Safari/605.1.15", "Safari/604.1",
            "Safari/602.1", "Safari/601.5.17",
        ]
        self.firefox_versions = [
            "Firefox/119.0", "Firefox/118.0.2", "Firefox/117.0.1",
            "Firefox/116.0", "Firefox/115.0.3", "Firefox/114.0.2",
            "Firefox/113.0.1", "Firefox/112.0", "Firefox/111.0.1",
            "Firefox/110.0",
        ]

    def get_browser_stack(self, num_browsers: int = 1) -> list[str]:
        if num_browsers not in self.browser_combinations:
            raise ValueError(
                f"Unsupported number of browsers: {num_browsers}")
        combination = self._rng.choice(
            self.browser_combinations[num_browsers])
        stack = []
        for browser in combination:
            if browser == "chrome":
                stack.append(self._rng.choice(self.chrome_versions))
            elif browser == "firefox":
                stack.append(self._rng.choice(self.firefox_versions))
            elif browser == "safari":
                stack.append(self._rng.choice(self.safari_versions))
            elif browser == "edge":
                stack.append(self._rng.choice(self.edge_versions))
            elif browser == "gecko":
                stack.append(
                    self._rng.choice(self.rendering_engines["gecko"]))
            elif browser == "webkit":
                stack.append(self.rendering_engines["chrome_webkit"])
        return stack

    def generate(self, device_type: str | None = None,
                 os_type: str | None = None,
                 device_brand: str | None = None,
                 browser_type: str | None = None,
                 num_browsers: int = 3) -> str:
        platform = self.get_random_platform(device_type, os_type,
                                            device_brand)
        components = ["Mozilla/5.0", platform]
        browser_stack = self.get_browser_stack(num_browsers)
        # legacy-token selection law (user_agent_generator.py:326-337):
        # ordered by Firefox > Chrome/Safari > Edge > Safari, matched
        # against the stringified stack
        if "Firefox" in str(browser_stack) or browser_type == "firefox":
            components.append(
                self._rng.choice(self.rendering_engines["gecko"]))
        elif ("Chrome" in str(browser_stack)
              or "Safari" in str(browser_stack)
              or browser_type == "chrome"):
            components.append(self.rendering_engines["chrome_webkit"])
            components.append("(KHTML, like Gecko)")
        elif "Edge" in str(browser_stack) or browser_type == "edge":
            components.append(self.rendering_engines["safari_webkit"])
            components.append("(KHTML, like Gecko)")
        elif browser_type == "safari":
            components.append(self.rendering_engines["chrome_webkit"])
            components.append("(KHTML, like Gecko)")
        components.extend(browser_stack)
        return " ".join(components)

    def generate_with_client_hints(self, **kwargs) -> tuple[str, str]:
        user_agent = self.generate(**kwargs)
        return user_agent, self.generate_client_hints(user_agent)

    def get_random_platform(self, device_type, os_type, device_brand):
        platforms = (
            self.desktop_platforms if device_type == "desktop"
            else self.mobile_platforms if device_type == "mobile"
            else {**self.desktop_platforms, **self.mobile_platforms}
        )
        if os_type:
            for group in [self.desktop_platforms, self.mobile_platforms]:
                if os_type in group:
                    platforms = {os_type: group[os_type]}
                    break
        os_key = self._rng.choice(list(platforms.keys()))
        if device_brand and device_brand in platforms[os_key]:
            return platforms[os_key][device_brand]
        return self._rng.choice(list(platforms[os_key].values()))

    @staticmethod
    def parse_user_agent(user_agent: str) -> dict[str, str]:
        result = {}
        for browser, pattern in _UA_BROWSER_PATTERNS.items():
            match = re.search(pattern, user_agent)
            if match:
                result[browser] = match.group(1)
        return result

    @classmethod
    def generate_client_hints(cls, user_agent: str) -> str:
        """Sec-CH-UA value (user_agent_generator.py:388-414)."""
        browsers = cls.parse_user_agent(user_agent)
        hints = []
        if "chrome" in browsers:
            hints.append(f'"Chromium";v="{browsers["chrome"]}"')
            hints.append('"Not_A Brand";v="8"')
            if "edge" in browsers:
                hints.append(f'"Microsoft Edge";v="{browsers["edge"]}"')
            else:
                hints.append(f'"Google Chrome";v="{browsers["chrome"]}"')
        elif "firefox" in browsers:
            return '""'
        elif "safari" in browsers:
            hints.append(f'"Safari";v="{browsers["safari"]}"')
            hints.append('"Not_A Brand";v="8"')
        return ", ".join(hints)
