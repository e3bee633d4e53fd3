"""Fetch-profile laws (functions/fetchprofile.py) — behavioral parity
with the reference's proxy_strategy.py + user_agent_generator.py."""

import re

import pytest

from crawl4ai_ray.functions.fetchprofile import (ProxyConfig,
                                                 RoundRobinProxyStrategy,
                                                 UserAgentGenerator)
from crawl4ai_ray.stages.fetch import HttpFetcher


# -- ProxyConfig --------------------------------------------------------------


def test_proxy_from_string_four_parts():
    p = ProxyConfig.from_string("10.0.0.1:8080:alice:s3cret")
    assert p.server == "http://10.0.0.1:8080"
    assert (p.username, p.password, p.ip) == ("alice", "s3cret", "10.0.0.1")


def test_proxy_from_string_two_parts():
    p = ProxyConfig.from_string("10.0.0.2:3128")
    assert p.server == "http://10.0.0.2:3128"
    assert p.username is None and p.password is None and p.ip == "10.0.0.2"


def test_proxy_from_string_invalid():
    with pytest.raises(ValueError, match="Invalid proxy string"):
        ProxyConfig.from_string("10.0.0.1:8080:extra")


def test_proxy_ip_extracted_from_server():
    assert ProxyConfig("http://192.168.1.5:9000").ip == "192.168.1.5"
    assert ProxyConfig("192.168.1.6:9000").ip == "192.168.1.6"


def test_proxy_from_env_roundtrip_and_clone(monkeypatch):
    monkeypatch.setenv("PROXIES",
                       "1.1.1.1:80,2.2.2.2:81:u:p,")
    ps = ProxyConfig.from_env()
    assert [p.ip for p in ps] == ["1.1.1.1", "2.2.2.2"]
    c = ps[1].clone(password="other")
    assert c.password == "other" and c.username == "u"
    assert c.to_dict()["server"] == "http://2.2.2.2:81"


def test_round_robin_cycles():
    rr = RoundRobinProxyStrategy(
        [ProxyConfig.from_string(s) for s in ["1.1.1.1:80", "2.2.2.2:80"]])
    got = [rr.get_next_proxy().ip for _ in range(5)]
    assert got == ["1.1.1.1", "2.2.2.2", "1.1.1.1", "2.2.2.2", "1.1.1.1"]


def test_round_robin_add_restarts_cycle():
    # reference quirk: add_proxies rebuilds the cycle from index 0
    rr = RoundRobinProxyStrategy(
        [ProxyConfig.from_string(s) for s in ["1.1.1.1:80", "2.2.2.2:80"]])
    rr.get_next_proxy()
    rr.add_proxies([ProxyConfig.from_string("3.3.3.3:80")])
    assert rr.get_next_proxy().ip == "1.1.1.1"


def test_round_robin_empty_returns_none():
    assert RoundRobinProxyStrategy().get_next_proxy() is None


# -- UserAgentGenerator -------------------------------------------------------


ALL_PLATFORM_STRINGS = [
    "(Windows NT 10.0; Win64; x64)", "(Windows NT 10.0; WOW64)",
    "(Macintosh; Intel Mac OS X 10_15_7)",
    "(Macintosh; Intel Mac OS X 10.15; rv:109.0)",
    "(X11; Linux x86_64)", "(X11; Ubuntu; Linux x86_64)",
    "(X11; CrOS x86_64 14541.0.0)",
    "(Linux; Android 13; SM-S901B)", "(Linux; Android 12; Pixel 6)",
    "(Linux; Android 13; OnePlus 9 Pro)", "(Linux; Android 12; M2102J20SG)",
    "(iPhone; CPU iPhone OS 16_5 like Mac OS X)",
    "(iPad; CPU OS 16_5 like Mac OS X)",
]


def test_ua_structure_and_determinism():
    a = UserAgentGenerator(seed=7).generate()
    b = UserAgentGenerator(seed=7).generate()
    assert a == b                       # seeded per-actor determinism
    assert a.startswith("Mozilla/5.0 (")
    assert any(p in a for p in ALL_PLATFORM_STRINGS)


def test_ua_browser_stack_sizes_and_members():
    gen = UserAgentGenerator(seed=1)
    for n in (1, 2, 3):
        for _ in range(20):
            stack = gen.get_browser_stack(n)
            assert len(stack) == n
            for tok in stack:
                assert re.match(
                    r"(Chrome/|Firefox/|Safari/|Edg/|Gecko/|AppleWebKit/)",
                    tok)
    with pytest.raises(ValueError, match="Unsupported number"):
        gen.get_browser_stack(4)


def test_ua_platform_constraints():
    gen = UserAgentGenerator(seed=3)
    for _ in range(10):
        assert "Android" in gen.get_random_platform(None, "android", None) \
            or "Android" in gen.get_random_platform("mobile", "android",
                                                    None)
        assert gen.get_random_platform("mobile", "ios", "ipad") == \
            "(iPad; CPU OS 16_5 like Mac OS X)"
        p = gen.get_random_platform("desktop", "windows", None)
        assert p.startswith("(Windows NT 10.0")


def test_ua_legacy_token_law():
    gen = UserAgentGenerator(seed=11)
    for _ in range(50):
        ua = gen.generate(num_browsers=3)
        # 3-browser combos always include Chrome or WebKit → the
        # chrome_webkit legacy token + KHTML marker
        assert "AppleWebKit/537.36 (KHTML, like Gecko)" in ua
    for _ in range(50):
        ua = gen.generate(num_browsers=1)
        if "Firefox/" in ua:
            assert "Gecko/" in ua and "KHTML" not in ua


def test_parse_user_agent():
    ua = ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
          "(KHTML, like Gecko) Chrome/119.0.6045.199 Safari/537.36 "
          "Edg/119.0.2151.97")
    parsed = UserAgentGenerator.parse_user_agent(ua)
    assert parsed == {"chrome": "119", "edge": "119"}


def test_client_hints_chrome_plus_edge():
    ua = "Mozilla/5.0 X Chrome/118.0.0.0 Edg/118.0.2088.76"
    hints = UserAgentGenerator.generate_client_hints(ua)
    assert hints == ('"Chromium";v="118", "Not_A Brand";v="8", '
                     '"Microsoft Edge";v="118"')


def test_client_hints_chrome_only():
    ua = "Mozilla/5.0 X Chrome/119.0.0.0 Safari/537.36"
    hints = UserAgentGenerator.generate_client_hints(ua)
    assert hints == ('"Chromium";v="119", "Not_A Brand";v="8", '
                     '"Google Chrome";v="119"')


def test_client_hints_firefox_empty():
    ua = "Mozilla/5.0 (X11; Linux x86_64; rv:109.0) Gecko/20100101 Firefox/119.0"
    assert UserAgentGenerator.generate_client_hints(ua) == '""'


def test_client_hints_safari():
    ua = "Mozilla/5.0 (Macintosh) AppleWebKit/605.1.15 Version/16.5 Safari/605.1.15"
    hints = UserAgentGenerator.generate_client_hints(ua)
    assert hints == '"Safari";v="16", "Not_A Brand";v="8"'


def test_generate_with_client_hints_consistent():
    ua, hints = UserAgentGenerator(seed=5).generate_with_client_hints()
    assert hints == UserAgentGenerator.generate_client_hints(ua)


# -- HttpFetcher wiring -------------------------------------------------------


def test_http_fetcher_ua_seed_and_proxies():
    f = HttpFetcher(ua_seed=42,
                    proxies=["1.1.1.1:80", {"server": "http://2.2.2.2:81"}])
    g = HttpFetcher(ua_seed=42)
    assert f.user_agent == g.user_agent          # deterministic identity
    assert f.user_agent.startswith("Mozilla/5.0")
    assert f.client_hints == \
        UserAgentGenerator.generate_client_hints(f.user_agent)
    assert [f.proxy_rotation.get_next_proxy().ip for _ in range(3)] == \
        ["1.1.1.1", "2.2.2.2", "1.1.1.1"]


def test_http_fetcher_raw_and_file_still_work(tmp_path):
    f = HttpFetcher(ua_seed=1, proxies=["1.1.1.1:80"])
    assert f.fetch_one("raw:<p>hi</p>")["html"] == "<p>hi</p>"
    p = tmp_path / "x.html"
    p.write_text("<h1>t</h1>")
    assert f.fetch_one(f"file://{p}")["html"] == "<h1>t</h1>"
