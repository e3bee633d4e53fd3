"""Config serialization + URL-matcher laws (reference
async_configs.py:44-169, 1380-1412; async_dispatcher.py:101-125)."""

import datetime
from dataclasses import dataclass, field

from crawl4ai_ray.functions.configkit import (
    MatchMode,
    clone_config,
    from_serializable_dict,
    is_empty_value,
    is_match,
    register_config,
    select_config,
    to_serializable_dict,
)
from crawl4ai_ray.functions.fetchprofile import ProxyConfig
from crawl4ai_ray.pipelines.crawl import CrawlConfig


@register_config
@dataclass
class _Inner:
    name: str = "x"
    level: int = 0


# reference configs are plain classes with scalar/None defaults
# (async_configs.py style), not dataclasses with default factories
@register_config
class _Outer:
    def __init__(self, flag=False, inner=None, tags=None, mapping=None):
        self.flag = flag
        self.inner = inner
        self.tags = tags if tags is not None else []
        self.mapping = mapping if mapping is not None else {}

    def __eq__(self, other):
        return (self.flag, self.inner, self.tags, self.mapping) == \
            (other.flag, other.inner, other.tags, other.mapping)


# -- is_empty_value (:163-169) -------------------------------------------------

def test_is_empty_value():
    assert is_empty_value(None)
    assert is_empty_value([]) and is_empty_value("") and is_empty_value({})
    assert is_empty_value(set()) and is_empty_value(())
    assert not is_empty_value(0)        # 0 is NOT empty in the reference law
    assert not is_empty_value(False)
    assert not is_empty_value([0])


# -- to_serializable_dict laws (:44-115) -----------------------------------------

def test_basic_and_enum_and_datetime():
    assert to_serializable_dict(5) == 5
    assert to_serializable_dict("s") == "s"
    assert to_serializable_dict(None) is None
    assert to_serializable_dict(MatchMode.AND) == {
        "type": "MatchMode", "params": "and"}
    d = datetime.datetime(2020, 1, 2, 3, 4, 5)
    assert to_serializable_dict(d) == "2020-01-02T03:04:05"


def test_iterables_and_frozenset_quirk():
    assert to_serializable_dict([1, "a"]) == [1, "a"]
    assert to_serializable_dict((1, 2)) == [1, 2]
    # frozenset: the dedicated branch is dead code — the generic
    # iterable branch listifies it first (reference :65-70)
    out = to_serializable_dict(frozenset([3]))
    assert out == [3]


def test_dict_marking():
    assert to_serializable_dict({"a": 1, 2: "b"}) == {
        "type": "dict", "value": {"a": 1, "2": "b"}}


def test_object_default_omission():
    # only non-default params are serialized
    assert to_serializable_dict(_Inner()) == {"type": "_Inner", "params": {}}
    assert to_serializable_dict(_Inner(level=3)) == {
        "type": "_Inner", "params": {"level": 3}}
    # empty value vs empty(None) default → omitted (the is_empty_value
    # carve-out, :96): an attribute holding [] with a None default does
    # not serialize
    out = to_serializable_dict(_Outer(tags=[]))
    assert out == {"type": "_Outer", "params": {}}


def test_ignore_default_value_suppresses_everything():
    # QUIRK (:97): the flag suppresses every constructor param
    assert to_serializable_dict(_Inner(level=9), ignore_default_value=True) \
        == {"type": "_Inner", "params": {}}


def test_nested_roundtrip():
    obj = _Outer(flag=True, inner=_Inner(name="y", level=2),
                 tags=["a", "b"], mapping={"k": 1})
    data = to_serializable_dict(obj)
    back = from_serializable_dict(data)
    assert isinstance(back, _Outer)
    assert back == obj


def test_from_serializable_legacy_raw_dict():
    assert from_serializable_dict({"a": [1, 2], "b": "x"}) == {
        "a": [1, 2], "b": "x"}
    # unknown type falls through to the legacy-dict path
    assert from_serializable_dict({"type": "NoSuchClass", "params": {}}) == {
        "type": "NoSuchClass", "params": {}}


# -- dump/load/clone contract -----------------------------------------------------

def test_crawlconfig_dump_load_roundtrip():
    cfg = CrawlConfig(strategy="best_first", max_depth=5,
                      politeness=True, bff_batch_size=7)
    data = cfg.dump()
    assert data["type"] == "CrawlConfig"
    assert data["params"]["strategy"] == "best_first"
    assert "max_pages" not in data["params"]      # default omitted
    back = CrawlConfig.load(data)
    assert back == cfg


def test_crawlconfig_load_legacy_kwargs():
    back = CrawlConfig.load(
        {"type": "dict", "value": {"max_depth": 9}})
    assert isinstance(back, CrawlConfig) and back.max_depth == 9


def test_crawlconfig_clone():
    cfg = CrawlConfig(max_depth=4, politeness=True)
    c2 = cfg.clone(strategy="dfs")
    assert c2.strategy == "dfs" and c2.max_depth == 4 and c2.politeness
    assert cfg.strategy == "bfs"                  # original untouched


def test_proxyconfig_dump_load():
    p = ProxyConfig("http://1.2.3.4:8080", username="u", password="s")
    back = ProxyConfig.load(p.dump())
    assert back.to_dict() == p.to_dict()


# -- is_match law (:1380-1412) -------------------------------------------------------

def test_is_match_none_and_scalar():
    assert is_match("https://x.com/a", None)
    assert is_match("https://x.com/a", "*x.com*")
    assert not is_match("https://y.com/a", "*x.com*")
    assert is_match("u", lambda u: u == "u")


def test_is_match_list_modes():
    m = ["*docs*", lambda u: u.endswith(".html")]
    assert is_match("https://a/docs/x.txt", m, MatchMode.OR)
    assert not is_match("https://a/docs/x.txt", m, MatchMode.AND)
    assert is_match("https://a/docs/x.html", m, MatchMode.AND)
    assert not is_match("https://a/z", [], MatchMode.OR)   # empty list
    # invalid matchers skipped; all-invalid → no results → False
    assert not is_match("u", [123, None], MatchMode.OR)
    assert not is_match("u", [123, None], MatchMode.AND)


def test_select_config_law():
    single = CrawlConfig()
    assert select_config("any", single) is single
    assert select_config("any", []) is None
    a = CrawlConfig(url_matcher="*a.com*")
    b = CrawlConfig(url_matcher="*b.com*")
    fallback = CrawlConfig()                      # None matcher: catch-all
    assert select_config("https://b.com/x", [a, b, fallback]) is b
    assert select_config("https://c.com/x", [a, b]) is None
    assert select_config("https://c.com/x", [a, b, fallback]) is fallback
    assert select_config("https://a.com/x", [fallback, a]) is fallback
