"""Config serialization + URL-matcher laws (async_configs.py surface).

Behavioral port of the reference's config data-plane:

- ``to_serializable_dict`` / ``from_serializable_dict`` /
  ``is_empty_value`` (reference async_configs.py:44-169) — the
  {type, params} round-trip format every ``Config.dump()`` /
  ``Config.load()`` in the reference emits and accepts.  Quirks kept:

  * the ``frozenset`` branch (:69-70) is dead code — frozensets are
    iterable, so the generic-iterable branch (:65-66) catches them
    first and they serialize as lists;
  * ``ignore_default_value=True`` suppresses EVERY constructor param
    (:97 requires ``not ignore_default_value`` to include anything),
    so a dump with that flag carries only ``__slots__`` extras — the
    literal reference behavior, not a repo invention;
  * any object with ``isoformat`` (datetime-likes) serializes to the
    isoformat string and does NOT round-trip back to a datetime;
  * params equal to their constructor default are omitted from dumps
    (``value != param.default``), with the empty-vs-empty carve-out of
    ``is_empty_value`` (:96);
  * private ``__slots__`` entries ``_x`` re-emerge as param ``x``
    (:100-106).

- class lookup: the reference resolves ``data["type"]`` against the
  ``crawl4ai`` package namespace (:135-150).  This engine resolves
  against an explicit registry (``register_config``) — same contract,
  no import-the-world side effect; our config classes register at
  module import.

- ``is_match`` URL-matcher law (async_configs.py:1380-1412): None
  matches everything; a callable is applied; a string is ``fnmatch``;
  a list mixes callables and patterns, skipping invalid entries, and
  folds with MatchMode.OR (``any``) or AND (``all``) — an empty list
  or all-invalid list matches nothing.

- ``select_config`` (async_dispatcher.py:101-125): a bare config
  always wins; an empty list yields None; else first match wins; no
  match yields None ("URL should be skipped").
"""

from __future__ import annotations

import inspect
from enum import Enum
from fnmatch import fnmatch
from typing import Any

__all__ = [
    "MatchMode",
    "is_empty_value",
    "to_serializable_dict",
    "from_serializable_dict",
    "register_config",
    "is_match",
    "select_config",
    "dump_config",
    "load_config",
    "clone_config",
]


class MatchMode(Enum):
    OR = "or"
    AND = "and"


_REGISTRY: dict[str, type] = {"MatchMode": MatchMode}


def register_config(cls: type) -> type:
    """Register a class for ``from_serializable_dict`` lookup (the
    engine's stand-in for the reference's package-namespace probe).
    Usable as a decorator."""
    _REGISTRY[cls.__name__] = cls
    return cls


def is_empty_value(value: Any) -> bool:
    """Reference async_configs.py:163-169."""
    if value is None:
        return True
    if isinstance(value, (list, tuple, set, dict, str)) and len(value) == 0:
        return True
    return False


def to_serializable_dict(obj: Any, ignore_default_value: bool = False):
    """Reference async_configs.py:44-115, quirk-for-quirk."""
    if obj is None:
        return None
    if isinstance(obj, (str, int, float, bool)):
        return obj
    if isinstance(obj, Enum):
        return {"type": obj.__class__.__name__, "params": obj.value}
    if hasattr(obj, "isoformat"):
        return obj.isoformat()
    if isinstance(obj, (list, tuple, set)) or (
            hasattr(obj, "__iter__") and not isinstance(obj, dict)):
        # catches frozenset too — the reference's dedicated frozenset
        # branch below this one never runs (QUIRK kept by omission)
        return [to_serializable_dict(item) for item in obj]
    if isinstance(obj, dict):
        return {
            "type": "dict",
            "value": {str(k): to_serializable_dict(v)
                      for k, v in obj.items()},
        }

    if hasattr(obj, "__class__"):
        sig = inspect.signature(obj.__class__.__init__)
        current_values: dict[str, Any] = {}
        for name, param in sig.parameters.items():
            if name == "self":
                continue
            value = getattr(obj, name, param.default)
            if not (is_empty_value(value) and is_empty_value(param.default)):
                # QUIRK (:97): ignore_default_value=True suppresses the
                # param entirely rather than ignoring the default check
                if value != param.default and not ignore_default_value:
                    current_values[name] = to_serializable_dict(value)
        if hasattr(obj, "__slots__"):
            for slot in obj.__slots__:
                if slot.startswith("_"):
                    value = getattr(obj, slot, None)
                    if value is not None:
                        current_values[slot[1:]] = to_serializable_dict(value)
        return {"type": obj.__class__.__name__, "params": current_values}

    return str(obj)


def from_serializable_dict(data: Any) -> Any:
    """Reference async_configs.py:118-160 over the explicit registry."""
    if data is None:
        return None
    if isinstance(data, (str, int, float, bool)):
        return data
    if isinstance(data, dict) and "type" in data:
        if data["type"] == "dict" and "value" in data:
            return {k: from_serializable_dict(v)
                    for k, v in data["value"].items()}
        cls = _REGISTRY.get(data["type"])
        if cls is not None:
            if issubclass(cls, Enum):
                return cls(data["params"])
            if "params" in data:
                kwargs = {k: from_serializable_dict(v)
                          for k, v in data["params"].items()}
                return cls(**kwargs)
    if isinstance(data, list):
        return [from_serializable_dict(item) for item in data]
    if isinstance(data, dict):                      # legacy raw dicts
        return {k: from_serializable_dict(v) for k, v in data.items()}
    return data


# ---------------------------------------------------------------------------
# dump / load / clone contract (BrowserConfig:597-622, CrawlerRunConfig
# :1546-1668, HTTPCrawlerConfig:810-831 all share this shape)


def dump_config(config: Any) -> dict:
    return to_serializable_dict(config)


def load_config(cls: type, data: dict) -> Any:
    config = from_serializable_dict(data)
    if isinstance(config, cls):
        return config
    if isinstance(config, dict):
        return cls(**config)
    return config


def clone_config(config: Any, **kwargs) -> Any:
    """clone() law: current constructor-param values + overrides → new
    instance (reference clones via to_dict()+from_kwargs; for our
    dataclass configs the constructor params ARE the dict)."""
    sig = inspect.signature(config.__class__.__init__)
    current = {name: getattr(config, name)
               for name in sig.parameters if name != "self"
               and hasattr(config, name)}
    current.update(kwargs)
    return config.__class__(**current)


# ---------------------------------------------------------------------------
# URL matcher + config selection


def is_match(url: str, url_matcher, match_mode: MatchMode = MatchMode.OR
             ) -> bool:
    """Reference async_configs.py:1380-1412."""
    if url_matcher is None:
        return True
    if callable(url_matcher):
        return url_matcher(url)
    if isinstance(url_matcher, str):
        return fnmatch(url, url_matcher)
    if isinstance(url_matcher, list):
        if not url_matcher:
            return False
        results = []
        for matcher in url_matcher:
            if callable(matcher):
                results.append(matcher(url))
            elif isinstance(matcher, str):
                results.append(fnmatch(url, matcher))
            # invalid matchers skipped (reference :1404-1405)
        if match_mode == MatchMode.OR:
            return any(results) if results else False
        return all(results) if results else False


def select_config(url: str, configs):
    """Reference async_dispatcher.py:101-125.  ``configs`` is a single
    config or a list; configs expose ``url_matcher``/``match_mode``
    attributes (None-tolerant)."""
    if not isinstance(configs, (list, tuple)):
        return configs
    if not configs:
        return None
    for config in configs:
        if is_match(url, getattr(config, "url_matcher", None),
                    getattr(config, "match_mode", MatchMode.OR)):
            return config
    return None
