"""Crawler hub — site-specific crawler plugin registry (reference
hub.py:12-66 + crawlers/*).

Laws preserved: BaseCrawler subclasses are interface-validated at class
creation (``run`` must accept url + kwargs, hub.py:24-35); the hub
auto-discovers ``crawlers/<name>/crawler.py`` modules, registering each
BaseCrawler subclass under its directory name with the module's
``__meta__`` attached (hub.py:40-62); ``CrawlerHub.get`` lazily triggers
discovery. Divergence (documented): the reference enforces ``async def
run`` (its crawlers drive a browser); this engine's crawlers are
synchronous pipeline drivers returning the same JSON-string contract —
the data plane replaces the browser, not the registry.
"""

from __future__ import annotations

import importlib
import inspect
import logging
from abc import ABC, abstractmethod
from pathlib import Path

logger = logging.getLogger(__name__)


class BaseCrawler(ABC):
    def __init__(self):
        self.logger = logging.getLogger(self.__class__.__name__)

    @abstractmethod
    def run(self, url: str = "", **kwargs) -> str:
        """Return a JSON string. Must accept URL + arbitrary kwargs."""

    def __init_subclass__(cls, **kwargs):
        """Interface validation at subclass time (hub.py:24-35)."""
        super().__init_subclass__(**kwargs)
        run_method = cls.run
        if inspect.iscoroutinefunction(run_method):
            raise TypeError(
                f"{cls.__name__}.run must be synchronous in this engine "
                "(the data plane replaces the browser loop)")
        if run_method.__code__.co_argcount < 2:  # self + url
            raise TypeError(
                f"{cls.__name__} must implement 'run(self, url: str, "
                "**kwargs)'")


class CrawlerHub:
    _crawlers: dict = {}

    @classmethod
    def _discover_crawlers(cls) -> None:
        base_path = Path(__file__).parent.parent / "crawlers"
        if not base_path.is_dir():
            return
        for crawler_dir in sorted(base_path.iterdir()):
            if crawler_dir.is_dir() and \
                    (crawler_dir / "crawler.py").exists():
                try:
                    module = importlib.import_module(
                        f"crawl4ai_ray.crawlers.{crawler_dir.name}.crawler"
                    )
                    for attr in dir(module):
                        cls._maybe_register_crawler(
                            getattr(module, attr), crawler_dir.name)
                except Exception as exc:
                    logger.warning("Failed %s: %s", crawler_dir.name, exc)

    @classmethod
    def _maybe_register_crawler(cls, obj, name: str) -> None:
        if isinstance(obj, type) and issubclass(obj, BaseCrawler) \
                and obj is not BaseCrawler:
            module = importlib.import_module(obj.__module__)
            obj.meta = getattr(module, "__meta__", {})
            cls._crawlers[name] = obj

    @classmethod
    def get(cls, name: str):
        if not cls._crawlers:
            cls._discover_crawlers()
        return cls._crawlers.get(name)
