"""Extension surface: config-keyed component registries.

Walk assembles its pipeline from JSON config via interface-per-
component factories switching on ``cfg.Type``
(``/root/reference/lib/worker.go:13-38``,
``lib/resource_handler.go:17-57``, ``lib/config.go:9-18``). The
rebuild's equivalent: Python protocols + a registry keyed by a config
``type`` string, so users plug in their own page sources, sinks and
seen/frontier stores without touching the engine.

A sink is a composable callable ``(Dataset | workdir) -> None`` run at
finalize; a batch hook is a per-batch UDF appended to the extract
stage.
"""

from __future__ import annotations

from typing import Any, Callable, Protocol

__all__ = [
    "PageSource",
    "ResourceSink",
    "SeenStore",
    "FrontierStore",
    "register",
    "create",
    "registered",
]


class PageSource(Protocol):
    """Resolves request keys to page rows (walk Worker analog)."""

    def lookup(self, keys: list[str]) -> list[tuple]: ...


class ResourceSink(Protocol):
    """Consumes finished resources (walk ResourceHandler analog,
    lib/resource_handler.go:17-27); ``finalize`` mirrors
    ResourceFinalizer."""

    def handle_batch(self, batch: Any) -> None: ...

    def finalize(self) -> None: ...


class SeenStore(Protocol):
    def check_and_add(self, urls: list[str], failed: bool = False) -> list[bool]: ...

    def dequeue(self, urls: list[str], statuses: list[int], max_attempts: int) -> list[str]: ...


class FrontierStore(Protocol):
    def push(self, rows: dict) -> int: ...

    def pop_ready(self, now: float, horizon: float, max_total: int) -> dict: ...


_REGISTRY: dict[str, dict[str, Callable[..., Any]]] = {
    "page_source": {},
    "sink": {},
    "seen": {},
    "frontier": {},
}


def register(kind: str, type_name: str, factory: Callable[..., Any]) -> None:
    """Register a component factory under (kind, config type string)."""
    if kind not in _REGISTRY:
        raise KeyError(f"unknown component kind: {kind}")
    _REGISTRY[kind][type_name.upper()] = factory


def create(kind: str, type_name: str, /, **kwargs) -> Any:
    """Instantiate a registered component (walk's factory switch,
    lib/resource_handler.go:39-57)."""
    try:
        factory = _REGISTRY[kind][type_name.upper()]
    except KeyError:
        raise KeyError(f"unrecognized {kind} type: {type_name!r}") from None
    return factory(**kwargs)


def registered(kind: str) -> list[str]:
    return sorted(_REGISTRY[kind])


# -- built-ins ---------------------------------------------------------

def _register_builtins() -> None:
    from .sources.pages import PageStore
    from .state.frontier import FrontierShard
    from .state.seen import SeenShard

    register("page_source", "parquet", PageStore)
    register("seen", "mem", SeenShard)
    register("frontier", "mem", FrontierShard)

    def sitemap_sink(workdir: str, dst_path: str = "sitemap.json"):
        from .pipelines.sitemap import build_and_write_sitemap

        class _SitemapSink:
            def handle_batch(self, batch) -> None:  # resources land on disk already
                pass

            def finalize(self) -> None:
                import os

                build_and_write_sitemap(
                    os.path.join(workdir, "resources"), os.path.join(workdir, dst_path)
                )

        return _SitemapSink()

    register("sink", "sitemap", sitemap_sink)


_register_builtins()
