"""walk_ray — a Ray-Data-native crawl & data-processing engine.

From-scratch rebuild of qri-io/walk's crawler/sitemapper on Ray Data
(see README.md and COVERAGE.md for the operator map)."""

__version__ = "0.1.0"

from .pipelines.crawl import CrawlConfig, CrawlJob  # noqa: F401
from .sources.testgen import generate_pages  # noqa: F401


def serve(workdirs, port: int = 2783):  # lazy: the server pulls in ray.data
    from .server import serve as _serve

    return _serve(workdirs, port)


__all__ = ["CrawlConfig", "CrawlJob", "generate_pages", "serve", "__version__"]
