import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def qri_crawl(ray_session, tmp_path_factory):
    """One shared qri_io-shaped crawl output for query-layer tests."""
    from walk_ray.pipelines.crawl import CrawlConfig, CrawlJob
    from walk_ray.sources.testgen import generate_pages

    tmp = tmp_path_factory.mktemp("qri_crawl")
    gen = generate_pages("qri_io_shaped", str(tmp / "gen"), seed=42)
    cfg = CrawlConfig.from_job_json(
        gen["job"], n_frontier_shards=2, n_seen_shards=2, n_page_parts=2
    )
    job = CrawlJob(cfg, gen["pages"], gen["pages_meta"], str(tmp / "run"))
    return job.run()


@pytest.fixture(scope="session")
def redirect_crawl(ray_session, tmp_path_factory):
    from walk_ray.pipelines.crawl import CrawlConfig, CrawlJob
    from walk_ray.sources.testgen import generate_pages

    tmp = tmp_path_factory.mktemp("redir_crawl")
    gen = generate_pages("redirect_chain", str(tmp / "gen"))
    cfg = CrawlConfig.from_job_json(
        gen["job"], n_frontier_shards=2, n_seen_shards=2, n_page_parts=2
    )
    job = CrawlJob(cfg, gen["pages"], gen["pages_meta"], str(tmp / "run"))
    return job.run()
