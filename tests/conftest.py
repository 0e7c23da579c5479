import os

import pytest


@pytest.fixture(scope="session")
def ray_session():
    """Initialise Ray ONCE per pytest session (see repo instructions)."""
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_web(tmp_path_factory):
    """Deterministic tiny synthetic web (FIXTURES.md §5 'tiny')."""
    from webcrawler_ray.webgen import WebSpec, generate_web

    out = str(tmp_path_factory.mktemp("web") / "tiny")
    meta = generate_web(out, WebSpec(n_hosts=5, pages_per_host=20, seed=42))
    return meta


@pytest.fixture(scope="session")
def small_web(tmp_path_factory):
    """'small' scale web for e2e / resume tests (FIXTURES.md §5)."""
    from webcrawler_ray.webgen import WebSpec, generate_web

    out = str(tmp_path_factory.mktemp("web") / "small")
    meta = generate_web(out, WebSpec(n_hosts=20, pages_per_host=40, seed=7,
                                     n_seeds=5))
    return meta


SF_DIR = os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
