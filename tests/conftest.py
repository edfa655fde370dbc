import pytest


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (driver contract: tests own
    the session; library code never calls ray.init)."""
    import ray

    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import ray.data

    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    import logging as _logging

    _logging.getLogger("ray.data").setLevel(_logging.WARNING)
    yield
    ray.shutdown()


@pytest.fixture(autouse=True)
def _fast_retries():
    """Zero the content-retry sleep and isolate the shared dependency cache."""
    from spatula_ray import config
    from spatula_ray.model import Page

    old_wait = config.RETRY_WAIT_SECONDS
    config.RETRY_WAIT_SECONDS = 0
    saved = dict(Page._cached_dependencies)
    Page._cached_dependencies.clear()
    yield
    config.RETRY_WAIT_SECONDS = old_wait
    Page._cached_dependencies.clear()
    Page._cached_dependencies.update(saved)
