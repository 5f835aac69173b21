"""Shared fixtures. Ray is initialised ONCE per pytest session, and only
when a test actually requests the ``ray_session`` fixture — pure-engine
tests never pay Ray startup."""

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
