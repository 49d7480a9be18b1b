"""Shared pytest fixtures. Ray is initialised ONCE per session."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
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
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    import os

    # override to sweep at the driver's scale: GRAFT_TEST_SF_DIR=/root/testdata/sf0.01
    return os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
