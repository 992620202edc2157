import pytest


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (driver contract)."""
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    yield
    ray.shutdown()


SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def sf_smoke():
    # override to dress-rehearse the driver gate at its sf:
    #   GRAFT_PARITY_SF=/root/testdata/sf0.01 pytest tests/test_query_oracle_parity.py
    import os

    return os.environ.get("GRAFT_PARITY_SF", SF_SMOKE)
