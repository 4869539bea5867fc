import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    """One Ray session for the whole pytest run (per driver contract)."""
    from realtime_clickstream_lakehouse_ray.config import cap_worker_thread_pools

    cap_worker_thread_pools()  # before ray.init: workers inherit the env
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from realtime_clickstream_lakehouse_ray.config import tune_context

    tune_context()
    yield
    ray.shutdown()
