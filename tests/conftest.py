import os

import pytest

os.environ.setdefault("RAY_DISABLE_IMPORT_WARNING", "1")


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session per pytest run (driver requirement)."""
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    yield
    ray.shutdown()


@pytest.fixture(autouse=True)
def _reap_streaming_executors():
    """Finalize dropped Datasets after every test. An early-stopped
    execution (limit / take / partial iter_batches) keeps its streaming
    executor — and its actor pool's CPUs — alive until the Dataset is
    garbage-collected; on the 4-CPU test session one leftover 1-CPU
    actor plus the next query's actor pools starves the read tasks into
    a permanent 'waiting_for_remote_node_resources' deadlock (observed:
    a lingering BruteForceScorer + the 3-pool unfused quality filter)."""
    yield
    import gc

    gc.collect()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
