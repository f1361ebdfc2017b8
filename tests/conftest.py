import pytest


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole test run (local, 4 CPUs)."""
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
    # list<struct> columns (spans, top-3 terms) must stay Arrow lists in
    # pandas, not be coerced to the tensor extension.
    ctx.enable_tensor_extension_casting = False
    yield
    ray.shutdown()
