import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray
    from ray.data import DataContext

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_docs(tmp_path_factory):
    """Cached deterministic synthetic web (~300 docs, 8 hosts)."""
    from rendler_ray.sources.synthweb import docs_parquet

    p = tmp_path_factory.mktemp("web") / "docs.parquet"
    return docs_parquet(str(p), n_docs=300, n_hosts=8, seed=42)
