import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: `pytest -m fast` smoke tier for the inner loop: the core-engine
#: modules (ingest/LWW/manifest/join/index/audit + kernel tests), ~90 s
#: on a clean host vs ~10 min for the full suite.  The full oracle
#: mirror (test_queries_duckdb), property suites, cluster/selection and
#: hard checks stay full-tier only.
_FAST_MODULES = {
    "test_bpe",
    "test_codecs",
    "test_index",
    "test_ingest_e2e",
    "test_join",
    "test_lookup",
    "test_lww",
    "test_mor",
    "test_operators",
    "test_oracle",
    "test_property_kernels",
    "test_rangescan",
    "test_rewrite",
    "test_wap",
}


def pytest_collection_modifyitems(items):
    for item in items:
        mod = os.path.splitext(os.path.basename(item.fspath.strpath))[0]
        if mod in _FAST_MODULES:
            item.add_marker(pytest.mark.fast)


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
