import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bend_archiver_spark.session import get_spark  # noqa: E402

try:  # pure-function property tests share cores with the Spark suite;
    # wall-clock-per-example is load, not a correctness signal, and the
    # default 200 ms deadline flakes under a 32-thread full run
    from hypothesis import settings as _hyp_settings

    _hyp_settings.register_profile("suite", deadline=None)
    _hyp_settings.load_profile("suite")
except ImportError:  # pragma: no cover
    pass

SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
