from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from algorithmproject_spark_spark.session import get_spark

    s = get_spark("tests", master="local[4]", shuffle_partitions=8)
    yield s
    from algorithmproject_spark_spark.cacheutil import release_caches
    from algorithmproject_spark_spark.queries.itemsets import (
        clear_itemset_cache,
    )

    release_caches()
    clear_itemset_cache()
    s.stop()
