from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from osm2lanes_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_TEST_CPUS", "8"))
    spark = get_spark("osm2lanes-tests", cpus=cpus, shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def fixture_dir(tmp_path_factory):
    """Golden corpus converted to parquet (documents + expected)."""
    from osm2lanes_spark.fixtures.golden import write_fixture_parquet

    out = tmp_path_factory.mktemp("golden_fixture")
    paths = write_fixture_parquet(str(out))
    return paths


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
