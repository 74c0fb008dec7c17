"""Shared fixtures. One session-scoped SparkSession (startup is expensive).

Golden fixture provenance: tests/fixtures/osm_golden.{pbf,xml},
many_nodes.pbf and invalid.xml are byte-exact copies of the reference's
test data (marook/osm-read test/test.pbf, test/test.xml, test/manyNodes.pbf,
test/invalid.xml) — data files, not code; the pinned values they carry are
listed in FIXTURES.md §3.
"""

from __future__ import annotations

import pathlib

import pytest

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


@pytest.fixture(scope="session")
def golden_pbf() -> bytes:
    return (FIXTURES / "osm_golden.pbf").read_bytes()


@pytest.fixture(scope="session")
def golden_xml() -> bytes:
    return (FIXTURES / "osm_golden.xml").read_bytes()


@pytest.fixture(scope="session")
def many_nodes_pbf() -> bytes:
    return (FIXTURES / "many_nodes.pbf").read_bytes()


@pytest.fixture(scope="session")
def spark():
    from osmspark.session import get_spark

    s = get_spark(app="osmspark-tests", master="local[8]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pages_df(spark):
    """Small in-memory pages table: golden + manyNodes + 4 synthetic."""
    from osmspark import model
    from osmspark.pages import pages_pandas

    return spark.createDataFrame(pages_pandas(6, nodes_per_page=120),
                                 schema=model.PAGES_SCHEMA).cache()
