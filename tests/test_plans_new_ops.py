"""Physical-plan pins for the round-4 additions — the shapes that make
them scale are asserted, not just argued in docstrings:

- dwithin_meters_join: bucket equi-join, never a cartesian/BNL join;
- detect_staypoints: BOTH row_number windows share one sort — exactly
  one Window-related Exchange on trip (plus the final agg exchange);
- repetition_signals / od_matrix: argmax/collapse via aggregates —
  ZERO Window operators anywhere in the plan;
- pagerank_mass: no cartesian joins across the iteration chain.
"""

import pytest

from osmspark.graph import pagerank_mass
from osmspark.pipeline.repetition import repetition_signals
from osmspark.spatial import detect_staypoints, dwithin_meters_join
from osmspark.spatial.flows import od_matrix


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def traj(spark):
    rows = [(i % 3, i * 1000, i, float(i % 7) / 10, float(i % 5) / 10)
            for i in range(60)]
    return spark.createDataFrame(
        rows, "trip_id long, ts_us long, id long, lat double, lon double")


def test_dwithin_meters_no_cartesian(spark, traj):
    pts = traj.selectExpr("id", "lat", "lon")
    plan = _plan(dwithin_meters_join(pts, pts, 5000.0, keep_self=False))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_staypoints_single_exchange(spark, traj):
    plan = _plan(detect_staypoints(traj))
    # ONE shuffle total: both windows AND the run aggregation reuse the
    # hashpartitioning(trip) exchange (agg keys contain trip); the
    # second window re-sorts within partitions — no extra shuffle
    assert plan.count("Exchange") == 1
    assert plan.count("Sort ") == 2


def test_repetition_and_od_have_no_window(spark, traj):
    docs = traj.selectExpr("id AS doc_id",
                           "concat('a b c ', cast(id AS string)) AS text")
    assert "Window" not in _plan(repetition_signals(docs))
    assert "Window" not in _plan(od_matrix(traj))


def test_pagerank_no_cartesian(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 1)],
                                  "src long, dst long")
    plan = _plan(pagerank_mass(edges, n_iter=3))
    assert "CartesianProduct" not in plan


def test_hll_partial_max_below_exchange(spark):
    # the register pass must be map-side combinable: a hot group's
    # billion rows reduce to <=64 (j, partial max) rows per task BEFORE
    # the shuffle — pinned by partial_max appearing under HashAggregate
    # twice (register max, then finalize sum) and no Window anywhere
    from osmspark.pipeline.cardinality import hll_distinct
    df = spark.createDataFrame(
        [("g", f"v{i}") for i in range(50)], "g string, v string")
    plan = _plan(hll_distinct(df, ["g"], "v"))
    assert "partial_max" in plan
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_sssp_round_is_join_plus_combinable_min(spark):
    # one relaxation round = equi-join + min aggregate; never a
    # cartesian product or a window over the frontier
    from osmspark.graph import shortest_paths
    edges = spark.createDataFrame([(1, 2, 3), (2, 3, 4), (1, 3, 9)],
                                  "src long, dst long, w long")
    plan = _plan(shortest_paths(edges, 1))
    assert "CartesianProduct" not in plan
    assert "Window" not in plan


def test_gopher_filter_map_only(spark, traj):
    from osmspark.pipeline.quality import gopher_filter
    docs = traj.selectExpr("id AS doc_id",
                           "concat('the a data row ', cast(id AS string))"
                           " AS text")
    plan = _plan(gopher_filter(docs))
    # pure per-row expressions: no shuffle, no Python worker
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_bloom_probe_broadcasts_filter_side(spark, traj):
    from osmspark.pipeline.membership import (bloom_build,
                                              bloom_might_contain)
    docs = traj.selectExpr("trip_id AS g", "cast(id AS string) AS v")
    flt = bloom_build(docs, ["g"], "v", m=64, k=3)
    plan = _plan(bloom_might_contain(docs, flt, "v", ["g"], m=64, k=3))
    # probes meet the per-group filter rows map-side: broadcast hash
    # join, never a shuffle on the probe side's join key
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
