"""Physical-plan pins for the round-5 additions — the scale shapes the
docstrings claim are asserted against the executed plan:

- knox_statistic / contact_pairs / st_dbscan: bucketed equi-joins,
  never a cartesian or broadcast-nested-loop join (the O(n²) brute
  force exists only in the DuckDB oracles);
- lisa / gearys_c / general_g / gi_star_spacetime: the neighborhood is
  an exploded-offset EQUI-join (hash/sort-merge), no cartesian — the
  only cross joins are broadcast one-row global-moment attachments;
- mobility censuses (radius_of_gyration, location_diversity,
  k_anonymous_cells, rich_club): pure aggregates — ZERO Window
  operators (a window would serialize per-key at 100 TB);
- cell_transitions / jump_lengths: exactly the ONE lag window on the
  user partitioning, nothing else.
"""

import pytest

from osmspark.graph import degree_assortativity, rich_club
from osmspark.spatial.autocorr import (gearys_c, getis_general_g,
                                       local_morans_i)
from osmspark.spatial.cluster import st_dbscan
from osmspark.spatial.mobility import (cell_transitions, jump_lengths,
                                       k_anonymous_cells,
                                       location_diversity,
                                       radius_of_gyration)
from osmspark.spatial.spacetime import (contact_pairs, gi_star_spacetime,
                                        knox_statistic)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def pts(spark):
    rows = [(i % 4, i * 1000, i, float(i % 9) / 10, float(i % 7) / 10)
            for i in range(80)]
    return spark.createDataFrame(
        rows, "trip_id long, ts_us long, id long, lat double, lon double")


@pytest.fixture(scope="module")
def cells(spark):
    rows = [(x, y, (x * 3 + y) % 5 + 1) for x in range(4) for y in range(4)]
    return spark.createDataFrame(rows, "cell_x long, cell_y long, n long")


def _no_quadratic(plan):
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_knox_bucketed_never_cartesian(spark, pts):
    plan = _plan(knox_statistic(
        pts.select("id", "ts_us", "lat", "lon"), 100_000, 10 ** 9))
    # the only nested-loop joins are the one-row global-aggregate
    # attachments (n x sp_agg x tm_agg); both PAIR joins are bucketed
    # equi-joins and nothing is a cartesian product
    assert "CartesianProduct" not in plan
    assert (plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin")
            + plan.count("BroadcastHashJoin")) >= 2


def test_contacts_bucketed_never_cartesian(spark, pts):
    _no_quadratic(_plan(contact_pairs(pts, 100_000, 10 ** 9)))


def test_st_dbscan_never_cartesian(spark, pts):
    _no_quadratic(_plan(st_dbscan(
        pts.select("id", "lat", "lon", "ts_us"), 0.3, 10 ** 9, 3)))


def test_lattice_stats_equi_join_only(spark, cells):
    for df in (local_morans_i(cells), gearys_c(cells),
               getis_general_g(cells)):
        plan = _plan(df)
        assert "CartesianProduct" not in plan
        # the only BNL/cross allowed is the broadcast one-row moment
        # attach; neighborhood joins must be hash/merge equi-joins
        assert ("ShuffledHashJoin" in plan or "SortMergeJoin" in plan
                or "BroadcastHashJoin" in plan)


def test_gi_star_st_equi_join_only(spark):
    rows = [(x, y, t, (x + y + t) % 4 + 1)
            for x in range(3) for y in range(3) for t in range(3)]
    bins = pytest.importorskip("pyspark").sql.SparkSession.getActiveSession() \
        .createDataFrame(rows, "cell_x long, cell_y long, tbin long, n long")
    plan = _plan(gi_star_spacetime(bins))
    assert "CartesianProduct" not in plan


def test_mobility_censuses_no_window(spark, pts):
    assert "Window" not in _plan(radius_of_gyration(pts))
    assert "Window" not in _plan(location_diversity(pts))
    assert "Window" not in _plan(k_anonymous_cells(pts, k=2))


def test_graph_structure_no_window_no_cartesian(spark):
    edges = pts_edges = None
    import pyspark.sql.functions as F
    spark_edges = spark.range(60).select(
        (F.col("id") % 9).alias("src"),
        ((F.col("id") * 5 + 2) % 9).alias("dst"))
    for df in (degree_assortativity(spark_edges),
               rich_club(spark_edges, ks=[1, 2])):
        plan = _plan(df)
        assert "Window" not in plan
        assert "CartesianProduct" not in plan


def test_transitions_single_window(spark, pts):
    # two Window nodes total: the lag over RAW fixes exactly once
    # (never recomputed for the marginal) + the sum over the small
    # aggregated cell-pair table
    plan = _plan(cell_transitions(pts))
    assert plan.count("Window") == 2
    lag_windows = [ln for ln in plan.splitlines()
                   if "Window" in ln and "lag(" in ln]
    assert len(lag_windows) == 1
    plan2 = _plan(jump_lengths(pts))
    assert plan2.count("Window") == 1
