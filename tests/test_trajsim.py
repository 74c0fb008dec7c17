"""hausdorff_pairs: NumPy brute-force oracle, exact-integer threshold,
prefilter completeness on disjoint-bbox pairs."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from osmspark.spatial.trajsim import hausdorff_pairs

TRIPS = {
    1: [(0.0, 0.0), (0.0, 1.0), (0.0, 2.0)],
    2: [(0.1, 0.0), (0.1, 1.0), (0.1, 2.2)],      # near trip 1
    3: [(5.0, 5.0), (5.0, 6.0)],                  # far from 1/2
    4: [(5.4, 5.0), (5.4, 6.0)],                  # near 3, disjoint bbox
    5: [(40.0, 40.0)],                            # singleton, far away
}


def _pdf():
    rows = [{"trip_id": t, "lat": la, "lon": lo}
            for t, pts in TRIPS.items() for la, lo in pts]
    return pd.DataFrame(rows)


def _brute(max_deg):
    out = {}
    q = {t: np.round(np.array(p) * 1e6).astype(np.int64)
         for t, p in TRIPS.items()}
    for s in TRIPS:
        for t in TRIPS:
            if s >= t:
                continue
            d2 = ((q[s][:, None, :] - q[t][None, :, :]) ** 2).sum(2)
            h2 = max(d2.min(1).max(), d2.min(0).max())
            if h2 <= (max_deg * 1e6) ** 2:
                out[(s, t)] = np.sqrt(float(h2)) * 1e-6
    return out


@pytest.mark.parametrize("max_deg", [0.5, 1.0, 10.0])
def test_matches_brute_force(spark, max_deg):
    got = {(int(r.trip_a), int(r.trip_b)): r.hausdorff_deg
           for r in hausdorff_pairs(spark.createDataFrame(_pdf()),
                                    max_deg).collect()}
    exp = _brute(max_deg)
    assert set(got) == set(exp)
    for k in exp:
        assert got[k] == exp[k]          # same sqrt of the same int64


def test_disjoint_bbox_pair_survives(spark):
    # trips 3 and 4: bboxes don't overlap (gap 0.4 deg) but the
    # Hausdorff is 0.4 — the prefilter must keep the pair at 0.5
    got = hausdorff_pairs(spark.createDataFrame(_pdf()), 0.5).toPandas()
    pairs = set(zip(got.trip_a, got.trip_b))
    assert (3, 4) in pairs
    h = float(got[(got.trip_a == 3) & (got.trip_b == 4)].hausdorff_deg)
    assert h == pytest.approx(0.4, abs=1e-12)
    # far pairs are absent, not NULL
    assert not [p for p in pairs if 5 in p]


def test_invalid_threshold(spark):
    with pytest.raises(ValueError):
        hausdorff_pairs(spark.createDataFrame(_pdf()), 0.0)
