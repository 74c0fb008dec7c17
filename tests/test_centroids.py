"""embedding_centroids: order-insensitivity and exactness vs NumPy."""

from __future__ import annotations

import numpy as np
import pandas as pd

from osmspark.pipeline.ann import embedding_centroids


def test_matches_numpy_quantized(spark):
    rng = np.random.default_rng(9)
    n, d = 200, 8
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    labels = rng.integers(0, 3, n)
    pdf = pd.DataFrame({"vec_id": range(n), "label": labels,
                        "embedding": [v.tolist() for v in vecs]})
    got = (embedding_centroids(spark.createDataFrame(pdf))
           .toPandas().sort_values(["label", "pos"]).reset_index(drop=True))
    for lab in range(3):
        m = labels == lab
        q = np.floor(vecs[m].astype(np.float64) * 1e6).sum(axis=0)
        exp = q / (1e6 * m.sum())
        sub = got[got.label == lab]
        assert np.array_equal(sub["centroid"].to_numpy(), exp)
        assert (sub["n_vecs"] == m.sum()).all()


def test_repartition_invariant(spark):
    rng = np.random.default_rng(10)
    pdf = pd.DataFrame({"vec_id": range(100),
                        "label": rng.integers(0, 2, 100),
                        "embedding": [rng.normal(size=4).astype(np.float32).tolist()
                                      for _ in range(100)]})
    df = spark.createDataFrame(pdf)
    a = embedding_centroids(df).orderBy("label", "pos").toPandas()
    b = (embedding_centroids(df.repartition(7))
         .orderBy("label", "pos").toPandas())
    assert a["centroid"].tolist() == b["centroid"].tolist()
