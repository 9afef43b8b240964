"""Power-iteration PCA vs numpy ground truth + layout invariance."""

from __future__ import annotations

import numpy as np

from mapreduceframework_cpp_spark.operators.pca import (
    power_iteration_top_component,
)
from mapreduceframework_cpp_spark.sources.tables import tbl


def _numpy_spectrum(emb_rows):
    X = np.array(emb_rows, dtype=np.float64)
    X = X - X.mean(axis=0)
    cov = X.T @ X / (len(X) - 1)
    w, v = np.linalg.eigh(cov)
    return w, v


def test_top_component_matches_numpy(spark, sf_dir):
    """Power iteration contracts direction error by lambda2/lambda1 per
    round, so what it guarantees depends on the spectrum: with a real
    eigengap the DIRECTION must align with numpy's top eigenvector;
    on a near-flat spectrum (this synthetic data: lambda2/lambda1 ~ 0.99)
    any vector in the near-degenerate top subspace is equally
    principal, and the surviving guarantee is the Rayleigh quotient
    approaching lambda1 (24 rounds here: contraction 0.93^48 on this
    spectrum puts the RQ within 5% of lambda1)."""
    emb = tbl(spark, sf_dir, "embeddings")
    got = power_iteration_top_component(emb, max_iter=24).collect()
    loadings = np.array(
        [r["loading"] for r in sorted(got, key=lambda r: r["dim"])]
    )
    eig = got[0]["eigenvalue"]
    rows = [r["embedding"] for r in emb.select("embedding").collect()]
    w, v = _numpy_spectrum(rows)
    true_eig = w[-1]
    assert eig > 0.95 * true_eig, (eig, true_eig)
    assert eig < true_eig * 1.001, (eig, true_eig)  # RQ can't exceed lambda1
    if w[-2] / w[-1] < 0.9:  # direction is only testable given a gap
        cos = abs(float(loadings @ v[:, -1]))
        assert cos > 0.99, f"direction cosine {cos}"
    assert abs(float(loadings @ loadings) - 1.0) < 1e-6  # unit vector


def test_top_component_partition_invariant(spark, sf_dir):
    emb = tbl(spark, sf_dir, "embeddings")
    ref = sorted(map(tuple, power_iteration_top_component(emb).collect()))
    for n in (1, 16):
        got = sorted(
            map(
                tuple,
                power_iteration_top_component(emb.repartition(n)).collect(),
            )
        )
        assert got == ref, f"{n} partitions changed the component"
