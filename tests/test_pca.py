"""PCA operator pins: the basis invariants that replace a SQL oracle
(eigendecomposition is not SQL-expressible — q_pca_project is declared
rows-only; the moment INPUT is hash-pinned separately via
q_covariance)."""

from __future__ import annotations

import numpy as np
import pytest

from w4h_etl_container_spark.plans.vectors import DIM
from w4h_etl_container_spark.session import read_embeddings


@pytest.fixture(scope="module")
def model(spark, sf_dir):
    from w4h_etl_container_spark.operators.pca import fit_pca

    return fit_pca(read_embeddings(spark, sf_dir), DIM, 8)


class TestPcaFit:
    def test_basis_orthonormal(self, model):
        g = model.components @ model.components.T
        assert np.allclose(g, np.eye(8), atol=1e-10)

    def test_variance_descending_and_nonnegative(self, model):
        v = model.eigenvalues
        assert np.all(v >= 0)
        assert np.all(np.diff(v) <= 1e-12)

    def test_sign_pin(self, model):
        # each component's largest-|.| coordinate is positive — the
        # determinism pin over LAPACK's sign freedom
        for row in model.components:
            assert row[np.abs(row).argmax()] > 0

    def test_deterministic_refit(self, spark, sf_dir, model):
        from w4h_etl_container_spark.operators.pca import fit_pca

        again = fit_pca(read_embeddings(spark, sf_dir), DIM, 8)
        assert np.array_equal(again.components, model.components)
        assert np.array_equal(again.eigenvalues, model.eigenvalues)
        assert np.array_equal(again.mean, model.mean)


class TestPcaProject:
    def test_full_rank_projection_preserves_distances(self, spark, sf_dir):
        """With k=d the basis is a full orthogonal rotation: pairwise
        distances survive exactly (up to float32 output rounding) even
        though the basis came from the QUANTIZED covariance — V's
        orthogonality does not depend on the matrix it diagonalizes."""
        from w4h_etl_container_spark.operators.pca import fit_pca, pca_project

        emb = read_embeddings(spark, sf_dir).limit(50).cache()
        m = fit_pca(emb, DIM, DIM)
        rows = pca_project(emb, m).select("embedding", "reduced").collect()
        X = np.stack([np.array(r["embedding"], dtype=np.float64) for r in rows])
        Y = np.stack([np.array(r["reduced"], dtype=np.float64) for r in rows])
        dx = np.linalg.norm(X[:20, None, :] - X[None, :20, :], axis=2)
        dy = np.linalg.norm(Y[:20, None, :] - Y[None, :20, :], axis=2)
        assert np.allclose(dx, dy, atol=1e-3)

    def test_projected_variance_matches_eigenvalues(self, spark, sf_dir, model):
        """Mean projected score variance per component ≈ its eigenvalue
        (the covariance the basis was fit on is the e3-quantized one —
        tolerance covers the quantization gap)."""
        from w4h_etl_container_spark.operators.pca import pca_project

        emb = read_embeddings(spark, sf_dir)
        rows = pca_project(emb, model).select("reduced").collect()
        Y = np.stack([np.array(r["reduced"], dtype=np.float64) for r in rows])
        var = Y.var(axis=0)
        assert np.allclose(var, model.eigenvalues, atol=1e-5)
        # and the first component really is the high-variance direction
        assert var[0] == max(var)

    def test_empty_batch_safe(self, spark, model):
        from w4h_etl_container_spark.operators.pca import pca_project

        empty = spark.createDataFrame(
            [], "vec_id long, embedding array<float>, label int"
        )
        assert pca_project(empty, model).count() == 0
