"""Tests for the extended model inventory: NMF, EASE-R, MF-SGD family,
predefined lists, cold-user fallbacks."""

import numpy as np
import pytest
import scipy.sparse as sps

from ganmf_tpu.eval import EvaluatorHoldout
from ganmf_tpu.models import (
    EASE_R_Recommender,
    MatrixFactorization_AsySVD,
    MatrixFactorization_BPR,
    MatrixFactorization_FunkSVD,
    NMFRecommender,
    PredefinedListRecommender,
    PureSVDRecommender,
)
from ganmf_tpu.models.base import compute_W_sparse_from_item_latent_factors


def _map_at5(model, test):
    results, _ = EvaluatorHoldout(test, [5]).evaluateRecommender(model)
    return results[5]["MAP"]


def test_nmf_nonnegative_and_scores(urm_pair):
    train, test = urm_pair
    model = NMFRecommender(train)
    model.fit(num_factors=8, n_iter=50)
    assert np.all(model.USER_factors >= 0)
    assert np.all(model.ITEM_factors >= 0)
    assert np.isfinite(_map_at5(model, test))


def test_ease_r(urm_pair):
    train, test = urm_pair
    model = EASE_R_Recommender(train)
    model.fit(l2_norm=10.0)
    assert np.all(model.W_sparse.diagonal() == 0)
    assert _map_at5(model, test) > 0


def test_mf_sgd_family(urm_pair):
    train, test = urm_pair
    for cls in (MatrixFactorization_BPR, MatrixFactorization_FunkSVD, MatrixFactorization_AsySVD):
        model = cls(train)
        model.fit(epochs=10, num_factors=8, learning_rate=0.05, batch_size=32)
        assert np.isfinite(_map_at5(model, test)), cls.__name__


def test_mf_sgd_bias_terms(urm_pair):
    """use_bias (the reference's rating-prediction default,
    MatrixFactorization_Cython.py:39) learns USER/ITEM/GLOBAL biases and
    folds them into the scoring factors: scores must equal
    U V^T + bU + bV + bG, and on explicit ratings the biased model must
    beat the predict-the-global-mean RMSE floor
    (Base/BaseMatrixFactorizationRecommender.py:118-124 scoring)."""
    import jax.numpy as jnp

    train, _ = urm_pair
    rng = np.random.RandomState(11)
    rated = train.copy()
    rated.data = np.clip(3.5 + 0.8 * rng.randn(rated.nnz), 0.5, 5.0).astype(np.float32)

    model = MatrixFactorization_FunkSVD(rated)
    model.fit(epochs=60, num_factors=6, learning_rate=2e-2, batch_size=64,
              samples_per_epoch=rated.nnz, random_seed=3)
    assert model.use_bias and model.USER_bias is not None
    assert abs(model.GLOBAL_bias) > 0.0

    U, V, _ = model._factors_device()
    scores = np.asarray(jnp.dot(U, V.T))
    manual = (model.USER_factors @ model.ITEM_factors.T + model.GLOBAL_bias
              + model.USER_bias[:, None] + model.ITEM_bias[None, :])
    np.testing.assert_allclose(scores, manual, rtol=1e-5, atol=1e-5)

    coo = rated.tocoo()
    pred = scores[coo.row, coo.col]
    mu = rated.data.mean()
    assert np.sqrt(np.mean((pred - coo.data) ** 2)) < np.sqrt(np.mean((coo.data - mu) ** 2))

    # artifact carries the reference's bias keys (:217-219)
    d = model._save_dict()
    assert d["use_bias"] and "GLOBAL_bias" in d and d["USER_bias"].shape == (train.shape[0],)

    # use_bias=False restores the biasless path
    plain = MatrixFactorization_FunkSVD(rated)
    plain.fit(epochs=2, num_factors=6, use_bias=False, batch_size=64)
    assert not plain.use_bias and plain.USER_bias is None


def test_mf_sgd_csr_storage_matches_dense(urm_pair):
    """urm_storage='csr' replaces the dense [U, I] ratings lookup with the
    padded value table and the negative-rejection gather with a padded-row
    membership test — same RNG stream, so the trajectories are identical."""
    train, _ = urm_pair
    rng = np.random.RandomState(7)
    rated = train.copy()
    rated.data = rng.randint(1, 6, size=rated.nnz).astype(np.float32)

    # BPR exercises the membership-based negative rejection; FunkSVD the
    # padded-value rating read (explicit 1-5 ratings so r_ui is nontrivial)
    for cls, urm in ((MatrixFactorization_BPR, train), (MatrixFactorization_FunkSVD, rated)):
        kwargs = dict(epochs=3, num_factors=6, learning_rate=0.05, batch_size=32)
        dense = cls(urm)
        dense.fit(**kwargs)
        streamed = cls(urm)
        streamed.fit(urm_storage="csr", **kwargs)
        np.testing.assert_allclose(
            streamed.USER_factors, dense.USER_factors, rtol=1e-6, atol=1e-7,
            err_msg=cls.__name__,
        )
        np.testing.assert_allclose(
            streamed.ITEM_factors, dense.ITEM_factors, rtol=1e-6, atol=1e-7,
            err_msg=cls.__name__,
        )


def test_predefined_list():
    rec = sps.csr_matrix(np.array([[5, 3, 0], [2, 0, 0]], dtype=np.int32))
    model = PredefinedListRecommender(rec)
    assert model.recommend(0, cutoff=2) == [5, 3]
    assert model.recommend([0, 1], cutoff=1) == [[5], [2]]


def test_w_sparse_from_item_factors():
    rng = np.random.RandomState(0)
    V = rng.randn(20, 4).astype(np.float32)
    W = compute_W_sparse_from_item_latent_factors(V, topK=5)
    dense = np.asarray(W.todense())
    expected = V @ V.T
    # each column holds its top-5 values
    for j in range(20):
        nz = dense[:, j] != 0
        assert nz.sum() <= 5
        top = np.sort(expected[:, j])[-5:]
        assert set(np.round(dense[nz, j], 4)) <= set(np.round(top, 4))


def test_cold_user_fallbacks(urm_pair):
    train, test = urm_pair
    model = PureSVDRecommender(train)
    model.fit(num_factors=6)

    # knock out some users' training data -> cold in new URM
    new_train = train.tolil()
    new_train[0, :] = 0
    new_train[1, :] = 0
    new_train = new_train.tocsr()

    model.set_URM_train(new_train, estimate_model_for_cold_users="itemKNN", topK=10)
    scores = model._compute_item_score(np.array([0, 1, 2]))
    # users 0,1 cold for MF but scored through the KNN fallback only if they
    # have interactions (they don't) -> -inf; user 2 warm -> finite
    assert np.all(np.isinf(scores[0])) and np.all(np.isinf(scores[1]))
    assert np.isfinite(scores[2]).all()

    model2 = PureSVDRecommender(train)
    model2.fit(num_factors=6)
    model2.set_URM_train(train, estimate_model_for_cold_users="mean_item_factors")
    scores2 = model2._compute_item_score(np.array([0, 1]))
    assert np.isfinite(scores2).all()


def test_ease_r_topk_device_prune_matches_host(urm_pair):
    """The fused device top-K path equals pruning the dense weights with
    similarity_matrix_topk on host."""
    from ganmf_tpu.models.base import similarity_matrix_topk
    from ganmf_tpu.models.extras import _ease_r_weights

    train, _ = urm_pair
    model = EASE_R_Recommender(train)
    model.fit(l2_norm=10.0, topK=5)

    B = np.array(_ease_r_weights(model.device_urm().dense, 10.0))
    np.fill_diagonal(B, 0.0)
    want = sps.csr_matrix(similarity_matrix_topk(B, k=5))
    got = model.W_sparse
    assert (got != want).nnz == 0 or np.allclose(got.toarray(), want.toarray(), atol=1e-5)


def test_presample_trains_and_is_deterministic(urm_pair):
    """presample=True (sampling hoisted out of the serialized scan) trains
    both SGD families; same seed + flag reproduces the same result."""
    from ganmf_tpu.models import SLIM_BPR, MatrixFactorization_BPR

    train, _ = urm_pair
    a = SLIM_BPR(train)
    a.fit(epochs=2, topK=10, learning_rate=0.05, presample=True)
    b = SLIM_BPR(train)
    b.fit(epochs=2, topK=10, learning_rate=0.05, presample=True)
    assert (a.W_sparse != b.W_sparse).nnz == 0
    assert a.W_sparse.nnz > 0

    m1 = MatrixFactorization_BPR(train)
    m1.fit(epochs=2, num_factors=4, batch_size=32, presample=True)
    m2 = MatrixFactorization_BPR(train)
    m2.fit(epochs=2, num_factors=4, batch_size=32, presample=True)
    np.testing.assert_array_equal(m1.USER_factors, m2.USER_factors)
    assert np.isfinite(m1.USER_factors).all()
