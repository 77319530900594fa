"""Graph-based random-walk recommenders P3alpha and RP3beta.

The reference computes W = (Piu^a)(Pui^a) in 200-column host blocks with
per-row argsort top-K (GraphBased/P3alphaRecommender.py:52-141). Here the
walk product is one dense MXU matmul over HBM-resident transition matrices
and top-K uses lax.top_k per row, then the reference's final column-wise
top-K prune is applied.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sps
from sklearn.preprocessing import normalize

from ganmf_tpu.data.device import dense_from_sparse
from ganmf_tpu.models.base import ItemSimilarityRecommender, check_matrix, similarity_matrix_topk


@functools.partial(jax.jit, static_argnames=("topk",))
def _walk_topk(Piu: jnp.ndarray, Pui: jnp.ndarray, topk: int):
    """Rows of W = Piu @ Pui with zeroed diagonal, top-K per row."""
    from ganmf_tpu.ops.topk import tiled_topk

    hi = jax.lax.Precision.HIGHEST
    W = jnp.dot(Piu, Pui, precision=hi)  # [I, I]
    W = jnp.where(jnp.eye(W.shape[0], dtype=bool), 0.0, W)
    vals, idx = tiled_topk(W, topk)
    return vals, idx


def _rows_topk_to_csr(vals: np.ndarray, idx: np.ndarray, n: int) -> sps.csr_matrix:
    keep = vals != 0.0
    counts = keep.sum(axis=1)
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=indptr[1:])
    return sps.csr_matrix((vals[keep], idx[keep], indptr), shape=(n, n), dtype=np.float32)


class P3alphaRecommender(ItemSimilarityRecommender):
    RECOMMENDER_NAME = "P3alphaRecommender"

    def fit(self, topK: int = 100, alpha: float = 1.0, min_rating: float = 0, implicit: bool = False,
            normalize_similarity: bool = False):
        self.topK = topK
        self.alpha = alpha
        self.min_rating = min_rating
        self.implicit = implicit
        self.normalize_similarity = normalize_similarity

        if min_rating > 0:
            self.URM_train.data[self.URM_train.data < min_rating] = 0
            self.URM_train.eliminate_zeros()
            if implicit:
                self.URM_train.data = np.ones(self.URM_train.data.size, dtype=np.float32)
            self._invalidate_device_cache()

        Pui = normalize(self.URM_train, norm="l1", axis=1)
        X_bool = self.URM_train.transpose(copy=True)
        X_bool.data = np.ones(X_bool.data.size, np.float32)
        Piu = normalize(X_bool, norm="l1", axis=1)

        if alpha != 1.0:
            Pui = Pui.power(alpha)
            Piu = Piu.power(alpha)

        vals, idx = _walk_topk(
            dense_from_sparse(sps.csr_matrix(Piu, dtype=np.float32)),
            dense_from_sparse(sps.csr_matrix(Pui, dtype=np.float32)),
            topk=min(topK, self.n_items),
        )
        W = _rows_topk_to_csr(np.asarray(vals, np.float32), np.asarray(idx), self.n_items)

        if normalize_similarity:
            W = normalize(W, norm="l1", axis=1)
        if topK:
            W = similarity_matrix_topk(W, k=topK)
        self.W_sparse = check_matrix(W, "csr")


class RP3betaRecommender(ItemSimilarityRecommender):
    """RP3beta: P3alpha with the walk matrix divided by item popularity^beta
    (reference GraphBased/RP3betaRecommender.py)."""

    RECOMMENDER_NAME = "RP3betaRecommender"

    def fit(self, alpha: float = 1.0, beta: float = 0.6, min_rating: float = 0, topK: int = 100,
            implicit: bool = False, normalize_similarity: bool = True):
        self.alpha = alpha
        self.beta = beta
        self.min_rating = min_rating
        self.topK = topK
        self.implicit = implicit
        self.normalize_similarity = normalize_similarity

        if min_rating > 0:
            self.URM_train.data[self.URM_train.data < min_rating] = 0
            self.URM_train.eliminate_zeros()
            if implicit:
                self.URM_train.data = np.ones(self.URM_train.data.size, dtype=np.float32)
            self._invalidate_device_cache()

        Pui = normalize(self.URM_train, norm="l1", axis=1)
        X_bool = self.URM_train.transpose(copy=True)
        X_bool.data = np.ones(X_bool.data.size, np.float32)
        degree = np.zeros(self.n_items, dtype=np.float32)
        nonzero = np.asarray(X_bool.sum(axis=1)).ravel() > 0
        degree[nonzero] = np.power(np.asarray(X_bool.sum(axis=1)).ravel()[nonzero], -beta)
        Piu = normalize(X_bool, norm="l1", axis=1)

        if alpha != 1.0:
            Pui = Pui.power(alpha)
            Piu = Piu.power(alpha)

        vals, idx = _walk_topk(
            dense_from_sparse(sps.csr_matrix(Piu, dtype=np.float32)),
            dense_from_sparse(sps.csr_matrix(Pui, dtype=np.float32)),
            topk=min(topK, self.n_items),
        )
        # scale each column j of the walk matrix by degree[j]^(-beta)
        vals = np.asarray(vals, np.float32) * degree[np.asarray(idx)]
        W = _rows_topk_to_csr(vals, np.asarray(idx), self.n_items)

        if normalize_similarity:
            W = normalize(W, norm="l1", axis=1)
        if topK:
            W = similarity_matrix_topk(W, k=topK)
        self.W_sparse = check_matrix(W, "csr")
