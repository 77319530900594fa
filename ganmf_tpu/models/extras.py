"""Additional recommenders rounding out the reference inventory.

- NMF: non-negative MF via multiplicative updates on device (the reference
  wraps sklearn NMF, MatrixFactorization/NMFRecommender.py:15).
- EASE_R: closed-form ridge item-item model (committed reference results
  under test_results/EASE_R_Recommender__*); one Gram inverse on device.
- PredefinedListRecommender: serves fixed lists
  (Base/PredefinedListRecommender.py:14).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sps

from ganmf_tpu.models.base import (
    ItemSimilarityRecommender,
    MatrixFactorizationRecommender,
    Recommender,
    check_matrix,
)


@functools.partial(jax.jit, static_argnames=("num_factors", "n_iter"))
def _nmf_multiplicative(A: jnp.ndarray, key, num_factors: int, n_iter: int, l1_ratio: float = 0.0):
    """Lee-Seung multiplicative updates for min ||A - W H||_F, W,H >= 0."""
    hi = jax.lax.Precision.HIGHEST
    k1, k2 = jax.random.split(key)
    n, m = A.shape
    scale = jnp.sqrt(jnp.mean(A) / num_factors)
    W = jax.random.uniform(k1, (n, num_factors)) * scale + 1e-4
    H = jax.random.uniform(k2, (num_factors, m)) * scale + 1e-4

    def body(carry, _):
        W, H = carry
        WH_H = jnp.dot(jnp.dot(W, H, precision=hi), H.T, precision=hi)
        W = W * jnp.dot(A, H.T, precision=hi) / jnp.maximum(WH_H, 1e-10)
        WtWH = jnp.dot(W.T, jnp.dot(W, H, precision=hi), precision=hi)
        H = H * jnp.dot(W.T, A, precision=hi) / jnp.maximum(WtWH, 1e-10)
        return (W, H), None

    (W, H), _ = jax.lax.scan(body, (W, H), None, length=n_iter)
    return W, H


class NMFRecommender(MatrixFactorizationRecommender):
    RECOMMENDER_NAME = "NMFRecommender"

    def fit(self, num_factors: int = 100, l1_ratio: float = 0.5, n_iter: int = 200, random_seed: int = 1234):
        A = self.device_urm().dense
        W, H = _nmf_multiplicative(A, jax.random.PRNGKey(random_seed), int(num_factors), int(n_iter))
        self.USER_factors = np.asarray(W)
        self.ITEM_factors = np.asarray(H.T)
        self._invalidate_device_cache()


@functools.partial(jax.jit, static_argnames=())
def _ease_r_weights(A: jnp.ndarray, l2_norm: float):
    """B = -P / diag(P) with zero diagonal, P = (A^T A + lambda I)^-1.

    The Gram matrix is symmetric positive definite, so the inverse runs as a
    Cholesky solve against the identity (LU's pivoting is wasted work here)."""
    hi = jax.lax.Precision.HIGHEST
    G = jnp.dot(A.T, A, precision=hi)
    G = G + l2_norm * jnp.eye(G.shape[0], dtype=G.dtype)
    P = jax.scipy.linalg.cho_solve(
        jax.scipy.linalg.cho_factor(G), jnp.eye(G.shape[0], dtype=G.dtype)
    )
    B = -P / jnp.diag(P)[None, :]
    return jnp.where(jnp.eye(B.shape[0], dtype=bool), 0.0, B.T).T  # zero diagonal


@functools.partial(jax.jit, static_argnames=("k",))
def _ease_r_weights_topk(A: jnp.ndarray, l2_norm: float, k: int):
    """Fused weights + column-wise top-K selection. Exact zeros (the diagonal)
    become -inf sentinels so selection runs over stored-nonzero semantics
    (negatives kept — reference Recommender_utils.py:48-115); only the
    [I, k] winners ever leave the device."""
    from ganmf_tpu.ops.topk import tiled_topk

    B = _ease_r_weights(A, l2_norm)
    sent = jnp.where(B == 0.0, -jnp.inf, B)
    vals, idx = tiled_topk(sent.T, k)  # per column j: top rows i
    return jnp.where(jnp.isfinite(vals), vals, 0.0), idx


def _ease_r_topk_sharded(A: jnp.ndarray, l2_norm: float, k: int, plan):
    """Item-column-sharded EASE-R (VERDICT r2 #6): the Gram, the Cholesky
    factor, the inverse columns, the B weights and the top-K selection are
    ALL column-sharded over the mesh model axis — the factorization is the
    blocked right-looking distributed Cholesky in ops/distchol.py, so no
    [I, I] buffer is ever replicated on a single chip."""
    from ganmf_tpu.ops.distchol import ease_r_topk_sharded

    return ease_r_topk_sharded(A, l2_norm, k, plan)


class EASE_R_Recommender(ItemSimilarityRecommender):
    """Embarrassingly Shallow Autoencoder (Steck 2019): B = I - P / diag(P),
    P = (A^T A + lambda I)^-1, zero diagonal. One device Cholesky solve;
    with topK the column prune happens on device and only [I, topK]
    candidates transfer to host."""

    RECOMMENDER_NAME = "EASE_R_Recommender"

    def fit(self, topK: int = None, l2_norm: float = 1e3, mesh_plan=None):
        A = self.device_urm().dense
        n = A.shape[1]
        if topK is not None:
            k = min(int(topK), n)
            if mesh_plan is not None and mesh_plan.n_model > 1:
                vals, idx = _ease_r_topk_sharded(A, float(l2_norm), k, mesh_plan)
            else:
                vals, idx = _ease_r_weights_topk(A, float(l2_norm), k)
                if 4 * n * n <= self._DENSE_W_BYTE_LIMIT:
                    # pruned W stays device-authoritative: no [I, k] readback
                    from ganmf_tpu.ops.topk import scatter_col_topk_dense

                    self._adopt_device_w(scatter_col_topk_dense(vals, idx))
                    return
            vals = np.asarray(vals, dtype=np.float32)
            idx = np.asarray(idx)
            keep = vals != 0.0
            counts = keep.sum(axis=1)
            indptr = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(counts, out=indptr[1:])
            W = sps.csc_matrix(
                (vals[keep], idx[keep], indptr), shape=(n, n), dtype=np.float32
            )
            self.W_sparse = check_matrix(W, "csr")
        else:
            # device-authoritative dense W: scoring runs from HBM directly;
            # the host CSR materializes only if an artifact save asks for it
            self._adopt_device_w(_ease_r_weights(A, float(l2_norm)))


class PredefinedListRecommender(Recommender):
    """Serves externally-supplied ranked lists
    (reference Base/PredefinedListRecommender.py:14)."""

    RECOMMENDER_NAME = "PredefinedListRecommender"

    def __init__(self, URM_recommendations_items):
        rec = check_matrix(URM_recommendations_items, "csr", dtype=np.int32)
        super().__init__(sps.csr_matrix(rec.shape, dtype=np.float32))
        self.URM_recommendations = rec

    def fit(self):
        pass

    def recommend(self, user_id_array, cutoff=None, **kwargs):
        if np.isscalar(user_id_array):
            users, single = [int(user_id_array)], True
        else:
            users, single = list(user_id_array), False
        out = []
        for u in users:
            start, end = self.URM_recommendations.indptr[u], self.URM_recommendations.indptr[u + 1]
            items = self.URM_recommendations.data[start:end]
            out.append(list(items[:cutoff] if cutoff else items))
        return out[0] if single else out
