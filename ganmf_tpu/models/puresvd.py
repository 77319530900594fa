"""PureSVD: truncated SVD of the interaction matrix.

The reference wraps sklearn's randomized_svd (MatrixFactorization/
PureSVDRecommender.py:29-37). Here the randomized range-finder runs on the
TPU — it is matmul-dominated (A @ Omega, power iterations, Q^T A), exactly
the shape the MXU wants — and only the tiny (k+p) x (k+p) SVD runs via
jnp.linalg.svd.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ganmf_tpu.models.base import MatrixFactorizationRecommender


@functools.partial(jax.jit, static_argnames=("num_factors", "n_oversample", "n_iter"))
def _randomized_svd(A: jnp.ndarray, key, num_factors: int, n_oversample: int = 10, n_iter: int = 7):
    k = num_factors + n_oversample
    hi = jax.lax.Precision.HIGHEST

    def _colnorm(Y):
        # cheap per-column normalization between power iterations; QR (slow
        # on TPU: serial Householder) is reserved for every third iteration
        # and the final range extraction
        return Y / jnp.maximum(jnp.linalg.norm(Y, axis=0, keepdims=True), 1e-12)

    omega = jax.random.normal(key, (A.shape[1], k), dtype=A.dtype)
    Y = jnp.dot(A, omega, precision=hi)
    for it in range(n_iter):
        if it % 3 == 2:
            Y, _ = jnp.linalg.qr(Y)
        else:
            Y = _colnorm(Y)
        Z = jnp.dot(A.T, Y, precision=hi)
        Z = _colnorm(Z)
        Y = jnp.dot(A, Z, precision=hi)
    Q, _ = jnp.linalg.qr(Y)
    B = jnp.dot(Q.T, A, precision=hi)  # [k, I]
    Ub, S, Vt = jnp.linalg.svd(B, full_matrices=False)
    U = jnp.dot(Q, Ub, precision=hi)
    return U[:, :num_factors], S[:num_factors], Vt[:num_factors]


class PureSVDRecommender(MatrixFactorizationRecommender):
    RECOMMENDER_NAME = "PureSVDRecommender"

    def fit(self, num_factors: int = 100, random_seed: int = 1234, n_iter: int = 7):
        A = self.device_urm().dense
        U, S, Vt = _randomized_svd(A, jax.random.PRNGKey(random_seed), num_factors=num_factors, n_iter=n_iter)
        self.USER_factors = np.asarray(U)
        self.ITEM_factors = np.asarray((S[:, None] * Vt).T)
        self._invalidate_device_cache()
