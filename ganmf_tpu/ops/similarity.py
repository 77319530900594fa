"""Column-wise similarity engines on TPU.

Replaces the reference's blockwise host engines (Base/Similarity/
Compute_Similarity_Python.py:209-383, Compute_Similarity_Euclidean.py:83-236
and the Cython variant): the Gram matrix A^T A is one MXU matmul over the
dense HBM-resident interaction matrix, the normalization family
(cosine / adjusted / asymmetric / pearson / jaccard / dice / tversky /
euclidean) is fused elementwise, and per-column top-K uses lax.top_k.
Only the final CSR assembly happens on host.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sps

SIMILARITIES = ("cosine", "adjusted", "asymmetric", "pearson", "jaccard", "tanimoto", "dice", "tversky", "euclidean")


@functools.partial(
    jax.jit,
    static_argnames=("mode", "topk", "normalize", "normalize_avg_row", "distance_mode", "use_row_weights"),
)
def _similarity_topk(
    A: jnp.ndarray,  # [n_rows, n_cols] preprocessed data
    row_weights: jnp.ndarray,  # [n_rows] (ones when unused)
    mode: str,
    topk: int,
    shrink: float,
    normalize: bool,
    asymmetric_alpha: float,
    tversky_alpha: float,
    tversky_beta: float,
    normalize_avg_row: bool,
    distance_mode: str,
    use_row_weights: bool,
):
    hi = jax.lax.Precision.HIGHEST
    n_rows, n_cols = A.shape

    ss2 = jnp.sum(A * A, axis=0)  # sum of squares per column
    if use_row_weights and mode != "euclidean":
        G = jnp.dot((row_weights[:, None] * A).T, A, precision=hi)
    else:
        G = jnp.dot(A.T, A, precision=hi)  # [n_cols, n_cols]

    eye = jnp.eye(n_cols, dtype=bool)

    if mode == "euclidean":
        # (a-b)^2 = a^2 + b^2 - 2ab; reference Compute_Similarity_Euclidean.py:170-207
        dist = ss2[None, :] + ss2[:, None] - 2.0 * G
        dist = jnp.where(eye, 0.0, dist)
        if use_row_weights:
            # reference scales item_distance[i] (the candidate axis) by
            # row_weights[i] (Compute_Similarity_Euclidean.py:181); it only
            # type-checks there when n_rows == n_cols. Candidate axis is
            # dim 0 in this kernel's [candidate, target] orientation.
            dist = dist * row_weights[:, None]
        if normalize:
            ss = jnp.sqrt(ss2)
            dist = dist / (ss[:, None] * ss[None, :])
        if normalize_avg_row:
            dist = dist / n_rows
        dist = jnp.sqrt(jnp.maximum(dist, 0.0))
        if distance_mode == "exp":
            W = 1.0 / (jnp.exp(dist) + shrink + 1e-9)
        elif distance_mode == "log":
            W = 1.0 / (jnp.log(dist + 1.0) + shrink + 1e-9)
        else:
            W = 1.0 / (dist + shrink + 1e-9)
        # items with identical interaction sets have distance exactly 0, so
        # euclidean similarity is full of large exact ties; lax.top_k's
        # lowest-index tie-break would concentrate every tied neighborhood
        # on the same few columns (the reference's argpartition spreads ties
        # arbitrarily). A hashed relative perturbation (~1e-6) spreads ties
        # deterministically without disturbing non-tied order.
        rows_h = jax.lax.broadcasted_iota(jnp.uint32, W.shape, 0)
        cols_h = jax.lax.broadcasted_iota(jnp.uint32, W.shape, 1)
        h = (rows_h * jnp.uint32(2654435761) + cols_h * jnp.uint32(97777)) & jnp.uint32(0xFFFFF)
        W = W * (1.0 + 1e-6 * (h.astype(jnp.float32) / float(1 << 20)))
        W = jnp.where(eye, 0.0, W)
    else:
        W = jnp.where(eye, 0.0, G)
        if normalize:
            if mode == "asymmetric":
                # alpha weights the *target column* item j, (1 - alpha) the
                # candidate rows i (Compute_Similarity_Python.py:248-312)
                ss = jnp.sqrt(ss2)
                den = jnp.power(ss, 2.0 * (1.0 - asymmetric_alpha))[:, None] * jnp.power(
                    ss, 2.0 * asymmetric_alpha
                )[None, :] + shrink + 1e-6
            else:
                ss = jnp.sqrt(ss2)
                den = ss[:, None] * ss[None, :] + shrink + 1e-6
            W = W / den
        elif mode in ("jaccard", "tanimoto"):
            W = W / (ss2[:, None] + ss2[None, :] - W + shrink + 1e-6)
        elif mode == "dice":
            W = W / (ss2[:, None] + ss2[None, :] + shrink + 1e-6)
        elif mode == "tversky":
            # tversky_alpha weights the target column j, tversky_beta the
            # candidate rows i (Compute_Similarity_Python.py:328-332)
            W = W / (
                W
                + (ss2[None, :] - W) * tversky_alpha
                + (ss2[:, None] - W) * tversky_beta
                + shrink
                + 1e-6
            )
        elif shrink != 0:
            W = W / shrink

    # cold-item pairs yield 0/0 = NaN under the normalizations; the
    # reference leaves them in W but its sparse scoring never touches them
    # — dense scoring would propagate them, so zero them here
    W = jnp.where(jnp.isnan(W), 0.0, W)

    # W[i, j]: similarity of row-item i to column-item j; reference keeps the
    # top-K per *column* (note the reference normalizes with the column item
    # in the first denominator slot; here rows carry ss[:, None] == "all
    # items", columns the target item, matching its orientation).
    from ganmf_tpu.ops.topk import tiled_topk

    vals, idx = tiled_topk(W.T, topk)  # per column j: top rows i
    return vals, idx


def compute_similarity(
    data_matrix,
    similarity: str = "cosine",
    topK: int = 100,
    shrink: float = 0,
    normalize: bool = True,
    asymmetric_alpha: float = 0.5,
    tversky_alpha: float = 1.0,
    tversky_beta: float = 1.0,
    normalize_avg_row: bool = False,
    similarity_from_distance_mode: str = "lin",
    row_weights: Optional[np.ndarray] = None,
    **_unused,
) -> sps.csr_matrix:
    """Column-to-column similarity with top-K pruning.

    Drop-in equivalent of the reference Compute_Similarity dispatcher
    (Base/Similarity/Compute_Similarity.py:29-107) with every implementation
    unified on one device kernel. Returns CSR [n_cols, n_cols] where column
    j holds the top-K most similar items to j (zeros dropped).
    """
    if similarity not in SIMILARITIES:
        raise ValueError(f"similarity must be one of {SIMILARITIES}, got '{similarity}'")

    X = sps.csr_matrix(data_matrix, dtype=np.float32).copy()
    n_rows, n_cols = X.shape
    topK = min(topK, n_cols)

    # preprocessing (Compute_Similarity_Python.py:117-204)
    if similarity == "adjusted":
        nnz_per_row = np.diff(X.indptr)
        row_sum = np.asarray(X.sum(axis=1)).ravel()
        avg = np.divide(row_sum, nnz_per_row, out=np.zeros_like(row_sum), where=nnz_per_row > 0)
        X.data = X.data - np.repeat(avg, nnz_per_row)
        mode = "cosine"
    elif similarity == "pearson":
        Xc = X.tocsc()
        nnz_per_col = np.diff(Xc.indptr)
        col_sum = np.asarray(Xc.sum(axis=0)).ravel()
        avg = np.divide(col_sum, nnz_per_col, out=np.zeros_like(col_sum), where=nnz_per_col > 0)
        Xc.data = Xc.data - np.repeat(avg, nnz_per_col)
        X = Xc.tocsr()
        mode = "cosine"
    elif similarity in ("jaccard", "tanimoto", "dice", "tversky"):
        X.data = np.ones_like(X.data)
        mode = "jaccard" if similarity == "tanimoto" else similarity
        # the binary-set similarities carry their own normalization; the
        # reference force-disables cosine normalization for them
        # (Compute_Similarity_Python.py:77-87)
        normalize = False
    else:
        mode = similarity

    from ganmf_tpu.data.device import dense_from_sparse

    A = dense_from_sparse(X)
    rw = jnp.asarray(
        np.asarray(row_weights, dtype=np.float32) if row_weights is not None else np.ones(n_rows, np.float32)
    )

    vals, idx = _similarity_topk(
        A,
        rw,
        mode=mode,
        topk=topK,
        shrink=float(shrink),
        normalize=bool(normalize),
        asymmetric_alpha=float(asymmetric_alpha),
        tversky_alpha=float(tversky_alpha),
        tversky_beta=float(tversky_beta),
        normalize_avg_row=bool(normalize_avg_row),
        distance_mode=similarity_from_distance_mode,
        use_row_weights=row_weights is not None,
    )
    vals = np.asarray(vals, dtype=np.float32)  # [n_cols, topK] per column
    idx = np.asarray(idx)

    keep = vals != 0.0  # reference drops exact zeros from the top-K
    counts = keep.sum(axis=1)
    indptr = np.zeros(n_cols + 1, dtype=np.int64)
    np.cumsum(counts, out=indptr[1:])
    data = vals[keep]
    indices = idx[keep]
    W = sps.csc_matrix((data, indices, indptr), shape=(n_cols, n_cols), dtype=np.float32)
    return W.tocsr()
