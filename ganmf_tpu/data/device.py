"""HBM-resident dense views of sparse interaction matrices.

The reference densifies CSR rows on host every minibatch
(reference: GANRec/GANMF.py:184). On TPU the entire URM fits in HBM for any
dataset this framework targets at single-chip scale (<= a few GB dense), so
we materialize it once and let every train/eval step gather rows on device.
For multi-chip runs the dense matrix is sharded over the mesh's user axis
(see ganmf_tpu.parallel).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sps


@functools.partial(jax.jit, static_argnames=("shape",))
def _segment_dense(lin_idx: jnp.ndarray, data: jnp.ndarray, shape):
    # segment_sum lowers to a sorted scatter-add that compiles ~20x faster
    # than a 2D .at[].set scatter on this TPU toolchain (measured 8s vs
    # 167s at LastFM shapes) and runs in tens of microseconds
    flat = jax.ops.segment_sum(data, lin_idx, num_segments=shape[0] * shape[1])
    return flat.reshape(shape)


def dense_from_sparse(mat: sps.spmatrix, sharding=None) -> jnp.ndarray:
    """Densify on device: ship only the COO triplets (nnz * 12 bytes) and
    segment-sum into an HBM zeros buffer. On a host->device link this beats
    transferring the dense matrix by the sparsity factor (the reference
    datasets are 95-99.9% sparse)."""
    R, C = mat.shape
    if R * C >= 2**31:  # linear int32 indexing would overflow
        dense = np.asarray(mat.todense(), dtype=np.float32)
        out = jnp.asarray(dense)
    else:
        coo = mat.tocoo()
        coo.sum_duplicates()
        lin = coo.row.astype(np.int64) * C + coo.col.astype(np.int64)
        out = _segment_dense(
            jnp.asarray(lin.astype(np.int32)),
            jnp.asarray(coo.data.astype(np.float32)),
            shape=(R, C),
        )
    if sharding is not None:
        out = jax.device_put(out, sharding)
    return out


class DeviceURM:
    """Device-resident dense URM plus cached derived tensors."""

    def __init__(self, urm: sps.spmatrix, dtype=jnp.float32, sharding=None):
        urm = urm.tocsr().astype(np.float32)
        urm.eliminate_zeros()
        self.shape = urm.shape
        self.nnz = urm.nnz
        self._csr = urm
        arr = dense_from_sparse(urm, sharding=sharding)
        if dtype != jnp.float32:
            arr = arr.astype(dtype)
        self.dense = arr
        self._mask: Optional[jnp.ndarray] = None

    @property
    def csr(self) -> sps.csr_matrix:
        return self._csr

    @property
    def mask(self) -> jnp.ndarray:
        """Boolean interaction mask (True where an interaction exists)."""
        if self._mask is None:
            self._mask = self.dense != 0
        return self._mask

    def rows(self, user_ids: jnp.ndarray) -> jnp.ndarray:
        """Gather dense profile rows on device."""
        return jnp.take(self.dense, user_ids, axis=0)

    def item_popularity(self) -> np.ndarray:
        return np.ediff1d(self._csr.tocsc().indptr)
