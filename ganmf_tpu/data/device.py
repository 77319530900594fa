"""HBM-resident dense views of sparse interaction matrices.

The reference densifies CSR rows on host every minibatch
(reference: GANRec/GANMF.py:184). On TPU the entire URM fits in HBM for any
dataset this framework targets at single-chip scale (<= a few GB dense), so
we materialize it once and let every train/eval step gather rows on device.
For multi-chip runs the dense matrix is sharded over the mesh's user axis
(see ganmf_tpu.parallel).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sps


class DeviceURM:
    """Device-resident dense URM plus cached derived tensors."""

    def __init__(self, urm: sps.spmatrix, dtype=jnp.float32, sharding=None):
        urm = urm.tocsr().astype(np.float32)
        urm.eliminate_zeros()
        self.shape = urm.shape
        self.nnz = urm.nnz
        self._csr = urm
        dense = np.asarray(urm.todense(), dtype=np.float32)
        arr = jnp.asarray(dense, dtype=dtype)
        if sharding is not None:
            arr = jax.device_put(arr, sharding)
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
