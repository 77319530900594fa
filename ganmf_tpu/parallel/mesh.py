"""Device mesh construction and sharding plans.

The reference is strictly single-process/single-GPU (SURVEY §2.9) — this
layer is new capability, designed TPU-first: a 2D mesh with a ``data``
axis (users) riding ICI for gradient psums and a ``model`` axis (items)
for sharding the item dimension of the URM, the generator's item
embeddings and the discriminator's item-sized layers. Single-chip runs
degenerate to no-op shardings.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclass
class MeshPlan:
    """A mesh plus the canonical shardings of framework tensors."""

    mesh: Mesh

    # -- sharding constructors -------------------------------------------------
    def named(self, *spec) -> NamedSharding:
        return NamedSharding(self.mesh, P(*spec))

    @property
    def replicated(self) -> NamedSharding:
        return self.named()

    @property
    def urm(self) -> NamedSharding:
        """[U, I] interaction matrix: users x items over (data, model)."""
        return self.named(DATA_AXIS, MODEL_AXIS)

    @property
    def user_rows(self) -> NamedSharding:
        """[U, ...] user-major tensors (user embeddings) over data."""
        return self.named(DATA_AXIS)

    @property
    def item_rows(self) -> NamedSharding:
        """[I, ...] item-major tensors (item embeddings, encoder kernel)."""
        return self.named(MODEL_AXIS)

    @property
    def item_cols(self) -> NamedSharding:
        """[..., I] item-minor tensors (decoder kernel, item bias rows)."""
        return self.named(None, MODEL_AXIS)

    @property
    def batch(self) -> NamedSharding:
        """[B, ...] per-step user batches over data."""
        return self.named(DATA_AXIS)

    @property
    def n_data(self) -> int:
        return self.mesh.shape[DATA_AXIS]

    @property
    def n_model(self) -> int:
        return self.mesh.shape[MODEL_AXIS]


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> MeshPlan:
    """Build a (data, model) mesh over the available devices.

    Defaults to all devices on the data axis. ``n_data * n_model`` must
    divide into the device count; extra devices are left unused.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = max(1, len(devices) // n_model)
    needed = n_data * n_model
    if needed > len(devices):
        raise ValueError(f"mesh {n_data}x{n_model} needs {needed} devices, have {len(devices)}")
    grid = np.asarray(devices[:needed]).reshape(n_data, n_model)
    return MeshPlan(Mesh(grid, (DATA_AXIS, MODEL_AXIS)))
