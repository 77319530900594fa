"""Training-state checkpointing via orbax.

Replaces the reference's three GAN persistence paths — shadow variables,
tf.train.Saver weights, pickle build params (SURVEY §5.4) — with one
pytree checkpoint of (params, optimizer states, epoch, rng key) that
supports crash-resume of a fit() mid-run.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAVE_ORBAX = True
except Exception:  # pragma: no cover - orbax is in the base image
    _HAVE_ORBAX = False


def coerce_pytree(template, restored):
    """Re-impose ``template``'s container structure (NamedTuples, tuples)
    on ``restored`` leaves — checkpoint backends may hand tuples back as
    lists."""
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template), jax.tree_util.tree_leaves(restored)
    )


class TrainCheckpointer:
    """Save/restore a training-state pytree every N epochs."""

    def __init__(self, directory: str, every_n_epochs: int = 10, max_to_keep: int = 2):
        self.directory = os.path.abspath(directory)
        self.every = max(1, every_n_epochs)
        if _HAVE_ORBAX:
            self._mgr = ocp.CheckpointManager(
                self.directory,
                options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
            )
        else:
            self._mgr = None
            os.makedirs(self.directory, exist_ok=True)

    def maybe_save(self, epoch: int, state: Any, aux: Optional[dict] = None) -> bool:
        if epoch % self.every != 0:
            return False
        self.save(epoch, state, aux=aux)
        return True

    def save(self, epoch: int, state: Any, aux: Optional[dict] = None) -> None:
        if self._mgr is not None:
            self._mgr.save(epoch, args=ocp.args.StandardSave(state))
            self._mgr.wait_until_finished()
        else:  # numpy fallback
            flat, treedef = jax.tree_util.tree_flatten(state)
            np.savez(
                os.path.join(self.directory, f"ckpt_{epoch}.npz"),
                *[np.asarray(x) for x in flat],
            )
        if aux:
            # variable-length side data (loss histories) lives outside the
            # fixed-shape pytree so restore needs no matching template
            np.savez(os.path.join(self.directory, f"aux_{epoch}.npz"), **aux)

    def restore_aux(self, epoch: int) -> Optional[dict]:
        path = os.path.join(self.directory, f"aux_{epoch}.npz")
        if not os.path.isfile(path):
            return None
        with np.load(path) as data:
            return {k: data[k] for k in data.files}

    def latest_epoch(self) -> Optional[int]:
        if self._mgr is not None:
            return self._mgr.latest_step()
        steps = [
            int(f[5:-4]) for f in os.listdir(self.directory)
            if f.startswith("ckpt_") and f.endswith(".npz")
        ]
        return max(steps) if steps else None

    def restore(self, epoch: int, template: Any) -> Any:
        if self._mgr is not None:
            return self._mgr.restore(epoch, args=ocp.args.StandardRestore(template))
        flat, treedef = jax.tree_util.tree_flatten(template)
        data = np.load(os.path.join(self.directory, f"ckpt_{epoch}.npz"))
        return jax.tree_util.tree_unflatten(
            treedef, [data[k] for k in data.files]
        )
