"""Shared machinery for the adversarial recommenders (GANMF, DisGANMF,
CFGAN, CAAE).

Mirrors the reference GAN skeleton (GANRec/GANMF.py:26-255): user/item
training modes via transposition, per-epoch d_steps/g_steps passes over
shuffled minibatches, best-weight snapshot/restore driven by the
EarlyStoppingScheduler, and the same fit() return convention. The epoch
body itself is a single jitted device program per model.
"""

from __future__ import annotations

import copy
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ganmf_tpu.models.base import Recommender
from ganmf_tpu.models.early_stopping import EarlyStoppingScheduler


from ganmf_tpu.utils.checkpoint import coerce_pytree  # noqa: E402 (re-export)


class AdversarialRecommender(Recommender):
    """Base for GAN recommenders with (init, epoch, score) device programs."""

    RECOMMENDER_NAME = "AdversarialRecommender"
    SUPPORTS_ITEM_MODE = True

    def __init__(self, URM_train, mode: str = "user", seed: int = 1234, verbose: bool = False,
                 is_experiment: bool = False):
        if self.SUPPORTS_ITEM_MODE and mode not in ("user", "item"):
            raise ValueError(f"Accepted training modes are `user` and `item`. Given was {mode}.")
        # external orientation is always users x items; item mode transposes
        # only the *training* view (reference transposes URM_train in place,
        # GANMF.py:32-35 + the transpose dance around evaluation :215-228)
        super().__init__(URM_train)
        self.mode = mode if self.SUPPORTS_ITEM_MODE else "user"
        self.seed = seed
        self.verbose = verbose
        self.is_experiment = is_experiment
        self.config: Optional[dict] = None
        # reference keeps a per-run plots dir outside experiments
        # (GANMF.py:40-45); created lazily on first artifact write
        import datetime
        import os

        self.logsdir = os.path.join(
            "plots", self.RECOMMENDER_NAME, datetime.datetime.now().strftime("%Y%m%d-%H%M%S")
        )

        self.params = None  # current trainable pytree {"G": ..., "D": ...}
        self.best_params = None  # early-stopping snapshot
        self._stop_training = False

        # optional observability / durability hooks (ganmf_tpu.utils)
        self.metrics_logger = None  # utils.logging.MetricsLogger
        self.checkpointer = None  # utils.checkpoint.TrainCheckpointer

    # -- training-orientation helpers ---------------------------------------
    def _train_matrix(self):
        """CSR in training orientation (transposed for item mode)."""
        if self.mode == "item":
            return self.URM_train.T.tocsr()
        return self.URM_train

    def _train_dense(self) -> jnp.ndarray:
        mat = np.asarray(self._train_matrix().todense(), dtype=np.float32)
        return jnp.asarray(mat)

    # -- early-stopping snapshot protocol (reference GANMF.py:246-255) -------
    def stop_fit(self):
        self._stop_training = True

    def save_current_model(self):
        self.best_params = jax.tree_util.tree_map(lambda x: x, self.params)

    def load_model(self):
        if self.best_params is not None:
            self.params = self.best_params
            self._on_params_loaded()

    def _on_params_loaded(self):
        pass

    # -- shared epoch loop -----------------------------------------------------
    def _checkpoint_state(self):
        """Pytree persisted by the training checkpointer; subclasses extend
        with optimizer state."""
        return self.params

    def _restore_checkpoint_state(self, state):
        self.params = coerce_pytree(self.params, state)

    _LOSS_ATTRS = ("train_d_loss", "train_g_loss", "train_pg_loss", "train_ng_loss")

    def _checkpoint_aux(self) -> dict:
        """Variable-length side state (loss histories) saved next to the
        pytree checkpoint so a resumed run keeps its full loss curves."""
        aux = {}
        for name in self._LOSS_ATTRS:
            vals = getattr(self, name, None)
            if vals:
                aux[name] = np.asarray([float(v) for v in vals], np.float32)
        return aux

    def _restore_checkpoint_aux(self, aux: dict) -> None:
        for name in self._LOSS_ATTRS:
            if name in aux:
                setattr(self, name, [float(v) for v in aux[name]])

    def resume_from_checkpoint(self) -> int:
        """Restore the latest training checkpoint, returning the epoch to
        continue from (1 when no checkpoint exists). Requires
        ``self.checkpointer`` and the model to be mid-fit (params built)."""
        if self.checkpointer is None:
            return 1
        latest = self.checkpointer.latest_epoch()
        if latest is None:
            return 1
        self._restore_checkpoint_state(self.checkpointer.restore(latest, self._checkpoint_state()))
        aux = self.checkpointer.restore_aux(latest)
        if aux:
            self._restore_checkpoint_aux(aux)
        return latest + 1

    def _run_training_loop(self, epochs, validation_evaluator, validation_set, sample_every,
                           allow_worse, freq, metrics, after, epoch_fn, start_epoch: int = 1):
        """The reference's fit() driver loop (GANMF.py:151-244).

        ``epoch_fn(epoch_index)`` runs one full epoch on device.
        Returns the reference's fit() return value.
        """
        self._stop_training = False
        early_stop = None
        if validation_evaluator is not None:
            early_stop = EarlyStoppingScheduler(
                self, evaluator=validation_evaluator, allow_worse=allow_worse,
                freq=freq, metrics=metrics, after=after,
            )

        epoch = start_epoch
        while not self._stop_training and epoch < epochs + 1:
            epoch_fn(epoch)

            if self.metrics_logger is not None:
                self.metrics_logger.log_epoch(epoch)
            if self.checkpointer is not None:
                self.checkpointer.maybe_save(
                    epoch, self._checkpoint_state(), aux=self._checkpoint_aux()
                )

            if validation_set is not None and sample_every is not None and epoch % sample_every == 0:
                results, results_string = validation_evaluator.evaluateRecommender(self)
                if self.metrics_logger is not None:
                    self.metrics_logger.log_eval(epoch, results)
                if self.verbose:
                    print(f"Epoch {epoch}:\n{results_string}")

            if early_stop is not None:
                early_stop(epoch)
                if self._stop_training and self.verbose:
                    print("Training stopped, epoch:", epoch)

            epoch += 1

        if not self.is_experiment:
            self._save_loss_plots()

        return epoch - 1 if self._stop_training else epoch

    def _save_loss_plots(self):
        """Loss-curve artifacts like the reference's plot sinks
        (Utils_.plot_loss_acc, Utils_.py:109)."""
        curves = {}
        for name in ("train_d_loss", "train_g_loss", "train_pg_loss", "train_ng_loss"):
            values = getattr(self, name, None)
            if values:
                curves[name] = [float(v) for v in values]
        if not curves:
            return
        import os

        from ganmf_tpu.utils.analysis import plot_loss

        plot_loss(curves, os.path.join(self.logsdir, "losses.png"), ylabel="loss",
                  title=self.RECOMMENDER_NAME)

    # -- persistence ----------------------------------------------------------
    def _save_dict(self):
        flat = {}
        if self.params is not None:
            leaves, treedef = jax.tree_util.tree_flatten(self.params)
            flat["_n_leaves"] = np.asarray([len(leaves)])
            for i, leaf in enumerate(leaves):
                flat[f"param_{i}"] = np.asarray(leaf)
        if self.config is not None:
            flat["config"] = {k: v for k, v in self.config.items() if _json_safe(v)}
        flat["mode"] = self.mode
        return flat


def _json_safe(v):
    return isinstance(v, (int, float, str, bool, list, tuple, type(None)))


def make_batches(n_rows: int, batch_size: int):
    """Static batching plan: number of batches and padded length."""
    n_batches = int(np.ceil(n_rows / batch_size))
    return n_batches, n_batches * batch_size


def shuffled_padded_perm(rng: np.random.RandomState, n_rows: int, padded: int) -> np.ndarray:
    """Host-side per-epoch shuffle (reference np.random.shuffle,
    GANMF.py:175); padding slots replay row 0 with zero weight."""
    perm = np.arange(n_rows)
    rng.shuffle(perm)
    out = np.zeros(padded, dtype=np.int32)
    out[:n_rows] = perm
    return out


def padded_weights(n_rows: int, padded: int) -> np.ndarray:
    w = np.zeros(padded, dtype=np.float32)
    w[:n_rows] = 1.0
    return w
