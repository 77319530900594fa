"""CFGAN (CIKM'18) reimplementation.

Reference: GANRec/CFGAN.py. G: MLP condition(profile) -> g_nodes^g_layers ->
num_items (:84-108); D: MLP over concat(condition, data) -> 1 (:55-79);
glorot-scale uniform kernel init with U(-0.01, 0.01) biases (:50,59-60).
Masking schemes ZR/PM/ZP re-sample per-epoch negative sets per user
(:196,230): the reference offloads this to Cython
(GANRec/Cython/cython_utils.pyx:48-66); here the exact-k without-replacement
sample is a vectorized rank-of-random-keys draw on device. The reference's
compute_masks bug (zr_ratio used for the PM mask, cython_utils.pyx:62) is
fixed: PM uses zp_ratio, both as fractions in [0, 1].

    d_loss = BCE(D(cond, real) -> 1) + BCE(D(cond, G(cond) * train_mask) -> 0) + d_reg * L2(D)
    g_loss = BCE(D(cond, fake) -> 1) + g_reg * L2(G) + zr_coefficient * mean_u(sum_i fake^2 * zr_mask)

(:146-172.) The epoch (mask sampling + all D and G minibatches) is one
jitted device program; the reference iterates users in natural order
without shuffling (:232-288), reproduced here.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ganmf_tpu.data.device import PaddedCSR, padded_rows_dense
from ganmf_tpu.models.gan_base import AdversarialRecommender, make_batches, padded_weights
from ganmf_tpu.ops.topk import smallest_k_mask
from ganmf_tpu.utils.debug import instrumented_jit

ADAM = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)

ACTIVATIONS = {
    "linear": lambda x: x,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "relu": jax.nn.relu,
    "LeakyReLU": jax.nn.leaky_relu,
}


class MLPParams(NamedTuple):
    ws: Tuple[jnp.ndarray, ...]
    bs: Tuple[jnp.ndarray, ...]


class CFGANParams(NamedTuple):
    G: MLPParams
    D: MLPParams


def _init_mlp(key, dims):
    """Uniform(-sqrt(6/(fin+fout))) kernels (= glorot uniform, CFGAN.py:59-60,
    88-89) and U(-0.01, 0.01) biases (:50)."""
    ws, bs = [], []
    keys = jax.random.split(key, 2 * (len(dims) - 1))
    for l in range(len(dims) - 1):
        scale = np.sqrt(6.0 / (dims[l] + dims[l + 1]))
        ws.append(jax.random.uniform(keys[2 * l], (dims[l], dims[l + 1]), jnp.float32, -scale, scale))
        bs.append(jax.random.uniform(keys[2 * l + 1], (dims[l + 1],), jnp.float32, -0.01, 0.01))
    return MLPParams(tuple(ws), tuple(bs))


def _mlp(p: MLPParams, x, hidden_act):
    act = ACTIVATIONS[hidden_act]
    h = x
    for l, (w, b) in enumerate(zip(p.ws, p.bs)):
        h = jnp.dot(h, w) + b
        if l < len(p.ws) - 1:
            h = act(h)
    return h


def _bce(logits, target, w):
    # the loss reduction always runs in f32 (bf16 activations upcast here)
    lg = logits[:, 0].astype(jnp.float32)
    per = optax.sigmoid_binary_cross_entropy(lg, jnp.full_like(lg, target))
    return jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1.0)


def _l2(p: MLPParams):
    return sum(jnp.sum(t**2) / 2.0 for t in jax.tree_util.tree_leaves(p))


def sample_negative_masks(key, urm: jnp.ndarray, zr_ratio: float, zp_ratio: float, scheme: str):
    """Per-user exact-k without-replacement negative samples.

    For each user, k_u = int(n_zeros(u) * ratio) items are drawn uniformly
    from the user's non-interactions (cython_utils.pyx:48-66, with the
    zp_ratio fix). Implemented as rank-of-uniform-keys: interactions get
    +inf keys, the k_u smallest-keyed zeros are selected.
    """
    n_users, n_items = urm.shape
    interacted = urm != 0
    n_zeros = jnp.sum(~interacted, axis=1)

    def draw(k, ratio):
        keys = jax.random.uniform(k, (n_users, n_items))
        keys = jnp.where(interacted, jnp.inf, keys)
        k_u = (n_zeros * ratio).astype(jnp.int32)
        # bitwise-identical to the original rank-table selection (see
        # smallest_k_mask), so committed parity rows are untouched
        return smallest_k_mask(keys, k_u).astype(urm.dtype)

    k_zr, k_pm = jax.random.split(key)
    zr = draw(k_zr, zr_ratio) if scheme in ("ZP", "ZR") else jnp.zeros_like(urm)
    pm = draw(k_pm, zp_ratio) if scheme in ("ZP", "PM") else jnp.zeros_like(urm)
    return zr, pm


@functools.partial(
    instrumented_jit,
    static_argnames=(
        "scheme", "d_hidden_act", "g_hidden_act",
        "d_n_batches", "d_batch", "g_n_batches", "g_batch", "d_steps", "g_steps",
        "compute_dtype",
    ),
)
def cfgan_epoch(
    params: CFGANParams, d_opt_state, g_opt_state,
    urm: jnp.ndarray, key,
    d_weights, g_weights,
    d_lr, g_lr, d_reg, g_reg, zr_ratio, zp_ratio, zr_coefficient,
    scheme, d_hidden_act, g_hidden_act,
    d_n_batches, d_batch, g_n_batches, g_batch, d_steps, g_steps,
    compute_dtype: str = "f32",
):
    streamed = isinstance(urm, PaddedCSR)
    n_items = params.G.bs[-1].shape[0]
    cd = jnp.bfloat16 if compute_dtype == "bf16" else jnp.float32

    def cast(tree):
        # bf16 mode: matmuls/activations run in bfloat16 against the f32
        # master params; L2 and loss reductions stay f32 (ganmf.py recipe)
        if cd == jnp.float32:
            return tree
        return jax.tree_util.tree_map(lambda t: t.astype(cd), tree)

    if streamed:
        # padded-CSR storage: only O(nnz) lives in HBM. Masks are drawn per
        # batch instead of as full [U, I] buffers; each user's draw is keyed
        # by fold_in(epoch_key, user) so the D and G phases — whose batch
        # grids differ — see the SAME per-epoch mask for a given user,
        # preserving the reference's one-mask-per-epoch semantics
        # (CFGAN.py:230). The RNG stream differs from the dense path's
        # single full-matrix draw, so masked configs are distributionally
        # (not bitwise) equivalent across storages; with no mask sampling
        # (e.g. scheme="ZR", zr_ratio=0) the two storages match exactly.
        k_zr_base, k_pm_base = jax.random.split(key)

        def draw_rows(base_key, rows, interacted, n_zeros, ratio):
            u01 = jax.vmap(
                lambda u: jax.random.uniform(jax.random.fold_in(base_key, u), (n_items,))
            )(rows)
            keys = jnp.where(interacted, jnp.inf, u01)
            k_u = (n_zeros * ratio).astype(jnp.int32)
            return smallest_k_mask(keys, k_u).astype(cd)

        def batch_inputs(start, size):
            rows = start + jnp.arange(size, dtype=jnp.int32)
            cond = padded_rows_dense(urm, rows, n_items)
            interacted = cond != 0
            n_zeros = jnp.sum(~interacted, axis=1)
            zr = (
                draw_rows(k_zr_base, rows, interacted, n_zeros, zr_ratio)
                if scheme in ("ZP", "ZR")
                else jnp.zeros_like(cond)
            )
            pm = (
                draw_rows(k_pm_base, rows, interacted, n_zeros, zp_ratio)
                if scheme in ("ZP", "PM")
                else None
            )
            tmask = jnp.clip(cond + pm, 0.0, 1.0) if pm is not None else cond
            return cond, tmask, zr
    else:
        zr_mask_full, pm_mask_full = sample_negative_masks(key, urm, zr_ratio, zp_ratio, scheme)
        # train mask: profile with PM-sampled negatives flipped to 1 (CFGAN.py:242-249)
        train_mask_full = jnp.clip(urm + pm_mask_full, 0.0, 1.0) if scheme in ("ZP", "PM") else urm

        def batch_inputs(start, size):
            cond = jax.lax.dynamic_slice_in_dim(urm, start, size, axis=0)
            tmask = jax.lax.dynamic_slice_in_dim(train_mask_full, start, size, axis=0)
            zmask = jax.lax.dynamic_slice_in_dim(zr_mask_full, start, size, axis=0)
            return cond, tmask, zmask

    def d_loss_fn(d_p, g_p, cond, real, tmask, w):
        d_c, g_c = cast(d_p), cast(g_p)
        fake = _mlp(g_c, cond, g_hidden_act) * tmask
        d_real = _mlp(d_c, jnp.concatenate([cond, real], axis=1), d_hidden_act)
        d_fake = _mlp(d_c, jnp.concatenate([cond, fake], axis=1), d_hidden_act)
        return _bce(d_real, 1.0, w) + _bce(d_fake, 0.0, w) + d_reg * _l2(d_p)

    def g_loss_fn(g_p, d_p, cond, tmask, zmask, w):
        g_c, d_c = cast(g_p), cast(d_p)
        fake_raw = _mlp(g_c, cond, g_hidden_act)
        fake = fake_raw * tmask
        d_fake = _mlp(d_c, jnp.concatenate([cond, fake], axis=1), d_hidden_act)
        sq = fake_raw.astype(jnp.float32) ** 2 * zmask.astype(jnp.float32)
        zr_loss = jnp.sum(jnp.sum(sq, axis=1) * w) / jnp.maximum(jnp.sum(w), 1.0)
        return _bce(d_fake, 1.0, w) + g_reg * _l2(g_p) + zr_coefficient * zr_loss

    def d_body(carry, step):
        p, state = carry
        b = (step % d_n_batches) * d_batch
        cond, tmask, _ = batch_inputs(b, d_batch)
        w = jax.lax.dynamic_slice_in_dim(d_weights, b, d_batch)
        grads = jax.grad(d_loss_fn)(p.D, p.G, cond, cond, tmask, w)
        updates, state = ADAM.update(grads, state, p.D)
        new_d = jax.tree_util.tree_map(lambda t, u: t - d_lr * u, p.D, updates)
        return (p._replace(D=new_d), state), None

    def g_body(carry, step):
        p, state = carry
        b = (step % g_n_batches) * g_batch
        cond, tmask, zmask = batch_inputs(b, g_batch)
        w = jax.lax.dynamic_slice_in_dim(g_weights, b, g_batch)
        grads = jax.grad(g_loss_fn)(p.G, p.D, cond, tmask, zmask, w)
        updates, state = ADAM.update(grads, state, p.G)
        new_g = jax.tree_util.tree_map(lambda t, u: t - g_lr * u, p.G, updates)
        return (p._replace(G=new_g), state), None

    (params, d_opt_state), _ = jax.lax.scan(d_body, (params, d_opt_state), jnp.arange(d_steps * d_n_batches))
    (params, g_opt_state), _ = jax.lax.scan(g_body, (params, g_opt_state), jnp.arange(g_steps * g_n_batches))
    return params, d_opt_state, g_opt_state


class CFGAN(AdversarialRecommender):
    RECOMMENDER_NAME = "CFGAN"

    def fit(
        self,
        d_nodes: int = 32,
        g_nodes: int = 32,
        d_layers: int = 1,
        g_layers: int = 1,
        scheme: str = "ZR",
        d_hidden_act: str = "linear",
        g_hidden_act: str = "linear",
        epochs: int = 300,
        d_lr: float = 1e-5,
        g_lr: float = 1e-5,
        d_reg: float = 0,
        g_reg: float = 0,
        d_steps: int = 1,
        g_steps: int = 1,
        d_batch_size: int = 32,
        g_batch_size: int = 32,
        zr_ratio: float = 0.0,
        zp_ratio: float = 0.0,
        zr_coefficient: float = 0.0,
        allow_worse=5,
        freq=5,
        after: int = 0,
        metrics=("MAP",),
        validation_evaluator=None,
        sample_every=None,
        validation_set=None,
        mesh_plan=None,
        urm_storage: str = "dense",
        compute_dtype: str = "f32",
    ):
        """``urm_storage``: "dense" keeps the [U, I] URM plus the per-epoch
        ZR/PM mask buffers resident in HBM (the default). "csr" keeps only
        padded-CSR arrays — O(nnz) — densifying each [B, I] minibatch and
        drawing its masks on the fly inside the epoch scan (per-user folded
        keys keep one mask per user per epoch across the D and G phases);
        use for datasets whose dense matrix would exceed HBM. Masked
        configs are distributionally (not bitwise) equivalent between the
        two storages; unmasked ones match exactly."""
        # ratios are fractions in [0, 1]; the root search space's {10..90}
        # integers (RecSysExp.py:480-481) are percentage points — normalize.
        if zr_ratio > 1:
            zr_ratio = zr_ratio / 100.0
        if zp_ratio > 1:
            zp_ratio = zp_ratio / 100.0

        self.config = dict(
            d_nodes=d_nodes, g_nodes=g_nodes, d_layers=d_layers, g_layers=g_layers, scheme=scheme,
            d_hidden_act=d_hidden_act, g_hidden_act=g_hidden_act, epochs=epochs, d_lr=d_lr, g_lr=g_lr,
            d_reg=d_reg, g_reg=g_reg, d_steps=d_steps, g_steps=g_steps,
            d_batch_size=d_batch_size, g_batch_size=g_batch_size,
            zr_ratio=zr_ratio, zp_ratio=zp_ratio, zr_coefficient=zr_coefficient,
        )

        train_csr = self._train_matrix()
        n_rows, n_cols = train_csr.shape

        d_n_batches, d_padded = make_batches(n_rows, int(d_batch_size))
        g_n_batches, g_padded = make_batches(n_rows, int(g_batch_size))
        padded = max(d_padded, g_padded)
        self._stream_seen = urm_storage == "csr"
        if urm_storage == "csr":
            from ganmf_tpu.data.device import padded_csr_from_sparse

            urm = padded_csr_from_sparse(train_csr)
            if compute_dtype == "bf16":
                urm = urm._replace(val=urm.val.astype(jnp.bfloat16))
            # batch row ids past n_rows-1 clamp to the last stored row on
            # gather; their padded weights are 0 so they contribute nothing
        elif urm_storage == "dense":
            urm_np = np.asarray(train_csr.todense(), dtype=np.float32)
            urm = jnp.asarray(np.pad(urm_np, ((0, padded - n_rows), (0, 0))))
            if compute_dtype == "bf16":
                urm = urm.astype(jnp.bfloat16)  # masks/condition inherit bf16
        else:
            raise ValueError(f"urm_storage must be 'dense' or 'csr', got {urm_storage!r}")
        self._train_padded = urm if self._stream_seen else None
        d_weights = jnp.asarray(padded_weights(n_rows, padded))
        g_weights = d_weights

        key = jax.random.PRNGKey(self.seed)
        k_g, k_d, self._epoch_key = jax.random.split(key, 3)
        g_dims = [n_cols] + [int(g_nodes)] * int(g_layers) + [n_cols]
        d_dims = [2 * n_cols] + [int(d_nodes)] * int(d_layers) + [1]
        self.params = CFGANParams(G=_init_mlp(k_g, g_dims), D=_init_mlp(k_d, d_dims))
        self._g_hidden_act = g_hidden_act

        if mesh_plan is not None:
            from ganmf_tpu.parallel.distributed import shard_cfgan_params, shard_padded_csr

            self.params = shard_cfgan_params(self.params, mesh_plan)
            if self._stream_seen:
                urm = shard_padded_csr(urm, mesh_plan)
                self._train_padded = urm
            else:
                urm = mesh_plan.put(urm, mesh_plan.urm)

        self._d_state = ADAM.init(self.params.D)
        self._g_state = ADAM.init(self.params.G)
        start_epoch = self.resume_from_checkpoint()  # also restores _epoch_key

        def epoch_fn(epoch):
            self._epoch_key, sub = jax.random.split(self._epoch_key)
            self.params, self._d_state, self._g_state = cfgan_epoch(
                self.params, self._d_state, self._g_state, urm, sub, d_weights, g_weights,
                jnp.float32(d_lr), jnp.float32(g_lr), jnp.float32(d_reg), jnp.float32(g_reg),
                jnp.float32(zr_ratio), jnp.float32(zp_ratio), jnp.float32(zr_coefficient),
                scheme=scheme, d_hidden_act=d_hidden_act, g_hidden_act=g_hidden_act,
                d_n_batches=d_n_batches, d_batch=int(d_batch_size),
                g_n_batches=g_n_batches, g_batch=int(g_batch_size),
                d_steps=int(d_steps), g_steps=int(g_steps),
                compute_dtype=compute_dtype,
            )
            self._score_cache = None
            self._penult_cache = None

        self._score_cache = None
        self._penult_cache = None
        result = self._run_training_loop(
            epochs, validation_evaluator, validation_set, sample_every,
            allow_worse, freq, list(metrics), after, epoch_fn, start_epoch=start_epoch,
        )
        self._invalidate_device_cache()
        return result

    # -- crash resume (full training state) -----------------------------------
    def _checkpoint_state(self):
        return {
            "params": self.params,
            "d_state": self._d_state,
            "g_state": self._g_state,
            "epoch_key": self._epoch_key,
        }

    def _restore_checkpoint_state(self, state):
        from ganmf_tpu.models.gan_base import coerce_pytree

        self.params = coerce_pytree(self.params, state["params"])
        self._d_state = coerce_pytree(self._d_state, state["d_state"])
        self._g_state = coerce_pytree(self._g_state, state["g_state"])
        self._epoch_key = jnp.asarray(state["epoch_key"])

    def _on_params_loaded(self):
        self._score_cache = None
        self._penult_cache = None

    # -- scoring (reference CFGAN.py:342-368) ----------------------------------
    def _stream_penult(self, pc, n_cols):
        """[R, H] activations of the generator's penultimate layer over all
        training rows, built in chunks and cached until params change;
        None when the generator has no hidden layer."""
        if len(self.params.G.ws) < 2:
            return None
        if getattr(self, "_penult_cache", None) is None:
            act = ACTIVATIONS[self._g_hidden_act]
            hidden = MLPParams(self.params.G.ws[:-1], self.params.G.bs[:-1])
            n_rows = pc.idx.shape[0]
            chunk = 2048
            parts = []
            for s in range(0, n_rows, chunk):
                rows = jnp.arange(s, min(s + chunk, n_rows), dtype=jnp.int32)
                cond = padded_rows_dense(pc, rows, n_cols).astype(jnp.float32)
                # _mlp applies the activation after every non-final layer;
                # here every layer is non-final, so apply it after the last
                parts.append(act(_mlp(hidden, cond, self._g_hidden_act)))
            self._penult_cache = jnp.concatenate(parts, axis=0)
        return self._penult_cache

    def _full_generator_output(self) -> jnp.ndarray:
        """G applied to every training-orientation profile."""
        if getattr(self, "_score_cache", None) is None:
            cond = self._train_dense()
            self._score_cache = _mlp(self.params.G, cond, self._g_hidden_act)
        return self._score_cache

    def score_device(self, user_ids: jnp.ndarray) -> jnp.ndarray:
        if getattr(self, "_stream_seen", False) and getattr(self, "_train_padded", None) is not None:
            pc = self._train_padded
            n_cols = self.params.G.bs[-1].shape[0]
            if self.mode != "item":
                cond = padded_rows_dense(pc, jnp.asarray(user_ids), n_cols)
                return _mlp(self.params.G, cond.astype(jnp.float32), self._g_hidden_act)
            # item mode scores all training rows (= items) and serves the
            # requested users as columns out[:, uid]. The generator's last
            # layer is linear, so out[:, uid] = penult @ W_last[:, uid]
            # + b_last[uid]: cache the [R, H] penultimate activations once
            # per params (H = g_nodes, small) and each eval batch costs one
            # [R, H] x [H, B] matmul — no [R, U] buffer ever materializes
            # and the all-rows sweep is not repeated per batch.
            uid = jnp.asarray(user_ids)
            penult = self._stream_penult(pc, n_cols)
            if penult is None:  # no hidden layer: penult would be the full matrix
                n_rows = pc.idx.shape[0]
                chunk = 2048
                cols = []
                for s in range(0, n_rows, chunk):
                    rows = jnp.arange(s, min(s + chunk, n_rows), dtype=jnp.int32)
                    cond = padded_rows_dense(pc, rows, n_cols).astype(jnp.float32)
                    cols.append(jnp.take(_mlp(self.params.G, cond, self._g_hidden_act), uid, axis=1))
                return jnp.concatenate(cols, axis=0).T
            w_last, b_last = self.params.G.ws[-1], self.params.G.bs[-1]
            return (penult @ jnp.take(w_last, uid, axis=1) + jnp.take(b_last, uid)[None, :]).T
        out = self._full_generator_output()
        if self.mode == "item":
            return jnp.take(out.T, user_ids, axis=0)
        return jnp.take(out, user_ids, axis=0)
