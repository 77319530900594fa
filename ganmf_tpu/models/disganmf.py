"""DisGANMF: GANMF's MF generator with an MLP binary discriminator.

Reference: GANRec/DisGANMF.py. D = MLP over concat(cast(user_id, f32),
profile) with d_layers x d_nodes and a linear 1-unit output (:57-65);
G = the same MF generator as GANMF (:70-79).

    dloss = BCE(D(real) -> 1) + BCE(D(fake) -> 0) + d_reg * L2(D)
    gloss = BCE(D(fake) -> 0) + recon_coefficient * MSE(real_feat, fake_feat)
            + g_reg * L2(G)

(:114-136 — note the generator reuses the fake->0 term verbatim; the
feature-matching MSE carries the learning signal. Reproduced as-is.)
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ganmf_tpu.data.device import PaddedCSR, padded_rows_dense
from ganmf_tpu.models.gan_base import (
    AdversarialRecommender,
    make_batches,
    padded_weights,
    shuffled_padded_perm,
)
from ganmf_tpu.utils.debug import instrumented_jit

ADAM = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)


def lazy_adam_row_update(param, g, m, v, row_mask, lr, t, b1=0.9, b2=0.999, eps=1e-8):
    """TF1 sparse-Adam semantics for embedding tables: moments and updates
    apply only to rows touched by the batch (tf.train.AdamOptimizer
    _apply_sparse); untouched rows keep stale moments and do not move.
    row_mask: [n_rows] float 0/1.
    """
    mask = row_mask[:, None]
    m = jnp.where(mask > 0, b1 * m + (1 - b1) * g, m)
    v = jnp.where(mask > 0, b2 * v + (1 - b2) * g * g, v)
    lr_t = lr * jnp.sqrt(1 - b2**t) / (1 - b1**t)
    upd = jnp.where(mask > 0, lr_t * m / (jnp.sqrt(v) + eps), 0.0)
    return param - upd, m, v


ACTIVATIONS = {
    "linear": lambda x: x,
    "tanh": jnp.tanh,
    "relu": jax.nn.relu,
    "sigmoid": jax.nn.sigmoid,
    "LeakyReLU": jax.nn.leaky_relu,
}


class DisGANMFParams(NamedTuple):
    user_emb: jnp.ndarray
    item_emb: jnp.ndarray
    d_ws: Tuple[jnp.ndarray, ...]  # hidden kernels
    d_bs: Tuple[jnp.ndarray, ...]
    out_w: jnp.ndarray
    out_b: jnp.ndarray


def _init_params(key, n_users, n_items, num_factors, d_layers, d_nodes):
    glorot = jax.nn.initializers.glorot_uniform()
    keys = jax.random.split(key, 3 + d_layers)
    d_ws, d_bs = [], []
    fan_in = n_items + 1  # concat(user_id, profile)
    for l in range(d_layers):
        d_ws.append(glorot(keys[2 + l], (fan_in, d_nodes), jnp.float32))
        d_bs.append(jnp.zeros((d_nodes,), jnp.float32))
        fan_in = d_nodes
    return DisGANMFParams(
        user_emb=glorot(keys[0], (n_users, num_factors), jnp.float32),
        item_emb=glorot(keys[1], (n_items, num_factors), jnp.float32),
        d_ws=tuple(d_ws),
        d_bs=tuple(d_bs),
        out_w=glorot(keys[-1], (fan_in, 1), jnp.float32),
        out_b=jnp.zeros((1,), jnp.float32),
    )


def _g_params(p):
    return (p.user_emb, p.item_emb)


def _d_params(p):
    return (p.d_ws, p.d_bs, p.out_w, p.out_b)


def _discriminate(p: DisGANMFParams, uids, x, act):
    if x.dtype == jnp.bfloat16:
        # the conditioning column is the RAW user id (DisGANMF.py:110-111);
        # bf16's 8-bit mantissa would collapse ~16-32 adjacent ids into one
        # value — and the id signal is a ~1e-4 relative perturbation of the
        # activations, below bf16 resolution. So only the [B, I] profile
        # matmul (the actual bandwidth/FLOP cost) runs bf16; the rank-1 id
        # contribution and every downstream [B, nodes]-sized layer stay f32.
        w0, b0 = p.d_ws[0], p.d_bs[0]
        id_part = uids[:, None].astype(jnp.float32) * w0[0:1, :].astype(jnp.float32)
        h = act(jnp.dot(x, w0[1:, :]).astype(jnp.float32) + id_part + b0.astype(jnp.float32))
        layers = zip(p.d_ws[1:], p.d_bs[1:])
    else:
        h = jnp.concatenate([uids[:, None].astype(x.dtype), x], axis=1)
        layers = zip(p.d_ws, p.d_bs)
    for w, b in layers:
        h = act(jnp.dot(h, w) + b)
    features = h
    out = jnp.dot(h, p.out_w) + p.out_b
    return features, out


def _bce(logits, target, w):
    # the loss reduction always runs in f32 (bf16 activations upcast here;
    # the convert fuses into the reduce)
    lg = logits[:, 0].astype(jnp.float32)
    per = optax.sigmoid_binary_cross_entropy(lg, jnp.full_like(lg, target))
    return jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1.0)


def _masked_mse(a, b, w):
    diff = a.astype(jnp.float32) - b.astype(jnp.float32)
    return jnp.sum(diff**2 * w[:, None]) / (jnp.maximum(jnp.sum(w), 1.0) * a.shape[1])


def _l2(tree):
    return sum(jnp.sum(t**2) / 2.0 for t in jax.tree_util.tree_leaves(tree))


@functools.partial(
    instrumented_jit,
    static_argnames=("n_batches", "batch_size", "d_steps", "g_steps", "d_hidden_act", "lazy_user_adam", "compute_dtype"),
)
def disganmf_epoch(
    params, d_opt_state, g_opt_state, urm, perm, weights, d_lr, g_lr,
    recon_coefficient, d_reg, g_reg,
    n_batches, batch_size, d_steps, g_steps, d_hidden_act,
    lazy_user_adam: bool = True,
    compute_dtype: str = "f32",
):
    act = ACTIVATIONS[d_hidden_act]
    n_cols = params.item_emb.shape[0]
    cd = jnp.bfloat16 if compute_dtype == "bf16" else jnp.float32

    def get_batch(step):
        b = step % n_batches
        uids = jax.lax.dynamic_slice_in_dim(perm, b * batch_size, batch_size)
        w = jax.lax.dynamic_slice_in_dim(weights, b * batch_size, batch_size)
        if isinstance(urm, PaddedCSR):  # streamed: densify the batch on device
            real = padded_rows_dense(urm, uids, n_cols)
        else:
            real = jnp.take(urm, uids, axis=0)
        return uids, real, w

    def losses(p, uids, real, w):
        # bf16 mode runs the matmuls and [B, I]/[B, nodes] activations in
        # bfloat16; L2 regularizers stay over the f32 master params and the
        # loss reductions upcast (same recipe as ganmf.py:_losses)
        pc = p
        if cd != jnp.float32:
            pc = jax.tree_util.tree_map(lambda t: t.astype(cd), p)
            real = real.astype(cd)
        fake = jnp.dot(jnp.take(pc.user_emb, uids, axis=0), pc.item_emb.T)
        real_feat, real_out = _discriminate(pc, uids, real, act)
        fake_feat, fake_out = _discriminate(pc, uids, fake, act)
        loss_real = _bce(real_out, 1.0, w)
        loss_fake = _bce(fake_out, 0.0, w)
        dloss = loss_real + loss_fake + d_reg * _l2(_d_params(p))
        gloss = loss_fake + recon_coefficient * _masked_mse(real_feat, fake_feat, w) + g_reg * _l2(_g_params(p))
        return dloss, gloss

    def d_loss_fn(d_p, p, uids, real, w):
        p = p._replace(d_ws=d_p[0], d_bs=d_p[1], out_w=d_p[2], out_b=d_p[3])
        return losses(p, uids, real, w)[0]

    def g_loss_fn(g_p, p, uids, real, w):
        p = p._replace(user_emb=g_p[0], item_emb=g_p[1])
        return losses(p, uids, real, w)[1]

    def d_body(carry, step):
        p, state, acc = carry
        uids, real, w = get_batch(step)
        dloss, grads = jax.value_and_grad(d_loss_fn)(_d_params(p), p, uids, real, w)
        updates, state = ADAM.update(grads, state, _d_params(p))
        new_d = jax.tree_util.tree_map(lambda t, u: t - d_lr * u, _d_params(p), updates)
        p = p._replace(d_ws=new_d[0], d_bs=new_d[1], out_w=new_d[2], out_b=new_d[3])
        return (p, state, acc + dloss), None

    def g_body(carry, step):
        p, state, acc = carry
        item_state, m_u, v_u, t = state
        uids, real, w = get_batch(step)
        gloss, grads = jax.value_and_grad(g_loss_fn)(_g_params(p), p, uids, real, w)

        # user embeddings go through a lookup (DisGANMF.py:77-78); lazy
        # row-masked Adam empirically reproduces the reference's user-mode
        # results for this model (dense Adam is available via the flag)
        t = t + 1.0
        if lazy_user_adam:
            row_mask = jnp.zeros((p.user_emb.shape[0],), jnp.float32).at[uids].max(w)
            user_emb, m_u, v_u = lazy_adam_row_update(p.user_emb, grads[0], m_u, v_u, row_mask, g_lr, t)
        else:
            b1, b2, eps = 0.9, 0.999, 1e-8
            m_u = b1 * m_u + (1 - b1) * grads[0]
            v_u = b2 * v_u + (1 - b2) * grads[0] ** 2
            lr_t = g_lr * jnp.sqrt(1 - b2**t) / (1 - b1**t)
            user_emb = p.user_emb - lr_t * m_u / (jnp.sqrt(v_u) + eps)
        updates, item_state = ADAM.update((grads[1],), item_state, (p.item_emb,))
        item_emb = p.item_emb - g_lr * updates[0]

        p = p._replace(user_emb=user_emb, item_emb=item_emb)
        return (p, (item_state, m_u, v_u, t), acc + gloss), None

    (params, d_opt_state, dl), _ = jax.lax.scan(d_body, (params, d_opt_state, 0.0), jnp.arange(d_steps * n_batches))
    (params, g_opt_state, gl), _ = jax.lax.scan(g_body, (params, g_opt_state, 0.0), jnp.arange(g_steps * n_batches))
    return params, d_opt_state, g_opt_state, dl / (n_batches * d_steps), gl / (n_batches * g_steps)


class DisGANMF(AdversarialRecommender):
    RECOMMENDER_NAME = "DisGANMF"

    def fit(
        self,
        num_factors: int = 10,
        d_layers: int = 1,
        d_nodes: int = 32,
        d_hidden_act: str = "linear",
        epochs: int = 300,
        batch_size: int = 32,
        d_lr: float = 1e-4,
        g_lr: float = 1e-4,
        d_steps: int = 1,
        g_steps: int = 1,
        d_reg: float = 0,
        g_reg: float = 0,
        recon_coefficient: float = 1e-2,
        allow_worse=None,
        freq=None,
        after: int = 0,
        metrics=("MAP",),
        sample_every=None,
        validation_evaluator=None,
        validation_set=None,
        lazy_user_adam=None,
        mesh_plan=None,
        urm_storage: str = "dense",
        compute_dtype: str = "f32",
    ):
        # DisGANMF's discriminator conditions on the raw user-id value
        # (DisGANMF.py:110-111), which makes training dynamics seed-fragile
        # (observed MAP spread of +-0.015 across seeds at the reference's
        # tuned params). Empirically the lazy row-masked Adam variant tracks
        # the reference in user mode and dense Adam in item mode; both are
        # selectable explicitly.
        if lazy_user_adam is None:
            lazy_user_adam = self.mode == "user"
        self.config = dict(
            num_factors=num_factors, d_layers=d_layers, d_nodes=d_nodes, d_hidden_act=d_hidden_act,
            epochs=epochs, batch_size=batch_size, d_lr=d_lr, g_lr=g_lr, d_steps=d_steps,
            g_steps=g_steps, d_reg=d_reg, g_reg=g_reg, recon_coefficient=recon_coefficient,
        )
        self._stream_seen = urm_storage == "csr"
        if urm_storage == "csr":  # streamed padded-CSR storage (see GANMF.fit)
            from ganmf_tpu.data.device import padded_csr_from_sparse

            train_csr = self._train_matrix()
            n_rows, n_cols = train_csr.shape
            urm = padded_csr_from_sparse(train_csr)
            if compute_dtype == "bf16":
                urm = urm._replace(val=urm.val.astype(jnp.bfloat16))
        elif urm_storage == "dense":
            urm = self._train_dense()
            n_rows, n_cols = urm.shape
            if compute_dtype == "bf16":
                urm = urm.astype(jnp.bfloat16)
        else:
            raise ValueError(f"urm_storage must be 'dense' or 'csr', got {urm_storage!r}")

        self.params = _init_params(
            jax.random.PRNGKey(self.seed), n_rows, n_cols, int(num_factors), int(d_layers), int(d_nodes)
        )
        if mesh_plan is not None:
            from ganmf_tpu.parallel.distributed import shard_disganmf_params, shard_padded_csr

            self.params = shard_disganmf_params(self.params, mesh_plan)
            if urm_storage == "csr":  # user-axis-sharded streamed storage
                urm = shard_padded_csr(urm, mesh_plan)
            else:
                urm = mesh_plan.put(urm, mesh_plan.urm)
        self._d_state = ADAM.init(_d_params(self.params))
        self._g_state = (
            ADAM.init((self.params.item_emb,)),
            jnp.zeros_like(self.params.user_emb),
            jnp.zeros_like(self.params.user_emb),
            jnp.float32(0.0),
        )
        start_epoch = self.resume_from_checkpoint()

        n_batches, padded = make_batches(n_rows, int(batch_size))
        weights = jnp.asarray(padded_weights(n_rows, padded))
        rng = np.random.RandomState(self.seed)
        # resume: replay the shuffle stream past completed epochs so the
        # resumed run matches the uninterrupted one (one draw per epoch)
        for _ in range(start_epoch - 1):
            shuffled_padded_perm(rng, n_rows, padded)

        def epoch_fn(epoch):
            perm = jnp.asarray(shuffled_padded_perm(rng, n_rows, padded))
            self.params, self._d_state, self._g_state, _, _ = disganmf_epoch(
                self.params, self._d_state, self._g_state, urm, perm, weights,
                jnp.float32(d_lr), jnp.float32(g_lr),
                jnp.float32(recon_coefficient), jnp.float32(d_reg), jnp.float32(g_reg),
                n_batches=n_batches, batch_size=int(batch_size),
                d_steps=int(d_steps), g_steps=int(g_steps), d_hidden_act=d_hidden_act,
                lazy_user_adam=bool(lazy_user_adam), compute_dtype=compute_dtype,
            )

        result = self._run_training_loop(
            epochs, validation_evaluator, validation_set, sample_every,
            allow_worse, freq, list(metrics), after, epoch_fn, start_epoch=start_epoch,
        )
        self._invalidate_device_cache()
        return result

    # -- crash resume (full training state) -----------------------------------
    def _checkpoint_state(self):
        return {"params": self.params, "d_state": self._d_state, "g_state": self._g_state}

    def _restore_checkpoint_state(self, state):
        from ganmf_tpu.models.gan_base import coerce_pytree

        self.params = coerce_pytree(self.params, state["params"])
        self._d_state = coerce_pytree(self._d_state, state["d_state"])
        self._g_state = coerce_pytree(self._g_state, state["g_state"])

    def score_device(self, user_ids: jnp.ndarray) -> jnp.ndarray:
        hi = jax.lax.Precision.HIGHEST
        if self.mode == "item":
            return jnp.dot(jnp.take(self.params.item_emb, user_ids, axis=0),
                           self.params.user_emb.T, precision=hi)
        return jnp.dot(jnp.take(self.params.user_emb, user_ids, axis=0),
                       self.params.item_emb.T, precision=hi)
