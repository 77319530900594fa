"""Multi-chip GANMF training step.

New capability over the single-GPU reference (SURVEY §2.9): the full
adversarial update — discriminator step then generator step on one user
minibatch — jitted over a (data, model) mesh. Placement:

  * URM            [U, I]  -> (data, model)
  * user embeddings [U, K] -> (data, -)      \\  generator
  * item embeddings [I, K] -> (model, -)     /
  * encoder kernel  [I, E] -> (model, -)     \\  discriminator
  * decoder kernel  [E, I] -> (-, model)     /
  * per-step batch rows    -> (data,)

Gradient reduction across the data axis and the item-dimension
contractions across the model axis are inserted by GSPMD from these
shardings — psums ride ICI, no hand-written collectives needed. The step
is the building block for a multi-chip fit(); ``dryrun`` in
``__graft_entry__`` exercises it on a virtual CPU mesh.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import optax

from ganmf_tpu.models.ganmf import ADAM, GANMFParams, _d_params, _g_params, _init_params, _losses
from ganmf_tpu.parallel.mesh import MeshPlan


def init_distributed(seed: int, n_users: int, n_items: int, num_factors: int, emb_dim: int,
                     plan: MeshPlan) -> Tuple[GANMFParams, object, object]:
    """Initialize sharded GANMF params + Adam states on the mesh."""
    params = _init_params(jax.random.PRNGKey(seed), n_users, n_items, num_factors, emb_dim)
    params = shard_ganmf_params(params, plan)
    d_state = ADAM.init(_d_params(params))
    g_state = ADAM.init(_g_params(params))
    return params, d_state, g_state


def shard_ganmf_params(params: GANMFParams, plan: MeshPlan) -> GANMFParams:
    return GANMFParams(
        user_emb=jax.device_put(params.user_emb, plan.user_rows),
        item_emb=jax.device_put(params.item_emb, plan.item_rows),
        enc_w=jax.device_put(params.enc_w, plan.item_rows),
        enc_b=jax.device_put(params.enc_b, plan.replicated),
        dec_w=jax.device_put(params.dec_w, plan.item_cols),
        dec_b=jax.device_put(params.dec_b, plan.named(plan.mesh.axis_names[1])),
    )


def make_distributed_ganmf_step(plan: MeshPlan, m: float, recon_coefficient: float,
                                d_reg: float, g_reg: float):
    """Returns step(params, d_state, g_state, urm, uids, w, d_lr, g_lr)."""

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def step(params, d_state, g_state, urm, uids, w, d_lr, g_lr):
        real = jnp.take(urm, uids, axis=0)

        def d_loss_fn(d_p):
            p = params._replace(enc_w=d_p[0], enc_b=d_p[1], dec_w=d_p[2], dec_b=d_p[3])
            return _losses(p, uids, real, w, m, recon_coefficient, d_reg, g_reg)[0]

        dloss, grads = jax.value_and_grad(d_loss_fn)(_d_params(params))
        updates, d_state = ADAM.update(grads, d_state, _d_params(params))
        new_d = jax.tree_util.tree_map(lambda t, u: t - d_lr * u, _d_params(params), updates)
        params = params._replace(enc_w=new_d[0], enc_b=new_d[1], dec_w=new_d[2], dec_b=new_d[3])

        def g_loss_fn(g_p):
            p = params._replace(user_emb=g_p[0], item_emb=g_p[1])
            return _losses(p, uids, real, w, m, recon_coefficient, d_reg, g_reg)[1]

        gloss, grads = jax.value_and_grad(g_loss_fn)(_g_params(params))
        updates, g_state = ADAM.update(grads, g_state, _g_params(params))
        new_g = jax.tree_util.tree_map(lambda t, u: t - g_lr * u, _g_params(params), updates)
        params = params._replace(user_emb=new_g[0], item_emb=new_g[1])

        return params, d_state, g_state, dloss, gloss

    return step
