"""Top-K ranking ops, including the cross-shard merge.

When scores are sharded over the item (model) axis, ranking is a
per-shard ``lax.top_k`` followed by an all-gather of the k candidates per
shard and a final re-rank — exact whenever k <= shard width (SURVEY §5.7:
the analogue of ring/Ulysses merging for the item "context" axis).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ganmf_tpu.parallel.mesh import MODEL_AXIS, MeshPlan


def sharded_topk(scores: jnp.ndarray, k: int, plan: MeshPlan):
    """Exact top-k of item-sharded scores with a candidate all-gather merge.

    scores: [B, I] laid out (replicated, model). Returns replicated
    (values [B, k], global indices [B, k]).
    """

    def local(block):  # [B, I / n_model] per shard
        v, i = jax.lax.top_k(block, k)
        offset = jax.lax.axis_index(MODEL_AXIS) * block.shape[1]
        i = i + offset
        v_all = jax.lax.all_gather(v, MODEL_AXIS, axis=1, tiled=True)  # [B, n*k]
        i_all = jax.lax.all_gather(i, MODEL_AXIS, axis=1, tiled=True)
        vv, pos = jax.lax.top_k(v_all, k)
        return vv, jnp.take_along_axis(i_all, pos, axis=1)

    fn = shard_map(
        local,
        mesh=plan.mesh,
        in_specs=P(None, MODEL_AXIS),
        out_specs=(P(None, None), P(None, None)),
        # outputs are replicated by the all_gather + re-rank; the static
        # varying-manual-axes check cannot prove it
        check_vma=False,
    )
    return fn(scores)
