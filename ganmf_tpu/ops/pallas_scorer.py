"""Pallas fused scoring + masked top-K.

The serving path of every MF-family model is `top_k(mask(U_b @ V^T))`.
XLA materializes the full [B, I] score matrix in HBM between the matmul
and the ranking; this kernel streams item tiles through VMEM instead,
fusing the MXU matmul, the seen-item masking and a running top-K merge —
the [B, I] scores never touch HBM. At catalog sizes in the millions of
items this removes the dominant HBM round-trip; at the reference datasets'
sizes it is measurable but small (the matmul dominates).

Grid: one program per item tile, executed sequentially on TPU; the output
refs act as the running top-K accumulator across tiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _scorer_kernel(u_ref, v_ref, mask_ref, vals_ref, idx_ref, *, k: int, tile: int):
    t = pl.program_id(1)

    scores = jax.lax.dot_general(
        u_ref[:], v_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [B, T]
    scores = jnp.where(mask_ref[:] != 0, -jnp.inf, scores)

    base = t * tile
    col_ids = base + jax.lax.broadcasted_iota(jnp.int32, scores.shape, dimension=1)

    @pl.when(t == 0)
    def _():
        vals_ref[:] = jnp.full_like(vals_ref[:], -jnp.inf)
        idx_ref[:] = jnp.zeros_like(idx_ref[:])

    cand_vals = jnp.concatenate([vals_ref[:], scores], axis=1)  # [B, k + T]
    cand_idx = jnp.concatenate([idx_ref[:], col_ids], axis=1)

    # lax.top_k does not lower in Mosaic; select the k maxima with an
    # unrolled max/argmax sweep (k is small — a ranking cutoff), using
    # masked reductions instead of gathers
    pos_iota = jax.lax.broadcasted_iota(jnp.int32, cand_vals.shape, dimension=1)
    sel_vals, sel_idx = [], []
    for _ in range(k):
        m = jnp.max(cand_vals, axis=1)  # [B]
        am = jnp.argmax(cand_vals, axis=1)  # [B]
        hit = pos_iota == am[:, None]
        sel_vals.append(m)
        sel_idx.append(jnp.sum(jnp.where(hit, cand_idx, 0), axis=1))
        cand_vals = jnp.where(hit, -jnp.inf, cand_vals)
    vals_ref[:] = jnp.stack(sel_vals, axis=1)
    idx_ref[:] = jnp.stack(sel_idx, axis=1)


@functools.partial(jax.jit, static_argnames=("k", "mask_from_rows", "use_approx"))
def masked_topk_matmul(
    rows: jnp.ndarray,  # [B, C] left operand (e.g. dense URM rows)
    W: jnp.ndarray,  # [C, I] right operand (dense similarity/URM matrix)
    seen_mask: jnp.ndarray,  # [B, I] nonzero = exclude; None with mask_from_rows
    pair_ids: jnp.ndarray,  # [B, P] test item ids per row (0-padded)
    k: int,
    mask_from_rows: bool = False,
    use_approx: bool = False,
):
    """`top_k(mask(rows @ W))` plus a test-pair probe, for the
    similarity-family serving path `URM[u] @ W` (item-based) and
    `W[u] @ URM` (user-based) where the contraction is catalog-sized
    (reference BaseSimilarityMatrixRecommender.py:73-116).

    Returns (values [B, k], ids [B, k], pair_scores [B, P],
    pair_finite [B, P]): the last two give each row's masked score at its
    test items, so the evaluator's RMSE needs no [B, I] readback either.

    This is deliberately a plain XLA program, not a Pallas kernel: at a
    catalog-sized contraction the HIGHEST-precision matmul is the whole
    cost and XLA already tiles it onto the MXU optimally, while the
    [B, I] score round-trip this would save is ~0.3 ms of HBM traffic.
    Measured on v5e at LastFM shapes (B=1884, C=I=17632, k=50,
    loop-amortized): XLA matmul+top_k+probe 55.5 ms vs 79.7 ms for the
    best hand-tiled Pallas variant (whose merge constrained either the
    MXU's M-tile or scoped VMEM at every tiling we tried). top_k is used
    rather than approx_max_k(recall=1.0) because at HIGHEST precision the
    matmul dominates (approx saves <1 ms) and top_k's lowest-index tie
    order matches the dense scoring path bit-for-bit.

    Either operand may instead be a tuple of bfloat16 planes (see
    ``split_bf16_planes``): the contraction then runs one MXU bf16 pass per
    plane pair with f32 accumulation — 2 passes instead of HIGHEST's 6 when
    the other operand is bf16-exact (binary profiles are), which is where
    the catalog-sized similarity eval spends its time at ML-20M scale.
    Ranking goes through ``tiled_topk`` (value- and tie-identical to
    ``lax.top_k``) so the sort never materializes full-catalog-width rows.

    ``mask_from_rows=True`` derives the exclusion mask from the LEFT operand
    instead of ``seen_mask`` (pass None): for item-based similarity scoring
    the left operand IS the user's training profile, i.e. exactly the
    exclude-seen set, and the [B, I] seen rows would otherwise be re-built
    by a second scatter identical to the one that built ``rows`` (measured
    85 ms/block at ML-20M — ~30% of the whole fused block). Value-exact:
    both the mask and the profile are value-nonzero tests of the same
    stored entries (data/device.padded_rows_mask is `padded_rows_dense !=
    0`).

    ``use_approx=True`` ranks with ``lax.approx_max_k`` at
    recall_target=1.0 (exhaustive — exact top-k VALUES, implementation tie
    order) instead of ``tiled_topk``. Kept for experimentation only: at
    recall 1.0 XLA lowers it to a full-row sort whose value+index temps
    (~0.8 GB per 3.7k-user block at ML-20M) OOM'd a 20M evaluation on
    chip — the tiled merge exists precisely to avoid that sort footprint.
    """
    from ganmf_tpu.ops.topk import tiled_topk

    if isinstance(rows, tuple) or isinstance(W, tuple):
        rs = rows if isinstance(rows, tuple) else (rows.astype(jnp.bfloat16),)
        ws = W if isinstance(W, tuple) else (W.astype(jnp.bfloat16),)
        s = None
        for r in rs:
            for w in ws:
                t = jax.lax.dot_general(
                    r, w, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                s = t if s is None else s + t
    else:
        s = jax.lax.dot_general(
            rows.astype(jnp.float32), W.astype(jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    if mask_from_rows:
        assert not isinstance(rows, tuple), (
            "mask_from_rows requires the single-array left operand (the"
            " user profile); plane-split left operands are user-based W"
            " rows, not profiles")
        s = jnp.where(rows != 0, -jnp.inf, s)
    if seen_mask is not None:
        s = jnp.where(seen_mask, -jnp.inf, s)
    if use_approx:
        vals, idx = jax.lax.approx_max_k(s, k, recall_target=1.0)
    else:
        vals, idx = tiled_topk(s, k)
    ps = jnp.take_along_axis(s, pair_ids, axis=1)
    fin = jnp.isfinite(ps)
    return vals, idx, jnp.where(fin, ps, 0.0), fin.astype(jnp.float32)


def split_bf16_planes(W: jnp.ndarray, passes: int = 2):
    """Decompose an f32 matrix into ``passes`` bfloat16 planes whose sum
    approximates it to ~8*passes mantissa bits (2 -> ~1e-5 relative, 3 ->
    f32-grade). Against a bf16-exact left operand, contracting plane-by-
    plane with f32 accumulation replaces the 6-pass HIGHEST f32 matmul at
    passes/6 of its MXU cost."""
    planes = []
    r = W
    for _ in range(passes - 1):
        p = r.astype(jnp.bfloat16)
        planes.append(p)
        r = r - p.astype(jnp.float32)
    planes.append(r.astype(jnp.bfloat16))
    return tuple(planes)


@functools.partial(jax.jit, static_argnames=("k", "tile", "row_block", "interpret"))
def masked_topk_scores(
    user_factors: jnp.ndarray,  # [B, K]
    item_factors: jnp.ndarray,  # [I, K]
    seen_mask: jnp.ndarray,  # [B, I] nonzero = exclude
    k: int,
    tile: int = 512,
    row_block: int = 256,
    interpret: bool = False,
):
    """Streaming top-k of masked MF scores. Returns (values [B,k], ids [B,k]).

    2D grid (row blocks x item tiles, tiles fastest): the working set per
    program is row_block x tile, keeping VMEM bounded for eval-sized user
    blocks (a single-row-block kernel at B=1000 blew the 16 MB scoped-vmem
    limit)."""
    B, K = user_factors.shape
    I = item_factors.shape[0]
    if not interpret:
        # Mosaic requires the lane (last) block dimension to be a multiple
        # of 128
        tile = max(128, (tile // 128) * 128)
    # the unrolled k-sweep's live temporaries scale with row_block * k;
    # cap their product so the scoped-VMEM stack stays under the 16 MB
    # limit (measured: 256 rows x k=20 fits, 256 x k=50 needs ~19 MB)
    row_block = min(row_block, max(8, (5120 // max(k, 1)) // 8 * 8))
    row_block = min(row_block, B)
    rpad = (-B) % row_block
    if rpad:
        user_factors = jnp.pad(user_factors, ((0, rpad), (0, 0)))
        seen_mask = jnp.pad(seen_mask.astype(jnp.int8), ((0, rpad), (0, 0)), constant_values=1)
    else:
        seen_mask = seen_mask.astype(jnp.int8)
    pad = (-I) % tile
    if pad:
        item_factors = jnp.pad(item_factors, ((0, pad), (0, 0)))
        seen_mask = jnp.pad(seen_mask, ((0, 0), (0, pad)), constant_values=1)
    n_tiles = (I + pad) // tile
    n_rblocks = (B + rpad) // row_block

    grid_spec = pl.GridSpec(
        grid=(n_rblocks, n_tiles),
        in_specs=[
            pl.BlockSpec((row_block, K), lambda r, t: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, K), lambda r, t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((row_block, tile), lambda r, t: (r, t), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((row_block, k), lambda r, t: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((row_block, k), lambda r, t: (r, 0), memory_space=pltpu.VMEM),
        ),
    )
    vals, idx = pl.pallas_call(
        functools.partial(_scorer_kernel, k=k, tile=tile),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B + rpad, k), jnp.float32),
            jax.ShapeDtypeStruct((B + rpad, k), jnp.int32),
        ),
        interpret=interpret,
    )(user_factors.astype(jnp.float32), item_factors.astype(jnp.float32), seen_mask)
    return vals[:B], idx[:B]
