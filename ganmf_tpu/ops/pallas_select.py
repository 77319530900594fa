"""VMEM-resident exact-k row selection (Pallas TPU kernel).

Device kernel behind ``ops.topk.smallest_k_mask``: selects each row's
``k[r]`` smallest keys with ties broken by index — the semantics of the
reference's per-user without-replacement negative samplers
(cython_utils.pyx:48-66, CAAE.py:277-285) — without sorting.

The XLA fallback in ops/topk.py streams the [R, I] key block from HBM on
every one of its 32 bisection steps (~2.9 GB of traffic at the CFGAN
ML-1M full-matrix shape). This kernel keeps the block in VMEM across the
whole search, so HBM sees one read of the keys and one write of the
mask; the 32 value-bisection steps plus ceil(log2 I) tie-break steps run
at VPU rates on-chip. Selection is bitwise-identical to the fallback
(and therefore to the original stable rank-table construction): the
equivalence is pinned by tests/test_pallas_select.py in interpret mode
and verified bitwise on real hardware at all three dataset shapes plus
the [128, 65536] streamed shape (scripts/pallas_select_onchip_check.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# beyond this many columns even an 8-row block with its bisection
# temporaries would crowd the ~16 MB VMEM budget; let XLA stream instead
MAX_KERNEL_COLS = 131072


def _monotone_u32(bits: jnp.ndarray) -> jnp.ndarray:
    # order-preserving map of IEEE-754 onto uint32 (no NaNs in our keys)
    return jnp.where(bits >> 31 == 1, ~bits, bits | jnp.uint32(0x80000000))


def _kernel(keys_ref, k_ref, out_ref, *, n_index_steps: int):
    u = _monotone_u32(pltpu.bitcast(keys_ref[:], jnp.uint32))  # [R, I]
    k = k_ref[:]  # [R, 1] int32
    rows = u.shape[0]

    # value bisection: smallest T with count(u <= T) >= k
    lo = jnp.zeros((rows, 1), jnp.uint32)
    hi = jnp.full((rows, 1), 0xFFFFFFFF, jnp.uint32)

    def vstep(_, lohi):
        lo, hi = lohi
        mid = lo + (hi - lo) // 2
        ge = jnp.sum((u <= mid).astype(jnp.int32), axis=1, keepdims=True) >= k
        return jnp.where(ge, lo, mid + 1), jnp.where(ge, mid, hi)

    thresh, _ = jax.lax.fori_loop(0, 32, vstep, (lo, hi))

    less = u < thresh
    eq = u == thresh
    # k >= 1 implies count(u < T) < k by minimality of T, so needed >= 1
    needed = k - jnp.sum(less.astype(jnp.int32), axis=1, keepdims=True)

    # tie-break: the needed-th smallest original index among the eq set,
    # found by bisecting index space (cumsum-free; Mosaic-friendly)
    iota = jax.lax.broadcasted_iota(jnp.int32, u.shape, 1)
    ilo = jnp.zeros((rows, 1), jnp.int32)
    ihi = jnp.full((rows, 1), u.shape[1] - 1, jnp.int32)

    def istep(_, lohi):
        lo2, hi2 = lohi
        mid = lo2 + (hi2 - lo2) // 2
        cnt = jnp.sum((eq & (iota <= mid)).astype(jnp.int32), axis=1, keepdims=True)
        ge = cnt >= needed
        return jnp.where(ge, lo2, mid + 1), jnp.where(ge, mid, hi2)

    cut, _ = jax.lax.fori_loop(0, n_index_steps, istep, (ilo, ihi))

    sel = (less | (eq & (iota <= cut))) & (k > 0)
    out_ref[:] = sel.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def smallest_k_mask_pallas(keys: jnp.ndarray, k: jnp.ndarray, interpret: bool = False):
    """Pallas path of ``smallest_k_mask``. Returns a bool [U, I] mask.

    Pads columns with +inf (never selected: k[r] never exceeds the count
    of finite keys at the call sites) and rows with k=0 (all-false).
    """
    n_rows, n_cols = keys.shape
    cpad = (-n_cols) % 128
    if cpad:
        keys = jnp.pad(keys, ((0, 0), (0, cpad)), constant_values=jnp.inf)
    width = n_cols + cpad

    # block rows so keys + u + the compare temporaries stay well under the
    # VMEM budget (~16 bytes/element live across the search)
    block = max(8, min(256, (375_000 // width) // 8 * 8 or 8))
    rpad = (-n_rows) % block
    if rpad:
        keys = jnp.pad(keys, ((0, rpad), (0, 0)))
    k2 = jnp.pad(k.astype(jnp.int32), (0, rpad))[:, None]

    out = pl.pallas_call(
        functools.partial(_kernel, n_index_steps=max(1, (width - 1).bit_length())),
        grid=((n_rows + rpad) // block,),
        in_specs=[
            pl.BlockSpec((block, width), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda r: (r, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, width), lambda r: (r, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_rows + rpad, width), jnp.float32),
        interpret=interpret,
    )(keys.astype(jnp.float32), k2)
    return out[:n_rows, :n_cols] != 0.0
