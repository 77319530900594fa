#!/usr/bin/env python3
"""On-chip receipts for the XLA TPU scatter-add cost model that closes the
CAAE D-phase question (ROADMAP.md).

Measures, with a scanned `tab.at[idx].add(g)` at the CAAE ML-1M shapes
([3 * 9216] update rows into a [6040 + 3706, 44] table):

  1. scatter cost vs update-row count   -> sub-linear (halving rows does
     NOT halve cost: a per-scatter overhead floor dominates at this size)
  2. scatter cost vs row width (8..128) -> sub-linear (16x width -> ~4x)
  3. `unique_indices=True`              -> NOT faster (167 vs 132 us)
  4. the full fused gather+grad+scatter update vs its parts

Consequences (see ROADMAP.md "CAAE D-phase"): deduplication cannot win —
the unique hint buys nothing and even halving the row count buys nothing,
while its run-sum machinery (perm gather + cumsum) adds real cost. These
micro shapes use uniform-random indices; the real epoch's skewed streams
measure ~2x faster per update, so treat the absolute numbers as an upper
bound and the RELATIVE conclusions as the receipt.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/scatter_cost_model.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

U, I, K = 6040, 3706, 43
N = U + I
B = 9216
STEPS = 300


def _sync(x):
    np.asarray(jax.device_get(x.ravel()[0:1]))


def scan_cost(body, rows, width, steps=STEPS):
    """Best-of-2 differenced per-step cost of a scanned body."""
    tab = jnp.zeros((N, width), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (steps, rows), 0, N)
    w = jnp.ones((steps, B), jnp.float32)

    @jax.jit
    def run(tab, idx, w):
        def step(t, inp):
            return body(t, *inp), None

        t, _ = jax.lax.scan(step, tab, (idx, w))
        return t

    _sync(run(tab, idx[:2], w[:2]))

    def t(n):
        t0 = time.perf_counter()
        _sync(run(tab, idx[:n], w[:n]))
        return time.perf_counter() - t0

    t2 = min(t(2) for _ in range(2))
    tn = min(t(steps) for _ in range(2))
    return (tn - t2) / (steps - 2)


def main():
    width = K + 1
    upd = {w: jnp.ones((3 * B, w), jnp.float32) for w in (8, width, 128)}
    upd_half = jnp.ones((3 * B // 2, width), jnp.float32)
    upd_uni = jnp.ones((N, width), jnp.float32)

    rows_tests = [
        ("scatter 3B rows, width K+1", 3 * B, width,
         lambda t, i, w: t.at[i].add(upd[width])),
        ("scatter 3B/2 rows, width K+1", 3 * B // 2, width,
         lambda t, i, w: t.at[i[: 3 * B // 2]].add(upd_half)),
        ("scatter 3B rows, width 8", 3 * B, 8,
         lambda t, i, w: t.at[i].add(upd[8])),
        ("scatter 3B rows, width 128", 3 * B, 128,
         lambda t, i, w: t.at[i].add(upd[128])),
        ("scatter 3B rows, unique hint", 3 * B, width,
         lambda t, i, w: t.at[i].add(upd[width], unique_indices=True)),
        ("scatter N rows (table-sized)", N, width,
         lambda t, i, w: t.at[i[:N]].add(upd_uni)),
    ]
    print(f"table [{N}, *], {STEPS}-step scan, per-step cost:")
    for name, rows, w, body in rows_tests:
        s = scan_cost(body, 3 * B, w)
        print(f"  {name:34s} {s*1e6:8.1f} us  ({s*1e9/rows:5.2f} ns/row)")

    # the real CAAE update shape: fused gather + BPR grad + scatter
    def d_local_loss(rows, w):
        ue = rows[:B, :K]
        pe, ne = rows[B : 2 * B], rows[2 * B :]
        x = jnp.sum(ue * (pe[:, :K] - ne[:, :K]), axis=1) + (pe[:, K] - ne[:, K])
        ll = jnp.sum(jax.nn.log_sigmoid(x) * w) / jnp.maximum(jnp.sum(w), 1.0)
        reg = 0.5 * (jnp.sum(ue**2, 1) + jnp.sum(pe**2, 1) + jnp.sum(ne**2, 1))
        return -ll + 0.1 * jnp.sum(reg * w)

    full = scan_cost(
        lambda t, i, w: t.at[i].add(-1e-3 * jax.grad(d_local_loss)(jnp.take(t, i, axis=0), w)),
        3 * B, width,
    )
    gather = scan_cost(
        lambda t, i, w: t + 0.0 * jnp.sum(jnp.take(t, i, axis=0)), 3 * B, width
    )
    print(f"  {'full gather+grad+scatter':34s} {full*1e6:8.1f} us")
    print(f"  {'gather only':34s} {gather*1e6:8.1f} us")
    n_updates = 10 * -(-799_983 // B) * 2  # d_steps x chunks x 2 (G, G')
    print(f"\nML-1M D-phase at this uniform-random per-update cost: {n_updates} updates "
          f"x {full*1e6:.0f} us = {n_updates*full*1e3:.0f} ms (upper bound; the real "
          f"epoch's skewed streams measure ~2x faster per update)")


if __name__ == "__main__":
    main()
