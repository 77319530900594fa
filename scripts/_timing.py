"""Shared measurement protocol for the perf/option scripts.

The tunnel-attached chip's constant-term jitter reaches seconds, so epoch
costs come from large-N fit differencing with best-of-2 on BOTH ends
(PERF.md notes; memory: an 11-epoch single-shot protocol once read
CAAE[1M] at 48 ms vs the robust ~220 ms, and a 41-epoch single-shot tn
read a bf16 GANMF epoch at 3x the chip's peak FLOP rate).
"""

import json
import os
import time


def timeit(fn, n=3, warmup=1):
    """Best-of-n wall time of a direct call (fn must end with a value
    readback — block_until_ready returns early on this backend)."""
    for _ in range(warmup):
        fn()
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def epoch_time(make_model, fit_kwargs, n_epochs=101):
    """Steady-state epoch cost via fit-duration differencing:
    (min2 t[n_epochs] - min2 t[1]) / (n_epochs - 1). n_epochs must be large
    enough that the epoch signal dwarfs the link jitter."""
    import jax
    import jax.numpy as jnp

    def run(n):
        m = make_model()
        t0 = time.time()
        m.fit(epochs=n, **fit_kwargs)
        leaf = jax.tree_util.tree_leaves(m.params)[0]
        float(jnp.sum(leaf))  # value readback = the only honest sync
        return time.time() - t0

    run(1)  # compile
    t1 = min(run(1) for _ in range(2))
    tn = min(run(n_epochs) for _ in range(2))
    return max(tn - t1, 1e-9) / (n_epochs - 1)


def atomic_json_dump(obj, path):
    """Write JSON via temp file + rename so a mid-write crash cannot
    truncate previously recorded results."""
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(obj, fh, indent=1)
    os.replace(tmp, path)
