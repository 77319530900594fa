#!/usr/bin/env python3
"""Decompose the 20M-scale evaluator block time: which stage eats the
12 s/block observed in scale20m's TopPop run?

Honest timing on the axon backend requires a VALUE READBACK, not
block_until_ready (PERF.md notes) — every stage below reduces its output
to a scalar and converts to float.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def t(label, fn, n=3):
    float(fn())  # warm (compile)
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        float(fn())
        best = min(best, time.time() - t0)
    print(f"{label:55s} {best*1e3:9.1f} ms", flush=True)
    return best


def main():
    from ganmf_tpu.cli.experiment import load_urms
    from ganmf_tpu.eval import EvaluatorHoldout
    from ganmf_tpu.eval.evaluator import _seen_rows
    from ganmf_tpu.eval.metrics import evaluate_batch
    from ganmf_tpu.data.device import padded_rows_dense
    from ganmf_tpu.models import TopPop

    t0 = time.time()
    splits = load_urms("20M")
    print(f"splits {time.time()-t0:.1f}s", flush=True)

    m = TopPop(splits.train)
    m.fit()
    ev = EvaluatorHoldout(splits.test, cutoff_list=[5, 10, 20, 50])
    users = np.asarray(ev.usersToEvaluate[:3736], dtype=np.int64)
    uids = jnp.asarray(users, dtype=jnp.int32)
    L_train = m._padded_urm().idx.shape[1]
    L_test = ev._test_padded.idx.shape[1]
    print(f"block B={len(users)}, I={ev.n_items}, L_train={L_train}, L_test={L_test}", flush=True)

    nov = jnp.zeros((ev.n_items,), jnp.float32)
    pop = jnp.zeros((ev.n_items,), jnp.float32)
    valid = jnp.ones((len(users),), bool)

    t("test padded_rows_dense", lambda: padded_rows_dense(ev._test_padded, uids, ev.n_items).sum())
    t("score_device", lambda: m.score_device(uids).sum())
    t("seen mask (_seen_rows)", lambda: _seen_rows(m, uids).sum())

    scores = jnp.where(_seen_rows(m, uids), -jnp.inf, m.score_device(uids))
    scores = jnp.where(jnp.isfinite(scores), scores, -1e30)  # summable
    test_rows = padded_rows_dense(ev._test_padded, uids, ev.n_items)
    npos = jnp.take(ev._n_pos, uids)
    jax.block_until_ready((scores, test_rows, npos))

    t("lax.top_k(scores, 50)", lambda: jax.lax.top_k(scores, 50)[0].sum())
    t("evaluate_batch (full)", lambda: evaluate_batch(
        scores, test_rows, npos, valid, nov, pop,
        cutoffs=(5, 10, 20, 50), max_cutoff=50).scalars.sum())

    # the actual per-block composite as evaluateRecommender runs it
    def block():
        s = jnp.where(_seen_rows(m, uids), -jnp.inf, m.score_device(uids))
        tr = padded_rows_dense(ev._test_padded, uids, ev.n_items)
        return evaluate_batch(s, tr, npos, valid, nov, pop,
                              cutoffs=(5, 10, 20, 50), max_cutoff=50)
    t("composite block", lambda: block().scalars.sum())


if __name__ == "__main__":
    main()
