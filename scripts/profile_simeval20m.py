#!/usr/bin/env python3
"""Decompose the 20M similarity-family eval block (VERDICT r4 #2): which
stage eats the 11.2 s ItemKNN evaluation — the [B, I] x [I, I] scoring
contraction, the profile-row build, the seen mask, the tiled top-k, or the
metric program?

Honest timing on the axon backend requires a VALUE READBACK (PERF.md
notes): every stage reduces to a scalar and converts to float.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def t(label, fn, n=3):
    t0 = time.time()
    float(fn())  # warm (compile)
    print(f"  [{label}] warm/compile {time.time()-t0:.1f}s", flush=True)
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        float(fn())
        best = min(best, time.time() - t0)
    print(f"{label:58s} {best*1e3:9.1f} ms", flush=True)
    return best


def main():
    from ganmf_tpu.cli.experiment import load_urms
    from ganmf_tpu.eval import EvaluatorHoldout
    from ganmf_tpu.eval.evaluator import _seen_rows
    from ganmf_tpu.models import ItemKNNCFRecommender

    t0 = time.time()
    splits = load_urms("20M")
    print(f"splits {time.time()-t0:.1f}s", flush=True)

    m = ItemKNNCFRecommender(splits.train)
    t0 = time.time()
    m.fit(topK=300, shrink=0, similarity="cosine")
    print(f"fit {time.time()-t0:.1f}s", flush=True)

    ev = EvaluatorHoldout(splits.test, cutoff_list=[5, 10, 20, 50])
    n_eval = len(ev.usersToEvaluate)
    block_size = int(min(4096, max(1, 1e8 / max(ev.n_items, 1))))
    users = np.asarray(ev.usersToEvaluate[:block_size], dtype=np.int64)
    uids = jnp.asarray(users, dtype=jnp.int32)
    n_blocks = -(-n_eval // block_size)
    print(f"B={len(users)}, I={ev.n_items}, blocks={n_blocks}", flush=True)

    t("operands (profile rows + W planes)",
      lambda: sum(jnp.sum(x, dtype=jnp.float32)
                  for pair in m._fused_serving_operands(uids)
                  for x in (pair if isinstance(pair, tuple) else (pair,))))

    rows, right = m._fused_serving_operands(uids)
    jax.block_until_ready((rows, right))

    def contract():
        rs = rows if isinstance(rows, tuple) else (rows,)
        ws = right if isinstance(right, tuple) else (right,)
        s = None
        for r in rs:
            for w in ws:
                z = jax.lax.dot_general(r, w, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                s = z if s is None else s + z
        return s

    t("contraction alone", lambda: jnp.sum(contract()))
    t("seen mask (_seen_rows)", lambda: jnp.sum(_seen_rows(m, uids)))

    s_cached = contract()
    s_cached = jnp.where(_seen_rows(m, uids), -jnp.inf, s_cached)
    s_sum = jnp.where(jnp.isfinite(s_cached), s_cached, -1e30)
    jax.block_until_ready(s_sum)

    from ganmf_tpu.ops.topk import tiled_topk
    t("tiled_topk(s, 50)", lambda: jnp.sum(tiled_topk(s_sum, 50)[0]))

    def full_block():
        v, i, r = ev._fused_sim_block(m, users)
        return jnp.sum(v) + jnp.sum(r)

    t("full _fused_sim_block", lambda: full_block())

    # whole-eval steady state for reference
    ev.evaluateRecommender(m)
    t0 = time.time()
    ev.evaluateRecommender(m)
    e = time.time() - t0
    print(f"evaluateRecommender steady {e:.2f}s  ({n_eval/e:,.0f} users/s)", flush=True)


if __name__ == "__main__":
    main()
