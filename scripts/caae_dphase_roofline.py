#!/usr/bin/env python3
"""CAAE D-phase roofline receipt (VERDICT r4 #8).

Splits the committed-ML-1M-config D phase into its two programs and times
each on the chip:

  * PROLOGUE — everything a fused Pallas draw kernel could possibly
    accelerate: the G/G' autoencodes over the full URM, softmax, the
    two-level bucketed inverse-CDF table builds, ALL n_steps*B negative
    draws for both samplers, and the fused [n_steps, 3B] index assembly.
    Since round 3 this is one fully-vectorized pass hoisted out of the
    scan (models/caae.py:223-246).
  * SCAN — the serialized gather+grad+scatter chunk updates
    (2 * d_steps * n_d_chunks dependent scatter-adds into the fused
    [U+I, K+1] table; models/caae.py:256-265).

The scan's per-update cost is compared against the independently measured
scatter floor from scripts/scatter_cost_model.py (~132 us per
[3B]-row scatter-add at this shape, with a per-scatter overhead floor
that row-count reduction does not move). If PROLOGUE << SCAN and the
scan's per-update cost sits at the scatter floor, the epoch is at its
structural bound under exact reference sequential-SGD semantics
(/root/reference/GANRec/CAAE.py:228-265) and the "fuse the draw into a
Pallas kernel" lever is moot — the draw is not on the serial path.

Writes caae_roofline into PERF.json extras and prints JSON rows.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from _timing import timeit

import jax
import jax.numpy as jnp

from ganmf_tpu.data.splits import load_reference_splits
from ganmf_tpu.models import caae as C

# the PERF-protocol config behind the committed "CAAE[1M] steady epoch
# 197.8 ms" row (scripts/perf_report.py:228) — the epoch the VERDICT
# roofline question is about. Pass --best-params for the committed
# reference config (/root/reference/experiments/CAAE__1M/best_params.pkl).
CFG = dict(d_steps=2, g_layers=1, g_units=100, num_factors=50,
           d_bsize=4096, lr=1e-3, beta=0.1)
if "--best-params" in sys.argv:
    CFG = dict(d_steps=10, g_layers=5, g_units=100, num_factors=43,
               d_bsize=9216, lr=1e-3, beta=0.1)


def main():
    train = load_reference_splits("1M").train
    n_users, n_items = train.shape
    nnz = train.nnz
    d_bsize = CFG["d_bsize"]
    d_steps = CFG["d_steps"]
    n_d_chunks = max(1, int(np.ceil(nnz / d_bsize)))
    n_steps = d_steps * n_d_chunks
    K = CFG["num_factors"]

    urm = jnp.asarray(np.asarray(train.todense(), dtype=np.float32))
    coo = train.tocoo()
    pad = n_d_chunks * d_bsize - nnz
    users = jnp.asarray(np.concatenate([coo.row, np.zeros(pad, np.int32)]).astype(np.int32))
    pos_items = jnp.asarray(np.concatenate([coo.col, np.zeros(pad, np.int32)]).astype(np.int32))
    weights = jnp.asarray(np.concatenate([np.ones(nnz, np.float32), np.zeros(pad, np.float32)]))

    key = jax.random.PRNGKey(1)
    k_g, k_gpr, k_du, k_di, k_d = jax.random.split(key, 5)
    glorot = jax.nn.initializers.glorot_uniform()
    g_dims = [n_items] + [CFG["g_units"]] * CFG["g_layers"] + [n_items]
    G = C._init_mlp(k_g, g_dims)
    Gpr = C._init_mlp(k_gpr, g_dims)
    d_user = glorot(k_du, (n_users, K), jnp.float32)
    d_item = glorot(k_di, (n_items, K), jnp.float32)
    NB = 64

    # ---- PROLOGUE: autoencodes + tables + every draw + index assembly ----
    @jax.jit
    def prologue(G, Gpr, urm, key):
        k_shuffle, k_d1, k_d2 = jax.random.split(key, 3)
        perm = jax.random.permutation(k_shuffle, users.shape[0])
        u = jnp.take(users, perm)
        p = jnp.take(pos_items, perm)
        w = jnp.take(weights, perm)
        g_bcdf, g_wcdf = C._bucketed_cdf_tables(
            jax.nn.softmax(C._autoencode(G, urm), axis=1), NB)
        gpr_bcdf, gpr_wcdf = C._bucketed_cdf_tables(
            jax.nn.softmax(C._autoencode(Gpr, urm), axis=1), NB)
        u_all = jnp.tile(u[: n_d_chunks * d_bsize].reshape(n_d_chunks, d_bsize), (d_steps, 1))
        p_all = jnp.tile(p[: n_d_chunks * d_bsize].reshape(n_d_chunks, d_bsize), (d_steps, 1))
        w_all = jnp.tile(w[: n_d_chunks * d_bsize].reshape(n_d_chunks, d_bsize), (d_steps, 1))
        rows = u_all.reshape(n_steps * d_bsize)
        neg_g = C._bucketed_cdf_sample(g_bcdf, g_wcdf, rows, k_d1, NB, n_items).reshape(n_steps, d_bsize)
        neg_gpr = C._bucketed_cdf_sample(gpr_bcdf, gpr_wcdf, rows, k_d2, NB, n_items).reshape(n_steps, d_bsize)
        idx_g = jnp.concatenate([u_all, n_users + p_all, n_users + neg_g], axis=1)
        idx_gpr = jnp.concatenate([u_all, n_users + p_all, n_users + neg_gpr], axis=1)
        return idx_g, idx_gpr, w_all

    idx_g, idx_gpr, w_all = prologue(G, Gpr, urm, k_d)
    t_prologue = timeit(lambda: float(jnp.sum(prologue(G, Gpr, urm, k_d)[0])), n=5)

    # ---- draw-only subset of the prologue (tables assumed built) --------
    g_bcdf, g_wcdf = C._bucketed_cdf_tables(
        jax.nn.softmax(C._autoencode(G, urm), axis=1), NB)
    rows_flat = jnp.tile(users[: n_d_chunks * d_bsize], (d_steps,))

    @jax.jit
    def draw_only(bcdf, wcdf, key):
        return C._bucketed_cdf_sample(bcdf, wcdf, rows_flat, key, NB, n_items)

    t_draw = timeit(lambda: float(jnp.sum(draw_only(g_bcdf, g_wcdf, k_d))), n=5)

    # ---- SCAN: the serialized fused gather+grad+scatter updates ---------
    lr = jnp.float32(CFG["lr"])
    beta = jnp.float32(CFG["beta"])
    B = d_bsize

    def d_local_loss(rows, w):
        ue = rows[:B, :K]
        pe, ne = rows[B:2 * B], rows[2 * B:]
        x = jnp.sum(ue * (pe[:, :K] - ne[:, :K]), axis=1) + (pe[:, K] - ne[:, K])
        log_lik = jnp.sum(jax.nn.log_sigmoid(x) * w) / jnp.maximum(jnp.sum(w), 1.0)
        reg_rows = 0.5 * (jnp.sum(ue**2, 1) + jnp.sum(pe**2, 1) + jnp.sum(ne**2, 1))
        return -log_lik + beta * jnp.sum(reg_rows * w)

    def d_fused_update(tab, idxs, w):
        rows = jnp.take(tab, idxs, axis=0)
        g_rows = jax.grad(d_local_loss)(rows, w)
        return tab.at[idxs].add(-lr * g_rows)

    @jax.jit
    def dscan(tab, idx_g, idx_gpr, w_all):
        def step(tab, inputs):
            ig, igpr, w = inputs
            tab = d_fused_update(tab, ig, w)
            tab = d_fused_update(tab, igpr, w)
            return tab, None
        tab, _ = jax.lax.scan(step, tab, (idx_g, idx_gpr, w_all))
        return tab

    tab0 = jnp.concatenate([
        jnp.pad(d_user, ((0, 0), (0, 1))),
        jnp.concatenate([d_item, jnp.zeros((n_items, 1), jnp.float32)], axis=1),
    ], axis=0)
    t_scan = timeit(lambda: float(jnp.sum(dscan(tab0, idx_g, idx_gpr, w_all))), n=5)

    n_updates = 2 * n_steps
    out = {
        "config": CFG,
        "n_d_chunks": n_d_chunks,
        "n_updates": n_updates,
        "prologue_ms": round(t_prologue * 1e3, 2),
        "draw_only_ms": round(t_draw * 1e3, 2),
        "dscan_ms": round(t_scan * 1e3, 2),
        "scan_us_per_update": round(t_scan * 1e6 / n_updates, 1),
        "scatter_floor_us_per_update": 132.0,
        "scan_frac_of_dphase": round(t_scan / (t_prologue + t_scan), 3),
    }
    print(json.dumps(out), flush=True)
    if os.path.isfile("PERF.json"):
        perf = json.load(open("PERF.json"))
        perf.setdefault("extras", {})["caae_roofline_1M"] = out
        from _timing import atomic_json_dump
        atomic_json_dump(perf, "PERF.json")


if __name__ == "__main__":
    main()
