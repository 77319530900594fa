#!/usr/bin/env python3
"""Headline benchmark: GANMF training-epoch time on ML-1M.

Trains the paper's model (num_factors=250, emb_dim=992, batch_size=64 —
the committed best params, experiments/GANMF_user_1M/best_params.txt) on
the committed ML-1M split and measures steady-state epoch wall time.

Baseline: the reference's final ML-1M train took ~240 s for 66 epochs on
the authors' GPU (test_results/GANMF_user_1M/test_results.txt after
correcting the timedelta unit bug; see BASELINE.md) = ~3.64 s/epoch.

Prints ONE JSON line:
  {"metric": ..., "value": s_per_epoch, "unit": "s", "vs_baseline": speedup}
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REF_SECONDS_PER_EPOCH = 240.0 / 66.0

BEST_PARAMS_ML1M = {
    "num_factors": 250, "emb_dim": 992, "batch_size": 64, "m": 10,
    "d_lr": 0.0001, "g_lr": 0.0001653241474168571, "d_reg": 0.0001,
    "recon_coefficient": 0.01,
}


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ganmf_tpu.data import load_reference_splits
    from ganmf_tpu.models import GANMF
    from ganmf_tpu.models.ganmf import ADAM, _d_params, _g_params, _init_params, ganmf_epoch
    from ganmf_tpu.models.gan_base import make_batches, padded_weights, shuffled_padded_perm

    try:
        splits = load_reference_splits("1M")
        urm_csr = splits.train
    except FileNotFoundError:
        # fallback: synthetic matrix with ML-1M's shape and density
        rng = np.random.RandomState(0)
        import scipy.sparse as sps

        dense = (rng.rand(6040, 3706) < 0.0357).astype(np.float32)
        urm_csr = sps.csr_matrix(dense)

    model = GANMF(urm_csr, mode="user", seed=1337, is_experiment=True)
    urm = model._train_dense()
    n_rows = urm.shape[0]
    p = BEST_PARAMS_ML1M

    params = _init_params(jax.random.PRNGKey(1337), *urm.shape, p["num_factors"], p["emb_dim"])
    d_state = ADAM.init(_d_params(params))
    g_state = (
        ADAM.init((params.item_emb,)),
        jnp.zeros_like(params.user_emb),
        jnp.zeros_like(params.user_emb),
        jnp.float32(0.0),
    )
    n_batches, padded = make_batches(n_rows, p["batch_size"])
    weights = jnp.asarray(padded_weights(n_rows, padded))
    rng = np.random.RandomState(1337)

    def one_epoch():
        nonlocal params, d_state, g_state
        perm = jnp.asarray(shuffled_padded_perm(rng, n_rows, padded))
        params, d_state, g_state, dl, gl = ganmf_epoch(
            params, d_state, g_state, urm, perm, weights,
            jnp.float32(p["d_lr"]), jnp.float32(p["g_lr"]),
            m=float(p["m"]), recon_coefficient=float(p["recon_coefficient"]),
            d_reg=float(p["d_reg"]), g_reg=0.0,
            n_batches=n_batches, batch_size=p["batch_size"], d_steps=1, g_steps=1,
        )
        return dl

    # warmup (compile) + steady-state timing; float() forces a device sync.
    # Best-of-3 over 20-epoch runs: the tunnel link's constant-term jitter
    # reaches seconds, so a single shot can absorb a stall (PERF.md notes).
    float(one_epoch())
    n_timed = 20
    per_epoch = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(n_timed):
            dl = one_epoch()
        float(dl)
        per_epoch = min(per_epoch, (time.time() - t0) / n_timed)

    print(json.dumps({
        "metric": "ganmf_ml1m_train_epoch_time",
        "value": round(per_epoch, 4),
        "unit": "s",
        "vs_baseline": round(REF_SECONDS_PER_EPOCH / per_epoch, 2),
    }))


if __name__ == "__main__":
    main()
