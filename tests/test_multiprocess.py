"""Real multi-process runtime: 2 CPU processes, localhost coordinator.

Closes the VERDICT r2 gap that ``comm.initialize()``'s multi-process path
had never executed: spawns two subprocesses that join through a real
coordinator handshake, lay a (slice=2, data=2, model=2) mesh across the
process boundary, run one distributed GANMF step plus one sharded
evaluation, and checks both processes agree with each other and with the
single-process values computed in this (8-virtual-device) parent.
"""

import json
import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sps

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _single_process_expected():
    """The same computation as mp_worker.py on this process's devices."""
    from ganmf_tpu.eval import EvaluatorHoldout
    from ganmf_tpu.parallel import init_distributed, make_distributed_ganmf_step, make_mesh

    rng = np.random.RandomState(7)
    dense = (rng.rand(40, 64) < 0.25).astype(np.float32)
    holdout = (rng.rand(40, 64) < 0.08).astype(np.float32) * (1.0 - dense)
    train = sps.csr_matrix(dense)
    test = sps.csr_matrix(holdout)

    plan = make_mesh(n_slices=2, n_data=2, n_model=2)  # 8 local devices
    params, d_state, g_state = init_distributed(7, 40, 64, 4, 8, plan)
    step = make_distributed_ganmf_step(plan, 1.0, 0.2, 1e-4, 1e-4)
    uids = np.arange(16, dtype=np.int32)
    params, _, _, dloss, gloss = step(
        params, d_state, g_state,
        jax.device_put(jnp.asarray(dense), plan.urm),
        jax.device_put(jnp.asarray(uids), plan.batch),
        jax.device_put(jnp.ones((16,), jnp.float32), plan.batch),
        jnp.float32(1e-3), jnp.float32(1e-3),
    )
    checksum = float(jnp.sum(params.user_emb) + jnp.sum(params.item_emb))

    class DeterministicScorer:
        def __init__(self):
            srng = np.random.RandomState(3)
            self._scores = jnp.asarray(srng.randn(40, 64).astype(np.float32))
            self._mask = jnp.asarray(dense > 0)

        def get_URM_train(self):
            return train

        def score_device(self, u):
            return jnp.take(self._scores, u, axis=0)

        def device_train_mask(self):
            return self._mask

    results, _ = EvaluatorHoldout(test, [5], mesh_plan=plan).evaluateRecommender(
        DeterministicScorer()
    )

    from ganmf_tpu.ops.distchol import ease_r_topk_sharded

    ev_vals, ev_idx = ease_r_topk_sharded(jnp.asarray(dense), 5.0, k=4, plan=plan, panel=8)
    return {
        "dloss": float(dloss), "gloss": float(gloss), "checksum": checksum,
        "MAP": results[5]["MAP"], "NDCG": results[5]["NDCG"],
        "PRECISION": results[5]["PRECISION"],
        "ease_sum": float(jnp.sum(ev_vals)), "ease_idx_sum": int(jnp.sum(ev_idx)),
    }


@pytest.mark.slow
def test_two_process_mesh_matches_single_process():
    port = _free_port()
    env = dict(os.environ)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        stdout, stderr = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{stdout}\n{stderr}"
        line = [l for l in stdout.splitlines() if l.startswith("RESULT ")]
        assert line, f"no RESULT line:\n{stdout}\n{stderr}"
        outs.append(json.loads(line[0][len("RESULT "):]))

    # both processes computed the same replicated values
    for key in ("dloss", "gloss", "checksum", "MAP", "NDCG", "PRECISION",
                "ease_sum", "ease_idx_sum"):
        assert outs[0][key] == pytest.approx(outs[1][key], rel=1e-6), key

    # and they match the single-process computation
    expected = _single_process_expected()
    for key in ("dloss", "gloss", "checksum"):
        assert outs[0][key] == pytest.approx(expected[key], rel=1e-4, abs=1e-6), key
    for key in ("MAP", "NDCG", "PRECISION", "ease_sum"):
        assert outs[0][key] == pytest.approx(expected[key], rel=1e-5), key
    assert outs[0]["ease_idx_sum"] == expected["ease_idx_sum"]
