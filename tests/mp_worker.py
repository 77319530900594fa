"""Subprocess body for the real multi-process runtime test.

Launched by tests/test_multiprocess.py as ``python mp_worker.py <pid>
<nproc> <port>``: joins a localhost coordinator through
``ganmf_tpu.parallel.comm.initialize``, builds a (slice=2, data=2,
model=2) mesh whose slice axis crosses the process boundary, runs one
distributed GANMF step and one sharded evaluation, and prints the
numerical results as a JSON line for the parent to compare against the
single-process values. This exercises the coordinator handshake and
cross-process collectives that the in-process mesh tests cannot
(SURVEY §2.9/§5.8).
"""

import json
import os
import re
import sys

# Each process contributes 4 virtual CPU devices. The parent pytest env
# forces 8 via XLA_FLAGS (tests/conftest.py) — strip that so the config
# below is authoritative, and do it before any backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = re.sub(
    r"--xla_force_host_platform_device_count=\d+", "", os.environ.get("XLA_FLAGS", "")
).strip()
if _flags:
    os.environ["XLA_FLAGS"] = _flags
else:
    os.environ.pop("XLA_FLAGS", None)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
# Cross-process CPU collectives need an explicit implementation; gloo is
# the in-tree default for multi-process CPU runtimes.
jax.config.update("jax_cpu_collectives_implementation", "gloo")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    from ganmf_tpu.parallel import comm

    assert not comm.is_initialized()
    comm.initialize(f"localhost:{port}", num_processes=nproc, process_id=pid)
    assert comm.is_initialized()
    assert comm.process_count() == nproc
    assert comm.process_index() == pid
    assert len(jax.devices()) == 4 * nproc

    import jax.numpy as jnp
    import numpy as np
    import scipy.sparse as sps

    from ganmf_tpu.eval import EvaluatorHoldout
    from ganmf_tpu.parallel import init_distributed, make_distributed_ganmf_step, make_mesh

    # same deterministic URM in every process (and in the parent)
    rng = np.random.RandomState(7)
    dense = (rng.rand(40, 64) < 0.25).astype(np.float32)
    holdout = (rng.rand(40, 64) < 0.08).astype(np.float32) * (1.0 - dense)
    train = sps.csr_matrix(dense)
    test = sps.csr_matrix(holdout)

    # slice axis spans the process boundary: devices are ordered
    # process-major, so slice 0 = process 0's devices, slice 1 = process 1's
    plan = make_mesh(n_slices=2, n_data=2, n_model=2)

    # -- one distributed GANMF step -------------------------------------------
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
    checksum = jax.jit(
        lambda p: jnp.sum(p.user_emb) + jnp.sum(p.item_emb),
        out_shardings=plan.replicated,
    )(params)

    # -- one sharded evaluation ------------------------------------------------
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

    # -- distributed blocked Cholesky across the process boundary --------------
    from ganmf_tpu.ops.distchol import ease_r_topk_sharded

    ev_vals, ev_idx = ease_r_topk_sharded(jnp.asarray(dense), 5.0, k=4, plan=plan, panel=8)

    print("RESULT " + json.dumps({
        "pid": pid,
        "dloss": float(dloss),
        "gloss": float(gloss),
        "checksum": float(checksum),
        "MAP": results[5]["MAP"],
        "NDCG": results[5]["NDCG"],
        "PRECISION": results[5]["PRECISION"],
        "ease_sum": float(jnp.sum(ev_vals)),
        "ease_idx_sum": int(jnp.sum(ev_idx)),
    }), flush=True)

    comm.shutdown()
    assert not comm.is_initialized()


if __name__ == "__main__":
    main()
