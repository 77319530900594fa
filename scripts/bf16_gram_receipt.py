#!/usr/bin/env python3
"""On-chip receipt for the one-pass bf16 Gram on binary data (VERDICT r3 #4).

Claim: for binary interaction matrices (every implicit-feedback URM and the
jaccard/dice/tversky families), casting the operands to bf16 and letting the
MXU accumulate in f32 produces a Gram BITWISE equal to the f32
Precision.HIGHEST (6-pass) build: 0/1 are exact in bf16, every product is
0/1, and co-rating counts stay far below 2^24. The payoff is 1/6 the MXU
passes and half the HBM scatter traffic in the streamed build.

Stages (run selectively: python scripts/bf16_gram_receipt.py [bitwise speed parity]):
  bitwise — dense and streamed Grams on synthetic binary data, HIGHEST vs
            bf16, assert jnp.array_equal on device.
  speed   — streamed ItemKNN-style Gram at the ML-20M train shape
            (138,493 x 26,744): wall time HIGHEST vs bf16.
  parity  — ItemKNN cosine + jaccard W on the reference LastFM split with
            GANMF_TPU_BF16_GRAM on/off: assert identical CSR artifacts.

Reference analogue: Compute_Similarity_Cython exists solely to make this
build fast (/root/reference/Base/Similarity/Cython/Compute_Similarity_Cython.pyx:51).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import scipy.sparse as sps


def synthetic_binary(u, i, per_row, seed=0):
    rng = np.random.RandomState(seed)
    rows = np.repeat(np.arange(u, dtype=np.int64), per_row)
    cols = rng.randint(0, i, size=u * per_row).astype(np.int64)
    mat = sps.csr_matrix((np.ones(u * per_row, np.float32), (rows, cols)), shape=(u, i))
    mat.sum_duplicates()
    mat.data[:] = 1.0
    return mat


def stage_bitwise():
    import jax
    import jax.numpy as jnp

    from ganmf_tpu.data.device import dense_from_sparse, padded_csr_from_sparse
    from ganmf_tpu.ops.similarity import _gram_streamed

    X = synthetic_binary(65536, 8192, 40)
    A = dense_from_sparse(X)
    hi = jax.lax.Precision.HIGHEST
    G_hi = jnp.dot(A.T, A, precision=hi)
    Ab = A.astype(jnp.bfloat16)
    G_bf = jnp.dot(Ab.T, Ab, preferred_element_type=jnp.float32)
    dense_equal = bool(jnp.array_equal(G_hi, G_bf))
    dense_maxdiff = float(jnp.max(jnp.abs(G_hi - G_bf)))
    print(f"dense  Gram bitwise equal: {dense_equal} (max |diff| {dense_maxdiff})", flush=True)

    pc = padded_csr_from_sparse(X)
    w = jnp.ones((X.shape[0],), jnp.float32)
    Gs_hi = _gram_streamed(pc.idx, pc.val, w, n_cols=X.shape[1], chunk=2048,
                           use_row_weights=False, bf16_ok=False)
    Gs_bf = _gram_streamed(pc.idx, pc.val, w, n_cols=X.shape[1], chunk=2048,
                           use_row_weights=False, bf16_ok=True)
    stream_equal = bool(jnp.array_equal(Gs_hi, Gs_bf))
    stream_maxdiff = float(jnp.max(jnp.abs(Gs_hi - Gs_bf)))
    print(f"stream Gram bitwise equal: {stream_equal} (max |diff| {stream_maxdiff})", flush=True)
    assert dense_equal and stream_equal, "bf16 Gram is NOT exact on binary data — reject"
    return {"dense_equal": dense_equal, "stream_equal": stream_equal}


def stage_speed():
    import jax
    import jax.numpy as jnp

    from ganmf_tpu.data.device import padded_csr_from_sparse
    from ganmf_tpu.ops.similarity import _gram_streamed

    train = sps.load_npz("experiments/datasets/20M_URM_train.npz").tocsr()
    R, C = train.shape
    chunk = 2048
    pc = padded_csr_from_sparse(train)
    pad = (-R) % chunk
    idx = jnp.concatenate([pc.idx, jnp.full((pad, pc.idx.shape[1]), C, pc.idx.dtype)]) if pad else pc.idx
    val = jnp.concatenate([pc.val, jnp.zeros((pad, pc.val.shape[1]), pc.val.dtype)]) if pad else pc.val
    w = jnp.ones((idx.shape[0],), jnp.float32)

    out = {}
    for label, bf16_ok in (("f32_HIGHEST", False), ("bf16_1pass", True)):
        def run():
            G = _gram_streamed(idx, val, w, n_cols=C, chunk=chunk,
                               use_row_weights=False, bf16_ok=bf16_ok)
            return float(G[0, 0])  # value readback = honest sync on this backend
        run()  # compile
        best = min(_timed(run) for _ in range(3))
        out[label] = best
        print(f"streamed Gram [{R}x{C}] {label:12s} {best:7.2f} s", flush=True)
    out["speedup"] = out["f32_HIGHEST"] / out["bf16_1pass"]
    print(f"speedup: {out['speedup']:.2f}x", flush=True)
    return out


def _timed(fn):
    t0 = time.time()
    fn()
    return time.time() - t0


def stage_parity():
    from ganmf_tpu.data import load_reference_splits
    from ganmf_tpu.ops.similarity import compute_similarity

    splits = load_reference_splits("LastFM")
    out = {}
    for sim in ("cosine", "jaccard"):
        ws = []
        for flag in ("0", "1"):
            os.environ["GANMF_TPU_BF16_GRAM"] = flag
            ws.append(compute_similarity(splits.train, similarity=sim, topK=300, shrink=0))
        os.environ.pop("GANMF_TPU_BF16_GRAM")
        same = (ws[0] != ws[1]).nnz == 0 and np.array_equal(ws[0].indptr, ws[1].indptr)
        out[sim] = bool(same)
        print(f"ItemKNN LastFM {sim}: W identical with/without bf16 Gram: {same}", flush=True)
        assert same, f"{sim}: bf16 Gram changed the pruned W — reject"
    return out


def main(stages):
    results = {}
    if "bitwise" in stages:
        results["bitwise"] = stage_bitwise()
    if "speed" in stages:
        results["speed"] = stage_speed()
    if "parity" in stages:
        results["parity"] = stage_parity()
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or ["bitwise", "speed", "parity"])
