"""Native host-engine tests (C++ kernels vs numpy ground truth)."""

import numpy as np
import pytest

from ganmf_tpu.ops import host
from tests.conftest import random_urm


@pytest.fixture(scope="module")
def urm():
    return random_urm(50, 70, density=0.25, seed=4)


def test_native_library_builds():
    lib = host.get_lib()
    assert lib is not None, "native cf_host library failed to build"
    assert lib.cf_host_version() == 1


def test_csr_gather_dense_matches_scipy(urm):
    rows = np.array([0, 3, 3, 49, 17])
    got = host.csr_gather_dense(urm, rows)
    expected = np.asarray(urm[rows].todense(), dtype=np.float32)
    np.testing.assert_array_equal(got, expected)


def test_non_interactions(urm):
    out = host.get_non_interactions(urm)
    csr = urm.tocsr()
    for u in [0, 7, 49]:
        seen = set(csr.indices[csr.indptr[u]: csr.indptr[u + 1]].tolist())
        assert set(out[u].tolist()) == set(range(urm.shape[1])) - seen


def test_sample_negative_mask(urm):
    ratio = 0.3
    mask = host.sample_negative_mask(urm, ratio, seed=9)
    csr = urm.tocsr()
    dense = np.asarray(urm.todense())
    for u in range(urm.shape[0]):
        n_zeros = urm.shape[1] - (csr.indptr[u + 1] - csr.indptr[u])
        assert mask[u].sum() == int(n_zeros * ratio)
        # never samples an interaction
        assert not np.any(mask[u][dense[u] > 0])
    # deterministic under seed, different across seeds
    np.testing.assert_array_equal(mask, host.sample_negative_mask(urm, ratio, seed=9))
    assert np.any(mask != host.sample_negative_mask(urm, ratio, seed=10))


def test_random_choice_cdf_distribution():
    probs = np.array([[0.0, 0.5, 0.0, 0.5], [1.0, 0.0, 0.0, 0.0]], np.float32)
    cdf = np.cumsum(probs, axis=1)
    rows = np.array([0] * 4000 + [1] * 100, np.int32)
    draws = host.random_choice_cdf(cdf, rows, seed=1)
    row0 = draws[:4000]
    assert set(np.unique(row0)) <= {1, 3}
    assert abs((row0 == 1).mean() - 0.5) < 0.05
    assert np.all(draws[4000:] == 0)


def test_shuffled_interactions(urm):
    users, items = host.shuffled_interactions(urm, seed=3)
    assert len(users) == urm.nnz
    coo = urm.tocoo()
    got = set(zip(users.tolist(), items.tolist()))
    expected = set(zip(coo.row.tolist(), coo.col.tolist()))
    assert got == expected
    # actually shuffled
    assert not np.array_equal(users, np.sort(users, kind="stable"))


def test_tiled_topk_matches_full():
    """tiled_topk == lax.top_k, including cross-tile tie-breaking."""
    import jax
    import jax.numpy as jnp

    from ganmf_tpu.ops.topk import tiled_topk

    rng = np.random.RandomState(0)
    w = rng.randn(7, 1000).astype(np.float32)
    # inject exact ties straddling tile boundaries
    w[0, 5] = w[0, 305] = w[0, 990] = 3.25
    w[3, :] = 1.0
    ref_v, ref_i = jax.lax.top_k(jnp.asarray(w), 13)
    v, i = tiled_topk(jnp.asarray(w), 13, tile=256)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ref_i))
    np.testing.assert_allclose(np.asarray(v), np.asarray(ref_v))
    # k > tile still exact
    v, i = tiled_topk(jnp.asarray(w), 300, tile=256)
    ref_v, ref_i = jax.lax.top_k(jnp.asarray(w), 300)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ref_i))


def test_dense_from_sparse_matches_todense():
    import scipy.sparse as sps

    from ganmf_tpu.data.device import dense_from_sparse

    rng = np.random.RandomState(1)
    m = sps.random(50, 700, density=0.05, random_state=rng, format="csr", dtype=np.float32)
    out = np.asarray(dense_from_sparse(m))
    np.testing.assert_allclose(out, np.asarray(m.todense()), rtol=1e-6)
