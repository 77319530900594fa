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
    assert lib.cf_host_version() == 2


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


def _python_read_interactions(path, use_cols=None, delimiter=",", header=False):
    """The reference-shaped per-line parse (pre-native behavior), kept here
    as the oracle for the native OpenMP parser."""
    use_cols = use_cols or {"user_id": 0, "item_id": 1, "rating": 2}
    u_col, i_col = use_cols["user_id"], use_cols["item_id"]
    r_col = use_cols.get("rating", None)
    rows, cols, data = [], [], []
    with open(path, "r", errors="replace") as fh:
        first = True
        for line in fh:
            if first and header:
                first = False
                continue
            first = False
            line = line.strip()
            if not line:
                continue
            parts = line.split(delimiter)
            rows.append(int(parts[u_col]))
            cols.append(int(parts[i_col]))
            data.append(float(parts[r_col]) if r_col is not None and r_col < len(parts) else 1.0)
    return (np.asarray(rows, np.int64), np.asarray(cols, np.int64),
            np.asarray(data, np.float32))


@pytest.mark.parametrize("delim,header", [(",", True), ("::", False), ("\t", False)])
def test_native_parse_matches_python(tmp_path, delim, header):
    from ganmf_tpu.ops.host import get_lib, parse_interactions_file

    if get_lib() is None:
        pytest.skip("native library unavailable")
    rng = np.random.RandomState(42)
    lines = []
    if header:
        lines.append(delim.join(["userId", "movieId", "rating", "timestamp"]))
    for _ in range(500):
        u, i = rng.randint(1, 900), rng.randint(1, 400)
        r = rng.choice([0.5, 1.0, 2.5, 3.0, 4.5, 5.0])
        lines.append(delim.join([str(u), str(i), str(r), str(rng.randint(1e9))]))
    lines.insert(5, "")  # empty line mid-file
    lines.append("   ")  # whitespace-only line
    path = tmp_path / "ratings.dat"
    path.write_text("\n".join(lines) + "\n")

    got = parse_interactions_file(str(path), delimiter=delim, header=header)
    ref = _python_read_interactions(str(path), delimiter=delim, header=header)
    for g, r in zip(got, ref):
        np.testing.assert_array_equal(g, r)

    # no trailing newline + no rating column
    path2 = tmp_path / "pairs.csv"
    path2.write_bytes(b"3,7\n9,2,\n5,5")
    got2 = parse_interactions_file(str(path2), delimiter=",",
                                   use_cols={"user_id": 0, "item_id": 1})
    ref2 = _python_read_interactions(str(path2), delimiter=",",
                                     use_cols={"user_id": 0, "item_id": 1})
    for g, r in zip(got2, ref2):
        np.testing.assert_array_equal(g, r)


@pytest.mark.parametrize("keep", ["first", "last"])
def test_vectorized_dedup_matches_dict(keep):
    """_dedup's vectorized implementation reproduces the reference's dict
    pass exactly: first-occurrence output order, keep='last' placing the
    last duplicate's value at the first occurrence's position."""
    from ganmf_tpu.data.reader import _dedup

    rng = np.random.RandomState(7)
    n = 3000
    rows = rng.randint(0, 40, n).astype(np.int64)
    cols = rng.randint(0, 30, n).astype(np.int64)
    data = rng.rand(n).astype(np.float32)

    seen = {}
    for idx in range(n):
        key = (rows[idx], cols[idx])
        if keep == "first":
            if key not in seen:
                seen[key] = idx
        else:
            seen[key] = idx
    ref_idx = np.fromiter(seen.values(), dtype=np.int64)

    r, c, d = _dedup(rows, cols, data, keep=keep)
    np.testing.assert_array_equal(r, rows[ref_idx])
    np.testing.assert_array_equal(c, cols[ref_idx])
    np.testing.assert_array_equal(d, data[ref_idx])

    # empty input passes through
    e = np.array([], dtype=np.int64)
    out = _dedup(e, e, np.array([], np.float32), keep=keep)
    assert all(len(x) == 0 for x in out)
