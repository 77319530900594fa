"""Smoke + behavior tests for every recommender on small synthetic data."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sps

from ganmf_tpu.eval import EvaluatorHoldout
from ganmf_tpu.models import (
    CAAE,
    CFGAN,
    GANMF,
    DisGANMF,
    IALSRecommender,
    ItemKNNCFRecommender,
    P3alphaRecommender,
    PureSVDRecommender,
    SLIM_BPR,
    TopPop,
)
from ganmf_tpu.models.itemknn import UserKNNCFRecommender
from ganmf_tpu.models.p3alpha import RP3betaRecommender
from ganmf_tpu.models.toppop import GlobalEffects


def _map_at5(model, test):
    results, _ = EvaluatorHoldout(test, [5]).evaluateRecommender(model)
    return results[5]["MAP"]


def test_toppop_scores_and_ranking(urm_pair):
    train, test = urm_pair
    model = TopPop(train)
    model.fit()
    pop = np.ediff1d(train.tocsc().indptr)
    ranked = model.recommend(0, cutoff=5, remove_seen_flag=False)
    expected = np.argsort(-pop, kind="stable")[:5]
    assert list(ranked) == list(expected)
    assert _map_at5(model, test) > 0


def test_recommend_removes_seen(urm_pair):
    train, _ = urm_pair
    model = TopPop(train)
    model.fit()
    seen = set(train.indices[train.indptr[3] : train.indptr[4]])
    recs = model.recommend(3, cutoff=20, remove_seen_flag=True)
    assert not (set(recs) & seen)


def test_puresvd_reconstructs_low_rank(urm_pair):
    train, test = urm_pair
    model = PureSVDRecommender(train)
    model.fit(num_factors=8)
    assert model.USER_factors.shape == (train.shape[0], 8)
    # low-rank recon should beat popularity on its own train-derived test
    assert _map_at5(model, test) > 0


def test_ials_improves_over_epochs(urm_pair):
    train, test = urm_pair
    model = IALSRecommender(train)
    model.fit(epochs=3, num_factors=8, alpha=5.0, reg=1e-3)
    baseline = TopPop(train)
    baseline.fit()
    assert _map_at5(model, test) >= _map_at5(baseline, test) * 0.5


def test_itemknn_all_similarities(urm_pair):
    train, test = urm_pair
    for sim in ["cosine", "jaccard", "dice", "tversky", "asymmetric", "euclidean"]:
        model = ItemKNNCFRecommender(train)
        model.fit(topK=10, shrink=0, similarity=sim, normalize=True)
        assert model.W_sparse.shape == (train.shape[1], train.shape[1])
        assert model.W_sparse.nnz > 0
        # no self-similarity
        assert np.all(model.W_sparse.diagonal() == 0)
        assert np.isfinite(_map_at5(model, test))


def test_itemknn_cosine_matches_numpy(urm_pair):
    """Dense numpy cosine check of the device similarity kernel."""
    train, _ = urm_pair
    model = ItemKNNCFRecommender(train)
    topk = train.shape[1]  # no pruning
    model.fit(topK=topk, shrink=0, similarity="cosine", normalize=True)
    A = np.asarray(train.todense(), np.float64)
    G = A.T @ A
    norms = np.sqrt((A**2).sum(axis=0))
    den = norms[:, None] * norms[None, :] + 1e-6
    expected = G / den
    np.fill_diagonal(expected, 0.0)
    got = np.asarray(model.W_sparse.todense())
    assert np.allclose(got, expected, atol=1e-4)


def test_p3alpha_and_rp3beta(urm_pair):
    train, test = urm_pair
    for cls, kwargs in [(P3alphaRecommender, dict(alpha=0.8)), (RP3betaRecommender, dict(alpha=0.8, beta=0.4))]:
        model = cls(train)
        model.fit(topK=15, normalize_similarity=True, **kwargs)
        assert model.W_sparse.nnz > 0
        assert np.isfinite(_map_at5(model, test))


def test_slim_bpr_learns(urm_pair):
    train, test = urm_pair
    model = SLIM_BPR(train)
    model.fit(epochs=30, topK=20, learning_rate=0.05, sgd_mode="adagrad", symmetric=True, chunk_size=32)
    assert model.W_sparse.nnz > 0
    assert _map_at5(model, test) > 0


def test_ganmf_trains_and_scores(urm_pair):
    train, test = urm_pair
    model = GANMF(train, mode="user", seed=42)
    last_epoch = model.fit(num_factors=8, emb_dim=16, epochs=4, batch_size=16, d_lr=1e-3, g_lr=1e-3)
    assert last_epoch == 5  # reference returns epochs + 1 when not early-stopped
    scores = model._compute_item_score(np.arange(5))
    assert scores.shape == (5, train.shape[1])
    assert np.isfinite(scores).all()
    assert np.isfinite(_map_at5(model, test))


def test_ganmf_item_mode(urm_pair):
    train, test = urm_pair
    model = GANMF(train, mode="item", seed=42)
    model.fit(num_factors=8, emb_dim=16, epochs=2, batch_size=16)
    scores = model._compute_item_score(np.arange(3))
    assert scores.shape == (3, train.shape[1])


def test_ganmf_early_stopping(urm_pair):
    train, test = urm_pair
    ev = EvaluatorHoldout(test, [5])
    model = GANMF(train, mode="user", seed=42)
    last = model.fit(
        num_factors=8, emb_dim=16, epochs=50, batch_size=16,
        allow_worse=1, freq=2, validation_evaluator=ev,
    )
    assert last <= 51
    assert model.best_params is not None


def test_disganmf(urm_pair):
    train, test = urm_pair
    model = DisGANMF(train, mode="user", seed=1)
    model.fit(num_factors=8, d_layers=2, d_nodes=16, d_hidden_act="tanh", epochs=3, batch_size=16)
    assert np.isfinite(_map_at5(model, test))


@pytest.mark.parametrize("scheme", ["ZR", "PM", "ZP"])
def test_cfgan_schemes(urm_pair, scheme):
    train, test = urm_pair
    model = CFGAN(train, mode="user", seed=1)
    model.fit(
        d_nodes=16, g_nodes=16, d_layers=1, g_layers=1, scheme=scheme,
        g_hidden_act="sigmoid", epochs=2, d_batch_size=16, g_batch_size=16,
        zr_ratio=0.3, zp_ratio=0.3, zr_coefficient=0.1,
    )
    assert np.isfinite(_map_at5(model, test))


def test_cfgan_item_mode(urm_pair):
    train, test = urm_pair
    model = CFGAN(train, mode="item", seed=1)
    model.fit(d_nodes=8, g_nodes=8, epochs=2, d_batch_size=16, g_batch_size=16, scheme="PM", zp_ratio=0.2)
    scores = model._compute_item_score(np.arange(4))
    assert scores.shape == (4, train.shape[1])


def test_caae(urm_pair):
    train, test = urm_pair
    model = CAAE(train, seed=1)
    model.fit(epochs=2, d_steps=1, g_steps=2, gpr_steps=2, g_layers=1, g_units=16,
              num_factors=8, d_bsize=64, m_batch=8, lr=1e-3)
    assert np.isfinite(_map_at5(model, test))


def test_caae_dedup_scatter_matches_direct(urm_pair):
    """d_scatter='dedup' (sorted index streams, conflict-free
    unique_indices scatters) follows the same D-phase trajectory as the
    serialized-duplicate 'direct' scatter, up to f32 run-summation order."""
    train, _ = urm_pair
    kwargs = dict(epochs=2, d_steps=2, g_steps=1, gpr_steps=1, g_layers=1,
                  g_units=16, num_factors=8, d_bsize=32, m_batch=8, lr=1e-2)
    direct = CAAE(train, seed=1)
    direct.fit(d_scatter="direct", **kwargs)
    dedup = CAAE(train, seed=1)
    dedup.fit(d_scatter="dedup", **kwargs)
    np.testing.assert_allclose(
        np.asarray(dedup.params.d_user_emb), np.asarray(direct.params.d_user_emb),
        rtol=1e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(dedup.params.d_item_bias), np.asarray(direct.params.d_item_bias),
        rtol=1e-4, atol=1e-6,
    )


def test_userknn_and_globaleffects(urm_pair):
    train, test = urm_pair
    uk = UserKNNCFRecommender(train)
    uk.fit(topK=10, shrink=0, similarity="cosine")
    assert np.isfinite(_map_at5(uk, test))
    ge = GlobalEffects(train)
    ge.fit()
    assert np.isfinite(_map_at5(ge, test))


def test_save_load_roundtrip(tmp_path, urm_pair):
    train, test = urm_pair
    model = PureSVDRecommender(train)
    model.fit(num_factors=6)
    model.saveModel(str(tmp_path))
    fresh = PureSVDRecommender(train)
    fresh.loadModel(str(tmp_path))
    a = model._compute_item_score(np.arange(4))
    b = fresh._compute_item_score(np.arange(4))
    assert np.allclose(a, b)


@pytest.mark.parametrize("model_name", ["GANMF", "DisGANMF"])
def test_ganmf_streamed_urm_matches_dense(urm_pair, model_name):
    """urm_storage='csr' (padded-CSR in HBM, per-batch scatter densify)
    reproduces the dense-URM training run and evaluation exactly."""
    from ganmf_tpu.eval import EvaluatorHoldout
    from ganmf_tpu.models import GANMF, DisGANMF

    train, test = urm_pair
    if model_name == "GANMF":
        cls, kwargs = GANMF, dict(num_factors=4, emb_dim=8, epochs=3, batch_size=16)
    else:
        cls, kwargs = DisGANMF, dict(num_factors=4, d_nodes=8, epochs=3, batch_size=16)

    dense = cls(train, seed=7)
    dense.fit(**kwargs)
    streamed = cls(train, seed=7)
    streamed.fit(urm_storage="csr", **kwargs)

    for got, want in zip(
        jax.tree_util.tree_leaves(streamed.params), jax.tree_util.tree_leaves(dense.params)
    ):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-7)

    ev = EvaluatorHoldout(test, [5])
    res_d, _ = ev.evaluateRecommender(dense)
    res_s, _ = ev.evaluateRecommender(streamed)
    assert res_s[5]["MAP"] == pytest.approx(res_d[5]["MAP"], abs=1e-9)
    assert res_s[5]["NDCG"] == pytest.approx(res_d[5]["NDCG"], abs=1e-9)


def test_ganmf_bf16_compute_dtype(urm_pair):
    """compute_dtype='bf16' trains with bf16 matmuls over f32 master params
    and lands near the f32 run (exactness is not expected — bf16 has ~3
    decimal digits); params stay f32 and metrics stay finite."""
    from ganmf_tpu.eval import EvaluatorHoldout
    from ganmf_tpu.models import GANMF

    train, test = urm_pair
    kwargs = dict(num_factors=4, emb_dim=8, epochs=5, batch_size=16)
    f32 = GANMF(train, seed=3)
    f32.fit(**kwargs)
    b16 = GANMF(train, seed=3)
    b16.fit(compute_dtype="bf16", **kwargs)

    assert b16.params.user_emb.dtype == jnp.float32  # master params stay f32
    # early in training the trajectories track within bf16 resolution
    np.testing.assert_allclose(
        np.asarray(b16.params.user_emb), np.asarray(f32.params.user_emb),
        rtol=0.1, atol=5e-3,
    )
    res, _ = EvaluatorHoldout(test, [5]).evaluateRecommender(b16)
    assert np.isfinite(res[5]["MAP"])

    # streamed storage composes with bf16
    s16 = GANMF(train, seed=3)
    s16.fit(compute_dtype="bf16", urm_storage="csr", **kwargs)
    np.testing.assert_allclose(
        np.asarray(s16.params.user_emb), np.asarray(b16.params.user_emb),
        rtol=1e-5, atol=1e-7,
    )


@pytest.mark.parametrize("model_name", ["disganmf", "cfgan"])
def test_adversarial_bf16_compute_dtype(urm_pair, model_name):
    """bf16 epoch programs for the other two dense-URM GANs: f32 master
    params, trajectories near the f32 run, finite metrics."""
    from ganmf_tpu.eval import EvaluatorHoldout
    from ganmf_tpu.models import CFGAN, DisGANMF

    train, test = urm_pair
    if model_name == "disganmf":
        mk = lambda: DisGANMF(train, seed=3)
        kwargs = dict(num_factors=4, d_layers=1, d_nodes=8, epochs=5, batch_size=16)
        leaf = lambda m: m.params.user_emb
    else:
        mk = lambda: CFGAN(train, seed=3)
        kwargs = dict(d_nodes=8, g_nodes=8, scheme="ZP", zr_ratio=0.3,
                      zp_ratio=0.3, zr_coefficient=0.1, epochs=5,
                      d_batch_size=16, g_batch_size=16, allow_worse=None, freq=None)
        leaf = lambda m: m.params.G.ws[0]

    f32 = mk()
    f32.fit(**kwargs)
    b16 = mk()
    b16.fit(compute_dtype="bf16", **kwargs)

    assert leaf(b16).dtype == jnp.float32  # master params stay f32
    np.testing.assert_allclose(
        np.asarray(leaf(b16)), np.asarray(leaf(f32)), rtol=0.1, atol=5e-3,
    )
    res, _ = EvaluatorHoldout(test, [5]).evaluateRecommender(b16)
    assert np.isfinite(res[5]["MAP"])


def test_disganmf_bf16_keeps_user_ids_distinct():
    """The raw-user-id conditioning column must not be quantized by bf16:
    ids 4097 and 4099 collapse to the same bfloat16 value, but the
    discriminator must still tell them apart (f32 rank-1 id path)."""
    from ganmf_tpu.models.disganmf import ACTIVATIONS, DisGANMFParams, _discriminate

    rng = np.random.RandomState(0)
    I, H = 12, 6
    p = DisGANMFParams(
        user_emb=jnp.zeros((1, 2)), item_emb=jnp.zeros((I, 2)),
        d_ws=(jnp.asarray(rng.randn(I + 1, H), jnp.float32),),
        d_bs=(jnp.zeros((H,), jnp.float32),),
        out_w=jnp.asarray(rng.randn(H, 1), jnp.float32),
        out_b=jnp.zeros((1,), jnp.float32),
    )
    x = jnp.asarray(rng.rand(2, I), jnp.float32)
    x = jnp.stack([x[0], x[0]])  # identical profiles, different ids
    uids = jnp.asarray([4097, 4099], jnp.int32)
    assert jnp.asarray(4097, jnp.bfloat16) == jnp.asarray(4099, jnp.bfloat16)

    pc = jax.tree_util.tree_map(lambda t: t.astype(jnp.bfloat16), p)
    _, out = _discriminate(pc, uids, x.astype(jnp.bfloat16), ACTIVATIONS["linear"])
    assert float(out[0, 0]) != float(out[1, 0])


def test_caae_cdf_sampler_distribution():
    """The inverse-CDF binary-search sampler draws from the exact softmax
    distribution (reference cython_utils.pyx:74-104 semantics)."""
    from ganmf_tpu.models.caae import _cdf_sample

    n_items = 7
    logits = jnp.asarray(np.random.RandomState(0).randn(3, n_items).astype(np.float32))
    p = np.asarray(jax.nn.softmax(logits, axis=1))
    cdf = jnp.cumsum(jnp.asarray(p), axis=1)
    for row, seed in [(0, 1), (2, 2)]:
        rows = jnp.full(100000, row, jnp.int32)
        s = np.asarray(_cdf_sample(cdf, rows, jax.random.PRNGKey(seed), n_items))
        emp = np.bincount(s, minlength=n_items) / len(s)
        np.testing.assert_allclose(emp, p[row], atol=0.01)


def test_caae_bucketed_sampler_distribution():
    """The two-level bucketed inverse-CDF sampler draws from the exact
    per-row categorical distribution, including across bucket boundaries."""
    from ganmf_tpu.models.caae import _bucketed_cdf_sample, _bucketed_cdf_tables

    n_cols, nb = 11, 4  # padded final bucket exercises the zero-prob tail
    logits = jnp.asarray(np.random.RandomState(1).randn(2, n_cols).astype(np.float32))
    p = np.asarray(jax.nn.softmax(logits, axis=1))
    bcdf, wcdf = _bucketed_cdf_tables(jnp.asarray(p), nb)
    for row, seed in [(0, 3), (1, 4)]:
        rows = jnp.full(200000, row, jnp.int32)
        s = np.asarray(_bucketed_cdf_sample(bcdf, wcdf, rows, jax.random.PRNGKey(seed), nb, n_cols))
        assert s.max() < n_cols
        emp = np.bincount(s, minlength=n_cols) / len(s)
        np.testing.assert_allclose(emp, p[row], atol=0.01)


def test_p3alpha_device_prune_matches_host_path(urm_pair):
    """The fused device walk+double-prune equals the old host sequence
    (row top-K -> optional L1 row normalize -> column similarityMatrixTopK)."""
    from sklearn.preprocessing import normalize as sk_normalize

    from ganmf_tpu.models.base import similarity_matrix_topk
    from ganmf_tpu.models.p3alpha import P3alphaRecommender

    train, _ = urm_pair
    # random float ratings: a binary URM yields exactly-tied walk weights,
    # where argpartition and tiled selection legitimately pick different
    # (equal-valued) winners
    train = train.copy()
    train.data = (0.5 + np.random.RandomState(11).rand(train.nnz)).astype(np.float32)
    for norm in (False, True):
        model = P3alphaRecommender(train)
        model.fit(topK=5, alpha=0.8, normalize_similarity=norm)

        # host oracle
        Pui = sk_normalize(train, norm="l1", axis=1).power(0.8)
        Xb = train.transpose(copy=True)
        Xb.data = np.ones(Xb.data.size, np.float32)
        Piu = sk_normalize(Xb, norm="l1", axis=1).power(0.8)
        W = np.asarray((Piu @ Pui).todense(), dtype=np.float32)
        np.fill_diagonal(W, 0.0)
        # row-wise top-5 over nonzeros
        key = np.where(W != 0, W, -np.inf)
        drop = np.argsort(-key, axis=1)[:, 5:]
        np.put_along_axis(W, drop, 0.0, axis=1)
        if norm:
            W = np.asarray(sk_normalize(sps.csr_matrix(W), norm="l1", axis=1).todense())
        want = np.asarray(similarity_matrix_topk(sps.csr_matrix(W), k=5).todense())
        np.testing.assert_allclose(model.W_sparse.toarray(), want, rtol=1e-5, atol=1e-6)


def test_userknn_device_scoring_matches_host(urm_pair):
    """UserSimilarityRecommender's dense-HBM scoring equals the host sparse
    W[u] @ URM product."""
    train, _ = urm_pair
    uk = UserKNNCFRecommender(train)
    uk.fit(topK=5, shrink=0)
    uids = jnp.asarray([0, 3, 7], jnp.int32)
    got = np.asarray(uk.score_device(uids))
    want = uk.W_sparse[np.asarray(uids)].dot(train).toarray().astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_cfgan_streamed_urm(urm_pair):
    """CFGAN urm_storage='csr': with no mask sampling the streamed run
    reproduces the dense run exactly; with ZP masks it is deterministic and
    trains to finite metrics (the mask RNG stream differs from the dense
    path by construction — per-user folded keys vs one full-matrix draw)."""
    from ganmf_tpu.eval import EvaluatorHoldout
    from ganmf_tpu.models import CFGAN

    train, test = urm_pair
    nomask = dict(d_nodes=8, g_nodes=8, scheme="ZR", zr_ratio=0.0,
                  zr_coefficient=0.0, epochs=3, d_batch_size=16, g_batch_size=16,
                  allow_worse=None, freq=None)

    dense = CFGAN(train, seed=7)
    dense.fit(**nomask)
    streamed = CFGAN(train, seed=7)
    streamed.fit(urm_storage="csr", **nomask)
    for got, want in zip(
        jax.tree_util.tree_leaves(streamed.params), jax.tree_util.tree_leaves(dense.params)
    ):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-7)
    ev = EvaluatorHoldout(test, [5])
    res_d, _ = ev.evaluateRecommender(dense)
    res_s, _ = ev.evaluateRecommender(streamed)
    assert res_s[5]["MAP"] == pytest.approx(res_d[5]["MAP"], abs=1e-9)

    masked = dict(d_nodes=8, g_nodes=8, scheme="ZP", zr_ratio=0.3, zp_ratio=0.3,
                  zr_coefficient=0.1, epochs=3, d_batch_size=16, g_batch_size=16,
                  allow_worse=None, freq=None)
    a = CFGAN(train, seed=11)
    a.fit(urm_storage="csr", **masked)
    b = CFGAN(train, seed=11)
    b.fit(urm_storage="csr", **masked)
    for ga, gb in zip(jax.tree_util.tree_leaves(a.params), jax.tree_util.tree_leaves(b.params)):
        np.testing.assert_array_equal(np.asarray(ga), np.asarray(gb))
    res, _ = ev.evaluateRecommender(a)
    assert np.isfinite(res[5]["MAP"])


def test_cfgan_streamed_item_mode(urm_pair):
    """Streamed CFGAN in item mode serves via chunked generator columns:
    matches the dense item-mode run exactly on an unmasked config."""
    from ganmf_tpu.models import CFGAN

    train, _ = urm_pair
    kwargs = dict(d_nodes=8, g_nodes=8, scheme="ZR", zr_ratio=0.0,
                  zr_coefficient=0.0, epochs=2, d_batch_size=16, g_batch_size=16,
                  allow_worse=None, freq=None)
    dense = CFGAN(train, mode="item", seed=5)
    dense.fit(**kwargs)
    streamed = CFGAN(train, mode="item", seed=5)
    streamed.fit(urm_storage="csr", **kwargs)
    uids = np.arange(train.shape[0])
    np.testing.assert_allclose(
        np.asarray(streamed.score_device(uids)),
        np.asarray(dense.score_device(uids)),
        rtol=1e-5, atol=1e-6,
    )


def test_cfgan_streamed_composes_with_bf16(urm_pair):
    """urm_storage='csr' + compute_dtype='bf16' on CFGAN: both flags steer
    the same epoch program; the combination trains deterministically to
    finite metrics with f32 master params."""
    from ganmf_tpu.eval import EvaluatorHoldout
    from ganmf_tpu.models import CFGAN

    train, test = urm_pair
    kwargs = dict(d_nodes=8, g_nodes=8, scheme="ZP", zr_ratio=0.3, zp_ratio=0.3,
                  zr_coefficient=0.1, epochs=3, d_batch_size=16, g_batch_size=16,
                  allow_worse=None, freq=None, urm_storage="csr", compute_dtype="bf16")
    a = CFGAN(train, seed=13)
    a.fit(**kwargs)
    b = CFGAN(train, seed=13)
    b.fit(**kwargs)
    assert a.params.G.ws[0].dtype == jnp.float32
    for ga, gb in zip(jax.tree_util.tree_leaves(a.params), jax.tree_util.tree_leaves(b.params)):
        np.testing.assert_array_equal(np.asarray(ga), np.asarray(gb))
    res, _ = EvaluatorHoldout(test, [5]).evaluateRecommender(a)
    assert np.isfinite(res[5]["MAP"])


def test_device_authoritative_w_matches_host_csr_path():
    """ItemKNN/UserKNN/P3alpha/RP3beta/EASE-R adopt a device-resident W
    when it fits HBM; scoring and the lazily-materialized W_sparse must be
    identical to the host-CSR build the export replaces."""
    import scipy.sparse as sps

    from ganmf_tpu.models.extras import EASE_R_Recommender
    from ganmf_tpu.ops.similarity import compute_similarity

    from tests.conftest import random_urm

    train = random_urm(45, 70, density=0.25, seed=21)
    users = np.arange(45)

    for cls, kwargs in [
        (ItemKNNCFRecommender, dict(topK=9, shrink=0)),
        (UserKNNCFRecommender, dict(topK=9, shrink=0)),
        (P3alphaRecommender, dict(topK=9, alpha=0.8)),
        (RP3betaRecommender, dict(topK=9, alpha=0.8, beta=0.4)),
        (EASE_R_Recommender, dict(topK=9, l2_norm=10.0)),
    ]:
        dev_model = cls(train)
        dev_model.fit(**kwargs)
        assert dev_model._device_w is not None and dev_model._device_w is not False, cls.__name__

        host_model = cls(train)
        limit = cls._DENSE_W_BYTE_LIMIT
        try:
            cls._DENSE_W_BYTE_LIMIT = 0  # force the host CSR export path
            host_model.fit(**kwargs)
        finally:
            cls._DENSE_W_BYTE_LIMIT = limit
        assert host_model._W_sparse_store is not None, cls.__name__

        np.testing.assert_array_equal(
            dev_model.W_sparse.toarray(), host_model.W_sparse.toarray(), err_msg=cls.__name__
        )
        np.testing.assert_allclose(
            np.asarray(dev_model.score_device(users)),
            np.asarray(host_model.score_device(users)),
            rtol=0, atol=1e-6, err_msg=cls.__name__,
        )


def test_save_load_roundtrip_device_authoritative_w(tmp_path, urm_pair):
    """saveModel on a device-authoritative W lazily materializes the host
    CSR; a fresh model loads it and scores identically (both KNN
    orientations). recommend_fused falls back to recommend() when the W
    cannot be device-resident."""
    train, _ = urm_pair
    users = np.arange(6)

    for cls in (ItemKNNCFRecommender, UserKNNCFRecommender):
        model = cls(train)
        model.fit(topK=8, shrink=0)
        assert model._W_sparse_store is None  # still device-authoritative
        folder = str(tmp_path / cls.__name__) + "/"
        model.saveModel(folder)
        fresh = cls(train)
        fresh.loadModel(folder, file_name=cls.RECOMMENDER_NAME)
        np.testing.assert_allclose(
            np.asarray(model.score_device(users)),
            np.asarray(fresh.score_device(users)),
            rtol=0, atol=0,
        )

    # fallback: no device residency -> recommend_fused == recommend via fallback
    model = ItemKNNCFRecommender(train)
    limit = ItemKNNCFRecommender._DENSE_W_BYTE_LIMIT
    try:
        ItemKNNCFRecommender._DENSE_W_BYTE_LIMIT = 0
        model.fit(topK=8, shrink=0)
        assert model.recommend_fused(users, cutoff=5) == model.recommend(users, cutoff=5)
    finally:
        ItemKNNCFRecommender._DENSE_W_BYTE_LIMIT = limit


def test_itemknn_cbf_matches_numpy_cosine(urm_pair, tmp_path):
    """ItemKNNCBF builds W from the ICM, not the URM: check against a dense
    numpy cosine over ICM rows and confirm scoring uses the standard
    URM[u] @ W path (reference KNN/ItemKNNCBFRecommender.py)."""
    from ganmf_tpu.models import ItemKNNCBFRecommender

    train, test = urm_pair
    n_items = train.shape[1]
    rng = np.random.RandomState(3)
    icm = sps.csr_matrix((rng.rand(n_items, 25) < 0.2).astype(np.float32))

    model = ItemKNNCBFRecommender(icm, train)
    model.fit(topK=n_items, shrink=0, similarity="cosine", normalize=True)

    A = np.asarray(icm.todense(), np.float64)  # [I, F]; cosine over rows
    G = A @ A.T
    norms = np.sqrt((A**2).sum(axis=1))
    expected = G / (norms[:, None] * norms[None, :] + 1e-6)
    np.fill_diagonal(expected, 0.0)
    got = np.asarray(model.W_sparse.todense())
    assert np.allclose(got, expected, atol=1e-4)
    assert np.isfinite(_map_at5(model, test))

    # feature weighting paths run and change W
    for fw in ["BM25", "TF-IDF"]:
        m2 = ItemKNNCBFRecommender(icm, train)
        m2.fit(topK=10, shrink=0, similarity="cosine", feature_weighting=fw)
        assert m2.W_sparse.nnz > 0

    # shape guard
    with pytest.raises(ValueError):
        ItemKNNCBFRecommender(icm[: n_items - 1], train)


def test_icm_ingestion(tmp_path):
    """read_item_features + build_icm parse a movies.dat-style file into an
    ICM aligned with the URM item reindex map."""
    from ganmf_tpu.data import build_icm, read_item_features

    path = tmp_path / "movies.dat"
    path.write_text(
        "1::Toy Story (1995)::Animation|Children's|Comedy\n"
        "2::Jumanji (1995)::Adventure|Children's|Fantasy\n"
        "5::Father of the Bride (1995)::Comedy\n"
        "9::Sudden Death (1995)::Action\n"
    )
    item_ids, tokens = read_item_features(str(path))
    assert len(item_ids) == len(tokens) == 8

    # URM kept items 1, 2, 5 (9 was k-core filtered out)
    col_to_item = {1: 0, 2: 1, 5: 2}
    icm, feat_to_col = build_icm(item_ids, tokens, col_to_item)
    assert icm.shape == (3, len(set(tokens)))
    assert sorted(feat_to_col) == sorted(set(tokens))
    # Toy Story has 3 features, Father of the Bride 1; filtered item dropped
    assert icm[0].nnz == 3 and icm[2].nnz == 1
    assert icm[0, feat_to_col["Comedy"]] == 1.0 == icm[2, feat_to_col["Comedy"]]
