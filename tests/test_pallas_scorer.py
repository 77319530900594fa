import numpy as np
import pytest

import jax.numpy as jnp

from ganmf_tpu.ops.pallas_scorer import masked_topk_scores


@pytest.mark.parametrize("I", [64, 96])  # non-multiple exercises tile padding
def test_masked_topk_matches_dense(I):
    rng = np.random.RandomState(0)
    B, K, k = 8, 16, 5
    U = rng.randn(B, K).astype(np.float32)
    V = rng.randn(I, K).astype(np.float32)
    mask = (rng.rand(B, I) < 0.2).astype(np.int8)

    vals, idx = masked_topk_scores(
        jnp.asarray(U), jnp.asarray(V), jnp.asarray(mask), k=k, tile=32, interpret=True
    )
    scores = U @ V.T
    scores[mask.astype(bool)] = -np.inf
    ref_idx = np.argsort(-scores, axis=1)[:, :k]
    np.testing.assert_allclose(
        np.asarray(vals), np.take_along_axis(scores, ref_idx, axis=1), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)


def test_recommend_fused_matches_recommend(urm_pair):
    from ganmf_tpu.models import PureSVDRecommender

    train, _ = urm_pair
    model = PureSVDRecommender(train)
    model.fit(num_factors=6)
    users = np.arange(10)
    regular = model.recommend(users, cutoff=7, remove_seen_flag=True)
    fused = model.recommend_fused(users, cutoff=7, remove_seen_flag=True, tile=16)
    assert fused == regular


def test_recommend_fused_similarity_matches_recommend(urm_pair):
    """The similarity-family device serving path returns identical lists to
    the reference-shaped recommend() (same scores, same tie resolution);
    models without device operands fall back to recommend()."""
    import numpy as np

    from ganmf_tpu.models import ItemKNNCFRecommender, TopPop
    from ganmf_tpu.models.itemknn import UserKNNCFRecommender

    train, _ = urm_pair
    users = np.arange(train.shape[0])

    for model in (ItemKNNCFRecommender(train), UserKNNCFRecommender(train)):
        model.fit(topK=9, shrink=0)
        ref = model.recommend(users, cutoff=7, remove_seen_flag=True)
        fused = model.recommend_fused(users, cutoff=7, remove_seen_flag=True)
        assert fused == ref, type(model).__name__

    tp = TopPop(train)
    tp.fit()
    assert tp.recommend_fused(users[:5], cutoff=7) == tp.recommend(users[:5], cutoff=7)


def test_split_plane_serving_gate(urm_pair, monkeypatch):
    """The split-bf16-plane scoring path only engages above the catalog-size
    gate (base._SIM_SPLIT_MIN_ITEMS): it is a different — equally valid —
    f32 rounding of the same real scores, so exact f64 ties (common in
    binary co-occurrence data) may rank differently than HIGHEST. Below the
    gate the operands stay f32 (bitwise contract with recommend()); above
    it they are bf16 planes, and any list divergence vs recommend() must be
    an exact tie in f64 arithmetic."""
    import jax.numpy as jnp

    from ganmf_tpu.models import base as base_mod
    from ganmf_tpu.models.itemknn import ItemKNNCFRecommender, UserKNNCFRecommender

    train, _ = urm_pair
    users = np.arange(train.shape[0])
    for cls in (ItemKNNCFRecommender, UserKNNCFRecommender):
        model = cls(train)
        model.fit(topK=9, shrink=0)
        uids = jnp.arange(8)

        monkeypatch.setattr(base_mod, "_SIM_SPLIT_MIN_ITEMS", 10**9)
        rows, right = model._fused_serving_operands(uids)
        assert not isinstance(rows, tuple) and not isinstance(right, tuple)

        monkeypatch.setattr(base_mod, "_SIM_SPLIT_MIN_ITEMS", 0)
        model._device_w_planes = None
        rows, right = model._fused_serving_operands(uids)
        assert isinstance(rows, tuple) or isinstance(right, tuple)

        ref = model.recommend(users, cutoff=7, remove_seen_flag=True)
        fused = model.recommend_fused(users, cutoff=7, remove_seen_flag=True)
        if fused != ref:
            # every divergence must be a permutation of exactly-tied scores
            W64 = np.asarray(model.W_sparse.todense(), dtype=np.float64)
            A64 = np.asarray(train.todense(), dtype=np.float64)
            s64 = W64 @ A64 if cls is UserKNNCFRecommender else A64 @ W64
            for u, (lf, lr) in enumerate(zip(fused, ref)):
                if lf != lr:
                    assert sorted(np.round(s64[u, lf], 12)) == sorted(np.round(s64[u, lr], 12)), u
