"""serve_all — single-dispatch batch export — must equal recommend().

For every model family the [n, k] export, filtered to finite scores, must
reproduce recommend()'s ranked lists exactly (same tie order: both rank
through lax.top_k on the same score block).
"""

import numpy as np
import pytest

from ganmf_tpu.models import (
    GANMF,
    ItemKNNCFRecommender,
    PureSVDRecommender,
    Random,
    TopPop,
    UserKNNCFRecommender,
)
from tests.conftest import random_urm


@pytest.fixture
def urm():
    return random_urm(n_users=40, n_items=60, density=0.2, seed=7)


def _lists_from_export(idx, vals):
    return [idx[u][np.isfinite(vals[u])].tolist() for u in range(idx.shape[0])]


def _fit_models(urm):
    svd = PureSVDRecommender(urm)
    svd.fit(num_factors=8)
    knn = ItemKNNCFRecommender(urm)
    knn.fit(topK=20, shrink=0)
    uknn = UserKNNCFRecommender(urm)
    uknn.fit(topK=20, shrink=0)
    tp = TopPop(urm)
    tp.fit()
    return {"mf": svd, "itemknn": knn, "userknn": uknn, "toppop": tp}


@pytest.mark.parametrize("family", ["mf", "itemknn", "userknn", "toppop"])
@pytest.mark.parametrize("remove_seen", [True, False])
def test_serve_all_matches_recommend(urm, family, remove_seen):
    model = _fit_models(urm)[family]
    n_users = urm.shape[0]
    idx, vals = model.serve_all(cutoff=10, remove_seen_flag=remove_seen, block=16)
    assert idx.shape == (n_users, 10) and vals.shape == (n_users, 10)
    got = _lists_from_export(idx, vals)
    want = model.recommend(np.arange(n_users), cutoff=10, remove_seen_flag=remove_seen)
    assert got == want


def test_serve_all_user_subset_and_single_block(urm):
    model = _fit_models(urm)["mf"]
    users = np.array([3, 0, 7, 7, 11])
    idx, vals = model.serve_all(cutoff=5, user_id_array=users, block=4096)
    got = _lists_from_export(idx, vals)
    want = model.recommend(users, cutoff=5)
    assert got == want


def test_serve_all_gan_model(urm):
    model = GANMF(urm, mode="user", seed=3, is_experiment=True)
    model.fit(num_factors=4, emb_dim=8, epochs=2, batch_size=8)
    idx, vals = model.serve_all(cutoff=10, block=16)
    got = _lists_from_export(idx, vals)
    want = model.recommend(np.arange(urm.shape[0]), cutoff=10)
    assert got == want


def test_serve_all_untraceable_fallback(urm):
    """Random uses host RNG: serve_all must take the eager per-block path
    (fresh draws per block, not one baked scan constant)."""
    model = Random(urm)
    model.fit(random_seed=0)
    assert not model._serving_traceable()
    idx, _ = model.serve_all(cutoff=10, remove_seen_flag=False, block=16)
    # two consecutive 16-user blocks must differ (independent draws)
    assert not np.array_equal(idx[:16], idx[16:32])


def test_serve_all_empty_user_array(urm):
    """Empty user_id_array returns empty (0, k) arrays, not an IndexError."""
    model = TopPop(urm)
    model.fit()
    idx, vals = model.serve_all(cutoff=10, user_id_array=np.array([], dtype=np.int64))
    assert idx.shape == (0, 10) and idx.dtype == np.int32
    assert vals.shape == (0, 10) and vals.dtype == np.float32


def test_scoreless_model_raises_clearly(urm):
    """A model overriding neither score_device nor _compute_item_score (e.g.
    PredefinedListRecommender) must raise NotImplementedError from the
    score-based paths, not RecursionError."""
    from ganmf_tpu.models import PredefinedListRecommender
    import scipy.sparse as sps

    rec = sps.csr_matrix(np.tile(np.arange(1, 6, dtype=np.int32), (urm.shape[0], 1)))
    model = PredefinedListRecommender(rec)
    assert model.recommend(0, cutoff=3) == [1, 2, 3]  # list serving still works
    with pytest.raises(NotImplementedError):
        model.serve_all(cutoff=5)
    with pytest.raises(NotImplementedError):
        model._compute_item_score(np.array([0]))
