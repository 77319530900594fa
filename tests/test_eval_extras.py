import numpy as np
import pytest
import scipy.sparse as sps

import jax.numpy as jnp

from ganmf_tpu.eval import EvaluatorHoldout, EvaluatorNegativeItemSample
from ganmf_tpu.models.base import Recommender
from ganmf_tpu.utils.dataio import DataIO
from ganmf_tpu.data.reader import InteractionReader
from tests.conftest import random_urm


class StubModel(Recommender):
    def __init__(self, URM_train, scores):
        super().__init__(URM_train)
        self._scores = np.asarray(scores, dtype=np.float32)

    def score_device(self, user_ids):
        return jnp.asarray(self._scores)[user_ids]


def test_negative_item_sample_restricts_candidates(urm_pair):
    train, test = urm_pair
    rng = np.random.RandomState(0)
    scores = rng.randn(*train.shape).astype(np.float32)

    # negatives: 5 random unseen/untested items per user
    neg = np.zeros(train.shape, np.float32)
    dense_train = np.asarray(train.todense())
    dense_test = np.asarray(test.todense())
    for u in range(train.shape[0]):
        allowed = np.where((dense_train[u] == 0) & (dense_test[u] == 0))[0]
        neg[u, rng.choice(allowed, 5, replace=False)] = 1

    model = StubModel(train, scores)
    ev_full = EvaluatorHoldout(test, [5])
    ev_neg = EvaluatorNegativeItemSample(test, sps.csr_matrix(neg), [5])

    res_full, _ = ev_full.evaluateRecommender(model)
    res_neg, _ = ev_neg.evaluateRecommender(model)
    # ranking among test+5 negatives only is an easier task
    assert res_neg[5]["MAP"] >= res_full[5]["MAP"]
    assert res_neg[5]["MAP"] <= 1.0


def test_dataio_mixed_types(tmp_path):
    io = DataIO(str(tmp_path))
    payload = {
        "arr": np.arange(12).reshape(3, 4).astype(np.float32),
        "sparse": random_urm(5, 6, 0.5),
        "meta": {"a": 1, "b": "two"},
        "obj": {("tuple", "key"): 3},  # not json-serializable -> pickle
    }
    io.save_data("model", payload)
    out = io.load_data("model")
    np.testing.assert_array_equal(out["arr"], payload["arr"])
    assert (out["sparse"] != payload["sparse"]).nnz == 0
    assert out["meta"] == payload["meta"]
    assert out["obj"] == payload["obj"]


def test_cv_folds(tmp_path):
    urm = random_urm(30, 20, 0.3)
    reader = InteractionReader.__new__(InteractionReader)
    reader.urm = urm
    folds = list(reader.get_cv_folds(urm, folds=5))
    assert len(folds) == 5
    total = urm.nnz
    for tr, te in folds:
        assert tr.nnz + te.nnz == total
        assert tr.multiply(te).nnz == 0
    # test sets partition the interactions
    te_sum = sum(te.nnz for _, te in folds)
    assert te_sum == total
