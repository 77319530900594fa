"""Evaluator parity tests against a numpy oracle built from the reference
formulas, plus the reference's own embedded metric unit-test values
(Base/Evaluation/metrics.py:742-846)."""

import numpy as np
import pytest
import scipy.sparse as sps

import jax.numpy as jnp

from ganmf_tpu.eval import EvaluatorHoldout
from ganmf_tpu.eval.metrics import evaluate_batch
from ganmf_tpu.models.base import Recommender

from tests.reference_oracle import reference_evaluate


class StubModel(Recommender):
    RECOMMENDER_NAME = "Stub"

    def __init__(self, URM_train, scores):
        super().__init__(URM_train)
        self._scores = np.asarray(scores, dtype=np.float32)

    def score_device(self, user_ids):
        return jnp.asarray(self._scores)[user_ids]


COMPARED_METRICS = [
    "ROC_AUC", "PRECISION", "PRECISION_RECALL_MIN_DEN", "RECALL", "MAP", "MRR",
    "NDCG", "F1", "HIT_RATE", "ARHR", "RMSE", "NOVELTY", "AVERAGE_POPULARITY",
    "DIVERSITY_MEAN_INTER_LIST", "DIVERSITY_HERFINDAHL", "COVERAGE_ITEM",
    "COVERAGE_USER", "DIVERSITY_GINI", "SHANNON_ENTROPY",
]


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("implicit", [True, False])
def test_evaluator_matches_reference_oracle(urm_pair, seed, implicit):
    train, test = urm_pair
    if not implicit:
        rng0 = np.random.RandomState(99 + seed)
        test = test.copy()
        test.data = rng0.randint(1, 6, size=len(test.data)).astype(np.float32)

    rng = np.random.RandomState(seed)
    scores = rng.randn(*train.shape).astype(np.float32)

    cutoffs = [3, 5, 10]
    model = StubModel(train, scores)
    ours, _ = EvaluatorHoldout(test, cutoffs).evaluateRecommender(model)
    expected = reference_evaluate(scores, train, test, cutoffs)

    for c in cutoffs:
        for m in COMPARED_METRICS:
            assert ours[c][m] == pytest.approx(expected[c][m], rel=2e-4, abs=2e-5), (c, m)


def test_result_string_format(urm_pair):
    train, test = urm_pair
    model = StubModel(train, np.random.RandomState(0).randn(*train.shape))
    results, s = EvaluatorHoldout(test, [5]).evaluateRecommender(model)
    assert s.startswith("CUTOFF: 5 - ROC_AUC: ")
    assert "MAP: " in s and s.endswith(", \n")


def _run_single_list(ranked, pos_items, n_items=30, relevance=None, cutoff=None):
    """Helper: run evaluate_batch for one user whose ranking is forced."""
    cutoff = cutoff or len(ranked)
    scores = np.full((1, n_items), -np.inf, np.float32)
    for r, it in enumerate(ranked):
        scores[0, it] = len(ranked) - r
    test = np.zeros((1, n_items), np.float32)
    rel = relevance if relevance is not None else np.ones(len(pos_items))
    test[0, np.asarray(pos_items)] = rel

    stats = evaluate_batch(
        jnp.asarray(scores),
        jnp.asarray(test),
        jnp.asarray([len(pos_items)], jnp.int32),
        jnp.asarray([True]),
        jnp.zeros(n_items),
        jnp.zeros(n_items),
        cutoffs=(cutoff,),
        max_cutoff=max(cutoff, len(ranked)),
    )
    names = ["ROC_AUC", "PRECISION", "PRECISION_RECALL_MIN_DEN", "RECALL", "MAP", "MRR",
             "NDCG", "HIT_RATE", "ARHR", "RMSE", "NOVELTY", "AVERAGE_POPULARITY", "_COVERED"]
    return dict(zip(names, np.asarray(stats.scalars)[0]))


def test_reference_embedded_values():
    """Exact values from the reference's embedded unittests
    (metrics.py:750-846)."""
    pos = [2, 4, 5, 10]
    r1, r2, r3 = [1, 2, 3, 4, 5], [10, 5, 2, 4, 3], [1, 3, 6, 7, 8]

    assert _run_single_list(r1, pos)["RECALL"] == pytest.approx(3 / 4)
    assert _run_single_list(r2, pos)["RECALL"] == pytest.approx(1.0)
    assert _run_single_list(r3, pos)["RECALL"] == pytest.approx(0.0)

    assert _run_single_list(r1, pos)["PRECISION"] == pytest.approx(3 / 5)
    assert _run_single_list(r2, pos)["PRECISION"] == pytest.approx(4 / 5)

    assert _run_single_list(r1, pos)["MRR"] == pytest.approx(1 / 2)
    assert _run_single_list(r2, pos)["MRR"] == pytest.approx(1.0)
    assert _run_single_list(r3, pos)["MRR"] == pytest.approx(0.0)

    # MAP with min(n_pos, len) denominator
    assert _run_single_list(r1, pos)["MAP"] == pytest.approx((1 / 2 + 2 / 4 + 3 / 5) / 4)
    assert _run_single_list(r2, pos)["MAP"] == pytest.approx(1.0)
    r4 = [11, 12, 13, 14, 15, 16, 2, 4, 5, 10]
    assert _run_single_list(r4, pos)["MAP"] == pytest.approx((1 / 7 + 2 / 8 + 3 / 9 + 4 / 10) / 4)

    # NDCG with graded relevance and 2^rel - 1 gains (metrics.py:824-845)
    rel = np.array([5, 4, 3, 2], np.float32)
    idcg = ((2**5 - 1) / np.log(2) + (2**4 - 1) / np.log(3) + (2**3 - 1) / np.log(4) + (2**2 - 1) / np.log(5))
    expected = ((2**5 - 1) / np.log(3) + (2**4 - 1) / np.log(5) + (2**3 - 1) / np.log(6)) / idcg
    assert _run_single_list(r1, pos, relevance=rel)["NDCG"] == pytest.approx(expected, rel=1e-4)
    expected2 = ((2**2 - 1) / np.log(2) + (2**3 - 1) / np.log(3) + (2**5 - 1) / np.log(4) + (2**4 - 1) / np.log(5)) / idcg
    assert _run_single_list(r2, pos, relevance=rel)["NDCG"] == pytest.approx(expected2, rel=1e-4)
    assert _run_single_list(r3, pos, relevance=rel)["NDCG"] == pytest.approx(0.0)


def test_auc_reference_semantics():
    pos = [2, 4]
    # ranked [1,2,3,4,5]: rel at ranks 1,3 -> pairwise (2/3 + 1/3)/2
    assert _run_single_list([1, 2, 3, 4, 5], pos)["ROC_AUC"] == pytest.approx((2 / 3 + 1 / 3) / 2)
    # all relevant -> no negatives -> 1.0
    assert _run_single_list([2, 4], pos)["ROC_AUC"] == pytest.approx(1.0)
    # none relevant -> 0.0
    assert _run_single_list([1, 3], pos)["ROC_AUC"] == pytest.approx(0.0)


def test_ignore_users_and_min_ratings(urm_pair):
    train, test = urm_pair
    model = StubModel(train, np.random.RandomState(0).randn(*train.shape))
    ev = EvaluatorHoldout(test, [5], ignore_users=[0, 1, 2])
    assert 0 not in ev.usersToEvaluate and 1 not in ev.usersToEvaluate
    results, _ = ev.evaluateRecommender(model)
    assert np.isfinite(results[5]["MAP"])
