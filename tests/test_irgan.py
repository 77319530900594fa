"""IRGAN: DNS sampling correctness, learning signal, early stopping, and
persistence. The reference kernel (GANRec/Cython/IRGAN_Cython.pyx:43) is
vestigial — its fit loop discards the samples it draws — so there are no
published rows; these tests assert the completed algorithm's invariants."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ganmf_tpu.eval import EvaluatorHoldout
from ganmf_tpu.models import IRGAN_Recommender
from ganmf_tpu.models.irgan import _masked_logits, _NEG_INF

from conftest import random_urm


def _map_at5(model, test):
    results, _ = EvaluatorHoldout(test, [5]).evaluateRecommender(model)
    return results[5]["MAP"]


def test_masked_logits_exclude_seen():
    """Sampling logits must be -inf exactly on each user's observed items."""
    train = random_urm(30, 25, density=0.3, seed=3)
    from ganmf_tpu.data.device import padded_csr_from_sparse

    pad = padded_csr_from_sparse(train).idx
    rng = np.random.RandomState(0)
    Uf = jnp.asarray(rng.randn(30, 6).astype(np.float32))
    Vf = jnp.asarray(rng.randn(25, 6).astype(np.float32))
    b = jnp.asarray(rng.randn(25).astype(np.float32))
    u = jnp.asarray(np.arange(0, 30, 3, dtype=np.int32))
    logits, scores = _masked_logits(Uf, Vf, b, u, pad, 25, 0.2)
    logits, scores = np.asarray(logits), np.asarray(scores)
    dense = train.toarray()
    for r, uu in enumerate(np.asarray(u)):
        seen = dense[uu] != 0
        assert np.all(logits[r, seen] == float(_NEG_INF))
        np.testing.assert_allclose(
            logits[r, ~seen], scores[r, ~seen] / 0.2, rtol=1e-5
        )
    # and the raw scores are the plain MF forward
    np.testing.assert_allclose(
        scores, np.asarray(Uf)[np.asarray(u)] @ np.asarray(Vf).T + np.asarray(b),
        rtol=1e-4, atol=1e-5,
    )


def _clustered_pair(seed=11):
    """Two disjoint taste clusters — learnable structure (random URMs have
    none): users 0-19 like items 0-29, users 20-39 like items 30-59; 30% of
    each user's positives held out as test."""
    import scipy.sparse as sps

    rng = np.random.RandomState(seed)
    train = np.zeros((40, 60), np.float32)
    test = np.zeros((40, 60), np.float32)
    for u in range(40):
        pool = np.arange(30) if u < 20 else np.arange(30, 60)
        liked = rng.choice(pool, size=14, replace=False)
        test_items = liked[:4]
        train[u, liked[4:]] = 1.0
        test[u, test_items] = 1.0
    return sps.csr_matrix(train), sps.csr_matrix(test)


def test_dns_pretrain_learns():
    """Generator pretraining alone (DNS-BPR) must beat the random init on
    data with cluster structure."""
    train, test = _clustered_pair()
    model = IRGAN_Recommender(train)
    model.fit(epochs=0, pre_train_epochs=0, num_factors=8, random_seed=5)
    base = _map_at5(model, test)
    model2 = IRGAN_Recommender(train)
    model2.fit(epochs=0, pre_train_epochs=40, num_factors=8, DNS_lr=0.05,
               batch_size=64, random_seed=5)
    trained = _map_at5(model2, test)
    assert trained > base + 0.05, (base, trained)


def test_adversarial_phase_runs_and_serves(urm_pair):
    train, test = urm_pair
    model = IRGAN_Recommender(train)
    model.fit(epochs=5, pre_train_epochs=10, num_factors=8, batch_size=64,
              d_steps=1, g_steps=1, g_samples=8, random_seed=5)
    assert model.USER_factors.shape == (train.shape[0], 9)  # bias folded
    assert model.ITEM_factors.shape == (train.shape[1], 9)
    ranked = model.recommend(np.arange(10), cutoff=5)
    assert len(ranked) == 10 and all(len(r) == 5 for r in ranked)
    assert np.isfinite(_map_at5(model, test))


def test_early_stopping_restores_best(urm_pair):
    train, test = urm_pair
    evaluator = EvaluatorHoldout(test, [5])
    model = IRGAN_Recommender(train)
    model.fit(
        epochs=8, pre_train_epochs=15, num_factors=8, batch_size=64,
        random_seed=5, validation_every_n=2, stop_on_validation=True,
        evaluator_object=evaluator, lower_validations_allowed=2,
        validation_metric="MAP",
    )
    assert model.epochs_best >= 0
    assert np.isfinite(_map_at5(model, test))


def test_save_load_roundtrip(tmp_path, urm_pair):
    train, test = urm_pair
    model = IRGAN_Recommender(train)
    model.fit(epochs=2, pre_train_epochs=5, num_factors=8, batch_size=64, random_seed=5)
    before = _map_at5(model, test)
    model.saveModel(str(tmp_path) + "/", "irgan_test")
    fresh = IRGAN_Recommender(train)
    fresh.loadModel(str(tmp_path) + "/", "irgan_test")
    np.testing.assert_array_equal(fresh.USER_factors, model.USER_factors)
    assert _map_at5(fresh, test) == pytest.approx(before)
