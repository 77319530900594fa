"""Harness CLI tests: artifact layout, checkpoint resume, best-params flow."""

import json
import os
import pickle

import numpy as np
import pytest
import scipy.sparse as sps

from ganmf_tpu.cli import experiment as expmod
from ganmf_tpu.cli.run_best import run as run_best
from ganmf_tpu.data.splits import SplitSet, save_experiment_splits, find_split_dir
from tests.conftest import random_urm


@pytest.fixture
def fake_dataset_dir(tmp_path, monkeypatch):
    """A synthetic dataset registered under the experiment split layout."""
    rng = np.random.RandomState(0)
    full = (rng.rand(60, 40) < 0.3).astype(np.float32)
    full_csr = sps.csr_matrix(full)
    from ganmf_tpu.data.splits import make_experiment_splits

    splits = make_experiment_splits(full_csr, seed=1337)
    split_dir = tmp_path / "experiments" / "datasets"
    save_experiment_splits(splits, "synth", str(split_dir))
    monkeypatch.setenv("GANMF_TPU_SPLIT_DIR", str(split_dir))
    monkeypatch.chdir(tmp_path)
    # register the synthetic dataset name with the harness
    monkeypatch.setattr(expmod, "ALL_DATASETS", expmod.ALL_DATASETS + ["synth"])
    return tmp_path


def test_experiment_tune_artifacts(fake_dataset_dir):
    exp = expmod.RecSysExp(
        expmod.DICT_REC_CLASSES["PureSVD"], dataset="synth",
        fit_param_names=["num_factors"], method="bayesian", seed=1337,
    )
    from ganmf_tpu.tune import Integer

    exp.tune([Integer(1, 16, name="num_factors")], evals=4)

    logs = fake_dataset_dir / "experiments" / "PureSVDRecommender__synth"
    assert (logs / "best_params.pkl").exists()
    assert (logs / "best_params.txt").exists()
    assert (logs / "results.txt").exists()
    assert (logs / "checkpoint.pkl").exists()
    bp = pickle.loads((logs / "best_params.pkl").read_bytes())
    assert 1 <= bp["num_factors"] <= 16
    # best_params.txt is the json of the pickle
    assert json.loads((logs / "best_params.txt").read_text())["num_factors"] == bp["num_factors"]


def test_experiment_resume_from_checkpoint(fake_dataset_dir):
    from ganmf_tpu.tune import Integer

    exp = expmod.RecSysExp(
        expmod.DICT_REC_CLASSES["PureSVD"], dataset="synth",
        fit_param_names=["num_factors"], seed=1337,
    )
    exp.tune([Integer(1, 16, name="num_factors")], evals=3)
    ck = fake_dataset_dir / "experiments" / "PureSVDRecommender__synth" / "checkpoint.pkl"
    from ganmf_tpu.tune.gp import load

    assert len(load(str(ck)).func_vals) == 3

    # resuming with a larger budget only runs the remaining evals
    exp2 = expmod.RecSysExp(
        expmod.DICT_REC_CLASSES["PureSVD"], dataset="synth",
        fit_param_names=["num_factors"], seed=1337,
    )
    exp2.tune([Integer(1, 16, name="num_factors")], evals=5)
    assert len(load(str(ck)).func_vals) == 5


def test_run_best_flow(fake_dataset_dir):
    # produce a best_params.pkl by hand, then run the final-eval CLI
    logs = fake_dataset_dir / "experiments" / "TopPopRecommender__synth"
    logs.mkdir(parents=True)
    (logs / "best_params.pkl").write_bytes(pickle.dumps({}))

    results = run_best("synth", "TopPop", train_mode="", sim="", force=True)
    out = fake_dataset_dir / "test_results" / "TopPopRecommender__synth"
    assert (out / "test_results.txt").exists()
    assert (out / "test_results.pkl").exists()
    saved = pickle.loads((out / "test_results.pkl").read_bytes())
    assert saved[20]["MAP"] == results[20]["MAP"]
    # refuses to recompute without force
    assert run_best("synth", "TopPop", train_mode="", sim="") is None


def test_gan_experiment_early_stop_epochs(fake_dataset_dir):
    """GAN objective records the early-stopped epoch count like the
    reference (RecSysExp.py:274-276)."""
    from ganmf_tpu.tune import Categorical, Integer, Real

    exp = expmod.RecSysExp(
        expmod.DICT_REC_CLASSES["GANMF"], dataset="synth",
        fit_param_names=["epochs", "num_factors", "batch_size", "d_lr", "g_lr"],
        seed=1337, train_mode="user",
    )
    dims = [
        Categorical([8], name="epochs"),
        Integer(2, 4, name="num_factors"),
        Categorical([16], name="batch_size"),
        Real(1e-4, 1e-3, prior="log-uniform", name="d_lr"),
        Real(1e-4, 1e-3, prior="log-uniform", name="g_lr"),
    ]
    exp.tune(dims, evals=2)
    bp = exp.load_best_params()
    assert "emb_dim" in bp  # conditional dimension added for GANMF
    assert "epochs" in bp
