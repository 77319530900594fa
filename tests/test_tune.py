import os
import pickle

import numpy as np
import pytest

from ganmf_tpu.tune import Categorical, Integer, Real, dummy_minimize, gp_minimize
from ganmf_tpu.tune.gp import CheckpointSaver, load


DIMS = [
    Real(-2, 2, name="x"),
    Real(1e-3, 10, prior="log-uniform", name="y"),
    Integer(0, 10, name="k"),
    Categorical(["a", "b"], name="c"),
]


def objective(p):
    x, y, k, c = p
    return (x - 0.5) ** 2 + (np.log10(y) - 0.0) ** 2 + 0.1 * abs(k - 3) + (0.5 if c == "b" else 0.0)


def test_space_roundtrip():
    for d, v in zip(DIMS, [-1.3, 0.05, 7, "b"]):
        u = d.to_unit(v)
        assert 0.0 <= u <= 1.0
        back = d.from_unit(u)
        if isinstance(v, float):
            assert back == pytest.approx(v, rel=1e-6)
        else:
            assert back == v


def test_gp_minimize_beats_tiny_random():
    gp_res = gp_minimize(objective, DIMS, n_calls=30, n_random_starts=8, random_state=0)
    assert len(gp_res.func_vals) == 30
    assert gp_res.fun <= 0.4  # near-optimum of a smooth 3d bowl
    assert objective(gp_res.x) == pytest.approx(gp_res.fun)


def test_dummy_minimize_runs():
    res = dummy_minimize(objective, DIMS, n_calls=10, random_state=0)
    assert len(res.func_vals) == 10


def test_checkpoint_resume(tmp_path):
    path = str(tmp_path / "checkpoint.pkl")
    saver = CheckpointSaver(path)
    res1 = gp_minimize(objective, DIMS, n_calls=5, random_state=0, callback=[saver])
    prev = load(path)
    assert len(prev.func_vals) == 5

    res2 = gp_minimize(
        objective, DIMS, n_calls=5, x0=prev.x_iters, y0=prev.func_vals,
        n_random_starts=0, random_state=0, callback=[saver],
    )
    final = load(path)
    assert len(final.func_vals) == 10
    assert final.fun <= res1.fun
