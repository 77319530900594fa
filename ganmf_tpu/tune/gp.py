"""Bayesian optimization: Gaussian-process surrogate + expected improvement.

Drop-in replacement for the skopt gp_minimize / dummy_minimize calls the
reference harness makes (RecSysExp.py:376-391), built on sklearn's
GaussianProcessRegressor (Matern 5/2 + white noise) over the unit cube.
Supports warm starts (x0/y0), per-iteration callbacks and checkpoint
pickles, which is everything the reference's resume machinery needs.
"""

from __future__ import annotations

import pickle
from dataclasses import dataclass, field
from typing import Callable, List, Optional, Sequence

import numpy as np
from scipy.stats import norm
from sklearn.gaussian_process import GaussianProcessRegressor
from sklearn.gaussian_process.kernels import ConstantKernel, Matern, WhiteKernel

from ganmf_tpu.tune.space import Dimension, decode_point, encode_point


@dataclass
class OptimizeResult:
    x: list = None
    fun: float = np.inf
    x_iters: List[list] = field(default_factory=list)
    func_vals: List[float] = field(default_factory=list)

    def update(self, x, y):
        self.x_iters.append(list(x))
        self.func_vals.append(float(y))
        if y < self.fun:
            self.fun = float(y)
            self.x = list(x)


class CheckpointSaver:
    """Pickle the running result after every trial
    (skopt.callbacks.CheckpointSaver equivalent, RecSysExp.py:368)."""

    def __init__(self, path: str, **_):
        self.path = path

    def __call__(self, result: OptimizeResult):
        with open(self.path, "wb") as fh:
            pickle.dump(result, fh, pickle.HIGHEST_PROTOCOL)


def load(path: str) -> OptimizeResult:
    with open(path, "rb") as fh:
        return pickle.load(fh)


def _expected_improvement(mu, sigma, best):
    sigma = np.maximum(sigma, 1e-12)
    z = (best - mu) / sigma
    return (best - mu) * norm.cdf(z) + sigma * norm.pdf(z)


def _fit_gp(X, y, rng):
    kernel = ConstantKernel(1.0) * Matern(length_scale=np.full(X.shape[1], 0.3), nu=2.5) + WhiteKernel(1e-6)
    gp = GaussianProcessRegressor(
        kernel=kernel, normalize_y=True, n_restarts_optimizer=2,
        random_state=rng.randint(2**31 - 1),
    )
    # y normalization: GP handles; guard constant y
    gp.fit(X, y)
    return gp


def _run(
    func: Callable,
    dimensions: Sequence[Dimension],
    n_calls: int,
    rng: np.random.RandomState,
    callbacks,
    x0,
    y0,
    n_random_starts: int,
    use_gp: bool,
    verbose: bool,
) -> OptimizeResult:
    result = OptimizeResult()
    X_unit: List[np.ndarray] = []
    y_vals: List[float] = []

    # warm-start points without observations are evaluated first (counting
    # toward n_calls), mirroring skopt's gp_minimize semantics
    x0_pending: List = []
    if x0 is not None:
        if y0 is not None:
            for xi, yi in zip(x0, y0):
                result.update(xi, yi)
                X_unit.append(encode_point(list(dimensions), xi))
                y_vals.append(float(yi))
        else:
            x0_pending = list(x0)

    def tell(x):
        y = func(x)
        result.update(x, y)
        X_unit.append(encode_point(list(dimensions), x))
        y_vals.append(float(y))
        for cb in callbacks:
            cb(result)
        if verbose:
            print(f"[tune] trial {len(result.func_vals)}: f={y:.6f} best={result.fun:.6f}")

    d = len(dimensions)
    for it in range(n_calls):
        if x0_pending:
            tell(x0_pending.pop(0))
            continue
        n_seen = len(y_vals)
        if not use_gp or n_seen < max(n_random_starts, 2):
            u = rng.rand(d)
        else:
            gp = _fit_gp(np.asarray(X_unit), np.asarray(y_vals), rng)
            best_y = np.min(y_vals)
            # global sweep + local Gaussian refinement around the incumbent
            # EI argmax (cheap surrogate for skopt's L-BFGS restarts)
            cands = rng.rand(8192, d)
            mu, sigma = gp.predict(cands, return_std=True)
            ei = _expected_improvement(mu, sigma, best_y)
            u = cands[int(np.argmax(ei))]
            best_ei = float(np.max(ei))
            for width in (0.1, 0.03, 0.01):
                local = np.clip(u[None, :] + rng.randn(256, d) * width, 0.0, 1.0)
                mu, sigma = gp.predict(local, return_std=True)
                ei = _expected_improvement(mu, sigma, best_y)
                j = int(np.argmax(ei))
                if float(ei[j]) > best_ei:
                    best_ei = float(ei[j])
                    u = local[j]
        tell(decode_point(list(dimensions), u))
    return result


def gp_minimize(
    func,
    dimensions,
    n_calls: int = 50,
    n_random_starts: int = 10,
    random_state=None,
    verbose: bool = False,
    callback=None,
    x0=None,
    y0=None,
):
    rng = np.random.RandomState(random_state)
    callbacks = list(callback or [])
    return _run(func, dimensions, n_calls, rng, callbacks, x0, y0, n_random_starts, True, verbose)


def dummy_minimize(
    func,
    dimensions,
    n_calls: int = 50,
    random_state=None,
    verbose: bool = False,
    callback=None,
    x0=None,
    y0=None,
):
    rng = np.random.RandomState(random_state)
    callbacks = list(callback or [])
    return _run(func, dimensions, n_calls, rng, callbacks, x0, y0, 0, False, verbose)
