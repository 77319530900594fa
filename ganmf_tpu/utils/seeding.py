"""Global seeding helpers.

The reference harness seeds python/numpy/TF before dataset splitting and
before every model build (reference: RecSysExp.py:104-108). Here the numpy
RNG drives host-side work (splitting, shuffling order for artifact parity)
and a ``jax.random`` key tree drives all device-side randomness.
"""

import random

import numpy as np

GLOBAL_SEED = 1337


def set_seed(seed: int) -> None:
    """Seed python and numpy global RNGs (host-side reproducibility)."""
    random.seed(seed)
    np.random.seed(seed)
