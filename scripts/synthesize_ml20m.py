#!/usr/bin/env python3
"""Synthesize an ML-20M-scale ratings.csv for the scale proof.

The environment is air-gapped (zero egress), so the real ml-20m archive
cannot be fetched; this generates a statistically realistic stand-in with
the real dataset's published marginals:

  * 138,493 users x 26,744 movies, ~20.0 M ratings
    (the reference's Movielens version table, datasets/Movielens.py:25-57,
    names ml-20m; shape from the GroupLens README),
  * Zipf item popularity (movie popularity is heavy-tailed),
  * 64 latent taste clusters over a DISJOINT partition of the catalog:
    cluster c boosts its own ~418-item slice 60x, putting ~half of each
    user's ratings inside their cluster's slice — strong collaborative
    structure a personalized model can clearly learn. (v1 boosted random
    overlapping 8% genre sets 10x; measured on the resulting splits, even
    sklearn's own randomized SVD scored MAP@20 0.031 vs TopPop 0.101 and
    ItemKNN only tied TopPop — popularity dominated every cluster's draw
    distribution, making TopPop near-Bayes-optimal and voiding the
    "personalized beats TopPop" consistency receipt. Real ML-20M behaves
    the opposite way: neighborhood/MF models beat TopPop by 2-3x.),
  * log-normal user activity clipped to [20, 1600] (ML-20M guarantees
    >= 20 ratings per user; the clip caps the padded-CSR row length the
    streamed trainers allocate),
  * ratings in {0.5, 1.0, ..., 5.0} skewed toward 3.5-4.5.

Output layout matches the DatasetSpec("20M") archive member so
ganmf_tpu.data.datasets.Movielens("20M") picks it up without a download:
<data_dir>/ml-20m/ratings.csv with a `userId,movieId,rating,timestamp`
header. Deterministic for a given seed.
"""

import os
import sys
import time

import numpy as np

N_USERS = 138_493
N_ITEMS = 26_744
TARGET_NNZ = 20_000_263
MIN_PER_USER = 20
MAX_PER_USER = 1_600


def synthesize(path: str, seed: int = 20_000_263, verbose: bool = True) -> str:
    if os.path.isfile(path):
        if verbose:
            print(f"already present: {path}")
        return path
    t0 = time.time()
    rng = np.random.RandomState(seed)

    # -- user activity: log-normal, clipped, scaled to the target total
    acts = rng.lognormal(mean=4.0, sigma=1.0, size=N_USERS)
    acts = np.clip(acts, MIN_PER_USER, MAX_PER_USER)
    acts = np.maximum((acts * (TARGET_NNZ / acts.sum())).astype(np.int64), MIN_PER_USER)
    acts = np.minimum(acts, MAX_PER_USER)

    # -- item popularity: Zipf over a shuffled item order
    ranks = np.arange(1, N_ITEMS + 1, dtype=np.float64)
    pop = ranks ** -0.9
    rng.shuffle(pop)
    pop /= pop.sum()

    # -- latent taste clusters: cluster c boosts its OWN slice of a
    # disjoint item partition 60x (~50% of each user's draws land in the
    # slice; see module docstring for why overlapping soft sets failed)
    n_clusters = 64
    cluster_of = rng.randint(0, n_clusters, size=N_USERS).astype(np.int32)
    item_cluster = rng.randint(0, n_clusters, size=N_ITEMS).astype(np.int32)

    # -- draw (user, item) pairs: oversample draws per user from the
    # user's cluster distribution, drop within-user duplicates, then trim
    # each user back to its nominal count. The 60x in-cluster tilt makes
    # duplicates common (heavy users exhaust their ~418-item slice), so
    # 70% oversampling is needed to keep the realized total near 20M.
    over_counts = np.minimum((acts * 1.7).astype(np.int64), MAX_PER_USER + 900)
    users = np.repeat(np.arange(N_USERS, dtype=np.int32), over_counts)
    if verbose:
        print(f"drawing {len(users):,} candidate pairs ...", flush=True)
    items = np.empty(len(users), dtype=np.int32)
    user_cluster = cluster_of[users]
    for c in range(n_clusters):
        p_c = pop * np.where(item_cluster == c, 60.0, 1.0)
        p_c /= p_c.sum()
        sel = np.nonzero(user_cluster == c)[0]
        # inverse-CDF sampling: one cumsum + bulk searchsorted per cluster
        cdf = np.cumsum(p_c)
        cdf[-1] = 1.0
        items[sel] = np.searchsorted(cdf, rng.rand(len(sel))).astype(np.int32)

    keys = users.astype(np.int64) * N_ITEMS + items
    # keep first occurrence per (user, item); rows stay grouped by user
    _, first_idx = np.unique(keys, return_index=True)
    first_idx.sort()
    users, items = users[first_idx], items[first_idx]

    # trim: keep the first acts[u] surviving pairs of each user
    counts = np.bincount(users, minlength=N_USERS)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pos_in_user = np.arange(len(users)) - np.repeat(starts, counts)
    keep = pos_in_user < acts[users]
    users, items = users[keep], items[keep]
    if verbose:
        print(f"{len(users):,} pairs after dedup+trim ({time.time()-t0:.1f}s)", flush=True)

    # -- ratings skewed toward 3.5-4.5 (half-star scale like the real file)
    levels = np.arange(0.5, 5.01, 0.5)
    probs = np.array([0.01, 0.02, 0.03, 0.05, 0.09, 0.13, 0.21, 0.20, 0.16, 0.10])
    probs /= probs.sum()
    ratings = levels[rng.choice(len(levels), size=len(users), p=probs)]
    timestamps = rng.randint(789_652_009, 1_427_784_002, size=len(users))

    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    if verbose:
        print(f"writing {path} ...", flush=True)
    import pandas as pd

    df = pd.DataFrame({
        "userId": users + 1,  # raw ids are 1-based like the real file
        "movieId": items + 1,
        "rating": ratings,
        "timestamp": timestamps,
    })
    df.to_csv(tmp, index=False)
    os.replace(tmp, path)
    if verbose:
        print(f"done: {len(df):,} ratings, {os.path.getsize(path)/1e6:.0f} MB, {time.time()-t0:.1f}s")
    return path


if __name__ == "__main__":
    data_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "GANMF_TPU_DATA", os.path.join("datasets", "all_datasets"))
    synthesize(os.path.join(data_dir, "ml-20m", "ratings.csv"))
