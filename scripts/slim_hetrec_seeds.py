#!/usr/bin/env python3
"""Five-seed receipt for the SLIM_BPR_hetrec2011 parity adjudication
(VERDICT r3 #6): retrain the reference's committed best_params
(experiments/SLIM_BPR_Recommender__hetrec2011/best_params.txt) under five
RNG seeds and record the test MAP@20 spread. If the published 0.3284 sits
far outside the spread, seed luck cannot explain the gap — consistent with
the float64 Cython-oracle finding (PARITY_NOTES.md) that the committed
params reproduce ~0.282, not the published row.

Appends to SEEDS.json under SLIM_BPR_hetrec2011@<seed>.
"""
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ganmf_tpu.data import load_reference_splits
from ganmf_tpu.eval import EvaluatorHoldout
from ganmf_tpu.models import SLIM_BPR
from ganmf_tpu.utils.seeding import set_seed

BP = pickle.load(open("/root/reference/experiments/SLIM_BPR_Recommender__hetrec2011/best_params.pkl", "rb"))
SEEDS = [1337, 7, 99, 2024, 31415]

splits = load_reference_splits("hetrec2011")
ev = EvaluatorHoldout(splits.test, [20])

out_path = "SEEDS.json"
results = json.load(open(out_path)) if os.path.exists(out_path) else {}

for seed in SEEDS:
    key = f"SLIM_BPR_hetrec2011@{seed}"
    if key in results:
        print(key, "cached", round(results[key], 6))
        continue
    set_seed(seed)
    m = SLIM_BPR(splits.train)
    m.fit(random_seed=seed, **BP)
    r, _ = ev.evaluateRecommender(m)
    results[key] = float(r[20]["MAP"])
    json.dump(results, open(out_path, "w"), indent=1)
    print(key, round(results[key], 6), flush=True)

vals = [results[f"SLIM_BPR_hetrec2011@{s}"] for s in SEEDS]
print(f"spread: min {min(vals):.6f} max {max(vals):.6f} published 0.3284063")
