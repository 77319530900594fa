#!/usr/bin/env python3
"""Measure per-config seed spread for the GAN models: retrain each tuned
config with extra seeds and record MAP@20. Writes SEEDS.json / appendix in
PARITY_SEEDS.md."""
import json, os, pickle, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ganmf_tpu.data import load_reference_splits
from ganmf_tpu.eval import EvaluatorHoldout
from ganmf_tpu.models import CAAE, CFGAN, GANMF, DisGANMF
from ganmf_tpu.utils.seeding import set_seed

REF = "/root/reference/experiments"
CONFIGS = [(cls, mode, ds)
           for ds in ("LastFM", "hetrec2011", "1M")
           for cls, mode in [(GANMF, "user"), (GANMF, "item"), (DisGANMF, "user"),
                             (DisGANMF, "item"), (CFGAN, "user"), (CFGAN, "item"), (CAAE, "")]]
SEEDS = [7, 99]

out_path = "SEEDS.json"
results = json.load(open(out_path)) if os.path.exists(out_path) else {}

for cls, mode, ds in CONFIGS:
    name = f"{cls.RECOMMENDER_NAME}_{mode}_{ds}"
    bp_path = os.path.join(REF, name, "best_params.pkl")
    if not os.path.isfile(bp_path):
        continue
    bp = pickle.load(open(bp_path, "rb"))
    splits = load_reference_splits(ds)
    ev = EvaluatorHoldout(splits.test, [20])
    for seed in SEEDS:
        key = f"{name}@{seed}"
        if key in results:
            continue
        set_seed(seed)
        m = cls(splits.train, mode=mode or "user", seed=seed, is_experiment=True)
        m.fit(validation_evaluator=None, **bp)
        r, _ = ev.evaluateRecommender(m)
        results[key] = float(r[20]["MAP"])
        print(key, round(results[key], 6), flush=True)
        json.dump(results, open(out_path, "w"), indent=1)
print("done")
