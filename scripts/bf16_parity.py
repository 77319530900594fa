#!/usr/bin/env python3
"""Three-seed GANMF_user_1M parity sweep with compute_dtype="bf16"
(VERDICT r2 #9): retrain at the committed best params with the bf16
epoch program and record MAP@20 / NDCG@20 so the PERF bf16 row's
"parity receipts" pointer in PARITY_SEEDS.md is backed by data.

Writes results into SEEDS.json under keys "GANMF_user_1M@<seed>:bf16".
"""
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _timing import atomic_json_dump

from ganmf_tpu.data import load_reference_splits
from ganmf_tpu.eval import EvaluatorHoldout
from ganmf_tpu.models import GANMF
from ganmf_tpu.utils.seeding import set_seed

REF = "/root/reference/experiments"
SEEDS = [1337, 7, 99]


def main():
    bp = pickle.load(open(os.path.join(REF, "GANMF_user_1M", "best_params.pkl"), "rb"))
    splits = load_reference_splits("1M")
    ev = EvaluatorHoldout(splits.test, [20])
    out_path = "SEEDS.json"
    results = json.load(open(out_path)) if os.path.exists(out_path) else {}
    for seed in SEEDS:
        key = f"GANMF_user_1M@{seed}:bf16"
        if key in results:
            continue
        set_seed(seed)
        m = GANMF(splits.train, mode="user", seed=seed, is_experiment=True)
        m.fit(validation_evaluator=None, compute_dtype="bf16", **bp)
        r, _ = ev.evaluateRecommender(m)
        results[key] = {"MAP": float(r[20]["MAP"]), "NDCG": float(r[20]["NDCG"])}
        print(key, json.dumps(results[key]), flush=True)
        atomic_json_dump(results, out_path)
    print("done")


if __name__ == "__main__":
    main()
