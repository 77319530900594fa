#!/usr/bin/env python3
"""25-eval GP tune of CFGAN_item_1M — the one PARITY row whose NDCG delta
(-0.0118) is a small systematic offset rather than seed noise
(PARITY_SEEDS.md five-seed receipts). Same protocol as scripts/
tune_lagging.py: GP search on the validation split at MAP@5 (seed 1337),
retrain best on the full train split, evaluate on the test split.

Appends the result to TUNED.json; TUNED.md is updated by hand from it.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _timing import atomic_json_dump

from ganmf_tpu.cli import experiment as expmod
from ganmf_tpu.cli.run_best import run as run_best
from ganmf_tpu.cli.spaces import DICT_DIMENSIONS

EVALS = int(os.environ.get("TUNE_EVALS", "25"))

dataset, algo, mode = "1M", "CFGAN", "item"
dims = list(DICT_DIMENSIONS[algo])
exp = expmod.RecSysExp(
    expmod.DICT_REC_CLASSES[algo], dataset=dataset,
    fit_param_names=[d.name for d in dims], seed=1337, train_mode=mode,
    logs_root="runs/tuning",
)
exp.tune(dims, evals=EVALS)
r = run_best(dataset, algo, train_mode=mode, force=True,
             bp_dir="runs/tuning", out_root="runs/tuned_test_results")

key = f"{algo}_{mode}_{dataset}"
results = json.load(open("TUNED.json")) if os.path.exists("TUNED.json") else {}
results[key] = {
    "tuned_MAP@20": float(r[20]["MAP"]),
    "tuned_NDCG@20": float(r[20]["NDCG"]),
    "published_MAP@20": 0.0927992,
    "published_NDCG@20": 0.1909021,
}
atomic_json_dump(results, "TUNED.json")
print(key, json.dumps(results[key]), flush=True)
