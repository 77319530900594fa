#!/usr/bin/env python3
"""Full 50-eval GP search for SLIM-BPR on hetrec2011 (the one remaining
parity laggard that had only seen an 8-point grid — see TUNED.md), using
the same protocol as the reference's own tuning (RecSysExp.py:417):
validate at MAP@5 on the validation split, retrain best on the full train
split, evaluate on the test split. Updates TUNED.json with the result."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ganmf_tpu.cli import experiment as expmod
from ganmf_tpu.cli.run_best import run as run_best
from ganmf_tpu.cli.spaces import DICT_DIMENSIONS

EVALS = int(os.environ.get("TUNE_EVALS", "50"))

dims = list(DICT_DIMENSIONS["SLIMBPR"])
exp = expmod.RecSysExp(
    expmod.DICT_REC_CLASSES["SLIMBPR"], dataset="hetrec2011",
    fit_param_names=[d.name for d in dims], seed=1337, train_mode="",
    logs_root="runs/tuning",
)
exp.tune(dims, evals=EVALS)
r = run_best("hetrec2011", "SLIMBPR", train_mode="", force=True,
             bp_dir="runs/tuning", out_root="runs/tuned_test_results")

key = "SLIMBPR__hetrec2011"
entry = {"tuned_MAP@20": float(r[20]["MAP"]), "tuned_NDCG@20": float(r[20]["NDCG"]),
         "published_MAP@20": 0.3284063, "evals": EVALS}
results = json.load(open("TUNED.json")) if os.path.isfile("TUNED.json") else {}
results[key] = entry
json.dump(results, open("TUNED.json", "w"), indent=1)
print(key, entry, flush=True)
