#!/usr/bin/env python3
"""Re-run the committed-best-params parity configs for models whose device
programs changed (pass algo names as argv, e.g. CAAE SLIMBPR), compare the
fresh MAP/NDCG@20 against both the published reference rows and the values
previously recorded in PARITY.json, and update PARITY.json in place."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE = "/root/reference"

from parity_sweep import parse_reference_row  # noqa: E402

from ganmf_tpu.cli.experiment import DICT_REC_CLASSES  # noqa: E402
from ganmf_tpu.cli.run_best import run as run_best  # noqa: E402

ALGOS = sys.argv[1:] or ["CAAE", "SLIMBPR"]
DATASETS = ["1M", "hetrec2011", "LastFM"]

results = json.load(open("PARITY.json"))
for algo in ALGOS:
    rec_name = DICT_REC_CLASSES[algo].RECOMMENDER_NAME
    for dataset in DATASETS:
        key = f"{rec_name}__{dataset}"
        ref_dir = os.path.join(REFERENCE, "test_results", key)
        if not os.path.isdir(ref_dir):
            print(f"skip {key}: no reference results")
            continue
        old = results.get(key, {})
        t0 = time.time()
        ours = run_best(
            dataset, algo, train_mode="", sim="", force=True,
            bp_dir=os.path.join(REFERENCE, "experiments"), out_root="test_results",
        )
        ref = parse_reference_row(os.path.join(ref_dir, "test_results.txt"))
        entry = {
            "MAP@20": {"ours": float(ours[20]["MAP"]), "ref": ref.get("MAP")},
            "NDCG@20": {"ours": float(ours[20]["NDCG"]), "ref": ref.get("NDCG")},
            "wall_s": round(time.time() - t0, 1),
        }
        entry["MAP@20"]["delta"] = round(entry["MAP@20"]["ours"] - entry["MAP@20"]["ref"], 7)
        entry["NDCG@20"]["delta"] = round(entry["NDCG@20"]["ours"] - entry["NDCG@20"]["ref"], 7)
        prev = old.get("MAP@20", {}).get("ours")
        drift = None if prev is None else round(entry["MAP@20"]["ours"] - prev, 7)
        print(f"{key}: MAP {entry['MAP@20']['ours']:.7f} "
              f"(ref {entry['MAP@20']['ref']}, drift-vs-previous {drift}) "
              f"[{entry['wall_s']}s]", flush=True)
        results[key] = entry
        json.dump(results, open("PARITY.json", "w"), indent=1)
print("done")
