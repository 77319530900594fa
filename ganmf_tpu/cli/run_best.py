"""Final test-set evaluation with tuned hyperparameters.

Rebuild of RunBestParameters.py: loads best_params.pkl for
(dataset, algorithm, mode, similarity), retrains on the full URM_train,
evaluates on URM_test at cutoffs [5, 10, 20, 50] and writes
test_results/{NAME}_{mode}{sim}_{dataset}/test_results.{txt,pkl} plus the
saved model (RunBestParameters.py:30-111).

Deviation from the reference, on purpose: the reported train/test
durations are real seconds — the reference passes (t1-t0)/1000 as
timedelta's *days* argument, inflating printed durations by 86.4x
(RunBestParameters.py:94,101; BASELINE.md "Timing baseline").

CLI: python -m ganmf_tpu.cli.run_best <dataset> <rec> [--user|--item]
         [<similarity>] [--force] [--bp <dir>]
"""

from __future__ import annotations

import os
import pickle
import sys
import time
from typing import List

from ganmf_tpu.cli.experiment import (
    ALL_DATASETS,
    ALL_RECOMMENDERS,
    DICT_REC_CLASSES,
    EARLY_STOPPING_ALGOS,
    SEED,
    SIMILARITIES,
    load_urms,
)
from ganmf_tpu.eval import EvaluatorHoldout
from ganmf_tpu.models import GAN_MODELS
from ganmf_tpu.utils.seeding import set_seed


def load_best_params(bp_dir: str, rec_name: str, mode: str, sim: str, dataset: str) -> dict:
    path = os.path.join(bp_dir, f"{rec_name}_{mode}{sim}_{dataset}", "best_params.pkl")
    if not os.path.isfile(path):
        # parameterless algorithms (TopPop) have no tuned params
        return {}
    with open(path, "rb") as fh:
        return pickle.load(fh)


def run(
    dataset: str,
    algo: str,
    train_mode: str = "",
    sim: str = "",
    force: bool = False,
    bp_dir: str = "experiments",
    out_root: str = "test_results",
    seed: int = SEED,
):
    rec_class = DICT_REC_CLASSES[algo]
    rec_name = rec_class.RECOMMENDER_NAME
    out_dir = os.path.join(out_root, f"{rec_name}_{train_mode}{sim}_{dataset}")
    result_path = os.path.join(out_dir, "test_results.txt")

    if os.path.exists(result_path) and not force:
        print(f"{result_path} exists; use --force to recompute.")
        return None

    best_params = load_best_params(bp_dir, rec_name, train_mode, sim, dataset)
    print(f"Best params for {rec_name} {train_mode}{sim} on {dataset}: {best_params}")

    set_seed(seed)
    splits = load_urms(dataset)
    evaluator = EvaluatorHoldout(splits.test, [5, 10, 20, 50], exclude_seen=True)

    t0 = time.time()
    if rec_class in GAN_MODELS:
        model = rec_class(splits.train, mode=train_mode or "user", seed=seed, is_experiment=True)
        model.fit(validation_evaluator=None, **best_params)
    else:
        model = rec_class(splits.train)
        model.fit(**best_params)
    train_seconds = time.time() - t0

    t0 = time.time()
    results_dict, results_string = evaluator.evaluateRecommender(model)
    test_seconds = time.time() - t0

    os.makedirs(out_dir, exist_ok=True)
    with open(result_path, "a") as fh:
        fh.write(results_string)
        fh.write(f"Training time: {train_seconds:.3f} s\n")
        fh.write(f"Testing time: {test_seconds:.3f} s\n\n")
    with open(os.path.join(out_dir, "test_results.pkl"), "wb") as fh:
        pickle.dump(results_dict, fh, pickle.HIGHEST_PROTOCOL)
    try:
        model.saveModel(out_dir)
    except Exception as err:
        print(f"saveModel skipped: {err}")

    print(results_string)
    print(f"Training time: {train_seconds:.1f}s | Testing time: {test_seconds:.1f}s")
    return results_dict


USAGE = (
    "usage: ganmf-run-best <dataset> <rec> [--user|--item] [<similarity>]"
    " [--force] [--bp DIR]\n"
    "  datasets:     " + " ".join(sorted(ALL_DATASETS)) + "\n"
    "  recommenders: " + " ".join(sorted(ALL_RECOMMENDERS)) + "\n"
    "  similarities: " + " ".join(sorted(SIMILARITIES))
)


def main(args: List[str]):
    if not args or "--help" in args or "-h" in args:
        print(USAGE)
        return
    algo = dataset = None
    sim = ""
    train_mode = ""
    force = False
    bp_dir = "experiments"
    i = 0
    while i < len(args):
        arg = args[i]
        if arg in ALL_RECOMMENDERS and algo is None:
            algo = arg
        elif arg in ALL_DATASETS and dataset is None:
            dataset = arg
        elif arg in SIMILARITIES and not sim:
            sim = arg
        elif arg in ("--user", "--item") and not train_mode:
            train_mode = arg[2:]
        elif arg == "--force":
            force = True
        elif arg == "--bp":
            i += 1
            bp_dir = args[i]
        i += 1

    if algo is None or dataset is None:
        raise SystemExit(f"unrecognized or missing <dataset>/<rec> in {args!r}\n{USAGE}")
    run(dataset, algo, train_mode, sim, force=force, bp_dir=bp_dir)


if __name__ == "__main__":
    main(sys.argv[1:])
