#!/usr/bin/env python3
"""Run the reference's full experiment workload through the installed
harness (VERDICT r4 #5): every algorithm x dataset x mode/similarity cell
of get_best_params.sh followed by the matching get_test_results.sh cell,
each as its own process (exactly how the reference's shell loops dispatch,
scripts/get_best_params.sh / get_test_results.sh), at reduced --evals.

Produces the reference's experiments/-layout artifact tree
(best_params.pkl / best_params.txt / results.txt / checkpoint.pkl per
cell, RecSysExp.py:313-412) plus test_results/<cell>/test_results.txt,
and appends one JSONL progress row per cell to runs/harness_matrix.jsonl.

Cells whose best_params.pkl (tune) or test_results.txt (run_best) already
exist are skipped, so the matrix itself is kill-and-resumable; a separate
mid-search kill/resume demonstration lives in scripts/resume_demo.py.

Usage: python scripts/harness_matrix.py [--evals N] [--phase tune|test|both]
"""

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

DATASETS = ["LastFM", "hetrec2011", "1M"]
ALGOS = ["TopPop", "PureSVD", "ALS", "SLIMBPR", "P3Alpha", "CFGAN", "CAAE", "GANMF", "DisGANMF"]
GAN_ALGOS = {"CFGAN", "GANMF", "DisGANMF"}
SIMILARITIES = ["cosine", "jaccard", "tversky", "dice", "euclidean", "asymmetric"]
LOG = os.path.join(ROOT, "runs", "harness_matrix.jsonl")


def cells():
    for ds in DATASETS:
        for algo in ALGOS:
            if algo in GAN_ALGOS:
                yield ds, algo, "user", ""
                yield ds, algo, "item", ""
            else:
                yield ds, algo, "", ""
        for sim in SIMILARITIES:
            yield ds, "ItemKNN", "", sim


def cell_name(ds, algo, mode, sim):
    """Reference experiments/-layout dir name: RECOMMENDER_NAME + "_" +
    mode + sim + "_" + dataset (RecSysExp.py:154 / cli/experiment.py:154)."""
    from ganmf_tpu.cli.experiment import DICT_REC_CLASSES

    rec_name = DICT_REC_CLASSES[algo].RECOMMENDER_NAME
    return f"{rec_name}_{mode}{sim}_{ds}"


def artifact(phase, ds, algo, mode, sim):
    name = cell_name(ds, algo, mode, sim)
    if phase == "tune":
        return os.path.join(ROOT, "experiments", name, "best_params.pkl")
    return os.path.join(ROOT, "test_results", name, "test_results.txt")


def cmd_for(phase, ds, algo, mode, sim, evals):
    mod = "ganmf_tpu.cli.experiment" if phase == "tune" else "ganmf_tpu.cli.run_best"
    cmd = [sys.executable, "-m", mod, ds, algo]
    if mode:
        cmd.append(f"--{mode}")
    if sim:
        cmd.append(sim)
    if phase == "tune":
        cmd += ["--evals", str(evals)]
    return cmd


def main():
    evals = 10
    phase_sel = "both"
    args = sys.argv[1:]
    if "--evals" in args:
        evals = int(args[args.index("--evals") + 1])
    if "--phase" in args:
        phase_sel = args[args.index("--phase") + 1]

    os.makedirs(os.path.dirname(LOG), exist_ok=True)
    env = dict(os.environ)
    env["PYTHONPATH"] = ROOT + ":" + env.get("PYTHONPATH", "")

    all_cells = list(cells())
    phases = ["tune", "test"] if phase_sel == "both" else [phase_sel]
    t_start = time.time()
    # cell-outer / phase-inner: each cell finishes tune AND test before the
    # next starts, so an interrupted matrix leaves complete cells (the
    # datasets are ordered smallest-first for the same reason)
    for ds, algo, mode, sim in all_cells:
        for phase in phases:
            name = cell_name(ds, algo, mode, sim)
            art = artifact(phase, ds, algo, mode, sim)
            if os.path.isfile(art) and phase == "test":
                print(f"SKIP {phase} {name} (artifact exists)", flush=True)
                continue
            if phase == "tune" and os.path.isfile(art):
                # tune is internally resumable; a complete checkpoint makes
                # the rerun a fast no-op, but best_params.pkl means done
                print(f"SKIP tune {name} (best_params.pkl exists)", flush=True)
                continue
            cmd = cmd_for(phase, ds, algo, mode, sim, evals)
            t0 = time.time()
            r = subprocess.run(cmd, env=env, cwd=ROOT,
                               stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
            dt = time.time() - t0
            ok = r.returncode == 0 and os.path.isfile(art)
            row = {"phase": phase, "cell": name, "evals": evals if phase == "tune" else None,
                   "wall_s": round(dt, 1), "ok": ok, "rc": r.returncode,
                   "elapsed_total_s": round(time.time() - t_start, 1)}
            with open(LOG, "a") as fh:
                fh.write(json.dumps(row) + "\n")
            print(json.dumps(row), flush=True)
            if not ok:
                tail = r.stdout.decode(errors="replace").splitlines()[-15:]
                print("\n".join("  ! " + ln for ln in tail), flush=True)


if __name__ == "__main__":
    main()
