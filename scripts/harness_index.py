#!/usr/bin/env python3
"""Generate HARNESS.md — the artifact index for the reference-workload
matrix (VERDICT r4 #5): one row per completed cell with its tune receipt
(evals, best validation MAP from results.txt) and test receipt (test MAP@20
from test_results.txt), straight from the experiments/ and test_results/
trees that scripts/harness_matrix.py produces through the installed CLIs.

Usage: python scripts/harness_index.py  (rewrites HARNESS.md)
"""

import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def tune_receipt(cell):
    d = os.path.join(ROOT, "experiments", cell)
    bp = os.path.join(d, "best_params.txt")
    res = os.path.join(d, "results.txt")
    if not os.path.isfile(bp):
        return None
    n_evals = best_map = None
    if os.path.isfile(res):
        maps = []
        for line in open(res, errors="replace"):
            m = re.search(r"MAP[:=]\s*([0-9.]+)", line)
            if m:
                maps.append(float(m.group(1)))
        n_evals = len(maps)
        if maps:
            best_map = max(maps)
    return {"evals": n_evals, "best_val_MAP": best_map,
            "params": open(bp).read().strip()[:120]}


def test_receipt(cell):
    p = os.path.join(ROOT, "test_results", cell, "test_results.txt")
    if not os.path.isfile(p):
        return None
    for line in open(p, errors="replace"):
        if line.startswith("CUTOFF: 20"):
            m = re.search(r"MAP:\s*([0-9.]+)", line)
            n = re.search(r"NDCG:\s*([0-9.]+)", line)
            return {"MAP@20": float(m.group(1)) if m else None,
                    "NDCG@20": float(n.group(1)) if n else None}
    return {}


def main():
    from scripts.harness_matrix import cells, cell_name

    wall = {}
    log = os.path.join(ROOT, "runs", "harness_matrix.jsonl")
    if os.path.isfile(log):
        for line in open(log):
            row = json.loads(line)
            wall[(row["phase"], row["cell"])] = row["wall_s"]

    lines = [
        "# Reference-workload matrix — artifact index",
        "",
        "The full `get_best_params.sh` x `get_test_results.sh` workload run",
        "through the installed CLIs (`ganmf_tpu.cli.experiment` /",
        "`ganmf_tpu.cli.run_best`), one subprocess per cell exactly like the",
        "reference's shell loops, at `--evals 10`. Artifacts live in the",
        "reference's `experiments/<cell>/` layout (best_params.pkl/.txt,",
        "results.txt, checkpoint.pkl — RecSysExp.py:313-412) and",
        "`test_results/<cell>/test_results.txt`. `runs/harness_matrix.jsonl`",
        "holds one progress row per completed phase; the matrix is",
        "kill-and-resumable (finished cells are skipped on relaunch), and",
        "`runs/resume_demo.json` is the mid-search SIGKILL/resume receipt.",
        "",
        "Regenerate with `python scripts/harness_index.py` after",
        "`python scripts/harness_matrix.py --evals 10`.",
        "",
        "| cell | tune evals | best val MAP | tune wall s | test MAP@20 | test NDCG@20 | test wall s |",
        "|---|---|---|---|---|---|---|",
    ]
    done = total = 0
    for ds, algo, mode, sim in cells():
        cell = cell_name(ds, algo, mode, sim)
        total += 1
        t = tune_receipt(cell)
        r = test_receipt(cell)
        if not t and not r:
            continue
        done += 1
        fmt = lambda v, p="%.5f": (p % v) if isinstance(v, float) else (v if v is not None else "—")
        lines.append(
            f"| {cell} | {t['evals'] if t else '—'} | "
            f"{fmt(t['best_val_MAP']) if t else '—'} | "
            f"{wall.get(('tune', cell), '—')} | "
            f"{fmt(r['MAP@20']) if r else '—'} | "
            f"{fmt(r['NDCG@20']) if r else '—'} | "
            f"{wall.get(('test', cell), '—')} |")
    lines.insert(2, f"**{done}/{total} cells complete** at last regeneration.")
    lines.insert(3, "")
    with open(os.path.join(ROOT, "HARNESS.md"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"HARNESS.md: {done}/{total} cells")


if __name__ == "__main__":
    main()
