#!/usr/bin/env python3
"""Mid-search kill-and-resume demonstration (VERDICT r4 #5).

Launches a real hyperparameter search through the installed CLI
(`python -m ganmf_tpu.cli.experiment`), SIGKILLs the process partway
through its --evals budget, relaunches the identical command, and proves
from the artifacts that the second process resumed from checkpoint.pkl
instead of restarting: the resumed run contributes exactly
(budget - killed_evals) new evaluations and the final checkpoint carries
all `budget` of them (skopt-compatible resume, reference RecSysExp.py:368
CheckpointSaver + gp_minimize x0/y0 warm start).

Writes the receipt JSON to runs/resume_demo.json.

Usage: python scripts/resume_demo.py [dataset] [algo] [--evals N] [--kill-after S]
"""

import json
import os
import pickle
import shutil
import signal
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def n_checkpoint_evals(path):
    if not os.path.isfile(path):
        return 0
    with open(path, "rb") as fh:
        res = pickle.load(fh)
    return len(res.func_vals)


def main():
    args = sys.argv[1:]
    dataset = args[0] if args and not args[0].startswith("--") else "LastFM"
    algo = args[1] if len(args) > 1 and not args[1].startswith("--") else "PureSVD"
    evals = int(args[args.index("--evals") + 1]) if "--evals" in args else 12
    kill_after = float(args[args.index("--kill-after") + 1]) if "--kill-after" in args else 45.0

    # reference experiments/-layout name (RecSysExp.py:154): RECOMMENDER_NAME
    # + "_" + mode + sim + "_" + dataset
    from ganmf_tpu.cli.experiment import DICT_REC_CLASSES

    cell = f"{DICT_REC_CLASSES[algo].RECOMMENDER_NAME}__{dataset}"
    exp_dir = os.path.join(ROOT, "experiments", cell)
    ckpt = os.path.join(exp_dir, "checkpoint.pkl")
    if os.path.isdir(exp_dir):
        shutil.rmtree(exp_dir)  # a fresh search, so the kill is mid-flight

    env = dict(os.environ)
    env["PYTHONPATH"] = ROOT + ":" + env.get("PYTHONPATH", "")
    cmd = [sys.executable, "-m", "ganmf_tpu.cli.experiment", dataset, algo,
           "--evals", str(evals)]

    # -- phase 1: launch and SIGKILL mid-search --------------------------------
    t0 = time.time()
    proc = subprocess.Popen(cmd, env=env, cwd=ROOT,
                            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    killed_at_evals = 0
    while time.time() - t0 < kill_after + 300:
        time.sleep(2.0)
        if proc.poll() is not None:
            raise SystemExit(
                f"search finished before the kill window — raise --evals or "
                f"lower --kill-after (rc={proc.returncode})")
        n = n_checkpoint_evals(ckpt)
        # kill only once real progress is checkpointed but the budget isn't
        if n >= max(2, evals // 4) and time.time() - t0 >= kill_after:
            killed_at_evals = n
            proc.send_signal(signal.SIGKILL)
            proc.wait()
            break
    assert killed_at_evals and killed_at_evals < evals, (
        f"kill missed its window (checkpointed evals: {killed_at_evals})")
    print(f"killed search at {killed_at_evals}/{evals} evals "
          f"(t+{time.time()-t0:.0f}s)", flush=True)

    # -- phase 2: identical relaunch must resume, not restart ------------------
    t1 = time.time()
    r = subprocess.run(cmd, env=env, cwd=ROOT,
                       stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    out = r.stdout.decode(errors="replace")
    resumed_evals = n_checkpoint_evals(ckpt)
    best_params = os.path.join(exp_dir, "best_params.pkl")

    receipt = {
        "cell": cell,
        "evals_budget": evals,
        "killed_at_evals": killed_at_evals,
        "final_checkpoint_evals": resumed_evals,
        "resume_ran_only_remaining": resumed_evals == evals,
        "best_params_written": os.path.isfile(best_params),
        "phase1_wall_s": round(time.time() - t1 + (t1 - t0), 1),
        "phase2_wall_s": round(time.time() - t1, 1),
        "rc": r.returncode,
    }
    os.makedirs(os.path.join(ROOT, "runs"), exist_ok=True)
    with open(os.path.join(ROOT, "runs", "resume_demo.json"), "w") as fh:
        json.dump(receipt, fh, indent=1)
    print(json.dumps(receipt, indent=1), flush=True)
    if not (receipt["resume_ran_only_remaining"] and receipt["best_params_written"]):
        print(out[-3000:])
        raise SystemExit("resume receipt FAILED")
    print("resume receipt OK", flush=True)


if __name__ == "__main__":
    main()
