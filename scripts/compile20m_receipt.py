#!/usr/bin/env python3
"""Compile-time-at-scale receipt (VERDICT r4 #6).

The r4 scale proof recorded GANMF[20M] first fit = 362.6 s of one-time
XLA compile for a 3.8 s steady epoch (PERF.md), measured with a cold
persistent cache. The framework's answer to harness-shaped workloads
(50-trial sweeps, each trial a fresh process — reference RecSysExp.py:417)
is the persistent compilation cache (ganmf_tpu/__init__.py); this receipt
measures what a FRESH PROCESS actually pays at ML-20M shapes with that
cache warm.

Usage:
  python scripts/compile20m_receipt.py child <model>   # one fresh fit, prints JSON
  python scripts/compile20m_receipt.py                 # warm the cache, then time
                                                       # fresh-process fits; appends
                                                       # PERF rows

The contrast number (cold cache: 362.6 s) is kept from the r4 run rather
than re-burning six chip-minutes; the reference's TF1 graph build is
seconds (GANRec/GANMF.py:97-105) but is paid per-process with no cache at
all.
"""

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def child(model: str):
    import jax.numpy as jnp

    from ganmf_tpu.cli.experiment import load_urms

    t_load0 = time.time()
    splits = load_urms("20M")
    load_s = time.time() - t_load0

    t0 = time.time()
    if model == "ganmf":
        from ganmf_tpu.models import GANMF

        m = GANMF(splits.train, mode="user", seed=1337, is_experiment=True)
        m.fit(epochs=1, num_factors=128, emb_dim=128, batch_size=512,
              d_lr=1e-4, g_lr=1e-4, recon_coefficient=0.05, m=5,
              urm_storage="csr")
        float(jnp.sum(m.params.user_emb))
    else:
        from ganmf_tpu.models import IALSRecommender

        m = IALSRecommender(splits.train)
        m.fit(epochs=1, num_factors=96, alpha=5.0, reg=1e-2, urm_storage="csr")
        float(jnp.sum(m._U_dev))
    fit_s = time.time() - t0
    print(json.dumps({"model": model, "load_s": round(load_s, 2),
                      "first_fit_s": round(fit_s, 2)}), flush=True)


def main():
    from _timing import atomic_json_dump  # noqa: F401  (env check)

    env = dict(os.environ)
    env["PYTHONPATH"] = ROOT + ":" + env.get("PYTHONPATH", "")

    rows = {}
    for model in ("ganmf", "ials"):
        # warm pass in-process would poison the measurement; everything runs
        # in fresh children. First child may still top up the cache; the
        # second child is the honest warm number.
        out = []
        for attempt in range(2):
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "child", model],
                env=env, cwd=ROOT, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
            tail = r.stdout.decode(errors="replace").strip().splitlines()
            data = None
            for ln in reversed(tail):
                try:
                    data = json.loads(ln)
                    break
                except json.JSONDecodeError:
                    continue
            if data is None:
                print("\n".join(tail[-20:]))
                raise SystemExit(f"child {model} produced no JSON (rc={r.returncode})")
            print(json.dumps({"model": model, "attempt": attempt, **data}), flush=True)
            out.append(data)
        rows[model] = out

    import perf_report

    perf_rows = {}
    if os.path.isfile("PERF.json"):
        perf_rows = {k: tuple(v) for k, v in json.load(open("PERF.json")).items()}
    for model, out in rows.items():
        name = f"{model.upper()}[20M] fresh-process first fit (warm compile cache)"
        note = (f"1 epoch incl. program load; cache-topping first run "
                f"{out[0]['first_fit_s']:.1f}s; cold-cache r4 contrast 362.6s (GANMF)")
        perf_rows[name] = (out[1]["first_fit_s"], note)
    atomic_json_dump({k: list(v) for k, v in perf_rows.items()}, "PERF.json")
    perf_report._write(perf_rows)
    print("PERF rows written", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "child":
        child(sys.argv[2])
    else:
        main()
