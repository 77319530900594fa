#!/usr/bin/env python3
"""Compare two PARITY.json files and report per-config MAP@20 drift.

Usage: python scripts/parity_drift.py <old.json> [new.json=PARITY.json]

Used after a full re-sweep at a new HEAD to separate real regressions
from the documented GAN seed noise (PARITY_SEEDS.md): deterministic
algorithms must show drift ~0; GAN rows may move within their measured
seed bands.
"""
import json
import sys

old = json.load(open(sys.argv[1]))
new = json.load(open(sys.argv[2] if len(sys.argv) > 2 else "PARITY.json"))

worst = []
for key in sorted(new):
    if key not in old or "MAP@20" not in new[key] or "MAP@20" not in old.get(key, {}):
        print(f"{key:45s} NEW (no previous entry)")
        continue
    d = new[key]["MAP@20"]["ours"] - old[key]["MAP@20"]["ours"]
    worst.append((abs(d), key, d))
for _, key, d in sorted(worst, reverse=True):
    flag = "" if abs(d) < 1e-4 else ("  << GAN-noise band?" if abs(d) < 5e-3 else "  << INVESTIGATE")
    print(f"{key:45s} dMAP {d:+.6f}{flag}")
missing = sorted(set(old) - set(new))
if missing:
    print("\nmissing from new:", ", ".join(missing))
