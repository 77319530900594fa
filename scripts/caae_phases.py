#!/usr/bin/env python3
"""Attribute CAAE steady-epoch cost to its phases by differencing epochs
with individual phases zeroed (d_steps/g_steps/gpr_steps = 0). Usage:
python scripts/caae_phases.py [1M|LastFM|hetrec2011]."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _timing import epoch_time

import jax
import jax.numpy as jnp

from ganmf_tpu.data.splits import load_reference_splits
from ganmf_tpu.models import CAAE

DS = sys.argv[1] if len(sys.argv) > 1 else "LastFM"
BASE = dict(g_units=100, num_factors=50, d_bsize=4096, m_batch=128)
N = 41


train = load_reference_splits(DS).train
variants = {
    "full (2,2,2)": dict(d_steps=2, g_steps=2, gpr_steps=2),
    "no D (0,2,2)": dict(d_steps=0, g_steps=2, gpr_steps=2),
    "no G (2,0,2)": dict(d_steps=2, g_steps=0, gpr_steps=2),
    "no Gpr (2,2,0)": dict(d_steps=2, g_steps=2, gpr_steps=0),
    "none (0,0,0)": dict(d_steps=0, g_steps=0, gpr_steps=0),
}
out = {}
for name, steps in variants.items():
    t = epoch_time(lambda: CAAE(train, seed=1, is_experiment=True), dict(BASE, **steps), n_epochs=N)
    out[name] = t * 1e3
    print(json.dumps({"variant": name, "ms": round(t * 1e3, 2)}), flush=True)
print(json.dumps({"dataset": DS, "ms": {k: round(v, 2) for k, v in out.items()}}))
