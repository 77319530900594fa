#!/usr/bin/env python3
"""Best-of-4 value-readback-synced ItemKNN 20M fit timing (the PERF row
receipt; run on the real chip). Each fit constructs a fresh model on the
same train matrix — the padded-plane content cache (data/device.py) makes
this the tuning-workload steady state."""
import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
from ganmf_tpu.cli.experiment import load_urms
from ganmf_tpu.models import ItemKNNCFRecommender

train = load_urms("20M").train
for i in range(4):
    m = ItemKNNCFRecommender(train)
    t0 = time.time()
    m.fit(topK=300, shrink=0, similarity="cosine")
    w = m._device_w
    float(jnp.sum(w))
    print(f"fit {i}: {time.time()-t0:.2f}s", flush=True)
    del m, w
