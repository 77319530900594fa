"""ganmf-tpu: a TPU-native (JAX/XLA/Pallas) recommender-systems framework.

A from-scratch rebuild of the capabilities of the GANMF research framework
(SAC'22, "GAN-based Matrix Factorization for Recommender Systems"): four
adversarial collaborative-filtering recommenders (GANMF, DisGANMF, CFGAN,
CAAE), the classical baselines (TopPop, PureSVD, IALS, SLIM-BPR, ItemKNN,
P3alpha, ...), a holdout top-K ranking evaluator with ~20 metrics, a dataset
pipeline (ingest / reindex / k-core / per-user split), a Bayesian
hyperparameter search harness, and artifact-compatible experiment CLIs.

Design principles (TPU-first, not a port):
  * The user-item matrix lives dense in HBM; training epochs are single
    jitted ``lax.scan`` programs (no per-step host round trips).
  * Scoring and evaluation are vectorized device programs built around
    ``lax.top_k``; metrics are computed on device and reduced once.
  * Multi-chip scaling goes through ``jax.sharding.Mesh`` + collectives
    (see :mod:`ganmf_tpu.parallel`), never through host-side loops.
"""

__version__ = "0.1.0"

from ganmf_tpu.utils.seeding import set_seed  # noqa: F401
