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

import os as _os


def _enable_compilation_cache() -> None:
    """Point JAX at a persistent on-disk compilation cache.

    The reference use-case is 50-trial x 54-config hyperparameter sweeps
    (reference RecSysExp.py:417, get_best_params.sh) where each trial is a
    fresh process: without a persistent cache every process re-pays
    10-100x of XLA compile over actual compute (e.g. 417 s wall for ~26 s
    of GANMF LastFM epochs).  ``JAX_COMPILATION_CACHE_DIR`` overrides the
    location; set it to the empty string to disable entirely.
    """
    cache_dir = _os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if cache_dir == "":
        return  # explicit opt-out
    if cache_dir is None:
        cache_dir = _os.path.join(
            _os.path.expanduser("~"), ".cache", "ganmf_tpu", "jax_cache"
        )
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache every compilation that takes measurable time; the default
        # 1 s floor skips most of the small per-model programs whose
        # aggregate compile cost dominates harness wall time.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - never block import on cache setup
        pass


_enable_compilation_cache()

from ganmf_tpu.utils.seeding import set_seed  # noqa: F401
