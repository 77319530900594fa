"""Guards for the documented user-facing surface (MIGRATION.md, pyproject).

Every import row in MIGRATION.md's mapping table and every console-script
target in pyproject.toml must resolve; a rename anywhere in the package
breaks this test before it breaks a migrating user.
"""

import importlib
import re
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

# (module, attribute) for every ganmf_tpu symbol MIGRATION.md maps to
MAPPED = [
    ("ganmf_tpu.models", "GANMF"),
    ("ganmf_tpu.models", "DisGANMF"),
    ("ganmf_tpu.models", "CFGAN"),
    ("ganmf_tpu.models", "CAAE"),
    ("ganmf_tpu.models", "TopPop"),
    ("ganmf_tpu.models", "Random"),
    ("ganmf_tpu.models", "GlobalEffects"),
    ("ganmf_tpu.models", "PureSVDRecommender"),
    ("ganmf_tpu.models", "IALSRecommender"),
    ("ganmf_tpu.models", "MatrixFactorization_BPR"),
    ("ganmf_tpu.models", "MatrixFactorization_FunkSVD"),
    ("ganmf_tpu.models", "MatrixFactorization_AsySVD"),
    ("ganmf_tpu.models", "SLIM_BPR"),
    ("ganmf_tpu.models", "ItemKNNCFRecommender"),
    ("ganmf_tpu.models", "UserKNNCFRecommender"),
    ("ganmf_tpu.models.itemknn", "ItemKNNCustomSimilarityRecommender"),
    ("ganmf_tpu.models.itemknn", "ItemKNNSimilarityHybridRecommender"),
    ("ganmf_tpu.models", "P3alphaRecommender"),
    ("ganmf_tpu.models", "RP3betaRecommender"),
    ("ganmf_tpu.models", "EASE_R_Recommender"),
    ("ganmf_tpu.models", "NMFRecommender"),
    ("ganmf_tpu.eval", "EvaluatorHoldout"),
    ("ganmf_tpu.eval", "EvaluatorNegativeItemSample"),
    ("ganmf_tpu.ops.similarity", "compute_similarity"),
    ("ganmf_tpu.models.base", "check_matrix"),
    ("ganmf_tpu.models.base", "similarity_matrix_topk"),
    ("ganmf_tpu.utils.dataio", "DataIO"),
    ("ganmf_tpu.utils.weighting", "okapi_BM_25"),
    ("ganmf_tpu.utils.weighting", "TF_IDF"),
    ("ganmf_tpu.data.datasets", "Movielens"),
    ("ganmf_tpu.data.datasets", "LastFM"),
    ("ganmf_tpu.data", "load_reference_splits"),
    ("ganmf_tpu.data", "make_experiment_splits"),
    ("ganmf_tpu.parallel", "make_mesh"),
    ("ganmf_tpu.utils.checkpoint", "TrainCheckpointer"),
    ("ganmf_tpu.parallel.comm", "initialize"),
]


def test_migration_mapped_symbols_resolve():
    for module, attr in MAPPED:
        mod = importlib.import_module(module)
        assert hasattr(mod, attr), f"{module}.{attr} missing"


def test_pyproject_console_script_targets_resolve():
    text = (REPO / "pyproject.toml").read_text()
    targets = re.findall(r'^\S+\s*=\s*"([\w.]+):(\w+)"', text, flags=re.M)
    assert len(targets) >= 4
    for module, func in targets:
        mod = importlib.import_module(module)
        assert callable(getattr(mod, func)), f"{module}:{func} not callable"


def test_migration_table_modules_exist():
    """Every `ganmf_tpu...` dotted path named in MIGRATION.md imports."""
    text = (REPO / "MIGRATION.md").read_text()
    for match in set(re.findall(r"from (ganmf_tpu[\w.]*) import ([\w, ]+)", text)):
        mod = importlib.import_module(match[0])
        for attr in match[1].split(","):
            assert hasattr(mod, attr.strip()), f"{match[0]}.{attr.strip()} missing"
