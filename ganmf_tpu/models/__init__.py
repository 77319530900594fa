from ganmf_tpu.models.base import (
    Recommender,
    MatrixFactorizationRecommender,
    ItemSimilarityRecommender,
    UserSimilarityRecommender,
)
from ganmf_tpu.models.toppop import TopPop, Random, GlobalEffects
from ganmf_tpu.models.puresvd import PureSVDRecommender
from ganmf_tpu.models.ials import IALSRecommender
from ganmf_tpu.models.itemknn import ItemKNNCBFRecommender, ItemKNNCFRecommender, UserKNNCFRecommender
from ganmf_tpu.models.p3alpha import P3alphaRecommender, RP3betaRecommender
from ganmf_tpu.models.slim_bpr import SLIM_BPR
from ganmf_tpu.models.mf_sgd import (
    MatrixFactorization_AsySVD,
    MatrixFactorization_BPR,
    MatrixFactorization_FunkSVD,
)
from ganmf_tpu.models.extras import EASE_R_Recommender, NMFRecommender, PredefinedListRecommender
from ganmf_tpu.models.irgan import IRGAN_Recommender
from ganmf_tpu.models.ganmf import GANMF
from ganmf_tpu.models.disganmf import DisGANMF
from ganmf_tpu.models.cfgan import CFGAN
from ganmf_tpu.models.caae import CAAE

GAN_MODELS = (GANMF, DisGANMF, CFGAN, CAAE)
