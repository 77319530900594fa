from ganmf_tpu.tune.space import Categorical, Integer, Real
from ganmf_tpu.tune.gp import OptimizeResult, dummy_minimize, gp_minimize
