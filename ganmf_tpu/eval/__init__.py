from ganmf_tpu.eval.evaluator import EvaluatorHoldout, EvaluatorNegativeItemSample, get_result_string
from ganmf_tpu.eval.metrics import METRIC_ORDER
