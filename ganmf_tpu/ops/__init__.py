from ganmf_tpu.ops.similarity import compute_similarity
