from ganmf_tpu.parallel.mesh import MeshPlan, make_mesh
from ganmf_tpu.parallel.distributed import (
    make_distributed_ganmf_step,
    shard_ganmf_params,
    shard_disganmf_params,
    shard_cfgan_params,
    shard_caae_params,
    init_distributed,
)
from ganmf_tpu.parallel import comm
