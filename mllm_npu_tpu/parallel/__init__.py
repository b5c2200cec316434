from mllm_npu_tpu.parallel.mesh import MeshConfig, build_mesh
from mllm_npu_tpu.parallel.sharding import (batch_sharding, infer_param_specs,
                                            shard_params)

__all__ = ["MeshConfig", "build_mesh", "infer_param_specs", "shard_params",
           "batch_sharding"]
