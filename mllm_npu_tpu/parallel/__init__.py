from mllm_npu_tpu.parallel.mesh import MeshConfig, build_mesh
from mllm_npu_tpu.parallel.sharding import (batch_sharding, infer_param_specs,
                                            shard_params)

__all__ = ["MeshConfig", "build_mesh", "infer_param_specs", "shard_params",
           "batch_sharding", "pipeline"]


def __getattr__(name):
    # lazy: pipeline pulls in the model layer; keep `import
    # mllm_npu_tpu.parallel` light for mesh-only users
    if name == "pipeline":
        from mllm_npu_tpu.parallel import pipeline
        return pipeline
    raise AttributeError(name)
