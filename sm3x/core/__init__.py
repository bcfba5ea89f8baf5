from sm3x.core.precision import Policy, DEFAULT_POLICY, FP32_POLICY
from sm3x.core.mesh import make_mesh, data_sharding, replicated_sharding
from sm3x.core.prng import step_rng, fold_in_axis
from sm3x.core.cache import enable_compilation_cache
from sm3x.core.config import (
    DataConfig,
    ModelConfig,
    OptimConfig,
    RunConfig,
    SSLConfig,
    MLCTrainConfig,
    EvalConfig,
)

__all__ = [
    "Policy",
    "DEFAULT_POLICY",
    "FP32_POLICY",
    "make_mesh",
    "data_sharding",
    "replicated_sharding",
    "enable_compilation_cache",
    "step_rng",
    "fold_in_axis",
    "DataConfig",
    "ModelConfig",
    "OptimConfig",
    "RunConfig",
    "SSLConfig",
    "MLCTrainConfig",
    "EvalConfig",
]
