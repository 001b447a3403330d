"""Multi-chip execution: meshes, shardings, sharded train/inference steps."""

from .mesh import (batch_sharding, cache_sharding, encoder_param_sharding,
                   llama_param_sharding, make_mesh, shard_llama_params)
from .train import causal_lm_loss, sgd_train_step

__all__ = ["make_mesh", "llama_param_sharding", "shard_llama_params",
           "batch_sharding", "cache_sharding", "encoder_param_sharding",
           "causal_lm_loss", "sgd_train_step"]
