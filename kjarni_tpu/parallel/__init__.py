"""Multi-chip execution: meshes, shardings, sharded train/inference steps."""

from .mesh import (bart_param_sharding, batch_sharding, cache_sharding,
                   encoder_param_sharding, llama_param_sharding, make_mesh,
                   shard_llama_params, shard_params_with, t5_param_sharding,
                   whisper_param_sharding)
from .train import causal_lm_loss, sgd_train_step

__all__ = ["make_mesh", "llama_param_sharding", "shard_llama_params",
           "batch_sharding", "cache_sharding", "encoder_param_sharding",
           "t5_param_sharding", "bart_param_sharding",
           "whisper_param_sharding", "shard_params_with",
           "causal_lm_loss", "sgd_train_step"]
