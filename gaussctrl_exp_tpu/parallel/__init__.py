from .sharded import (
    ShardedRenderConfig,
    make_mesh,
    make_sharded_render_loss,
    make_sharded_train_step,
    shard_params,
)

__all__ = [
    "ShardedRenderConfig",
    "make_mesh",
    "make_sharded_render_loss",
    "make_sharded_train_step",
    "shard_params",
]
