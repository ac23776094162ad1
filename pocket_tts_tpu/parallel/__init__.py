from pocket_tts_tpu.parallel.mesh import (
    make_mesh,
    shard_batch_tree,
    shard_params,
    state_sharding_spec,
)

__all__ = ["make_mesh", "shard_params", "shard_batch_tree", "state_sharding_spec"]
