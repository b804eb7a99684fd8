from colormipsearch_tpu.parallel.mesh import (
    create_mesh,
    make_sharded_search_step,
    shard_target_planes,
)

__all__ = ["create_mesh", "make_sharded_search_step", "shard_target_planes"]
