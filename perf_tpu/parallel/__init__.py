from .mesh import (
    make_mesh, make_multihost_mesh, replicated, ray_sharding, scene_sharding,
    scene_ray_sharding, table_sharding, shard_params, shard_rays,
)
from .dp import build_dp_train_step, build_dp_render
from .multi_scene import init_multi_scene_params, build_multi_scene_step
