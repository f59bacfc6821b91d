from .hashgrid import (
    HashGridConfig, init_hash_table, hash_encode, hash_encode_xla,
    hash_encode_coords, hash_encode_ray, hash_encode_numpy, level_strides,
    encode_level_coords,
)
from .brickgrid import (
    BrickGridConfig, init_brick_table, brick_encode, brick_encode_ray,
    brick_encode_numpy,
)
