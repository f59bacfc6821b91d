from .hashgrid import (
    HashGridConfig, init_hash_table, hash_encode, hash_encode_xla,
    hash_encode_numpy,
)
