"""Ray containers as JAX pytrees.

Counterpart of the reference's ``utils/camera_utils.py:10-35`` (``Rays`` /
``BoundedRays`` torch dataclasses), re-done as ``flax.struct`` pytrees so rays
flow through ``jit`` / ``vmap`` / ``shard_map`` like any other array.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Rays:
    """A bundle of rays. Leading dims are free; last dim of o/d is 3."""

    o: jnp.ndarray  # [..., 3] origins
    d: jnp.ndarray  # [..., 3] directions (unit-norm by convention)

    def __len__(self) -> int:
        return self.o.shape[0]

    def __getitem__(self, idx) -> "Rays":
        return Rays(self.o[idx], self.d[idx])

    @property
    def shape(self):
        return self.o.shape[:-1]

    def reshape(self, *shape) -> "Rays":
        return Rays(self.o.reshape(*shape, 3), self.d.reshape(*shape, 3))

    def collapse(self):
        return self.o, self.d


@struct.dataclass
class BoundedRays:
    """Rays with near/far bounds ([..., 1] each)."""

    o: jnp.ndarray
    d: jnp.ndarray
    near: jnp.ndarray
    far: jnp.ndarray

    def __len__(self) -> int:
        return self.o.shape[0]

    def __getitem__(self, idx) -> "BoundedRays":
        return BoundedRays(self.o[idx], self.d[idx], self.near[idx], self.far[idx])

    def collapse(self):
        return self.o, self.d, self.near, self.far


def cat_rays(rays_list) -> Rays:
    return Rays(
        jnp.concatenate([r.o for r in rays_list], axis=0),
        jnp.concatenate([r.d for r in rays_list], axis=0),
    )
