"""Fake prior backends: ground-truth depth/normals from an analytic scene.

The reference cannot run without 5+ GB of model checkpoints; these fakes keep
the FULL progressive pipeline testable hermetically (SURVEY §4's "fake heavy
models" seam). They consume the view geometry the caller already has and
return what a perfect monocular network would, optionally corrupted with
noise / per-view scale so the fusion optimizers have real work to do.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.synthetic import cube_room_hit
from .interface import DepthPredictor, NormalPredictor


# jitted cores (cached by shape): the joint predictor calls these once per
# anchor on [60, 384, 384, 3] view stacks — eager jnp would pay a ~25 ms
# tunneled dispatch per op on the axon backend
@jax.jit
def _fake_depth_core(origin, dirs, room):
    d = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    t, _ = cube_room_hit(origin, d, room)
    return jnp.maximum(t, 1e-4)


@jax.jit
def _fake_normal_core(origin, dirs, c2w, room):
    d = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    _, n_world = cube_room_hit(origin, d, room)
    n_cam = jnp.einsum("vij,vhwi->vhwj", c2w, n_world)
    return n_cam * 0.5 + 0.5


class FakeCubeRoomDepthPredictor(DepthPredictor):
    """Perfect (up to noise/scale) monocular DEPTH for the cube room.

    Returns distance along the ray direction rather than z-depth. The caller
    (``PanoJointPredictor``) mean-normalizes each view's prediction and then
    multiplies by ``pers_ratios`` (z-depth -> distance conversion), so the
    fake's output differs from a true z-depth map only by a smooth per-pixel
    factor that the fusion optimizer absorbs — and the per-view scale is
    arbitrary anyway (normalized out).
    """

    def __init__(self, room: float = 0.8, noise: float = 0.0,
                 scale_jitter: float = 0.0, seed: int = 0):
        self.room = room
        self.noise = noise
        self.scale_jitter = scale_jitter
        self._rng = np.random.default_rng(seed)

    def predict_depth(self, imgs, intri=None, dirs=None, origin=None):
        assert dirs is not None, "fake depth predictor needs view dirs"
        o = jnp.zeros_like(dirs) if origin is None else jnp.broadcast_to(
            origin, dirs.shape)
        t = _fake_depth_core(o, dirs, jnp.float32(self.room))
        if self.scale_jitter:
            s = self._rng.uniform(1.0 - self.scale_jitter, 1.0 + self.scale_jitter,
                                  (dirs.shape[0], 1, 1, 1)).astype(np.float32)
            t = t * jnp.asarray(s)
        if self.noise:
            t = t * (1.0 + self.noise * jnp.asarray(
                self._rng.normal(size=t.shape).astype(np.float32)))
        return jnp.maximum(t, 1e-4)


class FakeCubeRoomNormalPredictor(NormalPredictor):
    """Perfect monocular normals for the cube room, returned in CAMERA space
    mapped to [0, 1] (the reference's Omnidata convention: callers do *2-1,
    normalize, then rotate by the view's c2w)."""

    def __init__(self, room: float = 0.8, noise: float = 0.0, seed: int = 0):
        self.room = room
        self.noise = noise
        self._rng = np.random.default_rng(seed)

    def predict_normal(self, imgs, dirs=None, origin=None, c2w=None):
        assert dirs is not None and c2w is not None, \
            "fake normal predictor needs view dirs + c2w"
        o = jnp.zeros_like(dirs) if origin is None else jnp.broadcast_to(
            origin, dirs.shape)
        # world -> camera (n_cam = c2w^T n_world per view) happens inside
        # the jitted core
        out = _fake_normal_core(o, dirs, jnp.asarray(c2w),
                                jnp.float32(self.room))
        if self.noise:
            n_cam = out * 2.0 - 1.0
            n_cam = n_cam + self.noise * jnp.asarray(
                self._rng.normal(size=n_cam.shape).astype(np.float32))
            n_cam = n_cam / jnp.linalg.norm(n_cam, axis=-1, keepdims=True)
            out = n_cam * 0.5 + 0.5
        return out
