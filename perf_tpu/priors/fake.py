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


class FakeCubeRoomDepthPredictor(DepthPredictor):
    """Perfect (up to noise/scale) monocular DEPTH for the cube room.

    Returns z-depth along the view axis is not needed — the reference's
    consumers multiply by ``pers_ratios`` to turn z-depth into distance, so we
    return distance / pers_ratio... to stay consistent we simply return
    DISTANCE divided by the per-pixel ratio is the caller's job; here we
    return distance along the ray direction and let callers treat it as
    "depth" (the fake's per-view scale is arbitrary anyway — normalized out).
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
        t, _ = cube_room_hit(o, dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True),
                             self.room)
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
        d = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        _, n_world = cube_room_hit(o, d, self.room)
        # world -> camera: n_cam = c2w^T n_world (per view)
        n_cam = jnp.einsum("vij,vhwi->vhwj", jnp.asarray(c2w), n_world)
        if self.noise:
            n_cam = n_cam + self.noise * jnp.asarray(
                self._rng.normal(size=n_cam.shape).astype(np.float32))
            n_cam = n_cam / jnp.linalg.norm(n_cam, axis=-1, keepdims=True)
        return n_cam * 0.5 + 0.5
