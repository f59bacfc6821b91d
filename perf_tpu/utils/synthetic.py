"""Synthetic analytic scenes for hermetic tests, fake priors, and benches.

The reference has no test assets (and its example panos are stripped blobs in
this snapshot), so a closed-form "cube room" stands in: walls of a cube of
half-extent ``room`` centered at the origin, with a smooth procedural texture.
Everything is exact — ray/wall distances, inward normals — which lets fake
depth predictors and golden-image tests be ground-truth-consistent.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core import gen_pano_rays, img_coord_from_hw


def cube_room_hit(o: jnp.ndarray, d: jnp.ndarray, room: float = 0.8):
    """Distance + inward normal of the first cube-wall hit.

    o, d: [..., 3] (d unit). Returns (t [..., 1], normal [..., 3]).
    Points must be strictly inside the room.
    """
    eps = 1e-9
    safe_d = jnp.where(jnp.abs(d) < eps, eps, d)
    # exit distance per axis: hit +room when d>0, -room when d<0
    t_axis = (jnp.sign(safe_d) * room - o) / safe_d      # [..., 3]
    t = jnp.min(t_axis, axis=-1, keepdims=True)
    axis = jnp.argmin(t_axis, axis=-1)
    sign = jnp.take_along_axis(jnp.sign(safe_d), axis[..., None], -1)[..., 0]
    normal = -sign[..., None] * jnp.eye(3)[axis]         # inward
    return t, normal


def cube_room_color(pts: jnp.ndarray) -> jnp.ndarray:
    """Smooth procedural wall texture in [0, 1]."""
    f = jnp.stack([
        0.5 + 0.5 * jnp.sin(6.0 * pts[..., 0] + 2.0 * pts[..., 1]),
        0.5 + 0.5 * jnp.sin(5.0 * pts[..., 1] + 3.0 * pts[..., 2]),
        0.5 + 0.5 * jnp.sin(4.0 * pts[..., 2] + 7.0 * pts[..., 0]),
    ], axis=-1)
    return f


def render_cube_room_pano(pose: jnp.ndarray, height: int, width: int,
                          room: float = 0.8):
    """Ground-truth RGB-D-N pano of the cube room from ``pose``.

    Returns dict(rgb [H,W,3], distance [H,W,1], normal [H,W,3]).
    """
    rays = gen_pano_rays(pose, height, width)
    t, normal = cube_room_hit(rays.o, rays.d, room)
    pts = rays.o + rays.d * t
    return {"rgb": cube_room_color(pts), "distance": t, "normal": normal}


def psnr(a, b) -> float:
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mse = np.mean((a - b) ** 2)
    return float(10.0 * np.log10(1.0 / max(mse, 1e-12)))
