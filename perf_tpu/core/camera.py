"""Spherical / equirectangular camera math.

Behavioral counterpart of the reference's ``utils/camera_utils.py`` (PeRF),
written fresh in jnp. Conventions (matching the reference so that checkpoints,
poses and panoramas are interchangeable):

- World frame is z-up.
- Image coordinates are (row_frac, col_frac) in [0, 1] at pixel centers.
- Pano coordinates are (beta, alpha): beta = latitude in [-pi/2, pi/2]
  (top image row -> +pi/2), alpha = longitude in [-pi, pi] (leftmost image
  column -> +pi, i.e. both axes are negated relative to image coords; see
  reference ``camera_utils.py:113-127``).
- A direction for pano coord (beta, alpha) is
  [cos(alpha)cos(beta), sin(alpha)cos(beta), sin(beta)]
  (reference ``camera_utils.py:137-142``).
- Perspective cameras are OpenCV style: x right, y down, z forward
  (reference ``camera_utils.py:60-80``).

All functions are pure jnp and jit/vmap-safe on any leading batch shape.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .rays import Rays


# ---------------------------------------------------------------------------
# pose / rotation helpers
# ---------------------------------------------------------------------------

def apply_rot(pts: jnp.ndarray, rot: jnp.ndarray) -> jnp.ndarray:
    """Rotate points [..., 3] by a single 3x3 rotation matrix.

    Full f32 precision: on TPU the default matmul precision is bf16, which is
    far too coarse for camera geometry.
    """
    return jnp.einsum("ij,...j->...i", rot, pts, precision=jax.lax.Precision.HIGHEST)


def apply_rot_trans(pts: jnp.ndarray, rot: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    return apply_rot(pts, rot) + pos


def apply_transform(pts: jnp.ndarray, pose: jnp.ndarray) -> jnp.ndarray:
    """Apply a 4x4 (or 3x4) pose to points [..., 3]."""
    return apply_rot_trans(pts, pose[:3, :3], pose[:3, 3])


def normalize(v: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    if eps:
        n = jnp.maximum(n, eps)
    return v / n


def look_at(to_vec: jnp.ndarray, up_vec: jnp.ndarray | None = None) -> jnp.ndarray:
    """Build c2w rotations [n, 3, 3] whose +z axis is ``to_vec``.

    Column convention (right, down, forward) matches the reference
    ``camera_utils.py:83-98``: default up is +z world, camera y points down.
    """
    to_vec = normalize(to_vec)
    if up_vec is None:
        up_vec = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], to_vec.dtype), to_vec.shape)
    down_vec = -up_vec
    ri_vec = normalize(jnp.cross(down_vec, to_vec))
    down_vec = jnp.cross(to_vec, ri_vec)
    return jnp.stack([ri_vec, down_vec, to_vec], axis=-1)


# ---------------------------------------------------------------------------
# image <-> pano <-> direction mapping chain
# ---------------------------------------------------------------------------

def img_coord_from_hw(h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """Pixel-center image coords [h, w, 2] = (row_frac, col_frac) in (0, 1)."""
    i = (jnp.arange(h, dtype=dtype) + 0.5) / h
    j = (jnp.arange(w, dtype=dtype) + 0.5) / w
    ii, jj = jnp.meshgrid(i, j, indexing="ij")
    return jnp.stack([ii, jj], axis=-1)


def img_to_pano_coord(coords: jnp.ndarray) -> jnp.ndarray:
    """(row, col) in [0,1] -> (beta, alpha). Reference ``camera_utils.py:119-125``."""
    y, x = coords[..., 0], coords[..., 1]
    return jnp.stack([-(y - 0.5) * jnp.pi, -(x - 0.5) * 2.0 * jnp.pi], axis=-1)


def pano_to_img_coord(coords: jnp.ndarray) -> jnp.ndarray:
    beta, alpha = coords[..., 0], coords[..., 1]
    return jnp.stack([-beta / jnp.pi + 0.5, -alpha / (2.0 * jnp.pi) + 0.5], axis=-1)


def pano_coord_to_direction(coords: jnp.ndarray) -> jnp.ndarray:
    beta, alpha = coords[..., 0], coords[..., 1]
    cb = jnp.cos(beta)
    return jnp.stack([jnp.cos(alpha) * cb, jnp.sin(alpha) * cb, jnp.sin(beta)], axis=-1)


def direction_to_pano_coord(dirs: jnp.ndarray) -> jnp.ndarray:
    dirs = normalize(dirs)
    beta = jnp.arcsin(jnp.clip(dirs[..., 2], -1.0, 1.0))
    alpha = jnp.arctan2(dirs[..., 1], dirs[..., 0])
    return jnp.stack([beta, alpha], axis=-1)


def direction_to_img_coord(dirs: jnp.ndarray) -> jnp.ndarray:
    return pano_to_img_coord(direction_to_pano_coord(dirs))


def img_coord_to_pano_direction(coords: jnp.ndarray) -> jnp.ndarray:
    return pano_coord_to_direction(img_to_pano_coord(coords))


def img_coord_to_sample_coord(coords: jnp.ndarray) -> jnp.ndarray:
    """Image coords (row, col) in [0,1] -> grid-sample coords (x, y) in [-1,1].

    Only needed where we keep API parity with code that thinks in
    ``F.grid_sample`` conventions; our own resampler consumes image coords
    directly (see ``perf_tpu.core.resample``).
    """
    return jnp.stack([coords[..., 1], coords[..., 0]], axis=-1) * 2.0 - 1.0


# ---------------------------------------------------------------------------
# perspective cameras
# ---------------------------------------------------------------------------

def cam_rays_cam_space(height: int, width: int = -1, fovy: float = float(np.deg2rad(90.0)),
                       aspect_ratio: float = 1.0) -> jnp.ndarray:
    """Unit direction grid [h, w, 3] of an OpenCV-style pinhole camera.

    Reference ``camera_utils.py:60-80``: pixel grid spans
    [-tan(fovy/2), tan(fovy/2)] via linspace over *pixel positions* (endpoints
    inclusive), z forward.
    """
    if width < 0:
        width = int(np.round(height * aspect_ratio))
    else:
        aspect_ratio = width / height
    span_y = float(np.tan(fovy * 0.5))
    span_x = span_y * aspect_ratio
    y = jnp.linspace(-span_y, span_y, height)
    x = jnp.linspace(-span_x, span_x, width)
    yy, xx = jnp.meshgrid(y, x, indexing="ij")
    xyz = jnp.stack([xx, yy, jnp.ones_like(xx)], axis=-1)
    return normalize(xyz)


def direction_to_pers_img_coord(dirs: jnp.ndarray, to_vec: jnp.ndarray,
                                down_vec: jnp.ndarray, right_vec: jnp.ndarray,
                                eps: float = 1e-5):
    """Project world directions into a tangent-plane camera.

    The camera is described by its (unnormalized) ``to_vec`` to the plane
    center and half-extent vectors ``down_vec`` / ``right_vec`` lying in the
    plane (reference ``camera_utils.py:158-177``). Returns image coords
    [..., 2] (row, col) in [0, 1] plus a validity mask [..., 1] (1 where the
    direction lands inside the view frustum).
    """
    dirs = normalize(dirs)
    to_len = jnp.linalg.norm(to_vec, axis=-1, keepdims=True)
    to_u = to_vec / to_len
    down_u = down_vec / to_len
    right_u = right_vec / to_len
    down_len2 = jnp.sum(down_u * down_u, axis=-1, keepdims=True)
    right_len2 = jnp.sum(right_u * right_u, axis=-1, keepdims=True)

    proj = jnp.sum(dirs * to_u, axis=-1, keepdims=True)
    mask = proj > eps
    dirs = dirs / jnp.maximum(proj, eps)

    i = jnp.sum((dirs - to_u) * down_u, axis=-1, keepdims=True) / down_len2
    j = jnp.sum((dirs - to_u) * right_u, axis=-1, keepdims=True) / right_len2
    mask = (mask & (jnp.abs(i) <= 1.0) & (jnp.abs(j) <= 1.0)).astype(dirs.dtype)
    ij = (jnp.concatenate([i, j], axis=-1) + 1.0) * 0.5
    return ij, mask


# ---------------------------------------------------------------------------
# ray generation
# ---------------------------------------------------------------------------

def gen_pano_rays(pose: jnp.ndarray, height: int = 512, width: int = 1024) -> Rays:
    """Equirectangular rays [h, w] for a pano camera at ``pose`` (4x4 c2w)."""
    dirs = img_coord_to_pano_direction(img_coord_from_hw(height, width))
    rays_d = apply_rot(dirs, pose[:3, :3])
    rays_o = jnp.broadcast_to(pose[:3, 3], rays_d.shape)
    return Rays(rays_o, rays_d)


def gen_pers_rays(pose: jnp.ndarray, fov: float, res: int) -> Rays:
    """Perspective rays [res, res] for a pinhole camera at ``pose``."""
    dirs = cam_rays_cam_space(height=res, width=res, fovy=fov)
    rays_d = apply_rot(dirs, pose[:3, :3])
    rays_o = jnp.broadcast_to(pose[:3, 3], rays_d.shape)
    return Rays(rays_o, rays_d)


def get_panorama_sphere_points(h: int, w: int) -> jnp.ndarray:
    return normalize(img_coord_to_pano_direction(img_coord_from_hw(h, w)))


def ang2vec(angles: jnp.ndarray) -> jnp.ndarray:
    """(azimuth, elevation) [..., 2] -> unit vectors [..., 3]
    (reference ``camera_utils.py:101-109``)."""
    ax, ay = angles[..., 0], angles[..., 1]
    return jnp.stack([jnp.cos(ax) * jnp.cos(ay),
                      jnp.sin(ax) * jnp.cos(ay),
                      jnp.sin(ay)], axis=-1)


def get_rand_horizontal_points(key, batch_size: int, dim: int = 3):
    """Uniform points in the unit disk (z=0 when dim=3)
    (reference ``camera_utils.py:184-192``)."""
    k1, k2 = jax.random.split(key)
    rs = jnp.sqrt(jax.random.uniform(k1, (batch_size,)))
    theta = (jax.random.uniform(k2, (batch_size,)) * 2.0 - 1.0) * jnp.pi
    cols = [rs * jnp.cos(theta), rs * jnp.sin(theta)]
    if dim == 3:
        cols.append(jnp.zeros((batch_size,)))
    return jnp.stack(cols, axis=-1)


def pers_depth_to_normal(depth: jnp.ndarray, down_len: float,
                         right_len: float) -> jnp.ndarray:
    """Screen-space normals from a perspective depth map
    (reference ``camera_utils.py:195-226``): back-project the pixel grid,
    take forward differences, cross, orient toward the camera.
    depth [H, W(, 1)] -> normals [H-1, W-1, 3]."""
    if depth.ndim == 2:
        depth = depth[..., None]
    h, w = depth.shape[0], depth.shape[1]
    ii = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    jj = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    jj, ii = jnp.meshgrid(jj, ii)
    x = (jj * 2.0 - 1.0) * right_len
    y = (ii * 2.0 - 1.0) * down_len
    pts = jnp.stack([x, y, jnp.ones_like(x)], axis=-1) * depth
    right = normalize(pts[:-1, 1:] - pts[:-1, :-1])
    down = normalize(pts[1:, :-1] - pts[:-1, :-1])
    to = normalize(jnp.cross(right, down))
    return -to
