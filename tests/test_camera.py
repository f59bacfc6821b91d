"""Unit tests for perf_tpu.core.camera — equirect math and ray generation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perf_tpu.core import (
    Rays, apply_rot, look_at, img_coord_from_hw, img_to_pano_coord,
    pano_to_img_coord, pano_coord_to_direction, direction_to_pano_coord,
    direction_to_img_coord, img_coord_to_pano_direction, cam_rays_cam_space,
    direction_to_pers_img_coord, gen_pano_rays, gen_pers_rays,
)


def test_img_pano_coord_roundtrip():
    coords = img_coord_from_hw(32, 64)
    back = pano_to_img_coord(img_to_pano_coord(coords))
    np.testing.assert_allclose(np.asarray(back), np.asarray(coords), atol=1e-6)


def test_direction_roundtrip():
    coords = img_coord_from_hw(32, 64)
    dirs = img_coord_to_pano_direction(coords)
    # unit norm
    np.testing.assert_allclose(np.linalg.norm(np.asarray(dirs), axis=-1), 1.0, atol=1e-6)
    back = direction_to_img_coord(dirs)
    np.testing.assert_allclose(np.asarray(back), np.asarray(coords), atol=1e-5)


def test_pano_direction_conventions():
    # Top row center of the image looks straight up (+z); image center
    # looks along -x? No: col=0.5 -> alpha=0 -> +x. Row=0.5 -> beta=0.
    d_center = img_coord_to_pano_direction(jnp.array([0.5, 0.5]))
    np.testing.assert_allclose(np.asarray(d_center), [1.0, 0.0, 0.0], atol=1e-6)
    d_up = img_coord_to_pano_direction(jnp.array([0.0, 0.5]))
    np.testing.assert_allclose(np.asarray(d_up), [0.0, 0.0, 1.0], atol=1e-6)
    d_down = img_coord_to_pano_direction(jnp.array([1.0, 0.5]))
    np.testing.assert_allclose(np.asarray(d_down), [0.0, 0.0, -1.0], atol=1e-6)
    # Quarter to the right of center decreases alpha -> -y.
    d_right = img_coord_to_pano_direction(jnp.array([0.5, 0.75]))
    np.testing.assert_allclose(np.asarray(d_right), [0.0, -1.0, 0.0], atol=1e-6)


def test_look_at_orthonormal():
    rng = np.random.default_rng(0)
    to = jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32))
    # avoid degenerate (parallel to up) directions
    to = to.at[:, 2].set(0.1 * to[:, 2])
    rots = look_at(to)
    eye = jnp.einsum("nij,nkj->nik", rots, rots)
    np.testing.assert_allclose(np.asarray(eye), np.broadcast_to(np.eye(3), (16, 3, 3)), atol=1e-5)
    # det == +1
    dets = np.linalg.det(np.asarray(rots))
    np.testing.assert_allclose(dets, 1.0, atol=1e-5)
    # forward column is the normalized to_vec
    fwd = np.asarray(rots)[..., :, 2]
    to_n = np.asarray(to) / np.linalg.norm(np.asarray(to), axis=-1, keepdims=True)
    np.testing.assert_allclose(fwd, to_n, atol=1e-5)


def test_cam_rays_cam_space():
    rays = cam_rays_cam_space(8, 8, fovy=np.deg2rad(90.0))
    r = np.asarray(rays)
    np.testing.assert_allclose(np.linalg.norm(r, axis=-1), 1.0, atol=1e-6)
    # all z > 0 (forward)
    assert (r[..., 2] > 0).all()
    # corners at 45 degrees: |x| == |z| at edges
    np.testing.assert_allclose(abs(r[0, 0, 0]), r[0, 0, 2], atol=1e-6)


def test_pers_projection_roundtrip():
    # Build a tangent camera frame and check project(dirs) hits the grid.
    to_vec = jnp.array([1.0, 0.0, 0.0])
    down_vec = jnp.array([0.0, 0.0, -0.5])
    right_vec = jnp.array([0.0, -0.5, 0.0])
    res = 16
    ij = img_coord_from_hw(res, res)
    # direction for image coord (i, j): to + down*(2i-1)*|down| ... construct directly
    dirs = (to_vec[None, None]
            + down_vec[None, None] * (ij[..., 0:1] * 2 - 1)
            + right_vec[None, None] * (ij[..., 1:2] * 2 - 1))
    coords, mask = direction_to_pers_img_coord(dirs, to_vec, down_vec, right_vec)
    assert np.asarray(mask).min() == 1.0
    np.testing.assert_allclose(np.asarray(coords), np.asarray(ij), atol=1e-5)
    # a backward direction must be masked out
    _, m = direction_to_pers_img_coord(jnp.array([[-1.0, 0.0, 0.0]]), to_vec, down_vec, right_vec)
    assert float(m[0, 0]) == 0.0


def test_gen_pano_rays_pose():
    pose = jnp.eye(4).at[:3, 3].set(jnp.array([1.0, 2.0, 3.0]))
    rays = gen_pano_rays(pose, 8, 16)
    assert rays.o.shape == (8, 16, 3)
    np.testing.assert_allclose(np.asarray(rays.o[0, 0]), [1.0, 2.0, 3.0], atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(rays.d), axis=-1), 1.0, atol=1e-6)


def test_gen_pers_rays():
    pose = jnp.eye(4)
    rays = gen_pers_rays(pose, fov=np.deg2rad(75.0), res=8)
    assert rays.d.shape == (8, 8, 3)


def test_rays_pytree():
    rays = gen_pano_rays(jnp.eye(4), 4, 8)
    flat = rays.reshape(-1)
    assert flat.o.shape == (32, 3)
    sub = flat[jnp.array([0, 5])]
    assert len(sub) == 2
    # jit through the pytree
    f = jax.jit(lambda r: r.o + r.d)
    f(flat)
