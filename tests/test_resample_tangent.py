"""Tests for bilinear resampling, tangent cameras, and morphology."""

import jax.numpy as jnp
import numpy as np

from perf_tpu.core import (
    bilinear_sample, pano_sample, img_coord_from_hw, img_coord_to_pano_direction,
    direction_to_img_coord, tangent_cameras, tangent_c2w, icosahedron,
    ellipse_kernel, dilation, erosion, laplacian3, edge_keep_mask,
)


def test_bilinear_identity():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((16, 24, 3)).astype(np.float32))
    coords = img_coord_from_hw(16, 24)
    out = bilinear_sample(img, coords)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)


def test_bilinear_interp_midpoint():
    img = jnp.zeros((2, 2, 1)).at[0, 0, 0].set(1.0)
    # exact center of the image: average of the 4 pixels
    out = bilinear_sample(img, jnp.array([0.5, 0.5]))
    np.testing.assert_allclose(float(out[0]), 0.25, atol=1e-6)


def test_bilinear_border_clamp():
    img = jnp.arange(4.0).reshape(2, 2, 1)
    out = bilinear_sample(img, jnp.array([-1.0, -1.0]))
    np.testing.assert_allclose(float(out[0]), 0.0, atol=1e-6)
    out = bilinear_sample(img, jnp.array([2.0, 2.0]))
    np.testing.assert_allclose(float(out[0]), 3.0, atol=1e-6)


def test_pano_wrap_longitude():
    img = jnp.asarray(np.random.default_rng(1).random((8, 16, 3)).astype(np.float32))
    left = pano_sample(img, jnp.array([0.5, 0.0]))
    right = pano_sample(img, jnp.array([0.5, 1.0]))
    np.testing.assert_allclose(np.asarray(left), np.asarray(right), atol=1e-6)


def test_icosahedron_shape():
    v, f = icosahedron()
    assert v.shape == (12, 3) and f.shape == (20, 3)
    np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-5)
    # every face has exactly two vertices with (nearly) equal z after rotation
    for face in f:
        zs = sorted(v[face][:, 2])
        dzs = [abs(zs[0] - zs[1]), abs(zs[1] - zs[2])]
        assert min(dzs) < 1e-4, zs


def test_tangent_cameras_cover_sphere():
    dirs, ratios, tos, downs, rights = tangent_cameras(gen_res=24, ratio=1.1)
    assert dirs.shape == (20, 24, 24, 3)
    np.testing.assert_allclose(np.linalg.norm(dirs, axis=-1), 1.0, atol=1e-5)
    assert ratios.min() >= 1.0 - 1e-5  # plane samples are farther than center
    # Coverage: random unit dirs must land inside >= 1 view's frustum at ratio>=1.1
    rng = np.random.default_rng(0)
    test_dirs = rng.normal(size=(512, 3)).astype(np.float32)
    test_dirs /= np.linalg.norm(test_dirs, axis=-1, keepdims=True)
    covered = np.zeros(512, dtype=bool)
    from perf_tpu.core import direction_to_pers_img_coord
    for k in range(20):
        _, m = direction_to_pers_img_coord(
            jnp.asarray(test_dirs), jnp.asarray(tos[k]), jnp.asarray(downs[k]),
            jnp.asarray(rights[k]))
        covered |= np.asarray(m)[..., 0] > 0.5
    assert covered.all()


def test_tangent_camera_orthogonality_and_yaw():
    dirs, _, tos, downs, rights = tangent_cameras(gen_res=4, ratio=1.4, yaw=0.7)
    for k in range(20):
        assert abs(np.dot(tos[k], downs[k])) < 1e-4
        assert abs(np.dot(tos[k], rights[k])) < 1e-4
        assert abs(np.dot(downs[k], rights[k])) < 1e-4
    c2w, fovy, fovx = tangent_c2w(tos, downs, rights)
    eye = np.einsum("nij,nkj->nik", c2w, c2w)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (20, 3, 3)), atol=1e-5)
    assert (fovy > 0).all() and (fovx > 0).all()


def test_tangent_view_resamples_pano():
    # paint a pano with a smooth function of direction; cut a tangent view;
    # check values match the analytic function of the view directions.
    h, w = 64, 128
    coords = img_coord_from_hw(h, w)
    dirs_pano = img_coord_to_pano_direction(coords)
    pano = (np.asarray(dirs_pano) * 0.5 + 0.5).astype(np.float32)
    dirs, _, _, _, _ = tangent_cameras(gen_res=16, ratio=1.1)
    img_coords = direction_to_img_coord(jnp.asarray(dirs[3]))
    view = pano_sample(jnp.asarray(pano), img_coords)
    expect = np.asarray(dirs[3]) * 0.5 + 0.5
    np.testing.assert_allclose(np.asarray(view), expect, atol=0.02)


def test_ellipse_kernel_matches_cv2():
    import cv2
    for size in (3, 5, 9):
        ours = ellipse_kernel(size)
        ref = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (size, size)).astype(np.float32)
        np.testing.assert_array_equal(ours, ref)


def test_morphology_basics():
    m = jnp.zeros((9, 9)).at[4, 4].set(1.0)
    se = np.ones((3, 3), dtype=np.float32)
    d = dilation(m, se)
    assert float(d.sum()) == 9.0
    e = erosion(d, se)
    np.testing.assert_allclose(np.asarray(e), np.asarray(m), atol=1e-6)


def test_edge_keep_mask():
    # A step edge in a distance map must be excluded from supervision.
    val = jnp.concatenate([jnp.zeros((8, 8)), jnp.ones((8, 8))], axis=0)
    keep = edge_keep_mask(val, threshold=0.01)
    k = np.asarray(keep)[..., 0]
    assert not k[7:9].any()   # edge rows excluded
    assert k[0].all() and k[-1].all()  # flat regions kept


def test_laplacian_flat_zero():
    lap = laplacian3(jnp.ones((8, 8)) * 3.3)
    np.testing.assert_allclose(np.asarray(lap), 0.0, atol=1e-6)
