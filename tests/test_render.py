"""Tests for occupancy grid, ray marching, compositing, distortion loss."""

import jax
import jax.numpy as jnp
import numpy as np

from perf_tpu.core import gen_pano_rays
from perf_tpu.fields import NGPFieldConfig, init_ngp_params
from perf_tpu.kernels import HashGridConfig
from perf_tpu.render import (
    occ_grid_from_points, occ_lookup, RenderConfig, march_rays, render_rays,
    render_image, distortion_loss, distortion_loss_bruteforce,
    ema_update_from_density,
)


def _tiny_field_cfg():
    return NGPFieldConfig(grid=HashGridConfig(
        n_levels=4, n_features=2, log2_table_size=10, base_res=4,
        per_level_scale=2.0))


def _render_cfg(**kw):
    defaults = dict(near=0.0, far=1.5, step=5e-3, max_samples=128, occ_res=64)
    defaults.update(kw)
    return RenderConfig(**defaults)


def test_occ_grid_from_points_and_lookup():
    pts = jnp.array([[0.5, 0.0, 0.0]])
    grid = occ_grid_from_points(pts, res=64)
    # the point voxel (and one-voxel neighborhood) is occupied
    assert int(occ_lookup(grid, jnp.array([[0.5, 0.0, 0.0]]), 64)[0]) == 1
    assert int(occ_lookup(grid, jnp.array([[0.5 + 1.9 / 64, 0.0, 0.0]]), 64)[0]) == 1
    # far away is free
    assert int(occ_lookup(grid, jnp.array([[-0.5, 0.0, 0.0]]), 64)[0]) == 0


def test_march_rays_hits_occupied_segment():
    # occupy a shell at distance ~0.5 along +x
    pts = jnp.array([[0.5, 0.0, 0.0]])
    cfg = _render_cfg()
    grid = occ_grid_from_points(pts, res=cfg.occ_res)
    o = jnp.zeros((1, 3))
    d = jnp.array([[1.0, 0.0, 0.0]])
    t_mid, valid = march_rays(grid, o, d, jax.random.PRNGKey(0), cfg,
                              stratified=False)
    v = np.asarray(valid[0]) > 0
    t = np.asarray(t_mid[0])[v]
    assert v.sum() > 0
    assert t.min() > 0.4 and t.max() < 0.6
    # ts ascend
    assert (np.diff(t) > 0).all()
    # a ray pointing away sees nothing
    _, valid2 = march_rays(grid, o, -d, jax.random.PRNGKey(0), cfg, False)
    assert float(valid2.sum()) == 0.0


def test_transmittance_weights_sum_to_alpha_composite():
    # dense wall -> opacity ~ 1, distance ~ wall position
    cfg = _render_cfg()
    field_cfg = _tiny_field_cfg()
    params = init_ngp_params(jax.random.PRNGKey(0), field_cfg)

    # monkeypatch density: use a huge table bias so the field is dense
    # everywhere -> every sampled point is opaque.
    pts = jnp.array([[0.5, 0.0, 0.0]])
    grid = occ_grid_from_points(pts, res=cfg.occ_res)
    o = jnp.zeros((4, 3))
    d = jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (4, 1))

    out = render_rays(params, field_cfg, grid, o, d, jax.random.PRNGKey(1),
                      cfg, train=False)
    w = np.asarray(out["weights"])
    op = np.asarray(out["opacity"])
    # weights are a valid partition of opacity
    np.testing.assert_allclose(w.sum(-1), op[:, 0], atol=1e-5)
    assert (w >= 0).all()
    # at init density ~ 1 everywhere in occupied cells: tiny opacity over a
    # ~0.1-long segment
    assert (op < 0.5).all()


def test_render_eval_background_compositing():
    cfg = _render_cfg()
    field_cfg = _tiny_field_cfg()
    params = init_ngp_params(jax.random.PRNGKey(0), field_cfg)
    grid = jnp.zeros((cfg.occ_res ** 3,), jnp.uint8)  # empty scene
    o = jnp.zeros((2, 3))
    d = jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (2, 1))
    out = render_rays(params, field_cfg, grid, o, d, jax.random.PRNGKey(1),
                      cfg, train=False)
    np.testing.assert_allclose(np.asarray(out["rgb"]), 0.5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["distance"]), 5.0, atol=1e-5)
    assert float(out["opacity"].sum()) == 0.0


def test_geo_grad_stops():
    cfg = _render_cfg(max_samples=32)
    field_cfg = _tiny_field_cfg()
    params = init_ngp_params(jax.random.PRNGKey(0), field_cfg)
    pts = jnp.array([[0.5, 0.0, 0.0]])
    grid = occ_grid_from_points(pts, res=cfg.occ_res)
    o = jnp.zeros((8, 3))
    d = jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (8, 1))

    def color_loss(p, stop_geo):
        out = render_rays(p, field_cfg, grid, o, d, jax.random.PRNGKey(1),
                          cfg, train=True, stop_geo_grad=stop_geo)
        return jnp.mean(out["rgb"] ** 2)

    g = jax.grad(color_loss)(params, True)
    # geometry gets NO gradient from the color loss (weights detached + geo stopped)
    assert float(jnp.abs(g["geo"]["table"]).sum()) == 0.0
    assert float(jnp.abs(g["app"]["table"]).sum()) > 0.0

    def depth_loss(p, stop_app):
        out = render_rays(p, field_cfg, grid, o, d, jax.random.PRNGKey(1),
                          cfg, train=True, stop_app_grad=stop_app)
        return jnp.mean(out["distance"] ** 2)

    g2 = jax.grad(depth_loss)(params, True)
    assert float(jnp.abs(g2["geo"]["table"]).sum()) > 0.0
    assert float(jnp.abs(g2["app"]["table"]).sum()) == 0.0

    # even WITHOUT stop flags, color loss cannot move geometry
    g3 = jax.grad(color_loss)(params, False)
    assert float(jnp.abs(g3["geo"]["table"]).sum()) == 0.0


def test_render_image_chunking():
    cfg = _render_cfg(max_samples=32)
    field_cfg = _tiny_field_cfg()
    params = init_ngp_params(jax.random.PRNGKey(0), field_cfg)
    grid = jnp.zeros((cfg.occ_res ** 3,), jnp.uint8)
    rays = gen_pano_rays(jnp.eye(4), 8, 16)
    out = render_image(params, field_cfg, grid, rays, jax.random.PRNGKey(0),
                       cfg, chunk=50)  # deliberately non-divisor chunk
    assert out["rgb"].shape == (8, 16, 3)
    assert out["distance"].shape == (8, 16, 1)
    np.testing.assert_allclose(np.asarray(out["rgb"]), 0.5, atol=1e-6)


def test_distortion_loss_matches_bruteforce():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.random((4, 16)).astype(np.float32)) * 0.1
    m = jnp.sort(jnp.asarray(rng.random((4, 16)).astype(np.float32)), axis=-1)
    valid = jnp.asarray((rng.random((4, 16)) > 0.3).astype(np.float32))
    dt = 5e-3
    fast = distortion_loss(w, m, dt, valid)
    slow = distortion_loss_bruteforce(w, m, dt, valid)
    np.testing.assert_allclose(float(fast), float(slow), rtol=1e-5)


def test_ema_update_from_density():
    res = 16
    occ = jnp.zeros((res ** 3,), jnp.float32)

    def dens(p):
        # dense ball at origin
        return (jnp.linalg.norm(p, axis=-1, keepdims=True) < 0.3) * 100.0

    occ = ema_update_from_density(occ, dens, res, jax.random.PRNGKey(0),
                                  jitter=False)
    binary = occ > 1e-2
    pts_inside = binary[int((0.5 * res)) * res * res + (res // 2) * res + (res // 2)]
    assert bool(pts_inside)
    assert float(binary.mean()) < 0.3  # most of space empty


def test_prop_renderer_path():
    """The proposal path must run and composite sanely (the reference ships
    this path broken — nerf_renderer.py:73 NameError)."""
    import jax
    from perf_tpu.fields import (
        NGPDensityFieldConfig, init_density_field, init_ngp_params,
    )
    from perf_tpu.render import PropRenderConfig, render_rays_prop, prop_loss

    field_cfg = _tiny_field_cfg()
    params = init_ngp_params(jax.random.PRNGKey(0), field_cfg)
    prop_cfgs = [
        NGPDensityFieldConfig(n_levels=3, log2_table_size=10, max_res=64),
        NGPDensityFieldConfig(n_levels=3, log2_table_size=10, max_res=128),
    ]
    prop_params = [init_density_field(jax.random.PRNGKey(i + 1), c)
                   for i, c in enumerate(prop_cfgs)]
    o = jnp.zeros((16, 3))
    d = jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (16, 1))
    cfg = PropRenderConfig(n_samples=32, n_samples_per_prop=(64, 32))
    out = render_rays_prop(params, prop_params, field_cfg, prop_cfgs, o, d,
                           jax.random.PRNGKey(2), cfg, train=True)
    assert out["rgb"].shape == (16, 3)
    assert np.isfinite(np.asarray(out["rgb"])).all()
    w = np.asarray(out["weights"])
    assert (w >= 0).all() and (w.sum(-1) <= 1.0 + 1e-4).all()
    # resampled edges are sorted
    te = np.asarray(out["t_edges"])
    assert (np.diff(te, axis=-1) >= -1e-6).all()
    loss = prop_loss(out["t_edges"], out["weights"], out["prop_aux"])
    assert np.isfinite(float(loss))


def test_render_train_finite_under_saturated_field():
    """Flagship episode-20 regression: a density hotspot whose
    pre-activation exceeds 88.7 made ``exp`` overflow to inf, and the
    0/1 valid/selector masks turned it into NaN for every ray touching
    the region — locking training (every step guard-skipped, params
    frozen mid-episode). Forward AND gradients must stay finite with a
    fully saturated field."""
    cfg = _tiny_field_cfg()
    params = init_ngp_params(jax.random.PRNGKey(0), cfg)
    geo = params["geo"]
    params = {**params, "geo": {
        "table": jax.tree_util.tree_map(jnp.ones_like, geo["table"]),
        "mlp": {"w": [jnp.abs(geo["mlp"]["w"][0]) + 0.1,
                      (jnp.abs(geo["mlp"]["w"][1]) + 0.1) * 1e4]},
    }}
    rcfg = _render_cfg(max_samples=64)
    # a thin shell: rays march a few occupied windows + masked padding
    pts = jnp.array([[0.5, 0.0, 0.0], [0.0, 0.5, 0.0]])
    grid = occ_grid_from_points(pts, res=rcfg.occ_res)
    o = jnp.zeros((8, 3))
    th = jnp.linspace(0, 2 * np.pi, 8, endpoint=False)
    d = jnp.stack([jnp.cos(th), jnp.sin(th), jnp.zeros(8)], -1)

    def loss_fn(p):
        out = render_rays(p, cfg, grid, o, d, jax.random.PRNGKey(1), rcfg,
                          train=True, stop_app_grad=True, need_rgb=False)
        return (jnp.mean(out["distance"]) + jnp.mean(out["dist_loss"]),
                out)

    (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss)), float(loss)
    for k in ("distance", "opacity", "dist_loss"):
        assert np.isfinite(np.asarray(out[k])).all(), k
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()
