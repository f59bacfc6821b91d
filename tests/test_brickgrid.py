"""Tests for the brick-packed grid encoder (TPU-flagship field)."""

import jax
import jax.numpy as jnp
import numpy as np

from perf_tpu.kernels import (
    BrickGridConfig, init_brick_table, brick_encode, brick_encode_numpy,
    brick_encode_ray, level_strides,
)


def _cfg(**kw):
    d = dict(n_levels=4, n_features=2, log2_bricks=8, base_res=4,
             per_level_scale=2.0, bf16_table=False)  # exact vs numpy ref
    d.update(kw)
    return BrickGridConfig(**d)


def test_brick_encode_matches_numpy():
    cfg = _cfg()
    table = init_brick_table(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))
    out = brick_encode(table, x, cfg)
    ref = brick_encode_numpy(np.asarray(table), np.asarray(x), cfg)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)


def test_brick_encode_smoothstep_and_boundaries():
    cfg = _cfg(interpolation="smoothstep")
    table = init_brick_table(jax.random.PRNGKey(0), cfg)
    x = jnp.array([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0], [0.5, 0.0, 1.0]])
    out = brick_encode(table, x, cfg)
    assert np.isfinite(np.asarray(out)).all()
    ref = brick_encode_numpy(np.asarray(table), np.asarray(x), cfg)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)


def test_brick_encode_continuity_across_bricks():
    # continuous across a BRICK boundary (corner 4 of level res 8: x = 0.5)
    cfg = _cfg(n_levels=1, base_res=8)
    table = init_brick_table(jax.random.PRNGKey(0), cfg)
    eps = 1e-5
    a = brick_encode(table, jnp.array([[0.5 - eps, 0.3, 0.3]]), cfg)
    b = brick_encode(table, jnp.array([[0.5 + eps, 0.3, 0.3]]), cfg)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_brick_encode_gradients():
    cfg = _cfg()
    table = init_brick_table(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3))
    g = jax.grad(lambda t: jnp.sum(brick_encode(t, x, cfg) ** 2))(table)
    assert g.shape == table.shape
    assert float(jnp.abs(g).sum()) > 0
    gx = jax.grad(lambda xx: jnp.sum(brick_encode(table, xx, cfg)))(x)
    assert np.isfinite(np.asarray(gx)).all()


def test_brick_encode_ray_strides():
    cfg = _cfg()
    table = init_brick_table(jax.random.PRNGKey(0), cfg)
    n, s = 4, 32
    x = jax.random.uniform(jax.random.PRNGKey(1), (n, s))
    y = jax.random.uniform(jax.random.PRNGKey(2), (n, s))
    z = jax.random.uniform(jax.random.PRNGKey(3), (n, s))
    strides = (8, 4, 2, 1)
    out = brick_encode_ray(table, x, y, z, cfg, strides)
    assert out.shape == (n, s, cfg.out_dim)
    # stride-1 levels match the flat encode exactly
    flat = brick_encode(table, jnp.stack([x, y, z], -1), cfg)
    np.testing.assert_allclose(np.asarray(out[..., -2:]),
                               np.asarray(flat[..., -2:]), atol=1e-6)


def test_brick_bf16_close_to_f32():
    cfg32 = _cfg()
    cfg16 = _cfg(bf16_table=True)
    table = init_brick_table(jax.random.PRNGKey(0), cfg32)
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))
    a = brick_encode(table, x, cfg32)
    b = brick_encode(table, x, cfg16)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)
    # grads accumulate in f32 and stay finite/nonzero
    g = jax.grad(lambda t: jnp.sum(brick_encode(t, x, cfg16) ** 2))(table)
    assert g.dtype == jnp.float32
    assert float(jnp.abs(g).sum()) > 0


def test_brick_field_fits_room():
    """Quality gate: the brick field trains to the same target as the hash
    field (golden fit on the synthetic room through the full renderer)."""
    import optax
    from perf_tpu.fields import NGPFieldConfig, init_ngp_params
    from perf_tpu.render import RenderConfig, render_rays, occ_grid_from_points
    from perf_tpu.train.schedule import smooth_l1

    field_cfg = NGPFieldConfig(grid=BrickGridConfig(
        n_levels=8, n_features=2, log2_bricks=10, base_res=4,
        per_level_scale=1.8))
    cfg = RenderConfig(step=2e-3, max_samples=128, occ_res=64)
    params = init_ngp_params(jax.random.PRNGKey(0), field_cfg)
    rng = np.random.default_rng(0)
    dirs = rng.normal(size=(2048, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    grid = occ_grid_from_points(jnp.asarray(dirs * 0.5), res=cfg.occ_res)
    adam = optax.scale_by_adam(eps=1e-8)
    opt_state = adam.init(params["geo"])

    @jax.jit
    def step(geo, opt_state, key):
        k1, k2 = jax.random.split(key)
        idx = jax.random.randint(k1, (512,), 0, 2048)
        d = jnp.asarray(dirs)[idx]
        o = jnp.zeros((512, 3))

        def loss_fn(g):
            out = render_rays({"geo": g, "app": params["app"]}, field_cfg,
                              grid, o, d, k2, cfg, train=True,
                              stop_app_grad=True, need_rgb=False)
            return smooth_l1(out["distance"], jnp.full((512, 1), 0.5),
                             beta=1e-2)

        loss, gr = jax.value_and_grad(loss_fn)(geo)
        up, opt_state = adam.update(gr, opt_state)
        geo = jax.tree_util.tree_map(lambda p, u: p - 1e-2 * u, geo, up)
        return geo, opt_state, loss

    geo = params["geo"]
    key = jax.random.PRNGKey(1)
    for _ in range(150):
        key, k = jax.random.split(key)
        geo, opt_state, loss = step(geo, opt_state, k)
    assert float(loss) < 0.05, float(loss)


def test_brick_encode_ray_dedup_parity():
    """Run-dedup encode == standard encode when K covers every run, for
    values AND table gradients (t-ordered ray samples)."""
    from perf_tpu.kernels.brickgrid import brick_encode_ray_dedup
    cfg = _cfg(n_levels=4, per_level_scale=2.4, base_res=8, bf16_table=True)
    table = init_brick_table(jax.random.PRNGKey(0), cfg)
    n, s = 32, 64
    # t-ordered samples along straight rays (the march contract)
    o = jax.random.uniform(jax.random.PRNGKey(1), (n, 1, 3)) * 0.2 + 0.1
    d = jax.random.normal(jax.random.PRNGKey(2), (n, 1, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t = jnp.linspace(0.0, 0.6, s)[None, :, None]
    p = jnp.clip(o + d * t, 0.0, 1.0)
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    strides = (8, 4, 2, 1)
    caps_full = (s, s, s, s)   # K >= any possible run count -> exact

    ref = brick_encode_ray(table, x, y, z, cfg, strides)
    out = brick_encode_ray_dedup(table, x, y, z, cfg, strides, caps_full)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-4)

    cot = jax.random.normal(jax.random.PRNGKey(3), ref.shape)

    def loss_ref(tb):
        return jnp.sum(brick_encode_ray(tb, x, y, z, cfg, strides) * cot)

    def loss_dd(tb):
        return jnp.sum(brick_encode_ray_dedup(tb, x, y, z, cfg, strides,
                                              caps_full) * cot)

    g_ref = jax.grad(loss_ref)(table)
    g_dd = jax.grad(loss_dd)(table)
    scale = float(jnp.max(jnp.abs(g_ref))) + 1e-12
    np.testing.assert_allclose(np.asarray(g_dd) / scale,
                               np.asarray(g_ref) / scale, atol=2e-2)

    # tight caps still reproduce values for rays whose runs fit: use the
    # true max run count as the cap (what the per-episode probe would pick)
    rows_runs = []
    for lvl, k in enumerate(strides):
        res = cfg.level_res(lvl)
        xs = np.asarray(jnp.concatenate([x[:, ::k], x[:, -1:]], 1)) if k > 1 \
            else np.asarray(x)
        ys = np.asarray(jnp.concatenate([y[:, ::k], y[:, -1:]], 1)) if k > 1 \
            else np.asarray(y)
        zs = np.asarray(jnp.concatenate([z[:, ::k], z[:, -1:]], 1)) if k > 1 \
            else np.asarray(z)
        c0 = np.clip(np.floor(np.stack([xs, ys, zs], -1) * res), 0, res - 1
                     ).astype(np.int64) // 3
        nbk = res // 3 + 1
        r = c0[..., 0] * nbk * nbk + c0[..., 1] * nbk + c0[..., 2]
        rows_runs.append(int(((r[:, 1:] != r[:, :-1]).sum(1) + 1).max()))
    caps_tight = tuple(rows_runs)
    out_t = brick_encode_ray_dedup(table, x, y, z, cfg, strides, caps_tight)
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(ref),
                               atol=1e-5, rtol=1e-4)
