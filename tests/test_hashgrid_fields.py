"""Tests for the hash-grid encoder and neural fields."""

import jax
import jax.numpy as jnp
import numpy as np

from perf_tpu.kernels import (
    HashGridConfig, init_hash_table, hash_encode, hash_encode_numpy,
)
from perf_tpu.fields import (
    trunc_exp, NGPFieldConfig, init_ngp_params, reset_geo,
    query_density, query_rgb,
    SphereFieldConfig, init_sphere_field, sphere_field_distance,
    sphere_field_distance_and_grad, grads_to_normal,
    vanilla_mlp_init, vanilla_mlp_apply,
)


def _small_cfg(**kw):
    return HashGridConfig(n_levels=4, n_features=2, log2_table_size=10,
                          base_res=4, per_level_scale=2.0, **kw)


def test_hash_encode_matches_numpy_reference():
    cfg = _small_cfg()
    key = jax.random.PRNGKey(0)
    table = init_hash_table(key, cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))
    out = hash_encode(table, x, cfg)
    ref = hash_encode_numpy(np.asarray(table), np.asarray(x), cfg)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)


def test_hash_encode_smoothstep_matches_numpy():
    cfg = _small_cfg(interpolation="smoothstep")
    table = init_hash_table(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))
    out = hash_encode(table, x, cfg)
    ref = hash_encode_numpy(np.asarray(table), np.asarray(x), cfg)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)


def test_hash_encode_boundary_inputs():
    cfg = _small_cfg()
    table = init_hash_table(jax.random.PRNGKey(0), cfg)
    x = jnp.array([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0], [0.5, 0.0, 1.0]])
    out = hash_encode(table, x, cfg)
    assert np.isfinite(np.asarray(out)).all()


def test_hash_encode_continuity():
    # encoding must be continuous across a voxel boundary
    cfg = _small_cfg()
    table = init_hash_table(jax.random.PRNGKey(0), cfg)
    eps = 1e-5
    a = hash_encode(table, jnp.array([[0.25 - eps, 0.3, 0.3]]), cfg)
    b = hash_encode(table, jnp.array([[0.25 + eps, 0.3, 0.3]]), cfg)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_hash_encode_table_gradient_is_scatter_add():
    cfg = _small_cfg()
    table = init_hash_table(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3))

    def loss(t):
        return jnp.sum(hash_encode(t, x, cfg) ** 2)

    g = jax.grad(loss)(table)
    assert g.shape == table.shape
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_hash_encode_input_gradient():
    # d encoding / d position must exist and be non-zero (needed for normals)
    cfg = _small_cfg(interpolation="smoothstep")
    table = init_hash_table(jax.random.PRNGKey(0), cfg)

    def f(x):
        return jnp.sum(hash_encode(table, x, cfg))

    g = jax.grad(f)(jnp.array([[0.3, 0.4, 0.5]]))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_trunc_exp_clamped_grad():
    g = jax.grad(lambda x: trunc_exp(x))(20.0)
    np.testing.assert_allclose(float(g), np.exp(15.0), rtol=1e-5)
    g2 = jax.grad(lambda x: trunc_exp(x))(2.0)
    np.testing.assert_allclose(float(g2), np.exp(2.0), rtol=1e-5)


def test_ngp_field_queries_and_selector():
    cfg = NGPFieldConfig(grid=_small_cfg())
    params = init_ngp_params(jax.random.PRNGKey(0), cfg)
    x_in = jnp.array([[0.1, -0.2, 0.3]])
    x_out = jnp.array([[1.5, 0.0, 0.0]])
    d_in = query_density(params["geo"], x_in, cfg)
    d_out = query_density(params["geo"], x_out, cfg)
    assert d_in.shape == (1, 1)
    assert float(d_in[0, 0]) > 0.0
    assert float(d_out[0, 0]) == 0.0
    rgb = query_rgb(params["app"], x_in, cfg)
    assert rgb.shape == (1, 3)
    assert (np.asarray(rgb) >= 0).all() and (np.asarray(rgb) <= 1).all()
    assert float(jnp.abs(query_rgb(params["app"], x_out, cfg)).sum()) == 0.0


def test_reset_geo_changes_geo_keeps_app():
    cfg = NGPFieldConfig(grid=_small_cfg())
    params = init_ngp_params(jax.random.PRNGKey(0), cfg)
    new = reset_geo(params, jax.random.PRNGKey(42), cfg)
    assert new["app"] is params["app"]
    assert not np.allclose(np.asarray(new["geo"]["table"]),
                           np.asarray(params["geo"]["table"]))


def test_vanilla_mlp_sphere_init_behavior():
    # With sphere init, the (negated) output approximates radius - |x|:
    # positive near origin (inside), decreasing with |x|.
    params = vanilla_mlp_init(jax.random.PRNGKey(0), dim_in=3, dim_out=1,
                              n_neurons=64, n_hidden_layers=2, sphere_init=True)
    near = vanilla_mlp_apply(params, jnp.array([[0.01, 0.0, 0.0]]))
    far = vanilla_mlp_apply(params, jnp.array([[0.9, 0.0, 0.0]]))
    assert float(near[0, 0]) > float(far[0, 0])


def test_sphere_field_init_distance_positive():
    cfg = SphereFieldConfig(n_levels=4, log2_table_size=10, fine_res=64)
    params = init_sphere_field(jax.random.PRNGKey(0), cfg)
    dirs = jax.random.normal(jax.random.PRNGKey(1), (128, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    dist = sphere_field_distance(params, dirs, cfg)
    assert dist.shape == (128,)
    assert (np.asarray(dist) > 0).all()  # softplus(out+1) > 0


def test_sphere_field_grad_and_normals():
    cfg = SphereFieldConfig(n_levels=4, log2_table_size=10, fine_res=64)
    params = init_sphere_field(jax.random.PRNGKey(0), cfg)
    dirs = jax.random.normal(jax.random.PRNGKey(1), (64, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    dist, grad = sphere_field_distance_and_grad(params, dirs, cfg)
    assert grad.shape == (64, 3)
    assert np.isfinite(np.asarray(grad)).all()
    normals = grads_to_normal(dirs, grad, jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.linalg.norm(np.asarray(normals), axis=-1),
                               1.0, atol=1e-5)
    # normals face the camera (inward): dot(n, dir) < 0
    assert (np.sum(np.asarray(normals) * np.asarray(dirs), -1) < 1e-6).all()


def test_sphere_field_fits_analytic_room():
    # The distance field must be able to regress a simple anisotropic room.
    import optax
    cfg = SphereFieldConfig(n_levels=8, log2_table_size=12, fine_res=128)
    params = init_sphere_field(jax.random.PRNGKey(0), cfg)

    def target(d):
        # ellipsoid-ish room: distance depends smoothly on direction
        return 0.6 + 0.2 * d[..., 0] ** 2 + 0.1 * d[..., 2]

    opt = optax.adam(1e-2)
    state = opt.init(params)

    @jax.jit
    def step(params, state, key):
        d = jax.random.normal(key, (512, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

        def loss_fn(p):
            pred = sphere_field_distance(p, d, cfg)
            return jnp.mean((pred - target(d)) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, state = opt.update(g, state)
        return optax.apply_updates(params, updates), state, loss

    key = jax.random.PRNGKey(3)
    for i in range(300):
        key, k = jax.random.split(key)
        params, state, loss = step(params, state, k)
    assert float(loss) < 1e-3, float(loss)


def test_trunc_exp_forward_clamped_finite():
    # f32 exp overflows to inf past x ~ 88.7; the forward clamp at 80 keeps
    # a saturated density finite (compositing already saturates alpha = 1.0
    # by x ~ 11, so the clamp is observationally free)
    v = float(trunc_exp(jnp.float32(200.0)))
    assert np.isfinite(v)
    np.testing.assert_allclose(v, np.exp(80.0), rtol=1e-5)
    np.testing.assert_allclose(float(trunc_exp(jnp.float32(10.0))),
                               np.exp(10.0), rtol=1e-5)
    g = jax.grad(lambda x: trunc_exp(x))(200.0)
    assert np.isfinite(float(g))


def _poison_geo(params):
    """Make the density head produce a huge positive pre-activation
    everywhere: constant-1 table features + positive MLP weights scaled so
    raw >> 88.7 (the flagship episode-20 hotspot regime)."""
    geo = params["geo"]
    table = jax.tree_util.tree_map(jnp.ones_like, geo["table"])
    ws = [jnp.abs(w) + 0.1 for w in geo["mlp"]["w"]]
    ws[-1] = ws[-1] * 1e4
    return {**params, "geo": {"table": table, "mlp": {"w": ws}}}


def test_saturated_density_is_zero_outside_aabb_not_nan():
    """Episode-20 flagship regression: a trained-in hotspot with
    pre-activation > 88.7 used to make ``inf * sel`` = NaN at masked
    coords; the selector must yield exactly 0 regardless of saturation."""
    cfg = NGPFieldConfig(grid=_small_cfg())
    params = _poison_geo(init_ngp_params(jax.random.PRNGKey(0), cfg))
    d_in = float(query_density(params["geo"], jnp.array([[0.1, 0.2, 0.3]]),
                               cfg)[0, 0])
    d_out = float(query_density(params["geo"], jnp.array([[1.5, 0.0, 0.0]]),
                                cfg)[0, 0])
    assert np.isfinite(d_in) and d_in > 1e30   # saturated but finite
    assert d_out == 0.0                        # masked, not NaN
