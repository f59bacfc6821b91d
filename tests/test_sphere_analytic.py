"""Parity tests for the brick sphere field's 'analytic' gradient mode — the
TPU production path for the joint/refiner distillation loops (one row gather
forward + one combined scatter backward, first-order under an outer grad).

Covers the round-2 advisory gap: ``brick_encode_stacked_grad`` /
``corner_interp_grad_lowp`` shipped untested.
"""

import jax
import jax.numpy as jnp
import numpy as np

from perf_tpu.fields.sphere_field import (
    SphereFieldConfig, init_sphere_field, sphere_field_distance,
    sphere_field_distance_and_grad,
)
from perf_tpu.priors import (
    FakeCubeRoomDepthPredictor, FakeCubeRoomNormalPredictor,
    PanoJointPredictor, JointPredictorConfig,
)
from perf_tpu.utils import render_cube_room_pano


def _cfg(grad_mode):
    return SphereFieldConfig(n_levels=6, log2_table_size=12, fine_res=128,
                             encoding="brick", grad_mode=grad_mode)


def _params_and_dirs(seed=0, n=512, scale=0.1):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    params = init_sphere_field(k1, _cfg("analytic"))
    # bf16-robust magnitudes: uniform(-1e-4,1e-4) init would drown the
    # directional-derivative check in rounding noise
    params["table"] = scale * jax.random.normal(k2, params["table"].shape)
    dirs = jax.random.normal(k3, (n, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    return params, dirs


def test_analytic_matches_ad_first_order():
    """Values and direction-gradients: 'analytic' (fwd derivative outputs)
    must match 'ad' (jax.vjp through the interp's exact frac cotangents)."""
    params, dirs = _params_and_dirs()
    d_an, g_an = sphere_field_distance_and_grad(params, dirs, _cfg("analytic"))
    d_ad, g_ad = sphere_field_distance_and_grad(params, dirs, _cfg("ad"))
    np.testing.assert_allclose(np.asarray(d_an), np.asarray(d_ad),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_an), np.asarray(g_ad),
                               rtol=1e-3, atol=2e-3)


def test_analytic_outer_table_grads_value_path():
    """Outer jax.grad through the VALUE output must agree with the plain
    encode path (corner_interp_lowp) — the feats cotangent share of the
    combined vjp."""
    params, dirs = _params_and_dirs()

    def loss_analytic(p):
        d, _ = sphere_field_distance_and_grad(p, dirs, _cfg("analytic"))
        return jnp.mean(jnp.sin(3.0 * d))

    def loss_plain(p):
        d = sphere_field_distance(p, dirs, _cfg("analytic"))
        return jnp.mean(jnp.sin(3.0 * d))

    g_a = jax.grad(loss_analytic)(params)
    g_p = jax.grad(loss_plain)(params)
    for ka in ("table",):
        np.testing.assert_allclose(np.asarray(g_a[ka]), np.asarray(g_p[ka]),
                                   rtol=5e-2, atol=1e-6)


def test_analytic_outer_table_grads_gradient_path():
    """Outer jax.grad through the DERIVATIVE outputs (the normal-loss path):
    directional-derivative check <grad, v> vs central differences of the
    loss along a random table direction v."""
    params, dirs = _params_and_dirs(n=256)
    cfg = _cfg("analytic")

    def loss(p):
        d, g = sphere_field_distance_and_grad(p, dirs, cfg)
        return jnp.mean(d * d) + jnp.mean(jnp.sum(g * dirs, -1) ** 2)

    g = jax.grad(loss)(params)
    key = jax.random.PRNGKey(7)
    v = jax.random.normal(key, params["table"].shape)
    eps = 1e-2
    pp = dict(params, table=params["table"] + eps * v)
    pm = dict(params, table=params["table"] - eps * v)
    num = (float(loss(pp)) - float(loss(pm))) / (2 * eps)
    ana = float(jnp.sum(g["table"] * v))
    # bf16 table reads put a floor on the numerical probe's accuracy
    assert abs(num - ana) < 0.12 * max(abs(num), abs(ana), 1e-3), (num, ana)


def test_joint_predictor_brick_analytic_recovers_room():
    """The production (brick + analytic) distillation meets the same quality
    contract as the reference-parity hash+ad path (test_priors)."""
    h, w = 32, 64
    pano = render_cube_room_pano(jnp.eye(4), h, w)
    cfg = JointPredictorConfig(
        gen_res=32, ratios=(1.1,), local_batch=64, iters_per_phase=200,
        normal_bias_res=16, scan_chunk=50,
        field=_cfg("analytic"))
    pred = PanoJointPredictor(FakeCubeRoomDepthPredictor(),
                              FakeCubeRoomNormalPredictor(), cfg=cfg)
    dist, normal = pred(pano["rgb"], jnp.ones((h, w, 1)), jnp.ones((h, w)))
    gt = np.asarray(pano["distance"])
    rel = np.abs(np.asarray(dist) / np.asarray(dist).mean()
                 - gt / gt.mean()) / (gt / gt.mean())
    assert np.median(rel) < 0.15, np.median(rel)
    nn = np.asarray(normal)
    np.testing.assert_allclose(np.linalg.norm(nn, axis=-1), 1.0, atol=1e-4)
