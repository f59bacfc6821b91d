"""Non-finite-grad step guard (core/optim.py) + sup-pool finiteness gate.

Reproduces the round-5 flagship failure class: the reference's GradScaler
(``modules/scene/nerf.py`` scaler.step) SKIPS optimizer steps with inf/NaN
grads; without that skip one blown-up batch in 75k steps poisoned the color
field and every later anchor pano. These tests pin the TPU-native
equivalent: the step commits iff all grads are finite, and the pool refuses
non-finite supervision outright.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from perf_tpu.core.optim import all_finite, guarded_step, tree_where
from perf_tpu.train import NeRFScene, SupInfoPool, TrainConfig
from perf_tpu.utils import render_cube_room_pano


def test_all_finite_verdicts():
    good = {"a": jnp.ones((4, 4)), "b": [jnp.zeros(3), jnp.arange(2.0)]}
    assert bool(all_finite(good))
    for poison in (jnp.nan, jnp.inf, -jnp.inf):
        bad = {**good, "c": jnp.array([1.0, poison])}
        assert not bool(all_finite(bad))
    # integer leaves (e.g. adam step count) are ignored, not a crash
    assert bool(all_finite({"count": jnp.asarray(3, jnp.int32)}))


def test_tree_where_scalar_select():
    a = {"w": jnp.ones(3)}
    b = {"w": jnp.zeros(3)}
    np.testing.assert_array_equal(
        np.asarray(tree_where(jnp.bool_(True), a, b)["w"]), 1.0)
    np.testing.assert_array_equal(
        np.asarray(tree_where(jnp.bool_(False), a, b)["w"]), 0.0)


def test_guarded_step_skips_nonfinite_and_preserves_opt_state():
    adam = optax.scale_by_adam(eps=1e-8)
    params = {"w": jnp.ones((2, 2))}
    opt_state = adam.init(params)

    def do_step(grads, params, opt_state):
        updates, new_opt = adam.update(grads, opt_state)
        new_params = jax.tree_util.tree_map(
            lambda p, u: p - 0.1 * u, params, updates)
        return guarded_step(grads, new_params, new_opt, params, opt_state)

    # finite grads: committed, adam count advances
    g = {"w": jnp.full((2, 2), 0.5)}
    p1, o1, finite = jax.jit(do_step)(g, params, opt_state)
    assert bool(finite)
    assert not np.allclose(np.asarray(p1["w"]), 1.0)
    assert int(o1.count) == 1

    # poisoned grads: params AND opt state bit-identical to before
    g_bad = {"w": jnp.full((2, 2), 0.5).at[0, 0].set(jnp.nan)}
    p2, o2, finite = jax.jit(do_step)(g_bad, p1, o1)
    assert not bool(finite)
    np.testing.assert_array_equal(np.asarray(p2["w"]), np.asarray(p1["w"]))
    assert int(o2.count) == int(o1.count)
    np.testing.assert_array_equal(np.asarray(o2.mu["w"]),
                                  np.asarray(o1.mu["w"]))
    # and everything stayed finite
    assert bool(all_finite(p2))


def test_scene_step_survives_poisoned_batch():
    """End-to-end: inject NaN into the padded supervision arrays mid-pool
    (bypassing the registration gate, as an in-training blowup would) and
    verify a training phase leaves the params finite."""
    from perf_tpu.fields import NGPFieldConfig
    from perf_tpu.kernels import HashGridConfig
    from perf_tpu.render import RenderConfig

    h, w = 32, 64
    pano = render_cube_room_pano(jnp.eye(4), h, w)
    pool = SupInfoPool()
    pool.register_sup_info(pose=np.eye(4, dtype=np.float32),
                           mask=np.ones((h, w)), rgb=pano["rgb"],
                           distance=pano["distance"], normal=pano["normal"])
    field_cfg = NGPFieldConfig(grid=HashGridConfig(
        n_levels=4, n_features=2, log2_table_size=10, base_res=4,
        per_level_scale=1.8))
    render_cfg = RenderConfig(step=8e-3, max_samples=64, occ_res=32)
    train_cfg = TrainConfig(raw_phase_iter_geo=20, raw_phase_iter_app=20,
                            pixel_loss_batch_size=128, scan_chunk=10)
    scene = NeRFScene(field_cfg, render_cfg, train_cfg, jax.random.PRNGKey(0))

    arrs = pool.device_arrays()
    n = int(arrs["n_valid"])
    assert n > 64, f"pool unexpectedly empty (n_valid={n})"
    # poison ~1/4 of the valid gt distances and colors with NaN: every
    # sampled batch is near-certain to contain at least one poisoned ray,
    # so without the guard the very first update would NaN the params
    bad = jnp.arange(n // 4)
    arrs["distances"] = arrs["distances"].at[bad].set(jnp.nan)
    arrs["colors"] = arrs["colors"].at[bad].set(jnp.nan)

    scene.occ_grid = pool.gen_occ_grid(res=render_cfg.occ_res)
    cap = arrs["rays_o"].shape[0]
    geo_losses = scene._run_phase("geo", arrs, cap,
                                  train_cfg.raw_phase_iter_geo)
    app_losses = scene._run_phase("app", arrs, cap,
                                  train_cfg.raw_phase_iter_app)

    assert bool(all_finite(scene.params["geo"])), "geo params poisoned"
    assert bool(all_finite(scene.params["app"])), "app params poisoned"
    # the guard actually fired (the losses' last column logs the verdict)
    skipped = (np.asarray(geo_losses)[:, -1] == 0).sum() + \
        (np.asarray(app_losses)[:, -1] == 0).sum()
    assert skipped > 0, "expected at least one skipped non-finite step"


def test_register_sup_info_rejects_nonfinite():
    h, w = 8, 16
    pano = render_cube_room_pano(jnp.eye(4), h, w)
    rgb = np.asarray(pano["rgb"]).copy()
    rgb[0, 0, 0] = np.nan
    pool = SupInfoPool()
    with pytest.raises(FloatingPointError, match="rgb"):
        pool.register_sup_info(pose=np.eye(4, dtype=np.float32),
                               mask=np.ones((h, w)), rgb=rgb,
                               distance=pano["distance"],
                               normal=pano["normal"])
    dist = np.asarray(pano["distance"]).copy()
    dist[1, 1] = np.inf
    with pytest.raises(FloatingPointError, match="distance"):
        pool.register_sup_info(pose=np.eye(4, dtype=np.float32),
                               mask=np.ones((h, w)), rgb=pano["rgb"],
                               distance=dist, normal=pano["normal"])
