"""Two-budget (bucketed) train-batch rendering: parity + plan selection.

``render_rays_bucketed`` sorts a batch by occupied-window count and shades
the low-occupancy majority at a smaller static sample budget (the train-batch
analog of the eval path's per-chunk adaptive budgets; reference rays all pay
nerfacc's per-batch worst case, ``modules/scene/nerf_renderer.py:145-155``).
Ray math is identical — these tests pin that claim.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perf_tpu.core import gen_pano_rays
from perf_tpu.fields import NGPFieldConfig, init_ngp_params
from perf_tpu.kernels import HashGridConfig
from perf_tpu.render import RenderConfig
from perf_tpu.render.renderer import (
    render_rays, render_rays_bucketed, march_windows, count_occupied_windows,
)
from perf_tpu.train import SupInfoPool, NeRFScene, TrainConfig
from perf_tpu.utils import render_cube_room_pano


@pytest.fixture(scope="module")
def setup():
    h, w = 64, 128
    fc = NGPFieldConfig(grid=HashGridConfig(
        n_levels=8, n_features=2, log2_table_size=14, base_res=4,
        per_level_scale=1.9))
    rc = RenderConfig(step=1e-3, max_samples=128, occ_res=64)
    pano = render_cube_room_pano(jnp.eye(4), h, w)
    pool = SupInfoPool()
    pool.register_sup_info(np.eye(4, dtype=np.float32), np.ones((h, w)),
                           pano["rgb"], pano["distance"], pano["normal"])
    occ = pool.gen_occ_grid(rc.occ_res)
    params = init_ngp_params(jax.random.PRNGKey(3), fc)
    rays = gen_pano_rays(jnp.eye(4), 32, 64)
    o = rays.o.reshape(-1, 3)
    d = rays.d.reshape(-1, 3)
    return fc, rc, occ, params, o, d


def test_eval_parity_bucketed_vs_flat(setup):
    """With s_low covering every low-bucket ray, bucketed == flat per ray."""
    fc, rc, occ, params, o, d = setup
    key = jax.random.PRNGKey(0)
    counts = np.asarray(count_occupied_windows(occ, o, d, rc))
    spw = rc.samples_per_window
    # choose s_low below the global worst so both buckets are meaningful,
    # and n_high large enough that no >s_low ray lands in the low bucket
    s_low = 80
    n_over = int((counts > s_low // spw).sum())
    assert 0 < n_over < o.shape[0] // 2, (
        f"scene must mix occupancies (got {n_over} over-budget rays)")
    n_high = max(n_over + 8, o.shape[0] // 8)

    flat = render_rays(params, fc, occ, o, d, key, rc, train=False)
    buck = render_rays_bucketed(params, fc, occ, o, d, key, rc,
                                s_low=s_low, n_high=n_high, train=False)
    np.testing.assert_allclose(np.asarray(buck["distance"]),
                               np.asarray(flat["distance"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(buck["rgb"]),
                               np.asarray(flat["rgb"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(buck["opacity"]),
                               np.asarray(flat["opacity"]), atol=1e-4)


def test_bucketed_train_grads(setup):
    """Gradients flow through both buckets; dist_loss is finite."""
    fc, rc, occ, params, o, d = setup

    def loss_fn(geo_p):
        out = render_rays_bucketed({"geo": geo_p, "app": params["app"]},
                                   fc, occ, o, d, jax.random.PRNGKey(1),
                                   rc, s_low=64, n_high=o.shape[0] // 4,
                                   train=True, stop_app_grad=True,
                                   need_rgb=False)
        return (jnp.mean(out["distance"]) + jnp.mean(out["dist_loss"]),
                out)

    (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params["geo"])
    assert np.isfinite(float(loss))
    gnorm = float(jnp.linalg.norm(grads["table"]))
    assert np.isfinite(gnorm) and gnorm > 0.0
    assert np.isfinite(np.asarray(out["dist_loss"])).all()


def test_order_restoration(setup):
    """Per-ray outputs come back in input order: shuffling the input rays
    shuffles the outputs identically."""
    fc, rc, occ, params, o, d = setup
    key = jax.random.PRNGKey(0)
    perm = np.random.default_rng(0).permutation(o.shape[0])
    a = render_rays_bucketed(params, fc, occ, o, d, key, rc,
                             s_low=80, n_high=o.shape[0] // 4, train=False)
    b = render_rays_bucketed(params, fc, occ, o[perm], d[perm], key, rc,
                             s_low=80, n_high=o.shape[0] // 4, train=False)
    np.testing.assert_allclose(np.asarray(a["distance"])[perm],
                               np.asarray(b["distance"]), atol=1e-4)


def test_train_rgb_windows_close(setup):
    """train_rgb_windows: the app-phase top-K rgb path engages and stays a
    tight approximation of full-sample compositing (weights are detached in
    the color composite, so only near-zero-weight samples are dropped)."""
    import dataclasses
    fc, rc, occ, params, o, d = setup
    rc0 = dataclasses.replace(rc, train_rgb_windows=0)
    rc4 = dataclasses.replace(rc, train_rgb_windows=4)
    k = jax.random.PRNGKey(0)
    a = render_rays(params, fc, occ, o, d, k, rc0, train=True)
    b = render_rays(params, fc, occ, o, d, k, rc4, train=True)
    diff = np.abs(np.asarray(a["rgb"]) - np.asarray(b["rgb"]))
    assert diff.max() > 0.0, "top-K train path did not engage"
    assert diff.max() < 0.05, diff.max()


def test_dedup_runs_training():
    """TrainConfig.dedup_runs: per-episode run caps are probed for brick
    fields and training through the dedup encode still converges."""
    from perf_tpu.kernels import BrickGridConfig
    h, w = 64, 128
    fc = NGPFieldConfig(grid=BrickGridConfig(
        n_levels=4, n_features=2, log2_bricks=10, base_res=16,
        per_level_scale=2.0))
    rc = RenderConfig(step=4e-3, max_samples=64, occ_res=64)
    pano = render_cube_room_pano(jnp.eye(4), h, w)
    pool = SupInfoPool()
    pool.register_sup_info(np.eye(4, dtype=np.float32), np.ones((h, w)),
                           pano["rgb"], pano["distance"], pano["normal"])
    tc = TrainConfig(pixel_loss_batch_size=512, raw_phase_iter_geo=40,
                     raw_phase_iter_app=20, scan_chunk=20, dedup_runs=True)
    scene = NeRFScene(fc, rc, tc, jax.random.PRNGKey(0))
    out = scene.fit(pool)
    assert scene.run_caps is not None, "brick field must probe run caps"
    assert any(c > 0 for c in scene.run_caps)
    g = out["geo_losses"]
    assert float(g[-1][0]) < float(g[0][0])
    assert np.isfinite(np.asarray(g)).all()


def test_budget_plan_selection():
    """select_sample_budget: multiple-of-16 budgets and coherent plans."""
    h, w = 64, 128
    fc = NGPFieldConfig(grid=HashGridConfig(
        n_levels=8, n_features=2, log2_table_size=14, base_res=4,
        per_level_scale=1.9))
    rc = RenderConfig(step=4e-3, max_samples=128, occ_res=64)
    pano = render_cube_room_pano(jnp.eye(4), h, w)
    pool = SupInfoPool()
    pool.register_sup_info(np.eye(4, dtype=np.float32), np.ones((h, w)),
                           pano["rgb"], pano["distance"], pano["normal"])
    scene = NeRFScene(fc, rc, TrainConfig(pixel_loss_batch_size=1024),
                      jax.random.PRNGKey(0))
    scene.occ_grid = pool.gen_occ_grid(rc.occ_res)
    budget = scene.select_sample_budget(pool.device_arrays())
    assert budget % 16 == 0 and budget <= rc.max_samples
    if scene.bucket_plan is not None:
        s_low, n_high = scene.bucket_plan
        assert s_low % 16 == 0 and s_low < budget
        assert 0 < n_high < 1024
