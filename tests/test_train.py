"""Training-layer tests: sup pool, schedules, the golden end-to-end fit."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perf_tpu.core import gen_pano_rays
from perf_tpu.fields import NGPFieldConfig
from perf_tpu.kernels import HashGridConfig
from perf_tpu.render import RenderConfig
from perf_tpu.train import (
    SupInfoPool, NeRFScene, TrainConfig, OptimConfig, lr_at, smooth_l1,
    save_checkpoint, load_checkpoint,
)
from perf_tpu.utils import render_cube_room_pano, psnr


def _make_pool(h=32, w=64):
    pano = render_cube_room_pano(jnp.eye(4), h, w)
    pool = SupInfoPool()
    pool.register_sup_info(pose=np.eye(4, dtype=np.float32),
                           mask=np.ones((h, w)),
                           rgb=pano["rgb"], distance=pano["distance"],
                           normal=pano["normal"])
    return pool, pano


def test_lr_schedule_shape():
    cfg = OptimConfig(init_lr=0.0, peak_lr=1e-2, peak_at=0.2, lr_alpha=1e-2)
    assert float(lr_at(0.0, cfg)) == 0.0
    np.testing.assert_allclose(float(lr_at(0.2, cfg)), 1e-2, rtol=1e-5)
    np.testing.assert_allclose(float(lr_at(1.0, cfg)), 1e-4, rtol=1e-4)
    # monotone ramp up then decay
    assert float(lr_at(0.1, cfg)) < float(lr_at(0.2, cfg))
    assert float(lr_at(0.6, cfg)) < float(lr_at(0.3, cfg))


def test_smooth_l1_matches_torch_semantics():
    import torch
    import torch.nn.functional as F
    rng = np.random.default_rng(0)
    a = rng.normal(size=(64,)).astype(np.float32)
    b = rng.normal(size=(64,)).astype(np.float32)
    for beta in (1e-2, 5e-2, 0.5):
        ours = float(smooth_l1(jnp.asarray(a), jnp.asarray(b), beta))
        ref = float(F.smooth_l1_loss(torch.from_numpy(a), torch.from_numpy(b),
                                     beta=beta))
        np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_sup_pool_filters_and_arrays():
    pool, pano = _make_pool()
    info = pool.sup_infos[0]
    n = pool.n_valid
    assert 0 < n <= 32 * 64
    # edges of the cube room (depth discontinuities are only at corners —
    # smooth distance) mostly kept; normal test filters grazing pixels
    assert info.sup_rays_d.shape == (n, 3)
    arrs = pool.device_arrays()
    assert arrs["rays_o"].shape[0] >= n
    assert int(arrs["n_valid"]) == n
    # capacity is a power of two
    assert arrs["rays_o"].shape[0] & (arrs["rays_o"].shape[0] - 1) == 0


def test_sup_pool_sampling():
    pool, _ = _make_pool()
    rays, colors, dists, normals = pool.rand_ray_color_data(
        jax.random.PRNGKey(0), 256)
    assert rays.o.shape == (256, 3)
    assert colors.shape == (256, 3)
    assert (np.asarray(dists) > 0).all()


def test_sup_pool_state_roundtrip():
    pool, _ = _make_pool()
    state = pool.state_dict()
    pool2 = SupInfoPool()
    pool2.load_state_dict(state)
    assert pool2.n_valid == pool.n_valid
    np.testing.assert_allclose(pool2._cat["colors"], pool._cat["colors"])


def test_checkpoint_roundtrip(tmp_path):
    state = {
        "a": np.arange(6).reshape(2, 3),
        "nested": {"w": [np.ones(3), np.zeros(2)], "n": 5},
        "tup": (np.float32(1.5), {"x": np.arange(2)}),
    }
    p = str(tmp_path / "ckpt.npz")
    save_checkpoint(p, state)
    back = load_checkpoint(p)
    np.testing.assert_array_equal(back["a"], state["a"])
    np.testing.assert_array_equal(back["nested"]["w"][0], np.ones(3))
    assert int(back["nested"]["n"]) == 5
    assert isinstance(back["tup"], tuple)
    np.testing.assert_allclose(float(back["tup"][0]), 1.5)


def _tiny_scene(key=0, **train_kw):
    field_cfg = NGPFieldConfig(grid=HashGridConfig(
        n_levels=8, n_features=2, log2_table_size=14, base_res=4,
        per_level_scale=1.8))
    render_cfg = RenderConfig(step=4e-3, max_samples=128, occ_res=64)
    train_cfg = TrainConfig(raw_phase_iter_geo=300, raw_phase_iter_app=200,
                            pixel_loss_batch_size=512, scan_chunk=100,
                            **train_kw)
    return NeRFScene(field_cfg, render_cfg, train_cfg, jax.random.PRNGKey(key))


def test_golden_end_to_end_fit():
    """The minimum end-to-end slice: fit a tiny field on a synthetic RGB-D
    pano and verify depth convergence + color PSNR at the input pose."""
    pool, pano = _make_pool(32, 64)
    scene = _tiny_scene()
    losses = scene.fit(pool)

    # losses decreased
    geo = losses["geo_losses"]
    app = losses["app_losses"]
    assert geo[-10:, 1].mean() < geo[:10, 1].mean() * 0.5, "depth loss did not drop"
    assert app[-10:, 1].mean() < app[:10, 1].mean(), "color loss did not drop"

    # render at the input pose and compare
    rays = gen_pano_rays(jnp.eye(4), 32, 64)
    out = scene.render(rays, query_keys=("rgb", "distance"), chunk=1024)
    mask = np.asarray(pool.sup_infos[0].mask)[..., 0]
    gt_d = np.asarray(pano["distance"])[..., 0]
    pred_d = np.asarray(out["distance"])[..., 0]
    depth_err = np.abs(pred_d - gt_d)[mask].mean()
    assert depth_err < 0.05, depth_err
    p = psnr(np.asarray(out["rgb"])[mask], np.asarray(pano["rgb"])[mask])
    # measured 43.4 dB on this config (r2); 30 leaves CI variance margin
    # while still catching real regressions (r1 bar was 18)
    assert p > 30.0, p


def test_geo_stride2_golden_fit():
    """CPU golden-fit gate for ``TrainConfig.geo_sample_stride=2`` (round-5
    perf lever): coarser geo-phase quadrature CHANGES TRAINING NUMERICS
    (depth/distortion losses integrate at delta = 2*step with half the
    samples), so before any chip flip it must hold the same golden bars as
    the stride-1 fit (test_golden_end_to_end_fit). Reference quadrature it
    relaxes: nerf_renderer.py:145-155 (every occupied step sampled)."""
    pool, pano = _make_pool(32, 64)
    scene = _tiny_scene(geo_sample_stride=2)
    # the stride must actually engage: budget 128 % 4 == 0, march 8 % 2 == 0
    assert scene.train_cfg.geo_sample_stride == 2
    losses = scene.fit(pool)
    geo = losses["geo_losses"]
    assert geo[-10:, 1].mean() < geo[:10, 1].mean() * 0.5, "depth loss did not drop"

    rays = gen_pano_rays(jnp.eye(4), 32, 64)
    out = scene.render(rays, query_keys=("rgb", "distance"), chunk=1024)
    mask = np.asarray(pool.sup_infos[0].mask)[..., 0]
    gt_d = np.asarray(pano["distance"])[..., 0]
    depth_err = np.abs(np.asarray(out["distance"])[..., 0] - gt_d)[mask].mean()
    # same golden bars as the stride-1 fit: the lever is only real if the
    # fitted scene is indistinguishable at this scale
    assert depth_err < 0.05, depth_err
    p = psnr(np.asarray(out["rgb"])[mask], np.asarray(pano["rgb"])[mask])
    assert p > 30.0, p


def test_occ_field_prune_two_episodes():
    """``TrainConfig.occ_field_prune`` (round-5 deep-pool creep counter):
    episode 1 runs unpruned (no fitted field yet), episode 2 prunes the
    shell with episode-1's field. Gates: (a) the prune engages and never
    GROWS the grid, (b) voxels absent from the previous grid are kept
    (the self-healing property), (c) the golden fit bars hold through a
    pruned episode."""
    pool, pano = _make_pool(32, 64)
    scene = _tiny_scene(occ_field_prune=True)
    scene.fit(pool)                      # episode 1: unpruned
    occ1 = np.asarray(scene._prev_occ)
    assert occ1.sum() > 0
    scene.fit(pool)                      # episode 2: pruned by ep-1 field
    occ2 = np.asarray(scene.occ_grid)
    raw = np.asarray(pool.gen_occ_grid(scene.render_cfg.occ_res,
                                       scene.render_cfg.occ_dilation))
    assert (occ2 <= raw).all(), "prune grew the grid"

    # self-healing: a voxel NOT in the previous grid survives the prune
    # even where the field is empty. Find a voxel the FITTED field actually
    # marks empty (a tiny 300-step fit can leave residual density anywhere,
    # so probe the field instead of assuming a location): sample in-room
    # voxel centers and pick the lowest-density one with jitter margin.
    from perf_tpu.fields import query_density
    res = scene.render_cfg.occ_res
    rng = np.random.default_rng(3)
    cand_v = rng.integers(res // 4, 3 * res // 4, size=(512, 3))
    cand = ((cand_v.astype(np.float32) + 0.5) / res - 0.5) * 2.0
    dmax = np.zeros(512, np.float32)
    for _ in range(4):      # max over jittered in-voxel samples
        pj = cand + rng.uniform(-1, 1, cand.shape).astype(np.float32) / res
        dmax = np.maximum(dmax, np.asarray(query_density(
            scene.params["geo"], jnp.asarray(pj), scene.field_cfg))[..., 0])
    empty_i = int(np.argmin(dmax))
    if dmax[empty_i] * 5e-3 < 0.3 * 1e-2:   # safely below the binarization
        v = cand_v[empty_i]
        flat = int(v[0]) * res * res + int(v[1]) * res + int(v[2])
        occ_probe = jnp.asarray(raw).at[flat].set(1)
        pruned = np.asarray(scene._field_prune_occ(
            occ_probe, jnp.asarray(occ1)))
        if not occ1[flat]:
            assert pruned[flat] == 1, "new voxel was pruned"
        # ...but the same field-empty voxel IS pruned once the previous
        # grid says the field trained through it
        prev_probe = jnp.asarray(occ1).at[flat].set(1)
        pruned2 = np.asarray(scene._field_prune_occ(occ_probe, prev_probe))
        assert pruned2[flat] == 0, "field-empty trained voxel survived"

    # quality bars after the pruned episode (same as the golden fit)
    rays = gen_pano_rays(jnp.eye(4), 32, 64)
    out = scene.render(rays, query_keys=("rgb", "distance"), chunk=1024)
    mask = np.asarray(pool.sup_infos[0].mask)[..., 0]
    gt_d = np.asarray(pano["distance"])[..., 0]
    depth_err = np.abs(np.asarray(out["distance"])[..., 0] - gt_d)[mask].mean()
    assert depth_err < 0.05, depth_err
    p = psnr(np.asarray(out["rgb"])[mask], np.asarray(pano["rgb"])[mask])
    assert p > 30.0, p


def test_scene_state_roundtrip(tmp_path):
    pool, _ = _make_pool(16, 32)
    scene = _tiny_scene()
    scene.occ_grid = pool.gen_occ_grid(scene.render_cfg.occ_res)
    state = {"scene": scene.state_dict(), "phase": 3,
             "sup_pool": pool.state_dict()}
    p = str(tmp_path / "ckpt.npz")
    save_checkpoint(p, state)
    back = load_checkpoint(p)
    scene2 = _tiny_scene(key=99)
    scene2.load_state_dict(back["scene"])
    for leaf_a, leaf_b in zip(
            jax.tree_util.tree_leaves(scene.params),
            jax.tree_util.tree_leaves(scene2.params)):
        np.testing.assert_array_equal(np.asarray(leaf_a), np.asarray(leaf_b))
    assert int(back["phase"]) == 3
    pool2 = SupInfoPool()
    pool2.load_state_dict(back["sup_pool"])
    assert pool2.n_valid == pool.n_valid


def test_visibility_mask_identity_pose():
    # From the registered pose itself, (almost) everything is visible.
    pool, _ = _make_pool(32, 64)
    scene = _tiny_scene()
    scene.fit(pool)
    rays = gen_pano_rays(jnp.eye(4), 32, 64)
    visi = scene.get_pano_visibility_mask(pool, rays)
    assert float(np.asarray(visi).mean()) > 0.8


def test_geo_check_consistent_geometry_ok():
    pool, pano = _make_pool(32, 64)
    rays = gen_pano_rays(jnp.eye(4), 32, 64)
    ok = pool.geo_check(rays, pano["distance"] * 1.05)  # slightly behind walls
    # points behind every pano surface are fine (occluded, no conflict)
    assert float(np.asarray(ok).mean()) > 0.7
    conflict = pool.geo_check(rays, pano["distance"] * 0.5)  # floating in air
    assert float(np.asarray(conflict).mean()) < 0.3


def test_stacked_pano_projection_matches_loop():
    """device_pano_maps + the jitted vmap cores (_visibility_mask_core /
    _geo_check_core) must agree exactly with the eager per-pano loop they
    replace (the loop stays as the heterogeneous-resolution fallback)."""
    from perf_tpu.train.scene import pano_visibility_from_distance

    pool, pano = _make_pool(32, 64)
    pose2 = np.eye(4, dtype=np.float32)
    pose2[:3, 3] = (0.2, -0.1, 0.1)
    pano2 = render_cube_room_pano(jnp.asarray(pose2), 32, 64)
    pool.register_sup_info(pose=pose2, mask=np.ones((32, 64)),
                           rgb=pano2["rgb"], distance=pano2["distance"],
                           normal=pano2["normal"])
    assert pool.device_pano_maps() is not None
    # padded slots: P=2 -> cap 2 here, so force a padded stack too
    pose3 = np.eye(4, dtype=np.float32)
    pose3[:3, 3] = (-0.15, 0.05, -0.1)
    pano3 = render_cube_room_pano(jnp.asarray(pose3), 32, 64)
    pool.register_sup_info(pose=pose3, mask=np.ones((32, 64)),
                           rgb=pano3["rgb"], distance=pano3["distance"],
                           normal=pano3["normal"])
    poses, dmaps = pool.device_pano_maps()
    assert poses.shape[0] == 4 and dmaps.shape == (4, 32, 64, 1)

    rays = gen_pano_rays(jnp.asarray(pose2), 32, 64)
    distance = jnp.asarray(pano2["distance"]).reshape(32, 64, 1) * 0.9

    fast_vis = np.asarray(pano_visibility_from_distance(pool, rays, distance))
    fast_geo = np.asarray(pool.geo_check(rays, distance))
    # force the fallback loop by making device_pano_maps return None
    pool.device_pano_maps = lambda: None
    slow_vis = np.asarray(pano_visibility_from_distance(pool, rays, distance))
    slow_geo = np.asarray(pool.geo_check(rays, distance))
    np.testing.assert_array_equal(fast_vis, slow_vis)
    np.testing.assert_array_equal(fast_geo, slow_geo)
    assert 0.0 < fast_vis.mean() <= 1.0


def test_vis_freq_mid_episode_previews(tmp_path):
    """TrainConfig.vis_freq renders mid-episode previews (PNG in vis_dir).

    The reference declares vis_freq (configs/nerf.yaml:68) but nothing
    reads it; here it must actually fire on iteration boundaries."""
    pool, _ = _make_pool()
    fc = NGPFieldConfig(grid=HashGridConfig(
        n_levels=4, n_features=2, log2_table_size=12, base_res=4,
        per_level_scale=1.7))
    rc = RenderConfig(step=8e-3, max_samples=32, occ_res=32)
    tc = TrainConfig(pixel_loss_batch_size=256, raw_phase_iter_geo=40,
                     raw_phase_iter_app=20, scan_chunk=20, vis_freq=40)
    scene = NeRFScene(fc, rc, tc, jax.random.PRNGKey(0))
    scene.vis_dir = str(tmp_path)
    scene.fit(pool)
    files = sorted(p.name for p in tmp_path.iterdir())
    assert files == ["geo_000040.png"], files
