"""Sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from perf_tpu.fields import NGPFieldConfig, init_ngp_params
from perf_tpu.kernels import HashGridConfig
from perf_tpu.render import RenderConfig, occ_grid_from_points
from perf_tpu.parallel import (
    make_mesh, build_dp_train_step, shard_params, ray_sharding,
)


def _setup():
    field_cfg = NGPFieldConfig(grid=HashGridConfig(
        n_levels=4, n_features=2, log2_table_size=10, base_res=4,
        per_level_scale=2.0))
    render_cfg = RenderConfig(step=1e-2, max_samples=32, occ_res=32)
    params = init_ngp_params(jax.random.PRNGKey(0), field_cfg)
    rng = np.random.default_rng(0)
    dirs = rng.normal(size=(256, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    pts = jnp.asarray(dirs * 0.5)
    grid = occ_grid_from_points(pts, res=render_cfg.occ_res)
    batch = {
        "rays_o": jnp.zeros((64, 3)),
        "rays_d": jnp.asarray(dirs[:64]),
        "colors": jnp.full((64, 3), 0.7),
        "distances": jnp.full((64, 1), 0.5),
    }
    return field_cfg, render_cfg, params, grid, batch


def test_mesh_construction():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data", "model")
    mesh2 = make_mesh(n_data=4, n_model=2)
    assert mesh2.devices.shape == (4, 2)


def test_dp_step_runs_and_improves():
    field_cfg, render_cfg, params, grid, batch = _setup()
    mesh = make_mesh()
    init_opt, step = build_dp_train_step(field_cfg, render_cfg, mesh)
    params = shard_params(params, mesh)
    batch = jax.device_put(batch, ray_sharding(mesh))
    opt_state = init_opt(params)
    key = jax.random.PRNGKey(1)
    first = None
    for i in range(30):
        key, k = jax.random.split(key)
        params, opt_state, m = step(params, opt_state, grid, batch, k,
                                    jnp.asarray(i / 30.0))
        if first is None:
            first = float(m["depth_loss"])
    assert float(m["depth_loss"]) < first


def test_shard_invariance_1_vs_8_devices():
    """The same step on a 1-device and an 8-device mesh must agree."""
    field_cfg, render_cfg, params, grid, batch = _setup()
    results = {}
    for n in (1, 8):
        mesh = make_mesh(n_data=n, devices=jax.devices()[:n])
        init_opt, step = build_dp_train_step(field_cfg, render_cfg, mesh)
        p = shard_params(params, mesh)
        b = jax.device_put(batch, ray_sharding(mesh))
        opt_state = init_opt(p)
        p2, _, m = step(p, opt_state, grid, b, jax.random.PRNGKey(7),
                        jnp.asarray(0.5))
        results[n] = (jax.tree_util.tree_map(np.asarray, p2),
                      {k: float(v) for k, v in m.items()})
    for k in results[1][1]:
        np.testing.assert_allclose(results[1][1][k], results[8][1][k],
                                   rtol=1e-4, err_msg=k)
    for a, b in zip(jax.tree_util.tree_leaves(results[1][0]),
                    jax.tree_util.tree_leaves(results[8][0])):
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_model_axis_table_sharding():
    """Hash tables sharded over 'model' still produce identical results."""
    field_cfg, render_cfg, params, grid, batch = _setup()
    mesh = make_mesh(n_data=4, n_model=2)
    init_opt, step = build_dp_train_step(field_cfg, render_cfg, mesh)
    p_sharded = shard_params(params, mesh, shard_tables=True)
    b = jax.device_put(batch, ray_sharding(mesh))
    _, _, m_sharded = step(p_sharded, init_opt(p_sharded), grid, b,
                           jax.random.PRNGKey(7), jnp.asarray(0.5))

    mesh1 = make_mesh(n_data=1, devices=jax.devices()[:1])
    init_opt1, step1 = build_dp_train_step(field_cfg, render_cfg, mesh1)
    p1 = shard_params(params, mesh1)
    b1 = jax.device_put(batch, ray_sharding(mesh1))
    _, _, m1 = step1(p1, init_opt1(p1), grid, b1, jax.random.PRNGKey(7),
                     jnp.asarray(0.5))
    for k in m1:
        np.testing.assert_allclose(float(m_sharded[k]), float(m1[k]),
                                   rtol=1e-4, err_msg=k)


def test_multi_scene_batch_training():
    """BASELINE config 5: N scenes trained data-parallel with the scene axis
    sharded over the mesh."""
    from perf_tpu.parallel import (
        init_multi_scene_params, build_multi_scene_step, make_mesh,
    )
    from perf_tpu.render import occ_grid_from_points

    field_cfg, render_cfg, _, _, _ = _setup()
    n_scenes = 4
    mesh = make_mesh(n_data=4, devices=jax.devices()[:4])
    params = init_multi_scene_params(jax.random.PRNGKey(0), n_scenes, field_cfg)
    rng = np.random.default_rng(0)

    grids, batches = [], []
    for s in range(n_scenes):
        dirs = rng.normal(size=(128, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        radius = 0.4 + 0.1 * s
        grids.append(occ_grid_from_points(jnp.asarray(dirs * radius),
                                          res=render_cfg.occ_res))
        batches.append({
            "rays_o": jnp.zeros((64, 3)),
            "rays_d": jnp.asarray(dirs[:64]),
            "distances": jnp.full((64, 1), radius),
        })
    occ_grids = jnp.stack(grids)
    batch = {k: jnp.stack([b[k] for b in batches]) for k in batches[0]}

    init_opt, step = build_multi_scene_step(field_cfg, render_cfg, mesh)
    opt_state = init_opt(params)
    key = jax.random.PRNGKey(1)
    first = None
    for i in range(25):
        key, k = jax.random.split(key)
        keys = jax.random.split(k, n_scenes)
        params, opt_state, losses = step(params, opt_state, occ_grids, batch,
                                         keys, jnp.asarray(i / 25.0))
        if first is None:
            first = np.asarray(losses)
    last = np.asarray(losses)
    # the batch trains: mean depth loss drops and most scenes improve
    # (25 steps is short; per-scene noise is expected)
    assert last.mean() < first.mean(), (first, last)
    assert (last < first).sum() >= 3, (first, last)


def test_brick_table_model_sharding():
    from perf_tpu.kernels import BrickGridConfig
    field_cfg = NGPFieldConfig(grid=BrickGridConfig(
        n_levels=4, n_features=2, log2_bricks=8, base_res=4,
        per_level_scale=2.0))
    render_cfg = RenderConfig(step=1e-2, max_samples=32, occ_res=32)
    params = init_ngp_params(jax.random.PRNGKey(0), field_cfg)
    mesh = make_mesh(n_data=4, n_model=2)
    p = shard_params(params, mesh, shard_tables=True)
    # brick rows (axis 1) sharded over 'model'
    sh = p["geo"]["table"].sharding.spec
    assert tuple(sh) == (None, "model", None), sh
    rng = np.random.default_rng(0)
    dirs = rng.normal(size=(64, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    grid = occ_grid_from_points(jnp.asarray(dirs * 0.5), res=32)
    batch = {"rays_o": jnp.zeros((64, 3)), "rays_d": jnp.asarray(dirs),
             "colors": jnp.full((64, 3), 0.7),
             "distances": jnp.full((64, 1), 0.5)}
    init_opt, step = build_dp_train_step(field_cfg, render_cfg, mesh)
    b = jax.device_put(batch, ray_sharding(mesh))
    _, _, m = step(p, init_opt(p), grid, b, jax.random.PRNGKey(7),
                   jnp.asarray(0.5))
    assert np.isfinite(float(m["depth_loss"]))


def test_dp_render_matches_single_device():
    """Sharded eval render == unsharded render_rays on the same rays."""
    from perf_tpu.parallel import build_dp_render
    from perf_tpu.render import render_rays
    field_cfg, render_cfg, params, grid, batch = _setup()
    mesh = make_mesh()
    render_chunk = build_dp_render(field_cfg, render_cfg, mesh)
    p = shard_params(params, mesh)
    o = jax.device_put(batch["rays_o"], ray_sharding(mesh))
    d = jax.device_put(batch["rays_d"], ray_sharding(mesh))
    out = render_chunk(p, grid, o, d)

    ref = render_rays(params, field_cfg, grid, batch["rays_o"],
                      batch["rays_d"], jax.random.PRNGKey(0), render_cfg,
                      train=False)
    np.testing.assert_allclose(np.asarray(out["rgb"]),
                               np.asarray(ref["rgb"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["distance"]),
                               np.asarray(ref["distance"]), atol=1e-5)


def test_multihost_mesh_multi_scene():
    """SURVEY §2.4 multi-host plan: ('scene', 'data', 'model') mesh with the
    scene axis standing in for the DCN (host) dimension — 2 'hosts' x 4
    devices simulated on the 8-device CPU mesh. The multi-scene step must
    train under the host-per-scene layout with rays split over the
    intra-host 'data' axis."""
    from perf_tpu.parallel import (
        init_multi_scene_params, build_multi_scene_step, make_multihost_mesh,
        scene_sharding, scene_ray_sharding,
    )
    from perf_tpu.render import occ_grid_from_points

    field_cfg, render_cfg, _, _, _ = _setup()
    mesh = make_multihost_mesh(n_scene=2)
    assert mesh.axis_names == ("scene", "data", "model")
    assert mesh.devices.shape == (2, 4, 1)

    n_scenes = 2
    params = init_multi_scene_params(jax.random.PRNGKey(0), n_scenes,
                                     field_cfg)
    rng = np.random.default_rng(0)
    grids, batches = [], []
    for s in range(n_scenes):
        dirs = rng.normal(size=(128, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        radius = 0.4 + 0.1 * s
        grids.append(occ_grid_from_points(jnp.asarray(dirs * radius),
                                          res=render_cfg.occ_res))
        batches.append({
            "rays_o": jnp.zeros((64, 3)),
            "rays_d": jnp.asarray(dirs[:64]),
            "distances": jnp.full((64, 1), radius),
        })
    occ_grids = jax.device_put(jnp.stack(grids), scene_sharding(mesh))
    batch = jax.device_put(
        {k: jnp.stack([b[k] for b in batches]) for k in batches[0]},
        scene_ray_sharding(mesh))
    # each scene's rays live on that scene's (host's) 4 'data' devices
    assert len(batch["rays_d"].sharding.device_set) == 8
    assert batch["rays_d"].sharding.shard_shape(
        batch["rays_d"].shape) == (1, 16, 3)

    init_opt, step = build_multi_scene_step(field_cfg, render_cfg, mesh)
    opt_state = init_opt(params)
    key = jax.random.PRNGKey(1)
    first = None
    for i in range(25):
        key, k = jax.random.split(key)
        keys = jax.random.split(k, n_scenes)
        params, opt_state, losses = step(params, opt_state, occ_grids, batch,
                                         keys, jnp.asarray(i / 25.0))
        if first is None:
            first = np.asarray(losses)
    last = np.asarray(losses)
    assert last.mean() < first.mean(), (first, last)


def test_bucketed_scene_step_shard_invariance():
    """The PRODUCTION NeRFScene bucketed train step (pool-probed budget,
    two-budget plan, occupancy argsort, in-step batch sampling) under an
    8-device 'data' mesh matches the single-device program (VERDICT r4
    item 5: shard THE trainer, not a simplified sibling). GSPMD semantics
    make the sharded program equivalent up to psum reassociation."""
    import optax
    from perf_tpu.train import NeRFScene, SupInfoPool, TrainConfig
    from perf_tpu.utils import render_cube_room_pano

    field_cfg, render_cfg, _, _, _ = _setup()
    h, w = 32, 64
    pano = render_cube_room_pano(jnp.asarray(np.eye(4, dtype=np.float32)),
                                 h, w)
    pool = SupInfoPool()
    pool.register_sup_info(np.eye(4, dtype=np.float32), np.ones((h, w)),
                           pano["rgb"], pano["distance"], pano["normal"])
    occ = pool.gen_occ_grid(render_cfg.occ_res)
    arrs = pool.device_arrays()
    adam = optax.scale_by_adam(eps=1e-8)

    def run(mesh):
        scene = NeRFScene(field_cfg, render_cfg,
                          TrainConfig(pixel_loss_batch_size=512),
                          jax.random.PRNGKey(0), mesh=mesh)
        scene.occ_grid = occ
        scene.sample_budget = scene.select_sample_budget(arrs)
        if scene.bucket_plan is None:   # force the bucketed program family
            scene.bucket_plan = (max(16, scene.sample_budget // 2), 64)
        out = {}
        for phase in ("geo", "app"):
            run_chunk = scene._get_phase_fn(
                phase, int(arrs["rays_o"].shape[0]))
            tp, fz = (("geo", "app") if phase == "geo" else ("app", "geo"))
            new_p, _, _, losses = run_chunk(
                scene.params[tp], scene.params[fz],
                adam.init(scene.params[tp]), scene.occ_grid, arrs,
                jax.random.PRNGKey(7), jnp.asarray(0.0, jnp.float32))
            out[phase] = (jax.tree_util.tree_map(np.asarray, new_p),
                          np.asarray(losses))
        return out

    single = run(None)
    sharded = run(make_mesh(n_data=8, devices=jax.devices()[:8]))
    for phase in ("geo", "app"):
        np.testing.assert_allclose(single[phase][1], sharded[phase][1],
                                   rtol=1e-4, err_msg=f"{phase} losses")
        for a, b in zip(jax.tree_util.tree_leaves(single[phase][0]),
                        jax.tree_util.tree_leaves(sharded[phase][0])):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b, np.float32),
                                       atol=2e-5, err_msg=phase)
