"""PropNeRFScene: the proposal-estimator training path (round-3 wiring of
VERDICT #6). The reference's prop branch is BROKEN (its renderer calls an
unimported symbol — ``modules/renderers/nerf_renderer.py:73``), so this is
validated by convergence + interface contracts instead of parity.
"""

import jax
import jax.numpy as jnp
import numpy as np

from perf_tpu.core import gen_pano_rays
from perf_tpu.fields import NGPFieldConfig
from perf_tpu.kernels import HashGridConfig
from perf_tpu.render.prop import PropRenderConfig
from perf_tpu.train import PropNeRFScene, TrainConfig, SupInfoPool
from perf_tpu.utils import render_cube_room_pano

H, W = 32, 64


def _pool():
    pano = render_cube_room_pano(jnp.eye(4), H, W)
    pool = SupInfoPool()
    pool.register_sup_info(pose=np.eye(4, dtype=np.float32),
                           mask=np.ones((H, W)),
                           rgb=np.asarray(pano["rgb"]),
                           distance=np.asarray(pano["distance"]),
                           normal=np.asarray(pano["normal"]))
    return pool, pano


def _scene(key=0, geo_iters=120, app_iters=60):
    fc = NGPFieldConfig(grid=HashGridConfig(
        n_levels=6, log2_table_size=12, base_res=4, per_level_scale=2.0))
    tc = TrainConfig(raw_phase_iter_geo=geo_iters,
                     raw_phase_iter_app=app_iters,
                     pixel_loss_batch_size=512)
    return PropNeRFScene(
        fc, PropRenderConfig(n_samples=32, n_samples_per_prop=(64, 32)),
        tc, jax.random.PRNGKey(key))


def test_prop_fit_converges_and_renders():
    pool, pano = _pool()
    scene = _scene()
    out = scene.fit(pool)
    gl, al = out["geo_losses"], out["app_losses"]
    # depth + color losses must drop substantially over the episode
    assert gl[-10:, 1].mean() < gl[:10, 1].mean() * 0.7, \
        (gl[:10, 1].mean(), gl[-10:, 1].mean())
    assert al[-10:, 1].mean() < al[:10, 1].mean(), \
        (al[:10, 1].mean(), al[-10:, 1].mean())

    rays = gen_pano_rays(jnp.eye(4), H, W)
    res = scene.render(rays, query_keys=("rgb", "distance"))
    rgb, dist = np.asarray(res["rgb"]), np.asarray(res["distance"])
    assert np.isfinite(rgb).all() and np.isfinite(dist).all()
    assert rgb.std() > 0.02
    mae = np.abs(dist - np.asarray(pano["distance"])).mean()
    assert mae < 0.15, mae

    # visibility mask from the same pose covers nearly everything
    mask = scene.get_pano_visibility_mask(pool, rays)
    assert float(mask.mean()) > 0.8, float(mask.mean())

    # state round-trips through the npz-flat contract (lists -> p{i} keys)
    sd = scene.state_dict()
    scene2 = _scene(key=1)
    scene2.load_state_dict(sd)
    k = jax.random.PRNGKey(42)
    d1 = scene.render(rays, query_keys=("distance",), key=k)["distance"]
    d2 = scene2.render(rays, query_keys=("distance",), key=k)["distance"]
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-5)
