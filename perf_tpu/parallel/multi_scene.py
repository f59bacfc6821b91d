"""Multi-scene batched training: N panoramas trained data-parallel.

BASELINE.json config 5 ("Multi-scene batch: N panoramas trained
data-parallel over a TPU mesh, sharded ray batches") — a capability the
reference cannot express at all (strictly one scene, one process, one GPU).

Shape: all per-scene state (field params, occupancy grid, supervision
arrays) carries a leading scene axis; ONE train step is ``vmap``-ed over that
axis and the scene axis is sharded over the mesh's 'data' dimension, so each
device (group) trains its own scene(s) with identical program structure —
zero cross-scene communication, perfect scaling.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..fields.ngp import NGPFieldConfig, init_ngp_params
from ..render.renderer import RenderConfig, render_rays
from ..kernels.distortion import distortion_loss
from ..train.schedule import OptimConfig, lr_at, smooth_l1
from .mesh import scene_sharding, scene_ray_sharding
from ..core.optim import guarded_step


def init_multi_scene_params(key: jax.Array, n_scenes: int,
                            cfg: NGPFieldConfig) -> dict:
    """Stacked params with a leading scene axis."""
    keys = jax.random.split(key, n_scenes)
    return jax.vmap(lambda k: init_ngp_params(k, cfg))(keys)


def build_multi_scene_step(field_cfg: NGPFieldConfig, render_cfg: RenderConfig,
                           mesh=None, geo_opt: OptimConfig = OptimConfig(),
                           depth_w: float = 1.0, dist_w: float = 0.1):
    """Returns (init_opt_state, step).

    step(params, opt_state, occ_grids, batch, keys, progress):
    - params: scene-stacked pytree (leading axis n_scenes)
    - occ_grids: [n_scenes, res^3]
    - batch: dict of [n_scenes, rays, ...] supervision
    - keys: [n_scenes, 2] PRNG keys
    One geometry step per scene, vmapped; the scene axis is sharded over
    'data' when a mesh is given.
    """
    adam = optax.scale_by_adam(eps=1e-8)

    def one_scene_step(params, opt_state, occ, batch, key, progress):
        def loss_fn(geo):
            out = render_rays({"geo": geo, "app": params["app"]}, field_cfg,
                              occ, batch["rays_o"], batch["rays_d"], key,
                              render_cfg, train=True, stop_app_grad=True,
                              need_rgb=False)
            depth_l = smooth_l1(out["distance"], batch["distances"], beta=1e-2)
            dist_l = distortion_loss(out["weights"], out["t_mid"],
                                     render_cfg.step, out["valid"])
            ratio = jnp.minimum(progress * 2.0, 1.0)
            return depth_l * depth_w + dist_l * dist_w * ratio, depth_l

        (loss, depth_l), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params["geo"])
        updates, new_opt = adam.update(grads, opt_state)
        lr = lr_at(progress, geo_opt)
        new_geo = jax.tree_util.tree_map(lambda p, u: p - lr * u,
                                         params["geo"], updates)
        geo, opt_state, _ = guarded_step(grads, new_geo, new_opt,
                                         params["geo"], opt_state)
        return {**params, "geo": geo}, opt_state, depth_l

    def init_opt_state(params):
        return jax.vmap(lambda g: adam.init(g))(params["geo"])

    vstep = jax.vmap(one_scene_step, in_axes=(0, 0, 0, 0, 0, None))

    @jax.jit
    def step(params, opt_state, occ_grids, batch, keys, progress):
        if mesh is not None:
            # scene-stacked state over the scene axis ('scene' across hosts
            # on a multi-host mesh, else 'data'); ray batches additionally
            # over the intra-host 'data' axis so each host's devices split
            # their scene's rays over ICI
            per_scene = lambda t: jax.tree_util.tree_map(
                lambda x: jax.lax.with_sharding_constraint(
                    x, scene_sharding(mesh)), t)
            params = per_scene(params)
            occ_grids = per_scene(occ_grids)
            batch = jax.tree_util.tree_map(
                lambda x: jax.lax.with_sharding_constraint(
                    x, scene_ray_sharding(mesh)), batch)
        return vstep(params, opt_state, occ_grids, batch, keys, progress)

    return init_opt_state, step
