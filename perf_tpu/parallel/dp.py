"""Mesh-sharded training steps.

One fully-jitted train step (sample -> march -> encode -> MLP -> composite ->
loss -> adam) with the ray axis sharded over the mesh's 'data' axis and
params replicated (optionally hash tables sharded over 'model'). This is the
multi-chip path exercised by ``__graft_entry__.dryrun_multichip`` and by
scaling runs; single-chip training uses the same math via
``perf_tpu.train.scene``.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import optax

from ..fields.ngp import NGPFieldConfig
from ..render.renderer import RenderConfig, render_rays
from ..kernels.distortion import distortion_loss
from ..train.schedule import OptimConfig, lr_at, smooth_l1
from .mesh import shard_rays
from ..core.optim import guarded_step


def build_dp_train_step(field_cfg: NGPFieldConfig, render_cfg: RenderConfig,
                        mesh, geo_opt: OptimConfig = OptimConfig(),
                        app_opt: OptimConfig = OptimConfig(),
                        depth_w: float = 1.0, dist_w: float = 0.1,
                        color_w: float = 1.0):
    """Returns (init_opt_state, train_step).

    train_step(params, opt_state, occ_grid, batch, key, progress) performs
    ONE joint step: geo update from depth+distortion (appearance frozen) and
    app update from color (geometry frozen) — the two reference phases fused
    into one program so the dryrun exercises the full gradient path.

    batch = dict(rays_o, rays_d, colors, distances) with leading ray axis;
    the step constrains it to 'data' sharding, so per-device compute is
    batch/n_data and the Adam update runs on psum'd grads.
    """
    adam = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)

    def init_opt_state(params):
        return {"geo": adam.init(params["geo"]), "app": adam.init(params["app"])}

    @jax.jit
    def train_step(params, opt_state, occ_grid, batch, key, progress):
        batch = shard_rays(batch, mesh)
        o, d = batch["rays_o"], batch["rays_d"]
        k_geo, k_app = jax.random.split(key)

        def geo_loss(geo_p):
            out = render_rays({"geo": geo_p, "app": params["app"]}, field_cfg,
                              occ_grid, o, d, k_geo, render_cfg, train=True,
                              stop_app_grad=True, need_rgb=False)
            depth_l = smooth_l1(out["distance"], batch["distances"], beta=1e-2)
            dist_l = distortion_loss(out["weights"], out["t_mid"],
                                     render_cfg.step, out["valid"])
            ratio = jnp.minimum(progress * 2.0, 1.0)
            return depth_l * depth_w + dist_l * dist_w * ratio, depth_l

        def app_loss(app_p):
            out = render_rays({"geo": params["geo"], "app": app_p}, field_cfg,
                              occ_grid, o, d, k_app, render_cfg, train=True,
                              stop_geo_grad=True)
            return color_w * smooth_l1(out["rgb"], batch["colors"], beta=5e-2)

        (gl, depth_l), g_geo = jax.value_and_grad(geo_loss, has_aux=True)(
            params["geo"])
        al, g_app = jax.value_and_grad(app_loss)(params["app"])

        lr_g = lr_at(progress, geo_opt)
        lr_a = lr_at(progress, app_opt)
        up_g, st_g = adam.update(g_geo, opt_state["geo"])
        up_a, st_a = adam.update(g_app, opt_state["app"])
        new_params = {
            "geo": jax.tree_util.tree_map(lambda p, u: p - lr_g * u,
                                          params["geo"], up_g),
            "app": jax.tree_util.tree_map(lambda p, u: p - lr_a * u,
                                          params["app"], up_a),
        }
        # psum'd grads are identical on every device, so the finite verdict
        # (and hence the skip) is replicated — no divergence across shards.
        new_params, new_opt, _ = guarded_step(
            {"geo": g_geo, "app": g_app}, new_params,
            {"geo": st_g, "app": st_a}, params, opt_state)
        metrics = {"geo_loss": gl, "depth_loss": depth_l, "color_loss": al}
        return new_params, new_opt, metrics

    return init_opt_state, train_step


def build_dp_render(field_cfg: NGPFieldConfig, render_cfg: RenderConfig,
                    mesh, query_keys=("rgb", "distance")):
    """Mesh-sharded eval rendering (SURVEY §2.4: "render tiles across a
    Mesh axis 'data'"). Returns render_chunk(params, occ_grid, o, d):
    one jitted dispatch with the ray axis sharded over 'data' and params
    replicated — each chip marches and composites its ray shard, no
    cross-chip traffic at all (rays are independent).

    The chunk length must be a multiple of the 'data' axis size; callers
    pad (render_image's chunk padding already guarantees this for
    power-of-two chunks).
    """
    keys = tuple(query_keys)
    n_data = int(mesh.shape["data"])

    @jax.jit
    def render_chunk(params, occ_grid, o, d):
        assert o.shape[0] % n_data == 0, (
            f"render chunk of {o.shape[0]} rays does not divide over the "
            f"'data' mesh axis ({n_data} devices); pad the chunk to a "
            f"multiple (render_image's power-of-two chunks already do)")
        # NB: tree_map returns dicts in sorted-key order — index, never
        # unpack .values()
        sharded = shard_rays({"o": o, "d": d}, mesh)
        o, d = sharded["o"], sharded["d"]
        out = render_rays(params, field_cfg, occ_grid, o, d,
                          jax.random.PRNGKey(0), render_cfg, train=False,
                          need_rgb="rgb" in keys)
        return {q: out[q] for q in keys}

    return render_chunk
