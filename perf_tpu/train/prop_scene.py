"""PropNeRFScene: the proposal-estimator training path.

Counterpart of the reference's ``estimator_type: prop`` branch
(``modules/scene/nerf.py:42-66``): two 5-level NGP density fields
(max_res 128 / 256) drive importance resampling instead of the occupancy
grid; the proposal fields train with nerfacc's PDF-matching loss under their
own Adam schedule (``configs/nerf.yaml:50-54``). The reference ships this
path BROKEN — its renderer calls an unimported ``render_weight_from_alpha``
(``modules/renderers/nerf_renderer.py:73``) — so this is the working
TPU-native version, validated by a convergence test instead of parity.

TPU shape mirrors ``NeRFScene``: one fully-jitted step per dispatch (sample
batch -> prop cascade -> final field -> losses -> two Adam updates), dense
[rays, samples] layouts throughout, bf16 matmuls inside the fields. The
geo phase trains geometry + proposals jointly (depth smooth-L1 flows to the
geometry field only — resampled edges are stop-gradient, exactly nerfacc's
contract — and the PDF loss to the proposals); the app phase trains
appearance on frozen geometry, as in the occ path.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core import Rays
from ..fields import (
    NGPFieldConfig, NGPDensityFieldConfig, init_ngp_params, reset_geo,
    init_density_field,
)
from ..render.prop import PropRenderConfig, render_rays_prop, prop_loss
from .schedule import lr_at, smooth_l1
from ..core.optim import guarded_step
from .scene import Scene, TrainConfig, pano_visibility_from_distance
from .sup_pool import SupInfoPool
from ..utils.metrics import MetricsWriter, phase_timer


def _prop_field_cfgs() -> tuple:
    """The reference's fixed proposal cascade (``nerf.py:44-57``)."""
    return (NGPDensityFieldConfig(max_res=128),
            NGPDensityFieldConfig(max_res=256))


def _adam():
    return optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)


def _prop_adam():
    # reference prop optimizer: Adam(eps=1e-15, betas=(0.9, 0.99),
    # weight_decay=1e-6) — ``nerf.py:58-64``
    return optax.chain(optax.add_decayed_weights(1e-6),
                       optax.scale_by_adam(b1=0.9, b2=0.99, eps=1e-15))


class PropNeRFScene(Scene):
    """fit/render via the proposal cascade; same Scene surface as the occ
    path so the runner swaps estimators from config alone."""

    def __init__(self, field_cfg: NGPFieldConfig, prop_cfg: PropRenderConfig,
                 train_cfg: TrainConfig, key: jax.Array,
                 writer: MetricsWriter | None = None):
        self.field_cfg = field_cfg
        self.prop_cfg = prop_cfg
        self.train_cfg = train_cfg
        self.writer = writer or MetricsWriter(None)
        self.prop_field_cfgs = _prop_field_cfgs()
        key, k0, k1, k2 = jax.random.split(key, 4)
        self.key = key
        self.params = init_ngp_params(k0, field_cfg)
        self.prop_params = [init_density_field(k, c) for k, c in
                            zip((k1, k2), self.prop_field_cfgs)]
        self.global_iter_geo = 0
        self.global_iter_app = 0
        self._phase_fns = {}

    def _next_key(self):
        self.key, k = jax.random.split(self.key)
        return k

    def _sample_batch(self, arrs, key):
        b = self.train_cfg.pixel_loss_batch_size
        u = jax.random.uniform(key, (b,))
        idx = jnp.minimum((u * arrs["n_valid"]).astype(jnp.int32),
                          arrs["n_valid"] - 1)
        return (arrs["rays_o"][idx], arrs["rays_d"][idx], arrs["colors"][idx],
                arrs["distances"][idx])

    # -- jitted steps --------------------------------------------------------

    def _get_phase_fn(self, phase: str, capacity: int):
        if (phase, capacity) in self._phase_fns:
            return self._phase_fns[(phase, capacity)]
        tc, fc, pc = self.train_cfg, self.field_cfg, self.prop_cfg
        pcfgs = list(self.prop_field_cfgs)
        adam, padam = _adam(), _prop_adam()

        def geo_step(app_params, arrs, carry, i):
            geo, props, opt_g, opt_p, key = carry
            key, k_idx, k_render = jax.random.split(key, 3)
            o, d, _, gt_dist = self._sample_batch(arrs, k_idx)
            progress = i / tc.raw_phase_iter_geo

            def loss_fn(geo_p, prop_p):
                out = render_rays_prop({"geo": geo_p, "app": app_params},
                                       prop_p, fc, pcfgs, o, d, k_render,
                                       pc, train=True)
                depth_l = smooth_l1(out["distance"], gt_dist, beta=1e-2)
                p_l = prop_loss(out["t_edges"], out["weights"],
                                out["prop_aux"])
                return depth_l * tc.depth_loss_weight + p_l, (depth_l, p_l)

            (loss, (depth_l, p_l)), (g_geo, g_prop) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True)(geo, props)
            up_g, new_opt_g = adam.update(g_geo, opt_g)
            lr_g = lr_at(progress, tc.geo_optimizer)
            new_geo = jax.tree_util.tree_map(
                lambda p, u: p - lr_g * u, geo, up_g)
            up_p, new_opt_p = padam.update(g_prop, opt_p, props)
            lr_p = lr_at(progress, tc.prop_optimizer)
            new_props = jax.tree_util.tree_map(lambda p, u: p - lr_p * u,
                                               props, up_p)
            (geo, props), (opt_g, opt_p), _ = guarded_step(
                (g_geo, g_prop), (new_geo, new_props),
                (new_opt_g, new_opt_p), (geo, props), (opt_g, opt_p))
            return ((geo, props, opt_g, opt_p, key),
                    jnp.stack([loss, depth_l, p_l, lr_g]))

        def app_step(frozen, arrs, carry, i):
            geo_params, props = frozen
            app, opt_state, key = carry
            key, k_idx, k_render = jax.random.split(key, 3)
            o, d, gt_col, _ = self._sample_batch(arrs, k_idx)
            progress = i / tc.raw_phase_iter_app

            def loss_fn(app_p):
                out = render_rays_prop({"geo": geo_params, "app": app_p},
                                       props, fc, pcfgs, o, d, k_render,
                                       pc, train=True)
                color_l = smooth_l1(out["rgb"], gt_col, beta=5e-2)
                return color_l * tc.color_loss_weight, color_l

            (loss, color_l), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(app)
            updates, new_opt = adam.update(grads, opt_state)
            lr = lr_at(progress, tc.app_optimizer)
            new_app = jax.tree_util.tree_map(
                lambda p, u: p - lr * u, app, updates)
            app, opt_state, _ = guarded_step(
                grads, new_app, new_opt, app, opt_state)
            return (app, opt_state, key), jnp.stack([loss, color_l, lr])

        if phase == "geo":
            @jax.jit
            def run_step(geo, props, app, opt_g, opt_p, arrs, key, i):
                carry, losses = geo_step(app, arrs,
                                         (geo, props, opt_g, opt_p, key), i)
                geo, props, opt_g, opt_p, key = carry
                return geo, props, opt_g, opt_p, key, losses
        else:
            @jax.jit
            def run_step(geo, props, app, opt_state, arrs, key, i):
                carry, losses = app_step((geo, props), arrs,
                                         (app, opt_state, key), i)
                app, opt_state, key = carry
                return app, opt_state, key, losses

        self._phase_fns[(phase, capacity)] = run_step
        return run_step

    # -- public API ----------------------------------------------------------

    def fit(self, sup_pool: SupInfoPool):
        """One episode: reset geometry, geo+prop phase, app phase
        (``nerf.py:125-184`` with the prop estimator active)."""
        tc = self.train_cfg
        self.params = reset_geo(self.params, self._next_key(), self.field_cfg)
        arrs = sup_pool.device_arrays()
        capacity = int(arrs["rays_o"].shape[0])

        geo = self.params["geo"]
        props = self.prop_params
        step = self._get_phase_fn("geo", capacity)
        opt_g = _adam().init(geo)
        opt_p = _prop_adam().init(props)
        key = self._next_key()
        geo_losses = []
        with phase_timer(self.writer, "fit_geo_prop", self.global_iter_geo,
                         tc.raw_phase_iter_geo * tc.pixel_loss_batch_size,
                         "rays"):
            for i in range(tc.raw_phase_iter_geo):
                geo, props, opt_g, opt_p, key, losses = step(
                    geo, props, self.params["app"], opt_g, opt_p, arrs, key,
                    jnp.asarray(i, jnp.float32))
                geo_losses.append(losses)
        self.params = {**self.params, "geo": geo}
        self.prop_params = list(props)
        self.global_iter_geo += tc.raw_phase_iter_geo

        app = self.params["app"]
        step = self._get_phase_fn("app", capacity)
        opt_a = _adam().init(app)
        app_losses = []
        with phase_timer(self.writer, "fit_app_prop", self.global_iter_app,
                         tc.raw_phase_iter_app * tc.pixel_loss_batch_size,
                         "rays"):
            for i in range(tc.raw_phase_iter_app):
                app, opt_a, key, losses = step(
                    geo, props, app, opt_a, arrs, key,
                    jnp.asarray(i, jnp.float32))
                app_losses.append(losses)
        self.params = {**self.params, "app": app}
        self.global_iter_app += tc.raw_phase_iter_app
        self.writer.flush()
        return {"geo_losses": np.asarray(jnp.stack(geo_losses)),
                "app_losses": np.asarray(jnp.stack(app_losses))}

    def render(self, rays: Rays, query_keys=("rgb",), key=None,
               chunk: int = 8192):
        """Chunked eval render through the prop cascade (``nerf.py:75-99``
        batching contract; deterministic mid-point sampling at eval)."""
        keys = tuple(query_keys)
        o = rays.o.reshape(-1, 3)
        d = rays.d.reshape(-1, 3)
        n = o.shape[0]
        n_pad = (-n) % chunk
        o_p = jnp.concatenate([o, jnp.broadcast_to(o[-1:], (n_pad, 3))], 0)
        d_p = jnp.concatenate([d, jnp.broadcast_to(d[-1:], (n_pad, 3))], 0)
        if key is None:
            key = self._next_key()

        fn = self._render_chunk_fn(keys)
        outs = {k: [] for k in keys}
        for s in range(0, o_p.shape[0], chunk):
            res = fn(self.params, self.prop_params, o_p[s:s + chunk],
                     d_p[s:s + chunk], key)
            for k in keys:
                outs[k].append(res[k])
        shape = rays.o.shape[:-1]
        return {k: jnp.concatenate(outs[k], 0)[:n].reshape(*shape, -1)
                for k in keys}

    def _render_chunk_fn(self, keys):
        if ("render", keys) in self._phase_fns:
            return self._phase_fns[("render", keys)]
        fc, pc = self.field_cfg, self.prop_cfg
        pcfgs = list(self.prop_field_cfgs)
        # eval composites onto black, not rand_noise (nerf_renderer.py eval
        # convention shared with the occ path)
        pc_eval = dataclasses.replace(pc, bg_color="black")

        @jax.jit
        def fn(params, prop_params, o, d, key):
            out = render_rays_prop(params, prop_params, fc, pcfgs, o, d,
                                   key, pc_eval, train=False)
            return {k: out[k] for k in keys}

        self._phase_fns[("render", keys)] = fn
        return fn

    # snapshot aliases: the prop path has no occupancy grid to bake, so the
    # fast-path calls fall through to the cascade render (runner calls these
    # unconditionally on the anchor cycle)
    def bake_snapshot(self, snap_cfg=None):
        return None

    def render_snapshot(self, rays: Rays, query_keys=("rgb", "distance"),
                        chunk: int = 8192):
        return self.render(rays, query_keys=query_keys, chunk=chunk)

    def get_pano_visibility_mask(self, sup_pool: SupInfoPool, rays: Rays,
                                 use_snapshot: bool = True) -> jnp.ndarray:
        distance = self.render(rays, query_keys=("distance",))["distance"]
        return pano_visibility_from_distance(sup_pool, rays, distance)

    # -- state ---------------------------------------------------------------

    def state_dict(self) -> dict:
        return {
            "params": jax.tree_util.tree_map(np.asarray, self.params),
            "prop_params": {f"p{i}": jax.tree_util.tree_map(np.asarray, p)
                            for i, p in enumerate(self.prop_params)},
            "global_iter_geo": self.global_iter_geo,
            "global_iter_app": self.global_iter_app,
        }

    def load_state_dict(self, state: dict):
        self.params = jax.tree_util.tree_map(jnp.asarray, state["params"])
        pp = state["prop_params"]
        self.prop_params = [jax.tree_util.tree_map(jnp.asarray, pp[f"p{i}"])
                            for i in range(len(pp))]
        self.global_iter_geo = int(state["global_iter_geo"])
        self.global_iter_app = int(state["global_iter_app"])
