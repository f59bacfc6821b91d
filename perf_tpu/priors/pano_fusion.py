"""Pano fusion predictors: per-pixel map optimization (no neural field).

Counterparts of the reference's ``pano_fusion_inv_predictor.py`` (distance)
and ``pano_fusion_normal_predictor.py`` (normals): optimize a per-pixel pano
parameter map plus per-view scale/bias so that every tangent view's monocular
prediction, reprojected onto the pano, agrees — weighted by cos(latitude)
equirect distortion weights. Two phases (global scale -> + local per-view
bias maps), 1000 iters, cosine LR.

These run on the non-Wild dataset path (``dataset.py:40-68``); the Wild path
uses the joint predictor. Kept for component parity and as a cheaper
alternative bootstrap.

TPU shape: per-iteration work is dense full-map resampling (view->pano
bilinear for every view) — one jitted scan chunk, no data-dependent shapes.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core import (
    tangent_cameras, tangent_c2w, direction_to_img_coord, bilinear_sample,
    direction_to_pers_img_coord, img_coord_from_hw, img_to_pano_coord,
    img_coord_to_pano_direction, pano_sample,
)
from ..train.schedule import smooth_l1
from ..core.optim import guarded_step
from .interface import DepthPredictor, NormalPredictor


def _view_geometry(gen_res: int, ratio: float = 1.0):
    dirs, ratios, tos, downs, rights = tangent_cameras(gen_res, ratio)
    c2w, _, _ = tangent_c2w(tos, downs, rights)
    return (jnp.asarray(dirs), jnp.asarray(ratios), jnp.asarray(tos),
            jnp.asarray(downs), jnp.asarray(rights), jnp.asarray(c2w))


def _pano_projection(pano_hw, tos, downs, rights):
    """Per-view pano->view projection coords + masks.

    Returns (coords [V, H, W, 2] image coords clipped to [0,1],
    masks [V, H, W, 1])."""
    h, w = pano_hw
    pano_dirs = img_coord_to_pano_direction(img_coord_from_hw(h, w))
    coords, masks = jax.vmap(
        lambda t, d, r: direction_to_pers_img_coord(pano_dirs, t, d, r)
    )(tos, downs, rights)
    return jnp.clip(coords, 0.0, 1.0), masks


def _distortion_weights(h, w):
    pano_coord = img_to_pano_coord(img_coord_from_hw(h, w))
    return jnp.cos(pano_coord[..., 0])  # [H, W]


@dataclasses.dataclass(frozen=True)
class PanoFusionConfig:
    gen_res: int = 384
    iters: int = 1000
    scan_chunk: int = 50


class PanoFusionInvPredictor:
    """Distance fusion (reference ``inpaint_distance``,
    ``pano_fusion_inv_predictor.py:34-162``)."""

    def __init__(self, depth_predictor: DepthPredictor,
                 cfg: PanoFusionConfig = PanoFusionConfig(), seed: int = 0):
        self.depth = depth_predictor
        self.cfg = cfg
        self.key = jax.random.PRNGKey(seed)

    def __call__(self, img, ref_distance, mask):
        return self.inpaint_distance(img, ref_distance, mask)

    def inpaint_distance(self, img, ref_distance, mask):
        cfg = self.cfg
        img = jnp.asarray(img)
        h, w = img.shape[0], img.shape[1]
        ref_distance = jnp.asarray(ref_distance).reshape(h, w)
        mask = jnp.asarray(mask).reshape(h, w).astype(jnp.float32)

        dirs, ratios, tos, downs, rights, _ = _view_geometry(cfg.gen_res)
        n_views = dirs.shape[0]
        views = pano_sample(img, direction_to_img_coord(dirs))
        pred = jnp.clip(self.depth.predict_depth(views, dirs=dirs), 0.0, None)
        pred = pred / (jnp.mean(pred, axis=(1, 2, 3), keepdims=True) + 1e-5)
        pred = pred[..., 0]                                          # [V,r,r]

        proj_coords, proj_masks = _pano_projection((h, w), tos, downs, rights)
        weights = proj_masks * _distortion_weights(h, w)[None, ..., None]

        params = {
            "scale": jnp.zeros((n_views,)),
            "bias": jnp.zeros((n_views, cfg.gen_res, cfg.gen_res)),
            "pano": jnp.zeros((h, w)),
        }
        adam = optax.scale_by_adam(eps=1e-8)
        opt_state = adam.init(params)
        init_lr, lr_alpha = 1e-1, 1e-2
        sample_view = jax.vmap(lambda im, c: bilinear_sample(im, c, "border"))

        def step(all_phase: bool, carry, i):
            params, opt_state = carry
            progress = i / cfg.iters
            lr = init_lr * ((jnp.cos(progress * jnp.pi) + 1.0)
                            * (1.0 - lr_alpha) + lr_alpha)

            def loss_fn(p):
                pano_d = jax.nn.softplus(p["pano"]) + 1e-3
                pano_d = pano_d * mask + ref_distance * (1.0 - mask)
                scales = jax.nn.softplus(p["scale"])
                bias = p["bias"] if all_phase else jnp.zeros_like(p["bias"])
                pd = jnp.clip((pred + bias) * ratios[..., 0]
                              * scales[:, None, None], 1e-5, None)
                proj = sample_view(pd[..., None], proj_coords)        # [V,H,W,1]
                err = (proj - pano_d[None, ..., None]) * proj_masks
                d = jnp.abs(err)
                beta = 1e-1
                sl1 = jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)
                align = jnp.sum(sl1 * weights) / jnp.sum(weights)
                tv = (smooth_l1(p["bias"][:, 1:], p["bias"][:, :-1], beta=1e-1)
                      + smooth_l1(p["bias"][:, :, 1:], p["bias"][:, :, :-1],
                                  beta=1e-1))
                reg = (jnp.mean(scales) - 1.0) ** 2
                return align + tv * 5.0 + reg * 1e-2

            grads = jax.grad(loss_fn)(params)
            if not all_phase:
                grads = {**grads, "bias": jnp.zeros_like(grads["bias"])}
            updates, new_opt = adam.update(grads, opt_state)
            new_params = jax.tree_util.tree_map(lambda a, u: a - lr * u,
                                                params, updates)
            params, opt_state, _ = guarded_step(
                grads, new_params, new_opt, params, opt_state)
            return (params, opt_state), None

        @partial(jax.jit, static_argnames=("all_phase",))
        def run_chunk(params, opt_state, i0, all_phase):
            def body(carry, j):
                return step(all_phase, carry, i0 + j)
            (params, opt_state), _ = jax.lax.scan(
                body, (params, opt_state),
                jnp.arange(cfg.scan_chunk, dtype=jnp.float32))
            return params, opt_state

        half = cfg.iters // 2
        assert half % cfg.scan_chunk == 0
        for phase_i, all_phase in enumerate((False, True)):
            for c in range(half // cfg.scan_chunk):
                i0 = jnp.asarray(phase_i * half + c * cfg.scan_chunk,
                                 jnp.float32)
                params, opt_state = run_chunk(params, opt_state, i0,
                                              all_phase=all_phase)

        pano_d = jax.nn.softplus(params["pano"]) + 1e-3
        pano_d = pano_d * mask + ref_distance * (1.0 - mask)
        return pano_d, None


class PanoFusionNormalPredictor:
    """Normal fusion (reference ``inpaint_normal``,
    ``pano_fusion_normal_predictor.py:29-183``). Pano normal map initialized
    to the inward view direction."""

    def __init__(self, normal_predictor: NormalPredictor,
                 cfg: PanoFusionConfig = PanoFusionConfig(), seed: int = 0):
        self.normal = normal_predictor
        self.cfg = cfg

    def inpaint_normal(self, img, ref_normal, mask):
        cfg = self.cfg
        img = jnp.asarray(img)
        h, w = img.shape[0], img.shape[1]
        ref_normal = jnp.asarray(ref_normal).reshape(h, w, 3)
        mask = jnp.asarray(mask).reshape(h, w, 1).astype(jnp.float32)

        dirs, _, tos, downs, rights, c2w = _view_geometry(cfg.gen_res)
        n_views = dirs.shape[0]
        views = pano_sample(img, direction_to_img_coord(dirs))
        pred = self.normal.predict_normal(views, dirs=dirs, c2w=c2w)
        pred = pred * 2.0 - 1.0
        pred = pred / jnp.linalg.norm(pred, axis=-1, keepdims=True)
        pred = jnp.einsum("vij,vhwj->vhwi", c2w, pred)            # [V,r,r,3]

        proj_coords, proj_masks = _pano_projection((h, w), tos, downs, rights)
        weights = proj_masks * _distortion_weights(h, w)[None, ..., None]

        params = {
            "bias": jnp.zeros((n_views, cfg.gen_res, cfg.gen_res, 3)),
            "pano": -img_coord_to_pano_direction(img_coord_from_hw(h, w)),
        }
        adam = optax.scale_by_adam(eps=1e-8)
        opt_state = adam.init(params)
        init_lr, lr_alpha = 2e-1, 5e-3
        sample_view = jax.vmap(lambda im, c: bilinear_sample(im, c, "border"))

        def step(all_phase: bool, carry, i):
            params, opt_state = carry
            # per-phase restart of the cosine schedule (reference :139-148)
            progress = i
            lr = init_lr * ((jnp.cos(progress * jnp.pi) + 1.0)
                            * (1.0 - lr_alpha) + lr_alpha)

            def loss_fn(p):
                pano_n = p["pano"] * mask + ref_normal * (1.0 - mask)
                pano_norm = jnp.linalg.norm(pano_n, axis=-1, keepdims=True)
                pano_n = pano_n / pano_norm
                bias = p["bias"] if all_phase else jnp.zeros_like(p["bias"])
                pn = pred + bias
                pn_norm = jnp.linalg.norm(pn, axis=-1, keepdims=True)
                pn = pn / pn_norm
                proj = sample_view(pn, proj_coords)                  # [V,H,W,3]
                err = (proj - pano_n[None]) * proj_masks
                d = jnp.abs(err)
                beta = 0.5
                sl1 = jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)
                align = jnp.sum(sl1 * weights) / jnp.sum(weights)
                tv = (smooth_l1(p["bias"][:, 1:], p["bias"][:, :-1], beta=0.5)
                      + smooth_l1(p["bias"][:, :, 1:], p["bias"][:, :, :-1],
                                  beta=0.5))
                reg = (jnp.mean((pano_norm - 1.0) ** 2)
                       + jnp.mean((pn_norm - 1.0) ** 2))
                return align + tv * 1.0 + reg * 1e-2

            grads = jax.grad(loss_fn)(params)
            if not all_phase:
                grads = {**grads, "bias": jnp.zeros_like(grads["bias"])}
            updates, new_opt = adam.update(grads, opt_state)
            new_params = jax.tree_util.tree_map(lambda a, u: a - lr * u,
                                                params, updates)
            params, opt_state, _ = guarded_step(
                grads, new_params, new_opt, params, opt_state)
            return (params, opt_state), None

        @partial(jax.jit, static_argnames=("all_phase",))
        def run_chunk(params, opt_state, p0, all_phase):
            def body(carry, j):
                return step(all_phase, carry,
                            p0 + j * (2.0 / cfg.iters))
            (params, opt_state), _ = jax.lax.scan(
                body, (params, opt_state),
                jnp.arange(cfg.scan_chunk, dtype=jnp.float32))
            return params, opt_state

        half = cfg.iters // 2
        assert half % cfg.scan_chunk == 0
        for all_phase in (False, True):
            for c in range(half // cfg.scan_chunk):
                p0 = jnp.asarray(c * cfg.scan_chunk * 2.0 / cfg.iters,
                                 jnp.float32)
                params, opt_state = run_chunk(params, opt_state, p0,
                                              all_phase=all_phase)

        pano_n = params["pano"] * mask + ref_normal * (1.0 - mask)
        return pano_n
