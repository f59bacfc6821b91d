"""PanoGeoRefiner: distill an existing distance+normal map into a smooth
sphere distance field and re-extract the maps.

Counterpart of the reference's ``pano_geo_refiner.py:60-153`` (5000 iters of
32768 random directions, smooth-L1 distance beta 1e-2 + tangent-projection
normal loss beta 0.5 x 5e-2, Adam 1e-2 with half-cosine decay; field variant:
fine_res 4096, weight-normed MLP, raw output).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core import (
    direction_to_img_coord, bilinear_sample, img_coord_from_hw,
    img_coord_to_pano_direction,
)
from ..fields.sphere_field import (
    SphereFieldConfig, init_sphere_field, sphere_field_distance_and_grad,
    grads_to_normal,
)
from ..train.schedule import smooth_l1
from ..core.optim import guarded_step
from ..utils.metrics import phase_timer
from .pano_joint import normal_projection_errors


@dataclasses.dataclass(frozen=True)
class RefinerConfig:
    n_iters: int = 5000
    batch_size: int = 32768
    init_lr: float = 1e-2
    lr_alpha: float = 1e-2
    normal_loss_weight: float = 5e-2
    # 1 = per-step dispatch (TPU production — see BASELINE.md scan verdict);
    # >1 = lax.scan chunks (CPU tests)
    scan_chunk: int = 1
    # TPU flagship: brick + analytic first-order grads (one gather/step);
    # reference-parity variant: hash + 'ad'
    field: SphereFieldConfig = SphereFieldConfig(
        fine_res=4096, weight_norm=True, output="raw",
        encoding="brick", grad_mode="analytic")


class PanoGeoRefiner:
    def __init__(self, cfg: RefinerConfig = RefinerConfig(), seed: int = 0,
                 writer=None):
        self.cfg = cfg
        self.writer = writer
        self.key = jax.random.PRNGKey(seed)
        # jitted programs cached across refine() calls (shape-keyed): the
        # target maps flow as arguments, so repeated refines share compiles
        self._jit_cache: dict = {}

    def _next_key(self):
        self.key, k = jax.random.split(self.key)
        return k

    def _get_step_fn(self, hw_key):
        cache_key = ("distill", hw_key)
        if cache_key in self._jit_cache:
            return self._jit_cache[cache_key]
        cfg = self.cfg
        adam = optax.scale_by_adam(eps=1e-8)

        def step(distances, normals, carry, i):
            params, opt_state, key = carry
            key, k_dir, k_ortho = jax.random.split(key, 3)
            dirs = jax.random.normal(k_dir, (cfg.batch_size, 3))
            dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
            coords = direction_to_img_coord(dirs)
            ref_d = bilinear_sample(distances, coords)[..., 0]
            ref_n = bilinear_sample(normals, coords)

            def loss_fn(p):
                pd, pg = sphere_field_distance_and_grad(p, dirs, cfg.field)
                d_loss = smooth_l1(ref_d, pd, beta=1e-2)
                errors = normal_projection_errors(dirs, pg, ref_n, k_ortho)
                n_loss = smooth_l1(errors, jnp.zeros_like(errors), beta=0.5)
                return d_loss + n_loss * cfg.normal_loss_weight

            grads = jax.grad(loss_fn)(params)
            updates, new_opt = adam.update(grads, opt_state)
            progress = i / cfg.n_iters
            lr = cfg.init_lr * ((jnp.cos(progress * jnp.pi) * 0.5 + 0.5)
                                * (1.0 - cfg.lr_alpha) + cfg.lr_alpha)
            new_params = jax.tree_util.tree_map(lambda a, u: a - lr * u,
                                                params, updates)
            params, opt_state, _ = guarded_step(
                grads, new_params, new_opt, params, opt_state)
            return (params, opt_state, key), None

        if cfg.scan_chunk == 1:
            @jax.jit
            def run_chunk(distances, normals, params, opt_state, key, i0):
                (params, opt_state, key), _ = step(
                    distances, normals, (params, opt_state, key), i0)
                return params, opt_state, key
        else:
            @jax.jit
            def run_chunk(distances, normals, params, opt_state, key, i0):
                (params, opt_state, key), _ = jax.lax.scan(
                    partial(step, distances, normals),
                    (params, opt_state, key),
                    i0 + jnp.arange(cfg.scan_chunk, dtype=jnp.float32))
                return params, opt_state, key

        self._jit_cache[cache_key] = run_chunk
        return run_chunk

    def refine(self, distances, normals):
        """distances [H, W(, 1)], normals [H, W, 3] ->
        (distance [H, W, 1], normal [H, W, 3])."""
        cfg = self.cfg
        distances = jnp.asarray(distances)
        h, w = distances.shape[0], distances.shape[1]
        distances = distances.reshape(h, w, -1)[..., :1]
        normals = jnp.asarray(normals).reshape(h, w, 3)

        params = init_sphere_field(self._next_key(), cfg.field)
        adam = optax.scale_by_adam(eps=1e-8)
        opt_state = adam.init(params)
        run_chunk = self._get_step_fn((h, w))

        key = self._next_key()
        assert cfg.n_iters % cfg.scan_chunk == 0
        with phase_timer(self.writer, "refiner_distill",
                         n_items=cfg.n_iters, item_name="iters"):
            for c in range(cfg.n_iters // cfg.scan_chunk):
                params, opt_state, key = run_chunk(
                    distances, normals, params, opt_state, key,
                    jnp.asarray(c * cfg.scan_chunk, jnp.float32))
            # scalar D2H readback: block_until_ready alone can return early
            # on the tunneled axon backend
            float(jax.tree_util.tree_leaves(params)[0].ravel()[0])

        with phase_timer(self.writer, "refiner_readback", n_items=h * w,
                         item_name="px"):
            pano_dirs = img_coord_to_pano_direction(img_coord_from_hw(h, w))
            flat = pano_dirs.reshape(-1, 3)
            chunk = 1 << 16
            n_pad = (-flat.shape[0]) % chunk
            flat_p = jnp.concatenate([flat,
                                      jnp.ones((n_pad, 3)) / np.sqrt(3.0)], 0)
            qfn = self._jit_cache.get("qfn")
            if qfn is None:
                qfn = jax.jit(partial(sphere_field_distance_and_grad,
                                      cfg=cfg.field))
                self._jit_cache["qfn"] = qfn
            ds, gs = [], []
            for s in range(0, flat_p.shape[0], chunk):
                dd, gg = qfn(params, flat_p[s:s + chunk])
                ds.append(dd)
                gs.append(gg)
            dist = jnp.concatenate(ds)[: h * w].reshape(h, w, 1)
            grad = jnp.concatenate(gs)[: h * w].reshape(h, w, 3)
            normal = grads_to_normal(pano_dirs, grad, self._next_key())
            float(dist[0, 0, 0])                                    # D2H sync
        return dist, normal
