"""Sphere distance field: distance-to-surface as a function of view direction.

Counterpart of the two near-identical ``SphereDistanceField`` classes in the
reference (``pano_joint_predictor.py:22-71`` fine_res 2048, softplus(out+1);
``pano_geo_refiner.py:11-59`` fine_res 4096, weight-normed, raw output).
A Smoothstep-interpolated hash grid over direction*0.49+0.49 feeds a
sphere-initialized VanillaMLP; analytic surface normals come from the
gradient of distance w.r.t. direction (autodiff — ``jax.grad`` instead of
``torch.autograd.grad``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..kernels.hashgrid import HashGridConfig, hash_encode, init_hash_table
from ..kernels.brickgrid import (BrickGridConfig, brick_encode_stacked,
                                 brick_encode_stacked_grad, init_brick_table)
from .mlp import vanilla_mlp_init, vanilla_mlp_apply


@dataclasses.dataclass(frozen=True)
class SphereFieldConfig:
    n_levels: int = 16
    log2_table_size: int = 19
    base_res: int = 16
    fine_res: int = 2048
    n_neurons: int = 64
    n_hidden_layers: int = 2
    weight_norm: bool = False
    # 'joint' -> softplus(out + 1) (pano_joint_predictor variant);
    # 'raw'   -> plain output (pano_geo_refiner variant)
    output: str = "joint"
    # TPU-perf variant: 'brick' swaps the reference-parity hash encode for
    # the brick-packed layout (kernels/brickgrid.py — one row-tile gather
    # per sample/level; measured 10x the refiner step). The brick custom
    # vjp is FIRST-order only, so 'brick' requires grad_mode='fd'
    # (central differences at half the finest cell — on a grid-interp
    # field this is the in-cell slope the AD path computes anyway,
    # smoothed across cell boundaries).
    encoding: str = "hash"      # 'hash' | 'brick'
    # 'ad': jax.vjp (reference-parity; second-order under training losses,
    #       hash only). 'fd': central differences (first-order, any
    #       encoding). 'analytic': closed-form interp derivatives from ONE
    #       gather + tiny MLP jvps (first-order, brick only — the fast
    #       path for the distillation loops).
    grad_mode: str = "ad"       # 'ad' | 'fd' | 'analytic'

    @property
    def grid(self):
        if self.encoding == "brick":
            return BrickGridConfig.sphere_field(
                fine_res=self.fine_res, n_levels=self.n_levels,
                log2_bricks=self.log2_table_size - 6,
                base_res=self.base_res)
        return HashGridConfig.sphere_field(
            fine_res=self.fine_res, n_levels=self.n_levels,
            log2_table_size=self.log2_table_size, base_res=self.base_res)


def init_sphere_field(key: jax.Array, cfg: SphereFieldConfig) -> dict:
    k1, k2 = jax.random.split(key)
    init_table = (init_brick_table if cfg.encoding == "brick"
                  else init_hash_table)
    return {
        "table": init_table(k1, cfg.grid),
        "mlp": vanilla_mlp_init(
            k2, dim_in=cfg.n_levels * 2 + 3, dim_out=1,
            n_neurons=cfg.n_neurons, n_hidden_layers=cfg.n_hidden_layers,
            sphere_init=True, weight_norm=cfg.weight_norm),
    }


def sphere_field_distance(params: dict, dirs: jnp.ndarray,
                          cfg: SphereFieldConfig) -> jnp.ndarray:
    """Distance for unit directions [..., 3] -> [...]."""
    shape = dirs.shape[:-1]
    d = dirs.reshape(-1, 3)
    scaled = d * 0.49 + 0.49
    if cfg.encoding == "brick":
        feats = brick_encode_stacked(params["table"], scaled, cfg.grid)
    else:
        feats = hash_encode(params["table"], scaled, cfg.grid)
    out = vanilla_mlp_apply(params["mlp"], jnp.concatenate([d, feats], -1),
                            sphere_init=True)[..., 0]
    if cfg.output == "joint":
        out = jax.nn.softplus(out + 1.0)
    return out.reshape(shape)


def sphere_field_distance_and_grad(params: dict, dirs: jnp.ndarray,
                                   cfg: SphereFieldConfig):
    """(distance [...], d distance / d direction [..., 3]).

    Each output depends only on its own direction, so the per-sample gradient
    is the gradient of the summed output — one backward pass for the batch.

    grad_mode 'fd': central differences with eps = half the finest grid
    cell. Unlike the vjp, the FD path stays FIRST-order under an outer
    ``jax.grad`` (7 plain forwards), which is what allows the brick
    encoding's first-order-only custom vjp inside training loops that
    supervise normals.
    """
    if cfg.grad_mode == "analytic":
        assert cfg.encoding == "brick", "analytic grads need the brick encode"
        shape = dirs.shape[:-1]
        d = dirs.reshape(-1, 3)
        scaled = d * 0.49 + 0.49
        feats, dfeats = brick_encode_stacked_grad(params["table"], scaled,
                                                  cfg.grid)

        def head(i):
            out = vanilla_mlp_apply(params["mlp"], i,
                                    sphere_init=True)[..., 0]
            if cfg.output == "joint":
                out = jax.nn.softplus(out + 1.0)
            return out

        inp = jnp.concatenate([d, feats], -1)
        dist = head(inp)
        eye = jnp.eye(3, dtype=d.dtype)
        gs = []
        for a in range(3):
            # chain: scaled = d * 0.49 + 0.49 -> dfeats/dd = 0.49 * dfeats/dscaled
            tan = jnp.concatenate(
                [jnp.broadcast_to(eye[a], d.shape), dfeats[:, a] * 0.49], -1)
            _, ga = jax.jvp(head, (inp,), (tan,))
            gs.append(ga)
        return dist.reshape(shape), jnp.stack(gs, -1).reshape(*shape, 3)
    if cfg.grad_mode == "fd":
        eps = 1.0 / cfg.fine_res
        dist = sphere_field_distance(params, dirs, cfg)
        gs = []
        for a in range(3):
            e = jnp.zeros((3,)).at[a].set(eps)
            gs.append((sphere_field_distance(params, dirs + e, cfg)
                       - sphere_field_distance(params, dirs - e, cfg))
                      / (2.0 * eps))
        return dist, jnp.stack(gs, axis=-1)
    dist, vjp_fn = jax.vjp(
        lambda d: sphere_field_distance(params, d, cfg), dirs)
    (grad,) = vjp_fn(jnp.ones_like(dist))
    return dist, grad


def grads_to_normal(dirs: jnp.ndarray, grads: jnp.ndarray,
                    key: jax.Array) -> jnp.ndarray:
    """Surface normals from distance-field direction-gradients.

    Counterpart of ``pano_joint_predictor.py:81-99``: build a random tangent
    basis (ortho_a, ortho_b) around each direction, tilt each tangent vector
    by the directional derivative of distance, and take their cross product;
    flip so normals face the camera (inward).
    """
    ortho_a = jax.random.normal(key, dirs.shape, dirs.dtype)
    ortho_b = jnp.cross(dirs, ortho_a)
    ortho_b = ortho_b / jnp.linalg.norm(ortho_b, axis=-1, keepdims=True)
    ortho_a = jnp.cross(ortho_b, dirs)
    ortho_a = ortho_a / jnp.linalg.norm(ortho_a, axis=-1, keepdims=True)

    val_a = jnp.sum(grads * ortho_a, -1, keepdims=True) * dirs + ortho_a
    val_a = val_a / jnp.linalg.norm(val_a, axis=-1, keepdims=True)
    val_b = jnp.sum(grads * ortho_b, -1, keepdims=True) * dirs + ortho_b
    val_b = val_b / jnp.linalg.norm(val_b, axis=-1, keepdims=True)

    normals = jnp.cross(val_a, val_b)
    normals = normals / jnp.linalg.norm(normals, axis=-1, keepdims=True)
    inside = (jnp.sum(normals * dirs, -1, keepdims=True) < 0.0)
    return jnp.where(inside, normals, -normals)
