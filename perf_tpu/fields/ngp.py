"""The NGP radiance field: two independent hash-grid + MLP networks.

Behavioral counterpart of the reference's ``modules/fields/ngp_nerf.py``:

- ``geo`` head: 16-level hash grid (2^18 table, base 16, growth 1.44727) into
  a 64-wide 1-hidden-layer MLP -> 1 channel; density activation is a
  truncated exp whose backward clamps the pre-activation at 15
  (``ngp_nerf.py:24-40``).
- ``app`` head: same grid config into a 64-wide 2-hidden-layer MLP -> 3
  channels with sigmoid. No view dependence (``use_viewdirs=False``).
- AABB [-1,1]^3: positions are normalized to [0,1]; a selector zeroes
  density/rgb outside (``ngp_nerf.py:136-162``).
- ``reset_geo``: re-initializes ONLY the geo subtree (``ngp_nerf.py:178-197``)
  — with param pytrees this is just re-sampling one leaf set.

Also provides ``NGPDensityFieldConfig`` (the 5-level proposal field,
``ngp_nerf.py:200-266``) for the prop-renderer path.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name

from ..kernels.hashgrid import (
    HashGridConfig, hash_encode, hash_encode_coords, hash_encode_ray,
    init_hash_table, level_strides,
)
from ..kernels.brickgrid import (
    BrickGridConfig, brick_encode, brick_encode_ray, init_brick_table,
)


def _is_brick(grid) -> bool:
    return isinstance(grid, BrickGridConfig)


def init_grid_table(key, grid):
    return init_brick_table(key, grid) if _is_brick(grid) else init_hash_table(key, grid)


def encode_coords(table, x, y, z, grid):
    if _is_brick(grid):
        return brick_encode(table, jnp.stack([x, y, z], axis=-1), grid)
    return hash_encode_coords(table, x, y, z, grid)


def encode_ray(table, x, y, z, grid, strides, run_caps=None):
    if _is_brick(grid):
        if run_caps:
            from ..kernels.brickgrid import brick_encode_ray_dedup
            return brick_encode_ray_dedup(table, x, y, z, grid, strides,
                                          run_caps)
        return brick_encode_ray(table, x, y, z, grid, strides)
    return hash_encode_ray(table, x, y, z, grid, strides)
from .mlp import ngp_mlp_init, ngp_mlp_apply, ngp_mlp_apply_channels


@jax.custom_vjp
def trunc_exp(x):
    """exp with forward input clamped to <= 80 and gradient computed at
    x clamped to <= 15 (torch-ngp trick, ``activation.py``).

    The forward clamp is numerically free — compositing saturates
    (alpha == 1.0 in f32) once the pre-activation passes ~11 at flagship
    step sizes — but it guarantees a finite density for finite params.
    Unclamped, a trained-in hotspot can push raw past 88.7 where f32
    ``exp`` overflows to inf, and the renderer's 0/1 masks then produce
    ``inf * 0 = NaN`` for every batch that touches the region: measured
    in the round-5 flagship record (episode 20: loss NaN from geo iter
    ~1600 on, 1398/3000 geo + 1447/1500 app steps guard-skipped, params
    frozen mid-episode because the non-finite-grad skip can never fix
    the hotspot it keeps re-hitting).
    """
    return jnp.exp(jnp.minimum(x, 80.0))


def _trunc_exp_fwd(x):
    return jnp.exp(jnp.minimum(x, 80.0)), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.minimum(x, 15.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)


@dataclasses.dataclass(frozen=True)
class NGPFieldConfig:
    aabb_min: float = -1.0
    aabb_max: float = 1.0
    grid: HashGridConfig = HashGridConfig(
        n_levels=16, n_features=2, log2_table_size=18,
        base_res=16, per_level_scale=1.4472692012786865)
    n_neurons: int = 64
    geo_hidden: int = 1
    app_hidden: int = 2

    def normalize(self, x: jnp.ndarray) -> jnp.ndarray:
        return (x - self.aabb_min) / (self.aabb_max - self.aabb_min)

    def selector(self, x01: jnp.ndarray) -> jnp.ndarray:
        return ((x01 > 0.0) & (x01 < 1.0)).all(axis=-1)


def init_geo_params(key: jax.Array, cfg: NGPFieldConfig) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "table": init_grid_table(k1, cfg.grid),
        "mlp": ngp_mlp_init(k2, cfg.grid.out_dim, 1, cfg.n_neurons, cfg.geo_hidden),
    }


def init_app_params(key: jax.Array, cfg: NGPFieldConfig) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "table": init_grid_table(k1, cfg.grid),
        "mlp": ngp_mlp_init(k2, cfg.grid.out_dim, 3, cfg.n_neurons, cfg.app_hidden),
    }


def init_ngp_params(key: jax.Array, cfg: NGPFieldConfig) -> dict:
    kg, ka = jax.random.split(key)
    return {"geo": init_geo_params(kg, cfg), "app": init_app_params(ka, cfg)}


def reset_geo(params: dict, key: jax.Array, cfg: NGPFieldConfig) -> dict:
    """Fresh geometry network, appearance untouched (``ngp_nerf.py:178``)."""
    return {**params, "geo": init_geo_params(key, cfg)}


def _normalize_coords(cfg: NGPFieldConfig, x, y, z):
    span = cfg.aabb_max - cfg.aabb_min
    nx = (x - cfg.aabb_min) / span
    ny = (y - cfg.aabb_min) / span
    nz = (z - cfg.aabb_min) / span
    sel = ((nx > 0.0) & (nx < 1.0) & (ny > 0.0) & (ny < 1.0)
           & (nz > 0.0) & (nz < 1.0))
    return nx, ny, nz, sel


def query_density_coords(geo_params: dict, x, y, z,
                         cfg: NGPFieldConfig) -> jnp.ndarray:
    """Density at world coords given as three same-shape arrays -> [...].

    The coords-based API is the hot path: no [..., 3] tensors, which the TPU
    (8, 128) tiling would pad 42x (see kernels/hashgrid.py).
    """
    nx, ny, nz, sel = _normalize_coords(cfg, x, y, z)
    feats = encode_coords(geo_params["table"], nx, ny, nz, cfg.grid)
    (raw,) = ngp_mlp_apply_channels(geo_params["mlp"], feats)
    # where-select, not multiply: a saturated density at a masked sample
    # must yield 0, never inf * 0 = NaN
    return jnp.where(sel, trunc_exp(raw), 0.0)


def query_rgb_coords(app_params: dict, x, y, z, cfg: NGPFieldConfig):
    """RGB at world coords -> tuple (r, g, b) of [...] arrays."""
    nx, ny, nz, sel = _normalize_coords(cfg, x, y, z)
    feats = encode_coords(app_params["table"], nx, ny, nz, cfg.grid)
    r, g, b = ngp_mlp_apply_channels(app_params["mlp"], feats,
                                     out_activation=jax.nn.sigmoid)
    return (r * sel, g * sel, b * sel)


def query_density_ray(geo_params: dict, x, y, z, cfg: NGPFieldConfig,
                      strides: tuple, run_caps: tuple | None = None
                      ) -> jnp.ndarray:
    """Density at ray-structured coords [N, S] with per-level subsampling.

    ``run_caps`` (brick grids only) switches the encode to the run-dedup
    gather (``kernels/brickgrid.brick_encode_ray_dedup``); samples must be
    t-ordered along S, which the march guarantees."""
    nx, ny, nz, sel = _normalize_coords(cfg, x, y, z)
    feats = encode_ray(geo_params["table"], nx, ny, nz, cfg.grid, strides,
                       run_caps)
    # named so a remat policy can SAVE the (bf16) encodings: the backward
    # then never re-runs the gathers (it only needs the interp weights,
    # recomputable from coords, plus the saved features for the MLP grads)
    feats = checkpoint_name(feats.astype(jnp.bfloat16), "enc_feats")
    (raw,) = ngp_mlp_apply_channels(geo_params["mlp"], feats)
    return jnp.where(sel, trunc_exp(raw), 0.0)


def query_rgb_ray(app_params: dict, x, y, z, cfg: NGPFieldConfig,
                  strides: tuple, run_caps: tuple | None = None):
    """RGB at ray-structured coords [N, S] -> (r, g, b) arrays."""
    nx, ny, nz, sel = _normalize_coords(cfg, x, y, z)
    feats = encode_ray(app_params["table"], nx, ny, nz, cfg.grid, strides,
                       run_caps)
    feats = checkpoint_name(feats.astype(jnp.bfloat16), "enc_feats")
    r, g, b = ngp_mlp_apply_channels(app_params["mlp"], feats,
                                     out_activation=jax.nn.sigmoid)
    return (r * sel, g * sel, b * sel)


def query_density(geo_params: dict, x: jnp.ndarray,
                  cfg: NGPFieldConfig) -> jnp.ndarray:
    """Density at world positions x [..., 3] -> [..., 1] (convenience API)."""
    d = query_density_coords(geo_params, x[..., 0], x[..., 1], x[..., 2], cfg)
    return d[..., None]


def query_rgb(app_params: dict, x: jnp.ndarray,
              cfg: NGPFieldConfig) -> jnp.ndarray:
    """RGB at world positions x [..., 3] -> [..., 3] (position-only)."""
    r, g, b = query_rgb_coords(app_params, x[..., 0], x[..., 1], x[..., 2], cfg)
    return jnp.stack([r, g, b], axis=-1)


def query_rgb_density(params: dict, x: jnp.ndarray, cfg: NGPFieldConfig):
    return query_rgb(params["app"], x, cfg), query_density(params["geo"], x, cfg)


# ---------------------------------------------------------------------------
# proposal density field (reference NGPDensityField, prop path)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class NGPDensityFieldConfig:
    aabb_min: float = -1.0
    aabb_max: float = 1.0
    base_res: int = 16
    max_res: int = 128
    n_levels: int = 5
    log2_table_size: int = 17
    n_neurons: int = 64

    @property
    def grid(self) -> HashGridConfig:
        scale = float(np.exp((np.log(self.max_res) - np.log(self.base_res))
                             / (self.n_levels - 1)))
        return HashGridConfig(n_levels=self.n_levels, n_features=2,
                              log2_table_size=self.log2_table_size,
                              base_res=self.base_res, per_level_scale=scale)


def init_density_field(key: jax.Array, cfg: NGPDensityFieldConfig) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "table": init_hash_table(k1, cfg.grid),
        "mlp": ngp_mlp_init(k2, cfg.grid.out_dim, 1, cfg.n_neurons, 1),
    }


def query_density_field(params: dict, x: jnp.ndarray,
                        cfg: NGPDensityFieldConfig) -> jnp.ndarray:
    """Proposal density; activation trunc_exp(x - 1) (``ngp_nerf.py:206``)."""
    shape = x.shape[:-1]
    x01 = (x.reshape(-1, 3) - cfg.aabb_min) / (cfg.aabb_max - cfg.aabb_min)
    sel = ((x01 > 0.0) & (x01 < 1.0)).all(axis=-1)
    feats = hash_encode(params["table"], x01, cfg.grid)
    raw = ngp_mlp_apply(params["mlp"], feats)
    density = jnp.where(sel[..., None], trunc_exp(raw - 1.0), 0.0)
    return density.reshape(*shape, 1)
