"""Dense binary occupancy grid over the [-1, 1]^3 AABB.

Replaces nerfacc's ``OccGridEstimator`` (reference ``nerf.py:68,143-168``,
``sup_info.py:304-330``) with plain dense arrays:

- ``occ_grid_from_points``: scatter back-projected supervision points (plus
  the 27 one-voxel-neighborhood shifts) into a flat [res^3] grid — the
  ``SupInfoPool.gen_occ_grid`` counterpart. On TPU this is one scatter-max.
- ``occ_lookup``: world position -> binary occupancy, the hot probe inside
  ray marching.
- ``ema_update_from_density``: the density-driven EMA refresh path of
  nerfacc's ``update_every_n_steps`` (only exercised by the reference when no
  point cloud is available; kept for parity).

The reference "warms up" a fresh estimator with 256 EMA steps whose eval fn
just reads the pool grid (``nerf.py:147-168``); with binary evals and decay
0.1 that fixpoint IS the pool grid thresholded, so we use the pool grid
directly and skip the 256-step charade.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def world_to_voxel(x: jnp.ndarray, res: int) -> jnp.ndarray:
    """[-1,1] world coords -> integer voxel coords, clipped like the
    reference (``nerf.py:152``: clip to +-0.999 then scale)."""
    return ((jnp.clip(x, -0.999, 0.999) * 0.5 + 0.5) * res).astype(jnp.int32)


def voxel_to_flat(v: jnp.ndarray, res: int) -> jnp.ndarray:
    return v[..., 0] * (res * res) + v[..., 1] * res + v[..., 2]


def occ_grid_from_points(pts: jnp.ndarray, res: int = 256,
                         dilation: int = 1) -> jnp.ndarray:
    """Binary occupancy [res^3] (uint8) from surface points [N, 3].

    ``dilation=1`` (default) marks each point's voxel and its 26
    one-voxel-shifted neighbors (reference shifts by +-1/res in world space
    before quantizing, ``sup_info.py:309-321`` — reproduced exactly so
    boundary voxels match). ``dilation=0`` marks only the containing voxel:
    a thinner shell shrinks the adaptive sample budgets (~1.2x fewer rows)
    at the cost of coverage for noisy supervision — a perf knob, off the
    reference-parity default.
    """
    shift = dilation / res
    n_off = 2 * dilation + 1
    offsets = jnp.asarray(
        np.stack(np.meshgrid(*([np.linspace(-shift, shift, n_off)] * 3),
                             indexing="ij"), -1).reshape(-1, 3).astype(np.float32))
    grid = jnp.zeros((res * res * res,), jnp.uint8)
    for k in range(offsets.shape[0]):
        v = world_to_voxel(pts + offsets[k], res)
        grid = grid.at[voxel_to_flat(v, res)].max(jnp.uint8(1))
    return grid


def occ_grid_points(grid: jnp.ndarray, res: int) -> jnp.ndarray:
    """Centers (world coords) of ALL voxels, with grid value as mask — for
    visualization / debugging (reference returns only valid points;
    static shapes here)."""
    idx = jnp.arange(res ** 3)
    v = jnp.stack([idx // (res * res), (idx // res) % res, idx % res], -1)
    pts = (v.astype(jnp.float32) / res - 0.5) * 2.0
    return pts, grid > 0


def occ_lookup(grid: jnp.ndarray, x: jnp.ndarray, res: int) -> jnp.ndarray:
    """Binary occupancy at world positions x [..., 3] -> [...] (uint8)."""
    return grid[voxel_to_flat(world_to_voxel(x, res), res)]


def ema_update_from_density(occ_values: jnp.ndarray, density_fn, res: int,
                            key: jax.Array, step_scale: float = 5e-3,
                            ema_decay: float = 0.1,
                            jitter: bool = True) -> jnp.ndarray:
    """One EMA update of float occupancy values from the field's density.

    occs <- max(occs * decay, density(cell_sample) * step_scale), evaluated at
    (optionally jittered) cell centers — nerfacc ``_update`` semantics with
    the reference's eval fn (``nerf_renderer.py:22-26`` uses density * step;
    ``nerf.py:150`` uses density * 5e-3). Binarize with
    ``occ_values > occ_thre`` (reference occ_thre = 1e-2, ``nerf.py:164``).
    """
    pts, _ = occ_grid_points(jnp.zeros(res ** 3, jnp.uint8), res)
    if jitter:
        pts = pts + (jax.random.uniform(key, pts.shape) - 0.5) * (2.0 / res)
    dens = density_fn(pts)[..., 0]
    return jnp.maximum(occ_values * ema_decay, dens * step_scale)
