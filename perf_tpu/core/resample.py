"""Bilinear image resampling — the TPU-native `F.grid_sample` replacement.

The reference leans on cuDNN ``F.grid_sample`` for every pano<->perspective
reprojection (e.g. ``sup_info.py:280``, ``nerf.py:336``,
``pano_pers_fusion_inpainter.py:52``). Here it is a first-class jitted
gather+lerp, consuming image coords (row_frac, col_frac) in [0, 1] directly
(pixel centers at (i + 0.5)/H, matching ``align_corners=False``).

Padding modes:
- ``border``: clamp to the edge pixel (parity with the reference's default).
- ``wrap_x``: wrap in longitude, clamp in latitude — the natural mode for
  equirectangular panoramas (the reference cannot express this; we add it).
- ``zeros``: zero outside.
"""

from __future__ import annotations

import jax.numpy as jnp


def _gather_2d(img: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray) -> jnp.ndarray:
    """img [H, W, C]; iy/ix integer arrays [...]; returns [..., C]."""
    h, w = img.shape[0], img.shape[1]
    flat = img.reshape(h * w, -1)
    return flat[iy * w + ix]


def bilinear_sample(img: jnp.ndarray, coords: jnp.ndarray,
                    padding: str = "border") -> jnp.ndarray:
    """Bilinearly sample ``img`` [H, W, C] at image coords ``coords`` [..., 2].

    coords[..., 0] is the row fraction, coords[..., 1] the column fraction.
    Returns [..., C].
    """
    assert img.ndim == 3, "img must be [H, W, C]"
    h, w = img.shape[0], img.shape[1]

    py = coords[..., 0] * h - 0.5
    px = coords[..., 1] * w - 0.5

    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    wy = py - y0
    wx = px - x0
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)
    y1 = y0 + 1
    x1 = x0 + 1

    if padding == "border":
        y0c, y1c = jnp.clip(y0, 0, h - 1), jnp.clip(y1, 0, h - 1)
        x0c, x1c = jnp.clip(x0, 0, w - 1), jnp.clip(x1, 0, w - 1)
    elif padding == "wrap_x":
        y0c, y1c = jnp.clip(y0, 0, h - 1), jnp.clip(y1, 0, h - 1)
        x0c, x1c = jnp.mod(x0, w), jnp.mod(x1, w)
    elif padding == "zeros":
        y0c, y1c = jnp.clip(y0, 0, h - 1), jnp.clip(y1, 0, h - 1)
        x0c, x1c = jnp.clip(x0, 0, w - 1), jnp.clip(x1, 0, w - 1)
    else:
        raise ValueError(f"unknown padding mode {padding!r}")

    v00 = _gather_2d(img, y0c, x0c)
    v01 = _gather_2d(img, y0c, x1c)
    v10 = _gather_2d(img, y1c, x0c)
    v11 = _gather_2d(img, y1c, x1c)

    wy = wy[..., None]
    wx = wx[..., None]
    out = (v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx
           + v10 * wy * (1 - wx) + v11 * wy * wx)

    if padding == "zeros":
        inside = ((py >= 0) & (py <= h - 1) & (px >= 0) & (px <= w - 1))
        out = out * inside[..., None]
    return out


def pano_sample(pano: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Sample an equirectangular pano [H, W, C] with longitude wrapping."""
    return bilinear_sample(pano, coords, padding="wrap_x")


def sample_views(img: jnp.ndarray, coords: jnp.ndarray,
                 padding: str = "border") -> jnp.ndarray:
    """Batched resample: one source image, a stack of coordinate grids.

    img [H, W, C], coords [N, h, w, 2] -> [N, h, w, C]. Used to cut all
    tangent views out of a pano in ONE call (the reference loops 20-60
    sequential ``grid_sample`` calls — ``pano_joint_predictor.py:154``).
    """
    return bilinear_sample(img, coords, padding=padding)


def scatter_accum(canvas_hw: tuple, coords: jnp.ndarray, values: jnp.ndarray,
                  weights: jnp.ndarray | None = None):
    """Splat ``values`` [..., C] bilinearly onto a canvas [H, W, C].

    The adjoint of ``bilinear_sample`` — used to push inpainted tangent views
    back into the panorama. Returns (accumulated [H, W, C], weight [H, W, 1]).
    """
    h, w = canvas_hw
    c = values.shape[-1]
    py = coords[..., 0] * h - 0.5
    px = coords[..., 1] * w - 0.5
    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    wy = py - y0
    wx = px - x0
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)

    if weights is None:
        weights = jnp.ones(values.shape[:-1], values.dtype)

    accum = jnp.zeros((h * w, c), values.dtype)
    wsum = jnp.zeros((h * w, 1), values.dtype)
    vals_flat = values.reshape(-1, c)
    wts_flat = weights.reshape(-1)
    py_f = y0.reshape(-1)
    px_f = x0.reshape(-1)
    wy_f = wy.reshape(-1)
    wx_f = wx.reshape(-1)

    for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1)):
        iy = jnp.clip(py_f + dy, 0, h - 1)
        ix = jnp.mod(px_f + dx, w)
        ww = (wy_f if dy else (1 - wy_f)) * (wx_f if dx else (1 - wx_f)) * wts_flat
        idx = iy * w + ix
        accum = accum.at[idx].add(vals_flat * ww[:, None])
        wsum = wsum.at[idx].add(ww[:, None])

    return accum.reshape(h, w, c), wsum.reshape(h, w, 1)
