"""Mip-NeRF 360 distortion loss on dense masked samples.

Replaces ``torch_efficient_distloss.flatten_eff_distloss`` (reference
``nerf.py:23,222-236``) with the O(n) prefix-sum formulation on a dense
[rays, samples] layout. Samples are sorted along the ray by construction, so

    L = mean_rays [ 2 * sum_i w_i (m_i * cumsum_<i(w) - cumsum_<i(w m))
                    + 1/3 * sum_i w_i^2 * delta_i ]

matches the reference library's semantics (per-ray pair sum, mean over rays).
"""

from __future__ import annotations

import jax.numpy as jnp


def _exclusive_cumsum(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    c = jnp.cumsum(x, axis=axis)
    return c - x


def distortion_per_ray(weights: jnp.ndarray, mids: jnp.ndarray,
                       intervals: jnp.ndarray, valid: jnp.ndarray
                       ) -> jnp.ndarray:
    """weights/mids/valid [N, S]; intervals [N, S] or scalar. Returns [N].

    Invalid samples are zero-weighted, so they contribute nothing to either
    term — equivalent to the packed/CSR formulation. Per-ray so callers
    with heterogeneous sample counts (the bucketed train path) can
    concatenate before reducing.
    """
    w = weights * valid
    wm = w * mids
    w_cum = _exclusive_cumsum(w)
    wm_cum = _exclusive_cumsum(wm)
    loss_bi = 2.0 * jnp.sum(w * (mids * w_cum - wm_cum), axis=-1)
    loss_uni = (1.0 / 3.0) * jnp.sum(intervals * w * w, axis=-1)
    return loss_bi + loss_uni


def distortion_loss(weights: jnp.ndarray, mids: jnp.ndarray,
                    intervals: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Scalar mean of ``distortion_per_ray`` (reference
    ``torch_efficient_distloss`` ``eff_distloss``)."""
    return jnp.mean(distortion_per_ray(weights, mids, intervals, valid))


def distortion_loss_bruteforce(weights, mids, intervals, valid):
    """O(n^2) reference (tests only)."""
    w = weights * valid
    pair = jnp.abs(mids[:, :, None] - mids[:, None, :])
    loss_bi = jnp.sum(w[:, :, None] * w[:, None, :] * pair, axis=(1, 2))
    loss_uni = (1.0 / 3.0) * jnp.sum(intervals * w * w, axis=-1)
    return jnp.mean(loss_bi + loss_uni)
