"""Multiresolution hash-grid encoding — the tiny-cuda-nn replacement.

The reference's core compute primitive is tcnn's CUDA ``HashGrid`` encoding
(``ngp_nerf.py:96-134``, ``pano_joint_predictor.py:30-41``). This module
provides the TPU-native equivalent (Instant-NGP, arXiv 2201.05989):

- ``init_hash_table`` / ``hash_encode``: pure-XLA gather + d-linear interp.
  Gradients (both w.r.t. the table — scatter-add — and w.r.t. the input
  position, needed by the sphere distance field's analytic normals) come from
  autodiff.
- A Pallas kernel variant lives in ``hashgrid_pallas.py``; the public entry
  ``hash_encode`` dispatches to whichever implementation is enabled.

Layout notes (TPU-first): levels are unrolled statically so XLA sees 16
independent gathers it can schedule together; per-level features stay in a
single ``[L, T, F]`` table so the whole encoder is ONE parameter leaf (reset /
optimizer handling is trivial), and lookups use power-of-two masking instead
of modulo.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# Spatial hash primes (Instant-NGP convention).
_PRIMES = (1, 2654435761, 805459861)


@dataclasses.dataclass(frozen=True)
class HashGridConfig:
    n_levels: int = 16
    n_features: int = 2
    log2_table_size: int = 18
    base_res: int = 16
    per_level_scale: float = 1.4472692012786865
    interpolation: str = "linear"  # or "smoothstep"

    @property
    def table_size(self) -> int:
        return 1 << self.log2_table_size

    @property
    def out_dim(self) -> int:
        return self.n_levels * self.n_features

    def level_res(self, level: int) -> int:
        return int(np.floor(self.base_res * self.per_level_scale ** level))

    @classmethod
    def sphere_field(cls, fine_res: int = 2048, n_levels: int = 16,
                     log2_table_size: int = 19, base_res: int = 16):
        """Config used by the sphere distance field (reference
        ``pano_joint_predictor.py:24-41``): growth solved from fine_res,
        Smoothstep interpolation."""
        scale = float(np.exp(np.log(fine_res / base_res) / (n_levels - 1)))
        return cls(n_levels=n_levels, n_features=2, log2_table_size=log2_table_size,
                   base_res=base_res, per_level_scale=scale,
                   interpolation="smoothstep")


def init_hash_table(key: jax.Array, cfg: HashGridConfig,
                    dtype=jnp.float32) -> jnp.ndarray:
    """Uniform(-1e-4, 1e-4) init (Instant-NGP / tcnn convention)."""
    return jax.random.uniform(
        key, (cfg.n_levels, cfg.table_size, cfg.n_features),
        minval=-1e-4, maxval=1e-4, dtype=dtype)


def _corner_indices(corners: jnp.ndarray, res: int, table_size: int) -> jnp.ndarray:
    """Map integer corner coords [..., 3] to table rows.

    Dense (collision-free) indexing when the level's grid fits in the table,
    spatial hashing otherwise — matching Instant-NGP semantics.
    """
    if (res + 1) ** 3 <= table_size:
        r1 = res + 1
        return (corners[..., 0] * (r1 * r1) + corners[..., 1] * r1
                + corners[..., 2])
    c = corners.astype(jnp.uint32)
    h = (c[..., 0] * jnp.uint32(_PRIMES[0])
         ^ c[..., 1] * jnp.uint32(_PRIMES[1])
         ^ c[..., 2] * jnp.uint32(_PRIMES[2]))
    return (h & jnp.uint32(table_size - 1)).astype(jnp.int32)


# The 8 cube-corner offsets, static.
_OFFSETS = np.array([[i >> 2 & 1, i >> 1 & 1, i & 1] for i in range(8)],
                    dtype=np.int32)


def _encode_level(table_l: jnp.ndarray, x: jnp.ndarray, res: int,
                  cfg: HashGridConfig) -> jnp.ndarray:
    """Encode positions x [N, 3] in [0, 1] at one level. Returns [N, F]."""
    pos = x * res
    c0f = jnp.clip(jnp.floor(pos), 0, res - 1)  # corner+1 stays <= res
    frac = pos - c0f
    c0 = c0f.astype(jnp.int32)

    if cfg.interpolation == "smoothstep":
        w = frac * frac * (3.0 - 2.0 * frac)
    else:
        w = frac

    offsets = jnp.asarray(_OFFSETS)                       # [8, 3]
    corners = c0[:, None, :] + offsets[None, :, :]        # [N, 8, 3]
    idx = _corner_indices(corners, res, cfg.table_size)   # [N, 8]
    feats = table_l[idx]                                  # [N, 8, F]

    # trilinear weights: prod over dims of (w or 1-w) per corner bit
    off_f = offsets.astype(x.dtype)                       # [8, 3]
    wc = off_f[None] * w[:, None, :] + (1.0 - off_f[None]) * (1.0 - w[:, None, :])
    weights = wc[..., 0] * wc[..., 1] * wc[..., 2]        # [N, 8]
    return jnp.sum(feats * weights[..., None], axis=1)


def hash_encode_xla(table: jnp.ndarray, x: jnp.ndarray,
                    cfg: HashGridConfig) -> jnp.ndarray:
    """Encode positions x [N, 3] in [0, 1]^3 -> features [N, L*F].

    Pure-XLA path: 16 static-unrolled gathers. Out-of-range inputs are
    clamped (callers gate with an AABB selector the way the reference does).
    """
    x = jnp.clip(x, 0.0, 1.0)
    outs = [
        _encode_level(table[lvl], x, cfg.level_res(lvl), cfg)
        for lvl in range(cfg.n_levels)
    ]
    return jnp.concatenate(outs, axis=-1)


def hash_encode(table: jnp.ndarray, x: jnp.ndarray,
                cfg: HashGridConfig) -> jnp.ndarray:
    """Public entry: dispatches to the best implementation for the platform.

    Currently the XLA path; the Pallas kernel is opt-in via
    ``perf_tpu.kernels.hashgrid_pallas`` once it wins benchmarks.
    """
    return hash_encode_xla(table, x, cfg)


def hash_encode_numpy(table: np.ndarray, x: np.ndarray,
                      cfg: HashGridConfig) -> np.ndarray:
    """Slow NumPy reference used only by tests (independent implementation)."""
    x = np.clip(np.asarray(x, np.float64), 0.0, 1.0)
    n = x.shape[0]
    out = np.zeros((n, cfg.out_dim), np.float64)
    for lvl in range(cfg.n_levels):
        res = cfg.level_res(lvl)
        pos = x * res
        c0 = np.clip(np.floor(pos), 0, res - 1).astype(np.int64)
        frac = pos - np.clip(np.floor(pos), 0, res - 1)
        w = frac * frac * (3 - 2 * frac) if cfg.interpolation == "smoothstep" else frac
        acc = np.zeros((n, cfg.n_features), np.float64)
        for bit in range(8):
            off = np.array([bit >> 2 & 1, bit >> 1 & 1, bit & 1], np.int64)
            corner = c0 + off
            if (res + 1) ** 3 <= cfg.table_size:
                idx = (corner[:, 0] * (res + 1) ** 2 + corner[:, 1] * (res + 1)
                       + corner[:, 2])
            else:
                cu = corner.astype(np.uint32)
                h = (cu[:, 0] * np.uint32(_PRIMES[0])
                     ^ cu[:, 1] * np.uint32(_PRIMES[1])
                     ^ cu[:, 2] * np.uint32(_PRIMES[2]))
                idx = (h & np.uint32(cfg.table_size - 1)).astype(np.int64)
            wt = np.prod(np.where(off > 0, w, 1 - w), axis=-1)
            acc += np.asarray(table[lvl], np.float64)[idx] * wt[:, None]
        out[:, lvl * cfg.n_features:(lvl + 1) * cfg.n_features] = acc
    return out
