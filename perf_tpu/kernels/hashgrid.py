"""Multiresolution hash-grid encoding — the tiny-cuda-nn replacement.

The reference's core compute primitive is tcnn's CUDA ``HashGrid`` encoding
(``ngp_nerf.py:96-134``, ``pano_joint_predictor.py:30-41``). This module
provides the TPU-native equivalent (Instant-NGP, arXiv 2201.05989) as pure
XLA; a Pallas kernel is the planned upgrade for the same API.

TPU layout rules drive the design (learned the hard way — a naive port OOMs
the compiler):

- tables are stored ``[L, F, T]`` (feature-major) so every gather produces a
  tensor shaped like its INDEX array — no trailing length-2 dim that the
  (8, 128) tile would pad 64x;
- coordinates flow as three separate same-shaped arrays (``hash_encode_coords``)
  instead of an ``[..., 3]`` tensor (42x lane padding);
- corners accumulate through a dependency chain so peak live buffers stay at
  one gather's size;
- gradients (table scatter-add + input-position, the latter needed by the
  sphere field's analytic normals) come from autodiff.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

# Spatial hash primes (Instant-NGP convention).
_PRIMES = (1, 2654435761, 805459861)

# The 8 cube-corner offsets, static.
_OFFSETS = [(i >> 2 & 1, i >> 1 & 1, i & 1) for i in range(8)]


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
    """[L, F, T] (feature-major), uniform(-1e-4, 1e-4) init (tcnn convention)."""
    return jax.random.uniform(
        key, (cfg.n_levels, cfg.n_features, cfg.table_size),
        minval=-1e-4, maxval=1e-4, dtype=dtype)


def _corner_flat_index(cx, cy, cz, res: int, table_size: int):
    """Integer corner coords (same-shape arrays) -> table row index.

    Dense (collision-free) indexing when the level's grid fits in the table,
    spatial hashing otherwise — Instant-NGP semantics.
    """
    if (res + 1) ** 3 <= table_size:
        r1 = res + 1
        return cx * (r1 * r1) + cy * r1 + cz
    h = (cx.astype(jnp.uint32) * jnp.uint32(_PRIMES[0])
         ^ cy.astype(jnp.uint32) * jnp.uint32(_PRIMES[1])
         ^ cz.astype(jnp.uint32) * jnp.uint32(_PRIMES[2]))
    return (h & jnp.uint32(table_size - 1)).astype(jnp.int32)


def _axis_terms(x, res: int, smoothstep: bool):
    """Per-axis corner index + interpolation weight pair."""
    pos = jnp.clip(x, 0.0, 1.0) * res
    c0f = jnp.clip(jnp.floor(pos), 0, res - 1)  # corner+1 stays <= res
    frac = pos - c0f
    if smoothstep:
        w = frac * frac * (3.0 - 2.0 * frac)
    else:
        w = frac
    return c0f.astype(jnp.int32), w


def encode_level_coords(table_lvl: jnp.ndarray, level_res: int, x, y, z,
                        cfg: HashGridConfig) -> list:
    """Encode ONE level at coords in [0,1] (three same-shape arrays).

    table_lvl: [F, T]. Returns a list of F arrays shaped like x.
    """
    smooth = cfg.interpolation == "smoothstep"
    res = level_res
    cx, wx = _axis_terms(x, res, smooth)
    cy, wy = _axis_terms(y, res, smooth)
    cz, wz = _axis_terms(z, res, smooth)
    accs = [None] * cfg.n_features
    for ox, oy, oz in _OFFSETS:
        idx = _corner_flat_index(cx + ox, cy + oy, cz + oz, res,
                                 cfg.table_size)
        weight = ((wx if ox else 1.0 - wx)
                  * (wy if oy else 1.0 - wy)
                  * (wz if oz else 1.0 - wz))
        for f in range(cfg.n_features):
            term = table_lvl[f][idx] * weight
            accs[f] = term if accs[f] is None else accs[f] + term
    return accs


def hash_encode_coords(table: jnp.ndarray, x, y, z,
                       cfg: HashGridConfig) -> jnp.ndarray:
    """Encode coordinates in [0, 1] given as three same-shape arrays.

    Returns features stacked on a NEW trailing axis: [..., L*F], ordered
    level-major then feature (level0 f0, level0 f1, level1 f0, ...).
    """
    outs = []
    for lvl in range(cfg.n_levels):
        outs.extend(encode_level_coords(table[lvl], cfg.level_res(lvl),
                                        x, y, z, cfg))
    return jnp.stack(outs, axis=-1)


def level_strides(cfg: HashGridConfig, step: float, n_samples: int) -> tuple:
    """Per-level ray-subsampling strides (power of two).

    Level l's features vary on the scale of its voxel (2/res_l in the
    [-1,1]^3 world); sampling them along the ray every ~half voxel and
    lerping to the fine ladder is at-Nyquist for that level. Coarse levels
    get large strides (huge gather savings), the finest levels stride 1.
    """
    strides = []
    for lvl in range(cfg.n_levels):
        voxel = 2.0 / cfg.level_res(lvl)
        k = max(1, int(voxel / (2.0 * step)))
        k = 1 << (k.bit_length() - 1)         # floor to power of two
        cap = max(1, n_samples // 2)
        cap = 1 << (cap.bit_length() - 1)     # keep the cap a power of two
        # hard cap 16 so any multiple-of-16 sample budget divides every
        # stride: this frees the adaptive budgets from power-of-two
        # quantization (128 -> 112 at the flagship shell, a 12% row cut)
        # for a ~1.5% row increase at the coarsest levels
        k = min(k, 16, cap)
        while n_samples % k:          # halved budgets can be mult-of-8 only
            k //= 2
        strides.append(k)
    return tuple(strides)


def _lerp_upsample(coarse: jnp.ndarray, stride: int, n: int) -> jnp.ndarray:
    """[N, P+1] coarse values -> [N, n] linear interpolation at stride K."""
    if stride == 1:
        return coarse[:, :n]
    p = n // stride
    left = coarse[:, :p]                       # [N, P]
    right = coarse[:, 1:p + 1]
    w = (jnp.arange(stride, dtype=coarse.dtype) / stride)[None, None, :]
    full = left[:, :, None] * (1.0 - w) + right[:, :, None] * w
    return full.reshape(coarse.shape[0], p * stride)


def hash_encode_ray(table: jnp.ndarray, x, y, z, cfg: HashGridConfig,
                    strides: tuple) -> jnp.ndarray:
    """Ray-structured encode with per-level subsampling.

    x/y/z: [N, S] sample coords along rays (S samples, roughly uniform in t).
    For each level, the field is evaluated every ``strides[l]`` samples (plus
    the last sample) and linearly interpolated back to all S — cutting
    gather rows by ~sum(1/K_l)/L while staying at each level's Nyquist rate.
    Returns [N, S, L*F].
    """
    n, s = x.shape
    outs = []
    for lvl in range(cfg.n_levels):
        k = strides[lvl]
        if k == 1:
            outs.extend(encode_level_coords(table[lvl], cfg.level_res(lvl),
                                            x, y, z, cfg))
            continue
        assert s % k == 0, f"samples {s} not divisible by stride {k}"
        xs = jnp.concatenate([x[:, ::k], x[:, -1:]], axis=1)  # [N, P+1]
        ys = jnp.concatenate([y[:, ::k], y[:, -1:]], axis=1)
        zs = jnp.concatenate([z[:, ::k], z[:, -1:]], axis=1)
        feats = encode_level_coords(table[lvl], cfg.level_res(lvl),
                                    xs, ys, zs, cfg)
        outs.extend(_lerp_upsample(f, k, s) for f in feats)
    return jnp.stack(outs, axis=-1)


def hash_encode(table: jnp.ndarray, x: jnp.ndarray,
                cfg: HashGridConfig) -> jnp.ndarray:
    """Encode positions x [..., 3] in [0, 1]^3 -> features [..., L*F]."""
    return hash_encode_coords(table, x[..., 0], x[..., 1], x[..., 2], cfg)


# Back-compat alias (public API name predating the layout work).
hash_encode_xla = hash_encode


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
            acc += np.asarray(table[lvl], np.float64).T[idx] * wt[:, None]
        out[:, lvl * cfg.n_features:(lvl + 1) * cfg.n_features] = acc
    return out
