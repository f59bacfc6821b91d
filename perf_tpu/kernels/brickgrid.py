"""Brick-packed multiresolution grid — the TPU-flagship field encoding.

Motivation (measured on TPU v5e, see BASELINE.md): XLA gathers cost ~constant
per ROW (~130M narrow rows/s) but reach memory bandwidth with >=512-byte rows
(~250M rows/s at 128 lanes). The classic NGP layout needs 8 corners x F
narrow rows per (sample, level) — hopeless on TPU. This layout needs ONE
128-lane row per (sample, level, feature):

- corners are packed into OVERLAPPING 5x5x5 bricks on a stride-4 grid
  (brick b covers corner range [4b, 4b+4] per axis, 125 corners -> 125 of
  128 lanes; ~2x storage duplication);
- any voxel's 8 interpolation corners live in ONE brick: c0 in [0, res-1],
  b = c0 >> 2, local = c0 & 3 in [0, 3], so corners local..local+1 <= 4;
- trilinear interpolation is a dense masked dot over the row's 128 lanes:
  per-axis 5-vectors with two non-zeros (1-w at local, w at local+1), outer
  product = the sparse-8 weight row — XLA fuses the gather, the outer
  product, and the lane reduction, so nothing wider than the row transits;
- gradients: d/table is a scatter-add of dense 128-wide weight rows (wide
  scatters are also BW-efficient), d/position flows through the weight
  vectors (smoothstep supported, needed by the sphere field).

Brick indexing is dense when the level's brick grid fits the table, else a
spatial hash of BRICK coords (coarser collision granularity than per-corner
NGP hashing — an accepted redesign; quality is gated by the golden-fit test).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

_PRIMES = (1, 2654435761, 805459861)
BRICK = 4          # voxels per brick edge (default)
BLANE = 5          # corners per brick edge (overlap 1)
ROW = 128          # padded row width (125 used)


@dataclasses.dataclass(frozen=True)
class BrickGridConfig:
    n_levels: int = 16
    n_features: int = 2
    log2_bricks: int = 11           # rows per (level, feature): 2^11*125 ~ 2^18 corners
    base_res: int = 16
    per_level_scale: float = 1.4472692012786865
    interpolation: str = "linear"
    # bf16 table storage: f32 master params (Adam-friendly), gathers read a
    # bf16 view, gradients scatter-accumulate in f32 (custom vjp) — halves
    # the dominant gather/scatter bandwidth
    bf16_table: bool = True

    @property
    def n_bricks(self) -> int:
        return 1 << self.log2_bricks

    @property
    def out_dim(self) -> int:
        return self.n_levels * self.n_features

    def level_res(self, level: int) -> int:
        return int(np.floor(self.base_res * self.per_level_scale ** level))

    def level_bricks(self, level: int) -> int:
        # bricks per axis covering corner range [0, res]
        return self.level_res(level) // BRICK + 1


@jax.custom_vjp
def gather_rows_lowp(table: jnp.ndarray, rows: jnp.ndarray) -> jnp.ndarray:
    """Gather rows from a bf16 view of an f32 table, f32-accumulated grads.

    Forward fetches 256-byte bf16 rows (half the bandwidth of f32); backward
    scatter-adds into an f32 cotangent so tiny per-step updates don't vanish
    in bf16 accumulation. The bf16 rounding of the VALUES is the same
    precision regime as tcnn's fp16 tables.
    """
    return table.astype(jnp.bfloat16)[rows].astype(jnp.float32)


def _gather_rows_fwd(table, rows):
    return gather_rows_lowp(table, rows), (rows, table.shape)


def _gather_rows_bwd(res, g):
    rows, shape = res
    gt = jnp.zeros(shape, jnp.float32).at[rows].add(g.astype(jnp.float32))
    return gt, None


gather_rows_lowp.defvjp(_gather_rows_fwd, _gather_rows_bwd)


def init_brick_table(key: jax.Array, cfg: BrickGridConfig,
                     dtype=jnp.float32) -> jnp.ndarray:
    """[L, n_bricks, F*128]: ALL features of a brick in ONE row (feature f
    occupies lanes [f*128, f*128+125)). One gather serves every feature —
    halves the row count, which is what TPU gathers are bound by.
    Uniform(-1e-4, 1e-4) init."""
    return jax.random.uniform(
        key, (cfg.n_levels, cfg.n_bricks, cfg.n_features * ROW),
        minval=-1e-4, maxval=1e-4, dtype=dtype)


def _brick_index(bx, by, bz, nb: int, table_rows: int):
    if nb ** 3 <= table_rows:
        return bx * (nb * nb) + by * nb + bz
    h = (bx.astype(jnp.uint32) * jnp.uint32(_PRIMES[0])
         ^ by.astype(jnp.uint32) * jnp.uint32(_PRIMES[1])
         ^ bz.astype(jnp.uint32) * jnp.uint32(_PRIMES[2]))
    return (h & jnp.uint32(table_rows - 1)).astype(jnp.int32)


def _axis_split(x, res: int, smooth: bool):
    """-> (brick coord [..], local corner [..], frac weight [..])."""
    pos = jnp.clip(x, 0.0, 1.0) * res
    c0f = jnp.clip(jnp.floor(pos), 0, res - 1)
    frac = pos - c0f
    if smooth:
        frac = frac * frac * (3.0 - 2.0 * frac)
    c0 = c0f.astype(jnp.int32)
    return c0 >> 2, c0 & 3, frac


def _axis_weight_vec(local, frac):
    """Two-nonzero 5-vector: lane local -> 1-frac, lane local+1 -> frac.

    local/frac [...]; returns [..., 5].
    """
    lanes = jnp.arange(BLANE, dtype=jnp.int32)
    l = local[..., None]
    w = frac[..., None]
    return ((lanes == l) * (1.0 - w) + (lanes == l + 1) * w)


def encode_brick_level(table_l, level_res: int, nb: int, x, y, z,
                       smooth: bool, bf16_table: bool = True,
                       n_features: int = 2) -> list:
    """One level: table_l [n_bricks, F*128]; coords arbitrary shape [...].
    Returns F arrays shaped like x. ONE row gather serves all features."""
    bx, lx, fx = _axis_split(x, level_res, smooth)
    by, ly, fy = _axis_split(y, level_res, smooth)
    bz, lz, fz = _axis_split(z, level_res, smooth)
    rows = _brick_index(bx, by, bz, nb, table_l.shape[0])

    wx = _axis_weight_vec(lx, fx)                     # [..., 5]
    wy = _axis_weight_vec(ly, fy)
    wz = _axis_weight_vec(lz, fz)
    # dense lane weights [..., 125] -> padded to 128 by the mul below
    w = (wx[..., :, None, None] * wy[..., None, :, None]
         * wz[..., None, None, :]).reshape(*x.shape, BLANE ** 3)

    if bf16_table:
        row = gather_rows_lowp(table_l, rows)          # [..., F*128]
    else:
        row = table_l[rows]
    return [jnp.sum(row[..., f * ROW: f * ROW + BLANE ** 3] * w, axis=-1)
            for f in range(n_features)]


def brick_encode_ray(table: jnp.ndarray, x, y, z, cfg: BrickGridConfig,
                     strides: tuple) -> jnp.ndarray:
    """Ray-structured encode with per-level subsampling (same contract as
    ``hash_encode_ray``): x/y/z [N, S] -> [N, S, L*F]."""
    from .hashgrid import _lerp_upsample
    smooth = cfg.interpolation == "smoothstep"
    n, s = x.shape
    outs = []
    for lvl in range(cfg.n_levels):
        k = strides[lvl]
        res = cfg.level_res(lvl)
        nb = cfg.level_bricks(lvl)
        if k == 1:
            outs.extend(encode_brick_level(table[lvl], res, nb, x, y, z,
                                           smooth, cfg.bf16_table,
                                           cfg.n_features))
            continue
        assert s % k == 0
        xs = jnp.concatenate([x[:, ::k], x[:, -1:]], axis=1)
        ys = jnp.concatenate([y[:, ::k], y[:, -1:]], axis=1)
        zs = jnp.concatenate([z[:, ::k], z[:, -1:]], axis=1)
        feats = encode_brick_level(table[lvl], res, nb, xs, ys, zs, smooth,
                                   cfg.bf16_table, cfg.n_features)
        outs.extend(_lerp_upsample(f, k, s) for f in feats)
    return jnp.stack(outs, axis=-1)


def brick_encode(table: jnp.ndarray, x: jnp.ndarray,
                 cfg: BrickGridConfig) -> jnp.ndarray:
    """Flat encode: x [..., 3] in [0,1] -> [..., L*F]."""
    smooth = cfg.interpolation == "smoothstep"
    outs = []
    for lvl in range(cfg.n_levels):
        outs.extend(encode_brick_level(
            table[lvl], cfg.level_res(lvl), cfg.level_bricks(lvl),
            x[..., 0], x[..., 1], x[..., 2], smooth, cfg.bf16_table,
            cfg.n_features))
    return jnp.stack(outs, axis=-1)


def brick_encode_numpy(table: np.ndarray, x: np.ndarray,
                       cfg: BrickGridConfig) -> np.ndarray:
    """Independent NumPy reference (tests)."""
    x = np.clip(np.asarray(x, np.float64), 0.0, 1.0)
    n = x.shape[0]
    out = np.zeros((n, cfg.out_dim), np.float64)
    smooth = cfg.interpolation == "smoothstep"
    for lvl in range(cfg.n_levels):
        res = cfg.level_res(lvl)
        nb = cfg.level_bricks(lvl)
        pos = x * res
        c0 = np.clip(np.floor(pos), 0, res - 1).astype(np.int64)
        frac = pos - c0
        if smooth:
            frac = frac * frac * (3 - 2 * frac)
        b = c0 >> 2
        loc = c0 & 3
        if nb ** 3 <= cfg.n_bricks:
            rows = b[:, 0] * nb * nb + b[:, 1] * nb + b[:, 2]
        else:
            bu = b.astype(np.uint32)
            h = (bu[:, 0] * np.uint32(_PRIMES[0])
                 ^ bu[:, 1] * np.uint32(_PRIMES[1])
                 ^ bu[:, 2] * np.uint32(_PRIMES[2]))
            rows = (h & np.uint32(cfg.n_bricks - 1)).astype(np.int64)
        for f in range(cfg.n_features):
            acc = np.zeros(n)
            for bit in range(8):
                ox, oy, oz = bit >> 2 & 1, bit >> 1 & 1, bit & 1
                lane = ((loc[:, 0] + ox) * 25 + (loc[:, 1] + oy) * 5
                        + (loc[:, 2] + oz))
                wt = (np.where(ox, frac[:, 0], 1 - frac[:, 0])
                      * np.where(oy, frac[:, 1], 1 - frac[:, 1])
                      * np.where(oz, frac[:, 2], 1 - frac[:, 2]))
                vals = np.asarray(table[lvl], np.float64)[rows, f * ROW + lane]
                acc += vals * wt
            out[:, lvl * cfg.n_features + f] = acc
    return out
