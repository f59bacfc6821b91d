"""Brick-packed multiresolution grid — the TPU-flagship field encoding.

Motivation (measured on TPU v5e, see BASELINE.md): XLA gathers cost per
ROW-TILE — a row spanning two 128-lane tiles costs two tile fetches — so the
encoding is shaped so ONE (sample, level) needs exactly ONE 128-lane bf16
row (256 B):

- corners are packed into OVERLAPPING 4x4x4-corner bricks on a stride-3 grid
  (brick b covers corner range [3b, 3b+3] per axis; 4^3 corners x 2 features
  fill the 128 lanes exactly, feature-interleaved: lane = corner*F + f);
- any voxel's 8 interpolation corners live in ONE brick: c0 in [0, res-1],
  b = c0 // 3, local = c0 mod 3 in [0, 2], so corners local..local+1 <= 3;
- the 8 corners are selected by synthesizing a per-lane one-hot weight
  inside the multiply-reduce (pure elementwise + reduction, fuses into the
  gather; both a dense lane-weight tensor and per-corner take_along_axis
  measured slower — the latter ~20x);
- gradients: d/table scatter-adds one-hot-synthesized bf16 rows (f32
  accumulation), d/position flows through the corner weights (exact,
  lazily re-gathered, DCE'd when unused).

Brick indexing is dense when the level's brick grid fits the table, else a
spatial hash of BRICK coords (coarser collision granularity than per-corner
NGP hashing — an accepted redesign; quality is gated by the golden-fit test).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_PRIMES = (1, 2654435761, 805459861)
BRICK = 3          # voxels per brick edge
BLANE = 4          # corners per brick edge (overlap 1)
ROW = 128          # row width: 4^3 corners x 2 features, exactly one tile


@dataclasses.dataclass(frozen=True)
class BrickGridConfig:
    n_levels: int = 16
    n_features: int = 2
    log2_bricks: int = 12           # 2^12 rows x 4^3 corners = 2^18 corners
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

    @classmethod
    def sphere_field(cls, fine_res: int = 2048, n_levels: int = 16,
                     log2_bricks: int = 13, base_res: int = 16):
        """Brick counterpart of ``HashGridConfig.sphere_field`` (same level
        ladder, Smoothstep interpolation; 2^13 rows x 64 corners = 2^19
        corners, the hash variant's table size)."""
        scale = float(np.exp(np.log(fine_res / base_res) / (n_levels - 1)))
        return cls(n_levels=n_levels, n_features=2, log2_bricks=log2_bricks,
                   base_res=base_res, per_level_scale=scale,
                   interpolation="smoothstep")


def init_brick_table(key: jax.Array, cfg: BrickGridConfig,
                     dtype=jnp.float32) -> jnp.ndarray:
    """[L, n_bricks, 64*F]: ALL features of a brick in ONE row, interleaved
    (corner c's feature f at lane c*F + f). One single-tile gather serves
    every corner and feature of a sample. Uniform(-1e-4, 1e-4) init."""
    return jax.random.uniform(
        key, (cfg.n_levels, cfg.n_bricks, cfg.n_features * BLANE ** 3),
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
    b = c0 // BRICK
    return b, c0 - b * BRICK, frac


def _lane_axes(width: int, nf: int):
    """Decompose lane index -> (corner-x, corner-y, corner-z, feature)."""
    lanes = jnp.arange(width, dtype=jnp.int32)
    ax = lanes // (16 * nf)
    ay = (lanes // (4 * nf)) % 4
    az = (lanes // nf) % 4
    af = lanes % nf
    return ax, ay, az, af


def _axis_sel(a, loc, frac):
    """Per-lane weight for one axis: 1-frac at loc, frac at loc+1, 0 else."""
    loc = loc[..., None]
    frac = frac[..., None]
    return (a == loc) * (1.0 - frac) + (a == loc + 1) * frac


def _lane_weights(locs, fracs, width: int, nf: int):
    """The full trilinear weight of every lane, synthesized per lane from
    three factored axis selectors (2 compares/axis — ~3x cheaper on the VPU
    than 8 per-corner one-hots, and no dense weight tensor ever
    materializes; per-corner take_along_axis measured ~20x slower)."""
    ax, ay, az, _ = _lane_axes(width, nf)
    return (_axis_sel(ax, locs[0], fracs[0])
            * _axis_sel(ay, locs[1], fracs[1])
            * _axis_sel(az, locs[2], fracs[2]))


def _interp_from_rows(row_vals, locs, fracs, nf: int) -> tuple:
    """row_vals [..., 64*F] -> tuple of F feature arrays [...]."""
    width = row_vals.shape[-1]
    w_lane = _lane_weights(locs, fracs, width, nf)
    vals = row_vals.astype(jnp.float32) * w_lane
    if nf == 1:
        return (jnp.sum(vals, axis=-1),)
    af = _lane_axes(width, nf)[3]
    return tuple(jnp.sum(vals * (af == f), axis=-1) for f in range(nf))


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def corner_interp_lowp(nf: int, table_l, rows, locs, fracs):
    """Row gather + trilinear interpolation, bandwidth-shaped vjp.

    table_l [R, 64*F] f32 master (forward reads a bf16 view — the same
    precision regime as tcnn's fp16 tables); rows int32 [...]; locs: tuple
    of 3 int32 [...] in [0, 2] (in-brick corner coords); fracs: tuple of 3
    f32 [...] interpolation fractions. Returns F arrays [...].

    Backward:
    - d/table: cotangent rows are synthesized from the factored lane
      weights in bf16 — individual contributions round to bf16 but the
      ACCUMULATION stays f32 (the scatter-add upcasts into the f32 zeros
      buffer), matching tcnn's low-precision-grads / f32-accumulation
      scheme — then ONE single-tile row scatter-add. It needs NO forward
      values, so with the enc_feats remat policy the backward never
      re-gathers.
    - d/fracs (the position-gradient path): exact, from values re-gathered
      on demand; jaxpr DCE deletes the re-gather when positions don't
      require gradients, which is the NGP train path.
    """
    vals = table_l.astype(jnp.bfloat16)[rows]
    return _interp_from_rows(vals, locs, fracs, nf)


def _ci_fwd(nf, table_l, rows, locs, fracs):
    return (corner_interp_lowp(nf, table_l, rows, locs, fracs),
            (table_l, rows, locs, fracs))


def _ci_bwd(nf, res, g):
    table_l, rows, locs, fracs = res
    width = table_l.shape[-1]
    ax, ay, az, af = _lane_axes(width, nf)
    w_lane = _lane_weights(locs, fracs, width, nf)
    gsel = g[0][..., None] if nf == 1 else sum(
        (af == f) * g[f][..., None] for f in range(nf))
    gt = jnp.zeros(table_l.shape, jnp.float32).at[rows].add(
        (w_lane * gsel).astype(jnp.bfloat16).astype(jnp.float32))

    # exact position grads via on-demand re-gather (DCE'd when unused)
    vals = table_l.astype(jnp.bfloat16)[rows].astype(jnp.float32)
    wx = _axis_sel(ax, locs[0], fracs[0])
    wy = _axis_sel(ay, locs[1], fracs[1])
    wz = _axis_sel(az, locs[2], fracs[2])

    def dsel(a, loc):
        loc = loc[..., None]
        return (a == loc + 1).astype(jnp.float32) - (a == loc)

    core = vals * gsel
    gfx = jnp.sum(core * dsel(ax, locs[0]) * wy * wz, axis=-1)
    gfy = jnp.sum(core * wx * dsel(ay, locs[1]) * wz, axis=-1)
    gfz = jnp.sum(core * wx * wy * dsel(az, locs[2]), axis=-1)
    return gt, None, (None, None, None), (gfx, gfy, gfz)


corner_interp_lowp.defvjp(_ci_fwd, _ci_bwd)


def encode_brick_level(table_l, level_res: int, nb: int, x, y, z,
                       smooth: bool, bf16_table: bool = True,
                       n_features: int = 2) -> list:
    """One level: table_l [n_bricks, 64*F]; coords arbitrary shape [...].
    Returns F arrays shaped like x. ONE single-tile row gather serves all
    corners and features."""
    bx, lx, fx = _axis_split(x, level_res, smooth)
    by, ly, fy = _axis_split(y, level_res, smooth)
    bz, lz, fz = _axis_split(z, level_res, smooth)
    rows = _brick_index(bx, by, bz, nb, table_l.shape[0])
    locs, fracs = (lx, ly, lz), (fx, fy, fz)
    if bf16_table:
        return list(corner_interp_lowp(n_features, table_l, rows, locs,
                                       fracs))
    return list(_interp_from_rows(table_l[rows], locs, fracs, n_features))


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


def brick_encode_stacked(table: jnp.ndarray, x: jnp.ndarray,
                         cfg: BrickGridConfig) -> jnp.ndarray:
    """Flat encode with ALL levels in ONE gather: x [..., 3] -> [..., L*F].

    Same math as ``brick_encode``, different execution plan for the
    small-batch regime: each gather op carries a measured ~4-5 ms fixed
    cost, so 16 sequential per-level gathers of ~32k rows are overhead-
    bound (the sphere-field distillation loops live here). Stacking the
    level axis into the row index turns them into ONE L*N-row gather —
    and, through the shared custom vjp, ONE scatter-add backward.
    (The NeRF train path keeps per-level gathers: at millions of rows per
    level the fixed cost is amortized and stacking measured slower.)
    """
    smooth = cfg.interpolation == "smoothstep"
    shape = x.shape[:-1]
    xf = x.reshape(-1, 3)
    nb_rows = table.shape[1]
    rows_l, locs_l, fracs_l = [], [], []
    for lvl in range(cfg.n_levels):
        res = cfg.level_res(lvl)
        nb = cfg.level_bricks(lvl)
        bx, lx, fx = _axis_split(xf[:, 0], res, smooth)
        by, ly, fy = _axis_split(xf[:, 1], res, smooth)
        bz, lz, fz = _axis_split(xf[:, 2], res, smooth)
        rows_l.append(_brick_index(bx, by, bz, nb, nb_rows) + lvl * nb_rows)
        locs_l.append((lx, ly, lz))
        fracs_l.append((fx, fy, fz))
    rows = jnp.stack(rows_l)                                  # [L, N]
    locs = tuple(jnp.stack([locs_l[l][a] for l in range(cfg.n_levels)])
                 for a in range(3))
    fracs = tuple(jnp.stack([fracs_l[l][a] for l in range(cfg.n_levels)])
                  for a in range(3))
    flat_table = table.reshape(cfg.n_levels * nb_rows, table.shape[-1])
    if cfg.bf16_table:
        feats = corner_interp_lowp(cfg.n_features, flat_table, rows, locs,
                                   fracs)
    else:
        feats = _interp_from_rows(flat_table[rows], locs, fracs,
                                  cfg.n_features)
    out = jnp.stack(feats, axis=-1)                           # [L, N, F]
    out = out.transpose(1, 0, 2).reshape(
        *shape, cfg.n_levels * cfg.n_features)
    return out


def _axis_dsel(a, loc):
    """d(_axis_sel)/d(frac): -1 at loc, +1 at loc+1, 0 else."""
    loc = loc[..., None]
    return (a == loc + 1).astype(jnp.float32) - (a == loc).astype(jnp.float32)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def corner_interp_grad_lowp(nf: int, table_l, rows, locs, fracs):
    """Interpolated features AND their in-cell frac-derivatives from ONE
    row gather: -> (feats, gx, gy, gz), each a tuple of F arrays.

    The derivative outputs make analytic field gradients (surface normals)
    a FORWARD computation, so an outer ``jax.grad`` over a loss that uses
    them stays first-order: the custom vjp scatters ONE combined cotangent
    row per sample (feats cot + 3 derivative cots share the gather).

    FIRST-ORDER ONLY, and the vjp w.r.t. ``fracs`` is declared ZERO — use
    it where positions are not trained (the sphere-field distillations);
    anything training positions must use ``corner_interp_lowp``.
    """
    vals = table_l.astype(jnp.bfloat16)[rows]
    return _interp_and_grad_from_rows(vals, locs, fracs, nf)


def _interp_and_grad_from_rows(row_vals, locs, fracs, nf: int):
    width = row_vals.shape[-1]
    ax, ay, az, af = _lane_axes(width, nf)
    wx = _axis_sel(ax, locs[0], fracs[0])
    wy = _axis_sel(ay, locs[1], fracs[1])
    wz = _axis_sel(az, locs[2], fracs[2])
    dx = _axis_dsel(ax, locs[0])
    dy = _axis_dsel(ay, locs[1])
    dz = _axis_dsel(az, locs[2])
    v = row_vals.astype(jnp.float32)

    def reduce(w):
        return tuple(jnp.sum(v * ((af == f) * w), axis=-1)
                     for f in range(nf))

    return (reduce(wx * wy * wz), reduce(dx * wy * wz),
            reduce(wx * dy * wz), reduce(wx * wy * dz))


def _cig_fwd(nf, table_l, rows, locs, fracs):
    return (corner_interp_grad_lowp(nf, table_l, rows, locs, fracs),
            (table_l, rows, locs, fracs))


def _cig_bwd(nf, res, g):
    table_l, rows, locs, fracs = res
    g_feats, g_gx, g_gy, g_gz = g
    width = table_l.shape[-1]
    ax, ay, az, af = _lane_axes(width, nf)
    wx = _axis_sel(ax, locs[0], fracs[0])
    wy = _axis_sel(ay, locs[1], fracs[1])
    wz = _axis_sel(az, locs[2], fracs[2])
    dx = _axis_dsel(ax, locs[0])
    dy = _axis_dsel(ay, locs[1])
    dz = _axis_dsel(az, locs[2])

    def sel(gt):
        if nf == 1:
            return gt[0][..., None]
        return sum((af == f) * gt[f][..., None] for f in range(nf))

    cot = (wx * wy * wz * sel(g_feats) + dx * wy * wz * sel(g_gx)
           + wx * dy * wz * sel(g_gy) + wx * wy * dz * sel(g_gz))
    gt_table = jnp.zeros(table_l.shape, jnp.float32).at[rows].add(
        cot.astype(jnp.bfloat16).astype(jnp.float32))
    return gt_table, None, (None, None, None), (None, None, None)


corner_interp_grad_lowp.defvjp(_cig_fwd, _cig_bwd)


def brick_encode_stacked_grad(table: jnp.ndarray, x: jnp.ndarray,
                              cfg: BrickGridConfig):
    """Stacked-level encode with analytic position gradients:
    x [..., 3] in [0,1] -> (feats [..., L*F], dfeats/dx [..., 3, L*F]).

    One gather forward, one scatter backward (corner_interp_grad_lowp);
    the chain through the per-level frac mapping (res scaling, smoothstep,
    clip saturation) is applied here. First-order only; position
    cotangents are ZERO by design (see corner_interp_grad_lowp).
    """
    smooth = cfg.interpolation == "smoothstep"
    shape = x.shape[:-1]
    xf = x.reshape(-1, 3)
    nb_rows = table.shape[1]
    rows_l, locs_l, fracs_l, chain_l = [], [], [], []
    for lvl in range(cfg.n_levels):
        res = cfg.level_res(lvl)
        nb = cfg.level_bricks(lvl)
        per_axis = []
        chain = []
        for a in range(3):
            pos = jnp.clip(xf[:, a], 0.0, 1.0) * res
            c0f = jnp.clip(jnp.floor(pos), 0, res - 1)
            fr = pos - c0f
            dfr = jnp.full_like(fr, float(res))
            dfr = dfr * ((xf[:, a] > 0.0) & (xf[:, a] < 1.0))
            if smooth:
                dfr = dfr * 6.0 * fr * (1.0 - fr)
                fr = fr * fr * (3.0 - 2.0 * fr)
            c0 = c0f.astype(jnp.int32)
            b = c0 // BRICK
            per_axis.append((b, c0 - b * BRICK, fr))
            chain.append(dfr)
        (bx, lx, fx), (by, ly, fy), (bz, lz, fz) = per_axis
        rows_l.append(_brick_index(bx, by, bz, nb, nb_rows) + lvl * nb_rows)
        locs_l.append((lx, ly, lz))
        fracs_l.append((fx, fy, fz))
        chain_l.append(chain)
    L = cfg.n_levels
    rows = jnp.stack(rows_l)
    locs = tuple(jnp.stack([locs_l[l][a] for l in range(L)])
                 for a in range(3))
    fracs = tuple(jnp.stack([fracs_l[l][a] for l in range(L)])
                  for a in range(3))
    chains = tuple(jnp.stack([chain_l[l][a] for l in range(L)])
                   for a in range(3))
    flat_table = table.reshape(L * nb_rows, table.shape[-1])
    feats, gx, gy, gz = corner_interp_grad_lowp(cfg.n_features, flat_table,
                                                rows, locs, fracs)

    def pack(tup, chain=None):
        arr = jnp.stack(tup, axis=-1)                         # [L, N, F]
        if chain is not None:
            arr = arr * chain[:, :, None]
        return arr.transpose(1, 0, 2).reshape(
            *shape, L * cfg.n_features)

    out_feats = pack(feats)
    grads = jnp.stack([pack(gx, chains[0]), pack(gy, chains[1]),
                       pack(gz, chains[2])], axis=-2)         # [..., 3, L*F]
    return out_feats, grads


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def corner_interp_dedup(nf: int, table_l, rep_rows, rid, locs, fracs):
    """Run-deduplicated row gather + trilinear interpolation.

    Adjacent t-ordered samples along a ray usually land in the SAME brick
    (measured flagship geometry: 22-57 brick RUNS per 128 samples at the
    stride<=2 levels), so instead of one row gather per sample this gathers
    one row per RUN and re-expands per sample with a one-hot matmul (MXU
    work, not per-row gather traffic — per-row cost is the encode floor,
    BASELINE.md).

    table_l [R, 64*F]; rep_rows int32 [N, K] (first row of each of K run
    candidates; duplicates/padding allowed); rid int32 [N, S] in [0, K)
    (each sample's run id, monotone along S, CLIPPED at K-1 — callers
    probe K per episode with slack, same exactness class as the adaptive
    sample budget); locs/fracs tuples of 3 [N, S] arrays as in
    ``corner_interp_lowp``. Returns F arrays [N, S].

    Backward scatters ONE row per (ray, run) — K/S of the standard path's
    scatter traffic — with the same bf16-contribution / f32-accumulation
    regime. d/fracs is exact (re-gather + re-expand, DCE'd when positions
    need no gradient). d/rid and d/rep_rows are zero (integer plumbing).
    """
    cand = table_l.astype(jnp.bfloat16)[rep_rows]            # [N, K, C]
    onehot = jax.nn.one_hot(rid, cand.shape[1], dtype=jnp.bfloat16)
    vals = jnp.einsum("nsk,nkc->nsc", onehot, cand,
                      preferred_element_type=jnp.float32)
    return _interp_from_rows(vals, locs, fracs, nf)


def _cid_fwd(nf, table_l, rep_rows, rid, locs, fracs):
    return (corner_interp_dedup(nf, table_l, rep_rows, rid, locs, fracs),
            (table_l, rep_rows, rid, locs, fracs))


def _cid_bwd(nf, res, g):
    table_l, rep_rows, rid, locs, fracs = res
    width = table_l.shape[-1]
    af = _lane_axes(width, nf)[3]
    w_lane = _lane_weights(locs, fracs, width, nf)
    gsel = g[0][..., None] if nf == 1 else sum(
        (af == f) * g[f][..., None] for f in range(nf))
    cot_rows = (w_lane * gsel).astype(jnp.bfloat16)          # [N, S, C]
    k = rep_rows.shape[1]
    onehot = jax.nn.one_hot(rid, k, dtype=jnp.bfloat16)
    cot_cand = jnp.einsum("nsk,nsc->nkc", onehot, cot_rows,
                          preferred_element_type=jnp.float32)
    gt = jnp.zeros(table_l.shape, jnp.float32).at[rep_rows].add(
        cot_cand.astype(jnp.bfloat16).astype(jnp.float32))

    # exact position grads via on-demand re-expansion (DCE'd when unused)
    cand = table_l.astype(jnp.bfloat16)[rep_rows]
    vals = jnp.einsum("nsk,nkc->nsc", onehot, cand,
                      preferred_element_type=jnp.float32)
    ax, ay, az, _ = _lane_axes(width, nf)
    wx = _axis_sel(ax, locs[0], fracs[0])
    wy = _axis_sel(ay, locs[1], fracs[1])
    wz = _axis_sel(az, locs[2], fracs[2])

    def dsel(a, loc):
        loc = loc[..., None]
        return (a == loc + 1).astype(jnp.float32) - (a == loc)

    core = vals * gsel
    gfx = jnp.sum(core * dsel(ax, locs[0]) * wy * wz, axis=-1)
    gfy = jnp.sum(core * wx * dsel(ay, locs[1]) * wz, axis=-1)
    gfz = jnp.sum(core * wx * wy * dsel(az, locs[2]), axis=-1)
    return gt, None, None, (None, None, None), (gfx, gfy, gfz)


corner_interp_dedup.defvjp(_cid_fwd, _cid_bwd)


def encode_brick_level_dedup(table_l, level_res: int, nb: int, x, y, z,
                             smooth: bool, n_features: int, k_runs: int
                             ) -> list:
    """One level with run-dedup: x/y/z [N, S] t-ordered along S.
    Gathers ``k_runs`` candidate rows per ray instead of S."""
    bx, lx, fx = _axis_split(x, level_res, smooth)
    by, ly, fy = _axis_split(y, level_res, smooth)
    bz, lz, fz = _axis_split(z, level_res, smooth)
    rows = _brick_index(bx, by, bz, nb, table_l.shape[0])      # [N, S]
    tr = (rows[:, 1:] != rows[:, :-1]).astype(jnp.int32)
    rid = jnp.concatenate(
        [jnp.zeros((rows.shape[0], 1), jnp.int32), jnp.cumsum(tr, axis=1)],
        axis=1)
    rid = jnp.minimum(rid, k_runs - 1)
    # first occurrence of run j = #samples with rid < j (rid is monotone)
    rep_idx = jnp.sum(rid[:, None, :] < jnp.arange(k_runs, dtype=jnp.int32)
                      [None, :, None], axis=-1)
    rep_idx = jnp.minimum(rep_idx, rows.shape[1] - 1)
    rep_rows = jnp.take_along_axis(rows, rep_idx, axis=1)      # [N, K]
    return list(corner_interp_dedup(n_features, table_l, rep_rows, rid,
                                    (lx, ly, lz), (fx, fy, fz)))


def brick_encode_ray_dedup(table: jnp.ndarray, x, y, z, cfg: BrickGridConfig,
                           strides: tuple, run_caps: tuple) -> jnp.ndarray:
    """``brick_encode_ray`` with per-level run-dedup.

    ``run_caps[lvl]`` = candidate-run budget K for that level (0 = use the
    standard per-sample gather). Samples must be t-ordered along S (the
    march emits them so). Callers probe K per episode with slack
    (``NeRFScene.select_sample_budget``-style); overflow beyond K clips to
    the last run — the same rare-worst-case class as budget truncation.
    """
    from .hashgrid import _lerp_upsample
    smooth = cfg.interpolation == "smoothstep"
    n, s = x.shape
    outs = []
    for lvl in range(cfg.n_levels):
        k = strides[lvl]
        res = cfg.level_res(lvl)
        nb = cfg.level_bricks(lvl)
        kr = run_caps[lvl] if lvl < len(run_caps) else 0
        if k == 1:
            if kr and kr < s:
                outs.extend(encode_brick_level_dedup(
                    table[lvl], res, nb, x, y, z, smooth, cfg.n_features, kr))
            else:
                outs.extend(encode_brick_level(table[lvl], res, nb, x, y, z,
                                               smooth, cfg.bf16_table,
                                               cfg.n_features))
            continue
        assert s % k == 0
        xs = jnp.concatenate([x[:, ::k], x[:, -1:]], axis=1)
        ys = jnp.concatenate([y[:, ::k], y[:, -1:]], axis=1)
        zs = jnp.concatenate([z[:, ::k], z[:, -1:]], axis=1)
        if kr and kr < xs.shape[1]:
            feats = encode_brick_level_dedup(table[lvl], res, nb, xs, ys, zs,
                                             smooth, cfg.n_features, kr)
        else:
            feats = encode_brick_level(table[lvl], res, nb, xs, ys, zs,
                                       smooth, cfg.bf16_table, cfg.n_features)
        outs.extend(_lerp_upsample(f, k, s) for f in feats)
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
        b = c0 // BRICK
        loc = c0 - b * BRICK
        if nb ** 3 <= cfg.n_bricks:
            rows = b[:, 0] * nb * nb + b[:, 1] * nb + b[:, 2]
        else:
            bu = b.astype(np.uint32)
            h = (bu[:, 0] * np.uint32(_PRIMES[0])
                 ^ bu[:, 1] * np.uint32(_PRIMES[1])
                 ^ bu[:, 2] * np.uint32(_PRIMES[2]))
            rows = (h & np.uint32(cfg.n_bricks - 1)).astype(np.int64)
        nf = cfg.n_features
        for f in range(nf):
            acc = np.zeros(n)
            for bit in range(8):
                ox, oy, oz = bit >> 2 & 1, bit >> 1 & 1, bit & 1
                lane = (((loc[:, 0] + ox) * 16 + (loc[:, 1] + oy) * 4
                         + (loc[:, 2] + oz)) * nf + f)
                wt = (np.where(ox, frac[:, 0], 1 - frac[:, 0])
                      * np.where(oy, frac[:, 1], 1 - frac[:, 1])
                      * np.where(oz, frac[:, 2], 1 - frac[:, 2]))
                vals = np.asarray(table[lvl], np.float64)[rows, lane]
                acc += vals * wt
            out[:, lvl * cfg.n_features + f] = acc
    return out
